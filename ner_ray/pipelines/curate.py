"""End-to-end pre-training corpus curation — the composition a 100-TB
web-corpus user actually runs, wired from this repo's own stages in
ONE coherent flow:

    raw crawl (html)                 stages/htmlextract.py   (optional)
      -> quality/langid filter +     pipelines/clean.py      (fused map)
         exact dedup + near-dedup +
         n-gram decontamination
      -> model-based selection:      stages/dsir.py OR       (optional)
         DSIR importance resampling  stages/qualityclf.py
         or classifier+Pareto
      -> sequence packing            stages/chunking.py      (optional)
      -> deterministic shard export  stages/shardexport.py   (optional)

Every stage is deterministic and layout/retry independent (hash-keyed
decisions end-to-end), so the whole chain is reproducible from the raw
crawl + a config — the property a resumable 100-TB run needs. Each
stage streams; the only pins are the documented multi-consumer ones
inside clean_corpus/dedup (disable via ``materialize=False`` in
``clean_kwargs``).
"""

from __future__ import annotations

from ner_ray.pipelines.clean import clean_corpus


def curate_pretrain(docs_ds, *, html_col: str | None = None,
                    text_col: str = "text", id_col: str = "doc_id",
                    clean_kwargs: dict | None = None,
                    eval_ds=None, decontam_n: int = 13,
                    select: tuple | None = None,
                    pack_tokens: int | None = None,
                    pack_kwargs: dict | None = None,
                    out_dir: str | None = None, num_shards: int | None = None,
                    seed: int = 42):
    """Run the curation chain; returns the final Dataset (or the shard
    manifest dict when ``out_dir`` is given).

    * ``html_col``: extract visible text from this column first (the
      extracted text lands in ``text_col``; raw HTML is dropped).
    * ``clean_kwargs``: forwarded to ``clean_corpus`` (thresholds,
      near_dup_method, normalize, materialize, checkpoint...).
    * ``eval_ds``: n-gram benchmark decontamination (length
      ``decontam_n``), chained inside clean_corpus LAST.
    * ``select``: model-based selection —
      ``("dsir", target_ds, fraction)`` fits DSIR on target-vs-cleaned
      and keeps ~fraction by deterministic Gumbel top-k, or
      ``("classifier", pos_ds, alpha)`` fits the quality classifier on
      pos-vs-cleaned and applies the Pareto acceptance rule.
    * ``pack_tokens``: GPT-style sequence packing to this window.
    * ``out_dir``: deterministic resumable shard export endgame.
    """
    ds = docs_ds
    if html_col is not None:
        from ner_ray.stages.htmlextract import extract_text_from_html

        ds = extract_text_from_html(ds, html_col=html_col,
                                    text_col=text_col)

    kw = dict(clean_kwargs or {})
    kw.setdefault("text_col", text_col)
    kw.setdefault("id_col", id_col)
    if eval_ds is not None:
        kw.setdefault("decontaminate_against", eval_ds)
        kw.setdefault("decontam_n", decontam_n)
    ds = clean_corpus(ds, **kw)

    if select is not None or pack_tokens is not None:
        # the selection legs consume the cleaned stream repeatedly
        # (count + one gradient/count pass per epoch + scoring), and
        # pack's shard auto-sizing needs a size probe — pin the
        # cleaned survivors once unless the caller chose re-read mode
        if kw.get("materialize", True):
            ds = ds.materialize()

    if select is not None:
        mode, ref_ds, knob = select
        if mode == "dsir":
            from ner_ray.stages.dsir import dsir_select, fit_dsir

            model = fit_dsir(ref_ds, ds, text_col=text_col)
            ds = dsir_select(ds, model, float(knob), text_col=text_col,
                             id_col=id_col, seed=seed)
        elif mode == "classifier":
            from ner_ray.stages.qualityclf import (fit_quality_classifier,
                                                   pareto_filter)

            # published setup: neg = the raw (cleaned) crawl itself,
            # which contains good pages too — balance classes so the
            # tiny positive corpus still calibrates scores around 0.5
            n_pos = max(ref_ds.count(), 1)
            n_neg = max(ds.count(), 1)
            model = fit_quality_classifier(
                ref_ds, ds, text_col=text_col,
                pos_weight=max(n_neg / n_pos, 1.0))
            ds = pareto_filter(ds, model, alpha=float(knob),
                               text_col=text_col, id_col=id_col,
                               seed=seed)
        else:
            raise ValueError(
                f"select mode must be 'dsir' or 'classifier', got "
                f"{mode!r}")

    if pack_tokens is not None:
        from ner_ray.stages.chunking import pack_sequences

        if select is not None and kw.get("materialize", True):
            # pin the (smaller) selected set so pack's shard
            # auto-sizing sees real bytes, not a lazy chain's floor;
            # the cleaned pin above becomes unreachable and frees
            ds = ds.materialize()
        pk = dict(pack_kwargs or {})
        ds = pack_sequences(ds, max_tokens=pack_tokens,
                            text_col=text_col, id_col=id_col,
                            seed=seed, **pk)

    if out_dir is not None:
        from ner_ray.stages.shardexport import export_shards

        if pack_tokens is not None:
            # packed rows are keyed (shard, seq_idx); synthesize the
            # scalar id export_shards hashes on
            import pyarrow as pa
            import pyarrow.compute as pc

            def add_id(t: pa.Table) -> pa.Table:
                sid = pc.add(
                    pc.multiply(pc.cast(t.column("shard"), pa.int64()),
                                pa.scalar(1 << 32, pa.int64())),
                    pc.cast(t.column("seq_idx"), pa.int64()))
                # export_shards tags its own "shard" column — rename
                # the packing keys so the schemas cannot collide
                t = t.rename_columns(
                    ["pack_shard" if c == "shard" else
                     "pack_seq_idx" if c == "seq_idx" else c
                     for c in t.column_names])
                return t.append_column("_pack_id", sid)

            ds = ds.map_batches(add_id, batch_format="pyarrow")
            if num_shards is None:
                # the export's byte-based shard auto-sizing probes
                # metadata, which a lazy chain defeats (floor of 16 —
                # the corpus/16-per-task OOM the sizing exists to
                # prevent); pin the packed stream so the probe sees
                # real bytes
                ds = ds.materialize()
            return export_shards(ds, out_dir, num_shards, seed=seed,
                                 id_col="_pack_id")
        return export_shards(ds, out_dir, num_shards, seed=seed,
                             id_col=id_col)
    return ds
