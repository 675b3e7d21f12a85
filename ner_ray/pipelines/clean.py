"""C4-style corpus cleaning for training-data pipelines: one fused
per-row quality/language filter (map-only, streaming — no shuffle),
then optional exact dedup and near-dedup removal stages composed from
the neardup suite.

The filter thresholds follow the public C4/Gopher-rule shape (word
count, mean word length, distinct-word ratio, language-ID score) but
every kernel is this repo's own (stages/textstats.py); nothing is
tuned to an external corpus. All stages preserve the input columns —
the span-sequence invariant holds through cleaning by construction
because rows are only ever dropped, never rewritten.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ner_ray.stages.textstats import LangIdStage, quality_batch


class QualityFilterStage:
    """Fused quality + language-ID row filter (actor pool: stopword
    profiles built once per actor). Computes the metrics inline on a
    (doc_id, text) view of the batch and filters the ORIGINAL batch,
    so arbitrary payload columns pass through untouched. Null and
    whitespace-only texts count as 0 words (split-on-space would
    otherwise report 1), so any min_words >= 1 drops them."""

    def __init__(self, text_col: str, id_col: str, min_words: int,
                 min_mean_word_len: float, max_mean_word_len: float,
                 min_uniq_ratio: float, langs, min_lang_score: float,
                 max_top2gram_frac: float | None = None,
                 max_dup5gram_frac: float | None = None):
        self.text_col, self.id_col = text_col, id_col
        self.min_words = min_words
        self.min_mwl, self.max_mwl = min_mean_word_len, max_mean_word_len
        self.min_uniq = min_uniq_ratio
        self.langs = frozenset(langs) if langs else None
        self.min_lang_score = min_lang_score
        self.langid = LangIdStage() if self.langs else None
        # Gopher-shaped repetition caps — None disables the (more
        # expensive) n-gram pass entirely
        self.max_top2 = max_top2gram_frac
        self.max_dup5 = max_dup5gram_frac

    def __call__(self, batch: pa.Table) -> pa.Table:
        view = pa.table({
            "doc_id": batch.column(self.id_col),
            "text": pc.fill_null(batch.column(self.text_col), ""),
        })
        q = quality_batch(view)
        nonempty = pc.not_equal(
            pc.utf8_trim_whitespace(view.column("text")), "") \
            .to_numpy(zero_copy_only=False).astype(bool)
        n_words = np.where(
            nonempty,
            q.column("n_words").to_numpy(zero_copy_only=False), 0)
        mwl = q.column("mean_word_len").to_numpy(zero_copy_only=False)
        uniq = q.column("uniq_ratio").to_numpy(zero_copy_only=False)
        keep = ((n_words >= self.min_words)
                & (mwl >= self.min_mwl) & (mwl <= self.max_mwl)
                & (uniq >= self.min_uniq))
        if self.langid is not None:
            lid = self.langid(view)
            lang_ok = np.isin(
                lid.column("pred_lang").to_numpy(zero_copy_only=False),
                list(self.langs))
            score = lid.column("lang_score") \
                .to_numpy(zero_copy_only=False)
            keep &= lang_ok & (score >= self.min_lang_score)
        if ((self.max_top2 is not None or self.max_dup5 is not None)
                and keep.any()):
            from ner_ray.stages.textstats import repetition_batch

            # the n-gram pass is the expensive filter — run it only
            # over rows the cheap filters kept, then scatter back
            alive = np.flatnonzero(keep)
            rep = repetition_batch(
                view.take(pa.array(alive)),
                need_top2=self.max_top2 is not None,
                need_dup5=self.max_dup5 is not None)
            ok = np.ones(len(alive), dtype=bool)
            if self.max_top2 is not None:
                ok &= rep.column("top2gram_frac") \
                    .to_numpy(zero_copy_only=False) <= self.max_top2
            if self.max_dup5 is not None:
                ok &= rep.column("dup5gram_frac") \
                    .to_numpy(zero_copy_only=False) <= self.max_dup5
            keep[alive] &= ok
        return batch.filter(pa.array(keep))


def clean_corpus(docs_ds, text_col: str = "text", id_col: str = "doc_id",
                 min_words: int = 5, min_mean_word_len: float = 2.0,
                 max_mean_word_len: float = 15.0,
                 min_uniq_ratio: float = 0.1, langs=("en",),
                 min_lang_score: float = 0.0,
                 max_top2gram_frac: float | None = None,
                 max_dup5gram_frac: float | None = None,
                 dedup: bool = True,
                 near_dup_method: str | None = None,
                 near_dup_kwargs: dict | None = None,
                 decontaminate_against=None, decontam_n: int = 13,
                 normalize: str | None = None,
                 materialize: bool = True,
                 checkpoint=None, docs_fp: str = "", eval_fp: str = "",
                 fail_after: str = "",
                 return_stats: bool = False):
    """Quality-filter -> exact dedup -> optional near-dedup -> optional
    benchmark decontamination, returning the surviving docs Dataset
    (all columns intact).

    * the quality/language filter is ONE fused actor-pool map_batches
      pass — pure streaming, nothing materializes;
    * ``dedup=True`` removes exact text duplicates (min-id survivor;
      only scalar (hash, id) pairs shuffle);
    * ``near_dup_method`` in {"minhash", "simhash", "embedding"} chains
      ``near_dedup_docs`` with ``near_dup_kwargs``;
    * ``decontaminate_against`` (a Dataset of eval texts) drops every
      surviving doc sharing a ``decontam_n``-word n-gram with the eval
      set — LAST, so the (expensive) n-gram scan runs over the already
      deduped corpus; map-only broadcast path (stages/decontam.py);
    * ``normalize`` ("NFC"/"NFKC"/...) runs stages/normalize.py's text
      normalization FIRST, so composed-vs-decomposed and whitespace
      variants of identical text collapse onto one dedup key; it is a
      map-only pass that fuses into the filter's streaming scan
      (default None keeps byte-exact semantics);
    * ``materialize=False`` is the re-read mode for corpora near
      cluster memory: no stage output pins in the object store — each
      multi-pass consumer re-executes its upstream instead (mirrors
      ivf.py / near_dedup_docs); identical outputs, recompute traded
      for zero pinned footprint;
    * ``checkpoint`` (a CheckpointManager or root path) + ``docs_fp``
      (input fingerprint) write each stage's survivors as a manifest-
      stamped partitioned Parquet checkpoint with per-partition lineage
      rows; a rerun with identical inputs/config SKIPS finished stages
      (status="skipped") and a killed run resumes from the last
      finished stage. ``eval_fp`` must fingerprint the eval set when
      decontaminating under a checkpoint. ``fail_after`` names a stage
      to die after (test hook, mirrors jobs/build_graph.py).
    * ``return_stats=True`` additionally returns {"docs_in",
      "after_filter", "after_exact", "after_near", "after_decontam"} —
      each count is a streaming aggregate but forces execution of its
      prefix, so leave it off in latency-sensitive paths.
    """
    cm = None
    if checkpoint is not None:
        from ner_ray.state.lineage import CheckpointManager, fingerprint

        cm = (checkpoint if isinstance(checkpoint, CheckpointManager)
              else CheckpointManager(checkpoint))
        if not docs_fp:
            raise ValueError(
                "checkpoint= requires docs_fp (a fingerprint of the docs "
                "corpus, e.g. input_fingerprint(docs_path)) so stale "
                "checkpoints are not reused across corpora")
        if decontaminate_against is not None and not eval_fp:
            raise ValueError("checkpoint= with decontaminate_against "
                             "requires eval_fp")

    def _stage(name: str, fp_parts, ds_thunk):
        """Checkpoint wrapper: run_stage when checkpointed (output
        pinned on disk -> also the multi-consumer pin), else the thunk
        with the in-memory materialize policy."""
        if cm is None:
            return None, ds_thunk()
        fp = fingerprint(name, *fp_parts)
        out = cm.run_stage(name, fp, ds_thunk)
        if fail_after == name:
            raise RuntimeError(f"fail_after test hook: {name}")
        return fp, out

    stats: dict[str, int] = {}
    if return_stats:
        stats["docs_in"] = docs_ds.count()

    if normalize is not None:
        from ner_ray.stages.normalize import normalize_text

        docs_ds = normalize_text(docs_ds, text_col=text_col,
                                 form=normalize)

    cfg_filter = (f"{normalize}|"
                  f"{text_col}|{id_col}|{min_words}|{min_mean_word_len}"
                  f"|{max_mean_word_len}|{min_uniq_ratio}"
                  f"|{sorted(langs) if langs else None}|{min_lang_score}"
                  f"|{max_top2gram_frac}|{max_dup5gram_frac}")

    def run_filter():
        # task-based with a per-process cached stage instance: the
        # filter's state (stopword profiles, compiled kernels) is
        # trivial to build, so warm-worker tasks beat an actor pool's
        # per-stage spin-up (util/procstage.py) and autoscale freely
        from ner_ray.util.procstage import stage_fn

        return docs_ds.map_batches(
            stage_fn(
                QualityFilterStage,
                text_col=text_col, id_col=id_col, min_words=min_words,
                min_mean_word_len=min_mean_word_len,
                max_mean_word_len=max_mean_word_len,
                min_uniq_ratio=min_uniq_ratio,
                langs=tuple(langs) if langs else None,
                min_lang_score=min_lang_score,
                max_top2gram_frac=max_top2gram_frac,
                max_dup5gram_frac=max_dup5gram_frac),
            batch_format="pyarrow", num_cpus=1)

    fp_prev, filtered = _stage("clean_filter", [docs_fp, cfg_filter],
                               run_filter)
    if cm is None and materialize and (dedup or near_dup_method
                                       or decontaminate_against is not None
                                       or return_stats):
        # the dedup stages each consume their input more than once
        # (pair/detector pass + anti pass); pin the filtered corpus so
        # the quality/langid actors run exactly one streaming pass
        # instead of re-executing per consumer
        filtered = filtered.materialize()
    if return_stats:
        stats["after_filter"] = filtered.count()

    out = filtered
    if dedup:
        from ner_ray.stages.neardup import exact_dedup_docs

        src = out
        fp_prev, out = _stage(
            "clean_exact_dedup", [fp_prev or docs_fp],
            lambda: exact_dedup_docs(src, text_col=text_col,
                                     id_col=id_col,
                                     materialize=materialize))
        if return_stats:
            if cm is None and materialize:
                out = out.materialize()
            stats["after_exact"] = out.count()

    if near_dup_method:
        from ner_ray.stages.neardup import near_dedup_docs

        src = out
        fp_prev, out = _stage(
            "clean_near_dedup",
            [fp_prev or docs_fp, near_dup_method,
             repr(sorted((near_dup_kwargs or {}).items()))],
            lambda: near_dedup_docs(src, method=near_dup_method,
                                    text_col=text_col, id_col=id_col,
                                    materialize=materialize,
                                    **(near_dup_kwargs or {})))
        if return_stats:
            if cm is None and materialize:
                out = out.materialize()
            stats["after_near"] = out.count()

    if decontaminate_against is not None:
        from ner_ray.stages.decontam import decontaminate

        src = out
        fp_prev, out = _stage(
            "clean_decontam",
            [fp_prev or docs_fp, eval_fp, str(decontam_n)],
            lambda: decontaminate(src, decontaminate_against,
                                  n=decontam_n, text_col=text_col,
                                  id_col=id_col))
        if return_stats:
            if cm is None and materialize:
                out = out.materialize()
            stats["after_decontam"] = out.count()

    return (out, stats) if return_stats else out
