"""Span flattening + the span-sequence invariant (operators M5, Q6).

The pinned input is interleaved docs: ``doc_id, spans: list<struct<kind,
text, media_ref, offset>>``. Tagging runs over the text spans only, but
the output must preserve per-row span-sequence equality
``(kind, text, media_ref, order)`` vs the input (BASELINE.json:15).

``flatten_text_spans`` emits one row per text span while keeping the
doc key; the invariant is verified by ``check_span_invariant`` which
zips a pipeline output's docs back against the input (Q6) — also wired
as a pytest property.

Everything is zero-copy Arrow: list offsets -> repeat counts, struct
child arrays sliced flat, no Python per-row loops.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _spans_parts(batch: pa.Table):
    """-> (doc_id np, list offsets np, flat struct fields dict)."""
    col = batch.column("spans")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    la = col
    offsets = la.offsets.to_numpy(zero_copy_only=False)
    flat = la.flatten()  # may drop null/offset slack correctly
    return offsets, flat


def flatten_spans(batch: pa.Table, with_row_index: bool = False) -> pa.Table:
    """All spans -> one row per span with doc_id, span_idx."""
    offsets, flat = _spans_parts(batch)
    counts = np.diff(offsets)
    doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    doc_rep = np.repeat(doc_ids, counts)
    span_idx = (np.arange(len(flat)) -
                np.repeat(offsets[:-1], counts)).astype(np.int32)
    cols = {
        "doc_id": pa.array(doc_rep, pa.string()),
        "span_idx": pa.array(span_idx, pa.int32()),
        "kind": flat.field("kind"),
        "text": flat.field("text"),
        "media_ref": flat.field("media_ref"),
        "offset": flat.field("offset"),
    }
    if with_row_index:
        cols["_doc_row"] = pa.array(
            np.repeat(np.arange(len(batch)), counts), pa.int64())
    return pa.table(cols)


def flatten_text_spans(batch: pa.Table,
                       with_row_index: bool = False) -> pa.Table:
    """Text spans only (kind == 'text'), keeping (doc_id, span_idx)."""
    t = flatten_spans(batch, with_row_index=with_row_index)
    t = t.filter(pc.equal(t.column("kind"), "text"))
    keep = ["doc_id", "span_idx", "text", "offset"]
    if with_row_index:
        keep.append("_doc_row")
    return t.select(keep)


def spans_signature(batch: pa.Table) -> pa.Table:
    """Per doc: a canonical string signature of the span sequence
    (kind, text, media_ref, order) for the Q6 invariant check."""
    offsets, flat = _spans_parts(batch)
    counts = np.diff(offsets)
    sig_parts = pc.binary_join_element_wise(
        flat.field("kind"), flat.field("text"), flat.field("media_ref"),
        "\x1f",
    ).to_numpy(zero_copy_only=False)
    sigs = []
    for i, c in enumerate(counts):
        lo = offsets[i]
        sigs.append("\x1e".join(sig_parts[lo: lo + c]))
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "span_sig": pa.array(sigs, pa.string()),
        }
    )


def span_invariant_verdicts(input_ds, output_ds, num_partitions: int = 4):
    """Distributed Q6 check: per-doc (doc_id, equal) Dataset. A doc
    dropped or fabricated on either side surfaces as equal=False via
    the FULL outer join (an inner join would silently shrink — the
    exact violation the invariant exists to catch). The output side is
    materialized first when it hangs off an actor pool (JoinOperator
    scheduling note at canon.py:236).

    The join ships a 128-bit signature DIGEST (two independent 64-bit
    text hashes), not the signature string: the raw signature embeds
    every span's text verbatim, so joining it would shuffle ~2x the
    corpus text to compare per-doc equality that scalars decide. A
    digest collision can only mis-report equal=True for a differing
    doc — at 2^-128 per doc-pair, negligible against the audit's
    purpose; equality of equal=False verdicts is exact."""
    from ner_ray.functions.joins import clamp_join_partitions
    from ner_ray.util.hashing import hash_column

    def _sig(prefix):
        def f(t: pa.Table) -> pa.Table:
            sig = spans_signature(t)
            s = sig.column("span_sig")
            h1 = hash_column(s).view(np.int64)
            # second digest half from a salted rehash (a different
            # input string, so an h1 collision does not propagate)
            h2 = hash_column(pc.binary_join_element_wise(
                s, "\x00sig2", "")).view(np.int64)
            return pa.table({"doc_id": sig.column("doc_id"),
                             f"{prefix}_h1": pa.array(h1),
                             f"{prefix}_h2": pa.array(h2)})
        return f

    a = input_ds.map_batches(_sig("in"), batch_format="pyarrow")
    b = output_ds.map_batches(_sig("out"),
                              batch_format="pyarrow").materialize()
    joined = a.join(b, join_type="full_outer",
                    num_partitions=clamp_join_partitions(num_partitions),
                    on=("doc_id",))

    def verdict(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        eq = pc.and_(
            pc.equal(t.column("in_h1"), t.column("out_h1")),
            pc.equal(t.column("in_h2"), t.column("out_h2")))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "equal": pc.coalesce(eq, pa.scalar(False)),
        })

    return joined.map_batches(verdict, batch_format="pyarrow")


def check_span_invariant(input_ds, output_ds) -> bool:
    """True iff every doc's span signature in output equals the input's
    (order-sensitive), with no docs dropped or fabricated. Fully
    distributed (rides span_invariant_verdicts — only (doc_id, bool)
    rows exist anywhere; the previous form pulled both corpora's
    full-text signatures onto the driver)."""
    def bad(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(t.column("equal"))) \
            .select(["doc_id"])

    return span_invariant_verdicts(input_ds, output_ds) \
        .map_batches(bad, batch_format="pyarrow").count() == 0
