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
    scheduling note at canon.py:236)."""

    def _sig(col_name):
        def f(t: pa.Table) -> pa.Table:
            return spans_signature(t).rename_columns(["doc_id", col_name])
        return f

    a = input_ds.map_batches(_sig("span_sig_in"), batch_format="pyarrow")
    b = output_ds.map_batches(_sig("span_sig_out"),
                              batch_format="pyarrow").materialize()
    joined = a.join(b, join_type="full_outer",
                    num_partitions=num_partitions, on=("doc_id",))

    def verdict(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        eq = pc.equal(t.column("span_sig_in"), t.column("span_sig_out"))
        return pa.table({
            "doc_id": t.column("doc_id"),
            "equal": pc.coalesce(eq, pa.scalar(False)),
        })

    return joined.map_batches(verdict, batch_format="pyarrow")


def check_span_invariant(input_ds, output_ds) -> bool:
    """True iff every doc's span signature in output equals the input's
    (order-sensitive). Both datasets must carry doc_id + spans."""
    import pandas as pd

    a = (
        input_ds.map_batches(spans_signature, batch_format="pyarrow")
        .to_pandas()
        .set_index("doc_id")["span_sig"]
    )
    b = (
        output_ds.map_batches(spans_signature, batch_format="pyarrow")
        .to_pandas()
        .set_index("doc_id")["span_sig"]
    )
    joined = pd.concat([a, b], axis=1, join="inner", keys=["in", "out"])
    # equality of matched rows AND no docs dropped on either side
    return (bool((joined["in"] == joined["out"]).all())
            and len(joined) == len(b) == len(a))
