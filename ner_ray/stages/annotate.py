"""Doc-level annotation stage: the per-row output that carries the
UNTOUCHED spans column through, satisfying the span-sequence invariant
(kind, text, media_ref, order) by construction (BASELINE.json:15, Q6).

One actor fuses flatten -> tag within each docs batch and regroups the
mentions to the document row, so output rows = input rows with two new
columns (mentions incl. span_idx, n_mentions) and the spans column
passed through untouched (zero-copy).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ner_ray.stages.spans import flatten_text_spans
from ner_ray.stages.tagger import MENTION_STRUCT, TaggerActor, tag_spans

DOC_MENTION_STRUCT = pa.struct(
    [pa.field("span_idx", pa.int32())] + list(MENTION_STRUCT)
)


class AnnotateDocsActor(TaggerActor):
    def __call__(self, batch: pa.Table) -> pa.Table:
        spans = flatten_text_spans(batch, with_row_index=True)
        mentions = tag_spans(spans.column("text"), self.b,
                             self._gaz_row, cache=self._cache,
                             pats=self.pats)
        counts = np.diff(mentions.offsets.to_numpy(zero_copy_only=False))
        flat = mentions.flatten()
        span_idx = np.repeat(
            spans.column("span_idx").to_numpy(zero_copy_only=False), counts)
        doc_row = np.repeat(
            spans.column("_doc_row").to_numpy(zero_copy_only=False), counts)
        # spans (and their mentions) arrive ordered by doc row
        struct = pa.StructArray.from_arrays(
            [pa.array(span_idx.astype(np.int32), pa.int32())]
            + [flat.field(i) for i in range(flat.type.num_fields)],
            fields=list(DOC_MENTION_STRUCT),
        )
        per_doc = np.bincount(doc_row, minlength=len(batch))
        offsets = np.concatenate([[0], np.cumsum(per_doc)]).astype(np.int32)
        lst = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)
        out = batch.append_column("mentions", lst)
        return out.append_column(
            "n_mentions", pa.array(per_doc.astype(np.int64), pa.int64()))
