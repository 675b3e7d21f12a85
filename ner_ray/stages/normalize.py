"""Corpus text normalization — the step BEFORE any hash-keyed dedup.

Exact and near dedup key on bytes: "café" composed (U+00E9) and
decomposed (U+0065 U+0301) are different hash keys for identical text,
and web extraction leaves runs of whitespace that make shingles
diverge. Normalizing first (Unicode form + whitespace collapse + trim,
optional case fold) makes the dedup keys mean what users think they
mean.

Implementation note: pyarrow 16.1's ``pc.utf8_normalize`` is mis-wired
— ``form="NFC"`` DECOMPOSES (verified here: composed "café" comes back
as 5 codepoints, and the output equals unicodedata's NFD instead), so
the Arrow kernel is unusable for composition. The Unicode step instead
uses the web-corpus shape of the data: ``pc.string_is_ascii`` (a C
kernel) splits each batch, ASCII rows (the dominant case — every
Unicode form is the identity on ASCII) bypass untouched, and only the
non-ASCII minority goes through ``unicodedata.normalize`` (one C call
per string). Whitespace collapse / trim / lowercase stay pure Arrow
kernels. Map-only, no shuffle; DuckDB replicates NFC + lower +
regexp_replace + trim exactly (tested), so the transform is
value-matchable.
"""

from __future__ import annotations

import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_FORMS = ("NFC", "NFKC", "NFD", "NFKD")


def _unicode_normalize(col: pa.ChunkedArray, form: str):
    """form-normalize, skipping ASCII rows (identity under any form)."""
    ascii_mask = pc.fill_null(pc.string_is_ascii(col), True)
    if pc.all(ascii_mask).as_py():
        return col
    vals = col.to_pandas().to_numpy(dtype=object)
    idx = np.flatnonzero(~ascii_mask.combine_chunks().to_numpy(
        zero_copy_only=False))
    norm = unicodedata.normalize
    for i in idx:
        if vals[i] is not None:
            vals[i] = norm(form, vals[i])
    return pa.array(vals, pa.string())


def normalize_text(ds, text_col: str = "text", form: str = "NFC",
                   lowercase: bool = False,
                   collapse_whitespace: bool = True,
                   strip: bool = True, out_col: str | None = None):
    """Normalize a text column in place (or into ``out_col``)."""
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}: {form}")
    target = out_col or text_col

    def fn(t: pa.Table) -> pa.Table:
        col = t.column(text_col)
        col = _unicode_normalize(col, form)
        if lowercase:
            col = pc.utf8_lower(col)
        if collapse_whitespace:
            col = pc.replace_substring_regex(col, pattern=r"\s+",
                                             replacement=" ")
        if strip:
            col = pc.utf8_trim_whitespace(col)
        if target in t.schema.names:
            return t.set_column(t.schema.get_field_index(target),
                                target, col)
        return t.append_column(target, col)

    return ds.map_batches(fn, batch_format="pyarrow")
