"""FIXTURES.md A5: hand-shaped sentences covering BIO edge cases —
mention at sequence start/end, adjacent mentions, 3-token mention,
ambiguous alias, digit-bearing tokens, single-token sequence.
Pipeline tagger must agree with the reference oracle on every one."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from ner_ray.oracle import reference_oracle as O
from ner_ray.stages.tagger import TaggerActor, tag_spans
from ner_ray.state.model import GAZ_VALUES, ModelBundle

EDGE_SENTENCES = [
    # mention at sequence start
    "Alice Chen maps the table",
    # mention at sequence end
    "the table maps Alice Chen",
    # entire sequence is one mention
    "Alice Chen",
    # adjacent mentions (gap 0)
    "alice chen bob chen",
    # 3-token mention
    "map Alice Sam Chen table",
    # ambiguous single-token alias (shared last name)
    "chen maps the table",
    # digit-bearing tokens (normalize to 0)
    "v42 maps 2024 Alice Chen x9y",
    # capitalization variants
    "ALICE CHEN and alice chen and Alice Chen",
    # single filler token
    "map",
    # mention surrounded by mentions within the window
    "Alice Chen map bob chen map chen",
    # repeated mention
    "Alice Chen map map Alice Chen",
    # longest-match preference (prefix of longer alias present)
    "alice sam chen table alice chen",
]


@pytest.fixture(scope="module")
def bundle(tiny_dir):
    return ModelBundle.load(f"{tiny_dir}/model.parquet",
                            f"{tiny_dir}/alias.parquet")


def _oracle_mentions(text, tiny_dir):
    alias_tbl = pq.read_table(f"{tiny_dir}/alias.parquet")
    rows = list(zip(alias_tbl.column("alias").to_pylist(),
                    alias_tbl.column("entity_id").to_pylist(),
                    alias_tbl.column("ne_type").to_pylist(),
                    alias_tbl.column("prior").to_pylist()))
    alias_types, candidates = O.build_alias_maps(rows)
    model = O.OracleModel.from_parquet(f"{tiny_dir}/model.parquet")
    out = O.run_doc("d", [{"kind": "text", "text": text,
                           "media_ref": "", "offset": 0}],
                    model, alias_types, candidates)
    return [(m["tok_begin"], m["tok_end"], m["ne_type"], m["surface"])
            for m in out.mentions]


def test_edge_sentences_pipeline_equals_oracle(tiny_dir, bundle):
    gid = bundle.value_ids["gaz"]
    gaz_row = np.array([gid.get(v, 0) for v in GAZ_VALUES])
    texts = pd.Series(EDGE_SENTENCES, dtype=object)
    mentions = tag_spans(texts, bundle, gaz_row)
    counts = np.diff(mentions.offsets.to_numpy(zero_copy_only=False))
    flat = mentions.flatten()
    row_of = np.repeat(np.arange(len(EDGE_SENTENCES)), counts)
    got_by_row: dict[int, list] = {i: [] for i in range(len(EDGE_SENTENCES))}
    for r, tb, te, nt, sf in zip(row_of,
                                 flat.field("tok_begin").to_pylist(),
                                 flat.field("tok_end").to_pylist(),
                                 flat.field("ne_type").to_pylist(),
                                 flat.field("surface").to_pylist()):
        got_by_row[int(r)].append((tb, te, nt, sf))
    for i, text in enumerate(EDGE_SENTENCES):
        want = _oracle_mentions(text, tiny_dir)
        assert got_by_row[i] == want, (text, got_by_row[i], want)
    # sanity: the corpus is non-trivial (several sentences have mentions)
    n_with = sum(1 for v in got_by_row.values() if v)
    assert n_with >= 6
