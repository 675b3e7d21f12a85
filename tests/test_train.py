"""A5: distributed perceptron training recovers the reference tagging
behavior from labeled sequences alone; the trained model exports to
the standard model table and runs through the unmodified TaggerActor."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ner_ray.constants import LABELS


def _training_table(fixture_dir: str):
    """(tokens, tags) sequences derived from docs + gold mentions."""
    docs = pq.read_table(f"{fixture_dir}/docs.parquet").to_pylist()
    gold = pq.read_table(f"{fixture_dir}/gold_mentions.parquet").to_pylist()
    by_span: dict[tuple, list] = {}
    for m in gold:
        by_span.setdefault((m["doc_id"], m["span_idx"]), []).append(m)
    rows = []
    for d in docs:
        for si, span in enumerate(d["spans"]):
            if span["kind"] != "text" or not span["text"]:
                continue
            toks = span["text"].split()
            tags = ["O"] * len(toks)
            for m in by_span.get((d["doc_id"], si), []):
                tags[m["tok_begin"]] = f"B-{m['ne_type']}"
                for t in range(m["tok_begin"] + 1, m["tok_end"]):
                    tags[t] = f"I-{m['ne_type']}"
            rows.append({"doc_id": d["doc_id"], "span_idx": si,
                         "tokens": toks, "tags": tags})
    return rows


@pytest.mark.slow
def test_train_recovers_reference_tagging(ray_session, tiny_dir):
    import ray.data as rd

    from ner_ray.evaluation.conll import evaluate_mentions
    from ner_ray.oracle.reference_oracle import bio_decode
    from ner_ray.stages.tagger import TaggerActor, tag_spans
    from ner_ray.stages.train import train_perceptron
    from ner_ray.state.model import GAZ_VALUES, ModelBundle

    rows = _training_table(tiny_dir)
    split = int(len(rows) * 0.8)
    train_rows, eval_rows = rows[:split], rows[split:]

    alias_tbl = pq.read_table(f"{tiny_dir}/alias.parquet")
    alias_types = dict(zip(alias_tbl.column("alias").to_pylist(),
                           alias_tbl.column("ne_type").to_pylist()))

    seq_ds = rd.from_arrow(pa.Table.from_pylist(
        [{"tokens": r["tokens"], "tags": r["tags"]} for r in train_rows]))
    weights, history = train_perceptron(seq_ds, alias_types, epochs=5,
                                        batch_size=64, concurrency=(1, 2))
    assert history[0]["errors"] > 0          # learning actually happened
    assert history[-1]["errors"] <= history[0]["errors"]

    # export -> standard sparse model table -> standard tagger pipeline
    model_tbl = weights.to_model_table()
    assert model_tbl.num_rows > 100
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        pq.write_table(model_tbl, f"{td}/model.parquet")
        bundle = ModelBundle.load(f"{td}/model.parquet",
                                  f"{tiny_dir}/alias.parquet")
    gid = bundle.value_ids["gaz"]
    gaz_row = np.array([gid.get(v, 0) for v in GAZ_VALUES])

    import pandas as pd

    texts = pd.Series([" ".join(r["tokens"]) for r in eval_rows],
                      dtype=object)
    mentions = tag_spans(texts, bundle, gaz_row)
    counts = np.diff(mentions.offsets.to_numpy(zero_copy_only=False))
    flat = mentions.flatten()
    row_of = np.repeat(np.arange(len(eval_rows)), counts)
    pred = [
        {"doc_id": eval_rows[r]["doc_id"],
         "span_idx": eval_rows[r]["span_idx"],
         "tok_begin": tb, "tok_end": te, "ne_type": nt}
        for r, tb, te, nt in zip(
            row_of, flat.field("tok_begin").to_pylist(),
            flat.field("tok_end").to_pylist(),
            flat.field("ne_type").to_pylist())
    ]
    gold = []
    for r in eval_rows:
        tags = [LABELS.index(t) for t in r["tags"]]
        for (b, e, typ) in bio_decode(tags):
            gold.append({"doc_id": r["doc_id"], "span_idx": r["span_idx"],
                         "tok_begin": b, "tok_end": e, "ne_type": typ})
    rep = evaluate_mentions(pred, gold).as_dict()["overall"]
    assert rep["f1"] >= 0.9, rep
