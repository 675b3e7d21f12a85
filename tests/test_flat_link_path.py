"""Flat candidate/disambiguation operator path (J1 + A4 in isolation)
reproduces the gold links exactly — complements the nested flagship
path that the pipeline uses."""

import os

import pyarrow as pa
import pyarrow.parquet as pq


def test_flat_candidates_then_disambiguate_equals_gold(ray_session, small_dir):
    import ray.data as rd

    from ner_ray.pipelines.flagship import mention_rows, tagged_spans
    from ner_ray.sources.io import read_docs
    from ner_ray.stages.link import CandidateStage, disambiguate_batch
    from ner_ray.state.model import put_bundle

    bundle = put_bundle(f"{small_dir}/model.parquet",
                        f"{small_dir}/alias.parquet")
    tagged = tagged_spans(read_docs(f"{small_dir}/docs.parquet"), bundle)
    mentions = tagged.map_batches(mention_rows, batch_format="pyarrow")
    cands = mentions.map_batches(
        CandidateStage, fn_constructor_kwargs={"bundle": bundle},
        batch_format="pyarrow", concurrency=(1, 2), num_cpus=1)
    # batch_size=None => whole blocks: a mention's candidates are
    # contiguous within a block (CandidateStage emits them together),
    # so disambiguation never sees a split mention
    links = cands.map_batches(disambiguate_batch, batch_format="pyarrow",
                              batch_size=None)
    got = links.to_pandas()
    pred = set(map(tuple, got[["doc_id", "span_idx", "tok_begin",
                               "entity_id"]].itertuples(index=False)))
    gold = pq.read_table(
        os.path.join(small_dir, "gold_links.parquet"),
        columns=["doc_id", "span_idx", "tok_begin", "entity_id"]
    ).to_pandas()
    want = set(map(tuple, gold.itertuples(index=False)))
    assert pred == want
    assert len(pred) == len(got)  # disambiguation produced 1 row/mention
