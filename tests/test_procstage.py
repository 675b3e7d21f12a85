"""util/procstage.stage_fn: per-worker-process stage instances for
task-based map_batches — build-once semantics, kwargs keying, pickle
round-trip (the property Ray tasks rely on), and end-to-end use in a
Dataset map."""

import pickle

import pyarrow as pa

from ner_ray.util.procstage import _CACHE, stage_fn


class _CountingStage:
    builds = 0

    def __init__(self, tag: str = "x"):
        type(self).builds += 1
        self.tag = tag

    def __call__(self, t: pa.Table) -> pa.Table:
        return t.append_column("tag", pa.array([self.tag] * len(t)))


def test_instance_built_once_per_key():
    _CACHE.clear()
    _CountingStage.builds = 0
    fn = stage_fn(_CountingStage, tag="a")
    t = pa.table({"x": [1, 2]})
    out1, out2 = fn(t), fn(t)
    assert _CountingStage.builds == 1
    assert out1.column("tag").to_pylist() == ["a", "a"]
    assert out2.equals(out1)
    # a different kwargs key builds a separate instance
    fn_b = stage_fn(_CountingStage, tag="b")
    assert fn_b(t).column("tag").to_pylist() == ["b", "b"]
    assert _CountingStage.builds == 2
    # the same key from a NEW stage_fn call reuses the cached instance
    stage_fn(_CountingStage, tag="a")(t)
    assert _CountingStage.builds == 2


def test_pickle_round_trip_rebuilds_lazily():
    _CACHE.clear()
    _CountingStage.builds = 0
    fn = pickle.loads(pickle.dumps(stage_fn(_CountingStage, tag="p")))
    assert _CountingStage.builds == 0  # nothing built at pickle time
    out = fn(pa.table({"x": [3]}))
    assert out.column("tag").to_pylist() == ["p"]
    assert _CountingStage.builds == 1


def test_works_as_dataset_map(ray_session):
    # a real ner_ray stage (importable inside Ray workers — a
    # test-local class would pickle by reference to the test module,
    # which workers cannot import)
    import ray.data as rd

    from ner_ray.stages.htmlextract import HtmlExtractStage

    ds = rd.from_items(
        [{"html": f"<html><title>t{i}</title><body><p>hello {i}"
                   f"</p></body></html>"} for i in range(10)])
    out = ds.map_batches(
        stage_fn(HtmlExtractStage, html_col="html", text_col="text",
                 title_col="title"),
        batch_format="pyarrow")
    rows = sorted(r["text"] for r in out.take_all())
    assert rows == sorted(f"hello {i}" for i in range(10))
