"""S1/S6 CoNLL source+sink and the Step/Pipeline extension surface."""

import os

import pyarrow as pa
import pytest


CONLL = """\
Alice B-PER
Chen I-PER
visits O
Paris B-LOC

map O
the O
table O
"""


def test_parse_and_arity_validation(tmp_path):
    from ner_ray.sources.conll import parse_conll_text

    t = parse_conll_text(CONLL, "f1.conll")
    assert t.num_rows == 2
    assert t.column("tokens").to_pylist()[0] == ["Alice", "Chen", "visits",
                                                 "Paris"]
    assert t.column("tags").to_pylist()[0] == ["B-PER", "I-PER", "O",
                                               "B-LOC"]
    with pytest.raises(ValueError, match="arity"):
        parse_conll_text("a b\nc\n", "bad.conll")


def test_conll_roundtrip(ray_session, tiny_dir, tmp_path):
    """read CoNLL -> tag through the real tagger -> write CoNLL."""
    from ner_ray.sources.conll import (
        read_conll,
        sequences_to_spans,
        write_conll,
    )
    from ner_ray.stages.tagger import PosteriorActor
    from ner_ray.state.model import put_bundle

    src = tmp_path / "in.conll"
    src.write_text("alice chen visits paris\n".replace(" ", " O\n") + " O\n")
    # a real labeled file instead:
    src.write_text(CONLL)
    seqs = read_conll(str(src))
    spans = sequences_to_spans(seqs)
    bundle = put_bundle(f"{tiny_dir}/model.parquet",
                        f"{tiny_dir}/alias.parquet")
    tokens = spans.map_batches(
        PosteriorActor, fn_constructor_kwargs={"bundle": bundle},
        batch_format="pyarrow", concurrency=(1, 2), num_cpus=1)
    out_dir = str(tmp_path / "out")
    write_conll(tokens, out_dir)
    files = [f for f in os.listdir(out_dir) if f.endswith(".conll")]
    assert files
    text = open(os.path.join(out_dir, files[0])).read()
    assert "Alice" in text and "\n\n" in text  # tokens + sentence breaks


def test_step_pipeline_compose(ray_session):
    import ray.data as rd

    from ner_ray.pipelines.api import Pipeline, Step

    def add_one(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.set_column(0, "id", pc.add(t.column("id"), 1))

    class Doubler:
        def __init__(self):
            self.factor = 2

        def __call__(self, t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.set_column(0, "id",
                                pc.multiply(t.column("id"), self.factor))

    ds = rd.from_arrow(pa.table({"id": list(range(10))}))
    pipe = Pipeline([
        Step("inc", add_one),
        Step("double", Doubler, stateful=True, concurrency=(1, 2)),
    ])
    out = sorted(r["id"] for r in pipe.run(ds).take_all())
    assert out == [(i + 1) * 2 for i in range(10)]


def test_feature_template_render():
    from ner_ray.pipelines.api import FeatureTemplate, templates_to_rows

    t = FeatureTemplate("low", (-1, 0, 1))
    assert t.pattern_lines()[0] == "Ulow-1:%x[-1,low]"
    rows = templates_to_rows([t], {"low": ["a", "b"]}, ["O", "B-PER"])
    assert len(rows) == 3 * 2 * 2
    assert rows[0] == ("low:-1:a", "O", 0.0)
