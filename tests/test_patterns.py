"""Pattern-file DSL tests (SURVEY.md §2.2 M4 extension surface):

* parse/render round-trip;
* the DEFAULT pattern file reproduces the built-in feature families
  exactly — tagging the tiny fixture through an explicit pattern file
  yields byte-identical mentions (and therefore P=R=1.0 vs goldens);
* numeric column indices and %t regex tests parse;
* a pattern file restricted to a subset of families changes scoring
  (sanity that the pattern set actually drives the emissions).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ner_ray.constants import FEATURE_FAMILIES
from ner_ray.functions.patterns import (
    PatternSet,
    default_pattern_set,
    default_pattern_text,
    parse_pattern_file,
)


def test_default_roundtrip_matches_feature_families():
    ps = default_pattern_set()
    assert ps.families == {f: tuple(sorted(o))
                           for f, o in FEATURE_FAMILIES.items()}
    assert ps.has_bigram
    # render -> parse -> render is a fixpoint
    again = parse_pattern_file(ps.render())
    assert again.families == ps.families
    assert again.render() == ps.render()


def test_numeric_columns_and_comments():
    ps = parse_pattern_file("""
# unigram identity window, numeric column style (col 0 == low)
U00:%x[-1,0]
U01:%x[0,0]
U02:%x[1,0]
USh:%x[0,1]   # shape by index
B
""")
    assert ps.families == {"low": (-1, 0, 1), "shape": (0,)}
    assert ps.has_bigram


def test_regex_test_template_parses():
    ps = parse_pattern_file('Ut0:%t[0,low,"^[0-9]+$"]\nB\n')
    assert len(ps.tests) == 1
    t = ps.tests[0]
    assert t.offset == 0 and t.column == "low" and t.regex == "^[0-9]+$"
    assert not t.extract


def test_match_extraction_template_parses_and_scores():
    """%m: the matched substring becomes the feature value; it fires
    when the model carries a matching <id>:<off>:<substr> row."""
    from ner_ray.stages.tagger import _family_values

    ps = parse_pattern_file('Um0:%m[0,low,"([a-z])"]\nB\n')
    t = ps.tests[0]
    assert t.extract and t.template_id == "m0"
    assert ps.score_families["m0"] == (0,)
    # render round-trips the %m tag
    assert '%m[0,low,"([a-z])"]' in ps.render()

    uniq = pd.Series(["Alice", "1999", "chen"], dtype=object)
    from ner_ray.stages.textops import normalize_series

    vals = _family_values("m0", uniq, normalize_series(uniq), ps)
    assert vals.tolist() == ["a", "", "c"]  # first lowercase letter


def test_render_parse_roundtrip_property():
    """Property: render -> parse is the identity on arbitrary valid
    PatternSets (hypothesis over families, offsets, tests)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ner_ray.functions.patterns import (
        PATTERN_COLUMNS,
        PatternSet,
        RegexTest,
    )

    cols = st.sampled_from([c for c in PATTERN_COLUMNS if c != "gaz"])
    offsets = st.lists(st.integers(-3, 3), min_size=1, max_size=5,
                       unique=True).map(lambda o: tuple(sorted(o)))
    fam_dict = st.dictionaries(cols, offsets, min_size=0, max_size=6)
    safe_regex = st.text(alphabet="abcxyz01[]^$+*", min_size=1,
                         max_size=8).filter(_compilable)
    tests = st.lists(
        st.builds(RegexTest,
                  template_id=st.sampled_from(["t0", "t1", "m0", "m7"]),
                  offset=st.integers(-2, 2),
                  column=cols,
                  regex=safe_regex,
                  extract=st.booleans()),
        max_size=3,
        unique_by=lambda t: t.template_id)
    # %t ids must start with t, %m ids with m (parse normalizes), and
    # ids must be unique AFTER normalization (the parser rejects dups)
    def normalize(ts):
        seen = {}
        for t in ts:
            tid = ("m" if t.extract else "t") + t.template_id[1:]
            seen.setdefault(tid, RegexTest(tid, t.offset, t.column,
                                           t.regex, t.extract))
        return tuple(seen.values())

    tests = tests.map(normalize)

    @settings(max_examples=60, deadline=None)
    @given(fams=fam_dict, ts=tests, bigram=st.booleans())
    def prop(fams, ts, bigram):
        ps = PatternSet(families=fams, tests=ts, has_bigram=bigram)
        back = parse_pattern_file(ps.render())
        assert back.families == ps.families
        assert back.tests == ps.tests
        assert back.has_bigram == ps.has_bigram

    prop()


def _compilable(r: str) -> bool:
    import re

    try:
        re.compile(r)
        return True
    except re.error:
        return False


def test_bad_lines_raise():
    with pytest.raises(ValueError):
        parse_pattern_file("U00:%x[0,nosuchcol]")
    with pytest.raises(ValueError):
        parse_pattern_file("B00:%x[0,low]")  # bigram observations
    with pytest.raises(ValueError):
        parse_pattern_file("U00:%x[0,low]%x[1,low]")  # concatenation
    with pytest.raises(ValueError, match="duplicate template id"):
        parse_pattern_file('Ut0:%t[0,low,"^a"]\nUt0:%t[-1,low,"^b"]\n')
    with pytest.raises(ValueError, match="gaz"):
        parse_pattern_file('Ut0:%t[0,gaz,"^B-"]\n')
    with pytest.raises(ValueError, match="group-wrapped"):
        parse_pattern_file('Um0:%m[0,low,"(?i)abc"]\n')


def test_annotate_actor_honors_patterns(ray_session, tiny_dir):
    """Regression: AnnotateDocsActor must thread the pattern set into
    tag_spans (it used to build the cache with the restricted set but
    score with the model's full layout — silently wrong output)."""
    import ray.data as rd

    from ner_ray.stages.annotate import AnnotateDocsActor
    from ner_ray.state.model import put_bundle

    pats_text = "Ulow+0:%x[0,low]\nB\n"
    bundle = put_bundle(f"{tiny_dir}/model.parquet",
                        f"{tiny_dir}/alias.parquet")
    docs = rd.read_parquet(f"{tiny_dir}/docs.parquet").limit(100)
    n_restricted = docs.map_batches(
        AnnotateDocsActor,
        fn_constructor_kwargs={"bundle": bundle, "patterns": pats_text},
        batch_format="pyarrow", concurrency=1, num_cpus=1,
    ).sum("n_mentions")
    n_full = docs.map_batches(
        AnnotateDocsActor, fn_constructor_kwargs={"bundle": bundle},
        batch_format="pyarrow", concurrency=1, num_cpus=1,
    ).sum("n_mentions")
    # the restricted pattern set must actually change doc-level output
    assert n_restricted != n_full, (n_restricted, n_full)


@pytest.fixture(scope="module")
def bundle(ray_session, tiny_dir):
    from ner_ray.state.model import ModelBundle

    return ModelBundle.load(f"{tiny_dir}/model.parquet",
                            f"{tiny_dir}/alias.parquet")


def _tag(texts, bundle, pats=None):
    from ner_ray.state.model import GAZ_VALUES
    from ner_ray.stages.tagger import tag_spans

    gid = bundle.value_ids["gaz"]
    gaz_row = np.array([gid.get(v, 0) for v in GAZ_VALUES])
    return tag_spans(texts, bundle, gaz_row, pats=pats).to_pylist()


@pytest.fixture(scope="module")
def span_texts(tiny_dir):
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{tiny_dir}/docs.parquet").to_pylist()
    texts = [s["text"] for d in docs for s in d["spans"]
             if s["kind"] == "text"]
    return pd.Series(texts[:200], dtype=object)


def test_default_pattern_file_reproduces_builtin(bundle, span_texts):
    builtin = _tag(span_texts, bundle, pats=None)
    via_file = _tag(span_texts, bundle,
                    pats=parse_pattern_file(default_pattern_text()))
    assert builtin == via_file
    assert sum(len(m) for m in builtin) > 0


def test_pattern_subset_changes_scoring(bundle, span_texts):
    subset = parse_pattern_file("Ulow+0:%x[0,low]\nB\n")
    full = _tag(span_texts, bundle, pats=None)
    reduced = _tag(span_texts, bundle, pats=subset)
    assert full != reduced  # the pattern set actually drives emissions


def test_absent_pattern_family_is_oov_in_both_paths(bundle, span_texts):
    """A pattern family the model has no weights for must contribute
    nothing — identically through the cached (FeatureCache) and
    uncached paths (regression: the cached path used to KeyError)."""
    from ner_ray.stages.tagger import FeatureCache, tag_spans
    from ner_ray.state.model import GAZ_VALUES

    pats = parse_pattern_file(
        default_pattern_text() + 'Ut9:%t[-1,low,"^[0-9]+$"]\n')
    gid = bundle.value_ids["gaz"]
    gaz_row = np.array([gid.get(v, 0) for v in GAZ_VALUES])
    uncached = tag_spans(span_texts, bundle, gaz_row, pats=pats).to_pylist()
    cache = FeatureCache(bundle, pats)
    cached = tag_spans(span_texts, bundle, gaz_row, cache=cache,
                       pats=pats).to_pylist()
    base = tag_spans(span_texts, bundle, gaz_row).to_pylist()
    assert uncached == cached == base  # absent family: all-OOV, score 0


def test_regex_test_family_scores_when_model_has_weights(span_texts):
    """%t families DO change emissions when the model carries matching
    feature rows (value '1' under the template-id family)."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ner_ray import schema as S
    from ner_ray.fixtures.gen import ensure_fixtures
    from ner_ray.stages.tagger import tag_spans
    from ner_ray.state.model import GAZ_VALUES, ModelBundle

    tiny = ensure_fixtures("tiny")
    base_tbl = pq.read_table(f"{tiny}/model.parquet")
    extra = pa.table({
        "feature": ["t9:0:1"] * 2,
        "label": ["B-PER", "O"],
        "weight": [50.0, -50.0],
    }, schema=S.CRF_MODEL)
    pats = parse_pattern_file(
        default_pattern_text() + 'Ut9:%t[0,low,"^[a-z]+$"]\n')
    with tempfile.TemporaryDirectory() as td:
        pq.write_table(pa.concat_tables([base_tbl, extra]),
                       f"{td}/model.parquet")
        b = ModelBundle.load(f"{td}/model.parquet",
                             f"{tiny}/alias.parquet",
                             families=pats.score_families)
    gid = b.value_ids["gaz"]
    gaz_row = np.array([gid.get(v, 0) for v in GAZ_VALUES])
    with_test = tag_spans(span_texts, b, gaz_row, pats=pats).to_pylist()
    # baseline: same bundle, pattern set WITHOUT the %t line (deriving a
    # %t value requires the pattern set, so pats=None on this bundle
    # correctly raises — the default pattern file is the right baseline)
    without = tag_spans(span_texts, b, gaz_row,
                        pats=parse_pattern_file(default_pattern_text())
                        ).to_pylist()
    assert with_test != without  # the +50 B-PER boost on lowercase fires


def test_tagger_actor_accepts_pattern_text(ray_session, tiny_dir):
    import ray.data as rd

    from ner_ray.stages.spans import flatten_text_spans
    from ner_ray.stages.tagger import TaggerActor
    from ner_ray.state.model import put_bundle

    bundle = put_bundle(f"{tiny_dir}/model.parquet",
                        f"{tiny_dir}/alias.parquet")
    docs = rd.read_parquet(f"{tiny_dir}/docs.parquet")
    spans = docs.map_batches(flatten_text_spans, batch_format="pyarrow")
    base = spans.map_batches(
        TaggerActor, fn_constructor_kwargs={"bundle": bundle},
        batch_format="pyarrow", concurrency=1, num_cpus=1).to_pandas()
    via = spans.map_batches(
        TaggerActor,
        fn_constructor_kwargs={"bundle": bundle,
                               "patterns": default_pattern_text()},
        batch_format="pyarrow", concurrency=1, num_cpus=1).to_pandas()
    a = base.sort_values(["doc_id", "span_idx"]).reset_index(drop=True)
    b = via.sort_values(["doc_id", "span_idx"]).reset_index(drop=True)
    assert a["mentions"].apply(list).to_list() == \
        b["mentions"].apply(list).to_list()
