"""Repeated-substring removal: brute-force equality, DuckDB
equivalence, layout independence, and the broadcast-cap contract."""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pandas as pd
import pytest

from ner_ray.stages.spandedup import (
    duplicated_ngram_hashes,
    remove_repeated_spans,
)


def _brute(texts: list[str], k: int, min_docs: int):
    toks = [t.split() for t in texts]
    docs_per_gram: dict[tuple, set] = defaultdict(set)
    for i, tk in enumerate(toks):
        for p in range(len(tk) - k + 1):
            docs_per_gram[tuple(tk[p:p + k])].add(i)
    dup = {g for g, s in docs_per_gram.items() if len(s) >= min_docs}
    outs, rem = [], []
    for tk in toks:
        cov = [False] * len(tk)
        for p in range(len(tk) - k + 1):
            if tuple(tk[p:p + k]) in dup:
                for j in range(p, p + k):
                    cov[j] = True
        outs.append(" ".join(t for t, c in zip(tk, cov) if not c))
        rem.append(sum(cov))
    return outs, rem, dup


def _corpus(seed: int = 3, n: int = 60) -> list[str]:
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(50)]
    boiler = "all rights reserved see terms of service for details"
    docs = []
    for i in range(n):
        words = list(rng.choice(vocab, size=rng.integers(5, 40)))
        if i % 4 == 0:  # plant the boilerplate passage in 1/4 of docs
            at = int(rng.integers(0, len(words)))
            words[at:at] = boiler.split()
        docs.append(" ".join(words))
    docs.append("")  # empty doc
    docs.append("short text")  # shorter than k
    return docs


K = 5


@pytest.fixture(scope="module")
def trimmed(ray_session):
    import ray.data as rd

    texts = _corpus()
    df = pd.DataFrame({"doc_id": [f"d{i:03d}" for i in range(len(texts))],
                       "text": texts})
    ds = rd.from_pandas(df)
    out = remove_repeated_spans(ds, k=K, min_docs=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    return texts, df, out


def test_matches_brute_force(trimmed):
    texts, _, out = trimmed
    exp_texts, exp_rem, dup = _brute(texts, K, 2)
    assert len(dup) > 0, "fixture must plant duplicated spans"
    assert list(out.text) == exp_texts
    assert list(out.removed_tokens) == exp_rem
    assert out.removed_tokens.sum() > 0


def test_dup_hash_counts(ray_session, trimmed):
    import ray.data as rd

    texts, df, _ = trimmed
    _, _, dup = _brute(texts, K, 2)
    got = duplicated_ngram_hashes(rd.from_pandas(df), k=K, min_docs=2)
    assert got.count() == len(dup)


def test_matches_duckdb(trimmed):
    """Exact SQL replication: DuckDB counts distinct docs per gram
    STRING, Ray per gram HASH — equal outputs on collision-free data,
    the same contract the decontamination oracle uses."""
    import duckdb

    texts, df, out = trimmed
    con = duckdb.connect()
    con.register("docs", df[df.text.str.len() > 0])  # '' splits to ['']
    sql = f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
             generate_subscripts(string_split(text, ' '), 1) AS ord
      FROM docs),
    grams AS (
      SELECT doc_id, ord,
             string_agg(tok, ' ') OVER w AS gram,
             count(*) OVER w AS glen
      FROM toks
      WINDOW w AS (PARTITION BY doc_id ORDER BY ord
                   ROWS BETWEEN CURRENT ROW AND {K - 1} FOLLOWING)),
    dup AS (
      SELECT gram FROM grams WHERE glen = {K}
      GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
    flagged AS (
      SELECT g.doc_id, g.ord FROM grams g JOIN dup USING (gram)
      WHERE g.glen = {K}),
    covered AS (
      SELECT DISTINCT t.doc_id, t.ord
      FROM toks t JOIN flagged f
        ON f.doc_id = t.doc_id
       AND t.ord BETWEEN f.ord AND f.ord + {K - 1}),
    kept AS (
      SELECT t.doc_id, t.ord, t.tok FROM toks t
      ANTI JOIN covered c ON c.doc_id = t.doc_id AND c.ord = t.ord)
    SELECT d.doc_id,
           COALESCE((SELECT string_agg(k.tok, ' ' ORDER BY k.ord)
                     FROM kept k WHERE k.doc_id = d.doc_id), '') AS text,
           (SELECT count(*) FROM covered c
            WHERE c.doc_id = d.doc_id) AS removed_tokens
    FROM docs d ORDER BY d.doc_id
    """
    oracle = con.sql(sql).df()
    got = out.merge(oracle, on="doc_id", suffixes=("", "_sql"))
    assert len(got) == len(oracle)
    assert (got.text == got.text_sql).all()
    assert (got.removed_tokens == got.removed_tokens_sql).all()


def test_layout_independent(ray_session, trimmed):
    import ray.data as rd

    texts, df, out = trimmed
    ds = rd.from_pandas(df).repartition(13)
    out2 = remove_repeated_spans(ds, k=K, min_docs=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)


def test_broadcast_cap_raises(ray_session, trimmed):
    import ray.data as rd

    _, df, _ = trimmed
    with pytest.raises(ValueError, match="max_broadcast_hashes"):
        remove_repeated_spans(rd.from_pandas(df), k=K, min_docs=2,
                              max_broadcast_hashes=1).materialize()


def test_no_duplicates_is_identity(ray_session):
    import ray.data as rd

    df = pd.DataFrame({
        "doc_id": ["a", "b"],
        "text": ["one two three four five six",
                 "seven eight nine ten eleven twelve"],
    })
    out = remove_repeated_spans(rd.from_pandas(df), k=3).to_pandas() \
        .sort_values("doc_id")
    assert list(out.text) == list(df.text)
    assert out.removed_tokens.sum() == 0


def test_collision_injection_over_trims_only(ray_session):
    """The hashed-ExactSubstr collision contract: truncating the hash
    space (hash_mod) makes collisions common; the result must remove a
    SUPERSET of the exact string-based removal — every genuinely
    repeated window still goes (equal strings hash equal), extra
    windows may go, and the kept tokens are a subsequence of the exact
    output's kept tokens."""
    import ray.data as rd

    texts = _corpus(seed=9, n=40)
    df = pd.DataFrame({"doc_id": [f"d{i:03d}" for i in range(len(texts))],
                       "text": texts})
    brute_out, brute_rem, _ = _brute(texts, K, 2)
    collided = remove_repeated_spans(
        rd.from_pandas(df), k=K, min_docs=2, hash_mod=97) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert (collided["removed_tokens"].to_numpy()
            >= np.array(brute_rem)).all()
    # with a 97-slot hash space collisions are certain here
    assert (collided["removed_tokens"].to_numpy()
            > np.array(brute_rem)).any()

    def is_subseq(small, big):
        it = iter(big)
        return all(w in it for w in small)

    for got, want in zip(collided["text"], brute_out):
        assert is_subseq(got.split(), want.split())


def test_exact_mode_matches_hashed_when_no_collisions(ray_session, trimmed):
    """With full 64-bit hashes (no collisions at this scale) exact
    mode must reproduce the hashed result verbatim."""
    import ray.data as rd

    _texts, df, out = trimmed
    got = remove_repeated_spans(
        rd.from_pandas(df), k=K, min_docs=2, exact=True).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[out.columns], out)


def test_exact_mode_immune_to_collisions(ray_session):
    """hash_mod=2 makes nearly every distinct gram collide: hashed
    mode over-trims (proven elsewhere), exact mode must not trim ANY
    unique window and must still trim the genuinely repeated one."""
    import ray.data as rd

    from ner_ray.stages.spandedup import remove_repeated_spans

    rep = "alpha beta gamma delta"
    docs = [{"doc_id": f"d{i}", "text": f"unique{i}a unique{i}b {rep} "
                                        f"unique{i}c unique{i}d"}
            for i in range(6)]
    out = remove_repeated_spans(
        rd.from_items(docs), k=4, hash_mod=2, exact=True) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    hashed = remove_repeated_spans(
        rd.from_items(docs), k=4, hash_mod=2, exact=False) \
        .to_pandas()
    # exact: precisely the repeated 4-gram's union cover is removed
    for _, r in out.iterrows():
        assert rep.split()[0] not in r["text"]
        assert "a" == r["text"].split()[0][-1]  # uniqueNa survives
    assert (out["removed_tokens"] < len(docs[0]["text"].split())).all()
    # hashed mode with mod-2 hashes trims strictly more
    assert hashed["removed_tokens"].sum() > out["removed_tokens"].sum()


def test_exact_mode_byte_cap_raises(ray_session):
    import pytest
    import ray.data as rd

    from ner_ray.stages.spandedup import remove_repeated_spans

    docs = [{"doc_id": f"d{i}", "text": "w x y z " * 10} for i in range(4)]
    with pytest.raises(ValueError, match="max_broadcast_bytes"):
        remove_repeated_spans(rd.from_items(docs), k=4, exact=True,
                              max_broadcast_bytes=8)


def test_exact_mode_no_duplicates_and_sparse_blocks(ray_session):
    """exact=True with zero candidates skips the verification pass and
    is an identity; with many blocks holding NO candidate windows the
    per-batch partial must still emit string-typed (not null-typed)
    gram columns — mixed-schema regression."""
    import ray.data as rd

    docs = [{"doc_id": f"d{i}", "text": f"u{i}a u{i}b u{i}c u{i}d u{i}e"}
            for i in range(30)]
    out = remove_repeated_spans(rd.from_items(docs), k=4,
                                exact=True).to_pandas()
    assert (out["removed_tokens"] == 0).all()

    rep = "p q r s"
    docs2 = [{"doc_id": "a", "text": f"x1 x2 {rep} x3"},
             {"doc_id": "b", "text": f"y1 {rep} y2"}]
    docs2 += [{"doc_id": f"z{i}", "text": f"n{i}a n{i}b n{i}c n{i}d n{i}e"}
              for i in range(40)]
    ds = rd.from_items(docs2).repartition(12)
    out2 = remove_repeated_spans(ds, k=4, exact=True).to_pandas() \
        .set_index("doc_id")
    assert out2.loc["a", "removed_tokens"] == 4
    assert out2.loc["b", "removed_tokens"] == 4
    assert out2.loc[[f"z{i}" for i in range(40)],
                    "removed_tokens"].eq(0).all()
