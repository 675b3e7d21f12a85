"""KG-pipeline + training-data-extras queries (registered into the
same registry as the relational ones).

These run over the deterministic synthetic fixtures (interleaved docs
with spans — the driver tables have no spans column) or over the
driver documents/embeddings tables for the dedup / similarity / text
operators. Oracle SQL reads fixture parquet via read_parquet():
goldens are produced by the SINGLE-PROCESS reference oracle
(ner_ray/oracle/reference_oracle.py — no Ray code involved), and the
canonicalization SQL recomputes components independently in DuckDB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ner_ray.constants import CANON_MAX_HOPS
from ner_ray.fixtures.gen import FIXTURE_ROOT
from ner_ray.pipelines.queries import _fx, _rp, q

_SMALL = f"{FIXTURE_ROOT}/small"


# ------------------------------------------------------------ scans


@q("q_scan_documents", sql="SELECT doc_id, text, lang, source, n_chars FROM documents")
def q_scan_documents(sf_dir: str):
    return _rp(sf_dir, "documents")


@q("q_scan_spans", sql=f"""
SELECT doc_id, s.kind AS kind, s.text AS text, s.media_ref AS media_ref,
       s."offset" AS "offset"
FROM (SELECT doc_id, unnest(spans) AS s
      FROM read_parquet('{_SMALL}/docs.parquet'))
""")
def q_scan_spans(_sf_dir: str):
    from ner_ray.sources.io import read_docs
    from ner_ray.stages.spans import flatten_spans

    docs = read_docs(f"{_fx()}/docs.parquet")
    return docs.map_batches(
        lambda t: flatten_spans(t).drop_columns(["span_idx"]),
        batch_format="pyarrow")


@q("q_filter_kind", sql=f"""
SELECT doc_id, s.text AS text, s."offset" AS "offset"
FROM (SELECT doc_id, unnest(spans) AS s
      FROM read_parquet('{_SMALL}/docs.parquet'))
WHERE s.kind = 'text'
""")
def q_filter_kind(_sf_dir: str):
    from ner_ray.sources.io import read_docs
    from ner_ray.stages.spans import flatten_text_spans

    docs = read_docs(f"{_fx()}/docs.parquet")
    return docs.map_batches(
        lambda t: flatten_text_spans(t).drop_columns(["span_idx"]),
        batch_format="pyarrow")


# ------------------------------------------ KG pipeline conformance


_PIPELINE_CACHE: dict[str, dict] = {}


def _small_pipeline() -> dict:
    """Run the flagship ONCE over the small fixture and cache each
    stage materialized (stage-by-stage, so upstream work is shared by
    every KG query instead of re-executing per consumption)."""
    fx = _fx()
    if fx not in _PIPELINE_CACHE:
        import ray.data as rd

        from ner_ray.pipelines.flagship import (
            linked_spans,
            raw_triples,
            tagged_spans,
        )
        from ner_ray.sources.io import read_docs
        from ner_ray.stages.canon import canonicalize_local, resolve_triples
        from ner_ray.stages.dedup import dedup_triples
        from ner_ray.stages.graph import build_adjacency
        from ner_ray.state.model import put_bundle

        bundle = put_bundle(f"{fx}/model.parquet", f"{fx}/alias.parquet")
        tagged = tagged_spans(read_docs(f"{fx}/docs.parquet"),
                              bundle).materialize()
        linked = linked_spans(tagged, bundle).materialize()
        triples = raw_triples(linked).materialize()
        deduped = dedup_triples(triples).materialize()
        alias_ds = rd.read_parquet(f"{fx}/alias.parquet",
                                   columns=["entity_id", "alias"])
        canon = canonicalize_local(alias_ds)
        resolved = resolve_triples(deduped, canon).materialize()
        adjacency = build_adjacency(resolved).materialize()
        _PIPELINE_CACHE[fx] = {
            "tagged": tagged, "linked": linked, "triples": triples,
            "deduped": deduped, "canon": canon, "resolved": resolved,
            "adjacency": adjacency,
        }
    return _PIPELINE_CACHE[fx]


@q("q_mentions", sql=f"""
SELECT doc_id, span_idx, tok_begin, tok_end, char_offset, surface,
       ne_type, score
FROM read_parquet('{_SMALL}/gold_mentions.parquet')
""")
def q_mentions(_sf_dir: str):
    from ner_ray.pipelines.flagship import mention_rows

    out = _small_pipeline()["tagged"].map_batches(
        mention_rows, batch_format="pyarrow")
    return out.select_columns(["doc_id", "span_idx", "tok_begin", "tok_end",
                               "char_offset", "surface", "ne_type", "score"])


@q("q_links", sql=f"""
SELECT doc_id, span_idx, tok_begin, tok_end, entity_id, link_score
FROM read_parquet('{_SMALL}/gold_links.parquet')
""")
def q_links(_sf_dir: str):
    from ner_ray.pipelines.flagship import mention_rows

    out = _small_pipeline()["linked"].map_batches(
        lambda t: mention_rows(t, "links"), batch_format="pyarrow")
    return out.select_columns(["doc_id", "span_idx", "tok_begin", "tok_end",
                               "entity_id", "link_score"])


@q("q_triples", sql=f"""
SELECT subj, pred, obj, doc_id, span_idx, score
FROM read_parquet('{_SMALL}/gold_triples.parquet')
""")
def q_triples(_sf_dir: str):
    return _small_pipeline()["triples"].select_columns(
        ["subj", "pred", "obj", "doc_id", "span_idx", "score"])


@q("q_dedup_triples", sql=f"""
SELECT subj, pred, obj, CAST(count(*) AS BIGINT) AS weight
FROM read_parquet('{_SMALL}/gold_triples.parquet')
GROUP BY subj, pred, obj
""")
def q_dedup_triples(_sf_dir: str):
    return _small_pipeline()["deduped"]


def _canon_sql() -> str:
    """Min-label propagation in pure SQL, CANON_MAX_HOPS rounds over
    the bipartite entity-alias edges — DuckDB recomputes components
    independently of both the oracle and the Ray engine."""
    rounds = []
    prev = "l0"
    base = f"""
WITH e AS (SELECT entity_id, alias
           FROM read_parquet('{_SMALL}/alias.parquet')),
l0 AS (SELECT DISTINCT entity_id, entity_id AS label FROM e)"""
    for i in range(1, CANON_MAX_HOPS + 1):
        rounds.append(f""",
a{i} AS (SELECT e.alias, min(l.label) AS m
         FROM e JOIN {prev} l USING (entity_id) GROUP BY e.alias),
l{i} AS (SELECT e.entity_id, min(a.m) AS label
         FROM e JOIN a{i} a USING (alias) GROUP BY e.entity_id)""")
        prev = f"l{i}"
    return (base + "".join(rounds)
            + f"\nSELECT entity_id, label AS canonical_id FROM {prev}")


@q("q_canon_labels", sql=_canon_sql())
def q_canon_labels(_sf_dir: str):
    import ray.data as rd

    from ner_ray.stages.canon import canonicalize_local

    edges = rd.read_parquet(f"{_fx()}/alias.parquet",
                            columns=["entity_id", "alias"])
    return canonicalize_local(edges)


@q("q_resolved", sql=f"""
SELECT subj, pred, obj, weight
FROM read_parquet('{_SMALL}/gold_resolved.parquet')
""")
def q_resolved(_sf_dir: str):
    return _small_pipeline()["resolved"]


@q("q_adjacency_degree", sql=f"""
WITH res AS (SELECT subj, obj
             FROM read_parquet('{_SMALL}/gold_resolved.parquet')),
deg AS (SELECT subj AS src, CAST(count(*) AS BIGINT) AS degree
        FROM res GROUP BY subj),
und AS (SELECT DISTINCT least(subj, obj) AS a, greatest(subj, obj) AS b
        FROM res WHERE subj <> obj),
nb AS (SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und),
tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM und e1 JOIN und e2 ON e2.a = e1.b
        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
tri_n AS (SELECT node, CAST(count(*) AS BIGINT) AS tri_count FROM (
          SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
          UNION ALL SELECT z FROM tri) GROUP BY node),
two_n AS (SELECT u AS node,
                 CAST(count(DISTINCT w) AS BIGINT) AS two_hop_count
          FROM (SELECT n1.u AS u, n2.v AS w FROM nb n1
                JOIN nb n2 ON n2.u = n1.v WHERE n2.v <> n1.u
                UNION SELECT u, v FROM nb) GROUP BY u)
SELECT deg.src, deg.degree,
       COALESCE(tri_n.tri_count, 0) AS tri_count,
       COALESCE(two_n.two_hop_count, 0) AS two_hop_count
FROM deg LEFT JOIN tri_n ON tri_n.node = deg.src
LEFT JOIN two_n ON two_n.node = deg.src
""")
def q_adjacency_degree(_sf_dir: str):
    """Q5 + graph analytics: per-source degree from the adjacency
    build, plus triangle and 2-hop-reach counts over the undirected
    distinct-pair entity graph (ner_ray/stages/graphops.py) — exact
    integers, value-matched against an independent DuckDB recompute."""
    from ner_ray.stages.graphops import (
        grouped_join,
        triangle_counts,
        two_hop_counts,
        undirected_edges,
    )

    p = _small_pipeline()
    adj = p["adjacency"].select_columns(["src", "degree"])
    und = undirected_edges(p["resolved"]).materialize()
    tri = triangle_counts(und)
    two = two_hop_counts(und)
    ty = {"src": pa.string(), "degree": pa.int64(), "node": pa.string(),
          "tri_count": pa.int64(), "two_hop_count": pa.int64()}
    out = grouped_join(adj, tri, "src", "node", ["src", "degree"],
                       ["node", "tri_count"], ty, how="left outer")
    out = grouped_join(out, two, "src", "node",
                       ["src", "degree", "tri_count"],
                       ["node", "two_hop_count"], ty, how="left outer")
    return out.map_batches(
        lambda t: pa.table({
            "src": t.column("src"),
            "degree": t.column("degree"),
            "tri_count": pc.fill_null(t.column("tri_count"), 0),
            "two_hop_count": pc.fill_null(t.column("two_hop_count"), 0),
        }), batch_format="pyarrow")


@q("q_topk_entities", sql=f"""
SELECT entity_id, CAST(count(*) AS BIGINT) AS n_mentions
FROM read_parquet('{_SMALL}/gold_links.parquet')
GROUP BY entity_id ORDER BY n_mentions DESC, entity_id LIMIT 20
""")
def q_topk_entities(_sf_dir: str):
    """G6 heavy-hitter probe: partial counts -> groupby sum -> top-k.
    This is the stage that picks salt keys for skewed shuffles."""
    from ray.data.aggregate import Sum

    from ner_ray.pipelines.flagship import mention_rows

    links = _small_pipeline()["linked"].map_batches(
        lambda t: mention_rows(t, "links"), batch_format="pyarrow")

    def partial(t: pa.Table) -> pa.Table:
        g = t.select(["entity_id"]).group_by(["entity_id"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["entity_id", "n"])

    counts = links.map_batches(partial, batch_format="pyarrow") \
        .groupby("entity_id").aggregate(Sum("n", alias_name="n_mentions"))
    return counts.sort(["n_mentions", "entity_id"],
                       descending=[True, False]).limit(20)


@q("q_span_invariant", sql=f"""
SELECT doc_id, TRUE AS equal
FROM read_parquet('{_SMALL}/docs.parquet')
""")
def q_span_invariant(_sf_dir: str):
    """Q6 as a query: per-doc boolean span-sequence equality between
    annotated output and input. The invariant IS the oracle: every
    input doc must appear exactly once with equal=TRUE, so the SQL
    side enumerates the fixture's doc ids with the constant — a
    dropped/fabricated doc breaks the row count, a mutated span
    sequence breaks the value hash (equal=False). Also a pytest."""
    import ray.data as rd

    from ner_ray.stages.annotate import AnnotateDocsActor
    from ner_ray.state.model import put_bundle

    fx = _fx()
    docs = rd.read_parquet(f"{fx}/docs.parquet")
    bundle = put_bundle(f"{fx}/model.parquet", f"{fx}/alias.parquet")
    annotated = docs.map_batches(
        AnnotateDocsActor, fn_constructor_kwargs={"bundle": bundle},
        batch_format="pyarrow", concurrency=(1, 4), num_cpus=1)

    # distributed check: per-doc signatures never leave the cluster —
    # a Dataset full-outer join + boolean kernel (spans.py) replaces
    # the old driver-side pandas merge.
    from ner_ray.stages.spans import span_invariant_verdicts

    return span_invariant_verdicts(docs, annotated)


@q("q_train_eval", sql=f"""
SELECT epochs_run, first_epoch_errors, last_epoch_errors, total_errors,
       n_sequences, model_rows, weight_checksum
FROM read_parquet('{FIXTURE_ROOT}/tiny/gold_train_metrics.parquet')
""")
def q_train_eval(_sf_dir: str):
    """A5: distributed perceptron training (iterative parameter
    mixing) on the tiny fixture's labeled sequences; returns one row
    of training metrics including an L1 weight checksum.
    VALUE-matched: ``deterministic_buckets`` makes the distributed
    trainer layout/parallelism-independent (content-hash buckets,
    ascending-hash order within, ascending-bucket mixing), and the
    golden is produced by a single-process replay with an
    independently re-implemented epoch loop and scalar Viterbi
    (ner_ray/oracle/train_oracle.py — no Ray involvement). The trained
    model exports to the standard model table and is evaluated through
    the unmodified tagger (tests/test_train.py asserts the F1;
    tests/test_train_deterministic.py asserts bitwise weight equality
    across layouts and vs the oracle)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from ner_ray.fixtures.gen import ensure_fixtures
    from ner_ray.oracle.train_oracle import (
        TRAIN_EVAL_BUCKETS,
        TRAIN_EVAL_EPOCHS,
        train_metrics_table,
        training_sequences,
    )
    from ner_ray.stages.train import train_perceptron

    fx = ensure_fixtures("tiny")
    rows = training_sequences(
        pq.read_table(f"{fx}/docs.parquet").to_pylist(),
        pq.read_table(f"{fx}/gold_mentions.parquet").to_pylist())
    alias_tbl = pq.read_table(f"{fx}/alias.parquet")
    alias_types = dict(zip(alias_tbl.column("alias").to_pylist(),
                           alias_tbl.column("ne_type").to_pylist()))
    seq_ds = rd.from_arrow(pa.Table.from_pylist(rows))
    weights, history = train_perceptron(
        seq_ds, alias_types, epochs=TRAIN_EVAL_EPOCHS,
        deterministic_buckets=TRAIN_EVAL_BUCKETS)
    return train_metrics_table(weights, history)


@q("q_posterior", sql=f"""
SELECT doc_id, span_idx, tok_idx, token, tag, post
FROM read_parquet('{_SMALL}/gold_posteriors.parquet')
""")
def q_posterior(_sf_dir: str):
    """A2 forward-backward confidence: one row per token with the
    Viterbi tag and its marginal probability (reference --post mode).
    VALUE-matched: the golden is produced by an INDEPENDENT sequential
    log-space forward-backward in the frozen oracle
    (reference_oracle.posterior_marginals — per-position scalar loops,
    no shared code with the batched padded kernel in
    stages/tagger._posteriors_batch), over oracle-side tokenization,
    features and emissions; both sides round half-even at 6 dp. The
    batched kernel is additionally validated against brute-force path
    enumeration in tests/test_posterior.py."""
    import ray.data as rd

    from ner_ray.stages.spans import flatten_text_spans
    from ner_ray.stages.tagger import PosteriorActor
    from ner_ray.state.model import put_bundle

    fx = _fx()
    docs = rd.read_parquet(f"{fx}/docs.parquet")
    bundle = put_bundle(f"{fx}/model.parquet", f"{fx}/alias.parquet")
    spans = docs.map_batches(flatten_text_spans, batch_format="pyarrow")
    return spans.map_batches(
        PosteriorActor, fn_constructor_kwargs={"bundle": bundle},
        batch_format="pyarrow", concurrency=(1, 4), num_cpus=1)


# ------------------------------------------------- text analysis


@q("q_text_stats", sql=r"""
WITH w AS (SELECT doc_id, text, str_split(text, ' ') AS ws FROM documents),
g2 AS (
  SELECT doc_id, max(c) * 1.0 AS topc, sum(c) * 1.0 AS tot FROM (
    SELECT doc_id, g, count(*) AS c FROM (
      SELECT doc_id, unnest(list_transform(range(1, len(ws)),
                     i -> ws[i] || ' ' || ws[i+1])) AS g FROM w)
    GROUP BY doc_id, g) GROUP BY doc_id),
g5 AS (
  SELECT doc_id, count(*) * 1.0 AS tot, count(DISTINCT g) * 1.0 AS dst
  FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(ws) - 3),
                   i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' '
                        || ws[i+3] || ' ' || ws[i+4])) AS g FROM w)
  GROUP BY doc_id)
SELECT w.doc_id,
       CAST(len(ws) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(
           text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpeish,
       regexp_replace(lower(text), '[0-9]', '0', 'g') AS norm_text,
       CAST(length(text) AS BIGINT) AS n_chars_computed,
       length(replace(text, ' ', '')) * 1.0
           / greatest(len(ws), 1) AS mean_word_len,
       len(list_distinct(ws)) * 1.0
           / greatest(len(ws), 1) AS uniq_ratio,
       coalesce(g2.topc / greatest(g2.tot, 1.0), 0.0) AS top2gram_frac,
       coalesce((g5.tot - g5.dst) / greatest(g5.tot, 1.0), 0.0)
           AS dup5gram_frac
FROM w LEFT JOIN g2 USING (doc_id) LEFT JOIN g5 USING (doc_id)
""")
def q_text_stats(sf_dir: str):
    """Fused text-analysis entry: whitespace token count, BPE-ish regex
    count, digit-normalized text, quality metrics and Gopher-shaped
    repetition signals (top-2-gram fraction, duplicate-5-gram fraction)
    in ONE actor-pool pass (one graded entry for six operators — the
    standalone kernels remain in textstats.py; merged for the driver's
    50-row correctness budget)."""
    from ner_ray.stages.textstats import TextStatsStage

    return _rp(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        TextStatsStage, batch_format="pyarrow", concurrency=(1, 4),
        num_cpus=1)


def _q_doc_signals_sql() -> str:
    """Full-oracle SQL for q_doc_signals. Every column recomputed
    relationally: stopword-profile language ID (same single-space
    split, same hit/denominator arithmetic, argmax with lexicographic
    ties), corpus-trained unigram-LM mean -log p (assumes vocabulary
    < train_unigram's top_k, true at every graded sf, so no top-K cut
    applies), and the portable hashes (FNV-1a-over-code-points +
    splitmix64 — bit-exact, tests/test_hashing.py). round_even matches
    np.round's half-even semantics (verified over adversarial exact
    halves)."""
    from ner_ray.stages.textstats import STOPWORDS
    from ner_ray.util.hashing import (
        sql_combine_steps,
        sql_int_hash_steps,
        sql_steps_to_ctes,
        sql_text_hash_steps,
    )

    langs = sorted(STOPWORDS)
    score_cols = []
    for lang in langs:
        words = ", ".join(f"'{w}'" for w in sorted(STOPWORDS[lang]))
        score_cols.append(
            f"CAST(len(list_filter(ws, x -> x IN ({words}))) AS DOUBLE)"
            f" / greatest(len(ws), 1) AS s_{lang}")
    m = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    pred = ("CASE " + " ".join(
        f"WHEN s_{lang} = _m THEN '{lang}'" for lang in langs) + " END")

    tsteps, tcol = sql_text_hash_steps("text", "t")
    isteps, icol = sql_int_hash_steps("doc_id", "i")
    csteps, ccol = sql_combine_steps([icol, tcol], "r")
    hct, hfin = sql_steps_to_ctes(
        "SELECT doc_id, text FROM documents",
        tsteps + isteps + csteps, "dh")

    return f"""
WITH w AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                            x -> x <> '')) AS tok
  FROM documents),
c AS (SELECT tok, count(*) AS n FROM w GROUP BY tok),
tot AS (SELECT sum(n) AS s FROM c),
sc AS (SELECT doc_id, sum(-ln(CAST(n AS DOUBLE) / s)) / count(*) AS raw
       FROM w JOIN c USING (tok), tot GROUP BY doc_id),
lw AS (SELECT doc_id, string_split(lower(text), ' ') AS ws
       FROM documents),
ls AS (SELECT doc_id, {", ".join(score_cols)} FROM lw),
lm AS (SELECT *, {m} AS _m FROM ls),
{hct}
SELECT h.doc_id,
       {pred} AS pred_lang,
       round_even(lm._m, 6) AS lang_score,
       lower(lpad(hex(CAST({tcol} AS UBIGINT)), 16, '0')) AS fingerprint,
       coalesce(round_even(sc.raw, 6), 0.0) AS lm_score,
       lower(lpad(hex(CAST({ccol} AS UBIGINT)), 16, '0')) AS row_hash
FROM {hfin} h
JOIN lm USING (doc_id)
LEFT JOIN sc USING (doc_id)
"""


@q("q_doc_signals", sql=_q_doc_signals_sql())
def q_doc_signals(sf_dir: str):
    """Fused language-ID + document fingerprint + portable multi-column
    row hash + corpus-trained unigram-LM quality score. VALUE-matched:
    the hashes use the portable code-point-FNV/splitmix path
    (hashing.portable_text_hash / splitmix_hash, bit-exact in DuckDB),
    and the stopword heuristic + LM mean -log p are recomputed
    relationally in _q_doc_signals_sql (LM equivalence also in
    tests/test_lmscore.py; merged entry for the driver's 50-row
    correctness budget)."""
    from ner_ray.stages.lmscore import score_docs, train_unigram
    from ner_ray.stages.textstats import DocSignalsStage
    from ner_ray.util.hashing import combine_hashes, splitmix_hash

    class SignalsWithRowHash(DocSignalsStage):
        def __call__(self, batch: pa.Table) -> pa.Table:
            # the base stage rebuilds its table from (doc_id, text);
            # carry the upstream lm_score column through explicitly,
            # and reuse the fingerprint's text hash for the row hash
            # (the code-point fold dominates this stage's cost)
            out, h_text = self.with_fingerprint(batch)
            out = out.append_column("lm_score", batch.column("lm_score"))
            h = combine_hashes(splitmix_hash(batch.column("doc_id")),
                               h_text)
            return out.append_column(
                "row_hash", pa.array([f"{x:016x}" for x in h], pa.string()))

    docs = _rp(sf_dir, "documents", ["doc_id", "text"])
    model = train_unigram(docs)
    return score_docs(docs, model).map_batches(
        SignalsWithRowHash, batch_format="pyarrow", concurrency=(1, 4),
        num_cpus=1)


# ------------------------------------------------------ dedup suite


@q("q_dedup_exact", sql="""
SELECT min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS n_dups
FROM documents GROUP BY text
""")
def q_dedup_exact(sf_dir: str):
    from ner_ray.stages.neardup import exact_dedup

    return exact_dedup(_rp(sf_dir, "documents", ["doc_id", "text"]))


def _q_neardup_pairs_sql() -> str:
    """Full-oracle SQL for q_neardup_pairs: with shingle/word hashing
    on the portable path, DuckDB replays BOTH detectors end-to-end —
    minhash signatures (same uint64-wrap permutations mod 2^61-1),
    the band-hash fold, band-bucket candidate pairs, the exact
    shingle-Jaccard verify, the simhash sign-sum fingerprints and the
    brute-force Hamming<=k pair scan (exactness of the clean-block
    banding means brute force IS the contract). Integer arithmetic
    throughout except the Jaccard division (same int-ratio double both
    sides, round_even == np.round)."""
    from ner_ray.stages.neardup import _A, _B, _MERSENNE
    from ner_ray.util.hashing import (
        _GOLDEN,
        _sql_mul64,
        _sql_mul64_var,
        sql_steps_to_ctes,
        sql_text_hash_steps,
    )

    perm_rows = ", ".join(
        f"({i}, {int(a)}::HUGEINT, {int(b)}::HUGEINT)"
        for i, (a, b) in enumerate(zip(_A, _B)))
    t64 = "18446744073709551616::HUGEINT"
    ssteps, scol = sql_text_hash_steps("sh", "s")
    sct, sfin = sql_steps_to_ctes("SELECT doc_id, sh FROM shing",
                                  ssteps, "sh")
    wsteps, wcol = sql_text_hash_steps("w", "w")
    wct, wfin = sql_steps_to_ctes("SELECT doc_id, w FROM swords",
                                  wsteps, "wh")
    hv = f"((({_sql_mul64_var(scol, 'p.a')}) + p.b) % {t64}) " \
         f"% {int(_MERSENNE)}::HUGEINT"
    band_fold = (
        f"list_reduce(list_prepend({int(_GOLDEN)}::HUGEINT, svs), "
        f"(acc, s) -> {_sql_mul64('xor(acc, s)', 0x100000001B3)})")
    signed = ("CASE WHEN {f} >= 9223372036854775808::HUGEINT "
              f"THEN CAST({{f}} - {t64} AS BIGINT) "
              "ELSE CAST({f} AS BIGINT) END")
    ws_chars = "' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)"
    return f"""
WITH wlist AS (
  SELECT doc_id, list_filter(regexp_split_to_array(coalesce(text, ''),
                                                   '\\s+'),
                             x -> x <> '') AS ws
  FROM documents),
shing AS (
  SELECT doc_id, unnest(list_transform(range(1, len(ws) - 1),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
  FROM wlist),
{sct},
perms(i, a, b) AS (VALUES {perm_rows}),
sig AS (
  SELECT doc_id, p.i, min({hv}) AS sv
  FROM {sfin} s CROSS JOIN perms p GROUP BY doc_id, p.i),
bnd AS (
  SELECT doc_id, CAST(i // 4 AS INT) AS band_id,
         list(sv ORDER BY i) AS svs
  FROM sig GROUP BY doc_id, i // 4),
bh AS (SELECT doc_id, band_id, {band_fold} AS band_hash FROM bnd),
mcand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bh a JOIN bh b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id),
cs AS (SELECT DISTINCT doc_id, sh FROM shing),
csz AS (SELECT doc_id, count(*) AS m FROM cs GROUP BY doc_id),
mint AS (
  SELECT p.doc_a, p.doc_b, count(*) AS ic
  FROM mcand p
  JOIN cs a ON a.doc_id = p.doc_a
  JOIN cs b ON b.doc_id = p.doc_b AND b.sh = a.sh
  GROUP BY p.doc_a, p.doc_b),
mj AS (
  SELECT p.doc_a, p.doc_b,
         round_even(CAST(coalesce(ic, 0) AS DOUBLE)
                    / greatest(CAST(sa.m AS DOUBLE) + CAST(sb.m AS DOUBLE)
                               - CAST(coalesce(ic, 0) AS DOUBLE), 1.0),
                    6) AS jaccard
  FROM mcand p
  LEFT JOIN mint USING (doc_a, doc_b)
  JOIN csz sa ON sa.doc_id = p.doc_a
  JOIN csz sb ON sb.doc_id = p.doc_b),
swords AS (SELECT doc_id, unnest(ws) AS w FROM wlist),
{wct},
votes AS (
  SELECT doc_id, j,
         sum(CASE WHEN ({wcol} >> j) % 2 = 1 THEN 1 ELSE -1 END) AS v
  FROM {wfin} CROSS JOIN (SELECT unnest(range(64)) AS j) GROUP BY doc_id, j),
fp AS (
  SELECT doc_id,
         sum(CASE WHEN v > 0 THEN (1::HUGEINT << j)
             ELSE 0::HUGEINT END) AS f
  FROM votes GROUP BY doc_id),
nonempty AS (
  SELECT doc_id FROM documents
  WHERE trim(coalesce(text, ''), {ws_chars}) <> ''),
spairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         bit_count(xor({signed.format(f='a.f')},
                       {signed.format(f='b.f')})) AS ham
  FROM fp a JOIN fp b ON a.doc_id < b.doc_id
  JOIN nonempty na ON na.doc_id = a.doc_id
  JOIN nonempty nb ON nb.doc_id = b.doc_id)
SELECT 'minhash' AS method, doc_a, doc_b, jaccard AS score
FROM mj WHERE jaccard >= 0.7
UNION ALL
SELECT 'simhash' AS method, doc_a, doc_b, CAST(ham AS DOUBLE) AS score
FROM spairs WHERE ham <= 3
"""


@q("q_neardup_pairs", sql=_q_neardup_pairs_sql())
def q_neardup_pairs(sf_dir: str):
    """MinHash-LSH (banded candidates + exact-Jaccard verify) AND
    SimHash (clean-block-subset banding, exact for Hamming<=k) near-dup
    pair listings in one graded entry, marked by the method column
    (merged for the driver's 50-row correctness budget). VALUE-matched:
    shingle/word hashes use the portable code-point-FNV/splitmix path,
    so _q_neardup_pairs_sql replays signatures, banding, candidate
    buckets and both verifies relationally in DuckDB. score = jaccard
    for minhash rows, hamming distance for simhash rows."""
    from ner_ray.stages.neardup import minhash_near_dups, simhash_near_dups

    def mark(method, score_col):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table({
                "method": pa.array([method] * len(t), pa.string()),
                "doc_a": t.column("doc_a"),
                "doc_b": t.column("doc_b"),
                "score": pc.cast(t.column(score_col), pa.float64()),
            })

        return fn

    mh = minhash_near_dups(_rp(sf_dir, "documents", ["doc_id", "text"]),
                           threshold=0.7) \
        .map_batches(mark("minhash", "jaccard"), batch_format="pyarrow")
    sh = simhash_near_dups(_rp(sf_dir, "documents", ["doc_id", "text"]),
                           max_hamming=3) \
        .map_batches(mark("simhash", "hamming"), batch_format="pyarrow")
    return mh.union(sh)


# ONE definition of the word-set Jaccard both engines use — shared by
# q_ngram_jaccard (its output column) and q_near_dedup_docs (its edge
# predicate), so the "identical edge set" claim can't drift
_JACCARD_EXPR = """len(list_intersect(list_distinct(str_split(a.text, ' ')),
                          list_distinct(str_split(b.text, ' ')))) * 1.0
           / greatest(len(list_distinct(list_concat(
                 str_split(a.text, ' '), str_split(b.text, ' ')))), 1)"""


@q("q_ngram_jaccard", sql=f"""
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       {_JACCARD_EXPR}
           AS jaccard
FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
""")
def q_ngram_jaccard(sf_dir: str):
    """Word-set Jaccard of consecutive doc pairs: a self hash-join on
    a computed partner key + vectorized set overlap (explode/merge)."""
    from ner_ray.functions.joins import hash_join

    a = _rp(sf_dir, "documents", ["doc_id", "text"])
    b = _rp(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        lambda t: pa.table({
            "partner": pc.subtract(t.column("doc_id"), 1),
            "doc_b": t.column("doc_id"),
            "text_b": t.column("text")}),
        batch_format="pyarrow")
    j = hash_join(a, b, "doc_id", "partner", num_partitions=4)

    def jaccard(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if n == 0:
            return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                                 "doc_b": pd.Series([], dtype="int64"),
                                 "jaccard": pd.Series([], dtype="float64")})
        wa = df["text"].str.split()
        wb = df["text_b"].str.split()

        def explode(w):
            c = w.str.len().to_numpy(dtype=np.int64)
            return pd.DataFrame({
                "i": np.repeat(np.arange(n), c),
                "w": w.explode(ignore_index=True).dropna().to_numpy(),
            }).drop_duplicates()

        ea, eb = explode(wa), explode(wb)
        na = ea.groupby("i").size().reindex(range(n), fill_value=0)
        nb = eb.groupby("i").size().reindex(range(n), fill_value=0)
        inter = ea.merge(eb, on=["i", "w"]).groupby("i").size() \
            .reindex(range(n), fill_value=0)
        union = (na + nb - inter).to_numpy().astype(float)
        jac = inter.to_numpy() / np.maximum(union, 1.0)
        return pd.DataFrame({"doc_a": df["doc_id"].to_numpy(),
                             "doc_b": df["doc_b"].to_numpy(),
                             "jaccard": jac})

    return j.map_batches(jaccard, batch_format="pandas")


@q("q_near_dedup_docs", sql=f"""
SELECT doc_id, source, n_chars FROM documents
WHERE doc_id NOT IN (
  SELECT b.doc_id
  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
  WHERE {_JACCARD_EXPR} >= 0.85)
""")
def q_near_dedup_docs(sf_dir: str):
    """Corpus-level near-duplicate REMOVAL, value-matched end to end:
    the duplicate relation is the deterministic consecutive-pair
    word-set Jaccard (same kernel + SQL expression as q_ngram_jaccard,
    so both engines see the identical edge set), then the full removal
    machinery runs distributed — connected components (canon size
    dispatch), min-id survivor per component, anti-filter of the
    corpus. Consecutive edges chain into runs, so DuckDB's oracle needs
    no recursion: a doc is dropped iff its predecessor edge exists
    (the run head is the min-id survivor). The probabilistic detector
    fronts (minhash/simhash/embedding) of the same operator are graded
    by q_neardup_pairs and pytest."""
    from ner_ray.stages.neardup import near_dedup_docs

    docs = _rp(sf_dir, "documents", ["doc_id", "text", "source", "n_chars"])
    edges = q_ngram_jaccard(sf_dir).map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("jaccard"), 0.85))
                   .select(["doc_a", "doc_b"]),
        batch_format="pyarrow")
    kept = near_dedup_docs(docs, pairs_ds=edges)
    return kept.select_columns(["doc_id", "source", "n_chars"])


# ONE n-gram expression both engines' decontamination leg derives
# from: every 13-word window of text, space-joined (ws[i:i+12] is the
# 13-element inclusive DuckDB slice)
_NGRAMS_13 = """list_transform(
    range(1, greatest(len(str_split({t}, ' ')) - 11, 1)),
    i -> array_to_string(str_split({t}, ' ')[i:i+12], ' '))"""


@q("q_clean_corpus", sql=f"""
WITH m AS (
  SELECT doc_id, source, n_chars, text,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(str_split(text, ' ')) END AS nw,
         length(replace(text, ' ', '')) * 1.0
             / greatest(len(str_split(text, ' ')), 1) AS mwl,
         len(list_distinct(str_split(text, ' '))) * 1.0
             / greatest(len(str_split(text, ' ')), 1) AS uq
  FROM documents WHERE doc_id % 10 <> 3),
f AS (SELECT * FROM m
      WHERE nw >= 25 AND mwl >= 4.0 AND mwl <= 5.1 AND uq >= 0.35),
d AS (SELECT doc_id, source, n_chars, text FROM f
      WHERE doc_id IN (SELECT min(doc_id) FROM f GROUP BY text)),
ev AS (SELECT DISTINCT unnest({_NGRAMS_13.format(t='text')}) AS g
       FROM documents WHERE doc_id % 10 = 3),
con AS (SELECT DISTINCT doc_id FROM (
          SELECT doc_id, unnest({_NGRAMS_13.format(t='text')}) AS g
          FROM d) WHERE g IN (SELECT g FROM ev))
SELECT doc_id, source, n_chars FROM d
WHERE doc_id NOT IN (SELECT doc_id FROM con)
""")
def q_clean_corpus(sf_dir: str):
    """C4-style corpus cleaning, value-matched end to end: fused
    quality filter (word count / mean word length / distinct-word
    ratio — the same kernels q_text_stats value-matches column by
    column), exact dedup with min-id survivors, then BENCHMARK
    DECONTAMINATION — docs with doc_id % 10 == 3 act as the held-out
    eval set and every surviving train doc sharing a 13-word n-gram
    with it is dropped (the standard n=13 recipe; stages/decontam.py,
    map-only broadcast path). Ray matches n-grams by seed-stable
    64-bit hash, the oracle by string — the same hash-equality
    contract exact dedup value-matches under. Thresholds sit inside
    the synthetic corpus's metric spread so every leg genuinely drops
    rows at sf0.01. The language-ID leg of the filter is engine-
    specific and is exercised by q_doc_signals and
    tests/test_clean_corpus.py."""
    from ner_ray.pipelines.clean import clean_corpus

    def is_train(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 10 != 3))

    def is_eval(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 10 == 3))

    docs = _rp(sf_dir, "documents",
               ["doc_id", "text", "source", "n_chars"]) \
        .map_batches(is_train, batch_format="pyarrow")
    eval_ds = _rp(sf_dir, "documents", ["doc_id", "text"]) \
        .map_batches(is_eval, batch_format="pyarrow")
    out = clean_corpus(docs, min_words=25, min_mean_word_len=4.0,
                       max_mean_word_len=5.1, min_uniq_ratio=0.35,
                       langs=None, dedup=True,
                       decontaminate_against=eval_ds, decontam_n=13)
    return out.select_columns(["doc_id", "source", "n_chars"])


# --------------------------------------------------- similarity search


@q("q_ann_topk", sql="""
SELECT e.vec_id,
       round(list_cosine_similarity(e.embedding::DOUBLE[],
                                    q.embedding::DOUBLE[]), 6) AS sim
FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
WHERE e.vec_id <> 0
ORDER BY sim DESC, e.vec_id LIMIT 10
""")
def q_ann_topk(sf_dir: str):
    import pyarrow.parquet as pq

    from ner_ray.stages.similarity import _to_matrix, ann_topk

    qtbl = pq.read_table(f"{sf_dir}/embeddings.parquet").filter(
        pc.equal(pc.field("vec_id"), 0))
    qvec = _to_matrix(qtbl.column("embedding"))[0]
    out = ann_topk(_rp(sf_dir, "embeddings", ["vec_id", "embedding"]),
                   qvec, k=10, exclude_ids={0})
    return out.select_columns(["vec_id", "sim"])


def _q_ann_lsh_sql() -> str:
    """Full-oracle SQL for q_ann_lsh: the seeded hyperplanes are
    embedded as exact (repr round-trip) double literals, buckets are
    recomputed as sign patterns of raw dot products (sign-equivalent
    to the normalized dots the stage uses — positive scaling), the
    Hamming<=1 probe is bit_count(xor), and candidates score exact
    cosine (round_even 6 matches np.round). Assumes the embeddings
    table has 64-d vectors and vec_id 0 as the query, as every graded
    sf does."""
    from ner_ray.stages.similarity import N_PLANES, _planes_for

    planes = _planes_for(64, 42)
    rows = ", ".join(
        f"({b}, [{', '.join(repr(float(x)) for x in planes[b])}]::DOUBLE[])"
        for b in range(N_PLANES))
    return f"""
WITH p(b, pv) AS (VALUES {rows}),
qv AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0),
qb AS (
  SELECT sum(CASE WHEN list_dot_product(p.pv, qv.v) > 0
             THEN (1::BIGINT << b) ELSE 0 END) AS bucket
  FROM p, qv),
eb AS (
  SELECT e.vec_id,
         sum(CASE WHEN list_dot_product(p.pv, e.embedding::DOUBLE[]) > 0
             THEN (1::BIGINT << b) ELSE 0 END) AS bucket
  FROM embeddings e, p GROUP BY e.vec_id)
SELECT e.vec_id,
       round_even(list_cosine_similarity(e.embedding::DOUBLE[], qv.v),
                  6) AS sim
FROM eb JOIN embeddings e USING (vec_id), qb, qv
WHERE bit_count(xor(eb.bucket, qb.bucket)) <= 1
ORDER BY sim DESC, e.vec_id LIMIT 10
"""


@q("q_ann_lsh", sql=_q_ann_lsh_sql())
def q_ann_lsh(sf_dir: str):
    """LSH-bucketed approximate ANN (scale path; recall vs brute force
    asserted in tests). VALUE-matched: the bucket probe and cosine
    scoring replay in DuckDB via _q_ann_lsh_sql (the hyperplane matrix
    is deterministic from the seed and embeds as exact literals)."""
    import pyarrow.parquet as pq

    from ner_ray.stages.similarity import _to_matrix, lsh_ann_topk

    qtbl = pq.read_table(f"{sf_dir}/embeddings.parquet").filter(
        pc.equal(pc.field("vec_id"), 0))
    qvec = _to_matrix(qtbl.column("embedding"))[0]
    return lsh_ann_topk(_rp(sf_dir, "embeddings", ["vec_id", "embedding"]),
                        qvec, k=10)


@q("q_embed_dup_pairs", sql="""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[],
                                    b.embedding::DOUBLE[]), 6) AS sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[],
                             b.embedding::DOUBLE[]) >= 0.45
""")
def q_embed_dup_pairs(sf_dir: str):
    """Cosine near-dup pairs — pinned to the EXACT path because this
    entry carries an exact-match SQL oracle (the size-dispatching
    cosine_dup_pairs would silently switch to the approximate banded-
    LSH path above 200k rows and break the value match; the dispatcher
    and the LSH scale path are library API, recall-tested separately).
    Threshold 0.45 is tuned to the synthetic embeddings' similarity
    distribution (random 64-d vectors peak ~0.5) so the result is
    non-empty at every sf."""
    from ner_ray.stages.similarity import cosine_dup_pairs_exact

    return cosine_dup_pairs_exact(_rp(sf_dir, "embeddings",
                                      ["vec_id", "embedding"]),
                                  threshold=0.45)


@q("q_hll_distinct", sql="""
SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct_users,
       TRUE AS approx_ok
FROM events
""")
def q_hll_distinct(sf_dir: str):
    """HLL approx-distinct users, epsilon-banded against the EXACT
    distributed distinct count (two-phase: per-batch distinct partials
    -> groupby -> row count; no driver materialization of values). The
    value match asserts both the exact count and that the sketch lands
    within the 10% band (approx_ok TRUE on the SQL side)."""
    from ner_ray.functions.aggregates import approx_distinct

    ds = _rp(sf_dir, "events", ["user_id"]).materialize()
    est = approx_distinct(ds, "user_id")
    partials = ds.map_batches(
        lambda t: t.group_by("user_id").aggregate([]),
        batch_format="pyarrow")
    exact = partials.groupby("user_id").count().count()
    return pa.table({
        "exact_distinct_users": pa.array([exact], pa.int64()),
        "approx_ok": pa.array([abs(est - exact) / max(exact, 1) <= 0.1]),
    })


def _q_sample_sql() -> str:
    """Full-oracle SQL for q_sample: the integer-id sampling uniform
    is PORTABLE (splitmix64 + combine — hashing.sql_sample_uniform_ctes
    emits the bit-exact DuckDB form, verified in tests/test_hashing.py),
    so every keep decision of the blocklist -> per-domain-cap -> mix
    chain is recomputed relationally: same uniform, same (u, id) cap
    order, same IEEE mix-fraction arithmetic as mix_fractions()."""
    from ner_ray.util.hashing import sql_sample_uniform_ctes

    uct, ufinal = sql_sample_uniform_ctes(
        "SELECT doc_id, source, domain FROM passed", "doc_id", 42)
    d = "::DOUBLE"
    tot = f"((0.5{d} + 0.3{d}) + 0.2{d})"
    w = {k: f"({v}{d} / {tot})"
         for k, v in (("src0", 0.5), ("src1", 0.3), ("src2", 0.2))}
    return f"""
WITH base AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 7 = 0 THEN 'spam.example.org'
              ELSE coalesce(source, 'none') || '.example.com'
         END AS domain
  FROM documents),
passed AS (
  SELECT * FROM base
  WHERE NOT (domain = 'example.org' OR domain LIKE '%.example.org')),
{uct},
capped AS (
  SELECT doc_id, source, _u FROM (
    SELECT doc_id, source, _u,
           row_number() OVER (PARTITION BY domain
                              ORDER BY _u, doc_id) AS _rn
    FROM {ufinal}) WHERE _rn <= 15),
cnt AS (
  SELECT CAST(count(*) FILTER (source = 'src0') AS DOUBLE) AS c0,
         CAST(count(*) FILTER (source = 'src1') AS DOUBLE) AS c1,
         CAST(count(*) FILTER (source = 'src2') AS DOUBLE) AS c2
  FROM capped),
fr AS (
  SELECT least(1.0{d}, (least(c0 / {w['src0']}, c1 / {w['src1']},
                              c2 / {w['src2']}) * {w['src0']}) / c0) AS f0,
         least(1.0{d}, (least(c0 / {w['src0']}, c1 / {w['src1']},
                              c2 / {w['src2']}) * {w['src1']}) / c1) AS f1,
         least(1.0{d}, (least(c0 / {w['src0']}, c1 / {w['src1']},
                              c2 / {w['src2']}) * {w['src2']}) / c2) AS f2
  FROM cnt)
SELECT capped.doc_id, capped.source
FROM capped, fr
WHERE _u < CASE capped.source WHEN 'src0' THEN f0 WHEN 'src1' THEN f1
           WHEN 'src2' THEN f2 ELSE 0.0{d} END
"""


@q("q_sample", sql=_q_sample_sql())
def q_sample(sf_dir: str):
    """O4 sampling + URL/domain curation in one graded chain (merged
    for the driver's 50-row budget): synthesize a deterministic url
    per doc (every 7th lands on a blocklisted host), then C4-style
    blocklist filter (subdomain suffix matching) -> per-domain cap
    (keep the ``cap`` smallest seed-stable id-hash uniforms per hot
    domain — a deterministic random sample of each domain) ->
    deterministic domain mixing (stages/sampling.py: per-batch domain
    counting, mix_fractions with the scarcest domain binding at 1.0,
    stratified hash-threshold sample). Every keep decision is a pure
    function of (doc_id, seed) — identical on any block layout,
    cluster size or retry, unlike Ray's random_sample. VALUE-matched:
    integer-id uniforms use the portable splitmix64 path
    (hashing.splitmix_hash), which the oracle SQL recomputes
    bit-exactly (_q_sample_sql), so blocklist, cap order and the
    IEEE mix-fraction thresholds all replicate in DuckDB; layout
    independence and mixture math in tests/test_sampling.py,
    order="id" cap equivalence in tests/test_urlfilter.py."""
    from ner_ray.stages.sampling import downsample_to_mix
    from ner_ray.stages.urlfilter import cap_per_domain, filter_blocklist

    def with_url(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        src = t.column("source").to_pandas().fillna("none")
        host = np.where(ids % 7 == 0, "spam.example.org",
                        src + ".example.com")
        urls = pd.Series(host) + "/p/" + pd.Series(ids).astype(str)
        return t.append_column(
            "url", pa.array("http://" + urls, pa.string()))

    docs = _rp(sf_dir, "documents", ["doc_id", "source"]) \
        .map_batches(with_url, batch_format="pyarrow")
    kept = filter_blocklist(docs, ["example.org"])
    from ner_ray.stages.urlfilter import add_domain_column

    # ~21 docs/domain survive the blocklist at every sf; cap=15 binds
    # on every domain so the cap leg genuinely drops rows
    capped = cap_per_domain(add_domain_column(kept), cap=15)
    sampled, _fracs = downsample_to_mix(
        capped, {"src0": 0.5, "src1": 0.3, "src2": 0.2})
    return sampled.drop_columns(["url", "domain"])


# ------------------------------------------------------- multimodal


@q("q_media", sql=f"""
SELECT * FROM read_parquet('{_SMALL}/gold_media.parquet')
""")
def q_media(_sf_dir: str):
    """Fused multimodal entry: media metadata extraction + frame
    sampling over interleaved docs, hash-joined with the REAL decode
    of the media-blob sidecar — stdlib wave parses actual WAV bytes
    for audio spans AND the pure stdlib+numpy image parsers
    (ner_ray.stages.imaging) decode actual PNG/BMP/netpbm bytes for
    image spans; each kind carries typed nulls in the other kind's
    columns (library surface, tests/test_multimodal.py). The GRADED
    projection joins the list columns to strings and coalesces the
    typed nulls to sentinels (hash-stable canonical form); VALUE-
    matched against fixtures/gen.derive_media_gold — an independent
    scalar-loop recomputation from the hash contracts and the blob
    GENERATION parameters (lossless codecs must round-trip them)."""
    import ray.data as rd

    from ner_ray.sources.io import read_docs
    from ner_ray.stages.multimodal import (
        _flat_media,
        blob_stats,
        media_pipeline,
    )

    fx = _fx()
    # Join ORDER matters twice here: (a) Ray's hash join (Arrow acero)
    # rejects list<> non-key columns, so the join runs on FLAT scalar
    # media rows BEFORE the fused pipeline (which then carries the
    # audio columns through to sit beside its list-typed frames/feature
    # output); (b) the audio actor pool is materialized before the
    # JoinOperator — joins scheduled downstream of live actor pools can
    # deadlock the streaming executor at low CPU counts (canon.py:236).
    flat = read_docs(f"{fx}/docs.parquet").map_batches(
        lambda t: _flat_media(t).select(
            ["doc_id", "span_idx", "media_ref", "kind"]),
        batch_format="pyarrow")
    ast = blob_stats(
        rd.read_parquet(f"{fx}/media_blobs.parquet")).materialize()
    joined = flat.join(ast, join_type="left_outer", num_partitions=4,
                       on=("media_ref",))

    def project(t: pa.Table) -> pa.Table:
        feat = t.column("feature").combine_chunks()
        fvals = np.rint(feat.flatten().to_numpy(zero_copy_only=False)
                        * 255.0).astype(np.int64)
        feat_str = pa.ListArray.from_arrays(
            feat.offsets, pc.cast(pa.array(fvals), pa.string()))
        ints = {"span_idx": None, "width": None, "height": None,
                "n_bytes": None, "n_frames_sampled": None,
                "sample_rate": -1, "channels": -1, "n_frames": -1,
                "peak": -1}
        cols = {
            "doc_id": t.column("doc_id"),
            "media_ref": t.column("media_ref"),
            "kind": t.column("kind"),
            "feature_sig": pc.binary_join(feat_str, "|"),
            "frames_sig": pc.binary_join(t.column("frames"), "|"),
            "duration_s": pc.fill_null(t.column("duration_s"), -1.0),
            "img_format": pc.fill_null(t.column("img_format"), ""),
            "mean_luma": pc.fill_null(t.column("mean_luma"), -1.0),
        }
        for name, sentinel in ints.items():
            c = t.column(name)
            if sentinel is not None:
                c = pc.fill_null(c, sentinel)
            cols[name] = pc.cast(c, pa.int64())
        for name in ("img_width", "img_height", "img_channels"):
            cols[name] = pc.cast(pc.fill_null(t.column(name), -1),
                                 pa.int64())
        return pa.table(cols)

    return media_pipeline(joined).map_batches(
        project, batch_format="pyarrow")


@q("q_candidates", sql=f"""
SELECT l.doc_id, l.span_idx, l.tok_begin, l.tok_end,
       a.entity_id, a.prior
FROM read_parquet('{_SMALL}/gold_mentions.parquet') l
JOIN read_parquet('{_SMALL}/alias.parquet') a
  ON a.ne_type = l.ne_type
 AND a.alias = regexp_replace(lower(l.surface), '[0-9]', '0', 'g')
""")
def q_candidates(_sf_dir: str):
    """J1 in isolation: the flat candidate-generation path (one row
    per mention x matching alias entity); SQL recomputes the broadcast
    join relationally from the goldens."""
    from ner_ray.pipelines.flagship import mention_rows
    from ner_ray.stages.link import CandidateStage
    from ner_ray.state.model import put_bundle

    fx = _fx()
    bundle = put_bundle(f"{fx}/model.parquet", f"{fx}/alias.parquet")
    mentions = _small_pipeline()["tagged"].map_batches(
        mention_rows, batch_format="pyarrow")
    cands = mentions.map_batches(
        CandidateStage, fn_constructor_kwargs={"bundle": bundle},
        batch_format="pyarrow", concurrency=(1, 4), num_cpus=1)
    return cands.select_columns(["doc_id", "span_idx", "tok_begin",
                                 "tok_end", "entity_id", "prior"])
