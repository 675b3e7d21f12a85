"""Unit tests of the frozen reference-oracle semantics (SURVEY.md §5.2):
Viterbi vs brute force, BIO repair cases, gazetteer longest match,
triple-window rule, linking tie-breaks, union-find components."""

import itertools

import numpy as np
import pytest

from ner_ray.constants import LABELS, N_LABELS, TRIPLE_WINDOW
from ner_ray.oracle import reference_oracle as O


# ---------------------------------------------------------------- text

def test_tokenize_and_offsets():
    toks = O.tokenize("Alice Chen visits Paris")
    assert toks == ["Alice", "Chen", "visits", "Paris"]
    assert O.char_offsets(toks) == [0, 6, 11, 18]


def test_norm_and_shape():
    assert O.norm("McDonald42") == "mcdonald00"
    assert O.shape("McDonald") == "XxXx"
    assert O.shape("ABC-12a") == "Xp0x"
    assert O.shape("hello") == "x"


# ----------------------------------------------------------- gazetteer

ALIASES = {
    "alice chen": "PER",
    "chen": "PER",
    "paris": "LOC",
    "north paris heights": "LOC",
}


def test_gazetteer_longest_match_wins():
    toks = ["alice", "chen", "map", "north", "paris", "heights"]
    flags = O.gazetteer_flags(toks, ALIASES)
    assert flags == ["B-PER", "I-PER", "", "B-LOC", "I-LOC", "I-LOC"]


def test_gazetteer_greedy_left_to_right():
    # "chen" matched alone when "alice" precedes nothing matchable
    flags = O.gazetteer_flags(["chen", "paris"], ALIASES)
    assert flags == ["B-PER", "B-LOC"]


# -------------------------------------------------------------- viterbi

def _brute_force(E, trans, start):
    T = E.shape[0]
    best, best_score = None, -np.inf
    for path in itertools.product(range(N_LABELS), repeat=T):
        s = start[path[0]] + E[0, path[0]]
        for t in range(1, T):
            s += trans[path[t - 1], path[t]] + E[t, path[t]]
        # tie-break: lexicographically smallest label-index path, which
        # itertools.product enumerates in order -> strict > keeps first
        if s > best_score + 1e-12:
            best, best_score = path, s
    return list(best)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("T", [1, 2, 3, 4])
def test_viterbi_matches_brute_force(seed, T):
    rng = np.random.default_rng(seed)
    E = rng.normal(size=(T, N_LABELS))
    trans = rng.normal(size=(N_LABELS, N_LABELS))
    start = rng.normal(size=N_LABELS)
    assert O.viterbi(E, trans, start) == _brute_force(E, trans, start)


def test_viterbi_empty():
    assert O.viterbi(np.zeros((0, N_LABELS)), np.zeros((N_LABELS,) * 2),
                     np.zeros(N_LABELS)) == []


# ------------------------------------------------------------ BIO decode

def lab(*names):
    return [LABELS.index(n) for n in names]


def test_bio_simple_runs():
    tags = lab("O", "B-PER", "I-PER", "O", "B-LOC")
    assert O.bio_decode(tags) == [(1, 3, "PER"), (4, 5, "LOC")]


def test_bio_repair_orphan_I():
    # conlleval: I-X starting a chunk acts as B-X
    tags = lab("O", "I-PER", "I-PER", "O")
    assert O.bio_decode(tags) == [(1, 3, "PER")]


def test_bio_adjacent_chunks_and_type_switch():
    tags = lab("B-PER", "B-PER", "I-ORG", "I-ORG")
    assert O.bio_decode(tags) == [(0, 1, "PER"), (1, 2, "PER"), (2, 4, "ORG")]


def test_bio_chunk_at_end():
    tags = lab("O", "B-MISC", "I-MISC")
    assert O.bio_decode(tags) == [(1, 3, "MISC")]


# -------------------------------------------------------------- linking

def test_link_argmax_prior_then_lexicographic():
    alias_types = {"chen": "PER"}
    cands = {"chen": [("E2", 0.5), ("E1", 0.5), ("E3", 0.2)]}
    assert O.link_mention("chen", "PER", alias_types, cands) == ("E1", 0.5)
    assert O.link_mention("chen", "ORG", alias_types, cands) is None
    assert O.link_mention("nope", "PER", alias_types, cands) is None


# -------------------------------------------------------------- triples

def test_triple_window_and_connective():
    norm_tokens = ["chen", "likes", "paris"] + ["pad"] * 20
    linked = [(0, 1, "PER", "E1", 0.5), (2, 3, "LOC", "E2", 0.4)]
    out = O.extract_triples(linked, norm_tokens)
    assert out == [{"subj": "E1", "pred": "per:likes:loc", "obj": "E2",
                    "score": 0.2}]


def test_triple_adjacent():
    norm_tokens = ["chen", "paris"]
    linked = [(0, 1, "PER", "E1", 1.0), (1, 2, "LOC", "E2", 1.0)]
    out = O.extract_triples(linked, norm_tokens)
    assert out[0]["pred"] == "per:adj:loc"


def test_triple_window_cutoff():
    gap = TRIPLE_WINDOW + 1
    norm_tokens = ["a"] * (2 + gap)
    linked = [(0, 1, "PER", "E1", 1.0), (1 + gap, 2 + gap, "LOC", "E2", 1.0)]
    assert O.extract_triples(linked, norm_tokens) == []
    linked = [(0, 1, "PER", "E1", 1.0), (gap, gap + 1, "LOC", "E2", 1.0)]
    assert len(O.extract_triples(linked, norm_tokens)) == 1


# ---------------------------------------------------------- components

def test_components_chain_and_min_canonical():
    rows = [
        ("a", "E2", "PER", 1.0),
        ("a", "E5", "PER", 1.0),
        ("b", "E5", "PER", 1.0),
        ("b", "E9", "PER", 1.0),   # chain E2-a-E5-b-E9
        ("c", "E7", "LOC", 1.0),
    ]
    canon = O.components_from_alias(rows)
    assert canon == {"E2": "E2", "E5": "E2", "E9": "E2", "E7": "E7"}


def test_components_permutation_invariant():
    rows = [("a", "E2", "P", 1), ("a", "E5", "P", 1), ("b", "E5", "P", 1),
            ("b", "E9", "P", 1)]
    canon1 = O.components_from_alias(rows)
    canon2 = O.components_from_alias(list(reversed(rows)))
    assert canon1 == canon2
