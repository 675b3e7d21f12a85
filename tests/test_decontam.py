"""Benchmark decontamination (stages/decontam.py) + the checkpointed
curation chain (pipelines/clean.py, jobs/clean_corpus.py):

* planted contamination: a train doc sharing one 13-word n-gram with
  the eval set is dropped; a 12-word overlap is not;
* broadcast and bucketed paths agree; precomputed-hash reuse works;
* clean_corpus chains decontamination after dedup;
* kill/rerun of jobs/clean_corpus.py: finished stages skip (lineage
  status="skipped"), survivors byte-identical across reruns.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# a 20-word eval document; train docs lift windows out of it
_EV = ("alpha bravo charlie delta echo foxtrot golf hotel india juliett "
       "kilo lima mike november oscar papa quebec romeo sierra tango")
_EVW = _EV.split()


def _corpus_rows():
    filler = "one two three four five six seven eight nine ten"
    return [
        # 13 consecutive eval words -> contaminated
        {"doc_id": 0, "text": " ".join(_EVW[2:15]) + " " + filler},
        # only 12 consecutive eval words -> clean
        {"doc_id": 1, "text": " ".join(_EVW[2:14]) + " " + filler},
        # disjoint -> clean
        {"doc_id": 2, "text": filler + " " + filler},
        # the full eval text verbatim -> contaminated
        {"doc_id": 3, "text": _EV},
        {"doc_id": 4, "text": "totally unrelated words " + filler},
    ]


def _ids(ds):
    return sorted(b for batch in ds.iter_batches(batch_format="pyarrow")
                  for b in batch.column("doc_id").to_pylist())


@pytest.fixture()
def corpus_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pylist(_corpus_rows()))


@pytest.fixture()
def eval_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(pa.table({"text": [_EV]}))


def test_planted_contamination_dropped(ray_session, corpus_ds, eval_ds):
    from ner_ray.stages.decontam import decontaminate

    out = decontaminate(corpus_ds, eval_ds, n=13)
    assert _ids(out) == [1, 2, 4]


def test_bucketed_path_matches_broadcast(ray_session, corpus_ds, eval_ds):
    from ner_ray.stages.decontam import decontaminate

    out = decontaminate(corpus_ds, eval_ds, n=13,
                        max_broadcast_hashes=0, num_buckets=4)
    assert _ids(out) == [1, 2, 4]


def test_precomputed_hashes_and_empty_eval(ray_session, corpus_ds,
                                           eval_ds):
    from ner_ray.stages.decontam import decontaminate, eval_ngram_hashes

    hs = eval_ngram_hashes(eval_ds, n=13)
    assert len(hs) == len(_EVW) - 12 and hs.dtype == np.uint64
    out = decontaminate(corpus_ds, eval_hashes=hs, n=13)
    assert _ids(out) == [1, 2, 4]
    # empty eval set: no-op
    noop = decontaminate(corpus_ds,
                         eval_hashes=np.array([], dtype=np.uint64))
    assert _ids(noop) == [0, 1, 2, 3, 4]
    with pytest.raises(ValueError):
        decontaminate(corpus_ds)


def test_shorter_n_catches_smaller_overlap(ray_session, corpus_ds,
                                           eval_ds):
    from ner_ray.stages.decontam import decontaminate

    # at n=12 the 12-word overlap doc is contaminated too
    out = decontaminate(corpus_ds, eval_ds, n=12)
    assert _ids(out) == [2, 4]


def test_clean_corpus_chains_decontamination(ray_session, eval_ds):
    import ray.data as rd

    from ner_ray.pipelines.clean import clean_corpus

    rows = _corpus_rows()
    # an exact duplicate of doc 2: dedup must drop it before decontam
    rows.append({"doc_id": 5, "text": rows[2]["text"]})
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    out, stats = clean_corpus(ds, min_words=3, min_uniq_ratio=0.0,
                              langs=None, dedup=True,
                              decontaminate_against=eval_ds,
                              return_stats=True)
    assert _ids(out) == [1, 2, 4]
    assert stats["after_exact"] == 5 and stats["after_decontam"] == 3


def test_clean_corpus_reread_mode_identical(ray_session, eval_ds):
    import ray.data as rd

    from ner_ray.pipelines.clean import clean_corpus

    ds = rd.from_arrow(pa.Table.from_pylist(_corpus_rows()))
    kw = dict(min_words=3, min_uniq_ratio=0.0, langs=None, dedup=True,
              decontaminate_against=eval_ds)
    pinned = clean_corpus(ds, materialize=True, **kw)
    reread = clean_corpus(ds, materialize=False, **kw)
    assert _ids(pinned) == _ids(reread) == [1, 2, 4]


def test_contamination_report(ray_session, corpus_ds, eval_ds):
    from ner_ray.stages.decontam import contamination_report

    rep = contamination_report(corpus_ds, eval_ds, n=13).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert rep["doc_id"].tolist() == [0, 3]
    by = dict(zip(rep["doc_id"], rep["n_shared"]))
    # doc 0 lifts words 2..14 -> exactly one shared 13-gram; doc 3 is
    # the verbatim eval text -> all 8 of its 13-grams are shared
    assert by[0] == 1 and by[3] == len(_EVW) - 12
    n_grams = dict(zip(rep["doc_id"], rep["n_ngrams"]))
    assert n_grams[3] == len(_EVW) - 12
    # report ids == exactly what decontaminate drops
    from ner_ray.stages.decontam import decontaminate

    kept = set(_ids(decontaminate(corpus_ds, eval_ds, n=13)))
    assert set(rep["doc_id"]) == {0, 1, 2, 3, 4} - kept


# ------------------------------------------------- kill/rerun resume


def _stage_rows(ckpt):
    path = f"{ckpt}/lineage.jsonl"
    if not os.path.exists(path):
        return []
    return [json.loads(x) for x in open(path)]


def _run_job(tmp, fail_after=""):
    env = dict(os.environ, NER_RAY_FAIL_AFTER_STAGE=fail_after)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "clean_corpus.py"),
         "--docs", f"{tmp}/docs.parquet", "--out", f"{tmp}/out",
         "--checkpoint", f"{tmp}/ckpt", "--min-words", "3",
         "--min-uniq-ratio", "0.0", "--near-method", "minhash",
         "--threshold", "0.7", "--eval", f"{tmp}/eval.parquet",
         "--num-cpus", "4"],
        env=env, capture_output=True, text=True, cwd=REPO, timeout=600)


def _survivors(out_dir):
    import pyarrow.dataset as pads

    t = pads.dataset(out_dir, format="parquet",
                     partitioning="hive").to_table()
    return t.sort_by("doc_id").select(["doc_id", "text"]).to_pydict()


@pytest.mark.slow
def test_clean_job_kill_and_resume(tmp_path):
    tmp = str(tmp_path)
    rows = _corpus_rows()
    # near-dup family so the near-dedup stage has work
    base = rows[2]["text"]
    rows.append({"doc_id": 6, "text": base + " extra"})
    rows.append({"doc_id": 7, "text": base + " more"})
    pq.write_table(pa.Table.from_pylist(rows), f"{tmp}/docs.parquet")
    pq.write_table(pa.table({"text": [_EV]}), f"{tmp}/eval.parquet")

    # run 1: die after exact dedup — filter + exact computed, no near
    r1 = _run_job(tmp, fail_after="clean_exact_dedup")
    assert r1.returncode == 42, r1.stderr[-2000:]
    l1 = _stage_rows(f"{tmp}/ckpt")
    s1 = {r["stage"] for r in l1}
    assert s1 == {"clean_filter", "clean_exact_dedup"}
    assert all(r["status"] == "computed" for r in l1)

    # run 2: completes; finished stages skip, the rest compute
    r2 = _run_job(tmp)
    assert r2.returncode == 0, r2.stderr[-2000:]
    summary = json.loads(r2.stdout.strip().splitlines()[-1])
    assert summary["survivors"] > 0
    by_stage = {}
    for r in _stage_rows(f"{tmp}/ckpt")[len(l1):]:
        by_stage.setdefault(r["stage"], set()).add(r["status"])
    assert by_stage["clean_filter"] == {"skipped"}
    assert by_stage["clean_exact_dedup"] == {"skipped"}
    assert by_stage["clean_near_dedup"] == {"computed"}
    assert by_stage["clean_decontam"] == {"computed"}
    surv2 = _survivors(f"{tmp}/out")
    # near-dedup merges {0,1} and {2,6,7}; decontam then drops 0 and 3
    assert surv2["doc_id"] == [2, 4]

    # run 3: everything skipped; survivors byte-identical
    n_before = len(_stage_rows(f"{tmp}/ckpt"))
    r3 = _run_job(tmp)
    assert r3.returncode == 0, r3.stderr[-2000:]
    run3 = _stage_rows(f"{tmp}/ckpt")[n_before:]
    assert {r["stage"] for r in run3} == {
        "clean_filter", "clean_exact_dedup", "clean_near_dedup",
        "clean_decontam"}
    assert all(r["status"] == "skipped" for r in run3)
    assert _survivors(f"{tmp}/out") == surv2
