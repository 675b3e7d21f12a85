"""End-to-end curation composition (pipelines/curate.py):

synthetic HTML crawl with planted junk, exact duplicates, benchmark
contamination and off-target pages -> curate_pretrain with each stage
on -> the right documents survive each stage, packing consumes the
survivors, shard export writes a resumable manifest, and the whole
chain is deterministic across layouts.
"""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ner_ray.pipelines.curate import curate_pretrain

_ON = ["theorem", "proof", "integral", "manifold", "tensor", "lemma",
       "algebra", "topology"]
_OFF = ["click", "cheap", "casino", "winner", "jackpot", "prize",
        "free", "offer"]
_EVAL = ("alpha bravo charlie delta echo foxtrot golf hotel india "
         "juliett kilo lima mike")


def _page(body):
    return (f"<html><head><title>t</title><script>junk()</script>"
            f"</head><body><p>{body}</p></body></html>")


def _crawl(rng):
    rows = []
    for i in range(40):  # on-target keepers
        rows.append({"doc_id": i,
                     "html": _page(" ".join(rng.choice(_ON, size=30)))})
    for i in range(40, 80):  # off-target (selection should disfavor)
        rows.append({"doc_id": i,
                     "html": _page(" ".join(rng.choice(_OFF, size=30)))})
    rows.append({"doc_id": 900, "html": _page("too short")})  # junk
    dup_body = " ".join(rng.choice(_ON, size=30))
    rows.append({"doc_id": 901, "html": _page(dup_body)})
    rows.append({"doc_id": 902, "html": _page(dup_body)})  # exact dup
    rows.append({"doc_id": 903, "html": _page(
        _EVAL + " " + " ".join(rng.choice(_ON, size=20)))})  # contaminated
    return rows


def _ids(ds):
    return sorted(x for b in ds.iter_batches(batch_format="pyarrow")
                  for x in b.column("doc_id").to_pylist())


@pytest.fixture(scope="module")
def crawl_rows():
    return _crawl(np.random.default_rng(0))


def test_clean_stage_effects(ray_session, crawl_rows):
    import ray.data as rd

    eval_ds = rd.from_items([{"doc_id": 0, "text": _EVAL}])
    out = curate_pretrain(
        rd.from_items(crawl_rows).repartition(5), html_col="html",
        clean_kwargs={"min_words": 5, "langs": None}, eval_ds=eval_ds)
    kept = _ids(out)
    assert 900 not in kept          # junk filtered
    assert 903 not in kept          # contaminated dropped
    assert (901 in kept) != (902 in kept)  # one dup survivor
    assert set(range(80)) <= set(kept)     # content untouched
    # HTML artifacts never leak
    texts = [r["text"] for b in out.iter_batches(batch_format="pyarrow")
             for r in b.to_pylist()]
    assert all("junk()" not in t and "<p>" not in t for t in texts)


def test_selection_modes(ray_session, crawl_rows):
    import ray.data as rd

    rng = np.random.default_rng(1)
    target = rd.from_items(
        [{"doc_id": 5000 + i, "text": " ".join(rng.choice(_ON, size=25))}
         for i in range(15)])
    base = rd.from_items(crawl_rows)
    dsir_kept = _ids(curate_pretrain(
        base, html_col="html", clean_kwargs={"min_words": 5,
                                             "langs": None},
        select=("dsir", target, 0.4)))
    on = [i for i in dsir_kept if i < 40 or i in (901, 902)]
    off = [i for i in dsir_kept if 40 <= i < 80]
    assert len(on) > len(off)       # selection favors target-like
    # classifier mode: the negatives ARE the cleaned crawl (the
    # published setup), so on-target pages sit in both classes and
    # calibrate near p = pos_mass/(pos_mass + on_neg_mass) ~ 0.66;
    # at alpha=3 that keeps ~40% of them vs ~12% of off-target —
    # deterministic (hash-drawn Pareto), so exact counts are stable
    clf_kept = _ids(curate_pretrain(
        base, html_col="html", clean_kwargs={"min_words": 5,
                                             "langs": None},
        select=("classifier", target, 3.0)))
    clf_on = len([i for i in clf_kept if i < 40])
    clf_off = len([i for i in clf_kept if 40 <= i < 80])
    assert clf_on >= 8 and clf_on > clf_off
    with pytest.raises(ValueError, match="select mode"):
        curate_pretrain(base, html_col="html",
                        select=("nope", target, 1))


def test_pack_and_export_resumable(ray_session, crawl_rows, tmp_path):
    import ray.data as rd

    out_dir = str(tmp_path / "shards")
    man = curate_pretrain(
        rd.from_items(crawl_rows), html_col="html",
        clean_kwargs={"min_words": 5, "langs": None},
        pack_tokens=64, pack_kwargs={"num_shards": 2}, out_dir=out_dir,
        num_shards=4)
    files = sorted(glob.glob(os.path.join(out_dir, "shard-*.parquet")))
    assert len(files) == 4
    total = sum(pq.read_table(f).num_rows for f in files)
    assert total == sum(s["rows"] for s in man["shards"]) and total > 0
    rows = pa.concat_tables([pq.read_table(f) for f in files])
    assert (np.asarray(rows.column("n_tokens").to_pylist()) <= 64).all()
    # rerun = manifest no-op (byte-identical shards)
    before = {f: os.path.getmtime(f) for f in files}
    man2 = curate_pretrain(
        rd.from_items(crawl_rows), html_col="html",
        clean_kwargs={"min_words": 5, "langs": None},
        pack_tokens=64, pack_kwargs={"num_shards": 2}, out_dir=out_dir,
        num_shards=4)
    assert man2["shards"] == man["shards"]
    assert {f: os.path.getmtime(f) for f in files} == before


def test_chain_determinism_across_layouts(ray_session, crawl_rows):
    import ray.data as rd

    def run(parts):
        out = curate_pretrain(
            rd.from_items(crawl_rows).repartition(parts),
            html_col="html",
            clean_kwargs={"min_words": 5, "langs": None},
            pack_tokens=32, pack_kwargs={"num_shards": 3})
        t = pa.concat_tables(
            list(out.iter_batches(batch_format="pyarrow")))
        return t.to_pandas().sort_values(["shard", "seq_idx"]) \
            .reset_index(drop=True)

    a, b = run(1), run(8)
    assert a.equals(b)
