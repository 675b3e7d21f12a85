"""Multimodal operators: REAL WAV audio decode (stdlib wave) + the
fake-backend plumbing (stats, frame sampling, fused pipeline)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from ner_ray.fixtures.gen import (
    ensure_fixtures,
    gen_media_blobs,
    wav_bytes_for,
    wav_params_for,
)
from ner_ray.stages.multimodal import RealMediaDecoder, audio_stats


def test_wav_roundtrip_bit_level():
    """decode_media recovers exactly the parameters the generator
    encoded — a real parse of real WAV bytes, not a fake."""
    dec = RealMediaDecoder()
    for ref in [f"media://doc{i:010d}/{j}" for i in range(20)
                for j in (0, 3)]:
        p = wav_params_for(ref)
        st = dec.decode_media(wav_bytes_for(ref), "audio")
        assert st["sample_rate"] == p["sample_rate"]
        assert st["channels"] == p["channels"]
        assert st["n_frames"] == p["n_frames"]
        assert st["duration_s"] == p["n_frames"] / p["sample_rate"]
        # peak of a sine at amplitude A is in (0.9A, A]
        assert 0 < st["peak"] <= p["amp"]
        assert st["peak"] > 0.9 * p["amp"] or p["n_frames"] < 50


def test_real_decoder_refuses_undecodable_kinds():
    dec = RealMediaDecoder()
    # video is the one remaining stub (no demuxer from stdlib)
    with pytest.raises(NotImplementedError):
        dec.decode_media(b"\x00\x00\x00 ftypmp42", "video")
    # image decode is REAL now — a corrupt payload is refused by the
    # parser (ValueError), not faked
    with pytest.raises(ValueError):
        dec.decode_media(b"\x89PNG\r\n", "image")


def test_fixture_blobs_are_real_wavs(ray_session):
    fx = ensure_fixtures("tiny")
    blobs = pq.read_table(f"{fx}/media_blobs.parquet")
    kinds = blobs.column("kind").to_pylist()
    assert "audio" in kinds and "image" in kinds
    dec = RealMediaDecoder()
    for ref, kind, b in zip(blobs.column("media_ref").to_pylist(),
                            kinds,
                            blobs.column("media_bytes").to_pylist()):
        if kind != "audio":
            continue
        assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
        st = dec.decode_media(b, "audio")
        assert st == {
            "sample_rate": wav_params_for(ref)["sample_rate"],
            "channels": wav_params_for(ref)["channels"],
            "n_frames": wav_params_for(ref)["n_frames"],
            "duration_s": st["duration_s"],
            "peak": st["peak"],
        }


def test_audio_stats_stage(ray_session):
    """The Ray actor-pool stage: real values for audio rows, typed
    nulls for image rows, one output row per blob."""
    import ray.data as rd

    fx = ensure_fixtures("tiny")
    blobs = pq.read_table(f"{fx}/media_blobs.parquet")
    out = audio_stats(rd.read_parquet(f"{fx}/media_blobs.parquet"),
                      batch_size=16).to_pandas()
    assert len(out) == blobs.num_rows
    by_ref = out.set_index("media_ref")
    for ref, kind in zip(blobs.column("media_ref").to_pylist(),
                         blobs.column("kind").to_pylist()):
        row = by_ref.loc[ref]
        if kind == "audio":
            p = wav_params_for(ref)
            assert int(row["sample_rate"]) == p["sample_rate"]
            assert int(row["channels"]) == p["channels"]
            assert int(row["n_frames"]) == p["n_frames"]
            assert row["duration_s"] == p["n_frames"] / p["sample_rate"]
        else:
            assert np.isnan(row["sample_rate"])


def test_media_pipeline_with_audio_join(ray_session):
    """q_media's shape: fused media pipeline joined with the real
    blob decode — every audio span row carries real audio stats,
    every image span row carries real image stats; the GRADED
    projection coalesces the other kind's typed nulls to sentinels
    (-1 / '') so the driver's value hash has one canonical form (the
    list/null-carrying stage output itself is covered by the tests
    above)."""
    from ner_ray.fixtures.gen import image_params_for
    from ner_ray.pipelines.queries import registry

    res = registry()["q_media"]("unused").to_pandas()
    assert len(res) > 0
    audio = res[res["kind"] == "audio"]
    image = res[res["kind"] == "image"]
    assert len(audio) and len(image)
    assert (audio["sample_rate"] > 0).all()
    assert (image["sample_rate"] == -1).all()
    assert (image["img_format"] != "").all()
    assert (audio["img_format"] == "").all()
    for _, r in audio.head(25).iterrows():
        assert int(r["sample_rate"]) == \
            wav_params_for(r["media_ref"])["sample_rate"]
    for _, r in image.head(25).iterrows():
        p = image_params_for(r["media_ref"])
        assert r["img_format"] == p["format"]
        assert int(r["img_width"]) == p["width"]
        assert int(r["img_height"]) == p["height"]


def test_blob_generation_deterministic():
    fx_docs = pq.read_table(f"{ensure_fixtures('tiny')}/docs.parquet")
    a = gen_media_blobs(fx_docs)
    b = gen_media_blobs(fx_docs)
    assert a.equals(b)
