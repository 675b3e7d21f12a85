"""Real image decode: pure stdlib+numpy PNG/BMP/netpbm parsers, the
fixture image payloads, and the Ray decode/resize stages."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from ner_ray.fixtures.gen import (
    ensure_fixtures,
    image_bytes_for,
    image_params_for,
    image_pixels_for,
)
from ner_ray.stages.imaging import (
    decode_bmp,
    decode_image,
    decode_png,
    decode_ppm,
    encode_bmp,
    encode_png,
    encode_ppm,
    image_feature,
    image_stats,
    luma,
    resize_images,
    resize_nearest,
)
from ner_ray.stages.multimodal import RealMediaDecoder


def _img(seed: int, h: int, w: int, ch: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    return rng.integers(0, 256, size=shape).astype(np.uint8)


@pytest.mark.parametrize("ch", [1, 3, 4])
@pytest.mark.parametrize("mode", ["none", "cycle"])
def test_png_roundtrip(ch, mode):
    """Bit-exact PNG round trip for gray/RGB/RGBA; "cycle" exercises
    every filter type 0-4 on decode."""
    for h, w in [(1, 1), (1, 7), (6, 1), (11, 13), (8, 8)]:
        img = _img(h * 100 + w * 10 + ch, h, w, ch)
        out = decode_png(encode_png(img, filter_mode=mode))
        assert out.dtype == np.uint8
        np.testing.assert_array_equal(out, img)


def test_png_rejects_corruption():
    img = _img(1, 5, 5, 3)
    data = bytearray(encode_png(img))
    with pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n")  # truncated signature
    data[40] ^= 0xFF  # flip a byte inside a chunk payload -> CRC fails
    with pytest.raises(ValueError):
        decode_png(bytes(data))


def test_bmp_roundtrip_padding():
    """Row padding kicks in whenever 3*w % 4 != 0 — cover all residues."""
    for w in [1, 2, 3, 4, 5]:
        img = _img(w, 7, w, 3)
        out = decode_bmp(encode_bmp(img))
        np.testing.assert_array_equal(out, img)
    with pytest.raises(ValueError):
        decode_bmp(encode_bmp(img)[: 54 + 3])  # truncated pixel array


def test_ppm_roundtrip_and_comments():
    g = _img(2, 9, 4, 1)
    c = _img(3, 5, 6, 3)
    np.testing.assert_array_equal(decode_ppm(encode_ppm(g)), g)
    np.testing.assert_array_equal(decode_ppm(encode_ppm(c)), c)
    # a comment line in the header must be skipped
    raw = b"P5\n# made by hand\n4 2\n255\n" + bytes(range(8))
    out = decode_ppm(raw)
    assert out.shape == (2, 4)
    np.testing.assert_array_equal(out.reshape(-1), np.arange(8))


def test_decode_image_sniffs_and_refuses():
    img = _img(4, 6, 6, 3)
    assert decode_image(encode_png(img))[1] == "png"
    assert decode_image(encode_bmp(img))[1] == "bmp"
    assert decode_image(encode_ppm(img))[1] == "pnm"
    with pytest.raises(ValueError):
        decode_image(b"\x00\x01garbage payload")


def test_resize_nearest():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4)
    np.testing.assert_array_equal(resize_nearest(img, 4, 4), img)
    half = resize_nearest(img, 2, 2)
    np.testing.assert_array_equal(half, [[0, 2], [8, 10]])
    up = resize_nearest(img, 8, 8)
    assert up.shape == (8, 8)
    np.testing.assert_array_equal(up[::2, ::2], img)


def test_image_feature_is_luma_thumbnail():
    img = np.full((8, 8, 3), 255, np.uint8)
    f = image_feature(img, grid=4)
    assert f.shape == (16,)
    np.testing.assert_allclose(f, 1.0, atol=1e-6)
    assert luma(img).shape == (8, 8)


def test_fixture_image_payloads_decode_to_known_pixels():
    """The fixture generator emits REAL encodings: every payload
    decodes back to exactly the deterministic pixel array, across all
    three formats."""
    seen = set()
    for i in range(60):
        ref = f"media://doc{i:010d}/1"
        p = image_params_for(ref)
        seen.add(p["format"])
        img, fmt = decode_image(image_bytes_for(ref))
        assert fmt == p["format"]
        assert img.shape[:2] == (p["height"], p["width"])
        np.testing.assert_array_equal(img, image_pixels_for(ref))
    assert seen == {"png", "bmp", "pnm"}


def test_real_decoder_image_branch():
    ref = "media://doc0000000007/2"
    p = image_params_for(ref)
    st = RealMediaDecoder().decode_media(image_bytes_for(ref), "image")
    assert st["format"] == p["format"]
    assert st["width"] == p["width"]
    assert st["height"] == p["height"]
    assert st["channels"] == p["channels"]
    assert 0.0 <= st["mean_luma"] <= 255.0


def test_image_stats_stage(ray_session):
    """Ray actor-pool stage: real decode values for image rows, typed
    nulls for audio rows, one output row per blob."""
    import ray.data as rd

    fx = ensure_fixtures("tiny")
    blobs = pq.read_table(f"{fx}/media_blobs.parquet")
    out = image_stats(rd.read_parquet(f"{fx}/media_blobs.parquet"),
                      batch_size=16).to_pandas()
    assert len(out) == blobs.num_rows
    by_ref = out.set_index("media_ref")
    n_img = 0
    for ref, kind in zip(blobs.column("media_ref").to_pylist(),
                         blobs.column("kind").to_pylist()):
        row = by_ref.loc[ref]
        if kind == "image":
            n_img += 1
            p = image_params_for(ref)
            assert row["format"] == p["format"]
            assert int(row["width"]) == p["width"]
            assert int(row["height"]) == p["height"]
            assert int(row["channels"]) == p["channels"]
            exp = luma(image_pixels_for(ref)).mean()
            assert abs(row["mean_luma"] - exp) < 1e-9
            assert len(row["feature"]) == 16
        else:
            assert row["format"] is None and np.isnan(row["mean_luma"])
    assert n_img > 0


def test_image_resize_stage(ray_session):
    """Decode -> nearest resize -> PNG re-encode; non-image rows pass
    through with their original bytes."""
    import ray.data as rd

    fx = ensure_fixtures("tiny")
    blobs = pq.read_table(f"{fx}/media_blobs.parquet")
    out = resize_images(rd.read_parquet(f"{fx}/media_blobs.parquet"),
                        out_h=5, out_w=6, batch_size=16).to_pandas()
    orig = {r: (k, b) for r, k, b in zip(
        blobs.column("media_ref").to_pylist(),
        blobs.column("kind").to_pylist(),
        blobs.column("media_bytes").to_pylist())}
    for _, row in out.iterrows():
        kind, b = orig[row["media_ref"]]
        if kind == "image":
            img, fmt = decode_image(row["media_bytes"])
            assert fmt == "png" and img.shape[:2] == (5, 6)
            np.testing.assert_array_equal(
                img, resize_nearest(image_pixels_for(row["media_ref"]),
                                    5, 6))
        else:
            assert bytes(row["media_bytes"]) == b
