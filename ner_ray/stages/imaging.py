"""Pure stdlib+numpy image codecs (PNG, BMP, netpbm) + real image
decode / feature-extract / resize stages.

No image codec *library* exists in this container (PIL/cv2/imageio are
absent) — but PNG is stdlib ``zlib`` plus per-row filter reconstruction,
and BMP / netpbm are raw structs, so these are real parsers, not fakes:
they reject corrupt input and round-trip bit-exactly (tests encode with
every PNG filter type 0-4 and assert pixel equality after decode).

Scope (documented and asserted by the parsers themselves):
- PNG: 8-bit depth, color types 0 (gray) / 2 (RGB) / 6 (RGBA),
  non-interlaced. Filters 0-4 on decode; encode picks per row.
- BMP: BI_RGB uncompressed 24-bit, bottom-up, BITMAPINFOHEADER.
- netpbm: binary P5 (gray) / P6 (RGB), maxval 255.
Compressed video stays stubbed in multimodal.RealMediaDecoder — a
demuxer + inter-frame codec cannot be reimplemented from stdlib.

Codec-boundary note: PNG average/Paeth reconstruction is inherently
sequential in x (each pixel needs the already-reconstructed left
neighbor), so the decoder loops per pixel *within a row* for those two
filters only — the same exemption AudioStatsStage documents for opaque
per-item payloads. Filters 0/1/2 reconstruct fully vectorized
(copy / per-channel cumsum / prior add).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# ---------------------------------------------------------------- PNG

_COLOR_TYPE = {1: 0, 3: 2, 4: 6}  # channels -> PNG color type
_CHANNELS = {0: 1, 2: 3, 6: 4}  # PNG color type -> channels


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    return b if pb <= pc else c


def encode_png(img: np.ndarray, filter_mode: str = "none") -> bytes:
    """Encode (H,W) or (H,W,{3,4}) uint8 -> PNG bytes.

    filter_mode: "none" writes filter 0 every row (fastest);
    "cycle" writes filter ``row % 5`` so round-trip tests exercise the
    decoder's full filter reconstruction.
    """
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    if ch not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {ch}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[ch], 0, 0, 0)
    prior = np.zeros((w, ch), dtype=np.uint8)
    rows = []
    for y in range(h):
        raw = img[y]
        ftype = (y % 5) if filter_mode == "cycle" else 0
        if ftype == 0:
            filt = raw
        elif ftype == 1:  # Sub
            left = np.vstack([np.zeros((1, ch), np.uint8), raw[:-1]])
            filt = raw - left
        elif ftype == 2:  # Up
            filt = raw - prior
        elif ftype == 3:  # Average
            left = np.vstack([np.zeros((1, ch), np.uint8), raw[:-1]])
            filt = raw - ((left.astype(np.uint16)
                           + prior.astype(np.uint16)) // 2).astype(np.uint8)
        else:  # Paeth
            left = np.vstack([np.zeros((1, ch), np.uint8), raw[:-1]])
            upleft = np.vstack([np.zeros((1, ch), np.uint8), prior[:-1]])
            pred = np.empty((w, ch), np.uint8)
            for x in range(w):
                for c in range(ch):
                    pred[x, c] = _paeth(int(left[x, c]), int(prior[x, c]),
                                        int(upleft[x, c]))
            filt = raw - pred
        rows.append(bytes([ftype]) + filt.tobytes())
        prior = raw
    idat = zlib.compress(b"".join(rows), 6)
    return (PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes -> (H,W) or (H,W,C) uint8. Real parser: walks
    chunks, verifies CRCs, inflates IDAT, reconstructs filters 0-4."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat, ihdr = 8, [], None
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + ln]
        (crc,) = struct.unpack(">I", data[pos + 8 + ln:pos + 12 + ln])
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt_m, interlace = ihdr
    if depth != 8 or ctype not in _CHANNELS or comp or filt_m or interlace:
        raise ValueError(
            f"unsupported PNG variant (depth={depth} color={ctype} "
            f"interlace={interlace}); this parser handles 8-bit "
            "gray/RGB/RGBA non-interlaced")
    ch = _CHANNELS[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG scanline payload length mismatch")
    out = np.empty((h, w, ch), dtype=np.uint8)
    prior = np.zeros((w, ch), dtype=np.uint8)
    for y in range(h):
        row = np.frombuffer(
            raw, np.uint8, stride, y * (1 + stride) + 1).reshape(w, ch)
        ftype = raw[y * (1 + stride)]
        if ftype == 0:
            rec = row.copy()
        elif ftype == 1:  # Sub: per-channel cumsum mod 256
            rec = (np.cumsum(row, axis=0, dtype=np.int64)
                   % 256).astype(np.uint8)
        elif ftype == 2:  # Up
            rec = row + prior
        elif ftype in (3, 4):  # Average / Paeth: sequential in x
            rec = np.empty((w, ch), np.uint8)
            left = np.zeros(ch, np.uint16)
            for x in range(w):
                if ftype == 3:
                    pred = ((left + prior[x]) // 2).astype(np.uint8)
                else:
                    upleft = prior[x - 1] if x else np.zeros(ch, np.uint8)
                    pred = np.array(
                        [_paeth(int(left[c]), int(prior[x, c]),
                                int(upleft[c])) for c in range(ch)],
                        np.uint8)
                rec[x] = row[x] + pred
                left = rec[x].astype(np.uint16)
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = rec
        prior = rec
    return out[:, :, 0] if ch == 1 else out


# ---------------------------------------------------------------- BMP

def encode_bmp(img: np.ndarray) -> bytes:
    """Encode (H,W,3) RGB uint8 -> 24-bit BI_RGB BMP (bottom-up)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("BMP encoder takes (H,W,3) RGB")
    h, w, _ = img.shape
    pad = (-3 * w) % 4
    bgr = img[::-1, :, ::-1]  # bottom-up, BGR byte order
    rows = np.zeros((h, 3 * w + pad), dtype=np.uint8)
    rows[:, :3 * w] = bgr.reshape(h, 3 * w)
    pixels = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                       len(pixels), 2835, 2835, 0, 0)
    return header + info + pixels


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode 24-bit BI_RGB BMP bytes -> (H,W,3) RGB uint8."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack("<I", data[10:14])
    if len(data) < 54:
        raise ValueError("BMP header truncated")
    hdr_size, w, h, planes, bpp, comp = struct.unpack("<IiiHHI", data[14:34])
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp} compression={comp}); "
                         "this parser handles BI_RGB 24-bit")
    bottom_up = h > 0
    h = abs(h)
    pad = (-3 * w) % 4
    stride = 3 * w + pad
    if len(data) < offset + stride * h:
        raise ValueError("BMP pixel array truncated")
    rows = np.frombuffer(data, np.uint8, stride * h, offset) \
        .reshape(h, stride)[:, :3 * w].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]
    return rgb[::-1].copy() if bottom_up else rgb.copy()


# ------------------------------------------------------------- netpbm

def encode_ppm(img: np.ndarray) -> bytes:
    """Encode (H,W) gray -> P5 or (H,W,3) RGB -> P6 (binary, maxval
    255)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        magic = b"P5"
        h, w = img.shape
    elif img.ndim == 3 and img.shape[2] == 3:
        magic = b"P6"
        h, w = img.shape[:2]
    else:
        raise ValueError("netpbm encoder takes (H,W) gray or (H,W,3) RGB")
    return magic + f"\n{w} {h}\n255\n".encode() + img.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Decode binary P5/P6 netpbm -> (H,W) or (H,W,3) uint8."""
    if data[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm (P5/P6)")
    ch = 3 if data[:2] == b"P6" else 1
    # header: magic, whitespace/comment-separated width height maxval,
    # then a single whitespace byte before the raster
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported netpbm maxval {maxval}")
    n = w * h * ch
    if len(data) < pos + n:
        raise ValueError("netpbm raster truncated")
    arr = np.frombuffer(data, np.uint8, n, pos)
    return (arr.reshape(h, w) if ch == 1 else arr.reshape(h, w, 3)).copy()


# -------------------------------------------------------- dispatch/ops

def decode_image(data: bytes) -> tuple[np.ndarray, str]:
    """Sniff magic bytes and decode -> (pixels, format). Raises
    ValueError on unknown or corrupt payloads (a real parser refuses
    garbage; it does not fake metadata)."""
    if data[:8] == PNG_SIG:
        return decode_png(data), "png"
    if data[:2] == b"BM":
        return decode_bmp(data), "bmp"
    if data[:2] in (b"P5", b"P6"):
        return decode_ppm(data), "pnm"
    raise ValueError("unrecognized image payload (not PNG/BMP/netpbm)")


def luma(img: np.ndarray) -> np.ndarray:
    """Rec.601 luma as float64 (H,W); alpha ignored."""
    if img.ndim == 2:
        return img.astype(np.float64)
    rgb = img[:, :, :3].astype(np.float64)
    return rgb @ np.array([0.299, 0.587, 0.114])


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize (pure index gather), any channel count."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xs = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return img[ys][:, xs]


def image_feature(img: np.ndarray, grid: int = 4) -> np.ndarray:
    """Feature-extract: grid×grid mean-luma thumbnail in [0,1] —
    a real, deterministic embedding of the decoded pixels."""
    y = luma(img)
    thumb = resize_nearest(y, grid, grid)
    return (thumb / 255.0).reshape(-1).astype(np.float32)


IMAGE_STATS = pa.schema(
    [
        ("media_ref", pa.string()),
        ("format", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("channels", pa.int32()),
        ("mean_luma", pa.float64()),
        ("feature", pa.list_(pa.float32())),
    ]
)

RESIZED_BLOBS = pa.schema(
    [
        ("media_ref", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("media_bytes", pa.binary()),
    ]
)


class ImageStatsStage:
    """Actor-pool real-decode stage over a MEDIA_BLOBS table: image
    rows decode their actual PNG/BMP/netpbm bytes; non-image rows emit
    typed nulls. Per-item loop is the codec-boundary exemption (each
    payload is an opaque container); keep batches small for binary
    payloads."""

    def __init__(self, feature_grid: int = 4):
        self.feature_grid = feature_grid

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch.column("kind").to_pylist()
        blobs = batch.column("media_bytes").to_pylist()
        n = len(kinds)
        fmt: list[str | None] = [None] * n
        width = np.zeros(n, np.int32)
        height = np.zeros(n, np.int32)
        nch = np.zeros(n, np.int32)
        mean = np.zeros(n, np.float64)
        fdim = self.feature_grid * self.feature_grid
        feats = np.zeros((n, fdim), np.float32)
        is_img = np.zeros(n, bool)
        for i, (k, b) in enumerate(zip(kinds, blobs)):
            if k != "image":
                continue
            img, f = decode_image(b)
            is_img[i] = True
            fmt[i] = f
            height[i], width[i] = img.shape[:2]
            nch[i] = 1 if img.ndim == 2 else img.shape[2]
            mean[i] = float(luma(img).mean())
            feats[i] = image_feature(img, self.feature_grid)
        mask = pa.array(~is_img)

        def nullable(vals, typ):
            a = pa.array(vals, typ)
            if not is_img.all():
                a = pa.compute.if_else(mask, pa.nulls(n, typ), a)
            return a

        if is_img.all():
            flat = pa.array(feats.reshape(-1), pa.float32())
            offs = pa.array(np.arange(0, (n + 1) * fdim, fdim, np.int32),
                            pa.int32())
            feat_col = pa.ListArray.from_arrays(offs, flat)
        else:
            # if_else has no list-type kernel; build nulls directly
            feat_col = pa.array(
                [feats[i].tolist() if is_img[i] else None for i in range(n)],
                pa.list_(pa.float32()))
        return pa.table({
            "media_ref": batch.column("media_ref"),
            "format": pa.array(fmt, pa.string()),
            "width": nullable(width, pa.int32()),
            "height": nullable(height, pa.int32()),
            "channels": nullable(nch, pa.int32()),
            "mean_luma": nullable(mean, pa.float64()),
            "feature": feat_col,
        }, schema=IMAGE_STATS)


class ImageResizeStage:
    """Decode -> nearest-neighbor resize -> re-encode PNG. Non-image
    rows pass through untouched (ref + original bytes), so the stage
    composes over a mixed blobs table."""

    def __init__(self, out_h: int, out_w: int):
        self.out_h, self.out_w = out_h, out_w

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch.column("kind").to_pylist()
        blobs = batch.column("media_bytes").to_pylist()
        out_bytes: list[bytes] = []
        width = np.empty(len(kinds), np.int32)
        height = np.empty(len(kinds), np.int32)
        for i, (k, b) in enumerate(zip(kinds, blobs)):
            if k != "image":
                out_bytes.append(b)
                width[i] = height[i] = -1
                continue
            img, _ = decode_image(b)
            resized = resize_nearest(img, self.out_h, self.out_w)
            out_bytes.append(encode_png(resized))
            height[i], width[i] = self.out_h, self.out_w
        return pa.table({
            "media_ref": batch.column("media_ref"),
            "width": pa.array(width, pa.int32()),
            "height": pa.array(height, pa.int32()),
            "media_bytes": pa.array(out_bytes, pa.binary()),
        }, schema=RESIZED_BLOBS)


def image_stats(blobs_ds, concurrency=(1, 4), batch_size: int = 64):
    """Real image decode over a media-blobs Dataset (small batches:
    binary payloads)."""
    return blobs_ds.map_batches(
        ImageStatsStage, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)


def resize_images(blobs_ds, out_h: int, out_w: int, concurrency=(1, 4),
                  batch_size: int = 64):
    return blobs_ds.map_batches(
        ImageResizeStage, fn_constructor_kwargs={"out_h": out_h,
                                                 "out_w": out_w},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)
