"""Multimodal span processing (image/audio as opaque binary + typed
metadata).

The Ray-side plumbing — schema, actor signature, batch sizing, output
layout — is real and tested. Codec boundary: AUDIO decode is REAL
(stdlib ``wave`` parses WAV payloads in ``RealMediaDecoder`` /
``AudioStatsStage``) and IMAGE decode is REAL for PNG/BMP/netpbm
(pure stdlib zlib + numpy parsers in ``ner_ray.stages.imaging``).
Only VIDEO decode remains stubbed: no demuxer/inter-frame codec can
be reimplemented from stdlib (PIL/cv2/imageio/av all absent).
``FakeMediaDecoder`` produces deterministic pseudo-metadata from the
media_ref hash so pipelines and tests have stable, non-trivial values
for every kind.

Large binary payloads => keep ``batch_size`` small for these stages
(documented: a decoded image batch of B rows × H×W×3 bytes must fit the
worker heap; pick B so B × payload <= ~256 MiB).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ner_ray.schema import AUDIO_STATS
from ner_ray.stages.spans import flatten_spans
from ner_ray.util.hashing import hash_column

MEDIA_META = pa.schema(
    [
        ("doc_id", pa.string()),
        ("span_idx", pa.int32()),
        ("media_ref", pa.string()),
        ("kind", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_bytes", pa.int64()),
        ("feature", pa.list_(pa.float32())),
    ]
)


def _flat_media(batch: pa.Table) -> pa.Table:
    """Nested docs -> flat media-span rows; an already-flat input (e.g.
    media rows joined with blob/audio columns) passes through, minus
    any text spans."""
    if "spans" in batch.schema.names:
        batch = flatten_spans(batch)
    if "kind" in batch.schema.names:
        batch = batch.filter(
            pa.compute.not_equal(batch.column("kind"), "text"))
    return batch


class FakeMediaDecoder:
    """Actor-pool decode stage with a deterministic fake backend.

    width/height/n_bytes/feature derive from the stable hash of
    media_ref — reproducible across runs and processes, no RNG state.
    """

    FEATURE_DIM = 8

    def __init__(self):
        # real decoders would load codecs/models here, once per actor
        pass

    def __call__(self, batch: pa.Table) -> pa.Table:
        media = _flat_media(batch)
        refs = media.column("media_ref")
        h = hash_column(refs) if len(media) else np.array([], dtype=np.uint64)
        width = (64 + (h % np.uint64(1024))).astype(np.int32)
        height = (64 + ((h >> np.uint64(10)) % np.uint64(1024))).astype(np.int32)
        n_bytes = (width.astype(np.int64) * height.astype(np.int64) * 3)
        # deterministic fake feature vector per media item
        feat = np.empty((len(media), self.FEATURE_DIM), dtype=np.float32)
        for d in range(self.FEATURE_DIM):
            feat[:, d] = (((h >> np.uint64(8 * (d % 8))) & np.uint64(0xFF))
                          .astype(np.float32) / 255.0)
        flat_feat = pa.array(feat.reshape(-1), pa.float32())
        offsets = pa.array(
            np.arange(0, (len(media) + 1) * self.FEATURE_DIM,
                      self.FEATURE_DIM, dtype=np.int32), pa.int32())
        return pa.table(
            {
                "doc_id": media.column("doc_id"),
                "span_idx": media.column("span_idx"),
                "media_ref": media.column("media_ref"),
                "kind": media.column("kind"),
                "width": pa.array(width, pa.int32()),
                "height": pa.array(height, pa.int32()),
                "n_bytes": pa.array(n_bytes, pa.int64()),
                "feature": pa.ListArray.from_arrays(offsets, flat_feat),
            },
            schema=MEDIA_META,
        )


FRAME_SAMPLE = pa.schema(
    [
        ("doc_id", pa.string()),
        ("span_idx", pa.int32()),
        ("media_ref", pa.string()),
        ("frame_idx", pa.int32()),
        ("frame_ref", pa.string()),
    ]
)


class FakeFrameSampler:
    """Frame-sampling stage for video/audio spans: emits every k-th
    frame index up to a deterministic fake frame count (hash-derived).
    Real decoders would demux here; the Ray plumbing (actor signature,
    flat frame rows, small batches for binary payloads) is the tested
    part."""

    def __init__(self, stride: int = 10, max_frames: int = 8):
        self.stride = stride
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        media = _flat_media(batch)
        if len(media) == 0:
            return FRAME_SAMPLE.empty_table()
        refs = media.column("media_ref").to_numpy(zero_copy_only=False)
        h = hash_column(media.column("media_ref"))
        n_frames = (1 + (h % np.uint64(100))).astype(np.int64)
        n_sampled = np.minimum((n_frames + self.stride - 1) // self.stride,
                               self.max_frames).astype(np.int64)
        rep = np.repeat(np.arange(len(media)), n_sampled)
        frame_idx = (np.arange(int(n_sampled.sum()))
                     - np.repeat(np.cumsum(n_sampled) - n_sampled,
                                 n_sampled)) * self.stride
        doc = media.column("doc_id").to_numpy(zero_copy_only=False)[rep]
        sidx = media.column("span_idx").to_numpy(zero_copy_only=False)[rep]
        ref_rep = refs[rep]
        frame_ref = pd.Series(ref_rep).str.cat(
            pd.Series(frame_idx).astype(str), sep="#frame=") \
            .to_numpy(dtype=object)
        return pa.table(
            {
                "doc_id": pa.array(doc, pa.string()),
                "span_idx": pa.array(sidx.astype(np.int32), pa.int32()),
                "media_ref": pa.array(ref_rep, pa.string()),
                "frame_idx": pa.array(frame_idx.astype(np.int32),
                                      pa.int32()),
                "frame_ref": pa.array(frame_ref, pa.string()),
            },
            schema=FRAME_SAMPLE,
        )


def frame_samples(docs_ds, stride: int = 10, max_frames: int = 8,
                  batch_size: int = 512):
    return docs_ds.map_batches(
        FakeFrameSampler(stride, max_frames), batch_format="pyarrow",
        batch_size=batch_size)


class RealMediaDecoder(FakeMediaDecoder):
    """The production decode signature. AUDIO is decoded for real
    (stdlib ``wave``: sample rate / channels / frame count / duration /
    int16 peak) and IMAGE is decoded for real (PNG/BMP/netpbm via the
    pure stdlib+numpy parsers in ner_ray.stages.imaging: format /
    width / height / channels / mean luma). Only VIDEO remains
    stubbed — no demuxer or inter-frame codec exists in this container
    (PIL/cv2/imageio/av/soundfile all absent), so that kind raises
    NotImplementedError."""

    def decode_media(self, media_bytes: bytes, kind: str) -> dict:
        if kind == "image":
            from ner_ray.stages.imaging import decode_image, luma

            img, fmt = decode_image(media_bytes)
            return {
                "format": fmt,
                "width": int(img.shape[1]),
                "height": int(img.shape[0]),
                "channels": 1 if img.ndim == 2 else int(img.shape[2]),
                "mean_luma": float(luma(img).mean()),
            }
        if kind == "audio":
            import io
            import wave

            with wave.open(io.BytesIO(media_bytes), "rb") as w:
                nch = w.getnchannels()
                sw = w.getsampwidth()
                rate = w.getframerate()
                nf = w.getnframes()
                raw = w.readframes(nf)
            peak = 0
            if sw == 2 and raw:
                peak = int(np.abs(
                    np.frombuffer(raw, dtype="<i2").astype(np.int32)).max())
            return {"sample_rate": rate, "channels": nch, "n_frames": nf,
                    "duration_s": nf / rate if rate else 0.0, "peak": peak}
        raise NotImplementedError(
            f"{kind} decode requires codecs not present in this "
            "environment (audio/WAV via stdlib wave and image "
            "PNG/BMP/netpbm via ner_ray.stages.imaging are the real "
            "decode paths; video demux is not reimplementable from "
            "stdlib); see FakeMediaDecoder for the tested plumbing and "
            "the module docstring for batch-sizing guidance"
        )


class AudioStatsStage:
    """Actor-pool real-decode stage over a MEDIA_BLOBS table. Audio
    rows decode their actual WAV bytes (stdlib wave); non-audio rows
    emit typed nulls (their codecs don't exist here). The per-item
    loop is inherent to codec decode — each payload is an opaque
    container — so this is the one stage exempt from the
    no-row-loops rule; keep batches small (binary payloads)."""

    def __init__(self):
        self.decoder = RealMediaDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        kinds = batch.column("kind").to_pylist()
        blobs = batch.column("media_bytes").to_pylist()
        n = len(refs)
        rate = np.zeros(n, np.int32)
        nch = np.zeros(n, np.int32)
        nf = np.zeros(n, np.int64)
        dur = np.zeros(n, np.float64)
        peak = np.zeros(n, np.int32)
        is_audio = np.zeros(n, bool)
        for i, (k, b) in enumerate(zip(kinds, blobs)):
            if k != "audio":
                continue
            st = self.decoder.decode_media(b, "audio")
            is_audio[i] = True
            rate[i] = st["sample_rate"]
            nch[i] = st["channels"]
            nf[i] = st["n_frames"]
            dur[i] = st["duration_s"]
            peak[i] = st["peak"]
        mask = pa.array(~is_audio)

        def nullable(vals, typ):
            a = pa.array(vals, typ)
            if not is_audio.all():
                a = pa.compute.if_else(mask, pa.nulls(n, typ), a)
            return a

        return pa.table({
            "media_ref": batch.column("media_ref"),
            "sample_rate": nullable(rate, pa.int32()),
            "channels": nullable(nch, pa.int32()),
            "n_frames": nullable(nf, pa.int64()),
            "duration_s": nullable(dur, pa.float64()),
            "peak": nullable(peak, pa.int32()),
        }, schema=AUDIO_STATS)


def audio_stats(blobs_ds, concurrency=(1, 4), batch_size: int = 64):
    """Real WAV decode over a media-blobs Dataset (small batches: each
    row carries a binary payload)."""
    return blobs_ds.map_batches(
        AudioStatsStage, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)


class BlobStatsStage:
    """Fused REAL decode over a MEDIA_BLOBS table: one actor-pool pass
    emits audio columns (stdlib wave) AND image columns (pure
    stdlib+numpy PNG/BMP/netpbm parsers) side by side — audio rows
    carry nulls in the image columns and vice versa. Image columns are
    prefixed img_ so they can sit beside the media pipeline's own
    width/height, and the list-typed image feature is omitted here
    because this output feeds Ray's hash join (Arrow acero rejects
    list<> non-key columns); use imaging.image_stats for features."""

    _IMG_RENAME = {"format": "img_format", "width": "img_width",
                   "height": "img_height", "channels": "img_channels",
                   "mean_luma": "mean_luma"}

    def __init__(self):
        from ner_ray.stages.imaging import ImageStatsStage

        self.audio = AudioStatsStage()
        self.image = ImageStatsStage()

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = self.audio(batch)
        img = self.image(batch)
        for src, dst in self._IMG_RENAME.items():
            out = out.append_column(dst, img.column(src))
        return out


def blob_stats(blobs_ds, concurrency=(1, 4), batch_size: int = 64):
    """Fused real audio+image decode (one pass over the binary
    payloads; small batches)."""
    return blobs_ds.map_batches(
        BlobStatsStage, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)


def media_stats(docs_ds, concurrency=(1, 4), batch_size: int = 512):
    """Media metadata extraction over interleaved docs (actor pool,
    small batches per the binary-payload sizing rule)."""
    return docs_ds.map_batches(
        FakeMediaDecoder, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)


class MediaPipelineStage:
    """Fused decode-stats + frame-sampling: one row per media span with
    metadata columns plus the sampled frame refs as a list<string>
    column. Exercises both multimodal operators in a single pass; the
    flat per-frame layout remains available via frame_samples()."""

    def __init__(self, stride: int = 10, max_frames: int = 8):
        self.decoder = FakeMediaDecoder()
        self.sampler = FakeFrameSampler(stride, max_frames)

    # carried media keys + blob payloads never duplicate into output
    _NO_CARRY = {"doc_id", "span_idx", "media_ref", "kind", "text",
                 "offset", "media_bytes"}

    def __call__(self, batch: pa.Table) -> pa.Table:
        media = _flat_media(batch)
        stats = self.decoder(media)
        frames = self.sampler(media)
        # the sampler emits frame rows grouped consecutively in media-row
        # order (np.repeat over the same flatten); recover per-media
        # counts from the frames table itself — run-length over the
        # (doc_id, span_idx) key — so this stage never re-derives the
        # sampler's internal frame-count formula. The run-key SEQUENCE
        # must equal the stats key sequence exactly (the sampler emits
        # >= 1 frame per media span), so misordered frames can never be
        # attached to the wrong media span.
        sd = stats.column("doc_id").to_numpy(zero_copy_only=False)
        ss = stats.column("span_idx").to_numpy(zero_copy_only=False)
        fd = frames.column("doc_id").to_numpy(zero_copy_only=False)
        fs = frames.column("span_idx").to_numpy(zero_copy_only=False)
        if len(fd) == 0:
            n_sampled = np.zeros(len(sd), dtype=np.int64)
        else:
            new = np.ones(len(fd), dtype=bool)
            new[1:] = (fd[1:] != fd[:-1]) | (fs[1:] != fs[:-1])
            starts = np.flatnonzero(new)
            run_lens = np.diff(np.append(starts, len(fd)))
            # a span may legally sample ZERO frames (max_frames=0, or a
            # zero-length clip), so the runs are an ordered SUBSEQUENCE
            # of the stats rows, not a bijection: left-join run lengths
            # onto the stats keys and fill the frameless spans with 0
            import pandas as pd

            merged = pd.DataFrame({"d": sd, "s": ss}).merge(
                pd.DataFrame({"d": fd[starts], "s": fs[starts],
                              "n": run_lens}),
                on=["d", "s"], how="left")
            n_sampled = merged["n"].fillna(0).to_numpy(np.int64)
            nz = n_sampled > 0
            if (len(merged) != len(sd)
                    or int(n_sampled.sum()) != len(fd)
                    or not np.array_equal(sd[nz], fd[starts])
                    or not np.array_equal(ss[nz], fs[starts])):
                raise ValueError(
                    "frame rows are not grouped in stats row order — "
                    "sampler and decoder disagree on the media row "
                    "set or its ordering")
        offsets = pa.array(
            np.concatenate([[0], np.cumsum(n_sampled)]).astype(np.int32),
            pa.int32())
        flist = pa.ListArray.from_arrays(
            offsets, frames.column("frame_ref").combine_chunks())
        out = stats.append_column(
            "n_frames_sampled", pa.array(n_sampled, pa.int64())
        ).append_column("frames", flist)
        # carry through any extra input columns (e.g. real audio stats
        # joined onto flat media rows) — same row order as the decoder
        for name in media.schema.names:
            if name in self._NO_CARRY or name in out.schema.names:
                continue
            out = out.append_column(name, media.column(name))
        return out


def media_pipeline(docs_ds, stride: int = 10, max_frames: int = 8,
                   concurrency=(1, 4), batch_size: int = 512):
    return docs_ds.map_batches(
        MediaPipelineStage,
        fn_constructor_kwargs={"stride": stride, "max_frames": max_frames},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)
