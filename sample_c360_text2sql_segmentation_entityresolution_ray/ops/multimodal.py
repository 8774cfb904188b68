"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

The reference's data model is scalar-only (SURVEY §1.2); at
training-data scale image/audio/video ride as Arrow ``binary`` columns
with decode / feature-extract / frame-sample as actor-pool
``map_batches`` stages.

Decode is REAL for every format a pure-numpy/stdlib codec can handle
(``functions.codecs``): BMP 24-bit, PPM P6, PNG (8-bit gray/RGB/RGBA
— DEFLATE is stdlib zlib), WAV PCM16, and the documented RVID
raw-video layout.  Codecs that genuinely require external libraries
absent from this container (JPEG/MP3/H.264) raise
``NotImplementedError`` — unless ``deterministic_fake=True``
substitutes a pure function of the bytes so pipeline shape stays
testable for those types too.

Features are real numpy kernels: images → 8×8 luma vectors
(nearest-resize + Rec.601), audio → average log-mel band energies
(hann + rFFT + mel filterbank), video → per-sampled-frame luma
vectors.

Batch sizing: binary payloads make blocks heavy — callers should pass
``batch_size`` ≈ (worker heap / payload size / concurrency) and keep
``DataContext.target_max_block_size`` small for these stages
(SURVEY §7.4 'wide binary rows').
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

from ..functions import codecs

MULTIMODAL_SCHEMA = pa.schema(
    [
        ("item_id", pa.string()),
        ("payload", pa.binary()),
        ("media_type", pa.string()),   # image/bmp, audio/wav, video/x-rvid …
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int64()),
    ]
)

def _decode_png_rgb(payload: bytes) -> np.ndarray:
    """PNG → (h, w, 3) RGB for the feature kernel: gray broadcast to
    three channels, RGBA alpha dropped."""
    img = codecs.decode_png(payload)
    if img.ndim == 2:
        return np.repeat(img[:, :, None], 3, axis=2)
    if img.shape[2] == 4:
        return np.ascontiguousarray(img[:, :, :3])
    return img


# media types the container can decode without external libraries
_IMAGE_DECODERS = {
    "image/bmp": codecs.decode_bmp,
    "image/x-portable-pixmap": codecs.decode_ppm,
    "image/ppm": codecs.decode_ppm,
    "image/png": _decode_png_rgb,  # REAL decode — stdlib zlib DEFLATE
}


def _fake_vec(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake feature vector: a pure function of the bytes
    (md5-seeded) — the stand-in for types that need absent codecs."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "little")
    return np.random.default_rng(seed).standard_normal(dim).astype(np.float32)


class ImageDecodeStage:
    """binary → (item_id, width, height, feature:list<float>).

    BMP/PPM decode + the 8×8 luma feature are real; compressed types
    raise unless ``deterministic_fake``.  A real JPEG build would load
    PIL/torchvision once per actor in ``__init__`` — the actor-pool
    shape is already right for that."""

    def __init__(self, feature_dim: int = 64, deterministic_fake: bool = False):
        side = int(round(feature_dim ** 0.5))
        if side * side != feature_dim:
            raise ValueError("feature_dim must be a square (luma grid)")
        self.side = side
        self.dim = feature_dim
        self.fake = deterministic_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        mtypes = batch["media_type"].to_pylist()
        feats, widths, heights = [], [], []
        for p, mt in zip(payloads, mtypes):
            dec = _IMAGE_DECODERS.get(mt)
            if dec is not None:
                img = dec(p)
                feats.append(codecs.image_feature(img, self.side))
                heights.append(img.shape[0])
                widths.append(img.shape[1])
            elif self.fake:
                feats.append(_fake_vec(p, self.dim))
                widths.append(None)
                heights.append(None)
            else:
                raise NotImplementedError(
                    f"decoding {mt} requires an external codec library "
                    "(not in this container); BMP/PPM decode natively, or "
                    "construct with deterministic_fake=True"
                )
        return pa.table(
            {
                "item_id": batch["item_id"],
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "feature": pa.array(feats, pa.list_(pa.float32())),
            }
        )


class ImageResizeStage:
    """binary → (item_id, payload, media_type, width, height): decode,
    nearest-neighbor resize to ``out_h`` × ``out_w``, re-encode as
    uncompressed PPM (P6) — the thumbnail/normalize pass a multimodal
    training pipeline runs before feature extraction.

    Real kernels end-to-end for BMP/PPM/PNG (numpy resize, stdlib
    codecs); compressed inputs outside the registry raise unless
    ``deterministic_fake`` (which passes the payload through
    untouched with null dims).  Output payloads are PPM because the
    re-encode must not need an external library; a production build
    swaps the encoder in ``__init__`` (once per actor), not per batch.
    """

    def __init__(self, out_h: int = 16, out_w: int = 16,
                 deterministic_fake: bool = False):
        self.out_h = int(out_h)
        self.out_w = int(out_w)
        self.fake = deterministic_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        mtypes = batch["media_type"].to_pylist()
        out_p, out_mt, widths, heights = [], [], [], []
        for p, mt in zip(payloads, mtypes):
            dec = _IMAGE_DECODERS.get(mt)
            if dec is not None:
                img = codecs.resize_nearest(dec(p), self.out_h, self.out_w)
                out_p.append(codecs.encode_ppm(img))
                out_mt.append("image/ppm")
                heights.append(self.out_h)
                widths.append(self.out_w)
            elif self.fake:
                out_p.append(p)
                out_mt.append(mt)
                widths.append(None)
                heights.append(None)
            else:
                raise NotImplementedError(
                    f"decoding {mt} requires an external codec library "
                    "(not in this container); BMP/PPM/PNG resize natively, "
                    "or construct with deterministic_fake=True"
                )
        return pa.table(
            {
                "item_id": batch["item_id"],
                "payload": pa.array(out_p, pa.binary()),
                "media_type": pa.array(out_mt, pa.string()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
            }
        )


class AudioFeatureStage:
    """binary → (item_id, duration_ms, mfcc:list<float>).  WAV PCM16
    decode + log-mel energies are real numpy DSP; compressed audio
    raises unless ``deterministic_fake``."""

    def __init__(self, n_mfcc: int = 13, deterministic_fake: bool = False):
        self.n_mfcc = n_mfcc
        self.fake = deterministic_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, durs = [], []
        for p, mt in zip(
            batch["payload"].to_pylist(), batch["media_type"].to_pylist()
        ):
            if mt == "audio/wav":
                samples, sr = codecs.decode_wav(p)
                feats.append(codecs.logmel_energies(samples, sr, self.n_mfcc))
                durs.append(int(len(samples) * 1000 / sr))
            elif self.fake:
                feats.append(_fake_vec(p, self.n_mfcc))
                durs.append(None)
            else:
                raise NotImplementedError(
                    f"decoding {mt} requires an external codec library; "
                    "WAV PCM16 decodes natively"
                )
        return pa.table(
            {
                "item_id": batch["item_id"],
                "duration_ms": pa.array(durs, pa.int64()),
                "mfcc": pa.array(feats, pa.list_(pa.float32())),
            }
        )


class VideoFrameSampleStage:
    """binary → one row per sampled frame (item_id, frame_idx,
    frame_feature).  RVID raw video decodes + samples for real (evenly
    spaced frames, 8×8 luma per frame); container formats raise unless
    ``deterministic_fake``."""

    def __init__(self, frames_per_item: int = 4, feature_dim: int = 64,
                 deterministic_fake: bool = False):
        side = int(round(feature_dim ** 0.5))
        if side * side != feature_dim:
            raise ValueError("feature_dim must be a square (luma grid)")
        self.k = frames_per_item
        self.side = side
        self.dim = feature_dim
        self.fake = deterministic_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, feats = [], [], []
        for item, p, mt in zip(
            batch["item_id"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["media_type"].to_pylist(),
        ):
            if mt == "video/x-rvid":
                frames = codecs.decode_rawvideo(p)
                n = frames.shape[0]
                pick = np.linspace(0, n - 1, min(self.k, n)).astype(int)
                for f in pick:
                    ids.append(item)
                    idxs.append(int(f))
                    feats.append(codecs.image_feature(frames[f], self.side))
            elif self.fake:
                for f in range(self.k):
                    ids.append(item)
                    idxs.append(f)
                    feats.append(_fake_vec(p + bytes([f]), self.dim))
            else:
                raise NotImplementedError(
                    f"decoding {mt} requires an external codec library; "
                    "RVID raw video decodes natively"
                )
        return pa.table(
            {
                "item_id": pa.array(ids, pa.string()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "frame_feature": pa.array(feats, pa.list_(pa.float32())),
            }
        )


def decode_stage(
    ds: "ray.data.Dataset",
    stage_cls,
    concurrency: int = 4,
    batch_size: int = 32,
    **stage_kwargs,
) -> "ray.data.Dataset":
    """Run a multimodal actor-pool stage with small-batch sizing."""
    return ds.map_batches(
        stage_cls,
        fn_constructor_kwargs=stage_kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),  # autoscaling: never deadlock a small cluster
        num_cpus=1,
    )


def synth_multimodal_rows(
    n: int = 64, img_side: int = 24, wav_ms: int = 80, vid_frames: int = 6
) -> list[dict]:
    """Deterministic multimodal rows with REAL payloads — the pure
    generator under :func:`synth_multimodal_dataset`, also used by the
    oracle fixture export (no Ray)."""
    rows = []
    for i in range(n):
        rng = np.random.default_rng(1000 + i)
        kind = i % 4
        if kind in (0, 3):
            img = (
                rng.integers(0, 256, (img_side, img_side, 3)).astype(np.uint8)
            )
            enc, mt = (
                (codecs.encode_bmp, "image/bmp")
                if kind == 0
                else (codecs.encode_png, "image/png")
            )
            rows.append(
                {
                    "item_id": f"item-{i:05d}",
                    "payload": enc(img),
                    "media_type": mt,
                    "width": img_side,
                    "height": img_side,
                    "duration_ms": 0,
                }
            )
        elif kind == 1:
            sr = 8000
            t = np.arange(int(sr * wav_ms / 1000)) / sr
            tone = 0.5 * np.sin(2 * np.pi * (220 + 20 * i) * t)
            rows.append(
                {
                    "item_id": f"item-{i:05d}",
                    "payload": codecs.encode_wav(tone, sr),
                    "media_type": "audio/wav",
                    "width": 0,
                    "height": 0,
                    "duration_ms": wav_ms,
                }
            )
        else:
            frames = rng.integers(
                0, 256, (vid_frames, img_side, img_side, 3)
            ).astype(np.uint8)
            rows.append(
                {
                    "item_id": f"item-{i:05d}",
                    "payload": codecs.encode_rawvideo(frames),
                    "media_type": "video/x-rvid",
                    "width": img_side,
                    "height": img_side,
                    "duration_ms": vid_frames * 40,
                }
            )
    return rows


def synth_multimodal_dataset(
    n: int = 64, img_side: int = 24, wav_ms: int = 80, vid_frames: int = 6
) -> "ray.data.Dataset":
    """Deterministic multimodal table with REAL payloads: BMP gradient
    images, WAV sine tones, RVID clips — every row decodable by the
    stages above with no codec library and no external data."""
    return ray.data.from_items(
        synth_multimodal_rows(n, img_side, wav_ms, vid_frames)
    )


__all__ = [
    "MULTIMODAL_SCHEMA",
    "ImageDecodeStage",
    "ImageResizeStage",
    "AudioFeatureStage",
    "VideoFrameSampleStage",
    "decode_stage",
    "synth_multimodal_rows",
    "synth_multimodal_dataset",
]
