"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The reference's data model is scalar-only (SURVEY §1.2); at
training-data scale image/audio/video ride as Arrow ``binary`` columns.
This module makes the Ray-side plumbing real — schema, actor-pool
signatures, small-batch sizing, output layout — while the actual codec
calls are STUBBED (the decode libraries are not in this container):

- :class:`ImageDecodeStage` / :class:`AudioFeatureStage` /
  :class:`VideoFrameSampleStage` — callable actor classes for
  ``map_batches(cls, concurrency=N, batch_size=SMALL)``.  ``__init__``
  is where a real build would load the codec/model once per actor.
- ``decode_fn=None`` raises ``NotImplementedError`` per batch;
  ``deterministic_fake=True`` substitutes a pure function of the bytes
  so the pipeline shape is testable end-to-end.

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

MULTIMODAL_SCHEMA = pa.schema(
    [
        ("item_id", pa.string()),
        ("payload", pa.binary()),
        ("media_type", pa.string()),   # image/jpeg, audio/wav, video/mp4 …
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int64()),
    ]
)


def _fake_vec(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake feature vector: a pure function of the bytes
    (md5-seeded), so tests are stable without any codec library."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "little")
    return np.random.default_rng(seed).standard_normal(dim).astype(np.float32)


class ImageDecodeStage:
    """binary → (item_id, width, height, feature:list<float>).

    Real build: ``__init__`` loads PIL/torchvision + a feature model
    once per actor; ``__call__`` decodes and embeds the batch on
    vectorized tensors."""

    def __init__(self, feature_dim: int = 64, deterministic_fake: bool = False):
        self.dim = feature_dim
        self.fake = deterministic_fake
        # real build: self.model = load_model(...)  # once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "image decode requires PIL/torchvision (not in this container); "
                "construct with deterministic_fake=True for pipeline tests"
            )
        payloads = batch["payload"].to_pylist()
        feats = [_fake_vec(p, self.dim) for p in payloads]
        return pa.table(
            {
                "item_id": batch["item_id"],
                "width": batch["width"],
                "height": batch["height"],
                "feature": pa.array(feats, pa.list_(pa.float32())),
            }
        )


class AudioFeatureStage:
    """binary → (item_id, duration_ms, mfcc:list<float>) — stub."""

    def __init__(self, n_mfcc: int = 13, deterministic_fake: bool = False):
        self.n_mfcc = n_mfcc
        self.fake = deterministic_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "audio decode requires librosa/soundfile (not in this container)"
            )
        feats = [_fake_vec(p, self.n_mfcc) for p in batch["payload"].to_pylist()]
        return pa.table(
            {
                "item_id": batch["item_id"],
                "duration_ms": batch["duration_ms"],
                "mfcc": pa.array(feats, pa.list_(pa.float32())),
            }
        )


class VideoFrameSampleStage:
    """binary → one row per sampled frame (item_id, frame_idx,
    frame_feature) — stub; real build samples every Nth frame."""

    def __init__(self, frames_per_item: int = 4, feature_dim: int = 64,
                 deterministic_fake: bool = False):
        self.k = frames_per_item
        self.dim = feature_dim
        self.fake = deterministic_fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "video decode requires pyav/opencv (not in this container)"
            )
        ids, idxs, feats = [], [], []
        for item, p in zip(batch["item_id"].to_pylist(), batch["payload"].to_pylist()):
            for f in range(self.k):
                ids.append(item)
                idxs.append(f)
                feats.append(_fake_vec(p + bytes([f]), self.dim))
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


def synth_multimodal_dataset(n: int = 64, payload_bytes: int = 256) -> "ray.data.Dataset":
    """Deterministic fake multimodal table for plumbing tests."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"item-{i}".encode()).digest() * (
            payload_bytes // 32
        )
        rows.append(
            {
                "item_id": f"item-{i:05d}",
                "payload": payload,
                "media_type": ["image/jpeg", "audio/wav", "video/mp4"][i % 3],
                "width": 640,
                "height": 480,
                "duration_ms": 1000 + i,
            }
        )
    return ray.data.from_items(rows)


__all__ = [
    "MULTIMODAL_SCHEMA",
    "ImageDecodeStage",
    "AudioFeatureStage",
    "VideoFrameSampleStage",
    "decode_stage",
    "synth_multimodal_dataset",
]
