"""Multimodal: real uncompressed-format decode + actor-pool plumbing.

BMP/PPM/PNG/WAV/RVID decode natively (functions/codecs.py — numpy/stdlib
only); compressed formats stay honestly gated behind
NotImplementedError unless deterministic_fake substitutes a pure
function of the bytes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from sample_c360_text2sql_segmentation_entityresolution_ray.functions import codecs
from sample_c360_text2sql_segmentation_entityresolution_ray.ops.multimodal import (
    AudioFeatureStage,
    ImageDecodeStage,
    VideoFrameSampleStage,
    decode_stage,
    synth_multimodal_dataset,
)


def test_codec_round_trips():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (17, 23, 3)).astype(np.uint8)  # non-4-mult width
    np.testing.assert_array_equal(codecs.decode_bmp(codecs.encode_bmp(img)), img)
    np.testing.assert_array_equal(codecs.decode_ppm(codecs.encode_ppm(img)), img)
    tone = 0.25 * np.sin(np.linspace(0, 40 * np.pi, 4000))
    back, sr = codecs.decode_wav(codecs.encode_wav(tone, 8000))
    assert sr == 8000
    np.testing.assert_allclose(back, tone, atol=1e-4)
    frames = rng.integers(0, 256, (5, 9, 11, 3)).astype(np.uint8)
    np.testing.assert_array_equal(
        codecs.decode_rawvideo(codecs.encode_rawvideo(frames)), frames
    )


def _only(ds, mt):
    import pyarrow.compute as pc

    return ds.map_batches(
        lambda b: b.filter(pc.equal(b["media_type"], mt)), batch_format="pyarrow"
    )


def test_image_stage_real_decode():
    ds = synth_multimodal_dataset(n=12, img_side=24)
    out = decode_stage(
        _only(ds, "image/bmp"), ImageDecodeStage, concurrency=2, batch_size=4
    ).to_pandas()
    assert len(out) == 3  # kind 0 of 4 is a BMP image
    assert (out["width"] == 24).all() and (out["height"] == 24).all()
    # feature equals the kernel applied to the decoded payload directly
    row = out.sort_values("item_id").iloc[0]
    src = synth_multimodal_dataset(n=1).take(1)[0]
    img = codecs.decode_bmp(src["payload"])
    np.testing.assert_allclose(
        np.asarray(row["feature"]), codecs.image_feature(img, 8), rtol=1e-6
    )
    assert len(row["feature"]) == 64 and np.all(np.asarray(row["feature"]) <= 1.0)


def test_audio_stage_real_decode():
    ds = synth_multimodal_dataset(n=12, wav_ms=80)
    out = decode_stage(
        _only(ds, "audio/wav"), AudioFeatureStage, concurrency=1, batch_size=4
    ).to_pandas()
    assert len(out) == 3
    assert (out["duration_ms"] == 80).all()
    m = np.stack(out["mfcc"].to_numpy())
    assert m.shape == (3, 13) and np.isfinite(m).all()
    # different tones → different band energies
    assert not np.allclose(m[0], m[1])


def test_video_stage_real_frame_sampling():
    ds = synth_multimodal_dataset(n=12, vid_frames=6)
    out = decode_stage(
        _only(ds, "video/x-rvid"),
        VideoFrameSampleStage,
        concurrency=1,
        batch_size=4,
        frames_per_item=3,
    ).to_pandas()
    assert len(out) == 9  # 3 videos × 3 sampled frames
    assert set(out.columns) == {"item_id", "frame_idx", "frame_feature"}
    # evenly spaced over 6 frames: 0, 2 (rounded), 5
    one = out[out["item_id"] == out["item_id"].iloc[0]]
    assert list(one["frame_idx"]) == [0, 2, 5]


def test_compressed_formats_stay_gated():
    rows = [
        {
            "item_id": "x",
            "payload": b"\xff\xd8\xff\xe0 not a real jpeg",
            "media_type": "image/jpeg",
            "width": 1,
            "height": 1,
            "duration_ms": 0,
        }
    ]
    ds = ray.data.from_items(rows)
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        decode_stage(ds, ImageDecodeStage, concurrency=1, batch_size=1).to_pandas()
    # fake path still covers undecodable types deterministically
    out1 = decode_stage(
        ds, ImageDecodeStage, concurrency=1, batch_size=1, deterministic_fake=True
    ).to_pandas()
    out2 = decode_stage(
        ds, ImageDecodeStage, concurrency=1, batch_size=1, deterministic_fake=True
    ).to_pandas()
    np.testing.assert_array_equal(
        np.asarray(out1["feature"].iloc[0]), np.asarray(out2["feature"].iloc[0])
    )


def test_png_roundtrip_and_filters():
    """PNG is a REAL compressed codec here (stdlib zlib): roundtrip for
    gray/RGB/RGBA, plus decode of every spec filter type built by
    applying the spec's forward filters in the test."""
    import struct
    import zlib

    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, (9, 7, 3)).astype(np.uint8)
    rgba = rng.integers(0, 256, (5, 6, 4)).astype(np.uint8)
    gray = rng.integers(0, 256, (8, 8)).astype(np.uint8)
    np.testing.assert_array_equal(codecs.decode_png(codecs.encode_png(rgb)), rgb)
    np.testing.assert_array_equal(codecs.decode_png(codecs.encode_png(rgba)), rgba)
    np.testing.assert_array_equal(codecs.decode_png(codecs.encode_png(gray)), gray)

    # forward-filter a known image with each filter type per scanline
    # (the spec's inverse of what decode_png undoes)
    img = rng.integers(0, 256, (5, 4, 3)).astype(np.uint8)
    h, w, c = img.shape
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int32)

    def paeth(a, b, cc):
        p = a + b - cc
        pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
        if pa_ <= pb and pa_ <= pc_:
            return a
        return b if pb <= pc_ else cc

    lines = []
    for y, f in zip(range(h), [0, 1, 2, 3, 4]):
        cur = flat[y]
        prior = flat[y - 1] if y else np.zeros(stride, np.int32)
        filt = np.zeros(stride, np.int32)
        for x in range(stride):
            left = cur[x - c] if x >= c else 0
            ul = prior[x - c] if x >= c else 0
            if f == 0:
                filt[x] = cur[x]
            elif f == 1:
                filt[x] = cur[x] - left
            elif f == 2:
                filt[x] = cur[x] - prior[x]
            elif f == 3:
                filt[x] = cur[x] - ((left + prior[x]) >> 1)
            else:
                filt[x] = cur[x] - paeth(int(left), int(prior[x]), int(ul))
        lines.append(bytes([f]) + (filt & 255).astype(np.uint8).tobytes())

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    payload = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(b"".join(lines)))
               + chunk(b"IEND", b""))
    np.testing.assert_array_equal(codecs.decode_png(payload), img)

    # honest limitations raise, never silently mis-decode
    bad = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
           + chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        codecs.decode_png(bad)


def test_png_image_stage():
    """image/png rides the same actor-pool decode stage with REAL
    decode (no fake): features equal the kernel on the decoded bytes."""
    ds = synth_multimodal_dataset(n=12, img_side=16)
    out = decode_stage(
        _only(ds, "image/png"), ImageDecodeStage, concurrency=1, batch_size=4
    ).to_pandas()
    assert len(out) == 3  # kind 3 of 4 is a PNG image
    assert (out["width"] == 16).all() and (out["height"] == 16).all()
    src = [r for r in synth_multimodal_dataset(n=12, img_side=16).take_all()
           if r["media_type"] == "image/png"]
    row = out.sort_values("item_id").iloc[0]
    first = sorted(src, key=lambda r: r["item_id"])[0]
    img = codecs.decode_png(first["payload"])
    np.testing.assert_allclose(
        np.asarray(row["feature"]), codecs.image_feature(img, 8), rtol=1e-6
    )


def test_image_resize_stage_byte_exact():
    """Resize stage output is byte-identical to the pure-numpy
    reference (decode → resize_nearest → encode_ppm) for every real
    image codec, and dims are pinned."""
    ds = synth_multimodal_dataset(n=16, img_side=24)
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.multimodal import ImageResizeStage

    imgs = _only(ds, "image/bmp")
    out = decode_stage(
        imgs, ImageResizeStage, concurrency=1, batch_size=4,
        out_h=8, out_w=12,
    ).to_pandas().sort_values("item_id").reset_index(drop=True)
    assert (out["width"] == 12).all() and (out["height"] == 8).all()
    assert (out["media_type"] == "image/ppm").all()
    src = sorted(
        (r for r in synth_multimodal_dataset(n=16, img_side=24).take_all()
         if r["media_type"] == "image/bmp"),
        key=lambda r: r["item_id"],
    )
    for row, ref in zip(out.itertuples(), src):
        want = codecs.encode_ppm(
            codecs.resize_nearest(codecs.decode_bmp(ref["payload"]), 8, 12)
        )
        assert bytes(row.payload) == want


def test_image_resize_stage_gates_compressed():
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.multimodal import ImageResizeStage

    jpeg = ray.data.from_arrow(pa.table({
        "item_id": ["x"], "payload": [b"\xff\xd8\xff"],
        "media_type": ["image/jpeg"],
    }))
    with pytest.raises(Exception, match="codec library"):
        decode_stage(jpeg, ImageResizeStage, concurrency=1).to_pandas()
    # deterministic_fake passes payloads through with null dims
    out = decode_stage(
        jpeg, ImageResizeStage, concurrency=1, deterministic_fake=True
    ).to_pandas()
    assert bytes(out["payload"][0]) == b"\xff\xd8\xff"
    assert pd.isna(out["width"][0])
