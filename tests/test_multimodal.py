"""Multimodal plumbing: schema, actor-pool signature, stub behavior."""

from __future__ import annotations

import numpy as np
import pytest

from sample_c360_text2sql_segmentation_entityresolution_ray.ops.multimodal import (
    AudioFeatureStage,
    ImageDecodeStage,
    VideoFrameSampleStage,
    decode_stage,
    synth_multimodal_dataset,
)


def test_image_stage_fake_is_deterministic():
    ds = synth_multimodal_dataset(n=12)
    out1 = decode_stage(
        ds, ImageDecodeStage, concurrency=2, batch_size=4, deterministic_fake=True
    ).to_pandas()
    out2 = decode_stage(
        ds, ImageDecodeStage, concurrency=2, batch_size=4, deterministic_fake=True
    ).to_pandas()
    assert len(out1) == 12
    assert set(out1.columns) == {"item_id", "width", "height", "feature"}
    a = np.stack(out1.sort_values("item_id")["feature"].to_numpy())
    b = np.stack(out2.sort_values("item_id")["feature"].to_numpy())
    np.testing.assert_array_equal(a, b)


def test_real_decode_is_explicitly_stubbed():
    ds = synth_multimodal_dataset(n=2)
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        decode_stage(ds, ImageDecodeStage, concurrency=1, batch_size=2).to_pandas()


def test_audio_and_video_stages():
    ds = synth_multimodal_dataset(n=6)
    audio = decode_stage(
        ds, AudioFeatureStage, concurrency=1, batch_size=3, deterministic_fake=True
    ).to_pandas()
    assert len(audio) == 6 and len(audio["mfcc"].iloc[0]) == 13
    video = decode_stage(
        ds,
        VideoFrameSampleStage,
        concurrency=1,
        batch_size=3,
        deterministic_fake=True,
        frames_per_item=4,
    ).to_pandas()
    assert len(video) == 24  # 6 items × 4 frames
    assert set(video.columns) == {"item_id", "frame_idx", "frame_feature"}
