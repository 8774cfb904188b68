"""Checkpoint/resume, job-status registry, retention GC."""

from __future__ import annotations

import os

import pandas as pd

import ray.data

from sample_c360_text2sql_segmentation_entityresolution_ray.state import (
    JobStatusRegistry,
    gc_checkpoints,
    load_manifest,
    run_stage,
)


def test_run_stage_computes_then_resumes(tmp_path):
    calls = {"n": 0}

    def factory():
        calls["n"] += 1
        return ray.data.from_pandas(pd.DataFrame({"x": [1, 2, 3]}))

    ckpt = str(tmp_path)
    out1 = run_stage("s1", ckpt, "fp-a", factory)
    assert out1.count() == 3
    assert calls["n"] == 1
    m = load_manifest(os.path.join(ckpt, "s1"))
    assert m["row_count"] == 3 and m["input_fingerprint"] == "fp-a"

    # same fingerprint → resumed, factory NOT called again
    out2 = run_stage("s1", ckpt, "fp-a", factory)
    assert out2.count() == 3
    assert calls["n"] == 1

    # changed fingerprint → invalidated and recomputed
    out3 = run_stage("s1", ckpt, "fp-b", factory)
    assert out3.count() == 3
    assert calls["n"] == 2


def test_job_status_mutex(tmp_path):
    reg = JobStatusRegistry(str(tmp_path / "status.json"))
    assert reg.read()["status"] == "NONE"
    assert reg.try_start(job="a")
    assert not reg.try_start(job="b")  # refused while RUNNING
    reg.write("COMPLETED")
    assert reg.try_start(job="c")


def test_gc_keeps_newest(tmp_path):
    import json
    import time

    root = str(tmp_path)
    for i, name in enumerate(["old", "mid", "new"]):
        d = tmp_path / name
        d.mkdir()
        (d / "manifest.json").write_text(
            json.dumps({"written_at": time.time() + i})
        )
    removed = gc_checkpoints(root, keep=2)
    assert [os.path.basename(p) for p in removed] == [str(tmp_path / "old").split("/")[-1]]
    assert sorted(os.listdir(root)) == ["mid", "new"]
