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


def test_er_checkpoint_resume(tmp_path, sf_dir):
    from sample_c360_text2sql_segmentation_entityresolution_ray.pipelines.entity_resolution import (
        resolve_entities,
    )
    from sample_c360_text2sql_segmentation_entityresolution_ray.sources.pages import (
        pages_dataset,
    )

    ckpt = str(tmp_path / "er")
    fp = f"{sf_dir}|default-cfg"
    a1, e1 = resolve_entities(
        lambda: pages_dataset(sf_dir), checkpoint_dir=ckpt, input_fingerprint=fp
    )
    n_edges = e1.count()
    m = load_manifest(os.path.join(ckpt, "matched_edges"))
    assert m["row_count"] == n_edges
    assert m["metrics"]["n_edges"] == n_edges
    assert m["metrics"]["min_edge_score"] >= 0.4
    assert len(m["partitions"]) > 0  # per-partition lineage recorded

    # resume: same fingerprint → edges come from the checkpoint
    a2, e2 = resolve_entities(
        lambda: pages_dataset(sf_dir), checkpoint_dir=ckpt, input_fingerprint=fp
    )
    assert e2.count() == n_edges
    m2 = load_manifest(os.path.join(ckpt, "matched_edges"))
    assert m2["written_at"] == m["written_at"]  # NOT recomputed
    assert a2.count() == a1.count()


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
