"""End-to-end resumption hardening for the `ray job submit` driver:
fresh run → resumed run (checkpoint hit) → third run (keep-2 GC), each
in its OWN subprocess with its own Ray session, exactly as `ray job
submit` would execute it."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "run_er_job.py")


def _run(out_dir, ck_dir, sf_dir):
    env = {**os.environ, "RAY_ADDRESS": "local"}
    p = subprocess.run(
        [
            sys.executable, SCRIPT, "--sf-dir", sf_dir, "--out", out_dir,
            "--checkpoint-dir", ck_dir, "--num-cpus", "4",
        ],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        timeout=300,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    return json.loads(p.stdout.strip().splitlines()[-1])


@pytest.mark.slow
def test_run_er_job_resume_and_gc(tmp_path, sf_dir):
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    r1 = _run(out, ck, sf_dir)
    assert r1["rows"] == 835 and r1["edges"] > 0
    # output table written atomically with full schema
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert files
    t = pq.read_table(out)
    assert set(t.schema.names) == {
        "source", "ConfidenceLevel", "RecordId", "MatchID", "lang"
    }
    # status registry landed COMPLETED
    status = json.load(open(os.path.join(ck, "job_status.json")))
    assert status["status"] == "COMPLETED"
    # checkpoint manifest carries lineage + metrics
    man = json.load(open(os.path.join(ck, "matched_edges", "manifest.json")))
    assert man["row_count"] == r1["edges"]
    assert man["metrics"]["n_edges"] == r1["edges"]
    ck_written = man["written_at"]

    # second run: resumes from the checkpoint (manifest untouched),
    # identical output
    r2 = _run(out, ck, sf_dir)
    assert r2["rows"] == r1["rows"] and r2["edges"] == r1["edges"]
    man2 = json.load(open(os.path.join(ck, "matched_edges", "manifest.json")))
    assert man2["written_at"] == ck_written, "checkpoint was recomputed, not resumed"

    # third run: run-history retention keeps only the newest 2 records
    r3 = _run(out, ck, sf_dir)
    runs = sorted(os.listdir(os.path.join(ck, "runs")))
    assert len(runs) == 2
    assert r3["gc_removed"], "third run must GC the oldest run record"
