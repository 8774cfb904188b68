"""Stage-level checkpointing: resumable Parquet outputs with lineage.

The reference's persistence model is full-refresh S3 prefixes
(`lambda/integrated_customer_updater/index.py:16-86`) plus a DynamoDB
single-record status item (`lib/solution-version-store.ts:11-24`).
Here the Ray-native equivalent:

- Each checkpointed stage writes partitioned Parquet under
  ``<dir>/<stage>/data/`` and then a ``manifest.json`` carrying lineage
  (input fingerprint, row count, wall time, engine version).  The
  manifest is written LAST, so a partially-written stage is simply
  re-run — the atomic-visibility analog of the reference's
  delete-then-copy swap.
- On re-run with the same input fingerprint the stage is skipped and
  its output re-read (resume).  A changed fingerprint invalidates the
  checkpoint.
- :class:`JobStatusRegistry` is the DynamoDB-item analog: a JSON file
  status record (``NONE/RUNNING/COMPLETED/FAILED``) with a
  single-writer convention (`check_solution_version_status/index.py:48-66`).
- :func:`gc_checkpoints` keeps the newest ``keep`` runs (the
  keep-2-solutions retention, `create_personalize_solution/index.py:97-106`).
"""

from __future__ import annotations

import json
import os
import shutil
import time

import ray.data

MANIFEST = "manifest.json"


def _manifest_path(stage_dir: str) -> str:
    return os.path.join(stage_dir, MANIFEST)


def load_manifest(stage_dir: str) -> dict | None:
    try:
        with open(_manifest_path(stage_dir)) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        return None


def run_stage(
    name: str,
    checkpoint_dir: str,
    input_fingerprint: str,
    dataset_factory,
    metrics: dict | None = None,
    metrics_fn=None,
) -> "ray.data.Dataset":
    """Compute-or-resume one stage.

    ``dataset_factory``: zero-arg callable returning the stage's output
    Dataset (lazy).  If a manifest exists with the same fingerprint the
    computation is skipped entirely and the Parquet output re-read.
    ``metrics_fn(out_ds) -> dict`` lets callers record stage metrics
    computed from the written output (row distributions, cap counts)."""
    stage_dir = os.path.join(checkpoint_dir, name)
    data_dir = os.path.join(stage_dir, "data")
    m = load_manifest(stage_dir)
    if m is not None and m.get("input_fingerprint") == input_fingerprint:
        return ray.data.read_parquet(data_dir)

    # stale or missing: recompute from scratch (full-refresh semantics)
    shutil.rmtree(stage_dir, ignore_errors=True)
    os.makedirs(data_dir, exist_ok=True)
    t0 = time.time()
    ds = dataset_factory()
    ds.write_parquet(data_dir)
    out = ray.data.read_parquet(data_dir)
    n_rows = out.count()  # metadata-only on parquet
    all_metrics = dict(metrics or {})
    if metrics_fn is not None:
        all_metrics.update(metrics_fn(out))
    files = sorted(
        f for f in os.listdir(data_dir) if f.endswith(".parquet")
    )
    manifest = {
        "stage": name,
        "input_fingerprint": input_fingerprint,
        "row_count": n_rows,
        "wall_s": round(time.time() - t0, 3),
        "written_at": time.time(),
        "partitions": files,  # per-partition lineage: output files
        "metrics": all_metrics,
    }
    tmp = _manifest_path(stage_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, _manifest_path(stage_dir))  # atomic visibility
    return out


class JobStatusRegistry:
    """Single-record JSON status store (DynamoDB ``id="latest"`` analog,
    `lib/solution-version-store.ts:11-24`).  States mirror the
    reference: NONE / RUNNING / COMPLETED / FAILED."""

    STATES = ("NONE", "RUNNING", "COMPLETED", "FAILED")

    def __init__(self, path: str):
        self.path = path

    def read(self) -> dict:
        try:
            with open(self.path) as f:
                return json.load(f)
        except (FileNotFoundError, json.JSONDecodeError):
            return {"status": "NONE"}

    def write(self, status: str, **extra) -> None:
        if status not in self.STATES:
            raise ValueError(f"unknown status {status!r}")
        rec = {"status": status, "updated_at": time.time(), **extra}
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, self.path)

    def try_start(self, **extra) -> bool:
        """Refuse to start while RUNNING — the single-job mutex
        (`lambda/webbackend/agent_processor.py:417-426`)."""
        if self.read().get("status") == "RUNNING":
            return False
        self.write("RUNNING", **extra)
        return True


def gc_checkpoints(root: str, keep: int = 2) -> list[str]:
    """Keep the ``keep`` newest run directories under ``root`` (by
    manifest written_at; manifest-less dirs are oldest).  Returns the
    removed paths."""
    entries = []
    for name in os.listdir(root) if os.path.isdir(root) else []:
        p = os.path.join(root, name)
        if not os.path.isdir(p):
            continue
        m = load_manifest(p)
        entries.append((m.get("written_at", 0) if m else 0, p))
    entries.sort(reverse=True)
    removed = []
    for _, p in entries[keep:]:
        shutil.rmtree(p, ignore_errors=True)
        removed.append(p)
    return removed


__all__ = ["run_stage", "load_manifest", "JobStatusRegistry", "gc_checkpoints"]
