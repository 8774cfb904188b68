"""2M-row scale soak: one order of magnitude past the r4 200k-page runs.

Evidence that the r4/r5 sizing formulas (`dedup._slim_block_target`,
auto LSH params, `_read_blocks`, nested-join partitioning) hold at
~2M rows inside the 128 GiB sandbox.  Two jobs, fresh Ray session each:

1. **ER flagship** at ``--replicate`` (default 240 → 2,000,880 pages
   at sf0.1): the exact `bench.py --headline-only` plan.
2. **Near-dup family** over a 2M-doc corpus: the sf0.1 documents
   table replicated with per-replica token SHUFFLING (seeded, cheap,
   destroys shingle continuity) so replicas are mutually non-dup —
   the soak measures machinery cost at scale, not recall (recall is
   the strict oracle gate's job at sf0.01/sf0.1).  MinHash + SimHash
   pair passes, transport="auto".

Reports wall, rows, peak machine memory delta (sampled /proc/meminfo)
and Ray object-store spill (spill-file bytes under the session dir —
the gRPC memory_summary API is unavailable in this container) as one
JSON line per job; paste into BASELINE.md.

Usage: python scripts/soak_2m.py [--replicate 240] [--cpus 32]
       [--jobs er,minhash,simhash]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ.setdefault(
    "RAY_DATA_LOGGING_CONFIG", os.path.join(_REPO, "ray_data_logging.yaml")
)


class MemSampler:
    """Peak machine memory use via /proc/meminfo (total − available):
    captures driver + raylet + workers + object store in one number."""

    def __init__(self, period: float = 1.0):
        self.period = period
        self.peak_used = 0
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    @staticmethod
    def _meminfo() -> dict:
        out = {}
        with open("/proc/meminfo") as f:
            for line in f:
                k, v = line.split(":", 1)
                out[k] = int(v.strip().split()[0]) * 1024
        return out

    def _run(self):
        while not self._stop.is_set():
            mi = self._meminfo()
            used = mi["MemTotal"] - mi["MemAvailable"]
            self.peak_used = max(self.peak_used, used)
            self._stop.wait(self.period)

    def __enter__(self):
        self.base = self._meminfo()
        self.base_used = self.base["MemTotal"] - self.base["MemAvailable"]
        self._thread.start()
        return self

    def __exit__(self, *a):
        self._stop.set()
        self._thread.join()

    @property
    def peak_delta_gib(self) -> float:
        return round(max(0, self.peak_used - self.base_used) / 2**30, 2)


def _spilled_gib() -> float:
    """Cumulative object-store spill: sum of spill files under the
    live session's spill directory (gRPC-based memory_summary is
    unavailable in this container)."""
    try:
        import glob

        import ray

        sess = ray._private.worker._global_node.get_session_dir_path()
        total = sum(
            os.path.getsize(p)
            for p in glob.glob(
                os.path.join(sess, "**", "*multi*"), recursive=True
            )
        )
        return round(total / 2**30, 2)
    except Exception:  # noqa: BLE001 — diagnostics only
        return -1.0


def _consume(ds) -> int:
    n = 0
    for b in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        n += b.num_rows
    return n


def _shuffled_docs(sf_dir: str, replicate: int):
    """R copies of the documents table, doc_ids disjoint, token order
    shuffled per (replica, doc) with a seeded RNG — shingle sets
    diverge so replicas are mutually non-near-dup."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    base = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )

    # generator explode, not an R-way union (Ray's union chains into an
    # O(R)-deep plan/stats tree — RecursionError at R=240; see
    # sources/pages._docs_dataset)
    def _perturb(t: pa.Table):
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        for r in range(replicate):
            out = []
            for i, txt in zip(ids, texts):
                toks = txt.split()
                rng = np.random.default_rng((r << 32) ^ i)
                rng.shuffle(toks)
                out.append(" ".join(toks))
            yield pa.table(
                {
                    "doc_id": pa.array(
                        [i + r * 100_000_000 for i in ids], pa.int64()
                    ),
                    "text": pa.array(out, pa.string()),
                }
            )

    return base.map_batches(_perturb, batch_format="pyarrow")


def run_er(sf_dir: str, cpus: int, replicate: int) -> dict:
    import ray

    ray.init(
        address="local", num_cpus=cpus, include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from sample_c360_text2sql_segmentation_entityresolution_ray.pipelines.entity_resolution import (
        build_idf_ref_local,
        resolve_entities,
    )
    from sample_c360_text2sql_segmentation_entityresolution_ray.sources.pages import (
        pages_dataset,
        pages_sample_table,
        pages_slim_dataset,
    )
    from sample_c360_text2sql_segmentation_entityresolution_ray.stages.config import (
        DEFAULT_CONFIG,
    )

    with MemSampler() as mem:
        t0 = time.time()
        assignment, _ = resolve_entities(
            lambda: pages_dataset(sf_dir, replicate),
            idf_ref=build_idf_ref_local(
                pages_sample_table(sf_dir, DEFAULT_CONFIG.idf_sample_p)
            ),
            slim_factory=lambda: pages_slim_dataset(sf_dir, replicate),
        )
        n = _consume(assignment)
        sec = time.time() - t0
    out = {
        "job": "er_flagship",
        "replicate": replicate,
        "rows": n,
        "sec": round(sec, 1),
        "docs_per_sec": round(n / sec, 1),
        "peak_mem_gib": mem.peak_delta_gib,
        "spilled_gib": _spilled_gib(),
        "cpus": cpus,
    }
    ray.shutdown()
    return out


def run_neardup(sf_dir: str, cpus: int, replicate: int, kind: str) -> dict:
    import ray

    ray.init(
        address="local", num_cpus=cpus, include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops import dedup

    docs = _shuffled_docs(sf_dir, replicate)
    with MemSampler() as mem:
        t0 = time.time()
        if kind == "minhash":
            pairs = dedup.minhash_dup_pairs(docs, threshold=0.6)
        else:
            pairs = dedup.simhash_dup_pairs(docs, max_hamming=3)
        n_pairs = _consume(pairs)
        sec = time.time() - t0
    n_docs = replicate * ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    ).count()
    out = {
        "job": f"{kind}_neardup",
        "replicate": replicate,
        "docs": n_docs,
        "pairs": n_pairs,
        "sec": round(sec, 1),
        "docs_per_sec": round(n_docs / sec, 1),
        "peak_mem_gib": mem.peak_delta_gib,
        "spilled_gib": _spilled_gib(),
        "cpus": cpus,
    }
    ray.shutdown()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicate", type=int, default=240)
    ap.add_argument(
        "--cpus", type=int,
        default=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
    )
    ap.add_argument("--sf-dir", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.1"
    ))
    ap.add_argument("--jobs", default="er,minhash,simhash")
    args = ap.parse_args()
    for job in args.jobs.split(","):
        if job == "er":
            r = run_er(args.sf_dir, args.cpus, args.replicate)
        else:
            r = run_neardup(args.sf_dir, args.cpus, args.replicate, job)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
