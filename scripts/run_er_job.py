"""`ray job submit`-able ER driver: config → pipeline → resumable output.

The production entrypoint the north rule asks for: reads a pages table
(either a real Parquet directory with the north-rule schema, or the
synthesized fixture via --sf-dir), runs the flagship ER pipeline with
checkpointing, writes the integrated-assignment table with the
atomic-swap sink, and prints one JSON metrics line.

Usage (local or `ray job submit -- python scripts/run_er_job.py ...`):

    python scripts/run_er_job.py --sf-dir /root/testdata/sf0.001 \
        --out /tmp/er_out --checkpoint-dir /tmp/er_ck [--num-cpus 32]
    python scripts/run_er_job.py --pages-parquet /data/pages \
        --out /data/er_out --checkpoint-dir /data/er_ck

Re-running with the same inputs resumes from the matched-edges
checkpoint (manifest fingerprint match) instead of recomputing.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--sf-dir", help="testdata dir (synthesized pages fixture)")
    src.add_argument("--pages-parquet", help="real pages Parquet path (north-rule schema)")
    ap.add_argument("--out", required=True, help="output dir for the assignment table")
    ap.add_argument("--checkpoint-dir", required=True)
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="only for standalone runs; under `ray job submit` the cluster is attached")
    ap.add_argument("--replicate", type=int, default=1)
    ap.add_argument("--keep-runs", type=int, default=2,
                    help="run-history retention (the reference keeps the 2 "
                         "newest Personalize solutions, "
                         "create_personalize_solution/index.py:97-106)")
    ap.add_argument("--iceberg", action="store_true",
                    help="wrap the output in an Iceberg v2 metadata log "
                         "(ops/iceberg.freeze_iceberg_table) so any "
                         "Iceberg-aware engine can read the assignment "
                         "table — the csvtool CTAS ICEBERG analog")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kw = {"include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
            kw["address"] = "local"
        ray.init(**kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import ray.data

    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.io import (
        overwrite_dir,
    )
    from sample_c360_text2sql_segmentation_entityresolution_ray.pipelines.entity_resolution import (
        resolve_entities,
    )
    from sample_c360_text2sql_segmentation_entityresolution_ray.sources.pages import (
        pages_dataset,
    )
    from sample_c360_text2sql_segmentation_entityresolution_ray.state import (
        JobStatusRegistry,
        load_manifest,
    )

    if args.sf_dir:
        from sample_c360_text2sql_segmentation_entityresolution_ray.pipelines.entity_resolution import (
            build_idf_ref_local)
        from sample_c360_text2sql_segmentation_entityresolution_ray.sources.pages import (
            pages_sample_table)

        factory = lambda: pages_dataset(args.sf_dir, args.replicate)  # noqa: E731
        idf_ref = build_idf_ref_local(pages_sample_table(args.sf_dir, 0.05))
        fingerprint = f"fixture|{args.sf_dir}|r{args.replicate}"
    else:
        factory = lambda: ray.data.read_parquet(args.pages_parquet)  # noqa: E731
        idf_ref = None
        fingerprint = f"parquet|{args.pages_parquet}"

    status = JobStatusRegistry(os.path.join(args.checkpoint_dir, "job_status.json"))
    if not status.try_start(fingerprint=fingerprint):
        print(json.dumps({"error": "another run is RUNNING", "status": status.read()}))
        sys.exit(1)
    try:
        t0 = time.time()
        assignment, edges = resolve_entities(
            factory,
            checkpoint_dir=args.checkpoint_dir,
            input_fingerprint=fingerprint,
            idf_ref=idf_ref,
        )
        n_rows = overwrite_dir(assignment, args.out)
        wall = time.time() - t0
        manifest = load_manifest(os.path.join(args.checkpoint_dir, "matched_edges"))
        result = {
            "rows": n_rows,
            "edges": edges.count(),
            "wall_s": round(wall, 2),
            "docs_per_sec": round(n_rows / wall, 2),
            "out": args.out,
            "edge_metrics": (manifest or {}).get("metrics", {}),
        }
        if args.iceberg:
            from sample_c360_text2sql_segmentation_entityresolution_ray.ops.iceberg import (
                freeze_iceberg_table,
            )

            ice = freeze_iceberg_table(args.out, data_dir=args.out)
            result["iceberg"] = {
                "metadata": ice["metadata"],
                "snapshot_id": ice["snapshot_id"],
                "data_files": ice["data_files"],
            }
        status.write("COMPLETED", **result)
        # run-history record + keep-N retention (keep-2-solutions analog)
        from sample_c360_text2sql_segmentation_entityresolution_ray.state import (
            gc_checkpoints,
        )

        runs_dir = os.path.join(args.checkpoint_dir, "runs")
        run_dir = os.path.join(runs_dir, f"run-{int(time.time() * 1000)}")
        os.makedirs(run_dir, exist_ok=True)
        with open(os.path.join(run_dir, "manifest.json"), "w") as f:
            json.dump({"written_at": time.time(), **result}, f, indent=1)
        result["gc_removed"] = gc_checkpoints(runs_dir, keep=args.keep_runs)
        print(json.dumps(result))
    except Exception as e:
        status.write("FAILED", error=str(e)[:500])
        raise
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
