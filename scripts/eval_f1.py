"""Dev harness: run the ER pipeline on a testdata sf dir, report pairwise F1.

Usage: python scripts/eval_f1.py [sf_dir] [num_cpus]
"""
import collections
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pairwise_f1(adf, rel):
    """adf: (RecordId, MatchID) DataFrame; rel: (url_b, url_a) truth pairs."""
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in zip(rel.url_a, rel.url_b):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        union(a, b)
    cl = collections.defaultdict(list)
    for n in parent:
        cl[find(n)].append(n)
    truth = set()
    for mem in cl.values():
        for p in itertools.combinations(sorted(mem), 2):
            truth.add(p)

    pred_clusters = collections.defaultdict(list)
    for rid, mid in zip(adf.RecordId, adf.MatchID):
        pred_clusters[mid].append(rid)
    pred = set()
    for mem in pred_clusters.values():
        if len(mem) > 1:
            for p in itertools.combinations(sorted(mem), 2):
                pred.add(p)
    tp = len(pred & truth)
    fp = len(pred - truth)
    fn = len(truth - pred)
    prec = tp / max(1, tp + fp)
    rec = tp / max(1, tp + fn)
    f1 = 2 * prec * rec / max(1e-9, prec + rec)
    return {
        "truth": len(truth), "pred": len(pred), "tp": tp, "fp": fp, "fn": fn,
        "precision": prec, "recall": rec, "f1": f1,
        "fp_samples": sorted(pred - truth)[:5], "fn_samples": sorted(truth - pred)[:5],
    }


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    ncpu = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from sample_c360_text2sql_segmentation_entityresolution_ray.sources.pages import (
        pages_dataset, relations_dataset)
    from sample_c360_text2sql_segmentation_entityresolution_ray.pipelines.entity_resolution import (
        resolve_entities)

    t0 = time.time()
    from sample_c360_text2sql_segmentation_entityresolution_ray.pipelines.entity_resolution import (
        build_idf_ref_local)
    from sample_c360_text2sql_segmentation_entityresolution_ray.sources.pages import (
        pages_sample_table)

    from sample_c360_text2sql_segmentation_entityresolution_ray.sources.pages import (
        pages_slim_dataset)

    assignment, edges = resolve_entities(
        lambda: pages_dataset(sf),
        idf_ref=build_idf_ref_local(pages_sample_table(sf, 0.05)),
        slim_factory=lambda: pages_slim_dataset(sf),
    )
    adf = assignment.to_pandas()
    elapsed = time.time() - t0
    rel = relations_dataset(sf).to_pandas()
    m = pairwise_f1(adf, rel)
    n_pages = len(adf)
    print(f"pages={n_pages} edges={edges.count()} elapsed={elapsed:.1f}s "
          f"docs/sec={n_pages/elapsed:.0f}")
    print({k: (round(v, 4) if isinstance(v, float) else v)
           for k, v in m.items() if not k.endswith("_samples")})
    if m["fp"]:
        print("FP:", m["fp_samples"])
    if m["fn"]:
        print("FN:", m["fn_samples"])
    ray.shutdown()


if __name__ == "__main__":
    main()
