"""Similarity-search correctness: brute force vs numpy reference; IVF recall."""

from __future__ import annotations

import numpy as np

import ray.data

from sample_c360_text2sql_segmentation_entityresolution_ray.ops import ann


def _corpus(n=200, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, dim))
    return (
        ray.data.from_items(
            [{"vec_id": i, "embedding": m[i].tolist()} for i in range(n)]
        ),
        m,
    )


def _numpy_topk(m, q, k):
    mu = m / np.linalg.norm(m, axis=1, keepdims=True)
    qu = q / np.linalg.norm(q)
    sims = mu @ qu
    order = np.lexsort((np.arange(len(m)), -sims))
    return list(order[:k])


def test_brute_force_matches_numpy():
    ds, m = _corpus()
    rng = np.random.default_rng(7)
    queries = rng.standard_normal((3, m.shape[1]))
    out = ann.knn_brute_force(ds, queries, k=5).to_pandas()
    assert len(out) == 15
    for q in range(3):
        got = sorted(out[out["query_id"] == q]["vec_id"])
        want = sorted(_numpy_topk(m, queries[q], 5))
        assert got == want, f"query {q}: {got} != {want}"


def test_ivf_recall():
    ds, m = _corpus(n=400)
    rng = np.random.default_rng(9)
    queries = rng.standard_normal((4, m.shape[1]))
    cents = ann.fit_centroids(ds, n_centroids=8)
    bucketed = ann.ivf_bucket_stage(ds, cents).materialize()
    out = ann.knn_ivf(bucketed, queries, cents, k=10, n_probe=4).to_pandas()
    hits = 0
    for q in range(4):
        got = set(out[out["query_id"] == q]["vec_id"])
        want = set(_numpy_topk(m, queries[q], 10))
        hits += len(got & want)
    recall = hits / 40
    assert recall >= 0.5, f"IVF recall {recall}"


def test_bucket_column_is_partitionable():
    ds, _ = _corpus(n=50)
    cents = ann.fit_centroids(ds, n_centroids=4)
    b = ann.ivf_bucket_stage(ds, cents).to_pandas()
    assert b["ivf_bucket"].between(0, 3).all()


def test_ivf_parquet_prunes_at_read(tmp_path):
    """Bucket-partitioned Parquet probe: identical results to the
    in-memory IVF scan, and the partition filter keeps unprobed
    buckets' directories out of the read entirely."""

    ds, m = _corpus(n=120, seed=11)
    cents = ann.fit_centroids(ds, n_centroids=6)
    bucketed = ann.ivf_bucket_stage(ds, cents)
    path = str(tmp_path / "ivf")
    ann.write_ivf_parquet(bucketed, path)

    rng = np.random.default_rng(5)
    queries = rng.standard_normal((2, m.shape[1]))
    got = (
        ann.knn_ivf_parquet(path, queries, cents, k=5, n_probe=2)
        .to_pandas()
        .sort_values(["query_id", "vec_id"])
        .reset_index(drop=True)
    )
    want = (
        ann.knn_ivf(bucketed, queries, cents, k=5, n_probe=2)
        .to_pandas()
        .sort_values(["query_id", "vec_id"])
        .reset_index(drop=True)
    )
    assert got[["query_id", "vec_id"]].equals(want[["query_id", "vec_id"]])

    # pruning is physical: only the probed buckets' hive directories are
    # handed to the reader, so the scan touches fewer rows than the
    # corpus whenever some bucket was not probed
    import os

    qm = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    cm = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    wanted = {int(b) for row in np.argsort(-(qm @ cm.T), axis=1)[:, :2] for b in row}
    if len(wanted) < 6:
        files = [
            os.path.join(path, f"ivf_bucket={b}", f)
            for b in sorted(wanted)
            if os.path.isdir(os.path.join(path, f"ivf_bucket={b}"))
            for f in os.listdir(os.path.join(path, f"ivf_bucket={b}"))
            if f.endswith(".parquet")
        ]
        assert ray.data.read_parquet(files).count() < 120


def test_quantize_embeddings_roundtrip(ray_session):
    """int8 quantization: exact numpy-reference q values, dequant error
    within scale/254 per dimension, zero-vector guard."""
    import numpy as np
    import ray.data

    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.ann import (
        quantize_embeddings,
    )

    rng = np.random.default_rng(3)
    X = rng.standard_normal((40, 16)).astype(np.float32)
    X[7] = 0.0  # zero vector
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": X[i].tolist()} for i in range(len(X))]
    ).repartition(3)
    out = quantize_embeddings(ds).to_pandas().sort_values("vec_id")
    assert len(out) == 40
    for _, row in out.iterrows():
        v = X[int(row["vec_id"])].astype(np.float64)
        s = float(row["scale"])
        q = np.asarray(row["q"], dtype=np.int64)
        exp_s = max(np.abs(v).max(), 0.0) or 1.0
        assert s == exp_s
        y = v / s * 127.0
        np.testing.assert_array_equal(
            q, np.trunc(y + np.copysign(0.5, y)).astype(np.int64)
        )
        assert np.abs(q.astype(np.float64) * s / 127.0 - v).max() <= s / 254 + 1e-12
    # zero vector: scale 1.0, all-zero q
    z = out[out["vec_id"] == 7].iloc[0]
    assert z["scale"] == 1.0 and not np.any(np.asarray(z["q"]))


def test_knn_quantized_matches_brute_force(ray_session):
    """int8 scan + exact rescore equals the exact top-k at the default
    rescore factor on the fixture corpus (the brute-force path stays
    the correctness oracle for the quantized one)."""
    import pandas as pd

    ds, m = _corpus(n=300, dim=24, seed=9)
    rng = np.random.default_rng(10)
    queries = rng.standard_normal((4, 24))
    quant = ann.quantize_embeddings(ds)
    exact = (
        ann.knn_brute_force(ds, queries, k=8)
        .to_pandas()
        .sort_values(["query_id", "vec_id"])
        .reset_index(drop=True)
    )
    fast = (
        ann.knn_quantized(quant, ds, queries, k=8)
        .to_pandas()
        .sort_values(["query_id", "vec_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(exact, fast)
