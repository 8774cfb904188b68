"""Distributed k-means (ops/cluster.py) vs the pure-numpy reference."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

import ray.data

from sample_c360_text2sql_segmentation_entityresolution_ray.ops.cluster import (
    kmeans_assign,
    kmeans_fit,
    kmeans_reference,
)


def _load(sf_dir):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    X = np.asarray(t["embedding"].combine_chunks().flatten(), dtype=np.float64).reshape(
        len(ids), -1
    )
    return t, ids, X


def test_distributed_fit_matches_numpy_reference(sf_dir):
    t, ids, X = _load(sf_dir)
    ref_cents, ref_labels = kmeans_reference(ids, X, k=10, iters=10)

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    # driver_limit=0 forces the distributed combiner path (the default
    # measured-size switch would collect inputs this small)
    cents = kmeans_fit(ds, k=10, iters=10, driver_limit=0)
    # partial-sum order differs from numpy's; equality is to fp noise
    assert np.allclose(cents, ref_cents, atol=1e-8)

    # the default driver fast path is the reference, bit-for-bit
    assert (kmeans_fit(ds, k=10, iters=10) == ref_cents).all()

    out = kmeans_assign(ds, cents).to_pandas().sort_values("vec_id")
    got = out["cluster"].to_numpy()
    assert (got == ref_labels[np.argsort(ids, kind="stable")]).all()
    # every planted cluster is populated (fixture has 10 label groups)
    assert len(np.unique(got)) == 10


def test_fit_is_deterministic_across_runs(sf_dir):
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    a = kmeans_fit(ds, k=4, iters=3, driver_limit=0)
    b = kmeans_fit(ds, k=4, iters=3, driver_limit=0)
    assert np.allclose(a, b, atol=1e-12)


def test_reference_empty_cluster_keeps_centroid():
    # two far points, k=2 — but both seeds land on data; construct a
    # case where one centroid empties: three coincident points seed two
    # clusters, the loser keeps its (duplicate) centroid without NaNs
    ids = np.array([1, 2, 3])
    X = np.array([[0.0, 0.0], [0.0, 0.0], [0.0, 0.0]])
    cents, labels = kmeans_reference(ids, X, k=2, iters=2)
    assert not np.isnan(cents).any()
    assert (labels == 0).all()  # ties break to the lowest cluster id


def test_pca_distributed_matches_reference(sf_dir):
    import numpy as np
    import ray.data

    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.cluster import (
        pca_fit,
        pca_reference,
        pca_transform,
    )

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    rows = ds.take_all()
    X = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    mu_r, W_r = pca_reference(X, 4)
    mu_d, W_d = pca_fit(ds, 4, driver_limit=0)  # force the moment shuffle
    np.testing.assert_allclose(mu_d, mu_r, atol=1e-9)
    np.testing.assert_allclose(W_d, W_r, atol=1e-7)

    # projections: component variances are non-increasing and dominate
    # the residual dimensions' average
    proj = pca_transform(ds, mu_d, W_d).to_pandas()
    v = [proj[f"pc{i}"].var(ddof=0) for i in range(4)]
    assert v[0] >= v[1] >= v[2] >= v[3] > 0
    total_var = ((X - X.mean(0)) ** 2).sum(1).mean()
    assert v[0] >= total_var / X.shape[1]


def test_partition_agreement_identical_and_independent():
    import pandas as pd
    import ray.data

    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.cluster import (
        partition_agreement,
    )

    # identical partitions (different label names): rand = ari = 1
    df = pd.DataFrame(
        {"a": ["x", "x", "y", "y", "z"], "b": [1, 1, 2, 2, 3]}
    )
    out = partition_agreement(ray.data.from_pandas(df), "a", "b")
    assert out["rand"].iloc[0] == 1.0 and out["ari"].iloc[0] == 1.0
    assert out["pairs_both"].iloc[0] == 2 and out["pairs_total"].iloc[0] == 10

    # sklearn-documented example: ARI of [0,0,1,1] vs [0,0,1,2] = 0.571429
    df2 = pd.DataFrame({"a": [0, 0, 1, 1], "b": [0, 0, 1, 2]})
    out2 = partition_agreement(ray.data.from_pandas(df2), "a", "b")
    assert abs(out2["ari"].iloc[0] - 0.571429) < 1e-6

    # one row: no pairs, defined as perfect agreement
    df3 = pd.DataFrame({"a": ["q"], "b": ["r"]})
    out3 = partition_agreement(ray.data.from_pandas(df3), "a", "b")
    assert out3["rand"].iloc[0] == 1.0 and out3["ari"].iloc[0] == 1.0
