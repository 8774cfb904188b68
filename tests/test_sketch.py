"""KMV distinct-count sketch (`ops/sketch.py`): estimator accuracy,
partition-insensitivity, exact small-group path.  Bit-level DuckDB
parity is covered by test_queries_oracle.py[lineitem_distinct_parts_kmv].
"""

import numpy as np
import pandas as pd

import ray.data

from sample_c360_text2sql_segmentation_entityresolution_ray.ops.sketch import (
    kmv_distinct,
    kmv_estimate,
)


def _data(n_big=5000, n_small=40, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "g": ["big"] * (n_big * 2) + ["small"] * 100,
            # big: n_big distinct values (each ~twice); small: n_small
            "v": np.concatenate(
                [
                    rng.integers(0, n_big, n_big * 2) * 7 + 1,
                    rng.integers(0, n_small, 100),
                ]
            ),
        }
    )


def test_kmv_accuracy_and_exact_small_path(ray_session):
    df = _data()
    truth = df.groupby("g")["v"].nunique()
    out = (
        kmv_distinct(ray.data.from_pandas(df).repartition(8), "v", "g", k=256)
        .to_pandas()
        .set_index("g")["est_distinct"]
    )
    # small group (< k values): exact
    assert out["small"] == float(truth["small"])
    # big group: within 4 standard errors (SE = 1/sqrt(k-2) ~ 6.3%)
    rel_err = abs(out["big"] - truth["big"]) / truth["big"]
    assert rel_err < 4 / np.sqrt(254), (out["big"], truth["big"], rel_err)


def test_kmv_partition_insensitive(ray_session):
    df = _data()
    a = (
        kmv_distinct(ray.data.from_pandas(df).repartition(2), "v", "g", k=64)
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    b = (
        kmv_distinct(
            ray.data.from_pandas(df.sample(frac=1, random_state=9)).repartition(16),
            "v", "g", k=64,
        )
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_kmv_estimate_formula():
    # k-1 hashes uniformly at i * space/k → kth smallest = k*space/k...
    # use a synthetic set where the k-th smallest is space/2: est = 2(k-1)
    k = 8
    space = float(1 << 60)
    hashes = np.array(
        [int(space / 2 / (k - i)) for i in range(k)], dtype=np.int64
    )  # ascending, kth = space/2
    est = kmv_estimate(np.sort(hashes), k)
    assert abs(est - (k - 1) * space / (space // 2)) < 1e-6
    # fewer than k → exact count
    assert kmv_estimate(np.array([5, 9], dtype=np.int64), k) == 2.0
