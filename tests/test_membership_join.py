"""Semi/anti join broadcast-vs-shuffle switch: both paths must agree
(the shuffle path activates above SEMI_BROADCAST_LIMIT distinct keys;
here it is forced with a tiny limit)."""

from __future__ import annotations

import pandas as pd

import ray.data

from sample_c360_text2sql_segmentation_entityresolution_ray.ops.relational import (
    anti_join,
    semi_join,
)


def _orders(sf_dir):
    return ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )


def _buyers(sf_dir):
    return ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    ).filter(expr="c_acctbal > 5000")


def _keyset(ds, col):
    return sorted(ds.to_pandas()[col].tolist())


def test_semi_shuffle_path_matches_broadcast(sf_dir):
    left, right = _orders(sf_dir), _buyers(sf_dir)
    bc = semi_join(left, right, on="o_custkey", right_on="c_custkey")
    sh = semi_join(
        left, right, on="o_custkey", right_on="c_custkey", broadcast_limit=3
    )
    a, b = _keyset(bc, "o_orderkey"), _keyset(sh, "o_orderkey")
    assert a and a == b
    # shuffle path must not leak marker/right-key columns
    assert sorted(sh.schema().names) == ["o_custkey", "o_orderkey"]


def test_anti_shuffle_path_matches_broadcast(sf_dir):
    left, right = _orders(sf_dir), _buyers(sf_dir)
    bc = anti_join(left, right, on="o_custkey", right_on="c_custkey")
    sh = anti_join(
        left, right, on="o_custkey", right_on="c_custkey", broadcast_limit=3
    )
    a, b = _keyset(bc, "o_orderkey"), _keyset(sh, "o_orderkey")
    assert a and a == b
    assert sorted(sh.schema().names) == ["o_custkey", "o_orderkey"]


def test_anti_shuffle_duplicate_right_keys():
    # duplicate keys on the right must not duplicate left rows (dedup
    # before the exchange) and same-named key columns must not collide
    left = ray.data.from_pandas(pd.DataFrame({"k": [1, 2, 3, 4], "v": list("abcd")}))
    right = ray.data.from_pandas(pd.DataFrame({"k": [2, 2, 2, 4, 4]}))
    sh = semi_join(left, right, on="k", broadcast_limit=1).to_pandas()
    assert sorted(sh["v"].tolist()) == ["b", "d"]
    an = anti_join(left, right, on="k", broadcast_limit=1).to_pandas()
    assert sorted(an["v"].tolist()) == ["a", "c"]


def test_standardize_groups_and_constant_group():
    import numpy as np
    import ray.data

    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.relational import (
        standardize,
    )

    rows = (
        [{"g": "a", "v": float(x)} for x in (1, 2, 3, 4)]
        + [{"g": "b", "v": 7.0}] * 3  # constant group: std 0 → z 0
    )
    out = (
        standardize(ray.data.from_items(rows), value_col="v", group_cols=["g"])
        .to_pandas()
        .sort_values(["g", "v"])
        .reset_index(drop=True)
    )
    a = out[out["g"] == "a"]
    mean, std = 2.5, np.sqrt(np.mean((np.arange(1, 5) - 2.5) ** 2))
    np.testing.assert_allclose(
        a["zscore"], (a["v"] - mean) / std, rtol=1e-12
    )
    assert (out.loc[out["g"] == "b", "zscore"] == 0.0).all()


def test_frequency_encode_counts_and_rates():
    import numpy as np
    import ray.data

    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.relational import (
        frequency_encode,
    )

    rows = [{"id": i, "cat": c} for i, c in enumerate("aaabbc")]
    out = (
        frequency_encode(ray.data.from_items(rows), "cat")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert list(out["cat_count"]) == [3, 3, 3, 2, 2, 1]
    np.testing.assert_allclose(
        out["cat_rate"], np.array([3, 3, 3, 2, 2, 1]) / 6.0
    )
