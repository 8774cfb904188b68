"""`relational.grouped_count_distinct` and `analytics.fill_date_gaps`:
planted semantics + guards."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data

from sample_c360_text2sql_segmentation_entityresolution_ray.ops.analytics import (
    fill_date_gaps,
)
from sample_c360_text2sql_segmentation_entityresolution_ray.ops.relational import (
    grouped_count_distinct,
)


def test_grouped_count_distinct_planted(ray_session):
    df = pd.DataFrame(
        {
            "g": ["a"] * 5 + ["b"] * 3,
            "v": [1, 1, 2, 2, 3, 7, 7, 7],
        }
    )
    out = (
        grouped_count_distinct(
            ray.data.from_pandas(df).repartition(4), ["g"], "v", "nd"
        )
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    assert out["g"].tolist() == ["a", "b"]
    assert out["nd"].astype(int).tolist() == [3, 1]


def test_fill_date_gaps_planted(ray_session):
    df = pd.DataFrame(
        {
            "k": ["u1", "u1", "u2"],
            "day": ["2024-01-01", "2024-01-04", "2024-02-10"],
            "n": [2, 5, 7],
        }
    )
    out = (
        fill_date_gaps(ray.data.from_pandas(df), "k", "day", ["n"])
        .to_pandas().sort_values(["k", "day"]).reset_index(drop=True)
    )
    u1 = out[out.k == "u1"]
    assert u1["day"].tolist() == [
        "2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"
    ]
    assert u1["n"].astype(int).tolist() == [2, 0, 0, 5]
    u2 = out[out.k == "u2"]
    assert u2["day"].tolist() == ["2024-02-10"]
    assert u2["n"].astype(int).tolist() == [7]


def test_fill_date_gaps_duplicate_day_guard(ray_session):
    df = pd.DataFrame(
        {"k": ["u1", "u1"], "day": ["2024-01-01", "2024-01-01"], "n": [1, 2]}
    )
    with pytest.raises(Exception, match="duplicate days"):
        fill_date_gaps(
            ray.data.from_pandas(df), "k", "day", ["n"]
        ).materialize()


def test_grouped_rollup_planted(ray_session):
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.relational import (
        grouped_rollup,
    )

    df = pd.DataFrame(
        {
            "a": ["x", "x", "y"],
            "b": ["p", "q", "p"],
            "v": [1.0, 2.0, 4.0],
        }
    )
    out = (
        grouped_rollup(
            ray.data.from_pandas(df).repartition(3),
            ["a", "b"],
            [("sum", "v", "s"), ("count_star", None, "n")],
        )
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "a": ["(all)", "x", "x", "x", "y", "y"],
            "b": ["(all)", "(all)", "p", "q", "(all)", "p"],
            "s": [7.0, 3.0, 1.0, 2.0, 4.0, 4.0],
            "n": [3, 2, 1, 1, 1, 1],
        }
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_grouped_rollup_sentinel_guard(ray_session):
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.relational import (
        grouped_rollup,
    )

    df = pd.DataFrame({"a": ["(all)"], "v": [1.0]})
    with pytest.raises(Exception, match="sentinel"):
        grouped_rollup(
            ray.data.from_pandas(df), ["a"], [("sum", "v", "s")]
        ).materialize()


def test_dense_ids_contiguous_and_stable(ray_session):
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.relational import (
        dense_ids,
    )

    df = pd.DataFrame({"v": [5, 3, 5, 9, 3, 3]})
    a = (
        dense_ids(ray.data.from_pandas(df).repartition(3), "v")
        .to_pandas().sort_values("v").reset_index(drop=True)
    )
    # contiguous 0..2, one id per distinct value
    assert sorted(a["dense_id"].tolist()) == [0, 1, 2]
    assert a["v"].tolist() == [3, 5, 9]
    # content-defined: same mapping from a differently-partitioned run
    b = (
        dense_ids(ray.data.from_pandas(df).repartition(1), "v")
        .to_pandas().sort_values("v").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_grouped_cube_planted(ray_session):
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.relational import (
        grouped_cube,
    )

    df = pd.DataFrame(
        {
            "a": ["x", "x", "y"],
            "b": ["p", "q", "p"],
            "v": [1.0, 2.0, 4.0],
        }
    )
    out = (
        grouped_cube(
            ray.data.from_pandas(df).repartition(3),
            ["a", "b"],
            [("sum", "v", "s"), ("count_star", None, "n")],
        )
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    # rollup levels PLUS the b-margin rows ('(all)', p/q)
    want = pd.DataFrame(
        {
            "a": ["(all)", "(all)", "(all)", "x", "x", "x", "y", "y"],
            "b": ["(all)", "p", "q", "(all)", "p", "q", "(all)", "p"],
            "s": [7.0, 5.0, 2.0, 3.0, 1.0, 2.0, 4.0, 4.0],
            "n": [3, 2, 1, 2, 1, 1, 1, 1],
        }
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_table_fingerprint_order_invariant_and_sensitive(ray_session):
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.profile import (
        table_fingerprint,
    )

    df = pd.DataFrame({"k": np.arange(100), "s": ["v%d" % i for i in range(100)]})
    a = table_fingerprint(
        ray.data.from_pandas(df).repartition(5), ["k", "s"]
    ).to_pandas()
    # permuted + repartitioned input → identical fingerprint
    b = table_fingerprint(
        ray.data.from_pandas(df.sample(frac=1.0, random_state=7)).repartition(2),
        ["k", "s"],
    ).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    # one changed cell flips both checksums
    df2 = df.copy(); df2.loc[17, "s"] = "vX"
    c = table_fingerprint(ray.data.from_pandas(df2), ["k", "s"]).to_pandas()
    assert c["n_rows"][0] == 100
    assert c["fp_xor"][0] != a["fp_xor"][0]
    assert c["fp_sum"][0] != a["fp_sum"][0]
    # duplicate-pair insertion: XOR cancels, sum+count do not
    df3 = pd.concat([df, df.iloc[[4]], df.iloc[[4]]], ignore_index=True)
    d = table_fingerprint(ray.data.from_pandas(df3), ["k", "s"]).to_pandas()
    assert d["fp_xor"][0] == a["fp_xor"][0]
    assert d["fp_sum"][0] != a["fp_sum"][0] and d["n_rows"][0] == 102
