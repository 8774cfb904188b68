"""Pivot/unpivot (`ops/reshape.py`) and Tukey-fence outliers
(`sketch.iqr_outliers`): planted semantics + guards."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data

from sample_c360_text2sql_segmentation_entityresolution_ray.ops.reshape import (
    pivot,
    unpivot,
)
from sample_c360_text2sql_segmentation_entityresolution_ray.ops.sketch import (
    iqr_outliers,
)


def test_pivot_sum_and_count(ray_session):
    df = pd.DataFrame(
        {
            "g": ["a", "a", "b", "b", "b"],
            "s": ["x", "y", "x", "x", "z"],
            "v": [1.0, 2.0, 3.0, 4.0, 5.0],
        }
    )
    ds = ray.data.from_pandas(df).repartition(3)
    wide = (
        pivot(ds, ["g"], "s", "v", values=["x", "y"])
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    want = pd.DataFrame(
        {"g": ["a", "b"], "s_x": [1.0, 7.0], "s_y": [2.0, 0.0]}
    )
    pd.testing.assert_frame_equal(wide[["g", "s_x", "s_y"]], want)
    cnt = (
        pivot(ds, ["g"], "s", "v", values=["x", "z"], agg="count")
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    assert cnt["s_x"].tolist() == [1, 2] and cnt["s_z"].tolist() == [0, 1]


def test_pivot_guards(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({"g": ["a"], "s": ["x"], "v": [1.0]}))
    with pytest.raises(ValueError, match="pivot values"):
        pivot(ds, ["g"], "s", "v", values=list(range(2000)))
    with pytest.raises(ValueError, match="sum.*count|'sum' or 'count'"):
        pivot(ds, ["g"], "s", "v", values=["x"], agg="max")
    with pytest.raises(ValueError, match="collide"):
        pivot(ds, ["g"], "s", "v", values=["x", "x"])


def test_unpivot_roundtrip_and_drop_null(ray_session):
    df = pd.DataFrame(
        {"k": [1, 2], "a": [10.0, np.nan], "b": [30.0, 40.0]}
    )
    long = (
        unpivot(ray.data.from_pandas(df), ["k"], ["a", "b"],
                var_name="col", value_name="v")
        .to_pandas().sort_values(["k", "col"]).reset_index(drop=True)
    )
    assert len(long) == 4
    assert long.loc[(long.k == 2) & (long.col == "a"), "v"].isna().all()
    dropped = (
        unpivot(ray.data.from_pandas(df), ["k"], ["a", "b"],
                drop_null=True)
        .to_pandas()
    )
    assert len(dropped) == 3


def test_iqr_outliers_planted(ray_session):
    # bulk N(0,1)-ish grid plus two planted extremes
    v = np.concatenate([np.linspace(-1, 1, 101), [50.0, -50.0]])
    df = pd.DataFrame({"i": np.arange(len(v)), "x": v})
    out = (
        iqr_outliers(ray.data.from_pandas(df).repartition(4), "x",
                     k=1.5, grid=1_000_000)
        .to_pandas().sort_values("x")
    )
    assert out["x"].tolist() == [-50.0, 50.0]
