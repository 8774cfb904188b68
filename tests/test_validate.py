"""Declarative validation (`ops/validate.py`): planted violations per
rule kind, NULL handling, and the duplicate-label guard."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data

from sample_c360_text2sql_segmentation_entityresolution_ray.ops.validate import (
    validate_table,
)


def _counts(ds) -> dict:
    df = ds.to_pandas()
    return dict(zip(df["rule"], df["n_violations"].astype(int)))


def test_validate_planted_violations(ray_session):
    df = pd.DataFrame(
        {
            "k": [1, 2, 2, 3, 4],          # one dup pair -> unique = 1
            "v": [5.0, np.nan, 50.0, -1.0, 200.0],  # null=1; range[0,100]=2
            "s": ["ab", "zz", "ab", None, "a9"],     # set{ab,a9}: zz -> 1
            "fk": [10, 10, 99, None, 20],  # ref {10,20}: 99 + NULL -> 2
        }
    )
    ref = ray.data.from_pandas(pd.DataFrame({"rk": [10, 20, 30]}))
    out = _counts(
        validate_table(
            ray.data.from_pandas(df).repartition(3),
            [
                ("not_null", "v"),
                ("unique", "k"),
                ("range", "v", 0.0, 100.0),
                ("in_set", "s", ("ab", "a9")),
                ("regex", "s", "^a"),
                ("ref", "fk", ref, "rk"),
            ],
        )
    )
    assert out == {
        "not_null(v)": 1,
        "unique(k)": 1,
        "range(v)": 2,
        "in_set(s)": 1,
        "regex(s)": 1,  # 'zz' (None is not counted by regex)
        "ref(fk)": 2,
    }


def test_validate_all_clean_emits_zero_rows(ray_session):
    df = pd.DataFrame({"k": [1, 2, 3]})
    out = _counts(
        validate_table(
            ray.data.from_pandas(df),
            [("not_null", "k"), ("unique", "k")],
        )
    )
    assert out == {"not_null(k)": 0, "unique(k)": 0}


def test_validate_guards(ray_session):
    ds = ray.data.from_pandas(pd.DataFrame({"k": [1]}))
    with pytest.raises(ValueError, match="duplicate rule labels"):
        validate_table(ds, [("not_null", "k"), ("not_null", "k")])
    with pytest.raises(ValueError, match="unknown rule kind"):
        validate_table(ds, [("bogus", "k")])
