"""SCD-2 history maintenance (`ops/scd.py`): planted no-op / change /
new-key semantics, second-fold layering, and the CDC-size + unique-key
guards."""

from __future__ import annotations

import pandas as pd
import pytest

import ray
import ray.data

from sample_c360_text2sql_segmentation_entityresolution_ray.ops.scd import scd2_apply


def _dim(rows):
    df = pd.DataFrame(rows, columns=["k", "seg", "valid_from", "valid_to"])
    df["valid_from"] = pd.to_datetime(df["valid_from"]).astype("datetime64[us]")
    df["valid_to"] = pd.to_datetime(df["valid_to"]).astype("datetime64[us]")
    return df


def _delta(rows):
    df = pd.DataFrame(rows, columns=["k", "seg", "eff"])
    df["eff"] = pd.to_datetime(df["eff"]).astype("datetime64[us]")
    return df


T0, T1, T2 = "1995-01-01", "1998-06-01", "2000-01-01"


def test_scd2_noop_change_new(ray_session):
    cur = _dim([(1, "A", T0, None), (2, "B", T0, None), (3, "C", T0, None)])
    # key 1: unchanged (no-op); key 2: changed; key 9: unseen (new)
    d = _delta([(1, "A", T1), (2, "X", T1), (9, "N", T1)])
    out = (
        scd2_apply(ray.data.from_pandas(cur), ray.data.from_pandas(d),
                   key="k", attrs=["seg"], eff_col="eff")
        .to_pandas()
        .sort_values(["k", "valid_from"])
        .reset_index(drop=True)
    )
    want = _dim([
        (1, "A", T0, None),          # no-op: still open, unversioned
        (2, "B", T0, T1),            # closed at eff
        (2, "X", T1, None),          # new open version
        (3, "C", T0, None),          # untouched key
        (9, "N", T1, None),          # brand-new key
    ])
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_scd2_second_fold_layers_history(ray_session):
    """Folding a second delta on top of the first closes only the OPEN
    version — closed history rows never change."""
    cur = ray.data.from_pandas(_dim([(2, "B", T0, None)]))
    once = scd2_apply(
        cur, ray.data.from_pandas(_delta([(2, "X", T1)])),
        key="k", attrs=["seg"], eff_col="eff",
    ).materialize()
    twice = (
        scd2_apply(
            once, ray.data.from_pandas(_delta([(2, "Y", T2)])),
            key="k", attrs=["seg"], eff_col="eff",
        )
        .to_pandas()
        .sort_values(["k", "valid_from"])
        .reset_index(drop=True)
    )
    want = _dim([(2, "B", T0, T1), (2, "X", T1, T2), (2, "Y", T2, None)])
    pd.testing.assert_frame_equal(twice, want, check_dtype=False)


def test_scd2_guards(ray_session):
    cur = ray.data.from_pandas(_dim([(1, "A", T0, None)]))
    dup = ray.data.from_pandas(_delta([(1, "A", T1), (1, "B", T1)]))
    with pytest.raises(ValueError, match="one row per key"):
        scd2_apply(cur, dup, key="k", attrs=["seg"], eff_col="eff")
