"""auto_join plan selection: every strategy must produce hash_join's
exact output semantics (left columns then right columns, right key
columns consumed)."""

from __future__ import annotations

import pandas as pd
import ray.data

from sample_c360_text2sql_segmentation_entityresolution_ray.ops.relational import (
    auto_join,
    hash_join,
)


def _tables():
    left = pd.DataFrame(
        {
            "k": [1, 2, 2, 3, 5],
            "lv": ["a", "b", "c", "d", "e"],
        }
    )
    right = pd.DataFrame(
        {
            "rk": [1, 2, 3, 4],
            "rv": [10.0, 20.0, 30.0, 40.0],
        }
    )
    return left, right


def _norm(ds):
    df = ds.to_pandas()
    return (
        df[sorted(df.columns)]
        .sort_values(sorted(df.columns))
        .reset_index(drop=True)
    )


def _run(how, left_rows, right_rows):
    left, right = _tables()
    l = ray.data.from_pandas(left).repartition(2)
    r = ray.data.from_pandas(right).repartition(2)
    got = auto_join(
        l, r, on=("k",), right_on=("rk",), how=how,
        left_rows=left_rows, right_rows=right_rows,
    )
    ref = hash_join(
        ray.data.from_pandas(left).repartition(2),
        ray.data.from_pandas(right).repartition(2),
        on=("k",), right_on=("rk",), how=how, num_partitions=2,
    )
    g, e = _norm(got), _norm(ref)
    assert list(g.columns) == list(e.columns), (g.columns, e.columns)
    pd.testing.assert_frame_equal(
        g.astype(str), e.astype(str), check_dtype=False
    )
    return got


def test_broadcast_right_inner(ray_session):
    _run("inner", left_rows=None, right_rows=4)


def test_broadcast_left_inner(ray_session):
    # left known-small, right unknown-size → build on the LEFT, probe
    # batches of the right; output must still be hash_join-shaped
    _run("inner", left_rows=5, right_rows=None)


def test_broadcast_right_left_outer(ray_session):
    _run("left_outer", left_rows=None, right_rows=4)


def test_left_outer_small_left_falls_back_to_shuffle(ray_session):
    # left_outer cannot build on the left (unmatched-left preservation
    # needs the probe side to be the left) → hash_join fallback
    _run("left_outer", left_rows=5, right_rows=None)


def test_unknown_sizes_shuffle(ray_session):
    _run("inner", left_rows=None, right_rows=None)


def test_both_small_builds_on_smaller(ray_session):
    _run("inner", left_rows=5, right_rows=4)
    _run("inner", left_rows=4, right_rows=5)


def test_forced_hash_path(ray_session):
    # both sizes KNOWN but above the broadcast limit → the same call
    # plans the hash-partition shuffle (the J1 fact⋈fact scale path;
    # `orders_customer_join` in __ray_entry__ rides this plan choice)
    left, right = _tables()
    got = auto_join(
        ray.data.from_pandas(left).repartition(2),
        ray.data.from_pandas(right).repartition(2),
        on=("k",), right_on=("rk",), how="inner",
        left_rows=5, right_rows=4, broadcast_limit=0,
    )
    ref = hash_join(
        ray.data.from_pandas(left).repartition(2),
        ray.data.from_pandas(right).repartition(2),
        on=("k",), right_on=("rk",), how="inner", num_partitions=2,
    )
    g, e = _norm(got), _norm(ref)
    assert list(g.columns) == list(e.columns)
    pd.testing.assert_frame_equal(g.astype(str), e.astype(str), check_dtype=False)
