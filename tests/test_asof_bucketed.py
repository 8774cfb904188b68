"""asof_join_bucketed (the Parquet-bucketed scale path) must reproduce
the broadcast asof_join bit-for-bit."""

from __future__ import annotations

import pandas as pd

import ray.data

from sample_c360_text2sql_segmentation_entityresolution_ray.ops import (
    relational as rel,
)


def _inputs(sf_dir):
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    )
    return ev, orders


KW = dict(
    left_key="user_id",
    right_key="o_custkey",
    left_ts="ts",
    right_ts="o_orderdate",
)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return (
        df[cols].astype(str).sort_values(cols).reset_index(drop=True)
    )


def test_bucketed_matches_broadcast_inner(sf_dir, tmp_path):
    ev, orders = _inputs(sf_dir)
    bc = rel.asof_join(ev, orders, how="inner", **KW).to_pandas()
    ev, orders = _inputs(sf_dir)
    bk = rel.asof_join_bucketed(
        ev, orders, how="inner", partitions=8,
        scratch_dir=str(tmp_path / "b"), **KW
    ).to_pandas()
    pd.testing.assert_frame_equal(_canon(bc), _canon(bk))


def test_bucketed_matches_broadcast_left_outer(sf_dir, tmp_path):
    ev, orders = _inputs(sf_dir)
    bc = rel.asof_join(ev, orders, how="left_outer", **KW).to_pandas()
    ev, orders = _inputs(sf_dir)
    bk = rel.asof_join_bucketed(
        ev, orders, how="left_outer", partitions=8,
        scratch_dir=str(tmp_path / "b"), **KW
    ).to_pandas()
    assert len(bk) == len(bc)  # unmatched left rows kept
    pd.testing.assert_frame_equal(_canon(bc), _canon(bk))
