"""Range (interval) join semantics: inner, left_outer, overlaps."""

from __future__ import annotations

import pandas as pd

import ray.data

from sample_c360_text2sql_segmentation_entityresolution_ray.ops import (
    relational as rel,
)
from sample_c360_text2sql_segmentation_entityresolution_ray.ops.relational import (
    range_join,
)


def _left():
    return ray.data.from_pandas(
        pd.DataFrame({"id": [1, 2, 3, 4], "v": [5.0, 15.0, 25.0, 99.0]})
    )


def _bands():
    return ray.data.from_pandas(
        pd.DataFrame(
            {"band": ["a", "b", "wide"], "lo": [0.0, 10.0, 0.0], "hi": [10.0, 20.0, 30.0]}
        )
    )


def test_inner_with_overlaps():
    out = range_join(_left(), _bands(), "v", "lo", "hi").to_pandas()
    got = sorted(zip(out["id"], out["band"]))
    # v=5 → a+wide; v=15 → b+wide; v=25 → wide; v=99 → none
    assert got == [(1, "a"), (1, "wide"), (2, "b"), (2, "wide"), (3, "wide")]


def test_left_outer_keeps_unmatched():
    out = range_join(_left(), _bands(), "v", "lo", "hi", how="left_outer").to_pandas()
    unmatched = out[out["id"] == 4]
    assert len(unmatched) == 1 and unmatched["band"].isna().all()


def test_boundary_semantics_lo_inclusive_hi_exclusive():
    left = ray.data.from_pandas(pd.DataFrame({"id": [1, 2], "v": [10.0, 20.0]}))
    out = range_join(left, _bands(), "v", "lo", "hi").to_pandas()
    got = sorted(zip(out["id"], out["band"]))
    # v=10: enters b (lo inclusive) and wide; v=20: leaves b (hi
    # exclusive) but still inside wide
    assert got == [(1, "b"), (1, "wide"), (2, "wide")]


def test_range_join_bucketed_matches_broadcast(sf_dir, tmp_path):
    """The hive-bucketed scale path must reproduce the broadcast range
    join bit-for-bit, including unbounded interval edges and
    left_outer unmatched rows."""
    import pandas as pd

    import ray.data

    bands = [
        {"band": "low", "lo": 0.0, "hi": 100_000.0},
        {"band": "mid", "lo": 100_000.0, "hi": 300_000.0},
        {"band": "high", "lo": 300_000.0, "hi": 1e18},  # unbounded edge
        {"band": "vip", "lo": 250_000.0, "hi": 400_000.0},  # overlapping
    ]

    def inputs():
        orders = ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
        )
        return orders, ray.data.from_items(bands)

    def canon(df):
        cols = sorted(df.columns)
        return df[cols].astype(str).sort_values(cols).reset_index(drop=True)

    for how in ("inner", "left_outer"):
        l1, r1 = inputs()
        bc = rel.range_join(l1, r1, "o_totalprice", "lo", "hi", how=how).to_pandas()
        l2, r2 = inputs()
        bk = rel.range_join_bucketed(
            l2, r2, "o_totalprice", "lo", "hi", how=how,
            num_buckets=16, scratch_dir=str(tmp_path / how),
        ).to_pandas()
        pd.testing.assert_frame_equal(canon(bc), canon(bk))
