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


def test_time_band_pairs_planted(ray_session):
    """Band edges inclusive at exactly band, exclusive above; equal-ts
    pairs dropped; pairs never cross keys (per-run rebase); anchor_cap
    keeps only the first successors; partition-count invariant."""
    import numpy as np
    import pandas as pd
    import ray.data

    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.relational import (
        time_band_pairs,
    )

    base = pd.Timestamp("2024-01-01")
    us = pd.Timedelta(microseconds=1)
    rows = [
        # key 1: ts 0, 10, 10, 25 — band 15us
        {"k": 1, "ts": base, "id": 10},
        {"k": 1, "ts": base + 10 * us, "id": 11},
        {"k": 1, "ts": base + 10 * us, "id": 12},
        {"k": 1, "ts": base + 25 * us, "id": 13},
        # key 2 sits INSIDE key 1's time range: a global searchsorted
        # without the rebase would leak cross-key pairs
        {"k": 2, "ts": base + 5 * us, "id": 20},
        {"k": 2, "ts": base + 18 * us, "id": 21},
    ]
    ds = ray.data.from_items(rows).repartition(3)
    out = (
        time_band_pairs(ds, "k", "ts", "id", band_us=15)
        .to_pandas()
        .sort_values(["k", "a_id", "b_id"])
        .reset_index(drop=True)
    )
    got = set(map(tuple, out[["k", "a_id", "b_id", "gap_us"]].to_numpy()))
    assert got == {
        (1, 10, 11, 10), (1, 10, 12, 10),   # within band
        (1, 11, 13, 15), (1, 12, 13, 15),   # exactly band: inclusive
        (2, 20, 21, 13),
    }  # (10,13) gap 25 > band; (11,12) gap 0 dropped; no cross-key
    capped = time_band_pairs(
        ds, "k", "ts", "id", band_us=15, anchor_cap=1
    ).to_pandas()
    # anchor 10's first successor only; anchors 11/12 capped to their
    # immediate successor (12's is 13; 11's is 12 at gap 0 -> dropped)
    assert len(capped) <= len(out)
    assert (capped.groupby("a_id").size() <= 1).all()
