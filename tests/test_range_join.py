"""Range (interval) join semantics: inner, left_outer, overlaps."""

from __future__ import annotations

import pandas as pd

import ray.data

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
