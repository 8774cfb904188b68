"""zip_with_index global numbering and sorted-neighborhood blocking."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data

from sample_c360_text2sql_segmentation_entityresolution_ray.ops import linkage
from sample_c360_text2sql_segmentation_entityresolution_ray.ops.order import (
    zip_with_index,
)


def _frame(n=100, seed=7):
    rng = np.random.default_rng(seed)
    keys = [f"k{rng.integers(0, 30):02d}" for _ in range(n)]
    return pd.DataFrame({"id": np.arange(n, dtype=np.int64), "key": keys})


@pytest.mark.parametrize("num_buckets", [1, 4, 64, 500])
def test_zip_with_index_matches_reference(num_buckets):
    df = _frame()
    out = (
        zip_with_index(
            ray.data.from_pandas(df), "key", "id", num_buckets=num_buckets
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    ref = df.sort_values(["key", "id"], kind="mergesort").reset_index(drop=True)
    ref["row_id"] = np.arange(len(ref), dtype=np.int64)
    ref = ref.sort_values("id").reset_index(drop=True)
    assert (out["row_id"].to_numpy() == ref["row_id"].to_numpy()).all()
    # dense: every index appears exactly once
    assert sorted(out["row_id"]) == list(range(len(df)))


def _snm_reference(df, window):
    srt = df.sort_values(["key", "id"], kind="mergesort").reset_index(drop=True)
    pairs = set()
    for i in range(len(srt)):
        for j in range(i + 1, min(i + window, len(srt))):
            pairs.add((srt["id"].iloc[i], srt["id"].iloc[j]))
    return pairs


@pytest.mark.parametrize("num_buckets", [1, 3, 16, 500])
def test_snm_pairs_exact_window(num_buckets):
    """Every pair within `window` positions of the global sort order —
    once each — regardless of bucketing (tiny buckets force the
    cross-bucket carry path; more buckets than rows forces singleton
    buckets whose window spans several preceding buckets)."""
    df = _frame(n=60, seed=3)
    out = linkage.snm_pairs(
        ray.data.from_pandas(df),
        key_col="key",
        id_col="id",
        window=4,
        num_buckets=num_buckets,
    ).to_pandas()
    got = set(zip(out["id_a"], out["id_b"]))
    assert len(got) == len(out)  # no duplicate pairs
    assert got == _snm_reference(df, window=4)


def test_snm_pairs_payload_travels():
    df = pd.DataFrame(
        {
            "id": [1, 2, 3],
            "key": ["a", "b", "c"],
            "name": ["anna", "bob", "cara"],
        }
    )
    out = (
        linkage.snm_pairs(
            ray.data.from_pandas(df),
            key_col="key",
            id_col="id",
            window=2,
            payload_cols=("name",),
            num_buckets=2,
        )
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert list(out["id_a"]) == [1, 2] and list(out["id_b"]) == [2, 3]
    assert list(out["name_a"]) == ["anna", "bob"]
    assert list(out["name_b"]) == ["bob", "cara"]


def test_meta_blocking_purge_cbs_wep():
    """Block purging drops singleton + oversized blocks; CBS counts
    shared blocks; WEP keeps edges at/above the mean weight."""
    rows = []
    # block b1 = {1,2,3}; b2 = {1,2}; singleton b3 = {4};
    # oversized b4 = {1..5} (max_block=4 purges it)
    for i in (1, 2, 3):
        rows.append({"id": i, "bkey": "b1"})
    for i in (1, 2):
        rows.append({"id": i, "bkey": "b2"})
    rows.append({"id": 4, "bkey": "b3"})
    for i in (1, 2, 3, 4, 5):
        rows.append({"id": i, "bkey": "b4"})
    keys = ray.data.from_pandas(pd.DataFrame(rows))
    out = (
        linkage.meta_blocking(keys, max_block=4)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    # edges: (1,2)=2, (1,3)=1, (2,3)=1 -> mean 4/3 -> keep only (1,2)
    assert out.to_dict("records") == [{"id_a": 1, "id_b": 2, "cbs": 2}]


def test_meta_blocking_empty_after_purge():
    keys = ray.data.from_pandas(
        pd.DataFrame({"id": [1, 2], "bkey": ["x", "y"]})
    )
    out = linkage.meta_blocking(keys, max_block=4).to_pandas()
    assert len(out) == 0
