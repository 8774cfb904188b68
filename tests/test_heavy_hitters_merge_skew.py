"""r3 ops: Misra-Gries heavy hitters (`ops/sketch.py`), merge_upsert +
skew_join (`ops/relational.py`), inverted_index (`ops/text.py`).

Oracle-level parity is covered by test_queries_oracle.py
[heavy_hitter_bigrams / orders_upsert / skew_join_lineitem /
inverted_index_docs]; these tests force the paths the fixture can't:
the MG decrement (per-block distinct > capacity), the hot/cold split
equality, the schema guard, the postings cap.
"""

import numpy as np
import pandas as pd
import pytest

import ray.data

from sample_c360_text2sql_segmentation_entityresolution_ray.ops.relational import (
    hash_join,
    merge_upsert,
    skew_join,
)
from sample_c360_text2sql_segmentation_entityresolution_ray.ops.sketch import (
    heavy_hitter_candidates,
    heavy_hitters_topk,
)
from sample_c360_text2sql_segmentation_entityresolution_ray.ops.text import (
    inverted_index,
)


def _zipf_items(n=20_000, seed=7) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    # heavy head: k0..k4 get ~1/2, 1/4, ... of the mass; long uniform tail
    head = rng.choice([f"k{i}" for i in range(5)], size=n // 2,
                      p=[0.5, 0.25, 0.12, 0.08, 0.05])
    tail = np.array([f"t{v}" for v in rng.integers(0, 5000, n // 2)])
    return pd.DataFrame({"key": np.concatenate([head, tail]).astype(object)})


def test_heavy_hitters_exact_topk_under_decrement(ray_session):
    """capacity ≪ per-block distinct: MG decrements fire, yet the
    recount pass still returns the exact top-k (the head is far above
    the N/capacity recall bar)."""
    df = _zipf_items()
    truth = (
        df["key"].value_counts().rename_axis("key").reset_index(name="cnt")
        .sort_values(["cnt", "key"], ascending=[False, True])
        .head(5).reset_index(drop=True)
    )
    ds = ray.data.from_pandas(df).repartition(8)
    out = heavy_hitters_topk(ds, "key", k=5, capacity=64).to_pandas()
    pd.testing.assert_frame_equal(out, truth, check_dtype=False)


def test_heavy_hitter_candidates_bounded_and_recall(ray_session):
    df = _zipf_items()
    ds = ray.data.from_pandas(df).repartition(8)
    cand = heavy_hitter_candidates(ds, "key", capacity=64)
    assert len(cand) <= 64
    # MG guarantee: every key with count > N/capacity is a candidate
    n = len(df)
    must = set(
        df["key"].value_counts().loc[lambda s: s > n / 64].index
    )
    assert must <= set(cand["key"])


def test_merge_upsert_semantics_and_guard(ray_session):
    base = pd.DataFrame({"k": [1, 2, 3, 4], "v": ["a", "b", "c", "d"]})
    upd = pd.DataFrame({"k": [2, 4, 9], "v": ["B", "D", "I"]})
    out = (
        merge_upsert(ray.data.from_pandas(base), ray.data.from_pandas(upd), on="k")
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    want = pd.DataFrame(
        {"k": [1, 2, 3, 4, 9], "v": ["a", "B", "c", "D", "I"]}
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
    with pytest.raises(ValueError, match="identical schemas"):
        merge_upsert(
            ray.data.from_pandas(base),
            ray.data.from_pandas(upd.rename(columns={"v": "w"})),
            on="k",
        )


def test_merge_upsert_shuffle_path_equal(ray_session):
    """broadcast_limit=0 forces the hash-exchange anti join — output
    must be identical to the broadcast plan."""
    base = pd.DataFrame({"k": np.arange(500), "v": np.arange(500) * 2})
    upd = pd.DataFrame({"k": np.arange(0, 500, 7), "v": -1})
    a = merge_upsert(
        ray.data.from_pandas(base), ray.data.from_pandas(upd), on="k"
    ).to_pandas().sort_values("k").reset_index(drop=True)
    b = merge_upsert(
        ray.data.from_pandas(base), ray.data.from_pandas(upd), on="k",
        broadcast_limit=0,
    ).to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert (a.loc[a["k"] % 7 == 0, "v"] == -1).all()


def test_skew_join_equals_hash_join(ray_session):
    rng = np.random.default_rng(11)
    left = pd.DataFrame(
        {
            # key 0 holds half the rows — the straggler shape
            "k": np.concatenate(
                [np.zeros(2000, np.int64), rng.integers(1, 300, 2000)]
            ),
            "x": np.arange(4000),
        }
    )
    right = pd.DataFrame({"k": np.arange(300), "name": [f"n{i}" for i in range(300)]})
    lds = ray.data.from_pandas(left).repartition(6)
    rds = ray.data.from_pandas(right)
    got = (
        skew_join(lds, rds, on="k", hot_threshold=100, hot_key_limit=8)
        .to_pandas().sort_values(["k", "x"]).reset_index(drop=True)
    )
    want = (
        hash_join(lds, rds, on=("k",))
        .to_pandas().sort_values(["k", "x"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )
    # no-hot-keys degenerate: falls through to plain hash_join
    cold_only = skew_join(lds, rds, on="k", hot_threshold=10**9).to_pandas()
    assert len(cold_only) == len(want)


def test_inverted_index_postings_cap(ray_session):
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(30, dtype=np.int64),
            # 'common' in every doc; 'rare' only in doc 3
            "text": [
                "common word" + (" rare" if i == 3 else "")
                for i in range(30)
            ],
        }
    )
    out = (
        inverted_index(ray.data.from_pandas(docs).repartition(4),
                       postings_cap=5)
        .to_pandas().set_index("token")
    )
    assert out.loc["common", "df"] == 30
    assert out.loc["common", "postings"] == "0,1,2,3,4"  # capped at 5
    assert out.loc["rare", "df"] == 1 and out.loc["rare", "postings"] == "3"
