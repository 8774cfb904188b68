"""Implicit-ALS item-affinity model (`pipelines/affinity.py`) — the
learned replacement for the co-occurrence stand-in, mirroring the
reference's `aws-item-affinity` recipe + batch segment job
(`lib/personalize.ts:91`, `lambda/create_personalize_segment/index.py`).
"""

import numpy as np
import pandas as pd
import pytest

import ray.data

from sample_c360_text2sql_segmentation_entityresolution_ray.pipelines.affinity import (
    als_item_based_segments,
    als_train,
    als_user_factors,
    user_item_counts,
)


def _block_interactions(seed=11):
    """Two disjoint co-purchase universes: users a* buy among items
    A0..A5, users b* buy among B0..B5.  Any sane affinity model puts
    within-block users ahead of cross-block users for a block's item."""
    rng = np.random.default_rng(seed)
    rows = []
    for blk, users, items in (
        ("a", [f"ua{i}" for i in range(12)], [f"A{j}" for j in range(6)]),
        ("b", [f"ub{i}" for i in range(12)], [f"B{j}" for j in range(6)]),
    ):
        for u in users:
            # each user buys 4 distinct items of their block (some twice):
            # dense co-purchase → strong block structure for the model
            for it in rng.choice(items, size=4, replace=False):
                for _ in range(int(rng.integers(1, 3))):
                    rows.append({"USER_ID": u, "ITEM_ID": str(it), "TIMESTAMP": 0})
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def block_ds(ray_session):
    return ray.data.from_pandas(_block_interactions()).repartition(4)


def test_user_item_counts(ray_session, block_ds):
    df = _block_interactions()
    got = (
        user_item_counts(block_ds)
        .to_pandas()
        .sort_values(["USER_ID", "ITEM_ID"])
        .reset_index(drop=True)
    )
    want = (
        df.groupby(["USER_ID", "ITEM_ID"], sort=True)
        .size()
        .reset_index(name="n")
    )
    assert got[["USER_ID", "ITEM_ID", "n"]].equals(want)
    # partitioning column present and consistent per user
    per_user = got.groupby("USER_ID")["_part"].nunique()
    assert (per_user == 1).all()


def test_als_train_determinism_and_shape(ray_session, block_ds):
    y1 = als_train(block_ds, factors=8, iterations=3, seed=5)
    y2 = als_train(block_ds, factors=8, iterations=3, seed=5)
    assert list(y1["item_id"]) == sorted(y1["item_id"]) and len(y1) == 12
    for a, b in zip(y1["y"], y2["y"]):
        np.testing.assert_allclose(a, b)


def test_als_reconstructs_block_structure(ray_session, block_ds):
    """Predicted preference x_u·y_i must separate observed-block items
    from other-block items for every user."""
    Y = als_train(block_ds, factors=8, iterations=6, alpha=40.0, seed=5)
    ymap = dict(zip(Y["item_id"], Y["y"]))
    X = als_user_factors(block_ds, Y).to_pandas()
    xmap = dict(zip(X["USER_ID"], X["x"]))
    assert len(X) == 24
    a_items = [i for i in ymap if i.startswith("A")]
    b_items = [i for i in ymap if i.startswith("B")]
    for u, x in xmap.items():
        own = a_items if u.startswith("ua") else b_items
        other = b_items if u.startswith("ua") else a_items
        own_mean = np.mean([np.dot(x, ymap[i]) for i in own])
        other_max = max(np.dot(x, ymap[i]) for i in other)
        assert own_mean > other_max + 0.1, (u, own_mean, other_max)


def test_als_segments_exclude_owners_and_rank_in_block(ray_session, block_ds):
    df = _block_interactions()
    seg = (
        als_item_based_segments(
            block_ds, ["A0", "B3"], n=3, factors=8, iterations=6, seed=5
        )
        .to_pandas()
        .sort_values(["item_id", "affinity"], ascending=[True, False])
    )
    owners = set(
        map(tuple, df[["USER_ID", "ITEM_ID"]].drop_duplicates().to_numpy())
    )
    assert set(seg["item_id"]) == {"A0", "B3"}
    for _, r in seg.iterrows():
        # prior purchasers excluded
        assert (r["user_id"], r["item_id"]) not in owners
    # the top recommendation per target is a within-block user (deeper
    # ranks at this toy scale depend on sparse overlap, not structure)
    for _, top in seg.groupby("item_id", sort=False).head(1).iterrows():
        blk = "ua" if top["item_id"].startswith("A") else "ub"
        assert top["user_id"].startswith(blk), top.to_dict()
    assert (seg.groupby("item_id").size() <= 3).all()


def test_als_segments_schema_matches_cooccurrence_path(ray_session, block_ds):
    seg = als_item_based_segments(
        block_ds, ["A1"], n=3, factors=4, iterations=2, seed=1
    ).to_pandas()
    assert list(seg.columns) == ["item_id", "user_id", "affinity"]
    assert seg["affinity"].dtype == np.float64


def test_als_local_reference_bit_equal(ray_session, block_ds):
    """The serial reference (oracle-fixture generator) must reproduce
    the distributed ALS bit-for-bit: same partition layout, same
    kernels, ascending-_part combine makes the float accumulation
    partition-order-invariant on both sides."""
    from sample_c360_text2sql_segmentation_entityresolution_ray.pipelines.affinity import (
        als_item_based_segments,
        als_item_based_segments_local,
        als_train,
        als_train_local,
    )

    df = _block_interactions()
    y_d = als_train(block_ds, factors=8, iterations=3)
    y_l = als_train_local(df, factors=8, iterations=3)
    assert list(y_d["item_id"]) == list(y_l["item_id"])
    np.testing.assert_array_equal(
        np.stack(y_d["y"].to_numpy()), np.stack(y_l["y"].to_numpy())
    )

    tgts = ["A0", "B3"]
    seg_d = (
        als_item_based_segments(block_ds, tgts, n=5, factors=8, iterations=3)
        .to_pandas()
        .sort_values(["item_id", "user_id"])
        .reset_index(drop=True)
    )
    seg_l = (
        als_item_based_segments_local(df, tgts, n=5, factors=8, iterations=3)
        .sort_values(["item_id", "user_id"])
        .reset_index(drop=True)
    )
    assert seg_d[["item_id", "user_id"]].equals(seg_l[["item_id", "user_id"]])
    np.testing.assert_array_equal(
        seg_d["affinity"].to_numpy(), seg_l["affinity"].to_numpy()
    )
