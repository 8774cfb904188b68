"""Deterministic splits / samples / stratified caps / shuffle."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from sample_c360_text2sql_segmentation_entityresolution_ray.ops import sampling


def _docs(n=1000):
    return ray.data.from_pandas(
        pd.DataFrame({"doc_id": range(n), "lang": [["en", "de", "fr"][i % 3] for i in range(n)]})
    )


def test_assign_split_deterministic_and_proportional():
    out1 = sampling.assign_split(_docs()).to_pandas()
    out2 = sampling.assign_split(_docs()).to_pandas()
    pd.testing.assert_frame_equal(
        out1.sort_values("doc_id").reset_index(drop=True),
        out2.sort_values("doc_id").reset_index(drop=True),
    )
    counts = out1["split"].value_counts(normalize=True)
    assert abs(counts["train"] - 0.9) < 0.05
    assert set(out1["split"]) == {"train", "valid", "test"}


def test_assign_split_modulo_matches_sql_semantics():
    out = sampling.assign_split(_docs(200), by_modulo=True).to_pandas()
    expect = out["doc_id"] % 100
    assert ((expect < 90) == (out["split"] == "train")).all()


def test_hash_sample_fraction_and_independence():
    a = sampling.hash_sample(_docs(), 0.3, salt="a").to_pandas()
    b = sampling.hash_sample(_docs(), 0.3, salt="b").to_pandas()
    assert abs(len(a) / 1000 - 0.3) < 0.06
    # different salts → different (mostly independent) subsets
    overlap = len(set(a["doc_id"]) & set(b["doc_id"])) / max(1, len(a))
    assert 0.1 < overlap < 0.6  # ~0.3 expected


def test_stratified_sample_caps_per_group():
    out = sampling.stratified_sample(_docs(), "lang", per_group=10).to_pandas()
    assert (out.groupby("lang").size() == 10).all()
    out2 = sampling.stratified_sample(_docs(), "lang", per_group=10).to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])  # content-defined


def test_shuffle_preserves_rows():
    out = sampling.shuffle_for_training(_docs(100), seed=7).to_pandas()
    assert sorted(out["doc_id"]) == list(range(100))


def test_weighted_sample_deterministic_and_rate_shaped():
    import ray.data

    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.sampling import (
        weighted_sample,
    )

    rows = [
        {"doc_id": i, "lang": ("en" if i % 2 == 0 else "xx")}
        for i in range(2000)
    ]
    ds = lambda: ray.data.from_items(rows)
    kept = weighted_sample(
        ds(), rates={"en": 0.9}, default_rate=0.05
    ).to_pandas()
    again = weighted_sample(
        ds(), rates={"en": 0.9}, default_rate=0.05
    ).to_pandas()
    assert sorted(kept["doc_id"]) == sorted(again["doc_id"])  # deterministic
    en = (kept["lang"] == "en").sum()
    xx = (kept["lang"] == "xx").sum()
    assert 820 <= en <= 980  # ~0.9 of 1000
    assert 20 <= xx <= 90  # ~0.05 of 1000
    # a different salt gives an independent draw
    other = weighted_sample(
        ds(), rates={"en": 0.9}, default_rate=0.05, salt="other"
    ).to_pandas()
    assert sorted(other["doc_id"]) != sorted(kept["doc_id"])


def test_cluster_balanced_sample_caps_and_is_deterministic():
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.sampling import (
        cluster_balanced_sample,
    )

    df = pd.DataFrame(
        {"vec_id": range(300), "cluster": [i % 3 for i in range(300)]}
    )
    ds = ray.data.from_pandas(df).repartition(6)
    a = cluster_balanced_sample(ds, m=7).to_pandas()
    b = cluster_balanced_sample(ds, m=7).to_pandas()
    assert len(a) == 21 and (a.groupby("cluster").size() == 7).all()
    pd.testing.assert_frame_equal(
        a.sort_values(["cluster", "vec_id"]).reset_index(drop=True),
        b.sort_values(["cluster", "vec_id"]).reset_index(drop=True),
    )
    # a different salt draws a different (still capped) subset
    c = cluster_balanced_sample(ds, m=7, salt="other").to_pandas()
    assert set(map(tuple, c.to_numpy())) != set(map(tuple, a.to_numpy()))


def test_group_split_no_entity_straddles(sf_dir):
    import ray.data

    from sample_c360_text2sql_segmentation_entityresolution_ray.ops import (
        sampling,
    )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    out = sampling.assign_split(
        orders, id_col="o_custkey", by_modulo=True
    ).to_pandas()
    # leakage hygiene: every customer's orders land in exactly one split
    assert (out.groupby("o_custkey")["split"].nunique() == 1).all()
    assert set(out["split"].unique()) <= {"train", "valid", "test"}
    # hash-key variant holds the same invariant
    out2 = sampling.assign_split(orders, id_col="o_custkey").to_pandas()
    assert (out2.groupby("o_custkey")["split"].nunique() == 1).all()


def test_deterministic_shuffle_rank_permutation(ray_session):
    """Positions are exactly 0..n-1, identical across runs AND across
    partitionings (the reproducibility random_shuffle can't give)."""
    import numpy as np
    import ray.data

    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.sampling import (
        deterministic_shuffle_rank,
    )

    ids = list(range(500))
    ds1 = ray.data.from_items([{"doc_id": i} for i in ids]).repartition(7)
    ds2 = ray.data.from_items([{"doc_id": i} for i in ids]).repartition(2)
    a = deterministic_shuffle_rank(ds1).to_pandas().sort_values("doc_id")
    b = deterministic_shuffle_rank(ds2).to_pandas().sort_values("doc_id")
    assert sorted(a["shuffle_pos"]) == ids  # a permutation of 0..n-1
    assert (a["shuffle_pos"].to_numpy() == b["shuffle_pos"].to_numpy()).all()
    # genuinely shuffled: the identity order survives with ~1/n! odds
    assert not (a.sort_values("shuffle_pos")["doc_id"].to_numpy()
                == np.arange(500)).all()


def test_stratified_sample_k_exact_and_stable(ray_session):
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.sampling import (
        stratified_sample_k,
    )

    df = pd.DataFrame(
        {
            "g": ["a"] * 50 + ["b"] * 7 + ["c"] * 2,
            "i": np.arange(59),
        }
    )
    out = (
        stratified_sample_k(
            ray.data.from_pandas(df).repartition(4), "g", "i", k=5
        )
        .to_pandas().sort_values(["g", "i"]).reset_index(drop=True)
    )
    sizes = out.groupby("g").size().to_dict()
    # exact k where the group has >= k rows, whole group otherwise
    assert sizes == {"a": 5, "b": 5, "c": 2}
    # partition-invariant pick
    again = (
        stratified_sample_k(
            ray.data.from_pandas(df).repartition(1), "g", "i", k=5
        )
        .to_pandas().sort_values(["g", "i"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, again)
