"""Funnel / cohort analytics (`ops/analytics.py`) and robust scaling
(`ops/sketch.robust_scale`): planted-semantics checks plus the forced
hash-join state-attach path.  DuckDB parity is covered by
test_queries_oracle.py[event_funnel / cohort_retention /
robust_scale_prices]."""

import numpy as np
import pandas as pd

import ray.data

from sample_c360_text2sql_segmentation_entityresolution_ray.ops.analytics import (
    cohort_retention,
    funnel_counts,
)
from sample_c360_text2sql_segmentation_entityresolution_ray.ops.sketch import (
    robust_scale,
)


def _events() -> pd.DataFrame:
    t0 = pd.Timestamp("2024-01-01")
    rows = [
        # user 1 completes the whole funnel in order
        (1, "signup", 0), (1, "view", 1), (1, "purchase", 2),
        # user 2 views BEFORE signing up — the view must not count
        (2, "view", 0), (2, "signup", 1),
        # user 3 signs up only
        (3, "signup", 5),
        # user 4 never signs up
        (4, "view", 0), (4, "purchase", 1),
    ]
    return pd.DataFrame(
        {
            "user_id": [r[0] for r in rows],
            "event_type": [r[1] for r in rows],
            "ts": [t0 + pd.Timedelta(days=r[2]) for r in rows],
        }
    )


def test_funnel_strict_ordering(ray_session):
    ds = ray.data.from_pandas(_events()).repartition(3)
    out = (
        funnel_counts(ds, steps=("signup", "view", "purchase"))
        .to_pandas().set_index("event_type")["n_users"]
    )
    assert out["signup"] == 3   # users 1, 2, 3
    assert out["view"] == 1     # only user 1 viewed after signup
    assert out["purchase"] == 1


def test_funnel_hash_join_path_equal(ray_session):
    ds = ray.data.from_pandas(_events()).repartition(3)
    a = funnel_counts(ds, steps=("signup", "view")).to_pandas()
    b = funnel_counts(
        ds, steps=("signup", "view"), broadcast_limit=0
    ).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_cohort_offsets(ray_session):
    t0 = pd.Timestamp("2024-03-01")
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2],
            "ts": [
                t0,                                # day 0   (cohort 03-01)
                t0 + pd.Timedelta(days=2),         # offset 2
                t0 + pd.Timedelta(days=2, hours=5),  # same cell, deduped
                t0 + pd.Timedelta(days=1),         # cohort 03-02, offset 0
                t0 + pd.Timedelta(days=3),         # offset 2
            ],
        }
    )
    out = cohort_retention(ray.data.from_pandas(df).repartition(2)).to_pandas()
    want = pd.DataFrame(
        {
            "cohort_date": ["2024-03-01", "2024-03-01", "2024-03-02",
                            "2024-03-02"],
            "day_offset": np.array([0, 2, 0, 2], np.int64),
            "n_users": np.array([1, 1, 1, 1], np.int64),
        }
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_robust_scale_zero_mad(ray_session):
    # >50% of rows constant → MAD = 0 → divide by 1.0, never inf
    df = pd.DataFrame({"x": [5.0] * 8 + [1.0, 9.0]})
    out = robust_scale(
        ray.data.from_pandas(df), "x", grid=1_000_000
    ).to_pandas()
    z = out["x_robust_z"].to_numpy()
    assert np.isfinite(z).all()
    assert (z[:8] == 0.0).all() and z[8] == -4.0 and z[9] == 4.0


def test_lookup_link_planted(ray_session):
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.linkage import lookup_link

    master = pd.DataFrame(
        {
            "mid": np.array([1, 2, 3], np.int64),
            "mname": ["acme corporation", "globex inc", "initech llc"],
        }
    )
    probes = pd.DataFrame(
        {
            "pid": np.array([10, 11, 12], np.int64),
            # same 2-char suffixes as their true masters; 'zzz...' has
            # no block partner and must be dropped
            "pname": ["acme corporaton", "globex,inc", "zzzzzzzznc"],
        }
    )
    out = (
        lookup_link(
            ray.data.from_pandas(probes), ray.data.from_pandas(master),
            probe_id="pid", probe_name="pname",
            master_id="mid", master_name="mname",
            threshold=0.85, block_suffix=2,
        )
        .to_pandas().sort_values("pid").reset_index(drop=True)
    )
    assert out["pid"].tolist() == [10, 11]
    assert out["mid"].tolist() == [1, 2]
    assert (out["score"] >= 0.85).all()


def test_lookup_link_master_guard(ray_session):
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops import linkage
    import pytest as _pytest

    big = ray.data.range(10).map_batches(
        lambda df: pd.DataFrame(
            {"mid": df["id"], "mname": df["id"].astype(str)}
        ),
        batch_format="pandas",
    )
    old = linkage.BROADCAST_ROW_LIMIT
    linkage.BROADCAST_ROW_LIMIT = 5
    try:
        with _pytest.raises(ValueError, match="ER blocking pipeline"):
            linkage.lookup_link(
                big, big, probe_id="mid", probe_name="mname",
                master_id="mid", master_name="mname",
            )
    finally:
        linkage.BROADCAST_ROW_LIMIT = old


def test_golden_records_survivorship(ray_session):
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.survivorship import golden_records

    df = pd.DataFrame(
        {
            "cluster": ["c1", "c1", "c1", "c2"],
            "src": ["sub", "main", "sub", "sub"],
            # the sub record is NEWER than main — priority must win
            "ts": np.array([5, 3, 9, 7], np.int64),
            "rid": ["r3", "r1", "r2", "r9"],
            "email": ["e3", "e1", "e2", "e9"],
        }
    )
    out = (
        golden_records(
            ray.data.from_pandas(df).repartition(2),
            cluster_col="cluster", field_cols=["email"],
            priority_col="src", priority_value="main",
            recency_col="ts", id_col="rid",
        )
        .to_pandas().set_index("cluster")
    )
    # c1: main wins despite being oldest; stats span all three members
    assert out.loc["c1", "email"] == "e1" and out.loc["c1", "rid"] == "r1"
    assert out.loc["c1", "n_records"] == 3
    assert out.loc["c1", "first_seen"] == 3 and out.loc["c1", "last_seen"] == 9
    # c2: single member survives as-is
    assert out.loc["c2", "email"] == "e9" and out.loc["c2", "n_records"] == 1


def test_zorder_improves_two_dim_locality(ray_session):
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.layout import (
        zorder_locality,
        zorder_sort,
    )

    rng = np.random.default_rng(3)
    df = pd.DataFrame({"x": rng.uniform(0, 1, 4000),
                       "y": rng.uniform(0, 1, 4000)})
    base = zorder_locality(df, ["x", "y"], n_chunks=16)           # random order
    zdf = (
        zorder_sort(ray.data.from_pandas(df).repartition(4), "x", "y")
        .to_pandas()
    )
    z = zorder_locality(zdf, ["x", "y"], 16)
    # z-order shrinks the combined bounding box vs random order
    assert z < 0.5 * base

    def chunks_scanned(frame, col, lo, hi, n_chunks=16):
        """files a reader must touch for `col BETWEEN lo AND hi` given
        per-chunk min/max stats — the parquet row-group pruning model"""
        hits = 0
        for idx in np.array_split(np.arange(len(frame)), n_chunks):
            v = frame[col].to_numpy()[idx]
            if v.min() <= hi and v.max() >= lo:
                hits += 1
        return hits

    xsorted = df.sort_values("x").reset_index(drop=True)
    # single-column layout prunes x-predicates but scans EVERYTHING for
    # a y-predicate; z-order prunes meaningfully on BOTH dimensions
    assert chunks_scanned(xsorted, "y", 0.4, 0.45) == 16
    assert chunks_scanned(zdf, "x", 0.4, 0.45) <= 8
    assert chunks_scanned(zdf, "y", 0.4, 0.45) <= 8
    # key is deterministic and sort is total on zval
    assert (np.diff(zdf["zval"].to_numpy()) >= 0).all()


def test_last_touch_attribution_nulls_and_ties(ray_session):
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.analytics import (
        last_touch_attribution,
    )

    ts = pd.to_datetime(
        ["2024-01-01 10:00", "2024-01-01 10:05", "2024-01-01 10:05",
         "2024-01-01 09:00", "2024-01-02 08:00"]
    )
    ev = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 10, 11],
            "ts": ts,
            "user_id": [7, 7, 7, 8, 8],
            "event_type": ["click", "click", "purchase", "purchase", "view"],
            "value": [0.0, 0.0, 42.0, 9.0, 0.0],
        }
    )
    out = (
        last_touch_attribution(
            ray.data.from_pandas(ev).repartition(3), "click", "purchase"
        )
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    # same-ts click (id 2 < 3) counts as at-or-before; user 8 has none
    assert out["event_id"].tolist() == [3, 10]
    assert out["touch_event_id"].tolist()[0] == 2
    assert pd.isna(out["touch_event_id"].tolist()[1])


def test_json_extract_fields_malformed_and_missing(ray_session):
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.text import (
        json_extract_fields,
    )

    df = pd.DataFrame(
        {
            "i": [1, 2, 3, 4, 5],
            "blob": ['{"k": 9, "s": "x"}', "not json", '{"s": "y"}',
                     None, "[1,2]"],
        }
    )
    out = (
        json_extract_fields(
            ray.data.from_pandas(df).repartition(2),
            "blob",
            {"k": "int64", "s": "str"},
            keep=["i"],
        )
        .to_pandas().sort_values("i").reset_index(drop=True)
    )
    assert out["k"].tolist()[0] == 9
    assert pd.isna(out["k"].tolist()[1:]).all()
    assert out["s"].tolist()[:3] == ["x", None, "y"] or (
        out["s"][0] == "x" and pd.isna(out["s"][1]) and out["s"][2] == "y"
    )


def test_levenshtein_batch_bit_exact_vs_scalar_and_duckdb(ray_session):
    import duckdb

    from sample_c360_text2sql_segmentation_entityresolution_ray.functions.strings import (
        levenshtein,
        levenshtein_batch,
    )

    a = ["kitten", "flaw", "", "abc", "Customer#000000042", "same"]
    b = ["sitting", "lawn", "xy", "", "Customer#42", "same"]
    got = levenshtein_batch(a, b)
    assert got.tolist() == [levenshtein(x, y) for x, y in zip(a, b)]
    duck = [
        duckdb.sql(f"SELECT levenshtein('{x}', '{y}')").fetchone()[0]
        for x, y in zip(a, b)
    ]
    assert got.tolist() == duck


def test_lookup_link_levenshtein_metric(ray_session):
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.linkage import lookup_link

    master = pd.DataFrame(
        {"mid": [1, 2, 3], "mname": ["alpha01", "alphq01", "beta9901"]}
    )
    probes = pd.DataFrame({"pid": [10, 11], "pname": ["alpha01", "gamma77"]})
    out = lookup_link(
        ray.data.from_pandas(probes),
        ray.data.from_pandas(master),
        probe_id="pid", probe_name="pname",
        master_id="mid", master_name="mname",
        threshold=2, block_suffix=2, metric="levenshtein",
    ).to_pandas().sort_values("pid")
    # exact match wins at dist 0 (beats mid=2 at dist 1); gamma77's
    # block has no candidates -> dropped
    assert out["pid"].tolist() == [10]
    assert out["mid"].tolist() == [1]
    assert out["dist"].tolist() == [0]


def test_one_hot_discovery_and_unknown(ray_session):
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.relational import one_hot

    df = pd.DataFrame({"k": [1, 2, 3], "c": ["b", "a", "b"]})
    out = (
        one_hot(ray.data.from_pandas(df), "c")
        .to_pandas()
        .sort_values("k")
    )
    assert out["c_a"].tolist() == [0, 1, 0]
    assert out["c_b"].tolist() == [1, 0, 1]
    # explicit categories: values outside encode all-zero
    out2 = (
        one_hot(ray.data.from_pandas(df), "c", categories=["a", "z"])
        .to_pandas()
        .sort_values("k")
    )
    assert out2["c_z"].tolist() == [0, 0, 0]
    assert out2["c_a"].tolist() == [0, 1, 0]


def test_impute_group_median_planted(ray_session):
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.sketch import (
        impute_group_median,
    )

    df = pd.DataFrame(
        {
            "g": ["a", "a", "a", "b", "b"],
            "v": [1.0, 3.0, np.nan, np.nan, np.nan],
        }
    )
    out = (
        impute_group_median(
            ray.data.from_pandas(df), "v", ["g"], grid=1000
        )
        .to_pandas()
        .sort_values(["g", "v"])
    )
    a = out[out["g"] == "a"]["v"].tolist()
    assert a == [1.0, 2.0, 3.0]  # NaN -> median 2.0
    # group with no observed values keeps NaN
    assert out[out["g"] == "b"]["v"].isna().all()


def test_skyline2d_dominance_and_ties(ray_session):
    import pandas as pd
    import ray.data

    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.analytics import skyline2d

    df = pd.DataFrame(
        {
            "id": [1, 2, 3, 4, 5, 6],
            "x": [5.0, 5.0, 4.0, 3.0, 5.0, 2.0],
            "y": [1, 1, 2, 3, 0, 3],
        }
    )
    # frontier pairs: (5,1) [ids 1,2 — identical ties BOTH kept],
    # (4,2), (3,3); (5,0) dominated by (5,1); (2,3) dominated by (3,3)
    out = (
        skyline2d(ray.data.from_pandas(df), "x", "y")
        .to_pandas()
        .sort_values("id")
    )
    assert out["id"].tolist() == [1, 2, 3, 4]

    # many blocks: local pruning must not change the answer
    big = pd.DataFrame({"id": range(200), "x": range(200),
                        "y": [i % 7 for i in range(200)]})
    ds = ray.data.from_pandas(big).repartition(8)
    got = skyline2d(ds, "x", "y").to_pandas()
    # global max x always survives; every survivor must be undominated
    assert 199 in got["id"].tolist()
    for _, p in got.iterrows():
        dom = big[(big.x >= p.x) & (big.y >= p.y)
                  & ((big.x > p.x) | (big.y > p.y))]
        assert dom.empty
