"""KMV distinct-count sketch (`ops/sketch.py`): estimator accuracy,
partition-insensitivity, exact small-group path.  Bit-level DuckDB
parity is covered by test_queries_oracle.py[lineitem_distinct_parts_kmv].
"""

import numpy as np
import pandas as pd

import ray.data

from sample_c360_text2sql_segmentation_entityresolution_ray.ops.sketch import (
    kmv_distinct,
    kmv_estimate,
)


def _data(n_big=5000, n_small=40, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "g": ["big"] * (n_big * 2) + ["small"] * 100,
            # big: n_big distinct values (each ~twice); small: n_small
            "v": np.concatenate(
                [
                    rng.integers(0, n_big, n_big * 2) * 7 + 1,
                    rng.integers(0, n_small, 100),
                ]
            ),
        }
    )


def test_kmv_accuracy_and_exact_small_path(ray_session):
    df = _data()
    truth = df.groupby("g")["v"].nunique()
    out = (
        kmv_distinct(ray.data.from_pandas(df).repartition(8), "v", "g", k=256)
        .to_pandas()
        .set_index("g")["est_distinct"]
    )
    # small group (< k values): exact
    assert out["small"] == float(truth["small"])
    # big group: within 4 standard errors (SE = 1/sqrt(k-2) ~ 6.3%)
    rel_err = abs(out["big"] - truth["big"]) / truth["big"]
    assert rel_err < 4 / np.sqrt(254), (out["big"], truth["big"], rel_err)


def test_kmv_partition_insensitive(ray_session):
    df = _data()
    a = (
        kmv_distinct(ray.data.from_pandas(df).repartition(2), "v", "g", k=64)
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    b = (
        kmv_distinct(
            ray.data.from_pandas(df.sample(frac=1, random_state=9)).repartition(16),
            "v", "g", k=64,
        )
        .to_pandas().sort_values("g").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_kmv_estimate_formula():
    # k-1 hashes uniformly at i * space/k → kth smallest = k*space/k...
    # use a synthetic set where the k-th smallest is space/2: est = 2(k-1)
    k = 8
    space = float(1 << 60)
    hashes = np.array(
        [int(space / 2 / (k - i)) for i in range(k)], dtype=np.int64
    )  # ascending, kth = space/2
    est = kmv_estimate(np.sort(hashes), k)
    assert abs(est - (k - 1) * space / (space // 2)) < 1e-6
    # fewer than k → exact count
    assert kmv_estimate(np.array([5, 9], dtype=np.int64), k) == 2.0


# ---------------------------------------------------------------------------
# quantile sketch
# ---------------------------------------------------------------------------

from sample_c360_text2sql_segmentation_entityresolution_ray.ops.sketch import (  # noqa: E402
    quantile_oracle_sql,
    quantile_sketch,
)


def test_quantile_exact_mode_matches_numpy(ray_session):
    rng = np.random.default_rng(42)
    vals = rng.normal(100, 25, 5000)
    ds = ray.data.from_pandas(pd.DataFrame({"x": vals})).repartition(8)
    qs = [0.1, 0.25, 0.5, 0.75, 0.99]
    got = quantile_sketch(ds, "x", qs, grid=10_000)  # grid > block rows: exact
    want = np.quantile(vals, qs)  # type-7 linear
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_quantile_exact_mode_matches_duckdb(ray_session):
    import duckdb

    rng = np.random.default_rng(7)
    df = pd.DataFrame({"x": rng.uniform(0, 1000, 3000)})
    ds = ray.data.from_pandas(df).repartition(4)
    qs = [0.25, 0.5, 0.9]
    got = [round(v, 6) for v in quantile_sketch(ds, "x", qs, grid=10_000)]
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute(quantile_oracle_sql("t", "x", qs, round_nd=6)).df()
    np.testing.assert_allclose(got, exp["v"].to_numpy(), rtol=1e-9)


def test_quantile_approx_mode_bounded_error(ray_session):
    rng = np.random.default_rng(3)
    vals = rng.normal(0, 1, 40_000)
    ds = ray.data.from_pandas(pd.DataFrame({"x": vals})).repartition(8)
    got = quantile_sketch(ds, "x", [0.5, 0.9], grid=64)  # ~5000 rows/block >> grid
    true = np.quantile(vals, [0.5, 0.9])
    # rank error ≤ block_rows/grid per block → value error small on a
    # smooth distribution
    assert abs(got[0] - true[0]) < 0.05
    assert abs(got[1] - true[1]) < 0.08


def test_quantile_skips_nulls_and_handles_empty(ray_session):
    df = pd.DataFrame({"x": [1.0, None, 3.0, None, 5.0]})
    ds = ray.data.from_pandas(df)
    assert quantile_sketch(ds, "x", [0.5], grid=100) == [3.0]
    empty = ray.data.from_pandas(pd.DataFrame({"x": pd.Series([], dtype=float)}))
    assert np.isnan(quantile_sketch(empty, "x", [0.5])[0])


def test_bloom_no_false_negatives_and_exact_semi_join():
    import numpy as np
    import ray.data

    from sample_c360_text2sql_segmentation_entityresolution_ray.ops import (
        relational as rel,
    )
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.sketch import (
        bloom_semi_join,
        build_bloom,
        _bloom_hashes,
    )

    keys = [f"k{i}" for i in range(0, 4000, 4)]  # 1000 member keys
    small = ray.data.from_items([{"k": k} for k in keys])
    num_bits, num_hashes = 1 << 16, 4
    bits = build_bloom(small, "k", num_bits=num_bits, num_hashes=num_hashes)

    def member(vals):
        mask = np.ones(len(vals), dtype=bool)
        for idx in _bloom_hashes(np.asarray(vals, object), num_hashes, num_bits):
            mask &= (
                bits[(idx >> 3).astype(np.int64)]
                >> (idx & 7).astype(np.uint8) & 1
            ).astype(bool)
        return mask

    assert member(keys).all()  # no false negatives, ever
    probes = [f"absent{i}" for i in range(2000)]
    fp = member(probes).mean()
    assert fp < 0.05, fp  # 2^16 bits / 1000 keys: fp ~0.03%

    large = ray.data.from_items(
        [{"k": f"k{i}", "v": i} for i in range(5000)]
    )
    got = bloom_semi_join(large, small, "k").to_pandas()
    want = rel.semi_join(large, small, "k").to_pandas()
    assert sorted(got["k"]) == sorted(want["k"])
    assert len(got) == 1000


def test_winsorize_clips_to_quantiles():
    import numpy as np
    import ray.data

    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.sketch import (
        winsorize,
    )

    vals = np.arange(1.0, 101.0)  # 1..100
    ds = ray.data.from_items([{"v": float(x)} for x in vals])
    out = (
        winsorize(ds, "v", lo=0.10, hi=0.90, grid=1000)
        .to_pandas()
        .sort_values("v")
    )
    # type-7 quantiles of 1..100 at .1/.9 are 10.9 and 90.1
    lo, hi = np.quantile(vals, 0.10), np.quantile(vals, 0.90)
    np.testing.assert_allclose(out["v_wins"].min(), lo, rtol=1e-12)
    np.testing.assert_allclose(out["v_wins"].max(), hi, rtol=1e-12)
    mid = out[(out["v"] > lo) & (out["v"] < hi)]
    np.testing.assert_allclose(mid["v_wins"], mid["v"])


def test_grouped_quantile_exact_and_fallback(ray_session):
    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "g": np.repeat(["a", "b", "c"], 400),
            "x": rng.normal(0, 10, 1200),
        }
    )
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.sketch import grouped_quantile

    ds = ray.data.from_pandas(df).repartition(5)
    got = grouped_quantile(
        ds, "x", ["g"], [0.25, 0.5, 0.75], grid=1_000_000
    ).to_pandas()
    want = []
    for g in ["a", "b", "c"]:
        v = df.loc[df["g"] == g, "x"]
        for q in [0.25, 0.5, 0.75]:
            want.append((g, q, float(np.quantile(v, q))))  # type-7 default
    want = pd.DataFrame(want, columns=["g", "q", "v"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-9)
    # forced distributed finalize (driver cap 0) must agree exactly
    far = grouped_quantile(
        ds, "x", ["g"], [0.25, 0.5, 0.75], grid=1_000_000, driver_max_rows=0
    ).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(
        far[["g", "q", "v"]], want, check_dtype=False, atol=1e-9
    )


def test_incremental_aggregate_min_max_sum(ray_session):
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.relational import (
        grouped_aggregate,
        incremental_aggregate,
    )

    rng = np.random.default_rng(9)
    full = pd.DataFrame(
        {
            "k": rng.integers(0, 7, 3000),
            "v": rng.normal(100, 30, 3000),
        }
    )
    specs = [
        ("count_star", None, "n"),
        ("sum", "v", "s"),
        ("min", "v", "lo"),
        ("max", "v", "hi"),
    ]
    old, new = full.iloc[:2000], full.iloc[2000:]
    prior = grouped_aggregate(ray.data.from_pandas(old).repartition(4),
                              ["k"], specs)
    got = (
        incremental_aggregate(
            prior, ray.data.from_pandas(new).repartition(3), ["k"], specs
        )
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    want = (
        grouped_aggregate(ray.data.from_pandas(full).repartition(6),
                          ["k"], specs)
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[want.columns], want, check_dtype=False, atol=1e-9
    )
    import pytest as _pytest
    with _pytest.raises(ValueError, match="foldable"):
        incremental_aggregate(prior, prior, ["k"], [("mean", "v", "m")])


def test_discretize_equal_frequency(ray_session):
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.sketch import discretize

    rng = np.random.default_rng(2)
    # heavy skew: equal-width binning would put ~everything in bin 0
    df = pd.DataFrame({"x": np.exp(rng.normal(0, 2, 2000))})
    out = discretize(
        ray.data.from_pandas(df).repartition(4), "x", n_bins=4,
        grid=1_000_000,
    ).to_pandas()
    counts = out["x_bin"].value_counts().sort_index()
    assert list(counts.index) == [0, 1, 2, 3]
    # quartile cuts ⇒ near-equal occupancy (exact up to cut ties)
    assert counts.max() - counts.min() <= 2
    # bin order respects value order
    assert out.sort_values("x")["x_bin"].is_monotonic_increasing


def test_hll_registers_estimate_and_invariance(ray_session):
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.sketch import (
        hll_registers,
        hll_estimate,
    )

    n = 5000
    df = pd.DataFrame({"x": np.arange(n) % 2000})  # 2000 distinct
    regs = hll_registers(
        ray.data.from_pandas(df).repartition(6), "x", b=8
    ).to_pandas()
    assert regs["register"].between(0, 255).all()
    assert regs["rho_max"].between(1, 53).all()
    est = hll_estimate(regs, b=8)
    assert abs(est - 2000) / 2000 < 0.20  # ~6.5% stderr at m=256
    # partition-invariant state
    regs2 = hll_registers(ray.data.from_pandas(df).repartition(1), "x", b=8)
    pd.testing.assert_frame_equal(
        regs.sort_values("register").reset_index(drop=True),
        regs2.to_pandas().sort_values("register").reset_index(drop=True),
    )


def test_hll_registers_grouped_matches_per_group_global(ray_session):
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.sketch import (
        hll_estimate,
        hll_registers,
        hll_registers_grouped,
    )

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "g": np.repeat(["a", "b"], 500),
            "v": np.concatenate(
                [rng.integers(0, 200, 500), rng.integers(1000, 1400, 500)]
            ),
        }
    )
    grouped = (
        hll_registers_grouped(ray.data.from_pandas(df), "v", ["g"], b=6)
        .to_pandas()
    )
    for g in ["a", "b"]:
        alone = (
            hll_registers(
                ray.data.from_pandas(df[df["g"] == g]), "v", b=6
            )
            .to_pandas()
            .sort_values("register")
            .reset_index(drop=True)
        )
        mine = (
            grouped[grouped["g"] == g][["register", "rho_max"]]
            .sort_values("register")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(mine, alone, check_dtype=False)
        est = hll_estimate(mine, b=6)
        exact = df[df["g"] == g]["v"].nunique()
        assert abs(est - exact) / exact < 0.25  # b=6 -> ~13% std error


def test_cms_never_underestimates_and_partition_insensitive(ray_session):
    """CMS point estimates are >= exact counts for every queried value,
    tight for heavy hitters, and the counter STATE is identical no
    matter how the input is partitioned (mergeable-sum property)."""
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.sketch import (
        cms_counters,
        cms_estimate,
    )

    rng = np.random.default_rng(11)
    # zipf-ish: value i appears ~ 3000/(i+1) times
    vals = np.concatenate(
        [np.full(3000 // (i + 1), i) for i in range(60)]
    )
    rng.shuffle(vals)
    df = pd.DataFrame({"v": vals})
    exact = df["v"].value_counts()

    state1 = cms_counters(
        ray.data.from_pandas(df), "v", d=4, w=256
    ).to_pandas()
    state2 = cms_counters(
        ray.data.from_pandas(df).repartition(13), "v", d=4, w=256
    ).to_pandas()
    k = ["row", "cell"]
    pd.testing.assert_frame_equal(
        state1.sort_values(k).reset_index(drop=True),
        state2.sort_values(k).reset_index(drop=True),
        check_dtype=False,
    )

    probe = exact.index.to_numpy()[:40]
    est = cms_estimate(state1, probe, d=4, w=256)
    true = exact.loc[probe].to_numpy()
    assert (est >= true).all()  # CMS never underestimates
    # heavy hitters (top 5) should be near-exact: error <= 2N/w
    assert (est[:5] - true[:5] <= 2 * len(vals) // 256 + 1).all()
    # total mass per row == N
    per_row = state1.groupby("row")["n"].sum()
    assert (per_row == len(vals)).all()
