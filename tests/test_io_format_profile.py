"""JSONL segment IO, overwrite sink, CSV reader, encoding, formatter,
column profiler, schema registry."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from sample_c360_text2sql_segmentation_entityresolution_ray.ops import (
    format as fmt,
    io as ioops,
    profile as prof,
)


def test_segment_jsonl_roundtrip(tmp_path):
    out = str(tmp_path / "seg_in")
    ioops.write_segment_jsonl(["i1", "i2"], out)
    files = [f for f in os.listdir(out) if f.endswith(".json")]
    assert files
    # simulate the batch job's .json.out result files
    res_dir = tmp_path / "seg_out"
    res_dir.mkdir()
    with open(res_dir / "part.json", "w") as f:
        f.write(json.dumps({"input": {"itemId": "i1"}, "output": {"usersList": ["u1", "u2"]}}) + "\n")
        f.write(json.dumps({"input": {"itemId": "i2"}, "output": {"usersList": []}}) + "\n")
    got = ioops.read_segment_results(str(res_dir)).to_pandas()
    assert list(zip(got["item_id"], got["user_id"])) == [("i1", "u1"), ("i1", "u2")]


def test_read_csv_table(tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("id,name\n1,alice\n2,bob\n")
    schema = pa.schema([("id", pa.int64()), ("name", pa.string())])
    df = ioops.read_csv_table(str(p), schema).to_pandas()
    assert list(df["id"]) == [1, 2]
    assert df["id"].dtype == "int64"


def test_overwrite_dir_swaps_atomically(tmp_path):
    dest = str(tmp_path / "out")
    n1 = ioops.overwrite_dir(
        ray.data.from_pandas(pd.DataFrame({"x": [1, 2]})), dest
    )
    assert n1 == 2
    n2 = ioops.overwrite_dir(
        ray.data.from_pandas(pd.DataFrame({"x": [7, 8, 9]})), dest
    )
    assert n2 == 3
    assert ray.data.read_parquet(dest).count() == 3  # old contents gone


def test_detect_and_decode():
    assert ioops.detect_and_decode("héllo".encode("utf-8")) == ("héllo", "utf-8")
    text, enc = ioops.detect_and_decode("日本語".encode("shift-jis"))
    assert text == "日本語" and enc in ("shift-jis", "cp932")


def test_group_files_by_header(tmp_path):
    a = tmp_path / "a.csv"; a.write_text("x,y\n1,2\n")
    b = tmp_path / "b.csv"; b.write_text("y,x\n3,4\n")   # same cols, reordered
    c = tmp_path / "c.csv"; c.write_text("x,z\n5,6\n")
    groups = ioops.group_files_by_header([str(a), str(b), str(c)])
    sizes = sorted(len(v) for v in groups.values())
    assert sizes == [1, 2]  # a+b together (sorted header), c alone


def test_format_result_small_and_truncated():
    small = ray.data.from_items([{"a": i, "b": f"v{i}"} for i in range(3)])
    r = fmt.format_result(small)
    assert not r["truncated"] and r["row_count_probe"] == 3
    assert r["text"].splitlines()[0] == "a | b"
    big = ray.data.range(400).map(lambda row: {"a": row["id"]})
    r2 = fmt.format_result(big)
    assert r2["truncated"] and r2["row_count_probe"] == fmt.ROW_THRESHOLD
    assert len(r2["text"].splitlines()) == fmt.PREVIEW_ROWS + 2  # header + hint


def test_profile_and_infer():
    ds = ray.data.from_pandas(
        pd.DataFrame(
            {
                "ints": ["1", "-2", "33"],
                "decs": ["1.5", "2", "3.25"],
                "strs": ["a", "2x", "3"],
            }
        )
    )
    p = prof.profile_columns(ds, ["ints", "decs", "strs"])
    assert prof.infer_type(p["ints"]) == "BIG_INT"
    assert prof.infer_type(p["decs"]) == "DOUBLE"
    assert prof.infer_type(p["strs"]) == "STRING"


def test_schema_registry_prompt_block():
    reg = prof.SchemaRegistry()
    reg.register(
        "integrated_customer",
        "unified customers; MatchID joins across brands (use DISTINCT)",
        {
            "RecordId": ("STRING", "original customer_id"),
            "MatchID": ("STRING", "cluster label"),
        },
    )
    block = reg.prompt_block()
    assert "Table: integrated_customer" in block
    assert "MatchID STRING  -- cluster label" in block


def test_humanize_column():
    assert prof.humanize_column("o_orderkey") == "order key"
    assert prof.humanize_column("cust_id") == "cust identifier"
    assert prof.humanize_column("createdAt") == "created at"
    assert prof.humanize_column("l_shipdate") == "ship date"
    assert prof.humanize_column("purchase_amt") == "purchase amount"


def test_summarize_and_annotate_table(ray_session):
    import ray.data

    df = pd.DataFrame(
        {
            "order_id": [1, 2, 3, 4, 5, 6],
            "status": ["open", "open", None, "closed", "open", "closed"],
            "amt": [10.5, 3.25, 8.0, None, 2.5, 9.0],
        }
    )
    ds = ray.data.from_pandas(df).repartition(3)
    stats = prof.summarize_columns(ds)
    assert stats["order_id"]["n_distinct"] == 6
    assert stats["order_id"]["n_null"] == 0
    assert stats["status"]["n_null"] == 1
    assert stats["status"]["n_distinct"] == 2
    assert stats["amt"]["lo"] == "2.5" and stats["amt"]["hi"] == "10.5"

    reg = prof.SchemaRegistry()
    meta = prof.annotate_table(ds, "orders_small", reg)
    # unique-per-row column detected for the table description
    assert "order_id" in meta.description
    block = reg.prompt_block()
    assert "Table: orders_small" in block
    # generated comments carry the humanized name and the stats clause
    assert "order identifier" in block
    assert "2 distinct" in block  # status
    # distinct-cap path: capped column reports '>' and drops the range
    stats_capped = prof.summarize_columns(ds, distinct_cap=3)
    assert stats_capped["order_id"]["capped"]


def test_annotate_table_feeds_sql_prompt(ray_session):
    """The generated block is the text2sql prompt artifact: annotate a
    real fixture table and check shape, not exact wording."""
    import ray.data

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/orders.parquet",
        columns=["o_orderkey", "o_orderstatus", "o_totalprice"],
    )
    reg = prof.SchemaRegistry()
    prof.annotate_table(ds, "orders", reg, distinct_cap=100)
    block = reg.prompt_block()
    assert "Table: orders" in block
    assert "o_orderstatus" in block and "distinct" in block


def test_histogram_buckets_and_clamp():
    import numpy as np
    import ray.data

    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.profile import (
        histogram,
    )

    # 0..100: width 10; the max value (100) clamps into bucket 9
    ds = ray.data.from_items([{"v": float(x)} for x in range(101)])
    out = histogram(ds, "v", bins=10).to_pandas()
    assert list(out["bucket"]) == list(range(10))
    assert out["n"].sum() == 101
    assert out.loc[out["bucket"] == 9, "n"].iloc[0] == 11  # 90..100
    np.testing.assert_allclose(out["lo"], np.arange(10) * 10.0)
    np.testing.assert_allclose(out["hi"], np.arange(1, 11) * 10.0)


def test_extract_model_json_fence_and_brace_rules():
    """The reference's two-step LLM-JSON extraction
    (`csvtool/csv_to_glue_catalog.py:219-231`): fenced block first,
    then first-{-to-last-} span, else error."""
    fenced = 'Here is the schema:\n```json\n{"table_name": "t", "columns": []}\n```\nHope that helps!'
    assert prof.extract_model_json(fenced)["table_name"] == "t"
    # fence without the json language tag
    assert prof.extract_model_json('```\n{"a": 1}\n```')["a"] == 1
    # no fence: brace-span fallback with surrounding prose
    spans = 'Sure! The answer is {"a": {"b": 2}} as requested.'
    assert prof.extract_model_json(spans)["a"]["b"] == 2
    # broken fence contents fall through to the brace span
    broken_fence = '```json\n{"bad": }\n``` but also {"ok": true}'
    # first-{ .. last-} spans both objects -> unparseable -> error
    import pytest as _pytest

    with _pytest.raises(ValueError):
        prof.extract_model_json(broken_fence)
    with _pytest.raises(ValueError):
        prof.extract_model_json("no json here at all")


def test_annotate_table_with_model_fenced_reply(ray_session):
    """Interface test for the pluggable-LLM cataloger: a scripted fake
    model emits md-fenced JSON (the real-LLM output shape the
    deterministic stand-in never produces); comments flow into the
    prompt block, profiled Arrow types win over model guesses, and
    unmentioned columns keep deterministic comments."""
    import json

    import ray.data

    df = pd.DataFrame(
        {
            "order_id": [1, 2, 3],
            "status": ["open", "closed", "open"],
            "amt": [1.5, 2.0, 3.25],
        }
    )
    ds = ray.data.from_pandas(df)
    prompts = []

    def fake_model(prompt: str) -> str:
        prompts.append(prompt)
        body = json.dumps(
            {
                "table_name": "orders_small",
                "description": "Synthetic order ledger",
                "columns": [
                    {"name": "order_id", "type": "BIG_INT", "comment": "order key (e.g. 1001)"},
                    {"name": "status", "type": "STRING", "comment": "order state"},
                ],
            }
        )
        return f"Sure — here is the catalog entry:\n```json\n{body}\n```\nLet me know!"

    reg = prof.SchemaRegistry()
    meta = prof.annotate_table_with_model(ds, "orders_small", reg, fake_model)
    # the model saw a prompt containing the profiled stats
    assert prompts and "order_id" in prompts[0]
    assert meta.description == "Synthetic order ledger"
    assert meta.columns["order_id"][1] == "order key (e.g. 1001)"
    # profiled Arrow type wins over the model's BIG_INT guess
    assert meta.columns["order_id"][0] == "int64"
    # column the model skipped keeps the deterministic comment
    assert "distinct" in meta.columns["amt"][1] or meta.columns["amt"][1]
    block = reg.prompt_block()
    assert "order key (e.g. 1001)" in block


def test_grouped_entropy_planted(ray_session):
    import math

    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.profile import (
        grouped_entropy,
    )

    df = pd.DataFrame(
        {"g": ["a"] * 4 + ["b"] * 2, "v": ["x", "x", "y", "z", "w", "w"]}
    )
    out = (
        grouped_entropy(ray.data.from_pandas(df), "g", "v")
        .to_pandas()
        .sort_values("g")
    )
    # a: 2/4,1/4,1/4 -> 1.5 bits; b: all same -> 0
    got = dict(zip(out["g"], out["entropy"]))
    assert abs(got["a"] - 1.5) < 1e-12
    assert abs(got["b"] - 0.0) < 1e-12
    assert math.isfinite(got["a"])


def test_grouped_mode_tiebreak_smallest(ray_session):
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.profile import (
        grouped_mode,
    )

    df = pd.DataFrame(
        {"g": ["a"] * 4 + ["b"] * 3, "v": [5, 5, 3, 3, 9, 9, 1]}
    )
    out = (
        grouped_mode(ray.data.from_pandas(df), "g", "v", out_col="m")
        .to_pandas()
        .sort_values("g")
    )
    # a: 5 and 3 tie at 2 -> smallest (3) wins; b: 9 wins outright
    assert out["m"].tolist() == [3, 9]
    assert out["n"].tolist() == [2, 2]


def test_corr_matrix_planted(ray_session):
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.profile import (
        corr_matrix,
    )

    df = pd.DataFrame(
        {
            "x": [1.0, 2.0, 3.0, 4.0],
            "y": [2.0, 4.0, 6.0, 8.0],   # r(x,y) = 1
            "c": [5.0, 5.0, 5.0, 5.0],   # zero variance -> NaN
        }
    )
    out = (
        corr_matrix(ray.data.from_pandas(df), ["x", "y", "c"])
        .to_pandas()
        .set_index(["col_a", "col_b"])["r"]
    )
    assert abs(out[("x", "y")] - 1.0) < 1e-12
    assert np.isnan(out[("x", "c")]) and np.isnan(out[("y", "c")])


def test_target_encode_loo_planted(ray_session):
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.relational import (
        target_encode_loo,
    )

    df = pd.DataFrame(
        {"g": ["a", "a", "a", "b"], "y": [1.0, 2.0, 3.0, 10.0]}
    )
    out = (
        target_encode_loo(ray.data.from_pandas(df), "g", "y")
        .to_pandas()
        .sort_values("y")
    )
    got = out["loo_mean"].tolist()
    # a rows: (2+3)/2, (1+3)/2, (1+2)/2; singleton b -> NaN
    assert got[:3] == [2.5, 2.0, 1.5]
    assert np.isnan(got[3])


def test_grouped_regression_planted(ray_session):
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.profile import (
        grouped_regression,
    )

    # y = 2x + 1 exactly in group a; constant x in group b -> NaN
    df = pd.DataFrame(
        {
            "g": ["a"] * 4 + ["b"] * 2,
            "x": [1.0, 2.0, 3.0, 4.0, 5.0, 5.0],
            "y": [3.0, 5.0, 7.0, 9.0, 1.0, 2.0],
        }
    )
    out = (
        grouped_regression(ray.data.from_pandas(df), "x", "y", ["g"])
        .to_pandas()
        .set_index("g")
    )
    assert abs(out.loc["a", "slope"] - 2.0) < 1e-12
    assert abs(out.loc["a", "intercept"] - 1.0) < 1e-12
    assert abs(out.loc["a", "r2"] - 1.0) < 1e-12
    assert np.isnan(out.loc["b", "slope"]) and np.isnan(out.loc["b", "r"])
    assert out.loc["a", "n"] == 4 and out.loc["b", "n"] == 2


def test_chi_squared_planted(ray_session):
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.profile import (
        chi_squared,
    )

    # perfectly dependent 2x2: chi2 = N, V = 1
    df = pd.DataFrame(
        {"a": ["x", "x", "y", "y"], "b": ["p", "p", "q", "q"]}
    )
    out = chi_squared(ray.data.from_pandas(df), "a", "b").to_pandas()
    assert out["chi2"].iloc[0] == 4.0
    assert out["cramers_v"].iloc[0] == 1.0
    assert out["dof"].iloc[0] == 1
    # independent uniform 2x2: chi2 = 0
    df2 = pd.DataFrame(
        {"a": ["x", "x", "y", "y"], "b": ["p", "q", "p", "q"]}
    )
    out2 = chi_squared(ray.data.from_pandas(df2), "a", "b").to_pandas()
    assert abs(out2["chi2"].iloc[0]) < 1e-12


def test_numeric_profile_nulls_and_partitions(ray_session):
    """Exact counts/distincts/moments with NULLs present, invariant to
    partitioning; an all-null column keeps NaN min/max/avg."""
    import numpy as np
    import pandas as pd
    import ray.data

    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.profile import (
        numeric_profile,
    )

    df = pd.DataFrame(
        {
            "a": [1.0, 2.0, 2.0, None, 5.0, None],
            "b": [10.0, 10.0, 10.0, 10.0, 10.0, 10.0],
            "c": [None] * 6,
        }
    )
    for parts in (1, 5):
        out = (
            numeric_profile(ray.data.from_pandas(df).repartition(parts),
                            ["a", "b", "c"])
            .to_pandas()
            .set_index("col")
        )
        assert (out["n"] == 6).all()
        assert out.loc["a", "n_null"] == 2 and out.loc["a", "n_distinct"] == 3
        assert out.loc["a", "vmin"] == 1.0 and out.loc["a", "vmax"] == 5.0
        assert out.loc["a", "vavg"] == (1 + 2 + 2 + 5) / 4
        assert out.loc["b", "n_distinct"] == 1 and out.loc["b", "vavg"] == 10.0
        assert out.loc["c", "n_null"] == 6 and out.loc["c", "n_distinct"] == 0
        assert np.isnan(out.loc["c", "vavg"])


def test_grouped_means_planted(ray_session):
    """Exact closed forms on tiny groups; non-positive/NULL values are
    excluded from all three means; unit weights = arithmetic mean."""
    import numpy as np
    import pandas as pd
    import ray.data

    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.profile import (
        grouped_means,
    )

    df = pd.DataFrame(
        {
            "g": ["a", "a", "a", "a", "b", "b"],
            "x": [2.0, 8.0, -1.0, None, 4.0, 4.0],
            "w": [1.0, 3.0, 9.0, 9.0, 1.0, 1.0],
        }
    )
    out = (
        grouped_means(ray.data.from_pandas(df).repartition(4), ["g"], "x",
                      weight="w")
        .to_pandas()
        .set_index("g")
    )
    # group a keeps only 2.0 (w=1) and 8.0 (w=3)
    assert out.loc["a", "n"] == 2
    assert out.loc["a", "wavg"] == (2 + 24) / 4
    assert out.loc["a", "geomean"] == pytest.approx(4.0)       # sqrt(16)
    assert out.loc["a", "harmean"] == pytest.approx(2 / (0.5 + 0.125))
    assert out.loc["b", "wavg"] == 4.0 and out.loc["b", "geomean"] == pytest.approx(4.0)
    unw = grouped_means(ray.data.from_pandas(df), ["g"], "x").to_pandas()
    assert unw.set_index("g").loc["a", "wavg"] == 5.0  # plain mean


def test_two_sample_tests_hand_computed(ray_session):
    import pandas as pd
    import ray.data

    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.profile import (
        two_sample_tests,
    )

    df = pd.DataFrame({"v": [1, 2, 2, 3], "g": ["A", "A", "B", "B"]})
    out = two_sample_tests(ray.data.from_pandas(df), "v", "g", "A", "B")
    # ranks: 1 -> 1, 2 -> 2.5 (tie pair), 3 -> 4; R_A = 3.5, U_A = 0.5
    assert out["u_a"].iloc[0] == 0.5
    # KS: F_A = (.5, 1, 1), F_B = (0, .5, 1) -> D = 0.5
    assert out["ks_d"].iloc[0] == 0.5
    # var = 2*2/12 * (5 - (2^3-2)/(4*3)) = 1.5; z = (0.5-2)/sqrt(1.5)
    assert abs(out["z"].iloc[0] - (-1.224745)) < 1e-6
