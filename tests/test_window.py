"""ops/window.py — specs not exercised by the oracle queries
(lead, rolling_min/max) plus dense-rank tie handling on a hand frame.
customer_order_seq / lineitem_qty_ranks / events_hourly_windows in
test_queries_oracle.py cover the rest against DuckDB."""

import numpy as np
import pandas as pd

import ray.data

from sample_c360_text2sql_segmentation_entityresolution_ray.ops.window import (
    tumbling_window,
    window,
)


def _frame():
    return pd.DataFrame(
        {
            "k": ["a", "a", "a", "a", "b", "b"],
            "o": [1, 2, 3, 4, 1, 2],
            "v": [10.0, 20.0, 20.0, 5.0, 7.0, 7.0],
        }
    )


def test_lead_rolling_and_ranks(ray_session):
    ds = ray.data.from_pandas(_frame()).repartition(3)
    out = (
        window(
            ds,
            ["k"],
            [("o", False)],
            {
                "nxt": ("lead", "v", 1, -1.0),
                "rmin": ("rolling_min", "v", 2),
                "rmax": ("rolling_max", "v", 2),
            },
        )
        .to_pandas()
        .sort_values(["k", "o"])
        .reset_index(drop=True)
    )
    assert out["nxt"].tolist() == [20.0, 20.0, 5.0, -1.0, 7.0, -1.0]
    assert out["rmin"].tolist() == [10.0, 10.0, 20.0, 5.0, 7.0, 7.0]
    assert out["rmax"].tolist() == [10.0, 20.0, 20.0, 20.0, 7.0, 7.0]


def test_rank_vs_dense_rank_ties(ray_session):
    ds = ray.data.from_pandas(_frame()).repartition(2)
    out = (
        window(
            ds,
            ["k"],
            [("v", True)],  # desc: a → 20,20,10,5 ; b → 7,7
            {"r": ("rank",), "d": ("dense_rank",)},
        )
        .to_pandas()
        .sort_values(["k", "v", "o"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    a = out[out["k"] == "a"]
    assert a["r"].tolist() == [1, 1, 3, 4]
    assert a["d"].tolist() == [1, 1, 2, 3]
    b = out[out["k"] == "b"]
    assert b["r"].tolist() == [1, 1] and b["d"].tolist() == [1, 1]


def test_tumbling_window_buckets(ray_session):
    df = pd.DataFrame(
        {
            "u": [1, 1, 1, 2],
            "ts": pd.to_datetime(
                ["2024-01-01 00:10:00", "2024-01-01 00:59:59",
                 "2024-01-01 01:00:00", "2024-01-01 00:30:00"]
            ),
            "v": [1.0, 2.0, 4.0, 8.0],
        }
    )
    out = (
        tumbling_window(
            ray.data.from_pandas(df).repartition(2),
            "ts", 3600, ["u"],
            {"n": ("count", None), "s": ("sum", "v")},
        )
        .to_pandas()
        .sort_values(["u", "window_start"])
        .reset_index(drop=True)
    )
    base = int(pd.Timestamp("2024-01-01 00:00:00").timestamp())
    assert out.to_dict("records") == [
        {"u": 1, "window_start": base, "n": 2, "s": 3.0},
        {"u": 1, "window_start": base + 3600, "n": 1, "s": 4.0},
        {"u": 2, "window_start": base, "n": 1, "s": 8.0},
    ]


def test_hopping_window_replicates_events_across_overlaps():
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.window import (
        hopping_window,
    )

    df = pd.DataFrame(
        {
            "u": [1, 1],
            "ts": pd.to_datetime(["2024-01-01 00:30:00", "2024-01-01 01:30:00"]),
            "v": [1.0, 2.0],
        }
    )
    out = (
        hopping_window(
            ray.data.from_pandas(df).repartition(2),
            "ts", 7200, 3600, ["u"],
            {"n": ("count", None), "s": ("sum", "v")},
        )
        .to_pandas()
        .sort_values(["u", "window_start"])
        .reset_index(drop=True)
    )
    base = int(pd.Timestamp("2024-01-01 00:00:00").timestamp())
    # event@00:30 -> windows starting 23:00, 00:00; event@01:30 -> 00:00, 01:00
    assert out.to_dict("records") == [
        {"u": 1, "window_start": base - 3600, "n": 1, "s": 1.0},
        {"u": 1, "window_start": base, "n": 2, "s": 3.0},
        {"u": 1, "window_start": base + 3600, "n": 1, "s": 2.0},
    ]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        hopping_window(
            ray.data.from_pandas(df), "ts", 7000, 3600, ["u"], {"n": ("count", None)}
        )


def test_ntile_uneven_buckets(ray_session):
    # 7 rows, ntile(3): bucket sizes 3,2,2 (first size%n buckets fat)
    df = pd.DataFrame({"k": ["a"] * 7, "v": np.arange(7), "i": np.arange(7)})
    out = (
        window(
            ray.data.from_pandas(df).repartition(3),
            partition_by=["k"],
            order_by=[("v", False), ("i", False)],
            specs={"t": ("ntile", 3)},
        )
        .to_pandas().sort_values("v")
    )
    assert out["t"].tolist() == [1, 1, 1, 2, 2, 3, 3]
    # more buckets than rows: each row its own bucket 1..n_rows
    df2 = pd.DataFrame({"k": ["a"] * 2, "v": [5, 1], "i": [0, 1]})
    out2 = (
        window(
            ray.data.from_pandas(df2),
            partition_by=["k"],
            order_by=[("v", False), ("i", False)],
            specs={"t": ("ntile", 4)},
        )
        .to_pandas().sort_values("v")
    )
    assert out2["t"].tolist() == [1, 2]


def test_percent_rank_cume_dist_planted(ray_session):
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.window import window

    df = pd.DataFrame(
        {"g": ["a"] * 4 + ["b"], "v": [10.0, 20.0, 20.0, 30.0, 7.0]}
    )
    out = (
        window(
            ray.data.from_pandas(df),
            ["g"],
            [("v", False)],
            {"pr": ("percent_rank",), "cd": ("cume_dist",)},
        )
        .to_pandas()
        .sort_values(["g", "v"])
        .reset_index(drop=True)
    )
    # a: ranks 1,2,2,4 over size 4 -> pr (r-1)/3; cd = run-end/size
    assert out["pr"].tolist() == [0.0, 1 / 3, 1 / 3, 1.0, 0.0]
    assert out["cd"].tolist() == [0.25, 0.75, 0.75, 1.0, 1.0]


def test_range_sum_time_frame(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.window import window

    # user A: events at 0, 30, 90 min (values 1, 2, 4); 1h trailing
    # sums: 1, 3, 6 (90 includes 30 but not 0).  user B: two events at
    # the SAME timestamp — RANGE includes peers, both rows get 3+5=8.
    base = pd.Timestamp("2025-01-01")
    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5],
            "user_id": ["a", "a", "a", "b", "b"],
            "ts": [
                base,
                base + pd.Timedelta(minutes=30),
                base + pd.Timedelta(minutes=90),
                base + pd.Timedelta(minutes=10),
                base + pd.Timedelta(minutes=10),
            ],
            "value": [1.0, 2.0, 4.0, 3.0, 5.0],
        }
    )
    out = (
        window(
            ray.data.from_pandas(df),
            partition_by=["user_id"],
            order_by=[("ts", False), ("event_id", False)],
            specs={"r": ("range_sum", "value", "ts", 3_600_000_000)},
        )
        .to_pandas()
        .sort_values("event_id")
    )
    assert np.allclose(out["r"].to_numpy(), [1.0, 3.0, 6.0, 8.0, 8.0])
