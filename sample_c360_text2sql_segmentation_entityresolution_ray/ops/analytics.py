"""Behavioral analytics over event streams: funnel conversion and
cohort retention — the two queries every "customer 360" warehouse
serves daily (the reference's text2sql workload is exactly this class
of question over the purchase/interaction tables, `README.md:13-15`).

Scale shape shared by both: the raw event stream only ever crosses a
combiner shuffle as (user, partial) rows; the per-user state table
(funnel frontier / cohort date) is O(#users) slim and attaches back
via the measured broadcast-vs-hash-join switch every other attach in
this repo uses.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .relational import SEMI_BROADCAST_LIMIT, grouped_aggregate, hash_join

# frontier/cohort tables above this many users switch from a broadcast
# pandas merge to a hash-partition join (same break-even argument as
# SEMI_BROADCAST_LIMIT: ~16 B/user re-shipped per worker vs one
# exchange of the slim state table)
USER_STATE_BROADCAST_LIMIT = SEMI_BROADCAST_LIMIT


def _attach_state(
    events: "ray.data.Dataset",
    state: "ray.data.Dataset",
    user_col: str,
    broadcast_limit: int,
) -> "ray.data.Dataset":
    """events ⋈ state on user — broadcast the O(#users) state table
    when it measures small, else one hash exchange.  ``state`` must be
    materialized (count is then metadata-only)."""
    n = state.count()
    if n <= broadcast_limit:
        sdf = state.to_pandas()
        ref = ray.put(sdf)

        def _probe(batch: pd.DataFrame) -> pd.DataFrame:
            return batch.merge(ray.get(ref), on=user_col, how="inner")

        return events.map_batches(_probe, batch_format="pandas")
    # partitions sized to the state table: a partition with zero shards
    # from one side reaches Acero schema-less and crashes the finalizer
    # (Ray 2.49, same guard as stages/clustering.py)
    return hash_join(
        events, state, on=(user_col,),
        num_partitions=max(2, min(64, n // 1000 + 2)),
    )


def funnel_counts(
    events: "ray.data.Dataset",
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    broadcast_limit: int = USER_STATE_BROADCAST_LIMIT,
) -> "ray.data.Dataset":
    """Ordered funnel: how many users performed ``steps[0]``, then
    ``steps[1]`` STRICTLY AFTER it, then ``steps[2]`` after that, …

    Plan: iterate steps keeping a *frontier* (user, earliest time the
    user completed the prefix).  Each step filters the stream to one
    event type (predicate pushed into an Arrow scan filter), attaches
    the frontier, keeps events after the user's frontier time, and
    grouped-mins a new frontier — one combiner shuffle of (user,
    partial-min) rows per step, never raw events.

    Output: ``(step, event_type, n_users)`` — int64/str/int64, one row
    per step, in funnel order.
    """
    frontier = None
    out_rows = []
    for i, step in enumerate(steps):

        def _only(t: pa.Table, _s=step) -> pa.Table:
            return t.filter(pc.equal(t[type_col], _s))

        ev = events.select_columns(
            [user_col, ts_col, type_col]
        ).map_batches(_only, batch_format="pyarrow")
        if frontier is None:
            qualified = ev
        else:

            def _after(df: pd.DataFrame) -> pd.DataFrame:
                return df[df[ts_col] > df["_t"]]

            qualified = _attach_state(
                ev, frontier, user_col, broadcast_limit
            ).map_batches(_after, batch_format="pandas")

        def _slim(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {user_col: df[user_col], "_t": df[ts_col]}
            )

        frontier = grouped_aggregate(
            qualified.map_batches(_slim, batch_format="pandas"),
            keys=[user_col],
            specs=[("min", "_t", "_t")],
        ).materialize()
        out_rows.append(
            {"step": np.int64(i + 1), "event_type": step,
             "n_users": np.int64(frontier.count())}
        )
    return ray.data.from_pandas(pd.DataFrame(out_rows))


def cohort_retention(
    events: "ray.data.Dataset",
    user_col: str = "user_id",
    ts_col: str = "ts",
    broadcast_limit: int = USER_STATE_BROADCAST_LIMIT,
) -> "ray.data.Dataset":
    """Daily cohort retention matrix: cohort = a user's first-event
    date, ``day_offset`` = days since it; cell = distinct users of that
    cohort active at that offset.

    Two combiner shuffles ((user, min-date) then the distinct
    (cohort, offset, user) dedup) plus the measured state attach —
    event payloads never cross a shuffle.  Output:
    ``(cohort_date 'YYYY-MM-DD', day_offset int64, n_users int64)``
    sorted by (cohort_date, day_offset).
    """
    from .relational import dedupe_by_key

    def _dates(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                user_col: df[user_col],
                "_d": df[ts_col].dt.strftime("%Y-%m-%d"),
            }
        )

    days = events.select_columns([user_col, ts_col]).map_batches(
        _dates, batch_format="pandas"
    )
    # min over 'YYYY-MM-DD' strings == min date (lexicographic order)
    first = grouped_aggregate(
        days, keys=[user_col], specs=[("min", "_d", "cohort_date")]
    ).materialize()

    def _offset(df: pd.DataFrame) -> pd.DataFrame:
        off = (
            pd.to_datetime(df["_d"]) - pd.to_datetime(df["cohort_date"])
        ).dt.days.astype(np.int64)
        return pd.DataFrame(
            {
                user_col: df[user_col],
                "cohort_date": df["cohort_date"],
                "day_offset": off,
            }
        )

    cells = _attach_state(days, first, user_col, broadcast_limit).map_batches(
        _offset, batch_format="pandas"
    )
    distinct_cells = dedupe_by_key(
        cells, [user_col, "cohort_date", "day_offset"]
    )
    return grouped_aggregate(
        distinct_cells,
        keys=["cohort_date", "day_offset"],
        specs=[("count_star", None, "n_users")],
    ).sort(["cohort_date", "day_offset"])


__all__ = ["funnel_counts", "cohort_retention"]


def fill_date_gaps(
    ds: "ray.data.Dataset",
    key_col: str,
    date_col: str,
    value_cols: Sequence[str],
    fill_value=0,
    partitions: int = 64,
) -> "ray.data.Dataset":
    """Calendar gap-fill for a per-(key, day) aggregate table: emit one
    row for EVERY day between each key's first and last observed date
    ('YYYY-MM-DD' strings, the repo's date convention), with
    ``value_cols`` set to ``fill_value`` on the inserted days — the
    dense series a forecasting/feature job needs where a groupby only
    yields observed days.

    One key-hash exchange of the slim (key, day, values) rows; the
    per-partition fill is a per-key ``date_range`` reindex (cost
    O(span), which IS the output size).  Keys never straddle
    partitions, so the min/max span is exact."""
    value_cols = list(value_cols)
    cols = [key_col, date_col] + value_cols

    def _part(df: pd.DataFrame) -> pd.DataFrame:
        df = df[cols].copy()
        df["_part"] = (
            pd.util.hash_pandas_object(df[key_col], index=False).to_numpy()
            % partitions
        ).astype("int32")
        return df

    def _fill(g: pd.DataFrame) -> pd.DataFrame:
        pieces = []
        for key, sub in g.groupby(key_col, sort=False):
            idx = pd.to_datetime(sub[date_col])
            if idx.duplicated().any():
                raise ValueError(
                    f"fill_date_gaps: duplicate days for key {key!r} — "
                    "aggregate to one row per (key, day) first"
                )
            spine = pd.date_range(idx.min(), idx.max(), freq="D")
            filled = (
                sub.set_index(idx)[value_cols]
                .reindex(spine, fill_value=fill_value)
            )
            filled.insert(0, key_col, key)
            filled.insert(1, date_col, spine.strftime("%Y-%m-%d"))
            pieces.append(filled.reset_index(drop=True))
        return pd.concat(pieces, ignore_index=True)

    return (
        ds.map_batches(_part, batch_format="pandas")
        .groupby("_part")
        .map_groups(_fill, batch_format="pandas")
    )


__all__.append("fill_date_gaps")


def last_touch_attribution(
    events: "ray.data.Dataset",
    touch_type: str,
    conversion_type: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
) -> "ray.data.Dataset":
    """Last-touch attribution: every ``conversion_type`` event paired
    with the user's most recent ``touch_type`` event at-or-before it
    (by the total order (ts, event_id)), NULL when the conversion had
    no preceding touch.  Output: ``(event_id, user_id, value,
    touch_event_id)`` — one row per conversion.

    A per-user AS-OF self-join on the event stream: the stream is
    pre-filtered to the two event types (predicate pushed into an
    Arrow scan filter — at web scale touches+conversions are a sliver
    of the stream), then ONE group-by-user exchange sorts each user's
    sliver and forward-fills the touch id.  No state table, no second
    pass."""
    import pyarrow.compute as pc

    def _only(t, _a=touch_type, _b=conversion_type):
        return t.filter(
            pc.or_(pc.equal(t[type_col], _a), pc.equal(t[type_col], _b))
        )

    slim = events.select_columns(
        [user_col, ts_col, type_col, id_col, value_col]
    ).map_batches(_only, batch_format="pyarrow")

    def _attr(g: pd.DataFrame) -> "pa.Table":
        g = g.sort_values([ts_col, id_col], kind="mergesort")
        ids = g[id_col].to_numpy()
        is_touch = g[type_col].to_numpy() == touch_type
        # forward-fill the last touch id down the (ts, id) order
        idx = np.where(is_touch, np.arange(len(g)), -1)
        idx = np.maximum.accumulate(idx)
        conv = g[type_col].to_numpy() == conversion_type
        touch_idx = idx[conv]
        return pa.table(
            {
                id_col: pa.array(ids[conv], type=pa.int64()),
                user_col: pa.array(g[user_col].to_numpy()[conv]),
                value_col: pa.array(g[value_col].to_numpy()[conv]),
                "touch_event_id": pa.array(
                    [None if i < 0 else int(ids[i]) for i in touch_idx],
                    type=pa.int64(),
                ),
            }
        )

    return slim.groupby(user_col).map_groups(_attr, batch_format="pandas")


__all__.append("last_touch_attribution")


def rfm_segments(
    orders: "ray.data.Dataset",
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    q: int = 5,
) -> "ray.data.Dataset":
    """RFM (recency / frequency / monetary) customer segmentation — the
    marketing-segmentation classic the reference's Personalize segments
    approximate with a learned model (SURVEY §2 ST2): per customer,
    recency = max order date, frequency = order count, monetary =
    rounded spend sum; each metric quantile-scored 1..q (1 = best) by
    SQL NTILE over (metric DESC, custkey) and combined into
    ``rfm_code`` plus a named coarse segment.

    Plan: facts cross ONE combiner exchange as per-customer partials
    (`grouped_aggregate`); the q-tiling then runs over the O(#customers)
    aggregate table — three `window` passes, one per metric order.
    Monetary is rounded (2dp) BEFORE ranking so the float-sum last bits
    can't flip tie order vs an oracle.  At a 10^9-customer scale,
    replace the single-group window with the range-bucketed global
    ranking `linkage.snm_pairs` uses (sample cuts → bucket counts →
    per-bucket offset); the aggregate table here is dimension-sized, so
    the one-group window is the measured right pick."""
    from .window import window

    def _sql_round2(x: np.ndarray) -> np.ndarray:
        return np.trunc(x * 100.0 + np.copysign(0.5, x)) / 100.0

    agg = grouped_aggregate(
        orders.select_columns([cust_col, date_col, amount_col]),
        [cust_col],
        [
            ("max", date_col, "recency"),
            ("count_star", None, "frequency"),
            ("sum", amount_col, "monetary"),
        ],
    )

    def _round_m(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["monetary"] = _sql_round2(df["monetary"].to_numpy())
        df["_g"] = np.int8(0)
        return df

    agg = agg.map_batches(_round_m, batch_format="pandas")
    agg = window(
        agg, ["_g"], [("recency", True), (cust_col, False)],
        {"r_score": ("ntile", q)},
    )
    agg = window(
        agg, ["_g"], [("frequency", True), (cust_col, False)],
        {"f_score": ("ntile", q)},
    )
    agg = window(
        agg, ["_g"], [("monetary", True), (cust_col, False)],
        {"m_score": ("ntile", q)},
    )

    def _seg(df: pd.DataFrame) -> pd.DataFrame:
        r = df["r_score"].to_numpy()
        f = df["f_score"].to_numpy()
        m = df["m_score"].to_numpy()
        seg = np.select(
            [
                (r <= 2) & (f <= 2),
                (r >= 4) & (f <= 2),
                f <= 2,
                r <= 2,
            ],
            ["champion", "at_risk", "loyal", "recent"],
            default="other",
        )
        return pd.DataFrame(
            {
                cust_col: df[cust_col],
                "recency": df["recency"],
                "frequency": df["frequency"],
                "monetary": df["monetary"],
                "r_score": r,
                "f_score": f,
                "m_score": m,
                "rfm_code": r * 100 + f * 10 + m,
                "segment": seg,
            }
        )

    return agg.map_batches(_seg, batch_format="pandas")


__all__.append("rfm_segments")


def grouped_ewma(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.3,
    out_col: str = "ewma",
) -> "ray.data.Dataset":
    """Per-group exponentially-weighted moving average in ``order_col``
    order: ``s₁ = x₁; sᵢ = α·xᵢ + (1−α)·sᵢ₋₁`` (pandas
    ``ewm(adjust=False)`` semantics) — the streaming smoother for
    per-entity daily activity / anomaly baselines.

    ONE hash exchange on ``keys``; inside each group the recurrence is
    evaluated LITERALLY as ``α·xᵢ + (1−α)·sᵢ₋₁`` in IEEE doubles —
    bit-reproducible against any engine evaluating the same expression
    (a SQL recursive CTE lands on identical doubles; pandas' C ewm
    kernel uses a weighted-average form whose last-ulp skew straddles
    rounding boundaries at scale).  The recurrence is inherently
    sequential per group, so group size — not corpus size — bounds the
    serial loop; time-series groups (entity × day) are bounded by the
    calendar.  Appends ``out_col`` to the group's rows."""

    def _fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        vals = g[value_col].to_numpy(np.float64)
        a = float(alpha)
        b = 1.0 - a
        s = np.empty(len(vals))
        if len(vals):
            acc = float(vals[0])
            s[0] = acc
            for i in range(1, len(vals)):
                acc = a * float(vals[i]) + b * acc
                s[i] = acc
        g[out_col] = s
        return g

    return ds.groupby(list(keys)).map_groups(_fn, batch_format="pandas")


__all__.append("grouped_ewma")


def skyline2d(
    ds: "ray.data.Dataset",
    x_col: str,
    y_col: str,
) -> "ray.data.Dataset":
    """2-D skyline (Pareto frontier, both dimensions MAXIMIZED): rows
    no other row dominates, where q dominates p iff ``x_q ≥ x_p AND
    y_q ≥ y_p`` strict in at least one.  Rows with identical (x, y)
    never dominate each other, so duplicates of a frontier point ALL
    survive — the NOT-EXISTS-dominator SQL semantics exactly.

    Distributed shape (Börzsönyi 2001's partition-then-merge made
    streaming): every block reduces to its LOCAL skyline with one
    vectorized sort + running-max sweep (a point dominated within a
    block is dominated globally — safe to drop early), and only those
    survivors — bounded by the per-block frontier size, typically
    O(log block) for independent dims, never the block — cross into
    the single final merge pass running the same kernel.  Input rows
    never shuffle; there is no all-pairs comparison anywhere."""

    def _local(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        x = df[x_col].to_numpy()
        y = df[y_col].to_numpy()
        pairs = pd.DataFrame({"x": x, "y": y}).drop_duplicates()
        # per distinct x keep only max y (lower y at same x is dominated)
        best = pairs.groupby("x", sort=False)["y"].max().reset_index()
        srt = best.sort_values(["x"], ascending=False, kind="mergesort")
        yy = srt["y"].to_numpy()
        # scanning x strictly decreasing: survivor iff y strictly above
        # every y already seen (equal y at larger x dominates)
        run = np.maximum.accumulate(
            np.concatenate([[-np.inf], yy[:-1]])
        )
        keep_pairs = srt[yy > run]
        mask = pd.MultiIndex.from_arrays([x, y]).isin(
            pd.MultiIndex.from_arrays([keep_pairs["x"], keep_pairs["y"]])
        )
        return df[mask]

    candidates = ds.map_batches(_local, batch_format="pandas")
    # batch_size=None pinned explicitly: the global merge is only
    # correct over the WHOLE single block — a fixed-size default batch
    # split would let dominated rows survive (repo convention for
    # whole-block global passes, see ops/sketch.py, ops/text.py)
    return candidates.repartition(1).map_batches(
        _local, batch_format="pandas", batch_size=None
    )


__all__.append("skyline2d")
