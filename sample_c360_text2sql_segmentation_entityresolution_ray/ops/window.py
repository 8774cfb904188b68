"""Windowed aggregates — a custom operator class Ray Data lacks.

Two shapes:

- :func:`window` — SQL window functions OVER (PARTITION BY k ORDER BY
  o): row_number / rank / lag / lead / cumulative / rolling aggregates.
  Implemented as ONE partition-hash shuffle: rows are hashed on the
  partition keys into ``partitions`` groups (every window key's rows
  co-locate), and each group computes every requested function with
  vectorized pandas ``groupby`` transforms — no per-row Python, no
  per-key ``map_groups`` (one Python group per KEY would cost ~ms
  each; one per HASH PARTITION is ~64 total).

  Partitioning assumption (documented per the task contract): a single
  window key's rows must fit in one partition's memory — true for
  per-customer / per-user / per-session windows; a pathological key
  holding a large fraction of the table needs range-partitioning on
  (key, order) with boundary stitching, which this operator does not
  do.

- :func:`tumbling_window` — event-time tumbling windows (the
  streaming-window shape): assign each row to
  ``window_start = floor(epoch(ts) / width) * width`` with vectorized
  Arrow/numpy arithmetic, then a partial-aggregated groupby on
  (keys, window_start).  Watermarks/late data are out of scope — the
  batch semantics are exactly the SQL ``GROUP BY time_bucket`` the
  oracle checks.

The reference has no window machinery of its own (Athena executes the
agent's SQL, `lambda/webbackend/agent_processor.py:836-860`); these
give the engine the window surface that generated SQL needs.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from .relational import DEDUP_PARTITIONS

# spec forms accepted by window():
#   ("row_number",)
#   ("rank",)                      -- ties share rank, gaps after
#   ("dense_rank",)
#   ("percent_rank",) / ("cume_dist",)  -- SQL distribution functions
#   ("lag", col, offset, default)  / ("lead", col, offset, default)
#   ("cum_sum", col)
#   ("rolling_sum", col, n) / ("rolling_mean", col, n)
#   ("range_sum", col, ts_col, band_us)  -- time-RANGE frame sum
#       (RANGE BETWEEN band PRECEDING AND CURRENT ROW, peers incl.)
#   ("rolling_min", col, n) / ("rolling_max", col, n)
#   ("ntile", n)                   -- SQL NTILE: first (size % n)
#                                     buckets get the extra row


def _change_mask(g: pd.DataFrame, cols: Sequence[str]) -> np.ndarray:
    """row i True iff any of ``cols`` differs from row i-1 (row 0 True)."""
    m = np.ones(len(g), dtype=bool)
    if len(g) < 2:
        return m
    m[0] = True
    acc = np.zeros(len(g) - 1, dtype=bool)
    for c in cols:
        v = g[c].to_numpy()
        neq = v[1:] != v[:-1]
        # NaN != NaN is True in numpy — treat equal-null as no change
        if v.dtype.kind == "f":
            both_nan = np.isnan(v[1:].astype(float)) & np.isnan(v[:-1].astype(float))
            neq = neq & ~both_nan
        acc |= neq
    m[1:] = acc
    return m


def _apply_spec(gb, g: pd.DataFrame, spec: tuple, rank_arrays: dict):
    kind = spec[0]
    if kind == "row_number":
        return (gb.cumcount() + 1).to_numpy()
    if kind in ("rank", "dense_rank", "percent_rank", "cume_dist"):
        return rank_arrays[kind]
    if kind in ("lag", "lead"):
        _, col, offset, default = spec
        shift = offset if kind == "lag" else -offset
        return gb[col].shift(shift, fill_value=default).to_numpy()
    if kind == "cum_sum":
        return gb[spec[1]].cumsum().to_numpy()
    if kind.startswith("rolling_"):
        agg = kind.split("_", 1)[1]
        _, col, n = spec
        return gb[col].transform(
            lambda s: getattr(s.rolling(n, min_periods=1), agg)()
        ).to_numpy()
    if kind == "range_sum":
        # SQL RANGE BETWEEN <band> PRECEDING AND CURRENT ROW (time
        # frame, peers included): per-run prefix sums + two global
        # searchsorted calls over run-rebased time (the
        # time_band_pairs trick — one binary search can never cross a
        # partition because each run owns a disjoint segment)
        _, col, ts_col, band = spec
        v = g[col].to_numpy(np.float64)
        t = g[ts_col].to_numpy("datetime64[us]").astype(np.int64)
        run = gb.ngroup().to_numpy()
        n = len(g)
        run_start = np.concatenate([[0], np.nonzero(np.diff(run))[0] + 1])
        t_rel = t - t[run_start][run]
        run_last = np.concatenate([run_start[1:], [n]]) - 1
        span = t_rel[run_last]
        base = np.concatenate(
            [[0], np.cumsum(span + np.int64(band) + 1)[:-1]]
        )
        s = base[run] + t_rel
        # range_sum is only defined over an ASCENDING ts order_by: a
        # descending key (or an int64 wrap of the run-rebased cumsum at
        # extreme run-count × time-span) would silently mis-frame the
        # searchsorted windows below — validate instead.
        if n > 1 and not np.all(np.diff(s) >= 0):
            raise ValueError(
                f"range_sum requires the '{ts_col}' order_by key to be "
                "ascending within each partition (and the rebased time "
                "axis to fit int64)"
            )
        P = np.concatenate([[0.0], np.cumsum(v)])
        # prefix sums restart per run implicitly: lo can never cross
        # into the previous run (its segment ends > band earlier)
        lo = np.searchsorted(s, s - np.int64(band), side="left")
        hi = np.searchsorted(s, s, side="right")
        return P[hi] - P[lo]
    if kind == "ntile":
        n = spec[1]
        i = gb.cumcount().to_numpy()
        size = gb[g.columns[0]].transform("size").to_numpy()
        q, r = size // n, size % n
        cut = r * (q + 1)  # rows before cut land in the fat buckets
        return np.where(
            i < cut,
            i // np.maximum(q + 1, 1) + 1,
            r + (i - cut) // np.maximum(q, 1) + 1,
        ).astype(np.int64)
    if kind == "part_count_star":  # count(*) OVER (PARTITION BY …)
        return gb[g.columns[0]].transform("size").to_numpy()
    if kind.startswith("part_"):
        # full-partition aggregate (frame = whole partition): the SQL
        # "pct of total" idiom — order-independent, so these are the
        # only specs valid with an empty ORDER BY
        agg = {"part_sum": "sum", "part_avg": "mean", "part_mean": "mean",
               "part_min": "min", "part_max": "max", "part_count": "count"}[kind]
        return gb[spec[1]].transform(agg).to_numpy()
    raise ValueError(f"unknown window spec {spec!r}")


def _rank_arrays(
    g: pd.DataFrame, partition_by: Sequence[str], ocols: Sequence[str]
) -> dict:
    """rank / dense_rank over the full order tuple, vectorized across
    the whole (sorted) hash partition: a tie-run starts where any order
    column changes; rank = run start's offset inside its group + 1."""
    n = len(g)
    idx = np.arange(n)
    grp_new = _change_mask(g, partition_by)
    run_new = grp_new | _change_mask(g, ocols)
    grp_start = np.maximum.accumulate(np.where(grp_new, idx, 0))
    run_start = np.maximum.accumulate(np.where(run_new, idx, 0))
    rank = run_start - grp_start + 1
    # dense rank: count of run starts inside the group so far
    runs_cum = np.cumsum(run_new)
    dense = runs_cum - runs_cum[grp_start] + 1
    # group/run END indices (runs never span groups — run_new ⊇ grp_new):
    # each row's run end = the index before the NEXT run start
    starts = idx[run_new]
    run_id = runs_cum - 1
    run_end = (np.append(starts[1:], n) - 1)[run_id]
    gstarts = idx[grp_new]
    grp_id = np.cumsum(grp_new) - 1
    grp_end = (np.append(gstarts[1:], n) - 1)[grp_id]
    size = (grp_end - grp_start + 1).astype(np.float64)
    # SQL percent_rank = (rank-1)/(size-1), 0.0 for a 1-row group;
    # cume_dist = rows with order-key <= current (tie-run end) / size
    pr = np.divide(
        rank - 1.0, size - 1.0, out=np.zeros(n, np.float64), where=size > 1.0
    )
    cd = (run_end - grp_start + 1) / size
    return {"rank": rank, "dense_rank": dense,
            "percent_rank": pr, "cume_dist": cd}


def window(
    ds: "ray.data.Dataset",
    partition_by: Sequence[str],
    order_by: Sequence[tuple[str, bool]],
    specs: dict[str, tuple],
    partitions: int = DEDUP_PARTITIONS,
) -> "ray.data.Dataset":
    """Append one output column per ``specs`` entry, each computed over
    PARTITION BY ``partition_by`` ORDER BY ``order_by`` ((col, desc)
    pairs).  For order-dependent specs (lag/lead/row_number/cum_sum/
    rolling) include a unique tiebreak column in ``order_by`` or ties
    make the result nondeterministic — exactly as in SQL."""
    partition_by = list(partition_by)
    # empty partition_by = a GLOBAL window (OVER (ORDER BY …)): SQL's
    # semantics impose ONE total order, so the data collapses to one
    # partition by definition — inherently serial, fine for ranked
    # reports, wrong for corpus-sized inputs (documented contract)
    global_window = not partition_by
    if global_window:
        partition_by = ["_gwkey"]
    ocols = [c for c, _ in order_by]
    asc = [not d for _, d in order_by]

    def _part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if global_window:
            df["_gwkey"] = np.int8(0)
            df["_wpart"] = np.int32(0)
            return df
        key = df[partition_by[0]].astype(str)
        for c in partition_by[1:]:
            key = key + "\x1f" + df[c].astype(str)
        df["_wpart"] = (
            pd.util.hash_array(key.to_numpy(object)) % partitions
        ).astype("int32")
        return df

    def _compute(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            partition_by + ocols,
            ascending=[True] * len(partition_by) + asc,
            kind="mergesort",
        ).reset_index(drop=True)
        gb = g.groupby(partition_by, sort=False)
        need_rank = any(
            s[0] in ("rank", "dense_rank", "percent_rank", "cume_dist")
            for s in specs.values()
        )
        ra = _rank_arrays(g, partition_by, ocols) if need_rank else {}
        for name, spec in specs.items():
            g[name] = _apply_spec(gb, g, spec, ra)
        drop = ["_wpart", "_gwkey"] if global_window else ["_wpart"]
        return g.drop(columns=drop)

    return (
        ds.map_batches(_part, batch_format="pandas")
        .groupby("_wpart")
        .map_groups(_compute, batch_format="pandas")
    )


_AGGS = {"count": Count, "sum": Sum, "mean": Mean, "min": Min, "max": Max}


def tumbling_window(
    ds: "ray.data.Dataset",
    ts_col: str,
    width_s: int,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str | None]],
) -> "ray.data.Dataset":
    """Tumbling event-time windows: one output row per (keys...,
    window_start) with the requested aggregates.  ``aggs`` maps output
    name → (fn, col) with fn in count/sum/mean/min/max (col=None for
    count).  ``window_start`` is epoch seconds (int64) — callers
    format it if they need a timestamp.  Pre-aggregation happens in
    Ray's groupby partial-agg; the shuffle only moves one row per
    (key, window) per block."""

    def _bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df[list(keys)].copy()
        epoch = df[ts_col].astype("datetime64[ns]").astype("int64") // 1_000_000_000
        out["window_start"] = (epoch // width_s) * width_s
        for name, (fn, col) in aggs.items():
            if col is not None:
                out[name] = df[col]
        return out

    agg_objs = []
    for name, (fn, col) in aggs.items():
        if fn == "count":
            agg_objs.append(Count(alias_name=name))
        else:
            agg_objs.append(_AGGS[fn](name, alias_name=name))
    return (
        ds.map_batches(_bucket, batch_format="pandas")
        .groupby(list(keys) + ["window_start"])
        .aggregate(*agg_objs)
    )


def hopping_window(
    ds: "ray.data.Dataset",
    ts_col: str,
    width_s: int,
    hop_s: int,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str | None]],
) -> "ray.data.Dataset":
    """Hopping (sliding) event-time windows: width ``width_s``, advance
    ``hop_s`` — every event lands in exactly ``width_s // hop_s``
    overlapping windows (``width_s`` must be a multiple of ``hop_s``).
    One output row per (keys..., window_start); same partial-agg
    contract as :func:`tumbling_window`.

    SCALE: the replication factor is width/hop (a small constant chosen
    by the caller), applied per batch BEFORE Ray's groupby partial
    aggregation — the shuffle still moves one row per (key, window)
    per block, never per replicated event."""
    if width_s % hop_s:
        raise ValueError("width_s must be a multiple of hop_s")
    m = width_s // hop_s

    def _bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = df[list(keys)].copy()
        for name, (fn, col) in aggs.items():
            if col is not None:
                out[name] = df[col]
        epoch = df[ts_col].astype("datetime64[ns]").astype("int64") // 1_000_000_000
        out = out.loc[out.index.repeat(m)].reset_index(drop=True)
        j = np.tile(np.arange(m, dtype=np.int64), len(df))
        e = np.repeat(epoch.to_numpy(), m)
        out["window_start"] = (e // hop_s - j) * hop_s
        return out

    agg_objs = []
    for name, (fn, col) in aggs.items():
        if fn == "count":
            agg_objs.append(Count(alias_name=name))
        else:
            agg_objs.append(_AGGS[fn](name, alias_name=name))
    return (
        ds.map_batches(_bucket, batch_format="pandas")
        .groupby(list(keys) + ["window_start"])
        .aggregate(*agg_objs)
    )


__all__ = ["window", "tumbling_window", "hopping_window"]
