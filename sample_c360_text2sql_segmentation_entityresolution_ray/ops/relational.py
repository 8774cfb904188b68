"""Relational operator library — thin Ray-Data-first wrappers.

The reference exposes its relational surface through Athena SQL (fixed
strings in Lambdas plus the text2sql agent's generated queries — SURVEY
§2.4-2.8).  Each helper here rebuilds one of those operators natively on
``ray.data.Dataset`` with an explicit scale posture:

- equi-joins: hash-partitioned ``Dataset.join`` (shuffle both sides) or
  a broadcast build side shipped once via ``ray.put`` and probed inside
  ``map_batches`` (no shuffle) — mirror of the reference's
  purchase↔integrated_customer join
  (`lambda/create_personalize_dataset_import_job/index.py:35-57`).
- anti/semi joins: broadcast key-set membership filters
  (`lambda/create_personalize_segment/index.py:44-77,141`; README.md:14).
- union with key prefixing: `CONCAT('sub_', item_id)` analog
  (`lambda/create_personalize_dataset_import_job/index.py:48-56`).
- distinct / grouped count + HAVING / grouped top-k / per-group top-N /
  sort+limit: `lib/data-storage.ts:210` (DISTINCT guidance), README.md:13
  (NL workload), `lambda/create_personalize_segment/index.py:14,197`
  (top-N users per item).

All per-batch callables are vectorized (pyarrow.compute / pandas); no
Python row loops.  Broadcast paths require the small side to fit in one
worker heap — every helper documents which side that is and falls back
to the shuffle join above the documented limit.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import AggregateFn, Count, Max, Mean, Min, Sum

DEFAULT_JOIN_PARTITIONS = 16  # Ray's join spawns this many aggregator
                              # ACTORS per join — fresh processes every
                              # run.  16 measured fastest at sandbox
                              # scale (32 actors: 13.3 s, 16: 4.3 s,
                              # 8: 6.9 s for the same 150k-row join);
                              # callers with genuinely huge sides pass
                              # num_partitions explicitly

# Broadcast limits: rows, not bytes — callers with wide build sides
# should select_columns first (documented per helper).
BROADCAST_ROW_LIMIT = 5_000_000


# ---------------------------------------------------------------------------
# joins
# ---------------------------------------------------------------------------

def join_partitions_for_cluster(requested: int | None = None) -> int:
    """Join aggregator-partition count sized to the cluster: Ray's hash
    join spawns ``num_partitions`` aggregator ACTORS — more of them than
    schedulable CPUs deadlocks a small cluster and oversubscribes a big
    one.  Cap at 2×CPUs (and the requested value, if any)."""
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    cap = max(2, 2 * ncpu)
    return min(requested, cap) if requested else min(DEFAULT_JOIN_PARTITIONS, cap)


# Fractional CPU per join aggregator: keeps the actor pool from
# starving the map stages on the same nodes.
JOIN_AGGREGATOR_CPUS = 0.25


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: Sequence[str],
    right_on: Sequence[str] | None = None,
    how: str = "inner",
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Hash-partitioned equi-join (shuffles both sides on the key).

    The scale path for fact⋈fact joins; for fact⋈dim use
    :func:`broadcast_join`.
    """
    return left.join(
        right,
        join_type=how,
        num_partitions=join_partitions_for_cluster(num_partitions),
        on=tuple(on),
        right_on=tuple(right_on) if right_on else None,
        aggregator_ray_remote_args={"num_cpus": JOIN_AGGREGATOR_CPUS},
    )


def broadcast_join(
    large: "ray.data.Dataset",
    small: "ray.data.Dataset",
    on: Sequence[str],
    right_on: Sequence[str] | None = None,
    how: str = "inner",
) -> "ray.data.Dataset":
    """Broadcast-small-side equi-join: the build side is collected to a
    single pandas DataFrame, put in the object store ONCE, and probed
    per batch inside ``map_batches`` — zero shuffle of the large side.

    Reference analog: the purchase↔integrated_customer join, where the
    cluster map is tiny relative to the fact stream (SURVEY §2.4 J1).
    The build side must fit in a worker heap (``BROADCAST_ROW_LIMIT``
    rows); select only needed columns before calling.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"broadcast_join supports inner/left_outer, got {how}")
    right_on = list(right_on) if right_on else list(on)
    small_df = small.to_pandas()
    if len(small_df) > BROADCAST_ROW_LIMIT:
        raise ValueError(
            f"build side has {len(small_df)} rows > {BROADCAST_ROW_LIMIT}; "
            "use hash_join for large build sides"
        )
    ref = ray.put(small_df)
    on = list(on)
    pd_how = {"inner": "inner", "left_outer": "left"}[how]

    def _probe(batch: pd.DataFrame) -> pd.DataFrame:
        # task stage: the build side is plasma-resident, ray.get is
        # ~free per task — an actor pool would respawn processes per run
        small = ray.get(ref)
        return batch.merge(small, how=pd_how, left_on=on, right_on=right_on)

    return large.map_batches(_probe, batch_format="pandas")


def cross_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    right_rows: int | None = None,
    limit: int = BROADCAST_ROW_LIMIT,
) -> "ray.data.Dataset":
    """Cartesian product with a broadcast build side: the right side is
    collected once (guarded by ``limit`` — a cross product against a big
    build side is an error, not a plan), ``ray.put`` once, and each left
    batch pandas-cross-merges against it.  Streams the left side; output
    is |left| × |right| rows, so keep the build side dimension-sized.
    Callers must ensure disjoint column names (pandas would suffix)."""
    n = right_rows if right_rows is not None else right.count()
    if n > limit:
        raise ValueError(
            f"cross_join build side has {n} rows > {limit}; a cross "
            "product needs a dimension-sized side"
        )
    rdf = right.to_pandas()
    ref = ray.put(rdf)

    def _probe(batch: pd.DataFrame) -> pd.DataFrame:
        build = ray.get(ref)
        return batch.merge(build, how="cross")

    return left.map_batches(_probe, batch_format="pandas")


# Auto-join: a side whose row count is KNOWN (parquet metadata) and at
# most this many rows becomes a broadcast build side; unknown or larger
# sides take the hash-partition shuffle.  Conservative vs
# BROADCAST_ROW_LIMIT because the SQL façade may feed wide projections.
AUTO_BROADCAST_ROWS = 1_000_000


def auto_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: Sequence[str],
    right_on: Sequence[str] | None = None,
    how: str = "inner",
    left_rows: int | None = None,
    right_rows: int | None = None,
    broadcast_limit: int = AUTO_BROADCAST_ROWS,
) -> "ray.data.Dataset":
    """Equi-join with measured plan choice, hash_join-compatible output
    (left columns then right columns; right key columns consumed).

    ``left_rows`` / ``right_rows`` are cheap row-count bounds (parquet
    footer metadata) or ``None`` when the side is a derived plan whose
    size is unknown without executing it.  A known-small side is
    broadcast (``ray.put`` once, pandas-merge probe per batch — zero
    shuffle of the big side); otherwise both sides take the
    hash-partition exchange.  Reference analog: every Athena join the
    text2sql agent emits is fact⋈dim (`README.md:13-15`)."""
    rk = list(right_on) if right_on else list(on)
    lk = list(on)
    small_right = right_rows is not None and right_rows <= broadcast_limit
    small_left = left_rows is not None and left_rows <= broadcast_limit
    if small_right and small_left:
        # both known-small: build on the smaller side
        small_left = left_rows < right_rows
        small_right = not small_left
    if small_right and how in ("inner", "left_outer"):
        return _bc_join(left, right, lk, rk, how, build="right")
    if small_left and how == "inner":
        return _bc_join(left, right, lk, rk, how, build="left")
    # right_outer / full_outer always take the hash exchange: the probe
    # side would need unmatched-build-row tracking a broadcast can't do.
    # They also need partitions sized to the data: a partition receiving
    # zero shards from one side reaches Acero as a SCHEMA-LESS empty
    # table and the key lookup crashes (Ray 2.49 join.py finalize).
    # Size to the smaller side's measured rows, materializing a derived
    # side to count it (parquet-backed sides carry footer counts and
    # skip this; at engine scale the sides of an outer join are tables).
    if how in ("right_outer", "full_outer"):
        lr, rr = left_rows, right_rows
        if lr is None:
            left = left.materialize()
            lr = left.count()
        if rr is None:
            right = right.materialize()
            rr = right.count()
        parts = max(1, min(lr, rr) // 1000 + 1)
        # pyarrow CONSUMES join-key columns: left keys are dropped on
        # right_outer and coalesced with right values on full_outer —
        # SQL instead keeps both sides' key columns, null-extended.
        # Join on duplicated shadow keys so the originals ride through
        # as payload with correct nulls, then drop the shadows.
        lkeys = [f"__jk_l{i}" for i in range(len(lk))]
        rkeys = [f"__jk_r{i}" for i in range(len(rk))]
        joined = hash_join(
            _shadow_keys(left, lk, lkeys),
            _shadow_keys(right, rk, rkeys),
            on=tuple(lkeys), right_on=tuple(rkeys), how=how,
            num_partitions=parts,
        )

        def _drop_shadow(batch: pa.Table) -> pa.Table:
            drop = [c for c in batch.column_names if c.startswith("__jk_")]
            return batch.drop_columns(drop)

        return joined.map_batches(_drop_shadow, batch_format="pyarrow")
    return hash_join(left, right, on=tuple(lk), right_on=tuple(rk), how=how)


def _shadow_keys(
    ds: "ray.data.Dataset", keys: Sequence[str], names: Sequence[str]
) -> "ray.data.Dataset":
    """Append zero-copy duplicates of ``keys`` under ``names``."""

    def _f(batch: pa.Table) -> pa.Table:
        for k, n in zip(keys, names):
            batch = batch.append_column(n, batch[k])
        return batch

    return ds.map_batches(_f, batch_format="pyarrow")


def _bc_join(
    left, right, lk: list, rk: list, how: str, build: str
) -> "ray.data.Dataset":
    """Broadcast one side, probe the other inside ``map_batches``.
    Output matches ``hash_join``: left columns (probe or build order
    normalized left-first), right key columns dropped when their names
    differ from the left keys."""
    pd_how = {"inner": "inner", "left_outer": "left"}[how]
    drop = [c for c in rk if c not in lk]
    if build == "right":
        build_df = right.to_pandas()
        if len(build_df) > BROADCAST_ROW_LIMIT:
            return hash_join(left, right, on=tuple(lk), right_on=tuple(rk), how=how)
        ref = ray.put(build_df)

        def _probe(batch: pd.DataFrame) -> pd.DataFrame:
            m = batch.merge(
                ray.get(ref), how=pd_how, left_on=lk, right_on=rk
            )
            return m.drop(columns=[c for c in drop if c in m.columns])

        return left.map_batches(_probe, batch_format="pandas")

    build_df = left.to_pandas()
    if len(build_df) > BROADCAST_ROW_LIMIT:
        return hash_join(left, right, on=tuple(lk), right_on=tuple(rk), how=how)
    ref = ray.put(build_df)

    def _probe_l(batch: pd.DataFrame) -> pd.DataFrame:
        small = ray.get(ref)
        m = small.merge(batch, how="inner", left_on=lk, right_on=rk)
        # merge put build (left) columns first already; drop right keys
        return m.drop(columns=[c for c in drop if c in m.columns])

    return right.map_batches(_probe_l, batch_format="pandas")


# ORDER BY + LIMIT n: per-block partial top-k (each block contributes at
# most n rows) + bounded driver combine.  Above this n the collect is no
# longer provably small → full distributed sort instead.
TOPK_DRIVER_LIMIT = 100_000


def topk(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    descending: Sequence[bool],
    n: int,
    offset: int = 0,
) -> "ray.data.Dataset":
    """Global top-``n`` (after skipping ``offset`` ordered rows) by sort
    keys without a full sort shuffle: every block keeps its local
    top-``n + offset`` (the global winners are a subset of the union),
    the survivors (≤ n+offset per block) are combined once on the
    driver.  The SQL façade compiles ``ORDER BY … LIMIT n [OFFSET m]``
    here when ``n + m`` ≤ ``TOPK_DRIVER_LIMIT``; semantics match
    ``ds.sort(keys)`` then slice (NULLs last)."""
    keys = list(keys)
    asc = [not d for d in descending]
    keep = n + offset

    def _local(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) <= keep:
            return batch
        return batch.sort_values(
            keys, ascending=asc, kind="mergesort", na_position="last"
        ).head(keep)

    pieces = [
        b
        for b in ds.map_batches(_local, batch_format="pandas").iter_batches(
            batch_size=None, batch_format="pandas"
        )
    ]
    if not pieces:
        return ds.limit(0)
    out = (
        pd.concat(pieces, ignore_index=True)
        .sort_values(keys, ascending=asc, kind="mergesort", na_position="last")
        .iloc[offset : offset + n]
        .reset_index(drop=True)
    )
    return ray.data.from_pandas(out)


# aggregates with an exact per-batch partial + merge (distributive, or
# algebraic like avg = sum/count) — eligible for grouped_aggregate
DISTRIBUTIVE_AGGS = {"count_star", "count", "sum", "min", "max", "avg", "mean"}


def grouped_aggregate(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    specs: Sequence[tuple],
    partitions: int | None = None,
) -> "ray.data.Dataset":
    """Hash-partitioned grouped aggregation with a per-batch combiner.

    ``specs``: ``(fn, in_col, out_col)`` with fn ∈ ``DISTRIBUTIVE_AGGS``.
    Each batch pre-aggregates to one row per (batch, key) — the shuffle
    ships group partials, not rows — then each key-hash partition merges
    its partials exactly (sums of sums, min of mins, avg = Σsum/Σcount).

    Exists because Ray 2.49's sort-based ``groupby().aggregate`` pays a
    multi-stage sample+sort barrier that measured ~9 s on a 50k-row /
    13k-group input where this pass takes ~1.5 s; at corpus scale the
    combiner also ships strictly less than a sort shuffle of raw rows.

    Skew-immune: a hot key contributes at most ONE partial row per
    input block to its partition, so the heaviest partition holds
    ≤ n_blocks × (keys hashing there) rows regardless of row skew."""
    keys = list(keys)
    P = partitions or DEDUP_PARTITIONS
    for fn, _in, _out in specs:
        if fn not in DISTRIBUTIVE_AGGS:
            raise ValueError(f"{fn} has no distributive partial")

    def _local(df: pd.DataFrame) -> pd.DataFrame:
        gb = df.groupby(keys, sort=False, dropna=False)
        part = gb.size().reset_index()[keys]
        for fn, in_col, out_col in specs:
            if fn == "count_star":
                part[f"_c_{out_col}"] = gb.size().to_numpy()
            elif fn == "count":
                part[f"_c_{out_col}"] = gb[in_col].count().to_numpy()
            elif fn == "sum":
                part[f"_s_{out_col}"] = gb[in_col].sum(min_count=1).to_numpy()
            elif fn == "min":
                part[f"_lo_{out_col}"] = gb[in_col].min().to_numpy()
            elif fn == "max":
                part[f"_hi_{out_col}"] = gb[in_col].max().to_numpy()
            else:  # avg / mean
                part[f"_s_{out_col}"] = gb[in_col].sum(min_count=1).to_numpy()
                part[f"_n_{out_col}"] = gb[in_col].count().to_numpy()
        part["_part"] = (
            pd.util.hash_pandas_object(part[keys], index=False).to_numpy() % P
        ).astype("int32")
        return part

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        gb = g.groupby(keys, sort=False, dropna=False)
        out = gb.size().reset_index()[keys]
        for fn, _in_col, out_col in specs:
            if fn in ("count_star", "count"):
                out[out_col] = gb[f"_c_{out_col}"].sum().astype("int64").to_numpy()
            elif fn == "sum":
                out[out_col] = gb[f"_s_{out_col}"].sum(min_count=1).to_numpy()
            elif fn == "min":
                out[out_col] = gb[f"_lo_{out_col}"].min().to_numpy()
            elif fn == "max":
                out[out_col] = gb[f"_hi_{out_col}"].max().to_numpy()
            else:  # avg / mean — SQL semantics: Σsum / Σcount
                s = gb[f"_s_{out_col}"].sum(min_count=1).to_numpy()
                n = gb[f"_n_{out_col}"].sum().to_numpy().astype(np.float64)
                out[out_col] = np.divide(
                    s, n, out=np.full(len(n), np.nan), where=n > 0
                )
        return out

    return (
        ds.map_batches(_local, batch_format="pandas")
        .groupby("_part")
        .map_groups(_merge, batch_format="pandas")
    )


# broadcast membership sets above this many distinct keys switch to the
# shuffle path: ~4M int64 keys ≈ 32 MB re-shipped to every worker is the
# break-even vs one hash-partition exchange of the (deduped) key column
SEMI_BROADCAST_LIMIT = 4_000_000

_OVERFLOW = object()


def _broadcast_key_set(right: "ray.data.Dataset", key: str,
                       limit: int | None = None):
    """Distinct key values of ``right`` as an object-store broadcast ref,
    ``None`` for an empty right side, or the ``_OVERFLOW`` sentinel once
    more than ``limit`` distinct keys have streamed (caller falls back
    to the shuffle path — the stream stops early, so an oversized right
    side costs only ``limit`` keys of driver memory).  Per-batch uniqued
    driver-side: ``Dataset.unique``'s set-aggregate chokes on some block
    shapes (numpy-array accumulators at higher parallelism, Ray 2.49)."""
    vals: set = set()
    for b in right.select_columns([key]).iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        vals.update(pc.unique(b[key]).to_pylist())
        if limit is not None and len(vals) > limit:
            return _OVERFLOW
    if not vals:
        return None
    return ray.put(pa.array(sorted(vals)))


def _shuffle_membership(
    left: "ray.data.Dataset", right: "ray.data.Dataset",
    on: str, right_on: str, keep_matches: bool,
) -> "ray.data.Dataset":
    """Semi/anti join as a hash-partition exchange: dedupe the right key
    column (combiner inside the dedup), mark it, left-outer join, filter
    on the marker.  Both sides shuffle once; nothing broadcasts."""
    marker = "__membership__"
    keys = dedupe_by_key(
        right.select_columns([right_on]), [right_on]
    ).map_batches(
        lambda df: df.assign(**{marker: np.int8(1)}), batch_format="pandas"
    )
    joined = hash_join(left, keys, on=(on,), right_on=(right_on,),
                       how="left_outer")

    def _filter(df: pd.DataFrame) -> pd.DataFrame:
        mask = df[marker].notna()
        out = df[mask if keep_matches else ~mask]
        return out.drop(columns=[marker] + (
            [right_on] if right_on != on and right_on in out.columns else []
        ))

    return joined.map_batches(_filter, batch_format="pandas")


def semi_join(
    left: "ray.data.Dataset", right: "ray.data.Dataset", on: str,
    right_on: str | None = None,
    broadcast_limit: int | None = SEMI_BROADCAST_LIMIT,
) -> "ray.data.Dataset":
    """Keep left rows whose key appears in ``right`` (membership filter,
    `lambda/create_personalize_segment/index.py:44-77`).  Right side's
    distinct keys are broadcast once and the left side never shuffles —
    until the measured key count exceeds ``broadcast_limit``, when it
    switches to the hash-partition exchange (both sides shuffle once)."""
    rkey = right_on or on
    ref = _broadcast_key_set(right, rkey, broadcast_limit)
    if ref is None:  # empty right side: nothing matches
        return left.limit(0)
    if ref is _OVERFLOW:
        return _shuffle_membership(left, right, on, rkey, keep_matches=True)

    def _filter(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[on], value_set=ray.get(ref))
        return batch.filter(mask)

    return left.map_batches(_filter, batch_format="pyarrow")


def anti_join(
    left: "ray.data.Dataset", right: "ray.data.Dataset", on: str,
    right_on: str | None = None,
    broadcast_limit: int | None = SEMI_BROADCAST_LIMIT,
) -> "ray.data.Dataset":
    """Keep left rows whose key does NOT appear in ``right`` — the
    "excluding those who already bought it" NL workload (README.md:14)
    and the new-items subtraction
    (`lambda/create_personalize_segment/index.py:141`).  Same
    broadcast-vs-shuffle switch as :func:`semi_join`."""
    rkey = right_on or on
    ref = _broadcast_key_set(right, rkey, broadcast_limit)
    if ref is None:  # empty right side: nothing excluded
        return left
    if ref is _OVERFLOW:
        return _shuffle_membership(left, right, on, rkey, keep_matches=False)

    def _filter(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[on], value_set=ray.get(ref))
        return batch.filter(pc.invert(mask))

    return left.map_batches(_filter, batch_format="pyarrow")


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    how: str = "inner",
) -> "ray.data.Dataset":
    """As-of join: for each left row, the LAST right row of the same key
    with ``right_ts <= left_ts`` (backward direction — DuckDB/pandas
    ``ASOF JOIN`` semantics).  An operator Ray Data lacks, composed per
    the custom-operator ladder: broadcast the (dim-sized) right side
    once, sorted by ts; each left batch sorts locally and runs a
    vectorized ``pandas.merge_asof``.

    Scale path for a LARGE right side: hash-bucket both sides on the
    key into partitioned Parquet, then per-bucket merge_asof — the
    partitioning assumption is key-hash co-location; this broadcast
    variant requires only that the right side fit one worker heap."""
    if how not in ("inner", "left_outer"):
        raise ValueError(f"asof_join supports inner/left_outer, got {how}")
    right_df = right.to_pandas().sort_values(right_ts, kind="mergesort")
    if len(right_df) > BROADCAST_ROW_LIMIT:
        raise ValueError("right side too large to broadcast; bucket both sides")
    ref = ray.put(right_df)

    def _asof(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.sort_values(left_ts, kind="mergesort")
        out = pd.merge_asof(
            batch,
            ray.get(ref),
            left_on=left_ts,
            right_on=right_ts,
            left_by=left_key,
            right_by=right_key,
            direction="backward",
        )
        if how == "inner":
            out = out[out[right_ts].notna()]
        return out

    return left.map_batches(_asof, batch_format="pandas")


ASOF_BUCKET_PARTITIONS = 64


def asof_join_bucketed(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    how: str = "inner",
    partitions: int = ASOF_BUCKET_PARTITIONS,
    scratch_dir: str | None = None,
) -> "ray.data.Dataset":
    """The :func:`asof_join` scale path — for right sides past the
    broadcast limit.

    Both sides hash on the join key (dtype-insensitively, via the string
    form): the right side streams into hive-partitioned Parquet (one
    directory per key-hash bucket, the same layout the IVF index uses),
    then each left key-hash partition runs one vectorized
    ``pandas.merge_asof`` against ONLY its bucket's directory — no heap
    ever holds the right side, and a failed run resumes per bucket.
    Partitioning assumption: key-hash co-location.  Tie rows (equal
    ``(key, ts)``) resolve by right-side sort stability, as in the
    broadcast path."""
    import os
    import tempfile

    import pyarrow.parquet as _pq

    from ..functions.texthash import hash_str_array

    if how not in ("inner", "left_outer"):
        raise ValueError(f"asof_join supports inner/left_outer, got {how}")
    scratch = scratch_dir or tempfile.mkdtemp(prefix="asof_buckets_", dir="/tmp")
    # empty typed template: keeps merge_asof dtypes (and the output
    # block schema) stable for left partitions whose bucket is empty
    right_template = right.limit(1).to_pandas().iloc[0:0]

    def _tag(key):
        def _fn(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch.copy()
            batch["_part"] = (
                hash_str_array(batch[key].astype(str).to_numpy(object))
                % np.uint64(partitions)
            ).astype("int32")
            return batch

        return _fn

    right.map_batches(_tag(right_key), batch_format="pandas").write_parquet(
        scratch, partition_cols=["_part"]
    )

    def _probe(g: pd.DataFrame) -> pd.DataFrame:
        part = int(g["_part"].iloc[0])
        d = os.path.join(scratch, f"_part={part}")
        if os.path.isdir(d):
            rdf = _pq.read_table(d).to_pandas()[right_template.columns]
            rdf = rdf.sort_values(right_ts, kind="mergesort")
        else:
            rdf = right_template
        g = g.drop(columns=["_part"]).sort_values(left_ts, kind="mergesort")
        out = pd.merge_asof(
            g,
            rdf,
            left_on=left_ts,
            right_on=right_ts,
            left_by=left_key,
            right_by=right_key,
            direction="backward",
        )
        if how == "inner":
            out = out[out[right_ts].notna()]
        return out

    return (
        left.map_batches(_tag(left_key), batch_format="pandas")
        .groupby("_part")
        .map_groups(_probe, batch_format="pandas")
    )


def range_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    value_col: str,
    lo_col: str,
    hi_col: str,
    how: str = "inner",
) -> "ray.data.Dataset":
    """Range (interval) join: left rows matched to right rows where
    ``lo <= value < hi`` — another operator Ray Data lacks.  The right
    side (the interval table — bands, buckets, calendars) is broadcast
    once; each batch evaluates one vectorized mask per interval row, so
    the cost is O(|right| × batch) numpy ops with no shuffle.
    Overlapping intervals produce one output row per match.

    Scale path for a LARGE interval table: sort intervals, bucket both
    sides by a coarse value range, join per bucket."""
    if how not in ("inner", "left_outer"):
        raise ValueError(f"range_join supports inner/left_outer, got {how}")
    right_df = right.to_pandas()
    if len(right_df) > BROADCAST_ROW_LIMIT:
        raise ValueError("interval table too large to broadcast; bucket by range")
    ref = ray.put(right_df)

    def _ranger(batch: pd.DataFrame) -> pd.DataFrame:
        right = ray.get(ref)
        lo = right[lo_col].to_numpy()
        hi = right[hi_col].to_numpy()
        v = batch[value_col].to_numpy()
        pieces = []
        matched = np.zeros(len(batch), dtype=bool)
        for r in range(len(right)):
            mask = (v >= lo[r]) & (v < hi[r])
            if mask.any():
                matched |= mask
                sub = batch[mask].reset_index(drop=True)
                for c in right.columns:
                    sub[c] = right.iloc[r][c]
                pieces.append(sub)
        if how == "left_outer" and (~matched).any():
            sub = batch[~matched].reset_index(drop=True)
            for c in right.columns:
                sub[c] = None
            pieces.append(sub)
        if not pieces:
            out = batch.iloc[:0].copy()
            for c in right.columns:
                out[c] = pd.Series(dtype=right[c].dtype)
            return out
        return pd.concat(pieces, ignore_index=True)

    return left.map_batches(_ranger, batch_format="pandas")


RANGE_BUCKETS = 64


def range_join_bucketed(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    value_col: str,
    lo_col: str,
    hi_col: str,
    how: str = "inner",
    num_buckets: int = RANGE_BUCKETS,
    scratch_dir: str | None = None,
) -> "ray.data.Dataset":
    """The :func:`range_join` scale path — for interval tables past the
    broadcast limit.

    The bucket grid comes from the LEFT side's measured value range
    (one Min/Max aggregate pass), so unbounded interval edges (a +inf
    ``hi`` band) don't collapse the grid.  Intervals replicate into
    every grid bucket they overlap (≤ ``num_buckets`` copies, hive-
    partitioned Parquet — the asof/IVF layout); each left value-bucket
    partition then sweeps only its bucket's intervals with the same
    vectorized per-interval masks as the broadcast plan."""
    import os
    import tempfile

    import pyarrow.parquet as _pq

    if how not in ("inner", "left_outer"):
        raise ValueError(f"range_join supports inner/left_outer, got {how}")
    scratch = scratch_dir or tempfile.mkdtemp(prefix="range_buckets_", dir="/tmp")
    stats = left.aggregate(Min(value_col), Max(value_col))
    gmin = float(stats[f"min({value_col})"])
    gmax = float(stats[f"max({value_col})"])
    width = (gmax - gmin) / num_buckets or 1.0
    right_template = right.limit(1).to_pandas().iloc[0:0]

    def _bucket_of(v: np.ndarray) -> np.ndarray:
        return np.clip(
            np.floor((v - gmin) / width), 0, num_buckets - 1
        ).astype(np.int32)

    def _tag_right(batch: pd.DataFrame) -> pd.DataFrame:
        lo_b = _bucket_of(batch[lo_col].to_numpy(np.float64))
        hi_b = _bucket_of(batch[hi_col].to_numpy(np.float64))
        reps = (hi_b - lo_b + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(batch)), reps)
        out = batch.iloc[idx].reset_index(drop=True)
        parts = np.concatenate(
            [np.arange(a, b + 1) for a, b in zip(lo_b, hi_b)]
        ) if len(batch) else np.empty(0, np.int64)
        out["_part"] = parts.astype(np.int32)
        return out

    right.map_batches(_tag_right, batch_format="pandas").write_parquet(
        scratch, partition_cols=["_part"]
    )

    def _tag_left(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_part"] = _bucket_of(batch[value_col].to_numpy(np.float64))
        return batch

    def _probe(g: pd.DataFrame) -> pd.DataFrame:
        part = int(g["_part"].iloc[0])
        d = os.path.join(scratch, f"_part={part}")
        rdf = (
            _pq.read_table(d).to_pandas()[right_template.columns]
            if os.path.isdir(d)
            else right_template
        )
        g = g.drop(columns=["_part"]).reset_index(drop=True)
        lo = rdf[lo_col].to_numpy()
        hi = rdf[hi_col].to_numpy()
        v = g[value_col].to_numpy()
        pieces = []
        matched = np.zeros(len(g), dtype=bool)
        for r in range(len(rdf)):
            mask = (v >= lo[r]) & (v < hi[r])
            if mask.any():
                matched |= mask
                sub = g[mask].reset_index(drop=True)
                for c in rdf.columns:
                    sub[c] = rdf.iloc[r][c]
                pieces.append(sub)
        if how == "left_outer" and (~matched).any():
            sub = g[~matched].reset_index(drop=True)
            for c in rdf.columns:
                sub[c] = None
            pieces.append(sub)
        if not pieces:
            out = g.iloc[:0].copy()
            for c in rdf.columns:
                out[c] = pd.Series(dtype=rdf[c].dtype)
            return out
        return pd.concat(pieces, ignore_index=True)

    return (
        left.map_batches(_tag_left, batch_format="pandas")
        .groupby("_part")
        .map_groups(_probe, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# set ops
# ---------------------------------------------------------------------------

def union_with_prefix(
    main: "ray.data.Dataset",
    sub: "ray.data.Dataset",
    key_col: str,
    prefix: str,
    main_prefix: str = "",
) -> "ray.data.Dataset":
    """UNION ALL with key-space disambiguation: prefix ``sub``'s key
    column so overlapping ID spaces can't collide (`CONCAT('sub_', …)`,
    `lambda/create_personalize_dataset_import_job/index.py:48-56`)."""

    def _prefix(p: str):
        def fn(batch: pa.Table) -> pa.Table:
            col = pc.binary_join_element_wise(
                pa.scalar(p), pc.cast(batch[key_col], pa.string()), ""
            )
            return batch.set_column(
                batch.schema.get_field_index(key_col), key_col, col
            )

        return fn

    sub2 = sub.map_batches(_prefix(prefix), batch_format="pyarrow")
    if main_prefix:
        main = main.map_batches(_prefix(main_prefix), batch_format="pyarrow")
    return main.union(sub2)


DEDUP_PARTITIONS = 64


def dedupe_by_key(
    ds: "ray.data.Dataset",
    cols: Sequence[str],
    partitions: int = DEDUP_PARTITIONS,
    sort_by: str | None = None,
) -> "ray.data.Dataset":
    """Keep one row per distinct ``cols`` value.

    Ray's ``groupby(cols).map_groups`` pays ~ms of Python per group —
    ruinous at one-group-per-row cardinality.  Instead: local per-batch
    dedup (pre-shuffle shrink) → hash the key into ``partitions``
    buckets → ONE groupby with ``partitions`` groups, vectorized
    pandas dedup inside each.  ``sort_by``: keep the minimum of that
    column per key (content-defined winner) instead of an arbitrary
    first."""
    cols = list(cols)

    def _part_of(batch: pd.DataFrame) -> "np.ndarray":
        # all-plain-integer keys hash numerically (vectorized
        # multiply-xor mix) — the string-concat fallback costs ~1 µs/row
        # in Python object land, which dominated candidate-pair dedupe
        # at tens of millions of (id_a, id_b) rows
        if all(
            np.issubdtype(batch[c].to_numpy().dtype, np.integer)
            for c in cols
        ):
            mult = np.uint64(0x9E3779B97F4A7C15)
            h = np.zeros(len(batch), np.uint64)
            for c in cols:
                u = batch[c].to_numpy().astype(np.int64).view(np.uint64)
                h = (h ^ (u * mult)) * mult
            h ^= h >> np.uint64(33)
            return (h % np.uint64(partitions)).astype("int32")
        key = batch[cols[0]].astype(str)
        for c in cols[1:]:
            key = key + "\x1f" + batch[c].astype(str)
        return (
            pd.util.hash_array(key.to_numpy(object)) % partitions
        ).astype("int32")

    def _local(batch: pd.DataFrame) -> pd.DataFrame:
        if sort_by:
            batch = batch.sort_values(sort_by, kind="mergesort")
        batch = batch.drop_duplicates(cols)
        batch = batch.copy()
        batch["_part"] = _part_of(batch)
        return batch

    def _finish(g: pd.DataFrame) -> pd.DataFrame:
        if sort_by:
            g = g.sort_values(sort_by, kind="mergesort")
        return g.drop_duplicates(cols).drop(columns="_part")

    return (
        ds.map_batches(_local, batch_format="pandas")
        .groupby("_part")
        .map_groups(_finish, batch_format="pandas")
    )


def distinct(ds: "ray.data.Dataset", cols: Sequence[str]) -> "ray.data.Dataset":
    """SELECT DISTINCT cols (`lib/data-storage.ts:210`; SURVEY §2.7 U3):
    :func:`dedupe_by_key` over a projection."""
    cols = list(cols)

    def _proj(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[cols]

    return dedupe_by_key(ds.map_batches(_proj, batch_format="pandas"), cols)


def set_op(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    op: str,
    cols: Sequence[str],
    partitions: int = DEDUP_PARTITIONS,
) -> "ray.data.Dataset":
    """SQL set operations with DISTINCT semantics: ``intersect``,
    ``except`` (left minus right) and ``union`` (distinct).

    Both inputs must already share the column names in ``cols`` (the SQL
    layer renames the right side positionally first, as UNION ALL does).

    Scale posture — same combiner shape as :func:`dedupe_by_key`: each
    side deduplicates locally per batch (pre-shuffle shrink, only
    distinct rows travel), tags itself with a side bit, hashes the full
    row into ``partitions`` buckets, then ONE groupby over the bucket id
    resolves side membership with a vectorized pandas groupby inside
    each partition.  NULL keys group together (``dropna=False``),
    matching SQL's "null is not distinct from null" set-op rule.
    """
    if op not in ("intersect", "except", "union"):
        raise ValueError(f"set_op: unknown op {op!r}")
    cols = list(cols)

    def _tag(side: int):
        def _f(batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch[cols].drop_duplicates(cols)
            key = batch[cols[0]].astype(str)
            for c in cols[1:]:
                key = key + "\x1f" + batch[c].astype(str)
            batch = batch.copy()
            batch["_part"] = (
                pd.util.hash_array(key.to_numpy(object)) % partitions
            ).astype("int32")
            batch["_side"] = np.int8(side)
            return batch

        return _f

    tagged = left.map_batches(_tag(0), batch_format="pandas").union(
        right.map_batches(_tag(1), batch_format="pandas")
    )

    def _finish(g: pd.DataFrame) -> pd.DataFrame:
        sides = g.groupby(cols, dropna=False, sort=False)["_side"].agg(
            ["min", "max"]
        )
        if op == "intersect":
            sides = sides[(sides["min"] == 0) & (sides["max"] == 1)]
        elif op == "except":
            sides = sides[sides["max"] == 0]
        return sides.reset_index()[cols]

    return tagged.groupby("_part").map_groups(_finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# grouped aggregates
# ---------------------------------------------------------------------------

def grouped_count_having(
    ds: "ray.data.Dataset", key: str, min_count: int, count_name: str = "cnt"
) -> "ray.data.Dataset":
    """GROUP BY key HAVING count(*) >= min_count (README.md:13 —
    "customers with ≥2 purchases").  Combiner pass: per-batch partial
    counts → one hash shuffle of partials → exact merge."""
    agg = grouped_aggregate(ds, [key], [("count_star", None, count_name)])

    def _having(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch[count_name], min_count))

    return agg.map_batches(_having, batch_format="pyarrow")


def grouped_topk(
    ds: "ray.data.Dataset",
    key: str,
    k: int,
    count_name: str = "cnt",
) -> "ray.data.Dataset":
    """Top-k groups by row count (README.md:13 — "top-3 items").
    Grouped combiner count → shuffle-free partial top-k on the small
    aggregate.  Ties broken by key ascending so the result is
    deterministic."""
    return topk(
        grouped_aggregate(ds, [key], [("count_star", None, count_name)]),
        [count_name, key],
        [True, False],
        k,
    )


def topn_per_group(
    ds: "ray.data.Dataset",
    group_key: str,
    order_col: str,
    n: int,
    descending: bool = True,
    tiebreak: Sequence[str] = (),
    partitions: int = DEDUP_PARTITIONS,
) -> "ray.data.Dataset":
    """Per-group top-N rows — the Personalize batch-segment semantics
    (top `numResults` users per item,
    `lambda/create_personalize_segment/index.py:14,194-205`; SURVEY O3).

    Scale shape: ``groupby(group_key).map_groups`` pays ~ms of Python
    per group — ruinous at one-group-per-row cardinality (e.g. top-N
    per USER).  Instead: local per-batch top-N (pre-shuffle shrink —
    the global winners are a subset of the per-batch winners) → hash
    the key into ``partitions`` buckets → ONE groupby with
    ``partitions`` groups, vectorized ``sort_values + groupby.head``
    inside each.  Deterministic via explicit tiebreak columns."""
    by = [group_key, order_col, *tiebreak]
    asc = [True, not descending] + [True] * len(tiebreak)

    def _local(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.sort_values(by, ascending=asc, kind="mergesort")
        batch = batch.groupby(group_key, sort=False).head(n).copy()
        batch["_part"] = (
            pd.util.hash_array(batch[group_key].to_numpy()) % partitions
        ).astype("int32")
        return batch

    def _finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(by, ascending=asc, kind="mergesort")
        return g.groupby(group_key, sort=False).head(n).drop(columns="_part")

    return (
        ds.map_batches(_local, batch_format="pandas")
        .groupby("_part")
        .map_groups(_finish, batch_format="pandas")
    )


def sort_limit(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    descending: Sequence[bool] | bool,
    k: int | None = None,
) -> "ray.data.Dataset":
    """Global sort (range-partitioned shuffle) + optional limit —
    presentation ordering (`lambda/webbackend/resthandler.py:66`,
    SURVEY O1/O5).  For pure top-k prefer :func:`grouped_topk` /
    per-batch partial top-k; a full sort of a 100 TB table is only
    justified when the full ordering is the output."""
    out = ds.sort(list(keys), descending=descending)
    return out.limit(k) if k is not None else out


__all__ = [
    "hash_join",
    "broadcast_join",
    "auto_join",
    "cross_join",
    "topk",
    "asof_join",
    "range_join",
    "dedupe_by_key",
    "semi_join",
    "anti_join",
    "union_with_prefix",
    "distinct",
    "grouped_count_having",
    "grouped_aggregate",
    "standardize",
    "frequency_encode",
    "grouped_topk",
    "topn_per_group",
    "sort_limit",
    "merge_upsert",
    "skew_join",
    "Count",
    "Sum",
    "Min",
    "Max",
    "Mean",
    "AggregateFn",
]


def standardize(
    ds: "ray.data.Dataset",
    value_col: str,
    group_cols: Sequence[str],
    out_col: str = "zscore",
    partitions: int | None = None,
) -> "ray.data.Dataset":
    """Per-group z-score standardization: attach
    ``(value - group_mean) / group_pop_std`` to every row (0.0 when a
    group's std is 0 — constant groups standardize to zero, not NaN).

    The feature-scaling pass an ML-feature pipeline runs before model
    fitting (`ops/model.py`) — grouped statistics applied BACK to the
    row stream, the same shape as the domain quality gate.

    Scale posture: the group moments (Σv, Σv², n) travel through the
    :func:`grouped_aggregate` combiner — one partial row per
    block × group, rows never shuffle — and come back as an
    O(#groups) broadcast table merged in one streaming map.  The input
    is consumed twice (moments, then attach), both streaming passes.
    """
    group_cols = list(group_cols)

    def _sq(batch: pa.Table) -> pa.Table:
        v = pc.cast(batch[value_col], pa.float64())
        return pa.table(
            {
                **{g: batch[g] for g in group_cols},
                "_v": v,
                "_v2": pc.multiply(v, v),
            }
        )

    moments = grouped_aggregate(
        ds.select_columns(group_cols + [value_col]).map_batches(
            _sq, batch_format="pyarrow"
        ),
        keys=group_cols,
        specs=[
            ("sum", "_v", "_s"),
            ("sum", "_v2", "_s2"),
            ("count_star", None, "_n"),
        ],
        partitions=partitions,
    )
    stats = moments.to_pandas()  # O(#groups)
    stats["_mean"] = stats["_s"] / stats["_n"]
    var = stats["_s2"] / stats["_n"] - stats["_mean"] ** 2
    stats["_std"] = np.sqrt(np.maximum(var, 0.0))
    ref = ray.put(stats[group_cols + ["_mean", "_std"]])

    def _attach(batch: pd.DataFrame) -> pd.DataFrame:
        st = ray.get(ref)
        out = batch.merge(st, on=group_cols, how="left")
        std = out["_std"].to_numpy()
        z = np.where(
            std > 0.0,
            (out[value_col].to_numpy(np.float64) - out["_mean"].to_numpy())
            / np.where(std > 0.0, std, 1.0),
            0.0,
        )
        out = out.drop(columns=["_mean", "_std"])
        out[out_col] = z
        return out

    return ds.map_batches(_attach, batch_format="pandas")


def frequency_encode(
    ds: "ray.data.Dataset",
    cat_col: str,
    out_prefix: str | None = None,
    partitions: int | None = None,
) -> "ray.data.Dataset":
    """Categorical frequency encoding: attach each row's category count
    and rate (count / N) — the leakage-free encoding feature pipelines
    use where one-hot explodes (high-cardinality categories).

    Same shape as :func:`standardize`: category counts ride the
    combiner shuffle (one partial row per block × category), come back
    as an O(#categories) broadcast table, and attach in one streaming
    merge.  Output adds ``{cat}_count`` (int64) and ``{cat}_rate``
    (float64)."""
    pre = out_prefix or cat_col
    counts = grouped_aggregate(
        ds.select_columns([cat_col]),
        keys=[cat_col],
        specs=[("count_star", None, f"{pre}_count")],
    ).to_pandas()
    total = float(counts[f"{pre}_count"].sum())
    counts[f"{pre}_rate"] = counts[f"{pre}_count"] / total
    ref = ray.put(counts)

    def _attach(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(ray.get(ref), on=cat_col, how="left")

    return ds.map_batches(_attach, batch_format="pandas")


def merge_upsert(
    target: "ray.data.Dataset",
    updates: "ray.data.Dataset",
    on: str,
    broadcast_limit: int | None = SEMI_BROADCAST_LIMIT,
) -> "ray.data.Dataset":
    """SCD-1 ``MERGE INTO``: every key present in ``updates`` takes the
    update row; every other target row survives unchanged — the CDC
    fold-in every incremental warehouse load runs (the incremental
    analog of the reference's full-refresh overwrite sink,
    `lambda/process_segment_results/index.py:84-107`, which rewrites
    the whole prefix instead).

    Plan: ``updates ∪ (target ANTI JOIN updates ON key)``.  The anti
    join inherits :func:`anti_join`'s measured switch — update keys
    broadcast once while the (huge) target side streams without a
    shuffle; above ``broadcast_limit`` distinct keys both sides take
    one hash exchange.  A typical CDC delta is ≪ the base table, so
    the scale path is the broadcast one.  Schemas must match
    (column-name union semantics are a modeling error, not a plan).
    """
    if set(target.columns()) != set(updates.columns()):
        raise ValueError(
            "merge_upsert needs identical schemas: "
            f"{sorted(target.columns())} vs {sorted(updates.columns())}"
        )
    kept = anti_join(target, updates, on=on, broadcast_limit=broadcast_limit)
    return updates.union(kept)


# skew_join: a key with at least this many left-side rows is "hot" by
# default — roughly the row count where one Acero join partition's
# build+probe for a single key rivals a whole average partition.
SKEW_HOT_THRESHOLD = 100_000


def skew_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    hot_threshold: int = SKEW_HOT_THRESHOLD,
    hot_key_limit: int = 64,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Skew-aware inner equi-join: hot left keys (≥ ``hot_threshold``
    rows) are routed around the hash exchange.

    A plain hash join sends every row of a hot key to ONE aggregator —
    the straggler that defines wall-clock on zipfian web keys (domain,
    user-agent, empty-string).  Plan:

    1. Hot-key census: Misra-Gries candidates over the left key column
       (:func:`..ops.sketch.heavy_hitter_candidates` — ≤ capacity rows
       per block cross the wire) keep keys whose exact recount ≥
       ``hot_threshold``; at most ``hot_key_limit`` keys qualify.
    2. Hot stream: left rows with hot keys never shuffle — the right
       side's hot-key rows (dimension-sided by assumption, guarded by
       ``BROADCAST_ROW_LIMIT``) broadcast once and probe per batch.
    3. Cold stream: both sides filter the hot keys OUT and take the
       normal hash exchange, now skew-free.

    Output = hot ∪ cold, column-compatible with :func:`hash_join`
    (both sides must share the key NAME; the right key column is
    consumed).  Requires ``how='inner'`` semantics."""
    from .sketch import heavy_hitter_candidates, heavy_hitters_topk

    cand = heavy_hitters_topk(
        left, on, k=hot_key_limit, capacity=max(4 * hot_key_limit, 256)
    ).to_pandas()
    hot = cand[cand["cnt"] >= int(hot_threshold)][on]
    if not len(hot):
        return hash_join(left, right, on=(on,), num_partitions=num_partitions)
    hot_arr = pa.array(sorted(hot.tolist()))
    ref = ray.put(hot_arr)

    def _keep_hot(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t[on], value_set=ray.get(ref)))

    def _keep_cold(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(pc.is_in(t[on], value_set=ray.get(ref))))

    right_hot = right.map_batches(_keep_hot, batch_format="pyarrow")
    hot_joined = broadcast_join(
        left.map_batches(_keep_hot, batch_format="pyarrow"),
        right_hot,
        on=(on,),
    )
    cold_joined = hash_join(
        left.map_batches(_keep_cold, batch_format="pyarrow"),
        right.map_batches(_keep_cold, batch_format="pyarrow"),
        on=(on,),
        num_partitions=num_partitions,
    )
    # union needs bit-identical schemas AND homogeneous block types:
    # the broadcast probe emits pandas blocks while Acero emits Arrow —
    # a mixed union crashes downstream iter_batches (DelegatingBlock-
    # Builder asserts one block type).  Pin both branches to the
    # hash_join column order and coerce to Arrow blocks.
    cols = list(left.columns()) + [c for c in right.columns() if c != on]

    def _arrow(t: pa.Table) -> pa.Table:
        return t

    return (
        hot_joined.select_columns(cols)
        .map_batches(_arrow, batch_format="pyarrow")
        .union(
            cold_joined.select_columns(cols)
            .map_batches(_arrow, batch_format="pyarrow")
        )
    )


# combine functions for folding a PRIOR aggregate into a fresh delta
# aggregate — each distributive agg re-aggregates with the fn on the
# right (sum of sums, min of mins, …)
_INCREMENTAL_COMBINE = {
    "sum": "sum",
    "count": "sum",
    "count_star": "sum",
    "min": "min",
    "max": "max",
}


def incremental_aggregate(
    prior: "ray.data.Dataset",
    delta: "ray.data.Dataset",
    keys: Sequence[str],
    specs: Sequence[tuple],
    partitions: int | None = None,
) -> "ray.data.Dataset":
    """Incremental view maintenance for distributive aggregates: fold a
    raw ``delta`` stream into a PRIOR materialized aggregate table
    (produced by :func:`grouped_aggregate` with the same ``specs``)
    without touching the historical raw data.

    ``new = combine(prior ∪ grouped_aggregate(delta))`` — at 100 TB the
    prior table is O(#groups) and the delta is the day's partition, so
    the nightly refresh costs |delta| + #groups instead of re-scanning
    the full history (the incremental sibling of `merge_upsert`; the
    reference instead re-runs its full-refresh sink each time,
    `lambda/process_segment_results/index.py:84-107`).

    Only distributive aggs fold (sum/count/min/max); avg is the caller
    maintaining sum+count pairs (SQL semantics: Σsum/Σcount at read).
    Bit-equal to a full recompute — the oracle checks exactly that.
    """
    for fn, _in, _out in specs:
        if fn not in _INCREMENTAL_COMBINE:
            raise ValueError(
                f"{fn} is not incrementally foldable; maintain sum+count"
            )
    d_agg = grouped_aggregate(delta, keys, specs, partitions)
    cols = list(keys) + [out for _fn, _in, out in specs]
    combine_specs = [
        (_INCREMENTAL_COMBINE[fn], out, out) for fn, _in, out in specs
    ]

    def _pd(df: pd.DataFrame) -> pd.DataFrame:
        return df[cols]

    # column-order + block-type normalize both sides before the union
    both = prior.map_batches(_pd, batch_format="pandas").union(
        d_agg.map_batches(_pd, batch_format="pandas")
    )
    return grouped_aggregate(both, keys, combine_specs, partitions)


def table_diff(
    old: "ray.data.Dataset",
    new: "ray.data.Dataset",
    key: str,
    compare_cols: Sequence[str],
    partitions: int = 32,
) -> "ray.data.Dataset":
    """CDC diff between two versions of a key-unique table: one row per
    DIFFERING key — ``change`` ∈ {added, removed, changed} plus the
    comma-joined names of the columns that changed (empty for
    added/removed).  The reverse of :func:`merge_upsert` /
    `scd.scd2_apply`: those APPLY a delta, this RECOVERS the delta two
    full-refresh snapshots imply (the reference only ever has the
    snapshots, `lambda/process_segment_results/index.py:84-107`).

    Plan: each side projects to ``key`` + ``compare_cols`` + a 1-byte
    side tag — payload columns outside the compare set never leave the
    scan — then ONE shared hash exchange on the key's hash co-locates
    the ≤ 2 rows per key, and a vectorized per-partition merge
    classifies.  Output is O(|delta|), not O(|table|).
    """
    compare_cols = list(compare_cols)
    cols = [key] + compare_cols

    def _tag(side: int):
        def _fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df[cols].copy()
            df["_side"] = np.int8(side)
            df["_part"] = (
                pd.util.hash_pandas_object(df[key], index=False).to_numpy()
                % partitions
            ).astype("int32")
            return df

        return _fn

    both = old.map_batches(_tag(0), batch_format="pandas").union(
        new.map_batches(_tag(1), batch_format="pandas")
    )

    def _classify(g: pd.DataFrame) -> pd.DataFrame:
        a = g[g["_side"] == 0]
        b = g[g["_side"] == 1]
        if a[key].duplicated().any() or b[key].duplicated().any():
            raise ValueError("table_diff requires key-unique sides")
        m = a.merge(b, on=key, how="outer", suffixes=("_old", "_new"),
                    indicator=True)
        added = m["_merge"].eq("right_only").to_numpy()
        removed = m["_merge"].eq("left_only").to_numpy()
        names = np.full(len(m), "", dtype=object)
        any_diff = np.zeros(len(m), bool)
        in_both = m["_merge"].eq("both").to_numpy()
        for c in compare_cols:
            o, n = m[f"{c}_old"], m[f"{c}_new"]
            d = in_both & ~((o == n) | (o.isna() & n.isna())).to_numpy()
            names = np.where(d, names + (c + ","), names)
            any_diff |= d
        out = pd.DataFrame(
            {
                key: m[key],
                "change": np.select(
                    [added, removed, any_diff],
                    ["added", "removed", "changed"],
                    default="",
                ),
                "changed_cols": pd.Series(names, index=m.index)
                .str.rstrip(",")
                .to_numpy(object),
            }
        )
        return out[out["change"] != ""]

    return both.groupby("_part").map_groups(_classify, batch_format="pandas")


__all__.append("table_diff")


def grouped_count_distinct(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    value_col: str,
    out_col: str | None = None,
    partitions: int | None = None,
) -> "ray.data.Dataset":
    """Exact ``COUNT(DISTINCT value) GROUP BY keys`` as two combiner
    shuffles of slim pairs: (keys, value) dedups per batch, merges per
    key-hash partition (stage 1 = :func:`grouped_aggregate` keyed on
    the pair), then the distinct pairs count per key (stage 2).  Only
    (keys, value) tuples ever cross the wire — once each after the
    per-batch dedup — so a hot value repeated millions of times costs
    one partial row per block.  For approximate at lower cost see the
    KMV sketch (`sketch.kmv_distinct`)."""
    out_col = out_col or f"n_distinct_{value_col}"
    keys = list(keys)
    pairs = grouped_aggregate(
        ds.select_columns(keys + [value_col]),
        keys + [value_col],
        [("count", value_col, "_pair_n")],
        partitions,
    )
    return grouped_aggregate(
        pairs, keys, [("count", value_col, out_col)], partitions
    )


__all__.append("grouped_count_distinct")


def grouped_rollup(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    specs: Sequence[tuple],
    sentinel: str = "(all)",
    partitions: int | None = None,
) -> "ray.data.Dataset":
    """``GROUP BY ROLLUP(keys)`` in ONE combiner shuffle: every prefix
    level (full detail → subtotals → grand total) aggregated together,
    with rolled-up key columns holding ``sentinel``.

    Each batch computes its full-level partial once, then folds it
    upward level by level IN the batch — so the exchange ships
    ≤ Σ-levels partial rows per block (the shallow levels collapse to
    a handful of rows), never raw rows, and never one shuffle per
    level.  ``specs`` are the incrementally-foldable aggregates
    (sum/count/count_star/min/max); avg is sum+count maintained by the
    caller, as everywhere in this engine.  Key columns must be strings
    (the sentinel becomes a value in them; guarded)."""
    keys = list(keys)
    if not keys:
        raise ValueError("rollup needs at least one key")
    for fn, _in, _out in specs:
        if fn not in _INCREMENTAL_COMBINE:
            raise ValueError(f"{fn} is not rollup-foldable; maintain sum+count")
    outs = [out for _fn, _in, out in specs]
    combine = {out: _INCREMENTAL_COMBINE[fn] for fn, _in, out in specs}
    cols = keys + outs

    def _local(df: pd.DataFrame) -> pd.DataFrame:
        for k in keys:
            col = df[k]
            if (col == sentinel).any():
                raise ValueError(
                    f"rollup sentinel {sentinel!r} occurs in column {k!r}"
                )
        gb = df.groupby(keys, sort=False, dropna=False)
        part = gb.size().reset_index()[keys]
        for fn, in_col, out in specs:
            if fn == "count_star":
                part[out] = gb.size().to_numpy(np.int64)
            elif fn == "count":
                part[out] = gb[in_col].count().to_numpy(np.int64)
            else:
                part[out] = getattr(gb[in_col], fn)().to_numpy()
        frames = [part]
        cur = part
        for lvl in range(len(keys) - 1, -1, -1):
            kept = keys[:lvl]
            if kept:
                g2 = cur.groupby(kept, sort=False, dropna=False)
                nxt = g2.size().reset_index()[kept]
                for out in outs:
                    nxt[out] = getattr(g2[out], combine[out])().to_numpy()
            else:
                nxt = pd.DataFrame(
                    {out: [getattr(cur[out], combine[out])()] for out in outs}
                )
            cur = nxt
            lvl_rows = nxt.copy()
            for k in keys[lvl:]:
                lvl_rows[k] = sentinel
            frames.append(lvl_rows[cols])
        return pd.concat(
            [f[cols] for f in frames], ignore_index=True
        )

    partials = ds.select_columns(
        list(dict.fromkeys(keys + [c for _f, c, _o in specs if c]))
    ).map_batches(_local, batch_format="pandas")
    combine_specs = [(combine[out], out, out) for out in outs]
    return grouped_aggregate(partials, keys, combine_specs, partitions)


__all__.append("grouped_rollup")


def grouped_cube(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    specs: Sequence[tuple],
    sentinel: str = "(all)",
    partitions: int | None = None,
) -> "ray.data.Dataset":
    """``GROUP BY CUBE(keys)`` in ONE combiner shuffle: every key
    subset (2^|keys| groupings) aggregated together, rolled-up key
    cells holding ``sentinel``.

    Same transport posture as :func:`grouped_rollup`: each batch
    computes its full-level partial ONCE, then re-folds that partial
    (never the raw rows) for every proper subset in-batch, so the
    exchange ships ≤ Σ-subsets partial rows per block.  The subset
    count is 2^|keys| — CUBE is for low-cardinality key tuples (2-4
    dimension columns), which is also the only shape where the SQL
    form is useful.  ``specs`` are the incrementally-foldable
    aggregates; key columns must be strings (sentinel guard as in
    rollup)."""
    from itertools import combinations

    keys = list(keys)
    if not keys:
        raise ValueError("cube needs at least one key")
    if len(keys) > 6:
        raise ValueError("cube over >6 keys explodes 2^k groupings")
    for fn, _in, _out in specs:
        if fn not in _INCREMENTAL_COMBINE:
            raise ValueError(f"{fn} is not cube-foldable; maintain sum+count")
    outs = [out for _fn, _in, out in specs]
    combine = {out: _INCREMENTAL_COMBINE[fn] for fn, _in, out in specs}
    cols = keys + outs

    def _local(df: pd.DataFrame) -> pd.DataFrame:
        for k in keys:
            if (df[k] == sentinel).any():
                raise ValueError(
                    f"cube sentinel {sentinel!r} occurs in column {k!r}"
                )
        gb = df.groupby(keys, sort=False, dropna=False)
        part = gb.size().reset_index()[keys]
        for fn, in_col, out in specs:
            if fn == "count_star":
                part[out] = gb.size().to_numpy(np.int64)
            elif fn == "count":
                part[out] = gb[in_col].count().to_numpy(np.int64)
            else:
                part[out] = getattr(gb[in_col], fn)().to_numpy()
        frames = [part[cols]]
        for r in range(len(keys) - 1, -1, -1):
            for kept in combinations(keys, r):
                if kept == tuple(keys):
                    continue
                kept = list(kept)
                if kept:
                    g2 = part.groupby(kept, sort=False, dropna=False)
                    nxt = g2.size().reset_index()[kept]
                    for out in outs:
                        nxt[out] = getattr(g2[out], combine[out])().to_numpy()
                else:
                    nxt = pd.DataFrame(
                        {out: [getattr(part[out], combine[out])()]
                         for out in outs}
                    )
                for k in keys:
                    if k not in kept:
                        nxt[k] = sentinel
                frames.append(nxt[cols])
        return pd.concat(frames, ignore_index=True)

    partials = ds.select_columns(
        list(dict.fromkeys(keys + [c for _f, c, _o in specs if c]))
    ).map_batches(_local, batch_format="pandas")
    combine_specs = [(combine[out], out, out) for out in outs]
    return grouped_aggregate(partials, keys, combine_specs, partitions)


__all__.append("grouped_cube")


def dense_ids(
    ds: "ray.data.Dataset",
    col: str,
    salt: str = "ids",
    out_col: str = "dense_id",
) -> "ray.data.Dataset":
    """Contiguous deterministic ids ``0..n_distinct-1`` for the
    distinct values of ``col`` — the embedding-table remap every
    learned model (the ALS path, `pipelines/affinity.py`) needs before
    its factor matrices can be dense arrays.

    Order is content-defined (the md5 rank of
    `sampling.deterministic_shuffle_rank`), NOT partition- or
    arrival-order — the same corpus yields the same mapping on any
    cluster shape, so a resumed run never scrambles ids.  Plan: one
    distinct-combiner shuffle + one slim (value, hash) rank exchange;
    attach back with a broadcast/hash join (`auto_join`).
    """
    from .sampling import deterministic_shuffle_rank

    vals = distinct(ds, [col])
    ranks = deterministic_shuffle_rank(vals, id_col=col, salt=salt)

    def _rn(df: pd.DataFrame) -> pd.DataFrame:
        return df.rename(columns={"shuffle_pos": out_col})

    return ranks.map_batches(_rn, batch_format="pandas")


__all__.append("dense_ids")


def target_encode_loo(
    ds: "ray.data.Dataset",
    cat_col: str,
    target_col: str,
    out_col: str = "loo_mean",
    partitions: int | None = None,
) -> "ray.data.Dataset":
    """Leave-one-out target (mean) encoding: each row gets the mean of
    ``target_col`` over the OTHER rows of its category —
    ``(Σy − y) / (n − 1)``, NaN/NULL for singleton categories.  The
    leakage-resistant categorical encoding for supervised training
    (plain target-mean encoding leaks the row's own label).

    Same shape as :func:`standardize`: per-category (Σy, n) ride the
    grouped_aggregate combiner (one partial row per block × category),
    come back as an O(#categories) broadcast, and the encoding applies
    in one streaming map — rows never shuffle."""
    sums = grouped_aggregate(
        ds.select_columns([cat_col, target_col]),
        keys=[cat_col],
        specs=[("sum", target_col, "_s"), ("count", target_col, "_n")],
        partitions=partitions,
    ).to_pandas()
    ref = ray.put(sums)

    def _attach(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.merge(ray.get(ref), on=cat_col, how="left")
        y = out[target_col].to_numpy(np.float64)
        s = out["_s"].to_numpy(np.float64)
        n = out["_n"].to_numpy(np.float64)
        loo = np.divide(
            s - y, n - 1.0, out=np.full(len(y), np.nan), where=n > 1.0
        )
        out = out.drop(columns=["_s", "_n"])
        out[out_col] = loo
        return out

    return ds.map_batches(_attach, batch_format="pandas")


__all__.append("target_encode_loo")


def one_hot(
    ds: "ray.data.Dataset",
    cat_col: str,
    categories: "Sequence[str] | None" = None,
    prefix: str | None = None,
) -> "ray.data.Dataset":
    """One-hot encode a LOW-cardinality categorical column: one int64
    ``{prefix}_{value}`` column per category (1/0), appended to every
    row.  Unknown values (not in ``categories``) encode as all-zero.

    ``categories=None`` discovers them with one distinct combiner
    shuffle and sorts for a deterministic column order — the category
    set must be column-count-sized (dozens), which is the only regime
    one-hot is for; use :func:`frequency_encode` or
    :func:`target_encode_loo` above that.  Encoding itself is one
    stateless streaming map (vectorized ``==`` per category)."""
    pre = prefix or cat_col
    if categories is None:
        cats = dedupe_by_key(
            ds.select_columns([cat_col]), [cat_col]
        ).to_pandas()[cat_col]
        categories = sorted(cats.astype(str).tolist())
    categories = list(categories)
    if len(categories) > 256:
        raise ValueError(
            f"{len(categories)} categories — one-hot is for dozens; "
            "use frequency/target encoding for high cardinality"
        )

    def _encode(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        v = batch[cat_col].astype(str).to_numpy(object)
        for c in categories:
            out[f"{pre}_{c}"] = (v == c).astype(np.int64)
        return out

    return ds.map_batches(_encode, batch_format="pandas")


__all__.append("one_hot")


def time_band_pairs(
    ds: "ray.data.Dataset",
    key: str,
    ts_col: str,
    id_col: str,
    band_us: int,
    anchor_cap: int | None = None,
    partitions: int | None = None,
) -> "ray.data.Dataset":
    """Sliding-window self-join: every ordered pair of rows sharing
    ``key`` with ``0 < ts_b − ts_a ≤ band_us`` — the co-occurrence /
    burst-detection primitive (events of one user within Δ of each
    other) that a naive equi-self-join + filter would compute by
    materializing the full per-key cross product first.

    ONE key-hash exchange; each partition sorts once by
    (key, ts, id) and emits pairs with a fully vectorized
    searchsorted + repeat/arange sweep — no per-row loop, no per-key
    Python call.  Output: ``(key, a_id, b_id, gap_us)``.

    Skew: a key with k rows inside one band window emits O(k²) pairs —
    that is the OPERATOR'S OUTPUT, not transport overhead (the oracle
    has the same cardinality).  ``anchor_cap`` bounds each anchor to
    its first ``cap`` successors when downstream only needs bounded
    context (the blocking-cap pattern); None = exact.
    """
    import numpy as np

    P = partitions or DEDUP_PARTITIONS

    def _part(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[key, ts_col, id_col]].copy()
        out["_part"] = (
            pd.util.hash_array(df[key].to_numpy()) % P
        ).astype("int32")
        return out

    def _sweep(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col, id_col], kind="mergesort")
        t = g[ts_col].to_numpy("datetime64[us]").astype(np.int64)
        ids = g[id_col].to_numpy()
        k = g[key].to_numpy()
        n = len(g)
        if n < 2:
            return pd.DataFrame(
                {key: k[:0], "a_id": ids[:0], "b_id": ids[:0],
                 "gap_us": t[:0]}
            )
        # t is sorted only WITHIN each key run — rebase every run onto a
        # disjoint segment of one strictly-ordered axis so a single
        # global searchsorted finds each anchor's window AND can never
        # cross a run boundary (the next run starts > band past this one)
        run_start = np.concatenate(
            [[0], np.nonzero(k[1:] != k[:-1])[0] + 1]
        )
        run = np.cumsum(
            np.concatenate([[0], (k[1:] != k[:-1]).astype(np.int64)])
        )
        t_rel = t - t[run_start][run]
        run_last = np.concatenate([run_start[1:], [n]]) - 1
        span = t_rel[run_last]
        base = np.concatenate(
            [[0], np.cumsum(span + band_us + 1)[:-1]]
        )
        s = base[run] + t_rel
        hi = np.searchsorted(s, s + band_us, side="right")
        lo = np.arange(n) + 1
        cnt = np.maximum(hi - lo, 0)
        if anchor_cap is not None:
            cnt = np.minimum(cnt, anchor_cap)
        total = int(cnt.sum())
        if total == 0:
            return pd.DataFrame(
                {key: k[:0], "a_id": ids[:0], "b_id": ids[:0],
                 "gap_us": t[:0]}
            )
        ia = np.repeat(np.arange(n), cnt)
        start = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        ib = ia + 1 + (np.arange(total) - np.repeat(start, cnt))
        # equal-ts rows sort adjacent: drop gap == 0 (strict ts_b > ts_a)
        gap = t[ib] - t[ia]
        keep = gap > 0
        return pd.DataFrame(
            {key: k[ia][keep], "a_id": ids[ia][keep],
             "b_id": ids[ib][keep], "gap_us": gap[keep]}
        )

    return (
        ds.select_columns([key, ts_col, id_col])
        .map_batches(_part, batch_format="pandas")
        .groupby("_part")
        .map_groups(
            lambda g: _sweep(g.drop(columns=["_part"])),
            batch_format="pandas",
        )
    )


__all__.append("time_band_pairs")


def grouped_concat(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    col: str,
    order_cols: Sequence[str],
    sep: str = ",",
    out_col: str = "concat",
) -> "ray.data.Dataset":
    """SQL ``string_agg(col, sep ORDER BY order_cols)`` per group — the
    list-collection idiom (basket strings, path features, debug dumps).
    One hash exchange on ``keys``; each group sorts its own rows and
    joins the stringified values (values cross the shuffle once, as
    strings).  Output: ``(*keys, out_col, n)``.  A hot key's rows land
    whole in one partition — by construction of an ordered concat (the
    output row IS the group); cap upstream if a group can exceed a
    worker's heap."""
    keys = list(keys)
    order_cols = list(order_cols)

    def _fn(g: pd.DataFrame) -> pd.DataFrame:
        srt = g.sort_values(order_cols, kind="mergesort")
        vals = srt[col].astype(str)
        return pd.DataFrame(
            {
                **{k: [g[k].iloc[0]] for k in keys},
                out_col: [sep.join(vals)],
                "n": [np.int64(len(g))],
            }
        )

    return ds.select_columns(
        list(dict.fromkeys([*keys, col, *order_cols]))
    ).groupby(keys).map_groups(_fn, batch_format="pandas")


__all__.append("grouped_concat")
