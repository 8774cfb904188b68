"""Interactions build + item-affinity segmentation (Personalize analog).

The reference hands these to managed services; the semantics rebuilt:

1. :func:`build_interactions` — the dataset-import SQL
   (`lambda/create_personalize_dataset_import_job/index.py:35-57`):
   each brand's purchase history inner-joined to ``integrated_customer``
   on ``customer_id = RecordId`` (J1), user remapped to ``MatchID``
   (M2), subbrand item ids prefixed ``sub_`` (M3), UNION ALL (U1).
   The cluster map is the broadcast-small side (it is one row per
   customer; the purchase stream is the big side).
2. :func:`item_cooccurrence` — item-item distinct-user co-purchase
   counts.  The stand-in for the ``aws-item-affinity`` recipe's learned
   similarities (`lib/personalize.ts:91`) — same pipeline shape,
   transparent model.  Pair emission is the partition-hash vectorized
   diagonal sweep (same kernel family as ``ops.dedup``), never a
   per-user ``map_groups``.
3. :func:`item_based_segments` — the batch segment job
   (`lambda/create_personalize_segment/index.py:174-205`): for each
   requested item, score every user by summed co-occurrence of their
   (distinct, capped) purchased items with the target, EXCLUDE users
   who already bought it (the anti-join the NL workload demands,
   README.md:14), keep the top ``n`` users (``USER_PER_SEGMENT`` = 100
   default, `:14`).  Output = ``item_based_segment``
   (`lib/data-storage.ts:360-386`).

Scale posture: the only data ever collected to the driver is the
TARGET-restricted co-occurrence table (≤ |items| × |targets| rows —
the restriction is pushed INSIDE the pair sweep, so the full
O(|items|²) co-occurrence table is never materialized anywhere), and
every per-batch kernel is vectorized pandas/numpy.

Exact semantics (shared with the DuckDB oracle in `__ray_entry__`):
    ui        = DISTINCT (USER_ID, ITEM_ID), capped at
                ``max_items_per_user`` smallest ITEM_IDs per user
                (row_number() OVER (PARTITION BY user ORDER BY item))
    cooc(x,y) = |{u : (u,x) ∈ ui ∧ (u,y) ∈ ui}|  for x < y
    aff(u,t)  = Σ_{i ∈ ui(u)} cooc(min(i,t), max(i,t))   [i ≠ t]
    segment(t) = top-n users by aff(u,t) DESC, user_id ASC,
                 excluding users with (u,t) ∈ ui
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..ops.relational import (
    DEDUP_PARTITIONS,
    broadcast_join,
    topn_per_group,
    union_with_prefix,
)

USER_PER_SEGMENT = 100
MAX_ITEMS_PER_USER = 50  # cap on per-user pair fan-out (quadratic guard)


def build_interactions(
    purchases_main, purchases_sub, integrated
) -> "ray.data.Dataset":
    """(USER_ID, ITEM_ID, TIMESTAMP) — the Personalize import table."""
    # materialized: the map is broadcast-collected by BOTH brand joins —
    # without this the upstream attach pass would execute twice
    cluster_map = integrated.select_columns(["RecordId", "MatchID"]).materialize()

    def _join(purchases):
        joined = broadcast_join(
            purchases, cluster_map, on=["customer_id"], right_on=["RecordId"]
        )

        # pyarrow output keeps every block Arrow — a union of pandas and
        # Arrow blocks breaks Ray's sort/groupby boundary sampler
        def _proj(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "USER_ID": batch["MatchID"],
                    "ITEM_ID": batch["item_id"],
                    "TIMESTAMP": batch["purchase_date"],
                }
            )

        return joined.map_batches(_proj, batch_format="pyarrow")

    return union_with_prefix(
        _join(purchases_main), _join(purchases_sub), key_col="ITEM_ID", prefix="sub_"
    )


def _ui_local(max_items_per_user: int | None):
    """Per-batch distinct + per-user cap + user-hash partition id — the
    pre-shuffle shrink shared by every user-partitioned pass (the global
    per-user winners are a subset of the union of per-batch winners)."""

    def _local(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["USER_ID", "ITEM_ID"]].drop_duplicates()
        df = df.sort_values(["USER_ID", "ITEM_ID"], kind="mergesort")
        if max_items_per_user:
            df = df.groupby("USER_ID", sort=False).head(max_items_per_user)
        df = df.copy()
        df["_part"] = (
            pd.util.hash_array(df["USER_ID"].to_numpy()) % DEDUP_PARTITIONS
        ).astype("int32")
        return df

    return _local


def _ui_finish(g: pd.DataFrame, max_items_per_user: int | None) -> pd.DataFrame:
    """Exact per-partition distinct + cap (all of a user's rows are
    co-located after the user-hash shuffle)."""
    g = g.drop_duplicates(["USER_ID", "ITEM_ID"]).sort_values(
        ["USER_ID", "ITEM_ID"], kind="mergesort"
    )
    if max_items_per_user:
        g = g.groupby("USER_ID", sort=False).head(max_items_per_user)
    return g.drop(columns="_part")


def user_items(
    interactions, max_items_per_user: int | None = MAX_ITEMS_PER_USER
) -> "ray.data.Dataset":
    """DISTINCT (USER_ID, ITEM_ID), capped per user at the
    ``max_items_per_user`` lexicographically-smallest items (the
    deterministic, SQL-expressible cap: row_number() over item order).

    ONE user-hash groupby does both (distinct + cap)."""
    return (
        interactions.select_columns(["USER_ID", "ITEM_ID"])
        .map_batches(_ui_local(max_items_per_user), batch_format="pandas")
        .groupby("_part")
        .map_groups(
            lambda g: _ui_finish(g, max_items_per_user), batch_format="pandas"
        )
    )


_PAIRS_EMPTY = pd.DataFrame(
    {
        "item_x": pd.Series(dtype=object),
        "item_y": pd.Series(dtype=object),
        "cnt": pd.Series(dtype=np.int64),
    }
)


def _pairs_partial(g: pd.DataFrame, targets: frozenset | None) -> pd.DataFrame:
    """Per-user co-purchase pairs within one user-hash partition, as
    partially-aggregated (item_x, item_y, cnt) with x < y.  Runs of
    equal USER_ID (sorted) → diagonal sweep d = 1..D emits every
    within-run pair in O(D) vectorized passes; rows are item-sorted
    inside each run so item_x < item_y for free.  ``targets``: if set,
    only pairs touching a target survive — the restriction runs before
    anything is counted."""
    g = g.sort_values(["USER_ID", "ITEM_ID"], kind="mergesort")
    users = g["USER_ID"].to_numpy()
    items = g["ITEM_ID"].to_numpy()
    if len(g) < 2:
        return _PAIRS_EMPTY
    _, counts = np.unique(users, return_counts=True)
    gid = np.repeat(np.arange(len(counts)), counts)
    D = int(counts.max() - 1)
    ii_l, jj_l = [], []
    for d in range(1, D + 1):
        same = gid[:-d] == gid[d:]
        i = np.flatnonzero(same)
        if len(i):
            ii_l.append(i)
            jj_l.append(i + d)
    if not ii_l:
        return _PAIRS_EMPTY
    ii = np.concatenate(ii_l)
    jj = np.concatenate(jj_l)
    x, y = items[ii], items[jj]
    if targets is not None:
        keep = (
            pd.Series(x).isin(targets) | pd.Series(y).isin(targets)
        ).to_numpy()
        x, y = x[keep], y[keep]
    if len(x) == 0:
        return _PAIRS_EMPTY
    # partial aggregation inside the partition (pre-shuffle shrink)
    part = (
        pd.DataFrame({"item_x": x, "item_y": y})
        .groupby(["item_x", "item_y"], sort=False)
        .size()
        .reset_index(name="cnt")
    )
    part["cnt"] = part["cnt"].astype(np.int64)
    return part


def _pair_sweep(
    ui, targets: frozenset | None, final_agg: str = "dataset"
) -> "ray.data.Dataset | pd.DataFrame":
    """(item_x, item_y, cnt) with x < y: per-user pair emission via the
    partition-hash vectorized diagonal sweep + per-partition partial
    counts (the pre-aggregation that keeps the final combine small).
    ``targets``: if set, only pairs touching a target are emitted —
    the restriction runs INSIDE the sweep, before anything is counted.

    ``final_agg``: "dataset" runs the global combine as a Ray groupby
    (the general path); "driver" streams the per-partition partials to
    the driver and combines in pandas — correct whenever the caller
    would collect the result anyway (target-restricted tables are
    ≤ |items| × |targets| rows), and saves one shuffle barrier."""

    def _part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_part"] = (
            pd.util.hash_array(batch["USER_ID"].to_numpy()) % DEDUP_PARTITIONS
        ).astype("int32")
        return batch

    partials = (
        ui.map_batches(_part, batch_format="pandas")
        .groupby("_part")
        .map_groups(
            lambda g: _pairs_partial(g, targets), batch_format="pandas"
        )
    )
    if final_agg == "driver":
        pieces = [
            b
            for b in partials.iter_batches(batch_size=None, batch_format="pandas")
        ]
        df = (
            pd.concat(pieces, ignore_index=True)
            if pieces
            else pd.DataFrame(
                {
                    "item_x": pd.Series(dtype=object),
                    "item_y": pd.Series(dtype=object),
                    "cnt": pd.Series(dtype=np.int64),
                }
            )
        )
        out = df.groupby(["item_x", "item_y"], sort=False)["cnt"].sum().reset_index()
        out["cnt"] = out["cnt"].astype(np.int64)
        return out
    from ray.data.aggregate import Sum

    return partials.groupby(["item_x", "item_y"]).aggregate(
        Sum("cnt", alias_name="cnt")
    )


def item_cooccurrence(
    interactions, max_items_per_user: int | None = MAX_ITEMS_PER_USER
) -> "ray.data.Dataset":
    """Full (item_x, item_y, cnt) distinct-user co-purchase counts."""
    return _pair_sweep(user_items(interactions, max_items_per_user), None)


def item_based_segments(
    interactions,
    target_items: list[str],
    n: int = USER_PER_SEGMENT,
    max_items_per_user: int | None = MAX_ITEMS_PER_USER,
    driver_max_rows: int = 2_000_000,
) -> "ray.data.Dataset":
    """Top-``n`` users per target item by co-occurrence affinity,
    excluding prior purchasers.  Returns (item_id, user_id, affinity).

    The co-occurrence table is TARGET-restricted inside the pair sweep,
    so the only driver-collected table is ≤ |items| × |targets| rows;
    scoring is one vectorized merge + one grouped sum over the
    distinct user-item stream.

    Measured-size switch (the `resolve_labels` pattern): the shrunk
    user-item table is already materialized, so its row count is free —
    when it is ≤ ``driver_max_rows`` the two partition passes run as
    ONE pandas pass on the driver (the per-partition kernels are exact
    on any user-complete slice, and "all users" is one), skipping two
    Ray sort-shuffle barriers that cost seconds regardless of data
    size.  Above the threshold the user-hash partitioned path runs
    unchanged."""
    targets = frozenset(target_items)
    cap = max_items_per_user
    # per-batch distinct/cap shrink + user-hash partition id BEFORE
    # materializing: the stored bytes are ≤ the deduped user-item table,
    # and both downstream passes start from the same plasma blocks.
    # TWO barriers total (pair sweep, scoring) — the separate user_items
    # build is fused into each pass's group fn (exact there: all of a
    # user's rows share a partition).
    shrunk = (
        interactions.select_columns(["USER_ID", "ITEM_ID"])
        .map_batches(_ui_local(cap), batch_format="pandas")
        .materialize()
    )

    small = shrunk.count() <= driver_max_rows
    local_df = shrunk.to_pandas() if small else None

    # pass A — target-restricted co-occurrence partials; driver combine
    # (bounded: only pairs touching a target survive the sweep)
    def _pass_a(g: pd.DataFrame) -> pd.DataFrame:
        return _pairs_partial(_ui_finish(g, cap), targets)

    if small:
        pieces = [_pass_a(local_df)] if len(local_df) else []
    else:
        pieces = [
            b
            for b in shrunk.groupby("_part")
            .map_groups(_pass_a, batch_format="pandas")
            .iter_batches(batch_size=None, batch_format="pandas")
        ]
    cooc_raw = pd.concat(pieces, ignore_index=True) if pieces else _PAIRS_EMPTY
    cooc = (
        cooc_raw.groupby(["item_x", "item_y"], sort=False)["cnt"]
        .sum()
        .reset_index()
    )
    cooc["cnt"] = cooc["cnt"].astype(np.int64)
    # flatten to (other item → target, cnt); a pair of two targets
    # contributes in both directions
    parts = []
    if len(cooc):
        m_y = cooc[cooc["item_y"].isin(targets)]
        parts.append(
            pd.DataFrame(
                {"item": m_y["item_x"], "target": m_y["item_y"], "cnt": m_y["cnt"]}
            )
        )
        m_x = cooc[cooc["item_x"].isin(targets)]
        parts.append(
            pd.DataFrame(
                {"item": m_x["item_y"], "target": m_x["item_x"], "cnt": m_x["cnt"]}
            )
        )
    aff = (
        pd.concat(parts, ignore_index=True)
        if parts
        else pd.DataFrame(
            {
                "item": pd.Series(dtype=object),
                "target": pd.Series(dtype=object),
                "cnt": pd.Series(dtype=np.int64),
            }
        )
    )
    aff_ref = None if small else ray.put(aff)

    # pass B — scoring + prior-purchaser exclusion + per-target top-n,
    # fused into ONE user-hash partitioned pass (replaces a
    # scored-aggregate shuffle, an anti-join and a top-n shuffle):
    # every user's rows live entirely inside one partition group, so the
    # grouped affinity sum and the ownership exclusion are globally
    # exact there, and the global top-n per target is a subset of the
    # union of per-partition top-n's (each user is in exactly one
    # partition).  Driver combine is bounded: ≤ n × |targets| ×
    # DEDUP_PARTITIONS rows regardless of corpus size.

    _empty = pd.DataFrame(
        {
            "item_id": pd.Series(dtype=object),
            "user_id": pd.Series(dtype=object),
            "affinity": pd.Series(dtype=np.int64),
        }
    )

    def _score_slice(g: pd.DataFrame, aff_t: pd.DataFrame) -> pd.DataFrame:
        g = _ui_finish(g, cap)
        if not len(g) or not len(aff_t):
            return _empty
        m = g.merge(aff_t, left_on="ITEM_ID", right_on="item", how="inner")
        if not len(m):
            return _empty
        s = m.groupby(["USER_ID", "target"], sort=False)["cnt"].sum().reset_index()
        own = g.loc[g["ITEM_ID"].isin(targets), ["USER_ID", "ITEM_ID"]].rename(
            columns={"ITEM_ID": "target"}
        )
        s = s.merge(own.assign(_own=1), on=["USER_ID", "target"], how="left")
        s = s[s["_own"].isna()]
        s = s.sort_values(
            ["target", "cnt", "USER_ID"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        s = s.groupby("target", sort=False).head(n)
        return pd.DataFrame(
            {
                "item_id": s["target"].to_numpy(),
                "user_id": s["USER_ID"].to_numpy(),
                "affinity": s["cnt"].astype(np.int64).to_numpy(),
            }
        )

    if small:
        out = _score_slice(local_df, aff) if len(local_df) else _empty
    else:
        partials = shrunk.groupby("_part").map_groups(
            lambda g: _score_slice(g, ray.get(aff_ref)),
            batch_format="pandas",
        )
        pieces = [
            b
            for b in partials.iter_batches(
                batch_size=None, batch_format="pandas"
            )
        ]
        out = pd.concat(pieces, ignore_index=True) if pieces else _empty
    out = out.sort_values(
        ["item_id", "affinity", "user_id"],
        ascending=[True, False, True],
        kind="mergesort",
    )
    out = out.groupby("item_id", sort=False).head(n).reset_index(drop=True)
    return ray.data.from_pandas(out)


def write_segments_csv(
    segments: "ray.data.Dataset", path: str, single_file: bool = True
) -> int:
    """Reference-byte-format CSV sink for the segment table
    (`lambda/process_segment_results/index.py:108-143`): header row
    ``item_id,user_id`` then one row per (item, user) — the file
    Personalize-batch consumers ingest.  Returns the row count.

    ``single_file=True`` streams batches into ONE csv in
    (item_id, user_id) order — matching the reference, which merges
    all shards into one object; safe because a segment table is
    top-n-per-item = dimension-sized by construction.
    ``single_file=False`` writes partitioned part files via
    ``Dataset.write_csv`` (resumable layout) for callers with
    genuinely huge segment tables; the header appears once per part,
    as S3-select/Athena-style readers expect."""
    import csv

    cols = segments.select_columns(["item_id", "user_id"])
    if not single_file:
        cols.write_csv(path)
        return cols.count()
    df = cols.to_pandas().sort_values(["item_id", "user_id"], kind="mergesort")
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["item_id", "user_id"])
        w.writerows(df.itertuples(index=False, name=None))
    return len(df)


__all__ = [
    "build_interactions",
    "user_items",
    "item_cooccurrence",
    "item_based_segments",
    "write_segments_csv",
]
