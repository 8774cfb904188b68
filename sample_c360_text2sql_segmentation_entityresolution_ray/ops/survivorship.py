"""Golden-record survivorship: collapse each ER cluster into ONE
integrated profile — the "integrated customer" the reference's C360
flow ultimately serves (`lib/data-storage.ts:154-218` stores the
MatchID clusters; the golden record is what a 360 view reads off them).

Rule encoded here (the classic MDM stack): source priority, then
recency, then a stable id tie-break — the top-ranked record donates
every surviving field; cluster-level stats (record count, first/last
seen) aggregate over all members.

Scale shape: ONE hash exchange partitioned by cluster id; within each
partition the survivor pick is a vectorized sort + drop_duplicates and
the stats are a groupby — no driver collection, no second shuffle (the
stats ride the same partition as the pick).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

import ray.data


def golden_records(
    ds: "ray.data.Dataset",
    cluster_col: str,
    field_cols: Sequence[str],
    priority_col: str,
    priority_value,
    recency_col: str,
    id_col: str,
    partitions: int | None = None,
) -> "ray.data.Dataset":
    """One golden row per ``cluster_col`` value.

    Survivor = first record by (``priority_col == priority_value``
    desc, ``recency_col`` desc, ``id_col`` asc); it donates
    ``field_cols`` (and its ``recency_col``).  Adds ``n_records``
    (int64), ``first_seen`` / ``last_seen`` (min/max of
    ``recency_col``).  Output sorted by ``cluster_col``.
    """
    from .relational import DEDUP_PARTITIONS

    P = partitions or DEDUP_PARTITIONS
    field_cols = list(field_cols)
    need = [cluster_col, priority_col, recency_col, id_col] + [
        c for c in field_cols if c not in
        (cluster_col, priority_col, recency_col, id_col)
    ]

    def _part(df: pd.DataFrame) -> pd.DataFrame:
        df = df[need].copy()
        df["_part"] = (
            pd.util.hash_pandas_object(df[cluster_col], index=False)
            .to_numpy() % P
        ).astype("int32")
        return df

    def _pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_part"])
        stats = g.groupby(cluster_col, sort=False).agg(
            n_records=(recency_col, "size"),
            first_seen=(recency_col, "min"),
            last_seen=(recency_col, "max"),
        ).reset_index()
        g = g.assign(_pri=(g[priority_col] == priority_value))
        g = g.sort_values(
            ["_pri", recency_col, id_col],
            ascending=[False, False, True],
            kind="mergesort",
        )
        surv = g.drop_duplicates(cluster_col, keep="first").drop(
            columns=["_pri"]
        )
        out = surv.merge(stats, on=cluster_col)
        out["n_records"] = out["n_records"].astype(np.int64)
        return out

    return (
        ds.map_batches(_part, batch_format="pandas")
        .groupby("_part")
        .map_groups(_pick, batch_format="pandas")
        .sort(cluster_col)
    )


__all__ = ["golden_records"]
