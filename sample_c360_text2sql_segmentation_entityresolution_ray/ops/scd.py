"""SCD-2 history maintenance: fold a CDC delta into a slowly-changing
dimension WITHOUT rewriting history — every attribute change closes the
open version (``valid_to`` = effective ts) and appends a new open one.

Sibling of `relational.merge_upsert` (SCD-1, update-in-place) and
`relational.incremental_aggregate` (fact-side maintenance); together
they are the warehouse-maintenance trio the reference's full-refresh
sink sidesteps by rewriting whole prefixes
(`lambda/process_segment_results/index.py:84-107`).

Scale shape: the delta is CDC-sized by definition — it broadcasts once
(``ray.put``).  The dimension streams through ONE closing map (rows
with unchanged keys pass zero-copy); the change/new classification
needs the open attrs for delta keys only, a slim bounded collect.  No
shuffle of the dimension, ever."""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

import ray
import ray.data

from .relational import BROADCAST_ROW_LIMIT


def scd2_apply(
    current: "ray.data.Dataset",
    delta: "ray.data.Dataset",
    key: str,
    attrs: Sequence[str],
    eff_col: str = "eff",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> "ray.data.Dataset":
    """Apply ``delta`` (``key``, ``attrs``…, ``eff_col``) to the SCD-2
    table ``current`` (``key``, ``attrs``…, ``valid_from``,
    ``valid_to`` — NULL means open).

    Per delta key: unchanged attrs → no-op; changed attrs → the open
    row closes at ``eff`` and a new open version appends; unseen key →
    a new open row appends.  Output column order matches ``current``.
    """
    attrs = list(attrs)
    ddf = delta.select_columns([key] + attrs + [eff_col]).to_pandas()
    if len(ddf) > BROADCAST_ROW_LIMIT:
        raise ValueError(
            f"delta has {len(ddf)} rows > {BROADCAST_ROW_LIMIT}; a CDC "
            "delta is broadcast-sized — split the load into batches"
        )
    if ddf[key].duplicated().any():
        raise ValueError("delta must carry one row per key")
    dref = ray.put(ddf)

    # slim probe: open attrs for delta keys only (bounded by |delta|).
    # Ray 2.49's filter-expr parser has no `is null`, so the open-row
    # predicate rides inside the same pandas map as the key-membership
    # prune.
    open_now = (
        current.select_columns([key] + attrs + [valid_to])
        .map_batches(
            lambda df: df.loc[
                df[valid_to].isna() & df[key].isin(ray.get(dref)[key]),
                [key] + attrs,
            ],
            batch_format="pandas",
        )
        .to_pandas()
    )
    merged = ddf.merge(open_now, on=key, how="left",
                       suffixes=("", "_cur"), indicator=True)
    changed_mask = merged["_merge"].eq("both")
    same = np.ones(len(merged), bool)
    for a in attrs:
        cur = merged[f"{a}_cur"]
        new = merged[a]
        same &= (cur == new) | (cur.isna() & new.isna())
    is_new = merged["_merge"].eq("left_only").to_numpy()
    is_changed = (changed_mask.to_numpy()) & (~same)
    changed_keys = set(merged.loc[is_changed, key])
    close_at = dict(
        zip(merged.loc[is_changed, key], merged.loc[is_changed, eff_col])
    )
    cref = ray.put((changed_keys, close_at))

    cols = list(current.columns())

    def _close(df: pd.DataFrame) -> pd.DataFrame:
        keys, at = ray.get(cref)
        mask = df[key].isin(keys) & df[valid_to].isna()
        if mask.any():
            df = df.copy()
            df.loc[mask, valid_to] = df.loc[mask, key].map(at)
        return df[cols]

    new_rows = merged.loc[is_changed | is_new, [key] + attrs + [eff_col]].copy()
    new_rows = new_rows.rename(columns={eff_col: valid_from})
    new_rows[valid_to] = pd.Series(
        [pd.NaT] * len(new_rows), dtype="datetime64[us]"
    )
    new_rows = new_rows[cols]

    out = current.map_batches(_close, batch_format="pandas")
    if len(new_rows):
        out = out.union(ray.data.from_pandas(new_rows))
    return out


__all__ = ["scd2_apply"]
