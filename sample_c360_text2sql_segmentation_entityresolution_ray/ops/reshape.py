"""Relational reshaping: pivot (long → wide) and unpivot (wide → long).

The reporting idiom the reference's text2sql surface reaches for with
CASE-WHEN aggregates (`lambda/webbackend/agent_processor.py` result
shaping); here both directions are engine operators.

Scale shape: ``pivot`` is a combiner aggregation in a wide coat — each
batch pre-aggregates to one row per (index key) with one column per
pivot value, then the partials merge through the grouped-aggregate
combiner shuffle.  The pivot DOMAIN must be small (it becomes the
schema; guarded) but the index cardinality is unbounded.  ``unpivot``
is a stateless per-batch melt — zero shuffle.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

import ray.data

from .relational import grouped_aggregate

PIVOT_MAX_VALUES = 1000  # pivot values become COLUMNS — keep it a schema


def pivot(
    ds: "ray.data.Dataset",
    index: Sequence[str],
    pivot_col: str,
    value_col: str,
    values: Sequence,
    agg: str = "sum",
    prefix: str | None = None,
) -> "ray.data.Dataset":
    """One output row per distinct ``index`` tuple; one column per
    entry of ``values`` holding ``agg`` of ``value_col`` restricted to
    rows where ``pivot_col`` equals that entry.  Missing combinations
    aggregate over the empty set: 0 for sum/count (SQL ``coalesce``
    semantics the oracle mirrors).

    ``values`` is explicit — a pivot's output schema must be declared,
    not discovered, for the plan to be stable across runs and shards
    (discover once with ``distinct`` and pass the result in).
    ``agg`` ∈ {sum, count} — the distributive pair whose empty-set
    identity is 0; min/max over a missing combo have no wide-partial
    identity and belong in a long-form grouped aggregate instead.
    """
    index = list(index)
    values = list(values)
    if len(values) > PIVOT_MAX_VALUES:
        raise ValueError(
            f"{len(values)} pivot values > {PIVOT_MAX_VALUES}; a pivot "
            "domain is a schema — aggregate long-form instead"
        )
    if agg not in ("sum", "count"):
        raise ValueError("pivot agg must be 'sum' or 'count'")
    pfx = f"{pivot_col}_" if prefix is None else prefix
    out_cols = [f"{pfx}{v}" for v in values]
    if len(set(out_cols)) != len(out_cols):
        raise ValueError(f"pivot values collide after prefixing: {out_cols}")

    def _wide(df: pd.DataFrame) -> pd.DataFrame:
        gb_keys = df[index]
        parts = {}
        for v, oc in zip(values, out_cols):
            mask = (df[pivot_col] == v).to_numpy()
            if agg == "count":
                parts[oc] = np.where(mask, 1, 0).astype(np.int64)
            else:
                parts[oc] = np.where(
                    mask, df[value_col].to_numpy(), 0
                )
        wide = pd.DataFrame(parts, index=df.index)
        wide[index] = gb_keys
        return (
            wide.groupby(index, sort=False, dropna=False)[out_cols]
            .sum()
            .reset_index()
        )

    partials = ds.select_columns(
        list(dict.fromkeys(index + [pivot_col, value_col]))
    ).map_batches(_wide, batch_format="pandas")
    return grouped_aggregate(
        partials, index, [("sum", oc, oc) for oc in out_cols]
    )


def unpivot(
    ds: "ray.data.Dataset",
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
    drop_null: bool = False,
) -> "ray.data.Dataset":
    """Melt ``value_cols`` into (``var_name``, ``value_name``) long
    form — each input row yields ``len(value_cols)`` output rows.
    Stateless per-batch map, zero shuffle; ``drop_null`` skips cells
    that are NULL (the SQL ``UNPIVOT ... EXCLUDE NULLS`` idiom)."""
    id_cols = list(id_cols)
    value_cols = list(value_cols)

    def _melt(df: pd.DataFrame) -> pd.DataFrame:
        out = df.melt(
            id_vars=id_cols, value_vars=value_cols,
            var_name=var_name, value_name=value_name,
        )
        if drop_null:
            out = out[out[value_name].notna()]
        return out

    return ds.select_columns(id_cols + value_cols).map_batches(
        _melt, batch_format="pandas"
    )


__all__ = ["pivot", "unpivot"]
