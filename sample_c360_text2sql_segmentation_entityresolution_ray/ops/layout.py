"""Z-order (Morton) layout: co-cluster rows on TWO dimensions so both
columns' parquet row-group min/max stay tight — the layout lever behind
multi-predicate prune-at-read (Delta/Iceberg OPTIMIZE ZORDER; public
algorithm: bit interleaving of rank-quantized keys).

At 100 TB this runs once per table rewrite: one global min/max pass
(parquet footer stats when available), one stateless map computing the
Morton key, one range sort on it, partitioned write.  A reader with
``WHERE a BETWEEN … AND b BETWEEN …`` then skips every file whose
z-interval misses the query box — in BOTH dimensions, which a
single-column sort can't give.

The key construction is deliberately SQL-reproducible (linear min/max
quantization to ``bits`` levels, arithmetic bit interleave) so the
oracle can re-derive every z-value — no sketch tolerance, a value-hash
match.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


def _quantize(x: np.ndarray, lo: float, hi: float, levels: int) -> np.ndarray:
    """floor((x−lo)/(hi−lo) · (levels−1)), clamped — constant-column
    guard maps everything to 0."""
    if hi <= lo:
        return np.zeros(len(x), np.int64)
    q = np.floor((x - lo) / (hi - lo) * (levels - 1))
    return np.clip(q, 0, levels - 1).astype(np.int64)


def morton_interleave(qx: np.ndarray, qy: np.ndarray, bits: int) -> np.ndarray:
    """Interleave ``bits`` bits of two quantized keys: x takes the odd
    bit positions, y the even — vectorized arithmetic identical to the
    SQL ``list_sum(list_transform(range(bits), …))`` form."""
    z = np.zeros(len(qx), np.int64)
    for i in range(bits):
        z += ((qx >> i) & 1) * (1 << (2 * i + 1))
        z += ((qy >> i) & 1) * (1 << (2 * i))
    return z


def zorder_key(
    ds: "ray.data.Dataset",
    x_col: str,
    y_col: str,
    bits: int = 16,
    bounds: "tuple[float, float, float, float] | None" = None,
) -> "ray.data.Dataset":
    """Attach ``zval`` (int64 Morton key over ``x_col``/``y_col``).

    ``bounds`` = (x_lo, x_hi, y_lo, y_hi); when ``None`` one aggregate
    pass measures them (at scale: read them from parquet footer stats
    instead).  The attach itself is a stateless streaming map."""
    if bounds is None:
        agg = ds.aggregate(
            ray.data.aggregate.Min(x_col), ray.data.aggregate.Max(x_col),
            ray.data.aggregate.Min(y_col), ray.data.aggregate.Max(y_col),
        )
        bounds = (
            float(agg[f"min({x_col})"]), float(agg[f"max({x_col})"]),
            float(agg[f"min({y_col})"]), float(agg[f"max({y_col})"]),
        )
    x_lo, x_hi, y_lo, y_hi = bounds
    levels = 1 << bits

    def _attach(df: pd.DataFrame) -> pd.DataFrame:
        qx = _quantize(df[x_col].to_numpy(np.float64), x_lo, x_hi, levels)
        qy = _quantize(df[y_col].to_numpy(np.float64), y_lo, y_hi, levels)
        df["zval"] = morton_interleave(qx, qy, bits)
        return df

    return ds.map_batches(_attach, batch_format="pandas")


def zorder_sort(
    ds: "ray.data.Dataset",
    x_col: str,
    y_col: str,
    bits: int = 16,
    bounds: "tuple[float, float, float, float] | None" = None,
) -> "ray.data.Dataset":
    """Z-order the table: attach the Morton key and range-sort on it
    (Ray's sample-based range sort — one exchange, the same cost as any
    single-column layout sort, but both dimensions come out clustered).
    Follow with a partitioned ``write_parquet`` to materialize the
    layout."""
    return zorder_key(ds, x_col, y_col, bits, bounds).sort("zval")


def zorder_locality(df: pd.DataFrame, cols, n_chunks: int = 16) -> float:
    """Diagnostic: mean normalized per-chunk bounding-box area over
    ``cols`` after splitting ``df`` row-order into ``n_chunks`` — lower
    is tighter (better pruning).  Driver-side, test/inspection only."""
    chunks = np.array_split(np.arange(len(df)), n_chunks)
    areas = []
    for idx in chunks:
        if not len(idx):
            continue
        area = 1.0
        for c in cols:
            v = df[c].to_numpy(np.float64)[idx]
            full = df[c].to_numpy(np.float64)
            rng = (full.max() - full.min()) or 1.0
            area *= (v.max() - v.min()) / rng
        areas.append(area)
    return float(np.mean(areas))


__all__ = ["zorder_key", "zorder_sort", "morton_interleave", "zorder_locality"]
