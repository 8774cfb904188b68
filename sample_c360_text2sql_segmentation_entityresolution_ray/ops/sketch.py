"""Distinct-count sketch: K-Minimum-Values (Bar-Yossef et al.,
"Counting distinct elements in a data stream", RANDOM 2002).

The scale problem: ``count(DISTINCT x) GROUP BY g`` over 100 TB must
shuffle every distinct value.  The KMV sketch shuffles at most ``k``
64-bit hashes per group per block: each batch emits its k smallest
distinct-value hashes, merging is "union + keep k smallest" (order- and
partition-insensitive), and the estimate is ``(k-1) / U(k)`` where
``U(k)`` is the k-th smallest hash normalized to (0,1).  Standard
error ≈ 1/√(k−2).

Everything is DETERMINISTIC — the hash is the top 60 bits (15 hex
chars) of md5, which DuckDB reproduces exactly via
``('0x' || left(md5(v), 15))::BIGINT`` — so unlike most sketches this
one is value-hash oracle-checkable, not just tolerance-checkable.

Cost note: md5 is computed per DISTINCT value per batch (hashlib's C
loop, ~1 µs/value) — that is the sketch's honest price and it replaces
a full all-to-all distinct shuffle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray.data

_HASH_SPACE = float(1 << 60)  # 15 hex chars = 60 bits


def _kmv_hashes(values: np.ndarray) -> np.ndarray:
    """60-bit md5 hashes of the string forms, as int64 (< 2^60)."""
    return np.fromiter(
        (
            int(hashlib.md5(str(v).encode("utf-8")).hexdigest()[:15], 16)
            for v in values
        ),
        dtype=np.int64,
        count=len(values),
    )


def kmv_estimate(hashes: np.ndarray, k: int) -> float:
    """Distinct estimate from a merged hash set (already distinct)."""
    if len(hashes) < k:
        return float(len(hashes))
    kth = np.partition(hashes, k - 1)[k - 1]
    return (k - 1) * _HASH_SPACE / float(kth)


def kmv_distinct(
    ds: "ray.data.Dataset",
    col: str,
    group_by: str,
    k: int = 128,
    out_col: str = "est_distinct",
) -> "ray.data.Dataset":
    """(group_by, est_distinct) — approximate distinct ``col`` per
    group.  Per-batch partial: the k smallest distinct-value hashes per
    group (≤ k rows/group/block cross the shuffle); the per-group merge
    unions partials, re-distincts, and evaluates the estimator.  The
    group count is assumed sketch-sized (categories, not keys) — the
    per-group ``map_groups`` combine is ~ms each."""

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for g, sub in df.groupby(group_by, sort=False):
            uniq = pd.unique(sub[col].dropna())
            h = np.unique(_kmv_hashes(uniq))
            if len(h) > k:
                h = np.partition(h, k - 1)[:k]
            outs.append(pd.DataFrame({group_by: g, "_h": h}))
        if not outs:
            return pd.DataFrame(
                {group_by: pd.Series(dtype=df[group_by].dtype),
                 "_h": pd.Series(dtype=np.int64)}
            )
        return pd.concat(outs, ignore_index=True)

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        h = np.unique(g["_h"].to_numpy())
        return pd.DataFrame(
            {group_by: [g[group_by].iloc[0]], out_col: [kmv_estimate(h, k)]}
        )

    return (
        ds.select_columns([group_by, col])
        .map_batches(_partial, batch_format="pandas")
        .groupby(group_by)
        .map_groups(_merge, batch_format="pandas")
    )


def kmv_oracle_sql(
    table: str, col: str, group_by: str, k: int = 128,
    out_col: str = "est_distinct", round_nd: int = 4,
) -> str:
    """The DuckDB query computing the bit-identical estimate (shared by
    tests and `__ray_entry__.oracle_sql`)."""
    return f"""
        WITH d AS (
            SELECT DISTINCT {group_by} AS g,
                   ('0x' || left(md5(CAST({col} AS VARCHAR)), 15))::BIGINT AS h
            FROM {table} WHERE {col} IS NOT NULL
        ),
        ranked AS (
            SELECT g, h,
                   row_number() OVER (PARTITION BY g ORDER BY h) AS rn,
                   count(*) OVER (PARTITION BY g) AS n
            FROM d
        )
        SELECT g AS {group_by},
               CASE WHEN max(n) < {k} THEN CAST(max(n) AS DOUBLE)
                    ELSE round(({k} - 1) * {_HASH_SPACE!r} /
                               CAST(max(CASE WHEN rn = {k} THEN h END) AS DOUBLE),
                               {round_nd})
               END AS {out_col}
        FROM ranked GROUP BY g
    """


# ---------------------------------------------------------------------------
# quantiles — mergeable equi-depth grid summary
# ---------------------------------------------------------------------------
#
# The scale problem: a global quantile (median without GROUP BY) is
# holistic — exact computation needs a full sort.  This summary keeps,
# per block, its sorted values at ``grid`` equally-spaced ranks plus
# each point's row weight; summaries merge by concatenation and the
# estimate interpolates on cumulative weighted rank.  Within-block rank
# error ≤ rows/grid, so:
#   - grid ≥ block rows  → every value survives with weight 1 and the
#     estimate is EXACT (numpy type-7 / DuckDB quantile_cont linear
#     interpolation) — the oracle-checkable mode at sandbox scale;
#   - fixed small grid   → bounded ~1/grid rank error per block at
#     corpus scale, with driver traffic blocks × grid points.


def quantile_sketch(
    ds: "ray.data.Dataset",
    col: str,
    qs: "list[float]",
    grid: int = 256,
) -> "list[float]":
    """Estimate quantiles of ``col`` (nulls skipped) at fractions
    ``qs``.  Deterministic; one streaming pass; driver holds only
    blocks × grid (value, weight) points."""

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(df[col].dropna().to_numpy(dtype=np.float64))
        n = len(v)
        if n == 0:
            return pd.DataFrame({"val": [], "w": []})
        if n <= grid:
            return pd.DataFrame({"val": v, "w": np.ones(n)})
        idx = np.unique(np.round(np.linspace(0, n - 1, grid)).astype(int))
        # each kept point represents the run up to the next kept point
        w = np.diff(np.append(idx, n)).astype(np.float64)
        return pd.DataFrame({"val": v[idx], "w": w})

    pieces = [
        b
        for b in ds.map_batches(_partial, batch_format="pandas").iter_batches(
            batch_size=None, batch_format="pandas"
        )
    ]
    merged = (
        pd.concat(pieces, ignore_index=True)
        if pieces
        else pd.DataFrame({"val": [], "w": []})
    )
    if not len(merged):
        return [float("nan")] * len(qs)
    return _weighted_type7(
        merged["val"].to_numpy(), merged["w"].to_numpy(), qs
    )


def _weighted_type7(vals: np.ndarray, w: np.ndarray, qs) -> "list[float]":
    """Type-7 quantiles over weighted grid points (exact when all
    weights are 1 — the grid ≥ block rows regime).  ``vals`` need not
    be pre-sorted."""
    order = np.argsort(vals, kind="mergesort")
    vals, w = vals[order], w[order]
    start_rank = np.cumsum(w) - w  # rank of each point's first row
    total = float(w.sum())
    out = []
    for q in qs:
        t = q * (total - 1.0)  # type-7 target rank
        i = int(np.searchsorted(start_rank, t, side="right") - 1)
        if i >= len(vals) - 1:
            out.append(float(vals[-1]))
            continue
        # interpolate toward the NEXT distinct sample point across this
        # point's weight span (exact type-7 when all weights are 1)
        span_end = start_rank[i] + w[i]
        if t < span_end - 1.0 or vals[i + 1] == vals[i]:
            out.append(float(vals[i]))
        else:
            frac = t - (span_end - 1.0)
            out.append(float(vals[i] + frac * (vals[i + 1] - vals[i])))
    return out


def quantile_oracle_sql(
    table: str, col: str, qs: "list[float]", round_nd: int = 4
) -> str:
    """DuckDB query producing the same (q, value) rows as the EXACT
    mode of :func:`quantile_sketch` (quantile_cont = type-7 linear)."""
    selects = [
        f"SELECT CAST({q!r} AS DOUBLE) AS q, "
        f"round(quantile_cont({col}, {q!r}), {round_nd}) AS v"
        f" FROM {table} WHERE {col} IS NOT NULL"
        for q in qs
    ]
    return " UNION ALL ".join(selects)


# ---------------------------------------------------------------------------
# Bloom filter: shuffle-volume prefilter for semi/anti joins
# ---------------------------------------------------------------------------

BLOOM_DEFAULT_BITS = 1 << 24  # 2 MiB packed; ~0.2% fp at 1M keys / 4 hashes


def _bloom_hashes(values: np.ndarray, num_hashes: int, num_bits: int):
    """Yield ``num_hashes`` vectorized bit indices per value via double
    hashing over the process-deterministic SipHash (same fixed-key
    ``pd.util.hash_array`` the blocking keys use)."""
    h1 = pd.util.hash_array(np.asarray(values, dtype=object), categorize=False)
    # odd second hash ⇒ the probe sequence walks the whole table
    h2 = (h1 >> np.uint64(17) | np.uint64(1)) * np.uint64(0x9E3779B97F4A7C15)
    for i in range(num_hashes):
        yield ((h1 + np.uint64(i) * h2) % np.uint64(num_bits)).astype(np.uint64)


def build_bloom(
    ds: "ray.data.Dataset",
    key_col: str,
    num_bits: int = BLOOM_DEFAULT_BITS,
    num_hashes: int = 4,
):
    """Packed Bloom bitset (np.uint8, ``num_bits/8`` bytes) of
    ``key_col``.

    Fully Dataset-expressed: each block folds its keys into one bitset
    row in the workers (the shuffleable unit is ``num_bits/8`` bytes,
    never the keys), then an 8-ary repartition+OR tree reduces rows
    until one remains — log₈(blocks) rounds, so the driver only ever
    receives the final bitset."""
    nbytes = num_bits // 8

    def _block_bits_row(batch: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(nbytes, dtype=np.uint8)
        vals = batch[key_col].to_numpy()
        if len(vals):
            for idx in _bloom_hashes(vals, num_hashes, num_bits):
                np.bitwise_or.at(
                    bits, (idx >> 3).astype(np.int64),
                    np.left_shift(np.uint8(1), (idx & 7).astype(np.uint8)),
                )
        return pd.DataFrame({"bits": [bits.tobytes()]})

    def _or_rows(batch: pd.DataFrame) -> pd.DataFrame:
        arrs = [np.frombuffer(x, dtype=np.uint8) for x in batch["bits"]]
        return pd.DataFrame({"bits": [np.bitwise_or.reduce(arrs).tobytes()]})

    bs = (
        ds.select_columns([key_col])
        .map_batches(_block_bits_row, batch_format="pandas", batch_size=None)
        .materialize()
    )
    n = bs.count()
    if n == 0:
        return np.zeros(nbytes, dtype=np.uint8)
    while n > 1:
        bs = (
            bs.repartition(max(1, (n + 7) // 8))
            .map_batches(_or_rows, batch_format="pandas", batch_size=None)
            .materialize()
        )
        n = bs.count()
    return np.frombuffer(
        bs.take_batch(1, batch_format="pandas")["bits"].iloc[0], dtype=np.uint8
    ).copy()


def bloom_semi_join(
    large: "ray.data.Dataset",
    small: "ray.data.Dataset",
    on: str,
    right_on: str | None = None,
    num_bits: int = BLOOM_DEFAULT_BITS,
    num_hashes: int = 4,
) -> "ray.data.Dataset":
    """EXACT semi-join with a Bloom prefilter on the large side.

    The bitset (built from ``small``, broadcast once) drops large-side
    rows that cannot match before any exchange — at a 1% key-hit rate
    the downstream semi-join shuffles ~1% of the volume plus the fp
    residue; false positives are removed by the exact
    :func:`relational.semi_join` that follows, false negatives cannot
    occur (membership tests use the same hashes that set the bits)."""
    import ray

    from .relational import semi_join

    rkey = right_on or on
    # consumed twice (bloom build + the exact join) — pin the plan once
    small = small.select_columns([rkey]).materialize()
    bits = build_bloom(small, rkey, num_bits=num_bits, num_hashes=num_hashes)
    ref = ray.put(bits)

    def _prefilter(batch: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(ref)
        vals = batch[on].to_numpy()
        if not len(vals):
            return batch
        mask = np.ones(len(vals), dtype=bool)
        for idx in _bloom_hashes(vals, num_hashes, num_bits):
            byte = b[(idx >> 3).astype(np.int64)]
            mask &= (byte >> (idx & 7).astype(np.uint8) & 1).astype(bool)
        return batch[mask]

    return semi_join(
        large.map_batches(_prefilter, batch_format="pandas"),
        small,
        on=on,
        right_on=rkey,
    )




def winsorize(
    ds: "ray.data.Dataset",
    col: str,
    lo: float = 0.01,
    hi: float = 0.99,
    out_col: str | None = None,
    grid: int = 256,
) -> "ray.data.Dataset":
    """Clip ``col`` to its [``lo``, ``hi``] quantiles — the standard
    outlier-taming pass before feature scaling (`relational.standardize`).

    One :func:`quantile_sketch` pass fixes the two cut points (exact
    type-7 when ``grid`` ≥ block rows, bounded ~1/grid rank error on a
    production grid), then one stateless streaming map clips — the data
    never shuffles and only blocks × grid summary points reach the
    driver.  Adds ``out_col`` (default ``{col}_wins``) as float64."""
    out_col = out_col or f"{col}_wins"
    qlo, qhi = quantile_sketch(ds, col, [lo, hi], grid=grid)

    def _clip(batch: pd.DataFrame) -> pd.DataFrame:
        batch[out_col] = np.clip(
            batch[col].to_numpy(dtype=np.float64), qlo, qhi
        )
        return batch

    return ds.map_batches(_clip, batch_format="pandas")


# ---------------------------------------------------------------------------
# heavy hitters (Misra-Gries candidates + exact recount)
# ---------------------------------------------------------------------------

# partial-summary tables below this many rows merge on the driver (two
# int64-ish columns ≈ 32 MB at the cap); above it the merge falls back
# to the grouped_aggregate combiner shuffle.  The cap bounds driver
# heap exactly like the url_dedup / segments probes (SCALE.md).
HH_DRIVER_MERGE_ROWS = 2_000_000


def _driver_merge_sum(partials, key_col: str, val_col: str, cap: int):
    """Stream a (key, partial) table to the driver and groupby-sum it —
    ``None`` once more than ``cap`` rows have streamed (caller falls
    back to the shuffle merge; the stream stops early so an oversized
    input costs ≤ cap rows of heap plus one partial re-execution)."""
    pieces, n = [], 0
    for b in partials.iter_batches(batch_size=65536, batch_format="pandas"):
        n += len(b)
        if n > cap:
            return None
        pieces.append(b)
    if not pieces:
        return pd.DataFrame(
            {key_col: pd.Series(dtype=object),
             val_col: pd.Series(dtype=np.int64)}
        )
    df = pd.concat(pieces, ignore_index=True)
    return df.groupby(key_col, sort=False, as_index=False)[val_col].sum()

def heavy_hitter_candidates(
    ds: "ray.data.Dataset",
    key_col: str,
    capacity: int,
) -> pd.DataFrame:
    """Misra-Gries ("Frequent") candidate generation: per-block MG
    summaries of at most ``capacity`` (key, lower-bound) rows, merged by
    a combiner-sum shuffle, cut back to the top ``capacity`` by summed
    lower bound.

    The shuffle ships ≤ ``capacity`` rows PER BLOCK no matter how large
    the key domain is — this is what distinguishes it from the
    ``grouped_aggregate`` census (distinct-domain × blocks rows): over a
    web-scale open vocabulary (URLs, n-grams, user agents) the census
    partial is itself corpus-sized while the MG partial stays fixed.

    Guarantees (standard MG, Misra & Gries 1982): every key with true
    count > N/``capacity`` appears in the merged summary, and each
    summed lower bound undercounts by at most N/``capacity``.  When no
    block ever exceeds ``capacity`` distinct keys the decrement never
    fires and the candidate counts are EXACT — the small-scale regime
    the oracle checks (the KMV "exact when distinct ≤ k" pattern).

    Returns a driver-side DataFrame (≤ ``capacity`` rows) of
    ``(key_col, lb)`` sorted by (lb desc, key asc).
    """
    from .relational import grouped_aggregate

    def _mg(df: pd.DataFrame) -> pd.DataFrame:
        # native dtype throughout: np.unique over an int64 column is
        # ~20× an object-boxed one (measured 5.3 s → 0.6 s census on
        # 600k int keys at sf0.1)
        vals = df[key_col].to_numpy()
        uniq, cnt = np.unique(vals, return_counts=True)
        if len(uniq) > capacity:
            order = np.argsort(-cnt, kind="stable")
            thresh = cnt[order[capacity]]
            keep = order[:capacity]
            dec = cnt[keep] - thresh
            pos = dec > 0
            uniq, cnt = uniq[keep][pos], dec[pos]
        return pd.DataFrame({key_col: uniq, "lb": cnt.astype(np.int64)})

    partials = ds.select_columns([key_col]).map_batches(
        _mg, batch_format="pandas"
    )
    # ≤ capacity × blocks partial rows: merge on the driver below the
    # cap (no barrier at all — the census is then two streaming map
    # passes), else one combiner shuffle
    cand = _driver_merge_sum(partials, key_col, "lb", HH_DRIVER_MERGE_ROWS)
    if cand is None:
        cand = grouped_aggregate(
            partials, keys=[key_col], specs=[("sum", "lb", "lb")]
        ).to_pandas()
    return (
        cand.sort_values(
            ["lb", key_col], ascending=[False, True], kind="mergesort"
        )
        .head(capacity)
        .reset_index(drop=True)
    )


def heavy_hitters_topk(
    ds: "ray.data.Dataset",
    key_col: str,
    k: int = 50,
    capacity: int = 4096,
) -> "ray.data.Dataset":
    """Exact top-``k`` most frequent keys via a two-pass
    candidates-then-recount plan: Misra-Gries candidates
    (:func:`heavy_hitter_candidates`, bounded shuffle), then ONE exact
    counting pass restricted to the broadcast candidate set.

    The recount makes the reported counts exact regardless of MG
    decrements; top-``k`` membership is exact whenever the true top-k
    all exceed N/``capacity`` (the MG recall guarantee) — size
    ``capacity`` ≥ a few × the expected head.  Output:
    ``(key_col, cnt)`` sorted by (cnt desc, key asc), ``k`` rows.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from .relational import grouped_aggregate

    cand = heavy_hitter_candidates(ds, key_col, capacity)
    if not len(cand):
        return ray.data.from_pandas(
            pd.DataFrame(
                {key_col: pd.Series(dtype=object),
                 "cnt": pd.Series(dtype=np.int64)}
            )
        )
    ref = ray.put(pa.array(sorted(cand[key_col].tolist())))

    def _recount(t: "pa.Table") -> pd.DataFrame:
        col = t[key_col]
        kept = t.filter(pc.is_in(col, value_set=ray.get(ref)))
        uniq, cnt = np.unique(
            kept[key_col].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pd.DataFrame({key_col: uniq, "cnt": cnt.astype(np.int64)})

    partials = ds.select_columns([key_col]).map_batches(
        _recount, batch_format="pyarrow"
    )
    # ≤ capacity counted keys per block: same driver-vs-shuffle switch
    merged = _driver_merge_sum(partials, key_col, "cnt", HH_DRIVER_MERGE_ROWS)
    if merged is not None:
        out = (
            merged.sort_values(
                ["cnt", key_col], ascending=[False, True], kind="mergesort"
            )
            .head(k)
            .reset_index(drop=True)
        )
        out["cnt"] = out["cnt"].astype(np.int64)
        return ray.data.from_pandas(out)
    exact = grouped_aggregate(
        partials, keys=[key_col], specs=[("sum", "cnt", "cnt")]
    )
    return exact.sort(["cnt", key_col], descending=[True, False]).limit(k)


def grouped_quantile(
    ds: "ray.data.Dataset",
    col: str,
    group_cols: "list[str]",
    qs: "list[float]",
    grid: int = 256,
    driver_max_rows: int = HH_DRIVER_MERGE_ROWS,
    partitions: int | None = None,
) -> "ray.data.Dataset":
    """Per-group quantiles (grouped median, p99 latency per service, …)
    via the same mergeable equi-depth grid as :func:`quantile_sketch`.

    Per batch each group compresses to ≤ ``grid`` (value, weight)
    points, so the exchange carries groups × grid × blocks summary
    rows, never raw values.  Below ``driver_max_rows`` the partials
    merge on the driver (no barrier); above it they hash-partition by
    group and finalize per partition — raw data never shuffles either
    way.  Exact type-7 (bit-matching ``quantile_cont``) when ``grid``
    ≥ a group's rows per block.

    Output: ``group_cols + (q float64, v float64)`` rows, sorted by
    (group, q)."""
    from .relational import DEDUP_PARTITIONS

    group_cols = list(group_cols)

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        pieces = []
        for key, g in df.groupby(group_cols, sort=False, dropna=False):
            v = np.sort(g[col].dropna().to_numpy(dtype=np.float64))
            n = len(v)
            if n == 0:
                continue
            if n <= grid:
                val, w = v, np.ones(n)
            else:
                idx = np.unique(
                    np.round(np.linspace(0, n - 1, grid)).astype(int)
                )
                w = np.diff(np.append(idx, n)).astype(np.float64)
                val = v[idx]
            part = pd.DataFrame({"val": val, "w": w})
            if len(group_cols) == 1:
                part[group_cols[0]] = key if not isinstance(key, tuple) else key[0]
            else:
                for c, kv in zip(group_cols, key):
                    part[c] = kv
            pieces.append(part)
        if not pieces:
            return pd.DataFrame(
                {"val": pd.Series(dtype=np.float64),
                 "w": pd.Series(dtype=np.float64),
                 **{c: pd.Series(dtype=object) for c in group_cols}}
            )
        return pd.concat(pieces, ignore_index=True)

    def _finalize(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, grp in g.groupby(group_cols, sort=False, dropna=False):
            vs = _weighted_type7(
                grp["val"].to_numpy(), grp["w"].to_numpy(), qs
            )
            kvals = (key,) if not isinstance(key, tuple) else key
            for q, v in zip(qs, vs):
                rows.append(dict(zip(group_cols, kvals), q=float(q), v=v))
        return pd.DataFrame(rows)

    partials = ds.select_columns(group_cols + [col]).map_batches(
        _partial, batch_format="pandas"
    )
    # driver fast path below the cap; group-hash partition merge above
    pieces, n = [], 0
    collected = True
    for b in partials.iter_batches(batch_size=65536, batch_format="pandas"):
        n += len(b)
        if n > driver_max_rows:
            collected = False
            break
        pieces.append(b)
    if collected:
        merged = (
            pd.concat(pieces, ignore_index=True)
            if pieces
            else _partial(pd.DataFrame({col: [], **{c: [] for c in group_cols}}))
        )
        out = _finalize(merged) if len(merged) else pd.DataFrame(
            {**{c: pd.Series(dtype=object) for c in group_cols},
             "q": pd.Series(dtype=np.float64),
             "v": pd.Series(dtype=np.float64)}
        )
        out = out.sort_values(group_cols + ["q"], kind="mergesort").reset_index(
            drop=True
        )
        return ray.data.from_pandas(out)
    P = partitions or DEDUP_PARTITIONS

    def _part_col(df: pd.DataFrame) -> pd.DataFrame:
        df["_part"] = (
            pd.util.hash_pandas_object(df[group_cols], index=False).to_numpy()
            % P
        ).astype("int32")
        return df

    return (
        partials.map_batches(_part_col, batch_format="pandas")
        .groupby("_part")
        .map_groups(
            lambda g: _finalize(g.drop(columns=["_part"])),
            batch_format="pandas",
        )
        .sort(group_cols + ["q"])
    )


def discretize(
    ds: "ray.data.Dataset",
    col: str,
    n_bins: int = 4,
    out_col: str | None = None,
    grid: int = 256,
) -> "ray.data.Dataset":
    """Equal-frequency (quantile) discretization: bucket ``col`` into
    ``n_bins`` bins at the 1/n … (n−1)/n quantile cut points — the
    leakage-free numeric binning feature pipelines use where equal-
    width bins collapse under skew (`profile.histogram` is the
    equal-width sibling).

    One :func:`quantile_sketch` pass fixes the n−1 cuts, one stateless
    map assigns ``bin = #cuts ≤ x`` (``searchsorted(..., 'right')``,
    int64 in [0, n_bins−1]) — the data never shuffles.  Exact cuts in
    the grid ≥ block rows regime (the oracle-checked one)."""
    out_col = out_col or f"{col}_bin"
    qs = [i / n_bins for i in range(1, n_bins)]
    cuts = np.asarray(quantile_sketch(ds, col, qs, grid=grid), np.float64)

    def _assign(batch: pd.DataFrame) -> pd.DataFrame:
        batch[out_col] = np.searchsorted(
            cuts, batch[col].to_numpy(np.float64), side="right"
        ).astype(np.int64)
        return batch

    return ds.map_batches(_assign, batch_format="pandas")


def robust_scale(
    ds: "ray.data.Dataset",
    col: str,
    out_col: str | None = None,
    grid: int = 256,
) -> "ray.data.Dataset":
    """Median/MAD robust z-score: ``(x − median) / MAD`` — the outlier-
    immune alternative to mean/std standardization
    (`relational.standardize`) for heavy-tailed feature columns.

    Two :func:`quantile_sketch` passes (median of ``col``, then median
    of ``|col − median|``) fix the two scalars; one stateless streaming
    map attaches the score.  The data never shuffles; each pass ships
    blocks × grid summary points to the driver.  Exact type-7 medians
    when ``grid`` ≥ block rows (the oracle-checked regime), bounded
    ~1/grid rank error on a fixed production grid.  A zero MAD
    (>50% constant column) divides by 1.0 instead — flat data scores
    0, never inf."""
    out_col = out_col or f"{col}_robust_z"
    (med,) = quantile_sketch(ds, col, [0.5], grid=grid)

    def _dev(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"_absdev": np.abs(batch[col].to_numpy(np.float64) - med)}
        )

    (mad,) = quantile_sketch(
        ds.map_batches(_dev, batch_format="pandas"), "_absdev", [0.5],
        grid=grid,
    )
    denom = mad if mad > 0 else 1.0

    def _score(batch: pd.DataFrame) -> pd.DataFrame:
        batch[out_col] = (
            batch[col].to_numpy(np.float64) - med
        ) / denom
        return batch

    return ds.map_batches(_score, batch_format="pandas")


__all__ = [
    "kmv_distinct",
    "kmv_estimate",
    "kmv_oracle_sql",
    "quantile_sketch",
    "quantile_oracle_sql",
    "winsorize",
    "robust_scale",
    "discretize",
    "grouped_quantile",
    "build_bloom",
    "bloom_semi_join",
    "heavy_hitter_candidates",
    "heavy_hitters_topk",
]


def iqr_outliers(
    ds: "ray.data.Dataset",
    col: str,
    k: float = 1.5,
    grid: int = 256,
) -> "ray.data.Dataset":
    """Tukey-fence outlier filter: keep rows where ``col`` falls
    outside ``[q1 − k·IQR, q3 + k·IQR]`` (k = 1.5 is the classic
    fence; smaller k tightens it).  One :func:`quantile_sketch` pass
    fixes the two scalars, then ONE stateless streaming filter — the
    data never shuffles.  Exact quantiles when ``grid`` ≥ block rows;
    on a fixed production grid the fence moves by ≤ ~1/grid rank."""
    import pyarrow as pa  # noqa: F401 — batch type
    import pyarrow.compute as pc

    q1, q3 = quantile_sketch(ds, col, [0.25, 0.75], grid=grid)
    iqr = q3 - q1
    lo, hi = q1 - k * iqr, q3 + k * iqr

    def _flag(batch):
        v = batch[col]
        return batch.filter(
            pc.or_(pc.less(v, lo), pc.greater(v, hi))
        )

    return ds.map_batches(_flag, batch_format="pyarrow")


__all__.append("iqr_outliers")


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet-Fuss-Gandouet-Meunier, AofA 2007)
# ---------------------------------------------------------------------------

def hll_registers(
    ds: "ray.data.Dataset",
    col: str,
    b: int = 8,
    salt: str = "hll",
) -> "ray.data.Dataset":
    """HyperLogLog register state: ``(register, rho_max)`` over the
    whole column — the FIXED-size distinct sketch (2^b rows out,
    regardless of input size; KMV above is the per-group variant).

    The hash is the usual 60-bit md5 draw: the top ``b`` bits pick the
    register, rho = position of the first 1-bit in the remaining
    ``60-b`` bits (``60-b+1`` if all zero).  Per batch the partial is
    a ≤ 2^b-row (register, max rho) table, merged by a max combiner
    shuffle — so ≤ 2^b rows per block cross the exchange and merging
    is order/partition-insensitive.  Like KMV, the whole construction
    is deterministic and SQL-re-derivable (md5 + bin()-length bit
    position), so the sketch STATE is value-hash oracle-checkable;
    :func:`hll_estimate` turns the state into the cardinality.
    """
    if not 4 <= b <= 16:
        raise ValueError("b outside the sane HLL precision range 4..16")
    W = 60 - b
    mask = np.int64((1 << W) - 1)

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        vals = pd.unique(df[col].dropna())
        h = np.fromiter(
            (
                int(hashlib.md5(
                    f"{salt}{v}".encode("utf-8")).hexdigest()[:15], 16)
                for v in vals
            ),
            dtype=np.int64,
            count=len(vals),
        )
        reg = h >> W
        w = h & mask
        # bit_length via the exact float64 exponent: w < 2^52 ≤ 2^53 is
        # exactly representable, and frexp's exponent IS bit_length.
        rho = np.full(len(w), W + 1, dtype=np.int64)
        nz = w > 0
        if nz.any():
            _m, e = np.frexp(w[nz].astype(np.float64))
            rho[nz] = W - e.astype(np.int64) + 1
        part = (
            pd.DataFrame({"register": reg.astype(np.int64), "rho_max": rho})
            .groupby("register", sort=False)["rho_max"].max().reset_index()
        )
        return part

    from .relational import grouped_aggregate

    partials = ds.select_columns([col]).map_batches(
        _partial, batch_format="pandas"
    )
    return grouped_aggregate(
        partials, ["register"], [("max", "rho_max", "rho_max")]
    )


def hll_estimate(registers: pd.DataFrame, b: int = 8) -> float:
    """Cardinality estimate from :func:`hll_registers` state (the
    standard bias-corrected harmonic mean, with the small-range
    linear-counting correction).  Absent registers count as rho 0."""
    m = 1 << b
    alpha = 0.7213 / (1.0 + 1.079 / m) if m >= 128 else (
        0.673 if m == 16 else 0.697 if m == 32 else 0.709
    )
    rho = np.zeros(m, dtype=np.float64)
    idx = registers["register"].to_numpy(np.int64)
    rho[idx] = registers["rho_max"].to_numpy(np.float64)
    est = alpha * m * m / np.sum(np.exp2(-rho))
    zeros = int((rho == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def hll_oracle_sql(table: str, col: str, b: int = 8, salt: str = "hll") -> str:
    """DuckDB SQL producing the same (register, rho_max) state."""
    W = 60 - b
    div = 1 << W
    return f"""
        WITH h AS (
            SELECT ('0x' || left(md5('{salt}' || CAST({col} AS VARCHAR)),
                                 15))::BIGINT AS hv
            FROM {table} WHERE {col} IS NOT NULL
        )
        SELECT hv // {div} AS register,
               MAX(CASE WHEN hv % {div} = 0 THEN {W + 1}
                        ELSE {W} - length(bin(hv % {div})) + 1
                   END) AS rho_max
        FROM h GROUP BY register
    """


__all__ += ["hll_registers", "hll_estimate", "hll_oracle_sql"]


def impute_group_median(
    ds: "ray.data.Dataset",
    value_col: str,
    group_cols: "list[str]",
    out_col: str | None = None,
    grid: int = 4096,
    partitions: int | None = None,
) -> "ray.data.Dataset":
    """Fill NULL/NaN ``value_col`` entries with their group's median of
    the NON-null values — the standard ML-prep imputation pass.

    The medians come from ONE :func:`grouped_quantile` sketch pass
    (groups × grid × blocks summary rows cross, never raw values;
    exact type-7 when ``grid`` ≥ a group's rows per block), return as
    an O(#groups) broadcast, and apply in one streaming map.  A group
    with no non-null values keeps its NULLs (no global fallback —
    that's a caller policy).
    """
    out_col = out_col or value_col
    med = grouped_quantile(
        ds.select_columns(group_cols + [value_col]),
        value_col,
        group_cols,
        [0.5],
        grid=grid,
        partitions=partitions,
    ).to_pandas()
    med = med[group_cols + ["v"]].rename(columns={"v": "_med"})
    ref = ray.put(med)

    def _fill(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.merge(ray.get(ref), on=group_cols, how="left")
        y = out[value_col].to_numpy(np.float64)
        filled = np.where(np.isnan(y), out["_med"].to_numpy(np.float64), y)
        out = out.drop(columns=["_med"])
        out[out_col] = filled
        return out

    return ds.map_batches(_fill, batch_format="pandas")


__all__.append("impute_group_median")


def hll_registers_grouped(
    ds: "ray.data.Dataset",
    col: str,
    group_cols: "list[str]",
    b: int = 8,
    salt: str = "hll",
) -> "ray.data.Dataset":
    """Per-group HyperLogLog register state: ``group_cols + (register,
    rho_max)`` — ≤ 2^b rows per GROUP regardless of its size, the
    mergeable approx-distinct for "distinct users per day over a 100-TB
    event log" shapes where exact per-group dedup would shuffle every
    key.  Same md5 draw and max-combiner merge as the global
    :func:`hll_registers`; partials are ≤ groups-in-block × 2^b rows.
    The state stays SQL-re-derivable, so it value-hash oracle-checks
    with a GROUP BY variant of :func:`hll_oracle_sql`."""
    if not 4 <= b <= 16:
        raise ValueError("b outside the sane HLL precision range 4..16")
    W = 60 - b
    mask = np.int64((1 << W) - 1)
    group_cols = list(group_cols)

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        u = df[group_cols + [col]].dropna(subset=[col]).drop_duplicates()
        vals = u[col].to_numpy(object)
        h = np.fromiter(
            (
                int(hashlib.md5(
                    f"{salt}{v}".encode("utf-8")).hexdigest()[:15], 16)
                for v in vals
            ),
            dtype=np.int64,
            count=len(vals),
        )
        reg = h >> W
        w = h & mask
        rho = np.full(len(w), W + 1, dtype=np.int64)
        nz = w > 0
        if nz.any():
            _m, e = np.frexp(w[nz].astype(np.float64))
            rho[nz] = W - e.astype(np.int64) + 1
        part = u[group_cols].copy()
        part["register"] = reg
        part["rho_max"] = rho
        return (
            part.groupby(group_cols + ["register"], sort=False)["rho_max"]
            .max()
            .reset_index()
        )

    from .relational import grouped_aggregate

    partials = ds.select_columns(group_cols + [col]).map_batches(
        _partial, batch_format="pandas"
    )
    return grouped_aggregate(
        partials, group_cols + ["register"], [("max", "rho_max", "rho_max")]
    )


__all__.append("hll_registers_grouped")


def cms_counters(
    ds: "ray.data.Dataset",
    col: str,
    d: int = 4,
    w: int = 256,
    salt: str = "cms",
) -> "ray.data.Dataset":
    """Count-Min sketch state over ``col``: ``(row, cell, n)`` counters
    for ``d`` independent hash rows of width ``w`` — the FIXED-size
    (d × w) frequency summary whose point estimate (min over rows)
    never underestimates.  Heavy-hitter censuses that must merge across
    days/shards keep this instead of exact counts.

    Per batch, values pre-aggregate to (value, count) so each distinct
    value hashes ONCE per row (md5, the repo's SQL-re-derivable draw);
    cell partials merge through one sum-combiner exchange — ≤ d × w
    rows per block cross regardless of input size, and the final state
    is exactly mergeable (sums) and value-hash oracle-checkable.
    :func:`cms_estimate` reads point frequencies from the state."""
    if d < 1 or w < 2:
        raise ValueError("need d ≥ 1 hash rows and w ≥ 2 cells")

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[col].dropna().value_counts()
        vals = vc.index.to_numpy(object)
        cnt = vc.to_numpy(np.int64)
        rows, cells, ns = [], [], []
        for r in range(d):
            h = np.fromiter(
                (
                    int(hashlib.md5(
                        f"{salt}{r}:{v}".encode("utf-8")).hexdigest()[:15],
                        16)
                    for v in vals
                ),
                dtype=np.int64,
                count=len(vals),
            )
            cell = h % w
            part = pd.DataFrame({"cell": cell, "n": cnt}).groupby(
                "cell", sort=False
            )["n"].sum()
            rows.append(np.full(len(part), r, dtype=np.int64))
            cells.append(part.index.to_numpy(np.int64))
            ns.append(part.to_numpy(np.int64))
        return pd.DataFrame(
            {
                "row": np.concatenate(rows) if rows else [],
                "cell": np.concatenate(cells) if cells else [],
                "n": np.concatenate(ns) if ns else [],
            }
        )

    from .relational import grouped_aggregate

    partials = ds.select_columns([col]).map_batches(
        _partial, batch_format="pandas"
    )
    return grouped_aggregate(partials, ["row", "cell"], [("sum", "n", "n")])


def cms_estimate(
    state: pd.DataFrame, values, d: int = 4, w: int = 256, salt: str = "cms"
) -> np.ndarray:
    """Point frequency estimates (min over the d rows) from
    :func:`cms_counters` state — ≥ the true count, with overestimate
    ≤ 2N/w at 1 − (1/2)^d confidence (Cormode-Muthukrishnan)."""
    tab = np.zeros((d, w), dtype=np.int64)
    tab[state["row"].to_numpy(np.int64), state["cell"].to_numpy(np.int64)] = (
        state["n"].to_numpy(np.int64)
    )
    out = np.empty(len(values), dtype=np.int64)
    for i, v in enumerate(values):
        est = None
        for r in range(d):
            h = int(hashlib.md5(f"{salt}{r}:{v}".encode()).hexdigest()[:15], 16)
            c = tab[r, h % w]
            est = c if est is None else min(est, c)
        out[i] = est
    return out


__all__ += ["cms_counters", "cms_estimate"]
