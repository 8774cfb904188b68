"""Sampling / splitting for training-data pipelines.

Not in the reference (no sampling surface beyond head/tail previews,
SURVEY §2.6 O4); standard requirements for corpus preparation:

- :func:`assign_split` — deterministic train/valid/test assignment.
  Content-defined (a hash of the id column, never partition order or
  RNG state), so the split is identical across runs, workers and
  cluster sizes, and a document keeps its split when the corpus is
  re-processed.  ``by_modulo=True`` uses ``id % 100`` instead of the
  hash — coarser but expressible in plain SQL for oracle checking.
- :func:`hash_sample` — deterministic p-fraction sample by id hash
  (the repeatable alternative to ``Dataset.random_sample``).
- :func:`stratified_sample` — per-group deterministic cap (equal-ish
  representation across a key, e.g. language).
- :func:`shuffle_for_training` — thin wrapper over
  ``Dataset.random_shuffle(seed=…)`` documenting the cost: a full
  all-to-all exchange; prefer per-window local shuffles downstream of
  a hash split when global order doesn't matter.
- :func:`deterministic_shuffle_rank` — content-defined global shuffle
  ORDER (md5 rank): reproducible across runs/cluster sizes and
  resumable per shard, with only slim (id, hash) rows crossing the
  exchange.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..functions.texthash import hash_str_array

DEFAULT_FRACTIONS = {"train": 0.9, "valid": 0.05, "test": 0.05}


def _id_hash(ids: np.ndarray) -> np.ndarray:
    return hash_str_array(ids.astype(str).astype(object))


def assign_split(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    fractions: dict[str, float] = None,
    by_modulo: bool = False,
) -> "ray.data.Dataset":
    """Add a ``split`` column.  Buckets are cumulative over a 0-99
    value: hash(id)%100 (default) or id%100 (``by_modulo``, SQL-easy)."""
    fractions = fractions or DEFAULT_FRACTIONS
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError("fractions must sum to 1")
    names = list(fractions)
    bounds = np.cumsum([int(round(fractions[n] * 100)) for n in names])

    def _fn(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_pylist())
        bucket = (
            ids.astype(np.int64) % 100
            if by_modulo
            else (_id_hash(ids) % np.uint64(100)).astype(np.int64)
        )
        idx = np.searchsorted(bounds, bucket, side="right")
        idx = np.minimum(idx, len(names) - 1)
        split = np.asarray(names, dtype=object)[idx]
        return batch.append_column("split", pa.array(split, pa.string()))

    return ds.map_batches(_fn, batch_format="pyarrow")


def hash_sample(
    ds: "ray.data.Dataset", p: float, id_col: str = "doc_id", salt: str = ""
) -> "ray.data.Dataset":
    """Deterministic ~p-fraction sample: keep rows whose salted id hash
    falls below p·2^64.  Different ``salt`` values give independent
    samples; re-runs are identical."""
    threshold = np.uint64(int(p * float(2**64 - 1)))

    def _fn(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_pylist())
        h = hash_str_array((salt + pd.Series(ids).astype(str)).to_numpy(object))
        return batch.filter(pa.array(h <= threshold))

    return ds.map_batches(_fn, batch_format="pyarrow")


def stratified_sample(
    ds: "ray.data.Dataset",
    key: str,
    per_group: int,
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """At most ``per_group`` rows per key value, chosen by smallest id
    hash (content-defined, not first-seen).  One groupby shuffle."""

    def _cap(g: pd.DataFrame) -> pd.DataFrame:
        h = _id_hash(g[id_col].to_numpy())
        order = np.argsort(h, kind="stable")[:per_group]
        return g.iloc[np.sort(order)]

    return ds.groupby(key).map_groups(_cap, batch_format="pandas")


def shuffle_for_training(
    ds: "ray.data.Dataset", seed: int = 42
) -> "ray.data.Dataset":
    """Global shuffle (FULL all-to-all exchange — every block moves).
    Use once, at the end, on the already-filtered corpus.  For a
    reproducible, resumable ordering use
    :func:`deterministic_shuffle_rank` instead."""
    return ds.random_shuffle(seed=seed)


def deterministic_shuffle_rank(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    salt: str = "shuf",
    buckets: int = 256,
) -> "ray.data.Dataset":
    """``(id, shuffle_pos)``: each row's position in a DETERMINISTIC
    md5-ordered global shuffle — the training-data ordering step, made
    content-defined.  ``random_shuffle(seed=…)`` is seeded but
    topology-dependent (block boundaries change the permutation, so a
    resumed or differently-sized run reads a different order); the md5
    rank is a pure function of (salt, id): reproducible across runs and
    cluster sizes, and a writer can emit shard ``pos // shard_size``
    independently per bucket — a failed run re-emits only missing
    shards.

    Plan: ONE slim shuffle.  Each batch computes the 60-bit md5 draw
    (`weighted_sample`'s SQL-reproducible construction) and its top-8-bit
    bucket; a combiner count-per-bucket aggregate (≤ ``buckets`` rows)
    gives driver-side prefix-sum offsets; then ``groupby(bucket)``
    ranks (hash, id) inside each bucket and adds its offset.  Only
    (id, hash) rows cross the exchange — never the payload; attach the
    position back with a join/broadcast if the full row is needed.

    Oracle (driver-checked):
    ``row_number() OVER (ORDER BY ('0x' || left(md5(salt || id), 15))::BIGINT, id) - 1``
    — ties in the 60-bit draw (~2^-60/pair) break by id on both sides,
    so the order is total and engine-vs-SQL exact."""
    import hashlib

    nb = np.uint64(buckets)
    shift = np.uint64(60 - int(np.log2(buckets)))

    def _draw(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy()
        h = np.array(
            [
                int(
                    hashlib.md5(f"{salt}{v}".encode("utf-8")).hexdigest()[:15],
                    16,
                )
                for v in ids
            ],
            dtype=np.uint64,
        )
        return pd.DataFrame(
            {
                id_col: ids,
                "_h": h.view(np.int64),
                "_b": (h >> shift).astype(np.int32),
            }
        )

    slim = ds.select_columns([id_col]).map_batches(
        _draw, batch_format="pandas"
    ).materialize()

    from .relational import grouped_aggregate

    counts = grouped_aggregate(
        slim, keys=["_b"], specs=[("count_star", None, "n")]
    ).to_pandas().sort_values("_b")
    offsets = dict(
        zip(
            counts["_b"].to_numpy(),
            np.concatenate([[0], np.cumsum(counts["n"].to_numpy())[:-1]]),
        )
    )
    off_ref = ray.put(offsets)

    def _rank(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        g = g.sort_values(["_h", id_col], kind="mergesort")
        b = int(g["_b"].iloc[0])
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                "shuffle_pos": np.arange(len(g), dtype=np.int64) + int(off[b]),
            }
        )

    return slim.groupby("_b").map_groups(_rank, batch_format="pandas")


_MD5_SPACE = 1 << 60  # 15 hex chars, the KMV-style SQL-reproducible hash


def weighted_sample(
    ds: "ray.data.Dataset",
    rates: dict[str, float],
    key_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "mix",
) -> "ray.data.Dataset":
    """Corpus-mixing sampler: keep a row iff its deterministic unit
    uniform ``u(id) < rates.get(row[key_col], default_rate)`` — the
    per-language / per-source rebalancing step of a training-data mix.

    ``u`` is the top-60-bit md5 of ``salt + str(id)`` (the same
    SQL-reproducible construction as the KMV sketch), so the exact kept
    set is re-derivable in DuckDB:
    ``('0x' || left(md5('<salt>' || CAST(id AS VARCHAR)), 15))::BIGINT
    < CAST(rate * 2^60 AS BIGINT)``.  Deterministic across runs and
    cluster sizes; independent mixes via ``salt``.  Stateless map —
    md5 per row is the price of oracle-exactness (~1 µs/row; swap
    ``functions.texthash.hash_str_array`` in when exactness vs SQL is
    not required)."""
    import hashlib

    thresholds = {
        k: int(round(r * _MD5_SPACE)) for k, r in rates.items()
    }
    default_t = int(round(default_rate * _MD5_SPACE))

    def _fn(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy()
        u = np.fromiter(
            (
                int(
                    hashlib.md5(f"{salt}{v}".encode("utf-8")).hexdigest()[:15],
                    16,
                )
                for v in ids
            ),
            dtype=np.int64,
            count=len(ids),
        )
        t = (
            batch[key_col]
            .map(thresholds)
            .fillna(default_t)
            .astype(np.int64)
            .to_numpy()
        )
        return batch[u < t]

    return ds.map_batches(_fn, batch_format="pandas")


def weighted_reservoir_topk(
    ds: "ray.data.Dataset",
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "wrs",
) -> "ray.data.Dataset":
    """Weighted sampling WITHOUT replacement, Efraimidis–Spirakis A-Res
    (IPL 2006): each row draws a deterministic unit uniform
    ``u = (md5₆₀(salt + id) + 1) / 2⁶⁰`` and the ``k`` rows with the
    largest ``u^(1/w)`` — equivalently the largest ``ln(u)/w`` — are
    the exact weighted sample.  P(row ∈ sample) ∝ weight, and the
    construction is SQL-reproducible, so the exact kept SET is
    re-derivable in DuckDB (``ln(u)/w`` ranked with an id tiebreak).

    Plan: the per-row key is a stateless map; selection rides the
    driver-merge `relational.topk` (each block keeps its local top-k,
    ≤ k rows per block cross to the driver) — no global sort, weights
    never shuffle.  Output: the selected input rows (key column
    dropped).  Weights must be > 0 (guarded)."""
    import hashlib

    from .relational import topk

    def _key(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy()
        w = batch[weight_col].to_numpy(dtype=np.float64)
        if (w <= 0).any():
            raise ValueError("weighted_reservoir_topk: weights must be > 0")
        u = np.fromiter(
            (
                int(
                    hashlib.md5(f"{salt}{v}".encode("utf-8")).hexdigest()[:15],
                    16,
                )
                for v in ids
            ),
            dtype=np.int64,
            count=len(ids),
        )
        batch = batch.copy()
        batch["_es_key"] = np.log((u.astype(np.float64) + 1.0) / _MD5_SPACE) / w
        return batch

    keyed = ds.map_batches(_key, batch_format="pandas")
    return topk(keyed, ["_es_key", id_col], [True, False], k).drop_columns(
        ["_es_key"]
    )


def cluster_balanced_sample(
    ds: "ray.data.Dataset",
    m: int,
    cluster_col: str = "cluster",
    id_col: str = "vec_id",
    salt: str = "cbal",
) -> "ray.data.Dataset":
    """Keep at most ``m`` rows per cluster, chosen by deterministic
    md5 rank — the cluster-balanced subsampling step of a curated
    corpus mix (SemDeDup-style: cluster first, then cap each semantic
    bucket so head clusters can't dominate the mix).

    The per-row draw is the same SQL-reproducible top-60-bit
    ``md5(salt + id)`` as :func:`weighted_sample`, so the EXACT kept
    set re-derives in DuckDB via ``row_number() OVER (PARTITION BY
    cluster ORDER BY u, id) <= m``.  One cluster-hash partition pass
    (per-batch top-m pre-shrink inside :func:`..ops.relational.
    topn_per_group`); deterministic across runs and cluster sizes."""
    import hashlib

    from .relational import topn_per_group

    def _draw(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_u"] = np.fromiter(
            (
                int(
                    hashlib.md5(f"{salt}{v}".encode("utf-8")).hexdigest()[:15],
                    16,
                )
                for v in batch[id_col].to_numpy()
            ),
            dtype=np.int64,
            count=len(batch),
        )
        return batch

    kept = topn_per_group(
        ds.map_batches(_draw, batch_format="pandas"),
        group_key=cluster_col,
        order_col="_u",
        n=m,
        descending=False,
        tiebreak=(id_col,),
    )
    return kept.drop_columns(["_u"])


__all__ = [
    "assign_split",
    "hash_sample",
    "stratified_sample",
    "shuffle_for_training",
    "weighted_sample",
    "cluster_balanced_sample",
]


def stratified_sample_k(
    ds: "ray.data.Dataset",
    key_col: str,
    id_col: str,
    k: int,
    salt: str = "strat",
) -> "ray.data.Dataset":
    """EXACT-k per-group sample: the k rows with the smallest
    deterministic md5 draw in each ``key_col`` group — the balanced
    eval-set builder (`weighted_sample` keeps a *rate*, this keeps a
    *count*; both draws are the same SQL-reproducible construction).

    Rides :func:`..ops.relational.topn_per_group`'s pre-shuffle shrink:
    each batch keeps its local k-smallest per group, so ≤ k rows per
    (group, block) cross the exchange.  Ties in the 60-bit draw
    (~2⁻⁶⁰/pair) break by id — the order is total, so the sample is
    partition-invariant and a resumed run picks the same rows.

    Oracle shape::

        row_number() OVER (PARTITION BY key ORDER BY
            ('0x' || left(md5(salt || id), 15))::BIGINT, id) <= k
    """
    import hashlib

    from .relational import topn_per_group

    def _draw(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_u"] = np.fromiter(
            (
                int(
                    hashlib.md5(
                        f"{salt}{v}".encode("utf-8")
                    ).hexdigest()[:15],
                    16,
                )
                for v in batch[id_col].to_numpy()
            ),
            dtype=np.int64,
            count=len(batch),
        )
        return batch

    picked = topn_per_group(
        ds.map_batches(_draw, batch_format="pandas"),
        group_key=key_col,
        order_col="_u",
        n=k,
        descending=False,
        tiebreak=[id_col],
    )
    return picked.drop_columns(["_u"])


__all__.append("stratified_sample_k")


def temperature_sample(
    ds: "ray.data.Dataset",
    key_col: str = "source",
    alpha: float = 0.5,
    id_col: str = "doc_id",
    salt: str = "temp",
) -> "ray.data.Dataset":
    """Temperature-scaled group resampling (the XLM-R / mBERT corpus
    rebalancing rule): group k's per-row keep probability is
    ``(n_min / n_k)^(1-alpha)`` — the head groups are downsampled
    toward the smallest group, with ``alpha`` ∈ [0,1] interpolating
    between full flattening (0) and the natural mix (1).

    One slim combiner census learns the group counts (O(#groups) on
    the driver — sources/languages, never rows); the derived rates
    feed :func:`weighted_sample`'s md5-60-bit keep rule, so the exact
    kept set is SQL-re-derivable.  ``alpha=0.5`` computes the rate via
    ``sqrt`` (IEEE-correctly-rounded on BOTH engines — bit-identical
    thresholds engine-vs-oracle); other alphas go through ``pow`` and
    may differ from an oracle by 1 ulp at threshold boundaries."""
    from .relational import grouped_aggregate

    counts = grouped_aggregate(
        ds.select_columns([key_col]), [key_col],
        [("count_star", None, "_n")],
    ).to_pandas()
    nmin = float(counts["_n"].min())
    rates = {}
    for k, nk in zip(counts[key_col], counts["_n"]):
        x = nmin / float(nk)
        rates[k] = float(np.sqrt(x)) if alpha == 0.5 else float(
            x ** (1.0 - alpha)
        )
    return weighted_sample(
        ds, rates, key_col=key_col, id_col=id_col,
        default_rate=0.0, salt=salt,
    )


__all__.append("temperature_sample")
