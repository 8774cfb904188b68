"""Similarity search over an embedding column (``list<float>``).

Not present in the reference (its nearest analog is the Personalize
item-affinity black box, `lib/personalize.ts:91`); required for
training-data pipelines.  Two paths:

- :func:`knn_brute_force` — exact cosine top-k.  The query matrix is
  broadcast ONCE (`ray.put`); every batch computes a float64 matmul
  against it and keeps a per-batch partial top-k, so the reduce input
  is ``O(num_blocks × Q × k)`` — tiny — and the corpus streams.
- :func:`knn_ivf` — IVF-style scale path: k-means-lite centroids
  (sampled, driver-fit), corpus bucketed by nearest centroid
  (partition key for a 100 TB layout), queries probe ``n_probe``
  nearest buckets only.  Recall < 1 by design; the brute-force path is
  the correctness baseline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .relational import topn_per_group


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(n == 0, 1.0, n)


def quantize_embeddings(
    ds: "ray.data.Dataset",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> "ray.data.Dataset":
    """Symmetric per-vector int8 quantization:
    ``(id, scale, q:list<int8>)`` with ``q = round(v / scale * 127)``
    (half away from zero — DuckDB `round`, so the construction is
    oracle-checkable) and ``scale = max|v|`` (1.0 for a zero vector).

    The standard 4× memory/IO shrink for a 100-TB embedding store:
    dequant ``v̂ = q·scale/127`` bounds per-dimension error at
    ``scale/254``, so int8 IVF probes rank candidates and the exact
    float vectors re-score only the short list.  Stateless streaming
    map — zero shuffle, no state."""

    def _fn(batch: pa.Table) -> pa.Table:
        X = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
        if X.size == 0:
            return pa.table(
                {
                    id_col: batch[id_col],
                    "scale": pa.array([], pa.float64()),
                    "q": pa.array([], pa.list_(pa.int8())),
                }
            )
        scale = np.abs(X).max(axis=1)
        scale = np.where(scale > 0, scale, 1.0)
        y = X / scale[:, None] * 127.0
        q = np.trunc(y + np.copysign(0.5, y)).astype(np.int8)
        return pa.table(
            {
                id_col: batch[id_col],
                "scale": pa.array(scale, pa.float64()),
                "q": pa.array(list(q), pa.list_(pa.int8())),
            }
        )

    return ds.map_batches(_fn, batch_format="pyarrow")


def knn_brute_force(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> "ray.data.Dataset":
    """Exact cosine top-k: (query_id, vec_id, cos) — k rows per query.

    ``queries``: (Q, dim) float array.  Ties at rank k broken by
    ``vec_id`` ascending (deterministic)."""
    qm = _unit(np.asarray(queries, dtype=np.float64))
    ref = ray.put(qm)

    def _partial_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(ref)  # plasma-resident, ~free per task
        embs = _unit(np.asarray(batch[emb_col].to_pylist(), dtype=np.float64))
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        sims = embs @ q.T  # (n, Q)
        n, Q = sims.shape
        kk = min(k, n)
        # per-query partial top-k within this batch
        part = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, Q)
        qids = np.repeat(np.arange(Q), kk)
        rows = part.T.reshape(-1)
        return pa.table(
            {
                "query_id": pa.array(qids, pa.int64()),
                id_col: pa.array(ids[rows], pa.int64()),
                "cos": pa.array(sims[rows, qids], pa.float64()),
            }
        )

    partials = ds.map_batches(_partial_topk, batch_format="pyarrow")
    return topn_per_group(
        partials, "query_id", "cos", k, descending=True, tiebreak=[id_col]
    )


def knn_quantized(
    quant_ds: "ray.data.Dataset",
    float_ds: "ray.data.Dataset",
    queries: np.ndarray,
    k: int = 10,
    rescore_factor: int = 4,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> "ray.data.Dataset":
    """Two-stage ANN over the int8 store: scan the QUANTIZED table
    (``quantize_embeddings`` output — 4× less storage/transport than
    float32), keep ``rescore_factor·k`` candidates per query, then
    re-score only that short list against the exact float vectors.
    Output matches :func:`knn_brute_force` (query_id, vec_id, cos).

    At 100 TB the quantized table is what streams off storage on every
    search; the float table is touched for ``Q·rescore_factor·k`` rows
    (point lookups / an `is_in`-pruned scan).  Exactness: equal to the
    brute-force top-k whenever int8 error (≤ scale/254 per dim) does
    not push a true top-k member below the rescore boundary — the
    baseline path stays the correctness oracle (tested equal on the
    fixture at the default factor)."""
    qm = _unit(np.asarray(queries, dtype=np.float64))
    ref = ray.put(qm)
    kk_target = rescore_factor * k

    def _scan(batch: pa.Table) -> pa.Table:
        q = ray.get(ref)
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        scale = np.asarray(batch["scale"].to_pylist(), dtype=np.float64)
        Q8 = np.asarray(batch["q"].to_pylist(), dtype=np.float64)
        Xhat = Q8 * (scale / 127.0)[:, None]  # dequant
        sims = _unit(Xhat) @ q.T
        n, Q = sims.shape
        kk = min(kk_target, n)
        part = np.argpartition(-sims, kk - 1, axis=0)[:kk]
        qids = np.repeat(np.arange(Q), kk)
        rows = part.T.reshape(-1)
        return pa.table(
            {
                "query_id": pa.array(qids, pa.int64()),
                id_col: pa.array(ids[rows], pa.int64()),
                "acos": pa.array(sims[rows, qids], pa.float64()),
            }
        )

    cands = topn_per_group(
        quant_ds.map_batches(_scan, batch_format="pyarrow"),
        "query_id", "acos", kk_target, descending=True, tiebreak=[id_col],
    ).to_pandas()
    # candidate pair set is Q·rescore_factor·k rows — dimension-sized;
    # broadcast it and prune the float scan to member rows only
    pair_set = set(zip(cands["query_id"], cands[id_col]))
    id_arr = pa.array(sorted(set(cands[id_col])), pa.int64())
    pair_ref = ray.put(pair_set)

    def _rescore(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.is_in(batch[id_col], value_set=id_arr))
        if batch.num_rows == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    id_col: pa.array([], pa.int64()),
                    "cos": pa.array([], pa.float64()),
                }
            )
        q = ray.get(ref)
        pairs = ray.get(pair_ref)
        embs = _unit(np.asarray(batch[emb_col].to_pylist(), dtype=np.float64))
        ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
        sims = embs @ q.T
        n, Q = sims.shape
        qids = np.repeat(np.arange(Q), n)
        vids = np.tile(ids, Q)
        keep = np.fromiter(
            ((qq, vv) in pairs for qq, vv in zip(qids, vids)),
            bool, len(qids),
        )
        return pa.table(
            {
                "query_id": pa.array(qids[keep], pa.int64()),
                id_col: pa.array(vids[keep], pa.int64()),
                "cos": pa.array(
                    sims.T.reshape(-1)[keep], pa.float64()
                ),
            }
        )

    rescored = float_ds.select_columns([id_col, emb_col]).map_batches(
        _rescore, batch_format="pyarrow"
    )
    return topn_per_group(
        rescored, "query_id", "cos", k, descending=True, tiebreak=[id_col]
    )


def fit_centroids(
    ds: "ray.data.Dataset",
    n_centroids: int = 16,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    sample_limit: int = 20_000,
    iters: int = 10,
    seed: int = 11,
) -> np.ndarray:
    """Driver-side k-means on a bounded sample (the IVF coarse
    quantizer).  The sample, not the corpus, bounds driver memory.
    Sampled by id hash (content-defined): ``limit()`` would take the
    first N rows, which on sorted/clustered input biases the centroids
    toward one region of the space."""
    from .sampling import hash_sample

    n = ds.count()
    if n > sample_limit:
        p = min(1.0, 1.2 * sample_limit / n)  # slight over-draw, then cap
        sampled = hash_sample(ds, p, id_col=id_col, salt="ivf")
    else:
        sampled = ds
    sample = sampled.limit(sample_limit).to_pandas()
    x = _unit(np.asarray(sample[emb_col].to_list(), dtype=np.float64))
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(len(cents)):
            mask = assign == c
            if mask.any():
                cents[c] = x[mask].mean(axis=0)
        cents = _unit(cents)
    return cents


def ivf_bucket_stage(
    ds: "ray.data.Dataset", centroids: np.ndarray, emb_col: str = "embedding"
) -> "ray.data.Dataset":
    """Add an ``ivf_bucket`` column = nearest centroid id.  At scale this
    is the partition key: write_parquet(partition_cols=['ivf_bucket'])
    gives prune-at-read for probes."""
    ref = ray.put(_unit(np.asarray(centroids, dtype=np.float64)))

    def _assign(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        embs = _unit(np.asarray(batch[emb_col].to_pylist(), dtype=np.float64))
        b = np.argmax(embs @ c.T, axis=1).astype(np.int32)
        return batch.append_column("ivf_bucket", pa.array(b, pa.int32()))

    return ds.map_batches(_assign, batch_format="pyarrow")


def knn_ivf(
    bucketed: "ray.data.Dataset",
    queries: np.ndarray,
    centroids: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> "ray.data.Dataset":
    """Approximate top-k: scan only rows in the ``n_probe`` buckets
    nearest each query.  With a bucket-partitioned Parquet layout the
    filter becomes partition pruning at the read."""
    qm = _unit(np.asarray(queries, dtype=np.float64))
    cm = _unit(np.asarray(centroids, dtype=np.float64))
    order = np.argsort(-(qm @ cm.T), axis=1)[:, :n_probe]  # (Q, n_probe)
    wanted = sorted({int(b) for row in order for b in row})
    # Union of all queries' probe sets: a query may see hits from another
    # query's bucket — that only ever RAISES recall vs per-query probing,
    # so it is accepted (and keeps the scan a single filtered pass).  On a
    # bucket-partitioned Parquet layout this becomes partition pruning.
    wanted_arr = pa.array(wanted, pa.int32())

    def _probe(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_in(batch["ivf_bucket"], value_set=wanted_arr))

    filtered = bucketed.map_batches(_probe, batch_format="pyarrow")
    return knn_brute_force(filtered, queries, k=k, emb_col=emb_col, id_col=id_col)


def write_ivf_parquet(
    bucketed: "ray.data.Dataset", path: str
) -> None:
    """Persist the bucketed corpus hive-partitioned by ``ivf_bucket`` —
    one directory per bucket, so probes become partition pruning at the
    read (and a failed indexing run resumes per-bucket)."""
    bucketed.write_parquet(path, partition_cols=["ivf_bucket"])


def knn_ivf_parquet(
    path: str,
    queries: np.ndarray,
    centroids: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> "ray.data.Dataset":
    """IVF probe over a bucket-partitioned Parquet layout: only the
    ``n_probe`` nearest buckets' DIRECTORIES are read — the pruning
    happens in the parquet fragment planner via the partition-column
    filter, before any row leaves storage (the 100-TB ANN read path)."""
    import os

    qm = _unit(np.asarray(queries, dtype=np.float64))
    cm = _unit(np.asarray(centroids, dtype=np.float64))
    order = np.argsort(-(qm @ cm.T), axis=1)[:, :n_probe]
    wanted = sorted({int(b) for row in order for b in row})
    # directory-level pruning: hand the reader ONLY the probed buckets'
    # hive directories — unprobed partitions never produce read tasks.
    # (Ray 2.49's read_parquet(filter=...) samples fragments against the
    # file schema, which lacks the virtual hive column — so the prune is
    # done on paths, which is also the more explicit form of the plan.)
    paths = []
    for b in wanted:
        d = os.path.join(path, f"ivf_bucket={b}")
        if os.path.isdir(d):
            # a path LIST must be files (Ray treats list entries as
            # files); expand each probed directory
            paths.extend(
                os.path.join(d, f)
                for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            )
    filtered = ray.data.read_parquet(paths, columns=[id_col, emb_col])
    return knn_brute_force(filtered, queries, k=k, emb_col=emb_col, id_col=id_col)


__all__ = [
    "knn_brute_force",
    "fit_centroids",
    "ivf_bucket_stage",
    "knn_ivf",
    "write_ivf_parquet",
    "knn_ivf_parquet",
]
