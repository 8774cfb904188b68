"""Training-example assembly: sliding-window chunking and token-budget
sequence packing — the steps between a curated corpus and an LLM
training run.

The reference delegates all compute to generated SQL
(`lambda/webbackend/agent_processor.py:836-860`) and has no
training-example machinery; these operators extend the engine for the
100-TB corpus-preparation workload per the build brief.

- :func:`chunk_docs` — split each document into fixed-token sliding
  windows with stride (the HF-tokenizer ``return_overflowing_tokens``
  shape): chunk k covers tokens ``[k*stride, k*stride+window)`` and the
  last chunk is the one whose window first reaches the end of the doc,
  so every token is covered and no degenerate sub-window tails are
  emitted.  Stateless map — embarrassingly parallel, no shuffle.

- :func:`pack_sequences` — next-fit packing of documents into
  fixed-token-budget training sequences.  Packing is inherently a
  sequential scan, so it is parallelized by partitioning: documents are
  hashed (SQL-reproducible md5-60bit, the `ops.sampling.weighted_sample`
  construction) into ``partitions`` groups, and next-fit runs per
  partition over docs ordered by id.  ONE partition-hash shuffle of
  (id, n_tokens) slim rows — text never moves.  Within a partition the
  scan is O(#bins) numpy ``searchsorted`` jumps over the token cumsum,
  not a per-row Python loop.  Partitioning contract: ``partitions``
  should scale with cluster cores; bin ids are deterministic for a
  given (salt, partitions, budget) regardless of cluster size.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .relational import DEDUP_PARTITIONS

_MD5_SPACE = 1 << 60


def chunk_docs(
    ds: "ray.data.Dataset",
    window: int = 512,
    stride: int = 384,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """(id, chunk_id, chunk_start, n_chunk_tokens, chunk_text) — one row
    per sliding window of whitespace tokens.  Docs with zero tokens emit
    no chunks.  ``chunk_text`` is the single-space re-join of the
    window's tokens (a defined, SQL-reproducible semantic:
    ``array_to_string(toks[a:b], ' ')``)."""
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")

    def _fn(batch: pa.Table) -> pa.Table:
        ids_in = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        ids, ks, starts, lens, chunks = [], [], [], [], []
        for i, t in zip(ids_in, texts):
            toks = t.split()
            n = len(toks)
            if n == 0:
                continue
            kmax = -(-(max(n - window, 0)) // stride)  # ceil
            for k in range(kmax + 1):
                s = k * stride
                piece = toks[s : s + window]
                ids.append(i)
                ks.append(k)
                starts.append(s)
                lens.append(len(piece))
                chunks.append(" ".join(piece))
        return pa.table(
            {
                id_col: pa.array(ids, batch[id_col].type),
                "chunk_id": pa.array(ks, pa.int64()),
                "chunk_start": pa.array(starts, pa.int64()),
                "n_chunk_tokens": pa.array(lens, pa.int64()),
                "chunk_text": pa.array(chunks, pa.string()),
            }
        )

    return ds.map_batches(_fn, batch_format="pyarrow")


def chunk_oracle_sql(
    table: str,
    window: int,
    stride: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB SQL re-deriving :func:`chunk_docs` exactly (tokenization,
    window starts, tail rule, single-space re-join)."""
    return f"""
WITH toks AS (
  SELECT {id_col},
         list_filter(regexp_split_to_array({text_col}, '\\s+'), x -> x <> '') AS t
  FROM {table}
), sized AS (
  SELECT {id_col}, t, len(t) AS n FROM toks WHERE len(t) > 0
)
SELECT {id_col},
       k AS chunk_id,
       k * {stride} AS chunk_start,
       least({window}, n - k * {stride}) AS n_chunk_tokens,
       array_to_string(t[k*{stride}+1 : k*{stride}+{window}], ' ') AS chunk_text
FROM sized,
     LATERAL (SELECT unnest(generate_series(
       0, CAST(ceil(greatest(n - {window}, 0) / {stride}.0) AS BIGINT))) AS k) g
"""


def pack_sequences(
    ds: "ray.data.Dataset",
    budget: int = 4096,
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    partitions: int = DEDUP_PARTITIONS,
    salt: str = "pack:",
) -> "ray.data.Dataset":
    """(id, n_tokens, part, seq_id): assign each document to a training
    sequence of at most ``budget`` tokens by next-fit over docs ordered
    by id within each md5-hash partition.  An oversize doc (> budget)
    occupies its own sequence; per next-fit, nothing joins a sequence
    whose fill already exceeds the budget."""

    def _part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        ids = df[id_col].to_numpy()
        df["part"] = np.fromiter(
            (
                int(hashlib.md5(f"{salt}{v}".encode("utf-8")).hexdigest()[:15], 16)
                % partitions
                for v in ids
            ),
            dtype=np.int64,
            count=len(ids),
        )
        return df

    def _pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        n = g[tokens_col].to_numpy(np.int64)
        cum = np.cumsum(n)
        bins = np.empty(len(g), dtype=np.int64)
        s, b = 0, 0
        while s < len(g):
            base = cum[s - 1] if s else 0
            # largest prefix with cum - base <= budget; at least one doc
            j = int(np.searchsorted(cum, base + budget, side="right")) - 1
            j = max(j, s)
            bins[s : j + 1] = b
            s, b = j + 1, b + 1
        g["seq_id"] = bins
        return g[[id_col, tokens_col, "part", "seq_id"]]

    return (
        ds.map_batches(_part, batch_format="pandas")
        .groupby("part")
        .map_groups(_pack, batch_format="pandas")
    )


def pack_oracle_sql(
    table: str,
    budget: int,
    partitions: int,
    tokens_sql: str,
    id_col: str = "doc_id",
    salt: str = "pack:",
) -> str:
    """DuckDB SQL re-deriving :func:`pack_sequences` exactly: the same
    md5-60bit partition assignment and a recursive-CTE next-fit scan
    per partition.  ``tokens_sql`` is the per-row token-count
    expression (so the oracle also re-derives the tokenization)."""
    part = f"CAST(('0x' || left(md5('{salt}' || {id_col}), 15)) AS BIGINT) % {partitions}"
    return f"""
WITH RECURSIVE ranked AS (
  SELECT {id_col}, {tokens_sql} AS n_tokens, {part} AS part,
         row_number() OVER (PARTITION BY {part} ORDER BY {id_col}) AS rn
  FROM {table}
),
packed AS (
  SELECT {id_col}, n_tokens, part, rn, CAST(0 AS BIGINT) AS seq_id,
         n_tokens AS fill
  FROM ranked WHERE rn = 1
  UNION ALL
  SELECT r.{id_col}, r.n_tokens, r.part, r.rn,
         CASE WHEN p.fill + r.n_tokens <= {budget} THEN p.seq_id ELSE p.seq_id + 1 END,
         CASE WHEN p.fill + r.n_tokens <= {budget} THEN p.fill + r.n_tokens ELSE r.n_tokens END
  FROM packed p JOIN ranked r ON r.part = p.part AND r.rn = p.rn + 1
)
SELECT {id_col}, n_tokens, part, seq_id FROM packed
"""


__all__ = [
    "chunk_docs",
    "chunk_oracle_sql",
    "pack_sequences",
    "pack_oracle_sql",
]
