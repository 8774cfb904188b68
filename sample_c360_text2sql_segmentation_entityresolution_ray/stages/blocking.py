"""Blocking: MinHash-LSH banding + salted domain / sorted-neighborhood
blocks → bounded candidate-pair generation.

Reference analog: the candidate-generation half of AWS ER
``ML_MATCHING`` (`lib/entity-resolution-service.ts:140-183`), re-expressed
per the north rule as explicit groupby shuffles:

1. ``band_emit_stage`` — each match record is exploded to
   ``bands + 1 + rare_token_keys`` keyed rows: 16 LSH band keys
   (collide ⇔ likely Jaccard-similar), one salted domain key
   (``dom:<domain>#<slug-prefix>`` — the sorted-neighborhood family;
   the slug-prefix salt bounds any one group, including the hot-domain
   skew, at the documented cost of missing cross-salt-boundary pairs),
   and the record's ``rare_token_keys`` smallest token hashes
   (rare-term blocking — catches weak-shingle pairs whose token
   overlap is still high; frequent-token megablocks are defused by the
   pair-gen cap below).
2. ``pair_gen_stage`` — **Shuffle #1**: ``groupby(block_key)``.  Small
   groups emit all pairs; groups above ``allpairs_cap`` are sorted by
   slug and emit sorted-neighborhood window pairs only — pair count is
   linear, never quadratic, in group size.  ``block_n`` records the
   group size on every pair so capping is observable, never silent.
3. ``dedupe_pairs_stage`` — the same pair surfaces from up to 17
   blocks; one ``groupby(pair_key)`` keeps the first.

No stage ever materializes a global pair space: pairs stream from the
groupby into the scorer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.minhash import band_keys
from ..functions.texthash import hash_str_array
from .config import DEFAULT_CONFIG, ERConfig

PAIR_FEATURES = ["slug", "shingles"]


def band_emit_stage(records, cfg: ERConfig = DEFAULT_CONFIG):
    """Explode each record into (block_key, url, slug, shingles,
    tok_hashes) rows — one per LSH band plus one per domain block."""

    def _emit(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {
                    "block_key": pa.array([], pa.uint64()),
                    "url": pa.array([], pa.string()),
                    "slug": pa.array([], pa.string()),
                    "shingles": pa.array([], pa.list_(pa.uint64())),
                }
            )
        sigs = np.stack(
            [np.asarray(s, dtype=np.uint64) for s in batch["minhash"].to_pylist()]
        )
        lsh = band_keys(sigs, cfg.bands)  # (n, bands) uint64
        domains = batch["domain"].to_pylist()
        slugs = batch["slug"].to_pylist()
        dom_keys = hash_str_array(
            [
                f"dom:{d}#{s[: cfg.domain_salt_chars]}"
                for d, s in zip(domains, slugs)
            ]
        )
        # rare-term blocking: the k smallest token hashes of each record
        # (bottom-k of a uniform hash ~ the same tokens on both sides of
        # a near-dup pair).  Salted with a prefix so the keyspace is
        # disjoint from LSH band keys.
        rt = cfg.rare_token_keys
        urls_list = batch["url"].to_pylist()
        tok_cols = np.empty((n, rt), dtype=np.uint64)
        for i, th in enumerate(batch["tok_hashes"].to_pylist()):
            u = np.unique(np.asarray(th, dtype=np.uint64))[:rt]
            if len(u) < rt:
                # pad with record-unique keys (never collide) so short
                # records don't form a spurious shared block
                pad = hash_str_array([f"{urls_list[i]}#p{j}" for j in range(rt - len(u))])
                u = np.concatenate([u, pad])
            tok_cols[i] = u ^ np.uint64(0x9E3779B97F4A7C15)
        keys = np.concatenate([lsh, dom_keys[:, None], tok_cols], axis=1)
        n_keys = keys.shape[1]
        idx = np.repeat(np.arange(n), n_keys)
        sub = batch.select(["url", "slug", "shingles"]).take(idx)
        return sub.add_column(
            0, "block_key", pa.array(keys.reshape(-1), pa.uint64())
        )

    return records.map_batches(_emit, batch_format="pyarrow")


_PAIR_COLUMNS = {
    "pair_key": np.uint64,
    "url_a": object,
    "url_b": object,
    "slug_a": object,
    "slug_b": object,
    "shingles_a": object,
    "shingles_b": object,
    "block_n": np.int32,
}


def _empty_pairs() -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series(dtype=t) for c, t in _PAIR_COLUMNS.items()})


def _emit_pairs(group: pd.DataFrame, cfg: ERConfig) -> pd.DataFrame:
    # one block: distinct records sharing block_key
    group = group.drop_duplicates("url")
    n = len(group)
    if n < 2:
        return _empty_pairs()
    group = group.sort_values("slug", kind="mergesort")  # deterministic
    if n <= cfg.allpairs_cap:
        ii, jj = np.triu_indices(n, k=1)
    else:
        # sorted-neighborhood: window pairs only (linear in n)
        w = cfg.snm_window
        ii_l, jj_l = [], []
        for off in range(1, w):
            ii_l.append(np.arange(0, n - off))
            jj_l.append(np.arange(off, n))
        ii, jj = np.concatenate(ii_l), np.concatenate(jj_l)
    urls = group["url"].to_numpy()
    a, b = urls[ii], urls[jj]
    # canonical order url_a < url_b so dedup works across blocks
    flip = a > b
    a2 = np.where(flip, b, a)
    b2 = np.where(flip, a, b)
    ii2 = np.where(flip, jj, ii)
    jj2 = np.where(flip, ii, jj)
    take = lambda col, ix: group[col].to_numpy()[ix]  # noqa: E731
    return pd.DataFrame(
        {
            "pair_key": hash_str_array(np.char.add(np.char.add(a2.astype(str), "|"), b2.astype(str)).astype(object)),
            "url_a": a2,
            "url_b": b2,
            "slug_a": take("slug", ii2),
            "slug_b": take("slug", jj2),
            "shingles_a": take("shingles", ii2),
            "shingles_b": take("shingles", jj2),
            "block_n": np.full(len(a2), n, dtype=np.int32),
        }
    )


def pair_gen_stage(exploded, cfg: ERConfig = DEFAULT_CONFIG):
    """Shuffle #1: group by block key, emit bounded candidate pairs."""
    return exploded.groupby("block_key").map_groups(
        lambda g: _emit_pairs(g, cfg), batch_format="pandas"
    )


def dedupe_pairs_stage(pairs, cfg: ERConfig = DEFAULT_CONFIG):
    """Drop duplicate candidate pairs surfaced by multiple blocks.
    Keeps the copy with the largest ``block_n`` (observability only —
    features are identical)."""
    return pairs.groupby("pair_key").map_groups(
        lambda g: g.iloc[:1], batch_format="pandas"
    )
