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
3. Duplicate pairs (the same pair surfaces from up to ~25 blocks,
   measured dup factor ≈ 2.1×) flow straight into the scorer — every
   downstream consumer is idempotent (min-label propagation, max
   confidence, set-based F1), so the correct place to dedupe is the
   tiny post-threshold matched-edge table
   (`pipelines/entity_resolution.py`), NOT a full candidate-pair
   shuffle: scoring a duplicate costs microseconds, shuffling every
   candidate's feature payload costs a second all-to-all exchange.
   ``dedupe_pairs_stage`` remains available for callers that need an
   exactly-once pair stream.

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

PAIR_FEATURES = ["slug", "shingles", "shingles2"]


def band_emit_stage(records, cfg: ERConfig = DEFAULT_CONFIG, slim: bool = False):
    """Explode each record into one row per blocking key (LSH bands +
    salted domain + rare-token keys).

    ``slim=False`` (payload mode): rows carry the record's feature
    arrays so scoring needs no join back to the corpus.
    ``slim=True`` (broadcast mode): rows carry only (block_key, url,
    slug) — ~10× less shuffle volume; the gate fetches features from a
    broadcast table instead (`pipelines/entity_resolution.py`)."""
    payload_cols = ["slug"] if slim else ["slug", "shingles", "shingles2", "mh8"]

    def _emit(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            cols = {
                "block_key": pa.array([], pa.uint64()),
                "url": pa.array([], pa.string()),
                "slug": pa.array([], pa.string()),
            }
            if not slim:
                cols["shingles"] = pa.array([], pa.list_(pa.uint32()))
                cols["shingles2"] = pa.array([], pa.list_(pa.uint32()))
                cols["mh8"] = pa.array([], pa.list_(pa.uint8()))
            return pa.table(cols)
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
        sub = batch.select(["url", *payload_cols]).take(idx)
        return sub.add_column(
            0, "block_key", pa.array(keys.reshape(-1), pa.uint64())
        )

    return records.map_batches(_emit, batch_format="pyarrow")


_PAIR_COLUMNS = {
    "url_a": object,
    "url_b": object,
    "slug_a": object,
    "slug_b": object,
    "shingles_a": object,
    "shingles_b": object,
    "shingles2_a": object,
    "shingles2_b": object,
    "mh8_a": object,
    "mh8_b": object,
    "block_n": np.int32,
}


def _empty_pairs() -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series(dtype=t) for c, t in _PAIR_COLUMNS.items()})


def emit_partition_pairs_generic(
    df: pd.DataFrame,
    id_col: str,
    order_col: str,
    payload_cols: list[str],
    cap: int,
    window: int,
) -> pd.DataFrame:
    """Generic vectorized pair emission for ONE hash partition — the
    kernel behind :func:`_emit_partition_pairs` (pages) and the
    structured-record ER in ``pipelines/customer_er.py``.  Emits
    ``{id_col}_a/_b``, ``{payload}_a/_b`` and ``block_n``."""
    df = df.drop_duplicates(["block_key", id_col])
    keys = df["block_key"].to_numpy().astype(np.uint64)
    out_cols = (
        [f"{id_col}_a", f"{id_col}_b"]
        + [f"{c}_{s}" for c in payload_cols for s in ("a", "b")]
        + ["block_n"]
    )
    if len(keys) < 2:
        return pd.DataFrame({c: pd.Series(dtype=object) for c in out_cols[:-1]}
                            | {"block_n": pd.Series(dtype=np.int32)})
    ids = df[id_col].to_numpy()
    ordv = df[order_col].to_numpy()
    payload = {c: df[c].to_numpy() for c in payload_cols}
    order = np.lexsort((ids, ordv, keys))
    keys, ids, ordv = keys[order], ids[order], ordv[order]
    payload = {c: v[order] for c, v in payload.items()}
    _, counts = np.unique(keys, return_counts=True)
    gid = np.repeat(np.arange(len(counts)), counts)
    size = np.repeat(counts, counts).astype(np.int32)
    D = int(min(counts.max() - 1, max(cap - 1, window - 1)))
    ii_l, jj_l = [], []
    for d in range(1, D + 1):
        same = gid[:-d] == gid[d:]
        if d >= window:
            same &= size[:-d] <= cap
        i = np.flatnonzero(same)
        if len(i):
            ii_l.append(i)
            jj_l.append(i + d)
    if not ii_l:
        return pd.DataFrame({c: pd.Series(dtype=object) for c in out_cols[:-1]}
                            | {"block_n": pd.Series(dtype=np.int32)})
    ii = np.concatenate(ii_l)
    jj = np.concatenate(jj_l)
    a, b = ids[ii], ids[jj]
    flip = a > b
    ii2 = np.where(flip, jj, ii)
    jj2 = np.where(flip, ii, jj)
    data = {f"{id_col}_a": ids[ii2], f"{id_col}_b": ids[jj2]}
    for c, v in payload.items():
        data[f"{c}_a"] = v[ii2]
        data[f"{c}_b"] = v[jj2]
    data["block_n"] = size[ii]
    return pd.DataFrame(data).drop_duplicates([f"{id_col}_a", f"{id_col}_b"])


def _emit_partition_pairs(
    df: pd.DataFrame, cfg: ERConfig, slim: bool = False
) -> pd.DataFrame:
    """Vectorized pair emission for ONE hash partition of block keys.

    All blocks of the partition are processed in a handful of numpy
    kernels — no per-block Python.  Rows are sorted by
    (block_key, slug, url); within the sorted order every within-block
    pair is some (i, i+d), so looping d = 1..D (D ≤ allpairs_cap) with
    a vectorized same-block mask enumerates exactly:

    - ALL pairs of blocks with size ≤ ``allpairs_cap``;
    - slug-sorted-neighborhood window pairs (d < ``snm_window``) of
      larger blocks — linear in block size, the hot-domain/megablock
      skew guard.  ``block_n`` rides on every pair so capping is
      observable, never silent.
    """
    return emit_partition_pairs_generic(
        df,
        id_col="url",
        order_col="slug",
        payload_cols=["slug"] if slim else ["slug", "shingles", "shingles2", "mh8"],
        cap=cfg.allpairs_cap,
        window=cfg.snm_window,
    )


def pair_gen_stage(exploded, cfg: ERConfig = DEFAULT_CONFIG, slim: bool = False):
    """Shuffle #1: hash block keys into ``cfg.pair_partitions``
    partitions (the groupby key — a handful of groups, so zero
    per-group Python overhead), emit bounded candidate pairs with the
    vectorized per-partition kernel above."""
    P = np.uint64(cfg.pair_partitions)

    def _part(batch: pa.Table) -> pa.Table:
        part = (batch["block_key"].to_numpy(zero_copy_only=False) % P).astype(
            np.int32
        )
        return batch.append_column("part", pa.array(part, pa.int32()))

    return (
        exploded.map_batches(_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: _emit_partition_pairs(g, cfg, slim), batch_format="pandas"
        )
    )


def dedupe_pairs_stage(pairs, cfg: ERConfig = DEFAULT_CONFIG):
    """Exactly-once candidate pairs (one ``groupby`` shuffle).  NOT in
    the default pipeline — see module docstring: duplicates are cheaper
    to score than to shuffle away, and all consumers are idempotent."""
    return pairs.groupby(["url_a", "url_b"]).map_groups(
        lambda g: g.iloc[:1], batch_format="pandas"
    )
