"""Corpus IDF table for the short-doc bigram match path.

Shared boilerplate ("cookie notice accept privacy terms" framing) gives
DIFFERENT short documents bigram-Jaccard up to ~0.3 — right where true
short near-dup pairs live — so the short-doc gate weighs each bigram by
inverse document frequency: a gram carried by ≥ ``min_df_frac`` of
sampled docs gets idf = ln(n/df) ≈ 0, a corpus-rare gram gets the
maximum weight.  This is the classic TF-IDF defense (Salton-style),
applied to the gate that needs it.

Scale posture: DF is estimated from a ``hash_sample`` of the corpus
(content-defined, deterministic) and the table keeps ONLY frequent
grams (df ≥ min_df_frac·n) — boilerplate by definition — so the
broadcast table is O(boilerplate vocabulary), not O(corpus vocabulary),
at any corpus size.  Unseen grams take the default (maximum) idf.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data


class IdfTable:
    """Sorted-key lookup: uint32 gram hash → idf weight (vectorized via
    searchsorted; unseen grams get ``default``)."""

    def __init__(self, keys: np.ndarray, idfs: np.ndarray, default: float):
        self.keys = keys  # sorted uint32
        self.idfs = idfs.astype(np.float64)
        self.default = float(default)

    def weights(self, grams: np.ndarray) -> np.ndarray:
        if len(self.keys) == 0:
            return np.full(len(grams), self.default)
        pos = np.searchsorted(self.keys, grams)
        pos = np.minimum(pos, len(self.keys) - 1)
        hit = self.keys[pos] == grams
        out = np.full(len(grams), self.default)
        out[hit] = self.idfs[pos[hit]]
        return out


def build_bigram_idf(
    records: "ray.data.Dataset",
    grams_col: str = "shingles2",
    min_df_frac: float = 0.01,
) -> IdfTable:
    """DF-count the gram column of (already sampled) match records and
    keep the frequent tail as an idf table.

    Per-batch partial DF (np.unique per row set, one bincount-style
    reduce per batch) → driver combine of the small partials.  Records
    with an empty gram set (long docs) contribute nothing."""

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        sets = [np.asarray(s, np.uint32) for s in df[grams_col].to_numpy()]
        n_docs = sum(1 for s in sets if len(s))
        if n_docs == 0:
            return pd.DataFrame(
                {"gram": pd.Series(dtype=np.uint32),
                 "df": pd.Series(dtype=np.int64),
                 "n_docs": pd.Series(dtype=np.int64)}
            )
        concat = np.concatenate([s for s in sets if len(s)])
        grams, counts = np.unique(concat, return_counts=True)  # sets are unique
        out = pd.DataFrame({"gram": grams, "df": counts.astype(np.int64)})
        out["n_docs"] = np.int64(0)
        out.loc[out.index[:1], "n_docs"] = np.int64(n_docs)
        return out

    parts = []
    n_total = 0
    for b in records.select_columns([grams_col]).map_batches(
        _partial, batch_format="pandas"
    ).iter_batches(batch_size=65536, batch_format="pandas"):
        n_total += int(b["n_docs"].sum())
        parts.append(b[["gram", "df"]])
    if not parts or n_total == 0:
        return IdfTable(np.empty(0, np.uint32), np.empty(0), default=1.0)
    df = pd.concat(parts, ignore_index=True).groupby("gram")["df"].sum()
    min_df = max(2, int(np.ceil(min_df_frac * n_total)))
    keep = df[df >= min_df]
    keys = keep.index.to_numpy().astype(np.uint32)
    order = np.argsort(keys)
    idfs = np.log(n_total / keep.to_numpy().astype(np.float64))[order]
    return IdfTable(np.sort(keys), idfs, default=float(np.log(n_total)))


def bigram_idf_ref(
    records: "ray.data.Dataset", min_df_frac: float = 0.01
):
    """Build the table and ``ray.put`` it once (broadcast handle)."""
    return ray.put(build_bigram_idf(records, min_df_frac=min_df_frac))


__all__ = ["IdfTable", "build_bigram_idf", "bigram_idf_ref"]
