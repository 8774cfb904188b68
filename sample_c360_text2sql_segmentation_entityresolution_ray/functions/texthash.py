"""Deterministic text hashing / tokenization / shingling kernels.

Process-deterministic by construction: ``pandas.util.hash_array`` uses a
fixed SipHash key, so the same string hashes to the same uint64 on every
worker on every node — a hard requirement for blocking keys and content
hashes that flow through shuffles (reference analog: md5 header hashing,
``csvtool/csv_to_glue_catalog.py:272-276``).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# Word tokenizer: unicode word characters.  Compiled once per process.
TOKEN_RE = re.compile(r"\w+", re.UNICODE)

# BPE-ish sub-word tokenizer used by token-counting ops: words, numbers,
# common contractions, and single non-space symbols (GPT-2-style shape).
BPE_ISH_RE = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)|\w+|[^\w\s]", re.UNICODE
)


def hash_str_array(values) -> np.ndarray:
    """uint64 SipHash of each string in ``values`` (vectorized, deterministic)."""
    arr = np.asarray(values, dtype=object)
    return pd.util.hash_array(arr, categorize=False)


def tokens_of(text: str) -> list[str]:
    return TOKEN_RE.findall(text.lower())


def shingle_hashes(
    text: str, k: int = 3, cap: int = 256
) -> np.ndarray:
    """Sorted unique uint64 hashes of the ``k``-word shingles of ``text``.

    ``cap`` bounds the per-record payload carried through the blocking
    shuffle (smallest ``cap`` hashes kept — equivalent to a bottom-k
    sketch, so Jaccard estimates on capped sets stay unbiased).
    """
    toks = tokens_of(text)
    if len(toks) < k:
        shingles = [" ".join(toks)] if toks else [""]
    else:
        shingles = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    h = np.unique(hash_str_array(shingles))
    if len(h) > cap:
        h = h[:cap]  # bottom-k of a uniform hash == uniform sample
    return h


def token_hashes(text: str, cap: int = 256) -> np.ndarray:
    """uint64 hashes of tokens, *with* repeats (for TF cosine), capped."""
    toks = tokens_of(text)
    if not toks:
        return np.empty(0, dtype=np.uint64)
    h = hash_str_array(toks)
    if len(h) > cap:
        h = h[:cap]
    return h


def rolling_fingerprint(text: str, window: int = 8, base: int = 257) -> np.uint64:
    """Deterministic document fingerprint: XOR of a rolling polynomial
    hash over byte windows (Rabin-Karp-style).  Vector-friendly via numpy.
    """
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(data) == 0:
        return np.uint64(0)
    if len(data) < window:
        pad = np.zeros(window - len(data), dtype=np.uint8)
        data = np.concatenate([data, pad])
    with np.errstate(over="ignore"):
        powers = np.power(
            np.uint64(base), np.arange(window, dtype=np.uint64), dtype=np.uint64
        )
        # windows matrix: shape (n_windows, window)
        n = len(data) - window + 1
        idx = np.arange(window)[None, :] + np.arange(n)[:, None]
        vals = (data[idx].astype(np.uint64) * powers[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        out = np.bitwise_xor.reduce(vals)
    return np.uint64(out)


def rolling_fingerprint_batch(texts) -> np.ndarray:
    return np.array([rolling_fingerprint(t) for t in texts], dtype=np.uint64)
