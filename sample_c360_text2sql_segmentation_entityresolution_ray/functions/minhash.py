"""Vectorized MinHash signatures + LSH banding.

The approximate structure mandated by the north rule (the reference's
AWS-Entity-Resolution ``ML_MATCHING`` black box,
``lib/entity-resolution-service.ts:179-181``, re-expressed as
MinHash-LSH blocking).  All arithmetic is uint64 universal hashing with
constants drawn from a fixed-seed generator, so signatures are identical
on every worker.
"""

from __future__ import annotations

import numpy as np

# Mersenne prime 2^61 - 1 keeps (a*x + b) % p in uint64 without overflow
# tricks beyond letting numpy wrap (we mask to 61 bits first).
_P = np.uint64((1 << 61) - 1)
_MASK = np.uint64((1 << 61) - 1)

DEFAULT_NUM_PERM = 64
DEFAULT_BANDS = 16  # 16 bands x 4 rows: P(candidate | J=0.8) ~ 0.9998


def _perm_constants(num_perm: int, seed: int = 1_000_003):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _P, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _P, size=num_perm, dtype=np.uint64)
    return a, b


_A, _B = _perm_constants(DEFAULT_NUM_PERM)


def minhash_signature(shingles: np.ndarray, num_perm: int = DEFAULT_NUM_PERM) -> np.ndarray:
    """MinHash signature (uint64[num_perm]) of a set of shingle hashes."""
    if num_perm == DEFAULT_NUM_PERM:
        a, b = _A, _B
    else:
        a, b = _perm_constants(num_perm)
    if len(shingles) == 0:
        return np.full(num_perm, _P, dtype=np.uint64)
    x = (shingles.astype(np.uint64) & _MASK)[:, None]  # (n, 1)
    with np.errstate(over="ignore"):
        hashed = (x * a[None, :] + b[None, :]) % _P  # (n, num_perm)
    return hashed.min(axis=0)


def minhash_signatures_concat(
    all_shingles: np.ndarray, offsets: np.ndarray, num_perm: int = DEFAULT_NUM_PERM
) -> np.ndarray:
    """Batched signatures: ``all_shingles`` is the concatenation of every
    record's shingle hashes; ``offsets[i]`` is the start of record ``i``
    (len(offsets) == n_records + 1).  Returns (n_records, num_perm).

    Uses ``np.minimum.reduceat`` so the whole batch is two numpy kernels —
    no Python loop over records in the hot path.
    """
    a, b = (_A, _B) if num_perm == DEFAULT_NUM_PERM else _perm_constants(num_perm)
    n_rec = len(offsets) - 1
    out = np.full((n_rec, num_perm), _P, dtype=np.uint64)
    if len(all_shingles) == 0:
        return out
    x = (all_shingles.astype(np.uint64) & _MASK)[:, None]
    with np.errstate(over="ignore"):
        hashed = (x * a[None, :] + b[None, :]) % _P
    nonempty = offsets[:-1] < offsets[1:]
    if nonempty.any():
        red = np.minimum.reduceat(hashed, offsets[:-1][nonempty], axis=0)
        out[nonempty] = red
    return out


def band_keys(
    signatures: np.ndarray, bands: int = DEFAULT_BANDS
) -> np.ndarray:
    """LSH band keys: (n_records, bands) uint64.  Each key is a SipHash of
    the band's rows plus the band index, so keys from different bands
    never collide by construction of the string prefix.
    """
    n, num_perm = signatures.shape
    rows = num_perm // bands
    keys = np.empty((n, bands), dtype=np.uint64)
    fnv = np.uint64(1099511628211)
    salts = np.random.default_rng(7_654_321).integers(
        0, np.iinfo(np.uint64).max, size=bands, dtype=np.uint64
    )
    with np.errstate(over="ignore"):
        for b in range(bands):
            seg = signatures[:, b * rows : (b + 1) * rows]
            k = np.full(n, salts[b], dtype=np.uint64)
            for r in range(rows):  # rows is tiny (4); inner ops vectorized over n
                k = (k * fnv) ^ seg[:, r]
            # final avalanche mix (splitmix64-style)
            k = (k ^ (k >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            k = (k ^ (k >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            keys[:, b] = k ^ (k >> np.uint64(31))
    return keys


def jaccard_from_signatures(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """Unbiased Jaccard estimate: fraction of equal signature components."""
    return float(np.mean(sig_a == sig_b))
