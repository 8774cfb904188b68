"""64-bit SimHash over token hashes (near-dup fingerprint).

Charikar's scheme: each token hash votes its bits weighted +1/-1; the
sign vector is packed into a uint64.  Near-duplicates differ in a few
bits (small Hamming distance).  Fully vectorized per batch.
"""

from __future__ import annotations

import numpy as np

_BITS = np.uint64(1) << np.arange(64, dtype=np.uint64)


def simhash(token_hashes: np.ndarray) -> np.uint64:
    if len(token_hashes) == 0:
        return np.uint64(0)
    bits = (token_hashes[:, None] & _BITS[None, :]) != 0  # (n, 64) bool
    votes = bits.sum(axis=0) * 2 - len(token_hashes)  # +1/-1 vote sums
    return np.uint64(((votes > 0) * _BITS).sum(dtype=np.uint64))


def simhash_batch(list_of_token_hashes) -> np.ndarray:
    return np.array([simhash(np.asarray(h, dtype=np.uint64)) for h in list_of_token_hashes],
                    dtype=np.uint64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 arrays."""
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    # popcount via unpackbits on the byte view
    bytes_view = x.view(np.uint8).reshape(len(x), 8)
    return np.unpackbits(bytes_view, axis=1).sum(axis=1)


def simhash_band_keys(hashes: np.ndarray, bands: int = 4) -> np.ndarray:
    """(n, bands) uint16 band keys: a pair within Hamming distance
    ``bands - 1`` shares at least one band key (pigeonhole)."""
    n = len(hashes)
    width = 64 // bands
    mask = np.uint64((1 << width) - 1)
    out = np.empty((n, bands), dtype=np.uint64)
    h = hashes.astype(np.uint64)
    for b in range(bands):
        out[:, b] = (h >> np.uint64(b * width)) & mask
    return out
