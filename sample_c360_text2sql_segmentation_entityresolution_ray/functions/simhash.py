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


def simhash_block_keys(
    hashes: np.ndarray, blocks: int = 6, clean: int = 3
) -> np.ndarray:
    """Manku/Jain/Sarma (WWW'07 §3) block-combination keys — the
    WEB-SCALE simhash table scheme.  The 64-bit fingerprint splits
    into ``blocks`` nearly-equal bit blocks; each of the
    C(blocks, clean) combinations of ``clean`` blocks concatenates
    into one key of ~64·clean/blocks bits.

    Pigeonhole: a pair within Hamming distance ``blocks - clean``
    flips bits in at most that many blocks, so SOME ``clean``-subset
    of blocks is identical on both sides ⇒ they share that
    combination's key.  Versus :func:`simhash_band_keys` (whose
    64/bands-bit keys cap the bucket space — 4 bands ⇒ 65,536 buckets
    ⇒ n/65k-doc buckets at corpus scale), these keys carry ~32 bits
    at the (6, 3) default: bucket space 2³², so mean bucket size
    stays O(n/4·10⁹) — recall holds at 10¹² docs instead of degrading
    into the capped-sweep fallback.

    Returns (n, C(blocks, clean)) uint64; key values from different
    combinations never collide (combination index in the top bits)."""
    from itertools import combinations

    if not 0 < clean < blocks <= 64:
        raise ValueError(f"need 0 < clean < blocks ≤ 64, got "
                         f"({blocks}, {clean})")
    h = hashes.astype(np.uint64)
    n = len(h)
    # block b covers bits [starts[b], starts[b+1]) — nearly equal widths
    bounds = np.linspace(0, 64, blocks + 1).astype(np.uint64)
    widths = np.diff(bounds).astype(np.uint64)
    block_vals = [
        (h >> bounds[b]) & np.uint64((1 << int(widths[b])) - 1)
        for b in range(blocks)
    ]
    combos = list(combinations(range(blocks), clean))
    max_width = int(np.sort(widths)[-clean:].sum())
    if max_width > 58:
        raise ValueError(
            f"combination keys need {max_width} bits > the 58 below the "
            f"combination tag — use more blocks or fewer clean blocks"
        )
    out = np.empty((n, len(combos)), dtype=np.uint64)
    for ci, combo in enumerate(combos):
        key = np.zeros(n, np.uint64)
        shift = np.uint64(0)
        for b in combo:
            key |= block_vals[b] << shift
            shift += widths[b]
        # tag with the combination index so distinct combinations
        # occupy disjoint key ranges (shift ≤ 32+… keeps 6 tag bits)
        out[:, ci] = key | (np.uint64(ci) << np.uint64(58))
    return out
