"""String similarity metrics for the pairwise scorer.

Re-implements the fuzzy-matching primitives the reference delegates to
AWS Entity Resolution ``ML_MATCHING`` (`lib/entity-resolution-service.ts:179-181`):
Jaro-Winkler and bounded Levenshtein, plus slug normalization.  These
run per candidate pair inside the scorer actor pool; inputs are short
normalized slugs (<= 64 chars) so the O(len^2) DP stays cheap.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

_WS_RE = re.compile(r"\s+")
_NONWORD_RE = re.compile(r"[^\w\s]+", re.UNICODE)


def slug_of(text: str, max_len: int = 64) -> str:
    """Normalized prefix slug: lowercase, punctuation stripped,
    whitespace collapsed, truncated.  The ER 'name field' analog."""
    s = _NONWORD_RE.sub(" ", text.lower())
    s = _WS_RE.sub(" ", s).strip()
    return s[:max_len]


def jaro(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    match_dist = max(len1, len2) // 2 - 1
    s1_matches = [False] * len1
    s2_matches = [False] * len2
    matches = 0
    for i, c1 in enumerate(s1):
        start = max(0, i - match_dist)
        end = min(i + match_dist + 1, len2)
        for j in range(start, end):
            if s2_matches[j] or s2[j] != c1:
                continue
            s1_matches[i] = True
            s2_matches[j] = True
            matches += 1
            break
    if matches == 0:
        return 0.0
    k = 0
    transpositions = 0
    for i in range(len1):
        if not s1_matches[i]:
            continue
        while not s2_matches[k]:
            k += 1
        if s1[i] != s2[k]:
            transpositions += 1
        k += 1
    transpositions //= 2
    return (
        matches / len1 + matches / len2 + (matches - transpositions) / matches
    ) / 3.0


def jaro_winkler(s1: str, s2: str, prefix_weight: float = 0.1) -> float:
    j = jaro(s1, s2)
    prefix = 0
    for c1, c2 in zip(s1[:4], s2[:4]):
        if c1 != c2:
            break
        prefix += 1
    return j + prefix * prefix_weight * (1.0 - j)


def levenshtein(s1: str, s2: str, max_len: int = 64) -> int:
    """Levenshtein distance with inputs truncated to ``max_len``
    (vectorized DP: one numpy row per character of s1)."""
    s1, s2 = s1[:max_len], s2[:max_len]
    if s1 == s2:
        return 0
    if not s1:
        return len(s2)
    if not s2:
        return len(s1)
    b = np.frombuffer(s2.encode("utf-32-le"), dtype=np.uint32)
    prev = np.arange(len(b) + 1, dtype=np.int64)
    for i, ch in enumerate(s1):
        cur = np.empty_like(prev)
        cur[0] = i + 1
        cost = (b != ord(ch)).astype(np.int64)
        np.minimum(prev[1:] + 1, prev[:-1] + cost, out=cur[1:])
        # carry insertions left-to-right
        cur[1:] = np.minimum.accumulate(
            cur[1:] - np.arange(1, len(b) + 1)
        ) + np.arange(1, len(b) + 1)
        prev = cur
    return int(prev[-1])


def levenshtein_sim(s1: str, s2: str) -> float:
    m = max(len(s1), len(s2))
    if m == 0:
        return 1.0
    return 1.0 - levenshtein(s1, s2) / m


def _encode_padded(strs, max_len: int) -> tuple[np.ndarray, np.ndarray]:
    """(n, L) uint32 code-point matrix (0-padded) + length vector."""
    lens = np.fromiter((min(len(s), max_len) for s in strs), np.int64, len(strs))
    L = max(1, int(lens.max()) if len(lens) else 1)
    out = np.zeros((len(strs), L), dtype=np.uint32)
    for i, s in enumerate(strs):
        s = s[:max_len]
        if s:
            out[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    return out, lens


def levenshtein_batch(a_list, b_list, max_len: int = 64) -> np.ndarray:
    """Batched Levenshtein DISTANCE (int64): one DP over the whole
    batch — each of the O(max_len) row steps is a numpy kernel across
    all pairs, so per-pair cost is ~1000× below the scalar loop.
    Bit-exact vs scalar :func:`levenshtein` (and DuckDB
    ``levenshtein()``) for inputs within ``max_len``."""
    n = len(a_list)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    A, la = _encode_padded(a_list, max_len)
    B, lb = _encode_padded(b_list, max_len)
    La, Lb = A.shape[1], B.shape[1]
    ar = np.arange(Lb + 1, dtype=np.int64)
    prev = np.broadcast_to(ar, (n, Lb + 1)).copy()
    dist = lb.astype(np.int64).copy()  # rows with la == 0
    for i in range(1, La + 1):
        cost = (B != A[:, i - 1][:, None]).astype(np.int64)  # (n, Lb)
        t = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost)
        u = np.concatenate([np.full((n, 1), i, dtype=np.int64), t], axis=1) - ar
        cur = np.minimum.accumulate(u, axis=1) + ar
        done = la == i
        if done.any():
            dist[done] = cur[done, lb[done]]
        prev = cur
    return dist


def levenshtein_sim_batch(a_list, b_list, max_len: int = 64) -> np.ndarray:
    """Batched normalized Levenshtein similarity — exact same values as
    :func:`levenshtein_sim` (truncated to ``max_len``)."""
    if len(a_list) == 0:
        return np.empty(0, dtype=np.float64)
    dist = levenshtein_batch(a_list, b_list, max_len).astype(np.float64)
    la = np.fromiter((min(len(s), max_len) for s in a_list), np.int64, len(a_list))
    lb = np.fromiter((min(len(s), max_len) for s in b_list), np.int64, len(b_list))
    m = np.maximum(1, np.maximum(la, lb)).astype(np.float64)
    return 1.0 - dist / m


def jaro_winkler_batch(a_list, b_list) -> np.ndarray:
    """Batched Jaro-Winkler (scalar loop — JW is ~10× cheaper than the
    scalar Levenshtein and called only on the gated subset)."""
    return np.fromiter(
        (jaro_winkler(a, b) for a, b in zip(a_list, b_list)),
        np.float64,
        len(a_list),
    )


# ---------------------------------------------------------------------------
# American Soundex (Knuth TAOCP vol. 3; the classic phonetic blocking
# key for record linkage)
# ---------------------------------------------------------------------------

_SOUNDEX_MAP = str.maketrans(
    "BFPVCGJKQSXZDTLMNRAEIOUY",
    "111122222222334556000000",
)
_SOUNDEX_RUN_RE = re.compile(r"([0-9])\1+")
_NONALPHA_RE = re.compile(r"[^A-Za-z]")


def soundex_batch(words) -> np.ndarray:
    """Vectorized American Soundex: ``'Robert' -> 'R163'``.

    Rule order (the standard algorithm): strip non-letters, uppercase,
    save the first letter, delete H/W from the tail (same-code letters
    separated only by h/w collapse), map consonant classes to digits
    with vowels as ``'0'`` separators, collapse adjacent equal digits,
    drop a leading digit equal to the first letter's code, delete the
    vowel zeros, pad/truncate to letter + 3 digits.  Empty/no-letter
    input encodes to ``''``.

    Implemented as pandas C-level string kernels (translate + regex),
    no Python loop over rows.
    """
    s = (
        pd.Series(np.asarray(words, dtype=object), dtype=object)
        .fillna("")
        .str.replace(_NONALPHA_RE, "", regex=True)
        .str.upper()
    )
    f = s.str[:1]
    digits = (
        s.str[1:]
        .str.replace("H", "", regex=False)
        .str.replace("W", "", regex=False)
        .str.translate(_SOUNDEX_MAP)
    )
    collapsed = digits.str.replace(_SOUNDEX_RUN_RE, r"\1", regex=True)
    fcode = f.str.translate(_SOUNDEX_MAP)
    drop = (collapsed.str[:1] == fcode) & (fcode.str.len() > 0)
    body = collapsed.where(~drop, collapsed.str[1:]).str.replace(
        "0", "", regex=False
    )
    out = (f + body + "000").str[:4]
    return out.where(s.str.len() > 0, "").to_numpy(object)
