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
