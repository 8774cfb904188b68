"""URL canonicalization rules and latest-wins dedup."""

from __future__ import annotations

import pandas as pd

import ray.data

from sample_c360_text2sql_segmentation_entityresolution_ray.ops import urls


def test_canonicalize_rules():
    f = urls.canonicalize_url
    assert f("HTTPS://WWW.Example.COM/Path/X") == "https://www.example.com/Path/X"
    assert f("https://a.com:443/x") == "https://a.com/x"
    assert f("http://a.com:80/x") == "http://a.com/x"
    assert f("http://a.com:8080/x") == "http://a.com:8080/x"  # non-default kept
    assert f("https://a.com/x#frag") == "https://a.com/x"
    assert f("https://a.com/x?utm_source=f&utm_campaign=c") == "https://a.com/x"
    assert (
        f("https://a.com/x?id=7&utm_source=f&fbclid=z&q=a+b")
        == "https://a.com/x?id=7&q=a+b"
    )
    assert f("https://a.com/x?&&") == "https://a.com/x"  # empty params dropped
    assert f("ftp://a.com/x") == "ftp://a.com/x"  # non-http passthrough
    assert f("not a url") == "not a url"


def test_canonicalize_batch_matches_scalar():
    import numpy as np

    raw = np.asarray(
        [
            "https://clean.example.com/a/b",  # vectorized fast path
            "HTTPS://DIRTY.example.com/a?utm_source=x#f",
            "https://a.com:443/x?id=1",
        ],
        dtype=object,
    )
    out = urls.canonicalize_batch(raw)
    assert list(out) == [urls.canonicalize_url(u) for u in raw]


def test_url_dedup_latest_wins():
    rows = [
        {"url": "https://A.com/x", "warc_ts": 10},
        {"url": "https://a.com/x?utm_source=f", "warc_ts": 30},
        {"url": "https://a.com/x#top", "warc_ts": 20},
        {"url": "https://b.com/y", "warc_ts": 5},
    ]
    out = (
        urls.url_dedup(ray.data.from_items(rows))
        .to_pandas()
        .set_index("canon_url")
        .sort_index()
    )
    assert len(out) == 2
    assert out.loc["https://a.com/x", "n_variants"] == 3
    assert out.loc["https://a.com/x", "kept_url"] == "https://a.com/x?utm_source=f"
    assert out.loc["https://b.com/y", "kept_url"] == "https://b.com/y"


def test_blocklist_filter_dot_boundary_and_ref():
    import ray

    rows = [
        {"url": "https://bad.example.com/a"},        # exact block
        {"url": "http://sub.bad.example.com/b"},     # subdomain block
        {"url": "https://NOTbad.example.com/c"},     # NOT dot-boundary: kept
        {"url": "https://good.example.org/d"},       # kept
        {"url": "not a url at all"},                 # no host: kept, host ""
    ]
    blocked = ["bad.example.com"]
    out = (
        urls.blocklist_filter(ray.data.from_items(rows), blocked)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert list(out["url"]) == [
        "https://NOTbad.example.com/c",
        "https://good.example.org/d",
        "not a url at all",
    ]
    assert list(out["host"]) == ["notbad.example.com", "good.example.org", ""]

    # broadcast-ref path (the 100-TB posture) gives identical output
    ref = ray.put(frozenset(blocked))
    out2 = (
        urls.blocklist_filter(ray.data.from_items(rows), ref)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)


def test_url_dedup_driver_path_equals_partitioned():
    import ray

    rows = [
        {"url": f"https://a.com/x?utm_source={i}", "warc_ts": i}
        for i in range(20)
    ] + [{"url": "https://b.com/y", "warc_ts": 5}]
    ds = ray.data.from_items(rows)
    fast = urls.url_dedup(ds).to_pandas().sort_values("canon_url").reset_index(drop=True)
    slow = (
        urls.url_dedup(ds, driver_max_rows=0)  # force the partitioned path
        .to_pandas()
        .sort_values("canon_url")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fast, slow)
    assert fast.loc[fast["canon_url"] == "https://a.com/x", "n_variants"].iloc[0] == 20
