"""FeatureStore: arrow fast-path build must equal the per-record build,
and lookups must return each record's own feature arrays."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from sample_c360_text2sql_segmentation_entityresolution_ray.functions.feature_store import (
    FeatureStore,
)


def _fixture(n=50, seed=3):
    rng = np.random.default_rng(seed)
    urls = [f"https://x{i:04d}.example.com/a/{i}" for i in range(n)]
    sh = [np.unique(rng.integers(0, 2**32, rng.integers(0, 30), dtype=np.uint32))
          for _ in range(n)]
    sh2 = [np.unique(rng.integers(0, 2**32, rng.integers(0, 10), dtype=np.uint32))
           for _ in range(n)]
    mh8 = [rng.integers(0, 256, 64).astype(np.uint8) for _ in range(n)]
    return urls, sh, sh2, mh8


def _arrow_batches(urls, sh, sh2, mh8, split=3):
    tables = []
    k = len(urls) // split + 1
    for i in range(0, len(urls), k):
        tables.append(pa.table({
            "url": pa.array(urls[i:i+k]),
            "shingles": pa.array([list(s) for s in sh[i:i+k]], pa.list_(pa.uint32())),
            "shingles2": pa.array([list(s) for s in sh2[i:i+k]], pa.list_(pa.uint32())),
            "mh8": pa.array([list(s) for s in mh8[i:i+k]], pa.list_(pa.uint8())),
        }))
    return tables


def test_from_arrow_matches_build_and_lookup():
    urls, sh, sh2, mh8 = _fixture()
    a = FeatureStore.from_arrow(_arrow_batches(urls, sh, sh2, mh8))
    b = FeatureStore.build(urls, sh, sh2, mh8)
    np.testing.assert_array_equal(a.key_hashes, b.key_hashes)
    np.testing.assert_array_equal(a.sh_off, b.sh_off)
    np.testing.assert_array_equal(a.sh_val, b.sh_val)
    np.testing.assert_array_equal(a.sh2_val, b.sh2_val)
    np.testing.assert_array_equal(a.mh8, b.mh8)
    # lookups return each record's own arrays
    idx = a.rows(np.asarray(urls, dtype=object))
    for i, u in enumerate(urls):
        np.testing.assert_array_equal(a.shingles(idx[i]), sh[i])
        np.testing.assert_array_equal(a.shingles2(idx[i]), sh2[i])
        np.testing.assert_array_equal(a.mh8[idx[i]], mh8[i])


def test_empty_store():
    s = FeatureStore.from_arrow([])
    assert len(s.key_hashes) == 0


def test_id_stores_raise_on_absent_ids():
    """Presence contract: a clamped searchsorted miss must raise, not
    silently resolve to a neighbor's sketch/fingerprint."""
    from sample_c360_text2sql_segmentation_entityresolution_ray.functions.feature_store import (
        IdListStore,
        IdScalarStore,
    )
    import pytest

    tbl = pa.table({
        "doc_id": pa.array([10, 20, 30], pa.int64()),
        "shingles": pa.array([[1, 2], [3], [4, 5, 6]], pa.list_(pa.uint64())),
    })
    ls = IdListStore.from_arrow([tbl], "doc_id", "shingles")
    rows = ls.rows(np.array([30, 10], np.int64))
    assert list(ls.get(rows[0])) == [4, 5, 6]
    with pytest.raises(KeyError, match="absent"):
        ls.rows(np.array([10, 25], np.int64))
    with pytest.raises(KeyError):
        ls.rows(np.array([99], np.int64))

    sv = pa.table({
        "doc_id": pa.array([10, 20], pa.int64()),
        "simhash": pa.array([111, 222], pa.uint64()),
    })
    ss = IdScalarStore.from_arrow([sv], "doc_id", "simhash")
    assert ss.lookup(np.array([20, 10], np.int64)).tolist() == [222, 111]
    with pytest.raises(KeyError, match="absent"):
        ss.lookup(np.array([21], np.int64))
    # empty store + non-empty query also raises (not an index error)
    empty = IdScalarStore.from_arrow([], "doc_id", "simhash")
    with pytest.raises(KeyError):
        empty.lookup(np.array([1], np.int64))


def test_feature_store_rows_raises_on_absent_url():
    import pytest

    urls, sh, sh2, mh8 = _fixture(n=10)
    st = FeatureStore.from_arrow(_arrow_batches(urls, sh, sh2, mh8))
    st.rows(np.array(urls[:3], dtype=object))  # present: fine
    with pytest.raises(KeyError, match="absent"):
        st.rows(np.array(["https://nope.example.com/"], dtype=object))
