"""Unit tests for the deterministic kernels."""

from __future__ import annotations

import numpy as np

from sample_c360_text2sql_segmentation_entityresolution_ray.functions.minhash import (
    band_keys,
    jaccard_from_signatures,
    minhash_signature,
    minhash_signatures_concat,
)
from sample_c360_text2sql_segmentation_entityresolution_ray.functions.simhash import (
    hamming64,
    simhash,
    simhash_band_keys,
)
from sample_c360_text2sql_segmentation_entityresolution_ray.functions.strings import (
    jaro_winkler,
    jaro_winkler_batch,
    levenshtein_sim,
    levenshtein_sim_batch,
)
from sample_c360_text2sql_segmentation_entityresolution_ray.functions.texthash import (
    hash_str_array,
    rolling_fingerprint,
    shingle_hashes,
    tokens_of,
)


def test_hash_deterministic():
    a = hash_str_array(["x", "y", "x"])
    assert a[0] == a[2] and a[0] != a[1]
    assert a.dtype == np.uint64


def test_minhash_estimates_jaccard():
    rng = np.random.default_rng(0)
    base = rng.integers(0, 2**61, 400).astype(np.uint64)
    # ~2/3 overlap
    a = np.unique(base[:300])
    b = np.unique(base[100:])
    true_j = len(np.intersect1d(a, b)) / len(np.union1d(a, b))
    est = jaccard_from_signatures(minhash_signature(a), minhash_signature(b))
    assert abs(est - true_j) < 0.15


def test_minhash_concat_matches_single():
    rng = np.random.default_rng(1)
    sets = [np.unique(rng.integers(0, 2**61, n).astype(np.uint64)) for n in (5, 50, 0, 200)]
    concat = np.concatenate(sets)
    offs = np.cumsum([0] + [len(s) for s in sets])
    batch = minhash_signatures_concat(concat, offs)
    for i, s in enumerate(sets):
        np.testing.assert_array_equal(batch[i], minhash_signature(s))


def test_band_keys_identical_sets_collide():
    s = np.unique(np.random.default_rng(2).integers(0, 2**61, 100).astype(np.uint64))
    sig = minhash_signature(s)
    k = band_keys(np.stack([sig, sig]))
    np.testing.assert_array_equal(k[0], k[1])


def test_simhash_near_vs_far():
    t1 = hash_str_array([f"tok{i}" for i in range(100)])
    t2 = hash_str_array([f"tok{i}" for i in range(3, 103)])  # 97% overlap
    t3 = hash_str_array([f"other{i}" for i in range(100)])
    h1, h2, h3 = simhash(t1), simhash(t2), simhash(t3)
    d_near = hamming64(np.array([h1]), np.array([h2]))[0]
    d_far = hamming64(np.array([h1]), np.array([h3]))[0]
    assert d_near < d_far
    assert d_far > 10


def test_simhash_band_pigeonhole():
    h = np.uint64(0xDEADBEEFCAFEF00D)
    h2 = h ^ np.uint64(0b101)  # hamming 3, bands=4 → must share a band
    k1, k2 = simhash_band_keys(np.array([h, h2]), bands=4)
    assert (k1 == k2).sum() >= 1


def test_string_metrics():
    assert jaro_winkler("martha", "martha") == 1.0
    assert 0.9 < jaro_winkler("martha", "marhta") < 1.0
    assert jaro_winkler("abc", "xyz") < 0.1
    assert levenshtein_sim("kitten", "kitten") == 1.0
    assert abs(levenshtein_sim("kitten", "sitting") - (1 - 3 / 7)) < 1e-9
    assert levenshtein_sim("", "") == 1.0


def test_levenshtein_batch_matches_scalar():
    rng = np.random.default_rng(7)
    alphabet = "abcdef 日本語"
    pairs = []
    for _ in range(200):
        la, lb = rng.integers(0, 20, 2)
        a = "".join(rng.choice(list(alphabet), la))
        b = "".join(rng.choice(list(alphabet), lb))
        pairs.append((a, b))
    pairs += [("", ""), ("", "abc"), ("same", "same"), ("kitten", "sitting")]
    a_list = [p[0] for p in pairs]
    b_list = [p[1] for p in pairs]
    batch = levenshtein_sim_batch(a_list, b_list)
    scalar = np.array([levenshtein_sim(a, b) for a, b in pairs])
    np.testing.assert_allclose(batch, scalar, atol=1e-12)
    jwb = jaro_winkler_batch(a_list, b_list)
    jws = np.array([jaro_winkler(a, b) for a, b in pairs])
    np.testing.assert_allclose(jwb, jws, atol=1e-12)


def test_rolling_fingerprint_content_defined():
    assert rolling_fingerprint("hello world") == rolling_fingerprint("hello world")
    assert rolling_fingerprint("hello world") != rolling_fingerprint("hello w0rld")
    assert rolling_fingerprint("") == np.uint64(0)


def test_tokens_and_shingles():
    assert tokens_of("Hello, World! 42") == ["hello", "world", "42"]
    h = shingle_hashes("a b c d", k=3)
    assert len(h) == 2  # "a b c", "b c d"
    assert len(shingle_hashes("", k=3)) == 1  # empty-string shingle


def test_soundex_canonical_vectors():
    """The classic published soundex examples (Knuth / NARA spec),
    including the h/w rule (Ashcraft), the vowel-separation rule
    (Tymczak), and the leading same-code drop (Pfister)."""
    from sample_c360_text2sql_segmentation_entityresolution_ray.functions.strings import (
        soundex_batch,
    )

    cases = {
        "Robert": "R163", "Rupert": "R163",
        "Ashcraft": "A261", "Ashcroft": "A261",
        "Tymczak": "T522", "Pfister": "P236",
        "Honeyman": "H555", "Jackson": "J250",
        "Washington": "W252", "Lee": "L000",
        "Gutierrez": "G362", "a": "A000", "": "", "123": "",
        "o'Brien": "O165",
    }
    out = soundex_batch(list(cases))
    assert list(out) == list(cases.values())
