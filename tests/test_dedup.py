"""Dedup operator semantics on small planted corpora."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data

from sample_c360_text2sql_segmentation_entityresolution_ray.ops import dedup

BASE = (
    "the quick brown fox jumps over the lazy dog while the sun rises over "
    "the quiet valley and birds sing their morning songs across the fields"
)


def _corpus():
    rows = [
        {"doc_id": 0, "text": BASE},
        {"doc_id": 1, "text": BASE},  # exact dup of 0
        {"doc_id": 2, "text": BASE.replace("quick", "speedy")},  # near dup of 0
        {"doc_id": 3, "text": "completely different content about ray data "
                              "pipelines streaming arrow batches through actors"},
        {"doc_id": 4, "text": BASE + " extra trailing words appended here"},  # near dup
    ]
    return ray.data.from_items(rows)


def test_exact_dedup_keeps_min_id():
    out = dedup.exact_dedup(_corpus()).to_pandas()
    assert sorted(out["doc_id"]) == [0, 2, 3, 4]


def test_minhash_dup_pairs_finds_planted():
    pairs = dedup.minhash_dup_pairs(_corpus(), threshold=0.5).to_pandas()
    found = {tuple(sorted(p)) for p in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 1) in found
    assert (0, 2) in found
    assert (0, 4) in found
    assert all(3 not in p for p in found)


def test_minhash_dedup_drops_near_dups():
    kept = dedup.minhash_dedup(_corpus(), threshold=0.5).to_pandas()
    assert sorted(kept["doc_id"]) == [0, 3]


def test_dup_assignment_transitive():
    pairs = ray.data.from_pandas(
        pd.DataFrame({"id_a": [0, 1], "id_b": [1, 2], "sim": [1.0, 1.0]})
    )
    out = dedup.dup_assignment(pairs).to_pandas()
    assert dict(zip(out["doc_id"], out["rep_id"])) == {0: 0, 1: 0, 2: 0}


def test_simhash_dup_pairs():
    pairs = dedup.simhash_dup_pairs(_corpus(), max_hamming=10).to_pandas()
    found = {tuple(sorted(p)) for p in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 1) in found
    assert all(3 not in p for p in found)


def test_ngram_jaccard_verify():
    cand = ray.data.from_pandas(
        pd.DataFrame({"id_a": [0, 0], "id_b": [1, 3], "sim": [1.0, 1.0]})
    )
    out = dedup.ngram_jaccard_pairs(cand, _corpus(), threshold=0.5).to_pandas()
    assert list(out["id_b"]) == [1]
    assert out["ngram_jaccard"].iloc[0] == 1.0


def test_ngram_jaccard_join_path_matches_broadcast():
    """The large-corpus join path must produce exactly the broadcast
    path's output (forced via broadcast_doc_limit=0)."""
    cand = ray.data.from_pandas(
        pd.DataFrame({"id_a": [0, 0, 0, 2], "id_b": [1, 2, 3, 4], "sim": [1.0] * 4})
    )
    kw = dict(threshold=0.1)
    bc = dedup.ngram_jaccard_pairs(cand, _corpus(), **kw).to_pandas()
    jn = dedup.ngram_jaccard_pairs(
        cand, _corpus(), broadcast_doc_limit=0, **kw
    ).to_pandas()
    cols = ["id_a", "id_b", "ngram_jaccard"]
    pd.testing.assert_frame_equal(
        bc[cols].sort_values(cols).reset_index(drop=True),
        jn[cols].sort_values(cols).reset_index(drop=True),
    )


def test_embedding_dup_pairs():
    rng = np.random.default_rng(5)
    base = rng.standard_normal(32)
    rows = [
        {"vec_id": 0, "embedding": base.tolist()},
        {"vec_id": 1, "embedding": (base + 0.01 * rng.standard_normal(32)).tolist()},
        {"vec_id": 2, "embedding": rng.standard_normal(32).tolist()},
    ]
    pairs = dedup.embedding_dup_pairs(
        ray.data.from_items(rows), threshold=0.99
    ).to_pandas()
    found = {tuple(sorted(p)) for p in zip(pairs["id_a"], pairs["id_b"])}
    assert found == {(0, 1)}


def test_semantic_dedup_drops_within_cluster_only():
    # two tight clusters far apart; near-dup pairs exist inside each.
    # centroids placed ON the clusters so assignment is unambiguous.
    rng = np.random.default_rng(11)
    a = rng.standard_normal(16)
    b = -a  # opposite direction -> different cluster, cosine -1
    rows = []
    for i in range(4):  # ids 0..3 near a
        rows.append({"vec_id": i, "embedding": (a + 1e-4 * rng.standard_normal(16)).tolist()})
    for i in range(4, 8):  # ids 4..7 near b
        rows.append({"vec_id": i, "embedding": (b + 1e-4 * rng.standard_normal(16)).tolist()})
    cents = np.stack([a, b])
    kept = dedup.semantic_dedup(
        ray.data.from_items(rows), cents, threshold=0.99
    ).to_pandas()
    # each cluster collapses to exactly one survivor
    assert sorted(kept["cluster"].tolist()) == [0, 1]
    # survivors are the md5-min-ranked member of each cluster
    import hashlib

    def rk(i):
        return int(hashlib.md5(f"semd{i}".encode()).hexdigest()[:15], 16)

    assert set(kept["vec_id"]) == {
        min(range(4), key=rk),
        min(range(4, 8), key=rk),
    }


def _span_corpus():
    # doc 0/1 share the 6-token phrase; doc 2 is disjoint
    shared = "alpha beta gamma delta epsilon zeta"
    return ray.data.from_items(
        [
            {"doc_id": 0, "text": f"{shared} one two three"},
            {"doc_id": 1, "text": f"x y {shared} tail words"},
            {"doc_id": 2, "text": "totally unrelated stream of other tokens here"},
            {"doc_id": 3, "text": "tiny"},  # fewer tokens than width
        ]
    )


def test_span_dup_stats_planted():
    df = (
        dedup.span_dup_stats(_span_corpus(), width=5, min_count=2)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # a shared 6-token phrase has two duplicate 5-token windows
    assert df.loc[0, "dup_spans"] == 2 and df.loc[1, "dup_spans"] == 2
    # two overlapping width-5 windows cover 6 tokens
    assert df.loc[0, "covered_tokens"] == 6 and df.loc[1, "covered_tokens"] == 6
    assert df.loc[2, "dup_spans"] == 0 and df.loc[2, "covered_tokens"] == 0
    # short doc: no spans at all, still present with zeros
    assert df.loc[3, "n_spans"] == 0 and df.loc[3, "covered_tokens"] == 0
    assert df.loc[0, "n_spans"] == 9 - 5 + 1


def test_span_dup_stats_join_path_matches_broadcast():
    """Forcing broadcast_span_limit=0 must take the join+sweep path and
    reproduce the broadcast path bit-for-bit."""
    cols = ["doc_id", "n_spans", "dup_spans", "covered_tokens"]
    bc = dedup.span_dup_stats(_span_corpus()).to_pandas()
    jn = dedup.span_dup_stats(_span_corpus(), broadcast_span_limit=0).to_pandas()
    pd.testing.assert_frame_equal(
        bc[cols].sort_values("doc_id").reset_index(drop=True),
        jn[cols].sort_values("doc_id").reset_index(drop=True),
    )


def test_strip_duplicate_spans():
    out = (
        dedup.strip_duplicate_spans(_span_corpus(), width=5, min_count=2)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "clean_text"] == "one two three"
    assert out.loc[1, "clean_text"] == "x y tail words"
    assert out.loc[0, "removed_tokens"] == 6
    # untouched docs come back verbatim
    assert out.loc[2, "removed_tokens"] == 0
    assert out.loc[3, "clean_text"] == "tiny"


def test_strip_duplicate_spans_join_path_matches_broadcast():
    """Forcing broadcast_span_limit=0 takes the join fallback (packed
    per-doc start positions attached to the text) and must reproduce
    the broadcast path bit-for-bit — the `line_dedup` two-path
    contract, now on the destructive span op too."""
    cols = ["doc_id", "clean_text", "removed_tokens"]
    bc = dedup.strip_duplicate_spans(_span_corpus()).to_pandas()
    jn = dedup.strip_duplicate_spans(
        _span_corpus(), broadcast_span_limit=0
    ).to_pandas()
    pd.testing.assert_frame_equal(
        bc[cols].sort_values("doc_id").reset_index(drop=True),
        jn[cols].sort_values("doc_id").reset_index(drop=True),
    )


def _ppj_corpus():
    rows = [
        {"doc_id": 0, "text": "apple banana cherry date egg"},
        {"doc_id": 1, "text": "apple banana cherry date fig"},   # J(0,1)=4/6
        {"doc_id": 2, "text": "egg date cherry banana apple"},   # J(0,2)=1.0
        {"doc_id": 3, "text": "zebra yak xray"},                 # disjoint
    ]
    return ray.data.from_items(rows)


def test_prefix_filter_pairs_planted():
    out = dedup.prefix_filter_pairs(_ppj_corpus(), threshold=0.6).to_pandas()
    got = {
        (a, b): round(j, 6)
        for a, b, j in zip(out["id_a"], out["id_b"], out["jaccard"])
    }
    assert got == {
        (0, 1): round(4 / 6, 6),
        (0, 2): 1.0,
        (1, 2): round(4 / 6, 6),
    }


def test_prefix_filter_pairs_hash_order_matches_df_order():
    """Forcing df_rank_broadcast_limit=0 takes the md5-token-order
    fallback (no df census broadcast); any consistent total order keeps
    the prefix-filter plan EXACT, so results must match bit-for-bit."""
    cols = ["id_a", "id_b", "jaccard"]
    a = dedup.prefix_filter_pairs(_ppj_corpus(), threshold=0.6).to_pandas()
    b = dedup.prefix_filter_pairs(
        _ppj_corpus(), threshold=0.6, df_rank_broadcast_limit=0
    ).to_pandas()
    key = ["id_a", "id_b"]
    pd.testing.assert_frame_equal(
        a[cols].sort_values(key).reset_index(drop=True),
        b[cols].sort_values(key).reset_index(drop=True),
    )


def test_ngram_overlap_denom_and_path_equality(ray_session):
    import pandas as pd

    import ray.data
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.dedup import (
        ngram_dup_all_pairs,
    )

    # doc 2 is a strict substring of doc 1: containment 1.0, Jaccard < 1
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "the quick brown fox jumps over the lazy dog",
                "quick brown fox jumps",
                "completely different words here",
            ],
        }
    )
    ds = ray.data.from_pandas(docs).repartition(2)
    cont = (
        ngram_dup_all_pairs(
            ds, n=5, threshold=0.99, sim_col="containment", denom="min"
        )
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert cont[["id_a", "id_b"]].values.tolist() == [[1, 2]]
    assert abs(cont["containment"].iloc[0] - 1.0) < 1e-12
    # jaccard of the same pair is well below 1 — containment ≠ jaccard
    jac = ngram_dup_all_pairs(ds, n=5, threshold=0.99).to_pandas()
    assert len(jac) == 0


def test_minhash_transport_path_equality():
    """Slim broadcast/join transports must emit bit-identical pairs to
    the legacy payload plan (same candidates, same exact-Jaccard sims)."""
    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )

    def canon(d):
        return (
            d.to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )

    ref = canon(dedup.minhash_dup_pairs(docs, threshold=0.6, transport="payload"))
    assert len(ref) > 0
    for t in ("broadcast", "join"):
        got = canon(dedup.minhash_dup_pairs(docs, threshold=0.6, transport=t))
        assert ref.equals(got), t


def test_simhash_transport_path_equality():
    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )

    def canon(d):
        return (
            d.to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )

    ref = canon(dedup.simhash_dup_pairs(docs, max_hamming=3, transport="payload"))
    assert len(ref) > 0
    for t in ("broadcast", "join"):
        got = canon(dedup.simhash_dup_pairs(docs, max_hamming=3, transport=t))
        assert ref.equals(got), t


def test_embedding_transport_path_equality():
    emb = ray.data.read_parquet("/root/testdata/sf0.001/embeddings.parquet")

    def canon(d):
        return (
            d.to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )

    ref = canon(dedup.embedding_dup_pairs(emb, threshold=0.4, transport="payload"))
    assert len(ref) > 0
    for t in ("broadcast", "join"):
        got = canon(dedup.embedding_dup_pairs(emb, threshold=0.4, transport=t))
        assert ref.equals(got), t


def test_simhash_block_keys_pigeonhole():
    """Manku block-combination keys: any pair within Hamming
    blocks-clean MUST share >=1 key (recall guarantee); distant pairs
    mostly don't (precision comes from exact verification anyway)."""
    import numpy as np

    from sample_c360_text2sql_segmentation_entityresolution_ray.functions.simhash import (
        simhash_block_keys,
    )

    rng = np.random.default_rng(7)
    base = rng.integers(0, 2**63, 200, dtype=np.uint64)
    for d in (1, 2, 3):
        flips = np.zeros(200, np.uint64)
        for i in range(200):
            bits = rng.choice(64, size=d, replace=False)
            m = np.uint64(0)
            for b in bits:
                m |= np.uint64(1) << np.uint64(b)
            flips[i] = m
        near = base ^ flips
        ka = simhash_block_keys(base, blocks=6, clean=3)
        kb = simhash_block_keys(near, blocks=6, clean=3)
        shared = (ka == kb).any(axis=1)
        assert shared.all(), f"hamming {d}: {(~shared).sum()} pairs missed"


def test_simhash_scheme_equivalence():
    """split and blocks schemes produce identical verified pairs."""
    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )

    def canon(d):
        return (
            d.to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )

    split = canon(dedup.simhash_dup_pairs(docs, max_hamming=3, scheme="split"))
    blocks = canon(
        dedup.simhash_dup_pairs(docs, max_hamming=3, scheme="blocks")
    )
    assert len(split) > 0
    assert split.equals(blocks)
    # and through the payload transport too
    pb = canon(
        dedup.simhash_dup_pairs(
            docs, max_hamming=3, scheme="blocks", transport="payload"
        )
    )
    assert split.equals(pb)


def test_resolve_simhash_scheme_pigeonhole_after_auto():
    """scheme='auto' must re-check bands >= max_hamming+1 AFTER
    resolution: an under-banded auto-split silently loses recall, so
    auto falls back to the Manku block scheme; an EXPLICIT
    under-banded split still raises."""
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.dedup import (
        _resolve_simhash_scheme,
    )

    # small corpus, bands ok -> split
    assert _resolve_simhash_scheme("auto", 1000, 4, 3) == "split"
    # small corpus, bands=4 < max_hamming+1=5 -> auto takes blocks
    assert _resolve_simhash_scheme("auto", 1000, 4, 4) == "blocks"
    # big corpus -> blocks regardless
    assert _resolve_simhash_scheme("auto", 10_000_000, 8, 3) == "blocks"
    with pytest.raises(ValueError, match="pigeonhole"):
        _resolve_simhash_scheme("split", 1000, 4, 4)
    assert _resolve_simhash_scheme("blocks", 1000, 4, 4) == "blocks"


def test_auto_hyperplane_params_clamp_is_not_silent():
    """When the derived band count exceeds max_bands the resolver must
    either trade band_bits for collision probability (keeping the
    P(miss) target) or raise — never silently clamp to ~0.5 miss."""
    import math

    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.dedup import (
        _auto_hyperplane_params,
    )

    # trade path: 40k docs at threshold 0.5 needs ~1190 bands at the
    # bucket-sized 11 bits; one bit of bucket headroom brings it under
    b, nb = _auto_hyperplane_params(40_000, 0.5, "auto", "auto")
    assert nb <= 1024
    p = 1.0 - math.acos(0.5) / math.pi
    miss = (1.0 - p**b) ** nb
    assert miss <= 1e-6  # the stated guarantee survives the trade
    # no-bucket-headroom regime: must raise, not clamp
    with pytest.raises(ValueError, match="max_bands"):
        _auto_hyperplane_params(2_000_000, 0.4, "auto", "auto")
    # explicit band_bits that cannot meet the guarantee: raise (do not
    # silently change the caller's geometry)
    with pytest.raises(ValueError, match="max_bands"):
        _auto_hyperplane_params(2_000_000, 0.4, 16, "auto")
    # explicit n_bands is the caller accepting the measured recall
    assert _auto_hyperplane_params(2_000_000, 0.4, "auto", 64) == (16, 64)
