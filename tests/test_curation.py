"""Corpus-curation pipeline: filter + dedup + annotate, resumable write."""

from __future__ import annotations

import ray.data

from sample_c360_text2sql_segmentation_entityresolution_ray.pipelines.curation import (
    curate_and_write,
    curate_corpus,
)

GOOD = (
    "the quick brown fox jumps over the lazy dog while the sun rises over "
    "the quiet valley and the birds sing their morning songs across it. "
) * 4  # > 50 tokens, English stopwords, terminators


def _docs():
    rows = [
        {"doc_id": 0, "text": GOOD},
        {"doc_id": 1, "text": GOOD},                       # exact dup → dropped
        {"doc_id": 2, "text": GOOD.replace("fox", "cat")}, # near dup → dropped
        {"doc_id": 3, "text": "@@@@ #### $$$$ %%%%"},      # low quality → dropped
        {"doc_id": 4, "text": (
            "der hund und die katze sind nicht mit der maus in das haus "
            "gegangen und die vögel singen über den feldern morgen früh. "
        ) * 4},                                            # German
    ]
    return ray.data.from_items(rows)


def test_curate_corpus_filters_and_dedups():
    out = curate_corpus(_docs(), min_quality=0.3, near_dup_threshold=0.7).to_pandas()
    kept = sorted(out["doc_id"])
    assert 0 in kept           # representative survives
    assert 1 not in kept       # exact dup gone
    assert 2 not in kept       # near dup gone
    assert 3 not in kept       # junk gone
    assert 4 in kept           # German doc kept (no lang filter)
    row = out.set_index("doc_id").loc[0]
    assert row["lang_pred"] == "en" and row["quality"] > 0.5
    assert row["n_tokens"] > 50 and row["n_bpe_tokens"] >= row["n_tokens"]


def test_curate_lang_allowlist():
    out = curate_corpus(
        _docs(), min_quality=0.3, allowed_langs=("en",), near_dup_threshold=0.7
    ).to_pandas()
    assert set(out["lang_pred"]) == {"en"}
    assert 4 not in set(out["doc_id"])


def test_curate_and_write_resumes(tmp_path, sf_dir):
    import os

    from sample_c360_text2sql_segmentation_entityresolution_ray.state import (
        load_manifest,
    )

    ck = str(tmp_path)
    out1 = curate_and_write(sf_dir, ck, min_quality=0.2)
    n1 = out1.count()
    assert n1 > 0
    m1 = load_manifest(os.path.join(ck, "curated_corpus"))
    assert m1["row_count"] == n1
    out2 = curate_and_write(sf_dir, ck, min_quality=0.2)
    assert out2.count() == n1
    m2 = load_manifest(os.path.join(ck, "curated_corpus"))
    assert m2["written_at"] == m1["written_at"]  # resumed, not recomputed
