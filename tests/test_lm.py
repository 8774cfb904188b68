"""Bigram-LM perplexity operator semantics (DuckDB oracle parity is
covered by test_queries_oracle[lm_perplexity])."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from sample_c360_text2sql_segmentation_entityresolution_ray.ops import lm


def _docs(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def _score(ds, **fit_kw):
    ref = lm.bigram_lm_fit(ds, **fit_kw)
    return (
        lm.lm_score_stage(ds, ref)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_formulaic_docs_score_higher_than_shuffled():
    # 20 copies of the same sentence dominate the corpus LM; a doc with
    # the same words in scrambled order has unseen bigrams -> lower
    # mean log-prob (higher perplexity).
    common = "the quick brown fox jumps over the lazy dog"
    rows = [(i, common) for i in range(20)]
    rows.append((100, "dog the lazy over jumps fox brown quick the"))
    out = _score(_docs(rows), vocab_size=64)
    formulaic = out.loc[out.doc_id == 0, "lm_logprob"].iloc[0]
    scrambled = out.loc[out.doc_id == 100, "lm_logprob"].iloc[0]
    assert formulaic > scrambled + 0.5


def test_vocab_cap_maps_tail_to_unk_deterministically():
    rows = [(i, f"alpha beta w{i} alpha") for i in range(30)]
    a = _score(_docs(rows), vocab_size=2)  # only alpha+beta kept
    b = _score(_docs(rows), vocab_size=2)
    assert np.array_equal(a.lm_logprob.to_numpy(), b.lm_logprob.to_numpy())
    # every w{i} is <unk>, so all docs share the identical bigram walk
    assert a.lm_logprob.nunique() == 1


def test_bigram_pruning_only_reduces_probability_of_rare_pairs():
    rows = [(i, "a b a b a b") for i in range(10)] + [(99, "a c")]
    ds = _docs(rows)
    full = _score(ds, vocab_size=8, bigram_min_count=1)
    pruned = _score(ds, vocab_size=8, bigram_min_count=5)
    # the dominant doc's bigrams all have count >= 5 -> identical score
    f0 = full.loc[full.doc_id == 0, "lm_logprob"].iloc[0]
    p0 = pruned.loc[pruned.doc_id == 0, "lm_logprob"].iloc[0]
    assert f0 == p0
    # the rare 'a c' bigram is pruned to count-0 -> score drops
    f9 = full.loc[full.doc_id == 99, "lm_logprob"].iloc[0]
    p9 = pruned.loc[pruned.doc_id == 99, "lm_logprob"].iloc[0]
    assert p9 < f9
