"""DSIR importance-resampling selection (`ops/dsir.py`) — unigram
LLR scoring against a target subset, deterministic top-k."""

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data

from sample_c360_text2sql_segmentation_entityresolution_ray.ops.dsir import (
    DsirModel,
    dsir_fit,
    dsir_score_stage,
    dsir_select,
)


def _docs():
    """Target (en) docs say 'wiki'; raw-only (xx) docs say 'spam'.
    Doc 5 is token-free; doc 6 mixes both words."""
    return pd.DataFrame(
        {
            "doc_id": np.int64([1, 2, 3, 4, 5, 6]),
            "text": [
                "wiki wiki facts",
                "wiki facts",
                "spam spam offer",
                "spam offer",
                "",
                "wiki spam",
            ],
            "lang": ["en", "en", "xx", "xx", "xx", "xx"],
        }
    )


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    return ray.data.from_pandas(_docs()).repartition(2)


def test_target_like_docs_rank_first(ray_session, docs_ds):
    got = dsir_select(docs_ds, k=6).to_pandas()
    # target-word docs outrank raw-only docs; token-free doc scores 0
    assert set(got["doc_id"].tolist()[:2]) == {1, 2}
    assert set(got["doc_id"].tolist()[-2:]) <= {3, 4, 5}
    zero = got.loc[got["doc_id"] == 5]
    assert zero["llr"].iloc[0] == 0.0 and zero["n_tokens"].iloc[0] == 0
    # mixed doc sits strictly between pure-target and pure-raw docs
    llr = dict(zip(got["doc_id"], got["llr"]))
    assert llr[2] > llr[6] > llr[3]


def test_fit_counts_and_totals(ray_session, docs_ds):
    m: DsirModel = ray.get(dsir_fit(docs_ds))
    by_tok = dict(zip(m.vocab_sorted, zip(m.n_raw, m.n_tgt)))
    assert by_tok["wiki"] == (4, 3)
    assert by_tok["spam"] == (4, 0)
    assert by_tok["facts"] == (2, 2)
    assert by_tok["offer"] == (2, 0)
    assert m.total_raw == 12.0 and m.total_tgt == 5.0 and m.v == 4.0


def test_vocab_cap_keeps_in_vocab_scores(ray_session, docs_ds):
    full = ray.get(dsir_fit(docs_ds))
    capped = ray.get(dsir_fit(docs_ds, vocab_limit=2))
    assert capped.kept == 2 and capped.v == full.v == 4.0
    # the two most frequent tokens score identically under the cap
    for tok in ("wiki", "spam"):
        a = full.llr_of_tokens(np.asarray([tok], object))
        b = capped.llr_of_tokens(np.asarray([tok], object))
        np.testing.assert_allclose(a, b)
    # out-of-cap token falls back to smoothed-zero counts (llr 0 here
    # only if totals were equal; just assert it is finite and defined)
    oov = capped.llr_of_tokens(np.asarray(["facts"], object))
    assert np.isfinite(oov).all()


def test_score_stage_schema(ray_session, docs_ds):
    ref = dsir_fit(docs_ds)
    out = dsir_score_stage(docs_ds, ref).to_pandas()
    assert sorted(out.columns) == ["doc_id", "llr", "n_tokens"]
    assert len(out) == 6
    assert out["n_tokens"].sum() == 12
