"""Distributed model fitting (ops/model.py) vs the numpy mirrors."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

from sample_c360_text2sql_segmentation_entityresolution_ray.ops.model import (
    linear_fit,
    linear_fit_reference,
    logistic_fit,
    logistic_fit_reference,
    predict_stage,
)


def _synth(n=2000, seed=7):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, 3))
    y = 2.0 + 3.0 * X[:, 0] - 1.0 * X[:, 1] + 0.5 * X[:, 2] + rng.normal(
        0, 0.1, n
    )
    df = pd.DataFrame(X, columns=["x0", "x1", "x2"])
    df["y"] = y
    df["label"] = (y > 2.0).astype(np.float64)
    return df


def test_linear_fit_matches_reference_and_recovers_weights():
    df = _synth()
    ds = ray.data.from_pandas(df).repartition(8)
    beta = linear_fit(ds, ["x0", "x1", "x2"], "y", l2=0.5)
    ref = linear_fit_reference(df[["x0", "x1", "x2"]].to_numpy(), df["y"], l2=0.5)
    assert np.allclose(beta, ref, atol=1e-8)
    assert np.allclose(beta, [2.0, 3.0, -1.0, 0.5], atol=0.02)


def test_logistic_fit_matches_reference():
    df = _synth()
    ds = ray.data.from_pandas(df).repartition(8)
    # driver_limit=0 forces the distributed IRLS path (the default
    # measured-size switch would collect inputs this small)
    beta = logistic_fit(
        ds, ["x0", "x1", "x2"], "label", l2=1.0, iters=8, driver_limit=0
    )
    ref = logistic_fit_reference(
        df[["x0", "x1", "x2"]].to_numpy(), df["label"], l2=1.0, iters=8
    )
    assert np.allclose(beta, ref, atol=1e-8)
    # the default driver fast path is the reference, bit-for-bit
    fast = logistic_fit(ds, ["x0", "x1", "x2"], "label", l2=1.0, iters=8)
    assert (fast == ref).all()
    # the fitted boundary separates: AUC-ish sanity via score ordering
    scored = (
        predict_stage(
            ds.map_batches(
                lambda b: b.assign(doc_id=np.arange(len(b))), batch_format="pandas"
            ),
            beta,
            ["x0", "x1", "x2"],
            id_col="label",
            out_col="prob",
        )
        .to_pandas()
    )
    assert scored.loc[scored["label"] == 1, "prob"].mean() > (
        scored.loc[scored["label"] == 0, "prob"].mean() + 0.3
    )


def test_linear_fit_recovers_quality_heuristic_weights(sf_dir):
    """Regressing the composite quality score on its own five features
    must recover the published heuristic weights exactly — an
    end-to-end check of feature extraction + distributed fit."""
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.text import (
        QUALITY_FEATURES,
        quality_feature_stage,
    )

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    # constant features (the synthetic docs saturate alpha/term/rep at
    # some sfs) are collinear with the intercept — regress on the
    # varying subset only, with the target built from the same subset
    weights = {"swr10": 0.2, "len_ok": 0.3, "alpha": 0.2, "term": 0.15, "rep": 0.15}
    fd = quality_feature_stage(docs).to_pandas()
    varying = [c for c in QUALITY_FEATURES if fd[c].std() > 1e-12]
    assert len(varying) >= 2

    def _target(b):
        q = sum(weights[c] * b[c] for c in varying)
        return b.assign(quality=q)

    feats = quality_feature_stage(docs).map_batches(_target, batch_format="pandas")
    beta = linear_fit(feats, varying, "quality", l2=0.0)
    assert np.allclose(beta, [0.0] + [weights[c] for c in varying], atol=1e-9)
