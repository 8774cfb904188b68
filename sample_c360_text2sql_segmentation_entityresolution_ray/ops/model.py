"""Distributed closed-form / IRLS model fitting over feature columns.

No reference analog: the reference trains its only model inside a
managed black box (`lambda/create_personalize_solution/index.py:36-45`).
This is the engine-level primitive behind a CCNet/GPT-3-style *trained
quality classifier* — the standard webtext-curation step where a cheap
linear model distills a hand-written quality heuristic (or a labeled
seed corpus) into a smooth per-doc score.

Scale posture:

- Fitting never shuffles rows.  Each batch computes its Gram-matrix
  partials with one vectorized matmul and emits a SINGLE row of
  ``p² + p + 1`` floats (p = features + intercept, so ~50 floats for
  p = 6); partials merge through the
  :func:`..ops.relational.grouped_aggregate` combiner shuffle and only
  ONE row reaches the driver, which does the (p×p) solve.
- :func:`linear_fit` is one pass (ridge normal equations).
  :func:`logistic_fit` is one pass per Newton/IRLS iteration with the
  current β broadcast in the task closure (k×p floats).
- Prediction (:func:`predict_stage`) is a stateless vectorized map.

Determinism: fixed iteration counts, L2-regularized (strictly convex —
IRLS converges even on linearly separable labels), and the pure-numpy
mirrors (:func:`linear_fit_reference` / :func:`logistic_fit_reference`)
apply the identical update rule, so the distributed fit lands on the
reference coefficients to fp-sum noise; the DuckDB oracle re-derives
the features and scores with the reference coefficients.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .relational import grouped_aggregate


def _xmat(batch: pa.Table, feature_cols: list[str]) -> np.ndarray:
    """(n, p+1) design matrix with a leading intercept column."""
    n = batch.num_rows
    X = np.empty((n, len(feature_cols) + 1), dtype=np.float64)
    X[:, 0] = 1.0
    for j, c in enumerate(feature_cols):
        X[:, j + 1] = batch[c].to_numpy(zero_copy_only=False)
    return X


def _sum_rows(parts: "ray.data.Dataset", cols: list[str]) -> np.ndarray:
    """Combiner-shuffle the per-batch partial rows down to one global
    sum vector (constant key ⇒ exactly one row reaches the driver)."""
    merged = grouped_aggregate(
        parts, ["_k"], [("sum", c, c) for c in cols], partitions=1
    ).take_all()
    assert len(merged) == 1
    return np.array([merged[0][c] for c in cols], dtype=np.float64)


def _gram_cols(p1: int) -> list[str]:
    return [f"_g{i}_{j}" for i in range(p1) for j in range(i, p1)]


def _unpack_gram(vals: np.ndarray, p1: int) -> np.ndarray:
    G = np.zeros((p1, p1), dtype=np.float64)
    it = iter(vals)
    for i in range(p1):
        for j in range(i, p1):
            v = next(it)
            G[i, j] = v
            G[j, i] = v
    return G


def linear_fit(
    ds: "ray.data.Dataset",
    feature_cols: list[str],
    target_col: str,
    l2: float = 0.0,
) -> np.ndarray:
    """Ridge regression via distributed normal equations; returns
    ``β = (XᵀX + l2·I)⁻¹ Xᵀy`` with ``β[0]`` the intercept (the
    intercept is not penalized)."""
    p1 = len(feature_cols) + 1
    gcols = _gram_cols(p1)
    bcols = [f"_b{i}" for i in range(p1)]

    def _partials(batch: pa.Table) -> pd.DataFrame:
        X = _xmat(batch, feature_cols)
        y = batch[target_col].to_numpy(zero_copy_only=False).astype(np.float64)
        G = X.T @ X
        b = X.T @ y
        row = {"_k": 0}
        for c, (i, j) in zip(
            gcols, ((i, j) for i in range(p1) for j in range(i, p1))
        ):
            row[c] = G[i, j]
        for c, v in zip(bcols, b):
            row[c] = v
        return pd.DataFrame([row])

    sums = _sum_rows(
        ds.map_batches(_partials, batch_format="pyarrow"), gcols + bcols
    )
    G = _unpack_gram(sums[: len(gcols)], p1)
    b = sums[len(gcols) :]
    R = np.eye(p1) * l2
    R[0, 0] = 0.0
    return np.linalg.solve(G + R, b)


# below this many rows the IRLS loop runs on the driver via the
# bit-equal numpy mirror: each of the 8 Newton passes is a full dataset
# execution (~1 s of fixed barrier overhead at sandbox scale), while the
# collected features are p+1 ≈ 7 floats/row — the same measured-size
# switch kmeans_fit / the ER attach use
LOGISTIC_DRIVER_LIMIT = 1_000_000


def logistic_fit(
    ds: "ray.data.Dataset",
    feature_cols: list[str],
    label_col: str,
    l2: float = 1.0,
    iters: int = 8,
    driver_limit: int = LOGISTIC_DRIVER_LIMIT,
) -> np.ndarray:
    """L2-regularized logistic regression via Newton/IRLS: one
    combiner-shuffled pass per iteration, β broadcast in the closure.
    ``l2 > 0`` keeps the Hessian PD and the solution finite even on
    linearly separable labels (the distillation case).

    Inputs under ``driver_limit`` rows collect once (features + label
    only — never the text) and fit via :func:`logistic_fit_reference`
    (identical update rule; parity pinned by ``test_model.py``).  The
    size probe is ``limit(n+1).take_all()`` — one truncated streaming
    execution that doubles as the collect — never ``count()``."""
    cols = list(feature_cols) + [label_col]
    probe = ds.select_columns(cols).limit(driver_limit + 1).take_all()
    if len(probe) <= driver_limit:
        X = np.array(
            [[r[c] for c in feature_cols] for r in probe], dtype=np.float64
        )
        y = np.array([r[label_col] for r in probe], dtype=np.float64)
        return logistic_fit_reference(X, y, l2=l2, iters=iters)
    del probe

    p1 = len(feature_cols) + 1
    gcols = _gram_cols(p1)
    bcols = [f"_b{i}" for i in range(p1)]
    beta = np.zeros(p1, dtype=np.float64)
    reg = np.eye(p1) * l2
    reg[0, 0] = 0.0

    for _ in range(iters):
        frozen = beta

        def _partials(batch: pa.Table, _b=frozen) -> pd.DataFrame:
            X = _xmat(batch, feature_cols)
            y = batch[label_col].to_numpy(zero_copy_only=False).astype(np.float64)
            mu = 1.0 / (1.0 + np.exp(-(X @ _b)))
            w = mu * (1.0 - mu)
            H = (X * w[:, None]).T @ X
            g = X.T @ (y - mu)
            row = {"_k": 0}
            for c, (i, j) in zip(
                gcols, ((i, j) for i in range(p1) for j in range(i, p1))
            ):
                row[c] = H[i, j]
            for c, v in zip(bcols, g):
                row[c] = v
            return pd.DataFrame([row])

        sums = _sum_rows(
            ds.map_batches(_partials, batch_format="pyarrow"), gcols + bcols
        )
        H = _unpack_gram(sums[: len(gcols)], p1)
        g = sums[len(gcols) :]
        beta = beta + np.linalg.solve(H + reg, g - reg @ beta)
    return beta


def predict_stage(
    ds: "ray.data.Dataset",
    beta: np.ndarray,
    feature_cols: list[str],
    id_col: str,
    out_col: str = "score",
    link: str = "logit",
) -> "ray.data.Dataset":
    """(id, score): ``Xβ`` (``link='linear'``) or ``σ(Xβ)``
    (``link='logit'``) — stateless vectorized map, tiny β in-closure."""
    b = np.asarray(beta, dtype=np.float64)

    def _fn(batch: pa.Table) -> pa.Table:
        eta = _xmat(batch, feature_cols) @ b
        s = 1.0 / (1.0 + np.exp(-eta)) if link == "logit" else eta
        return pa.table(
            {id_col: batch[id_col], out_col: pa.array(s, pa.float64())}
        )

    return ds.map_batches(_fn, batch_format="pyarrow")


def linear_fit_reference(
    X: np.ndarray, y: np.ndarray, l2: float = 0.0
) -> np.ndarray:
    """Single-process mirror of :func:`linear_fit` (identical algebra)."""
    X1 = np.column_stack([np.ones(len(X)), np.asarray(X, dtype=np.float64)])
    R = np.eye(X1.shape[1]) * l2
    R[0, 0] = 0.0
    return np.linalg.solve(X1.T @ X1 + R, X1.T @ np.asarray(y, dtype=np.float64))


def logistic_fit_reference(
    X: np.ndarray, y: np.ndarray, l2: float = 1.0, iters: int = 8
) -> np.ndarray:
    """Single-process mirror of :func:`logistic_fit` (identical update)."""
    X1 = np.column_stack([np.ones(len(X)), np.asarray(X, dtype=np.float64)])
    y = np.asarray(y, dtype=np.float64)
    p1 = X1.shape[1]
    beta = np.zeros(p1)
    reg = np.eye(p1) * l2
    reg[0, 0] = 0.0
    for _ in range(iters):
        mu = 1.0 / (1.0 + np.exp(-(X1 @ beta)))
        w = mu * (1.0 - mu)
        H = (X1 * w[:, None]).T @ X1
        g = X1.T @ (y - mu)
        beta = beta + np.linalg.solve(H + reg, g - reg @ beta)
    return beta


__all__ = [
    "linear_fit",
    "logistic_fit",
    "predict_stage",
    "linear_fit_reference",
    "logistic_fit_reference",
]
