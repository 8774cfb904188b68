"""Pairwise scoring: a stateful actor pool over candidate-pair batches.

Reference analog: the scoring half of AWS ER ``ML_MATCHING``
(`lib/entity-resolution-service.ts:179-181`), rebuilt as the north rule
specifies — batched Jaro-Winkler / Levenshtein on content-defined
signature slugs plus shingle-set Jaccard and (optionally IDF-weighted)
cosine over shingle TF vectors, run by
``map_batches(PairScorer, concurrency=N)`` so per-actor setup (weight
vector, optional IDF table fetched from the object store) happens once,
not per batch.

Candidate pairs are self-contained (both sides' capped feature arrays
ride along from blocking), so scoring needs **no join back to the
corpus** — the stage is a pure streaming map.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray

from ..functions.strings import jaro_winkler_batch, levenshtein_sim_batch
from .config import DEFAULT_CONFIG, ERConfig

EDGE_COLUMNS = ["url_a", "url_b", "jaccard", "cosine", "jw", "score", "block_n"]


class PairScorer:
    """Callable actor class for ``map_batches``.

    ``idf_ref``: optional ``ray.put`` handle to a ``{token_hash: idf}``
    dict — fetched once per actor in ``__init__`` (broadcast, never
    re-shipped per batch)."""

    def __init__(self, cfg: ERConfig = DEFAULT_CONFIG, idf_ref=None):
        self.cfg = cfg
        self.idf = ray.get(idf_ref) if idf_ref is not None else None

    def _cosine(self, ta: np.ndarray, tb: np.ndarray) -> float:
        if len(ta) == 0 or len(tb) == 0:
            return 0.0
        va, ca = np.unique(ta, return_counts=True)
        vb, cb = np.unique(tb, return_counts=True)
        if self.idf is not None:
            wa = np.array([self.idf.get(int(v), 1.0) for v in va])
            wb = np.array([self.idf.get(int(v), 1.0) for v in vb])
            ca = ca * wa
            cb = cb * wb
        common, ia, ib = np.intersect1d(va, vb, assume_unique=True, return_indices=True)
        if len(common) == 0:
            return 0.0
        num = float((ca[ia] * cb[ib]).sum())
        den = float(np.sqrt((ca * ca).sum()) * np.sqrt((cb * cb).sum()))
        return num / den if den > 0 else 0.0

    @staticmethod
    def _jaccard(sa: np.ndarray, sb: np.ndarray) -> float:
        if len(sa) == 0 and len(sb) == 0:
            return 0.0
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        union = len(sa) + len(sb) - inter
        return inter / union if union else 0.0

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        cfg = self.cfg
        n = len(batch)
        if n == 0:
            return pd.DataFrame({c: pd.Series(dtype=t) for c, t in zip(
                EDGE_COLUMNS, [object, object, float, float, float, float, np.int32]
            )})
        jac = np.zeros(n)
        cos = np.zeros(n)
        jw = np.zeros(n)
        sh_a = batch["shingles_a"].to_numpy()
        sh_b = batch["shingles_b"].to_numpy()
        # MinHash pre-gate: one vectorized (n, num_perm) signature
        # comparison estimates Jaccard for the WHOLE batch; only pairs
        # whose estimate clears (min_jaccard - est_gate_margin) pay the
        # exact per-pair set intersection.  σ(est) = sqrt(j(1-j)/64) ≈
        # 0.06, so the margin makes a false drop of a true borderline
        # pair < 0.5%; junk pairs (the vast majority) skip the loop.
        sig_a = np.stack([np.asarray(s, np.uint8) for s in batch["mh8_a"]])
        sig_b = np.stack([np.asarray(s, np.uint8) for s in batch["mh8_b"]])
        est = (sig_a == sig_b).mean(axis=1)
        exact = est >= (cfg.min_jaccard - cfg.est_gate_margin)
        jac[:] = est  # below-gate pairs keep the estimate (floored later)
        for i in np.flatnonzero(exact):
            # ONE sorted-set intersection per pair feeds both metrics:
            # shingle sets are unique, so TF-cosine = |∩| / sqrt(|a||b|)
            # (identical value to the general formula at 1/3 the cost);
            # the IDF-weighted variant takes the slower path.
            sa = np.asarray(sh_a[i], dtype=np.uint32)
            sb = np.asarray(sh_b[i], dtype=np.uint32)
            if len(sa) == 0 or len(sb) == 0:
                jac[i] = 0.0
                continue
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            jac[i] = inter / union if union else 0.0
            if self.idf is None:
                cos[i] = inter / np.sqrt(len(sa) * len(sb))
            else:
                cos[i] = self._cosine(sa, sb)
        # string metrics only where coarse overlap exists, batched:
        # the Levenshtein DP runs once over the gated subset (numpy
        # kernels across pairs), not per pair.
        gate = jac >= cfg.min_jaccard
        if gate.any():
            sl_a = batch["slug_a"].to_numpy()[gate]
            sl_b = batch["slug_b"].to_numpy()[gate]
            jw[gate] = 0.5 * jaro_winkler_batch(sl_a, sl_b) + 0.5 * levenshtein_sim_batch(
                sl_a, sl_b
            )
        cos = np.where(gate, cos, 0.0)
        score = cfg.w_jaccard * jac + cfg.w_cosine * cos + cfg.w_jw * jw
        # hard floor: a pair below min_jaccard can never match, however
        # high its cosine/JW (defends against boilerplate-similar and
        # shared-template non-matches, the 2% confounder class)
        score = np.where(jac >= cfg.min_jaccard, score, 0.0)
        return pd.DataFrame(
            {
                "url_a": batch["url_a"].to_numpy(),
                "url_b": batch["url_b"].to_numpy(),
                "jaccard": jac,
                "cosine": cos,
                "jw": jw,
                "score": score,
                "block_n": batch["block_n"].to_numpy(),
            }
        )


def score_pairs_stage(pairs, cfg: ERConfig = DEFAULT_CONFIG, idf_ref=None):
    # Autoscaling pool (1, N): a FIXED pool of N actors each reserving a
    # CPU can consume every core of a small cluster and deadlock the
    # upstream stages feeding it; with min=1 the pipeline always
    # progresses and Ray grows the pool only while CPUs are free.
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    pool_max = max(1, min(cfg.scorer_concurrency, ncpu - 1))
    return pairs.map_batches(
        PairScorer,
        fn_constructor_kwargs={"cfg": cfg, "idf_ref": idf_ref},
        batch_format="pandas",
        batch_size=cfg.scorer_batch_size,
        concurrency=(1, pool_max),
        num_cpus=1,
    )


def matched_edges_stage(scored, cfg: ERConfig = DEFAULT_CONFIG):
    """Threshold to matched edges (vectorized predicate, not row filter)."""
    thr = cfg.score_threshold

    def _thr(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["score"] >= thr]

    return scored.map_batches(_thr, batch_format="pandas")
