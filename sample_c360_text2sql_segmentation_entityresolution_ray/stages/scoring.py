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

    ``idf_ref``: optional ``ray.put`` handle to a
    :class:`..functions.idf.IdfTable` (bigram-hash → idf weight) —
    fetched once per actor in ``__init__`` (broadcast, never re-shipped
    per batch).  Used by the short-doc gate: IDF-weighted bigram
    Jaccard/cosine discounts shared boilerplate framing, which
    otherwise gives DIFFERENT short docs bigram-J up to ~0.3 (measured)
    — the precision-preserving weighting, fed from a corpus sample by
    ``pipelines.entity_resolution``."""

    def __init__(self, cfg: ERConfig = DEFAULT_CONFIG, idf_ref=None):
        self.cfg = cfg
        self.idf = ray.get(idf_ref) if idf_ref is not None else None

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
            cos[i] = inter / np.sqrt(len(sa) * len(sb))
        # short-doc recall path: a short doc's 3-shingle Jaccard
        # collapses under the same perturbation rate (one dropped token
        # kills 3 of ~20 shingles), so pairs failing the k=3 floor where
        # BOTH sides carry a bigram set (records under
        # cfg.short_doc_tokens) get one exact bigram-Jaccard check.
        # Order-destroyed confounders stay ≤ 0.09 bigram-J (bigrams die
        # with token order) while true short pairs measure ≥ 0.25 —
        # min_jaccard2 sits between with 2× margin each way.
        gate3 = jac >= cfg.min_jaccard
        sh2_a = batch["shingles2_a"].to_numpy()
        sh2_b = batch["shingles2_b"].to_numpy()
        gate2 = np.zeros(n, dtype=bool)
        for i in np.flatnonzero(~gate3):
            sa = np.asarray(sh2_a[i], dtype=np.uint32)
            sb = np.asarray(sh2_b[i], dtype=np.uint32)
            if len(sa) == 0 or len(sb) == 0:
                continue
            if self.idf is not None:
                wa = self.idf.weights(sa)
                wb = self.idf.weights(sb)
            else:
                wa = np.ones(len(sa))
                wb = np.ones(len(sb))
            _, ia, _ib = np.intersect1d(
                sa, sb, assume_unique=True, return_indices=True
            )
            wi = float(wa[ia].sum())
            swa, swb = float(wa.sum()), float(wb.sum())
            union_w = swa + swb - wi
            j2 = wi / union_w if union_w > 0 else 0.0
            if j2 >= cfg.min_jaccard2:
                gate2[i] = True
                jac[i] = j2
                cos[i] = wi / np.sqrt(swa * swb) if swa and swb else 0.0
        # string metrics only where coarse overlap exists, batched:
        # the Levenshtein DP runs once over the gated subset (numpy
        # kernels across pairs), not per pair.
        gate = gate3 | gate2
        if gate.any():
            sl_a = batch["slug_a"].to_numpy()[gate]
            sl_b = batch["slug_b"].to_numpy()[gate]
            jw[gate] = 0.5 * jaro_winkler_batch(sl_a, sl_b) + 0.5 * levenshtein_sim_batch(
                sl_a, sl_b
            )
        cos = np.where(gate, cos, 0.0)
        score = cfg.w_jaccard * jac + cfg.w_cosine * cos + cfg.w_jw * jw
        # hard floor: a pair below min_jaccard (k=3, or k=2 on the
        # short-doc path) can never match, however high its cosine/JW
        # (defends against boilerplate-similar and shared-template
        # non-matches, the 2% confounder class)
        score = np.where(gate, score, 0.0)
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
