"""Pairwise scoring: a two-stage streaming scorer over candidate pairs.

Reference analog: the scoring half of AWS ER ``ML_MATCHING``
(`lib/entity-resolution-service.ts:179-181`), rebuilt as the north rule
specifies — batched Jaro-Winkler / Levenshtein on content-defined
signature slugs plus shingle-set Jaccard and IDF-weighted bigram
metrics.

Why two stages: a candidate pair surfaces from up to ~25 blocking keys
(measured ×2.4 overall, ×17 among TRUE pairs, which collide in nearly
every band).  The set metrics are cheap enough to pay per duplicate,
but the string DP kernels are the scorer's dominant cost — so:

1. :class:`PairFeatureGate` (actor pool) — MinHash pre-gate, exact
   shingle Jaccard, IDF-weighted bigram gate for short docs.  Emits a
   SLIM row (urls, slugs, jaccard, cosine, block_n ≈ 150 B) for pairs
   passing a floor; junk pairs (the vast majority) die here without
   ever being shuffled.
2. ``dedupe_by_key(url_a, url_b)`` on that slim gated stream — the
   shuffle moves ~150 B/row for the few survivors, not the ~45 KB
   feature payload of the full candidate stream (the r1 design note
   about not shuffling candidates still holds; this shuffles the
   gated 2-4%).
3. :func:`string_score_stage` — Jaro-Winkler + Levenshtein ONCE per
   unique pair, final weighted score + threshold.

Candidate pairs are self-contained (both sides' capped feature arrays
ride along from blocking), so stage 1 needs **no join back to the
corpus** — a pure streaming map.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray

from ..functions.strings import jaro_winkler_batch, levenshtein_sim_batch
from .config import DEFAULT_CONFIG, ERConfig

SLIM_COLUMNS = ["url_a", "url_b", "slug_a", "slug_b", "jaccard", "cosine", "block_n"]
# broadcast-store mode: the gate emits store ROW IDS instead of
# url/slug strings — the dedupe exchange then moves ~30 B/row instead
# of ~230 B, and the string stage restores identity columns from the
# store's zero-copy bytes arrays
SLIM_RID_COLUMNS = ["ra", "rb", "jaccard", "cosine", "block_n"]
EDGE_COLUMNS = ["url_a", "url_b", "jaccard", "cosine", "jw", "score", "block_n"]


def _u32(x) -> np.ndarray:
    """Feature set as uint32 array — accepts a list (payload plan) or
    the packed-binary transport of the join plan (Acero joins reject
    list payload columns, so `pipelines/entity_resolution.py` ships
    features as fixed-width bytes; frombuffer is a zero-copy view)."""
    if isinstance(x, (bytes, bytearray, memoryview)):
        return np.frombuffer(x, np.uint32)
    return np.asarray(x, dtype=np.uint32)


def _u8(x) -> np.ndarray:
    if isinstance(x, (bytes, bytearray, memoryview)):
        return np.frombuffer(x, np.uint8)
    return np.asarray(x, dtype=np.uint8)


def _empty_slim() -> pd.DataFrame:
    return pd.DataFrame(
        {
            c: pd.Series(dtype=t)
            for c, t in zip(
                SLIM_COLUMNS, [object, object, object, object, float, float, np.int32]
            )
        }
    )


def _empty_slim_rid() -> pd.DataFrame:
    return pd.DataFrame(
        {
            c: pd.Series(dtype=t)
            for c, t in zip(
                SLIM_RID_COLUMNS, [np.int64, np.int64, float, float, np.int32]
            )
        }
    )


class PairFeatureGate:
    """Stage-1 callable actor class for ``map_batches``.

    ``idf_ref``: optional ``ray.put`` handle to a
    :class:`..functions.idf.IdfTable` (bigram-hash → idf weight) —
    fetched once per actor in ``__init__`` (broadcast, never re-shipped
    per batch).  Used by the short-doc gate: IDF-weighted bigram
    Jaccard/cosine discounts shared boilerplate framing, which
    otherwise gives DIFFERENT short docs bigram-J up to ~0.3 (measured)
    — the precision-preserving weighting, fed from a corpus sample by
    ``pipelines.entity_resolution``."""

    def __init__(
        self,
        cfg: ERConfig = DEFAULT_CONFIG,
        idf_ref=None,
        feats_ref=None,
        rid_output: bool = False,
    ):
        self.cfg = cfg
        self.idf = ray.get(idf_ref) if idf_ref is not None else None
        # broadcast-feature mode: {url: (shingles, shingles2, mh8)} —
        # present when the pair stream is slim (no feature columns)
        self.feats = ray.get(feats_ref) if feats_ref is not None else None
        # rid_output (store mode only): emit store ROW IDS instead of
        # url/slug strings — the downstream dedupe exchange moves
        # ~30 B/row instead of ~230 B; `string_score_stage(feats_ref=…)`
        # restores the identity columns after the dedupe
        self.rid_output = rid_output
        if rid_output and feats_ref is None:
            raise ValueError("rid_output requires a FeatureStore (feats_ref)")

    def _features(self, batch: pd.DataFrame):
        """(sh_a, sh_b, sh2_a, sh2_b, sig_a, sig_b, idx_a, idx_b) from
        the batch's payload columns or from the broadcast feature table
        (idx_* are store row ids, None in payload mode)."""
        n = len(batch)
        if self.feats is None:
            sh_a = batch["shingles_a"].to_numpy()
            sh_b = batch["shingles_b"].to_numpy()
            sh2_a = batch["shingles2_a"].to_numpy()
            sh2_b = batch["shingles2_b"].to_numpy()
            sig_a = np.stack([_u8(s) for s in batch["mh8_a"]])
            sig_b = np.stack([_u8(s) for s in batch["mh8_b"]])
            return sh_a, sh_b, sh2_a, sh2_b, sig_a, sig_b, None, None
        f = self.feats  # FeatureStore: zero-copy views, vectorized rows()
        cols = []
        for side in ("url_a", "url_b"):
            idx = f.rows(batch[side].to_numpy())
            sig = f.mh8[idx]
            sh = np.empty(n, object)
            sh2 = np.empty(n, object)
            for k, i in enumerate(idx):
                sh[k] = f.shingles(i)
                sh2[k] = f.shingles2(i)
            cols.append((sh, sh2, sig, idx))
        (sh_a, sh2_a, sig_a, idx_a), (sh_b, sh2_b, sig_b, idx_b) = cols
        return sh_a, sh_b, sh2_a, sh2_b, sig_a, sig_b, idx_a, idx_b

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        cfg = self.cfg
        n = len(batch)
        if n == 0:
            return _empty_slim_rid() if self.rid_output else _empty_slim()
        jac = np.zeros(n)
        cos = np.zeros(n)
        sh_a, sh_b, sh2_a, sh2_b, sig_a, sig_b, idx_a, idx_b = self._features(batch)
        # cache keys: store row ids (cheap int hashing) when available,
        # else the url strings
        if idx_a is not None:
            urls_a, urls_b = idx_a, idx_b
        else:
            urls_a = batch["url_a"].to_numpy()
            urls_b = batch["url_b"].to_numpy()
        # MinHash pre-gate: one vectorized (n, num_perm) signature
        # comparison estimates Jaccard for the WHOLE batch; only pairs
        # whose estimate clears (min_jaccard - est_gate_margin) pay the
        # exact per-pair set intersection.  σ(est) = sqrt(j(1-j)/64) ≈
        # 0.06, so the margin makes a false drop of a true borderline
        # pair < 0.5%; junk pairs (the vast majority) skip the loop.
        est = (sig_a == sig_b).mean(axis=1)
        exact = est >= (cfg.min_jaccard - cfg.est_gate_margin)
        jac[:] = est  # below-gate pairs keep the estimate (floored later)
        # per-URL cache: a record appears in many pairs (cross-block dup
        # factor ~2.4 × two sides), so array conversion amortizes per
        # unique record, not per pair (profiled: ~40% of gate wall was
        # per-pair conversions + intersect1d's concatenate-argsort)
        su_cache: dict = {}

        def _set_of(u, obj):
            v = su_cache.get(u)
            if v is None:
                v = _u32(obj)
                su_cache[u] = v
            return v

        for i in np.flatnonzero(exact):
            # ONE sorted-set intersection per pair feeds both metrics:
            # shingle sets are np.unique output (sorted unique), so the
            # searchsorted membership count replaces intersect1d at
            # ~half the cost, and TF-cosine = |∩| / sqrt(|a||b|)
            sa = _set_of(urls_a[i], sh_a[i])
            sb = _set_of(urls_b[i], sh_b[i])
            la, lb = len(sa), len(sb)
            if la == 0 or lb == 0:
                jac[i] = 0.0
                continue
            if la > lb:
                sa, sb = sb, sa
            pos = np.searchsorted(sb, sa)
            pos[pos == len(sb)] = 0  # out-of-range probes can't match sb[0]
            inter = int((sb[pos] == sa).sum())
            union = la + lb - inter
            jac[i] = inter / union if union else 0.0
            cos[i] = inter / np.sqrt(la * lb)
        # short-doc recall path: a short doc's 3-shingle Jaccard
        # collapses under the same perturbation rate (one dropped token
        # kills 3 of ~20 shingles), so pairs failing the k=3 floor where
        # BOTH sides carry a bigram set (records under
        # cfg.short_doc_tokens) get one exact IDF-weighted
        # bigram-Jaccard check.  Order-destroyed confounders stay
        # ≤ 0.09 bigram-J and boilerplate-only overlap is discounted to
        # ~0 by the idf weights; true short pairs measure ≥ 0.25.
        gate3 = jac >= cfg.min_jaccard
        gate2 = np.zeros(n, dtype=bool)
        # weights cached per record too — len() on the raw object (list
        # or packed bytes) skips empty pairs without any conversion
        w_cache: dict = {}

        def _weighted(u, obj):
            v = w_cache.get(u)
            if v is None:
                sa = _u32(obj)
                if self.idf is not None:
                    wa = self.idf.weights(sa)
                else:
                    wa = np.ones(len(sa))
                v = (sa, wa, float(wa.sum()))
                w_cache[u] = v
            return v

        for i in np.flatnonzero(~gate3):
            if len(sh2_a[i]) == 0 or len(sh2_b[i]) == 0:
                continue
            sa, wa, swa = _weighted(urls_a[i], sh2_a[i])
            sb, wb, swb = _weighted(urls_b[i], sh2_b[i])
            pos = np.searchsorted(sb, sa)
            pos[pos == len(sb)] = 0
            member = sb[pos] == sa
            wi = float(wa[member].sum())
            union_w = swa + swb - wi
            j2 = wi / union_w if union_w > 0 else 0.0
            if j2 >= cfg.min_jaccard2:
                gate2[i] = True
                jac[i] = j2
                cos[i] = wi / np.sqrt(swa * swb) if swa and swb else 0.0
        gate = gate3 | gate2
        if self.rid_output:
            return pd.DataFrame(
                {
                    "ra": idx_a[gate].astype(np.int64),
                    "rb": idx_b[gate].astype(np.int64),
                    "jaccard": jac[gate],
                    "cosine": cos[gate],
                    "block_n": batch["block_n"].to_numpy()[gate],
                }
            )
        sub = batch[gate]
        return pd.DataFrame(
            {
                "url_a": sub["url_a"].to_numpy(),
                "url_b": sub["url_b"].to_numpy(),
                "slug_a": sub["slug_a"].to_numpy(),
                "slug_b": sub["slug_b"].to_numpy(),
                "jaccard": jac[gate],
                "cosine": cos[gate],
                "block_n": sub["block_n"].to_numpy(),
            }
        )


def score_pairs_stage(
    pairs,
    cfg: ERConfig = DEFAULT_CONFIG,
    idf_ref=None,
    feats_ref=None,
    dedupe: bool = True,
    rid_output: bool = False,
):
    """Stage 1 (+ dedupe): gated slim pairs, exactly once each.

    Runs as a TASK stage, not an actor pool: the gate's only state is
    the broadcast IdfTable, and ``ray.get`` of a plasma-resident object
    is ~free after the first touch per worker — while an actor pool
    pays a fresh process spawn + import per pipeline run (measured
    seconds of ramp-up on every execution).  Actor pools stay the right
    shape for HEAVY per-worker state (model weights, big indexes);
    a broadcast lookup table is not that.

    ``dedupe=False``: the caller already deduplicated the pair stream
    (the broadcast-feature plan dedupes slim candidates BEFORE gating —
    cheap there, and it cuts the gate's work by the ×17 true-pair dup
    factor)."""
    kw = {}
    if cfg.scorer_batch_size is not None:
        kw["batch_size"] = cfg.scorer_batch_size

    def _gate(batch: pd.DataFrame) -> pd.DataFrame:
        return PairFeatureGate(cfg, idf_ref, feats_ref, rid_output)(batch)

    gated = pairs.map_batches(_gate, batch_format="pandas", **kw)
    if not dedupe:
        return gated
    from ..ops.relational import dedupe_by_key

    keys = ["ra", "rb"] if rid_output else ["url_a", "url_b"]
    return dedupe_by_key(gated, keys, partitions=cfg.pair_dedup_partitions)


def string_score_stage(slim_pairs, cfg: ERConfig = DEFAULT_CONFIG, feats_ref=None):
    """Stage 2: batched string metrics on the (unique) gated pairs +
    the final weighted score.  Plain task stage — stateless and cheap
    relative to stage 1.

    ``feats_ref``: set when stage 1 ran with ``rid_output`` — the slim
    rows carry store row ids; urls and slugs are restored here from the
    store's zero-copy bytes columns (after the dedupe exchange, so the
    strings never cross a shuffle)."""

    def _fn(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if n == 0:
            return pd.DataFrame(
                {
                    c: pd.Series(dtype=t)
                    for c, t in zip(
                        EDGE_COLUMNS,
                        [object, object, float, float, float, float, np.int32],
                    )
                }
            )
        if feats_ref is not None:
            f = ray.get(feats_ref)
            ra = df["ra"].to_numpy()
            rb = df["rb"].to_numpy()
            df = pd.DataFrame(
                {
                    "url_a": f.url_strs(ra),
                    "url_b": f.url_strs(rb),
                    "slug_a": f.slug_strs(ra),
                    "slug_b": f.slug_strs(rb),
                    "jaccard": df["jaccard"].to_numpy(),
                    "cosine": df["cosine"].to_numpy(),
                    "block_n": df["block_n"].to_numpy(),
                }
            )
        sl_a = df["slug_a"].to_numpy()
        sl_b = df["slug_b"].to_numpy()
        jw = 0.5 * jaro_winkler_batch(sl_a, sl_b) + 0.5 * levenshtein_sim_batch(
            sl_a, sl_b
        )
        jac = df["jaccard"].to_numpy()
        cos = df["cosine"].to_numpy()
        score = cfg.w_jaccard * jac + cfg.w_cosine * cos + cfg.w_jw * jw
        return pd.DataFrame(
            {
                "url_a": df["url_a"].to_numpy(),
                "url_b": df["url_b"].to_numpy(),
                "jaccard": jac,
                "cosine": cos,
                "jw": jw,
                "score": score,
                "block_n": df["block_n"].to_numpy(),
            }
        )

    return slim_pairs.map_batches(_fn, batch_format="pandas")


def matched_edges_stage(scored, cfg: ERConfig = DEFAULT_CONFIG):
    """Threshold to matched edges (vectorized predicate, not row filter)."""
    thr = cfg.score_threshold

    def _thr(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["score"] >= thr]

    return scored.map_batches(_thr, batch_format="pandas")
