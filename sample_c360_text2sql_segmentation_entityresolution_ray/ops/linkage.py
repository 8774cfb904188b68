"""Two-table fuzzy record linkage: link a dirty probe stream to its
best match in a canonical master table.

The reference's ER service supports exactly this mode — matching
incoming records against an existing resolved set (SURVEY §2 ST1/J5;
the self-match flagship lives in `pipelines/entity_resolution.py`).
Here the master side is dimension-sized (the resolved entity list), so
the plan is broadcast-probe, not a pair shuffle:

- master broadcast ONCE via ``ray.put``, pre-grouped by block key;
- each probe batch scores only its block's candidates with the
  vectorized Jaro-Winkler kernel (`functions/strings.py` — bit-exact
  vs DuckDB ``jaro_winkler_similarity``, which is what makes this the
  rare fuzzy operator with a value-hash SQL oracle);
- best match per probe by (score desc, master id asc), kept at
  ``threshold``.

Above ``BROADCAST_ROW_LIMIT`` master rows this is the wrong op — use
the self-ER pipeline's blocking + pair shuffle (union the tables with a
source tag); the guard raises with that pointer rather than silently
shuffling.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from ..functions.strings import jaro_winkler_batch, levenshtein_batch
from .relational import BROADCAST_ROW_LIMIT


def _block_suffix(s: pd.Series, n: int) -> pd.Series:
    """Last ``n`` chars — digit-tail blocking for id-like names (the
    SQL-reproducible ``right(x, n)``)."""
    return s.str.slice(-n)


def lookup_link(
    probes: "ray.data.Dataset",
    master: "ray.data.Dataset",
    probe_id: str,
    probe_name: str,
    master_id: str,
    master_name: str,
    threshold: float = 0.9,
    block_suffix: int = 2,
    metric: str = "jaro_winkler",
) -> "ray.data.Dataset":
    """Best fuzzy master match per probe row.

    ``metric="jaro_winkler"`` (default): best = HIGHEST similarity,
    kept when ≥ ``threshold``; output ``(probe_id, probe_name,
    master_id, master_name, score)`` with ``score`` unrounded.
    ``metric="levenshtein"``: best = LOWEST edit distance, kept when
    ≤ ``threshold``; the score column is ``dist`` (int64), bit-exact
    vs SQL ``levenshtein()``.  Ties break by master id ascending in
    both directions (candidates are id-sorted; arg-extremum returns
    the first).
    """
    if metric not in ("jaro_winkler", "levenshtein"):
        raise ValueError(f"unknown metric {metric!r}")
    minimize = metric == "levenshtein"
    score_col = "dist" if minimize else "score"
    mdf = master.select_columns([master_id, master_name]).to_pandas()
    if len(mdf) > BROADCAST_ROW_LIMIT:
        raise ValueError(
            f"master has {len(mdf)} rows > {BROADCAST_ROW_LIMIT}: "
            "lookup_link is the fact⋈dim linkage plan — for big-big "
            "fuzzy matching union the tables with a source tag and run "
            "the ER blocking pipeline"
        )
    mdf = mdf.sort_values(master_id, kind="mergesort").reset_index(drop=True)
    mdf["_blk"] = _block_suffix(mdf[master_name].astype(str), block_suffix)
    blocks = {
        k: (
            g[master_id].to_numpy(),
            g[master_name].to_numpy(object),
        )
        for k, g in mdf.groupby("_blk", sort=False)
    }
    ref = ray.put(blocks)

    def _score(batch: pd.DataFrame) -> pd.DataFrame:
        blk_map = ray.get(ref)
        names = batch[probe_name].astype(str)
        blks = _block_suffix(names, block_suffix).to_numpy(object)
        pids = batch[probe_id].to_numpy()
        pnames = names.to_numpy(object)
        out_pid, out_pname, out_mid, out_mname, out_score = [], [], [], [], []
        # group probe rows by block, score each group against its
        # candidate array in ONE vectorized kernel call
        order = np.argsort(blks, kind="stable")
        i = 0
        while i < len(order):
            j = i
            b = blks[order[i]]
            while j < len(order) and blks[order[j]] == b:
                j += 1
            cand = blk_map.get(b)
            if cand is not None:
                idx = order[i:j]
                cid, cname = cand
                m = len(cid)
                rep_p = np.repeat(pnames[idx], m)
                til_m = np.tile(cname, len(idx))
                kernel = levenshtein_batch if minimize else jaro_winkler_batch
                scores = kernel(rep_p, til_m).reshape(len(idx), m)
                # best by (extremum, master_id asc): cand is sorted by
                # id, arg-extremum returns the FIRST one
                best = scores.argmin(axis=1) if minimize else scores.argmax(axis=1)
                best_s = scores[np.arange(len(idx)), best]
                keep = best_s <= threshold if minimize else best_s >= threshold
                out_pid.append(pids[idx][keep])
                out_pname.append(pnames[idx][keep])
                out_mid.append(cid[best][keep])
                out_mname.append(cname[best][keep])
                out_score.append(best_s[keep])
            i = j
        if not out_pid:
            return pd.DataFrame(
                {
                    probe_id: pd.Series(dtype=batch[probe_id].dtype),
                    probe_name: pd.Series(dtype=object),
                    master_id: pd.Series(dtype=mdf[master_id].dtype),
                    master_name: pd.Series(dtype=object),
                    score_col: pd.Series(
                        dtype=np.int64 if minimize else np.float64
                    ),
                }
            )
        return pd.DataFrame(
            {
                probe_id: np.concatenate(out_pid),
                probe_name: np.concatenate(out_pname),
                master_id: np.concatenate(out_mid),
                master_name: np.concatenate(out_mname),
                score_col: np.concatenate(out_score),
            }
        )

    return probes.select_columns([probe_id, probe_name]).map_batches(
        _score, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# Sorted-neighborhood blocking (Hernández & Stolfo, SIGMOD 1995)
# ---------------------------------------------------------------------------


def snm_pairs(
    records: "ray.data.Dataset",
    key_col: str,
    id_col: str,
    window: int = 5,
    payload_cols: tuple = (),
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Sorted-neighborhood candidate pairs: every ``(a, b)`` whose
    positions in the global ``(key_col, id_col)``-ascending order differ
    by less than ``window`` — the classic SNM blocking pass, EXACTLY
    (``row_number``-defined, so SQL-oracle-checkable).

    Distributed plan — no global sort barrier, no reliance on Ray block
    order: records land in RANGE buckets (bounded per-block key sample
    → cuts), bucket counts cross one slim combiner shuffle, and the
    driver computes from the O(#buckets) count vector which buckets
    must RECEIVE each bucket's tail rows (walking back over empty
    buckets) so that every bucket's group is a contiguous slice of the
    global order covering its natives' ``window - 1`` predecessors.
    Two group-by-bucket exchanges of slim (id, key, payload) rows;
    a pair is emitted in the one bucket where its LATER element is
    native, so no dedup pass is needed.

    Output: ``(id_a, id_b, <payload>_a, <payload>_b, ...)`` with
    ``id_a`` earlier in sort order.  Feed to a similarity kernel (e.g.
    ``jaro_winkler_batch``) for the match decision — SNM is the
    blocking half of the reference ER service's matching flow
    (`lib/entity-resolution-service.ts:140-183`), re-expressed as the
    textbook sorted-neighborhood alternative to key blocking.
    """
    from .order import bucketize, grouped_aggregate, sample_boundaries

    if window < 2:
        raise ValueError("window must be ≥ 2")
    payload_cols = tuple(payload_cols)
    cols = [id_col, key_col, *payload_cols]

    slim = records.select_columns(cols)
    cuts = sample_boundaries(slim, key_col, num_buckets)
    tagged = bucketize(slim, key_col, cuts).materialize()

    counts = (
        grouped_aggregate(
            tagged.select_columns(["_b"]), ["_b"], [("count_star", None, "_n")]
        )
        .to_pandas()
        .sort_values("_b")
    )
    bs = counts["_b"].to_numpy()
    ns = counts["_n"].to_numpy()
    carries: dict = {}
    for i in range(len(bs)):
        remaining = window - 1
        j = i - 1
        while j >= 0 and remaining > 0:
            take = int(min(remaining, ns[j]))
            carries.setdefault(int(bs[j]), []).append((int(bs[i]), take))
            remaining -= take
            j -= 1
    cmap_ref = ray.put(carries)

    def _emit(g: pd.DataFrame) -> pd.DataFrame:
        cmap = ray.get(cmap_ref)
        b = int(g["_b"].iloc[0])
        srt = g.sort_values([key_col, id_col], kind="mergesort").reset_index(
            drop=True
        )
        base = srt.drop(columns=["_b"])
        outs = [base.assign(_dst=np.int32(b), _carry=np.int8(0))]
        for dst, k in cmap.get(b, ()):
            tail = base.iloc[len(base) - k :].copy()
            tail["_dst"] = np.int32(dst)
            tail["_carry"] = np.int8(1)
            outs.append(tail)
        return pd.concat(outs, ignore_index=True)

    routed = tagged.groupby("_b").map_groups(_emit, batch_format="pandas")

    out_cols = ["id_a", "id_b"] + [
        f"{c}_{s}" for c in payload_cols for s in ("a", "b")
    ]

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        srt = g.sort_values([key_col, id_col], kind="mergesort").reset_index(
            drop=True
        )
        ids = srt[id_col].to_numpy()
        native = srt["_carry"].to_numpy() == 0
        pay = {c: srt[c].to_numpy(object) for c in payload_cols}
        n = len(srt)
        acc: dict = {c: [] for c in out_cols}
        for delta in range(1, window):
            if n <= delta:
                break
            a_idx = np.arange(0, n - delta)
            b_idx = a_idx + delta
            keep = native[b_idx]
            a_idx, b_idx = a_idx[keep], b_idx[keep]
            acc["id_a"].append(ids[a_idx])
            acc["id_b"].append(ids[b_idx])
            for c in payload_cols:
                acc[f"{c}_a"].append(pay[c][a_idx])
                acc[f"{c}_b"].append(pay[c][b_idx])
        if not acc["id_a"]:
            return pd.DataFrame(
                {
                    "id_a": pd.Series(dtype=srt[id_col].dtype),
                    "id_b": pd.Series(dtype=srt[id_col].dtype),
                    **{
                        f"{c}_{s}": pd.Series(dtype=object)
                        for c in payload_cols
                        for s in ("a", "b")
                    },
                }
            )
        return pd.DataFrame(
            {c: np.concatenate(acc[c]) for c in out_cols}
        )

    return routed.groupby("_dst").map_groups(_pairs, batch_format="pandas")


# ---------------------------------------------------------------------------
# Fellegi–Sunter probabilistic linkage (JASA 1969)
# ---------------------------------------------------------------------------

# the reference ER service's ML_MATCHING field set
# (`lib/entity-resolution-service.ts:54-183`)
FS_FIELDS = ("email", "firstname", "lastname", "gender", "age", "created_at")

# clamp bounds: m = 1 (every labeled pair agrees) or u = 0 (no value
# co-occurs across sources) would send a log-weight to ±inf; the clamps
# keep weights finite and are mirrored verbatim in the SQL oracle
FS_M_CLAMP = 1e-6
FS_U_CLAMP = 1e-9


def fs_field_weights(
    main: "ray.data.Dataset",
    sub: "ray.data.Dataset",
    truth: "ray.data.Dataset",
    fields: tuple = FS_FIELDS,
    main_id: str = "customer_id",
    sub_id: str = "customer_id",
    truth_main: str = "main_customer_id",
    truth_sub: str = "subbrand_customer_id",
) -> pd.DataFrame:
    """Fellegi–Sunter m/u probabilities and log₂ agreement weights per
    field, estimated from a labeled truth set — the probabilistic-
    record-linkage analog of the reference's ML_MATCHING training
    (`lib/entity-resolution-service.ts:54-183` maps the same six
    fields into the managed matching model).

    - ``m_f`` = P(field f agrees | true match): truth pairs joined to
      both masters, per-field agreement rate.
    - ``u_f`` = P(field f agrees | random cross pair)
      = Σ_v freq_main(v)·freq_sub(v) / (N_main·N_sub): the value-
      frequency birthday estimate, no pair enumeration.

    Distributed plan — nothing pair-shaped is ever built:
    - u: both masters melt to slim ``(field, val, is_main)`` rows; ONE
      combiner ``grouped_aggregate`` on (field, val) counts both sides,
      a second O(#fields) pass sums the frequency products.  Only
      (field, value, count) partials cross the shuffle; at corpus scale
      this is the same slim-exchange shape as the token-census ops.
    - m: the truth stream (|matches| rows) hash-joins to each master on
      its id — the masters never shuffle more than the matched subset.
    - the ≤ |fields| result rows collect to the driver (bounded).

    Returns a driver-side DataFrame ``(field, m, u, agree_weight,
    disagree_weight)`` ordered as ``fields`` — small by construction
    (one row per field), consumed as a broadcast closure by
    :func:`fs_score_pairs`."""
    from .relational import grouped_aggregate, hash_join

    fields = tuple(fields)
    n_main = main.count()
    n_sub = sub.count()

    def _melt(is_main: int):
        def _fn(df: pd.DataFrame) -> pd.DataFrame:
            parts = []
            for f in fields:
                parts.append(
                    pd.DataFrame(
                        {
                            "field": f,
                            "val": df[f].astype(str),
                            "is_m": np.int64(is_main),
                            "is_s": np.int64(1 - is_main),
                        }
                    )
                )
            return pd.concat(parts, ignore_index=True)

        return _fn

    melted = main.select_columns(list(fields)).map_batches(
        _melt(1), batch_format="pandas"
    ).union(
        sub.select_columns(list(fields)).map_batches(
            _melt(0), batch_format="pandas"
        )
    )
    vc = grouped_aggregate(
        melted,
        ["field", "val"],
        [("sum", "is_m", "cm"), ("sum", "is_s", "cs")],
    )

    def _prod(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"field": df["field"], "prod": df["cm"] * df["cs"]}
        )

    u_rows = grouped_aggregate(
        vc.map_batches(_prod, batch_format="pandas"),
        ["field"],
        [("sum", "prod", "sum_prod")],
    ).to_pandas()
    u_by_field = {
        r["field"]: r["sum_prod"] / (float(n_main) * float(n_sub))
        for _, r in u_rows.iterrows()
    }

    ren_m = {f: f"{f}_m" for f in fields}
    ren_s = {f: f"{f}_s" for f in fields}
    main_r = main.select_columns([main_id, *fields]).rename_columns(
        {main_id: "_mid", **ren_m}
    )
    sub_r = sub.select_columns([sub_id, *fields]).rename_columns(
        {sub_id: "_sid", **ren_s}
    )
    # truth (|matches| rows) is the SMALL side relative to the masters:
    # broadcast it and probe each master stream — the masters never
    # shuffle.  Above the broadcast cap, fall back to two sequential
    # hash joins with a materialize() between them: two lazily-nested
    # JoinOperators would spawn both aggregator pools at once and can
    # starve a small cluster's map tasks (observed deadlock at 8 cpus).
    from .relational import broadcast_join

    if truth.count() <= BROADCAST_ROW_LIMIT:
        p1 = broadcast_join(main_r, truth, on=["_mid"], right_on=[truth_main])
        pairs = broadcast_join(sub_r, p1, on=["_sid"], right_on=[truth_sub])
    else:
        p1 = hash_join(
            truth, main_r, on=[truth_main], right_on=["_mid"]
        ).materialize()
        pairs = hash_join(p1, sub_r, on=[truth_sub], right_on=["_sid"])

    def _agree(df: pd.DataFrame) -> pd.DataFrame:
        out = {"_g": [np.int64(0)], "n": [np.int64(len(df))]}
        for f in fields:
            out[f"ag_{f}"] = [
                np.int64(
                    (df[f"{f}_m"].astype(str) == df[f"{f}_s"].astype(str)).sum()
                )
            ]
        return pd.DataFrame(out)

    ag = (
        grouped_aggregate(
            pairs.map_batches(_agree, batch_format="pandas"),
            ["_g"],
            [("sum", "n", "n")]
            + [("sum", f"ag_{f}", f"ag_{f}") for f in fields],
        )
        .to_pandas()
        .iloc[0]
    )
    n_truth = float(ag["n"])

    rows = []
    for f in fields:
        m = float(ag[f"ag_{f}"]) / n_truth
        u = float(u_by_field[f])
        m_c = min(max(m, FS_M_CLAMP), 1.0 - FS_M_CLAMP)
        u_c = min(max(u, FS_U_CLAMP), 1.0 - FS_U_CLAMP)
        rows.append(
            {
                "field": f,
                "m": m,
                "u": u,
                "agree_weight": np.log2(m_c / u_c),
                "disagree_weight": np.log2((1.0 - m_c) / (1.0 - u_c)),
            }
        )
    return pd.DataFrame(rows)


def _blocked_pairs(
    main: "ray.data.Dataset",
    sub: "ray.data.Dataset",
    block: tuple,
    fields: tuple,
    main_id: str,
    sub_id: str,
) -> "ray.data.Dataset":
    """Candidate cross pairs sharing the block key: ONE hash equi-join
    (the blocking shuffle — the only pair-shaped exchange in the FS
    family), fields suffixed ``_m`` / ``_s``."""
    from .relational import hash_join

    ren_m = {f: f"{f}_m" for f in fields}
    ren_s = {f: f"{f}_s" for f in fields}
    main_r = main.select_columns([main_id, *fields]).rename_columns(
        {main_id: "main_customer_id", **ren_m}
    )
    sub_r = sub.select_columns([sub_id, *fields]).rename_columns(
        {sub_id: "subbrand_customer_id", **ren_s}
    )
    return hash_join(
        main_r,
        sub_r,
        on=[f"{f}_m" for f in block],
        right_on=[f"{f}_s" for f in block],
    )


def fs_score_pairs(
    main: "ray.data.Dataset",
    sub: "ray.data.Dataset",
    weights: pd.DataFrame,
    block: tuple = ("lastname", "gender"),
    fields: tuple = FS_FIELDS,
    main_id: str = "customer_id",
    sub_id: str = "customer_id",
    min_score: float = 0.0,
) -> "ray.data.Dataset":
    """Score every blocked cross pair with the Fellegi–Sunter log₂
    likelihood ratio: Σ over ``fields`` of ``agree_weight`` where the
    pair agrees, ``disagree_weight`` where it disagrees; keep pairs
    with ``score > min_score``.

    One hash equi-join on the block key generates the candidate
    stream (the blocking shuffle — the only pair-shaped exchange);
    scoring is a stateless vectorized map over the joined batches with
    the ≤ |fields| weight rows carried in the closure.  Block fields
    (always-agree inside a block) contribute their agree weight as a
    constant.  Output: ``(main_customer_id, subbrand_customer_id,
    n_agree, score)``."""
    from .relational import hash_join

    fields = tuple(fields)
    block = tuple(block)
    w = {
        r["field"]: (float(r["agree_weight"]), float(r["disagree_weight"]))
        for _, r in weights.iterrows()
    }
    free = [f for f in fields if f not in block]

    joined = _blocked_pairs(main, sub, block, fields, main_id, sub_id)
    base = float(sum(w[f][0] for f in block))
    n_block = len(block)

    def _score(df: pd.DataFrame) -> pd.DataFrame:
        score = np.full(len(df), base)
        n_agree = np.full(len(df), n_block, dtype=np.int64)
        # fixed field order keeps the float sum order identical to the
        # oracle's left-associative `+` chain (bit-equal before round)
        for f in free:
            ag = (
                df[f"{f}_m"].astype(str).to_numpy()
                == df[f"{f}_s"].astype(str).to_numpy()
            )
            score = score + np.where(ag, w[f][0], w[f][1])
            n_agree += ag.astype(np.int64)
        out = pd.DataFrame(
            {
                "main_customer_id": df["main_customer_id"],
                "subbrand_customer_id": df["subbrand_customer_id"],
                "n_agree": n_agree,
                "score": score,
            }
        )
        return out[out["score"] > min_score]

    return joined.map_batches(_score, batch_format="pandas")


def fs_mutual_best(
    main: "ray.data.Dataset",
    sub: "ray.data.Dataset",
    weights: pd.DataFrame,
    block: tuple = ("lastname", "gender"),
    fields: tuple = FS_FIELDS,
    main_id: str = "customer_id",
    sub_id: str = "customer_id",
) -> "ray.data.Dataset":
    """Reciprocal best-match linkage: keep the blocked pairs where each
    side is the other's HIGHEST-scoring candidate (ties → smaller
    counterpart id) — the classic one-to-one disambiguation pass after
    probabilistic scoring (the reference ER service emits one MatchID
    per record, i.e. exactly this 1:1 shape).

    Plan: score ALL blocked pairs (:func:`fs_score_pairs`, no
    threshold), take per-main and per-sub argmax via two row_number
    windows (each one hash exchange of the slim scored stream), then
    one equi-join of the two O(#records) best tables on the pair key.
    Output: ``(main_customer_id, subbrand_customer_id, score)``."""
    from .relational import hash_join
    from .window import window

    # materialize: scored feeds two windows AND the final join — left
    # lazy, the blocking JoinOperator would execute twice and its
    # aggregator pool would coexist with the final join's (the nested-
    # join starvation this module's fs_field_weights documents)
    scored = (
        fs_score_pairs(
            main, sub, weights, block, fields, main_id, sub_id,
            min_score=float("-inf"),
        )
        .drop_columns(["n_agree"])
        .materialize()
    )
    b1 = window(
        scored,
        ["main_customer_id"],
        [("score", True), ("subbrand_customer_id", False)],
        {"rk": ("row_number",)},
    ).filter(expr="rk == 1").drop_columns(["rk"])
    b2 = window(
        scored,
        ["subbrand_customer_id"],
        [("score", True), ("main_customer_id", False)],
        {"rk": ("row_number",)},
    ).filter(expr="rk == 1").drop_columns(["rk", "score"])
    return hash_join(
        b1, b2, on=["main_customer_id", "subbrand_customer_id"]
    )


def fs_pattern_census(
    main: "ray.data.Dataset",
    sub: "ray.data.Dataset",
    block: tuple = ("lastname", "gender"),
    fields: tuple = FS_FIELDS,
    main_id: str = "customer_id",
    sub_id: str = "customer_id",
) -> "ray.data.Dataset":
    """Agreement-pattern census over the blocked pair space: one row
    per distinct agreement bit-vector (char i = does field i agree),
    with its pair count — the sufficient statistic the Fellegi–Sunter
    EM fit (:func:`fs_em`) trains on, and the table a clerical-review
    design reads (which patterns are ambiguous, and how many pairs
    carry each).

    The blocking join is the only pair-shaped exchange; pattern
    strings ride a slim (pattern, partial-count) combiner shuffle —
    at most 2^|fields| distinct rows survive."""
    from .relational import grouped_aggregate

    fields = tuple(fields)
    block = tuple(block)
    free = [f for f in fields if f not in block]
    joined = _blocked_pairs(main, sub, block, fields, main_id, sub_id)

    def _pattern(df: pd.DataFrame) -> pd.DataFrame:
        bits = {}
        for f in fields:
            if f in block:
                # equality is the join predicate — always '1'
                bits[f] = np.full(len(df), "1", dtype=object)
            else:
                ag = (
                    df[f"{f}_m"].astype(str).to_numpy()
                    == df[f"{f}_s"].astype(str).to_numpy()
                )
                bits[f] = np.where(ag, "1", "0")
        pat = bits[fields[0]]
        for f in fields[1:]:
            pat = np.char.add(pat.astype(str), bits[f].astype(str))
        return pd.DataFrame({"pattern": pat})

    return grouped_aggregate(
        joined.map_batches(_pattern, batch_format="pandas"),
        ["pattern"],
        [("count_star", None, "n_pairs")],
    )


def fs_em(
    main: "ray.data.Dataset",
    sub: "ray.data.Dataset",
    block: tuple = ("lastname", "gender"),
    fields: tuple = FS_FIELDS,
    iters: int = 3,
    p0: float = 0.1,
    m0: float = 0.9,
    u0: float = 0.1,
    main_id: str = "customer_id",
    sub_id: str = "customer_id",
) -> pd.DataFrame:
    """Unsupervised Fellegi–Sunter parameter fit: ``iters`` EM updates
    (Winkler 1988) of the per-field (m, u) probabilities and the match
    prior p, trained on the agreement-pattern census — NO labeled
    truth needed, the unsupervised counterpart of
    :func:`fs_field_weights`.

    E-step per pattern j: w_j = p·Π m-terms / (p·Π m + (1−p)·Π u);
    M-step: m_f = Σ w_j n_j a_jf / Σ w_j n_j (u_f with 1−w).  The
    census is the distributed part (blocking join + combiner count);
    EM itself runs on the ≤ 2^|fields| census rows — driver-side by
    construction, independent of corpus size.  Fixed ``iters`` keeps
    the result deterministic and SQL-unrollable.

    Returns a driver DataFrame ``(field, m, u)`` after ``iters``
    updates, row order = ``fields``."""
    fields = tuple(fields)
    cen = fs_pattern_census(
        main, sub, block, fields, main_id, sub_id
    ).to_pandas()
    a = np.array(
        [[int(ch) for ch in pat] for pat in cen["pattern"]], dtype=np.float64
    )
    n = cen["n_pairs"].to_numpy(dtype=np.float64)
    F = len(fields)
    p = float(p0)
    m = np.full(F, float(m0))
    u = np.full(F, float(u0))
    for _ in range(iters):
        pm = np.prod(np.where(a == 1.0, m, 1.0 - m), axis=1)
        pu = np.prod(np.where(a == 1.0, u, 1.0 - u), axis=1)
        w = p * pm / (p * pm + (1.0 - p) * pu)
        wn = w * n
        vn = (1.0 - w) * n
        m = (wn @ a) / wn.sum()
        u = (vn @ a) / vn.sum()
        p = wn.sum() / n.sum()
    return pd.DataFrame({"field": list(fields), "m": m, "u": u})


# ---------------------------------------------------------------------------
# Blocking-scheme evaluation (reduction ratio / pair completeness)
# ---------------------------------------------------------------------------

# named, SQL-mirrorable key functions: scheme → (pandas derivation)
# "domain"  = split_part(url, '/', 3)
# "slug8"   = left(split_part(url, '/', 5), 8)
_BLOCK_SCHEMES = ("domain", "slug8")


def _scheme_key(urls: pd.Series, scheme: str) -> pd.Series:
    parts = urls.str.split("/")
    if scheme == "domain":
        return parts.str[2].fillna("")
    if scheme == "slug8":
        return parts.str[4].fillna("").str.slice(0, 8)
    raise ValueError(f"unknown blocking scheme {scheme!r}")


def blocking_quality(
    records: "ray.data.Dataset",
    truth: "ray.data.Dataset",
    url_col: str = "url",
    truth_a: str = "url_a",
    truth_b: str = "url_b",
    schemes: tuple = _BLOCK_SCHEMES,
) -> "ray.data.Dataset":
    """Blocking-scheme quality census — the two numbers every ER
    blocking design is judged by (Christen, *Data Matching* 2012 §7):

    - **reduction ratio** = 1 − Σ_blocks C(n_b, 2) / C(N, 2): how much
      of the quadratic pair space the scheme prunes;
    - **pair completeness** = fraction of labeled TRUE pairs whose two
      sides share a block key (the blocking recall bound — no scorer
      downstream can recover a pair blocking never generates).

    One row per scheme: ``(scheme, n_records, n_blocks,
    n_candidate_pairs, n_true_pairs, n_true_covered, pair_completeness,
    reduction_ratio)``.

    Distributed shape: block keys are PURE url functions, so the truth
    table never joins to the records — each side is a stateless map.
    Per scheme the records stream crosses one slim (key, count)
    combiner exchange; C(n,2) partials then sum in an O(#blocks) pass.
    Truth coverage is a stateless flag map + sum.  Nothing pair-shaped
    is ever built (the whole point of measuring blocking instead of
    running it)."""
    from .relational import grouped_aggregate

    n = records.count()
    n_true = truth.count()
    rows = []
    for scheme in schemes:
        def _keys(df: pd.DataFrame, s=scheme) -> pd.DataFrame:
            return pd.DataFrame({"k": _scheme_key(df[url_col], s)})

        kc = grouped_aggregate(
            records.select_columns([url_col]).map_batches(
                _keys, batch_format="pandas"
            ),
            ["k"],
            [("count_star", None, "c")],
        )

        def _pairs(df: pd.DataFrame) -> pd.DataFrame:
            c = df["c"].to_numpy(dtype=np.int64)
            return pd.DataFrame(
                {
                    "_g": np.zeros(1, dtype=np.int8),
                    "nb": [np.int64(len(df))],
                    "cand": [(c * (c - 1) // 2).sum()],
                }
            )

        agg = (
            grouped_aggregate(
                kc.map_batches(_pairs, batch_format="pandas"),
                ["_g"],
                [("sum", "nb", "nb"), ("sum", "cand", "cand")],
            )
            .to_pandas()
            .iloc[0]
        )

        def _cov(df: pd.DataFrame, s=scheme) -> pd.DataFrame:
            eq = (
                _scheme_key(df[truth_a], s).to_numpy()
                == _scheme_key(df[truth_b], s).to_numpy()
            )
            return pd.DataFrame(
                {"_g": np.zeros(1, dtype=np.int8),
                 "cov": [np.int64(eq.sum())]}
            )

        cov = int(
            grouped_aggregate(
                truth.select_columns([truth_a, truth_b]).map_batches(
                    _cov, batch_format="pandas"
                ),
                ["_g"],
                [("sum", "cov", "cov")],
            )
            .to_pandas()["cov"]
            .iloc[0]
        )
        cand = int(agg["cand"])
        rows.append(
            {
                "scheme": scheme,
                "n_records": np.int64(n),
                "n_blocks": np.int64(agg["nb"]),
                "n_candidate_pairs": np.int64(cand),
                "n_true_pairs": np.int64(n_true),
                "n_true_covered": np.int64(cov),
                "pair_completeness": float(cov) / float(n_true),
                "reduction_ratio": 1.0
                - float(cand) / (float(n) * (float(n) - 1.0) / 2.0),
            }
        )
    return ray.data.from_pandas(pd.DataFrame(rows))


__all__ = [
    "lookup_link",
    "snm_pairs",
    "fs_field_weights",
    "fs_score_pairs",
    "fs_pattern_census",
    "fs_em",
    "FS_FIELDS",
    "blocking_quality",
]


# ---------------------------------------------------------------------------
# meta-blocking (Papadakis et al., TKDE 2014: block purging + CBS
# edge weighting + weight-edge pruning)
# ---------------------------------------------------------------------------

def meta_blocking(
    keys: "ray.data.Dataset",
    id_col: str = "id",
    key_col: str = "bkey",
    max_block: int = 1000,
    partitions: int = 64,
) -> "ray.data.Dataset":
    """Meta-blocking over a block collection: prune a redundancy-heavy
    multi-scheme blocking graph down to its above-average edges.

    Input is the long-form block assignment ``(id, bkey)`` — one row
    per record per blocking key, multiple schemes distinguished by key
    prefix.  Three classic steps, all deterministic:

    - **block purging**: blocks with < 2 or > ``max_block`` records
      are dropped whole (oversized blocks are stop-word-like keys that
      generate quadratic comparisons with near-zero signal);
    - **edge weighting (CBS)**: each co-blocked pair's weight = the
      number of blocks it shares;
    - **weight-edge pruning (WEP)**: keep edges with
      ``cbs >= mean(cbs)`` over all surviving edges.

    Output: ``(id_a, id_b, cbs)`` with ``id_a < id_b``.

    Scale shape: block keys hash-partition ONCE (whole blocks
    co-locate, so purging needs no separate census pass — a block's
    size is known where its pairs are emitted); per-partition pandas
    groupby emits triu pairs and combines duplicate pairs locally
    before the ONE (id_a, id_b) combiner exchange; the WEP threshold
    is a two-scalar (sum, count) aggregate over the slim edge stream,
    which materializes once (it is consumed by both the mean and the
    filter).  Record payloads never enter the graph — ids only.
    """
    from .relational import grouped_aggregate

    def _tag(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[[id_col, key_col]].copy()
        batch["_part"] = (
            pd.util.hash_array(batch[key_col].astype(str).to_numpy(object))
            % partitions
        ).astype("int32")
        return batch

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, blk in g.groupby(key_col, sort=False, dropna=False):
            n = len(blk)
            if n < 2 or n > max_block:
                continue
            ids = np.sort(blk[id_col].to_numpy())
            ia, ib = np.triu_indices(n, k=1)
            out_a.append(ids[ia])
            out_b.append(ids[ib])
        if not out_a:
            return pd.DataFrame(
                {
                    "id_a": np.empty(0, np.int64),
                    "id_b": np.empty(0, np.int64),
                    "cbs": np.empty(0, np.int64),
                }
            )
        df = pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        )
        # local combine: same pair from multiple blocks in this
        # partition collapses before the shuffle
        df = (
            df.groupby(["id_a", "id_b"], sort=False)
            .size()
            .rename("cbs")
            .reset_index()
        )
        df["cbs"] = df["cbs"].astype(np.int64)
        return df

    edges = grouped_aggregate(
        keys.map_batches(_tag, batch_format="pandas")
        .groupby("_part")
        .map_groups(_pairs, batch_format="pandas"),
        keys=["id_a", "id_b"],
        specs=[("sum", "cbs", "cbs")],
    ).materialize()

    from ray.data.aggregate import Count, Sum

    stats = edges.aggregate(Sum("cbs"), Count())
    total, n_edges = stats["sum(cbs)"], stats["count()"]
    if not n_edges:
        return edges
    thr = float(total) / float(n_edges)

    def _prune(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["cbs"].to_numpy(np.float64) >= thr]

    return edges.map_batches(_prune, batch_format="pandas")
