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


__all__ = ["lookup_link", "snm_pairs"]
