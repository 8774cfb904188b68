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

from ..functions.strings import jaro_winkler_batch
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
) -> "ray.data.Dataset":
    """Best fuzzy master match per probe row.

    Output: ``(probe_id, probe_name, master_id, master_name, score)``
    for probes whose best candidate scores ≥ ``threshold``; ties break
    by master id ascending.  ``score`` is unrounded — callers round for
    display/oracle comparison.
    """
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
                scores = jaro_winkler_batch(rep_p, til_m).reshape(
                    len(idx), m
                )
                # best by (score desc, master_id asc): cand is sorted by
                # id, argmax returns the FIRST maximum
                best = scores.argmax(axis=1)
                best_s = scores[np.arange(len(idx)), best]
                keep = best_s >= threshold
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
                    "score": pd.Series(dtype=np.float64),
                }
            )
        return pd.DataFrame(
            {
                probe_id: np.concatenate(out_pid),
                probe_name: np.concatenate(out_pname),
                master_id: np.concatenate(out_mid),
                master_name: np.concatenate(out_mname),
                "score": np.concatenate(out_score),
            }
        )

    return probes.select_columns([probe_id, probe_name]).map_batches(
        _score, batch_format="pandas"
    )


__all__ = ["lookup_link"]
