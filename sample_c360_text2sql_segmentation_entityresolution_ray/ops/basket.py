"""Market-basket association-rule mining (Agrawal & Srikant, VLDB
1994 — the Apriori pair pass) over order/item facts.

The reference delegates item affinity to Amazon Personalize
(`lambda/create_personalize_segment/index.py`); the transparent
co-occurrence sibling lives in `pipelines/affinity.py`.  This module
mines the classic directed pair rules with support / confidence /
lift, the standard retail-analytics readout over the same facts.

Scale shape (order of passes matters — this IS Apriori):

1. distinct ``(basket, item)`` — one combiner dedup exchange;
2. item supports — one slim ``(item, count)`` combiner exchange;
3. **frequent-item prefilter** (the Apriori property: a pair can only
   reach ``min_count`` if both items do) — a semi-join membership
   filter, broadcast under the measured cap, hash-exchange above it;
4. pair generation per basket — baskets co-locate whole via ONE
   basket-key hash exchange; basket size, not corpus size, bounds the
   per-group triu sweep (orders hold ≤ a handful of items);
5. pair counts — one slim ``(a, b, count)`` combiner exchange, then
   the ``min_count`` cut;
6. metric attach — the frequent-item count table rides along
   broadcast when small, else two sequential hash joins (materialized
   between: two lazy JoinOperators in one plan can starve a small
   cluster's map stages).

Item payloads never cross an exchange; every shuffled row is ids +
counts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from .relational import distinct, grouped_aggregate, hash_join, semi_join

ITEM_BROADCAST_LIMIT = 2_000_000


def association_rules(
    facts: "ray.data.Dataset",
    basket_col: str,
    item_col: str,
    min_count: int = 3,
    partitions: int = 64,
    item_broadcast_limit: int = ITEM_BROADCAST_LIMIT,
) -> "ray.data.Dataset":
    """Directed pair rules ``(ant, cons, n_ab, support, confidence,
    lift)`` for item pairs co-occurring in ≥ ``min_count`` baskets.

    ``support = n_ab / N``, ``confidence = n_ab / n_ant``,
    ``lift = n_ab · N / (n_ant · n_cons)`` with ``N`` = number of
    distinct baskets (Agrawal-Srikant definitions).  Both directions
    of each unordered pair are emitted; metrics are unrounded.
    """
    b = distinct(
        facts.select_columns([basket_col, item_col]), [basket_col, item_col]
    ).materialize()  # consumed three times (N, item counts, pair gen)

    n_baskets = float(distinct(b, [basket_col]).count())

    item_counts = grouped_aggregate(
        b.map_batches(
            lambda d: pd.DataFrame(
                {item_col: d[item_col], "n_i": np.int64(1)}
            ),
            batch_format="pandas",
        ),
        keys=[item_col],
        specs=[("sum", "n_i", "n_i")],
    ).materialize()

    frequent = item_counts.filter(
        expr=f"n_i >= {int(min_count)}"
    ).materialize()

    kept = semi_join(b, frequent, on=item_col)

    def _tag(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_part"] = (
            pd.util.hash_pandas_object(batch[basket_col], index=False)
            .to_numpy()
            % partitions
        ).astype("int32")
        return batch

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, blk in g.groupby(basket_col, sort=False):
            items = np.sort(blk[item_col].to_numpy())
            if len(items) < 2:
                continue
            ia, ib = np.triu_indices(len(items), k=1)
            out_a.append(items[ia])
            out_b.append(items[ib])
        if not out_a:
            return pd.DataFrame(
                {
                    "ant": np.empty(0, np.int64),
                    "cons": np.empty(0, np.int64),
                    "n_ab": np.empty(0, np.int64),
                }
            )
        df = pd.DataFrame(
            {"ant": np.concatenate(out_a), "cons": np.concatenate(out_b)}
        )
        df = (
            df.groupby(["ant", "cons"], sort=False)
            .size()
            .rename("n_ab")
            .reset_index()
        )
        df["n_ab"] = df["n_ab"].astype(np.int64)
        return df

    pair_counts = grouped_aggregate(
        kept.map_batches(_tag, batch_format="pandas")
        .groupby("_part")
        .map_groups(_pairs, batch_format="pandas"),
        keys=["ant", "cons"],
        specs=[("sum", "n_ab", "n_ab")],
    ).filter(expr=f"n_ab >= {int(min_count)}")

    def _both_dirs(batch: pd.DataFrame) -> pd.DataFrame:
        fwd = batch[["ant", "cons", "n_ab"]]
        rev = batch.rename(columns={"ant": "cons", "cons": "ant"})[
            ["ant", "cons", "n_ab"]
        ]
        return pd.concat([fwd, rev], ignore_index=True)

    directed = pair_counts.map_batches(_both_dirs, batch_format="pandas")

    def _metrics(batch: pd.DataFrame) -> pd.DataFrame:
        n_ab = batch["n_ab"].to_numpy(np.float64)
        n_a = batch["n_a"].to_numpy(np.float64)
        n_c = batch["n_c"].to_numpy(np.float64)
        return pd.DataFrame(
            {
                "ant": batch["ant"].to_numpy(),
                "cons": batch["cons"].to_numpy(),
                "n_ab": batch["n_ab"].to_numpy(),
                "support": n_ab / n_baskets,
                "confidence": n_ab / n_a,
                "lift": n_ab * n_baskets / (n_a * n_c),
            }
        )

    if frequent.count() <= item_broadcast_limit:
        fdf = frequent.to_pandas()
        ref = ray.put(
            dict(zip(fdf[item_col].tolist(), fdf["n_i"].tolist()))
        )

        def _attach(batch: pd.DataFrame) -> pd.DataFrame:
            counts = ray.get(ref)
            batch = batch.copy()
            batch["n_a"] = batch["ant"].map(counts).astype(np.int64)
            batch["n_c"] = batch["cons"].map(counts).astype(np.int64)
            return _metrics(batch)

        return directed.map_batches(_attach, batch_format="pandas")

    with_a = hash_join(
        directed,
        frequent.map_batches(
            lambda d: d.rename(columns={item_col: "ant", "n_i": "n_a"}),
            batch_format="pandas",
        ),
        on=["ant"],
    ).materialize()
    joined = hash_join(
        with_a,
        frequent.map_batches(
            lambda d: d.rename(columns={item_col: "cons", "n_i": "n_c"}),
            batch_format="pandas",
        ),
        on=["cons"],
    )
    return joined.map_batches(_metrics, batch_format="pandas")
