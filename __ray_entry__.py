"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship entity-resolution pipeline on sf0.001;
``queries()`` exposes one callable per implemented operator from
SURVEY.md §2 (plus the training-data operator suite); ``oracle_sql()``
gives the DuckDB-equivalent SQL for every SQL-expressible query, with
column names matched exactly.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from sample_c360_text2sql_segmentation_entityresolution_ray.ops import (
    ann,
    dedup,
    relational as rel,
    text as textops,
)
from sample_c360_text2sql_segmentation_entityresolution_ray.ops.relational import (
    Count,
    Mean,
    Sum,
)
from sample_c360_text2sql_segmentation_entityresolution_ray.pipelines.entity_resolution import (
    resolve_entities,
)
from sample_c360_text2sql_segmentation_entityresolution_ray.sources.pages import (
    pages_dataset,
)


def _read(sf_dir: str, table: str, columns=None) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _sql_round(x: np.ndarray, nd: int = 2) -> np.ndarray:
    """DuckDB-compatible round (half away from zero, C `round` style) —
    numpy/pyarrow default half-to-even diverges on exact .xx5 values."""
    scale = 10.0**nd
    return np.trunc(x * scale + np.copysign(0.5, x)) / scale


def _round_cols(ds, cols: list[str], nd: int = 2):
    def _r(batch: pa.Table) -> pa.Table:
        for c in cols:
            rounded = _sql_round(batch[c].to_numpy(zero_copy_only=False), nd)
            batch = batch.set_column(
                batch.schema.get_field_index(c), c, pa.array(rounded, pa.float64())
            )
        return batch

    return ds.map_batches(_r, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry() -> Any:
    """Entity resolution over the synthesized pages table (sf0.001):
    extract → normalize → MinHash-LSH/domain blocking → scorer actor
    pool → label-propagation clustering → integrated_customer analog."""
    assignment, _edges = resolve_entities(
        lambda: pages_dataset("/root/testdata/sf0.001")
    )
    return assignment


# ---------------------------------------------------------------------------
# query implementations
# ---------------------------------------------------------------------------

def _q_pricing_summary(sf_dir: str):
    """TPC-H-Q1-style grouped aggregate (SURVEY A1/A4): partial
    aggregation inside the groupby shuffle, rounded after."""
    li = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def _disc(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "disc_price",
            pc.multiply(
                batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
            ),
        )

    agg = (
        li.map_batches(_disc, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Mean("l_quantity", alias_name="avg_qty"),
            Count(alias_name="count_order"),
        )
    )
    return _round_cols(agg, ["sum_qty", "sum_base_price", "sum_disc_price", "avg_qty"])


def _q_orders_customer_join(sf_dir: str):
    """Hash equi-join (SURVEY J1): orders ⋈ customer."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    return rel.hash_join(
        orders, cust, on=("o_custkey",), right_on=("c_custkey",)
    ).select_columns(["o_orderkey", "c_name", "o_totalprice"])


def _q_lineitem_part_broadcast(sf_dir: str):
    """Broadcast-small-side join (SURVEY J1 broadcast variant)."""
    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice", "l_discount"],
    )
    part = _read(sf_dir, "part", ["p_partkey", "p_name"])
    joined = rel.broadcast_join(li, part, on=["l_partkey"], right_on=["p_partkey"])

    def _rev(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_orderkey": batch["l_orderkey"],
                "l_linenumber": batch["l_linenumber"],
                "p_name": batch["p_name"],
                "revenue": _sql_round(
                    (batch["l_extendedprice"] * (1.0 - batch["l_discount"])).to_numpy()
                ),
            }
        )

    return joined.map_batches(_rev, batch_format="pandas")


def _q_customers_without_orders(sf_dir: str):
    """Broadcast anti-join (SURVEY J3): customers with no pending ('P')
    order — the "excluding those who already bought" shape."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    pending = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"]).filter(
        expr="o_orderstatus == 'P'"
    )
    return rel.anti_join(cust, pending, on="c_custkey", right_on="o_custkey")


def _q_customers_with_open_orders(sf_dir: str):
    """Broadcast semi-join after a pushed-down filter (SURVEY J4/M4)."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    open_orders = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"]).filter(
        expr="o_orderstatus == 'O'"
    )
    return rel.semi_join(cust, open_orders, on="c_custkey", right_on="o_custkey")


def _q_parties_union_prefix(sf_dir: str):
    """UNION ALL with key-space prefixing (SURVEY U1/M3)."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"]).map_batches(
        lambda b: pa.table(
            {
                "party_id": pc.cast(b["c_custkey"], pa.string()),
                "name": b["c_name"],
                "src": pa.array(["customer"] * b.num_rows, pa.string()),
            }
        ),
        batch_format="pyarrow",
    )
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name"]).map_batches(
        lambda b: pa.table(
            {
                "party_id": pc.cast(b["s_suppkey"], pa.string()),
                "name": b["s_name"],
                "src": pa.array(["supplier"] * b.num_rows, pa.string()),
            }
        ),
        batch_format="pyarrow",
    )
    return rel.union_with_prefix(
        cust, supp, key_col="party_id", prefix="s_", main_prefix="c_"
    )


def _q_distinct_flag_status(sf_dir: str):
    """SELECT DISTINCT (SURVEY U3/A3)."""
    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"])
    return rel.distinct(li, ["l_returnflag", "l_linestatus"])


def _q_repeat_customers(sf_dir: str):
    """Grouped count + HAVING (SURVEY A1)."""
    orders = _read(sf_dir, "orders", ["o_custkey"])
    return rel.grouped_count_having(orders, "o_custkey", 2, "order_count")


def _q_top3_parts(sf_dir: str):
    """Top-k groups by count (SURVEY A2)."""
    li = _read(sf_dir, "lineitem", ["l_partkey"])
    return rel.grouped_topk(li, "l_partkey", 3, "line_count")


def _q_top2_lineitems_per_flag(sf_dir: str):
    """Per-group top-N (SURVEY O3, the top-100-users-per-item analog)."""
    li = _read(
        sf_dir, "lineitem", ["l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"]
    )
    return rel.topn_per_group(
        li,
        "l_returnflag",
        "l_extendedprice",
        2,
        descending=True,
        tiebreak=["l_orderkey", "l_linenumber"],
    )


def _q_top20_orders(sf_dir: str):
    """Global sort + limit (SURVEY O1/O5)."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    return rel.sort_limit(orders, ["o_totalprice", "o_orderkey"], [True, False], 20)


def _q_high_value_revenue(sf_dir: str):
    """Row filter + computed column (SURVEY M4 + scalar fns §2.8)."""
    li = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"],
    ).filter(expr="l_quantity >= 30")

    def _rev(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": batch["l_orderkey"],
                "l_linenumber": batch["l_linenumber"],
                "revenue": pa.array(
                    _sql_round(
                        batch["l_extendedprice"].to_numpy(zero_copy_only=False)
                        * (1.0 - batch["l_discount"].to_numpy(zero_copy_only=False))
                    ),
                    pa.float64(),
                ),
            }
        )

    return li.map_batches(_rev, batch_format="pyarrow")


def _q_events_daily(sf_dir: str):
    """Time-bucketed grouped aggregate over the events table (scalar
    date functions, SURVEY §2.8 from_unixtime analog)."""
    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def _day(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": batch["user_id"],
                "day": batch["ts"].dt.strftime("%Y-%m-%d"),
                "value": batch["value"],
            }
        )

    agg = (
        ev.map_batches(_day, batch_format="pandas")
        .groupby(["user_id", "day"])
        .aggregate(
            Count(alias_name="event_count"), Sum("value", alias_name="sum_value")
        )
    )
    return _round_cols(agg, ["sum_value"])


def _q_asof_last_order(sf_dir: str):
    """As-of join (custom operator): each event matched to the user's
    latest order at or before the event time."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
    joined = rel.asof_join(
        ev, orders, left_key="user_id", right_key="o_custkey",
        left_ts="ts", right_ts="o_orderdate", how="inner",
    )

    def _proj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": df["event_id"],
                "user_id": df["user_id"],
                "last_order_date": df["o_orderdate"].dt.strftime("%Y-%m-%d %H:%M:%S"),
            }
        )

    return joined.map_batches(_proj, batch_format="pandas")


PRICE_BANDS = [
    ("low", 0.0, 100_000.0),
    ("mid", 100_000.0, 300_000.0),
    ("high", 300_000.0, 1e18),
]


def _q_orders_price_bands(sf_dir: str):
    """Range (interval) join: classify orders into price bands."""
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    bands = ray.data.from_items(
        [{"band": b, "lo": lo, "hi": hi} for b, lo, hi in PRICE_BANDS]
    )
    joined = rel.range_join(orders, bands, "o_totalprice", "lo", "hi")
    return joined.select_columns(["o_orderkey", "band"])


SESSION_GAP_S = 1800


def _q_sessionize_events(sf_dir: str):
    """Sessionization (30-min inactivity gap) — the windowed/stateful
    operator the reference lacks (SURVEY §2.9), as groupby + per-group
    vectorized cumulative session assignment."""
    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def _sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts", kind="mergesort")
        ts = g["ts"]
        new = (ts.diff().dt.total_seconds() > SESSION_GAP_S) | ts.diff().isna()
        sid = new.cumsum()
        out = g.groupby(sid).agg(
            session_start=("ts", "min"), n_events=("ts", "size")
        )
        return pd.DataFrame(
            {
                "user_id": g["user_id"].iloc[0],
                "session_start": out["session_start"].dt.strftime("%Y-%m-%d %H:%M:%S"),
                "n_events": out["n_events"].astype("int64"),
            }
        )

    return ev.groupby("user_id").map_groups(_sessions, batch_format="pandas")


def _q_exact_dedup_docs(sf_dir: str):
    """Exact dedup: hash-partition + per-group min id (SURVEY U3)."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return dedup.exact_dedup(docs).select_columns(["doc_id"])


def _q_doc_token_counts(sf_dir: str):
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return textops.token_count_stage(docs).select_columns(["doc_id", "n_tokens"])


def _q_doc_char_stats(sf_dir: str):
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return textops.char_stats_stage(docs).select_columns(["doc_id", "n_chars"])


def _q_doc_fingerprints(sf_dir: str):
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return textops.fingerprint_stage(docs).select_columns(["doc_id", "fp_md5"])


def _q_doc_split(sf_dir: str):
    """Deterministic train/valid/test assignment (modulo variant — the
    SQL-expressible twin of the hash split)."""
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops import sampling

    docs = _read(sf_dir, "documents", ["doc_id"])
    return sampling.assign_split(docs, by_modulo=True)


def _q_knn_top10(sf_dir: str):
    """Exact cosine top-10 to the vec_id=0 embedding (brute force,
    broadcast query matrix)."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q = emb.filter(expr="vec_id == 0").take(1)[0]["embedding"]
    corpus = emb.filter(expr="vec_id != 0")
    out = ann.knn_brute_force(corpus, np.asarray([q]), k=10)
    return out.select_columns(["vec_id"])


# --- rows-only (non-SQL-expressible) ---------------------------------------

def _q_er_assignment(sf_dir: str):
    assignment, _ = resolve_entities(lambda: pages_dataset(sf_dir))
    return assignment


def _q_minhash_dup_docs(sf_dir: str):
    """MinHash-LSH near-dup pairs with exact shingle-Jaccard verify —
    oracle-checked against DuckDB's exact all-pairs 3-shingle Jaccard
    (at 32×2 LSH bands, P(miss | J ≥ 0.6) < 1e-6, so the LSH result
    equals the exact result on this corpus)."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = dedup.minhash_dup_pairs(docs, threshold=0.6)
    return _round_cols(pairs, ["sim"], 6)


def _q_ngram_dup_docs(sf_dir: str):
    """Exact all-pairs character-5-gram Jaccard near-dup baseline."""
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = dedup.ngram_dup_all_pairs(docs, n=5, threshold=0.5)
    return _round_cols(pairs, ["ngram_jaccard"], 6)


def _q_embedding_dup_exact(sf_dir: str):
    """Exact all-pairs cosine near-dup baseline (threshold 0.4)."""
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return dedup.embedding_dup_pairs_exact(emb, threshold=0.4, round_nd=4)


def _q_simhash_dup_docs(sf_dir: str):
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return dedup.simhash_dup_pairs(docs, max_hamming=3)


def _q_embedding_dup_pairs(sf_dir: str):
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return dedup.embedding_dup_pairs(emb, threshold=0.9)


def _q_knn_ivf_top10(sf_dir: str):
    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    q = emb.filter(expr="vec_id == 0").take(1)[0]["embedding"]
    cents = ann.fit_centroids(emb, n_centroids=8)
    bucketed = ann.ivf_bucket_stage(emb.filter(expr="vec_id != 0"), cents)
    return ann.knn_ivf(bucketed, np.asarray([q]), cents, k=10, n_probe=4)


def _q_customer_er(sf_dir: str):
    """Customer-record ER (the reference's literal workload): two
    customer masters → integrated_customer with MatchID clusters."""
    from sample_c360_text2sql_segmentation_entityresolution_ray.pipelines.customer_er import (
        resolve_customers,
    )
    from sample_c360_text2sql_segmentation_entityresolution_ray.sources import c360

    assignment, _ = resolve_customers(
        lambda: c360.customer_master(sf_dir),
        lambda: c360.subbrand_customer_master(sf_dir),
    )
    return assignment


def _q_c360_interactions(sf_dir: str):
    """Personalize dataset-import build: purchases ⋈ integrated on
    RecordId → (USER_ID=MatchID, ITEM_ID w/ sub_ prefix, TIMESTAMP)."""
    from sample_c360_text2sql_segmentation_entityresolution_ray.pipelines.customer_er import (
        resolve_customers,
    )
    from sample_c360_text2sql_segmentation_entityresolution_ray.pipelines.segments import (
        build_interactions,
    )
    from sample_c360_text2sql_segmentation_entityresolution_ray.sources import c360

    assignment, _ = resolve_customers(
        lambda: c360.customer_master(sf_dir),
        lambda: c360.subbrand_customer_master(sf_dir),
    )
    return build_interactions(
        c360.purchase_history(sf_dir),
        c360.subbrand_purchase_history(sf_dir),
        assignment,
    )


def _q_c360_segments(sf_dir: str):
    """Item-based segments: top users per item by co-purchase affinity,
    prior purchasers excluded (batch segment job analog)."""
    from sample_c360_text2sql_segmentation_entityresolution_ray.pipelines.customer_er import (
        resolve_customers,
    )
    from sample_c360_text2sql_segmentation_entityresolution_ray.pipelines.segments import (
        build_interactions,
        item_based_segments,
    )
    from sample_c360_text2sql_segmentation_entityresolution_ray.sources import c360

    assignment, _ = resolve_customers(
        lambda: c360.customer_master(sf_dir),
        lambda: c360.subbrand_customer_master(sf_dir),
    )
    inter = build_interactions(
        c360.purchase_history(sf_dir),
        c360.subbrand_purchase_history(sf_dir),
        assignment,
    ).materialize()
    targets = [str(i) for i in range(1, 6)]
    return item_based_segments(inter, targets, n=20)


def _q_curated_corpus(sf_dir: str):
    """Composite training-data pipeline: quality/lang filter → exact +
    MinHash near-dedup → token counts (streaming end-to-end)."""
    from sample_c360_text2sql_segmentation_entityresolution_ray.pipelines.curation import (
        curate_corpus,
    )

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return curate_corpus(docs, min_quality=0.2).drop_columns(["text"])


def _q_langid_docs(sf_dir: str):
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return textops.langid_stage(docs)


def _q_doc_quality(sf_dir: str):
    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return textops.quality_stage(docs)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # relational layer (SURVEY §2.4-2.8) — all oracle-checked
        "pricing_summary": _q_pricing_summary,
        "orders_customer_join": _q_orders_customer_join,
        "lineitem_part_broadcast_join": _q_lineitem_part_broadcast,
        "customers_without_orders": _q_customers_without_orders,
        "customers_with_open_orders": _q_customers_with_open_orders,
        "parties_union_prefix": _q_parties_union_prefix,
        "distinct_flag_status": _q_distinct_flag_status,
        "repeat_customers": _q_repeat_customers,
        "top3_parts": _q_top3_parts,
        "top2_lineitems_per_flag": _q_top2_lineitems_per_flag,
        "top20_orders": _q_top20_orders,
        "high_value_revenue": _q_high_value_revenue,
        "events_daily": _q_events_daily,
        "sessionize_events": _q_sessionize_events,
        "asof_last_order": _q_asof_last_order,
        "orders_price_bands": _q_orders_price_bands,
        # training-data ops — oracle-checked where SQL-expressible
        "exact_dedup_docs": _q_exact_dedup_docs,
        "doc_token_counts": _q_doc_token_counts,
        "doc_char_stats": _q_doc_char_stats,
        "doc_fingerprints": _q_doc_fingerprints,
        "doc_split": _q_doc_split,
        "knn_top10": _q_knn_top10,
        "minhash_dup_docs": _q_minhash_dup_docs,
        "ngram_dup_docs": _q_ngram_dup_docs,
        "embedding_dup_exact": _q_embedding_dup_exact,
        # rows-only (sketch/model-based; no exact SQL equivalent)
        "er_assignment": _q_er_assignment,
        "customer_er_assignment": _q_customer_er,
        "c360_interactions": _q_c360_interactions,
        "c360_segments": _q_c360_segments,
        "simhash_dup_docs": _q_simhash_dup_docs,
        "embedding_dup_pairs": _q_embedding_dup_pairs,
        "knn_ivf_top10": _q_knn_ivf_top10,
        "langid_docs": _q_langid_docs,
        "doc_quality": _q_doc_quality,
        "curated_corpus": _q_curated_corpus,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 2) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
        """,
        "orders_customer_join": """
            SELECT o_orderkey, c_name, o_totalprice
            FROM orders JOIN customer ON o_custkey = c_custkey
        """,
        "lineitem_part_broadcast_join": """
            SELECT l_orderkey, l_linenumber, p_name,
                   round(l_extendedprice * (1 - l_discount), 2) AS revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
        """,
        "customers_without_orders": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
        """,
        "customers_with_open_orders": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        """,
        "parties_union_prefix": """
            SELECT 'c_' || CAST(c_custkey AS VARCHAR) AS party_id,
                   c_name AS name, 'customer' AS src FROM customer
            UNION ALL
            SELECT 's_' || CAST(s_suppkey AS VARCHAR), s_name, 'supplier' FROM supplier
        """,
        "distinct_flag_status": """
            SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        """,
        "repeat_customers": """
            SELECT o_custkey, count(*) AS order_count FROM orders
            GROUP BY o_custkey HAVING count(*) >= 2
        """,
        "top3_parts": """
            SELECT l_partkey, count(*) AS line_count FROM lineitem
            GROUP BY l_partkey ORDER BY line_count DESC, l_partkey LIMIT 3
        """,
        "top2_lineitems_per_flag": """
            SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice FROM (
                SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
                       row_number() OVER (
                           PARTITION BY l_returnflag
                           ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
                       ) AS rn
                FROM lineitem
            ) WHERE rn <= 2
        """,
        "top20_orders": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
        """,
        "high_value_revenue": """
            SELECT l_orderkey, l_linenumber,
                   round(l_extendedprice * (1 - l_discount), 2) AS revenue
            FROM lineitem WHERE l_quantity >= 30
        """,
        "events_daily": """
            SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
                   count(*) AS event_count, round(sum(value), 2) AS sum_value
            FROM events GROUP BY user_id, strftime(ts, '%Y-%m-%d')
        """,
        "sessionize_events": """
            WITH marked AS (
                SELECT user_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR ts - lag(ts) OVER w > INTERVAL 1800 SECOND
                            THEN 1 ELSE 0 END AS is_new
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), numbered AS (
                SELECT user_id, ts,
                       sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
                FROM marked
            )
            SELECT user_id,
                   strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                   count(*) AS n_events
            FROM numbered GROUP BY user_id, sid
        """,
        "asof_last_order": """
            SELECT e.event_id, e.user_id,
                   strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S') AS last_order_date
            FROM events e
            ASOF JOIN orders o
              ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        """,
        "orders_price_bands": """
            WITH bands(band, lo, hi) AS (VALUES
                ('low', 0.0, 100000.0),
                ('mid', 100000.0, 300000.0),
                ('high', 300000.0, 1e18))
            SELECT o_orderkey, band
            FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
        """,
        "exact_dedup_docs": """
            SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
        """,
        "doc_token_counts": """
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens
            FROM documents
        """,
        "doc_char_stats": """
            SELECT doc_id, length(text) AS n_chars FROM documents
        """,
        "doc_fingerprints": """
            SELECT doc_id, md5(text) AS fp_md5 FROM documents
        """,
        "doc_split": """
            SELECT doc_id,
                   CASE WHEN doc_id % 100 < 90 THEN 'train'
                        WHEN doc_id % 100 < 95 THEN 'valid'
                        ELSE 'test' END AS split
            FROM documents
        """,
        "knn_top10": """
            SELECT vec_id FROM embeddings
            WHERE vec_id <> 0
            ORDER BY list_cosine_similarity(
                embedding, (SELECT embedding FROM embeddings WHERE vec_id = 0)
            ) DESC, vec_id
            LIMIT 10
        """,
        "minhash_dup_docs": """
            WITH tok AS (
              SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS t
              FROM documents
            ), sh AS (
              SELECT doc_id,
                     list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                    FOR i IN range(1, len(t) - 1)]) AS s
              FROM tok WHERE len(t) >= 3
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(len(list_intersect(a.s, b.s))::DOUBLE /
                         len(list_distinct(list_concat(a.s, b.s))), 6) AS sim
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.s, b.s))::DOUBLE /
                  len(list_distinct(list_concat(a.s, b.s))) >= 0.6
        """,
        "ngram_dup_docs": """
            WITH g AS (
              SELECT doc_id,
                     list_distinct([substr(text, i, 5)
                                    FOR i IN range(1, len(text) - 3)]) AS s
              FROM documents WHERE len(text) >= 5
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   round(len(list_intersect(a.s, b.s))::DOUBLE /
                         len(list_distinct(list_concat(a.s, b.s))), 6) AS ngram_jaccard
            FROM g a JOIN g b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.s, b.s))::DOUBLE /
                  len(list_distinct(list_concat(a.s, b.s))) >= 0.5
        """,
        "embedding_dup_exact": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.embedding, b.embedding)::DOUBLE, 4) AS cos
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(a.embedding, b.embedding)::DOUBLE, 4) >= 0.4
        """,
    }
