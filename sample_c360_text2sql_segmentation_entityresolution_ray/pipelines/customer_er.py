"""Customer-record entity resolution — the reference's literal use case.

AWS ER ``ML_MATCHING`` over the two customer masters
(`lib/entity-resolution-service.ts:54-183`) rebuilt natively:

1. ``normalize_customers`` — the schema-mapping stage (M1): both
   sources project onto one canonical match schema
   (email→EMAIL_ADDRESS lowercased, firstname/lastname→NAME trimmed
   lowercase, gender/age→STRING, created_at→DATE), each row tagged
   with its source (`inputSourceConfig`, `:144-153`).
2. Blocking: three exact keys per record — normalized email, full
   name, lastname+age-decade — exploded and routed through the same
   hash-partition vectorized pair generator as the page pipeline.
3. ``CustomerPairScorer`` — actor-pool stage: email equality, batched
   Jaro-Winkler on names, age closeness, gender agreement.  Weights
   put an email match or an exact (name, age, gender) agreement above
   threshold, while the planted same-name/different-person
   confounders (different age + email, `gen_testdata.py:398-417`)
   stay below it.
4. Clustering + output: reuse of ``resolve_labels`` /
   ``confidence_stage`` — MatchID = min customer_id of the cluster;
   output is the ``integrated_customer`` table
   (`lib/data-storage.ts:154-218`) with full payload columns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..functions.strings import jaro_winkler_batch
from ..functions.texthash import hash_str_array
from ..stages.blocking import emit_partition_pairs_generic
from ..stages.clustering import resolve_labels
from ..stages.config import DEFAULT_CONFIG, ERConfig

MATCH_THRESHOLD = 0.75
W_EMAIL, W_NAME, W_AGE, W_GENDER = 0.5, 0.3, 0.1, 0.1
PAIR_PARTITIONS = 64
BLOCK_CAP = 40
SNM_WINDOW = 5


def normalize_customers(main, sub) -> "ray.data.Dataset":
    """Both sources → one canonical match-record table (M1)."""

    def _norm(source: str):
        def fn(batch: pa.Table) -> pa.Table:
            emails = [e.strip().lower() for e in batch["email"].to_pylist()]
            names = [
                f"{f.strip().lower()} {l.strip().lower()}"
                for f, l in zip(
                    batch["firstname"].to_pylist(), batch["lastname"].to_pylist()
                )
            ]
            return pa.table(
                {
                    "customer_id": batch["customer_id"],
                    "source": pa.array([source] * batch.num_rows, pa.string()),
                    "email": pa.array(emails, pa.string()),
                    "name": pa.array(names, pa.string()),
                    "gender": batch["gender"],
                    "age": batch["age"],
                    "created_at": batch["created_at"],
                }
            )

        return fn

    return main.map_batches(_norm("main"), batch_format="pyarrow").union(
        sub.map_batches(_norm("subbrand"), batch_format="pyarrow")
    )


def customer_band_emit(records) -> "ray.data.Dataset":
    """Explode each record into 3 exact block keys: email, full name,
    lastname+age-decade (catches typo'd emails via name, same-name
    different-decade stays apart)."""

    def _emit(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        emails = batch["email"].to_pylist()
        names = batch["name"].to_pylist()
        ages = batch["age"].to_pylist()
        lastnames = [nm.split(" ")[-1] for nm in names]
        k_email = hash_str_array([f"em:{e}" for e in emails])
        k_name = hash_str_array([f"nm:{nm}" for nm in names])
        k_la = hash_str_array(
            [f"la:{ln}:{a // 10}" for ln, a in zip(lastnames, ages)]
        )
        keys = np.stack([k_email, k_name, k_la], axis=1)  # (n, 3)
        idx = np.repeat(np.arange(n), 3)
        sub = batch.select(
            ["customer_id", "email", "name", "gender", "age"]
        ).take(idx)
        out = sub.add_column(
            0, "block_key", pa.array(keys.reshape(-1), pa.uint64())
        )
        part = (keys.reshape(-1) % np.uint64(PAIR_PARTITIONS)).astype(np.int32)
        return out.append_column("part", pa.array(part, pa.int32()))

    return records.map_batches(_emit, batch_format="pyarrow")


def customer_pair_gen(exploded) -> "ray.data.Dataset":
    return exploded.groupby("part").map_groups(
        lambda g: emit_partition_pairs_generic(
            g,
            id_col="customer_id",
            order_col="name",
            payload_cols=["email", "name", "gender", "age"],
            cap=BLOCK_CAP,
            window=SNM_WINDOW,
        ),
        batch_format="pandas",
    )


class CustomerPairScorer:
    """Actor-pool pairwise scorer (ST1 analog) — fully vectorized."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        if n == 0:
            return pd.DataFrame(
                {
                    "url_a": pd.Series(dtype=object),
                    "url_b": pd.Series(dtype=object),
                    "score": pd.Series(dtype=float),
                    "block_n": pd.Series(dtype=np.int32),
                }
            )
        email_eq = (
            batch["email_a"].to_numpy() == batch["email_b"].to_numpy()
        ).astype(float)
        name_jw = jaro_winkler_batch(
            batch["name_a"].to_numpy(), batch["name_b"].to_numpy()
        )
        age_a = batch["age_a"].to_numpy().astype(float)
        age_b = batch["age_b"].to_numpy().astype(float)
        age_sim = np.maximum(0.0, 1.0 - np.abs(age_a - age_b) / 5.0)
        gender_eq = (
            batch["gender_a"].to_numpy() == batch["gender_b"].to_numpy()
        ).astype(float)
        score = (
            W_EMAIL * email_eq
            + W_NAME * name_jw
            + W_AGE * age_sim
            + W_GENDER * gender_eq
        )
        # edge columns named url_a/url_b so the clustering stages
        # (resolve_labels / confidence_stage) are reused verbatim
        return pd.DataFrame(
            {
                "url_a": batch["customer_id_a"].to_numpy(),
                "url_b": batch["customer_id_b"].to_numpy(),
                "score": score,
                "block_n": batch["block_n"].to_numpy(),
            }
        )


def customer_matched_edges(records, cfg: ERConfig = DEFAULT_CONFIG):
    """Thresholded match edges, streaming.  May contain cross-block
    duplicate pairs — every consumer (union-find, max-confidence) is
    idempotent, and :func:`resolve_customers` dedupes them in its
    single driver pass instead of paying a shuffle for a tiny table.
    The scorer is fully vectorized and stateless → a task stage (an
    actor pool would pay per-run process spawn for no state)."""
    exploded = customer_band_emit(records)
    pairs = customer_pair_gen(exploded)
    scored = pairs.map_batches(CustomerPairScorer(), batch_format="pandas")

    def _thr(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["score"] >= MATCH_THRESHOLD]

    return scored.map_batches(_thr, batch_format="pandas")


def resolve_customers(
    main_factory, sub_factory, cfg: ERConfig = DEFAULT_CONFIG
):
    """Full customer ER: returns (integrated_customer Dataset, edges).

    integrated_customer schema (`lib/data-storage.ts:154-218` /
    FIXTURES.md §4.1): source, ConfidenceLevel, RecordId, MatchID +
    payload (email, firstname is folded into name, gender, age,
    created_at)."""
    from ..stages.clustering import collect_edges_local, resolve_labels

    records = normalize_customers(main_factory(), sub_factory()).materialize()
    plan = customer_matched_edges(records, cfg)
    # ONE driver pass: dedupe + union-find + per-node max score while
    # the edge stream runs (see stages.clustering.collect_edges_local);
    # the distributed fallback only triggers past local_cc_max_edges
    out = collect_edges_local(plan, cfg.local_cc_max_edges)
    if out is not None:
        edges_df, label_map, conf_map = out
        edges_df = edges_df.drop_duplicates(["url_a", "url_b"])
        edges = ray.data.from_pandas(edges_df)
    else:
        from ..ops.relational import dedupe_by_key
        from .entity_resolution import _conf_map_from_edges

        edges = dedupe_by_key(plan, ["url_a", "url_b"]).materialize()
        labels = resolve_labels(edges, cfg)
        n_labels = labels.count()
        if n_labels > cfg.broadcast_label_limit:
            # label table too large for every worker's heap: attach via
            # two hash-partitioned left joins instead of a broadcast map
            # (mirrors the flagship's attach_labels switch,
            # pipelines/entity_resolution.py)
            from ..ops.relational import hash_join
            from ..stages.clustering import confidence_stage

            conf = confidence_stage(edges)
            P = max(2, min(cfg.cc_num_partitions, n_labels // 10_000 + 2))
            joined = hash_join(
                records, labels, on=("customer_id",), right_on=("node",),
                how="left_outer", num_partitions=P,
            )
            joined = hash_join(
                joined, conf, on=("customer_id",), right_on=("node",),
                how="left_outer", num_partitions=P,
            )

            def _finish(df: pd.DataFrame) -> pd.DataFrame:
                return pd.DataFrame(
                    {
                        "source": df["source"],
                        "ConfidenceLevel": df["ConfidenceLevel"].fillna(1.0),
                        "RecordId": df["customer_id"],
                        "MatchID": df["label"].where(
                            df["label"].notna(), df["customer_id"]
                        ),
                        "email": df["email"],
                        "name": df["name"],
                        "gender": df["gender"],
                        "age": df["age"],
                        "created_at": df["created_at"],
                    }
                )

            return joined.map_batches(_finish, batch_format="pandas"), edges
        lab_df = labels.to_pandas()
        label_map = dict(zip(lab_df["node"], lab_df["label"]))
        conf_map = _conf_map_from_edges(edges)
    ref = ray.put((label_map, conf_map))

    def _attach(df: pd.DataFrame) -> pd.DataFrame:
        # task stage: the broadcast maps are plasma-resident, so the
        # per-task ray.get is ~free after the first touch per worker
        lm, cm = ray.get(ref)
        ids = df["customer_id"]
        return pd.DataFrame(
            {
                "source": df["source"],
                "ConfidenceLevel": [cm.get(i, 1.0) for i in ids],
                "RecordId": ids,
                "MatchID": [lm.get(i, i) for i in ids],
                "email": df["email"],
                "name": df["name"],
                "gender": df["gender"],
                "age": df["age"],
                "created_at": df["created_at"],
            }
        )

    # records were materialized above — the attach pass re-reads the
    # cached blocks instead of re-generating every row
    assignment = records.map_batches(_attach, batch_format="pandas")
    return assignment, edges


__all__ = [
    "normalize_customers",
    "customer_band_emit",
    "customer_pair_gen",
    "CustomerPairScorer",
    "customer_matched_edges",
    "resolve_customers",
]
