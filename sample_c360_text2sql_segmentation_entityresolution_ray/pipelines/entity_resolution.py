"""Flagship pipeline: pages → entity cluster assignments.

The Ray-Data-native rebuild of the reference's DataIntegrationWorkflow
ER leg (`lib/data-integration-workflow.ts:345-369` → AWS ER black box →
`integrated_customer` table, `lib/data-storage.ts:154-218`):

    read pages ─ extract (drop html) ─ normalize ─ LSH/domain banding
      ─ groupby(block_key) pair-gen ─ dedupe ─ PairScorer actor pool
      ─ threshold ─ [matched edges, materialized = checkpointable]
      ─ min-label-propagation clustering ─ attach labels to all records

Output schema (the `integrated_customer` analog, FIXTURES.md §4.1):
    source:str, ConfidenceLevel:float64, RecordId:str, MatchID:str, lang:str

Every record appears exactly once; unmatched records keep their own url
as MatchID with ConfidenceLevel 1.0.  MatchID is the minimum url of the
cluster — content-defined, deterministic under any parallelism.
"""

from __future__ import annotations

import pandas as pd

import ray
import ray.data

from ..stages.blocking import band_emit_stage, pair_gen_stage
from ..stages.clustering import confidence_stage, resolve_labels
from ..stages.config import DEFAULT_CONFIG, ERConfig
from ..stages.normalize import extract_stage, normalize_stage
from ..stages.scoring import matched_edges_stage, score_pairs_stage


def build_idf_ref(pages, cfg: ERConfig = DEFAULT_CONFIG):
    """Bigram IDF table from a content-hash sample of the corpus (the
    short-doc gate's boilerplate discount, `stages/scoring.py`).  Only
    the ``idf_sample_p`` fraction pays extract+normalize; the resulting
    broadcast table is O(boilerplate vocabulary) at any corpus size."""
    from ..functions.idf import bigram_idf_ref
    from ..ops.sampling import hash_sample

    sample = hash_sample(pages, cfg.idf_sample_p, id_col="url", salt="idf")
    recs = normalize_stage(extract_stage(sample), cfg)
    return bigram_idf_ref(recs, min_df_frac=cfg.idf_min_df_frac)


def matched_edges(pages, cfg: ERConfig = DEFAULT_CONFIG, idf_ref=None):
    """pages → scored matched edges (url_a, url_b, …, score), streaming.

    Candidate pairs are scored WITH cross-block duplicates (dup factor
    ≈ 2.1× measured): a duplicate costs one extra vectorized score,
    while deduping candidates costs a second full shuffle of the pair
    feature payload.  Dedup happens here instead, on the matched-edge
    table — orders of magnitude smaller than the candidate stream."""
    extracted = extract_stage(pages)
    records = normalize_stage(extracted, cfg)
    exploded = band_emit_stage(records, cfg)
    pairs = pair_gen_stage(exploded, cfg)
    scored = score_pairs_stage(pairs, cfg, idf_ref)
    edges = matched_edges_stage(scored, cfg)
    from ..ops.relational import dedupe_by_key

    return dedupe_by_key(edges, ["url_a", "url_b"])


def _conf_map_from_edges(edges) -> dict:
    """Per-node max incident matched-edge score, computed driver-side
    from the (materialized, matched-pairs-only) edge table — edges are
    already bounded by the same budget as the union-find path, and this
    replaces a full Ray groupby stage (+ its barrier) in the broadcast
    attach path."""
    edf = edges.select_columns(["url_a", "url_b", "score"]).to_pandas()
    both = pd.concat(
        [
            edf[["url_a", "score"]].rename(columns={"url_a": "node"}),
            edf[["url_b", "score"]].rename(columns={"url_b": "node"}),
        ],
        ignore_index=True,
    )
    return both.groupby("node")["score"].max().to_dict()


def attach_labels(slim, labels, conf, cfg: ERConfig = DEFAULT_CONFIG, edges=None):
    """Left-attach (MatchID, ConfidenceLevel) onto the full record table.

    Plan choice by measured size: a small label table is broadcast once
    via ``ray.put`` and looked up per batch (no shuffle); a large one
    goes through a hash-partitioned left join.  The reference's analog
    is the `integrated_customer` overwrite (S3 sink,
    `lambda/integrated_customer_updater/index.py:77-86`).
    """
    n_labels = labels.count()
    if n_labels <= cfg.broadcast_label_limit:
        lab_df = labels.to_pandas()
        label_map = dict(zip(lab_df["node"], lab_df["label"]))
        if edges is not None:
            conf_map = _conf_map_from_edges(edges)
        else:
            conf_df = conf.to_pandas()
            conf_map = dict(zip(conf_df["node"], conf_df["ConfidenceLevel"]))
        ref = ray.put((label_map, conf_map))

        class Attach:
            def __init__(self):
                self.label_map, self.conf_map = ray.get(ref)

            def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
                urls = df["url"]
                lm, cm = self.label_map, self.conf_map
                return pd.DataFrame(
                    {
                        "source": df["source"],
                        "ConfidenceLevel": [cm.get(u, 1.0) for u in urls],
                        "RecordId": urls,
                        "MatchID": [lm.get(u, u) for u in urls],
                        "lang": df["lang"],
                    }
                )

        # autoscaling pool (min 1): a fixed pool can reserve every CPU
        # of a small cluster and deadlock the stages feeding it
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        return slim.map_batches(
            Attach, batch_format="pandas", concurrency=(1, max(1, ncpu - 1))
        )

    # large-label path: two hash-partitioned left joins.  Partition
    # count scales with the label table — two chained joins at a fixed
    # count reserve 2×P×0.25 CPUs of aggregator actors, which on a
    # small cluster starves the map stages feeding them (measured
    # deadlock at P=16 on 8 CPUs).
    if conf is None:
        conf = confidence_stage(edges)
    from ..ops.relational import hash_join

    P = max(2, min(cfg.cc_num_partitions, n_labels // 10_000 + 2))
    joined = hash_join(
        slim, labels, on=("url",), right_on=("node",),
        how="left_outer", num_partitions=P,
    )
    joined = hash_join(
        joined, conf, on=("url",), right_on=("node",),
        how="left_outer", num_partitions=P,
    )

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "source": df["source"],
                "ConfidenceLevel": df["ConfidenceLevel"].fillna(1.0),
                "RecordId": df["url"],
                "MatchID": df["label"].fillna(df["url"]),
                "lang": df["lang"],
            }
        )

    return joined.map_batches(_finish, batch_format="pandas")


def _edge_metrics(cfg: ERConfig):
    def fn(edges) -> dict:
        import pyarrow.compute as pc

        n_capped = 0
        n = 0
        smin = None
        for b in edges.select_columns(["block_n", "score"]).iter_batches(
            batch_size=65536, batch_format="pyarrow"
        ):
            n += b.num_rows
            n_capped += pc.sum(
                pc.cast(pc.greater(b["block_n"], cfg.allpairs_cap), "int64")
            ).as_py() or 0
            mn = pc.min(b["score"]).as_py()
            smin = mn if smin is None else min(smin, mn)
        return {
            "n_edges": n,
            "edges_from_capped_blocks": n_capped,
            "min_edge_score": smin,
        }

    return fn


def resolve_entities(
    pages_factory,
    cfg: ERConfig = DEFAULT_CONFIG,
    checkpoint_dir: str | None = None,
    input_fingerprint: str = "",
):
    """Run the full ER pipeline.

    ``pages_factory``: zero-arg callable returning the pages Dataset —
    called twice (once for the match path, once for the slim record
    re-read) so each consumption is an independent lazy plan; with a
    Parquet source the second read prunes down to 3 columns and never
    touches html bytes.

    ``checkpoint_dir``: if set, the matched-edge table — the expensive
    stage — is checkpointed via :func:`..state.run_stage` with lineage
    (input fingerprint, per-partition file list) + stage metrics (edge
    count, capped-block provenance, min matched score); a re-run with
    the same fingerprint resumes from the Parquet checkpoint without
    recomputing blocking/scoring (the reference's full-refresh S3
    prefix + DynamoDB status, rebuilt resumable).

    Returns ``(assignment, edges)`` — ``edges`` is materialized (it is
    the natural checkpoint and is small: matched pairs only).
    """
    idf_ref = build_idf_ref(pages_factory(), cfg)
    if checkpoint_dir:
        from ..state import run_stage

        edges = run_stage(
            "matched_edges",
            checkpoint_dir,
            input_fingerprint,
            lambda: matched_edges(pages_factory(), cfg, idf_ref),
            metrics_fn=_edge_metrics(cfg),
        )
    else:
        edges = matched_edges(pages_factory(), cfg, idf_ref).materialize()
    labels = resolve_labels(edges, cfg)
    # the distributed (join) attach path still needs the Ray aggregate;
    # the broadcast path computes the confidence map from edges directly
    n_edges = edges.count()
    conf = (
        confidence_stage(edges)
        if n_edges > cfg.broadcast_label_limit
        else None
    )
    slim = pages_factory().select_columns(["url", "source", "lang"])
    assignment = attach_labels(slim, labels, conf, cfg, edges=edges)
    return assignment, edges
