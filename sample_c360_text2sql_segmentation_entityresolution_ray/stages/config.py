"""Tuning knobs for the ER pipeline, in one place.

Defaults are sized for correctness at fixture scale AND bounded behavior
at web scale (caps are per-block/per-record, never global).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class ERConfig:
    # --- normalization / features ---
    shingle_k: int = 3          # word shingle width
    shingle_cap: int = 256      # bottom-k cap on shingle hashes per record
    token_cap: int = 256        # cap on token hashes (TF cosine)
    slug_len: int = 64          # normalized prefix slug length

    # --- MinHash-LSH blocking ---
    num_perm: int = 64
    bands: int = 32             # 32 bands x 2 rows: catches weak-shingle
                                # (J≈0.3) true pairs that 16x4 missed;
                                # junk collisions are absorbed by the
                                # cheap vectorized scorer (measured
                                # sf0.1: F1 0.996→0.9974, P stays 1.0)

    # --- rare-token blocking ---
    rare_token_keys: int = 8    # k smallest token hashes emitted as block keys

    # --- domain / sorted-neighborhood blocking ---
    domain_salt_chars: int = 2  # slug-prefix chars used to salt domain blocks
    allpairs_cap: int = 40      # blocks <= cap: all pairs; else sorted-neighborhood
    snm_window: int = 5         # sorted-neighborhood window width
    pair_partitions: int = 256  # hash partitions for vectorized pair-gen
                                # (small multiple of target cluster cores;
                                # 256 keeps the hot-domain partition's pair
                                # emission task under ~4x the mean —
                                # measured 10x skew at 64)

    # --- short-doc recall path ---
    short_doc_tokens: int = 80  # records below this token count also carry
                                # a bigram (k=2) shingle set; a short doc's
                                # 3-shingle Jaccard collapses under the same
                                # perturbation rate (3% drops kill 3 shingles
                                # each of ~20), so the k=3 floor alone loses
                                # the short tail (measured: 21 FN @ sf0.1)
    min_jaccard2: float = 0.2   # (IDF-weighted) bigram-Jaccard floor for
                                # that path — order-destroyed confounders
                                # measure ≤ 0.09 and boilerplate-only
                                # overlap is IDF-discounted to ~0; true
                                # short pairs ≥ 0.25
    idf_sample_p: float = 0.05  # corpus fraction sampled (content-hash,
                                # deterministic) to estimate bigram DF
    idf_min_df_frac: float = 0.05  # grams below this df fraction are not
                                   # tabled (take the max-idf default) —
                                   # keeps the broadcast table at
                                   # O(boilerplate vocab) at any corpus
                                   # size, and above the df a sampled
                                   # entity's OWN grams reach through its
                                   # duplicate pages (≤4 of ~100+ sampled)

    # --- feature transport for candidate pairs ---
    feature_attach: str = "auto"  # "payload": each exploded key row
                                  # carries the record's feature arrays
                                  # (~1.3 KB × keys ≈ 53 KB/record
                                  # through Shuffle #1 — no driver
                                  # state, but pays the replication);
                                  # "broadcast": shuffle only
                                  # (key, url, slug) (~100 B) and ship
                                  # ONE feature table via ray.put —
                                  # ~10× less shuffle volume (measured
                                  # 2× wall at 8 cpus), bounded by
                                  # broadcast_features_limit;
                                  # "join": slim shuffle like broadcast
                                  # but the DEDUPED pair stream
                                  # hash-joins features back on
                                  # url_a/url_b — unbounded corpus
                                  # size, nothing driver-resident: the
                                  # 10^12-doc plan (pair it with a
                                  # checkpoint_features records_factory
                                  # so the feature table lives on
                                  # Parquet, not plasma);
                                  # "auto": try broadcast with a
                                  # streaming row cap (abort costs only
                                  # ≤ limit rows of normalize), fall
                                  # back to join above it
    broadcast_features_limit: int = 1_000_000  # records (~1.4 GB heap)
    feature_join_partitions: int | None = None  # hash partitions for the
                                  # two feature-attach joins ("join"
                                  # plan); None = sized to the cluster
                                  # (join_partitions_for_cluster)

    # --- scoring ---
    score_threshold: float = 0.4
    min_jaccard: float = 0.32   # hard floor: cosine/JW alone can never match
    est_gate_margin: float = 0.15  # minhash-estimate pre-gate slack below
                                   # min_jaccard before exact intersection
    w_jaccard: float = 0.6
    w_cosine: float = 0.25
    w_jw: float = 0.15

    # --- execution ---
    scorer_concurrency: int = 32    # actor-pool MAX for PairScorer
                                    # (autoscaling (1, min(this, cpus-1)))
    scorer_batch_size: int | None = None  # None = whole upstream blocks:
                                # re-slicing object-payload pandas blocks
                                # copies them (measured: 52 s -> 32 s UDF
                                # at sf0.1); block size is already bounded
                                # by the docs-per-block read sizing
    pair_dedup_partitions: int = 32
    cc_num_partitions: int = 16
    cc_max_rounds: int = 30
    local_cc_max_edges: int = 2_000_000   # below this, union-find on driver
    broadcast_label_limit: int = 5_000_000  # below this, broadcast the label map


DEFAULT_CONFIG = ERConfig()
