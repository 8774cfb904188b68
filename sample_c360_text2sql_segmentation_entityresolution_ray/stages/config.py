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
    bands: int = 16             # 16 bands x 4 rows

    # --- rare-token blocking ---
    rare_token_keys: int = 8    # k smallest token hashes emitted as block keys

    # --- domain / sorted-neighborhood blocking ---
    domain_salt_chars: int = 2  # slug-prefix chars used to salt domain blocks
    allpairs_cap: int = 40      # blocks <= cap: all pairs; else sorted-neighborhood
    snm_window: int = 5         # sorted-neighborhood window width

    # --- scoring ---
    score_threshold: float = 0.4
    min_jaccard: float = 0.32   # hard floor: cosine/JW alone can never match
    w_jaccard: float = 0.6
    w_cosine: float = 0.25
    w_jw: float = 0.15

    # --- execution ---
    scorer_concurrency: int = 4     # actor-pool size for PairScorer
    scorer_batch_size: int = 2048
    pair_dedup_partitions: int = 32
    cc_num_partitions: int = 16
    cc_max_rounds: int = 30
    local_cc_max_edges: int = 2_000_000   # below this, union-find on driver
    broadcast_label_limit: int = 5_000_000  # below this, broadcast the label map


DEFAULT_CONFIG = ERConfig()
