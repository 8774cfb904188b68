"""End-to-end entity resolution: pairwise F1 ≥ 0.99 against the planted
ground-truth relations (the BASELINE.json headline gate)."""

from __future__ import annotations

import pandas as pd

from scripts.eval_f1 import pairwise_f1
from sample_c360_text2sql_segmentation_entityresolution_ray.pipelines.entity_resolution import (
    resolve_entities,
)
from sample_c360_text2sql_segmentation_entityresolution_ray.sources.pages import (
    pages_dataset,
    relations_dataset,
)


def test_er_pairwise_f1(sf_dir):
    assignment, edges = resolve_entities(lambda: pages_dataset(sf_dir))
    adf = assignment.to_pandas()
    rel = relations_dataset(sf_dir).to_pandas()

    # output shape: the integrated_customer analog (FIXTURES.md §4.1)
    assert set(adf.columns) == {"source", "ConfidenceLevel", "RecordId", "MatchID", "lang"}
    # every record exactly once
    assert adf["RecordId"].is_unique
    # MatchID is content-defined: the min RecordId of its cluster
    grp = adf.groupby("MatchID")["RecordId"].min()
    assert (grp.index == grp.values).all()

    m = pairwise_f1(adf, rel)
    assert m["f1"] >= 0.99, m


def test_er_distributed_paths(sf_dir):
    """Force every distributed fallback at once (local_cc_max_edges=0
    disables the driver fast path → materialize + distributed min-label
    propagation; broadcast_label_limit=0 forces the JOIN attach): must
    produce the same clustering and not deadlock on a small cluster
    (regression: chained fixed-partition joins starved a 4-8 CPU
    cluster)."""
    from sample_c360_text2sql_segmentation_entityresolution_ray.stages.config import (
        ERConfig,
    )

    cfg = ERConfig(broadcast_label_limit=0, local_cc_max_edges=0)
    assignment, _ = resolve_entities(lambda: pages_dataset(sf_dir), cfg)
    adf = assignment.to_pandas()
    rel = relations_dataset(sf_dir).to_pandas()
    assert adf["RecordId"].is_unique
    m = pairwise_f1(adf, rel)
    assert m["f1"] >= 0.99, m


def test_er_payload_feature_plan_matches_broadcast(sf_dir):
    """The scale-default payload plan (features ride each exploded key
    row) must produce exactly the same edges as the broadcast-feature
    plan (forced via broadcast_features_limit=0 → fallback)."""
    from sample_c360_text2sql_segmentation_entityresolution_ray.pipelines.entity_resolution import (
        matched_edges,
    )
    from sample_c360_text2sql_segmentation_entityresolution_ray.stages.config import (
        DEFAULT_CONFIG, ERConfig,
    )

    bc = matched_edges(pages_dataset(sf_dir), DEFAULT_CONFIG).to_pandas()
    cfg = ERConfig(feature_attach="payload")
    pl = matched_edges(pages_dataset(sf_dir), cfg).to_pandas()
    cols = ["url_a", "url_b", "jaccard", "cosine", "jw", "score"]
    pd.testing.assert_frame_equal(
        bc[cols].sort_values(["url_a", "url_b"]).reset_index(drop=True),
        pl[cols].sort_values(["url_a", "url_b"]).reset_index(drop=True),
    )
