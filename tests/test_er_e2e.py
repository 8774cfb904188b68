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


def test_er_join_attach_path(sf_dir):
    """Force the large-label JOIN attach path (broadcast_label_limit=0):
    must produce the same clustering as the broadcast path and not
    deadlock on a small cluster (regression: chained fixed-partition
    joins starved a 4-8 CPU cluster)."""
    from sample_c360_text2sql_segmentation_entityresolution_ray.stages.config import (
        ERConfig,
    )

    cfg = ERConfig(broadcast_label_limit=0)
    assignment, _ = resolve_entities(lambda: pages_dataset(sf_dir), cfg)
    adf = assignment.to_pandas()
    rel = relations_dataset(sf_dir).to_pandas()
    assert adf["RecordId"].is_unique
    m = pairwise_f1(adf, rel)
    assert m["f1"] >= 0.99, m
