"""Generic graph operators over an edge table.

The ER pipeline's transitive-clustering machinery
(`stages/clustering.py` — driver union-find under a measured edge cap,
min-label propagation via hash-partitioned joins above it) is not
ER-specific: any near-dup / linkage / identity graph needs the same
"edges → component labels" reduction (reference analog: the ER
MatchID column, `lib/data-storage.ts:154-218`).  This module exposes it
for arbitrary (src, dst) edge tables with int or string node ids.

Scale shape: the label table is O(#nodes) and the per-round exchange is
(node, candidate-label) pairs — edges themselves shuffle once per round
through the join, payloads never.  Round count is O(component
diameter), capped.  Components label as their MINIMUM node id —
content-defined, reproducible across partitionings.
"""

from __future__ import annotations

import pandas as pd

import ray.data


def connected_components(
    edges: "ray.data.Dataset",
    src: str = "src",
    dst: str = "dst",
    local_max_edges: int = 2_000_000,
    max_rounds: int = 30,
    num_partitions: int = 16,
) -> "ray.data.Dataset":
    """Label every node of the undirected graph ``edges`` with its
    component's minimum node id.  Output: ``(node, component)``.

    Edge direction is ignored (the symmetric closure is taken
    internally); self-loops and duplicate edges are harmless.  Below
    ``local_max_edges`` (measured, metadata-only on the materialized
    edge set) a streamed driver union-find answers in one pass; above
    it the hash-partitioned min-label-propagation runs, materializing
    only the O(#nodes) label table per round.
    """
    from ..stages.clustering import resolve_labels
    from ..stages.config import ERConfig

    renamed = edges.select_columns([src, dst]).map_batches(
        lambda df: df.rename(columns={src: "url_a", dst: "url_b"}),
        batch_format="pandas",
    ).materialize()
    cfg = ERConfig(
        local_cc_max_edges=local_max_edges,
        cc_max_rounds=max_rounds,
        cc_num_partitions=num_partitions,
    )
    labels = resolve_labels(renamed, cfg)
    return labels.map_batches(
        lambda df: df.rename(columns={"label": "component"}),
        batch_format="pandas",
    )


def component_sizes(
    labels: "ray.data.Dataset", component_col: str = "component"
) -> "ray.data.Dataset":
    """(component, n_nodes) census of a `connected_components` output —
    a combiner-shuffle count, O(#components) rows out."""
    from .relational import grouped_aggregate

    return grouped_aggregate(
        labels, [component_col], [("count", component_col, "n_nodes")]
    )


__all__ = ["connected_components", "component_sizes"]
