"""Transitive clustering of matched pairs → entity labels.

Reference analog: AWS ER's cluster output (``MatchID`` column,
`lib/data-storage.ts:154-218`).  Per the north rule this is an
iterative min-label-propagation connected-components pass expressed as
repeated hash-partitioned joins + grouped mins (**Shuffle #2**):

    label(node) ← min(label(node), min over neighbors label(neighbor))

until a fixed point.  Labels are urls, so the converged label is the
lexicographic **minimum url of the component** — content-defined, never
partition-order-defined (determinism requirement, SURVEY §7.4).

Each round materializes the (small) label table to bound lineage; the
round count is O(component diameter) — tiny for ER graphs, capped at
``cc_max_rounds``.

A driver-side union-find fast path handles provably-small edge sets
(`local_cc_max_edges`), streaming edges via ``iter_batches`` — the
documented small-candidate-set escape hatch, not the scale path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data
from ray.data.aggregate import Max, Min

from ..functions.texthash import hash_str_array
from .config import DEFAULT_CONFIG, ERConfig


def _sym_edges(edges):
    """(url_a, url_b) → both directions (src, dst)."""

    def _sym(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": np.concatenate([df["url_a"].to_numpy(), df["url_b"].to_numpy()]),
                "dst": np.concatenate([df["url_b"].to_numpy(), df["url_a"].to_numpy()]),
            }
        )

    return edges.map_batches(_sym, batch_format="pandas")


def _labels_checksum(labels) -> int:
    """Order-independent XOR checksum of (node,label) rows — two equal
    checksums ⇒ the label table reached a fixed point."""

    def _part(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"h": np.array([0], dtype=np.uint64)})
        h = hash_str_array(
            (df["node"].astype(str) + "|" + df["label"].astype(str)).to_numpy(object)
        )
        return pd.DataFrame({"h": np.array([np.bitwise_xor.reduce(h)], dtype=np.uint64)})

    parts = labels.map_batches(_part, batch_format="pandas").take_all()
    out = np.uint64(0)
    for row in parts:
        out ^= np.uint64(row["h"])
    return int(out)


def connected_components(
    edges, cfg: ERConfig = DEFAULT_CONFIG
) -> "ray.data.Dataset":
    """Distributed min-label propagation.  Returns (node, label)."""
    sym = _sym_edges(edges).materialize()
    # partitions sized to the data: a partition count far above the row
    # count leaves join partitions empty, which (a) wastes aggregator
    # actors and (b) trips an Arrow empty-schema edge case in the hash
    # join finalizer on Ray 2.49
    P = max(2, min(cfg.cc_num_partitions, sym.count() // 1000 + 2))

    from ..ops.relational import dedupe_by_key

    labels = (
        dedupe_by_key(sym, ["src"])
        .map_batches(
            lambda df: pd.DataFrame({"node": df["src"], "label": df["src"]}),
            batch_format="pandas",
        )
        .materialize()
    )

    from ..ops.relational import hash_join

    prev_sum = _labels_checksum(labels)
    for _round in range(cfg.cc_max_rounds):
        msgs = hash_join(
            sym, labels, on=("src",), right_on=("node",), num_partitions=P
        ).map_batches(
            lambda df: pd.DataFrame({"node": df["dst"], "label": df["label"]}),
            batch_format="pandas",
        )
        labels = (
            msgs.union(labels)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        cur_sum = _labels_checksum(labels)
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def connected_components_local(edges) -> pd.DataFrame:
    """Driver union-find over a provably-small edge set (streamed)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min keeps the label content-defined
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
            parent.setdefault(lo, lo)

    for batch in edges.select_columns(["url_a", "url_b"]).iter_batches(
        batch_size=65536, batch_format="pandas"
    ):
        for a, b in zip(batch["url_a"].to_numpy(), batch["url_b"].to_numpy()):
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            union(a, b)

    nodes = list(parent.keys())
    return pd.DataFrame({"node": nodes, "label": [find(n) for n in nodes]})


def resolve_labels(edges, cfg: ERConfig = DEFAULT_CONFIG) -> "ray.data.Dataset":
    """Pick the clustering path by measured edge count (edges should be
    materialized by the caller — counting is then metadata-only)."""
    n_edges = edges.count()
    if n_edges == 0:
        return ray.data.from_pandas(
            pd.DataFrame({"node": pd.Series(dtype=object), "label": pd.Series(dtype=object)})
        )
    if n_edges <= cfg.local_cc_max_edges:
        return ray.data.from_pandas(connected_components_local(edges))
    return connected_components(edges, cfg)


def confidence_stage(edges) -> "ray.data.Dataset":
    """Per-node ConfidenceLevel = max incident matched-edge score
    (reference: ER's per-record ConfidenceLevel, `lib/data-storage.ts:166-170`)."""

    def _both(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": np.concatenate([df["url_a"].to_numpy(), df["url_b"].to_numpy()]),
                "score": np.concatenate([df["score"].to_numpy(), df["score"].to_numpy()]),
            }
        )

    return (
        edges.map_batches(_both, batch_format="pandas")
        .groupby("node")
        .aggregate(Max("score", alias_name="ConfidenceLevel"))
    )
