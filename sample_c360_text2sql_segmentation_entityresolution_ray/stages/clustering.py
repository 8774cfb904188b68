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
``cc_max_rounds``.  If the cap is hit before the fixpoint (a
transitive chain with diameter > cap), the pass does NOT return the
partial labels: it contracts the graph by them and finishes the
quotient with the O(log²)-round alternating large-star/small-star
algorithm (`ops/graph.py::connected_components_alternating`), so the
returned labels are always the exact component minimum.

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
    converged = False
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
            converged = True
            break
        prev_sum = cur_sum
    if converged:
        return labels

    # Round cap hit without a fixpoint: a component with diameter >
    # cc_max_rounds (a pathological transitive chain).  Returning the
    # partial labels would split that component silently — instead
    # CONTRACT the graph by the partial labels (the quotient has one
    # node per partial label, so it is much smaller than the input)
    # and finish it with the alternating large-star/small-star pass
    # (ops/graph.py), which closes any residual diameter in O(log²)
    # rounds.  Compose: node → partial label → quotient component.
    from ..ops.graph import connected_components_alternating
    from ..ops.relational import grouped_aggregate

    # TWO chained lazy joins run their aggregator pools CONCURRENTLY:
    # at P=16 each, 32 actors × 0.25 cpu consume an entire 8-cpu
    # cluster and the upstream map tasks starve (observed hang at
    # sf0.1/8 cpus) — halve the partitions so the pair of pools
    # leaves cpus for the stages feeding them.
    P2 = max(2, P // 2)
    half = hash_join(
        sym, labels, on=("src",), right_on=("node",), num_partitions=P2
    ).map_batches(
        lambda df: pd.DataFrame({"dst": df["dst"], "la": df["label"]}),
        batch_format="pandas",
    )
    quotient = hash_join(
        half, labels, on=("dst",), right_on=("node",), num_partitions=P2
    ).map_batches(
        lambda df: pd.DataFrame({"src": df["la"], "dst": df["label"]}),
        batch_format="pandas",
    )
    q_edges = grouped_aggregate(
        quotient, ["src", "dst"], [("count_star", None, "_n")]
    ).drop_columns(["_n"]).materialize()
    q_labels = connected_components_alternating(
        q_edges, max_rounds=max(cfg.cc_max_rounds, 60)
    ).map_batches(
        lambda df: pd.DataFrame(
            {"qnode": df["node"], "component": df["component"]}
        ),
        batch_format="pandas",
    )
    return hash_join(
        labels, q_labels, on=("label",), right_on=("qnode",), num_partitions=P
    ).map_batches(
        lambda df: pd.DataFrame({"node": df["node"], "label": df["component"]}),
        batch_format="pandas",
    ).materialize()


class LocalUnionFind:
    """Driver union-find with min-label convergence (content-defined:
    the component label is its minimum node, never partition order).
    Feed edge batches as they stream; read labels at the end."""

    def __init__(self):
        self.parent: dict = {}

    def _find(self, x):
        parent = self.parent
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    def add_edges(self, a_arr, b_arr) -> None:
        parent = self.parent
        for a, b in zip(a_arr, b_arr):
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = self._find(a), self._find(b)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
                parent.setdefault(lo, lo)

    def label_map(self) -> dict:
        return {n: self._find(n) for n in self.parent}

    def labels_frame(self) -> pd.DataFrame:
        m = self.label_map()
        return pd.DataFrame({"node": list(m.keys()), "label": list(m.values())})


def connected_components_local(edges) -> pd.DataFrame:
    """Driver union-find over a provably-small edge set (streamed)."""
    uf = LocalUnionFind()
    for batch in edges.select_columns(["url_a", "url_b"]).iter_batches(
        batch_size=65536, batch_format="pandas"
    ):
        uf.add_edges(batch["url_a"].to_numpy(), batch["url_b"].to_numpy())
    return uf.labels_frame()


def collect_edges_local(edges_plan, max_edges: int):
    """Consume the matched-edge plan in ONE driver pass, overlapping
    union-find and per-node max-score (ConfidenceLevel) with the
    stream — removes the materialize barrier + two re-reads the
    split-stage version paid.

    Returns ``(edges_df, label_map, conf_map)`` or ``None`` if the
    stream exceeds ``max_edges`` (caller falls back to the distributed
    materialize + min-label-propagation path; at web scale set the
    config so the fallback is chosen up front rather than after a
    partial stream)."""
    pieces: list[pd.DataFrame] = []
    uf = LocalUnionFind()
    conf: dict = {}
    n = 0
    for batch in edges_plan.iter_batches(batch_size=65536, batch_format="pandas"):
        n += len(batch)
        if n > max_edges:
            return None
        pieces.append(batch)
        a = batch["url_a"].to_numpy()
        b = batch["url_b"].to_numpy()
        s = batch["score"].to_numpy()
        uf.add_edges(a, b)
        for nodes in (a, b):
            for node, sc in zip(nodes, s):
                prev = conf.get(node)
                if prev is None or sc > prev:
                    conf[node] = sc
    if pieces:
        edges_df = pd.concat(pieces, ignore_index=True)
    else:
        edges_df = pd.DataFrame(
            {
                "url_a": pd.Series(dtype=object),
                "url_b": pd.Series(dtype=object),
                "jaccard": pd.Series(dtype=float),
                "cosine": pd.Series(dtype=float),
                "jw": pd.Series(dtype=float),
                "score": pd.Series(dtype=float),
                "block_n": pd.Series(dtype=np.int32),
            }
        )
    return edges_df, uf.label_map(), conf


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

    from ..ops.relational import grouped_aggregate

    return grouped_aggregate(
        edges.map_batches(_both, batch_format="pandas"),
        ["node"],
        [("max", "score", "ConfidenceLevel")],
    )
