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

import numpy as np
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


def triangle_count(
    edges: "ray.data.Dataset",
    src: str = "src",
    dst: str = "dst",
    broadcast_limit: int = 2_000_000,
    num_partitions: int | None = None,
    edge_broadcast_limit: int | None = None,
) -> "ray.data.Dataset":
    """Exact triangle census of the undirected graph ``edges`` — ONE
    row ``(n_triangles,)``.  The identity-graph quality signal (a
    linkage graph whose triangle density collapses after a threshold
    change has lost its clique structure).

    Degree-ordered node-iterator (Schank-Wagner / Latapy): orient each
    edge from the (degree, id)-smaller endpoint to the larger, emit
    the out-neighbor pairs of every node (wedges), and count wedges
    that are themselves oriented edges.  The orientation makes the
    graph a DAG with max out-degree O(√m), so wedge volume is
    O(m^1.5) TOTAL regardless of hub skew — a raw node-iterator on a
    100-TB web graph dies on the first hub, this one provably cannot.

    Exchanges: (1) edge distinct + degree census, two slim combiner
    shuffles; (2) one sort shuffle grouping oriented edges by source
    for wedge emission; (3) closure check — the oriented edge set
    broadcasts as a sorted packed-int64 array under ``broadcast_limit``
    (binary-search membership per wedge batch, zero shuffle), else the
    wedge stream hash-joins the edge table.  Int node ids < 2^31 take
    the packed path; anything else routes to the join.
    """
    import numpy as np

    from .relational import grouped_aggregate, hash_join

    # 1) canonical distinct undirected edges (a < b, no self-loops)
    def _canon(df: pd.DataFrame) -> pd.DataFrame:
        u, v = df[src].to_numpy(), df[dst].to_numpy()
        keep = u != v
        u, v = u[keep], v[keep]
        a = np.minimum(u, v)
        b = np.maximum(u, v)
        return pd.DataFrame({"a": a, "b": b}).drop_duplicates()

    e = grouped_aggregate(
        edges.select_columns([src, dst]).map_batches(
            _canon, batch_format="pandas"
        ),
        ["a", "b"],
        [("count_star", None, "_n")],
        num_partitions,
    ).drop_columns(["_n"]).materialize()

    # 2) degree census (slim: one (node, partial) row per block)
    def _ends(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": np.concatenate([df["a"].to_numpy(), df["b"].to_numpy()])}
        )

    deg = grouped_aggregate(
        e.map_batches(_ends, batch_format="pandas"),
        ["node"],
        [("count_star", None, "deg")],
        num_partitions,
    ).materialize()

    n_nodes = deg.count()
    if n_nodes > broadcast_limit:
        raise NotImplementedError(
            "degree table above broadcast_limit: attach degrees via two "
            "hash joins (same two-phase shape as the ER join plan); not "
            "needed at sandbox scale — raise broadcast_limit or pre-bucket"
        )
    ddf = deg.to_pandas()
    deg_map = ray.put(
        dict(zip(ddf["node"].to_numpy(), ddf["deg"].to_numpy(np.int64)))
    )

    # 3) orient by (deg, id) total order: u -> v iff (deg_u, u) < (deg_v, v)
    def _orient(df: pd.DataFrame) -> pd.DataFrame:
        dm = ray.get(deg_map)
        a, b = df["a"].to_numpy(), df["b"].to_numpy()
        da = np.fromiter((dm[x] for x in a), np.int64, count=len(a))
        db = np.fromiter((dm[x] for x in b), np.int64, count=len(b))
        a_first = (da < db) | ((da == db) & (a < b))
        return pd.DataFrame(
            {"u": np.where(a_first, a, b), "v": np.where(a_first, b, a),
             "dv": np.where(a_first, db, da)}
        )

    oriented = e.map_batches(_orient, batch_format="pandas").materialize()
    n_edges = oriented.count()

    # 4) wedges: all ordered out-neighbor pairs of each source node
    def _wedges(g: pd.DataFrame) -> pd.DataFrame:
        v = g["v"].to_numpy()
        d = g["dv"].to_numpy()
        order = np.lexsort((v, d))  # the SAME total order as _orient
        v = v[order]
        k = len(v)
        if k < 2:
            return pd.DataFrame({"u": v[:0], "v": v[:0]})
        i, j = np.triu_indices(k, 1)
        return pd.DataFrame({"u": v[i], "v": v[j]})

    wedges = oriented.groupby("u").map_groups(_wedges, batch_format="pandas")

    # 5) closure: wedge (x, y) counts iff x -> y is an oriented edge
    packed_ok = pd.api.types.is_integer_dtype(ddf["node"]) and (
        0 <= int(ddf["node"].min()) and int(ddf["node"].max()) < (1 << 31)
    )
    e_limit = broadcast_limit if edge_broadcast_limit is None else edge_broadcast_limit
    if n_edges <= e_limit and packed_ok:
        odf = oriented.to_pandas()
        keys = np.sort(
            (odf["u"].to_numpy(np.int64) << 32) | odf["v"].to_numpy(np.int64)
        )
        keys_ref = ray.put(keys)

        def _close(df: pd.DataFrame) -> pd.DataFrame:
            ks = ray.get(keys_ref)
            if not len(ks) or not len(df):
                return pd.DataFrame({"n": [np.int64(0)]})
            w = (df["u"].to_numpy(np.int64) << 32) | df["v"].to_numpy(np.int64)
            pos = np.searchsorted(ks, w)
            hit = (pos < len(ks)) & (ks[np.minimum(pos, len(ks) - 1)] == w)
            return pd.DataFrame({"n": [np.int64(hit.sum())]})

        partials = wedges.map_batches(_close, batch_format="pandas")
    else:
        import pyarrow as pa

        node_dtype = ddf["node"].dtype

        def _typed(df: pd.DataFrame) -> "pa.Table":
            # map_groups can emit schema-less empty blocks that crash
            # the Acero key resolver — pin the (u, v) schema
            if "u" not in df.columns:
                df = pd.DataFrame(
                    {"u": pd.Series(dtype=node_dtype),
                     "v": pd.Series(dtype=node_dtype)}
                )
            return pa.Table.from_pandas(
                df[["u", "v"]], preserve_index=False
            )

        joined = hash_join(
            wedges.map_batches(_typed, batch_format="pandas"),
            oriented.drop_columns(["dv"]), on=("u", "v"),
            num_partitions=max(2, min(64, n_edges // 1000 + 2)),
        )
        partials = joined.map_batches(
            lambda df: pd.DataFrame({"n": [np.int64(len(df))]}),
            batch_format="pandas",
        )

    total = int(partials.to_pandas()["n"].sum())  # one row per block
    return ray.data.from_pandas(
        pd.DataFrame({"n_triangles": [np.int64(total)]})
    )


def clustering_coefficient(
    edges: "ray.data.Dataset",
    src: str = "src",
    dst: str = "dst",
    broadcast_limit: int = 2_000_000,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Per-node local clustering coefficient over the undirected graph:
    ``(node, deg, tri, lcc)`` with ``lcc = 2·tri / (deg·(deg−1))``
    (0.0 below degree 2) — the neighborhood-density signal community
    detectors and link-spam filters read per node, where
    :func:`triangle_count` reads one global number.

    Same degree-ordered Schank-Wagner machinery as
    :func:`triangle_count` — orientation makes wedge volume O(m^1.5)
    total regardless of hub skew — but each CLOSED wedge credits all
    three corners: the wedge stream keeps its center, closure hits
    explode to three (node,) rows, and a slim combiner count reduces
    them.  Exchanges: two slim combiner shuffles (edges, degrees), one
    sort shuffle for wedge emission, one (node,) combiner reduce; the
    oriented edge set broadcasts as a sorted packed-int64 array
    (int ids < 2^31 required for the packed membership probe).
    """
    import numpy as np

    from .relational import grouped_aggregate

    def _canon(df: pd.DataFrame) -> pd.DataFrame:
        u, v = df[src].to_numpy(), df[dst].to_numpy()
        keep = u != v
        u, v = u[keep], v[keep]
        a = np.minimum(u, v)
        b = np.maximum(u, v)
        return pd.DataFrame({"a": a, "b": b}).drop_duplicates()

    e = grouped_aggregate(
        edges.select_columns([src, dst]).map_batches(
            _canon, batch_format="pandas"
        ),
        ["a", "b"],
        [("count_star", None, "_n")],
        num_partitions,
    ).drop_columns(["_n"]).materialize()

    def _ends(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": np.concatenate([df["a"].to_numpy(), df["b"].to_numpy()])}
        )

    deg = grouped_aggregate(
        e.map_batches(_ends, batch_format="pandas"),
        ["node"],
        [("count_star", None, "deg")],
        num_partitions,
    ).materialize()

    if deg.count() > broadcast_limit:
        raise NotImplementedError(
            "degree table above broadcast_limit: attach degrees via a "
            "hash join (two-phase ER join plan shape); raise the limit "
            "or pre-bucket at sandbox scale"
        )
    ddf = deg.to_pandas()
    if not (
        pd.api.types.is_integer_dtype(ddf["node"])
        and 0 <= int(ddf["node"].min())
        and int(ddf["node"].max()) < (1 << 31)
    ):
        raise NotImplementedError(
            "packed closure probe needs int node ids < 2^31; remap via "
            "relational.dense_ids first"
        )
    deg_map = ray.put(
        dict(zip(ddf["node"].to_numpy(), ddf["deg"].to_numpy(np.int64)))
    )

    def _orient(df: pd.DataFrame) -> pd.DataFrame:
        dm = ray.get(deg_map)
        a, b = df["a"].to_numpy(), df["b"].to_numpy()
        da = np.fromiter((dm[x] for x in a), np.int64, count=len(a))
        db = np.fromiter((dm[x] for x in b), np.int64, count=len(b))
        a_first = (da < db) | ((da == db) & (a < b))
        return pd.DataFrame(
            {"u": np.where(a_first, a, b), "v": np.where(a_first, b, a),
             "dv": np.where(a_first, db, da)}
        )

    oriented = e.map_batches(_orient, batch_format="pandas").materialize()
    odf = oriented.to_pandas()
    if len(odf) > broadcast_limit:
        raise NotImplementedError(
            "oriented edge set above broadcast_limit: closure must hash-"
            "join the wedge stream (triangle_count's fallback shape)"
        )
    keys_ref = ray.put(
        np.sort((odf["u"].to_numpy(np.int64) << 32)
                | odf["v"].to_numpy(np.int64))
    )

    # wedges KEEP their center so closure can credit all three corners
    def _wedges(g: pd.DataFrame) -> pd.DataFrame:
        v = g["v"].to_numpy()
        d = g["dv"].to_numpy()
        order = np.lexsort((v, d))  # the SAME total order as _orient
        v = v[order]
        k = len(v)
        if k < 2:
            return pd.DataFrame({"c": v[:0], "x": v[:0], "y": v[:0]})
        i, j = np.triu_indices(k, 1)
        c = np.full(len(i), g["u"].iloc[0])
        return pd.DataFrame({"c": c, "x": v[i], "y": v[j]})

    wedges = oriented.groupby("u").map_groups(_wedges, batch_format="pandas")

    def _closed_corners(df: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(keys_ref)
        if not len(df) or "x" not in df.columns or not len(ks):
            return pd.DataFrame({"node": pd.Series(dtype=np.int64)})
        w = (df["x"].to_numpy(np.int64) << 32) | df["y"].to_numpy(np.int64)
        pos = np.searchsorted(ks, w)
        hit = (pos < len(ks)) & (ks[np.minimum(pos, len(ks) - 1)] == w)
        return pd.DataFrame(
            {"node": np.concatenate(
                [df["c"].to_numpy(np.int64)[hit],
                 df["x"].to_numpy(np.int64)[hit],
                 df["y"].to_numpy(np.int64)[hit]]
            )}
        )

    tri = grouped_aggregate(
        wedges.map_batches(_closed_corners, batch_format="pandas"),
        ["node"],
        [("count_star", None, "tri")],
        num_partitions,
    )
    tdf = tri.to_pandas()  # ≤ one row per node, already reduced
    out = ddf.merge(tdf, on="node", how="left")
    out["tri"] = out["tri"].fillna(0).astype(np.int64)
    out["deg"] = out["deg"].astype(np.int64)
    # 2·tri / (deg·(deg−1)) in exactly this association so the value
    # bit-matches a SQL `tri*2.0/(deg*(deg-1.0))` oracle pre-rounding
    d = out["deg"].to_numpy(np.float64)
    denom = d * (d - 1.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        lcc = np.where(
            denom > 0, out["tri"].to_numpy(np.float64) * 2.0 / denom, 0.0
        )
    out["lcc"] = lcc
    return ray.data.from_pandas(out.sort_values("node").reset_index(drop=True))


__all__ = [
    "connected_components",
    "component_sizes",
    "triangle_count",
    "clustering_coefficient",
    "pagerank",
]


def pagerank(
    edges: "ray.data.Dataset",
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 3,
    node_broadcast_limit: int = 2_000_000,
) -> "ray.data.Dataset":
    """Fixed-iteration PageRank with dangling-mass redistribution:

        r'(v) = (1-d)/N + d·(Σ_{u→v} r(u)/outdeg(u) + D/N),
        D = Σ_{outdeg(u)=0} r(u),  r₀ = 1/N.

    A FIXED iteration count keeps the op SQL-oracle-checkable (the
    oracle unrolls the same recurrence); convergence loops just call
    with higher ``iterations``.

    Scale shape: the rank state is O(#nodes) and edges stream once per
    iteration.  ≤ ``node_broadcast_limit`` nodes: ranks broadcast as a
    (node → r/outdeg) dict, each edge batch pre-aggregates per-dst
    partials, one slim combiner shuffle per iteration, driver folds the
    O(#nodes) result.  Above: ranks stay a Dataset — edges hash-join
    ranks on ``src`` (per-iteration exchange of slim (src, r/od) rows),
    contributions combine by ``dst``, and a left join onto the node
    table applies the fold; the driver only ever sees scalars.  Both
    paths are bit-equal on the same input (modulo float-sum
    association; tested).  Multi-edges count once each, as SQL does.
    """
    import numpy as np

    from .relational import grouped_aggregate, hash_join

    if iterations < 1:
        raise ValueError("iterations must be ≥ 1")
    d = float(damping)

    e = edges.select_columns([src, dst]).materialize()

    def _node_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": pd.concat([df[src], df[dst]], ignore_index=True).unique()}
        )

    nodes = grouped_aggregate(
        e.map_batches(_node_rows, batch_format="pandas"),
        ["node"],
        [("count_star", None, "_x")],
    ).drop_columns(["_x"])
    outd = grouped_aggregate(e, [src], [("count_star", None, "od")])

    def _od_rename(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df[src], "od": df["od"]})

    outd = outd.map_batches(_od_rename, batch_format="pandas")
    nd = hash_join(nodes, outd, on=("node",), how="left_outer").materialize()
    n_nodes = nd.count()
    if n_nodes == 0:
        raise ValueError("pagerank: edge table is empty")

    if n_nodes <= node_broadcast_limit:
        ndf = nd.to_pandas()
        ndf["od"] = ndf["od"].fillna(0).astype(np.int64)
        ndf = ndf.sort_values("node", kind="mergesort").reset_index(drop=True)
        node_arr = ndf["node"].to_numpy()
        od = ndf["od"].to_numpy(np.float64)
        r = np.full(len(ndf), 1.0 / n_nodes, dtype=np.float64)
        for _ in range(iterations):
            share = np.where(od > 0, r / np.where(od > 0, od, 1.0), 0.0)
            ref = ray.put(dict(zip(node_arr, share)))

            def _contrib(df: pd.DataFrame) -> pd.DataFrame:
                sh = ray.get(ref)
                v = df[src].map(sh).to_numpy(np.float64)
                g = pd.DataFrame({"node": df[dst], "_c": v}).groupby(
                    "node", sort=False
                )["_c"].sum()
                return pd.DataFrame(
                    {"node": g.index.to_numpy(), "_c": g.to_numpy()}
                )

            agg = grouped_aggregate(
                e.map_batches(_contrib, batch_format="pandas"),
                ["node"],
                [("sum", "_c", "c")],
            ).to_pandas()
            cin = np.zeros(len(ndf), dtype=np.float64)
            pos = np.searchsorted(node_arr, agg["node"].to_numpy())
            cin[pos] = agg["c"].to_numpy(np.float64)
            dangling = float(r[od == 0].sum())
            r = (1.0 - d) / n_nodes + d * (cin + dangling / n_nodes)
        return ray.data.from_pandas(
            pd.DataFrame({"node": node_arr, "rank": r})
        )

    # distributed-rank path: the state never collects
    def _init(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["od"] = out["od"].fillna(0).astype(np.int64)
        out["r"] = 1.0 / n_nodes
        return out

    ranks = nd.map_batches(_init, batch_format="pandas").materialize()
    for _ in range(iterations):
        dang = (
            ranks.map_batches(
                lambda df: pd.DataFrame(
                    {"_d": [df.loc[df["od"] == 0, "r"].sum()]}
                ),
                batch_format="pandas",
            ).to_pandas()["_d"].sum()
        )

        def _share(df: pd.DataFrame) -> pd.DataFrame:
            keep = df[df["od"] > 0]
            return pd.DataFrame(
                {
                    "_sn": keep["node"],
                    "_sh": keep["r"].to_numpy(np.float64)
                    / keep["od"].to_numpy(np.float64),
                }
            )

        shares = ranks.map_batches(_share, batch_format="pandas")
        j = hash_join(e, shares, on=(src,), right_on=("_sn",))

        def _edge_contrib(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"node": df[dst], "_c": df["_sh"]})

        # Slim O(#nodes) table; materializing it keeps ONE join
        # aggregator pool live at a time (two chained pools starve a
        # small cluster's executor — observed deadlock at 4 CPUs).
        contrib = grouped_aggregate(
            j.map_batches(_edge_contrib, batch_format="pandas"),
            ["node"],
            [("sum", "_c", "c")],
        ).materialize()

        # Fold contributions onto the node table WITHOUT a second join:
        # union (node, od, c=0) rows with (node, od=0, c) rows and sum
        # both columns — od arrives exactly once (from the node side).
        def _zero_c(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "node": df["node"],
                    "od": df["od"].to_numpy(np.int64),
                    "c": np.zeros(len(df), dtype=np.float64),
                }
            )

        def _zero_od(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "node": df["node"],
                    "od": np.zeros(len(df), dtype=np.int64),
                    "c": df["c"].to_numpy(np.float64),
                }
            )

        folded = grouped_aggregate(
            ranks.map_batches(_zero_c, batch_format="pandas").union(
                contrib.map_batches(_zero_od, batch_format="pandas")
            ),
            ["node"],
            [("sum", "c", "c"), ("sum", "od", "od")],
        )
        base = (1.0 - d) / n_nodes
        dpn = dang / n_nodes

        def _fold(df: pd.DataFrame) -> pd.DataFrame:
            c = df["c"].to_numpy(np.float64)
            # same float form as the broadcast path: base + d*(c + D/N)
            return pd.DataFrame(
                {
                    "node": df["node"],
                    "od": df["od"].to_numpy(np.int64),
                    "r": base + d * (c + dpn),
                }
            )

        ranks = folded.map_batches(_fold, batch_format="pandas").materialize()

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df["node"], "rank": df["r"]})

    return ranks.map_batches(_final, batch_format="pandas")


__all__ += ["bfs_distance"]


def bfs_distance(
    edges: "ray.data.Dataset",
    seeds: "ray.data.Dataset",
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    iterations: int = 3,
    node_broadcast_limit: int = 2_000_000,
) -> "ray.data.Dataset":
    """Multi-source BFS over the DIRECTED graph ``edges``: every
    distinct seed gets hops=0, and each of ``iterations`` rounds adds
    the unreached out-neighbors of the frontier at hops=round.  Output:
    ``(node, hops)`` — the minimum hop count ≤ ``iterations``.  A FIXED
    round count keeps the op SQL-oracle-checkable (the oracle unrolls
    the rounds); reachability closures just pass a diameter bound.

    Scale shape: the visited state is O(#reached nodes) and edges
    stream once per round.  ≤ ``node_broadcast_limit`` distinct seeds
    + reached nodes: the frontier broadcasts as a sorted array, each
    edge batch emits its per-batch-distinct hit dsts, one combiner
    shuffle distincts them, the driver folds the O(#nodes) dict.
    Above: visited/frontier stay Datasets — edges hash-join the
    frontier on ``src``, reached dsts distinct through a combiner
    shuffle, and an anti-join against the visited table (broadcast
    ≤ cap, hash-partition exchange above) yields the next frontier;
    every interchange is slim (node, hops) rows.  Early-exits when a
    frontier empties.  Both paths are exactly equal (integer hops).
    """
    import numpy as np

    from .relational import anti_join, grouped_aggregate, hash_join

    if iterations < 0:
        raise ValueError("iterations must be ≥ 0")

    e = edges.select_columns([src, dst]).materialize()
    seed_ds = (
        grouped_aggregate(
            seeds.select_columns([seed_col]).map_batches(
                lambda df: pd.DataFrame({"node": df[seed_col]}),
                batch_format="pandas",
            ),
            ["node"],
            [("count_star", None, "_x")],
        )
        .drop_columns(["_x"])
        .materialize()
    )
    n_seeds = seed_ds.count()
    if n_seeds == 0:
        raise ValueError("bfs_distance: no seed nodes")

    if n_seeds <= node_broadcast_limit:
        seed_arr = seed_ds.to_pandas()["node"].to_numpy()  # native dtype
        dist = dict.fromkeys(seed_arr.tolist(), 0)
        frontier = np.sort(seed_arr)
        for hop in range(1, iterations + 1):
            if len(frontier) == 0 or len(dist) > node_broadcast_limit:
                break
            ref = ray.put(frontier)

            def _hits(df: pd.DataFrame) -> pd.DataFrame:
                fr = ray.get(ref)
                sv = df[src].to_numpy()
                pos = np.searchsorted(fr, sv)
                pos[pos >= len(fr)] = 0
                mask = fr[pos] == sv
                return pd.DataFrame(
                    {"node": pd.unique(df.loc[mask, dst].to_numpy())}
                )

            rdf = grouped_aggregate(
                e.map_batches(_hits, batch_format="pandas"),
                ["node"],
                [("count_star", None, "_x")],
            ).to_pandas()
            # a fully-empty round comes back COLUMN-LESS (zero-row
            # blocks skip the aggregate), not as an empty typed frame
            if "node" not in rdf.columns:
                break
            reached = rdf["node"].to_numpy()
            new = [n for n in reached.tolist() if n not in dist]
            if not new:
                break
            for n in new:
                dist[n] = hop
            frontier = np.sort(np.array(new, dtype=seed_arr.dtype))
        out = pd.DataFrame(
            {"node": list(dist), "hops": np.fromiter(dist.values(), np.int64)}
        )
        return ray.data.from_pandas(out)

    # distributed path: visited/frontier never collect
    def _zero(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["hops"] = np.int64(0)
        return out

    visited = seed_ds.map_batches(_zero, batch_format="pandas").materialize()
    frontier = visited
    n_frontier = n_seeds
    for hop in range(1, iterations + 1):
        j = hash_join(
            e,
            frontier.select_columns(["node"]).map_batches(
                lambda df: pd.DataFrame({"_fn": df["node"]}),
                batch_format="pandas",
            ),
            on=(src,),
            right_on=("_fn",),
            # partitions sized to the (known) frontier: an all-empty
            # partition crashes Acero's finalize on the _fn FieldRef
            num_partitions=max(2, min(64, n_frontier // 1000 + 2)),
        )
        # slim distinct; materialized so only one join pool runs at a time
        reached = (
            grouped_aggregate(
                j.map_batches(
                    lambda df: pd.DataFrame({"node": df[dst]}),
                    batch_format="pandas",
                ),
                ["node"],
                [("count_star", None, "_x")],
            )
            .drop_columns(["_x"])
            .materialize()
        )
        hop_i = np.int64(hop)

        def _stamp(df: pd.DataFrame, _h=hop_i) -> pd.DataFrame:
            out = df.copy()
            out["hops"] = _h
            return out

        # repartition scrubs the ZERO-COLUMN empty blocks Ray's hash
        # join emits for empty partitions (map_batches passes zero-row
        # blocks through UNCALLED, so they'd poison the next hop's
        # Acero join and the pandas/Arrow-mixed union)
        new = (
            anti_join(reached, visited, on="node")
            .map_batches(_stamp, batch_format="pandas")
            .repartition(max(2, min(64, n_frontier // 100_000 + 2)))
            .materialize()
        )
        n_frontier = new.count()
        if n_frontier == 0:
            break
        visited = visited.union(new).materialize()
        frontier = new
    return visited


__all__ += ["adamic_adar"]


def adamic_adar(
    edges: "ray.data.Dataset",
    src: str = "src",
    dst: str = "dst",
    min_common: int = 2,
    degree_cap: int | None = None,
    partitions: int = 64,
) -> "ray.data.Dataset":
    """Adamic-Adar link-prediction scores over the UNDIRECTED simple
    graph of ``edges``: for every node pair (a < b) with ≥
    ``min_common`` common neighbors, ``aa = Σ_v 1/ln(deg(v))`` over the
    common neighbors v, plus the common-neighbor count ``cn``.  The
    classic graph feature for "customers who bought X also..." style
    candidate generation.  Output: ``(a, b, cn, aa)``.

    Scale shape: distinct undirected edges come from one combiner
    shuffle; each node's full neighborhood co-locates under ONE
    node-hash exchange of slim (center, neighbor) rows (the documented
    partitioning assumption: a node's adjacency fits one partition);
    wedge pairs emit with their center's 1/ln(d) weight and reduce
    through a (a, b)-keyed combiner.  Wedge volume is Σ deg² — pass
    ``degree_cap`` to skip hub centers (their per-wedge weight
    1/ln(d) → 0 anyway), which bounds the emit at cap × edges.
    """
    import numpy as np

    from .relational import grouped_aggregate

    def _und(df: pd.DataFrame) -> pd.DataFrame:
        s = df[src].to_numpy()
        d = df[dst].to_numpy()
        keep = s != d
        s, d = s[keep], d[keep]
        return pd.DataFrame({"u": np.minimum(s, d), "v": np.maximum(s, d)})

    und = (
        grouped_aggregate(
            edges.select_columns([src, dst]).map_batches(
                _und, batch_format="pandas"
            ),
            ["u", "v"],
            [("count_star", None, "_x")],
        )
        .drop_columns(["_x"])
        .materialize()
    )

    def _both(df: pd.DataFrame) -> pd.DataFrame:
        c = np.concatenate([df["u"].to_numpy(), df["v"].to_numpy()])
        n = np.concatenate([df["v"].to_numpy(), df["u"].to_numpy()])
        out = pd.DataFrame({"c": c, "n": n})
        out["_part"] = (
            pd.util.hash_pandas_object(out["c"], index=False).to_numpy()
            % partitions
        ).astype("int32")
        return out

    def _wedges(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, grp in g.groupby("c", sort=False):
            nb = np.sort(grp["n"].to_numpy())
            d = len(nb)
            if d < 2 or (degree_cap is not None and d > degree_cap):
                continue
            w = 1.0 / np.log(d)
            ii, jj = np.triu_indices(d, k=1)
            outs.append(
                pd.DataFrame({"a": nb[ii], "b": nb[jj], "_w": w})
            )
        if not outs:
            return pd.DataFrame(
                {
                    "a": pd.Series(dtype=g["n"].dtype),
                    "b": pd.Series(dtype=g["n"].dtype),
                    "_w": pd.Series(dtype=np.float64),
                }
            )
        return pd.concat(outs, ignore_index=True)

    wedges = (
        und.map_batches(_both, batch_format="pandas")
        .groupby("_part")
        .map_groups(_wedges, batch_format="pandas")
    )
    scored = grouped_aggregate(
        wedges,
        ["a", "b"],
        [("count_star", None, "cn"), ("sum", "_w", "aa")],
    )
    thr = int(min_common)

    def _filter(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["cn"] >= thr]

    return scored.map_batches(_filter, batch_format="pandas")


def kcore(
    edges: "ray.data.Dataset",
    k: int,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
) -> "ray.data.Dataset":
    """Fixed-``rounds`` k-core peeling (Seidman 1983; fixed-iteration
    like this module's `pagerank`, so the result is deterministic and
    SQL-unrollable): repeatedly drop nodes with fewer than ``k``
    distinct neighbors and the edges touching them, ``rounds`` times;
    return the surviving ``(node, degree)`` table (degree recounted on
    the final edge set).  With enough rounds this converges to the true
    k-core; a fixed count keeps the oracle expressible and the job wall
    bounded.

    Plan per round: degree census = one slim (node, partial-count)
    combiner exchange; the alive filter is TWO `semi_join`s (measured
    broadcast of the alive id set, hash-partition fallback above the
    cap) — edges never carry payload, so each round moves O(|E|) ids.
    Self-loops dropped, duplicate edges collapsed once up front."""
    from .relational import grouped_aggregate, semi_join

    def _sym(df: pd.DataFrame) -> pd.DataFrame:
        a = df[src].to_numpy()
        b = df[dst].to_numpy()
        keep = a != b
        a, b = a[keep], b[keep]
        return pd.DataFrame(
            {"a": np.minimum(a, b), "b": np.maximum(a, b)}
        )

    undirected = grouped_aggregate(
        edges.map_batches(_sym, batch_format="pandas"),
        ["a", "b"],
        [("count_star", None, "_n")],
    ).drop_columns(["_n"])

    def _both(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "u": np.concatenate([df["a"].to_numpy(), df["b"].to_numpy()]),
                "v": np.concatenate([df["b"].to_numpy(), df["a"].to_numpy()]),
            }
        )

    cur = undirected.map_batches(_both, batch_format="pandas").materialize()
    for _ in range(rounds):
        deg = grouped_aggregate(cur, ["u"], [("count_star", None, "d")])
        alive = deg.filter(expr=f"d >= {int(k)}").select_columns(["u"])
        cur = semi_join(
            semi_join(cur, alive, on="u"), alive, on="v", right_on="u"
        ).materialize()

    out = grouped_aggregate(cur, ["u"], [("count_star", None, "degree")])

    def _name(df: pd.DataFrame) -> pd.DataFrame:
        # blocks here are pandas; Dataset.rename_columns projects
        # Arrow-only in Ray 2.49
        return df.rename(columns={"u": "node"})

    return out.map_batches(_name, batch_format="pandas")


def label_propagation(
    edges: "ray.data.Dataset",
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    broadcast_limit: int = 2_000_000,
) -> "ray.data.Dataset":
    """Fixed-``rounds`` SYNCHRONOUS label propagation (Raghavan 2007,
    determinized): labels start as node ids; each round every node
    adopts the label most frequent among its neighbors, ties broken by
    the SMALLEST label; all nodes update together.  Deterministic (no
    random tie order), so SQL-unrollable — the community-detection
    counterpart of `connected_components` (which this module keeps for
    exact transitive closure; LPA finds denser-than-chance groups).

    Plan per round: the O(#nodes) label table broadcasts (measured,
    ``broadcast_limit``) into a stateless edge map; (node, label)
    candidate counts cross one combiner exchange; per-node argmax is a
    groupby over ≤ #distinct-neighbor-label rows.  Edges never carry
    payload.  Above the broadcast cap, attach labels with a hash join
    instead (the label table is the small side until the graph has
    >2M nodes — then both sides exchange once, same shape as the CC
    label rounds).  Output: ``(node, label)``."""
    from .relational import grouped_aggregate, hash_join

    def _sym(df: pd.DataFrame) -> pd.DataFrame:
        a = df[src].to_numpy()
        b = df[dst].to_numpy()
        keep = a != b
        a, b = a[keep], b[keep]
        return pd.DataFrame({"a": np.minimum(a, b), "b": np.maximum(a, b)})

    undirected = grouped_aggregate(
        edges.map_batches(_sym, batch_format="pandas"),
        ["a", "b"],
        [("count_star", None, "_n")],
    ).drop_columns(["_n"])

    def _both(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "u": np.concatenate([df["a"].to_numpy(), df["b"].to_numpy()]),
                "v": np.concatenate([df["b"].to_numpy(), df["a"].to_numpy()]),
            }
        )

    sym = undirected.map_batches(_both, batch_format="pandas").materialize()

    # lab: (node, lab), initialized to the node id itself
    lab = (
        grouped_aggregate(
            sym.select_columns(["u"]), ["u"], [("count_star", None, "_n")]
        )
        .drop_columns(["_n"])
        .map_batches(
            lambda df: pd.DataFrame({"node": df["u"], "lab": df["u"]}),
            batch_format="pandas",
        )
        .materialize()
    )

    for _ in range(rounds):
        n_nodes = lab.count()
        if n_nodes <= broadcast_limit:
            ldf = lab.to_pandas()
            ref = ray.put(
                dict(zip(ldf["node"].to_numpy(), ldf["lab"].to_numpy()))
            )

            def _attach(df: pd.DataFrame, _r=ref) -> pd.DataFrame:
                lm = ray.get(_r)
                u = df["u"].to_numpy()
                return pd.DataFrame(
                    {
                        "v": df["v"],
                        "lab": np.fromiter(
                            (lm[x] for x in u), np.int64, count=len(u)
                        ),
                    }
                )

            cand = sym.map_batches(_attach, batch_format="pandas")
        else:
            cand = hash_join(
                sym, lab, on=["u"], right_on=["node"]
            ).select_columns(["v", "lab"])
        counts = grouped_aggregate(
            cand, ["v", "lab"], [("count_star", None, "c")]
        )

        def _argmax(g: pd.DataFrame) -> pd.DataFrame:
            srt = g.sort_values(
                ["c", "lab"], ascending=[False, True], kind="mergesort"
            )
            return pd.DataFrame(
                {"node": [srt["v"].iloc[0]], "lab": [srt["lab"].iloc[0]]}
            )

        lab = (
            counts.groupby("v").map_groups(_argmax, batch_format="pandas")
        ).materialize()

    return lab


__all__ += ["hits"]


def hits(
    edges: "ray.data.Dataset",
    src: str = "src",
    dst: str = "dst",
    iterations: int = 2,
    node_broadcast_limit: int = 2_000_000,
) -> "ray.data.Dataset":
    """Kleinberg HITS (JACM 1999) hubs & authorities, fixed
    iterations, L1-normalized each half-step:

        a'(v) = Σ_{u→v} h(u) / Σ·,   h'(u) = Σ_{u→v} a'(v) / Σ·

    with ``h₀ = 1`` for every node.  A FIXED iteration count keeps the
    op SQL-oracle-checkable (the oracle unrolls the same recurrence,
    like :func:`pagerank`); multi-edges count once each, as SQL does.

    Scale shape mirrors :func:`pagerank`: node state is O(#nodes) and
    edges stream once per half-step.  ≤ ``node_broadcast_limit``
    nodes: the state broadcasts as a dict, each edge batch
    pre-aggregates partials, ONE slim combiner shuffle per half-step,
    the driver folds the O(#nodes) vector.  Above the cap the state
    stays a Dataset: edges hash-join the state on the propagating end
    (slim (node, weight) rows only), contributions combine on the
    other end, and the normalizer is one scalar combiner pass — the
    driver only ever sees scalars.  Both paths are float-identical
    modulo sum association (tested equal at test scale).
    """
    import numpy as np

    from .relational import grouped_aggregate, hash_join

    if iterations < 1:
        raise ValueError("iterations must be ≥ 1")
    e = edges.select_columns([src, dst]).materialize()

    def _node_rows(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": pd.concat([df[src], df[dst]], ignore_index=True).unique()}
        )

    nodes = grouped_aggregate(
        e.map_batches(_node_rows, batch_format="pandas"),
        ["node"],
        [("count_star", None, "_x")],
    ).drop_columns(["_x"]).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        raise ValueError("hits: edge table is empty")

    if n_nodes <= node_broadcast_limit:
        ndf = nodes.to_pandas().sort_values("node", kind="mergesort")
        node_arr = ndf["node"].to_numpy()
        h = np.ones(len(node_arr), np.float64)
        a = np.zeros(len(node_arr), np.float64)

        def _propagate(state: np.ndarray, key_in: str, key_out: str):
            ref = ray.put(dict(zip(node_arr, state)))

            def _contrib(df: pd.DataFrame) -> pd.DataFrame:
                st = ray.get(ref)
                v = df[key_in].map(st).to_numpy(np.float64)
                g = pd.DataFrame({"node": df[key_out], "_c": v}).groupby(
                    "node", sort=False
                )["_c"].sum()
                return pd.DataFrame(
                    {"node": g.index.to_numpy(), "_c": g.to_numpy()}
                )

            agg = grouped_aggregate(
                e.map_batches(_contrib, batch_format="pandas"),
                ["node"],
                [("sum", "_c", "c")],
            ).to_pandas()
            out = np.zeros(len(node_arr), np.float64)
            pos = np.searchsorted(node_arr, agg["node"].to_numpy())
            out[pos] = agg["c"].to_numpy(np.float64)
            tot = out.sum()
            return out / tot if tot > 0 else out

        for _ in range(iterations):
            a = _propagate(h, src, dst)
            h = _propagate(a, dst, src)
        return ray.data.from_pandas(
            pd.DataFrame({"node": node_arr, "hub": h, "authority": a})
        )

    # distributed-state path: the node vectors never collect
    def _init(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["node"]].copy()
        out["h"] = 1.0
        out["a"] = 0.0
        return out

    state = nodes.map_batches(_init, batch_format="pandas").materialize()

    def _propagate_ds(state, col: str, key_in: str, key_out: str, out_col: str):
        slim = state.map_batches(
            lambda df, _c=col: pd.DataFrame(
                {"_sn": df["node"], "_w": df[_c].to_numpy(np.float64)}
            ),
            batch_format="pandas",
        )
        j = hash_join(e, slim, on=(key_in,), right_on=("_sn",))
        contrib = grouped_aggregate(
            j.map_batches(
                lambda df, _k=key_out: pd.DataFrame(
                    {"node": df[_k], "_c": df["_w"]}
                ),
                batch_format="pandas",
            ),
            ["node"],
            [("sum", "_c", "c")],
        ).materialize()
        tot = float(
            contrib.map_batches(
                lambda df: pd.DataFrame({"_t": [df["c"].sum()]}),
                batch_format="pandas",
            ).to_pandas()["_t"].sum()
        )
        inv = 1.0 / tot if tot > 0 else 0.0
        # fold normalized contributions onto the state without a second
        # join (the pagerank union-sum trick); the OTHER vector rides
        # through untouched
        other = "a" if out_col == "h" else "h"

        def _zero_c(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"node": df["node"],
                 "_keep": df[other].to_numpy(np.float64),
                 "c": np.zeros(len(df), np.float64)}
            )

        def _zero_keep(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"node": df["node"],
                 "_keep": np.zeros(len(df), np.float64),
                 "c": df["c"].to_numpy(np.float64) * inv}
            )

        folded = grouped_aggregate(
            state.map_batches(_zero_c, batch_format="pandas").union(
                contrib.map_batches(_zero_keep, batch_format="pandas")
            ),
            ["node"],
            [("sum", "c", "c"), ("sum", "_keep", "_keep")],
        )

        def _rename(df: pd.DataFrame, _oc=out_col, _ot=other) -> pd.DataFrame:
            return pd.DataFrame(
                {"node": df["node"],
                 _oc: df["c"].to_numpy(np.float64),
                 _ot: df["_keep"].to_numpy(np.float64)}
            )

        return folded.map_batches(_rename, batch_format="pandas").materialize()

    for _ in range(iterations):
        state = _propagate_ds(state, "h", src, dst, "a")
        state = _propagate_ds(state, "a", dst, src, "h")

    return state.map_batches(
        lambda df: pd.DataFrame(
            {"node": df["node"],
             "hub": df["h"].to_numpy(np.float64),
             "authority": df["a"].to_numpy(np.float64)}
        ),
        batch_format="pandas",
    )


__all__ += ["connected_components_alternating"]


def _edge_signature(edges: "ray.data.Dataset") -> tuple:
    """(count, order-insensitive checksum) of a deduped (src, dst)
    edge table — two metadata-cheap aggregates used as the fixpoint
    test.  The checksum is a sum of per-pair 64-bit hashes, so it is
    invariant to partitioning and row order."""

    def _part(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(
            df[["src", "dst"]], index=False
        ).to_numpy(np.uint64)
        # per-block partial; blocks are few, so the driver folds the
        # partial frame exactly in Python ints (no overflow subtleties)
        # partial = row-hash sum mod 2^64 (numpy wraps) — invariant to
        # how rows land in blocks; int64 view only re-labels the bits
        return pd.DataFrame(
            {
                "_n": np.array([len(df)], np.int64),
                "_h": h.sum(dtype=np.uint64).reshape(1).view(np.int64),
            }
        )

    part = edges.map_batches(_part, batch_format="pandas").to_pandas()
    if part.empty:
        return (0, 0)
    mask = (1 << 64) - 1
    return (
        int(part["_n"].sum()),
        sum(int(x) & mask for x in part["_h"].to_numpy()) & mask,
    )


def connected_components_alternating(
    edges: "ray.data.Dataset",
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 30,
    broadcast_limit: int = 2_000_000,
) -> "ray.data.Dataset":
    """Connected components via ALTERNATING large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014) — the scale path for HIGH-DIAMETER identity graphs,
    converging in O(log² n) rounds where `connected_components`'
    min-label propagation needs O(diameter) rounds.  ER transitive
    chains (A≈B≈C≈…) are exactly the pathological case: a chain of
    10⁴ near-dup records is a diameter-10⁴ component.

    Per half-round the plan is one combiner `grouped_aggregate`
    (per-node neighborhood min — skew-immune: a hot node ships one
    partial per block) plus one label attach (broadcast ≤
    ``broadcast_limit`` nodes, hash join above), then a dedup
    combiner.  Edges never carry payload; every intermediate is the
    O(#edges) pair table, monotonically shrinking toward the star
    fixpoint.  Fixpoint is detected by an order-insensitive
    (count, checksum) signature, so no round compares edge sets
    row-by-row.

    Both phases preserve connectivity and only ever point nodes at
    smaller ids, so the fixpoint is a forest of stars rooted at each
    component's MINIMUM id — identical labels to
    `connected_components` (tested equivalent).  Output:
    ``(node, component)``.
    """
    from .relational import anti_join, grouped_aggregate, hash_join

    def _canon(df: pd.DataFrame) -> pd.DataFrame:
        a = df[src].to_numpy()
        b = df[dst].to_numpy()
        keep = a != b
        a, b = a[keep], b[keep]
        # canonical src > dst (both phases below preserve this)
        return pd.DataFrame({"src": np.maximum(a, b), "dst": np.minimum(a, b)})

    def _dedup(pairs: "ray.data.Dataset") -> "ray.data.Dataset":
        return grouped_aggregate(
            pairs, ["src", "dst"], [("count_star", None, "_n")]
        ).drop_columns(["_n"])

    def _coalesce(ds: "ray.data.Dataset", n_rows: int) -> "ray.data.Dataset":
        """Per-round block hygiene: every downstream stage launches one
        task PER BLOCK, so the fragmented (±empty-schema) groupby
        output makes each of the O(log²) rounds pay fixed cost × block
        count — coalesce to ~64 MB of slim pairs (floor 2×CPU once the
        edge set is large enough to feed every core)."""
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        target = max(1, (n_rows * 16) // (64 << 20) + 1)
        if n_rows > 250_000:
            target = max(target, 2 * ncpu)
        return ds.repartition(min(4096, target))

    cur = _dedup(edges.map_batches(_canon, batch_format="pandas")).materialize()

    # full node set up front (for singleton/self-loop-only nodes)
    def _nodes(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": np.concatenate([df[src].to_numpy(), df[dst].to_numpy()])}
        )

    all_nodes = grouped_aggregate(
        edges.map_batches(_nodes, batch_format="pandas"),
        ["node"],
        [("count_star", None, "_n")],
    ).drop_columns(["_n"]).materialize()

    def _attach_min(pairs: "ray.data.Dataset", key: str) -> "ray.data.Dataset":
        """Join each pair with m(key) = min(neighborhood(key) ∪ key).

        ``pairs`` must hold the FULL view the neighborhood is defined
        over (symmetric for large-star, directed for small-star).
        Returns (src, dst, _m) rows of ``pairs``."""
        mins = grouped_aggregate(
            pairs.map_batches(
                lambda df: pd.DataFrame({"_k": df[key], "_v": df["dst" if key == "src" else "src"]}),
                batch_format="pandas",
            ),
            ["_k"],
            [("min", "_v", "_mv")],
        ).map_batches(
            lambda df: pd.DataFrame(
                {"_k": df["_k"], "_m": np.minimum(df["_mv"].to_numpy(), df["_k"].to_numpy())}
            ),
            batch_format="pandas",
        ).materialize()
        n_keys = mins.count()
        if n_keys <= broadcast_limit:
            mdf = mins.to_pandas()
            ref = ray.put(dict(zip(mdf["_k"].to_numpy(), mdf["_m"].to_numpy())))

            def _bc(df: pd.DataFrame, _r=ref) -> pd.DataFrame:
                lm = ray.get(_r)
                out = df[["src", "dst"]].copy()
                out["_m"] = df[key].map(lm).to_numpy()
                return out

            return pairs.map_batches(_bc, batch_format="pandas")
        # partitions sized to the data: far-above-row-count partition
        # counts leave empty join partitions, tripping the Ray 2.49
        # Arrow empty-schema finalizer edge case (see stages/clustering)
        P = max(1, min(16, n_keys // 1000 + 1))
        return hash_join(
            pairs.select_columns(["src", "dst"]), mins, on=[key],
            right_on=["_k"], num_partitions=P,
        ).select_columns(["src", "dst", "_m"])

    sig = _edge_signature(cur)
    converged = sig[0] == 0  # no edges ⇒ trivially at the fixpoint
    for _ in range(max_rounds if sig[0] else 0):
        # ---- large-star: neighborhoods over the SYMMETRIC view;
        # for every (u, v) with v > u emit (v, m(u)).
        # lazy on purpose: the trivial mirror map re-runs for the two
        # consumers (min census + attach) — cheaper than one more
        # materialize barrier per round at sandbox scale
        sym = cur.map_batches(
            lambda df: pd.DataFrame(
                {
                    "src": np.concatenate([df["src"].to_numpy(), df["dst"].to_numpy()]),
                    "dst": np.concatenate([df["dst"].to_numpy(), df["src"].to_numpy()]),
                }
            ),
            batch_format="pandas",
        )
        withm = _attach_min(sym, "src")

        def _ls_emit(df: pd.DataFrame) -> pd.DataFrame:
            u = df["src"].to_numpy()
            v = df["dst"].to_numpy()
            m = df["_m"].to_numpy()
            keep = v > u
            return pd.DataFrame({"src": v[keep], "dst": m[keep]})

        cur = _coalesce(
            _dedup(withm.map_batches(_ls_emit, batch_format="pandas")),
            sig[0],
        ).materialize()

        # ---- small-star: every edge already points larger → smaller;
        # group by the LARGER endpoint u, m = min(N(u) ∪ {u}), emit
        # (v, m) for v ∈ N(u) \ {m} plus (u, m).
        withm2 = _attach_min(cur, "src")

        def _ss_emit(df: pd.DataFrame) -> pd.DataFrame:
            u = df["src"].to_numpy()
            v = df["dst"].to_numpy()
            m = df["_m"].to_numpy()
            keep = v != m
            return pd.DataFrame(
                {
                    "src": np.concatenate([v[keep], u]),
                    "dst": np.concatenate([m[keep], m]),
                }
            )

        cur = _coalesce(
            _dedup(withm2.map_batches(_ss_emit, batch_format="pandas")),
            sig[0],
        ).materialize()

        new_sig = _edge_signature(cur)
        if new_sig == sig:
            converged = True
            break
        sig = new_sig

    if not converged:
        # The docstring promises exact component minima; a round-capped
        # exit is NOT a star forest and must fail loudly rather than be
        # mistaken for exact labels (alternating-star converges in
        # O(log² n) rounds, so hitting the cap is an anomaly).
        raise RuntimeError(
            f"connected_components_alternating did not reach the star "
            f"fixpoint within max_rounds={max_rounds}; raise max_rounds "
            f"(O(log² n) rounds suffice) or use connected_components"
        )

    # fixpoint: cur is a star forest (member → root).  Labels:
    labels = cur.map_batches(
        lambda df: pd.DataFrame({"node": df["src"], "component": df["dst"]}),
        batch_format="pandas",
    )
    roots = anti_join(all_nodes, labels, on="node")
    return labels.union(
        roots.map_batches(
            lambda df: pd.DataFrame({"node": df["node"], "component": df["node"]}),
            batch_format="pandas",
        )
    )


__all__ += ["incremental_components"]


def incremental_components(
    labels: "ray.data.Dataset",
    delta: "ray.data.Dataset",
    src: str = "src",
    dst: str = "dst",
    broadcast_limit: int = 2_000_000,
) -> "ray.data.Dataset":
    """Fold DELTA edges into an existing ``(node, component)``
    labeling without re-running connected components on the full
    graph — the clustering-layer counterpart of the ER pipeline's
    incremental delta fold-in (`pipelines/entity_resolution.py`).

    Plan: contract the delta by the existing labels (each endpoint →
    its current component; an endpoint never seen before labels
    itself), resolve that CONTRACTED edge set — O(|delta|) edges
    regardless of corpus size — and apply the resulting old-component → new-component map back
    to the label table with one broadcast/join attach.  Nothing
    proportional to the full EDGE set is ever touched; the only
    full-table pass is the final O(#nodes) relabel, which a delta
    fold-in cannot avoid (any old component may acquire a new
    minimum).  Exactly equivalent to re-running CC on
    (star-edges ∪ delta) — tested bit-equal to the full recompute."""
    from .relational import anti_join, grouped_aggregate, hash_join

    # endpoints of the delta that the labeling has never seen label
    # themselves; union gives a TOTAL label table for the delta graph
    def _ends(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": np.concatenate([df[src].to_numpy(), df[dst].to_numpy()])}
        )

    delta = delta.select_columns([src, dst]).materialize()
    if delta.count() == 0:
        return labels

    new_nodes = anti_join(
        grouped_aggregate(
            delta.map_batches(_ends, batch_format="pandas"),
            ["node"],
            [("count_star", None, "_n")],
        ).drop_columns(["_n"]),
        labels,
        on="node",
    ).map_batches(
        lambda df: pd.DataFrame({"node": df["node"], "component": df["node"]}),
        batch_format="pandas",
    )
    total = labels.union(new_nodes).materialize()

    # contract: delta edge (u, v) → (component(u), component(v))
    n_nodes = total.count()
    if n_nodes <= broadcast_limit:
        ldf = total.to_pandas()
        ref = ray.put(dict(zip(ldf["node"].to_numpy(), ldf["component"].to_numpy())))

        def _contract(df: pd.DataFrame, _r=ref) -> pd.DataFrame:
            lm = ray.get(_r)
            return pd.DataFrame(
                {"src": df[src].map(lm), "dst": df[dst].map(lm)}
            )

        contracted = delta.map_batches(_contract, batch_format="pandas")
    else:
        # materialize between the stacked joins: two join aggregator
        # pools running concurrently can starve a small cluster (each
        # pool reserves CPU for its partition actors)
        P = max(1, min(16, n_nodes // 1000 + 1))
        half = hash_join(
            delta.select_columns([src, dst]), total, on=(src,),
            right_on=("node",), num_partitions=P,
        ).map_batches(
            lambda df: pd.DataFrame({dst: df[dst], "_ca": df["component"]}),
            batch_format="pandas",
        ).materialize()
        contracted = hash_join(
            half, total, on=(dst,), right_on=("node",), num_partitions=P,
        ).map_batches(
            lambda df: pd.DataFrame({"src": df["_ca"], "dst": df["component"]}),
            batch_format="pandas",
        ).materialize()

    # the quotient takes the measured CC switch: driver union-find
    # under the edge cap, label rounds (with the alternating round-cap
    # exactness guard) above it — same posture as every other CC site
    comp_map = connected_components(
        contracted
    ).map_batches(
        lambda df: pd.DataFrame({"_old": df["node"], "_new": df["component"]}),
        batch_format="pandas",
    ).materialize()

    # relabel: component → mapped component (identity when untouched)
    n_map = comp_map.count()
    if n_map == 0:
        return total
    if n_map <= broadcast_limit:
        mdf = comp_map.to_pandas()
        old = mdf["_old"].to_numpy(np.int64)
        order = np.argsort(old, kind="mergesort")
        # sorted-array lookup kept in the INTEGER domain end to end:
        # Series.map would produce float64 on any unmapped key (NaN)
        # and the astype back would silently corrupt ids above 2^53
        mref = ray.put((old[order], mdf["_new"].to_numpy(np.int64)[order]))

        def _apply(df: pd.DataFrame, _r=mref) -> pd.DataFrame:
            ko, vn = ray.get(_r)
            c = df["component"].to_numpy(np.int64)
            pos = np.minimum(np.searchsorted(ko, c), len(ko) - 1)
            hit = ko[pos] == c
            return pd.DataFrame(
                {"node": df["node"], "component": np.where(hit, vn[pos], c)}
            )

        return total.map_batches(_apply, batch_format="pandas")
    touched = hash_join(
        total, comp_map, on=("component",), right_on=("_old",)
    ).map_batches(
        lambda df: pd.DataFrame({"node": df["node"], "component": df["_new"]}),
        batch_format="pandas",
    )
    untouched = anti_join(total, comp_map, on="component", right_on="_old")
    return touched.union(untouched)
