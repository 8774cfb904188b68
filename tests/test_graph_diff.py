"""Generic graph CC (`ops/graph.py`) and CDC snapshot diff
(`relational.table_diff`): planted structure + forced-path equality."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data

from sample_c360_text2sql_segmentation_entityresolution_ray.ops.graph import (
    component_sizes,
    connected_components,
)
from sample_c360_text2sql_segmentation_entityresolution_ray.ops.relational import (
    table_diff,
)


def _labels(ds):
    return (
        ds.to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
        .astype({"node": "int64", "component": "int64"})
    )


def test_cc_planted_components(ray_session):
    # {1,2,3} triangle, {4,5} pair (reversed direction + dup edge),
    # {9} self-loop singleton
    e = pd.DataFrame(
        {"src": [1, 2, 3, 5, 5, 9], "dst": [2, 3, 1, 4, 4, 9]}
    )
    out = _labels(connected_components(ray.data.from_pandas(e)))
    want = pd.DataFrame(
        {"node": [1, 2, 3, 4, 5, 9], "component": [1, 1, 1, 4, 4, 9]}
    )
    pd.testing.assert_frame_equal(out, want)
    sizes = (
        component_sizes(connected_components(ray.data.from_pandas(e)))
        .to_pandas()
        .sort_values("component")
        .reset_index(drop=True)
    )
    assert sizes["n_nodes"].tolist() == [3, 2, 1]


def test_cc_distributed_path_equals_local(ray_session):
    # small-diameter random-ish graph: 60 nodes, ring of 20 + spokes
    rng = np.random.RandomState(7)
    ring = pd.DataFrame({"src": np.arange(20), "dst": (np.arange(20) + 1) % 20})
    spokes = pd.DataFrame(
        {"src": rng.randint(0, 20, 40), "dst": np.arange(100, 140)}
    )
    e = pd.concat([ring, spokes], ignore_index=True)
    ds = ray.data.from_pandas(e)
    local = _labels(connected_components(ds))
    dist = _labels(connected_components(ds, local_max_edges=0))
    pd.testing.assert_frame_equal(local, dist)


def test_table_diff_classification(ray_session):
    old = pd.DataFrame(
        {"k": [1, 2, 3, 4], "x": [10, 20, 30, 40], "y": ["a", "b", "c", "d"]}
    )
    new = pd.DataFrame(
        # 1 unchanged; 2 changes x; 3 changes both; 4 removed; 5 added
        {"k": [1, 2, 3, 5], "x": [10, 99, 31, 50], "y": ["a", "b", "C", "e"]}
    )
    out = (
        table_diff(
            ray.data.from_pandas(old), ray.data.from_pandas(new),
            key="k", compare_cols=["x", "y"],
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
        .astype({"k": "int64"})
    )
    want = pd.DataFrame(
        {
            "k": [2, 3, 4, 5],
            "change": ["changed", "changed", "removed", "added"],
            "changed_cols": ["x", "x,y", "", ""],
        }
    )
    pd.testing.assert_frame_equal(out, want)


def test_table_diff_nan_safe_and_unique_guard(ray_session):
    old = pd.DataFrame({"k": [1, 2], "x": [np.nan, 1.0]})
    new = pd.DataFrame({"k": [1, 2], "x": [np.nan, np.nan]})
    out = (
        table_diff(
            ray.data.from_pandas(old), ray.data.from_pandas(new),
            key="k", compare_cols=["x"],
        )
        .to_pandas()
    )
    # NaN == NaN counts as unchanged; 1.0 -> NaN is a change
    assert out["k"].tolist() == [2] and out["change"].tolist() == ["changed"]
    dup = pd.DataFrame({"k": [1, 1], "x": [1.0, 2.0]})
    with pytest.raises(Exception, match="key-unique"):
        table_diff(
            ray.data.from_pandas(dup), ray.data.from_pandas(new),
            key="k", compare_cols=["x"],
        ).materialize()


def test_triangle_count_planted_and_join_path(ray_session):
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.graph import (
        triangle_count,
    )

    # K4 on {0,1,2,3} (4 triangles) + a pendant edge + a duplicate +
    # a self-loop: census must see exactly 4
    import itertools
    e = pd.DataFrame(
        list(itertools.combinations(range(4), 2)) + [(3, 4), (0, 1), (2, 2)],
        columns=["src", "dst"],
    )
    out = triangle_count(
        ray.data.from_pandas(e).repartition(3), "src", "dst"
    ).to_pandas()
    assert out["n_triangles"].tolist() == [4]
    # forced hash-join closure path (edge_broadcast_limit=0) on a
    # graph big enough to populate every join partition: same census
    # as the broadcast binary-search path
    rng = np.random.default_rng(11)
    big = pd.DataFrame(
        {"src": rng.integers(0, 300, 4000), "dst": rng.integers(0, 300, 4000)}
    )
    ds_big = ray.data.from_pandas(big).repartition(4)
    a = triangle_count(ds_big, "src", "dst").to_pandas()
    b = triangle_count(
        ds_big, "src", "dst", edge_broadcast_limit=0
    ).to_pandas()
    assert a["n_triangles"].tolist() == b["n_triangles"].tolist()
    assert a["n_triangles"][0] > 0


def _pagerank_reference(edges, n_iter=3, d=0.85):
    """Dense numpy reference of the same recurrence."""
    nodes = sorted(set(edges["src"]) | set(edges["dst"]))
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    od = np.zeros(n)
    for s in edges["src"]:
        od[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        c = np.zeros(n)
        for s, t in zip(edges["src"], edges["dst"]):
            c[idx[t]] += r[idx[s]] / od[idx[s]]
        dang = r[od == 0].sum()
        r = (1.0 - d) / n + d * (c + dang / n)
    return dict(zip(nodes, r))


def test_pagerank_matches_reference_and_sums_to_one():
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.graph import (
        pagerank,
    )

    # 1→2, 1→3, 2→3, 4 dangling sink (3→ nothing, 4 isolated via 3→4)
    e = pd.DataFrame({"src": [1, 1, 2, 3], "dst": [2, 3, 3, 4]})
    out = pagerank(ray.data.from_pandas(e), iterations=3).to_pandas()
    ref = _pagerank_reference(e)
    got = dict(zip(out["node"], out["rank"]))
    assert set(got) == set(ref)
    for k in ref:
        assert abs(got[k] - ref[k]) < 1e-12, (k, got[k], ref[k])
    assert abs(out["rank"].sum() - 1.0) < 1e-9


def test_pagerank_join_path_matches_broadcast():
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.graph import (
        pagerank,
    )

    rng = np.random.default_rng(5)
    e = pd.DataFrame(
        {"src": rng.integers(0, 80, 600), "dst": rng.integers(0, 80, 600)}
    )
    ds = ray.data.from_pandas(e).repartition(4)
    a = pagerank(ds, iterations=2).to_pandas().sort_values("node")
    b = (
        pagerank(ds, iterations=2, node_broadcast_limit=0)
        .to_pandas()
        .sort_values("node")
    )
    assert np.allclose(
        a["rank"].to_numpy(), b["rank"].to_numpy(), rtol=0, atol=1e-15
    )


def test_bfs_distance_planted_and_path_equality(ray_session):
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.graph import (
        bfs_distance,
    )

    # chain 0->1->2->3->4 plus a branch 0->5, unreachable island 8->9
    e = pd.DataFrame(
        {"src": [0, 1, 2, 3, 0, 8], "dst": [1, 2, 3, 4, 5, 9]}
    )
    seeds = pd.DataFrame({"node": [0]})
    out = (
        bfs_distance(
            ray.data.from_pandas(e), ray.data.from_pandas(seeds), iterations=3
        )
        .to_pandas()
        .sort_values("node")
    )
    got = dict(zip(out["node"], out["hops"]))
    assert got == {0: 0, 1: 1, 5: 1, 2: 2, 3: 3}

    # distributed path bit-equal (force via node_broadcast_limit=0)
    out2 = (
        bfs_distance(
            ray.data.from_pandas(e),
            ray.data.from_pandas(seeds),
            iterations=3,
            node_broadcast_limit=0,
        )
        .to_pandas()
        .sort_values("node")
    )
    assert dict(zip(out2["node"], out2["hops"])) == got


def test_bfs_early_exit_and_hop_zero(ray_session):
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.graph import (
        bfs_distance,
    )

    e = pd.DataFrame({"src": [1], "dst": [2]})
    seeds = pd.DataFrame({"node": [7]})  # isolated seed: no expansion
    out = bfs_distance(
        ray.data.from_pandas(e), ray.data.from_pandas(seeds), iterations=5
    ).to_pandas()
    assert out["node"].tolist() == [7] and out["hops"].tolist() == [0]


def test_adamic_adar_planted(ray_session):
    import math

    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.graph import (
        adamic_adar,
    )

    # square 1-2-3-4-1 plus chord 1-3: deg(1)=deg(3)=3, deg(2)=deg(4)=2
    e = pd.DataFrame(
        {"src": [1, 2, 3, 4, 1], "dst": [2, 3, 4, 1, 3]}
    )
    out = (
        adamic_adar(ray.data.from_pandas(e), min_common=2)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    # pairs with >= 2 common neighbors: (1,3) via {2,4}; (2,4) via {1,3}
    assert out[["a", "b"]].values.tolist() == [[1, 3], [2, 4]]
    got = dict(zip(zip(out["a"], out["b"]), out["aa"]))
    assert abs(got[(1, 3)] - 2 / math.log(2)) < 1e-12
    assert abs(got[(2, 4)] - 2 / math.log(3)) < 1e-12
    assert out["cn"].tolist() == [2, 2]


def test_adamic_adar_degree_cap_skips_hubs(ray_session):
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.graph import (
        adamic_adar,
    )

    # star center 0 with 5 leaves: every leaf pair has cn=1 via the hub
    e = pd.DataFrame({"src": [0] * 5, "dst": [1, 2, 3, 4, 5]})
    full = adamic_adar(ray.data.from_pandas(e), min_common=1).to_pandas()
    assert len(full) == 10
    capped = adamic_adar(
        ray.data.from_pandas(e), min_common=1, degree_cap=3
    ).to_pandas()
    assert len(capped) == 0


def test_clustering_coefficient_planted(ray_session):
    """K4 on {0,1,2,3} (every node lcc=1, tri=3, deg=3) plus a pendant
    node 4-0 (drops 0's lcc to 3/6=0.5, node 4 gets lcc=0) plus an
    isolated edge 5-6 (both lcc=0, deg=1); duplicate + reversed +
    self-loop input edges must not change anything."""
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.graph import (
        clustering_coefficient,
    )

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = k4 + [(0, 4), (5, 6)]
    noisy = edges + [(b, a) for a, b in edges] + [(1, 1), (0, 1)]
    ds = ray.data.from_items([{"src": a, "dst": b} for a, b in noisy])
    out = (
        clustering_coefficient(ds)
        .to_pandas()
        .set_index("node")
        .sort_index()
    )
    assert out.loc[0, "deg"] == 4 and out.loc[0, "tri"] == 3
    assert out.loc[0, "lcc"] == pytest.approx(0.5)
    for n in (1, 2, 3):
        assert out.loc[n, "tri"] == 3 and out.loc[n, "lcc"] == pytest.approx(1.0)
    assert out.loc[4, "deg"] == 1 and out.loc[4, "lcc"] == 0.0
    assert out.loc[5, "tri"] == 0 and out.loc[6, "lcc"] == 0.0
    # total corner credits == 3 x global triangle count (K4 has 4)
    assert out["tri"].sum() == 3 * 4


def _hits_reference(e: pd.DataFrame, n_iter=2):
    nodes = np.unique(np.concatenate([e["src"].to_numpy(), e["dst"].to_numpy()]))
    idx = {n: i for i, n in enumerate(nodes)}
    s = e["src"].map(idx).to_numpy()
    d = e["dst"].map(idx).to_numpy()
    h = np.ones(len(nodes))
    a = np.zeros(len(nodes))
    for _ in range(n_iter):
        a = np.zeros(len(nodes))
        np.add.at(a, d, h[s])
        a /= a.sum()
        h = np.zeros(len(nodes))
        np.add.at(h, s, a[d])
        h /= h.sum()
    return nodes, h, a


def test_hits_matches_reference(ray_session):
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.graph import hits

    # hub-ish node 1 points at everything; authority-ish node 4
    e = pd.DataFrame({"src": [1, 1, 1, 2, 3], "dst": [2, 3, 4, 4, 4]})
    out = hits(ray.data.from_pandas(e), iterations=2).to_pandas()
    nodes, h, a = _hits_reference(e)
    got = out.set_index("node").loc[nodes]
    np.testing.assert_allclose(got["hub"].to_numpy(), h, atol=1e-12)
    np.testing.assert_allclose(got["authority"].to_numpy(), a, atol=1e-12)
    # node 1 is the best hub, node 4 the best authority
    assert out.loc[out["hub"].idxmax(), "node"] == 1
    assert out.loc[out["authority"].idxmax(), "node"] == 4
    # each vector is L1-normalized
    assert abs(out["hub"].sum() - 1.0) < 1e-9
    assert abs(out["authority"].sum() - 1.0) < 1e-9


def test_hits_join_path_matches_broadcast(ray_session):
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.graph import hits

    rng = np.random.default_rng(7)
    e = pd.DataFrame(
        {"src": rng.integers(0, 60, 400), "dst": rng.integers(0, 60, 400)}
    )
    ds = ray.data.from_pandas(e).repartition(4)
    a = hits(ds, iterations=2).to_pandas().sort_values("node").reset_index(drop=True)
    b = (
        hits(ds, iterations=2, node_broadcast_limit=0)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert a["node"].tolist() == b["node"].tolist()
    np.testing.assert_allclose(a["hub"], b["hub"], atol=1e-9)
    np.testing.assert_allclose(a["authority"], b["authority"], atol=1e-9)
