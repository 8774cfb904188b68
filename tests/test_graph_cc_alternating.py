"""Alternating large-star/small-star connected components
(`ops/graph.py::connected_components_alternating`, Kiveris et al.
SoCC 2014): fixpoint-star equivalence with the min-label machinery,
long-chain (high-diameter) convergence, string ids, degenerate inputs."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

from sample_c360_text2sql_segmentation_entityresolution_ray.ops.graph import (
    connected_components,
    connected_components_alternating,
)


def _labels(ds):
    return (
        ds.to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
        .astype({"node": "int64", "component": "int64"})
    )


def test_alternating_planted_components(ray_session):
    e = pd.DataFrame(
        {"src": [1, 2, 3, 5, 5, 9], "dst": [2, 3, 1, 4, 4, 9]}
    )
    out = _labels(connected_components_alternating(ray.data.from_pandas(e)))
    want = pd.DataFrame(
        {"node": [1, 2, 3, 4, 5, 9], "component": [1, 1, 1, 4, 4, 9]}
    )
    pd.testing.assert_frame_equal(out, want)


def test_alternating_equals_min_label_random(ray_session):
    rng = np.random.RandomState(11)
    e = pd.DataFrame(
        {
            "src": rng.randint(0, 300, 400),
            "dst": rng.randint(0, 300, 400),
        }
    )
    ds = ray.data.from_pandas(e)
    a = _labels(connected_components_alternating(ds))
    b = _labels(connected_components(ds))
    pd.testing.assert_frame_equal(a, b)


def test_alternating_long_chain(ray_session):
    # ONE chain of 500 nodes — diameter 500.  Min-label propagation
    # needs ~500 rounds (its distributed path caps at 30); the
    # alternating algorithm closes this in O(log² n) rounds.
    n = 500
    e = pd.DataFrame({"src": np.arange(n - 1), "dst": np.arange(1, n)})
    out = _labels(
        connected_components_alternating(ray.data.from_pandas(e))
    )
    assert len(out) == n
    assert (out["component"] == 0).all()


def test_alternating_many_chains(ray_session):
    # chains of length 40 broken at multiples of 40 — the planted
    # shape the chain_components_ls query uses
    k = np.arange(1, 1201)
    a = k[k % 40 != 0]
    e = pd.DataFrame({"src": a, "dst": a + 1})
    out = _labels(
        connected_components_alternating(ray.data.from_pandas(e))
    )
    want_comp = out["node"].to_numpy() - ((out["node"].to_numpy() - 1) % 40)
    assert (out["component"].to_numpy() == want_comp).all()


def test_alternating_string_ids(ray_session):
    # lexicographic min labels, same contract as connected_components
    e = pd.DataFrame(
        {"src": ["b", "c", "x"], "dst": ["a", "b", "y"]}
    )
    out = (
        connected_components_alternating(ray.data.from_pandas(e))
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "node": ["a", "b", "c", "x", "y"],
            "component": ["a", "a", "a", "x", "x"],
        }
    )
    pd.testing.assert_frame_equal(out, want)


def test_alternating_self_loops_only(ray_session):
    e = pd.DataFrame({"src": [7, 8], "dst": [7, 8]})
    out = _labels(connected_components_alternating(ray.data.from_pandas(e)))
    want = pd.DataFrame({"node": [7, 8], "component": [7, 8]})
    pd.testing.assert_frame_equal(out, want)


def test_alternating_forced_join_attach(ray_session):
    # broadcast_limit=0 forces the hash-join label attach on every
    # half-round — must stay bit-equal to the broadcast plan
    rng = np.random.RandomState(3)
    e = pd.DataFrame(
        {"src": rng.randint(0, 80, 120), "dst": rng.randint(0, 80, 120)}
    )
    ds = ray.data.from_pandas(e)
    a = _labels(connected_components_alternating(ds, broadcast_limit=0))
    b = _labels(connected_components(ds))
    pd.testing.assert_frame_equal(a, b)


def test_incremental_components_equals_full(ray_session):
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.graph import (
        incremental_components,
    )

    rng = np.random.RandomState(5)
    base = pd.DataFrame(
        {"src": rng.randint(0, 150, 200), "dst": rng.randint(0, 150, 200)}
    )
    # delta merges components AND introduces brand-new nodes 500-509
    delta = pd.DataFrame(
        {
            "src": np.concatenate([rng.randint(0, 150, 30),
                                   np.arange(500, 510)]),
            "dst": np.concatenate([rng.randint(0, 150, 30),
                                   rng.randint(0, 150, 10)]),
        }
    )
    labels = connected_components_alternating(ray.data.from_pandas(base))
    inc = _labels(
        incremental_components(labels, ray.data.from_pandas(delta))
    )
    full = _labels(
        connected_components_alternating(
            ray.data.from_pandas(pd.concat([base, delta], ignore_index=True))
        )
    )
    pd.testing.assert_frame_equal(inc, full)


def test_incremental_components_forced_join_path(ray_session):
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.graph import (
        incremental_components,
    )

    base = pd.DataFrame({"src": [1, 2, 10, 11], "dst": [2, 3, 11, 12]})
    delta = pd.DataFrame({"src": [3], "dst": [10]})  # merges the two chains
    labels = connected_components_alternating(ray.data.from_pandas(base))
    inc = _labels(
        incremental_components(
            labels, ray.data.from_pandas(delta), broadcast_limit=0
        )
    )
    assert (inc["component"] == 1).all() and len(inc) == 6
