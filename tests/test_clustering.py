"""Clustering: distributed label propagation must match driver union-find."""

from __future__ import annotations

import pandas as pd

import ray.data

from sample_c360_text2sql_segmentation_entityresolution_ray.stages.clustering import (
    connected_components,
    connected_components_local,
    resolve_labels,
)
from sample_c360_text2sql_segmentation_entityresolution_ray.stages.config import ERConfig


def _edges_df():
    # two chains, one triangle, one isolated pair — exercises transitivity
    return pd.DataFrame(
        {
            "url_a": ["a", "b", "x", "m", "m", "n", "p"],
            "url_b": ["b", "c", "y", "n", "o", "o", "q"],
            "score": [1.0] * 7,
        }
    )


def test_distributed_cc_matches_local():
    edges = ray.data.from_pandas(_edges_df())
    local = connected_components_local(edges)
    dist = connected_components(
        edges, ERConfig(cc_num_partitions=4, cc_max_rounds=10)
    ).to_pandas()
    lmap = dict(zip(local["node"], local["label"]))
    dmap = dict(zip(dist["node"], dist["label"]))
    assert lmap == dmap
    assert lmap["c"] == "a" and lmap["o"] == "m" and lmap["q"] == "p"


def test_resolve_labels_picks_distributed_path():
    edges = ray.data.from_pandas(_edges_df()).materialize()
    out = resolve_labels(edges, ERConfig(local_cc_max_edges=0)).to_pandas()
    assert dict(zip(out["node"], out["label"]))["c"] == "a"


def test_resolve_labels_empty():
    empty = ray.data.from_pandas(
        pd.DataFrame({"url_a": pd.Series(dtype=object), "url_b": pd.Series(dtype=object)})
    ).materialize()
    out = resolve_labels(empty).to_pandas()
    assert len(out) == 0


def test_round_cap_falls_back_to_alternating_cc():
    # ONE chain of 80 urls — diameter 80.  cc_max_rounds=3 cannot
    # converge by propagation; the quotient-contraction fallback must
    # still return the exact component minimum for every node.
    urls = [f"u{idx:03d}" for idx in range(80)]
    edges = ray.data.from_pandas(
        pd.DataFrame(
            {
                "url_a": urls[:-1],
                "url_b": urls[1:],
                "score": [1.0] * 79,
            }
        )
    )
    out = (
        connected_components(
            edges, ERConfig(cc_num_partitions=4, cc_max_rounds=3)
        )
        .to_pandas()
        .sort_values("node")
    )
    assert len(out) == 80
    assert (out["label"] == "u000").all()
