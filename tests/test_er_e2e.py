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


def test_er_join_feature_plan_matches_broadcast(sf_dir):
    """The join-attach plan (slim blocking + pair-stream hash-joins back
    to the feature table — the unbounded-corpus path and the `auto`
    fallback above broadcast_features_limit) must produce exactly the
    same edges as the broadcast-feature plan, both when invoked
    explicitly and when `auto` falls back to it (forced via
    broadcast_features_limit=0)."""
    from sample_c360_text2sql_segmentation_entityresolution_ray.pipelines.entity_resolution import (
        matched_edges,
    )
    from sample_c360_text2sql_segmentation_entityresolution_ray.stages.config import (
        DEFAULT_CONFIG, ERConfig,
    )

    cols = ["url_a", "url_b", "jaccard", "cosine", "jw", "score"]

    def _norm(df):
        return df[cols].sort_values(["url_a", "url_b"]).reset_index(drop=True)

    bc = _norm(matched_edges(pages_dataset(sf_dir), DEFAULT_CONFIG).to_pandas())
    jn = _norm(
        matched_edges(
            pages_dataset(sf_dir), ERConfig(feature_attach="join")
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(bc, jn)
    # auto above the broadcast limit routes to the SAME join plan
    auto = _norm(
        matched_edges(
            pages_dataset(sf_dir),
            ERConfig(feature_attach="auto", broadcast_features_limit=0),
        ).to_pandas()
    )
    pd.testing.assert_frame_equal(bc, auto)


def test_er_join_plan_full_resolution(sf_dir):
    """resolve_entities under feature_attach='join' end-to-end: same F1
    gate and assignment invariants as the default plan."""
    from sample_c360_text2sql_segmentation_entityresolution_ray.stages.config import (
        ERConfig,
    )

    cfg = ERConfig(feature_attach="join")
    assignment, _ = resolve_entities(lambda: pages_dataset(sf_dir), cfg)
    adf = assignment.to_pandas()
    rel = relations_dataset(sf_dir).to_pandas()
    assert adf["RecordId"].is_unique
    m = pairwise_f1(adf, rel)
    assert m["f1"] >= 0.99, m


def test_incremental_resolution_matches_full(sf_dir):
    """resolve_entities_incremental(full(A), Δ) must equal a full run on
    A ∪ Δ bit-for-bit: pair features depend only on the two records,
    the prior clusters summarize every old↔old outcome, and the frozen
    idf_ref removes the corpus-sample dependence."""
    import numpy as np

    from sample_c360_text2sql_segmentation_entityresolution_ray.pipelines.entity_resolution import (
        build_idf_ref,
        resolve_entities_incremental,
    )

    all_urls = pages_dataset(sf_dir).select_columns(["url"]).to_pandas()["url"]
    # deterministic ~20% delta by url hash
    new_set = {
        u
        for u in all_urls
        if (__import__('zlib').crc32(u.encode()) % 5) == 0
    }
    assert 0 < len(new_set) < len(all_urls)

    def combined():
        return pages_dataset(sf_dir)

    def old_only():
        import pyarrow.compute as pc

        arr = __import__("pyarrow").array(sorted(new_set))

        def _f(b):
            return b.filter(
                pc.invert(pc.is_in(b["url"], value_set=arr))
            )

        return pages_dataset(sf_dir).map_batches(_f, batch_format="pyarrow")

    idf = build_idf_ref(combined())  # frozen across all runs
    prev, _ = resolve_entities(old_only, idf_ref=idf)
    inc, _ = resolve_entities_incremental(
        combined, prev.to_pandas(), new_set, idf_ref=idf
    )
    full, _ = resolve_entities(combined, idf_ref=idf)

    a = inc.to_pandas().sort_values("RecordId").reset_index(drop=True)
    b = full.to_pandas().sort_values("RecordId").reset_index(drop=True)
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])

    # feature-checkpoint variant: old records come back from Parquet,
    # only the delta pays extract/normalize — still bit-equal to full
    import tempfile

    from sample_c360_text2sql_segmentation_entityresolution_ray.pipelines.entity_resolution import (
        checkpoint_features,
        delta_records_factory,
    )

    def new_only():
        import pyarrow.compute as pc

        arr = __import__("pyarrow").array(sorted(new_set))

        def _f(batch):
            return batch.filter(pc.is_in(batch["url"], value_set=arr))

        return pages_dataset(sf_dir).map_batches(_f, batch_format="pyarrow")

    with tempfile.TemporaryDirectory() as ckpt:
        feats = checkpoint_features(old_only, ckpt, "fp-old-corpus")
        rf = delta_records_factory(feats, new_only)
        inc2, _ = resolve_entities_incremental(
            None, prev.to_pandas(), new_set, idf_ref=idf, records_factory=rf
        )
        c = inc2.to_pandas().sort_values("RecordId").reset_index(drop=True)
        pd.testing.assert_frame_equal(c[sorted(c.columns)], b[sorted(b.columns)])
        # same fingerprint: second call resumes from the manifest
        import os

        manifest = os.path.join(ckpt, "features", "manifest.json")
        mtime = os.path.getmtime(manifest)
        checkpoint_features(old_only, ckpt, "fp-old-corpus")
        assert os.path.getmtime(manifest) == mtime


def test_incremental_resolution_join_plan(sf_dir):
    """resolve_entities_incremental under feature_attach='join' (the
    unbounded-corpus plan): the delta pair_filter applies to the slim
    pair stream BEFORE the attach joins, and the result must still be
    bit-equal to a full run under the same plan."""
    import zlib

    from sample_c360_text2sql_segmentation_entityresolution_ray.pipelines.entity_resolution import (
        build_idf_ref,
        resolve_entities_incremental,
    )
    from sample_c360_text2sql_segmentation_entityresolution_ray.stages.config import (
        ERConfig,
    )

    cfg = ERConfig(feature_attach="join")
    all_urls = pages_dataset(sf_dir).select_columns(["url"]).to_pandas()["url"]
    new_set = {u for u in all_urls if (zlib.crc32(u.encode()) % 5) == 0}

    def old_only():
        import pyarrow.compute as pc

        arr = __import__("pyarrow").array(sorted(new_set))

        def _f(b):
            return b.filter(pc.invert(pc.is_in(b["url"], value_set=arr)))

        return pages_dataset(sf_dir).map_batches(_f, batch_format="pyarrow")

    idf = build_idf_ref(pages_dataset(sf_dir))
    prev, _ = resolve_entities(old_only, cfg, idf_ref=idf)
    inc, _ = resolve_entities_incremental(
        lambda: pages_dataset(sf_dir), prev.to_pandas(), new_set,
        cfg=cfg, idf_ref=idf,
    )
    full, _ = resolve_entities(lambda: pages_dataset(sf_dir), cfg, idf_ref=idf)
    a = inc.to_pandas().sort_values("RecordId").reset_index(drop=True)
    b = full.to_pandas().sort_values("RecordId").reset_index(drop=True)
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])
