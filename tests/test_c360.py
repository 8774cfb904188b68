"""Customer-360 fixture + customer ER + interactions/segments pipelines."""

from __future__ import annotations

import numpy as np
import pandas as pd

from scripts.eval_f1 import pairwise_f1
from sample_c360_text2sql_segmentation_entityresolution_ray.pipelines.customer_er import (
    resolve_customers,
)
from sample_c360_text2sql_segmentation_entityresolution_ray.pipelines.segments import (
    build_interactions,
    item_based_segments,
    item_cooccurrence,
)
from sample_c360_text2sql_segmentation_entityresolution_ray.sources import c360


def test_fixture_shapes_and_determinism(sf_dir):
    main = c360.customer_master(sf_dir).to_pandas()
    sub = c360.subbrand_customer_master(sf_dir).to_pandas()
    rel = c360.customer_relations(sf_dir).to_pandas()
    assert len(main) == len(sub)  # one sub row per custkey
    assert main["customer_id"].is_unique and sub["customer_id"].is_unique
    # ~50% planted duplicates
    assert abs(len(rel) / len(main) - 0.5) < 0.05
    # duplicates copy identity fields exactly
    m = main.set_index("customer_id")
    s = sub.set_index("customer_id")
    for sub_id, main_id in zip(rel["subbrand_customer_id"][:20], rel["main_customer_id"][:20]):
        for col in ["email", "firstname", "lastname", "gender", "age"]:
            assert s.loc[sub_id, col] == m.loc[main_id, col]
        assert s.loc[sub_id, "created_at"] != m.loc[main_id, "created_at"]
    # determinism across invocations
    main2 = c360.customer_master(sf_dir).to_pandas()
    pd.testing.assert_frame_equal(
        main.sort_values("customer_id").reset_index(drop=True),
        main2.sort_values("customer_id").reset_index(drop=True),
    )


def test_customer_er_f1(sf_dir):
    assignment, edges = resolve_customers(
        lambda: c360.customer_master(sf_dir),
        lambda: c360.subbrand_customer_master(sf_dir),
    )
    adf = assignment.to_pandas()
    rel = c360.customer_relations(sf_dir).to_pandas()
    rel = rel.rename(
        columns={"subbrand_customer_id": "url_b", "main_customer_id": "url_a"}
    )
    m = pairwise_f1(adf, rel)
    assert m["precision"] == 1.0, m
    assert m["f1"] >= 0.99, m
    # every input record present exactly once
    assert adf["RecordId"].is_unique
    # confounders must NOT be merged
    conf_rows = adf[adf["RecordId"].str.startswith("sub-conf-")]
    assert (conf_rows["MatchID"] == conf_rows["RecordId"]).all()


def test_interactions_and_segments(sf_dir):
    assignment, _ = resolve_customers(
        lambda: c360.customer_master(sf_dir),
        lambda: c360.subbrand_customer_master(sf_dir),
    )
    inter = build_interactions(
        c360.purchase_history(sf_dir),
        c360.subbrand_purchase_history(sf_dir),
        assignment,
    )
    idf = inter.to_pandas()
    # every purchase of a known customer appears; sub items prefixed
    assert set(idf.columns) == {"USER_ID", "ITEM_ID", "TIMESTAMP"}
    assert idf["ITEM_ID"].str.startswith("sub_").any()
    # users are MatchIDs: a cross-purchasing duplicated person's main and
    # sub purchases share one USER_ID
    adf = assignment.to_pandas()
    dup = adf[adf["RecordId"].str.startswith("sub-dup-")]
    merged = dup[dup["MatchID"] != dup["RecordId"]]
    assert len(merged) > 0

    cooc = item_cooccurrence(inter).to_pandas()
    assert (cooc["item_x"] < cooc["item_y"]).all()
    assert (cooc["cnt"] >= 1).all()

    targets = list(idf["ITEM_ID"].value_counts().index[:3])
    seg = item_based_segments(inter, targets, n=10).to_pandas()
    assert set(seg.columns) == {"item_id", "user_id", "affinity"}
    assert seg.groupby("item_id").size().max() <= 10
    # anti-join property: no segment user already bought the item
    bought = set(zip(idf["USER_ID"], idf["ITEM_ID"]))
    assert all((u, i) not in bought for u, i in zip(seg["user_id"], seg["item_id"]))


def test_customer_er_join_attach_parity(sf_dir):
    """Force the large-label fallback (distributed labels + join-based
    attach) and assert it matches the broadcast-map path exactly."""
    import dataclasses

    from sample_c360_text2sql_segmentation_entityresolution_ray.stages.config import (
        DEFAULT_CONFIG,
    )

    cfg = dataclasses.replace(
        DEFAULT_CONFIG, local_cc_max_edges=0, broadcast_label_limit=0
    )
    a_join, _ = resolve_customers(
        lambda: c360.customer_master(sf_dir),
        lambda: c360.subbrand_customer_master(sf_dir),
        cfg,
    )
    a_bcast, _ = resolve_customers(
        lambda: c360.customer_master(sf_dir),
        lambda: c360.subbrand_customer_master(sf_dir),
    )
    cols = ["source", "ConfidenceLevel", "RecordId", "MatchID", "email"]
    j = a_join.to_pandas()[cols].sort_values("RecordId").reset_index(drop=True)
    b = a_bcast.to_pandas()[cols].sort_values("RecordId").reset_index(drop=True)
    pd.testing.assert_frame_equal(j, b)


def test_item_based_segments_driver_path_equals_partitioned(sf_dir):
    assignment, _ = resolve_customers(
        lambda: c360.customer_master(sf_dir),
        lambda: c360.subbrand_customer_master(sf_dir),
    )
    inter = build_interactions(
        c360.purchase_history(sf_dir),
        c360.subbrand_purchase_history(sf_dir),
        assignment,
    ).materialize()
    targets = [str(i) for i in range(1, 6)]
    fast = item_based_segments(inter, targets, n=20).to_pandas()
    slow = item_based_segments(
        inter, targets, n=20, driver_max_rows=0  # force partitioned path
    ).to_pandas()
    key = ["item_id", "affinity", "user_id"]
    pd.testing.assert_frame_equal(
        fast.sort_values(key).reset_index(drop=True),
        slow.sort_values(key).reset_index(drop=True),
    )


def test_write_segments_csv_reference_format(ray_session, tmp_path):
    """CSV sink byte-format parity with the reference's merged segment
    file (`process_segment_results/index.py:108-143`): header
    item_id,user_id then one row per pair; partitioned variant writes
    the same rows as part files."""
    import ray.data

    from sample_c360_text2sql_segmentation_entityresolution_ray.pipelines.segments import (
        write_segments_csv,
    )

    seg = ray.data.from_items(
        [
            {"item_id": "i2", "user_id": "u3", "affinity": 2},
            {"item_id": "i1", "user_id": "u2", "affinity": 5},
            {"item_id": "i1", "user_id": "u1", "affinity": 7},
        ]
    )
    out = tmp_path / "segments.csv"
    n = write_segments_csv(seg, str(out))
    assert n == 3
    text = out.read_text()
    assert text == "item_id,user_id\ni1,u1\ni1,u2\ni2,u3\n"

    part_dir = tmp_path / "parts"
    n2 = write_segments_csv(seg, str(part_dir), single_file=False)
    assert n2 == 3
    import glob

    import pandas as pd

    rows = pd.concat(
        [pd.read_csv(p) for p in glob.glob(str(part_dir) + "/*")],
        ignore_index=True,
    ).sort_values(["item_id", "user_id"]).reset_index(drop=True)
    assert list(rows.columns) == ["item_id", "user_id"]
    assert len(rows) == 3
