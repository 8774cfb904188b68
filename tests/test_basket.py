"""Market-basket association rules (`ops/basket.py`) — the Apriori
pair pass with support / confidence / lift, the transparent retail
readout next to the Personalize-analog affinity model
(`lambda/create_personalize_segment/index.py`)."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from sample_c360_text2sql_segmentation_entityresolution_ray.ops.basket import (
    association_rules,
)


def _facts():
    """Hand-auditable baskets (item column int64, like l_partkey).

    Baskets: b1={1,2,3}, b2={1,2}, b3={1,2,4}, b4={2,3}, b5={1,3},
    b6={5} (singleton — never pairs), b7={1,2} with a duplicated
    (basket,item) row to exercise the distinct pass.
    """
    rows = [
        (1, 1), (1, 2), (1, 3),
        (2, 1), (2, 2),
        (3, 1), (3, 2), (3, 4),
        (4, 2), (4, 3),
        (5, 1), (5, 3),
        (6, 5),
        (7, 1), (7, 2), (7, 2),  # dup row
    ]
    return pd.DataFrame(
        {"bk": np.int64([r[0] for r in rows]),
         "it": np.int64([r[1] for r in rows])}
    )


def _oracle(df, min_count):
    b = df.drop_duplicates()
    n = float(b["bk"].nunique())
    item = b.groupby("it").size()
    m = b.merge(b, on="bk")
    m = m[m["it_x"] != m["it_y"]]
    pair = m.groupby(["it_x", "it_y"]).size().rename("n_ab").reset_index()
    pair = pair[pair["n_ab"] >= min_count]
    out = pair.rename(columns={"it_x": "ant", "it_y": "cons"}).copy()
    out["support"] = out["n_ab"] / n
    out["confidence"] = out["n_ab"] / out["ant"].map(item)
    out["lift"] = out["n_ab"] * n / (out["ant"].map(item) * out["cons"].map(item))
    return out.sort_values(["ant", "cons"]).reset_index(drop=True)


def _run(ds, **kw):
    got = (
        association_rules(ds, "bk", "it", **kw)
        .to_pandas()
        .sort_values(["ant", "cons"])
        .reset_index(drop=True)
    )
    return got


@pytest.fixture(scope="module")
def facts_ds(ray_session):
    return ray.data.from_pandas(_facts()).repartition(3)


def test_rules_match_pandas_oracle(ray_session, facts_ds):
    want = _oracle(_facts(), 2)
    got = _run(facts_ds, min_count=2)
    assert len(got) == len(want)
    for col in ("ant", "cons", "n_ab"):
        assert got[col].tolist() == want[col].tolist()
    for col in ("support", "confidence", "lift"):
        np.testing.assert_allclose(got[col], want[col], rtol=1e-12)
    # both directions of every unordered pair present
    pairs = set(zip(got["ant"], got["cons"]))
    assert all((b, a) in pairs for a, b in pairs)


def test_join_fallback_equals_broadcast(ray_session, facts_ds):
    broad = _run(facts_ds, min_count=2)
    joined = _run(facts_ds, min_count=2, item_broadcast_limit=0)
    for col in ("ant", "cons", "n_ab"):
        assert joined[col].tolist() == broad[col].tolist()
    for col in ("support", "confidence", "lift"):
        np.testing.assert_allclose(joined[col], broad[col], rtol=1e-12)


def test_min_count_cut_and_apriori_prefilter(ray_session, facts_ds):
    got = _run(facts_ds, min_count=3)
    # only (1,2)/(2,1) co-occur >= 3 times (baskets 1, 2, 3, 7)
    assert got["ant"].tolist() == [1, 2]
    assert got["cons"].tolist() == [2, 1]
    assert got["n_ab"].tolist() == [4, 4]
    # item 5 (singleton basket) and item 4 (frequent-item-filtered at
    # min_count=3: n_i=1) never appear anywhere
    assert 5 not in set(got["ant"]) | set(got["cons"])
    assert 4 not in set(got["ant"]) | set(got["cons"])
