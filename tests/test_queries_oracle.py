"""Every SQL-expressible queries() entry must match its DuckDB oracle —
the same comparison the driver runs (row count + schema +
order-insensitive values)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, sf_dir, duck):
    import os

    # fixture-backed oracles bake in the driver's sf0.01 fixture path;
    # point them at this test run's scale factor instead
    sql = ORACLES[name].replace(
        "/v1/sf0.01/", f"/v1/{os.path.basename(sf_dir.rstrip('/'))}/"
    )
    ray_df = _canon(_to_pandas(QUERIES[name](sf_dir)))
    sql_df = _canon(duck.sql(sql).df())
    assert len(ray_df) == len(sql_df), (
        f"{name}: row count {len(ray_df)} != oracle {len(sql_df)}"
    )
    assert list(ray_df.columns) == list(sql_df.columns), (
        f"{name}: columns {list(ray_df.columns)} != {list(sql_df.columns)}"
    )
    pd.testing.assert_frame_equal(
        ray_df, sql_df, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9
    )


def test_all_queries_have_callables():
    # every oracle key must exist in queries(); rows-only entries are the
    # documented exceptions in the other direction
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize(
    "name",
    sorted(set(QUERIES) - set(ORACLES) - {"er_assignment"}),
)
def test_rows_only_queries_run(name, sf_dir):
    """Non-SQL-expressible ops must still run and return a stable schema.

    An empty result is legitimate (e.g. embedding_dup_pairs: the
    testdata embeddings have max pairwise cosine 0.48, so a 0.9
    near-dup threshold correctly finds nothing) — but a non-empty
    result must carry columns."""
    df = _to_pandas(QUERIES[name](sf_dir))
    assert df is not None
    if len(df) > 0:
        assert len(df.columns) > 0
