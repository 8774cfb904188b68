"""Corpus-level line dedup: planted semantics, broadcast-vs-join path
equality (DuckDB oracle parity is covered by test_queries_oracle for
the line_dedup_docs query)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data

from sample_c360_text2sql_segmentation_entityresolution_ray.ops import dedup


def _docs(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


PLANTED = [
    (1, "alpha\nshared line\nbeta"),
    (2, "shared line\ngamma\n\nshared line"),  # two dup hits + blank kept
    (3, "   \ndelta\nshared line"),  # whitespace-only line kept
    (4, "unique only"),
]


def test_line_dedup_keeps_first_occurrence():
    out = (
        dedup.line_dedup(_docs(PLANTED))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # doc 1 holds the first occurrence — untouched
    assert out.loc[1, "text"] == "alpha\nshared line\nbeta"
    assert out.loc[1, "n_dropped"] == 0
    # doc 2 loses both later occurrences, keeps its blank line
    assert out.loc[2, "text"] == "gamma\n"
    assert out.loc[2, "n_dropped"] == 2
    # doc 3 keeps the whitespace-only line (structure, never dropped)
    assert out.loc[3, "text"] == "   \ndelta"
    assert out.loc[3, "n_dropped"] == 1
    assert out.loc[4, "text"] == "unique only"
    assert list(out["n_lines"]) == [3, 4, 3, 1]


def test_line_dedup_join_path_equals_broadcast():
    rows = [
        (i, "\n".join(f"line {(i * 7 + j) % 9}" for j in range(5)))
        for i in range(40)
    ]
    ds1, ds2 = _docs(rows), _docs(rows)
    a = (
        dedup.line_dedup(ds1)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        dedup.line_dedup(ds2, broadcast_limit=0)  # force the join path
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # every surviving non-blank line is globally unique afterwards
    kept = [ln for t in a["text"] for ln in t.split("\n") if ln.strip()]
    assert len(kept) == len(set(kept))
