"""Training-example assembly: sliding-window chunking + next-fit
sequence packing (semantics planted-tested here; DuckDB oracle parity
is covered by test_queries_oracle for the chunk_docs / pack_sequences
queries)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from sample_c360_text2sql_segmentation_entityresolution_ray.ops import packing


def _docs(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_chunk_docs_window_and_tail_rule():
    # 10 tokens, window 5, stride 3 -> starts 0,3,6 (6+5 reaches the end;
    # no degenerate start-9 chunk)
    ds = _docs([(1, " ".join(f"t{i}" for i in range(10))), (2, "a b"), (3, "   ")])
    out = packing.chunk_docs(ds, window=5, stride=3).to_pandas()
    d1 = out[out.doc_id == 1].sort_values("chunk_id")
    assert list(d1.chunk_start) == [0, 3, 6]
    assert list(d1.n_chunk_tokens) == [5, 5, 4]
    assert d1.iloc[-1].chunk_text == "t6 t7 t8 t9"
    # short doc -> single whole-doc chunk; empty doc -> no chunks
    assert list(out[out.doc_id == 2].chunk_text) == ["a b"]
    assert (out.doc_id == 3).sum() == 0


def test_chunk_docs_covers_every_token_once_per_window():
    ds = _docs([(7, " ".join(str(i) for i in range(23)))])
    out = packing.chunk_docs(ds, window=8, stride=8).to_pandas()
    # non-overlapping stride: concatenation reconstructs the doc
    joined = " ".join(out.sort_values("chunk_id").chunk_text)
    assert joined == " ".join(str(i) for i in range(23))


def test_pack_sequences_next_fit_and_oversize():
    # single partition so the scan order is just doc_id order
    rows = [(i, "x " * n) for i, n in enumerate([60, 30, 90, 300, 10, 85, 5])]
    ds = _docs([(i, t.strip()) for i, t in rows])
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.text import (
        token_count_stage,
    )

    counts = token_count_stage(ds).drop_columns(["n_bpe_tokens"])
    out = (
        packing.pack_sequences(counts, budget=100, partitions=1)
        .to_pandas()
        .sort_values("doc_id")
    )
    # next-fit scan: 60+30 fill bin0; 90 opens bin1; 300 oversize sits
    # alone in bin2 (and nothing may join an overfull bin); 10+85+5
    # fill bin3 to exactly the budget
    assert list(out.seq_id) == [0, 0, 1, 2, 3, 3, 3]
    # every non-oversize sequence respects the budget
    fills = out.groupby("seq_id").n_tokens.sum()
    singles = out.groupby("seq_id").size()
    assert ((fills <= 100) | (singles == 1)).all()


def test_pack_sequences_deterministic_across_block_layouts():
    rows = [(i, "w " * (7 + (i * 13) % 40)) for i in range(120)]
    ds1 = _docs([(i, t.strip()) for i, t in rows])
    ds2 = _docs([(i, t.strip()) for i, t in rows]).repartition(7)
    from sample_c360_text2sql_segmentation_entityresolution_ray.ops.text import (
        token_count_stage,
    )

    def run(ds):
        counts = token_count_stage(ds).drop_columns(["n_bpe_tokens"])
        return (
            packing.pack_sequences(counts, budget=128, partitions=8)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(run(ds1), run(ds2))


def test_chunk_docs_rejects_bad_params():
    ds = _docs([(1, "a b c")])
    with pytest.raises(ValueError):
        packing.chunk_docs(ds, window=0, stride=3)
