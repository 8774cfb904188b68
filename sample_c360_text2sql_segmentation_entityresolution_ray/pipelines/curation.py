"""Corpus curation: the composite training-data pipeline.

Not present in the reference (its analytics stop at SQL); this is the
standard large-corpus preparation flow assembled from this engine's
operators, streaming end-to-end:

    read documents
      → annotate + filter (quality floor, language allow-list) — ONE
        stateless map_batches pass (quality and lang-ID are pure
        per-row functions; no join)
      → exact dedup (content-hash partition, keep min id)
      → MinHash-LSH near-dedup (keep min-id representative)
      → token counting (whitespace + BPE-ish)
      → resumable Parquet write (state.run_stage manifest)

The only materialization is the near-dup pair table (small).  At
100 TB the same plan holds: the dedup shuffles move content hashes /
bucket keys plus capped sketches, never full documents twice, and the
output write is manifest-guarded so a rerun skips completed work.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..ops import dedup as dedup_ops
from ..ops import text as text_ops
from ..ops.relational import anti_join

DEFAULT_MIN_QUALITY = 0.35
DEFAULT_LANGS: tuple[str, ...] = ()  # empty = keep all


def annotate_filter_stage(
    docs: "ray.data.Dataset",
    min_quality: float,
    allowed_langs: tuple[str, ...],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Quality + language annotation and filtering in one pass."""

    def _fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        keep, langs, quals = [], [], []
        for i, t in enumerate(texts):
            qual, _n, _s = text_ops.quality_of(t)
            if qual < min_quality:
                continue
            lang = text_ops.predict_lang(t)
            if allowed_langs and lang not in allowed_langs:
                continue
            keep.append(i)
            langs.append(lang)
            quals.append(qual)
        sub = batch.take(pa.array(keep, pa.int64()))
        return sub.append_column(
            "lang_pred", pa.array(langs, pa.string())
        ).append_column("quality", pa.array(quals, pa.float64()))

    return docs.map_batches(_fn, batch_format="pyarrow")


def curate_corpus(
    docs: "ray.data.Dataset",
    min_quality: float = DEFAULT_MIN_QUALITY,
    allowed_langs: tuple[str, ...] = DEFAULT_LANGS,
    near_dup_threshold: float = 0.85,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """documents → curated rows (id, text, lang_pred, quality,
    n_tokens, n_bpe_tokens), filtered and deduped."""
    filtered = annotate_filter_stage(
        docs, min_quality, allowed_langs, text_col, id_col
    )
    # materialized ONCE: the exact-deduped corpus is consumed twice
    # (near-dup pair generation, then the final anti-join) — without
    # this the whole filter + content-hash shuffle would re-execute for
    # the second consumer.  Object-store blocks spill under pressure;
    # at corpus scale this is the cheaper side of the
    # recompute-vs-store trade (two full shuffles vs one + spill reads).
    exact = dedup_ops.exact_dedup(filtered, text_col, id_col).materialize()
    pairs = dedup_ops.minhash_dup_pairs(
        exact, text_col, id_col, threshold=near_dup_threshold
    )
    assign = dedup_ops.dup_assignment(pairs)

    def _drop_rows(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.invert(pc.equal(batch["doc_id"], batch["rep_id"])))

    drop = assign.map_batches(_drop_rows, batch_format="pyarrow")
    deduped = anti_join(exact, drop, on=id_col, right_on="doc_id")

    def _tokens(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        n_ws = np.fromiter((len(t.split()) for t in texts), np.int64, len(texts))
        n_bpe = np.fromiter(
            (len(text_ops.BPE_ISH_RE.findall(t)) for t in texts),
            np.int64,
            len(texts),
        )
        return batch.append_column(
            "n_tokens", pa.array(n_ws, pa.int64())
        ).append_column("n_bpe_tokens", pa.array(n_bpe, pa.int64()))

    return deduped.map_batches(_tokens, batch_format="pyarrow")


def curate_and_write(
    sf_dir: str,
    checkpoint_dir: str,
    **kwargs,
) -> "ray.data.Dataset":
    """Resumable curation: output checkpointed via run_stage (manifest
    with lineage + per-partition files; a rerun with unchanged inputs
    re-reads the Parquet instead of recomputing)."""
    from ..state import run_stage

    def factory():
        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        return curate_corpus(docs, **kwargs)

    fingerprint = f"{sf_dir}|{sorted(kwargs.items())}"
    return run_stage("curated_corpus", checkpoint_dir, fingerprint, factory)


__all__ = ["annotate_filter_stage", "curate_corpus", "curate_and_write"]
