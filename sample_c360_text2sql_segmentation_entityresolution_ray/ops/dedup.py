"""Deduplication operators for large text corpora.

The reference's dedup surface is `SELECT DISTINCT` plus the AWS-ER fuzzy
match black box (SURVEY §2.7 U3/U4).  At training-data scale the same
needs split into the standard family implemented here, all streaming
Ray Data:

- :func:`exact_dedup` — content-hash partition + per-group min-id keep.
- :func:`minhash_dup_pairs` / :func:`minhash_dedup` — MinHash-LSH
  candidate generation (shingle → signature → band → bucket groupby)
  with exact shingle-Jaccard verification.
- :func:`simhash_dup_pairs` — 64-bit SimHash, banded buckets, Hamming
  verification.
- :func:`ngram_jaccard_pairs` — character-n-gram Jaccard verification
  of any candidate-pair stream.
- :func:`embedding_dup_pairs` — random-hyperplane-bucketed cosine
  near-dup over an embedding column.
- :func:`dup_assignment` — pairs → connected components → (id, rep_id)
  keep/drop table (rep = min id in component: content-defined).

Every candidate generator bounds per-bucket work (``allpairs_cap``) and
streams pairs; no stage materializes a global pair space.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions import texthash
from ..functions.minhash import band_keys, minhash_signatures_concat
from ..functions.simhash import (
    hamming64,
    simhash_band_keys,
    simhash_batch,
    simhash_block_keys,
)

ALLPAIRS_CAP = 64  # max bucket size for all-pairs emission


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(
    ds: "ray.data.Dataset", text_col: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """Keep one row (minimum id) per exact text value.

    Hash-partition on a 64-bit content hash so the shuffle moves a
    uint64 key instead of the full text; per-group keep min id.  At
    60k–10^12 docs a 64-bit collision is ~never, and a collision only
    risks dropping one extra row (documented trade vs grouping by the
    raw text, which would shuffle full documents)."""

    from .relational import dedupe_by_key

    def _hash(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_h"] = texthash.hash_str_array(batch[text_col].to_numpy(object))
        return batch

    def _drop_h(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.drop(columns="_h")

    hashed = ds.map_batches(_hash, batch_format="pandas")
    return dedupe_by_key(hashed, ["_h"], sort_by=id_col).map_batches(
        _drop_h, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# shared featurization
# ---------------------------------------------------------------------------

def _shingle_featurize(texts: list[str], k: int, cap: int):
    """One hash call for the whole batch; returns per-doc sorted unique
    (bottom-``cap``) shingle-hash arrays."""
    all_sh: list[str] = []
    offsets = [0]
    for text in texts:
        toks = texthash.tokens_of(text)
        if len(toks) < k:
            sh = [" ".join(toks)] if toks else []
        else:
            sh = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        all_sh.extend(sh)
        offsets.append(len(all_sh))
    hashes = (
        texthash.hash_str_array(all_sh) if all_sh else np.empty(0, np.uint64)
    )
    out = []
    for i in range(len(texts)):
        h = np.unique(hashes[offsets[i] : offsets[i + 1]])
        out.append(h[:cap])  # bottom-k of a uniform hash = unbiased sample
    return out


def _jaccard_matrix_exact(sets: list[np.ndarray], ii: np.ndarray, jj: np.ndarray):
    out = np.empty(len(ii))
    for x, (i, j) in enumerate(zip(ii, jj)):
        a, b = sets[i], sets[j]
        if len(a) == 0 and len(b) == 0:
            out[x] = 0.0
            continue
        inter = len(np.intersect1d(a, b, assume_unique=True))
        out[x] = inter / (len(a) + len(b) - inter) if (len(a) or len(b)) else 0.0
    return out


def _merge_pair_blocks(pairs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Coalesce a pair stream to ~2×CPU blocks.  Two birds: (a) Ray's
    groupby emits schema-LESS empty pandas blocks for empty partitions
    (PandasBlockSchema(names=[])) that break a downstream Acero join
    with 'No match for key field reference' — map_batches is never
    invoked on empty blocks, so only a block MERGE can normalize them;
    (b) one-block-per-partition pair outputs fragment downstream
    sorts (the per-input-block fixed cost documented at
    :func:`_slim_block_target`).  Pair rows are ≤ 24 B, so even
    billion-pair streams stay within worker-heap block sizes."""
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    return pairs.repartition(2 * ncpu)


def _dedupe_pairs(pairs: "ray.data.Dataset") -> "ray.data.Dataset":
    """One copy per (id_a, id_b): the same pair surfaces from many
    buckets; partition-hash dedupe (see relational.dedupe_by_key)."""
    from .relational import dedupe_by_key

    return _merge_pair_blocks(dedupe_by_key(pairs, ["id_a", "id_b"]))


DEDUP_PAIR_PARTITIONS = 64
SNM_WINDOW = 5  # window width inside over-cap buckets (linear guard)


def _emit_partition_bucket_pairs(g: pd.DataFrame, verify) -> pd.DataFrame:
    """Vectorized pair emission for ONE hash partition of buckets (the
    same sorted (i, i+d)-sweep as the ER blocking stage — per-bucket
    ``map_groups`` pays ~ms of Python per bucket, ruinous at one bucket
    per near-dup group).  Buckets over ``ALLPAIRS_CAP`` emit window
    pairs only (linear).  ``verify(sorted_df, ii, jj) -> (mask, sims)``
    runs vectorized over all candidate index pairs; ``verify=None``
    emits UNVERIFIED candidates (id_a, id_b) — the slim-shuffle plans
    verify downstream, after the cross-bucket dedupe, with sketches
    attached from a broadcast store or a join."""
    cols = {
        "id_a": pd.Series(dtype=np.int64),
        "id_b": pd.Series(dtype=np.int64),
    }
    if verify is not None:
        cols["sim"] = pd.Series(dtype=float)
    empty = pd.DataFrame(cols)
    g = g.drop_duplicates(["bucket", "doc_id"]).sort_values(
        ["bucket", "doc_id"], kind="mergesort"
    )
    n = len(g)
    if n < 2:
        return empty
    buckets = g["bucket"].to_numpy()
    _, counts = np.unique(buckets, return_counts=True)
    gid = np.repeat(np.arange(len(counts)), counts)
    size = np.repeat(counts, counts).astype(np.int64)
    D = int(min(counts.max() - 1, max(ALLPAIRS_CAP - 1, SNM_WINDOW - 1)))
    ii_l, jj_l = [], []
    for d in range(1, D + 1):
        same = gid[:-d] == gid[d:]
        if d >= SNM_WINDOW:
            same &= size[:-d] <= ALLPAIRS_CAP
        i = np.flatnonzero(same)
        if len(i):
            ii_l.append(i)
            jj_l.append(i + d)
    if not ii_l:
        return empty
    ii = np.concatenate(ii_l)
    jj = np.concatenate(jj_l)
    ids = g["doc_id"].to_numpy()
    if verify is None:
        out = pd.DataFrame({"id_a": ids[ii], "id_b": ids[jj]})
        return out.drop_duplicates(["id_a", "id_b"])
    mask, sims = verify(g, ii, jj)
    out = pd.DataFrame(
        {"id_a": ids[ii[mask]], "id_b": ids[jj[mask]], "sim": sims[mask]}
    )
    return out.drop_duplicates(["id_a", "id_b"])


def _bucketed_pairs(exploded: "ray.data.Dataset", verify) -> "ray.data.Dataset":
    """bucket-exploded rows → verified near-dup pairs, via ONE groupby
    with ``DEDUP_PAIR_PARTITIONS`` groups."""

    def _part(batch: pa.Table) -> pa.Table:
        part = (
            batch["bucket"].to_numpy(zero_copy_only=False)
            % np.uint64(DEDUP_PAIR_PARTITIONS)
        ).astype(np.int32)
        return batch.append_column("part", pa.array(part, pa.int32()))

    pairs = (
        exploded.map_batches(_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: _emit_partition_bucket_pairs(g, verify),
            batch_format="pandas",
        )
    )
    return _dedupe_pairs(pairs)


# ---------------------------------------------------------------------------
# slim-shuffle candidate machinery (shared by MinHash / SimHash)
# ---------------------------------------------------------------------------

BROADCAST_SKETCH_DOC_LIMIT = 1_000_000   # list sketches ≤ ~2 GB worst case
BROADCAST_SCALAR_DOC_LIMIT = 20_000_000  # 16 B/doc scalar fingerprints


def _slim_block_target(slim_rows: int) -> int:
    """Block count for the slim (bucket, doc_id) exchange: Ray's sort
    shuffle pays a fixed cost PER INPUT BLOCK (measured 106 s for
    1.9M rows fragmented into 1,536 tiny blocks vs 1.9 s after
    repartition(32)), so coalesce to ~64 MB blocks bounded below by
    the CPU count — at corpus scale the same formula yields thousands
    of full blocks and the coalesce is a cheap narrow pass of
    16 B rows."""
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    return int(min(4096, max(2 * ncpu, (slim_rows * 16) // (64 << 20) + 1)))


def _bucketed_candidates(
    exploded: "ray.data.Dataset", slim_rows: int | None = None
) -> "ray.data.Dataset":
    """Slim (bucket, doc_id) rows → deduped UNVERIFIED candidate pairs
    (id_a, id_b): same one-groupby/partition-sweep machinery as
    :func:`_bucketed_pairs`, but nothing heavier than 16 B/row crosses
    the exchange — verification attaches sketches downstream.
    ``slim_rows`` (exploded row count, known cheaply by callers as
    n_docs × bands) sizes the pre-groupby block coalesce."""

    def _part(batch: pa.Table) -> pa.Table:
        part = (
            batch["bucket"].to_numpy(zero_copy_only=False)
            % np.uint64(DEDUP_PAIR_PARTITIONS)
        ).astype(np.int32)
        return batch.append_column("part", pa.array(part, pa.int32()))

    from .relational import dedupe_by_key

    keyed = exploded.map_batches(_part, batch_format="pyarrow")
    if slim_rows is not None:
        keyed = keyed.repartition(_slim_block_target(slim_rows))
    cands = keyed.groupby("part").map_groups(
        lambda g: _emit_partition_bucket_pairs(g, None),
        batch_format="pandas",
    )
    return _merge_pair_blocks(dedupe_by_key(cands, ["id_a", "id_b"]))


def _ids64(batch: pa.Table, col: str) -> np.ndarray:
    return np.asarray(batch[col].combine_chunks(), np.int64)


def _arrow_tables(ds: "ray.data.Dataset") -> list:
    """Collect a (small, cap-guarded) dataset as pyarrow tables.
    ``to_arrow_refs`` hands back the underlying blocks AS-IS — pandas
    DataFrames when an upstream stage ran in pandas format — so force
    an Arrow pass-through first (zero-copy when already Arrow)."""
    return ray.get(
        ds.map_batches(lambda t: t, batch_format="pyarrow").to_arrow_refs()
    )


def _nested_join_partitions() -> int:
    """Aggregator-partition count for the TWO concurrent hash joins of
    the join-attach plan: Ray's join spawns ``num_partitions`` actors
    per join, so the pair of joins must together leave CPUs for the
    upstream map/groupby stages (the default 2×CPU sizing deadlocks an
    8-CPU cluster when two joins run in one pipeline)."""
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    return max(2, ncpu // 2)


def _list_col_flat(batch: pa.Table, col: str):
    """(offsets0based, flat_uint64_values) of a list<uint64> column."""
    la = batch[col].combine_chunks()
    offs = np.asarray(la.offsets, np.int64)
    vals = np.asarray(la.values, np.uint64)[offs[0] : offs[-1]]
    return offs - offs[0], vals


def _pack_sketch_bin(key_in: str, key_out: str, col_out: str):
    """feats(doc_id, shingles) → (key_out, col_out): the ragged uint64
    sketch packed into ONE large_binary column built from the list
    column's own buffers (no per-row Python) — Acero-join-safe payload
    transport, the same packed-binary trick as the ER join plan
    (stages/scoring.py)."""

    def _f(batch: pa.Table) -> pa.Table:
        offs, vals = _list_col_flat(batch, "shingles")
        bin_arr = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(),
            batch.num_rows,
            [
                None,
                pa.py_buffer((offs * 8).tobytes()),
                pa.py_buffer(vals.tobytes()),
            ],
        )
        return pa.table(
            {key_out: _ids64(batch, key_in), col_out: bin_arr}
        )

    return _f


def _jaccard_pair_arrays(sa, sb) -> np.ndarray:
    """Exact Jaccard per (sa[i], sb[i]) — identical semantics to
    :func:`_jaccard_matrix_exact` (both-empty ⇒ 0.0)."""
    out = np.empty(len(sa))
    for x, (a, b) in enumerate(zip(sa, sb)):
        if len(a) == 0 and len(b) == 0:
            out[x] = 0.0
            continue
        inter = len(np.intersect1d(a, b, assume_unique=True))
        out[x] = inter / (len(a) + len(b) - inter)
    return out


# Below this corpus size the slim plan's fixed costs (materialize
# barrier, candidate dedupe exchange, store round-trip) exceed the
# payload shuffle it avoids (≤ ~64 MB of replicated sketches) — `auto`
# then runs the single-exchange in-bucket plan FROM the already-
# featurized table (no re-tokenize).  Measured crossover ~10-20k docs
# (payload 1.4 s vs slim 2.1 s at 5k; payload 31 s vs slim 11 s at 40k).
PAYLOAD_CUTOVER_DOCS = 20_000


def _payload_block_target(rows: int, exploded_bytes: int) -> int:
    """Pre-explode block count for the small-corpus payload plans.

    Two competing fixed costs (both measured at sf0.1/32 cpus on the
    embedding path): read parallelism fragments a toy corpus into
    ~32-row blocks and every op pays per-block scheduling (64 blocks →
    2.4 s); but Ray's sort-based groupby emits ONE reduce partition
    per input block, so too FEW blocks serialize the in-bucket pair
    sweep (2 blocks → 3.6 s).  ~16 MB of exploded payload per block
    with a row-count floor landed at 16 blocks → 1.3 s."""
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    return int(
        min(
            2 * ncpu,
            max(1, rows // 1000, exploded_bytes // (16 << 20) + 1),
        )
    )


def _coalesce_payload_feats(
    feats: "ray.data.Dataset", rows: int, exploded_bytes: int
) -> "ray.data.Dataset":
    target = _payload_block_target(rows, exploded_bytes)
    if feats.num_blocks() > target:
        feats = feats.repartition(target)
    return feats


def _payload_pairs_from_feats(
    feats: "ray.data.Dataset",
    payload_col: str,
    verify,
    n_docs: int | None = None,
    bands: int = 16,
) -> "ray.data.Dataset":
    """Small-corpus plan: explode the featurized per-doc table into
    (bucket, doc_id, <payload>) band rows — payload replicated per
    band, acceptable under :data:`PAYLOAD_CUTOVER_DOCS` — and run the
    single-exchange in-bucket sweep + verify."""
    if n_docs:
        feats = _coalesce_payload_feats(
            feats, n_docs, (feats.size_bytes() or 0) * bands
        )

    def _explode(batch: pa.Table) -> pa.Table:
        offs, vals = _list_col_flat(batch, "buckets")
        ids = _ids64(batch, "doc_id")
        reps = np.diff(offs)
        idx = np.repeat(np.arange(batch.num_rows), reps)
        payload = batch[payload_col].combine_chunks().take(
            pa.array(idx, pa.int64())
        )
        return pa.table(
            {
                "bucket": pa.array(vals, pa.uint64()),
                "doc_id": pa.array(ids[idx], pa.int64()),
                payload_col: payload,
            }
        )

    return _bucketed_pairs(
        feats.map_batches(_explode, batch_format="pyarrow"), verify
    )


# ---------------------------------------------------------------------------
# MinHash-LSH
# ---------------------------------------------------------------------------

def minhash_dup_pairs(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    shingle_k: int = 3,
    shingle_cap: int = 256,
    num_perm: int = 64,
    bands: int = 16,
    transport: str = "auto",
    broadcast_doc_limit: int = BROADCAST_SKETCH_DOC_LIMIT,
) -> "ray.data.Dataset":
    """Near-duplicate pairs by MinHash-LSH blocking + exact
    shingle-Jaccard verification (north-rule structure: shingle →
    minhash → band → bucket groupby).

    ``transport`` picks how shingle sketches reach verification:

    - ``"broadcast"`` — featurize ONCE into a per-doc table; only slim
      16 B (bucket, doc_id) rows cross the band shuffle; candidates are
      deduped FIRST, then verified against a zero-copy broadcast
      :class:`~..functions.feature_store.IdListStore` (``ray.put``
      once, searchsorted probe per batch).
    - ``"join"`` — same slim candidate exchange; sketches attach via two
      hash joins of the deduped pairs against the packed-binary feature
      table (heavy bytes scale with candidates, never × bands).
    - ``"payload"`` — the legacy plan (sketch rides every band-key row,
      ~bands× replication through the shuffle): kept as the
      path-equality baseline and for tiny inputs.
    - ``"auto"`` — measured switch: broadcast while the materialized
      feature count ≤ ``broadcast_doc_limit`` (≤ ~2 GB of sketch arrays
      at the 256-shingle cap — one object-store copy per node), else
      join.  Mirrors the flagship ER feature-transport plans
      (pipelines/entity_resolution.py)."""
    if transport == "payload":
        return _minhash_dup_pairs_payload(
            ds, text_col, id_col, threshold, shingle_k, shingle_cap,
            num_perm, bands,
        )
    if transport not in ("auto", "broadcast", "join"):
        raise ValueError(f"unknown transport {transport!r}")

    def _featurize(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        sets = _shingle_featurize(texts, shingle_k, shingle_cap)
        concat = np.concatenate(sets) if sets else np.empty(0, np.uint64)
        offs = np.cumsum([0] + [len(s) for s in sets])
        sigs = minhash_signatures_concat(concat, offs, num_perm=num_perm)
        keys = band_keys(sigs, bands)  # (n, bands)
        return pa.table(
            {
                "doc_id": pa.array(_ids64(batch, id_col), pa.int64()),
                "shingles": pa.array(list(sets), pa.list_(pa.uint64())),
                "buckets": pa.array(list(keys), pa.list_(pa.uint64())),
            }
        )

    # One featurize pass, materialized: sketches stay PUT in their
    # blocks; neither derivation below re-tokenizes the corpus.
    feats = ds.map_batches(_featurize, batch_format="pyarrow").materialize()
    n_docs = feats.count()

    if transport == "auto" and n_docs <= PAYLOAD_CUTOVER_DOCS:
        def _verify_small(g: pd.DataFrame, ii, jj):
            sets = [
                np.asarray(s, np.uint64) for s in g["shingles"].to_numpy()
            ]
            sims = _jaccard_matrix_exact(sets, ii, jj)
            return sims >= threshold, sims

        return _payload_pairs_from_feats(
            feats, "shingles", _verify_small, n_docs=n_docs, bands=bands
        )

    def _explode(batch: pa.Table) -> pa.Table:
        offs, vals = _list_col_flat(batch, "buckets")
        ids = _ids64(batch, "doc_id")
        return pa.table(
            {
                "bucket": pa.array(vals, pa.uint64()),
                "doc_id": pa.array(np.repeat(ids, np.diff(offs)), pa.int64()),
            }
        )

    cands = _bucketed_candidates(
        feats.select_columns(["doc_id", "buckets"]).map_batches(
            _explode, batch_format="pyarrow"
        ),
        slim_rows=n_docs * bands,
    )
    sketches = feats.select_columns(["doc_id", "shingles"])

    if transport == "broadcast" or (
        transport == "auto" and n_docs <= broadcast_doc_limit
    ):
        from ..functions.feature_store import IdListStore

        store = IdListStore.from_arrow(
            _arrow_tables(sketches), "doc_id", "shingles"
        )
        ref = ray.put(store)

        def _verify_bc(batch: pa.Table) -> pa.Table:
            st = ray.get(ref)  # zero-copy numpy views
            ia = st.rows(_ids64(batch, "id_a"))
            ib = st.rows(_ids64(batch, "id_b"))
            sims = _jaccard_pair_arrays(
                [st.get(i) for i in ia], [st.get(i) for i in ib]
            )
            keep = sims >= threshold
            return pa.table(
                {
                    "id_a": pa.array(_ids64(batch, "id_a")[keep], pa.int64()),
                    "id_b": pa.array(_ids64(batch, "id_b")[keep], pa.int64()),
                    "sim": pa.array(sims[keep], pa.float64()),
                }
            )

        return cands.map_batches(_verify_bc, batch_format="pyarrow")

    # join transport: packed-binary sketches attach to the DEDUPED pairs
    from .relational import hash_join

    fa = sketches.map_batches(
        _pack_sketch_bin("doc_id", "id_a", "sh_a"), batch_format="pyarrow"
    )
    fb = sketches.map_batches(
        _pack_sketch_bin("doc_id", "id_b", "sh_b"), batch_format="pyarrow"
    )
    np_join = _nested_join_partitions()
    joined = hash_join(
        hash_join(cands, fa, on=["id_a"], num_partitions=np_join),
        fb, on=["id_b"], num_partitions=np_join,
    )

    def _verify_join(batch: pa.Table) -> pa.Table:
        sa = [
            np.frombuffer(v, np.uint64) if v is not None else
            np.empty(0, np.uint64)
            for v in batch["sh_a"].to_pylist()
        ]
        sb = [
            np.frombuffer(v, np.uint64) if v is not None else
            np.empty(0, np.uint64)
            for v in batch["sh_b"].to_pylist()
        ]
        sims = _jaccard_pair_arrays(sa, sb)
        keep = sims >= threshold
        return pa.table(
            {
                "id_a": pa.array(_ids64(batch, "id_a")[keep], pa.int64()),
                "id_b": pa.array(_ids64(batch, "id_b")[keep], pa.int64()),
                "sim": pa.array(sims[keep], pa.float64()),
            }
        )

    return joined.map_batches(_verify_join, batch_format="pyarrow")


def _minhash_dup_pairs_payload(
    ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    threshold: float,
    shingle_k: int,
    shingle_cap: int,
    num_perm: int,
    bands: int,
) -> "ray.data.Dataset":
    """Legacy payload plan: the shingle sketch rides EVERY band-key row
    through the bucket shuffle (~bands× replication).  Kept as the
    path-equality baseline for the slim transports above."""

    def _featurize(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        sets = _shingle_featurize(texts, shingle_k, shingle_cap)
        concat = np.concatenate(sets) if sets else np.empty(0, np.uint64)
        offs = np.cumsum([0] + [len(s) for s in sets])
        sigs = minhash_signatures_concat(concat, offs, num_perm=num_perm)
        keys = band_keys(sigs, bands)  # (n, bands)
        n = batch.num_rows
        idx = np.repeat(np.arange(n), bands)
        return pa.table(
            {
                "bucket": pa.array(keys.reshape(-1), pa.uint64()),
                "doc_id": pa.array(_ids64(batch, id_col)[idx], pa.int64()),
                "shingles": pa.array(
                    [sets[i] for i in idx], pa.list_(pa.uint64())
                ),
            }
        )

    def _verify(g: pd.DataFrame, ii, jj):
        sets = [np.asarray(s, np.uint64) for s in g["shingles"].to_numpy()]
        sims = _jaccard_matrix_exact(sets, ii, jj)
        return sims >= threshold, sims

    return _bucketed_pairs(ds.map_batches(_featurize, batch_format="pyarrow"), _verify)


def dup_assignment(
    pairs: "ray.data.Dataset", sim_col: str = "sim"
) -> "ray.data.Dataset":
    """pairs(id_a, id_b) → (doc_id, rep_id): connected components with
    rep = min id (content-defined).  Routed through
    :func:`..stages.clustering.resolve_labels`, which picks driver
    union-find below ``local_cc_max_edges`` and distributed
    min-label-propagation above — a pathological near-dup rate on a
    large corpus must not become a driver OOM."""
    from ..stages.clustering import resolve_labels

    edges = pairs.map_batches(
        lambda df: pd.DataFrame({"url_a": df["id_a"], "url_b": df["id_b"]}),
        batch_format="pandas",
    ).materialize()  # resolve_labels counts edges to pick its path
    labels = resolve_labels(edges)
    return labels.map_batches(
        lambda df: pd.DataFrame({"doc_id": df["node"], "rep_id": df["label"]}),
        batch_format="pandas",
    )


def minhash_dedup(
    ds: "ray.data.Dataset", text_col: str = "text", id_col: str = "doc_id", **kw
) -> "ray.data.Dataset":
    """Corpus minus near-duplicates: every doc whose component rep is not
    itself is dropped (keep the min-id representative).

    ``ds`` is consumed twice (pair generation, then the anti-join) — it
    is materialized here once so an upstream lazy plan does not
    re-execute; pass an already-materialized/parquet-backed dataset to
    make this free."""
    ds = ds.materialize()
    pairs = minhash_dup_pairs(ds, text_col, id_col, **kw)
    assign = dup_assignment(pairs)

    def _drop_rows(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.invert(pc.equal(batch["doc_id"], batch["rep_id"])))

    drop = assign.map_batches(_drop_rows, batch_format="pyarrow")
    from .relational import anti_join

    return anti_join(ds, drop, on=id_col, right_on="doc_id")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BLOCK_SCHEME_DOCS = 1_000_000  # split-band bucket space = 2^16


def _resolve_simhash_scheme(
    scheme: str, n_docs: int, bands: int, max_hamming: int
) -> str:
    """Resolve ``scheme="auto"`` and re-check the pigeonhole bound
    AFTER resolution: ``"split"`` needs ``bands ≥ max_hamming + 1``
    (splitting 64 bits into `bands` bands, ≤ max_hamming flipped bits
    can dirty at most max_hamming bands — one band is clean only if
    there are more bands than flips).  An auto resolution that would
    land on an under-banded split silently loses recall, so auto
    falls back to the always-valid Manku block scheme instead; an
    EXPLICIT under-banded split raises (caller asked for a config
    that cannot meet the guarantee)."""
    if scheme == "auto":
        scheme = "split" if n_docs <= SIMHASH_BLOCK_SCHEME_DOCS else "blocks"
        if scheme == "split" and bands < max_hamming + 1:
            scheme = "blocks"  # pigeonhole would fail — take the safe keys
    if scheme == "split" and bands < max_hamming + 1:
        raise ValueError(
            f"split scheme needs bands ≥ max_hamming+1 for the "
            f"pigeonhole guarantee, got bands={bands}, "
            f"max_hamming={max_hamming}"
        )
    return scheme


def _simhash_keys(
    sh: np.ndarray, scheme: str, bands: int, max_hamming: int
) -> np.ndarray:
    """(n, k) bucket keys under the chosen scheme; both schemes
    guarantee a pair within ``max_hamming`` shares ≥ 1 key."""
    if scheme == "split":
        keys = simhash_band_keys(sh, bands)  # (n, bands) of 64/bands bits
        band_idx = np.arange(bands, dtype=np.uint64)[None, :]
        return (band_idx << np.uint64(60)) | keys
    if scheme == "blocks":
        # Manku block-combinations: blocks − clean = max_hamming
        return simhash_block_keys(
            sh, blocks=max_hamming + 3, clean=3
        )
    raise ValueError(f"unknown simhash scheme {scheme!r}")


def simhash_dup_pairs(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
    scheme: str = "auto",
    transport: str = "auto",
    broadcast_doc_limit: int = BROADCAST_SCALAR_DOC_LIMIT,
) -> "ray.data.Dataset":
    """Near-dup pairs by SimHash: 64-bit fingerprints, banded buckets,
    exact Hamming verification.

    ``scheme`` picks the bucketing (both pigeonhole-guarantee recall
    for Hamming ≤ ``max_hamming``; identical verified output):

    - ``"split"`` — ``bands`` contiguous 64/bands-bit bands (needs
      bands ≥ max_hamming+1).  Bucket SPACE is only 2^(64/bands)
      (65,536 at 4 bands), so mean bucket size grows linearly with
      the corpus — fine to ~1M docs, then the all-pairs cap starts
      clipping recall.
    - ``"blocks"`` — Manku/Jain/Sarma block-combination keys
      (functions/simhash.simhash_block_keys): C(max_hamming+3, 3)
      tables of ~64·3/(max_hamming+3)-bit keys (20 × ~32-bit at
      Hamming 3) — bucket space 2^32, recall holds at 10^12 docs.
    - ``"auto"`` — split below ``SIMHASH_BLOCK_SCHEME_DOCS`` measured
      docs (4 keys/doc beats 20 when buckets are sparse anyway),
      blocks above.

    ``transport`` as in :func:`minhash_dup_pairs`: slim plans featurize
    ONCE, shuffle only (bucket, doc_id), dedupe candidates, then attach
    the 8 B fingerprint via a broadcast
    :class:`~..functions.feature_store.IdScalarStore` (``"broadcast"``,
    default while docs ≤ ``broadcast_doc_limit`` — 16 B/doc of store)
    or two hash joins (``"join"``); ``"payload"`` keeps the legacy
    fingerprint-per-band-row plan as the path-equality baseline."""
    if scheme not in ("auto", "split", "blocks"):
        raise ValueError(f"unknown simhash scheme {scheme!r}")
    if transport == "payload":
        scheme = _resolve_simhash_scheme(
            scheme, ds.count(), bands, max_hamming
        )
        return _simhash_dup_pairs_payload(
            ds, text_col, id_col, max_hamming, bands, scheme
        )
    if transport not in ("auto", "broadcast", "join"):
        raise ValueError(f"unknown transport {transport!r}")

    def _featurize(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        tok_sets = [texthash.token_hashes(t, cap=512) for t in texts]
        sh = simhash_batch(tok_sets)
        return pa.table(
            {
                "doc_id": pa.array(_ids64(batch, id_col), pa.int64()),
                "simhash": pa.array(sh, pa.uint64()),
            }
        )

    # featurize BEFORE bucketing: the scheme resolves from the
    # materialized count, keys derive per batch from the fingerprint
    feats = ds.map_batches(_featurize, batch_format="pyarrow").materialize()
    n_docs = feats.count()
    scheme = _resolve_simhash_scheme(scheme, n_docs, bands, max_hamming)
    import math as _math

    n_keys = bands if scheme == "split" else _math.comb(max_hamming + 3, 3)

    if transport == "auto" and n_docs <= PAYLOAD_CUTOVER_DOCS:
        feats = _coalesce_payload_feats(feats, n_docs, n_docs * n_keys * 24)

        def _explode_pay(batch: pa.Table) -> pa.Table:
            sh = np.asarray(batch["simhash"].combine_chunks(), np.uint64)
            ids = _ids64(batch, "doc_id")
            keys = _simhash_keys(sh, scheme, bands, max_hamming)
            idx = np.repeat(np.arange(len(ids)), keys.shape[1])
            return pa.table(
                {
                    "bucket": pa.array(keys.reshape(-1), pa.uint64()),
                    "doc_id": pa.array(ids[idx], pa.int64()),
                    "simhash": pa.array(sh[idx], pa.uint64()),
                }
            )

        def _verify_small(g: pd.DataFrame, ii, jj):
            h = g["simhash"].to_numpy().astype(np.uint64)
            d = hamming64(h[ii], h[jj])
            return d <= max_hamming, (64 - d) / 64.0

        return _bucketed_pairs(
            feats.map_batches(_explode_pay, batch_format="pyarrow"),
            _verify_small,
        )

    def _explode(batch: pa.Table) -> pa.Table:
        sh = np.asarray(batch["simhash"].combine_chunks(), np.uint64)
        ids = _ids64(batch, "doc_id")
        keys = _simhash_keys(sh, scheme, bands, max_hamming)
        return pa.table(
            {
                "bucket": pa.array(keys.reshape(-1), pa.uint64()),
                "doc_id": pa.array(
                    np.repeat(ids, keys.shape[1]), pa.int64()
                ),
            }
        )

    cands = _bucketed_candidates(
        feats.map_batches(_explode, batch_format="pyarrow"),
        slim_rows=n_docs * n_keys,
    )
    prints = feats.select_columns(["doc_id", "simhash"])

    def _emit(ids_a, ids_b, ha, hb) -> pa.Table:
        d = hamming64(ha, hb)
        keep = d <= max_hamming
        return pa.table(
            {
                "id_a": pa.array(ids_a[keep], pa.int64()),
                "id_b": pa.array(ids_b[keep], pa.int64()),
                "sim": pa.array(((64 - d) / 64.0)[keep], pa.float64()),
            }
        )

    if transport == "broadcast" or (
        transport == "auto" and n_docs <= broadcast_doc_limit
    ):
        from ..functions.feature_store import IdScalarStore

        store = IdScalarStore.from_arrow(
            _arrow_tables(prints), "doc_id", "simhash"
        )
        ref = ray.put(store)

        def _verify_bc(batch: pa.Table) -> pa.Table:
            st = ray.get(ref)
            ia, ib = _ids64(batch, "id_a"), _ids64(batch, "id_b")
            return _emit(ia, ib, st.lookup(ia), st.lookup(ib))

        return cands.map_batches(_verify_bc, batch_format="pyarrow")

    from .relational import hash_join

    fa = prints.rename_columns({"doc_id": "id_a", "simhash": "sh_a"})
    fb = prints.rename_columns({"doc_id": "id_b", "simhash": "sh_b"})
    np_join = _nested_join_partitions()
    joined = hash_join(
        hash_join(cands, fa, on=["id_a"], num_partitions=np_join),
        fb, on=["id_b"], num_partitions=np_join,
    )

    def _verify_join(batch: pa.Table) -> pa.Table:
        return _emit(
            _ids64(batch, "id_a"),
            _ids64(batch, "id_b"),
            np.asarray(batch["sh_a"].combine_chunks(), np.uint64),
            np.asarray(batch["sh_b"].combine_chunks(), np.uint64),
        )

    return joined.map_batches(_verify_join, batch_format="pyarrow")


def _simhash_dup_pairs_payload(
    ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    max_hamming: int,
    bands: int,
    scheme: str = "split",
) -> "ray.data.Dataset":
    """Legacy payload plan (fingerprint rides every band-key row)."""

    def _featurize(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        tok_sets = [texthash.token_hashes(t, cap=512) for t in texts]
        sh = simhash_batch(tok_sets)
        keys = _simhash_keys(sh, scheme, bands, max_hamming)
        n = batch.num_rows
        idx = np.repeat(np.arange(n), keys.shape[1])
        return pa.table(
            {
                "bucket": pa.array(keys.reshape(-1), pa.uint64()),
                "doc_id": pa.array(_ids64(batch, id_col)[idx], pa.int64()),
                "simhash": pa.array(sh[idx], pa.uint64()),
            }
        )

    def _verify(g: pd.DataFrame, ii, jj):
        h = g["simhash"].to_numpy().astype(np.uint64)
        d = hamming64(h[ii], h[jj])
        return d <= max_hamming, (64 - d) / 64.0

    return _bucketed_pairs(ds.map_batches(_featurize, batch_format="pyarrow"), _verify)


# ---------------------------------------------------------------------------
# character-n-gram Jaccard verification
# ---------------------------------------------------------------------------

def ngram_dup_all_pairs(
    docs: "ray.data.Dataset",
    n: int = 5,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    sim_col: str = "ngram_jaccard",
    denom: str = "union",
) -> "ray.data.Dataset":
    """Exact all-pairs character-``n``-gram Jaccard — the correctness
    BASELINE (O(N²); at scale generate candidates with LSH and verify
    with :func:`ngram_jaccard_pairs`).  The id list is driver-collected
    (bounded baseline use); pair generation fans out as a Dataset."""
    import pyarrow as _pa

    ids = sorted(
        r[id_col] for r in docs.select_columns([id_col]).iter_rows()
    )
    arr = np.asarray(ids, dtype=np.int64)
    ii, jj = np.triu_indices(len(arr), k=1)
    pairs = ray.data.from_arrow(
        _pa.table(
            {"id_a": _pa.array(arr[ii]), "id_b": _pa.array(arr[jj])}
        )
    )
    return ngram_jaccard_pairs(
        pairs, docs, n=n, threshold=threshold, text_col=text_col,
        id_col=id_col, sim_col=sim_col, denom=denom,
    )


def embedding_dup_pairs_exact(
    ds: "ray.data.Dataset",
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.4,
    round_nd: int = 4,
) -> "ray.data.Dataset":
    """Exact all-pairs cosine near-dup (id_a < id_b, cos rounded to
    ``round_nd``) — the brute-force baseline for
    :func:`embedding_dup_pairs` (which trades recall for one LSH-bucket
    pass).  The unit-vector matrix is broadcast once; each batch does
    one matmul against it.  O(N²/batch) flops — baseline use only."""
    rows = sorted(
        (
            (r[id_col], r[emb_col])
            for r in ds.select_columns([id_col, emb_col]).iter_rows()
        ),
        key=lambda x: x[0],
    )
    all_ids = np.asarray([i for i, _ in rows], dtype=np.int64)
    m = np.asarray([e for _, e in rows], dtype=np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    unit = m / np.where(norms == 0, 1.0, norms)
    ref = ray.put((all_ids, unit))
    scale = 10.0**round_nd

    def _exact(batch: pd.DataFrame) -> pd.DataFrame:
        ids, unit_m = ray.get(ref)
        pos = {int(i): p for p, i in enumerate(ids)}
        rows_idx = np.asarray([pos[int(i)] for i in batch[id_col]], dtype=np.int64)
        sims = unit_m[rows_idx] @ unit_m.T  # (b, N)
        # DuckDB-compatible rounding (half away from zero) so the
        # oracle comparison is exact despite float32-ish kernels
        r = np.trunc(sims * scale + np.copysign(0.5, sims)) / scale
        out_a, out_b, out_c = [], [], []
        for k, p in enumerate(rows_idx):
            mask = (ids > ids[p]) & (r[k] >= threshold)
            js = np.flatnonzero(mask)
            out_a.extend([int(ids[p])] * len(js))
            out_b.extend(int(ids[j]) for j in js)
            out_c.extend(float(r[k, j]) for j in js)
        return pd.DataFrame(
            {
                "id_a": np.asarray(out_a, np.int64),
                "id_b": np.asarray(out_b, np.int64),
                "cos": np.asarray(out_c, np.float64),
            }
        )

    return ds.select_columns([id_col]).map_batches(_exact, batch_format="pandas")


NGRAM_BROADCAST_DOC_LIMIT = 200_000


def ngram_jaccard_pairs(
    pairs: "ray.data.Dataset",
    docs: "ray.data.Dataset",
    n: int = 5,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_doc_limit: int = NGRAM_BROADCAST_DOC_LIMIT,
    gramfn=None,
    sim_col: str = "ngram_jaccard",
    denom: str = "union",
) -> "ray.data.Dataset":
    """Re-verify candidate pairs with exact set-Jaccard — character
    ``n``-grams by default; pass ``gramfn`` (text -> set) for any other
    shingling (word tokens, etc.) and ``sim_col`` to rename the score.
    ``denom="min"`` scores the Szymkiewicz–Simpson overlap coefficient
    ``|A∩B| / min(|A|,|B|)`` instead — the containment measure that
    catches subset near-dups Jaccard dilutes (a page embedded whole
    inside a longer one).

    Plan choice by measured corpus size:

    - small corpus (≤ ``broadcast_doc_limit`` docs): texts broadcast
      once (`ray.put`), candidate stream maps against them — the fast
      path when every worker heap can hold the text table;
    - large corpus: texts are JOINED onto the pair stream instead (two
      hash-partitioned joins on id_a / id_b), so no single heap ever
      holds all text — the 100-TB-safe path.
    """
    if gramfn is None:
        def gramfn(t, _n=n):
            return {t[k : k + _n] for k in range(max(1, len(t) - _n + 1))}

    n_docs = docs.count()
    if n_docs <= broadcast_doc_limit:
        texts = {
            r[id_col]: r[text_col]
            for r in docs.select_columns([id_col, text_col]).iter_rows()
        }
        ref = ray.put(texts)

        def _verify_bc(batch: pd.DataFrame) -> pd.DataFrame:
            all_texts = ray.get(ref)
            memo: dict = {}  # per-batch memo: each doc's grams once

            def g(i) -> set:
                s = memo.get(i)
                if s is None:
                    s = gramfn(all_texts[i])
                    memo[i] = s
                return s

            sims = np.empty(len(batch))
            for x, (a, b) in enumerate(zip(batch["id_a"], batch["id_b"])):
                ga, gb = g(a), g(b)
                u = (min(len(ga), len(gb)) if denom == "min"
                     else len(ga | gb))
                sims[x] = len(ga & gb) / u if u else 0.0
            out = batch.copy()
            out[sim_col] = sims
            return out[out[sim_col] >= threshold]

        return pairs.map_batches(_verify_bc, batch_format="pandas")

    # join path: ship each pair's two texts through the shuffle, never
    # the whole corpus to one heap.  TWO joins run concurrently in this
    # plan, so each gets half the usual aggregator budget — at the
    # default sizing their combined actor reservation can cover a small
    # cluster's every CPU and starve the map stages feeding them
    # (observed livelock at 4 CPUs).
    from .relational import hash_join

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    P = max(2, ncpu // 2)

    def _side(suffix: str):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {f"_id{suffix}": batch[id_col], f"_text{suffix}": batch[text_col]}
            )

        return fn

    d = docs.select_columns([id_col, text_col])
    j = hash_join(
        pairs,
        d.map_batches(_side("_a"), batch_format="pandas"),
        on=("id_a",),
        right_on=("_id_a",),
        num_partitions=P,
    )
    j = hash_join(
        j,
        d.map_batches(_side("_b"), batch_format="pandas"),
        on=("id_b",),
        right_on=("_id_b",),
        num_partitions=P,
    )

    def _verify(batch: pd.DataFrame) -> pd.DataFrame:
        sims = np.empty(len(batch))
        memo: dict = {}  # per-batch memo (a doc repeats across its pairs)

        def g(i, t):
            s = memo.get(i)
            if s is None:
                s = gramfn(t)
                memo[i] = s
            return s

        for x, (a, ta, b, tb) in enumerate(
            zip(batch["id_a"], batch["_text_a"], batch["id_b"], batch["_text_b"])
        ):
            ga, gb = g(a, ta), g(b, tb)
            u = (min(len(ga), len(gb)) if denom == "min"
                 else len(ga | gb))
            sims[x] = len(ga & gb) / u if u else 0.0
        # Ray's join already consumed the right-side key columns
        drop = [c for c in ("_id_a", "_text_a", "_id_b", "_text_b") if c in batch]
        out = batch.drop(columns=drop).copy()
        out[sim_col] = sims
        return out[out[sim_col] >= threshold]

    return j.map_batches(_verify, batch_format="pandas")


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

BROADCAST_VECTOR_DOC_LIMIT = 500_000  # 64-dim float64 ⇒ ≤ ~256 MB store


def _unit_rows(batch: pa.Table, emb_col: str) -> np.ndarray:
    embs = np.asarray(batch[emb_col].to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(embs, axis=1, keepdims=True)
    return embs / np.where(norms == 0, 1.0, norms)


def _hyperplane_buckets(
    unit: np.ndarray, band_bits: int, n_bands: int, seed: int
) -> np.ndarray:
    """(n, n_bands) uint64 band-disjoint bucket keys."""
    dim = unit.shape[1]
    planes = np.random.default_rng(seed).standard_normal(
        (dim, n_bands * band_bits)
    )
    signs = (unit @ planes) > 0  # (n, n_bands*band_bits)
    weights = (1 << np.arange(band_bits, dtype=np.uint64))
    vals = (
        signs.reshape(len(unit), n_bands, band_bits).astype(np.uint64)
        @ weights
    )
    band_idx = np.arange(n_bands, dtype=np.uint64)[None, :]
    return (band_idx << np.uint64(band_bits)) | vals  # disjoint per band


def _auto_hyperplane_params(
    n_docs: int,
    threshold: float,
    band_bits,
    n_bands,
    target_bucket: int = 32,
    target_miss: float = 1e-6,
    max_bands: int = 1024,
) -> "tuple[int, int]":
    """Resolve ``"auto"`` hyperplane-LSH parameters from the MEASURED
    corpus size: band_bits ≈ log2(n / target_bucket) keeps mean bucket
    size under the all-pairs cap (a fixed 4-bit default left ~n/16-doc
    buckets at 10× scale, tripping the SNM fallback and silently
    losing recall), and n_bands re-derives so a pair AT the threshold
    still shares ≥1 band with P ≥ 1 - target_miss
    (p = 1 - arccos(c)/π per hyperplane)."""
    import math

    b = band_bits
    if b == "auto":
        b = max(4, math.ceil(math.log2(max(n_docs, 2) / target_bucket)))
    nb = n_bands
    if nb == "auto":
        p = 1.0 - math.acos(min(max(threshold, -1.0), 1.0)) / math.pi

        def _need(bits: int) -> int:
            pb = p**bits
            if not (0.0 < pb < 1.0):
                return 16
            return max(
                16,
                math.ceil(math.log(1.0 / target_miss) / -math.log1p(-pb)),
            )

        nb = _need(b)
        if nb > max_bands and band_bits == "auto":
            # Silently clamping to max_bands would degrade the stated
            # P(miss) ≤ target_miss guarantee (threshold 0.4 at ~2M
            # docs needs ~22k bands at bucket-sized bits, and a 1024
            # clamp leaves ~0.5 miss probability).  Trade bucket size
            # for per-band collision probability instead: lower
            # band_bits while mean bucket size still fits the
            # all-pairs verification cap, so recall is preserved
            # without the SNM fallback engaging.
            while nb > max_bands and b > 1 and (
                n_docs / 2.0 ** (b - 1) <= ALLPAIRS_CAP
            ):
                b -= 1
                nb = _need(b)
        if nb > max_bands:
            raise ValueError(
                f"hyperplane LSH cannot meet P(miss) ≤ {target_miss:g} "
                f"at threshold {threshold} within max_bands={max_bands} "
                f"(needs {nb} bands at band_bits={b}, n_docs={n_docs}); "
                "raise the threshold, pass explicit band_bits/n_bands "
                "(accepting the measured recall), or use "
                "embedding_dup_pairs_exact / semantic_dedup for "
                "low-threshold regimes"
            )
    return int(b), int(nb)


def embedding_dup_pairs(
    ds: "ray.data.Dataset",
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    band_bits="auto",
    n_bands="auto",
    seed: int = 97,
    round_nd: int = 4,
    transport: str = "auto",
    broadcast_doc_limit: int = BROADCAST_VECTOR_DOC_LIMIT,
) -> "ray.data.Dataset":
    """Cosine near-dup pairs by multi-band random-hyperplane LSH + exact
    in-bucket cosine (rounded to ``round_nd``, matching the SQL
    ``list_cosine_similarity`` oracle).

    Recall: a pair at cosine c shares one band with
    P = 1-(1-p^band_bits)^n_bands where p = 1-arccos(c)/π.
    ``band_bits``/``n_bands`` default to ``"auto"``: resolved from the
    MEASURED corpus size by :func:`_auto_hyperplane_params`, so mean
    bucket size stays under the all-pairs cap at ANY scale while a
    pair at the threshold still collides with P ≥ 1-1e-6 (a fixed
    4-bit default silently lost recall at 10× the tuning scale when
    ~n/16-doc buckets hit the SNM fallback — caught by the sf0.1
    strict sweep).  Over-cap buckets still degrade to the bounded SNM
    sweep (skew guard, observable via the generic pair kernel).

    ``transport`` as in :func:`minhash_dup_pairs` — and it matters
    MOST here: the payload plan ships the 8·dim-byte float64 unit
    vector on EVERY band row (~40 KB/doc at dim 64 × 80 bands), the
    slim plans shuffle 16 B rows and attach vectors to the deduped
    candidates via a broadcast store (vectors ride the generic uint64
    store as lossless bit-views) or two hash joins."""
    if transport == "payload":
        if band_bits == "auto" or n_bands == "auto":
            band_bits, n_bands = _auto_hyperplane_params(
                ds.count(), threshold, band_bits, n_bands
            )
        return _embedding_dup_pairs_payload(
            ds, emb_col, id_col, threshold, band_bits, n_bands, seed,
            round_nd,
        )
    if transport not in ("auto", "broadcast", "join"):
        raise ValueError(f"unknown transport {transport!r}")

    def _featurize(batch: pa.Table) -> pa.Table:
        unit = _unit_rows(batch, emb_col)
        return pa.table(
            {
                "doc_id": pa.array(_ids64(batch, id_col), pa.int64()),
                # float64 units as uint64 BIT-VIEWS: lossless, and they
                # ride the same flat-uint64 store/packed-binary join
                # machinery as the shingle sketches
                "shingles": pa.array(
                    list(unit.view(np.uint64)), pa.list_(pa.uint64())
                ),
            }
        )

    # featurize BEFORE bucketing: band parameters resolve from the
    # materialized count, then buckets derive per batch from the stored
    # unit bit-views (planes re-seeded deterministically per batch)
    feats = ds.map_batches(_featurize, batch_format="pyarrow").materialize()
    n_docs = feats.count()
    band_bits, n_bands = _auto_hyperplane_params(
        n_docs, threshold, band_bits, n_bands
    )
    scale = 10.0**round_nd

    def _units_of(batch: pa.Table) -> "tuple[np.ndarray, np.ndarray]":
        offs, vals = _list_col_flat(batch, "shingles")
        dim = int(offs[1] - offs[0]) if batch.num_rows else 1
        return _ids64(batch, "doc_id"), vals.view(np.float64).reshape(-1, dim)

    if transport == "auto" and n_docs <= PAYLOAD_CUTOVER_DOCS:
        feats = _coalesce_payload_feats(
            feats, n_docs, (feats.size_bytes() or 0) * n_bands
        )

        def _explode_pay(batch: pa.Table) -> pa.Table:
            ids, unit = _units_of(batch)
            bucket = _hyperplane_buckets(unit, band_bits, n_bands, seed)
            idx = np.repeat(np.arange(len(ids)), n_bands)
            sh = batch["shingles"].combine_chunks().take(
                pa.array(idx, pa.int64())
            )
            return pa.table(
                {
                    "bucket": pa.array(bucket.reshape(-1), pa.uint64()),
                    "doc_id": pa.array(ids[idx], pa.int64()),
                    "shingles": sh,
                }
            )

        def _verify_small(g: pd.DataFrame, ii, jj):
            m = np.stack(
                [np.asarray(u, np.uint64) for u in g["shingles"].to_numpy()]
            ).view(np.float64)
            sims = np.einsum("ij,ij->i", m[ii], m[jj])
            sims = np.trunc(sims * scale + np.copysign(0.5, sims)) / scale
            return sims >= threshold, sims

        pairs = _bucketed_pairs(
            feats.map_batches(_explode_pay, batch_format="pyarrow"),
            _verify_small,
        )
        return pairs.map_batches(
            lambda df: df.rename(columns={"sim": "cos"}),
            batch_format="pandas",
        )

    def _explode(batch: pa.Table) -> pa.Table:
        ids, unit = _units_of(batch)
        bucket = _hyperplane_buckets(unit, band_bits, n_bands, seed)
        return pa.table(
            {
                "bucket": pa.array(bucket.reshape(-1), pa.uint64()),
                "doc_id": pa.array(
                    np.repeat(ids, n_bands), pa.int64()
                ),
            }
        )

    cands = _bucketed_candidates(
        feats.map_batches(_explode, batch_format="pyarrow"),
        slim_rows=n_docs * n_bands,
    )
    sketches = feats.select_columns(["doc_id", "shingles"])

    def _emit(ids_a, ids_b, ua, ub) -> pa.Table:
        sims = np.einsum("ij,ij->i", ua, ub)
        sims = np.trunc(sims * scale + np.copysign(0.5, sims)) / scale
        keep = sims >= threshold
        return pa.table(
            {
                "id_a": pa.array(ids_a[keep], pa.int64()),
                "id_b": pa.array(ids_b[keep], pa.int64()),
                "cos": pa.array(sims[keep], pa.float64()),
            }
        )

    if transport == "broadcast" or (
        transport == "auto" and n_docs <= broadcast_doc_limit
    ):
        from ..functions.feature_store import IdListStore

        store = IdListStore.from_arrow(
            _arrow_tables(sketches), "doc_id", "shingles"
        )
        ref = ray.put(store)

        def _verify_bc(batch: pa.Table) -> pa.Table:
            st = ray.get(ref)
            ia_ids, ib_ids = _ids64(batch, "id_a"), _ids64(batch, "id_b")
            if not len(ia_ids):
                return _emit(ia_ids, ib_ids,
                             np.empty((0, 1)), np.empty((0, 1)))
            ia, ib = st.rows(ia_ids), st.rows(ib_ids)
            ua = np.stack([st.get(i) for i in ia]).view(np.float64)
            ub = np.stack([st.get(i) for i in ib]).view(np.float64)
            return _emit(ia_ids, ib_ids, ua, ub)

        return cands.map_batches(_verify_bc, batch_format="pyarrow")

    from .relational import hash_join

    fa = sketches.map_batches(
        _pack_sketch_bin("doc_id", "id_a", "sh_a"), batch_format="pyarrow"
    )
    fb = sketches.map_batches(
        _pack_sketch_bin("doc_id", "id_b", "sh_b"), batch_format="pyarrow"
    )
    np_join = _nested_join_partitions()
    joined = hash_join(
        hash_join(cands, fa, on=["id_a"], num_partitions=np_join),
        fb, on=["id_b"], num_partitions=np_join,
    )

    def _verify_join(batch: pa.Table) -> pa.Table:
        ia_ids, ib_ids = _ids64(batch, "id_a"), _ids64(batch, "id_b")
        if not len(ia_ids):
            return _emit(ia_ids, ib_ids, np.empty((0, 1)), np.empty((0, 1)))
        ua = np.stack(
            [np.frombuffer(v, np.float64) for v in batch["sh_a"].to_pylist()]
        )
        ub = np.stack(
            [np.frombuffer(v, np.float64) for v in batch["sh_b"].to_pylist()]
        )
        return _emit(ia_ids, ib_ids, ua, ub)

    return joined.map_batches(_verify_join, batch_format="pyarrow")


def _embedding_dup_pairs_payload(
    ds: "ray.data.Dataset",
    emb_col: str,
    id_col: str,
    threshold: float,
    band_bits: int,
    n_bands: int,
    seed: int,
    round_nd: int,
) -> "ray.data.Dataset":
    """Legacy payload plan (unit vector rides every band-key row)."""

    def _featurize(batch: pa.Table) -> pa.Table:
        unit = _unit_rows(batch, emb_col)
        bucket = _hyperplane_buckets(unit, band_bits, n_bands, seed)
        n = len(unit)
        idx = np.repeat(np.arange(n), n_bands)
        return pa.table(
            {
                "bucket": pa.array(bucket.reshape(-1), pa.uint64()),
                "doc_id": pa.array(_ids64(batch, id_col)[idx], pa.int64()),
                "unit": pa.array(list(unit[idx]), pa.list_(pa.float64())),
            }
        )

    scale = 10.0**round_nd

    def _verify(g: pd.DataFrame, ii, jj):
        m = np.asarray([np.asarray(u, np.float64) for u in g["unit"].to_numpy()])
        sims = np.einsum("ij,ij->i", m[ii], m[jj])
        sims = np.trunc(sims * scale + np.copysign(0.5, sims)) / scale
        return sims >= threshold, sims

    pairs = _bucketed_pairs(
        ds.map_batches(_featurize, batch_format="pyarrow"), _verify
    )
    return pairs.map_batches(
        lambda df: df.rename(columns={"sim": "cos"}), batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# exact duplicate token spans (substring dedup, Lee et al. 2022 shape)
# ---------------------------------------------------------------------------

# dup-span sets above this many keys stop being broadcast (~16 MB of
# uint64) and switch to the join+sweep path
SPAN_BROADCAST_LIMIT = 2_000_000

_SPAN_MULT = np.uint64(0x9E3779B97F4A7C15)  # odd ⇒ invertible mod 2^64


def _span_hashes(token_hashes: np.ndarray, width: int) -> np.ndarray:
    """uint64 hash of every ``width``-token window: position-weighted
    polynomial over per-token SipHashes (vectorized sliding dot with
    mod-2^64 wraparound).  Collisions need an exact linear relation
    between distinct token-hash windows — ~2^-64 per pair."""
    n = len(token_hashes) - width + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        powers = np.power(
            _SPAN_MULT, np.arange(width - 1, -1, -1, dtype=np.uint64),
            dtype=np.uint64,
        )
        win = np.lib.stride_tricks.sliding_window_view(token_hashes, width)
        return (win * powers).sum(axis=1, dtype=np.uint64)


def _doc_span_hashes(text: str, width: int) -> np.ndarray:
    # split on single space (NOT the word regex) so DuckDB's
    # string_split(text, ' ') sees the identical token sequence
    return _span_hashes(
        texthash.hash_str_array(text.split(" ")), width
    )


def _dup_span_keys(
    docs: "ray.data.Dataset",
    width: int,
    min_count: int,
    text_col: str,
    id_col: str,
) -> "ray.data.Dataset":
    """(h:int64) table of span hashes occurring ≥ ``min_count`` times
    corpus-wide.  Each batch pre-counts its spans (np.unique), so the
    shuffle ships (hash, partial-count) rows — never positions, never
    text; the combiner merge is exact (sum of partials)."""
    from .relational import grouped_aggregate

    def _partials(batch: pd.DataFrame) -> pd.DataFrame:
        hs = [
            _doc_span_hashes(t, width)
            for t in batch[text_col].to_numpy(object)
        ]
        flat = np.concatenate(hs) if hs else np.empty(0, np.uint64)
        uniq, cnt = np.unique(flat, return_counts=True)
        return pd.DataFrame(
            {"h": uniq.view(np.int64), "cnt": cnt.astype(np.int64)}
        )

    counts = grouped_aggregate(
        docs.select_columns([id_col, text_col]).map_batches(
            _partials, batch_format="pandas"
        ),
        keys=["h"],
        specs=[("sum", "cnt", "cnt")],
    )
    return counts.filter(expr=f"cnt >= {int(min_count)}").select_columns(["h"])


def _collect_span_keys(dup: "ray.data.Dataset", limit: int):
    """Sorted uint64 array of dup-span hashes, or ``None`` once the
    stream exceeds ``limit`` (caller switches to the join path; the
    stream stops early so an oversized set costs bounded driver heap)."""
    parts: list[np.ndarray] = []
    total = 0
    for b in dup.iter_batches(batch_format="pandas", batch_size=65536):
        parts.append(b["h"].to_numpy().view(np.uint64))
        total += len(parts[-1])
        if total > limit:
            return None
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.sort(np.concatenate(parts))


def _join_parts_for(rows: int) -> int:
    """Hash-join partitions sized to the measured small side: an empty
    hash-join partition reaches Acero as a schema-less block and
    crashes finalize (Ray 2.49) — tiny sides get ONE partition."""
    from .relational import DEDUP_PARTITIONS

    return 1 if rows <= 1000 else min(DEDUP_PARTITIONS, rows // 1000 + 2)


def _span_position_emitter(width: int, text_col: str, id_col: str):
    """Per-batch ``(id, pos, h)`` span-row emitter for the join paths
    (one row per width-token window; text itself never leaves here)."""

    def _emit_positions(batch: pd.DataFrame) -> pd.DataFrame:
        ids, poss, hss = [], [], []
        for i, t in zip(
            batch[id_col].to_numpy(), batch[text_col].to_numpy(object)
        ):
            hs = _doc_span_hashes(t, width)
            ids.extend([i] * len(hs))
            poss.append(np.arange(len(hs), dtype=np.int64))
            hss.append(hs.view(np.int64))
        return pd.DataFrame(
            {
                id_col: ids,
                "pos": np.concatenate(poss) if poss else np.empty(0, np.int64),
                "h": np.concatenate(hss) if hss else np.empty(0, np.int64),
            }
        )

    return _emit_positions


def _dup_starts_per_doc(
    slim: "ray.data.Dataset",
    dup: "ray.data.Dataset",
    width: int,
    text_col: str,
    id_col: str,
):
    """Join path core shared by :func:`span_dup_stats` and
    :func:`strip_duplicate_spans`: span positions hash-joined against
    the (materialized) dup table → per-doc sorted start positions,
    PACKED int64 bytes per doc (Acero rejects list payload columns;
    the consumer unpacks with zero-copy np.frombuffer).  Returns the
    materialized ``(id, starts_bin)`` dataset — one row per doc that
    has at least one duplicate span, far smaller than the corpus."""
    from .relational import DEDUP_PARTITIONS, hash_join

    spans = slim.map_batches(
        _span_position_emitter(width, text_col, id_col),
        batch_format="pandas",
    )
    hits = (
        hash_join(spans, dup, on=("h",), num_partitions=_join_parts_for(dup.count()))
        .select_columns([id_col, "pos"])
        .materialize()
    )

    def _part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_part"] = (
            pd.util.hash_pandas_object(batch[id_col], index=False).to_numpy()
            % DEDUP_PARTITIONS
        ).astype("int32")
        return batch

    def _pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "pos"], kind="mergesort")
        out_id, out_bin = [], []
        for i, grp in g.groupby(id_col, sort=False):
            out_id.append(i)
            out_bin.append(grp["pos"].to_numpy(np.int64).tobytes())
        return pd.DataFrame({id_col: out_id, "starts_bin": out_bin})

    return (
        hits.map_batches(_part, batch_format="pandas")
        .groupby("_part")
        .map_groups(_pack, batch_format="pandas")
        .materialize()
    )


def _covered_union(starts: np.ndarray, width: int) -> int:
    """|∪ [s, s+width)| for sorted start positions."""
    if len(starts) == 0:
        return 0
    return int(np.minimum(np.diff(starts), width).sum()) + width


def span_dup_stats(
    docs: "ray.data.Dataset",
    width: int = 5,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_span_limit: int = SPAN_BROADCAST_LIMIT,
) -> "ray.data.Dataset":
    """Per-doc exact duplicate-span census: of the ``width``-token
    windows of each doc, how many occur ≥ ``min_count`` times in the
    WHOLE corpus, and how many token positions those windows cover
    (the removal cost a Lee-et-al-style substring dedup would pay).

    Output: ``(doc_id, n_spans, dup_spans, covered_tokens)`` (int64).

    Plan: one partial-count shuffle builds the global dup-span table;
    then either (small set) the sorted hash array is broadcast once and
    each doc re-derives its spans locally — zero further shuffle — or
    (large set) span positions are hash-joined against the dup table
    and swept per doc-hash partition, so no heap ever holds the set.
    """
    dup = _dup_span_keys(docs, width, min_count, text_col, id_col)
    keys = _collect_span_keys(dup, broadcast_span_limit)
    slim = docs.select_columns([id_col, text_col])

    if keys is not None:
        ref = ray.put(keys)

        def _stats(batch: pd.DataFrame) -> pd.DataFrame:
            dup_keys = ray.get(ref)  # task stage: plasma hit, no actor pool
            ids, n_spans, dup_spans, covered = [], [], [], []
            for i, t in zip(
                batch[id_col].to_numpy(), batch[text_col].to_numpy(object)
            ):
                hs = _doc_span_hashes(t, width)
                pos = np.searchsorted(dup_keys, hs)
                pos[pos == len(dup_keys)] = 0
                mask = (
                    dup_keys[pos] == hs if len(dup_keys) else
                    np.zeros(len(hs), bool)
                )
                starts = np.flatnonzero(mask)
                ids.append(i)
                n_spans.append(len(hs))
                dup_spans.append(int(mask.sum()))
                covered.append(_covered_union(starts, width))
            return pd.DataFrame(
                {
                    id_col: ids,
                    "n_spans": np.asarray(n_spans, np.int64),
                    "dup_spans": np.asarray(dup_spans, np.int64),
                    "covered_tokens": np.asarray(covered, np.int64),
                }
            )

        return slim.map_batches(_stats, batch_format="pandas")

    # join path: ship (doc, pos, h) span rows through one equi-join with
    # the dup table, pack per-doc start positions, and join them back to
    # the per-doc span counts — scale-safe, no heap ever holds the set.
    # The joins are SEQUENCED (materialize between them): each join's
    # aggregator-actor pool must own the cluster alone while it drains
    # (two concurrent pools + their feeding map stages livelock small
    # clusters — see ops/relational.py JOIN_AGGREGATOR_CPUS).  The
    # materialized sets are the dup-key table and per-doc starts — both
    # far smaller than the corpus.
    from .relational import hash_join

    dup = dup.materialize()
    per_doc = _dup_starts_per_doc(slim, dup, width, text_col, id_col)

    def _n_spans(batch: pd.DataFrame) -> pd.DataFrame:
        ns = np.asarray(
            [
                max(len(t.split(" ")) - width + 1, 0)
                for t in batch[text_col].to_numpy(object)
            ],
            np.int64,
        )
        return pd.DataFrame({id_col: batch[id_col].to_numpy(), "n_spans": ns})

    base = slim.map_batches(_n_spans, batch_format="pandas")
    joined = hash_join(
        base,
        per_doc,
        on=(id_col,),
        how="left_outer",
        num_partitions=_join_parts_for(per_doc.count()),
    )

    def _finish(batch: pd.DataFrame) -> pd.DataFrame:
        starts = [
            np.frombuffer(b, np.int64)
            if isinstance(b, (bytes, bytearray, memoryview))
            else np.empty(0, np.int64)
            for b in batch["starts_bin"]
        ]
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(),
                "n_spans": batch["n_spans"].to_numpy(np.int64),
                "dup_spans": np.asarray([len(s) for s in starts], np.int64),
                "covered_tokens": np.asarray(
                    [_covered_union(s, width) for s in starts], np.int64
                ),
            }
        )

    return joined.map_batches(_finish, batch_format="pandas")


def strip_duplicate_spans(
    docs: "ray.data.Dataset",
    width: int = 5,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_span_limit: int = SPAN_BROADCAST_LIMIT,
) -> "ray.data.Dataset":
    """Remove every token covered by a corpus-duplicate span (the
    destructive half of :func:`span_dup_stats`): output
    ``(doc_id, clean_text, removed_tokens)``.

    Two plans by measured dup-set size (the same switch as
    :func:`span_dup_stats` and :func:`line_dedup`):

    - ≤ ``broadcast_span_limit`` dup keys (8 B each, 2M ≈ 16 MB): the
      sorted hash array broadcasts once; each doc re-derives its spans
      locally — zero further shuffle.
    - above it: span positions hash-join against the dup table, pack
      into per-doc start lists, and join back onto the doc text —
      no worker heap ever holds the dup set; text crosses the attach
      join exactly once (the unavoidable cost of a destructive
      rewrite: the positions must meet the text somewhere).
    """

    def _strip_one(toks: list, starts: np.ndarray):
        cover = np.zeros(len(toks) + 1, np.int64)
        np.add.at(cover, starts, 1)
        np.add.at(cover, starts + width, -1)
        keep = np.cumsum(cover[:-1]) == 0
        return (
            " ".join(np.asarray(toks, object)[keep]),
            int((~keep).sum()),
        )

    dup = _dup_span_keys(docs, width, min_count, text_col, id_col)
    keys = _collect_span_keys(dup, broadcast_span_limit)
    slim = docs.select_columns([id_col, text_col])

    if keys is not None:
        ref = ray.put(keys)

        def _strip(batch: pd.DataFrame) -> pd.DataFrame:
            dup_keys = ray.get(ref)
            ids, texts, removed = [], [], []
            for i, t in zip(
                batch[id_col].to_numpy(), batch[text_col].to_numpy(object)
            ):
                toks = t.split(" ")
                hs = _doc_span_hashes(t, width)
                if len(dup_keys) and len(hs):
                    pos = np.searchsorted(dup_keys, hs)
                    pos[pos == len(dup_keys)] = 0
                    starts = np.flatnonzero(dup_keys[pos] == hs)
                else:
                    starts = np.empty(0, np.int64)
                txt, rm = _strip_one(toks, starts)
                ids.append(i)
                texts.append(txt)
                removed.append(rm)
            return pd.DataFrame(
                {
                    id_col: ids,
                    "clean_text": texts,
                    "removed_tokens": np.asarray(removed, np.int64),
                }
            )

        return slim.map_batches(_strip, batch_format="pandas")

    # join fallback: per-doc packed start positions attach to the text
    from .relational import hash_join

    dup = dup.materialize()
    per_doc = _dup_starts_per_doc(slim, dup, width, text_col, id_col)
    joined = hash_join(
        slim,
        per_doc,
        on=(id_col,),
        how="left_outer",
        num_partitions=_join_parts_for(per_doc.count()),
    )

    def _strip_joined(batch: pd.DataFrame) -> pd.DataFrame:
        ids, texts, removed = [], [], []
        for i, t, sb in zip(
            batch[id_col].to_numpy(),
            batch[text_col].to_numpy(object),
            batch["starts_bin"],
        ):
            starts = (
                np.frombuffer(sb, np.int64)
                if isinstance(sb, (bytes, bytearray, memoryview))
                else np.empty(0, np.int64)
            )
            txt, rm = _strip_one(t.split(" "), starts)
            ids.append(i)
            texts.append(txt)
            removed.append(rm)
        return pd.DataFrame(
            {
                id_col: ids,
                "clean_text": texts,
                "removed_tokens": np.asarray(removed, np.int64),
            }
        )

    return joined.map_batches(_strip_joined, batch_format="pandas")


# ---------------------------------------------------------------------------
# corpus-level line dedup (C4 / Dolma paragraph-dedup shape)
# ---------------------------------------------------------------------------

LINE_DUP_BROADCAST_LIMIT = 2_000_000  # duplicated-line keys broadcast cap
_LINE_POS_SHIFT = 20  # composite position = doc_id << 20 | line_no

# blank-line test strips EXACTLY this ASCII set on both sides (python
# str.strip() would also strip unicode whitespace, which DuckDB's trim
# charset below cannot see — keep the two definitions bit-identical)
_WS_ASCII = " \t\r\x0b\x0c"


def _line_rows(batch: pd.DataFrame, text_col: str, id_col: str) -> pd.DataFrame:
    """Slim per-line rows for ELIGIBLE lines (non-blank after strip):
    (line_key, pos).  pos = doc_id << 20 | line_no — the lexicographic
    (doc_id, line_no) order as ONE int64 so a plain grouped min finds
    the global first occurrence.  Contract (documented): doc_id < 2^43
    and < 2^20 lines per document."""
    keys, poss = [], []
    for did, t in zip(
        batch[id_col].to_numpy(), batch[text_col].to_numpy(object)
    ):
        lines = t.split("\n")
        elig = [i for i, ln in enumerate(lines) if ln.strip(_WS_ASCII)]
        if not elig:
            continue
        keys.append(
            texthash.hash_str_array([lines[i] for i in elig]).astype(np.int64)
        )
        base = int(did) << _LINE_POS_SHIFT
        poss.append(np.array([base | i for i in elig], dtype=np.int64))
    if not keys:
        return pd.DataFrame(
            {"line_key": pd.Series(dtype="int64"), "pos": pd.Series(dtype="int64")}
        )
    return pd.DataFrame(
        {"line_key": np.concatenate(keys), "pos": np.concatenate(poss)}
    )


def _dup_line_table(
    ds: "ray.data.Dataset", text_col: str, id_col: str
) -> "ray.data.Dataset":
    """(line_key, first_pos) for every line occurring ≥ 2 times in the
    corpus.  Per-batch partial (count, min-pos) combiner first, so the
    shuffle carries one row per distinct line per block — never one per
    occurrence."""
    from .relational import grouped_aggregate

    def _partials(batch: pd.DataFrame) -> pd.DataFrame:
        rows = _line_rows(batch, text_col, id_col)
        if not len(rows):
            rows["cnt"] = pd.Series(dtype="int64")
            return rows[["line_key", "cnt", "pos"]]
        gb = rows.groupby("line_key", sort=False)
        out = gb.agg(cnt=("pos", "size"), pos=("pos", "min")).reset_index()
        return out[["line_key", "cnt", "pos"]]

    merged = grouped_aggregate(
        ds.select_columns([id_col, text_col]).map_batches(
            _partials, batch_format="pandas"
        ),
        keys=["line_key"],
        specs=[("sum", "cnt", "cnt"), ("min", "pos", "first_pos")],
    )
    return merged.filter(expr="cnt >= 2").select_columns(
        ["line_key", "first_pos"]
    )


def line_dedup(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_limit: int = LINE_DUP_BROADCAST_LIMIT,
) -> "ray.data.Dataset":
    """Corpus-level exact line dedup (the C4/Dolma paragraph-dedup
    shape): a non-blank line occurring in ≥ 2 places corpus-wide is
    kept ONLY at its first occurrence by (doc_id, line_no); blank /
    whitespace-only lines are structure and never dropped.  Returns
    (id, text, n_lines, n_dropped) with ``text`` rebuilt from the kept
    lines.

    Plan: slim (line_key, pos) combiner census → duplicated keys with
    their global min pos → measured branch: the dup-key table broadcasts
    when ≤ ``broadcast_limit`` rows (one ray.put, vectorized isin probe
    per doc batch — the corpus streams, text never shuffles); above it,
    the drop decisions flow back as a (doc_id, dropped line_nos) join
    (slim rows both ways, one hash exchange keyed on doc id).
    Oracle: DuckDB re-derives keeper positions from the LINE STRINGS
    themselves, so a line_key hash collision would show up as a
    mismatch."""
    dup = _dup_line_table(ds, text_col, id_col).materialize()
    n_dup = dup.count()

    def _rebuild(batch: pd.DataFrame, drop_lookup) -> pd.DataFrame:
        ids, texts, n_lines, n_dropped = [], [], [], []
        for did, t in zip(
            batch[id_col].to_numpy(), batch[text_col].to_numpy(object)
        ):
            lines = t.split("\n")
            drop = drop_lookup(int(did), lines)
            kept = [ln for i, ln in enumerate(lines) if i not in drop]
            ids.append(did)
            texts.append("\n".join(kept))
            n_lines.append(len(lines))
            n_dropped.append(len(drop))
        return pd.DataFrame(
            {
                id_col: ids,
                text_col: texts,
                "n_lines": pd.Series(n_lines, dtype="int64"),
                "n_dropped": pd.Series(n_dropped, dtype="int64"),
            }
        )

    if n_dup <= broadcast_limit:
        pdf = dup.to_pandas()
        first_pos = dict(
            zip(pdf["line_key"].to_numpy(), pdf["first_pos"].to_numpy())
        )
        ref = ray.put(first_pos)

        def _probe(batch: pd.DataFrame) -> pd.DataFrame:
            fp = ray.get(ref)

            def drop_lookup(did: int, lines: list) -> set:
                elig = [i for i, ln in enumerate(lines) if ln.strip(_WS_ASCII)]
                if not elig:
                    return set()
                keys = texthash.hash_str_array(
                    [lines[i] for i in elig]
                ).astype(np.int64)
                base = did << _LINE_POS_SHIFT
                return {
                    i
                    for i, k in zip(elig, keys)
                    if k in fp and fp[k] != (base | i)
                }

            return _rebuild(batch, drop_lookup)

        return ds.map_batches(_probe, batch_format="pandas")

    # join path: per-line slim rows ⋈ dup keys → dropped (doc_id,
    # line_no) → per-doc lists → hash join back onto the documents
    from .relational import DEDUP_PARTITIONS, hash_join

    def _lines_slim(batch: pd.DataFrame) -> pd.DataFrame:
        return _line_rows(batch, text_col, id_col)

    lines = ds.select_columns([id_col, text_col]).map_batches(
        _lines_slim, batch_format="pandas"
    )
    dropped = hash_join(lines, dup, on=("line_key",)).filter(
        expr="pos != first_pos"
    )

    def _doc_no(batch: pd.DataFrame) -> pd.DataFrame:
        pos = batch["pos"].to_numpy()
        return pd.DataFrame(
            {
                id_col: pos >> _LINE_POS_SHIFT,
                "line_no": pos & ((1 << _LINE_POS_SHIFT) - 1),
                "_part": (pos >> _LINE_POS_SHIFT) % DEDUP_PARTITIONS,
            }
        )

    def _collect(g: pd.DataFrame) -> pd.DataFrame:
        gb = g.groupby(id_col, sort=False)["line_no"].agg(list)
        return pd.DataFrame({id_col: gb.index, "_dropped": gb.to_numpy()})

    per_doc = (
        dropped.map_batches(_doc_no, batch_format="pandas")
        .groupby("_part")
        .map_groups(
            lambda g: _collect(g.drop(columns="_part")), batch_format="pandas"
        )
    ).materialize()
    # attach by measured size: two hash joins in ONE plan would hold two
    # aggregator-actor pools simultaneously and starve a small cluster's
    # map slots (see sql/engine.py decorrelation for the same trap);
    # materializing per_doc retires the first join's actors and the
    # attach broadcasts when the drop map is dimension-sized
    from .relational import BROADCAST_ROW_LIMIT, broadcast_join

    if per_doc.count() <= BROADCAST_ROW_LIMIT:
        joined = broadcast_join(
            ds.select_columns([id_col, text_col]), per_doc,
            on=[id_col], how="left_outer",
        )
    else:
        joined = hash_join(ds.select_columns([id_col, text_col]), per_doc,
                           on=(id_col,), how="left_outer")

    def _apply(batch: pd.DataFrame) -> pd.DataFrame:
        dropmap = {
            int(d): set(np.asarray(v, dtype=np.int64).tolist())
            for d, v in zip(
                batch[id_col].to_numpy(), batch["_dropped"].to_numpy(object)
            )
            if v is not None and not (isinstance(v, float) and np.isnan(v))
        }
        return _rebuild(
            batch.drop(columns=["_dropped"]),
            lambda did, lines: dropmap.get(did, set()),
        )

    return joined.map_batches(_apply, batch_format="pandas")


def line_dedup_oracle_sql(table: str, text_col: str = "text",
                          id_col: str = "doc_id") -> str:
    """DuckDB SQL re-deriving :func:`line_dedup` exactly — from the line
    STRINGS (not the engine's hashes), so it also proves no hash
    collision changed the answer."""
    return f"""
WITH split AS (
  SELECT {id_col}, string_split({text_col}, chr(10)) AS parts
  FROM {table}
), lines AS (
  SELECT {id_col}, g AS line_no, parts[g + 1] AS line,
         trim(parts[g + 1], ' ' || chr(9) || chr(13) || chr(11) || chr(12)) <> '' AS elig
  FROM split,
       LATERAL (SELECT unnest(generate_series(0, len(parts) - 1)) AS g) gs
), keeper AS (
  SELECT line, count(*) AS cnt,
         min({id_col} * {1 << _LINE_POS_SHIFT} + line_no) AS first_pos
  FROM lines WHERE elig GROUP BY line
), kept AS (
  SELECT l.{id_col}, l.line_no, l.line,
         (NOT l.elig) OR k.cnt = 1
         OR l.{id_col} * {1 << _LINE_POS_SHIFT} + l.line_no = k.first_pos
           AS keep
  FROM lines l LEFT JOIN keeper k ON l.elig AND l.line = k.line
)
SELECT s.{id_col},
       coalesce(a.txt, '') AS {text_col},
       CAST(len(s.parts) AS BIGINT) AS n_lines,
       CAST(coalesce(a.nd, 0) AS BIGINT) AS n_dropped
FROM split s LEFT JOIN (
  SELECT {id_col},
         string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY line_no)
           AS txt,
         count(*) FILTER (WHERE NOT keep) AS nd
  FROM kept GROUP BY {id_col}
) a ON s.{id_col} = a.{id_col}
"""


# ---------------------------------------------------------------------------
# semantic dedup (SemDeDup: k-means bucket, within-cluster cosine)
# ---------------------------------------------------------------------------

def semantic_dedup(
    ds: "ray.data.Dataset",
    centroids: np.ndarray,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.4,
    round_nd: int = 4,
    salt: str = "semd",
) -> "ray.data.Dataset":
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): assign every vector
    to its nearest k-means centroid, then compare pairs ONLY within a
    cluster and drop every vector that has a within-cluster neighbor at
    ``cos >= threshold`` with a smaller ``(md5(salt+id), id)`` rank.
    Returns the kept ``(id_col, cluster)`` rows.

    The survivor rule is EXISTS-lower-rank (not transitive components):
    deterministic, order-free, and re-derivable in SQL as a NOT EXISTS
    — the oracle checks the exact kept set.

    SCALE: the clustering IS the blocking — the O(N²) pair space decays
    to Σ c_i² over cluster sizes, the paper's contract (k is chosen so
    clusters stay small, e.g. 50k clusters for LAION-scale).  One
    cluster-key shuffle moves each embedding once; the per-cluster
    sweep is a single unit-matmul.  A degenerate giant cluster is the
    caller's k-choice problem; the LSH path
    (:func:`embedding_dup_pairs`) is the fallback when no good k
    exists."""
    import hashlib

    cents_ref = ray.put(np.asarray(centroids, dtype=np.float64))
    scale = 10.0**round_nd

    def _label(batch: pa.Table) -> pd.DataFrame:
        from .cluster import _as_matrix, _assign

        X = _as_matrix(batch[emb_col])
        lab = _assign(X, ray.get(cents_ref))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        rk = np.fromiter(
            (
                int(hashlib.md5((salt + str(int(i))).encode()).hexdigest()[:15], 16)
                for i in ids
            ),
            np.int64,
            len(ids),
        )
        norms = np.linalg.norm(X, axis=1, keepdims=True)
        unit = X / np.where(norms == 0, 1.0, norms)
        return pd.DataFrame(
            {
                id_col: ids,
                "cluster": lab.astype(np.int64),
                "_rk": rk,
                "_unit": list(unit),
            }
        )

    def _sweep(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g[id_col].to_numpy(), g["_rk"].to_numpy()))
        g = g.iloc[order]
        U = np.stack(g["_unit"].to_numpy())
        sims = U @ U.T
        r = np.trunc(sims * scale + np.copysign(0.5, sims)) / scale
        adj = r >= threshold
        dropped = np.any(np.triu(adj, k=1), axis=0)
        kept = g.loc[~dropped, [id_col, "cluster"]]
        return kept.reset_index(drop=True)

    return (
        ds.select_columns([id_col, emb_col])
        .map_batches(_label, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(_sweep, batch_format="pandas")
    )


def semantic_dedup_oracle_sql(
    centroids_parquet: str,
    threshold: float = 0.4,
    salt: str = "semd",
) -> str:
    """DuckDB re-derivation of :func:`semantic_dedup` over the
    ``embeddings`` view: argmin assignment against the reference
    centroids, the same md5 rank, NOT EXISTS lower-rank neighbor at
    round-4 cosine >= threshold."""
    return f"""
WITH assign AS (
    SELECT vec_id, cluster FROM (
        SELECT e.vec_id, c.cluster_id AS cluster,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY list_distance(e.embedding, c.centroid),
                            c.cluster_id
               ) AS rn
        FROM embeddings e
        CROSS JOIN read_parquet('{centroids_parquet}') c
    ) WHERE rn = 1
),
r AS (
    SELECT vec_id, cluster,
           ('0x' || left(md5('{salt}' || CAST(vec_id AS VARCHAR)), 15))::BIGINT AS rk
    FROM assign
)
SELECT a.vec_id, a.cluster
FROM r a
WHERE NOT EXISTS (
    SELECT 1
    FROM r b
    JOIN embeddings ea ON ea.vec_id = a.vec_id
    JOIN embeddings eb ON eb.vec_id = b.vec_id
    WHERE b.cluster = a.cluster
      AND (b.rk < a.rk OR (b.rk = a.rk AND b.vec_id < a.vec_id))
      AND round(list_cosine_similarity(ea.embedding, eb.embedding)::DOUBLE, 4)
          >= {threshold}
)
"""


__all__ = [
    "exact_dedup",
    "minhash_dup_pairs",
    "minhash_dedup",
    "dup_assignment",
    "simhash_dup_pairs",
    "ngram_jaccard_pairs",
    "ngram_dup_all_pairs",
    "embedding_dup_pairs",
    "embedding_dup_pairs_exact",
    "semantic_dedup",
    "semantic_dedup_oracle_sql",
    "span_dup_stats",
    "strip_duplicate_spans",
    "line_dedup",
    "line_dedup_oracle_sql",
]


# ---------------------------------------------------------------------------
# Exact set-similarity self-join via prefix filtering (PPJoin-lite)
# ---------------------------------------------------------------------------

DF_RANK_BROADCAST_LIMIT = 2_000_000


def prefix_filter_pairs(
    docs: "ray.data.Dataset",
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    df_rank_broadcast_limit: int = DF_RANK_BROADCAST_LIMIT,
    broadcast_doc_limit: int = NGRAM_BROADCAST_DOC_LIMIT,
) -> "ray.data.Dataset":
    """EXACT word-token Jaccard-threshold self-join — no approximation,
    no all-pairs: the prefix-filtering plan of PPJoin (Xiao et al.,
    WWW 2008) / AllPairs (Bayardo et al., WWW 2007).

    Completeness argument: fix any global total order on tokens and
    sort each record's distinct-token set by it.  If
    ``J(A, B) ≥ t`` then A and B must share a token inside each
    other's first ``|S| - ceil(t·|S|) + 1`` tokens (the *prefix*) —
    so grouping records by prefix tokens generates EVERY qualifying
    pair, and the in-bucket size filter ``|small| ≥ ceil(t·|large|)``
    prunes the rest before verification.

    Exchanges: (1) token document-frequency census — slim combiner
    shuffle — used only to pick the order (rare-first minimizes bucket
    sizes); when the vocabulary exceeds ``df_rank_broadcast_limit``
    the order falls back to the md5 hash of the token (any CONSISTENT
    order keeps the plan exact, frequency order is purely an
    optimization), which needs NO broadcast at all; (2) one
    group-by-prefix-token exchange of (token, id, size) slivers;
    (3) a distinct-pair combiner shuffle; (4) verification attaches
    text by the measured broadcast-vs-join switch of
    :func:`ngram_jaccard_pairs`.  Document text never crosses (1)-(3).

    Output: ``(id_a, id_b, jaccard)`` for all pairs with
    ``jaccard ≥ threshold``.
    """
    import hashlib
    import math

    from .relational import grouped_aggregate

    t = float(threshold)
    if not 0.0 < t <= 1.0:
        raise ValueError("threshold must be in (0, 1]")

    def _tok(text: str) -> set:
        return set(texthash.TOKEN_RE.findall(text.lower()))

    # (1) token df census -> global order
    def _doc_tokens(df: pd.DataFrame) -> pd.DataFrame:
        rows_t, rows_i = [], []
        for i, txt in zip(df[id_col].to_numpy(), df[text_col].to_numpy()):
            for w in _tok(txt):
                rows_t.append(w)
                rows_i.append(i)
        return pd.DataFrame({"token": rows_t, id_col: rows_i})

    tok = docs.select_columns([id_col, text_col]).map_batches(
        _doc_tokens, batch_format="pandas"
    )
    df_census = grouped_aggregate(
        tok, ["token"], [("count_star", None, "df")]
    ).materialize()
    n_vocab = df_census.count()
    if n_vocab <= df_rank_broadcast_limit:
        vdf = df_census.to_pandas().sort_values(
            ["df", "token"], kind="mergesort"
        )
        rank_ref = ray.put(
            dict(zip(vdf["token"].to_numpy(), range(len(vdf))))
        )
    else:
        rank_ref = None

    # (2) prefix emission: (token, id, set size) for each record's
    # first s - ceil(t*s) + 1 tokens in the global order
    def _prefix(df: pd.DataFrame) -> pd.DataFrame:
        rk = ray.get(rank_ref) if rank_ref is not None else None
        if rk is not None:
            _order = lambda words: sorted(words, key=rk.__getitem__)
        else:
            _order = lambda words: sorted(
                words,
                key=lambda w: hashlib.md5(w.encode("utf-8")).hexdigest(),
            )
        rows_t, rows_i, rows_s = [], [], []
        for i, txt in zip(df[id_col].to_numpy(), df[text_col].to_numpy()):
            words = _tok(txt)
            s = len(words)
            if s == 0:
                continue
            p = s - math.ceil(t * s) + 1
            for w in _order(words)[:p]:
                rows_t.append(w)
                rows_i.append(i)
                rows_s.append(s)
        return pd.DataFrame(
            {"token": rows_t, "_id": np.asarray(rows_i, dtype=np.int64),
             "_s": np.asarray(rows_s, dtype=np.int64)}
        )

    prefixes = docs.select_columns([id_col, text_col]).map_batches(
        _prefix, batch_format="pandas"
    )

    # (3) in-bucket candidate pairs + size filter, then global distinct
    def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["_id"].to_numpy()
        sz = g["_s"].to_numpy()
        order = np.argsort(ids, kind="mergesort")
        ids, sz = ids[order], sz[order]
        k = len(ids)
        if k < 2:
            return pd.DataFrame(
                {"id_a": ids[:0], "id_b": ids[:0]}
            )
        i, j = np.triu_indices(k, 1)
        lo = np.minimum(sz[i], sz[j])
        hi = np.maximum(sz[i], sz[j])
        keep = lo >= np.ceil(t * hi)
        return pd.DataFrame({"id_a": ids[i][keep], "id_b": ids[j][keep]})

    cand = grouped_aggregate(
        prefixes.groupby("token").map_groups(
            _bucket_pairs, batch_format="pandas"
        ),
        ["id_a", "id_b"],
        [("count_star", None, "_n")],
    ).drop_columns(["_n"])

    # (4) exact verification with the same word tokenizer
    return ngram_jaccard_pairs(
        cand, docs, threshold=t, text_col=text_col, id_col=id_col,
        broadcast_doc_limit=broadcast_doc_limit,
        gramfn=_tok, sim_col="jaccard",
    )


__all__.append("prefix_filter_pairs")
