"""Flagship pipeline: pages → entity cluster assignments.

The Ray-Data-native rebuild of the reference's DataIntegrationWorkflow
ER leg (`lib/data-integration-workflow.ts:345-369` → AWS ER black box →
`integrated_customer` table, `lib/data-storage.ts:154-218`):

    read pages ─ extract (drop html) ─ normalize ─ LSH/domain banding
      ─ groupby(block_key) pair-gen (slim rows + broadcast FeatureStore
        below broadcast_features_limit; feature payload above it)
      ─ set-metric gate ─ slim dedupe ─ string metrics ─ threshold
      ─ ONE driver pass (edge dedupe + union-find + confidence,
        overlapped with the stream; distributed fallback above
        local_cc_max_edges; checkpointable via run_stage)
      ─ broadcast attach onto all records

Output schema (the `integrated_customer` analog, FIXTURES.md §4.1):
    source:str, ConfidenceLevel:float64, RecordId:str, MatchID:str, lang:str

Every record appears exactly once; unmatched records keep their own url
as MatchID with ConfidenceLevel 1.0.  MatchID is the minimum url of the
cluster — content-defined, deterministic under any parallelism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..stages.blocking import band_emit_stage, pair_gen_stage
from ..stages.clustering import confidence_stage, resolve_labels
from ..stages.config import DEFAULT_CONFIG, ERConfig
from ..stages.normalize import extract_stage, normalize_stage
from ..stages.scoring import (
    matched_edges_stage,
    score_pairs_stage,
    string_score_stage,
)


def build_idf_ref(pages, cfg: ERConfig = DEFAULT_CONFIG, presampled: bool = False):
    """Bigram IDF table from a content-hash sample of the corpus (the
    short-doc gate's boilerplate discount, `stages/scoring.py`).  Only
    the ``idf_sample_p`` fraction pays extract+normalize; the resulting
    broadcast table is O(boilerplate vocabulary) at any corpus size.

    ``presampled``: the caller already pushed the sample below the
    source (e.g. ``pages_dataset(sample_p=...)`` samples before page
    synthesis) — skip the secondary url-hash sample here."""
    from ..functions.idf import bigram_idf_ref

    if not presampled:
        from ..ops.sampling import hash_sample

        pages = hash_sample(pages, cfg.idf_sample_p, id_col="url", salt="idf")
    recs = normalize_stage(extract_stage(pages), cfg)
    return bigram_idf_ref(recs, min_df_frac=cfg.idf_min_df_frac)


def build_idf_ref_local(pages_table, cfg: ERConfig = DEFAULT_CONFIG):
    """Driver-side IDF build from an in-memory sampled pages table
    (see ``sources.pages.pages_sample_table``) — the few-hundred-row
    sample runs through the SAME extract/normalize feature functions
    in-process, skipping a Ray pipeline's fixed overhead."""
    import numpy as np

    from ..functions.extract import extract_text
    from ..functions.idf import IdfTable
    from ..stages.normalize import _batch_shingle_features

    texts = [extract_text(h) for h in pages_table["html"].to_pylist()]
    _, shingle2_sets, *_rest = _batch_shingle_features(texts, cfg)
    sets = [s for s in shingle2_sets if len(s)]
    n_total = len(sets)
    if n_total == 0:
        return ray.put(IdfTable(np.empty(0, np.uint32), np.empty(0), 1.0))
    grams, counts = np.unique(np.concatenate(sets), return_counts=True)
    min_df = max(2, int(np.ceil(cfg.idf_min_df_frac * n_total)))
    keep = counts >= min_df
    table = IdfTable(
        grams[keep],
        np.log(n_total / counts[keep].astype(np.float64)),
        default=float(np.log(n_total)),
    )
    return ray.put(table)


def matched_edges(
    pages, cfg: ERConfig = DEFAULT_CONFIG, idf_ref=None, pair_filter=None,
    records_factory=None,
):
    """pages → scored matched edges (url_a, url_b, …, score), streaming,
    exactly one row per pair.

    Candidate pairs flow through the set-metric gate WITH cross-block
    duplicates (dup factor ≈ 2.4× overall, ×17 among true pairs): a
    duplicate costs one extra vectorized set check, while deduping
    candidates would shuffle the full ~45 KB/pair feature payload.
    Dedup happens on the SLIM gated stream instead (stage 1 → 150 B/row
    survivors → one light shuffle), so the expensive string DP kernels
    in stage 2 run once per unique pair (see `stages/scoring.py`)."""
    if records_factory is not None:
        # pre-normalized records (e.g. a feature checkpoint union'd with
        # a normalized delta) — skip extract/normalize entirely
        records = records_factory()
    else:
        records = normalize_stage(extract_stage(pages), cfg)
    if cfg.feature_attach == "join":
        return _join_feature_plan(
            records, cfg, idf_ref, pair_filter, records_factory
        )
    if cfg.feature_attach in ("auto", "broadcast"):
        plan = _broadcast_feature_plan(records, cfg, idf_ref, pair_filter)
        if plan is not None:
            return plan
        if cfg.feature_attach == "broadcast":
            raise ValueError(
                "feature_attach='broadcast' but the corpus exceeds "
                "broadcast_features_limit; use 'join', 'payload' or 'auto'"
            )
        # auto, above the broadcast limit → the join plan (fresh
        # records plan — the aborted broadcast pass consumed the
        # stream).  Measured at 200k pages/32 cpus, clean windows:
        # payload 132.6 s vs join 111.7 s (BASELINE.md r3); payload
        # remains an explicit opt-in for corpora where two extra joins
        # cost more than ~53 KB/record of shuffle replication.
        records = (
            records_factory()
            if records_factory is not None
            else normalize_stage(extract_stage(pages), cfg)
        )
        return _join_feature_plan(
            records, cfg, idf_ref, pair_filter, records_factory
        )
    exploded = band_emit_stage(records, cfg)
    pairs = pair_gen_stage(exploded, cfg)
    if pair_filter is not None:
        pairs = pair_filter(pairs)
    slim = score_pairs_stage(pairs, cfg, idf_ref)  # gated + deduped
    scored = string_score_stage(slim, cfg)
    return matched_edges_stage(scored, cfg)


def _lists_to_binary(col, dtype) -> pa.Array:
    """``list<fixed-width>`` column → ``binary`` column, elementwise
    ``np.asarray(lst, dtype).tobytes()`` semantics but built from the
    Arrow buffers in two vectorized ops (values cast + offsets scale)."""
    c = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offsets = c.offsets.to_numpy().astype(np.int64)
    flat = c.values.to_numpy(zero_copy_only=False)
    itemsize = np.dtype(dtype).itemsize
    # rebase: a sliced ListArray's offsets start past 0 and its child
    # carries unreferenced values — binary offsets must start at 0
    start, stop = int(offsets[0]), int(offsets[-1])
    data = np.ascontiguousarray(flat[start:stop], dtype=dtype)
    byte_off = ((offsets - start) * itemsize).astype(np.int32)
    return pa.Array.from_buffers(
        pa.binary(),
        len(c),
        [None, pa.py_buffer(byte_off.tobytes()), pa.py_buffer(data.tobytes())],
    )


def _join_feature_plan(
    records, cfg: ERConfig, idf_ref, pair_filter=None, records_factory=None
):
    """Join-attach variant of the match plan — the unbounded-corpus
    path (``ERConfig.feature_attach``): blocking shuffles only slim
    (block_key, url, slug) rows exactly as the broadcast plan does,
    but instead of a driver-held feature table, the DEDUPLICATED
    candidate-pair stream hash-joins back to the normalized feature
    table on url_a then url_b — in TWO phases: a light attach (64 B
    MinHash sig + short-doc flag per side) feeds the vectorized
    estimate pre-gate, and only its few-% survivors join the heavy
    shingle payloads (~1.3 KB/side).  Nothing is ever collected to the
    driver, so there is no ``broadcast_features_limit`` — the feature
    replication cost of the payload plan (~1.3 KB × ~41 keys ≈ 53 KB
    per record through Shuffle #1) becomes four bounded equi-joins of
    which only the survivor-sized pair carry heavy bytes.

    Feature-table source: the normalize output is ``materialize()``d
    so blocking and both join probes read ONE computed copy from the
    object store (spilling to disk beyond memory).  When
    ``records_factory`` is provided (a Parquet feature checkpoint via
    :func:`checkpoint_features` — the 10^12-record deployment shape),
    the factory is re-invoked per consumer instead: three column-pruned
    Parquet scans, zero plasma residency.

    Pair dedupe runs BEFORE the joins (slim ~100 B rows), so the ×2.4
    cross-block duplicate factor never multiplies join traffic, and
    the gate receives exactly-once pairs (``dedupe=False``).

    Reference anchor: the candidate-generation half of
    `lib/entity-resolution-service.ts:140-183` — AWS ER's internal
    match step equally joins candidate ids back to source records.
    """
    from ..ops.relational import JOIN_AGGREGATOR_CPUS, dedupe_by_key, hash_join

    # Chained joins run their aggregator pools CONCURRENTLY under
    # streaming execution; at the default per-join partition count the
    # reserved n_joins×P×JOIN_AGGREGATOR_CPUS can swallow a small
    # cluster and starve the map stages feeding them (the attach_labels
    # deadlock, measured at P=16 on 8 CPUs).  Cap so the four pools
    # together reserve at most half the cluster.
    if cfg.feature_join_partitions is not None:
        parts = cfg.feature_join_partitions
    else:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        parts = max(2, int(ncpu / (8 * JOIN_AGGREGATOR_CPUS)))

    if records_factory is None:
        records = records.materialize()
        feats_src = lambda: records  # noqa: E731 — shared materialized copy
    else:
        feats_src = records_factory
        records = feats_src()
    slim_records = records.select_columns(
        ["url", "slug", "domain", "minhash", "tok_hashes"]
    )
    exploded = band_emit_stage(slim_records, cfg, slim=True)
    pairs = pair_gen_stage(exploded, cfg, slim=True)
    if pair_filter is not None:
        pairs = pair_filter(pairs)
    pairs = dedupe_by_key(
        pairs, ["url_a", "url_b"], partitions=cfg.pair_dedup_partitions
    )

    # --- phase 1: LIGHT attach — 64 B MinHash sig + 1 B short-doc
    # flag per side (Acero rejects list payloads; fixed-width features
    # ship as binary and the consumers np.frombuffer them zero-copy) —
    # then the vectorized estimate pre-gate drops the vast majority of
    # pairs BEFORE any heavy payload moves.
    def _light(side: str):
        feats = feats_src().select_columns(["url", "mh8", "shingles2"])

        def _pack(t: pa.Table) -> pa.Table:
            sh2 = t["shingles2"].combine_chunks()
            lens = np.diff(sh2.offsets.to_numpy().astype(np.int64))
            return pa.table(
                {
                    f"url_{side}": t["url"],
                    f"mh8_{side}": _lists_to_binary(t["mh8"], np.uint8),
                    f"short_{side}": pa.array(
                        (lens > 0).astype(np.int8), pa.int8()
                    ),
                }
            )

        return feats.map_batches(_pack, batch_format="pyarrow")

    lp = hash_join(pairs, _light("a"), on=("url_a",), num_partitions=parts)
    lp = hash_join(lp, _light("b"), on=("url_b",), num_partitions=parts)

    # EXACT-equivalence pre-gate: a pair whose sig estimate fails the
    # (min_jaccard - margin) floor keeps jac = est < min_jaccard in the
    # full gate, so it can only match through the short-doc bigram path
    # — which requires BOTH sides to carry a bigram set.  Dropping
    # (est < floor) ∧ ¬(short_a ∧ short_b) pairs here is therefore
    # bit-equal to running the full gate on everything (tested against
    # the broadcast plan), and the heavy shingle payloads below ship
    # only for the few-% survivors.
    floor = cfg.min_jaccard - cfg.est_gate_margin

    def _est_gate(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.drop_columns(["short_a", "short_b"])
        sig_a = np.stack(
            [np.frombuffer(x, np.uint8) for x in t["mh8_a"].to_pylist()]
        )
        sig_b = np.stack(
            [np.frombuffer(x, np.uint8) for x in t["mh8_b"].to_pylist()]
        )
        est = (sig_a == sig_b).mean(axis=1)
        both_short = np.logical_and(
            t["short_a"].to_numpy(zero_copy_only=False) > 0,
            t["short_b"].to_numpy(zero_copy_only=False) > 0,
        )
        keep = (est >= floor) | both_short
        return t.filter(pa.array(keep)).drop_columns(["short_a", "short_b"])

    survivors = lp.map_batches(_est_gate, batch_format="pyarrow")

    # --- phase 2: HEAVY attach (shingle sets, ~1.3 KB/side) for the
    # survivors only; mh8 already rides the pair rows from phase 1.
    def _heavy(side: str):
        feats = feats_src().select_columns(["url", "shingles", "shingles2"])

        def _pack(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    f"url_{side}": t["url"],
                    f"shingles_{side}": _lists_to_binary(t["shingles"], np.uint32),
                    f"shingles2_{side}": _lists_to_binary(t["shingles2"], np.uint32),
                }
            )

        return feats.map_batches(_pack, batch_format="pyarrow")

    withf = hash_join(survivors, _heavy("a"), on=("url_a",), num_partitions=parts)
    withf = hash_join(withf, _heavy("b"), on=("url_b",), num_partitions=parts)
    gated = score_pairs_stage(withf, cfg, idf_ref, dedupe=False)
    scored = string_score_stage(gated, cfg)
    return matched_edges_stage(scored, cfg)


def _broadcast_feature_plan(records, cfg: ERConfig, idf_ref, pair_filter=None):
    """Broadcast-feature variant of the match plan (see
    ``ERConfig.feature_attach``): ONE driver pass over the records
    stream splits each record into (a) its feature arrays, kept in a
    single broadcast table, and (b) a slim (url, slug, keys-input) row
    — so the blocking shuffle moves ~100 B/key-row instead of ~1.3 KB
    (measured 2× wall at 8 cpus from payload volume alone).  Returns
    ``None`` if the stream exceeds ``broadcast_features_limit`` rows —
    the abort costs only that many rows of normalize work, and the
    caller falls back to the scale-safe payload plan."""
    feat_batches: list = []
    slim_tables: list = []
    n = 0
    # whole blocks + prefetch: re-slicing arrow blocks through the
    # driver measured 17 s at 200k records; block passthrough is ~2 s
    for b in records.iter_batches(
        batch_size=None, prefetch_batches=8, batch_format="pyarrow"
    ):
        n += b.num_rows
        if n > cfg.broadcast_features_limit:
            return None
        feat_batches.append(b.select(["url", "slug", "shingles", "shingles2", "mh8"]))
        slim_tables.append(
            b.select(["url", "slug", "domain", "minhash", "tok_hashes"])
        )
    from ..functions.feature_store import FeatureStore

    # flat numpy columns: Ray ships these out-of-band, so each task's
    # ray.get is a zero-copy view instead of unpickling a ~90 MB dict;
    # the arrow-side build is itself zero-copy + vectorized
    feats_ref = ray.put(FeatureStore.from_arrow(feat_batches))
    if slim_tables:
        slim_records = ray.data.from_arrow(slim_tables)
    else:
        slim_records = ray.data.from_pandas(
            pd.DataFrame(
                {c: pd.Series(dtype=object)
                 for c in ("url", "slug", "domain", "minhash", "tok_hashes")}
            )
        )
    exploded = band_emit_stage(slim_records, cfg, slim=True)
    pairs = pair_gen_stage(exploded, cfg, slim=True)
    if pair_filter is not None:
        pairs = pair_filter(pairs)
    # gate first, dedupe after: a pre-gate dedupe of the raw candidate
    # stream looks cheaper (×17 duplicate true pairs) but its extra
    # shuffle BARRIER costs more wall than the duplicated vectorized
    # set checks save (measured 55 s vs 31 s at 32 cpus, 66k pages)
    # rid_output: the gate emits store row ids, so the dedupe exchange
    # moves ~30 B/row; urls/slugs come back from the store's zero-copy
    # bytes columns AFTER the dedupe (strings never cross a shuffle)
    gated = score_pairs_stage(
        pairs, cfg, idf_ref, feats_ref, dedupe=True, rid_output=True
    )
    scored = string_score_stage(gated, cfg, feats_ref=feats_ref)
    return matched_edges_stage(scored, cfg)


def _conf_map_from_edges(edges) -> dict:
    """Per-node max incident matched-edge score, computed driver-side
    from the (materialized, matched-pairs-only) edge table — edges are
    already bounded by the same budget as the union-find path, and this
    replaces a full Ray groupby stage (+ its barrier) in the broadcast
    attach path."""
    edf = edges.select_columns(["url_a", "url_b", "score"]).to_pandas()
    both = pd.concat(
        [
            edf[["url_a", "score"]].rename(columns={"url_a": "node"}),
            edf[["url_b", "score"]].rename(columns={"url_b": "node"}),
        ],
        ignore_index=True,
    )
    return both.groupby("node")["score"].max().to_dict()


def _attach_broadcast(slim, label_map: dict, conf_map: dict):
    """Broadcast-map attach: the (small) label/conf maps ship once via
    ``ray.put`` and are probed per batch — no shuffle of the records."""
    ref = ray.put((label_map, conf_map))

    def _attach(df: pd.DataFrame) -> pd.DataFrame:
        # task stage: the broadcast maps are plasma-resident, so the
        # per-task ray.get is ~free after the first touch per worker —
        # an actor pool would pay a fresh process spawn per run for a
        # lookup table's worth of state
        lm, cm = ray.get(ref)
        urls = df["url"]
        return pd.DataFrame(
            {
                "source": df["source"],
                "ConfidenceLevel": [cm.get(u, 1.0) for u in urls],
                "RecordId": urls,
                "MatchID": [lm.get(u, u) for u in urls],
                "lang": df["lang"],
            }
        )

    return slim.map_batches(_attach, batch_format="pandas")


def attach_labels(slim, labels, conf, cfg: ERConfig = DEFAULT_CONFIG, edges=None):
    """Left-attach (MatchID, ConfidenceLevel) onto the full record table.

    Plan choice by measured size: a small label table is broadcast once
    via ``ray.put`` and looked up per batch (no shuffle); a large one
    goes through a hash-partitioned left join.  The reference's analog
    is the `integrated_customer` overwrite (S3 sink,
    `lambda/integrated_customer_updater/index.py:77-86`).
    """
    n_labels = labels.count()
    if n_labels <= cfg.broadcast_label_limit:
        lab_df = labels.to_pandas()
        label_map = dict(zip(lab_df["node"], lab_df["label"]))
        if edges is not None:
            conf_map = _conf_map_from_edges(edges)
        else:
            conf_df = conf.to_pandas()
            conf_map = dict(zip(conf_df["node"], conf_df["ConfidenceLevel"]))
        return _attach_broadcast(slim, label_map, conf_map)

    # large-label path: two hash-partitioned left joins.  Partition
    # count scales with the label table — two chained joins at a fixed
    # count reserve 2×P×0.25 CPUs of aggregator actors, which on a
    # small cluster starves the map stages feeding them (measured
    # deadlock at P=16 on 8 CPUs).
    if conf is None:
        conf = confidence_stage(edges)
    from ..ops.relational import hash_join

    P = max(2, min(cfg.cc_num_partitions, n_labels // 10_000 + 2))
    joined = hash_join(
        slim, labels, on=("url",), right_on=("node",),
        how="left_outer", num_partitions=P,
    )
    joined = hash_join(
        joined, conf, on=("url",), right_on=("node",),
        how="left_outer", num_partitions=P,
    )

    def _finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "source": df["source"],
                "ConfidenceLevel": df["ConfidenceLevel"].fillna(1.0),
                "RecordId": df["url"],
                "MatchID": df["label"].fillna(df["url"]),
                "lang": df["lang"],
            }
        )

    return joined.map_batches(_finish, batch_format="pandas")


def _edge_metrics(cfg: ERConfig):
    def fn(edges) -> dict:
        import pyarrow.compute as pc

        n_capped = 0
        n = 0
        smin = None
        for b in edges.select_columns(["block_n", "score"]).iter_batches(
            batch_size=65536, batch_format="pyarrow"
        ):
            n += b.num_rows
            n_capped += pc.sum(
                pc.cast(pc.greater(b["block_n"], cfg.allpairs_cap), "int64")
            ).as_py() or 0
            mn = pc.min(b["score"]).as_py()
            smin = mn if smin is None else min(smin, mn)
        return {
            "n_edges": n,
            "edges_from_capped_blocks": n_capped,
            "min_edge_score": smin,
        }

    return fn


def resolve_entities(
    pages_factory,
    cfg: ERConfig = DEFAULT_CONFIG,
    checkpoint_dir: str | None = None,
    input_fingerprint: str = "",
    idf_sample_factory=None,
    idf_ref=None,
    slim_factory=None,
):
    """Run the full ER pipeline.

    ``pages_factory``: zero-arg callable returning the pages Dataset —
    called twice (once for the match path, once for the slim record
    re-read) so each consumption is an independent lazy plan; with a
    Parquet source the second read prunes down to 3 columns and never
    touches html bytes.

    ``checkpoint_dir``: if set, the matched-edge table — the expensive
    stage — is checkpointed via :func:`..state.run_stage` with lineage
    (input fingerprint, per-partition file list) + stage metrics (edge
    count, capped-block provenance, min matched score); a re-run with
    the same fingerprint resumes from the Parquet checkpoint without
    recomputing blocking/scoring (the reference's full-refresh S3
    prefix + DynamoDB status, rebuilt resumable).

    Returns ``(assignment, edges)`` — ``edges`` is materialized (it is
    the natural checkpoint and is small: matched pairs only).
    """
    # ``idf_sample_factory``: a zero-arg callable returning an ALREADY
    # sampled pages Dataset (sampling pushed below the source — for a
    # synthesized/derived source this avoids paying full synthesis to
    # keep idf_sample_p of it)
    if idf_ref is None:
        if idf_sample_factory is not None:
            idf_ref = build_idf_ref(idf_sample_factory(), cfg, presampled=True)
        else:
            idf_ref = build_idf_ref(pages_factory(), cfg)
    # ``slim_factory``: an optional cheaper source of the (url, source,
    # lang) projection for the attach pass — a Parquet source gets this
    # from column pruning automatically; a derived/synthesized source
    # can skip its payload generation entirely
    slim = (
        slim_factory()
        if slim_factory is not None
        else pages_factory().select_columns(["url", "source", "lang"])
    )
    if checkpoint_dir:
        from ..state import run_stage

        edges = run_stage(
            "matched_edges",
            checkpoint_dir,
            input_fingerprint,
            lambda: matched_edges(pages_factory(), cfg, idf_ref),
            metrics_fn=_edge_metrics(cfg),
        )
    else:
        # fast path: ONE driver pass over the edge stream computes
        # union-find labels + per-node max score WHILE the stream runs
        # (no materialize barrier, no re-reads); falls back to the
        # distributed path if the stream exceeds local_cc_max_edges
        from ..stages.clustering import collect_edges_local

        plan = matched_edges(pages_factory(), cfg, idf_ref)
        out = collect_edges_local(plan, cfg.local_cc_max_edges)
        if out is not None:
            edges_df, label_map, conf_map = out
            edges = ray.data.from_pandas(edges_df)
            assignment = _attach_broadcast(slim, label_map, conf_map)
            return assignment, edges
        edges = plan.materialize()  # big-edge fallback: recompute-free
    labels = resolve_labels(edges, cfg)
    # the distributed (join) attach path still needs the Ray aggregate;
    # the broadcast path computes the confidence map from edges directly
    n_edges = edges.count()
    conf = (
        confidence_stage(edges)
        if n_edges > cfg.broadcast_label_limit
        else None
    )
    assignment = attach_labels(slim, labels, conf, cfg, edges=edges)
    return assignment, edges


def resolve_entities_incremental(
    pages_factory,
    prev_assignment,
    new_urls,
    cfg: ERConfig = DEFAULT_CONFIG,
    idf_ref=None,
    slim_factory=None,
    records_factory=None,
):
    """Fold a DELTA into an existing resolution without re-scoring
    old↔old pairs — the quadratic part of the workload when
    |delta| ≪ |corpus|.

    The reference re-runs the whole integration workflow on updates and
    merges results into ``integrated_customer``
    (`lib/data-integration-workflow.ts`,
    `lambda/integrated_customer_updater/index.py:77-86`); this is the
    engine-level version of that merge with the redundant work removed.

    ``pages_factory`` must yield the COMBINED corpus (old ∪ new):
    blocking still sees every record, so a new record lands in exactly
    the blocks a full re-run would put it in; only the candidate-pair
    stream is then filtered to pairs touching ``new_urls`` before the
    scoring stages.  ``prev_assignment`` is the prior run's
    (RecordId, MatchID, ConfidenceLevel) table (DataFrame or Dataset);
    its clusters are re-imposed as zero-cost union-find edges.

    EXACTNESS: with the same ``idf_ref`` (freeze the IDF table across
    runs — it is corpus-sampled) and block caps not binding, the result
    equals a full run on the combined corpus: pair features depend only
    on the two records, old↔old outcomes are exactly the prior
    clusters, and ConfidenceLevel = max(prior conf, new incident
    scores) = the full run's max.  Tested bit-for-bit in
    `tests/test_er_e2e.py`.

    Scale note: the prior assignment and the delta's edge stream are
    merged in ONE driver union-find (the delta workflow's natural
    size); a delta big enough to breach ``local_cc_max_edges`` should
    simply take the full-run path."""
    if hasattr(prev_assignment, "to_pandas"):
        prev_assignment = prev_assignment.to_pandas()
    new_arr = pa.array(sorted(new_urls), pa.string())

    def _pair_filter(pairs):
        def _f(batch: pa.Table) -> pa.Table:
            keep = pc.or_(
                pc.is_in(batch["url_a"], value_set=new_arr),
                pc.is_in(batch["url_b"], value_set=new_arr),
            )
            return batch.filter(keep)

        return pairs.map_batches(_f, batch_format="pyarrow")

    if idf_ref is None:
        if pages_factory is None:
            raise ValueError(
                "records_factory-only runs must pass a FROZEN idf_ref "
                "(the IDF table is sampled from raw page text, which "
                "pre-normalized records no longer carry)"
            )
        idf_ref = build_idf_ref(pages_factory(), cfg)
    if slim_factory is not None:
        slim = slim_factory()
    elif records_factory is not None:
        # normalize keeps (url, source, lang) — no raw pages needed
        slim = records_factory().select_columns(["url", "source", "lang"])
    else:
        slim = pages_factory().select_columns(["url", "source", "lang"])
    from ..stages.clustering import LocalUnionFind, collect_edges_local

    plan = matched_edges(
        pages_factory() if records_factory is None else None,
        cfg, idf_ref, pair_filter=_pair_filter,
        records_factory=records_factory,
    )
    out = collect_edges_local(plan, cfg.local_cc_max_edges)
    if out is None:
        raise ValueError(
            "delta edge stream exceeded local_cc_max_edges — a delta "
            "this large should take the full resolve_entities path"
        )
    edges_df, _new_labels, new_conf = out

    # prior clusters as zero-cost edges (RecordId—MatchID membership),
    # then the delta's matched edges on top: min-label union-find keeps
    # every untouched cluster's MatchID stable by construction
    uf = LocalUnionFind()
    prev_linked = prev_assignment[
        prev_assignment["RecordId"] != prev_assignment["MatchID"]
    ]
    uf.add_edges(
        prev_linked["RecordId"].to_numpy(), prev_linked["MatchID"].to_numpy()
    )
    uf.add_edges(edges_df["url_a"].to_numpy(), edges_df["url_b"].to_numpy())
    label_map = uf.label_map()

    # seed confidence ONLY from previously-MATCHED records: a prior
    # singleton's ConfidenceLevel is the 1.0 default, which must not
    # swamp the real score of its first matched edge (against a delta
    # record) via the max-merge below
    sizes = prev_assignment.groupby("MatchID")["RecordId"].transform("size")
    prev_matched = prev_assignment[sizes >= 2]
    conf_map = dict(
        zip(prev_matched["RecordId"], prev_matched["ConfidenceLevel"])
    )
    for node, sc in new_conf.items():
        prev = conf_map.get(node)
        if prev is None or sc > prev:
            conf_map[node] = sc

    assignment = _attach_broadcast(slim, label_map, conf_map)
    return assignment, ray.data.from_pandas(edges_df)


def checkpoint_features(
    pages_factory,
    checkpoint_dir: str,
    input_fingerprint: str,
    cfg: ERConfig = DEFAULT_CONFIG,
):
    """Persist the normalized per-record feature table (extract +
    normalize output: url, source, lang, domain, slug, n_tokens,
    shingle/bigram/token-hash sets, MinHash signatures) as a resumable
    Parquet stage; returns a zero-arg ``records_factory`` re-reading it.

    The delta workflow's biggest saving at corpus scale: a later
    `resolve_entities_incremental(records_factory=delta_records_factory(
    this, new_pages))` run unions this checkpoint with the normalized
    DELTA and skips extract/normalize for every old record — the stage
    that dominates wall time at 10^12 pages (the reference instead
    re-runs its whole integration workflow per update,
    `lib/data-integration-workflow.ts`).  Same-fingerprint calls resume
    from the manifest without recomputing."""
    import os

    from ..state.checkpoint import run_stage

    run_stage(
        "features", checkpoint_dir, input_fingerprint,
        lambda: normalize_stage(extract_stage(pages_factory()), cfg),
    )
    data_dir = os.path.join(checkpoint_dir, "features", "data")
    return lambda: ray.data.read_parquet(data_dir)


def delta_records_factory(
    features_factory, new_pages_factory, cfg: ERConfig = DEFAULT_CONFIG
):
    """``records_factory`` = old feature checkpoint ∪ normalize(delta):
    only the delta's pages pay extraction/normalization."""

    def _factory():
        old = features_factory()
        new = normalize_stage(extract_stage(new_pages_factory()), cfg)
        return old.union(new)

    return _factory
