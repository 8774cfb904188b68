"""Oracle fixture export: deterministic parquet for DuckDB side-checks.

The c360 fixture tables (customer masters / purchases / ground-truth
relations, `sources/c360.py`) and the pages fixture (records +
relations, `sources/pages.py`) are pure functions of the driver's
testdata.  The DuckDB oracle harness can only read SQL-visible tables,
so this module materializes those fixtures once per scale factor under
``/tmp`` and the oracle SQL reads them via ``read_parquet('…')`` —
both sides of every comparison then derive from the same deterministic
generator (the reference's `dbloader/gen_testdata.py` analog).

Also exports per-doc FEATURE tables (e.g. 64-bit simhash) so sketch
operators whose *banding/sweep* is the distributed part can be
oracle-verified: the feature is computed once by the same pure
function the pipeline uses, and the SQL re-derives the exact all-pairs
answer from it (`bit_count(xor(...))`), catching any recall loss in
the LSH bucketing.

Everything here is driver-side plain pyarrow (no Ray): the fixtures
are sandbox-scale test artifacts, not pipeline stages.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# bump when any generator / feature function changes shape or values
FIXTURE_ROOT = "/tmp/graft_oracle_fixtures/v1"

# content revision written into the _SUCCESS marker: bumping forces a
# regeneration of already-materialized fixture dirs (e.g. when a new
# fixture table is added) without changing the oracle-visible paths
FIXTURE_REV = "7"


def fixture_dir(sf_dir: str) -> str:
    return os.path.join(FIXTURE_ROOT, os.path.basename(sf_dir.rstrip("/")))


def ensure_fixtures(sf_dir: str) -> str:
    """Idempotently write the fixture parquet for one sf dir; returns
    the fixture directory.  Marker-guarded: ~1 s once, then free."""
    out = fixture_dir(sf_dir)
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == FIXTURE_REV:
                return out
    if not os.path.isdir(sf_dir):
        raise FileNotFoundError(sf_dir)
    os.makedirs(out, exist_ok=True)

    from . import c360, pages

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    pq.write_table(
        c360.expand_customer_master(cust), f"{out}/customer_master.parquet"
    )
    pq.write_table(
        c360.expand_subbrand_master(cust), f"{out}/subbrand_customer_master.parquet"
    )
    pq.write_table(
        c360.expand_relations(cust), f"{out}/customer_relations.parquet"
    )
    pq.write_table(
        c360._purchases(cust, sub=False), f"{out}/purchase_history.parquet"
    )
    pq.write_table(
        c360._purchases(cust, sub=True), f"{out}/subbrand_purchase_history.parquet"
    )

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    )
    pg = pages._expand_pages(docs)
    pq.write_table(
        pg.select(["url", "source", "lang"]), f"{out}/pages_records.parquet"
    )
    pq.write_table(
        pages._expand_relations(docs.select(["doc_id", "source"])),
        f"{out}/page_relations.parquet",
    )

    _export_doc_simhash(docs, out)

    pq.write_table(
        pages.expand_url_variants(pg.select(["url"])),
        f"{out}/url_variants.parquet",
    )

    _export_pii_docs(docs, out)

    _export_kmeans_centroids(sf_dir, out)

    _export_pca_components(sf_dir, out)

    _export_quality_coefs(docs, out)

    _export_multimodal_expected(out)

    _export_als_segments(out)

    with open(marker, "w") as f:
        f.write(FIXTURE_REV)
    return out


def _export_pii_docs(docs: pa.Table, out: str) -> None:
    """(doc_id, text) with deterministic planted PII: each doc gets an
    email / phone / IPv4 (rotating by doc_id, every 5th doc untouched)
    so the scrub oracle exercises every pattern AND the no-op path."""
    ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    out_texts = []
    for i, t in zip(ids, texts):
        k = i % 5
        if k == 0:
            t = f"{t} contact user{i}@mail{i % 50}.example.com now"
        elif k == 1:
            t = f"call 555-{100 + i % 900:03d}-{1000 + i % 9000:04d} {t}"
        elif k == 2:
            t = f"{t} from 10.{i % 256}.{(i * 7) % 256}.{(i * 13) % 256}"
        elif k == 3:
            t = (
                f"{t} user{i}@mail.example.com or "
                f"admin{i}@mail.example.com at 10.0.{i % 256}.1"
            )
        out_texts.append(t)
    pq.write_table(
        pa.table(
            {"doc_id": docs["doc_id"], "text": pa.array(out_texts, pa.string())}
        ),
        f"{out}/pii_docs.parquet",
    )


def _export_doc_simhash(docs: pa.Table, out: str) -> None:
    """(doc_id, simhash BIGINT): the same per-doc fingerprint the
    simhash pipeline computes (`ops/dedup.py simhash_dup_pairs`),
    int64-viewed so DuckDB's bit_count(xor(a, b)) reproduces the
    exact 64-bit Hamming distance."""
    from ..functions import texthash
    from ..functions.simhash import simhash_batch

    texts = docs["text"].to_pylist()
    tok_sets = [texthash.token_hashes(t, cap=512) for t in texts]
    sh = simhash_batch(tok_sets)  # uint64
    pq.write_table(
        pa.table(
            {
                "doc_id": docs["doc_id"],
                "simhash": pa.array(sh.view(np.int64), pa.int64()),
            }
        ),
        f"{out}/doc_simhash.parquet",
    )


KMEANS_K = 10
KMEANS_ITERS = 10

# trained quality classifier: label = composite heuristic ≥ threshold
# (distillation), ridge-logistic so separable labels stay finite
QC_THRESHOLD = 0.75
QC_L2 = 1.0
QC_ITERS = 8


def _export_quality_coefs(docs: pa.Table, out: str) -> None:
    """(j BIGINT, beta DOUBLE): reference ridge-logistic coefficients
    (`ops/model.py::logistic_fit_reference`) for the quality-classifier
    distillation — j=0 is the intercept, then QUALITY_FEATURES order.
    The oracle scores every doc with these via SQL sigmoid; the
    distributed IRLS fit must land on the same β."""
    from ..ops.model import logistic_fit_reference
    from ..ops.text import QUALITY_FEATURES, quality_features_of

    feats = [quality_features_of(t) for t in docs["text"].to_pylist()]
    X = np.array([[f[k] for k in QUALITY_FEATURES] for f in feats])
    # same expression ORDER as the distributed label map (bit-identical)
    quality = (
        0.3 * X[:, 1] + 0.2 * X[:, 0] + 0.2 * X[:, 2]
        + 0.15 * X[:, 3] + 0.15 * X[:, 4]
    )
    y = (quality >= QC_THRESHOLD).astype(np.float64)
    beta = logistic_fit_reference(X, y, l2=QC_L2, iters=QC_ITERS)
    pq.write_table(
        pa.table(
            {
                "j": pa.array(range(len(beta)), pa.int64()),
                "beta": pa.array(beta, pa.float64()),
            }
        ),
        f"{out}/quality_coefs.parquet",
    )


def _export_kmeans_centroids(sf_dir: str, out: str) -> None:
    """(cluster_id BIGINT, centroid DOUBLE[]): final centroids of the
    pure-numpy k-means reference (`ops/cluster.py::kmeans_reference`)
    over the embeddings table.  The oracle assigns every vector to
    these via `list_distance` argmin; the distributed fit must land on
    the same centroids for its assignment to match."""
    from ..ops.cluster import kmeans_reference

    emb = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = emb["vec_id"].to_numpy()
    X = np.asarray(
        emb["embedding"].combine_chunks().flatten(), dtype=np.float64
    ).reshape(len(ids), -1)
    cents, _ = kmeans_reference(ids, X, k=KMEANS_K, iters=KMEANS_ITERS)
    pq.write_table(
        pa.table(
            {
                "cluster_id": pa.array(range(KMEANS_K), pa.int64()),
                "centroid": pa.array(list(cents), pa.list_(pa.float64())),
            }
        ),
        f"{out}/kmeans_centroids.parquet",
    )


PCA_K = 4


def _export_pca_components(sf_dir: str, out: str) -> None:
    """(component_id BIGINT, mean DOUBLE[], weights DOUBLE[]): top-PCA_K
    principal components of the pure-numpy PCA reference
    (`ops/cluster.py::pca_reference`) over the embeddings table.  The
    oracle projects every vector onto these via `list_inner_product`;
    the distributed moment fit must land on the same components
    (sign-fixed, round-4) for the projections to match."""
    from ..ops.cluster import pca_reference

    emb = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    n = emb.num_rows
    X = np.asarray(
        emb["embedding"].combine_chunks().flatten(), dtype=np.float64
    ).reshape(n, -1)
    mu, comps = pca_reference(X, k=PCA_K)
    pq.write_table(
        pa.table(
            {
                "component_id": pa.array(range(PCA_K), pa.int64()),
                "mean": pa.array([list(mu)] * PCA_K, pa.list_(pa.float64())),
                "weights": pa.array(
                    [list(c) for c in comps], pa.list_(pa.float64())
                ),
            }
        ),
        f"{out}/pca_components.parquet",
    )


def _export_multimodal_expected(out: str) -> None:
    """Expected outputs of the two multimodal queries, computed by the
    SAME pure codec/feature kernels the actor-pool stages run — but
    serially, with no Ray: what the fixture pins is the DISTRIBUTED
    plumbing (actor pool, batch splits, unions), the kernels being
    independently byte-round-trip tested in tests/test_multimodal.py."""
    import hashlib

    from ..ops.multimodal import (
        AudioFeatureStage,
        ImageDecodeStage,
        ImageResizeStage,
        VideoFrameSampleStage,
        synth_multimodal_rows,
    )

    def _table(rows: list[dict]) -> pa.Table:
        return pa.table(
            {
                "item_id": pa.array([r["item_id"] for r in rows], pa.string()),
                "payload": pa.array([r["payload"] for r in rows], pa.binary()),
                "media_type": pa.array(
                    [r["media_type"] for r in rows], pa.string()
                ),
            }
        )

    # --- multimodal_resize (n=64, images only, 16×16 PPM re-encode) ---
    rows = synth_multimodal_rows(n=64)
    imgs = _table(
        [
            r for r in rows
            if r["media_type"] in ("image/bmp", "image/png", "image/ppm")
        ]
    )
    resized = ImageResizeStage(out_h=16, out_w=16)(imgs)
    payloads = resized["payload"].to_pylist()
    pq.write_table(
        resized.drop_columns(["payload"])
        .append_column(
            "payload_bytes",
            pa.array([len(p) for p in payloads], pa.int64()),
        )
        .append_column(
            "payload_md5",
            pa.array(
                [hashlib.md5(p).hexdigest() for p in payloads], pa.string()
            ),
        ),
        f"{out}/multimodal_resize_expected.parquet",
    )

    # --- multimodal_features (n=96, per-media summaries) ---
    rows = synth_multimodal_rows(n=96)

    def _summarize(kind: str, table: pa.Table, feat_col: str) -> pa.Table:
        # mirrors __ray_entry__._q_multimodal_features._summary exactly
        feats = table[feat_col].to_pylist()
        norms = [float(np.linalg.norm(np.asarray(f))) for f in feats]
        return pa.table(
            {
                "item_id": table["item_id"],
                "media": pa.array([kind] * len(feats), pa.string()),
                "feature_dim": pa.array([len(f) for f in feats], pa.int32()),
                "feature_norm": pa.array(norms, pa.float64()),
            }
        )

    def _only(mt: str) -> pa.Table:
        return _table([r for r in rows if r["media_type"] == mt])

    parts = [
        _summarize("image", ImageDecodeStage()(_only("image/bmp")), "feature"),
        _summarize("audio", AudioFeatureStage()(_only("audio/wav")), "mfcc"),
        _summarize(
            "video",
            VideoFrameSampleStage()(_only("video/x-rvid")),
            "frame_feature",
        ),
    ]
    pq.write_table(
        pa.concat_tables(parts), f"{out}/multimodal_features_expected.parquet"
    )


ALS_TARGETS = [str(i) for i in range(1, 6)]
ALS_N = 20
ALS_FACTORS = 16
ALS_ITERATIONS = 4


def _export_als_segments(out: str) -> None:
    """Expected `c360_segments_als` output from the SERIAL reference
    solver (`pipelines/affinity.py::als_item_based_segments_local`) —
    bit-identical to the distributed ALS by construction (same
    partition layout, same kernels, ascending-_part combine; asserted
    by tests/test_affinity.py).  Interactions re-derive from the truth
    labels exactly as the driver-green `c360_interactions` oracle
    does (assignment == truth at F1 = 1.0)."""
    import pandas as pd

    from ..pipelines.affinity import als_item_based_segments_local

    rel = pq.read_table(f"{out}/customer_relations.parquet").to_pandas()
    lab = dict(
        zip(rel["subbrand_customer_id"], rel["main_customer_id"])
    )
    frames = []
    for path, prefix in (
        (f"{out}/purchase_history.parquet", ""),
        (f"{out}/subbrand_purchase_history.parquet", "sub_"),
    ):
        p = pq.read_table(
            path, columns=["customer_id", "item_id"]
        ).to_pandas()
        frames.append(
            pd.DataFrame(
                {
                    "USER_ID": p["customer_id"].map(lambda c: lab.get(c, c)),
                    "ITEM_ID": prefix + p["item_id"],
                }
            )
        )
    inter = pd.concat(frames, ignore_index=True)
    seg = als_item_based_segments_local(
        inter, ALS_TARGETS, n=ALS_N, factors=ALS_FACTORS,
        iterations=ALS_ITERATIONS,
    )
    pq.write_table(
        pa.table(
            {
                "item_id": pa.array(seg["item_id"], pa.string()),
                "user_id": pa.array(seg["user_id"], pa.string()),
                "affinity": pa.array(seg["affinity"], pa.float64()),
            }
        ),
        f"{out}/als_segments_expected.parquet",
    )


def ensure_all(sf_dirs: tuple[str, ...] = ()) -> None:
    """Ensure fixtures for every given (existing) sf dir.  Default: the
    two dirs the oracle harness uses — sf0.001 (pytest mirror) and
    sf0.01 (the external driver's correctness scale)."""
    dirs = sf_dirs or ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    for d in dirs:
        if os.path.isdir(d):
            ensure_fixtures(d)


__all__ = ["fixture_dir", "ensure_fixtures", "ensure_all", "FIXTURE_ROOT"]
