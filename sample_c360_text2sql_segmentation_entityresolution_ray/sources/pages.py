"""Deterministic synthesis of the north-rule pages table.

BASELINE.json ``input_hint`` mandates a Common-Crawl-style Parquet table
``(url:string, warc_ts:timestamp, html:binary, text:string,
lang:string)``.  This module derives one deterministically from the
driver's ``documents`` testdata table, planting the same ground-truth
structure the reference's generator plants for customers
(`/root/reference/dbloader/gen_testdata.py`):

- ~50% of documents get a near-duplicate page on another domain
  (``similar_customer_ratio = 0.5`` analog, `gen_testdata.py:18,493-504`);
  every 17th doc gets 3 duplicates (cluster sizes 4 — exercises
  transitive closure).
- ~2% confounders: a page sharing the canonical page's domain (blocking
  key) and boilerplate but with token order destroyed — a true
  non-match (same-name/different-person analog, `gen_testdata.py:398-417`).
- one hot domain holding ~10% of pages (skew for salted blocking).
- ``page_relations`` ground-truth pairs (``customer_relations.csv``
  analog, `gen_testdata.py:578-592`).

Everything is a pure function of ``(doc_id, text, lang, source)`` — a
per-row ``numpy`` generator seeded by ``doc_id`` — so synthesis is
embarrassingly parallel inside ``map_batches`` and identical across
runs, workers and scale factors.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..functions.extract import render_html

EPOCH = 1_704_067_200  # 2024-01-01T00:00:00Z

BOILER_PRE = "cookie notice accept privacy terms"
BOILER_POST = "copyright example site contact careers"

SALT_EVERY = 4  # a doc-unique marker token every 4th token
SHORT_DOC_RAW_TOKENS = 64  # below this, salt every 2nd token (see below)


def _salt(text: str, doc_id: int) -> str:
    """Interleave doc-unique marker tokens so distinct documents are
    guaranteed dissimilar (the driver's documents table plants its own
    near-duplicate texts; without salting those would be extra true
    matches outside the relations table and the planted truth would be
    incomplete).  Pages of the SAME entity share the same salt, so
    within-cluster similarity is preserved.

    Short docs are salted every 2nd token instead of every 4th: at
    stride 4 a planted identical-text doc pair still shares the
    salt-free BIGRAMS between salts (measured J₂ up to 0.43), which
    would break the dissimilarity guarantee for the engine's short-doc
    bigram recall path; at stride 2 every bigram touches a doc-unique
    salt, so cross-entity J₂ ≈ 0 while within-entity similarity (same
    salts both sides) is untouched."""
    toks = text.split()
    stride = 2 if len(toks) < SHORT_DOC_RAW_TOKENS else SALT_EVERY
    out = []
    for i, t in enumerate(toks):
        if i % stride == 0:
            out.append(f"x{doc_id:05d}m{i // stride}")
        out.append(t)
    return " ".join(out)

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("s")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("source", pa.string()),
    ]
)

RELATIONS_SCHEMA = pa.schema([("url_b", pa.string()), ("url_a", pa.string())])


def _domain(doc_id: int, source: str) -> str:
    if doc_id % 10 == 0:
        return "hot.example.com"  # ~10% of pages: the skew domain
    return f"{source}-{(doc_id // 20) % 100}.example.com"


def _url(domain: str, kind: str, doc_id: int, idx: int = 0) -> str:
    return f"https://{domain}/{kind}/{doc_id:08d}-{idx}"


def _perturb(text: str, doc_id: int, dup_idx: int) -> str:
    """Bounded token-level perturbation: ~3% drops, ~2% adjacent swaps,
    plus boilerplate framing — keeps 3-shingle Jaccard ~0.8."""
    rng = np.random.default_rng([42, doc_id, dup_idx])
    toks = text.split()
    keep = rng.random(len(toks)) > 0.03
    toks = [t for t, k in zip(toks, keep) if k]
    i = 0
    while i < len(toks) - 1:
        if rng.random() < 0.02:
            toks[i], toks[i + 1] = toks[i + 1], toks[i]
            i += 2
        else:
            i += 1
    body = " ".join(toks)
    if dup_idx % 2 == 0:
        return BOILER_PRE + " " + body
    return body + " " + BOILER_POST


def _confound(text: str, doc_id: int) -> str:
    """Token order destroyed (kills shingle overlap) + shared boilerplate
    (keeps some blocking-level similarity): a true non-match."""
    rng = np.random.default_rng([43, doc_id])
    toks = text.split()
    rng.shuffle(toks)
    return BOILER_PRE + " " + " ".join(toks) + " " + BOILER_POST


def _n_dups(doc_id: int) -> int:
    if doc_id % 17 == 0:
        return 3
    if doc_id % 2 == 0:
        return 1
    return 0


def _expand_pages(batch: pa.Table) -> pa.Table:
    urls, tss, htmls, texts, langs, sources = [], [], [], [], [], []

    def emit(url, ts, text, lang, source):
        title = " ".join(text.split()[:6])
        urls.append(url)
        tss.append(ts)
        htmls.append(render_html(text, title))
        texts.append(text)
        langs.append(lang)
        sources.append(source)

    for doc_id, text, lang, source in zip(
        batch["doc_id"].to_pylist(),
        batch["text"].to_pylist(),
        batch["lang"].to_pylist(),
        batch["source"].to_pylist(),
    ):
        dom = _domain(doc_id, source)
        text = _salt(text, doc_id)
        emit(_url(dom, "a", doc_id), EPOCH + doc_id, text, lang, source)
        for j in range(_n_dups(doc_id)):
            # duplicates live on a *different* domain family (LSH must
            # catch them), except every 6th doc keeps the domain so the
            # sorted-neighborhood/domain family is productive too.
            ddom = dom if doc_id % 6 == 0 else f"m-{source}.alt.example.com"
            emit(
                _url(ddom, "b", doc_id, j),
                EPOCH + doc_id + 100_000 * (j + 1),
                _perturb(text, doc_id, j),
                lang,
                "alt-" + source,
            )
        if doc_id % 50 == 1:
            emit(
                _url(dom, "c", doc_id),
                EPOCH + doc_id + 999_999,
                _confound(text, doc_id),
                lang,
                source,
            )
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("s")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
        }
    )


def _expand_relations(batch: pa.Table) -> pa.Table:
    url_b, url_a = [], []
    for doc_id, source in zip(
        batch["doc_id"].to_pylist(), batch["source"].to_pylist()
    ):
        dom = _domain(doc_id, source)
        a = _url(dom, "a", doc_id)
        for j in range(_n_dups(doc_id)):
            ddom = dom if doc_id % 6 == 0 else f"m-{source}.alt.example.com"
            url_b.append(_url(ddom, "b", doc_id, j))
            url_a.append(a)
    return pa.table(
        {"url_b": pa.array(url_b, pa.string()), "url_a": pa.array(url_a, pa.string())}
    )


def expand_url_variants(records: pa.Table) -> pa.Table:
    """Deterministic surface-form variants of page URLs, for the URL
    canonicalization oracle (`ops/urls.py`).

    Each input url yields 3 variants drawn from 5 mangle rules (rule
    choice rotates with row index): verbatim, UPPERCASED host, tracking
    query params, fragment, explicit ``:443`` port.  All variants of a
    url share its canonical form; ``warc_ts`` is distinct per variant so
    latest-wins dedup has a deterministic argmax (the k=2 variant).
    """
    urls = records["url"].to_pylist()
    rows = []
    for i, u in enumerate(urls):
        scheme, rest = u.split("://", 1)
        host, path = rest.split("/", 1)
        for k in range(3):
            rule = (i + k) % 5
            if rule == 0:
                v = u
            elif rule == 1:
                v = f"{scheme}://{host.upper()}/{path}"
            elif rule == 2:
                v = f"{u}?utm_source=feed&utm_campaign=c{i % 7}"
            elif rule == 3:
                v = f"{u}#sec-{k}"
            else:
                v = f"{scheme}://{host}:443/{path}"
            rows.append((v, EPOCH + 31 * i + k))
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("s")),
        }
    )


def documents_path(sf_dir: str) -> str:
    return f"{sf_dir}/documents.parquet"


MIN_DOCS_PER_BLOCK = 150  # below this, per-block task + shuffle
                          # bookkeeping dominates useful work (measured
                          # sf0.1: 128 blocks -> 28 s, 32 blocks -> 19 s)


def _read_blocks(sf_dir: str, replicate: int = 1) -> int:
    """Per-read block count for the documents read, sized to the DATA:
    a single small parquet file would otherwise become 1-16 blocks and
    cap every downstream map_batches at that parallelism (measured:
    flat 8->32-CPU scaling), while block counts far above what the row
    count supports make the sort shuffles slower than the compute they
    carry (measured both directions).  Target: >= MIN_DOCS_PER_BLOCK
    docs per block, capped at 4 blocks per core TOTAL across
    replicas."""
    import ray
    import pyarrow.parquet as pq

    ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    n_docs = pq.read_metadata(documents_path(sf_dir)).num_rows
    by_data = max(1, n_docs // MIN_DOCS_PER_BLOCK)
    total_cap = max(16, 4 * ncpu)
    # r5 (generator replication): the replicate op FUSES with the
    # downstream expansion map, so the BASE read's block count is the
    # parallelism grain of the whole pre-shuffle chain — it must NOT
    # shrink with the replica count (the union-era `cap // replicate`
    # throttled the 16-cpu scaling leg to 4 tasks).  Downstream block
    # count is bounded separately by the replica GROUPING in
    # `_docs_dataset`.
    _ = replicate
    return max(4, min(by_data, total_cap))


REPLICA_STRIDE = 100_000  # doc_id offset between replicas (>> any sf's max id)


def _docs_dataset(sf_dir: str, replicate: int) -> "ray.data.Dataset":
    base = ray.data.read_parquet(
        documents_path(sf_dir),
        columns=["doc_id", "text", "lang", "source"],
        override_num_blocks=_read_blocks(sf_dir, replicate),
    )
    if replicate <= 1:
        return base

    # ONE generator op that yields R shifted copies per input block —
    # NOT an R-way union: Ray 2.49 chains union branches into an O(R)-
    # deep plan/stats tree (RecursionError in stats.to_summary at
    # R=240, measured on the 2M-page soak), and per-branch planning
    # cost grows with R.  Replicas are GROUPED per yield so the total
    # output block count stays ~4×CPU regardless of R (block-count
    # hygiene both directions: the op's input blocks set pre-shuffle
    # parallelism, its yields set downstream per-block fixed costs).
    import ray as _ray

    ncpu = (
        int(_ray.cluster_resources().get("CPU", 8))
        if _ray.is_initialized()
        else 8
    )
    total_cap = max(16, 4 * ncpu)
    in_blocks = _read_blocks(sf_dir, replicate)
    group = max(1, (in_blocks * replicate) // total_cap)
    # yield-size ceiling: the fused downstream expansion turns each
    # doc into page rows WITH html, so an unbounded group (61 replicas
    # ≈ 9k docs/yield at R=240) produced ~100 MB+ expansion batches
    # and worker OOM kills; cap a yield at ~2k docs (the measured-safe
    # granularity) and accept more, smaller downstream blocks instead
    import pyarrow.parquet as pq  # noqa: F811 — local, cheap metadata read

    n_docs = pq.read_metadata(documents_path(sf_dir)).num_rows
    docs_per_block = max(1, n_docs // in_blocks)
    group = min(group, max(1, 2000 // docs_per_block))

    def _explode(batch: pa.Table):
        import pyarrow.compute as pc

        idx = batch.schema.get_field_index("doc_id")
        for g0 in range(0, replicate, group):
            yield pa.concat_tables(
                [
                    batch.set_column(
                        idx,
                        "doc_id",
                        pc.add(batch["doc_id"], REPLICA_STRIDE * r),
                    )
                    for r in range(g0, min(g0 + group, replicate))
                ]
            )

    return base.map_batches(_explode, batch_format="pyarrow")


def pages_dataset(
    sf_dir: str, replicate: int = 1, sample_p: float | None = None
) -> "ray.data.Dataset":
    """The synthesized pages table as a streaming Dataset.

    ``replicate``: deterministic corpus scale-up for benchmarking — R
    shifted copies of the documents table (disjoint doc_id ranges, so
    per-doc salting keeps replicas mutually dissimilar: no cross-replica
    matches, R× the entities).  Hot-domain skew is preserved (the hot
    domain takes ~10% of every replica).

    ``sample_p``: content-hash doc sample taken BEFORE page expansion
    (the IDF pre-pass consumer: sampling after expansion would pay the
    full corpus synthesis/render to keep 5%).  Samples whole entities
    (all pages of a doc), which is what DF estimation wants."""
    docs = _docs_dataset(sf_dir, replicate)
    if sample_p is not None and sample_p < 1.0:
        from ..ops.sampling import hash_sample

        docs = hash_sample(docs, sample_p, id_col="doc_id", salt="idf")
    return docs.map_batches(_expand_pages, batch_format="pyarrow")


def _expand_slim(batch: pa.Table) -> pa.Table:
    """(url, source, lang) only — the attach pass needs no text/html,
    and for this derived source skipping the render halves its cost
    (a real Parquet pages source gets the same effect from column
    pruning at the read)."""
    urls, langs, sources = [], [], []

    for doc_id, lang, source in zip(
        batch["doc_id"].to_pylist(),
        batch["lang"].to_pylist(),
        batch["source"].to_pylist(),
    ):
        dom = _domain(doc_id, source)
        urls.append(_url(dom, "a", doc_id))
        langs.append(lang)
        sources.append(source)
        for j in range(_n_dups(doc_id)):
            ddom = dom if doc_id % 6 == 0 else f"m-{source}.alt.example.com"
            urls.append(_url(ddom, "b", doc_id, j))
            langs.append(lang)
            sources.append("alt-" + source)
        if doc_id % 50 == 1:
            urls.append(_url(dom, "c", doc_id))
            langs.append(lang)
            sources.append(source)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "source": pa.array(sources, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def pages_slim_dataset(sf_dir: str, replicate: int = 1) -> "ray.data.Dataset":
    """The pages table projected to (url, source, lang) without paying
    text salting / html rendering (see :func:`_expand_slim`)."""
    return _docs_dataset(sf_dir, replicate).map_batches(
        _expand_slim, batch_format="pyarrow"
    )


def pages_sample_table(
    sf_dir: str, p: float, replicate: int = 1
) -> pa.Table:
    """Driver-side content-hash sample of the pages fixture as ONE
    pyarrow Table — the IDF pre-pass input.  A p ≈ 5% sample is a few
    hundred rows; computing it in-process skips a whole Ray pipeline's
    fixed overhead (measured 4-11 s for ~250 docs).  Replicas share the
    same underlying docs, so sampling the base once suffices — DF
    fractions are replica-invariant by construction."""
    import pyarrow.parquet as pq

    from ..functions.texthash import hash_str_array

    docs = pq.read_table(
        documents_path(sf_dir), columns=["doc_id", "text", "lang", "source"]
    )
    ids = docs.column("doc_id").to_pandas().astype(str)
    h = hash_str_array(("idf" + ids).to_numpy(object))  # == ops.sampling.hash_sample
    keep = h <= np.uint64(int(p * float(2**64 - 1)))
    return _expand_pages(docs.filter(pa.array(keep)))


def relations_dataset(sf_dir: str, replicate: int = 1) -> "ray.data.Dataset":
    """Ground-truth labeled pairs (customer_relations analog)."""
    return (
        _docs_dataset(sf_dir, replicate)
        .select_columns(["doc_id", "source"])
        .map_batches(_expand_relations, batch_format="pyarrow")
    )
