"""Text-analysis operators for training-data pipelines.

The reference's only text analytics are the csvtool column profiler
(`csvtool/csv_to_glue_catalog.py:147-156`) and LLM schema inference; at
corpus scale the standard quartet implemented here is required.  All
stages are stateless ``map_batches`` over Arrow/pandas batches with
compiled regexes at module import (once per process, SURVEY §2.2 M6).

- :func:`token_count_stage` — whitespace + BPE-ish token counts.
- :func:`char_stats_stage` — length / punctuation / digit /
  uppercase ratios (quality features).
- :func:`quality_stage` — composite quality score (length, stopword
  ratio, punctuation terminator ratio, alpha ratio, repetition).
- :func:`langid_stage` — n-gram/stopword-profile language ID.
- :func:`fingerprint_stage` — md5 content fingerprint (exact,
  SQL-checkable) + Rabin-Karp rolling fingerprint (winnowing-style).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.texthash import BPE_ISH_RE, TOKEN_RE, rolling_fingerprint_batch

_PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)
_DIGIT_RE = re.compile(r"\d")
_TERMINATOR_RE = re.compile(r"[.!?。！？]")

# Tiny per-language stopword profiles (public common-word lists).  The
# classifier scores each language by stopword hit-rate plus a script
# check for CJK; ties resolve to the first language in order.
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for", "was", "with", "on", "as", "are", "this"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "mit", "ein", "eine", "den", "von", "zu", "im", "für", "auf", "des"},
    "fr": {"le", "la", "les", "et", "des", "est", "une", "dans", "que", "pour", "qui", "sur", "pas", "au", "ce", "du"},
    "es": {"el", "la", "los", "las", "de", "que", "y", "en", "un", "una", "es", "por", "con", "para", "del", "se"},
}
_LANG_ORDER = ["en", "de", "fr", "es"]
_CJK_RE = re.compile(r"[一-鿿぀-ヿ]")


def predict_lang(text: str) -> str:
    """Heuristic language ID: CJK script check, then stopword hit-rate."""
    if _CJK_RE.search(text):
        return "zh"
    toks = [t for t in TOKEN_RE.findall(text.lower())]
    if not toks:
        return "unknown"
    best, best_rate = "unknown", 0.0
    for lang in _LANG_ORDER:
        sw = _STOPWORDS[lang]
        rate = sum(1 for t in toks if t in sw) / len(toks)
        if rate > best_rate:
            best, best_rate = lang, rate
    return best if best_rate > 0.02 else "unknown"


def token_count_stage(
    ds: "ray.data.Dataset", text_col: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """(id, n_tokens, n_bpe_tokens): whitespace-split word count plus a
    GPT-2-shaped regex token count."""

    def _fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        n_ws = np.fromiter((len(t.split()) for t in texts), np.int64, len(texts))
        n_bpe = np.fromiter(
            (len(BPE_ISH_RE.findall(t)) for t in texts), np.int64, len(texts)
        )
        return pa.table(
            {
                id_col: batch[id_col],
                "n_tokens": pa.array(n_ws, pa.int64()),
                "n_bpe_tokens": pa.array(n_bpe, pa.int64()),
            }
        )

    return ds.map_batches(_fn, batch_format="pyarrow")


def char_stats_stage(
    ds: "ray.data.Dataset", text_col: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """(id, n_chars, punct_ratio, digit_ratio, upper_ratio)."""

    def _fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        n = len(texts)
        n_chars = np.fromiter((len(t) for t in texts), np.int64, n)
        safe = np.where(n_chars == 0, 1, n_chars).astype(np.float64)
        punct = np.fromiter((len(_PUNCT_RE.findall(t)) for t in texts), np.int64, n)
        digit = np.fromiter((len(_DIGIT_RE.findall(t)) for t in texts), np.int64, n)
        upper = np.fromiter((sum(1 for c in t if c.isupper()) for t in texts), np.int64, n)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_chars": pa.array(n_chars, pa.int64()),
                "punct_ratio": pa.array(punct / safe, pa.float64()),
                "digit_ratio": pa.array(digit / safe, pa.float64()),
                "upper_ratio": pa.array(upper / safe, pa.float64()),
            }
        )

    return ds.map_batches(_fn, batch_format="pyarrow")


def quality_features_of(text: str) -> dict:
    """The five Gopher/C4-style per-doc heuristics behind the composite
    quality score, exposed individually — the feature vector for the
    trained quality classifier (`ops/model.py`): stopword presence
    (clamped ×10), length band, alphabetic ratio, sentence terminators,
    line repetition; plus raw n_tokens / stopword_ratio."""
    toks = TOKEN_RE.findall(text.lower())
    sw = _STOPWORDS["en"]
    stop_ratio = sum(1 for x in toks if x in sw) / len(toks) if toks else 0.0
    len_ok = 1.0 if 50 <= len(toks) <= 100_000 else 0.3
    alpha = sum(c.isalpha() or c.isspace() for c in text) / max(1, len(text))
    term = min(1.0, len(_TERMINATOR_RE.findall(text)) / max(1.0, len(toks) / 25))
    lines = [ln for ln in text.split("\n") if ln.strip()]
    rep = 1.0 - ((len(lines) - len(set(lines))) / len(lines) if lines else 0.0)
    return {
        "swr10": min(1.0, stop_ratio * 10),
        "len_ok": len_ok,
        "alpha": alpha,
        "term": term,
        "rep": rep,
        "n_tokens": len(toks),
        "stopword_ratio": stop_ratio,
    }


QUALITY_FEATURES = ["swr10", "len_ok", "alpha", "term", "rep"]


def quality_of(text: str) -> tuple[float, int, float]:
    """(quality, n_tokens, stopword_ratio) for one document — public
    web-corpus heuristics (Gopher/C4-style): length band, stopword
    presence, sentence terminators, alphabetic ratio, line repetition."""
    f = quality_features_of(text)
    quality = (
        0.3 * f["len_ok"]
        + 0.2 * f["swr10"]
        + 0.2 * f["alpha"]
        + 0.15 * f["term"]
        + 0.15 * f["rep"]
    )
    return quality, f["n_tokens"], f["stopword_ratio"]


def quality_stage(
    ds: "ray.data.Dataset", text_col: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """(id, quality, n_tokens, stopword_ratio) via :func:`quality_of`."""

    def _fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        triples = [quality_of(t) for t in texts]
        return pa.table(
            {
                id_col: batch[id_col],
                "quality": pa.array([q for q, _, _ in triples], pa.float64()),
                "n_tokens": pa.array([n for _, n, _ in triples], pa.int64()),
                "stopword_ratio": pa.array(
                    [s for _, _, s in triples], pa.float64()
                ),
            }
        )

    return ds.map_batches(_fn, batch_format="pyarrow")


def quality_feature_stage(
    ds: "ray.data.Dataset", text_col: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """(id, swr10, len_ok, alpha, term, rep) — the classifier feature
    vector (:data:`QUALITY_FEATURES`), one stateless map."""

    def _fn(batch: pa.Table) -> pa.Table:
        feats = [quality_features_of(t) for t in batch[text_col].to_pylist()]
        cols = {id_col: batch[id_col]}
        for k in QUALITY_FEATURES:
            cols[k] = pa.array([f[k] for f in feats], pa.float64())
        return pa.table(cols)

    return ds.map_batches(_fn, batch_format="pyarrow")


def langid_stage(
    ds: "ray.data.Dataset", text_col: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """(id, lang_pred) via :func:`predict_lang`."""

    def _fn(batch: pa.Table) -> pa.Table:
        preds = [predict_lang(t) for t in batch[text_col].to_pylist()]
        return pa.table(
            {id_col: batch[id_col], "lang_pred": pa.array(preds, pa.string())}
        )

    return ds.map_batches(_fn, batch_format="pyarrow")


def fingerprint_stage(
    ds: "ray.data.Dataset", text_col: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """(id, fp_md5, fp_rolling): exact md5 content fingerprint (hex,
    matches SQL ``md5(text)``) and the Rabin-Karp rolling XOR
    fingerprint (byte-window content signature, robust to nothing —
    it's an exact-content id with locality-friendly construction)."""

    def _fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        md5s = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
        roll = rolling_fingerprint_batch(texts)
        return pa.table(
            {
                id_col: batch[id_col],
                "fp_md5": pa.array(md5s, pa.string()),
                "fp_rolling": pa.array(roll, pa.uint64()),
            }
        )

    return ds.map_batches(_fn, batch_format="pyarrow")


def repetition_stage(
    ds: "ray.data.Dataset", text_col: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """Within-doc repetition census (the Gopher repetition filters'
    exact-count core, integer outputs so the DuckDB oracle hashes
    bit-equal): per doc,

    - ``n_tokens`` — space-split token count;
    - ``top_bigram_count`` — occurrences of the most frequent 2-gram;
    - ``dup_trigram_covered`` — tokens covered by 3-gram windows that
      repeat within the doc.

    Pure per-doc map over numpy window hashes — no shuffle; callers
    derive the paper's fractional thresholds (e.g. drop when
    ``top_bigram_count * 2 / n_tokens > 0.2``) downstream."""
    import pandas as pd

    from .dedup import _covered_union, _doc_span_hashes

    def _fn(batch: pd.DataFrame) -> pd.DataFrame:
        ids, nt, tb, cov = [], [], [], []
        for i, t in zip(
            batch[id_col].to_numpy(), batch[text_col].to_numpy(object)
        ):
            toks_n = len(t.split(" "))
            bi = _doc_span_hashes(t, 2)
            tri = _doc_span_hashes(t, 3)
            if len(tri):
                _, inv, counts = np.unique(
                    tri, return_inverse=True, return_counts=True
                )
                starts = np.flatnonzero(counts[inv] >= 2)
                covered = _covered_union(starts, 3)
            else:
                covered = 0
            ids.append(i)
            nt.append(toks_n)
            tb.append(
                int(np.unique(bi, return_counts=True)[1].max()) if len(bi) else 0
            )
            cov.append(covered)
        return pd.DataFrame(
            {
                id_col: ids,
                "n_tokens": np.asarray(nt, np.int64),
                "top_bigram_count": np.asarray(tb, np.int64),
                "dup_trigram_covered": np.asarray(cov, np.int64),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _fn, batch_format="pandas"
    )


# PII patterns shared verbatim with the DuckDB oracle (RE2-compatible
# subset: no lookaround, no backrefs).  Applied in THIS order — counts
# are per-pattern matches in the text as left by the previous rule.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b", "<PHONE>"),
    ("ip", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
)


def pii_scrub_stage(
    ds: "ray.data.Dataset", text_col: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """Mask emails / phone numbers / IPv4 addresses in ``text_col``.

    Vectorized pandas ``str.count`` + ``str.replace`` per pattern (RE2-
    compatible regexes, so the oracle's ``regexp_replace(…, 'g')`` is
    byte-identical).  Output: ``(id, clean_text, n_emails, n_phones,
    n_ips)``.  Stateless map — compile cost is module-level, not
    per-batch."""
    import pandas as pd

    def _fn(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[text_col].astype(object)
        out = {id_col: batch[id_col].to_numpy()}
        counts = {}
        for name, pat, repl in PII_PATTERNS:
            counts[f"n_{name}s"] = s.str.count(pat).to_numpy(np.int64)
            s = s.str.replace(pat, repl, regex=True)
        out["clean_text"] = s.to_numpy(object)
        out.update(counts)
        return pd.DataFrame(out)

    return ds.select_columns([id_col, text_col]).map_batches(
        _fn, batch_format="pandas"
    )


def token_freq_topk(
    ds: "ray.data.Dataset",
    k: int = 50,
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Corpus-wide space-split token frequencies, top ``k`` by
    ``(count desc, token asc)`` — the vocabulary/stopword census every
    corpus build starts with.

    Per-batch partial counts (one np.unique over the batch's
    concatenated tokens) make the shuffle carry (token, partial-count)
    rows — bounded by distinct-vocab × blocks, never corpus size; the
    combiner merge is exact and the final sort sees only merged vocab
    rows."""
    import pandas as pd

    from .relational import grouped_aggregate

    def _partials(batch: pd.DataFrame) -> pd.DataFrame:
        toks = np.concatenate(
            [
                np.asarray(t.split(" "), dtype=object)
                for t in batch[text_col].to_numpy(object)
            ]
        ) if len(batch) else np.empty(0, object)
        uniq, cnt = np.unique(toks, return_counts=True)
        return pd.DataFrame(
            {"token": uniq.astype(object), "cnt": cnt.astype(np.int64)}
        )

    counts = grouped_aggregate(
        ds.select_columns([text_col]).map_batches(
            _partials, batch_format="pandas"
        ),
        keys=["token"],
        specs=[("sum", "cnt", "cnt")],
    )
    return counts.sort(["cnt", "token"], descending=[True, False]).limit(k)


# ---------------------------------------------------------------------------
# benchmark decontamination (train-vs-eval n-gram overlap)
# ---------------------------------------------------------------------------

def _ngram_hashes_md5(text: str, n: int) -> np.ndarray:
    """Distinct token n-gram hashes of one document: top-60-bit md5 of
    the space-joined lowercased token window — the same SQL-reproducible
    construction as the KMV sketch / corpus-mix sampler
    (``('0x' || left(md5(g), 15))::BIGINT`` in DuckDB)."""
    toks = TOKEN_RE.findall(text.lower())
    if len(toks) < n:
        return np.empty(0, np.int64)
    grams = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    return np.fromiter(
        (
            int(hashlib.md5(g.encode("utf-8")).hexdigest()[:15], 16)
            for g in grams
        ),
        np.int64,
        len(grams),
    )


def benchmark_ngram_ref(
    bench: "ray.data.Dataset", text_col: str = "text", n: int = 5
):
    """Collect a benchmark/eval set's distinct token-n-gram hash set and
    broadcast it once (``ray.put``).

    The eval side of a decontamination pass is small by definition (the
    GPT-3 appendix-C setup: 13-gram overlap of the TRAINING corpus
    against fixed eval sets), so it is driver-collected and every
    scoring task reads the plasma copy — the 100-TB training side never
    shuffles.  8 bytes/n-gram: a million-gram eval suite broadcasts as
    ~8 MB."""
    parts = []
    for b in bench.select_columns([text_col]).iter_batches(
        batch_size=None, batch_format="pandas"
    ):
        for t in b[text_col]:
            parts.append(_ngram_hashes_md5(t, n))
    allh = (
        np.unique(np.concatenate(parts)) if parts else np.empty(0, np.int64)
    )
    return ray.put(allh)  # sorted (np.unique) for searchsorted probes


def decontaminate_stage(
    docs: "ray.data.Dataset",
    bench_ref,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_hits: int = 1,
) -> "ray.data.Dataset":
    """Per-document benchmark-overlap census: (id, ngrams, hits,
    contaminated) where ``hits`` counts the doc's distinct token
    n-grams present in the broadcast benchmark set and ``contaminated``
    flags ``hits >= min_hits``.

    Stateless map (broadcast lookup → TASK stage, not an actor pool);
    the sorted-array probe is one ``searchsorted`` per doc."""

    def _fn(batch: pd.DataFrame) -> pd.DataFrame:
        bench = ray.get(bench_ref)
        n_grams = np.empty(len(batch), np.int64)
        hits = np.empty(len(batch), np.int64)
        for i, t in enumerate(batch[text_col].to_numpy()):
            h = _ngram_hashes_md5(t, n)
            n_grams[i] = len(h)
            if len(bench) and len(h):
                idx = np.searchsorted(bench, h)
                idx[idx == len(bench)] = len(bench) - 1
                hits[i] = int(np.sum(bench[idx] == h))
            else:
                hits[i] = 0
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(),
                "ngrams": n_grams,
                "hits": hits,
                "contaminated": hits >= min_hits,
            }
        )

    return docs.map_batches(_fn, batch_format="pandas")


__all__ = [
    "predict_lang",
    "token_count_stage",
    "char_stats_stage",
    "quality_stage",
    "langid_stage",
    "fingerprint_stage",
    "repetition_stage",
    "pii_scrub_stage",
    "PII_PATTERNS",
    "token_freq_topk",
    "source_quality_gate",
    "gopher_rules_stage",
    "bm25_search",
    "benchmark_ngram_ref",
    "decontaminate_stage",
    "tfidf_doc_keywords",
    "explode_bigrams",
    "inverted_index",
]


# ---------------------------------------------------------------------------
# per-doc TF-IDF keyword extraction
# ---------------------------------------------------------------------------

def _batch_doc_tf(texts, ids) -> pd.DataFrame:
    """Exploded (doc_id, token, tf) for one batch — one np.unique per
    doc over its TOKEN_RE tokens (matching SQL
    ``regexp_extract_all(lower(text), '\\w+')``)."""
    out_id, out_tok, out_tf = [], [], []
    for i, t in zip(ids, texts):
        toks = np.asarray(TOKEN_RE.findall(t.lower()), dtype=object)
        if not len(toks):
            continue
        uniq, cnt = np.unique(toks, return_counts=True)
        out_id.append(np.full(len(uniq), i))
        out_tok.append(uniq)
        out_tf.append(cnt)
    if not out_id:
        return pd.DataFrame(
            {"doc_id": np.empty(0, np.int64), "token": np.empty(0, object),
             "tf": np.empty(0, np.int64)}
        )
    return pd.DataFrame(
        {
            "doc_id": np.concatenate(out_id),
            "token": np.concatenate(out_tok).astype(object),
            "tf": np.concatenate(out_tf).astype(np.int64),
        }
    )


# above this many distinct tokens the corpus DF table stops being
# broadcast (~dozens of MB of strings re-shipped per worker) and the
# scoring goes through a token-key hash join instead
TFIDF_VOCAB_BROADCAST_LIMIT = 2_000_000


def tfidf_doc_keywords(
    ds: "ray.data.Dataset",
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_broadcast_limit: int = TFIDF_VOCAB_BROADCAST_LIMIT,
) -> "ray.data.Dataset":
    """Top-``k`` TF-IDF keywords per document:
    ``(doc_id, token, tf, df, score, rank)`` with
    ``score = tf · (ln((N+1)/(df+1)) + 1)`` and rank ordered by
    ``(score desc, token asc)`` — the classic per-doc salient-term
    extraction (Salton TF-IDF; the corpus-level census sibling is
    :func:`token_freq_topk`).

    Scale shape: the DF table is ONE combiner shuffle of per-batch
    ``(token, partial df)`` rows (bounded by vocab × blocks).  Scoring
    then takes one of two paths by measured vocabulary size:

    - **broadcast** (vocab ≤ ``vocab_broadcast_limit``): the sorted
      (token, df) arrays ship once per worker via ``ray.put``; each
      batch tokenizes, searchsorted-joins, and emits its docs' final
      top-k with ranks — a doc never leaves its block, NO further
      shuffle.
    - **join** (above the limit): the exploded (doc_id, token, tf)
      stream hash-joins the DF table on ``token``, local per-(batch,
      doc) top-k pre-shrinks (the global winners are a subset), then
      one doc-hash partition pass ranks exactly.
    """
    from .relational import grouped_aggregate

    n_docs = float(ds.count())

    def _df_partials(batch: pd.DataFrame) -> pd.DataFrame:
        per_doc_distinct = [
            np.unique(np.asarray(TOKEN_RE.findall(t.lower()), dtype=object))
            for t in batch[text_col].to_numpy(object)
        ]
        toks = (
            np.concatenate(per_doc_distinct)
            if per_doc_distinct
            else np.empty(0, object)
        )
        uniq, cnt = np.unique(toks, return_counts=True)
        return pd.DataFrame(
            {"token": uniq.astype(object), "df": cnt.astype(np.int64)}
        )

    df_tab = grouped_aggregate(
        ds.select_columns([text_col]).map_batches(
            _df_partials, batch_format="pandas"
        ),
        keys=["token"],
        specs=[("sum", "df", "df")],
    ).materialize()  # consumed twice on the join path (count + probe)

    def _score(tf: np.ndarray, df: np.ndarray) -> np.ndarray:
        return tf.astype(np.float64) * (
            np.log((n_docs + 1.0) / (df.astype(np.float64) + 1.0)) + 1.0
        )

    def _rank_head(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            [id_col, "score", "token"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        g = g.groupby(id_col, sort=False).head(k).copy()
        g["rank"] = g.groupby(id_col, sort=False).cumcount() + 1
        return g

    if df_tab.count() <= vocab_broadcast_limit:
        pdf = df_tab.to_pandas()
        order = np.argsort(pdf["token"].to_numpy(object), kind="stable")
        vocab_ref = ray.put(
            (
                pdf["token"].to_numpy(object)[order],
                pdf["df"].to_numpy()[order].astype(np.int64),
            )
        )

        def _fn(batch: pd.DataFrame) -> pd.DataFrame:
            vocab, dfs = ray.get(vocab_ref)
            tfd = _batch_doc_tf(
                batch[text_col].to_numpy(object), batch[id_col].to_numpy()
            )
            pos = (
                np.searchsorted(vocab, tfd["token"].to_numpy(object))
                if len(tfd)
                else np.empty(0, np.int64)
            )
            tfd["df"] = dfs[pos] if len(tfd) else np.empty(0, np.int64)
            tfd["score"] = _score(tfd["tf"].to_numpy(), tfd["df"].to_numpy())
            return _rank_head(tfd)

        return ds.select_columns([id_col, text_col]).map_batches(
            _fn, batch_format="pandas"
        )

    # join path: explode → hash join on token → local top-k shrink →
    # one doc-hash partition pass ranks exactly
    from .relational import DEDUP_PARTITIONS, hash_join

    exploded = ds.select_columns([id_col, text_col]).map_batches(
        lambda b: _batch_doc_tf(
            b[text_col].to_numpy(object), b[id_col].to_numpy()
        ),
        batch_format="pandas",
    )
    joined = hash_join(exploded, df_tab, on=["token"])

    def _local_shrink(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["score"] = _score(batch["tf"].to_numpy(), batch["df"].to_numpy())
        batch = batch.sort_values(
            [id_col, "score", "token"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        batch = batch.groupby(id_col, sort=False).head(k).copy()
        batch["_part"] = (
            pd.util.hash_pandas_object(batch[id_col], index=False).to_numpy()
            % DEDUP_PARTITIONS
        ).astype("int32")
        return batch

    ranked = (
        joined.map_batches(_local_shrink, batch_format="pandas")
        .groupby("_part")
        .map_groups(
            lambda g: _rank_head(g.drop(columns=["_part"])),
            batch_format="pandas",
        )
    )
    return ranked


# ---------------------------------------------------------------------------
# domain-level quality gate
# ---------------------------------------------------------------------------

def source_quality_gate(
    ds: "ray.data.Dataset",
    threshold: float = 0.65,
    min_docs: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> "ray.data.Dataset":
    """Domain-level quality gate: keep every document whose GROUP
    (source / crawl host) has mean :func:`quality_of` ≥ ``threshold``
    and at least ``min_docs`` documents.

    The web-pipeline "drop bad domains" stage (RefinedWeb/Gopher drop
    whole hosts when their sampled pages score poorly) — a per-group
    HAVING filter applied back to the row stream, composing the M4
    filter + A1 grouped-HAVING shapes over the corpus.

    Scale posture: per-doc quality is one streaming map whose slim
    ``(id, group, quality)`` projection is materialized ONCE so the
    expensive text pass never runs twice; the per-group reduction is a
    combiner aggregate (one partial row per block × group — a hot
    domain ships partials, never pages); the passing-group table is
    O(#domains) rows, collected to the driver and broadcast via
    ``ray.put`` into one final streaming merge.  Document text never
    shuffles and never reaches the driver.

    Output: ``(id, group, quality, src_mean_quality, src_n_docs)`` for
    surviving documents.
    """
    import ray

    from .relational import grouped_aggregate

    def _score(batch: pa.Table) -> pa.Table:
        q = [quality_of(t)[0] for t in batch[text_col].to_pylist()]
        return pa.table(
            {
                id_col: batch[id_col],
                group_col: batch[group_col],
                "quality": pa.array(q, pa.float64()),
            }
        )

    scored = ds.map_batches(_score, batch_format="pyarrow").materialize()
    agg = grouped_aggregate(
        scored.select_columns([group_col, "quality"]),
        keys=[group_col],
        specs=[("sum", "quality", "q_sum"), ("count_star", None, "src_n_docs")],
    )
    small = agg.to_pandas()  # O(#domains) rows — the gate table, not docs
    small["src_mean_quality"] = small["q_sum"] / small["src_n_docs"]
    passing = small.loc[
        (small["src_mean_quality"] >= threshold)
        & (small["src_n_docs"] >= min_docs),
        [group_col, "src_mean_quality", "src_n_docs"],
    ].reset_index(drop=True)
    pass_ref = ray.put(passing)

    def _gate(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(ray.get(pass_ref), on=group_col, how="inner")

    return scored.map_batches(_gate, batch_format="pandas")


# ---------------------------------------------------------------------------
# C4-style within-doc line filtering
# ---------------------------------------------------------------------------

_LINE_TERMINALS = ('.', '!', '?', '"')

# Explicit ASCII trim set for line rules: bare str.strip() removes ALL
# Unicode whitespace (\xa0,  , ...), but the DuckDB oracles trim
# exactly space/\t/\r/\f/\v — so a document containing Unicode
# whitespace would diverge from the oracle.  Lines are produced by
# splitting on \n, so \n never needs trimming.  Caveat: a line whose
# only content is Unicode whitespace counts as non-blank under this
# rule (on both engines, consistently).
_ASCII_WS = " \t\r\f\v"


def clean_lines_stage(
    ds: "ray.data.Dataset",
    min_words: int = 3,
    require_terminal: bool = True,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """C4-style within-document line filtering: keep only lines with at
    least ``min_words`` words that (when ``require_terminal``) end after
    right-trim in a terminal mark (``. ! ? "``); drop documents left
    with no surviving lines.  ``require_terminal=False`` degrades to the
    pure word-minimum rule for corpora without sentence punctuation.

    The classic boilerplate-line cleanup (C4, Raffel et al. 2020 §2.2 —
    "retained lines that ended in a terminal punctuation mark" / word
    minimum), complementing the corpus-level paragraph dedup in
    :func:`..ops.dedup.line_dedup`: that stage removes lines repeated
    ACROSS documents, this one removes nav/menu fragments WITHIN each.

    One stateless streaming map — no shuffle, no state, text visits one
    worker once.  Output:
    ``(id, clean_text, n_kept, n_dropped)`` where ``n_dropped`` counts
    non-blank lines removed (blank lines are structural, not counted).
    """

    def _fn(batch: pa.Table) -> pa.Table:
        ids, texts = batch[id_col].to_pylist(), batch[text_col].to_pylist()
        out_id, out_txt, out_k, out_d = [], [], [], []
        for i, t in zip(ids, texts):
            lines = [ln for ln in t.split("\n") if ln.strip(_ASCII_WS)]
            kept = [
                ln
                for ln in lines
                if len(TOKEN_RE.findall(ln.lower())) >= min_words
                and (
                    not require_terminal
                    or ln.rstrip(_ASCII_WS).endswith(_LINE_TERMINALS)
                )
            ]
            if not kept:
                continue
            out_id.append(i)
            out_txt.append("\n".join(kept))
            out_k.append(len(kept))
            out_d.append(len(lines) - len(kept))
        return pa.table(
            {
                id_col: pa.array(out_id, batch[id_col].type),
                "clean_text": pa.array(out_txt, pa.string()),
                "n_kept": pa.array(out_k, pa.int64()),
                "n_dropped": pa.array(out_d, pa.int64()),
            }
        )

    return ds.map_batches(_fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Gopher rules filter
# ---------------------------------------------------------------------------

_GOPHER_STOPWORDS = frozenset(
    ["the", "be", "to", "of", "and", "that", "have", "with"]
)
_ALPHA_WORD_RE = re.compile(r"[a-z]")


def gopher_rules_of(text: str) -> dict:
    """Per-document Gopher quality-rule flags (Rae et al. 2021 App. A1.1),
    each rule exposed individually plus the composite ``pass`` verdict:

    - ``r_wc``: word count in [50, 100000]
    - ``r_mwl``: mean word length in [3, 10]
    - ``r_sym``: (count('#') + count('...')) / words ≤ 0.1
    - ``r_bullet``: ≤ 90% of non-blank lines start with a bullet
    - ``r_ellipsis``: ≤ 30% of non-blank lines end with an ellipsis
    - ``r_alpha``: ≥ 80% of words contain an alphabetic character
    - ``r_stop``: contains ≥ 2 distinct Gopher stopwords
      (the / be / to / of / and / that / have / with)

    Words are ``\\w+`` runs of the lowercased text — the same
    tokenization every oracle in this repo re-derives in SQL.
    """
    toks = TOKEN_RE.findall(text.lower())
    n = len(toks)
    r_wc = 50 <= n <= 100_000
    mwl = (sum(len(t) for t in toks) / n) if n else 0.0
    r_mwl = 3.0 <= mwl <= 10.0
    sym = (text.count("#") + text.count("...")) / n if n else 1.0
    r_sym = sym <= 0.1
    lines = [ln for ln in text.split("\n") if ln.strip(_ASCII_WS)]
    if lines:
        bullet = sum(
            1 for ln in lines if ln.lstrip(_ASCII_WS).startswith(("•", "- ", "* "))
        ) / len(lines)
        ellipsis = sum(
            1 for ln in lines if ln.rstrip(_ASCII_WS).endswith(("...", "…"))
        ) / len(lines)
    else:
        bullet = ellipsis = 0.0
    r_bullet = bullet <= 0.9
    r_ellipsis = ellipsis <= 0.3
    alpha_frac = (
        sum(1 for t in toks if _ALPHA_WORD_RE.search(t)) / n if n else 0.0
    )
    r_alpha = alpha_frac >= 0.8
    r_stop = len(_GOPHER_STOPWORDS.intersection(toks)) >= 2
    flags = {
        "r_wc": r_wc,
        "r_mwl": r_mwl,
        "r_sym": r_sym,
        "r_bullet": r_bullet,
        "r_ellipsis": r_ellipsis,
        "r_alpha": r_alpha,
        "r_stop": r_stop,
    }
    flags["pass"] = all(flags.values())
    return flags


GOPHER_FLAGS = [
    "r_wc", "r_mwl", "r_sym", "r_bullet", "r_ellipsis", "r_alpha",
    "r_stop", "pass",
]


def gopher_rules_stage(
    ds: "ray.data.Dataset", text_col: str = "text", id_col: str = "doc_id"
) -> "ray.data.Dataset":
    """(id, r_*…, pass) via :func:`gopher_rules_of` — one stateless
    streaming map, the per-rule census a curation run reports before
    deciding thresholds (complements the weighted composite in
    :func:`quality_stage`)."""

    def _fn(batch: pa.Table) -> pa.Table:
        flags = [gopher_rules_of(t) for t in batch[text_col].to_pylist()]
        cols: dict = {id_col: batch[id_col]}
        for k in GOPHER_FLAGS:
            # int64 not bool: SQL-oracle hash parity across engines
            cols[k] = pa.array([int(f[k]) for f in flags], pa.int64())
        return pa.table(cols)

    return ds.map_batches(_fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# BM25 top-k search
# ---------------------------------------------------------------------------

def bm25_search(
    ds: "ray.data.Dataset",
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """BM25 top-``k`` document retrieval for a bag of query terms
    (Robertson-Spärck Jones; the Lucene idf variant
    ``ln(1 + (N - df + 0.5)/(df + 0.5))`` — always ≥ 0).

    Scale posture: ONE tokenize pass materializes the slim per-doc
    ``(id, dl, tf_t…)`` projection (|terms| + 2 numbers per doc — the
    text is read once and never again); corpus stats (N, Σdl, df_t) are
    a single-row combiner aggregate over it; scoring is a stateless map
    with the idf constants baked into the closure; the global top-k is
    the per-block-partial + driver-combine kernel (`relational.topk`)
    — no sort shuffle.  Output: (id, score) ordered by
    (score DESC, id ASC).
    """
    from .relational import grouped_aggregate, topk

    terms = list(dict.fromkeys(query_terms))
    tf_cols = [f"_tf{i}" for i in range(len(terms))]

    def _tf(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        toks_all = [TOKEN_RE.findall(t.lower()) for t in texts]
        cols = {
            id_col: batch[id_col],
            "_dl": pa.array([len(tk) for tk in toks_all], pa.int64()),
        }
        for term, c in zip(terms, tf_cols):
            cols[c] = pa.array(
                [sum(1 for x in tk if x == term) for tk in toks_all],
                pa.int64(),
            )
        return pa.table(cols)

    slim = ds.map_batches(_tf, batch_format="pyarrow").materialize()

    def _df_flags(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cols = {"_dl": batch["_dl"]}
        for c in tf_cols:
            cols[f"{c}_df"] = pc.cast(
                pc.greater(batch[c], 0), pa.int64()
            )
        return pa.table(cols)

    stats = grouped_aggregate(
        slim.map_batches(_df_flags, batch_format="pyarrow").map_batches(
            lambda t: t.append_column(
                "_k", pa.array([0] * len(t), pa.int64())
            ),
            batch_format="pyarrow",
        ),
        keys=["_k"],
        specs=[("count_star", None, "_n"), ("sum", "_dl", "_sdl")]
        + [("sum", f"{c}_df", f"{c}_df") for c in tf_cols],
    ).to_pandas()
    N = float(stats["_n"].iloc[0])
    avgdl = float(stats["_sdl"].iloc[0]) / N if N else 1.0
    idf = {
        c: float(np.log(1.0 + (N - d + 0.5) / (d + 0.5)))
        for c, d in ((c, float(stats[f"{c}_df"].iloc[0])) for c in tf_cols)
    }

    def _score(batch: pd.DataFrame) -> pd.DataFrame:
        dl = batch["_dl"].to_numpy(np.float64)
        norm = k1 * (1.0 - b + b * dl / avgdl)
        s = np.zeros(len(batch))
        for c in tf_cols:
            tf = batch[c].to_numpy(np.float64)
            s += idf[c] * tf * (k1 + 1.0) / (tf + norm)
        return pd.DataFrame({id_col: batch[id_col], "score": s})

    scored = slim.map_batches(_score, batch_format="pandas")
    return topk(scored, keys=["score", id_col], descending=[True, False], n=k)


# ---------------------------------------------------------------------------
# PMI collocation mining
# ---------------------------------------------------------------------------

def pmi_collocations(
    ds: "ray.data.Dataset",
    k: int = 50,
    min_count: int = 5,
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Top-``k`` adjacent-token collocations by pointwise mutual
    information — the classic corpus-analysis step for phrase mining
    and tokenizer-merge candidates.

    ``pmi(a,b) = ln( (c_ab / N_bi) / ((c_a/N_uni) · (c_b/N_uni)) )``
    over ``\\w+`` tokens of the lowercased text (the repo-standard
    tokenization every oracle re-derives), bigrams below ``min_count``
    dropped before any log is taken.

    Scale plan: per-batch ``np.unique`` partials make BOTH count
    shuffles carry (key, partial-count) rows — bounded by
    distinct-vocab × blocks, never corpus size (the `token_freq_topk`
    combiner shape).  The min_count-filtered bigram table is
    candidate-sized and collects to the driver; unigram counts are
    then fetched for ONLY the candidate tokens via a vectorized
    ``is_in`` scan of the unigram table (O(candidate vocab) driver
    heap — the full unigram table never collects).

    Output: ``(tok_a, tok_b, c_ab, pmi)`` sorted by
    (pmi desc, tok_a, tok_b); ``pmi`` rounded half-away to 6 (DuckDB
    parity; also makes the top-k tiebreak identical on both engines).
    """
    import pyarrow as _pa
    import pyarrow.compute as _pc

    from .relational import grouped_aggregate

    def _uni_partials(batch: pd.DataFrame) -> pd.DataFrame:
        tok_lists = [
            TOKEN_RE.findall(t.lower())
            for t in batch[text_col].to_numpy(object)
        ]
        flat = (
            np.concatenate([np.asarray(t, object) for t in tok_lists if t])
            if any(tok_lists)
            else np.empty(0, object)
        )
        uniq, cnt = np.unique(flat, return_counts=True)
        return pd.DataFrame(
            {"tok": uniq.astype(object), "cnt": cnt.astype(np.int64)}
        )

    def _bi_partials(batch: pd.DataFrame) -> pd.DataFrame:
        pairs = []
        for t in batch[text_col].to_numpy(object):
            toks = TOKEN_RE.findall(t.lower())
            pairs.extend(
                f"{a}\x1f{b}" for a, b in zip(toks, toks[1:])
            )
        uniq, cnt = np.unique(np.asarray(pairs, object), return_counts=True)
        return pd.DataFrame(
            {"pair": uniq.astype(object), "cnt": cnt.astype(np.int64)}
        )

    slim = ds.select_columns([text_col])
    uni = grouped_aggregate(
        slim.map_batches(_uni_partials, batch_format="pandas"),
        keys=["tok"], specs=[("sum", "cnt", "cnt")],
    ).materialize()
    bi = grouped_aggregate(
        slim.map_batches(_bi_partials, batch_format="pandas"),
        keys=["pair"], specs=[("sum", "cnt", "cnt")],
    ).materialize()

    n_uni = uni.aggregate(ray.data.aggregate.Sum("cnt"))["sum(cnt)"]
    n_bi = bi.aggregate(ray.data.aggregate.Sum("cnt"))["sum(cnt)"]

    cand = bi.filter(expr=f"cnt >= {int(min_count)}").to_pandas()
    if not len(cand):
        return ray.data.from_pandas(
            pd.DataFrame(
                {
                    "tok_a": pd.Series(dtype=object),
                    "tok_b": pd.Series(dtype=object),
                    "c_ab": pd.Series(dtype=np.int64),
                    "pmi": pd.Series(dtype=float),
                }
            )
        )
    ab = cand["pair"].str.split("\x1f", expand=True)
    cand = cand.assign(tok_a=ab[0], tok_b=ab[1])
    need = _pa.array(sorted(set(cand["tok_a"]) | set(cand["tok_b"])))

    def _pick(t: _pa.Table) -> _pa.Table:
        return t.filter(_pc.is_in(t["tok"], value_set=need))

    uc = uni.map_batches(_pick, batch_format="pyarrow").to_pandas()
    cmap = dict(zip(uc["tok"], uc["cnt"]))
    c_a = cand["tok_a"].map(cmap).to_numpy(np.float64)
    c_b = cand["tok_b"].map(cmap).to_numpy(np.float64)
    c_ab = cand["cnt"].to_numpy(np.float64)
    pmi = np.log((c_ab / n_bi) / ((c_a / n_uni) * (c_b / n_uni)))
    scale = 1e6
    pmi_r = np.trunc(pmi * scale + np.copysign(0.5, pmi)) / scale
    out = pd.DataFrame(
        {
            "tok_a": cand["tok_a"].to_numpy(object),
            "tok_b": cand["tok_b"].to_numpy(object),
            "c_ab": cand["cnt"].to_numpy(np.int64),
            "pmi": pmi_r,
        }
    ).sort_values(
        ["pmi", "tok_a", "tok_b"], ascending=[False, True, True],
        kind="mergesort",
    ).head(k).reset_index(drop=True)
    return ray.data.from_pandas(out)


# ---------------------------------------------------------------------------
# adjacent-bigram explode + inverted index construction
# ---------------------------------------------------------------------------

def explode_bigrams(
    ds: "ray.data.Dataset", text_col: str = "text"
) -> "ray.data.Dataset":
    """One row per adjacent token bigram ("a b", TOKEN_RE over the
    lowercased text — the repo-standard tokenization) — the raw item
    stream a frequency sketch consumes.  Stateless streaming map; at
    100 TB this is never materialized, it feeds a combiner/sketch."""

    def _fn(batch: pd.DataFrame) -> pd.DataFrame:
        grams: list = []
        for t in batch[text_col].to_numpy(object):
            toks = TOKEN_RE.findall(t.lower())
            grams.extend(f"{a} {b}" for a, b in zip(toks, toks[1:]))
        return pd.DataFrame({"bigram": np.asarray(grams, object)})

    return ds.select_columns([text_col]).map_batches(
        _fn, batch_format="pandas"
    )


def inverted_index(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    postings_cap: int = 16,
    partitions: int | None = None,
) -> "ray.data.Dataset":
    """Corpus inverted index: per token, exact document frequency plus
    the first ``postings_cap`` posting doc ids (ascending, comma-joined
    string) — the retrieval-side artifact `bm25_search` recomputes
    per query and a 100-TB corpus builds ONCE.

    Plan: per-batch distinct (token, doc_id) pairs (each document lives
    in exactly one batch, so batch-distinct ⇒ globally distinct — no
    pre-shuffle dedup pass), hash-partitioned by token, per-partition
    pandas group finalize.  The pair shuffle is the index build's
    irreducible exchange (the postings ARE the output); what stays
    bounded is the payload — (hash, int64) pairs, never document text.
    ``postings_cap`` bounds the emitted list so a stopword's row stays
    O(cap) while ``df`` remains exact.

    Output: ``(token, df, postings)`` sorted by token.
    """
    from .relational import DEDUP_PARTITIONS

    P = partitions or DEDUP_PARTITIONS

    def _pairs(batch: pd.DataFrame) -> pd.DataFrame:
        toks: list = []
        ids: list = []
        for i, t in zip(
            batch[id_col].to_numpy(), batch[text_col].to_numpy(object)
        ):
            uniq = set(TOKEN_RE.findall(t.lower()))
            toks.extend(uniq)
            ids.extend([i] * len(uniq))
        out = pd.DataFrame(
            {
                "token": np.asarray(toks, object),
                id_col: np.asarray(ids, np.int64),
            }
        )
        out["_part"] = (
            pd.util.hash_pandas_object(out["token"], index=False).to_numpy()
            % P
        ).astype("int32")
        return out

    def _finalize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["token", id_col], kind="mergesort")
        gb = g.groupby("token", sort=False)
        df_cnt = gb.size()
        postings = gb[id_col].agg(
            lambda s: ",".join(str(int(v)) for v in s.head(postings_cap))
        )
        return pd.DataFrame(
            {
                "token": df_cnt.index.to_numpy(object),
                "df": df_cnt.to_numpy(np.int64),
                "postings": postings.to_numpy(object),
            }
        )

    return (
        ds.select_columns([id_col, text_col])
        .map_batches(_pairs, batch_format="pandas")
        .groupby("_part")
        .map_groups(_finalize, batch_format="pandas")
        .sort("token")
    )


def json_extract_fields(
    ds: "ray.data.Dataset",
    col: str,
    fields: "dict[str, str]",
    keep: "list[str] | None" = None,
) -> "ray.data.Dataset":
    """Parse a JSON-string column into typed columns — the
    semi-structured ingest step every event/log pipeline starts with
    (the reference's event `props` blobs land exactly like this).

    ``fields``: {out_col: type} for TOP-LEVEL keys, type ∈
    {"int64", "float64", "str"}; missing keys / nulls / malformed
    documents yield Arrow nulls (never a raised row — at 100 TB some
    blob is always broken).  Stateless streaming map over zero-copy
    Arrow batches, zero shuffle; the parse is stdlib ``json.loads``
    per record — the honest CPU price, same class as the md5 draws,
    and it pipelines behind the scan."""
    import json

    keep = list(keep or [])
    _types = {"int64": pa.int64(), "float64": pa.float64(),
              "str": pa.string()}
    _casts = {"int64": int, "float64": float, "str": str}

    def _parse(t: "pa.Table") -> "pa.Table":
        parsed = []
        for s in t[col].to_pylist():
            if not isinstance(s, str):
                parsed.append({})
                continue
            try:
                d = json.loads(s)
                parsed.append(d if isinstance(d, dict) else {})
            except ValueError:
                parsed.append({})
        cols = {k: t[k] for k in keep}
        for name, typ in fields.items():
            cast = _casts[typ]
            cols[name] = pa.array(
                [None if d.get(name) is None else cast(d[name])
                 for d in parsed],
                type=_types[typ],
            )
        return pa.table(cols)

    return ds.map_batches(_parse, batch_format="pyarrow")


__all__.append("json_extract_fields")


def explode_tokens(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_cols: "Sequence[str]" = ("doc_id",),
) -> "ray.data.Dataset":
    """Tokenize-to-long-form: one output row per token occurrence,
    ``id_cols + (pos int64 1-based, word)`` — the corpus layout
    positional indexes, n-gram mining and alignment tools consume.
    ``TOKEN_RE`` over lowercased text (== ``regexp_extract_all(
    lower(text), '\\w+')``, the repo-wide convention).  Stateless
    streaming flat map — output is ~tokens× the input rows but zero
    shuffle; feed it straight into a combiner, don't materialize."""
    id_cols = list(id_cols)

    def _explode(df: pd.DataFrame) -> pd.DataFrame:
        ids = {c: [] for c in id_cols}
        pos, words = [], []
        for tup in df[id_cols + [text_col]].itertuples(index=False):
            toks = TOKEN_RE.findall(str(tup[-1]).lower())
            if not toks:
                continue
            for c, v in zip(id_cols, tup):
                ids[c].append(np.repeat(v, len(toks)))
            pos.append(np.arange(1, len(toks) + 1, dtype=np.int64))
            words.append(np.asarray(toks, dtype=object))
        if not pos:
            out = {c: pd.Series(dtype=df[c].dtype) for c in id_cols}
            out["pos"] = pd.Series(dtype=np.int64)
            out["word"] = pd.Series(dtype=object)
            return pd.DataFrame(out)
        out = {c: np.concatenate(ids[c]) for c in id_cols}
        out["pos"] = np.concatenate(pos)
        out["word"] = np.concatenate(words)
        return pd.DataFrame(out)

    return ds.select_columns(id_cols + [text_col]).map_batches(
        _explode, batch_format="pandas"
    )


__all__.append("explode_tokens")


# ---------------------------------------------------------------------------
# blocked all-pairs TF-IDF cosine (the north-star pairwise text scorer)
# ---------------------------------------------------------------------------

def tfidf_cosine_pairs(
    ds: "ray.data.Dataset",
    block_cols: "list[str]",
    threshold: float = 0.6,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_broadcast_limit: int = TFIDF_VOCAB_BROADCAST_LIMIT,
    partitions: int = 64,
) -> "ray.data.Dataset":
    """All-pairs TF-IDF cosine similarity WITHIN blocking groups:
    ``(doc_a, doc_b, cosine)`` for every same-block pair with
    ``cosine >= threshold``, ``doc_a < doc_b``.  Weights are the same
    smooth Salton form as :func:`tfidf_doc_keywords`:
    ``w = tf · (ln((N+1)/(df+1)) + 1)`` over corpus-wide document
    frequencies; the blocked pairwise cosine is the TF-IDF-cosine
    pairwise scorer the ER pipeline's score stage specializes
    (stages/scoring.py) — here standalone and SQL-checkable.

    Scale shape: the corpus DF table is ONE combiner shuffle of
    per-batch ``(token, partial df)`` rows, then one of two plans by
    measured vocabulary size:

    - **broadcast** (vocab ≤ ``vocab_broadcast_limit``): the sorted
      (token, idf) arrays ship once per worker via ``ray.put``; docs
      hash-partition by block key (whole blocks co-locate, ONE
      exchange of the raw doc rows), and each block scores its pairs
      with a dense group-vocab matmul — pairwise work is
      Σ block² · |block vocab|, never corpus².
    - **join** (above the limit): the exploded ``(block, doc, token,
      tf)`` stream hash-joins the DF table on token, self-joins on
      ``(block, token)`` (partial dot products — the SQL plan), one
      combiner sum per pair, then per-doc norms attach by two more
      hash joins.  Token strings cross the exchanges but document
      text never does.  Sequential joins materialize between stages
      (two lazy JoinOperators in one plan spawn both aggregator pools
      at once and can starve a small cluster's map stages).

    Block sizes bound the pairwise cost: callers must pass block keys
    with bounded group cardinality (domain, LSH band, (source, lang)
    at test scale) exactly as the ER blocking stage does; a hot block
    lands whole in one partition, so salt upstream if a single key
    exceeds a worker's batch budget.
    """
    from .relational import grouped_aggregate, hash_join

    block_cols = list(block_cols)
    n_docs = float(ds.count())

    def _df_partials(batch: pd.DataFrame) -> pd.DataFrame:
        tfd = _batch_doc_tf(
            batch[text_col].to_numpy(object), batch[id_col].to_numpy()
        )
        u, c = np.unique(tfd["token"].to_numpy(object), return_counts=True)
        return pd.DataFrame(
            {"token": u.astype(object), "df": c.astype(np.int64)}
        )

    df_tab = grouped_aggregate(
        ds.select_columns([id_col, text_col]).map_batches(
            _df_partials, batch_format="pandas"
        ),
        keys=["token"],
        specs=[("sum", "df", "df")],
    ).materialize()

    def _idf(df: np.ndarray) -> np.ndarray:
        return np.log((n_docs + 1.0) / (df.astype(np.float64) + 1.0)) + 1.0

    def _empty_pairs() -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_a": np.empty(0, np.int64),
                "doc_b": np.empty(0, np.int64),
                "cosine": np.empty(0, np.float64),
            }
        )

    if df_tab.count() <= vocab_broadcast_limit:
        pdf = df_tab.to_pandas()
        order = np.argsort(pdf["token"].to_numpy(object), kind="stable")
        vocab_ref = ray.put(
            (
                pdf["token"].to_numpy(object)[order],
                _idf(pdf["df"].to_numpy()[order]),
            )
        )

        def _tag(batch: pd.DataFrame) -> pd.DataFrame:
            key = batch[block_cols[0]].astype(str)
            for c in block_cols[1:]:
                key = key + "\x1f" + batch[c].astype(str)
            batch = batch.copy()
            batch["_part"] = (
                pd.util.hash_array(key.to_numpy(object)) % partitions
            ).astype("int32")
            return batch

        def _block_pairs(g: pd.DataFrame, vocab, idf) -> pd.DataFrame:
            if len(g) < 2:
                return _empty_pairs()
            tfd = _batch_doc_tf(
                g[text_col].to_numpy(object), g[id_col].to_numpy()
            )
            if not len(tfd):
                return _empty_pairs()
            pos = np.searchsorted(vocab, tfd["token"].to_numpy(object))
            w = tfd["tf"].to_numpy(np.float64) * idf[pos]
            docs, dinv = np.unique(tfd["doc_id"].to_numpy(), return_inverse=True)
            cols, tinv = np.unique(pos, return_inverse=True)
            m = np.zeros((len(docs), len(cols)), np.float64)
            m[dinv, tinv] = w
            nrm = np.sqrt((m * m).sum(axis=1))
            nz = nrm > 0.0
            m, docs = m[nz] / nrm[nz, None], docs[nz]
            if len(docs) < 2:
                return _empty_pairs()
            sim = m @ m.T
            ia, ib = np.triu_indices(len(docs), k=1)
            keep = sim[ia, ib] >= threshold
            return pd.DataFrame(
                {
                    "doc_a": docs[ia[keep]].astype(np.int64),
                    "doc_b": docs[ib[keep]].astype(np.int64),
                    "cosine": sim[ia[keep], ib[keep]],
                }
            )

        def _finish(g: pd.DataFrame) -> pd.DataFrame:
            vocab, idf = ray.get(vocab_ref)
            out = [
                _block_pairs(b, vocab, idf)
                for _, b in g.groupby(block_cols, sort=False, dropna=False)
            ]
            return (
                pd.concat(out, ignore_index=True) if out else _empty_pairs()
            )

        return (
            ds.select_columns([id_col, *block_cols, text_col])
            .map_batches(_tag, batch_format="pandas")
            .groupby("_part")
            .map_groups(_finish, batch_format="pandas")
        )

    # join plan: explode -> DF join -> (block, token) self-join ->
    # pair-sum combiner -> norm attach
    def _explode(batch: pd.DataFrame) -> pd.DataFrame:
        tfd = _batch_doc_tf(
            batch[text_col].to_numpy(object), batch[id_col].to_numpy()
        )
        blk = batch.set_index(id_col)[block_cols]
        for c in block_cols:
            tfd[c] = blk[c].reindex(tfd["doc_id"].to_numpy()).to_numpy()
        return tfd

    exploded = ds.select_columns([id_col, *block_cols, text_col]).map_batches(
        _explode, batch_format="pandas"
    )

    def _weigh(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["w"] = batch["tf"].to_numpy(np.float64) * _idf(
            batch["df"].to_numpy()
        )
        return batch[["doc_id", *block_cols, "token", "w"]]

    w_tab = hash_join(exploded, df_tab, on=["token"]).map_batches(
        _weigh, batch_format="pandas"
    ).materialize()  # feeds self-join (both sides) + norms

    def _sq(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "w2": batch["w"].to_numpy() ** 2,
            }
        )

    norms = grouped_aggregate(
        w_tab.map_batches(_sq, batch_format="pandas"),
        keys=["doc_id"],
        specs=[("sum", "w2", "sq")],
    ).materialize()

    right = w_tab.map_batches(
        lambda b: b.rename(columns={"doc_id": "doc_b", "w": "w_b"}),
        batch_format="pandas",
    )

    def _partial_dot(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch["doc_id"] < batch["doc_b"]]
        return pd.DataFrame(
            {
                "doc_a": batch["doc_id"],
                "doc_b": batch["doc_b"],
                "dot": batch["w"].to_numpy() * batch["w_b"].to_numpy(),
            }
        )

    dots = grouped_aggregate(
        hash_join(w_tab, right, on=["token", *block_cols]).map_batches(
            _partial_dot, batch_format="pandas"
        ),
        keys=["doc_a", "doc_b"],
        specs=[("sum", "dot", "dot")],
    ).materialize()

    with_a = hash_join(
        dots,
        norms.map_batches(
            lambda b: b.rename(columns={"doc_id": "doc_a", "sq": "sq_a"}),
            batch_format="pandas",
        ),
        on=["doc_a"],
    ).materialize()
    joined = hash_join(
        with_a,
        norms.map_batches(
            lambda b: b.rename(columns={"doc_id": "doc_b", "sq": "sq_b"}),
            batch_format="pandas",
        ),
        on=["doc_b"],
    )

    def _cos(batch: pd.DataFrame) -> pd.DataFrame:
        nrm = np.sqrt(batch["sq_a"].to_numpy() * batch["sq_b"].to_numpy())
        cos = np.divide(
            batch["dot"].to_numpy(),
            nrm,
            out=np.zeros(len(batch)),
            where=nrm > 0,
        )
        keep = cos >= threshold
        return pd.DataFrame(
            {
                "doc_a": batch["doc_a"].to_numpy()[keep].astype(np.int64),
                "doc_b": batch["doc_b"].to_numpy()[keep].astype(np.int64),
                "cosine": cos[keep],
            }
        )

    return joined.map_batches(_cos, batch_format="pandas")


__all__.append("tfidf_cosine_pairs")


def bpe_pair_counts(
    docs: "ray.data.Dataset",
    text_col: str = "text",
    k: int = 50,
) -> "ray.data.Dataset":
    """Top-k adjacent-character-pair counts over all word occurrences —
    the merge-candidate statistic of byte-pair encoding (Sennrich,
    Haddow & Birch, ACL 2016): the pair with the highest count is the
    first BPE merge.  Words are the shared ``\\w+``-lowercase tokens,
    pairs weighted by occurrence (a word appearing 10× contributes its
    pairs 10×), single-char words contribute nothing.

    Scale shape: per-batch partial pair counts (one np.unique over a
    codepoint-pair int key — no Python per-char loop), ONE slim
    ``(a, b, n)`` combiner exchange, then top-k (≤ k rows per block
    before the final small sort; count-desc, pair-asc ties).  Document
    text never crosses a shuffle.
    """
    from .relational import grouped_aggregate, topk

    def _partials(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[text_col].to_numpy(object)
        words = TOKEN_RE.findall(" ".join(t.lower() for t in texts))
        if words:
            # one codepoint array for ALL words, separated by -1 so
            # cross-word pairs never form
            arrs = [np.frombuffer(w.encode("utf-32-le"), np.int32)
                    for w in words]
            flat = np.empty(sum(len(a) for a in arrs) + len(arrs), np.int32)
            pos = 0
            for a in arrs:
                flat[pos:pos + len(a)] = a
                flat[pos + len(a)] = -1
                pos += len(a) + 1
            left, right = flat[:-1], flat[1:]
            ok = (left >= 0) & (right >= 0)
            key = left[ok].astype(np.int64) * 0x110000 + right[ok]
            uniq, cnt = np.unique(key, return_counts=True)
        else:
            uniq = np.empty(0, np.int64)
            cnt = np.empty(0, np.int64)
        return pd.DataFrame(
            {
                "a": np.array([chr(c) for c in uniq // 0x110000], object),
                "b": np.array([chr(c) for c in uniq % 0x110000], object),
                "n": cnt.astype(np.int64),
            }
        )

    agg = grouped_aggregate(
        docs.select_columns([text_col]).map_batches(
            _partials, batch_format="pandas"
        ),
        keys=["a", "b"],
        specs=[("sum", "n", "n")],
    )
    return topk(agg, ["n", "a", "b"], [True, False, False], k)


__all__.append("bpe_pair_counts")


def char_entropy_stage(
    docs: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    round_nd: int = 6,
) -> "ray.data.Dataset":
    """Per-document Shannon entropy (bits) over characters — the
    gibberish / boilerplate compressibility proxy used by web-corpus
    quality pipelines next to `quality_stage`'s ratio features.  Very
    low entropy = repeated filler; very high = random noise; prose
    sits in a stable band.  Stateless streaming map (zero shuffle):
    one np.unique per doc over its utf-32 codepoints, no Python
    per-char loop.  Empty documents score 0.0."""

    def _fn(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[text_col].to_numpy(object)
        ent = np.zeros(len(texts), np.float64)
        for i, t in enumerate(texts):
            if not t:
                continue
            arr = np.frombuffer(t.encode("utf-32-le"), np.int32)
            cnt = np.unique(arr, return_counts=True)[1]
            p = cnt / cnt.sum()
            ent[i] = -(p * np.log2(p)).sum()
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(),
                "char_entropy": np.round(ent, round_nd),
            }
        )

    return docs.select_columns([id_col, text_col]).map_batches(
        _fn, batch_format="pandas"
    )


__all__.append("char_entropy_stage")


def vocab_oov(
    ds: "ray.data.Dataset",
    k: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Tokenizer-vocabulary application: learn the top-``k`` token
    vocabulary (count desc, token asc — the `token_freq_topk` census)
    and emit each document's ``(n_tokens, n_oov, oov_rate)`` against
    it — the out-of-vocabulary census a tokenizer-training pipeline
    runs before committing to a vocab size.

    Two passes, both streaming: the census shuffle ships (token,
    partial-count) rows bounded by vocab × blocks; the top-k result
    (k strings) broadcasts via ``ray.put`` into a stateless scoring
    map — documents never shuffle.  Scoring is one np.isin over the
    batch's concatenated tokens with per-doc ``np.add.reduceat``
    folds, no per-row Python loop."""
    import pandas as pd

    vocab_df = token_freq_topk(ds, k=k, text_col=text_col).to_pandas()
    vocab_arr = np.sort(vocab_df["token"].to_numpy(object))
    ref = ray.put(vocab_arr)

    def _score(batch: pd.DataFrame, _r=ref) -> pd.DataFrame:
        vocab = ray.get(_r)
        texts = batch[text_col].to_numpy(object)
        tok_lists = [t.split(" ") for t in texts]
        lens = np.fromiter((len(t) for t in tok_lists), np.int64,
                           count=len(tok_lists))
        if len(tok_lists):
            flat = np.concatenate(
                [np.asarray(t, dtype=object) for t in tok_lists]
            )
            oov = ~np.isin(flat, vocab)
            offsets = np.concatenate([[0], np.cumsum(lens)[:-1]])
            n_oov = np.add.reduceat(oov.astype(np.int64), offsets)
        else:
            n_oov = np.empty(0, np.int64)
        rate = n_oov / np.maximum(lens, 1)
        scale = 1e6
        rate = np.trunc(rate * scale + np.copysign(0.5, rate)) / scale
        return pd.DataFrame(
            {
                id_col: batch[id_col],
                "n_tokens": lens,
                "n_oov": n_oov,
                "oov_rate": rate,
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _score, batch_format="pandas"
    )
