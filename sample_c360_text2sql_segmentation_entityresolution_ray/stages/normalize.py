"""Extraction + normalization stages (reference analog: the ER schema
mapping, `lib/entity-resolution-service.ts:54-138`).

``extract_stage`` turns raw pages (html bytes) into extracted text and
**immediately drops the html column** — heavy binary payloads must not
flow any further (SURVEY §7.4 'wide binary rows').

``normalize_stage`` projects each page onto the canonical match-record
schema: normalized domain + sort slug (the NAME/EMAIL analogs), shingle
and token hash sets (the fuzzy-match features), and the MinHash
signature.  Hashing is batched — one ``pandas.util.hash_array`` call
per batch, one ``np.minimum.reduceat`` for all signatures — so the
stage is vectorized end to end.
"""

from __future__ import annotations

from urllib.parse import urlparse

import numpy as np
import pyarrow as pa

from ..functions import texthash
from ..functions.extract import extract_text
from ..functions.minhash import minhash_signatures_concat
from .config import DEFAULT_CONFIG, ERConfig

MATCH_RECORD_COLUMNS = [
    "url",
    "source",
    "lang",
    "domain",
    "slug",
    "n_tokens",
    "shingles",
    "shingles2",
    "tok_hashes",
    "minhash",
    "mh8",
]


def extract_stage(pages, keep_golden_text: bool = False):
    """pages(url, warc_ts, html, text, lang, source) →
    (url, warc_ts, text, lang, source) with text extracted from html.

    The golden ``text`` column is dropped (or kept under
    ``golden_text`` for invariant tests) so downstream always consumes
    the engine's own extraction.
    """

    def _extract(batch: pa.Table) -> pa.Table:
        texts = [extract_text(h) for h in batch["html"].to_pylist()]
        cols = {
            "url": batch["url"],
            "warc_ts": batch["warc_ts"],
            "text": pa.array(texts, pa.string()),
            "lang": batch["lang"],
            "source": batch["source"],
        }
        if keep_golden_text:
            cols["golden_text"] = batch["text"]
        return pa.table(cols)

    return pages.map_batches(_extract, batch_format="pyarrow")


def _batch_shingle_features(texts: list[str], cfg: ERConfig):
    """Per-batch feature extraction with ONE hash call for all shingles
    and one for all tokens."""
    k, cap, tok_cap = cfg.shingle_k, cfg.shingle_cap, cfg.token_cap
    all_shingles: list[str] = []
    all_tokens: list[str] = []
    all_sh2: list[str] = []  # bigram shingles, short docs only
    sh_offsets = [0]
    tok_offsets = [0]
    sh2_offsets = [0]
    tok_lists = []
    for text in texts:
        toks = texthash.tokens_of(text)
        tok_lists.append(toks)
        if len(toks) < k:
            shingles = [" ".join(toks)] if toks else []
        else:
            shingles = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        all_shingles.extend(shingles)
        all_tokens.extend(toks[:tok_cap])
        # short-doc recall path: k=3 Jaccard collapses for short docs
        # under a fixed perturbation rate; bigrams degrade gracefully.
        # Only short records pay the extra (tiny) payload.
        if len(toks) < cfg.short_doc_tokens and len(toks) >= 2:
            all_sh2.extend(
                " ".join(toks[i : i + 2]) for i in range(len(toks) - 1)
            )
        sh_offsets.append(len(all_shingles))
        tok_offsets.append(len(all_tokens))
        sh2_offsets.append(len(all_sh2))

    sh_hashes = (
        texthash.hash_str_array(all_shingles)
        if all_shingles
        else np.empty(0, np.uint64)
    )
    tok_hashes = (
        texthash.hash_str_array(all_tokens) if all_tokens else np.empty(0, np.uint64)
    )
    sh2_hashes = (
        texthash.hash_str_array(all_sh2) if all_sh2 else np.empty(0, np.uint64)
    )
    shingle2_sets = [
        np.unique(sh2_hashes[sh2_offsets[i] : sh2_offsets[i + 1]].astype(np.uint32))
        for i in range(len(texts))
    ]

    shingle_sets = []
    capped_concat = []
    capped_offsets = [0]
    slugs = []
    for i in range(len(texts)):
        h = np.unique(sh_hashes[sh_offsets[i] : sh_offsets[i + 1]])
        if len(h) > cap:
            h = h[:cap]  # bottom-k of uniform hash = unbiased sample
        # pair payload is uint32: the exploded blocking shuffle repeats
        # each record's shingle set once per block key, so halving the
        # element width halves the dominant shuffle volume; 32-bit
        # set-membership collisions (~1e-5/pair) are noise vs the
        # match threshold
        shingle_sets.append(np.unique(h.astype(np.uint32)))
        capped_concat.append(h)
        capped_offsets.append(capped_offsets[-1] + len(h))
        # signature slug: the 8 tokens with the smallest hashes, in hash
        # order — content-defined, stable under token reordering and
        # boilerplate insertion (unlike a prefix slug), so JW/Levenshtein
        # on slugs measures rare-token overlap between records.
        th = tok_hashes[tok_offsets[i] : tok_offsets[i + 1]]
        toks = tok_lists[i]
        _, first_idx = np.unique(th, return_index=True)
        slugs.append(" ".join(toks[j] for j in first_idx[:8])[:64])
    concat = (
        np.concatenate(capped_concat) if capped_concat else np.empty(0, np.uint64)
    )
    sigs = minhash_signatures_concat(
        concat, np.asarray(capped_offsets), num_perm=cfg.num_perm
    )
    tok_sets = [
        tok_hashes[tok_offsets[i] : tok_offsets[i + 1]] for i in range(len(texts))
    ]
    n_tokens = np.array([len(t) for t in tok_lists], dtype=np.int64)
    return shingle_sets, shingle2_sets, tok_sets, sigs, n_tokens, slugs


def normalize_stage(extracted, cfg: ERConfig = DEFAULT_CONFIG):
    """(url, text, lang, source, …) → canonical match records."""

    def _normalize(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        texts = batch["text"].to_pylist()
        domains = [urlparse(u).netloc for u in urls]
        shingle_sets, shingle2_sets, tok_sets, sigs, n_tokens, slugs = (
            _batch_shingle_features(texts, cfg)
        )
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "source": batch["source"],
                "lang": batch["lang"],
                "domain": pa.array(domains, pa.string()),
                "slug": pa.array(slugs, pa.string()),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "shingles": pa.array(list(shingle_sets), pa.list_(pa.uint32())),
                "shingles2": pa.array(list(shingle2_sets), pa.list_(pa.uint32())),
                "tok_hashes": pa.array(list(tok_sets), pa.list_(pa.uint64())),
                "minhash": pa.array(list(sigs), pa.list_(pa.uint64())),
                # b-bit (8-bit) signature for the pair payload: the
                # scorer's pre-gate only needs component equality, and
                # 1/256 accidental collisions shift the estimate by
                # +0.004 — far inside est_gate_margin
                "mh8": pa.array(
                    [(s & np.uint64(0xFF)).astype(np.uint8) for s in sigs],
                    pa.list_(pa.uint8()),
                ),
            }
        )

    return extracted.map_batches(_normalize, batch_format="pyarrow")
