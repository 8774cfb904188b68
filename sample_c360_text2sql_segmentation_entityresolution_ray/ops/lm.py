"""Corpus n-gram language model: distributed fit + perplexity scoring.

The CCNet / GPT-3 data-curation recipe scores every document with a
small language model and keeps the low-perplexity tail (Wenzek et al.
2020, "CCNet: Extracting High Quality Monolingual Datasets from Web
Crawl Data"; reference analog: the quality half of the curation flow —
the reference delegates document scoring to managed services, see
`lambda/webbackend/agent_processor.py` result post-processing).  This
module is the engine-native version: an add-one-smoothed bigram LM fit
on the corpus itself with two slim combiner shuffles, then a stateless
broadcast-probe scoring map.

SCALE — how each stage behaves at 100 TB:

- **fit pass 1 (unigrams)**: per-batch ``np.unique`` partials make the
  shuffle carry ``(token, partial_count)`` rows — bounded by
  distinct-vocab x blocks, never corpus size.  Vocabulary is capped at
  ``vocab_size`` by a tiny ``(count desc, token asc)`` sort; every
  other token maps to ``<unk>``.
- **fit pass 2 (bigrams)**: tokens are mapped to int vocab ids inside
  the batch (sorted-array ``searchsorted``, no Python dict), so the
  shuffle ships ``(int64 key, count)`` partials — 16 bytes per
  distinct (context, word) pair per block.  The driver-resident model
  is bounded by observed distinct bigrams over the capped vocab;
  ``bigram_min_count`` prunes the broadcast table (pruned pairs score
  through smoothing as count-0, exactly like unseen pairs).
- **scoring**: one broadcast of the model (``ray.put`` once, zero-copy
  plasma read per worker), then a pure task-stage map — no shuffle,
  text never leaves its block.  All per-doc math is vectorized across
  the batch (one ``searchsorted`` + ``np.add.reduceat`` per batch).

Determinism: vocabulary tie-break is ``(count desc, token asc)`` and
the probability arithmetic is integer counts + one ``ln`` — the whole
model is reproducible in SQL (see the ``lm_perplexity`` oracle, which
re-derives vocabulary, bigram counts, and per-doc mean log-prob).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

import ray

from .relational import grouped_aggregate


@dataclass
class BigramLm:
    """Driver-resident model; broadcast once via ``ray.put``.

    Ids: kept vocab tokens get ``0..V-1`` in ``(count desc, token
    asc)`` order; ``<unk>`` = ``V``; ``<s>`` (context only) = ``V+1``.
    ``bigram_keys`` are sorted ``ctx * (V + 2) + word`` composites.
    """

    vocab_sorted: np.ndarray   # lexically sorted kept tokens (object)
    vid_of_sorted: np.ndarray  # int64 vocab id aligned to vocab_sorted
    V: int                     # kept vocab size (V1 = V + 1 outcomes)
    bigram_keys: np.ndarray    # sorted int64 composite keys
    bigram_cnts: np.ndarray    # int64, aligned to bigram_keys
    ctx_totals: np.ndarray     # int64, dense size V + 2

    @property
    def base(self) -> int:
        return self.V + 2

    def map_tokens(self, toks: np.ndarray) -> np.ndarray:
        """Vectorized token -> vocab id (OOV -> V)."""
        out = np.full(len(toks), self.V, np.int64)
        if len(self.vocab_sorted) and len(toks):
            pos = np.searchsorted(self.vocab_sorted, toks)
            pos[pos == len(self.vocab_sorted)] = len(self.vocab_sorted) - 1
            hit = self.vocab_sorted[pos] == toks
            out[hit] = self.vid_of_sorted[pos[hit]]
        return out


def _doc_token_arrays(texts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All space-split tokens concatenated + per-doc lengths.

    ``"".split(" ") == [""]`` — the empty string is one (empty) token,
    matching DuckDB ``string_split('', ' ')``; every doc has >= 1."""
    per_doc = [np.asarray(t.split(" "), dtype=object) for t in texts]
    lens = np.fromiter((len(p) for p in per_doc), np.int64, len(per_doc))
    toks = np.concatenate(per_doc) if per_doc else np.empty(0, object)
    return toks, lens


def _bigram_keys_for_batch(lm_or_v, texts: np.ndarray, map_fn) -> tuple:
    """(composite int64 keys, per-doc lengths) for one batch of texts.

    Context ids are the word ids shifted right within each doc, with
    ``<s>`` (= V+1) at every doc start."""
    toks, lens = _doc_token_arrays(texts)
    wid = map_fn(toks)
    ctx = np.empty_like(wid)
    if len(wid):
        ctx[1:] = wid[:-1]
        starts = np.zeros(len(wid), bool)
        starts[np.concatenate(([0], np.cumsum(lens)[:-1]))] = True
        ctx[starts] = lm_or_v + 1  # <s>
    return ctx * (lm_or_v + 2) + wid, lens


def bigram_lm_fit(
    docs: "ray.data.Dataset",
    text_col: str = "text",
    vocab_size: int = 4096,
    bigram_min_count: int = 1,
) -> "ray.ObjectRef":
    """Fit the corpus bigram LM; returns a ``ray.put`` handle to
    :class:`BigramLm`.  Two combiner shuffles (unigram, bigram) — see
    module SCALE notes."""
    texts_only = docs.select_columns([text_col])

    def _uni_partials(batch: pd.DataFrame) -> pd.DataFrame:
        toks, _ = _doc_token_arrays(batch[text_col].to_numpy(object))
        uniq, cnt = np.unique(toks, return_counts=True)
        return pd.DataFrame(
            {"token": uniq.astype(object), "cnt": cnt.astype(np.int64)}
        )

    uni = grouped_aggregate(
        texts_only.map_batches(_uni_partials, batch_format="pandas"),
        keys=["token"],
        specs=[("sum", "cnt", "cnt")],
    )
    top = (
        uni.sort(["cnt", "token"], descending=[True, False])
        .limit(vocab_size)
        .to_pandas()
    )
    vocab = top["token"].to_numpy(object)
    V = len(vocab)
    order = np.argsort(vocab, kind="stable")
    vocab_sorted = vocab[order]
    vid_of_sorted = np.arange(V, dtype=np.int64)[order]
    probe = BigramLm(vocab_sorted, vid_of_sorted, V,
                     np.empty(0, np.int64), np.empty(0, np.int64),
                     np.zeros(V + 2, np.int64))
    probe_ref = ray.put(probe)

    def _bi_partials(batch: pd.DataFrame) -> pd.DataFrame:
        p = ray.get(probe_ref)
        keys, _ = _bigram_keys_for_batch(
            p.V, batch[text_col].to_numpy(object), p.map_tokens
        )
        uniq, cnt = np.unique(keys, return_counts=True)
        return pd.DataFrame({"key": uniq, "cnt": cnt.astype(np.int64)})

    bi = grouped_aggregate(
        texts_only.map_batches(_bi_partials, batch_format="pandas"),
        keys=["key"],
        specs=[("sum", "cnt", "cnt")],
    ).to_pandas()
    keys = bi["key"].to_numpy(np.int64)
    cnts = bi["cnt"].to_numpy(np.int64)
    srt = np.argsort(keys, kind="stable")
    keys, cnts = keys[srt], cnts[srt]

    ctx_totals = np.zeros(V + 2, np.int64)
    np.add.at(ctx_totals, keys // (V + 2), cnts)  # totals BEFORE pruning
    if bigram_min_count > 1:
        keep = cnts >= bigram_min_count
        keys, cnts = keys[keep], cnts[keep]
    return ray.put(
        BigramLm(vocab_sorted, vid_of_sorted, V, keys, cnts, ctx_totals)
    )


def lm_score_stage(
    docs: "ray.data.Dataset",
    lm_ref: "ray.ObjectRef",
    id_col: str = "doc_id",
    text_col: str = "text",
    round_nd: int = 6,
) -> "ray.data.Dataset":
    """(id, n_tokens, lm_logprob) per document: mean over positions of
    ``ln((c(ctx, w) + 1) / (c(ctx, *) + V + 1))`` — add-one-smoothed
    bigram log-probability under the broadcast corpus LM.  Lower (more
    negative) = higher perplexity = further from the corpus norm."""

    def _fn(batch: pd.DataFrame) -> pd.DataFrame:
        lm: BigramLm = ray.get(lm_ref)
        texts = batch[text_col].to_numpy(object)
        keys, lens = _bigram_keys_for_batch(lm.V, texts, lm.map_tokens)
        cb = np.zeros(len(keys), np.int64)
        if len(lm.bigram_keys) and len(keys):
            pos = np.searchsorted(lm.bigram_keys, keys)
            pos[pos == len(lm.bigram_keys)] = len(lm.bigram_keys) - 1
            hit = lm.bigram_keys[pos] == keys
            cb[hit] = lm.bigram_cnts[pos[hit]]
        cc = lm.ctx_totals[keys // lm.base]
        lp = np.log((cb + 1.0) / (cc + lm.V + 1.0))
        starts = np.concatenate(([0], np.cumsum(lens)[:-1])) if len(lens) else np.empty(0, np.int64)
        sums = np.add.reduceat(lp, starts) if len(lp) else np.empty(0)
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(),
                "n_tokens": lens,
                "lm_logprob": np.round(sums / lens, round_nd),
            }
        )

    return docs.select_columns([id_col, text_col]).map_batches(
        _fn, batch_format="pandas"
    )


def lm_perplexity_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 4096,
    round_nd: int = 6,
) -> str:
    """DuckDB re-derivation of fit + score (unpruned bigram table):
    vocabulary by ``(count desc, token asc)``, ``<unk>`` mapping, lag
    contexts with ``<s>`` defaults, add-one smoothing, per-doc mean.

    The smoothing denominator uses the ACTUAL kept-vocab size
    ``least(vocab_size, count(distinct token))`` — the engine's ``V`` is
    the number of tokens actually kept, not the cap."""
    V = vocab_size
    return f"""
WITH tok AS (
    SELECT {id_col} AS id, u.w AS w, u.pos AS pos
    FROM {table},
         LATERAL (
            SELECT unnest(string_split({text_col}, ' ')) AS w,
                   generate_subscripts(string_split({text_col}, ' '), 1) AS pos
         ) AS u
),
uni AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
nv AS (SELECT least({V}, count(*)) AS va FROM uni),
vocab AS (
    SELECT w, row_number() OVER (ORDER BY c DESC, w ASC) - 1 AS vid
    FROM uni
),
kept AS (SELECT w, vid FROM vocab WHERE vid < {V}),
mapped AS (
    SELECT t.id, t.pos, CAST(coalesce(k.vid, {V}) AS BIGINT) AS wid
    FROM tok t LEFT JOIN kept k USING (w)
),
big AS (
    SELECT id, pos, wid,
           lag(wid, 1, CAST({V + 1} AS BIGINT))
               OVER (PARTITION BY id ORDER BY pos) AS ctx
    FROM mapped
),
bc AS (SELECT ctx, wid, count(*) AS cb FROM big GROUP BY ctx, wid),
cc AS (SELECT ctx, sum(cb) AS c FROM bc GROUP BY ctx)
SELECT b.id AS {id_col},
       count(*) AS n_tokens,
       round(avg(ln((bc.cb + 1.0) / (cc.c + nv.va + 1))), {round_nd})
           AS lm_logprob
FROM big b
JOIN bc ON bc.ctx = b.ctx AND bc.wid = b.wid
JOIN cc ON cc.ctx = b.ctx
CROSS JOIN nv
GROUP BY b.id
ORDER BY {id_col}
"""


__all__ = [
    "BigramLm",
    "bigram_lm_fit",
    "lm_score_stage",
    "lm_perplexity_oracle_sql",
]
