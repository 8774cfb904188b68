"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023) over the documents table.

Selects raw-corpus documents that look like a TARGET subset (e.g.
``lang == 'en'``): fit unigram distributions p̂_target / p̂_raw over
the shared ``\\w+``-lowercase token space (the `explode_tokens` /
TF-IDF tokenizer, so the SQL oracle re-derives the same counts), then
score every document by its mean per-token log-likelihood ratio

    llr(x) = mean_t  ln p̂_tgt(t) − ln p̂_raw(t)

with add-one smoothing over the joint vocabulary, and keep the top-k
(the deterministic stand-in for the paper's Gumbel-top-k draw —
content-defined, so selection is identical across runs and cluster
sizes, matching this repo's sampling conventions in
`ops/sampling.py`).

The reference has no data-selection surface (it delegates all corpus
work to managed services); this is part of the training-data-pipeline
family the engine adds on top of SURVEY §2.

Scale shape (mirrors `ops/lm.bigram_lm_fit`):

1. ONE slim combiner exchange of ``(token, n_raw, n_tgt)`` partial
   counts — both distributions in a single pass; document text never
   crosses a shuffle.
2. The fitted table rides to scorers broadcast (``ray.put`` once) —
   capped at ``vocab_limit`` rows kept by raw count (deterministic
   tie on token); tokens beyond the cap score with smoothed zero
   counts, and the kept fraction is observable on the returned model.
   V (the smoothing denominator) is the FULL pre-cap distinct-token
   count, so capping never changes in-vocab scores.
3. Scoring is a stateless streaming map (searchsorted vocab lookup +
   reduceat, no Python per-token loop); top-k keeps ≤ k rows per
   block before the final small sort.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

import ray
import ray.data

from .relational import grouped_aggregate, topk
from .text import TOKEN_RE

VOCAB_BROADCAST_LIMIT = 2_000_000


@dataclass
class DsirModel:
    vocab_sorted: np.ndarray  # object[K], lexicographically sorted
    n_raw: np.ndarray  # int64[K], raw-corpus occurrence counts
    n_tgt: np.ndarray  # int64[K], target-subset occurrence counts
    total_raw: float  # Σ n_raw over the FULL vocab (pre-cap)
    total_tgt: float  # Σ n_tgt over the FULL vocab (pre-cap)
    v: float  # FULL distinct-token count (pre-cap)
    kept: int  # rows actually broadcast (= min(V, vocab_limit))

    def llr_of_tokens(self, toks: np.ndarray) -> np.ndarray:
        """Per-occurrence ln(p̂_tgt) − ln(p̂_raw), add-one smoothed."""
        nr = np.zeros(len(toks), np.float64)
        nt = np.zeros(len(toks), np.float64)
        if len(self.vocab_sorted) and len(toks):
            pos = np.searchsorted(self.vocab_sorted, toks)
            pos[pos == len(self.vocab_sorted)] = len(self.vocab_sorted) - 1
            hit = self.vocab_sorted[pos] == toks
            nr[hit] = self.n_raw[pos[hit]]
            nt[hit] = self.n_tgt[pos[hit]]
        return np.log((nt + 1.0) / (self.total_tgt + self.v)) - np.log(
            (nr + 1.0) / (self.total_raw + self.v)
        )


def _batch_tokens(texts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(all tokens concatenated, per-doc lengths) — ``\\w+`` on
    lowercase, the `_batch_doc_tf` tokenizer."""
    per_doc = [
        np.asarray(TOKEN_RE.findall(t.lower()), dtype=object)
        for t in texts
    ]
    lens = np.fromiter((len(p) for p in per_doc), np.int64, len(per_doc))
    toks = (
        np.concatenate([p for p in per_doc if len(p)])
        if lens.sum()
        else np.empty(0, object)
    )
    return toks, lens


def dsir_fit(
    docs: "ray.data.Dataset",
    text_col: str = "text",
    target_col: str = "lang",
    target_value: str = "en",
    vocab_limit: int = VOCAB_BROADCAST_LIMIT,
) -> "ray.ObjectRef":
    """Fit both unigram distributions in ONE combiner exchange;
    returns a ``ray.put`` handle to :class:`DsirModel`."""
    slim = docs.select_columns([text_col, target_col])

    def _partials(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[text_col].to_numpy(object)
        is_tgt = (batch[target_col] == target_value).to_numpy(bool)
        toks, lens = _batch_tokens(texts)
        if not len(toks):
            return pd.DataFrame(
                {"token": np.empty(0, object),
                 "n_raw": np.empty(0, np.int64),
                 "n_tgt": np.empty(0, np.int64)}
            )
        tgt_occ = np.repeat(is_tgt, lens)
        uniq, inv = np.unique(toks, return_inverse=True)
        nr = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        nt = np.bincount(
            inv, weights=tgt_occ.astype(np.float64), minlength=len(uniq)
        ).astype(np.int64)
        return pd.DataFrame(
            {"token": uniq.astype(object), "n_raw": nr, "n_tgt": nt}
        )

    agg = grouped_aggregate(
        slim.map_batches(_partials, batch_format="pandas"),
        keys=["token"],
        specs=[("sum", "n_raw", "n_raw"), ("sum", "n_tgt", "n_tgt")],
    ).materialize()

    v = float(agg.count())
    # totals over the FULL vocab (one tiny combiner pass), so the
    # broadcast cap never perturbs smoothing denominators
    tot = (
        agg.map_batches(
            lambda d: pd.DataFrame(
                {"_k": np.int64([0]),
                 "r": [np.int64(d["n_raw"].sum())],
                 "t": [np.int64(d["n_tgt"].sum())]}
            ),
            batch_format="pandas",
        )
        .groupby("_k")
        .sum(["r", "t"])
        .to_pandas()
    )
    total_raw = float(tot["sum(r)"].iloc[0]) if len(tot) else 0.0
    total_tgt = float(tot["sum(t)"].iloc[0]) if len(tot) else 0.0

    top = (
        agg.sort(["n_raw", "token"], descending=[True, False])
        .limit(int(vocab_limit))
        .to_pandas()
    )
    vocab = top["token"].to_numpy(object)
    order = np.argsort(vocab, kind="stable")
    return ray.put(
        DsirModel(
            vocab_sorted=vocab[order],
            n_raw=top["n_raw"].to_numpy(np.int64)[order],
            n_tgt=top["n_tgt"].to_numpy(np.int64)[order],
            total_raw=total_raw,
            total_tgt=total_tgt,
            v=v,
            kept=len(vocab),
        )
    )


def dsir_score_stage(
    docs: "ray.data.Dataset",
    model_ref: "ray.ObjectRef",
    id_col: str = "doc_id",
    text_col: str = "text",
    round_nd: int = 6,
) -> "ray.data.Dataset":
    """(id, n_tokens, llr) per document — mean per-occurrence LLR,
    0.0 for token-free documents.  Stateless streaming map."""

    def _fn(batch: pd.DataFrame) -> pd.DataFrame:
        m: DsirModel = ray.get(model_ref)
        toks, lens = _batch_tokens(batch[text_col].to_numpy(object))
        per_occ = m.llr_of_tokens(toks)
        llr = np.zeros(len(lens), np.float64)
        nz = lens > 0
        if nz.any():
            starts = np.concatenate(([0], np.cumsum(lens[nz])[:-1]))
            llr[nz] = np.add.reduceat(per_occ, starts) / lens[nz]
        out = pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(),
                "n_tokens": lens,
                "llr": np.round(llr, round_nd),
            }
        )
        return out

    return docs.select_columns([id_col, text_col]).map_batches(
        _fn, batch_format="pandas"
    )


def dsir_select(
    docs: "ray.data.Dataset",
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_col: str = "lang",
    target_value: str = "en",
    vocab_limit: int = VOCAB_BROADCAST_LIMIT,
) -> "ray.data.Dataset":
    """Top-k documents by target-likeness: fit → score → top-k on the
    ROUNDED llr (ties break on id, so engine and oracle order
    identically)."""
    ref = dsir_fit(
        docs,
        text_col=text_col,
        target_col=target_col,
        target_value=target_value,
        vocab_limit=vocab_limit,
    )
    scored = dsir_score_stage(docs, ref, id_col=id_col, text_col=text_col)
    return topk(scored, ["llr", id_col], [True, False], k)
