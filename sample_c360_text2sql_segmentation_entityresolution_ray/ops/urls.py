"""URL canonicalization and latest-wins URL dedup.

Web-crawl corpora carry the same page under many surface forms — case
differences in the host, tracking query parameters, fragments, default
ports.  Canonicalizing before any url-keyed stage (crawl dedup, the ER
blocking keys in `stages/blocking.py`) collapses those forms; the
reference's analog is the identifier normalization its ER pipeline
applies to match keys (SURVEY §2.2 M1).

Canonical form (each rule replicated verbatim by the DuckDB oracle in
`__ray_entry__.oracle_sql()["canonical_url_dedup"]`):

1. scheme and host lowercased (path/query case preserved);
2. default port stripped (``:443`` for https, ``:80`` for http);
3. fragment (``#…``) dropped;
4. tracking query params dropped — ``utm_*``, ``fbclid``, ``gclid`` —
   and empty params; the ``?`` disappears when nothing is left.

Non-``http(s)://`` strings pass through unchanged.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

import ray.data

_URL_RE = re.compile(r"^(https?)://([^/?#]+)(.*)$", re.DOTALL | re.IGNORECASE)
_TRACKING_RE = re.compile(r"^(utm_[a-z0-9]+|fbclid|gclid)=")


def canonicalize_url(url: str) -> str:
    """Scalar canonicalizer — the single source of truth for the rules."""
    m = _URL_RE.match(url)
    if m is None:
        return url
    scheme = m.group(1).lower()
    host = m.group(2).lower()
    default_port = ":443" if scheme == "https" else ":80"
    if host.endswith(default_port):
        host = host[: -len(default_port)]
    rest = m.group(3).split("#", 1)[0]
    if "?" in rest:
        path, query = rest.split("?", 1)
        kept = [
            p for p in query.split("&") if p and not _TRACKING_RE.match(p)
        ]
        rest = path + ("?" + "&".join(kept) if kept else "")
    return f"{scheme}://{host}{rest}"


def canonicalize_batch(urls: np.ndarray) -> np.ndarray:
    """Vectorized-common-path canonicalization of an object array.

    URLs already in canonical shape (lowercase, no ``#``/``?``/port —
    the overwhelming majority of a normalized crawl) are detected with
    one vectorized regex and passed through; only the rest run the
    scalar rule chain."""
    s = pd.Series(urls, dtype=object)
    clean = s.str.match(r"^https?://[a-z0-9.\-]+/[^?#]*$", na=False)
    out = s.to_numpy(object).copy()
    dirty = np.flatnonzero(~clean.to_numpy())
    for i in dirty:
        out[i] = canonicalize_url(out[i])
    return out


def canonicalize_stage(
    ds: "ray.data.Dataset", url_col: str = "url", out_col: str = "canon_url"
) -> "ray.data.Dataset":
    """Append ``out_col`` = canonical form of ``url_col`` (task stage)."""

    def _fn(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch[out_col] = canonicalize_batch(batch[url_col].to_numpy(object))
        return batch

    return ds.map_batches(_fn, batch_format="pandas")


URL_DEDUP_PARTITIONS = 64


def url_dedup(
    ds: "ray.data.Dataset",
    url_col: str = "url",
    ts_col: str = "warc_ts",
    partitions: int = URL_DEDUP_PARTITIONS,
    driver_max_rows: int = 2_000_000,
) -> "ray.data.Dataset":
    """Latest-wins dedup by canonical URL.

    Output: ``(canon_url, n_variants, kept_url)`` — one row per
    canonical form, keeping the variant with the greatest ``ts_col``
    (crawl recency; callers must ensure distinct timestamps per group
    for a deterministic pick, as WARC capture times are).

    One hash-partition shuffle keyed on the canonical string's hash;
    the per-partition sweep is a vectorized pandas groupby (idxmax +
    size), so a partition never holds Python state per row.  Skewed
    canonical keys (a hot page captured millions of times) land whole
    in one partition — at that skew, pre-aggregate per block first
    (the groupby here is already a combiner-safe max/count shape).
    """
    canon = canonicalize_stage(ds, url_col=url_col, out_col="canon_url")

    # measured-size switch (the kmeans_fit probe pattern): materialize
    # the slim canon projection ONCE — count() on a materialized
    # dataset is metadata-free, so the plan choice costs no collect —
    # then either pull the blocks to the driver (small table; no
    # recompute, unlike a discarded limit(n+1) probe) or feed the SAME
    # materialized blocks to the partitioned path (canonicalization
    # never runs twice).  to_pandas(), NOT take_all(): Ray's per-row
    # dict conversion measures ~17x slower than the Arrow->pandas block
    # path on object-dtype url blocks (32 s vs 1.9 s at 25k rows).
    canon = canon.materialize()
    n_rows = canon.count()
    if n_rows == 0:
        import ray.data as _rd

        # empty input still carries the documented OUTPUT schema
        # (canon_url, n_variants, kept_url), not the input projection
        return _rd.from_pandas(
            pd.DataFrame(
                {
                    "canon_url": pd.Series(dtype=object),
                    "n_variants": pd.Series(dtype=np.int64),
                    "kept_url": pd.Series(dtype=object),
                }
            )
        )
    if n_rows <= driver_max_rows:
        import ray.data as _rd

        return _rd.from_pandas(_sweep_local(canon.to_pandas(), url_col, ts_col))

    def _part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_part"] = (
            pd.util.hash_pandas_object(
                batch["canon_url"], index=False
            ).to_numpy()
            % partitions
        ).astype("int32")
        return batch

    return (
        canon.map_batches(_part, batch_format="pandas")
        .groupby("_part")
        .map_groups(
            lambda g: _sweep_local(g, url_col, ts_col), batch_format="pandas"
        )
    )


def _sweep_local(
    g: pd.DataFrame, url_col: str, ts_col: str
) -> pd.DataFrame:
    """Latest-wins sweep — exact on any canon-url-complete slice (a
    hash partition, or the whole table on the driver path)."""
    gb = g.groupby("canon_url", sort=False)
    n = gb.size()
    idx = gb[ts_col].idxmax()
    return pd.DataFrame(
        {
            "canon_url": n.index.to_numpy(object),
            "n_variants": n.to_numpy(np.int64),
            "kept_url": g.loc[idx.to_numpy(), url_col].to_numpy(object),
        }
    )


def domain_stats(
    ds: "ray.data.Dataset",
    url_col: str = "url",
    lang_col: str = "lang",
) -> "ray.data.Dataset":
    """Per-domain crawl census: ``(domain, n_pages, n_langs)``.

    Two stacked combiner aggregates keep everything distributive (no
    count-distinct shuffle): (domain, lang) partial counts first, then
    per-domain sum + group count.  A hot domain ships one partial row
    per (block, lang), never its pages."""
    from .relational import grouped_aggregate

    def _extract(batch: pd.DataFrame) -> pd.DataFrame:
        dom = batch[url_col].str.extract(
            r"^https?://([^/]+)/", expand=False
        )
        return pd.DataFrame(
            {"domain": dom.to_numpy(object), lang_col: batch[lang_col]}
        )

    per_lang = grouped_aggregate(
        ds.select_columns([url_col, lang_col]).map_batches(
            _extract, batch_format="pandas"
        ),
        keys=["domain", lang_col],
        specs=[("count_star", None, "n")],
    )
    return grouped_aggregate(
        per_lang,
        keys=["domain"],
        specs=[("sum", "n", "n_pages"), ("count_star", None, "n_langs")],
    )


__all__ = [
    "canonicalize_url",
    "canonicalize_batch",
    "canonicalize_stage",
    "url_dedup",
    "domain_stats",
    "blocklist_filter",
]


# ---------------------------------------------------------------------------
# domain blocklist filter
# ---------------------------------------------------------------------------

_HOST_RE = re.compile(r"^https?://([^/:?#]+)", re.IGNORECASE)


def blocklist_filter(
    ds: "ray.data.Dataset",
    blocked,
    url_col: str = "url",
) -> "ray.data.Dataset":
    """Drop pages whose host is a blocked domain or any subdomain of
    one (dot-boundary suffix match): blocking ``alt.example.com``
    removes ``m-src3.alt.example.com`` but not ``nonalt.example.com``.

    The standard crawl-curation blocklist stage (adult/spam/SEO-farm
    host lists); the reference's analog is the anti-membership filter
    (SURVEY §2.2 M5) applied to crawl provenance instead of ids.

    ``blocked`` is an iterable of lowercase domains, or a
    ``ray.ObjectRef`` to one — for real blocklists (millions of hosts)
    ``ray.put`` the set ONCE and pass the ref so every task reads it
    zero-copy from its node's object store instead of re-shipping it
    inside the task closure per batch.

    One stateless streaming map — no shuffle; emits the surviving rows
    plus the extracted ``host`` (port/userinfo-free, lowercased).
    """
    import ray

    is_ref = isinstance(blocked, ray.ObjectRef)
    blocked_set = None if is_ref else frozenset(blocked)

    def _host_blocked(host: str, bset) -> bool:
        # walk dot-boundary suffixes: a.b.c.d → a.b.c.d, b.c.d, c.d, d
        while host:
            if host in bset:
                return True
            dot = host.find(".")
            if dot < 0:
                return False
            host = host[dot + 1 :]
        return False

    def _fn(batch: pd.DataFrame) -> pd.DataFrame:
        bset = ray.get(blocked) if is_ref else blocked_set
        hosts = (
            batch[url_col]
            .str.extract(_HOST_RE, expand=False)
            .str.lower()
            .fillna("")
        )
        # dedupe per batch: crawl batches repeat hosts heavily
        verdict = {h: _host_blocked(h, bset) for h in hosts.unique()}
        keep = ~hosts.map(verdict).to_numpy(bool)
        out = batch.loc[keep].copy()
        out["host"] = hosts[keep]
        return out

    return ds.map_batches(_fn, batch_format="pandas")
