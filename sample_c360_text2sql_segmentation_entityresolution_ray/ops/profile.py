"""Column profiling + schema registry (SURVEY §2.2 M6/M9, §2.3 ST5).

- :func:`profile_columns` — the csvtool type sniffer
  (`csvtool/csv_to_glue_catalog.py:147-156`): per string column,
  ``is_all_integer`` (every non-null value matches ``^-?\\d+$``) and
  ``has_decimal`` (any value contains ``.``), computed as per-batch
  partials AND/OR-merged on the driver — one streaming pass, no
  collect.
- :func:`infer_type` — the deterministic core of the LLM schema
  inference (M9): STRING / BIG_INT / DOUBLE from the profile (the
  LLM naming/comment layer is out of engine scope; the type lattice
  matches `csv_to_glue_catalog.py:91,185-189` — datetimes stay STRING).
- :class:`SchemaRegistry` — table metadata + column comments, the
  Glue-Catalog-comments analog that feeds the text2sql prompt
  (`lambda/webbackend/agent_processor.py:613-753`); renders the same
  schema-block text the agent splices into its system prompt.
- :func:`annotate_table` / :func:`summarize_columns` /
  :func:`humanize_column` — the naming/description half of M9: the
  reference has an LLM write table+column descriptions into Glue
  comments (`csvtool/csv_to_glue_catalog.py:159-237`); here the same
  artifact is generated deterministically from one streaming profile
  pass (name expansion, type, null%, bounded distinct, range,
  examples) and registered so :meth:`SchemaRegistry.prompt_block`
  carries it.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

import ray.data

_INT_RE = re.compile(r"^-?\d+$")
_DEC_RE = re.compile(r"\.")
_NUM_RE = re.compile(r"^-?\d+(\.\d+)?$")


def profile_columns(ds: "ray.data.Dataset", cols: list[str]) -> dict[str, dict]:
    """{col: {is_all_integer, has_decimal, is_all_numeric, n_null}}."""
    state = {
        c: {"is_all_integer": True, "has_decimal": False,
            "is_all_numeric": True, "n_null": 0}
        for c in cols
    }

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in cols:
            s = batch[c].astype(str).where(batch[c].notna(), None)
            vals = [v for v in s if v is not None]
            rows.append(
                {
                    "col": c,
                    "all_int": all(_INT_RE.match(v) for v in vals),
                    "any_dec": any(_DEC_RE.search(v) for v in vals),
                    "all_num": all(_NUM_RE.match(v) for v in vals),
                    "n_null": int(batch[c].isna().sum()),
                }
            )
        return pd.DataFrame(rows)

    for part in ds.map_batches(_partial, batch_format="pandas").iter_rows():
        st = state[part["col"]]
        st["is_all_integer"] &= bool(part["all_int"])
        st["has_decimal"] |= bool(part["any_dec"])
        st["is_all_numeric"] &= bool(part["all_num"])
        st["n_null"] += int(part["n_null"])
    return state


def infer_type(profile: dict) -> str:
    """STRING / BIG_INT / DOUBLE per the reference's lattice."""
    if profile["is_all_integer"]:
        return "BIG_INT"
    if profile["is_all_numeric"] and profile["has_decimal"]:
        return "DOUBLE"
    return "STRING"


# --- deterministic naming/description layer (M9's second half) -------
#
# The reference feeds CSV samples to an LLM to produce table/column
# descriptions that land as Glue catalog comments and then feed the
# text2sql prompt (`csvtool/csv_to_glue_catalog.py:159-237`).  No LLM
# here: the same artifact (a one-line human-readable comment per
# column + a table description) is derived deterministically from a
# single streaming profile pass — name expansion + type + null% +
# bounded distinct count + value range + examples.

_ABBREV = {
    "id": "identifier",
    "ts": "timestamp",
    "qty": "quantity",
    "amt": "amount",
    "num": "number",
    "nbr": "number",
    "cnt": "count",
    "desc": "description",
    "addr": "address",
    "dob": "date of birth",
    "url": "URL",
    "lang": "language",
    "pct": "percent",
    "avg": "average",
    "min": "minimum",
    "max": "maximum",
}

_CAMEL_RE = re.compile(r"(?<=[a-z0-9])(?=[A-Z])")


def humanize_column(col: str) -> str:
    """``o_orderkey`` → "order key"; ``createdAt`` → "created at";
    ``cust_id`` → "customer identifier".  Deterministic stand-in for
    the LLM's column-naming step."""
    s = _CAMEL_RE.sub("_", col).lower()
    words: list[str] = []
    for w in re.split(r"[_\W]+", s):
        if not w:
            continue
        # TPC-H style single-letter table prefixes (o_, l_, c_...) drop
        if len(w) == 1 and not words and "_" in col:
            continue
        words.append(_ABBREV.get(w, w))
    # common fused prefixes: orderkey → order key, custkey → cust key
    out = []
    for w in words:
        m = re.fullmatch(r"([a-z]+?)(key|date|name|status|type|code)", w)
        if m and len(m.group(1)) >= 3:
            out.extend([m.group(1), m.group(2)])
        else:
            out.append(w)
    return " ".join(out) if out else col


def summarize_columns(
    ds: "ray.data.Dataset",
    cols: list[str] | None = None,
    distinct_cap: int = 10_000,
    n_examples: int = 3,
) -> dict[str, dict]:
    """One streaming pass → per-column stats for the comment generator:
    dtype, n_null, n_rows, distinct (exact below ``distinct_cap``, else
    reported as the cap with ``capped=True``), lo/hi, examples.  Each
    batch emits a tiny partial; the driver merges sets bounded at the
    cap — nothing unbounded ever reaches the driver."""
    if cols is None:
        cols = ds.schema().names
    state = {
        c: {"n_null": 0, "n_rows": 0, "distinct": set(), "capped": False,
            "lo": None, "hi": None, "examples": [], "dtype": None}
        for c in cols
    }

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in cols:
            s = batch[c]
            nn = s.dropna()
            uniq = nn.unique()
            lo = hi = None
            if len(nn):
                try:
                    lo, hi = nn.min(), nn.max()
                except TypeError:
                    pass
            rows.append(
                {
                    "col": c,
                    "dtype": str(s.dtype),
                    "n_null": int(s.isna().sum()),
                    "n_rows": int(len(s)),
                    "uniq": [str(v) for v in uniq[: distinct_cap]],
                    "capped": bool(len(uniq) > distinct_cap),
                    # raw values, NOT str: bound merging must compare in
                    # the column's own order (lex max("10.5","9.0")="9.0")
                    "lo": lo,
                    "hi": hi,
                    "examples": [str(v) for v in nn.iloc[:n_examples]],
                }
            )
        return pd.DataFrame(rows)

    for part in ds.map_batches(_partial, batch_format="pandas").iter_rows():
        st = state[part["col"]]
        st["dtype"] = part["dtype"]
        st["n_null"] += part["n_null"]
        st["n_rows"] += part["n_rows"]
        st["capped"] |= bool(part["capped"])
        if len(st["distinct"]) < distinct_cap:
            st["distinct"].update(part["uniq"][: distinct_cap - len(st["distinct"])])
        else:
            st["capped"] = True
        for bound, fn in (("lo", min), ("hi", max)):
            v = part[bound]
            if v is not None and not (isinstance(v, float) and v != v):
                st[bound] = v if st[bound] is None else fn(st[bound], v)
        if len(st["examples"]) < n_examples:
            st["examples"].extend(
                part["examples"][: n_examples - len(st["examples"])]
            )
    for st in state.values():
        st["n_distinct"] = len(st["distinct"])
        del st["distinct"]
        for bound in ("lo", "hi"):
            if st[bound] is not None:
                st[bound] = str(st[bound])
    return state


def _column_comment(col: str, st: dict) -> str:
    bits = [humanize_column(col)]
    if st["n_rows"]:
        null_pct = 100.0 * st["n_null"] / st["n_rows"]
        if null_pct:
            bits.append(f"{null_pct:.1f}% null")
    nd = st["n_distinct"]
    bits.append(f"{'>' if st['capped'] else ''}{nd} distinct")
    if st["lo"] is not None and not st["capped"] and nd > 1:
        lo, hi = st["lo"], st["hi"]
        if len(lo) + len(hi) <= 40:
            bits.append(f"range {lo}..{hi}")
    if st["examples"]:
        ex = ", ".join(e[:24] for e in st["examples"][:2])
        bits.append(f"e.g. {ex}")
    return "; ".join(bits)


def annotate_table(
    ds: "ray.data.Dataset",
    name: str,
    registry: "SchemaRegistry",
    description: str | None = None,
    distinct_cap: int = 10_000,
) -> "TableMeta":
    """Profile ``ds`` and register it with generated column comments +
    a table description — the deterministic analog of the reference's
    LLM cataloging step; output feeds :meth:`SchemaRegistry.prompt_block`
    exactly like Glue comments feed the agent prompt."""
    stats = summarize_columns(ds, distinct_cap=distinct_cap)
    sch = ds.schema()
    arrow_types = {n: str(t) for n, t in zip(sch.names, sch.types)}
    columns = {}
    n_rows = 0
    keyish = []
    for col, st in stats.items():
        typ = arrow_types.get(col, st["dtype"] or "string")
        columns[col] = (typ, _column_comment(col, st))
        n_rows = max(n_rows, st["n_rows"])
        if not st["capped"] and st["n_rows"] and st["n_distinct"] == st[
            "n_rows"
        ] - st["n_null"] and st["n_distinct"] > 1:
            keyish.append(col)
    if description is None:
        description = f"{n_rows} rows, {len(columns)} columns"
        if keyish:
            description += f"; unique per row: {', '.join(sorted(keyish)[:4])}"
    registry.register(name, description, columns)
    return registry._tables[name]


def extract_model_json(content: str) -> dict:
    """Pull the JSON object out of a model response — the reference's
    two-step extraction rule (`csvtool/csv_to_glue_catalog.py:219-231`)
    rebuilt behaviorally: (1) a ```json fenced block wins if it parses;
    (2) otherwise the first-``{``-to-last-``}`` span; else ValueError.
    LLMs wrap JSON in markdown fences or prose unpredictably — the
    deterministic stand-ins never do, which is why this rule only
    matters on the pluggable-model path."""
    import json as _json
    import re as _re

    m = _re.search(r"```(?:json)?\s*(\{.*?\})\s*```", content, _re.DOTALL)
    if m:
        try:
            return _json.loads(m.group(1))
        except _json.JSONDecodeError:
            pass
    start, end = content.find("{"), content.rfind("}") + 1
    if start != -1 and end > start:
        try:
            return _json.loads(content[start:end])
        except _json.JSONDecodeError:
            pass
    raise ValueError(f"no parseable JSON object in model response: {content[:200]!r}")


def annotate_table_with_model(
    ds: "ray.data.Dataset",
    name: str,
    registry: "SchemaRegistry",
    model,
    distinct_cap: int = 10_000,
) -> "TableMeta":
    """LLM-backed variant of :func:`annotate_table` — the integration
    point a production deployment plugs a real model into (the
    reference calls Bedrock with column stats + sample rows and
    parses the fenced-JSON schema reply,
    `csvtool/csv_to_glue_catalog.py:159-237`).

    ``model``: ``Callable[[str], str]`` — prompt in, raw completion
    out (fences/prose tolerated; :func:`extract_model_json` applies the
    reference's extraction rule).  Expected JSON shape, as the
    reference prompts for it::

        {"table_name": ..., "description": ...,
         "columns": [{"name":..., "type":..., "comment":...}, ...]}

    Columns missing from the reply keep the profiler's deterministic
    comment; the profiled Arrow type always wins over the model's type
    guess (the engine executes against real schemas, not guesses).
    """
    stats = summarize_columns(ds, distinct_cap=distinct_cap)
    sch = ds.schema()
    arrow_types = {n: str(t) for n, t in zip(sch.names, sch.types)}
    import json as _json

    prompt = (
        f"Analyze this table and propose a catalog entry.\n"
        f"Table: {name}\nColumns: {list(stats)}\n"
        f"Stats: {_json.dumps({c: {k: v for k, v in st.items() if k != 'examples'} for c, st in stats.items()}, default=str)}\n"
        'Reply as JSON: {"table_name": ..., "description": ..., '
        '"columns": [{"name": ..., "type": ..., "comment": ...}]}'
    )
    reply = extract_model_json(model(prompt))
    model_comments = {
        c.get("name"): c.get("comment", "")
        for c in reply.get("columns", [])
        if isinstance(c, dict)
    }
    columns = {}
    for col, st in stats.items():
        typ = arrow_types.get(col, st["dtype"] or "string")
        columns[col] = (typ, model_comments.get(col) or _column_comment(col, st))
    description = reply.get("description") or f"{max((s['n_rows'] for s in stats.values()), default=0)} rows"
    registry.register(name, description, columns)
    return registry._tables[name]


@dataclass
class TableMeta:
    name: str
    description: str = ""
    columns: dict[str, tuple[str, str]] = field(default_factory=dict)
    # columns: name -> (type, comment)


class SchemaRegistry:
    """Table/column metadata store; renders the text2sql prompt block."""

    def __init__(self):
        self._tables: dict[str, TableMeta] = {}

    def register(self, name: str, description: str = "", columns=None) -> None:
        self._tables[name] = TableMeta(name, description, dict(columns or {}))

    def tables(self) -> list[str]:
        return sorted(self._tables)

    def prompt_block(self) -> str:
        """The schema text spliced into the agent system prompt
        (`agent_processor.py:613-753` shape: table, description, then
        one line per column with type and comment)."""
        out = []
        for name in self.tables():
            t = self._tables[name]
            out.append(f"Table: {t.name}")
            if t.description:
                out.append(f"  -- {t.description}")
            for col, (typ, comment) in t.columns.items():
                line = f"  {col} {typ}"
                if comment:
                    line += f"  -- {comment}"
                out.append(line)
            out.append("")
        return "\n".join(out).rstrip()


__all__ = [
    "histogram",
    "profile_columns",
    "infer_type",
    "humanize_column",
    "summarize_columns",
    "annotate_table",
    "annotate_table_with_model",
    "extract_model_json",
    "SchemaRegistry",
    "TableMeta",
]


def histogram(
    ds: "ray.data.Dataset",
    col: str,
    bins: int = 10,
) -> "ray.data.Dataset":
    """Equi-width histogram census of a numeric column:
    ``(bucket, lo, hi, n)`` with the max value clamped into the last
    bucket — the distribution profile the column profiler (M6) reports
    alongside its scalar stats.

    Two slim passes: global min/max ride the combiner aggregate as one
    row, then bucket indices are a stateless map feeding a ≤ ``bins``-row
    grouped count.  Rows never shuffle; only (bucket, partial-count)
    pairs do."""
    from .relational import grouped_aggregate

    import pyarrow as _pa

    bounds = grouped_aggregate(
        ds.select_columns([col]).map_batches(
            lambda t: t.append_column(
                "_k", _pa.array([0] * len(t), _pa.int64())
            ),
            batch_format="pyarrow",
        ),
        keys=["_k"],
        specs=[("min", col, "_lo"), ("max", col, "_hi")],
    ).to_pandas()
    lo, hi = float(bounds["_lo"].iloc[0]), float(bounds["_hi"].iloc[0])
    width = (hi - lo) / bins if hi > lo else 1.0

    def _bucket(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch[col].to_numpy(dtype=np.float64)
        b = np.minimum(np.floor((v - lo) / width), bins - 1).astype(np.int64)
        return pd.DataFrame({"bucket": b})

    counts = grouped_aggregate(
        ds.select_columns([col]).map_batches(_bucket, batch_format="pandas"),
        keys=["bucket"],
        specs=[("count_star", None, "n")],
    ).to_pandas()
    counts = counts.sort_values("bucket").reset_index(drop=True)
    counts["lo"] = lo + counts["bucket"] * width
    counts["hi"] = lo + (counts["bucket"] + 1) * width
    import ray.data as _rd

    return _rd.from_pandas(counts[["bucket", "lo", "hi", "n"]])


# ---------------------------------------------------------------------------
# snapshot profile drift (data-quality gate between table versions)
# ---------------------------------------------------------------------------

def _snapshot_stats(
    ds: "ray.data.Dataset",
    num_cols: "list[str]",
    cat_cols: "list[str]",
) -> dict:
    """One profile snapshot: n_rows; per column n_null + exact
    n_distinct; per numeric column min/max/mean.

    Numeric moments ride ``Dataset.aggregate`` on-column (one combiner
    pass); distinct counts for ALL columns share ONE long-form
    (col, value) dedup-combiner exchange (str() of a float64 is its
    shortest unique repr, so stringified distinctness is exact) — one
    shuffle instead of one per column.  At 100 TB swap the distinct
    pass for the KMV sketch (`ops/sketch.kmv_distinct`) and the oracle
    for a tolerance check — the drift OUTPUT shape is unchanged, which
    is what downstream gates key on."""
    from ray.data.aggregate import Count, Max, Mean, Min

    from .relational import dedupe_by_key, grouped_aggregate

    all_cols = list(num_cols) + list(cat_cols)
    ds = ds.materialize()
    n_rows = ds.count()
    out = {"n_rows": n_rows, "cols": {}}
    aggs = []
    for c in num_cols:
        aggs += [Count(c, alias_name=f"cnt_{c}"), Min(c, alias_name=f"min_{c}"),
                 Max(c, alias_name=f"max_{c}"), Mean(c, alias_name=f"mean_{c}")]
    for c in cat_cols:
        aggs += [Count(c, alias_name=f"cnt_{c}")]
    agg = ds.aggregate(*aggs)

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        frames = [
            pd.DataFrame(
                {"col": c,
                 "val": df[c].dropna().unique().astype(str)}
            )
            for c in all_cols
        ]
        return pd.concat(frames, ignore_index=True)

    counts = grouped_aggregate(
        dedupe_by_key(
            ds.map_batches(_pairs, batch_format="pandas"), ["col", "val"]
        ),
        ["col"],
        [("count_star", None, "n")],
    ).to_pandas().set_index("col")["n"]
    for c in all_cols:
        st = {
            "n_null": n_rows - int(agg[f"cnt_{c}"]),
            "n_distinct": int(counts.get(c, 0)),
        }
        if c in num_cols:
            st["min"] = float(agg[f"min_{c}"])
            st["max"] = float(agg[f"max_{c}"])
            st["mean"] = float(agg[f"mean_{c}"])
        out["cols"][c] = st
    return out


def profile_drift(
    old_ds: "ray.data.Dataset",
    new_ds: "ray.data.Dataset",
    num_cols: "list[str]",
    cat_cols: "list[str]",
) -> "ray.data.Dataset":
    """Column-level drift report between two table snapshots — the
    data-quality gate a nightly load runs before publishing (schema
    drift, null-rate spikes, cardinality collapse, range shifts).

    Output: one row per (column, metric) with ``old_v`` / ``new_v``
    (float64): metrics ``n_null`` / ``n_distinct`` for every column
    plus ``min`` / ``max`` / ``mean`` for numeric ones, and one
    ``(_table_, n_rows)`` row.  Sorted by (column, metric)."""
    import ray.data as _rd

    old = _snapshot_stats(old_ds, num_cols, cat_cols)
    new = _snapshot_stats(new_ds, num_cols, cat_cols)
    rows = [
        {"column": "_table_", "metric": "n_rows",
         "old_v": float(old["n_rows"]), "new_v": float(new["n_rows"])}
    ]
    for c in sorted(num_cols + cat_cols):
        for metric in sorted(old["cols"][c]):
            rows.append(
                {
                    "column": c,
                    "metric": metric,
                    "old_v": float(old["cols"][c][metric]),
                    "new_v": float(new["cols"][c][metric]),
                }
            )
    df = pd.DataFrame(rows).sort_values(
        ["column", "metric"], kind="mergesort"
    ).reset_index(drop=True)
    return _rd.from_pandas(df)


# ---------------------------------------------------------------------------
# Order-invariant table fingerprint
# ---------------------------------------------------------------------------

_FP_MOD = (1 << 63) - 1


def table_fingerprint(
    ds: "ray.data.Dataset",
    cols: "list[str]",
    salt: str = "fp",
) -> "ray.data.Dataset":
    """ONE-row order-invariant checksum of a column projection:
    ``(n_rows, fp_xor, fp_sum)`` — the table-equality primitive for
    CDC/replication verification at 100 TB, where "did the copy land
    bit-equal?" must not cost a global sort.

    Each row hashes to the usual 60-bit md5 draw over
    ``salt || col1 || '|' || col2 ...`` (string-cast values, the same
    construction every sampler/sketch here uses, so DuckDB reproduces
    it exactly).  Combiners: XOR and SUM mod 2^63-1 of the row hashes
    plus the row count — all order- and partition-invariant, merged
    from ONE tiny partial row per block (driver fold bounded by block
    count; no shuffle at all).  XOR alone is blind to duplicate-pair
    insertion (a row added twice cancels); the modular-sum component
    and the count close that hole — equality of all three is what the
    oracle checks.
    """
    import hashlib

    import ray.data as _rd

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        parts = [df[c].to_numpy() for c in cols]
        h = np.fromiter(
            (
                int(hashlib.md5(
                    (salt + "|".join(str(v) for v in row)).encode("utf-8")
                ).hexdigest()[:15], 16)
                for row in zip(*parts)
            ),
            dtype=np.int64,
            count=len(df),
        )
        if len(h):
            x = int(np.bitwise_xor.reduce(h))
            # exact int sum without int64 overflow: split 60-bit hashes
            # into 30-bit halves (each half-sum fits int64 for any
            # realistic batch), recombine in Python ints, then mod.
            hi = int((h >> 30).sum())
            lo = int((h & np.int64((1 << 30) - 1)).sum())
            s = ((hi << 30) + lo) % _FP_MOD
        else:
            x, s = 0, 0
        return pd.DataFrame(
            {"n_rows": [np.int64(len(h))],
             "fp_xor": [np.int64(x)],
             "fp_sum": [np.int64(s)]}
        )

    partials = (
        ds.select_columns(cols)
        .map_batches(_partial, batch_format="pandas")
        .to_pandas()  # ONE row per block — bounded by block count
    )
    n = int(partials["n_rows"].sum())
    x = int(np.bitwise_xor.reduce(partials["fp_xor"].to_numpy(np.int64))) if n else 0
    s = int(partials["fp_sum"].astype(object).sum()) % _FP_MOD
    return _rd.from_pandas(
        pd.DataFrame(
            {"n_rows": [np.int64(n)],
             "fp_xor": [np.int64(x)],
             "fp_sum": [np.int64(s)]}
        )
    )


def fingerprint_oracle_sql(
    table: str, cols: "list[str]", salt: str = "fp"
) -> str:
    """DuckDB SQL producing the identical (n_rows, fp_xor, fp_sum)."""
    expr = " || '|' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
    return f"""
        WITH h AS (
            SELECT ('0x' || left(md5('{salt}' || {expr}), 15))::BIGINT AS hv
            FROM {table}
        )
        SELECT count(*) AS n_rows,
               coalesce(bit_xor(hv), 0) AS fp_xor,
               CAST(coalesce(sum(hv), 0) % 9223372036854775807 AS BIGINT)
                   AS fp_sum
        FROM h
    """


__all__ += ["table_fingerprint", "fingerprint_oracle_sql"]


def grouped_entropy(
    ds: "ray.data.Dataset",
    group: str,
    value: str,
    out_col: str = "entropy",
) -> "ray.data.Dataset":
    """Shannon entropy (bits, log2 — DuckDB ``entropy()`` convention) of
    the ``value`` distribution within each ``group``.

    Fully distributed, no driver state: one combiner shuffle builds the
    (group, value) count table, a second sums the per-group moments
    n = Σc and S = Σ c·log2(c), and H = log2(n) − S/n per group — the
    algebraic identity avoids ever needing p = c/n (and so the full
    value list) in one place.  NULL values count as a category
    (pandas groupby dropna=False); drop them upstream for DuckDB's
    ignore-NULL semantics.
    """
    from .relational import grouped_aggregate

    counts = grouped_aggregate(
        ds.select_columns([group, value]),
        [group, value],
        [("count_star", None, "_c")],
    )

    def _moments(df: pd.DataFrame) -> pd.DataFrame:
        c = df["_c"].to_numpy(np.float64)
        return pd.DataFrame({group: df[group], "_n": c, "_s": c * np.log2(c)})

    sums = grouped_aggregate(
        counts.map_batches(_moments, batch_format="pandas"),
        [group],
        [("sum", "_n", "_n"), ("sum", "_s", "_s")],
    )

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        n = df["_n"].to_numpy(np.float64)
        s = df["_s"].to_numpy(np.float64)
        return pd.DataFrame({group: df[group], out_col: np.log2(n) - s / n})

    return sums.map_batches(_final, batch_format="pandas")


def grouped_mode(
    ds: "ray.data.Dataset",
    group: str,
    value: str,
    out_col: str = "mode_value",
    partitions: int = 64,
) -> "ray.data.Dataset":
    """Deterministic mode per group: the SMALLEST ``value`` among those
    with the maximum count (DuckDB's ``mode()`` tie-break is
    unspecified; this one is reproducible and SQL-expressible).

    Scale shape: the combiner shuffle reduces rows to one per
    (group, value) — the only thing that ever re-partitions — then a
    hash-partitioned vectorized sweep (sort + drop_duplicates) picks
    each group's winner; a group's candidate set lands whole in one
    partition by construction.  Output: (group, out_col, n) with n =
    the winning count.
    """
    from .relational import grouped_aggregate

    counts = grouped_aggregate(
        ds.select_columns([group, value]),
        [group, value],
        [("count_star", None, "_c")],
    )

    def _part(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["_part"] = (
            pd.util.hash_pandas_object(df[group], index=False).to_numpy()
            % partitions
        ).astype("int32")
        return out

    def _sweep(g: pd.DataFrame) -> pd.DataFrame:
        win = (
            g.sort_values(
                [group, "_c", value],
                ascending=[True, False, True],
                kind="mergesort",
            )
            .drop_duplicates(group)
        )
        return pd.DataFrame(
            {
                group: win[group].to_numpy(),
                out_col: win[value].to_numpy(),
                "n": win["_c"].to_numpy(np.int64),
            }
        )

    return (
        counts.map_batches(_part, batch_format="pandas")
        .groupby("_part")
        .map_groups(_sweep, batch_format="pandas")
    )


__all__ += ["grouped_entropy", "grouped_mode"]


def corr_matrix(
    ds: "ray.data.Dataset",
    cols: "list[str]",
) -> "ray.data.Dataset":
    """Pearson correlation for every pair of numeric ``cols``, long form
    ``(col_a, col_b, r)`` with col_a < col_b by input order.

    One-pass raw co-moments: each batch emits ONE partial row
    (n, Σxᵢ, Σxᵢxⱼ for i ≤ j) — p(p+3)/2 + 1 floats — and the driver
    folds the O(#blocks) partial table and solves the p×p matrix.
    Rows never shuffle; nothing holds the data twice.  r = NaN for a
    zero-variance column (SQL corr() returns NULL there).

    Raw moments lose ~half the mantissa when ‖μ‖ ≫ σ; at round-6
    reporting this matches DuckDB's stable one-pass corr() on any
    non-degenerate float64 input (oracle-checked).  Columns must be
    null-free (pairwise-deletion semantics are the caller's prefilter).
    """
    p = len(cols)
    pairs = [(i, j) for i in range(p) for j in range(i, p)]

    def _partials(batch: pa.Table) -> pd.DataFrame:
        X = np.column_stack(
            [batch[c].to_numpy(zero_copy_only=False).astype(np.float64)
             for c in cols]
        )
        row = {"_n": np.float64(len(X))}
        for i in range(p):
            row[f"_s{i}"] = X[:, i].sum()
        for k, (i, j) in enumerate(pairs):
            row[f"_g{k}"] = float(X[:, i] @ X[:, j])
        return pd.DataFrame([row])

    part = ds.select_columns(cols).map_batches(
        _partials, batch_format="pyarrow"
    ).to_pandas()  # one row per block
    n = part["_n"].sum()
    s = np.array([part[f"_s{i}"].sum() for i in range(p)])
    G = np.zeros((p, p))
    for k, (i, j) in enumerate(pairs):
        G[i, j] = G[j, i] = part[f"_g{k}"].sum()
    mu = s / n
    cov = G / n - np.outer(mu, mu)
    sd = np.sqrt(np.maximum(np.diag(cov), 0.0))
    out = {"col_a": [], "col_b": [], "r": []}
    for i in range(p):
        for j in range(i + 1, p):
            denom = sd[i] * sd[j]
            out["col_a"].append(cols[i])
            out["col_b"].append(cols[j])
            out["r"].append(cov[i, j] / denom if denom > 0 else np.nan)
    return ray.data.from_pandas(pd.DataFrame(out))


__all__ += ["corr_matrix"]


def grouped_regression(
    ds: "ray.data.Dataset",
    x: str,
    y: str,
    group_cols: "list[str]",
    partitions: int | None = None,
) -> "ray.data.Dataset":
    """Per-group simple OLS of ``y`` on ``x``: slope, intercept,
    Pearson r and r² from ONE moment pass — per (block, group) partials
    (n, Σx, Σy, Σxy, Σx², Σy²) ride the combiner shuffle, the closed
    forms evaluate per group.  The grouped trend-fit a feature/QA
    pipeline runs per segment (`ops/model.py` holds the multivariate
    ridge sibling).  Zero-variance x ⇒ NaN slope/r (SQL NULL).

    Output: ``group_cols + (n int64, slope, intercept, r, r2)``.
    """
    from .relational import grouped_aggregate

    def _prep(df: pd.DataFrame) -> pd.DataFrame:
        out = df[group_cols].copy()
        xv = df[x].to_numpy(np.float64)
        yv = df[y].to_numpy(np.float64)
        out["_x"] = xv
        out["_y"] = yv
        out["_xy"] = xv * yv
        out["_xx"] = xv * xv
        out["_yy"] = yv * yv
        return out

    mom = grouped_aggregate(
        ds.select_columns(group_cols + [x, y]).map_batches(
            _prep, batch_format="pandas"
        ),
        keys=group_cols,
        specs=[
            ("count_star", None, "n"),
            ("sum", "_x", "_sx"),
            ("sum", "_y", "_sy"),
            ("sum", "_xy", "_sxy"),
            ("sum", "_xx", "_sxx"),
            ("sum", "_yy", "_syy"),
        ],
        partitions=partitions,
    )

    def _solve(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(np.float64)
        sx, sy = df["_sx"].to_numpy(), df["_sy"].to_numpy()
        sxy, sxx, syy = (
            df["_sxy"].to_numpy(), df["_sxx"].to_numpy(), df["_syy"].to_numpy()
        )
        cov = sxy / n - (sx / n) * (sy / n)
        vx = sxx / n - (sx / n) ** 2
        vy = syy / n - (sy / n) ** 2
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = np.where(vx > 0, cov / np.where(vx > 0, vx, 1.0), np.nan)
            intercept = sy / n - slope * (sx / n)
            r = np.where(
                (vx > 0) & (vy > 0),
                cov / np.sqrt(np.where(vx > 0, vx, 1.0)
                              * np.where(vy > 0, vy, 1.0)),
                np.nan,
            )
        out = df[group_cols].copy()
        out["n"] = df["n"].to_numpy(np.int64)
        out["slope"] = slope
        out["intercept"] = intercept
        out["r"] = r
        out["r2"] = r * r
        return out

    return mom.map_batches(_solve, batch_format="pandas")


def chi_squared(
    ds: "ray.data.Dataset",
    col_a: str,
    col_b: str,
    partitions: int | None = None,
) -> "ray.data.Dataset":
    """Pearson χ² independence test + Cramér's V between two
    categorical columns — ONE row ``(n, dof, chi2, cramers_v)``.

    The contingency table comes from one (a, b)-keyed combiner shuffle
    (O(cells) rows out) and the driver evaluates the zero-cell-free
    identity χ² = N·(Σ obs²/(row·col) − 1) over the observed cells —
    empty cells never materialize, so a 10⁶×10⁶ sparse cross-tab costs
    what its nonzero cells cost.  V = sqrt(χ²/(N·min(R−1, C−1))).
    """
    from .relational import grouped_aggregate

    cells = grouped_aggregate(
        ds.select_columns([col_a, col_b]),
        keys=[col_a, col_b],
        specs=[("count_star", None, "_n")],
        partitions=partitions,
    ).to_pandas()  # O(observed cells)
    n = float(cells["_n"].sum())
    row = cells.groupby(col_a)["_n"].transform("sum").to_numpy(np.float64)
    col = cells.groupby(col_b)["_n"].transform("sum").to_numpy(np.float64)
    o = cells["_n"].to_numpy(np.float64)
    s = float((o * o / (row * col)).sum())
    chi2 = n * (s - 1.0)
    nr = cells[col_a].nunique()
    nc = cells[col_b].nunique()
    dof = (nr - 1) * (nc - 1)
    v = float(np.sqrt(max(s - 1.0, 0.0) / max(min(nr - 1, nc - 1), 1)))
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "n": [np.int64(n)],
                "dof": [np.int64(dof)],
                "chi2": [chi2],
                "cramers_v": [v],
            }
        )
    )


__all__ += ["grouped_regression", "chi_squared"]


def numeric_profile(
    ds: "ray.data.Dataset", cols: "list[str]"
) -> "ray.data.Dataset":
    """Long-form per-column numeric profile — one row per column:
    ``(col, n, n_null, n_distinct, vmin, vmax, vavg)`` — the
    A4/M6 table-profile shape AS A DATASET, so the profile itself is
    oracle-checkable and can feed drift gates / catalog annotation
    (reference analog: `csvtool/csv_to_glue_catalog.py` column stats).

    Exchanges: the moments ride ONE (col,)-keyed combiner shuffle of
    ≤ |cols| partial rows per block (sum/count/min/max fold per
    batch); exact distinct counts share ONE long-form (col, value)
    dedup-combiner exchange — per-batch `unique()` pre-shrink means a
    block contributes at most its distinct values, not its rows.  At
    100 TB swap the distinct leg for `sketch.kmv_distinct` per column;
    the output shape is unchanged."""
    import numpy as np

    from .relational import dedupe_by_key, grouped_aggregate

    cols = list(cols)

    def _moments(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in cols:
            s = df[c]
            x = s.to_numpy(np.float64)
            ok = ~np.isnan(x)
            rows.append(
                {
                    "col": c,
                    "n": np.int64(len(s)),
                    "n_null": np.int64((~ok).sum()),
                    "s": float(x[ok].sum()),
                    "vmin": float(x[ok].min()) if ok.any() else np.nan,
                    "vmax": float(x[ok].max()) if ok.any() else np.nan,
                }
            )
        return pd.DataFrame(rows)

    mom = grouped_aggregate(
        ds.select_columns(cols).map_batches(_moments, batch_format="pandas"),
        ["col"],
        [
            ("sum", "n", "n"),
            ("sum", "n_null", "n_null"),
            ("sum", "s", "s"),
            ("min", "vmin", "vmin"),
            ("max", "vmax", "vmax"),
        ],
    ).to_pandas()  # ≤ one row per column

    def _pairs(df: pd.DataFrame) -> pd.DataFrame:
        frames = [
            pd.DataFrame({"col": c, "val": df[c].dropna().unique().astype(str)})
            for c in cols
        ]
        return pd.concat(frames, ignore_index=True)

    nd = (
        grouped_aggregate(
            dedupe_by_key(
                ds.select_columns(cols).map_batches(
                    _pairs, batch_format="pandas"
                ),
                ["col", "val"],
            ),
            ["col"],
            [("count_star", None, "n_distinct")],
        )
        .to_pandas()
        .set_index("col")["n_distinct"]
    )

    out = mom.copy()
    out["n_distinct"] = out["col"].map(nd).fillna(0).astype(np.int64)
    nn = (out["n"] - out["n_null"]).to_numpy(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        out["vavg"] = np.where(nn > 0, out["s"].to_numpy() / nn, np.nan)
    out = out.drop(columns=["s"])[
        ["col", "n", "n_null", "n_distinct", "vmin", "vmax", "vavg"]
    ].sort_values("col").reset_index(drop=True)
    out["n"] = out["n"].astype(np.int64)
    out["n_null"] = out["n_null"].astype(np.int64)
    return ray.data.from_pandas(out)


__all__.append("numeric_profile")


def grouped_means(
    ds: "ray.data.Dataset",
    keys: "list[str]",
    val: str,
    weight: str | None = None,
) -> "ray.data.Dataset":
    """Per-group weighted / geometric / harmonic means of the POSITIVE
    values of ``val`` — the Pythagorean-means family ratio and rate
    features need (weighted mean for size-weighted prices, geometric
    for multiplicative growth, harmonic for rate averaging), computed
    from ONE combiner pass: each batch folds to one
    (Σxw, Σw, Σln x, Σ1/x, n) partial row per (block, group), so the
    exchange ships five floats per group per block regardless of rows.

    Non-positive and NULL values are excluded from ALL THREE means
    (ln/1/x are undefined there; SQL mirrors with WHERE val > 0).
    ``weight`` of None means unit weights (wavg = arithmetic mean).
    Output: ``keys + (n, wavg, geomean, harmean)``.
    """
    import numpy as np

    from .relational import grouped_aggregate

    keys = list(keys)
    cols = keys + [val] + ([weight] if weight else [])

    def _pre(df: pd.DataFrame) -> pd.DataFrame:
        x = df[val].to_numpy(np.float64)
        ok = np.isfinite(x) & (x > 0)
        out = df.loc[ok, keys].copy()
        x = x[ok]
        w = (
            df[weight].to_numpy(np.float64)[ok]
            if weight
            else np.ones(len(x))
        )
        out["_xw"] = x * w
        out["_w"] = w
        out["_lnx"] = np.log(x)
        out["_inv"] = 1.0 / x
        return out

    agg = grouped_aggregate(
        ds.select_columns(cols).map_batches(_pre, batch_format="pandas"),
        keys,
        [
            ("count_star", None, "n"),
            ("sum", "_xw", "_sxw"),
            ("sum", "_w", "_sw"),
            ("sum", "_lnx", "_slnx"),
            ("sum", "_inv", "_sinv"),
        ],
    )

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        out = df[keys + ["n"]].copy()
        n = df["n"].to_numpy(np.float64)
        out["wavg"] = df["_sxw"].to_numpy() / df["_sw"].to_numpy()
        out["geomean"] = np.exp(df["_slnx"].to_numpy() / n)
        out["harmean"] = n / df["_sinv"].to_numpy()
        return out

    return agg.map_batches(_final, batch_format="pandas")


__all__.append("grouped_means")


def fd_census(
    ds: "ray.data.Dataset",
    pairs: "Sequence[tuple[str, str]]",
) -> "ray.data.Dataset":
    """Functional-dependency discovery census over candidate column
    pairs: for each (determinant → dependent) claim, count determinant
    values and how many of them map to MORE than one distinct dependent
    value (violations); ``holds = 1`` iff none do.  The schema-profiling
    primitive behind key detection and the M9 catalog annotations.

    ALL pairs ride ONE long-form exchange: each batch emits slim
    ``(pair, det_val, dep_val)`` string rows, a combiner groupby
    collapses them to distinct triples, a second groupby counts
    distinct dependents per determinant value, and an O(#pairs) final
    pass sums violations.  Row payloads never shuffle — only the
    stringified value pairs do."""
    from .relational import grouped_aggregate

    pairs = [tuple(p) for p in pairs]
    cols = sorted({c for p in pairs for c in p})

    def _melt(df: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for i, (det, dep) in enumerate(pairs):
            parts.append(
                pd.DataFrame(
                    {
                        "pid": np.int64(i),
                        "det": df[det].astype(str),
                        "dep": df[dep].astype(str),
                    }
                )
            )
        return pd.concat(parts, ignore_index=True)

    triples = grouped_aggregate(
        ds.select_columns(cols).map_batches(_melt, batch_format="pandas"),
        ["pid", "det", "dep"],
        [("count_star", None, "_n")],
    )
    per_det = grouped_aggregate(
        triples, ["pid", "det"], [("count_star", None, "n_dep")]
    )

    def _viol(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "pid": df["pid"],
                "one": np.int64(1),
                "viol": (df["n_dep"].to_numpy() > 1).astype(np.int64),
            }
        )

    summary = (
        grouped_aggregate(
            per_det.map_batches(_viol, batch_format="pandas"),
            ["pid"],
            [("sum", "one", "n_det_values"), ("sum", "viol", "n_violating")],
        )
        .to_pandas()
        .set_index("pid")
    )
    rows = []
    for i, (det, dep) in enumerate(pairs):
        r = summary.loc[i]
        rows.append(
            {
                "determinant": det,
                "dependent": dep,
                "n_det_values": np.int64(r["n_det_values"]),
                "n_violating": np.int64(r["n_violating"]),
                "holds": np.int64(1 if r["n_violating"] == 0 else 0),
            }
        )
    import ray.data as _rd

    return _rd.from_pandas(pd.DataFrame(rows))


def benford_census(
    ds: "ray.data.Dataset",
    col: str,
) -> "ray.data.Dataset":
    """Benford's-law first-significant-digit census of a positive
    numeric column: per digit 1..9 the observed count, observed and
    expected (log₁₀(1+1/d)) proportions, and the χ² contribution —
    the fraud/quality screen auditors run over amount columns (M6
    profiler family).

    Digit extraction is a stateless vectorized map
    (``floor(x / 10^floor(log10 x))``, bit-reproducible in SQL);
    counts cross one ≤ 9-row combiner exchange; the ≤ 9-row census
    assembles on the driver.  Non-positive values are excluded (no
    significant digit)."""
    from .relational import grouped_aggregate

    def _digit(df: pd.DataFrame) -> pd.DataFrame:
        x = df[col].to_numpy(dtype=np.float64)
        x = x[x > 0]
        d = np.floor(x / np.power(10.0, np.floor(np.log10(x))))
        return pd.DataFrame({"digit": d.astype(np.int64)})

    counts = (
        grouped_aggregate(
            ds.select_columns([col]).map_batches(
                _digit, batch_format="pandas"
            ),
            ["digit"],
            [("count_star", None, "n")],
        )
        .to_pandas()
        .sort_values("digit")
    )
    total = float(counts["n"].sum())
    d = counts["digit"].to_numpy(dtype=np.float64)
    n = counts["n"].to_numpy(dtype=np.float64)
    exp_p = np.log10(1.0 + 1.0 / d)
    exp_n = total * exp_p
    out = pd.DataFrame(
        {
            "digit": counts["digit"].to_numpy(dtype=np.int64),
            "n": counts["n"].to_numpy(dtype=np.int64),
            "observed_p": n / total,
            "expected_p": exp_p,
            "chi2_term": (n - exp_n) * (n - exp_n) / exp_n,
        }
    )
    import ray.data as _rd

    return _rd.from_pandas(out.reset_index(drop=True))


def two_sample_tests(
    ds: "ray.data.Dataset",
    value_col: str,
    group_col: str,
    group_a,
    group_b,
) -> pd.DataFrame:
    """Nonparametric two-sample comparison of ``value_col`` between
    ``group_a`` and ``group_b`` rows: Mann-Whitney U (with average
    ranks and the tie-corrected normal approximation z) and the
    two-sample Kolmogorov-Smirnov statistic D — the drift-monitoring
    pair a feature store runs between snapshots.

    Both statistics are functions of the (value, per-group count)
    census alone, so the plan is ONE slim combiner shuffle (per-batch
    pre-aggregation; the exchange carries distinct values × blocks,
    never rows) and a driver fold over the sorted distinct-value
    frame.  Intended for discrete/bucketed values (quantities, grades,
    histogram buckets): the driver fold is O(#distinct values).

    Returns one row: (n_a, n_b, u_a, z, ks_d); u_a rounds to 1
    decimal (its true value is an exact multiple of 0.5, and the
    rank-product sum carries ~1e-3 of association-order float skew at
    corpus counts), z and ks_d half-away rounded to 6."""
    from .relational import grouped_aggregate

    def _tag(df: pd.DataFrame) -> pd.DataFrame:
        g = df[group_col]
        keep = g.isin([group_a, group_b])
        d = df[keep]
        return pd.DataFrame(
            {
                "v": d[value_col],
                "ca": (d[group_col] == group_a).astype(np.int64),
                "cb": (d[group_col] == group_b).astype(np.int64),
            }
        )

    census = (
        grouped_aggregate(
            ds.select_columns([value_col, group_col]).map_batches(
                _tag, batch_format="pandas"
            ),
            ["v"],
            [("sum", "ca", "ca"), ("sum", "cb", "cb")],
        )
        .to_pandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    ca = census["ca"].to_numpy(np.float64)
    cb = census["cb"].to_numpy(np.float64)
    na, nb = ca.sum(), cb.sum()
    t = ca + cb
    cum_before = np.concatenate([[0.0], np.cumsum(t)[:-1]])
    avg_rank = cum_before + (t + 1.0) / 2.0
    r_a = (ca * avg_rank).sum()
    u_a = r_a - na * (na + 1.0) / 2.0
    n = na + nb
    tie_term = ((t**3 - t).sum()) / (n * (n - 1.0)) if n > 1 else 0.0
    var = na * nb / 12.0 * ((n + 1.0) - tie_term)
    z = (u_a - na * nb / 2.0) / np.sqrt(var) if var > 0 else 0.0
    fa = np.cumsum(ca) / na
    fb = np.cumsum(cb) / nb
    ks = float(np.abs(fa - fb).max()) if len(census) else 0.0

    def r6(x: float) -> float:
        return float(np.trunc(x * 1e6 + np.copysign(0.5, x)) / 1e6)

    u1 = float(np.trunc(u_a * 10.0 + np.copysign(0.5, u_a)) / 10.0)
    return pd.DataFrame(
        {
            "n_a": [np.int64(na)],
            "n_b": [np.int64(nb)],
            "u_a": [u1],
            "z": [r6(float(z))],
            "ks_d": [r6(ks)],
        }
    )
