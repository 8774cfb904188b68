"""Minimal SQL façade: execute a SQL string on Ray Data.

The reference's headline UX is NL→SQL over the catalog — the agent
builds a SQL string from Glue schemas and runs it on Athena
(`lambda/webbackend/agent_processor.py:613-753` system prompt,
`:836-860` agent loop + execute-query tool).  This engine supplies the
missing execution half natively: the SQL string is parsed with
DuckDB's public ``json_serialize_sql`` (parser only — DuckDB executes
nothing here) and the AST is compiled onto this repo's Ray Data
operators:

    FROM / JOIN        → pruned ``read_parquet`` + ``ops.relational.hash_join``
    WHERE              → vectorized ``map_batches`` mask
    GROUP BY / agg     → ``Dataset.groupby().aggregate`` (partial-agg shuffle)
    HAVING             → post-aggregate vectorized filter
    SELECT             → vectorized projection (scalar fns below)
    ORDER BY / LIMIT   → ``Dataset.sort`` + ``limit``
    UNION ALL          → ``Dataset.union`` (right side renamed to left names)
    SELECT DISTINCT    → ``ops.relational.distinct`` (hash-partition dedup)
    count(DISTINCT x)  → per-batch pair dedup (combiner) → hash-partition
                         dedup → grouped count, re-joined on the group key
    FROM (SELECT ...)  → recursive compile (derived tables); WITH ctes
                         compile into a scoped catalog overlay
    [NOT] IN (SELECT)  → ``ops.relational`` semi/anti join (subquery keys
                         broadcast once); scalar subqueries and
                         uncorrelated EXISTS execute once and splice in
                         as constants; correlated subqueries are
                         rejected at compile time
    fn() OVER (...)    → ``ops.window.window`` (one partition-hash
                         shuffle per distinct OVER signature):
                         row_number/rank/dense_rank/lag/lead,
                         sum/avg/min/max ROWS N PRECEDING frames, and
                         cumulative sum (ROWS semantics — include a
                         unique tiebreak in ORDER BY)

Supported scalar surface: arithmetic, comparisons, AND/OR/NOT, IN,
``||``/concat, lower/upper/trim, length, CAST, CASE, round (DuckDB
half-away-from-zero), abs, strftime, epoch, to_timestamp, and
``from_unixtime`` (the reference's Athena epoch-seconds idiom,
`lambda/webbackend/agent_processor.py:118-128`).  Aggregates: count(*),
count, sum, avg, min, max.

Column pruning happens at the read: the compiler collects every column
reference per base table and passes exactly those to the catalog
loader.  Unsupported constructs raise ``SqlUnsupported`` with the node
type — a façade that silently mis-executes would be worse than none.
"""

from __future__ import annotations

import json
from typing import Callable, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum


class SqlUnsupported(Exception):
    pass


def parse_sql(sql: str) -> dict:
    """Parse (only) via DuckDB's json_serialize_sql; returns the single
    statement's AST node."""
    import duckdb

    con = duckdb.connect()
    try:
        out = json.loads(
            con.execute("SELECT json_serialize_sql($ast$" + sql + "$ast$)").fetchone()[0]
        )
    finally:
        con.close()
    if out.get("error"):
        raise SqlUnsupported(f"parse error: {out.get('error_message')}")
    stmts = out["statements"]
    if len(stmts) != 1:
        raise SqlUnsupported("exactly one statement expected")
    return stmts[0]["node"]


# ---------------------------------------------------------------------------
# catalog
# ---------------------------------------------------------------------------

class Catalog:
    """name → (loader(columns) → Dataset, full column list)."""

    def __init__(self):
        self._loaders: dict[str, Callable] = {}
        self._columns: dict[str, list[str]] = {}
        self._rows: dict[str, int | None] = {}

    def register_parquet(self, name: str, path: str) -> None:
        import pyarrow.parquet as pq

        cols = pq.read_schema(path).names
        # footer metadata only — feeds the join planner's broadcast
        # decision without touching row data
        self._rows[name] = pq.ParquetFile(path).metadata.num_rows

        def _load(columns: Sequence[str] | None):
            return ray.data.read_parquet(
                path, columns=list(columns) if columns else None
            )

        self._loaders[name] = _load
        self._columns[name] = list(cols)

    def register_dataset(self, name: str, ds: "ray.data.Dataset") -> None:
        cols = ds.schema().names

        def _load(columns):
            return ds.select_columns(list(columns)) if columns else ds

        self._loaders[name] = _load
        self._columns[name] = list(cols)

    def columns(self, name: str) -> list[str]:
        if name not in self._columns:
            raise SqlUnsupported(f"unknown table {name!r}")
        return self._columns[name]

    def load(self, name: str, columns: Sequence[str] | None):
        return self._loaders[name](columns)

    def approx_rows(self, name: str) -> int | None:
        """Known row count (parquet footer) or None for datasets whose
        size would require execution to learn."""
        return self._rows.get(name)


# ---------------------------------------------------------------------------
# expression evaluation (vectorized, over a pandas batch)
# ---------------------------------------------------------------------------

def _sql_round_vec(x, nd):
    scale = 10.0**nd
    arr = np.asarray(x, dtype=np.float64)
    return np.trunc(arr * scale + np.copysign(0.5, arr)) / scale


_SCALARS: dict[str, Callable] = {
    "+": lambda a, b: a + b,
    "-": lambda a, b: a - b,
    "*": lambda a, b: a * b,
    "/": lambda a, b: a / b,
    "%": lambda a, b: a % b,
    "||": lambda a, b: _as_str(a) + _as_str(b),
    "concat": lambda *xs: _concat_all(xs),
    "lower": lambda a: a.str.lower(),
    "upper": lambda a: a.str.upper(),
    "trim": lambda a: a.str.strip(),
    "length": lambda a: a.str.len().astype("int64"),
    "len": lambda a: a.str.len().astype("int64"),
    "abs": lambda a: a.abs(),
    "round": lambda a, nd=0: pd.Series(
        _sql_round_vec(a, int(nd) if np.isscalar(nd) else int(nd.iloc[0])),
        index=a.index,
    ),
    "strftime": lambda ts, fmt: ts.dt.strftime(fmt),
    # normalize to ns first: pandas 2.x keeps the parquet unit (µs/s)
    "epoch": lambda ts: (ts.astype("datetime64[ns]").astype("int64") // 1_000_000_000),
    "to_timestamp": lambda s: pd.to_datetime(s, unit="s"),
    # the reference's Athena guidance for epoch-seconds columns
    "from_unixtime": lambda s: pd.to_datetime(s, unit="s"),
    "~~": lambda a, pat: a.str.fullmatch(_like_regex(pat)).fillna(False),
    "!~~": lambda a, pat: ~a.str.fullmatch(_like_regex(pat)).fillna(False),
    # ILIKE family (DuckDB serializes ILIKE as ~~*)
    "~~*": lambda a, pat: a.str.fullmatch(_like_regex(pat), case=False).fillna(False),
    "!~~*": lambda a, pat: ~a.str.fullmatch(_like_regex(pat), case=False).fillna(False),
    "like_escape": lambda a, pat, esc: a.str.fullmatch(
        _like_regex(pat, esc)
    ).fillna(False),
    "not_like_escape": lambda a, pat, esc: ~a.str.fullmatch(
        _like_regex(pat, esc)
    ).fillna(False),
    # variadic comparison family (DuckDB ignores NULL arguments)
    "greatest": lambda *xs: _greatest_least(xs, "max"),
    "least": lambda *xs: _greatest_least(xs, "min"),
    "concat_ws": lambda sep, *xs: _concat_ws(sep, xs),
    # extract(part FROM ts) serializes as date_part(part, ts)
    "date_part": lambda part, ts: _date_part(part, ts),
    "datepart": lambda part, ts: _date_part(part, ts),
    # DuckDB //: truncating division on integers, plain / on doubles
    "//": lambda a, b: _int_div(a, b),
    # INTERVAL arithmetic: `d + INTERVAL 30 DAY` serializes as
    # +(d, to_days(30)); timedelta units vectorize as Series + offset
    "to_days": lambda n: _to_td(n, "D"),
    "to_hours": lambda n: _to_td(n, "h"),
    "to_minutes": lambda n: _to_td(n, "m"),
    "to_seconds": lambda n: _to_td(n, "s"),
    "to_milliseconds": lambda n: _to_td(n, "ms"),
    "to_weeks": lambda n: _to_td(n, "W"),
    "to_months": lambda n: pd.DateOffset(months=int(n)),
    "to_years": lambda n: pd.DateOffset(years=int(n)),
    "coalesce": lambda *xs: _coalesce(*xs),
    # mask(..., None) keeps object columns None-valued (NaN in an
    # object column stringifies differently from DuckDB's None)
    "nullif": lambda a, b: (
        a.mask((a == b).fillna(False), None)
        if isinstance(a, pd.Series)
        else (None if a == b else a)
    ),
    "date_trunc": lambda part, ts: _date_trunc(part, ts),
    "year": lambda ts: ts.dt.year.astype("int64"),
    "month": lambda ts: ts.dt.month.astype("int64"),
    "day": lambda ts: ts.dt.day.astype("int64"),
    # SQL substr is 1-based; length optional
    "substr": lambda s, start, n=None: _substr(s, start, n),
    "substring": lambda s, start, n=None: _substr(s, start, n),
    # RE2-subset regex family (the reference's Athena string guidance);
    # DuckDB replaces the FIRST match unless options contain 'g'
    "regexp_replace": lambda s, pat, repl, opts=None: s.str.replace(
        pat, repl, n=(-1 if opts and "g" in opts else 1), regex=True
    ),
    "regexp_extract": lambda s, pat, group=0: _regexp_extract(s, pat, group),
    "regexp_matches": lambda s, pat: s.str.contains(pat, regex=True, na=False),
    # plain-substring string family (DuckDB semantics)
    "replace": lambda s, a, b: s.str.replace(a, b, regex=False),
    "contains": lambda s, sub: s.str.contains(sub, regex=False, na=False),
    "starts_with": lambda s, p: s.str.startswith(p).fillna(False),
    "ends_with": lambda s, p: s.str.endswith(p).fillna(False),
    "split_part": lambda s, sep, n: _split_part(s, sep, n),
    "left": lambda s, n: _left_str(s, n),
    "right": lambda s, n: _right_str(s, n),
    "reverse": lambda s: s.str[::-1],
    "repeat": lambda s, n: s.str.repeat(int(n)),
    "ltrim": lambda s: s.str.lstrip(),
    "rtrim": lambda s: s.str.rstrip(),
    "lpad": lambda s, n, p: _pad_str(s, n, p, side="l"),
    "rpad": lambda s, n, p: _pad_str(s, n, p, side="r"),
    # math family (DuckDB: log(x) is log10; ln is natural)
    "floor": lambda a: np.floor(a),
    "ceil": lambda a: np.ceil(a),
    "ceiling": lambda a: np.ceil(a),
    "sqrt": lambda a: np.sqrt(a),
    "ln": lambda a: np.log(a),
    "log": lambda a: np.log10(a),
    "log2": lambda a: np.log2(a),
    "exp": lambda a: np.exp(a),
    "pow": lambda a, b: np.power(a, b),
    "power": lambda a, b: np.power(a, b),
    # DuckDB sign returns an integer -1/0/1 regardless of input type
    "sign": lambda a: np.sign(a).astype("int64"),
    "trunc": lambda a: np.trunc(a),
}


def _split_part(s: pd.Series, sep: str, n) -> pd.Series:
    """DuckDB split_part: 1-based field index, '' when out of range."""
    n = int(n) if np.isscalar(n) else int(n.iloc[0])
    return s.str.split(sep, regex=False).str.get(n - 1).fillna("")


def _left_str(s: pd.Series, n) -> pd.Series:
    """DuckDB left: first n chars; negative n drops the last |n|."""
    n = int(n)
    return s.str[:n] if n != 0 else s.str[:0]


def _right_str(s: pd.Series, n) -> pd.Series:
    """DuckDB right: last n chars; negative n drops the first |n|."""
    n = int(n)
    return s.str[-n:] if n != 0 else s.str[:0]


def _pad_str(s: pd.Series, n, p: str, side: str) -> pd.Series:
    """DuckDB lpad/rpad: pad to length ``n`` with ``p`` (cycled),
    truncating to the FIRST n chars when already longer."""
    n = int(n)

    def f(v):
        if v is None or v != v:
            return None
        if len(v) >= n:
            return v[:n]
        pad = (p * n)[: n - len(v)]
        return pad + v if side == "l" else v + pad

    return s.map(f)


def _regexp_extract(s: pd.Series, pat: str, group) -> pd.Series:
    """DuckDB semantics: first match's group ``group`` (0 = whole
    match), '' when no match.  The pattern is wrapped in one outer
    group so original group i lands in extract-column i (and 0 is the
    wrap itself); RE2 has no backrefs, so the renumbering is safe."""
    df = s.str.extract("(" + pat + ")", expand=True)
    g = int(group if np.isscalar(group) else group.iloc[0])
    if g >= df.shape[1]:
        raise SqlUnsupported(
            f"regexp_extract group {g} out of range for pattern {pat!r}"
        )
    return df.iloc[:, g].fillna("")


def _coalesce(*xs):
    """First non-null, vectorized; scalar args broadcast to the first
    Series argument's index."""
    ser = next((x for x in xs if isinstance(x, pd.Series)), None)
    if ser is None:
        for x in xs:
            if x is not None and not (isinstance(x, float) and np.isnan(x)):
                return x
        return None
    out = xs[0] if isinstance(xs[0], pd.Series) else pd.Series(xs[0], index=ser.index)
    for x in xs[1:]:
        nxt = x if isinstance(x, pd.Series) else pd.Series(x, index=ser.index)
        out = out.where(out.notna(), nxt)
    return out


def _date_trunc(part, ts):
    p = str(part).lower()
    floors = {"day": "D", "hour": "h", "minute": "min", "second": "s"}
    if p in floors:
        return ts.dt.floor(floors[p])
    if p == "month":
        return ts.dt.to_period("M").dt.start_time
    if p == "year":
        return ts.dt.to_period("Y").dt.start_time
    if p == "week":  # ISO truncation to Monday (DuckDB semantics)
        return ts.dt.to_period("W-SUN").dt.start_time
    raise SqlUnsupported(f"date_trunc part {p!r}")


def _substr(s, start, n=None):
    b = int(start) - 1
    return s.str.slice(b, None if n is None else b + int(n))


def _like_regex(pattern: str, escape: str | None = None) -> str:
    """SQL LIKE → anchored regex (% → .*, _ → .); ``escape`` makes the
    following char literal (LIKE ... ESCAPE)."""
    import re as _re

    out = []
    it = iter(pattern)
    for ch in it:
        if escape and ch == escape:
            nxt = next(it, "")
            out.append(_re.escape(nxt))
        elif ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(_re.escape(ch))
    return "".join(out)


def _to_td(n, unit: str):
    """INTERVAL count → timedelta; vectorizes when the count is a column."""
    if isinstance(n, pd.Series):
        return pd.to_timedelta(n, unit=unit)
    return pd.to_timedelta(int(n), unit=unit)


def _greatest_least(xs, mode: str):
    """Elementwise variadic max/min, NULL args ignored (DuckDB); NULL
    only when every argument is NULL."""
    ser = next((x for x in xs if isinstance(x, pd.Series)), None)
    if ser is None:
        vals = [x for x in xs if x is not None]
        if not vals:
            return None
        return max(vals) if mode == "max" else min(vals)
    frame = pd.concat(
        [
            x if isinstance(x, pd.Series) else pd.Series([x] * len(ser), index=ser.index)
            for x in xs
        ],
        axis=1,
    )
    return frame.max(axis=1) if mode == "max" else frame.min(axis=1)


def _concat_ws(sep, xs):
    """DuckDB concat_ws: join non-NULL args with ``sep`` (NULLs skipped,
    not empty-stringed)."""
    sep = sep if isinstance(sep, str) else str(sep)
    ser = next((x for x in xs if isinstance(x, pd.Series)), None)
    if ser is None:
        return sep.join(str(x) for x in xs if x is not None)
    idx = ser.index
    out = pd.Series([""] * len(ser), index=idx)
    has = pd.Series(False, index=idx)
    for x in xs:
        c = x if isinstance(x, pd.Series) else pd.Series([x] * len(ser), index=idx)
        valid = c.notna()
        s = c.astype(str)
        out = pd.Series(
            np.where(has & valid, out + sep + s, np.where(valid, s, out)), index=idx
        )
        has = has | valid
    return out


def _date_part(part, ts: pd.Series) -> pd.Series:
    """DuckDB date_part/extract — integer parts; dow is Sunday=0,
    week is ISO; epoch is a double."""
    p = str(part).lower()
    simple = {
        "year": "year", "month": "month", "day": "day",
        "hour": "hour", "minute": "minute", "second": "second",
        "doy": "dayofyear", "dayofyear": "dayofyear", "quarter": "quarter",
    }
    if p in simple:
        return getattr(ts.dt, simple[p]).astype("int64")
    if p in ("dow", "dayofweek"):
        return ((ts.dt.dayofweek + 1) % 7).astype("int64")
    if p in ("isodow",):
        return (ts.dt.dayofweek + 1).astype("int64")
    if p in ("week", "weekofyear"):
        return ts.dt.isocalendar().week.astype("int64")
    if p == "epoch":
        return ts.astype("datetime64[ns]").astype("int64") / 1e9
    raise SqlUnsupported(f"date_part {p!r}")


def _int_div(a, b):
    """DuckDB //: integer inputs divide truncating toward zero;
    non-integer inputs behave as plain division (measured semantics)."""

    def _is_int(x):
        if isinstance(x, pd.Series):
            return x.dtype.kind in "iu"
        return isinstance(x, (int, np.integer)) and not isinstance(x, bool)

    if _is_int(a) and _is_int(b):
        r = np.trunc(
            np.asarray(a, dtype=np.float64) / np.asarray(b, dtype=np.float64)
        )
        ser = a if isinstance(a, pd.Series) else (b if isinstance(b, pd.Series) else None)
        if ser is None:
            return int(r)
        return pd.Series(r.astype(np.int64), index=ser.index)
    return a / b

_COMPARES = {
    "COMPARE_EQUAL": lambda a, b: a == b,
    "COMPARE_NOTEQUAL": lambda a, b: a != b,
    "COMPARE_LESSTHAN": lambda a, b: a < b,
    "COMPARE_LESSTHANOREQUALTO": lambda a, b: a <= b,
    "COMPARE_GREATERTHAN": lambda a, b: a > b,
    "COMPARE_GREATERTHANOREQUALTO": lambda a, b: a >= b,
}

_AGG_FNS = {"sum", "avg", "mean", "min", "max", "count", "count_star",
            "stddev", "stddev_samp", "stddev_pop", "var_samp", "variance",
            "var_pop", "median", "bool_or", "bool_and",
            "string_agg", "array_agg", "list"}
# aggregates with no Ray builtin / no distributive partial — they force
# the GROUP BY plan onto the fused partition-hash pass (exact pandas
# aggregation per co-located group); a quantile sketch is the
# approximate alternative at corpus scale (ops/sketch.py)
_PANDAS_ONLY_AGGS = {"stddev_pop", "var_samp", "variance", "var_pop", "median",
                     "string_agg", "array_agg"}


def _as_str(x):
    if isinstance(x, pd.Series):
        return x.astype(str)
    return str(x)


def _concat_all(xs):
    out = _as_str(xs[0])
    for x in xs[1:]:
        out = out + _as_str(x)
    return out


def _const_value(node: dict):
    v = node["value"]
    if v.get("is_null"):
        return None
    tid = v["type"]["id"]
    if tid == "DECIMAL":
        scale = v["type"]["type_info"]["scale"]
        return v["value"] / (10**scale)
    return v["value"]


def _struct_key(node: dict) -> str:
    """Structural identity for expressions (aggregate matching between
    select list / HAVING / ORDER BY), location fields stripped."""

    def clean(o):
        if isinstance(o, dict):
            return {
                k: clean(v)
                for k, v in o.items()
                if k not in ("location", "query_location", "alias")
            }
        if isinstance(o, list):
            return [clean(x) for x in o]
        return o

    return json.dumps(clean(node), sort_keys=True)


def _is_aggregate(node: dict) -> bool:
    return (
        node.get("class") == "FUNCTION"
        and node.get("function_name", "").lower() in _AGG_FNS
    )


def _contains_aggregate(node) -> bool:
    if isinstance(node, dict):
        if _is_aggregate(node):
            return True
        return any(_contains_aggregate(v) for v in node.values())
    if isinstance(node, list):
        return any(_contains_aggregate(x) for x in node)
    return False


def _contains_window(node) -> bool:
    if isinstance(node, dict):
        if node.get("class") == "WINDOW":
            return True
        return any(_contains_window(v) for v in node.values())
    if isinstance(node, list):
        return any(_contains_window(x) for x in node)
    return False


def _collect_windows(node, out: list) -> None:
    """Every WINDOW node (by identity, any nesting depth)."""
    if isinstance(node, dict):
        if node.get("class") == "WINDOW":
            out.append(node)
            return  # nested windows inside a window are not supported anyway
        for v in node.values():
            _collect_windows(v, out)
    elif isinstance(node, list):
        for x in node:
            _collect_windows(x, out)


def eval_expr(
    node: dict,
    df: pd.DataFrame,
    agg_cols: dict[str, str] | None = None,
    win_cols: dict[str, str] | None = None,
):
    """node → Series/scalar over ``df``.  ``agg_cols`` maps a structural
    aggregate key to its materialized column (post-GROUP BY frames);
    ``win_cols`` maps a WINDOW node's STRUCTURAL key to the column the
    window operator already computed for it (structural, not id():
    the AST is re-pickled into Ray workers, so object identity does
    not survive)."""
    cls = node.get("class")
    typ = node.get("type")
    if win_cols is not None and cls == "WINDOW":
        return df[win_cols[_struct_key(node)]]
    if agg_cols is not None and _is_aggregate(node):
        return df[agg_cols[_struct_key(node)]]
    if cls == "COLUMN_REF":
        return df[node["column_names"][-1]]
    if cls == "CONSTANT":
        return _const_value(node)
    if cls == "_PYCONST":  # spliced-in scalar-subquery / EXISTS result
        return node["py_value"]
    if cls == "_PYCOL":  # decorrelated scalar subquery: joined-in column
        return df[node["py_col"]]
    if cls == "BETWEEN" and typ == "COMPARE_BETWEEN":
        v = eval_expr(node["input"], df, agg_cols, win_cols)
        lo = eval_expr(node["lower"], df, agg_cols, win_cols)
        hi = eval_expr(node["upper"], df, agg_cols, win_cols)
        return (v >= lo) & (v <= hi)
    if cls == "COMPARISON":
        a = eval_expr(node["left"], df, agg_cols, win_cols)
        b = eval_expr(node["right"], df, agg_cols, win_cols)
        return _COMPARES[typ](a, b)
    if cls == "CONJUNCTION":
        kids = [eval_expr(c, df, agg_cols, win_cols) for c in node["children"]]
        out = kids[0]
        for k in kids[1:]:
            out = (out & k) if typ == "CONJUNCTION_AND" else (out | k)
        return out
    if cls == "OPERATOR" and typ in ("COMPARE_IN", "COMPARE_NOT_IN"):
        target = eval_expr(node["children"][0], df, agg_cols, win_cols)
        vals = [eval_expr(c, df, agg_cols, win_cols) for c in node["children"][1:]]
        mask = target.isin(vals)
        return ~mask if typ == "COMPARE_NOT_IN" else mask
    if cls == "OPERATOR" and typ == "OPERATOR_NOT":
        return ~eval_expr(node["children"][0], df, agg_cols, win_cols)
    if cls == "OPERATOR" and typ in ("OPERATOR_IS_NULL", "OPERATOR_IS_NOT_NULL"):
        v = eval_expr(node["children"][0], df, agg_cols, win_cols)
        return v.isna() if typ == "OPERATOR_IS_NULL" else v.notna()
    if cls == "OPERATOR" and typ == "OPERATOR_COALESCE":
        kids = [eval_expr(c, df, agg_cols, win_cols) for c in node["children"]]
        return _coalesce(*kids)
    if cls == "CAST":
        v = eval_expr(node["child"], df, agg_cols, win_cols)
        tid = node["cast_type"]["id"]
        if tid == "VARCHAR":
            return _as_str(v)
        if tid in ("INTEGER", "BIGINT", "SMALLINT", "TINYINT"):
            return v.astype("int64") if isinstance(v, pd.Series) else int(v)
        if tid in ("DOUBLE", "FLOAT", "DECIMAL"):
            return v.astype("float64") if isinstance(v, pd.Series) else float(v)
        raise SqlUnsupported(f"CAST to {tid}")
    if cls == "CASE":
        n = len(df)
        conds, vals = [], []
        for chk in node["case_checks"]:
            c = eval_expr(chk["when_expr"], df, agg_cols, win_cols)
            v = eval_expr(chk["then_expr"], df, agg_cols, win_cols)
            conds.append(np.asarray(c, dtype=bool))
            vals.append(np.broadcast_to(np.asarray(v, dtype=object), (n,)))
        default = eval_expr(node["else_expr"], df, agg_cols, win_cols)
        default = np.broadcast_to(np.asarray(default, dtype=object), (n,))
        out = np.select(conds, vals, default)
        return pd.Series(out, index=df.index)
    if cls == "FUNCTION":
        fn = node["function_name"].lower()
        if fn in _AGG_FNS:
            raise SqlUnsupported(f"aggregate {fn} outside GROUP BY context")
        if fn not in _SCALARS:
            raise SqlUnsupported(f"scalar function {fn}")
        args = [eval_expr(c, df, agg_cols, win_cols) for c in node.get("children", [])]
        return _SCALARS[fn](*args)
    raise SqlUnsupported(f"expression {cls}/{typ}")


# ---------------------------------------------------------------------------
# compiler
# ---------------------------------------------------------------------------

_SUPPORTED_EXPR = {
    ("COLUMN_REF", None), ("CONSTANT", None), ("COMPARISON", None),
    ("CONJUNCTION", None), ("CAST", None), ("CASE", None), ("STAR", None),
    ("OPERATOR", "COMPARE_IN"), ("OPERATOR", "COMPARE_NOT_IN"),
    ("OPERATOR", "OPERATOR_NOT"), ("OPERATOR", "OPERATOR_IS_NULL"),
    ("OPERATOR", "OPERATOR_IS_NOT_NULL"), ("OPERATOR", "OPERATOR_COALESCE"),
    ("BETWEEN", "COMPARE_BETWEEN"), ("_PYCONST", None), ("_PYCOL", None),
}


_WINDOW_RANKING = {
    "WINDOW_ROW_NUMBER": ("row_number",),
    "WINDOW_RANK": ("rank",),
    "WINDOW_DENSE_RANK": ("dense_rank",),
}
_WINDOW_ROLLING = {"sum": "rolling_sum", "avg": "rolling_mean",
                   "min": "rolling_min", "max": "rolling_max"}


def _window_spec(node: dict) -> tuple[tuple, tuple, tuple]:
    """WINDOW AST node → (partition_cols, ((order_col, desc), ...),
    ops.window spec).  Raises SqlUnsupported for anything
    ``ops.window.window`` can't express (a façade must reject, never
    mis-execute)."""
    typ = node["type"]
    if node.get("ignore_nulls") or node.get("filter_expr") or node.get(
        "distinct"
    ) or node.get("exclude_clause", "NO_OTHER") != "NO_OTHER":
        raise SqlUnsupported("window IGNORE NULLS / FILTER / DISTINCT / EXCLUDE")
    parts = []
    for p in node.get("partitions") or []:
        if p.get("class") != "COLUMN_REF":
            raise SqlUnsupported("window PARTITION BY must be column refs")
        parts.append(p["column_names"][-1])
    orders = []
    for o in node.get("orders") or []:
        e = o["expression"]
        if e.get("class") != "COLUMN_REF":
            raise SqlUnsupported("window ORDER BY must be column refs")
        orders.append((e["column_names"][-1], o["type"] == "DESCENDING"))

    def _child_col(i=0) -> str:
        ch = node.get("children") or []
        if len(ch) <= i or ch[i].get("class") != "COLUMN_REF":
            raise SqlUnsupported(f"{typ} argument must be a column ref")
        return ch[i]["column_names"][-1]

    if typ == "WINDOW_AGGREGATE":
        # frame = whole partition (UNBOUNDED..UNBOUNDED, or the default
        # RANGE CURRENT ROW with no ORDER BY — all rows are peers):
        # order-independent full-partition aggregate, the one window
        # shape that needs no ORDER BY
        fn0 = node.get("function_name", "").lower()
        start0, end0 = node.get("start"), node.get("end")
        whole = start0 == "UNBOUNDED_PRECEDING" and (
            end0 == "UNBOUNDED_FOLLOWING"
            or (end0 == "CURRENT_ROW_RANGE" and not node.get("orders"))
        )
        if whole and fn0 in ("sum", "avg", "mean", "min", "max", "count",
                             "count_star"):
            if fn0 == "count_star" or not node.get("children"):
                return tuple(parts), tuple(orders), ("part_count_star",)
            return tuple(parts), tuple(orders), (f"part_{fn0}", _child_col())
    if not node.get("orders"):
        raise SqlUnsupported("window without ORDER BY")
    if typ in _WINDOW_RANKING:
        return tuple(parts), tuple(orders), _WINDOW_RANKING[typ]
    if typ in ("WINDOW_LAG", "WINDOW_LEAD"):
        off = node.get("offset_expr")
        offset = int(_const_value(off)) if off else 1
        dflt = node.get("default_expr")
        default = _const_value(dflt) if dflt else None
        kind = "lag" if typ == "WINDOW_LAG" else "lead"
        return tuple(parts), tuple(orders), (kind, _child_col(), offset, default)
    if typ == "WINDOW_AGGREGATE":
        fn = node.get("function_name", "").lower()
        start, end = node.get("start"), node.get("end")
        if (
            fn in _WINDOW_ROLLING
            and start == "EXPR_PRECEDING_ROWS"
            and end == "CURRENT_ROW_ROWS"
        ):
            n = int(_const_value(node["start_expr"])) + 1
            return tuple(parts), tuple(orders), (
                _WINDOW_ROLLING[fn], _child_col(), n,
            )
        if fn == "sum" and start == "UNBOUNDED_PRECEDING" and end in (
            "CURRENT_ROW_RANGE", "CURRENT_ROW_ROWS",
        ):
            # ROWS semantics; diverges from SQL's RANGE default only on
            # tied order keys — pass a unique tiebreak in ORDER BY
            return tuple(parts), tuple(orders), ("cum_sum", _child_col())
        raise SqlUnsupported(f"window aggregate {fn} frame {start}..{end}")
    raise SqlUnsupported(f"window function {typ}")


def _validate_expr(node) -> None:
    """Compile-time check so unsupported SQL fails at ``execute_sql``,
    not lazily mid-stream (a façade must reject, never mis-execute)."""
    if isinstance(node, list):
        for x in node:
            _validate_expr(x)
        return
    if not isinstance(node, dict):
        return
    cls, typ = node.get("class"), node.get("type")
    if cls == "WINDOW":
        _window_spec(node)  # raises if unsupported
        return  # children/partitions/orders validated inside
    if cls == "FUNCTION":
        fn = node.get("function_name", "").lower()
        if fn not in _SCALARS and fn not in _AGG_FNS:
            raise SqlUnsupported(f"scalar function {fn}")
        if node.get("distinct") and fn not in (
            "count", "sum", "avg", "mean", "min", "max"
        ):
            raise SqlUnsupported(f"{fn}(DISTINCT ...)")
    elif cls is not None and (cls, None) not in _SUPPORTED_EXPR and (
        cls, typ
    ) not in _SUPPORTED_EXPR:
        raise SqlUnsupported(f"expression {cls}/{typ}")
    for k, v in node.items():
        if k not in ("location", "query_location"):
            _validate_expr(v)


def _collect_colrefs(node, out: list):
    if isinstance(node, dict):
        if node.get("class") == "COLUMN_REF":
            names = node["column_names"]
            out.append((names[0] if len(names) > 1 else None, names[-1]))
        for k, v in node.items():
            if k in ("subquery", "cte_map"):
                continue  # inner scopes bind their own names
            _collect_colrefs(v, out)
    elif isinstance(node, list):
        for x in node:
            _collect_colrefs(x, out)


def _split_join_condition(cond) -> tuple[list[tuple[dict, dict, dict]], list[dict]]:
    """ON clause → (equi terms as (term, left_expr, right_expr),
    residual non-equality terms).  Residuals become a post-join filter
    on INNER joins (ON ≡ WHERE there); outer joins reject them because
    ON controls null-extension, which a filter cannot reproduce."""
    pairs, residual = [], []
    for term in _split_conjuncts(cond):
        if (
            term.get("class") == "COMPARISON"
            and term["type"] == "COMPARE_EQUAL"
            and term["left"].get("class") == "COLUMN_REF"
            and term["right"].get("class") == "COLUMN_REF"
        ):
            pairs.append((term, term["left"], term["right"]))
        else:
            residual.append(term)
    return pairs, residual


def _from_all_columns(fn: dict, catalog: "Catalog") -> list[str] | None:
    """FULL (unpruned) output columns of a FROM subtree — what NATURAL
    JOIN and comma-join routing must see; None when a SELECT * derived
    table hides them."""
    t = fn.get("type")
    if t == "BASE_TABLE":
        return list(catalog.columns(fn["table_name"]))
    if t == "SUBQUERY":
        aliases = fn.get("column_name_alias") or []
        if aliases:
            return list(aliases)
        return _static_names(fn["subquery"]["node"], auto=True)
    if t == "JOIN":
        l = _from_all_columns(fn["left"], catalog)
        r = _from_all_columns(fn["right"], catalog)
        if l is None or r is None:
            return None
        return l + [c for c in r if c not in set(l)]
    return None


def _preplan_joins(fn, catalog: "Catalog", needed: dict) -> None:
    """Resolve USING(...) / NATURAL join keys before compilation: the
    key names carry no COLUMN_REF nodes, so column pruning would drop
    them — stash the resolved list on the node and force-load the keys."""
    if not isinstance(fn, dict) or fn.get("type") != "JOIN":
        return
    _preplan_joins(fn.get("left"), catalog, needed)
    _preplan_joins(fn.get("right"), catalog, needed)
    using = list(fn.get("using_columns") or [])
    if fn.get("ref_type") == "NATURAL" and not using:
        l = _from_all_columns(fn["left"], catalog)
        r = _from_all_columns(fn["right"], catalog)
        if l is None or r is None:
            raise SqlUnsupported("NATURAL JOIN over a SELECT * derived table")
        rset = set(r)
        # no shared columns: SQL says NATURAL degrades to a cross
        # product — the empty list leaves the node key-less, which the
        # compiler routes to cross_join
        using = [c for c in l if c in rset]
    if using:
        fn["_using"] = using
        for c in using:
            needed.setdefault(None, set()).add(c)


class _FromPlan:
    def __init__(
        self,
        ds,
        columns: set[str],
        quals: set[str] | None = None,
        approx_rows: int | None = None,
    ):
        self.ds = ds
        self.columns = columns
        # table names/aliases this FROM tree binds — any qualified column
        # reference outside this set is a correlated (outer) reference,
        # which the façade rejects at compile time
        self.quals = quals or set()
        # known row-count bound (parquet footer) — None for derived
        # plans; drives the auto_join broadcast decision
        self.approx_rows = approx_rows


def _compile_from(from_node, catalog: Catalog, needed: dict) -> _FromPlan:
    """needed: {qualifier-or-table: set(cols)} + {None: set(cols)}."""
    t = from_node["type"]
    if t == "BASE_TABLE":
        name = from_node["table_name"]
        alias = from_node.get("alias") or name
        avail = catalog.columns(name)
        want = set()
        for qual in (alias, name):
            want |= needed.get(qual, set())
        want |= {c for c in needed.get(None, set()) if c in avail}
        missing = want - set(avail)
        if missing:
            raise SqlUnsupported(f"columns {missing} not in table {name}")
        cols = [c for c in avail if c in want] or avail[:1]
        return _FromPlan(
            catalog.load(name, cols),
            set(cols),
            {alias, name},
            approx_rows=catalog.approx_rows(name),
        )
    if t == "SUBQUERY":  # derived table: FROM (SELECT ...) alias
        sub = _compile_select_node(from_node["subquery"]["node"], catalog)
        cols = _static_names(from_node["subquery"]["node"]) or _schema_names(sub)
        aliases = from_node.get("column_name_alias") or []
        if aliases:
            if len(aliases) != len(cols):
                raise SqlUnsupported("derived-table column alias arity")
            rename = dict(zip(cols, aliases))
            sub = sub.map_batches(
                lambda df, rename=rename: df.rename(columns=rename),
                batch_format="pandas",
            )
            cols = aliases
        return _FromPlan(sub, set(cols), {from_node.get("alias") or ""})
    if t == "JOIN":
        left = _compile_from(from_node["left"], catalog, needed)
        right = _compile_from(from_node["right"], catalog, needed)
        jt = from_node.get("join_type", "INNER")
        how = {
            "INNER": "inner",
            "LEFT": "left_outer",
            "RIGHT": "right_outer",
            "FULL": "full_outer",
        }.get(jt)
        if how is None:
            raise SqlUnsupported(f"join type {jt}")
        using = from_node.get("_using")
        cond = from_node.get("condition")
        lk, rk, residual = [], [], []
        if using:
            shared_extra = (left.columns & right.columns) - set(using)
            if shared_extra:
                raise SqlUnsupported(
                    f"USING/NATURAL join with extra same-named columns "
                    f"{sorted(shared_extra)} — alias one side"
                )
            missing = [
                c for c in using if c not in left.columns or c not in right.columns
            ]
            if missing:
                raise SqlUnsupported(f"USING column(s) {missing} not on both sides")
            lk, rk = list(using), list(using)
        elif cond is not None:
            pairs, residual = _split_join_condition(cond)
            for term, a, b in pairs:
                ca, cb = a["column_names"][-1], b["column_names"][-1]
                if ca in left.columns and cb in right.columns:
                    lk.append(ca)
                    rk.append(cb)
                elif cb in left.columns and ca in right.columns:
                    lk.append(cb)
                    rk.append(ca)
                else:  # same-side equality: it's a filter, not a key
                    residual.append(term)
            if residual and how != "inner":
                raise SqlUnsupported(
                    "outer join ON clause must be AND of cross-side equalities"
                )
        if how in ("right_outer", "full_outer") and not using:
            # column resolution is qualifier-blind: a name on both sides
            # cannot be routed (and pyarrow would coalesce/suffix it)
            shared = left.columns & right.columns
            if shared:
                raise SqlUnsupported(
                    f"{jt} JOIN with same-named columns on both sides: "
                    f"{sorted(shared)} — alias one side"
                )
        if lk:
            from ..ops.relational import auto_join

            ds = auto_join(
                left.ds,
                right.ds,
                on=tuple(lk),
                right_on=tuple(rk),
                how=how,
                left_rows=left.approx_rows,
                right_rows=right.approx_rows,
            )
        else:
            # CROSS JOIN / comma join with no routable equality (a pure
            # inequality ON lands here too: cross product + filter)
            if how != "inner":
                raise SqlUnsupported("outer join requires an equality condition")
            shared = left.columns & right.columns
            if shared:
                raise SqlUnsupported(
                    f"CROSS JOIN with same-named columns {sorted(shared)} "
                    "— alias one side"
                )
            from ..ops.relational import AUTO_BROADCAST_ROWS, cross_join

            big, small = left, right
            if (
                right.approx_rows is None or right.approx_rows > AUTO_BROADCAST_ROWS
            ) and (
                left.approx_rows is not None
                and left.approx_rows <= AUTO_BROADCAST_ROWS
            ):
                big, small = right, left
            ds = cross_join(big.ds, small.ds, small.approx_rows)
        plan = _FromPlan(
            ds, left.columns | right.columns, left.quals | right.quals
        )
        if residual:

            def _rfilt(df: pd.DataFrame, residual=residual) -> pd.DataFrame:
                mask = np.ones(len(df), dtype=bool)
                for term in residual:
                    mask &= np.asarray(eval_expr(term, df), dtype=bool)
                return df[mask]

            plan.ds = plan.ds.map_batches(_rfilt, batch_format="pandas")
        return plan
    raise SqlUnsupported(f"FROM {t}")


# ---------------------------------------------------------------------------
# subqueries
# ---------------------------------------------------------------------------
# Uncorrelated only (a correlated subquery references an outer column,
# which compiles to "unknown table/column" → SqlUnsupported — the façade
# rejects rather than mis-executes).  Three forms, three plans:
#   scalar  (x > (SELECT avg(..)))  → execute once, splice the value in
#   EXISTS                          → execute LIMIT 1, splice a boolean
#   IN / NOT IN (SELECT col ..)     → ops.relational semi/anti join
#     (right side's DISTINCT keys broadcast once via ray.put — the
#     membership list is the small side by construction)


def _from_quals(fn) -> set[str]:
    """Table names/aliases a FROM tree binds (the inner scope of a
    subquery — any OTHER qualifier inside it is a correlated outer ref)."""
    if not isinstance(fn, dict):
        return set()
    t = fn.get("type")
    if t == "BASE_TABLE":
        return {fn.get("alias") or fn["table_name"], fn["table_name"]}
    if t == "SUBQUERY":
        return {fn.get("alias") or ""}
    if t == "JOIN":
        return _from_quals(fn.get("left")) | _from_quals(fn.get("right"))
    return set()


def _is_correlated(subnode: dict) -> bool:
    """True when the subquery holds a qualified column ref bound outside
    its own FROM tree."""
    quals = _from_quals(subnode.get("from_table"))
    refs: list = []
    _collect_colrefs(subnode, refs)
    return any(q is not None and q not in quals for q, _c in refs)


def _extract_correlation(subnode: dict) -> tuple[list[str], list[str]]:
    """Pull ``inner_col = outer.col`` equality conjuncts out of the
    subquery's WHERE (the decorrelatable part), leaving the residual in
    place.  Returns (inner_key_cols, outer_cols); any remaining outer
    ref in the residual fails later with unknown-alias — the façade
    rejects rather than mis-executes."""
    quals = _from_quals(subnode.get("from_table"))
    where = subnode.get("where_clause")
    if where is None:
        return [], []

    def is_outer(c) -> bool:
        return (
            c.get("class") == "COLUMN_REF"
            and len(c["column_names"]) > 1
            and c["column_names"][0] not in quals
        )

    inner_keys, outer_cols, residual = [], [], []
    for term in _split_conjuncts(where):
        if term.get("class") == "COMPARISON" and term["type"] == "COMPARE_EQUAL":
            a, b = term["left"], term["right"]
            outer = inner = None
            if is_outer(a) and b.get("class") == "COLUMN_REF" and not is_outer(b):
                outer, inner = a, b
            elif is_outer(b) and a.get("class") == "COLUMN_REF" and not is_outer(a):
                outer, inner = b, a
            if outer is not None:
                inner_keys.append(inner["column_names"][-1])
                outer_cols.append(outer["column_names"][-1])
                continue
        residual.append(term)
    if not residual:
        subnode["where_clause"] = None
    elif len(residual) == 1:
        subnode["where_clause"] = residual[0]
    else:
        subnode["where_clause"] = {
            "class": "CONJUNCTION",
            "type": "CONJUNCTION_AND",
            "children": residual,
        }
    return inner_keys, outer_cols


def _rewrite_subquery_constants(node: dict, catalog: "Catalog") -> None:
    """Replace UNCORRELATED SCALAR/EXISTS subquery nodes (in
    select/where/having) with ``_PYCONST`` nodes, executing each
    subquery once (tiny result by definition: 1×1 or a boolean).
    Correlated ones are left for the decorrelation passes."""

    def walk(o):
        if isinstance(o, dict):
            if (
                o.get("class") == "SUBQUERY"
                and o.get("subquery_type") in ("SCALAR", "EXISTS")
                and not _is_correlated(o["subquery"]["node"])
            ):
                sub = _compile_select_node(
                    o["subquery"]["node"], catalog, auto_names=True
                )
                if o["subquery_type"] == "SCALAR":
                    rows = sub.take(2)
                    if len(rows) != 1 or len(rows[0]) != 1:
                        raise SqlUnsupported(
                            "scalar subquery must return exactly 1 row x 1 col"
                        )
                    val = next(iter(rows[0].values()))
                else:
                    val = len(sub.limit(1).take(1)) > 0
                o.clear()
                o.update({"class": "_PYCONST", "type": "_PYCONST", "py_value": val})
                return
            for v in o.values():
                walk(v)
        elif isinstance(o, list):
            for x in o:
                walk(x)

    for part in ("select_list", "where_clause", "having"):
        if node.get(part):
            walk(node[part])


def _split_conjuncts(w: dict) -> list[dict]:
    if w.get("class") == "CONJUNCTION" and w.get("type") == "CONJUNCTION_AND":
        out: list[dict] = []
        for c in w["children"]:
            out.extend(_split_conjuncts(c))
        return out
    return [w]


def _contains_class(node, cls: str) -> bool:
    if isinstance(node, dict):
        if node.get("class") == cls:
            return True
        return any(_contains_class(v, cls) for v in node.values())
    if isinstance(node, list):
        return any(_contains_class(x, cls) for x in node)
    return False


def _membership_spec(term: dict):
    """``col IN (SELECT ...)`` / ``col NOT IN (SELECT ...)`` conjunct →
    (negated, left_col, subquery_node), else None."""
    neg, t = False, term
    if (
        t.get("class") == "OPERATOR"
        and t.get("type") == "OPERATOR_NOT"
        and len(t.get("children", [])) == 1
        and t["children"][0].get("class") == "SUBQUERY"
    ):
        neg, t = True, t["children"][0]
    if (
        t.get("class") == "SUBQUERY"
        and t.get("subquery_type") == "ANY"
        and t.get("comparison_type") == "COMPARE_EQUAL"
        and t.get("child", {}).get("class") == "COLUMN_REF"
    ):
        return neg, t["child"]["column_names"][-1], t["subquery"]["node"]
    if _contains_class(t, "SUBQUERY"):
        raise SqlUnsupported(
            "subquery form (supported: scalar, EXISTS, [NOT] IN (SELECT col ...) "
            "as a top-level AND conjunct)"
        )
    return None


def _extract_memberships(node: dict) -> list[tuple[bool, str, dict]]:
    """Pull [NOT] IN (SELECT ...) conjuncts out of the WHERE clause,
    leaving the residual predicate in place."""
    where = node.get("where_clause")
    if where is None or not _contains_class(where, "SUBQUERY"):
        return []
    specs, residual = [], []
    for term in _split_conjuncts(where):
        m = _membership_spec(term)
        if m is not None:
            specs.append(m)
        else:
            residual.append(term)
    if not residual:
        node["where_clause"] = None
    elif len(residual) == 1:
        node["where_clause"] = residual[0]
    else:
        node["where_clause"] = {
            "class": "CONJUNCTION",
            "type": "CONJUNCTION_AND",
            "children": residual,
        }
    return specs


def _extract_correlated_exists(node: dict) -> list[tuple[bool, list, list, dict]]:
    """[NOT] EXISTS conjuncts whose subquery correlates via
    ``inner_col = outer.col`` equalities decorrelate to semi/anti joins
    (the classic rewrite).  Returns (negated, inner_keys, outer_cols,
    subnode) specs; the conjuncts leave the WHERE clause."""
    where = node.get("where_clause")
    if where is None or not _contains_class(where, "SUBQUERY"):
        return []
    specs, residual = [], []
    for term in _split_conjuncts(where):
        neg, t = False, term
        if (
            t.get("class") == "OPERATOR"
            and t.get("type") == "OPERATOR_NOT"
            and len(t.get("children", [])) == 1
            and t["children"][0].get("class") == "SUBQUERY"
        ):
            neg, t = True, t["children"][0]
        if t.get("class") == "SUBQUERY" and t.get("subquery_type") == "EXISTS":
            sub = t["subquery"]["node"]
            if sub.get("type") == "SELECT_NODE" and not sub.get(
                "group_expressions"
            ) and not sub.get("having"):
                ik, oc = _extract_correlation(sub)
                if ik:
                    # ORDER/LIMIT inside EXISTS can't change its truth
                    # per outer row, but a global LIMIT would corrupt
                    # the decorrelated key set — strip them
                    sub["modifiers"] = []
                    specs.append((neg, ik, oc, sub))
                    continue
        residual.append(term)
    if not specs:
        return []
    if not residual:
        node["where_clause"] = None
    elif len(residual) == 1:
        node["where_clause"] = residual[0]
    else:
        node["where_clause"] = {
            "class": "CONJUNCTION",
            "type": "CONJUNCTION_AND",
            "children": residual,
        }
    return specs


def _extract_correlated_scalars(node: dict) -> list[tuple[str, dict, list, list, bool]]:
    """Correlated scalar-aggregate subqueries in the select list / WHERE
    decorrelate to a grouped aggregate LEFT-joined on the correlation
    keys; the subquery node becomes a ``_PYCOL`` ref to the joined-in
    column.  A no-match outer row reads NULL — except count(...), which
    SQL defines as 0 over the empty group (fill_zero)."""
    specs: list = []

    def walk(o):
        if isinstance(o, dict):
            if (
                o.get("class") == "SUBQUERY"
                and o.get("subquery_type") == "SCALAR"
                and _is_correlated(o["subquery"]["node"])
            ):
                sub = o["subquery"]["node"]
                if sub.get("type") != "SELECT_NODE":
                    raise SqlUnsupported("correlated scalar set operation")
                if (
                    sub.get("group_expressions")
                    or sub.get("having")
                    or sub.get("modifiers")
                    or len(sub.get("select_list") or []) != 1
                    # a BARE aggregate: an expression around it would
                    # need empty-group evaluation (count(*)+1 over no
                    # rows is 1), which a join NULL can't reproduce
                    or not _is_aggregate(sub["select_list"][0])
                ):
                    raise SqlUnsupported(
                        "correlated scalar subquery must be a single "
                        "ungrouped bare aggregate"
                    )
                ik, oc = _extract_correlation(sub)
                if not ik:
                    raise SqlUnsupported(
                        "correlated scalar subquery needs inner=outer "
                        "equality conjuncts"
                    )
                i = len(specs)
                colname = f"_sq{i}"
                item = dict(sub["select_list"][0])
                fn0 = item.get("function_name", "").lower()
                fill_zero = fn0 in ("count", "count_star")
                specs.append((colname, sub, ik, oc, fill_zero))
                alias = o.get("alias")
                o.clear()
                o.update({"class": "_PYCOL", "type": "_PYCOL", "py_col": colname})
                if alias:
                    o["alias"] = alias
                return
            for v in o.values():
                walk(v)
        elif isinstance(o, list):
            for x in o:
                walk(x)

    for part in ("select_list", "where_clause"):
        if node.get(part):
            walk(node[part])
    return specs


def _attach_where_equalities(node: dict, catalog: "Catalog") -> None:
    """Comma joins (``FROM a, b WHERE a.k = b.k``) parse as a
    condition-less CROSS join with the equalities in WHERE: move each
    col=col WHERE conjunct into the deepest condition-less CROSS node it
    straddles, turning the cartesian product into a real equi-join.
    Safe because WHERE ≡ ON for inner joins; leftover conjuncts stay in
    WHERE."""
    where = node.get("where_clause")
    ft = node.get("from_table")
    if where is None or not isinstance(ft, dict):
        return

    def has_bare_cross(fn) -> bool:
        if not isinstance(fn, dict) or fn.get("type") != "JOIN":
            return False
        if fn.get("ref_type") == "CROSS" and fn.get("condition") is None:
            return True
        return has_bare_cross(fn.get("left")) or has_bare_cross(fn.get("right"))

    if not has_bare_cross(ft):
        return
    leftover = []
    for term in _split_conjuncts(where):
        placed = False
        if (
            term.get("class") == "COMPARISON"
            and term["type"] == "COMPARE_EQUAL"
            and term["left"].get("class") == "COLUMN_REF"
            and term["right"].get("class") == "COLUMN_REF"
        ):
            a = term["left"]["column_names"][-1]
            b = term["right"]["column_names"][-1]

            def place(fn):
                nonlocal placed
                if placed or not isinstance(fn, dict) or fn.get("type") != "JOIN":
                    return
                place(fn.get("left"))
                place(fn.get("right"))
                if (
                    placed
                    or fn.get("join_type", "INNER") != "INNER"
                    or fn.get("ref_type") != "CROSS"
                    or fn.get("using_columns")
                ):
                    return
                l = _from_all_columns(fn["left"], catalog)
                r = _from_all_columns(fn["right"], catalog)
                if l is None or r is None:
                    return
                lset, rset = set(l), set(r)
                if (a in lset and b in rset) or (b in lset and a in rset):
                    cond = fn.get("condition")
                    fn["condition"] = (
                        term
                        if cond is None
                        else {
                            "class": "CONJUNCTION",
                            "type": "CONJUNCTION_AND",
                            "children": [cond, term],
                        }
                    )
                    placed = True

            place(ft)
        if not placed:
            leftover.append(term)
    if not leftover:
        node["where_clause"] = None
    elif len(leftover) == 1:
        node["where_clause"] = leftover[0]
    else:
        node["where_clause"] = {
            "class": "CONJUNCTION",
            "type": "CONJUNCTION_AND",
            "children": leftover,
        }


def _apply_exists_join(ds, inner, on_cols, right_cols, neg: bool):
    """Decorrelated [NOT] EXISTS: semi/anti join on the correlation
    keys.  Single key uses the native broadcast-membership path;
    multi-key builds a composite string key on both sides.  Outer rows
    with a NULL key get a sentinel composite the inner side never emits
    (SQL equality with NULL matches nothing), so EXISTS drops them and
    NOT EXISTS keeps them — exactly the correlated semantics."""
    from ..ops.relational import anti_join, semi_join

    op = anti_join if neg else semi_join
    if len(on_cols) == 1:
        return op(ds, inner, on=on_cols[0], right_on=right_cols[0])

    def _ckey(df: pd.DataFrame, cols) -> pd.Series:
        key = "V\x1f" + df[cols[0]].astype(str)
        for c in cols[1:]:
            key = key + "\x1f" + df[c].astype(str)
        return key.mask(df[cols].isna().any(axis=1), "N")

    def _left(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_cek"] = _ckey(df, on_cols)
        return df

    def _right(df: pd.DataFrame) -> pd.DataFrame:
        k = _ckey(df, right_cols)
        return pd.DataFrame({"_cek": k[k != "N"]})

    out = op(
        ds.map_batches(_left, batch_format="pandas"),
        inner.map_batches(_right, batch_format="pandas"),
        on="_cek",
    )
    return out.map_batches(
        lambda df: df.drop(columns=["_cek"]), batch_format="pandas"
    )


def _output_name(item: dict, i: int, auto: bool = False) -> str:
    if item.get("alias"):
        return item["alias"]
    if item.get("class") == "COLUMN_REF":
        return item["column_names"][-1]
    if auto:  # e.g. the right side of UNION ALL: renamed positionally anyway
        return f"_c{i}"
    raise SqlUnsupported(f"select item #{i} needs an alias")


def _std_builder(col, name):
    from ray.data.aggregate import Std

    return Std(col, alias_name=name, ddof=1)


_GLOBAL_STD_FAMILY = {"stddev_pop": 0, "var_samp": 1, "variance": 1, "var_pop": 0}

_AGG_BUILDERS = {
    "sum": lambda col, name: Sum(col, alias_name=name),
    "avg": lambda col, name: Mean(col, alias_name=name),
    "mean": lambda col, name: Mean(col, alias_name=name),
    "min": lambda col, name: Min(col, alias_name=name),
    "max": lambda col, name: Max(col, alias_name=name),
    "stddev": _std_builder,
    "stddev_samp": _std_builder,
}


def _static_names(node: dict, auto: bool = False) -> list[str] | None:
    """Output column names of a select node derived from the AST alone
    (no plan execution — a branch may be legitimately empty, in which
    case ``Dataset.schema()`` probes nothing).  ``None`` for SELECT *,
    whose names come from the table."""
    if node["type"] == "SET_OPERATION_NODE":
        return _static_names(node["left"], auto)
    sl = node.get("select_list") or []
    if len(sl) == 1 and sl[0].get("class") == "STAR":
        return None
    return [_output_name(it, i, auto) for i, it in enumerate(sl)]


def _schema_names(ds: "ray.data.Dataset") -> list[str]:
    """Output column names of a compiled plan.  ``Dataset.schema()``
    probes the first block and can return ``None`` when that probe block
    is empty (a selective WHERE in a fused map chain); fall back to
    pulling one batch — even an empty pandas batch carries its column
    names."""
    s = ds.schema()
    if s is not None:
        return list(s.names)
    for b in ds.iter_batches(batch_size=None, batch_format="pandas"):
        return list(b.columns)
    raise SqlUnsupported("cannot determine set-op branch schema")


def _compile_select_node(node: dict, catalog: Catalog, auto_names: bool = False):
    if node["type"] == "SET_OPERATION_NODE":
        setop = node["setop_type"]
        setop_all = bool(node.get("setop_all"))
        if setop not in ("UNION", "EXCEPT", "INTERSECT"):
            raise SqlUnsupported(f"set operation {setop}")
        if setop_all and setop != "UNION":
            raise SqlUnsupported(f"{setop} ALL (bag semantics)")
        left = _compile_select_node(node["left"], catalog)
        right = _compile_select_node(node["right"], catalog, auto_names=True)
        lcols = _static_names(node["left"]) or _schema_names(left)
        rcols = _static_names(node["right"], auto=True) or _schema_names(right)
        if len(lcols) != len(rcols):
            raise SqlUnsupported(f"{setop} arity mismatch")
        rename = dict(zip(rcols, lcols))

        def _rn(df: pd.DataFrame) -> pd.DataFrame:
            return df.rename(columns=rename)

        right = right.map_batches(_rn, batch_format="pandas")
        if setop == "UNION" and setop_all:
            return left.union(right)
        # UNION / EXCEPT / INTERSECT (distinct semantics): one
        # combiner-shaped shuffle, see ops.relational.set_op
        from ..ops.relational import set_op

        return set_op(left, right, setop.lower(), cols=lcols)
    if node["type"] != "SELECT_NODE":
        raise SqlUnsupported(f"statement {node['type']}")

    # WITH ctes: compile each into a scoped catalog overlay (in
    # definition order, so a CTE can reference an earlier one)
    ctes = (node.get("cte_map") or {}).get("map") or []
    if ctes:
        scoped = Catalog()
        scoped._loaders = dict(catalog._loaders)
        scoped._columns = dict(catalog._columns)
        for entry in ctes:
            cds = _compile_select_node(entry["value"]["query"]["node"], scoped)
            aliases = entry["value"].get("aliases") or []
            if aliases:
                cols = list(cds.schema().names)
                if len(aliases) != len(cols):
                    raise SqlUnsupported("CTE column alias arity")
                rename = dict(zip(cols, aliases))
                cds = cds.map_batches(
                    lambda df, rename=rename: df.rename(columns=rename),
                    batch_format="pandas",
                )
            scoped.register_dataset(entry["key"], cds)
        catalog = scoped

    # subqueries: scalar/EXISTS execute once and splice in as constants;
    # [NOT] IN (SELECT ...) conjuncts become semi/anti-join stages
    _rewrite_subquery_constants(node, catalog)
    corr_exists = _extract_correlated_exists(node)
    corr_scalars = _extract_correlated_scalars(node)
    memberships = _extract_memberships(node)
    _attach_where_equalities(node, catalog)

    for part in ("select_list", "where_clause", "having", "group_expressions"):
        if node.get(part):
            _validate_expr(node[part])
    for mod in node.get("modifiers", []):
        if mod.get("type") == "ORDER_MODIFIER":
            _validate_expr([o["expression"] for o in mod["orders"]])

    refs: list = []
    _collect_colrefs(node, refs)
    needed: dict = {}
    for qual, col in refs:
        needed.setdefault(qual, set()).add(col)
    for _neg, mcol, _sub in memberships:  # join key survives pruning
        needed.setdefault(None, set()).add(mcol)
    for _neg, _ik, ocs, _sub in corr_exists:  # correlation keys too
        for c in ocs:
            needed.setdefault(None, set()).add(c)
    for _cn, _sub, _ik, ocs, _fz in corr_scalars:
        for c in ocs:
            needed.setdefault(None, set()).add(c)
    _preplan_joins(node.get("from_table"), catalog, needed)
    plan = _compile_from(node["from_table"], catalog, needed)
    unknown_quals = {q for q in needed if q is not None} - plan.quals
    if unknown_quals:
        # a qualified ref outside this FROM tree = correlated outer ref
        raise SqlUnsupported(f"unknown table alias(es) {sorted(unknown_quals)}")
    ds = plan.ds

    # decorrelated scalar aggregates join in BEFORE the WHERE filter —
    # the filter may reference their _PYCOL columns.  Subqueries sharing
    # the same source (FROM tree + residual WHERE) and correlation keys
    # fuse into ONE grouped aggregate + ONE join — the classic pattern
    # `(SELECT max(x) ...), (SELECT count(*) ...)` over the same table
    # costs one shuffle, not one per aggregate.
    fused: dict = {}
    for spec in corr_scalars:
        _cn, sub, ik, ocs, _fz = spec
        try:
            fkey = (
                json.dumps(sub.get("from_table"), sort_keys=True),
                json.dumps(sub.get("where_clause"), sort_keys=True),
                tuple(ik),
                tuple(ocs),
            )
        except TypeError:  # unserializable node — keep it unfused
            fkey = ("__unfused__", id(sub))
        fused.setdefault(fkey, []).append(spec)

    for gi, group in enumerate(fused.values()):
        _cn0, sub, ik, ocs, _fz0 = group[0]
        key_aliases = [f"_sqk{gi}_{j}" for j in range(len(ik))]
        items = []
        for colname, gsub, _ik, _ocs, _fz in group:
            item = dict(gsub["select_list"][0])
            item["alias"] = colname
            items.append(item)
        sub["select_list"] = [
            {
                "class": "COLUMN_REF",
                "type": "COLUMN_REF",
                "column_names": [k],
                "alias": ka,
            }
            for k, ka in zip(ik, key_aliases)
        ] + items
        sub["group_expressions"] = [
            {"class": "COLUMN_REF", "type": "COLUMN_REF", "column_names": [k]}
            for k in ik
        ]
        inner = _compile_select_node(sub, catalog, auto_names=True)
        # the decorrelated aggregate has one row per correlation key —
        # dimension-sized by construction.  Measure it (materialize is
        # bounded by that) and broadcast; a map-only probe avoids the
        # hash join's aggregator actors, which deadlock small clusters
        # when several correlated subqueries chain joins in one plan.
        from ..ops.relational import (
            AUTO_BROADCAST_ROWS,
            broadcast_join,
            hash_join,
        )

        inner = inner.materialize()
        if inner.count() <= AUTO_BROADCAST_ROWS:
            ds = broadcast_join(
                ds, inner, on=tuple(ocs), right_on=tuple(key_aliases),
                how="left_outer",
            )
        else:
            ds = hash_join(
                ds, inner, on=tuple(ocs), right_on=tuple(key_aliases),
                how="left_outer",
            )
        # pandas-merge keeps differently-named right keys; Ray's join
        # consumes them — normalize by dropping either way
        zero_cols = [cn for cn, _s, _i, _o, fz in group if fz]

        def _post(df: pd.DataFrame, ka=key_aliases, zc=zero_cols) -> pd.DataFrame:
            df = df.drop(columns=[c for c in ka if c in df.columns])
            if zc:  # SQL: count over an empty group is 0, not NULL
                df = df.copy()
                for c in zc:
                    df[c] = df[c].fillna(0).astype("int64")
            return df

        ds = ds.map_batches(_post, batch_format="pandas")

    where = node.get("where_clause")
    if where:
        from .arrow_eval import arrow_ok, eval_expr_arrow

        if arrow_ok(where, "bool"):
            # Arrow-native predicate: zero-copy batch in, pc kernels,
            # no pandas round-trip.  Runtime fallback re-runs the batch
            # through the pandas evaluator on any kernel/type-dispatch
            # error (thrown errors are safe; see sql/arrow_eval.py).
            def _filt_a(t: pa.Table, w=where) -> pa.Table:
                try:
                    return t.filter(eval_expr_arrow(w, t))
                except Exception:
                    df = t.to_pandas()
                    out = df[np.asarray(eval_expr(w, df), dtype=bool)]
                    return pa.Table.from_pandas(out, preserve_index=False)

            ds = ds.map_batches(_filt_a, batch_format="pyarrow")
        else:
            def _filt(df: pd.DataFrame) -> pd.DataFrame:
                return df[np.asarray(eval_expr(where, df), dtype=bool)]

            ds = ds.map_batches(_filt, batch_format="pandas")

    if memberships:
        from ..ops.relational import anti_join, semi_join

        for neg, mcol, subnode in memberships:
            sub_ds = _compile_select_node(subnode, catalog, auto_names=True)
            sub_cols = sub_ds.schema().names
            if len(sub_cols) != 1:
                raise SqlUnsupported("IN (SELECT ...) must select a single column")
            # NOT IN compiled as anti-join: two-valued logic (a NULL in
            # the subquery result would make SQL's NOT IN return no rows)
            op = anti_join if neg else semi_join
            ds = op(ds, sub_ds, on=mcol, right_on=sub_cols[0])

    for i, (neg, ik, ocs, sub) in enumerate(corr_exists):
        key_aliases = [f"_ek{i}_{j}" for j in range(len(ik))]
        sub["select_list"] = [
            {
                "class": "COLUMN_REF",
                "type": "COLUMN_REF",
                "column_names": [k],
                "alias": ka,
            }
            for k, ka in zip(ik, key_aliases)
        ]
        inner = _compile_select_node(sub, catalog, auto_names=True)
        ds = _apply_exists_join(ds, inner, ocs, key_aliases, neg)

    if corr_scalars and (
        len(node["select_list"]) == 1
        and node["select_list"][0].get("class") == "STAR"
    ):
        # SELECT * must not leak the joined-in _sq columns (they were
        # only referenced from WHERE)
        sq_cols = [cn for cn, *_rest in corr_scalars]

        def _dropsq(df: pd.DataFrame, sq=sq_cols) -> pd.DataFrame:
            return df.drop(columns=[c for c in sq if c in df.columns])

        ds = ds.map_batches(_dropsq, batch_format="pandas")

    select_list = node["select_list"]
    group_exprs = node.get("group_expressions", [])

    # SQL name scoping: GROUP BY / HAVING / ORDER BY may reference select
    # ALIASES (and GROUP BY/ORDER BY 1-based ordinals).  Aliases resolve
    # to their expressions here, at compile time — an input column of the
    # same name wins, per SQL.  Without this the alias name would reach a
    # worker as a missing-column KeyError.
    import copy as _copy

    alias_map = {
        it["alias"]: it
        for it in select_list
        if it.get("alias") and not _contains_window(it)
    }
    input_cols = plan.columns

    def _sub_aliases(e):
        if isinstance(e, dict):
            if e.get("class") == "COLUMN_REF":
                nm = e["column_names"][-1]
                if (
                    len(e["column_names"]) == 1
                    and nm not in input_cols
                    and nm in alias_map
                ):
                    return _copy.deepcopy(alias_map[nm])
                return e
            return {
                k: (v if k in ("location", "query_location") else _sub_aliases(v))
                for k, v in e.items()
            }
        if isinstance(e, list):
            return [_sub_aliases(x) for x in e]
        return e

    if group_exprs:
        resolved_groups = []
        for g in group_exprs:
            if g.get("class") == "CONSTANT":
                v = _const_value(g)
                if not isinstance(v, (int, np.integer)) or not (
                    1 <= v <= len(select_list)
                ):
                    raise SqlUnsupported("GROUP BY ordinal out of range")
                g = select_list[int(v) - 1]
            else:
                g = _sub_aliases(g)
            if (
                g.get("class") == "STAR"
                or _contains_aggregate(g)
                or _contains_window(g)
            ):
                raise SqlUnsupported("GROUP BY target must be a plain expression")
            resolved_groups.append(g)
        group_exprs = resolved_groups
    if node.get("having"):
        node["having"] = _sub_aliases(node["having"])

    has_agg = any(_contains_aggregate(x) for x in select_list) or bool(
        node.get("having")
    )

    # ORDER BY resolution: each order item becomes (col, desc, nulls_first)
    # where col is an output column (direct ref or 1-based ordinal) or a
    # hidden `_ord{i}` column computed from the item's EXPRESSION over the
    # pre-projection scope (SQL's ORDER BY sees input columns, so
    # `SELECT a FROM t ORDER BY b * 2` must evaluate b before projection
    # drops it).  Aggregate expressions (ORDER BY count(*)) ride the same
    # hidden-column path through the aggregate frame.
    order_mod = next(
        (m for m in node.get("modifiers", []) if m["type"] == "ORDER_MODIFIER"),
        None,
    )
    order_keys: list[tuple[str, bool, bool]] = []
    hidden_orders: list[tuple[str, dict]] = []
    if order_mod is not None:
        out_names = _static_names(node, auto_names)
        for i, o in enumerate(order_mod["orders"]):
            e = o["expression"]
            desc = o["type"] == "DESCENDING"
            nfirst = o.get("null_order") == "NULLS_FIRST"
            col = None
            if e.get("class") == "CONSTANT":
                v = _const_value(e)
                if (
                    not isinstance(v, (int, np.integer))
                    or out_names is None
                    or not (1 <= v <= len(out_names))
                ):
                    raise SqlUnsupported("ORDER BY ordinal out of range")
                col = out_names[int(v) - 1]
            elif e.get("class") == "COLUMN_REF":
                nm = e["column_names"][-1]
                if out_names is None or nm in out_names:
                    col = nm
            if col is None:
                col = f"_ord{i}"
                hidden_orders.append((col, _sub_aliases(e)))
            order_keys.append((col, desc, nfirst))
    if hidden_orders and any(
        m["type"] == "DISTINCT_MODIFIER" for m in node.get("modifiers", [])
    ):
        # SQL itself requires DISTINCT's ORDER BY exprs in the select list
        raise SqlUnsupported("SELECT DISTINCT with ORDER BY expression")

    # window functions: anywhere in a select expression (the computed
    # column is spliced back in via ``win_cols``); never in
    # WHERE/HAVING or mixed with GROUP BY — compile-time rejection
    win_nodes: list = []
    _collect_windows(select_list, win_nodes)
    if _contains_window(node.get("where_clause")) or _contains_window(
        node.get("having")
    ):
        raise SqlUnsupported("window function in WHERE/HAVING")
    # QUALIFY filters on window results: resolve select aliases (the
    # common `QUALIFY rn = 1` form — the alias IS a window expr, so use
    # the unrestricted alias map) and collect its windows alongside the
    # select list's so they share the same shuffle signatures
    qualify = node.get("qualify")
    if qualify is not None:
        if group_exprs or has_agg:
            raise SqlUnsupported("QUALIFY with GROUP BY/aggregates")
        full_alias_map = {
            it["alias"]: it for it in select_list if it.get("alias")
        }

        def _sub_full(e):
            if isinstance(e, dict):
                if e.get("class") == "COLUMN_REF":
                    nm = e["column_names"][-1]
                    if (
                        len(e["column_names"]) == 1
                        and nm not in input_cols
                        and nm in full_alias_map
                    ):
                        return _copy.deepcopy(full_alias_map[nm])
                    return e
                return {
                    k: (v if k in ("location", "query_location") else _sub_full(v))
                    for k, v in e.items()
                }
            if isinstance(e, list):
                return [_sub_full(x) for x in e]
            return e

        qualify = _sub_full(qualify)
        _validate_expr(qualify)
        _collect_windows(qualify, win_nodes)
    win_cols: dict[str, str] = {}
    if win_nodes:
        if group_exprs or has_agg:
            raise SqlUnsupported("window functions mixed with GROUP BY/aggregates")
        from ..ops.window import window as _window_op

        sig_groups: dict[tuple, dict] = {}
        for i, w in enumerate(win_nodes):
            parts, orders, spec = _window_spec(w)
            wk = _struct_key(w)
            if wk in win_cols:
                continue  # structurally identical window: reuse its column
            win_cols[wk] = f"_w{i}"
            sig_groups.setdefault((parts, orders), {})[f"_w{i}"] = spec
        # one partition-hash shuffle per distinct OVER signature
        for (parts, orders), specs in sig_groups.items():
            ds = _window_op(ds, list(parts), list(orders), specs)

    if qualify is not None:
        from .arrow_eval import arrow_ok as _aok
        from .arrow_eval import eval_expr_arrow as _aeval

        if _aok(qualify, "bool", has_windows=True):
            # QUALIFY filters the FULL windowed table (often rank <= N
            # over a fact stream) — same Arrow path as WHERE; window
            # nodes resolve to their computed columns
            def _qfilt_a(t: pa.Table, q=qualify) -> pa.Table:
                try:
                    return t.filter(_aeval(q, t, win_cols or None))
                except Exception:
                    df = t.to_pandas()
                    out = df[
                        np.asarray(
                            eval_expr(q, df, win_cols=win_cols or None),
                            dtype=bool,
                        )
                    ]
                    return pa.Table.from_pandas(out, preserve_index=False)

            ds = ds.map_batches(_qfilt_a, batch_format="pyarrow")
        else:
            def _qfilt(df: pd.DataFrame, q=qualify) -> pd.DataFrame:
                return df[
                    np.asarray(eval_expr(q, df, win_cols=win_cols or None), dtype=bool)
                ]

            ds = ds.map_batches(_qfilt, batch_format="pandas")

    if group_exprs or has_agg:
        group_sets = node.get("group_sets") or []
        if len(group_sets) > 1:
            if hidden_orders:
                raise SqlUnsupported("ORDER BY expression over GROUPING SETS")
            ds = _compile_grouping_sets(
                node, ds, select_list, group_exprs, group_sets, auto_names
            )
        else:
            ds = _compile_aggregate(
                node, ds, select_list, group_exprs, auto_names, hidden_orders
            )
    else:
        if len(select_list) == 1 and select_list[0].get("class") == "STAR":
            if hidden_orders:  # SELECT *: append the order columns only

                def _aug(df: pd.DataFrame) -> pd.DataFrame:
                    df = df.copy()
                    for hname, he in hidden_orders:
                        v = eval_expr(he, df, win_cols=win_cols or None)
                        df[hname] = (
                            v if isinstance(v, pd.Series) else pd.Series([v] * len(df), index=df.index)
                        )
                    return df

                ds = ds.map_batches(_aug, batch_format="pandas")
        else:
            names = [_output_name(it, i, auto_names) for i, it in enumerate(select_list)]

            def _proj(df: pd.DataFrame) -> pd.DataFrame:
                out = {}
                for name, it in zip(names, select_list):
                    v = eval_expr(it, df, win_cols=win_cols or None)
                    if not isinstance(v, pd.Series):
                        v = pd.Series([v] * len(df), index=df.index)
                    out[name] = v
                # hidden ORDER BY expressions see the input scope
                for hname, he in hidden_orders:
                    v = eval_expr(he, df, win_cols=win_cols or None)
                    out[hname] = (
                        v if isinstance(v, pd.Series) else pd.Series([v] * len(df), index=df.index)
                    )
                return pd.DataFrame(out)

            from .arrow_eval import arrow_ok, as_column, eval_expr_arrow

            hw = bool(win_cols)
            if all(arrow_ok(it, "value", hw) for it in select_list) and all(
                arrow_ok(he, "value", hw) for _h, he in hidden_orders
            ):
                # Arrow-native projection (see the WHERE site note)
                def _proj_a(t: pa.Table) -> pa.Table:
                    try:
                        n = t.num_rows
                        cols = {}
                        for name, it in zip(names, select_list):
                            cols[name] = as_column(
                                eval_expr_arrow(it, t, win_cols or None), n
                            )
                        for hname, he in hidden_orders:
                            cols[hname] = as_column(
                                eval_expr_arrow(he, t, win_cols or None), n
                            )
                        return pa.table(cols)
                    except Exception:
                        return pa.Table.from_pandas(
                            _proj(t.to_pandas()), preserve_index=False
                        )

                ds = ds.map_batches(_proj_a, batch_format="pyarrow")
            else:
                ds = ds.map_batches(_proj, batch_format="pandas")

    mods = node.get("modifiers", [])
    skip_next_limit = False
    for mi, mod in enumerate(mods):
        if mod["type"] == "ORDER_MODIFIER":
            # NULLS FIRST deviates from the shared default (Ray sort,
            # the fused top-k, and DuckDB all place NULLs last): a
            # hidden is-null indicator sorted descending ahead of its
            # key implements it on both sort paths
            ind_cols: list[tuple[str, str]] = []
            keys, desc = [], []
            for k, d, nfirst in order_keys:
                if nfirst:
                    ind = f"_isnull_{k}"
                    ind_cols.append((ind, k))
                    keys.append(ind)
                    desc.append(True)
                keys.append(k)
                desc.append(d)
            if ind_cols:

                def _ind(df: pd.DataFrame, ind_cols=ind_cols) -> pd.DataFrame:
                    df = df.copy()
                    for ind, c in ind_cols:
                        df[ind] = df[c].isna().astype("int8")
                    return df

                ds = ds.map_batches(_ind, batch_format="pandas")
            # ORDER BY immediately followed by a small LIMIT [OFFSET]
            # fuses into the shuffle-free partial top-k (per-block head
            # + bounded driver combine) instead of a full sort; OFFSET
            # is exact here because the order is total at the combine
            nlim = noff = None
            if mi + 1 < len(mods) and mods[mi + 1]["type"] == "LIMIT_MODIFIER":
                nxt = mods[mi + 1]
                nlim = (
                    int(_const_value(nxt["limit"])) if nxt.get("limit") else None
                )
                noff = (
                    int(_const_value(nxt["offset"])) if nxt.get("offset") else 0
                )
            from ..ops.relational import TOPK_DRIVER_LIMIT, topk

            if nlim is not None and nlim + noff <= TOPK_DRIVER_LIMIT:
                ds = topk(ds, keys, desc, nlim, offset=noff)
                skip_next_limit = True
            else:
                ds = ds.sort(keys, descending=desc)
            helper = [i for i, _c in ind_cols] + [h for h, _e in hidden_orders]
            if helper:

                def _droph(df: pd.DataFrame, helper=helper) -> pd.DataFrame:
                    return df.drop(columns=[c for c in helper if c in df.columns])

                ds = ds.map_batches(_droph, batch_format="pandas")
        elif mod["type"] == "LIMIT_MODIFIER":
            if skip_next_limit:
                skip_next_limit = False
                continue
            if mod.get("offset"):
                # silently dropping OFFSET would return the wrong rows
                raise SqlUnsupported("LIMIT ... OFFSET")
            ds = ds.limit(int(_const_value(mod["limit"])))
        elif mod["type"] == "DISTINCT_MODIFIER":
            # DuckDB emits DISTINCT before ORDER/LIMIT in the modifier
            # list, so in-order processing preserves SQL semantics
            if mod.get("distinct_on_targets"):
                # DISTINCT ON (keys): first row per key group by the
                # ORDER BY — row_number over (keys, order) == 1.
                # Deterministic only when ORDER BY breaks ties, same as
                # in SQL; without ORDER BY the façade rejects.
                if not order_keys:
                    raise SqlUnsupported("DISTINCT ON requires ORDER BY")
                if any(nf for _k, _d, nf in order_keys):
                    raise SqlUnsupported("DISTINCT ON with NULLS FIRST")
                out_names_don = _static_names(node, auto_names)
                targets = []
                for tnode in mod["distinct_on_targets"]:
                    if tnode.get("class") == "COLUMN_REF":
                        targets.append(tnode["column_names"][-1])
                    elif tnode.get("class") == "CONSTANT" and out_names_don:
                        v = _const_value(tnode)
                        if not isinstance(v, (int, np.integer)) or not (
                            1 <= v <= len(out_names_don)
                        ):
                            raise SqlUnsupported("DISTINCT ON ordinal")
                        targets.append(out_names_don[int(v) - 1])
                    else:
                        raise SqlUnsupported(
                            "DISTINCT ON targets must be output columns"
                        )
                from ..ops.window import window as _window_op

                ds = _window_op(
                    ds,
                    targets,
                    [(k, d) for k, d, _nf in order_keys],
                    {"_rn_don": ("row_number",)},
                )

                def _keep_first(df: pd.DataFrame) -> pd.DataFrame:
                    return df[df["_rn_don"] == 1].drop(columns=["_rn_don"])

                ds = ds.map_batches(_keep_first, batch_format="pandas")
            else:
                from ..ops.relational import distinct as _distinct

                ds = _distinct(ds, list(ds.schema().names))
        else:
            raise SqlUnsupported(f"modifier {mod['type']}")
    return ds


def _compile_grouping_sets(
    node, ds, select_list, group_exprs, group_sets, auto_names=False
):
    """GROUP BY ROLLUP / CUBE / GROUPING SETS: DuckDB's parser lowers
    all three to ``group_sets`` (index lists into group_expressions);
    compile ONE combiner aggregate per set over a materialized input,
    splice rolled-up dimension columns back in as NULLs, and UNION ALL
    the per-set frames — each set is its own partial-agg shuffle over
    already-pruned columns, so k sets cost k light exchanges, never k
    scans of storage.  Multi-set restrictions (compile-time rejected):
    group keys and the select items referencing them must be plain
    column refs; GROUPING() is unsupported."""
    for g in group_exprs:
        if g.get("class") != "COLUMN_REF":
            raise SqlUnsupported(
                "grouping sets require plain column-ref group keys"
            )
    gcols = [g["column_names"][-1] for g in group_exprs]
    ds = ds.materialize()  # consumed once per grouping set
    names = [_output_name(it, i, auto_names) for i, it in enumerate(select_list)]
    parts = []
    for s in group_sets:
        keep = {gcols[i] for i in s}
        sub_select = []
        for name, it in zip(names, select_list):
            if _contains_aggregate(it):
                sub_select.append(it)
            elif it.get("class") == "COLUMN_REF":
                col = it["column_names"][-1]
                if col not in gcols:
                    raise SqlUnsupported(
                        f"grouping-set select item {col!r} is not a group key"
                    )
                if col in keep:
                    sub_select.append(it)
                else:  # rolled up in this set: NULL dimension
                    sub_select.append(
                        {
                            "class": "_PYCONST",
                            "type": "_PYCONST",
                            "py_value": None,
                            "alias": name,
                        }
                    )
            else:
                raise SqlUnsupported(
                    "grouping-set select items must be column refs or aggregates"
                )
        sub_group = [group_exprs[i] for i in s]
        parts.append(
            _compile_aggregate(node, ds, sub_select, sub_group, auto_names)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def _compile_aggregate(
    node, ds, select_list, group_exprs, auto_names=False, hidden_orders=()
):
    """GROUP BY path: one pre-stage computes key + aggregate-input
    columns vectorized, one partial-aggregating groupby shuffle, then
    HAVING + the final projection over the aggregated frame.
    ``hidden_orders``: (name, expr) ORDER BY expressions appended as
    extra output columns (dropped after the sort)."""
    key_names = [f"_g{i}" for i in range(len(group_exprs))]
    key_structs = {_struct_key(g): kn for g, kn in zip(group_exprs, key_names)}

    # collect every distinct aggregate in select list + having
    agg_nodes: dict[str, dict] = {}

    def walk(n):
        if isinstance(n, dict):
            if _is_aggregate(n):
                agg_nodes.setdefault(_struct_key(n), n)
                return
            for v in n.values():
                walk(v)
        elif isinstance(n, list):
            for x in n:
                walk(x)

    walk(select_list)
    if node.get("having"):
        walk(node["having"])
    for _hname, he in hidden_orders:
        walk(he)

    agg_cols = {k: f"_a{i}" for i, k in enumerate(agg_nodes)}
    aggs = []
    agg_specs: list[tuple[str, str | None, str]] = []  # (fn, in_col, out_col)
    distinct_aggs: list[tuple[str, str, str]] = []  # (fn, out_col, in_col)
    bool_inputs: set[str] = set()  # inputs coerced bool→float for min/max
    bool_casts: list[str] = []  # aggregate outputs cast back to SQL boolean
    # out_col -> (fn, in_col, sep) for ORDER-BY-inside aggregates; all
    # must share ONE order signature (order_sort: [(in_col, desc)])
    ordered_specs: dict[str, tuple] = {}
    order_sort: list[tuple[str, bool]] | None = None
    var_squares: list[str] = []  # global variance outputs: Std² post-pass
    # input column name -> (child expr | None, FILTER expr | None).
    # FILTER (WHERE …) compiles to input MASKING — the masked value is
    # NULL where the predicate fails, and every downstream aggregate
    # path (Ray ignore-nulls, combiner, fused holistic, distinct pair
    # dedup) already skips NULLs, so one mechanism covers them all.
    input_exprs: dict[str, tuple] = {}
    for k, n in agg_nodes.items():
        fn = n["function_name"].lower()
        out_col = agg_cols[k]
        children = n.get("children", [])
        filt = n.get("filter")
        if n.get("distinct") and fn not in ("min", "max"):
            # DISTINCT changes count/sum/avg; it is a no-op for extrema,
            # which fall through to the plain path
            if fn not in ("count", "sum", "avg", "mean") or len(children) != 1:
                raise SqlUnsupported(f"{fn}(DISTINCT ...)")
            in_col = f"_in{len(input_exprs)}"
            input_exprs[in_col] = (children[0], filt)
            distinct_aggs.append(("mean" if fn == "avg" else fn, out_col, in_col))
            continue
        if fn in ("string_agg", "array_agg", "list"):
            # holistic with intra-group ORDER BY; unordered forms are
            # nondeterministic under a shuffle, so the façade rejects
            # them rather than mis-execute
            orders = (n.get("order_bys") or {}).get("orders") or []
            if not orders:
                raise SqlUnsupported(f"{fn} without ORDER BY (nondeterministic)")
            if filt:
                raise SqlUnsupported(f"{fn} FILTER")
            sep = None
            if fn == "string_agg":
                if len(children) != 2 or children[1].get("class") != "CONSTANT":
                    raise SqlUnsupported("string_agg(expr, constant separator)")
                sep = str(_const_value(children[1]))
            elif len(children) != 1:
                raise SqlUnsupported(f"{fn} arity")
            sig = []
            for o in orders:
                oc = f"_in{len(input_exprs)}"
                input_exprs[oc] = (o["expression"], None)
                sig.append((oc, o["type"] == "DESCENDING"))
            if order_sort is not None and sig != order_sort:
                raise SqlUnsupported(
                    "multiple aggregate ORDER BY signatures in one query"
                )
            order_sort = sig
            in_col = f"_in{len(input_exprs)}"
            input_exprs[in_col] = (children[0], None)
            fn_norm = "array_agg" if fn == "list" else fn
            ordered_specs[out_col] = (fn_norm, in_col, sep)
            agg_specs.append((fn_norm, in_col, out_col))
            continue
        if fn in ("bool_or", "bool_and"):
            if len(children) != 1:
                raise SqlUnsupported(f"{fn} arity")
            in_col = f"_in{len(input_exprs)}"
            input_exprs[in_col] = (children[0], filt)
            bool_inputs.add(in_col)
            bool_casts.append(out_col)
            eff = "max" if fn == "bool_or" else "min"
            aggs.append(_AGG_BUILDERS[eff](in_col, out_col))
            agg_specs.append((eff, in_col, out_col))
            continue
        if fn == "count_star":
            if filt:
                # count(*) FILTER (WHERE p) = non-null count of the mask
                in_col = f"_in{len(input_exprs)}"
                input_exprs[in_col] = (None, filt)
                aggs.append(Count(in_col, alias_name=out_col, ignore_nulls=True))
                agg_specs.append(("count", in_col, out_col))
            else:
                aggs.append(Count(alias_name=out_col))
                agg_specs.append(("count_star", None, out_col))
            continue
        if len(children) != 1:
            raise SqlUnsupported(f"aggregate {fn} arity")
        in_col = f"_in{len(input_exprs)}"
        input_exprs[in_col] = (children[0], filt)
        if fn == "count":
            aggs.append(Count(in_col, alias_name=out_col, ignore_nulls=True))
        elif fn in _AGG_BUILDERS:
            aggs.append(_AGG_BUILDERS[fn](in_col, out_col))
        elif fn in _GLOBAL_STD_FAMILY and not key_names:
            # the GLOBAL variance family rides Ray's distributive Std
            # (variance = std², squared after the aggregate); grouped
            # queries compute these exactly in the fused pandas pass
            from ray.data.aggregate import Std

            aggs.append(
                Std(in_col, alias_name=out_col, ddof=_GLOBAL_STD_FAMILY[fn])
            )
            if fn.startswith("var"):
                var_squares.append(out_col)
        elif fn not in _PANDAS_ONLY_AGGS:
            raise SqlUnsupported(f"aggregate {fn}")
        agg_specs.append((fn, in_col, out_col))

    def _prep(df: pd.DataFrame) -> pd.DataFrame:
        out = {}
        for g, kn in zip(group_exprs, key_names):
            v = eval_expr(g, df)
            out[kn] = v if isinstance(v, pd.Series) else pd.Series([v] * len(df))
        for cn, (e, filt) in input_exprs.items():
            if e is None:  # count(*) FILTER mask column
                v = pd.Series(np.ones(len(df)), index=df.index)
            else:
                v = eval_expr(e, df)
                if not isinstance(v, pd.Series):
                    v = pd.Series([v] * len(df), index=df.index)
            if cn in bool_inputs:
                # bool → float so min/max aggregate NULL-transparently;
                # cast back to SQL boolean in the final projection
                v = pd.Series(
                    np.asarray(v, dtype=np.float64), index=v.index
                )
            if filt is not None:
                mask = eval_expr(filt, df)
                mask = pd.Series(np.asarray(mask, dtype=bool), index=v.index)
                v = v.where(mask)
            out[cn] = v
        if not out:  # bare count(*): a 0-column frame would drop the rows
            out["_one"] = pd.Series(np.ones(len(df), dtype=np.int8), index=df.index)
        return pd.DataFrame(out)

    from .arrow_eval import arrow_ok, as_column, eval_expr_arrow

    # global (no GROUP BY) count(*) keeps the pandas path: Ray 2.49's
    # column-less Count aggregates ARROW blocks to 0 (it counts a
    # nonexistent column) while counting pandas rows fine — grouped
    # Count and on-column Count are unaffected (verified both)
    global_bare_count = not key_names and any(
        fn == "count_star" for fn, _in, _out in agg_specs
    )
    if not global_bare_count and all(
        arrow_ok(g, "value") for g in group_exprs
    ) and all(
        (e is None or arrow_ok(e, "value"))
        and (f is None or arrow_ok(f, "bool"))
        for (e, f) in input_exprs.values()
    ):
        # Arrow-native aggregate-input prep: group keys + agg inputs via
        # pc kernels on the zero-copy batch (the scan→prep prefix of a
        # GROUP BY query no longer pays the pandas round-trip); runtime
        # fallback to the pandas _prep on any kernel error.
        def _prep_a(t: pa.Table) -> pa.Table:
            try:
                n = t.num_rows
                out = {}
                for g, kn in zip(group_exprs, key_names):
                    out[kn] = as_column(eval_expr_arrow(g, t), n)
                for cn, (e, filt) in input_exprs.items():
                    if e is None:  # count(*) FILTER mask column
                        v = pa.repeat(pa.scalar(1.0), n)
                    else:
                        v = as_column(eval_expr_arrow(e, t), n)
                    if cn in bool_inputs:
                        v = pc.cast(v, "float64")
                    if filt is not None:
                        mask = eval_expr_arrow(filt, t)
                        v = pc.if_else(mask, v, pa.scalar(None, v.type))
                    out[cn] = v
                if not out:
                    out["_one"] = pa.repeat(pa.scalar(1, pa.int8()), n)
                return pa.table(out)
            except Exception:
                return pa.Table.from_pandas(
                    _prep(t.to_pandas()), preserve_index=False
                )

        ds = ds.map_batches(_prep_a, batch_format="pyarrow")
    else:
        ds = ds.map_batches(_prep, batch_format="pandas")

    # count(DISTINCT x): per-batch (key, x) dedup (combiner — shrinks the
    # shuffle to unique pairs), hash-partition dedup, then a grouped
    # count.  Multiple aggregate frames re-join on the group key; a group
    # whose x is all-NULL gets 0 via the left-outer fill (it can only
    # vanish entirely if EVERY aggregate is a distinct count — documented
    # two-valued-logic edge).
    def _pair_frames():
        from ..ops.relational import dedupe_by_key

        out = []
        for fn, out_col, in_col in distinct_aggs:
            cols = key_names + [in_col]

            def _pairs(df: pd.DataFrame, cols=cols, c=in_col) -> pd.DataFrame:
                return df[cols].dropna(subset=[c]).drop_duplicates()

            uniq = dedupe_by_key(
                ds.map_batches(_pairs, batch_format="pandas"), cols
            )
            out.append((fn, out_col, in_col, uniq))
        return out

    pandas_only = [s for s in agg_specs if s[0] in _PANDAS_ONLY_AGGS]
    if pandas_only and not key_names:
        hard = [s for s in pandas_only if s[0] not in _GLOBAL_STD_FAMILY]
        if hard:
            raise SqlUnsupported(
                f"{hard[0][0]} without GROUP BY (no distributive "
                "partial; use the quantile/variance sketches for global "
                "estimates at scale)"
            )
    if key_names and (distinct_aggs or pandas_only):
        # count(DISTINCT) / holistic aggregates (median, variance)
        # fuse the WHOLE aggregate into one
        # partition-hash pass: rows of a group key all land in the same
        # partition, so every aggregate (including exact nunique) is
        # computed exactly there — one shuffle, no aggregate-frame
        # re-join (the previous plan paid a dedup shuffle + a fresh
        # aggregator-actor join).
        #
        # PARTITIONING ASSUMPTION (the contract for this custom op):
        # one group key's rows must fit one partition worker — exact
        # holistic aggregates are inherently key-colocated.  A hot key
        # over an extreme-cardinality distinct column should use the
        # skew-immune estimators instead: ops.sketch.kmv_distinct
        # (count DISTINCT, ≤k hashes per key per block cross the
        # shuffle) / ops.sketch.quantile_sketch (median).
        from ..ops.relational import DEDUP_PARTITIONS

        def _part(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["_part"] = (
                pd.util.hash_pandas_object(df[key_names], index=False).to_numpy()
                % DEDUP_PARTITIONS
            ).astype("int32")
            return df

        def _agg_part(g: pd.DataFrame) -> pd.DataFrame:
            if order_sort:
                # one pre-sort serves every ordered aggregate (single
                # signature enforced at compile); groupby(sort=False)
                # preserves within-group row order for ALL aggregates
                g = g.sort_values(
                    [c for c, _ in order_sort],
                    ascending=[not d for _, d in order_sort],
                    kind="mergesort",
                    na_position="last",
                )
            gb = g.groupby(key_names, sort=False, dropna=False)
            out = gb.size().reset_index()[key_names]
            for fn, in_col, out_col in agg_specs:
                if fn == "count_star":
                    s = gb.size()
                elif fn == "count":
                    s = gb[in_col].count()
                elif fn == "sum":
                    s = gb[in_col].sum(min_count=1)
                elif fn in ("avg", "mean"):
                    s = gb[in_col].mean()
                elif fn == "min":
                    s = gb[in_col].min()
                elif fn == "max":
                    s = gb[in_col].max()
                elif fn in ("stddev", "stddev_samp"):
                    s = gb[in_col].std(ddof=1)
                elif fn == "stddev_pop":
                    s = gb[in_col].std(ddof=0)
                elif fn in ("var_samp", "variance"):
                    s = gb[in_col].var(ddof=1)
                elif fn == "var_pop":
                    s = gb[in_col].var(ddof=0)
                elif fn == "string_agg":
                    _fn2, _ic, sep = ordered_specs[out_col]
                    s = gb[in_col].agg(
                        lambda x, sep=sep: (
                            sep.join(x.dropna().astype(str))
                            if x.notna().any()
                            else None
                        )
                    )
                elif fn == "array_agg":
                    s = gb[in_col].agg(
                        lambda x: [None if pd.isna(v) else v for v in x]
                    )
                elif fn == "median":
                    s = gb[in_col].median()
                else:
                    raise SqlUnsupported(f"aggregate {fn}")
                out[out_col] = s.to_numpy()
            for fn, out_col, in_col in distinct_aggs:
                if fn == "count":
                    out[out_col] = (
                        gb[in_col].nunique(dropna=True).to_numpy().astype("int64")
                    )
                else:  # sum/mean over per-group distinct values
                    dd = g.drop_duplicates(subset=key_names + [in_col])
                    gb2 = dd.groupby(key_names, sort=False, dropna=False)[in_col]
                    s = gb2.sum(min_count=1) if fn == "sum" else gb2.mean()
                    # dedup keeps first occurrences, so group order (order
                    # of appearance) matches gb's
                    out[out_col] = s.to_numpy()
            return out

        agged = (
            ds.map_batches(_part, batch_format="pandas")
            .groupby("_part")
            .map_groups(_agg_part, batch_format="pandas")
        )
    elif key_names:
        from ..ops.relational import DISTRIBUTIVE_AGGS, grouped_aggregate

        if all(fn in DISTRIBUTIVE_AGGS for fn, _i, _o in agg_specs):
            # combiner pass: per-batch partials → one hash shuffle of
            # group partials → exact merge (Ray's sort-based groupby
            # pays a multi-stage sample+sort barrier — measured 9 s vs
            # 1.5 s on the demo workload, and ships raw rows at scale)
            agged = grouped_aggregate(ds, key_names, agg_specs)
        else:
            agged = ds.groupby(key_names).aggregate(*aggs)
    else:
        # global aggregate: Dataset.aggregate returns one dict row
        row = dict(ds.aggregate(*aggs)) if aggs else {}
        for c in var_squares:
            if row.get(c) is not None:
                row[c] = row[c] ** 2
        for fn, out_col, in_col, uniq in _pair_frames():
            if fn == "count":
                row[out_col] = uniq.count()
            else:  # sum/mean over the global distinct values
                builder = Sum if fn == "sum" else Mean
                row[out_col] = dict(uniq.aggregate(builder(in_col)))[
                    f"{'sum' if fn == 'sum' else 'mean'}({in_col})"
                ]
        agged = ray.data.from_items([row])

    having = node.get("having")
    names = [_output_name(it, i, auto_names) for i, it in enumerate(select_list)]

    # hidden ORDER BY expressions evaluate over the aggregate frame:
    # group expressions inside them become their key columns (aggregates
    # keep their structural identity so agg_cols still resolves them)
    def _sub_keys(e):
        if isinstance(e, dict):
            if _is_aggregate(e):
                return e
            sk = _struct_key(e)
            if sk in key_structs:
                return {
                    "class": "COLUMN_REF",
                    "type": "COLUMN_REF",
                    "column_names": [key_structs[sk]],
                }
            return {
                k: (v if k in ("location", "query_location") else _sub_keys(v))
                for k, v in e.items()
            }
        if isinstance(e, list):
            return [_sub_keys(x) for x in e]
        return e

    hidden_final = [(hname, _sub_keys(he)) for hname, he in hidden_orders]

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        for c in bool_casts:  # float min/max back to SQL boolean
            s = df[c]
            df = df.assign(
                **{c: pd.Series(
                    np.where(s.isna(), None, s.to_numpy(dtype=float) > 0.5),
                    index=df.index, dtype=object,
                )}
            )
        if having is not None:
            mask = eval_expr(having, df, agg_cols)
            df = df[np.asarray(mask, dtype=bool)]
        out = {}
        for name, it in zip(names, select_list):
            sk = _struct_key(it)
            if sk in key_structs:  # select item IS a group expression
                out[name] = df[key_structs[sk]]
                continue
            v = eval_expr(it, df, agg_cols)
            if not isinstance(v, pd.Series):
                v = pd.Series([v] * len(df), index=df.index)
            out[name] = v
        for hname, he in hidden_final:
            v = eval_expr(he, df, agg_cols)
            out[hname] = (
                v if isinstance(v, pd.Series) else pd.Series([v] * len(df), index=df.index)
            )
        return pd.DataFrame(out)

    return agged.map_batches(_final, batch_format="pandas")


def execute_sql(sql: str, catalog: Catalog):
    """SQL string → Ray Dataset (lazy until consumed)."""
    node = parse_sql(sql)
    return _compile_select_node(node, catalog)


__all__ = ["Catalog", "execute_sql", "parse_sql", "SqlUnsupported", "eval_expr"]
