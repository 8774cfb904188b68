"""Arrow-native expression evaluation for the SQL façade's hot paths.

The façade's WHERE / projection / aggregate-input stages originally ran
every batch through ``batch_format="pandas"`` + :func:`engine.eval_expr`
— each stage paying an Arrow→pandas→Arrow conversion even for
predicates `pyarrow.compute` evaluates natively on zero-copy batches.
This module compiles the SUPPORTED SUBSET of the expression AST to
pyarrow.compute kernels; everything else keeps the pandas path.

Two safety layers, because a façade must never silently mis-execute:

1. **Compile-time whitelist** (:func:`arrow_ok`): only node classes /
   functions whose Arrow kernels are semantically IDENTICAL to the
   pandas evaluator (and to the DuckDB oracles) are admitted.  String
   formatting (VARCHAR casts, ``||``), CASE (object-dtype np.select
   semantics), and ``%`` (no Arrow kernel) are deliberately excluded —
   those could diverge without raising.
2. **Runtime fallback**: the engine wraps each Arrow stage in
   try/except and re-runs the batch through the pandas evaluator on ANY
   kernel error (e.g. a type dispatch the whitelist could not foresee
   — column types are unknown at compile time).  A thrown error is
   safe; only silent divergence is not, and layer 1 exists for that.

Semantics notes (each matched to the pandas evaluator on null-free
data, and to SQL where they differ on nulls):

- ``/`` always casts both sides to float64 first: DuckDB's ``/`` and
  pandas int/int both produce doubles, while ``pc.divide`` on int64
  would truncate.
- ``round`` re-implements the engine's half-away-from-zero formula
  (trunc(x·s + sign·0.5)/s) with pc.trunc/pc.sign rather than trusting
  ``pc.round`` to share DuckDB's fp edge behavior.
- boolean connectives use Kleene kernels; under a WHERE filter a null
  mask row drops exactly like pandas' False.  Comparisons are admitted
  ONLY in boolean (filter) context: projecting a comparison of a null
  operand would yield SQL null here but False under pandas — so value
  context rejects them (layer 1).
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

_CMP_KERNELS = {
    "COMPARE_EQUAL": pc.equal,
    "COMPARE_NOTEQUAL": pc.not_equal,
    "COMPARE_LESSTHAN": pc.less,
    "COMPARE_LESSTHANOREQUALTO": pc.less_equal,
    "COMPARE_GREATERTHAN": pc.greater,
    "COMPARE_GREATERTHANOREQUALTO": pc.greater_equal,
}

# value-context functions: result semantics identical to the pandas
# evaluator (see module docstring for '/' and 'round')
_VALUE_FNS = {"+", "-", "*", "/", "round", "abs", "floor", "ceil",
              "lower", "upper", "length"}

_NUM_CASTS = {
    "INTEGER": "int64", "BIGINT": "int64", "SMALLINT": "int64",
    "TINYINT": "int64", "DOUBLE": "float64", "FLOAT": "float64",
    "DECIMAL": "float64",
}


def arrow_ok(node: Any, mode: str = "value", has_windows: bool = False) -> bool:
    """Compile-time check: can ``node`` run on the Arrow path with
    semantics identical to the pandas evaluator?  ``mode`` is "value"
    (projection / aggregate input) or "bool" (WHERE / QUALIFY / FILTER
    predicate).  Boolean-producing nodes are only admitted in bool
    context (null→False vs null→null divergence, docstring)."""
    if not isinstance(node, dict):
        return False
    cls, typ = node.get("class"), node.get("type")
    if cls == "COLUMN_REF" or cls == "_PYCOL":
        return True
    if cls == "WINDOW":
        return has_windows  # resolved to a computed column by then
    if cls == "CONSTANT":
        return True
    if cls == "_PYCONST":
        return not isinstance(node.get("py_value"), (list, tuple, dict))
    if cls == "CAST":
        return (
            node.get("cast_type", {}).get("id") in _NUM_CASTS
            and arrow_ok(node.get("child"), "value", has_windows)
        )
    if cls == "FUNCTION":
        fn = node.get("function_name", "").lower()
        if fn not in _VALUE_FNS:
            return False
        kids = node.get("children", [])
        if fn == "round" and len(kids) == 2:
            return (
                kids[1].get("class") == "CONSTANT"
                and arrow_ok(kids[0], "value", has_windows)
            )
        return all(arrow_ok(c, "value", has_windows) for c in kids)
    if mode != "bool":
        return False
    if cls == "COMPARISON" and typ in _CMP_KERNELS:
        return all(
            arrow_ok(node.get(s), "value", has_windows)
            for s in ("left", "right")
        )
    if cls == "CONJUNCTION" and typ in ("CONJUNCTION_AND", "CONJUNCTION_OR"):
        return all(
            arrow_ok(c, "bool", has_windows) for c in node.get("children", [])
        )
    if cls == "BETWEEN" and typ == "COMPARE_BETWEEN":
        return all(
            arrow_ok(node.get(s), "value", has_windows)
            for s in ("input", "lower", "upper")
        )
    if cls == "OPERATOR":
        kids = node.get("children", [])
        if typ == "OPERATOR_NOT":
            return len(kids) == 1 and arrow_ok(kids[0], "bool", has_windows)
        if typ in ("OPERATOR_IS_NULL", "OPERATOR_IS_NOT_NULL"):
            return len(kids) == 1 and arrow_ok(kids[0], "value", has_windows)
        if typ in ("COMPARE_IN", "COMPARE_NOT_IN"):
            return (
                len(kids) >= 2
                and arrow_ok(kids[0], "value", has_windows)
                and all(c.get("class") == "CONSTANT" for c in kids[1:])
            )
    return False


def _round_away(x, nd: int):
    """Half-away-from-zero round — the exact pc translation of the
    engine's `_sql_round_vec` numpy formula (DuckDB-parity)."""
    s = 10.0 ** nd
    y = pc.multiply(pc.cast(x, pa.float64()), pa.scalar(s))
    half = pc.multiply(pc.cast(pc.sign(y), pa.float64()), pa.scalar(0.5))
    return pc.divide(pc.trunc(pc.add(y, half)), pa.scalar(s))


def eval_expr_arrow(node: dict, t: pa.Table, win_cols: dict | None = None):
    """node → pa.(Chunked)Array or python scalar over table ``t``.
    Only nodes admitted by :func:`arrow_ok` reach here; anything else
    raises (the engine's runtime fallback re-runs the batch in pandas).
    """
    from .engine import SqlUnsupported, _const_value, _struct_key

    cls, typ = node.get("class"), node.get("type")
    if win_cols is not None and cls == "WINDOW":
        return t[win_cols[_struct_key(node)]]
    if cls == "COLUMN_REF":
        return t[node["column_names"][-1]]
    if cls == "_PYCOL":
        return t[node["py_col"]]
    if cls == "CONSTANT":
        return _const_value(node)
    if cls == "_PYCONST":
        return node["py_value"]
    if cls == "CAST":
        v = eval_expr_arrow(node["child"], t, win_cols)
        target = _NUM_CASTS[node["cast_type"]["id"]]
        if not isinstance(v, (pa.Array, pa.ChunkedArray)):
            return int(v) if target == "int64" else float(v)
        # safe=False: float→int truncates toward zero, matching pandas
        # .astype("int64") / numpy C-cast semantics
        return pc.cast(v, target, safe=False)
    if cls == "COMPARISON":
        a = eval_expr_arrow(node["left"], t, win_cols)
        b = eval_expr_arrow(node["right"], t, win_cols)
        return _CMP_KERNELS[typ](a, b)
    if cls == "CONJUNCTION":
        kids = [eval_expr_arrow(c, t, win_cols) for c in node["children"]]
        out = kids[0]
        op = pc.and_kleene if typ == "CONJUNCTION_AND" else pc.or_kleene
        for k in kids[1:]:
            out = op(out, k)
        return out
    if cls == "BETWEEN":
        v = eval_expr_arrow(node["input"], t, win_cols)
        lo = eval_expr_arrow(node["lower"], t, win_cols)
        hi = eval_expr_arrow(node["upper"], t, win_cols)
        return pc.and_kleene(pc.greater_equal(v, lo), pc.less_equal(v, hi))
    if cls == "OPERATOR":
        kids = node.get("children", [])
        if typ == "OPERATOR_NOT":
            return pc.invert(eval_expr_arrow(kids[0], t, win_cols))
        if typ in ("OPERATOR_IS_NULL", "OPERATOR_IS_NOT_NULL"):
            v = eval_expr_arrow(kids[0], t, win_cols)
            return pc.is_null(v) if typ == "OPERATOR_IS_NULL" else pc.is_valid(v)
        if typ in ("COMPARE_IN", "COMPARE_NOT_IN"):
            target = eval_expr_arrow(kids[0], t, win_cols)
            vals = pa.array([_const_value(c) for c in kids[1:]])
            mask = pc.is_in(target, value_set=vals)
            return pc.invert(mask) if typ == "COMPARE_NOT_IN" else mask
    if cls == "FUNCTION":
        fn = node["function_name"].lower()
        args = [eval_expr_arrow(c, t, win_cols) for c in node.get("children", [])]
        if fn == "+":
            return pc.add(*args)
        if fn == "-":
            return pc.subtract(*args) if len(args) == 2 else pc.negate(args[0])
        if fn == "*":
            return pc.multiply(*args)
        if fn == "/":
            return pc.divide(
                pc.cast(args[0], pa.float64()) if isinstance(args[0], (pa.Array, pa.ChunkedArray)) else float(args[0]),
                pc.cast(args[1], pa.float64()) if isinstance(args[1], (pa.Array, pa.ChunkedArray)) else float(args[1]),
            )
        if fn == "round":
            nd = int(_const_value(node["children"][1])) if len(args) == 2 else 0
            return _round_away(args[0], nd)
        if fn == "abs":
            return pc.abs(args[0])
        if fn == "floor":
            return pc.floor(pc.cast(args[0], pa.float64()))
        if fn == "ceil":
            return pc.ceil(pc.cast(args[0], pa.float64()))
        if fn == "lower":
            return pc.utf8_lower(args[0])
        if fn == "upper":
            return pc.utf8_upper(args[0])
        if fn == "length":
            # pc.utf8_length yields int32; the pandas path (str.len)
            # and DuckDB both give int64
            return pc.cast(pc.utf8_length(args[0]), pa.int64())
    raise SqlUnsupported(f"arrow path: {cls}/{typ}")


def as_column(v, n: int) -> pa.ChunkedArray | pa.Array:
    """Broadcast an eval result to a length-``n`` column."""
    if isinstance(v, (pa.Array, pa.ChunkedArray)):
        return v
    if isinstance(v, pa.Scalar):
        return pa.repeat(v, n)
    return pa.repeat(pa.scalar(v), n)
