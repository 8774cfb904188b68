"""Declarative table validation: constraint rules → violation census.

The quality gate every ingestion pipeline needs before data is trusted
downstream (the reference leans on Glue-catalog typing plus ad-hoc
Athena checks; here the rules are first-class and run in the engine).
Output: one ``(rule, n_violations)`` row per rule — O(#rules), so the
summary always fits the driver.

Scale shape: row-local rules (not_null / range / in_set / regex) are
ONE shared streaming pass emitting #rules partial-count rows per batch
— zero shuffle over the data, a #rules-sized combine at the end.
``unique`` ships a slim per-batch (key, partial-count) census through
the grouped-aggregate combiner shuffle (key column only).  ``ref``
(referential integrity) counts rows surviving an anti join against the
referenced key set — the measured broadcast-vs-hash switch of
:func:`.relational.anti_join` applies, so a dimension-sized reference
never shuffles the fact side.
"""

from __future__ import annotations

import re
from typing import Any, Sequence

import numpy as np
import pandas as pd

import ray.data

from .relational import anti_join, grouped_aggregate

_BATCH_KINDS = ("not_null", "range", "in_set", "regex")


def _label(rule: tuple) -> str:
    return f"{rule[0]}({rule[1]})"


def validate_table(
    ds: "ray.data.Dataset",
    rules: Sequence[tuple],
) -> "ray.data.Dataset":
    """Check ``rules`` against ``ds``; return ``(rule, n_violations)``.

    Rule forms (``col`` is always the checked column):

    - ``("not_null", col)`` — NULL/NaN values violate.
    - ``("range", col, lo, hi)`` — non-null values outside [lo, hi].
    - ``("in_set", col, values)`` — non-null values not in ``values``.
    - ``("regex", col, pattern)`` — non-null strings not matching
      ``pattern`` (Python `re.match` anchor-at-start semantics; keep
      patterns RE2-compatible if an SQL oracle mirrors them).
    - ``("unique", col)`` — every row beyond the first per duplicated
      value counts (``count(*) - count(DISTINCT col)``).
    - ``("ref", col, ref_ds, ref_col)`` — rows whose value has no
      partner in ``ref_ds[ref_col]`` (NULLs violate too: a dangling
      foreign key is dangling whether or not it is NULL).
    """
    rules = [tuple(r) for r in rules]
    labels = [_label(r) for r in rules]
    if len(set(labels)) != len(labels):
        raise ValueError(f"duplicate rule labels: {labels}")
    batch_rules = [r for r in rules if r[0] in _BATCH_KINDS]
    cols = sorted({r[1] for r in batch_rules})
    parts: list["ray.data.Dataset"] = []

    if batch_rules:
        compiled = [
            (r, re.compile(r[2])) if r[0] == "regex" else (r, None)
            for r in batch_rules
        ]

        def _scan(df: pd.DataFrame) -> pd.DataFrame:
            out_rules, out_n = [], []
            for r, pat in compiled:
                s = df[r[1]]
                if r[0] == "not_null":
                    n = int(s.isna().sum())
                elif r[0] == "range":
                    v = pd.to_numeric(s, errors="coerce")
                    n = int(((v < r[2]) | (v > r[3])).sum())
                elif r[0] == "in_set":
                    n = int((~s.isin(list(r[2])) & s.notna()).sum())
                else:  # regex
                    ok = s.astype(str).str.match(pat)
                    n = int((~ok & s.notna()).sum())
                out_rules.append(_label(r))
                out_n.append(n)
            return pd.DataFrame(
                {"rule": out_rules, "n": np.asarray(out_n, np.int64)}
            )

        parts.append(
            ds.select_columns(cols).map_batches(_scan, batch_format="pandas")
        )

    for r in rules:
        if r[0] == "unique":
            col = r[1]
            per_key = grouped_aggregate(
                ds.select_columns([col]), [col], [("count", col, "n")]
            )
            lbl = _label(r)

            def _excess(df: pd.DataFrame, _lbl=lbl) -> pd.DataFrame:
                n = df["n"].to_numpy(np.int64)
                return pd.DataFrame(
                    {"rule": [_lbl], "n": [int((n[n > 1] - 1).sum())]}
                )

            parts.append(per_key.map_batches(_excess, batch_format="pandas"))
        elif r[0] == "ref":
            _, col, ref_ds, ref_col = r
            keys = ref_ds.select_columns([ref_col])
            if ref_col != col:
                keys = keys.map_batches(
                    lambda df, _rc=ref_col, _c=col: df.rename(
                        columns={_rc: _c}
                    ),
                    batch_format="pandas",
                )
            dangling = anti_join(ds.select_columns([col]), keys, on=col)
            lbl = _label(r)
            parts.append(
                dangling.map_batches(
                    lambda df, _lbl=lbl: pd.DataFrame(
                        {"rule": [_lbl], "n": [np.int64(len(df))]}
                    ),
                    batch_format="pandas",
                )
            )
        elif r[0] not in _BATCH_KINDS:
            raise ValueError(f"unknown rule kind: {r[0]!r}")

    if not parts:
        raise ValueError("no rules given")
    stream = parts[0]
    for p in parts[1:]:
        stream = stream.union(p)
    # the combined census is ≤ #rules rows — a driver frame by design
    summary = (
        grouped_aggregate(stream, ["rule"], [("sum", "n", "n_violations")])
        .to_pandas()
        .set_index("rule")["n_violations"]
    )
    out = pd.DataFrame(
        {
            "rule": labels,
            "n_violations": [
                np.int64(summary.get(l, 0)) for l in labels
            ],
        }
    )
    return ray.data.from_pandas(out)


__all__ = ["validate_table"]
