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
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

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


__all__ = ["profile_columns", "infer_type", "SchemaRegistry", "TableMeta"]
