"""Text2SQL agent loop: the reference's NL→SQL UX with native execution.

Re-expresses `lambda/webbackend/agent_processor.py`'s agent shape on
this engine:

- the system prompt is the schema block
  (:613-753 builds it from Glue catalog comments; here
  :meth:`..ops.profile.SchemaRegistry.prompt_block` or a
  :class:`.engine.Catalog` render it),
- the model proposes SQL, the execute-query tool runs it and returns a
  formatted preview or the error text (:135-171 — errors go BACK to the
  model as the tool result, they don't abort the conversation),
- the loop retries until success or the attempt cap
  (`wait_for_query_completion`'s bounded retry, :495-521).

The LLM itself is a pluggable callable — this engine has no network by
design, so :class:`RuleBasedSqlGenerator` supplies a deterministic
keyword→template generator covering the reference's demo workload
(README.md:13-15: repeat buyers, top spenders, who-hasn't-bought), and
tests drive the retry path with scripted generators.  Swapping in a
real model is one constructor argument.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable, Protocol

from ..ops.format import format_result
from .engine import Catalog, SqlUnsupported, execute_sql


class SqlGenerator(Protocol):
    """question + prior failures → next SQL candidate."""

    def __call__(self, question: str, schema_prompt: str,
                 failures: list[tuple[str, str]]) -> str: ...


@dataclass
class AgentTurn:
    sql: str
    ok: bool
    error: str | None = None


@dataclass
class AgentResult:
    sql: str
    dataset: object  # ray.data.Dataset (lazy)
    preview: dict    # ops.format.format_result payload
    turns: list[AgentTurn] = field(default_factory=list)


class Text2SqlError(RuntimeError):
    def __init__(self, turns: list[AgentTurn]):
        self.turns = turns
        lines = "; ".join(f"attempt {i + 1}: {t.error}" for i, t in enumerate(turns))
        super().__init__(f"no valid SQL after {len(turns)} attempts ({lines})")


class Text2SqlAgent:
    """generate → execute → feed the error back → retry (bounded)."""

    def __init__(
        self,
        catalog: Catalog,
        generate: SqlGenerator,
        schema_prompt: str = "",
        max_attempts: int = 3,
    ):
        self.catalog = catalog
        self.generate = generate
        self.schema_prompt = schema_prompt
        self.max_attempts = max_attempts

    def run(self, question: str) -> AgentResult:
        turns: list[AgentTurn] = []
        failures: list[tuple[str, str]] = []
        for _ in range(self.max_attempts):
            sql = self.generate(question, self.schema_prompt, failures)
            try:
                ds = execute_sql(sql, self.catalog)
                # consume a bounded preview NOW so execution errors (not
                # just compile errors) also feed back into the loop —
                # the reference's tool returns formatted results or the
                # error string either way (agent_processor.py:168-171)
                preview = format_result(ds)
            except Exception as e:  # SqlUnsupported, parse, or runtime
                msg = f"{type(e).__name__}: {e}"
                turns.append(AgentTurn(sql=sql, ok=False, error=msg))
                failures.append((sql, msg))
                continue
            turns.append(AgentTurn(sql=sql, ok=True))
            return AgentResult(sql=sql, dataset=ds, preview=preview, turns=turns)
        raise Text2SqlError(turns)


# ---------------------------------------------------------------------------
# deterministic generator for the reference demo workload
# ---------------------------------------------------------------------------

def _num(question: str, default: int) -> int:
    m = re.search(r"\b(\d+)\b", question)
    return int(m.group(1)) if m else default


class RuleBasedSqlGenerator:
    """Keyword→template SQL over the TPC-H-ish catalog: a transparent,
    network-free stand-in for the reference's LLM (README.md:13-15 demo
    questions).  On feedback it falls through to the next matching
    template, mimicking the model's error-driven retry."""

    def __init__(self):
        self._rules: list[tuple[re.Pattern, Callable[[str], str]]] = [
            (re.compile(r"repeat (buyer|customer)", re.I), self._repeat_buyers),
            (re.compile(r"top\s+\d*\s*(spender|customer)", re.I), self._top_spenders),
            (re.compile(r"(never|not)\s+(ordered|bought)", re.I), self._never_ordered),
            (re.compile(r"how many orders", re.I), self._order_count),
            (re.compile(r"orders? per (day|status)", re.I), self._orders_per_status),
        ]

    def __call__(self, question: str, schema_prompt: str,
                 failures: list[tuple[str, str]]) -> str:
        tried = {sql for sql, _ in failures}
        for pat, build in self._rules:
            if pat.search(question):
                sql = build(question)
                if sql not in tried:
                    return sql
        raise Text2SqlError(
            [AgentTurn(sql="", ok=False, error=f"no template for {question!r}")]
        )

    @staticmethod
    def _repeat_buyers(q: str) -> str:
        return """
            SELECT c.c_name AS name, count(*) AS order_count
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_name HAVING count(*) >= 2
            ORDER BY order_count DESC, name LIMIT 300
        """

    @staticmethod
    def _top_spenders(q: str) -> str:
        return f"""
            SELECT c.c_name AS name, round(sum(o.o_totalprice), 2) AS spend
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_name ORDER BY spend DESC, name LIMIT {_num(q, 10)}
        """

    @staticmethod
    def _never_ordered(q: str) -> str:
        return """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        """

    @staticmethod
    def _order_count(q: str) -> str:
        return "SELECT count(*) AS n FROM orders"

    @staticmethod
    def _orders_per_status(q: str) -> str:
        return """
            SELECT o_orderstatus AS status, count(*) AS n
            FROM orders GROUP BY o_orderstatus ORDER BY status
        """


__all__ = [
    "AgentResult",
    "AgentTurn",
    "RuleBasedSqlGenerator",
    "SqlGenerator",
    "Text2SqlAgent",
    "Text2SqlError",
]
