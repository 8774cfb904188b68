from .agent import (
    AgentResult,
    RuleBasedSqlGenerator,
    Text2SqlAgent,
    Text2SqlError,
)
from .engine import Catalog, SqlUnsupported, execute_sql, parse_sql

__all__ = [
    "AgentResult",
    "Catalog",
    "RuleBasedSqlGenerator",
    "SqlUnsupported",
    "Text2SqlAgent",
    "Text2SqlError",
    "execute_sql",
    "parse_sql",
]
