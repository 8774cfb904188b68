from .engine import Catalog, SqlUnsupported, execute_sql, parse_sql

__all__ = ["Catalog", "SqlUnsupported", "execute_sql", "parse_sql"]
