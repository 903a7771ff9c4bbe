"""Helpers for generating DuckDB oracle SQL from shared constants."""

from __future__ import annotations


def sql_str(v: object) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


def values_cte(name: str, cols: list[str], rows: list[tuple]) -> str:
    """``name(col, ...) AS (VALUES (...), ...)`` CTE body."""
    body = ",\n    ".join("(" + ", ".join(sql_str(v) for v in r) + ")" for r in rows)
    return f"{name}({', '.join(cols)}) AS (VALUES\n    {body})"
