"""Shared expression helpers for hash-stable cross-engine results.

Double aggregation is the main source of cross-engine nondeterminism: the
accumulation ORDER differs between Spark partial aggregation and DuckDB, and
IEEE addition is not associative. Routing sums through DECIMAL partial sums
makes them exact and order-independent, then a final cast back to DOUBLE is
deterministic. See catalog.py docstring for the full rule set.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: str = "18,2") -> Column:
    """Order-independent SUM of a 2-dp double column, returned as DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({scale})")).cast("double")


def davg(col: Column | str, scale: str = "18,2") -> Column:
    """Order-independent AVG: exact decimal sum, one double division."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({scale})")).cast("double") / F.count(c)


def sql_dsum(expr: str, scale: str = "18,2") -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL({scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: str = "18,2") -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL({scale}))) AS DOUBLE) / COUNT({expr})"


def sql_count(alias: str = "cnt") -> str:
    # DuckDB COUNT is already BIGINT; SUM over ints is HUGEINT and must be cast.
    return f"COUNT(*) AS {alias}"
