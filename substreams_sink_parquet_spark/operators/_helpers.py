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


def dense_lit(value) -> Column:
    """Array literal (possibly nested) shipped to the JVM in ONE py4j
    crossing (optimization r13, guide §1/§4 driver-cost class).

    ``F.lit`` on a Python list recurses into ``array(*[lit(x) ...])`` —
    one py4j round trip PER ELEMENT, measured ~3 s for a 4096-double
    model table and ~1 s for an 8x16x8 PQ codebook, paid at every query
    BUILD (the DSIR scorer, the PQ/OPQ encode + ADC table, the IVF
    quantizer, LSH hyperplanes). Rendering the same values as one SQL
    ``array(...)`` expression string crosses py4j once and parses
    JVM-side in milliseconds; ConstantFolding collapses the parsed
    CreateArray-of-Literals to the identical folded Literal, so the
    expression tree the executor sees is unchanged.

    Bit-exactness: floats are rendered with ``repr`` (shortest
    round-trip form) and parsed by the same IEEE-754 ``parseDouble``
    path, so every value — including denormals and
    ``1.7976931348623157e308`` — reproduces exactly; NaN/±Infinity get
    explicit CAST forms (verified bit-identical to ``F.lit`` against a
    live session, including element_at folding). Ints mirror ``F.lit``'s
    type mapping: IntegerType inside the int32 range (a bare SQL integer
    literal), LongType (``L`` suffix) beyond it — several consumers
    (``element_at`` index arithmetic in the ADC scorer) require the INT
    form the ``F.lit`` path produced.
    """
    import math

    def leaf(x) -> str:
        if isinstance(x, bool):
            raise TypeError("dense_lit: bool leaves are not supported")
        if isinstance(x, int):
            return str(x) if -2**31 <= x < 2**31 else f"{x}L"
        x = float(x)
        if math.isnan(x):
            return "CAST('NaN' AS DOUBLE)"
        if math.isinf(x):
            return f"CAST('{'-' if x < 0 else ''}Infinity' AS DOUBLE)"
        return repr(x) + "D"

    def rec(u) -> str:
        if isinstance(u, (list, tuple)):
            if len(u) == 0:
                raise ValueError(
                    "dense_lit: empty arrays have no element type — use "
                    "F.array().cast(...) for those")
            return "array(" + ",".join(rec(e) for e in u) + ")"
        return leaf(u)

    return F.expr(rec(value))
