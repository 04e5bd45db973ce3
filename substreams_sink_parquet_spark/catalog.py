"""Central query catalog.

Every operator from SURVEY.md §2 that we implement is registered here as a
``QuerySpec``: a Spark DataFrame builder ``fn(spark, sf_dir)`` plus (when the
semantics are ANSI-SQL-expressible) a DuckDB ``oracle`` SQL string computing
the same result over the same parquet tables. The driver contract
(/root/repo/__spark_entry__.py) exposes these via ``queries()`` /
``oracle_sql()``.

Hash-stability rules used throughout (the driver compares row-count + schema +
order-insensitive value hash, with columns sorted by name):

- every computed column is aliased identically in Spark and SQL;
- double aggregations go through DECIMAL(18,2) partial sums so the result does
  not depend on accumulation order, then cast back to DOUBLE;
- DuckDB integer SUMs are cast to BIGINT (DuckDB widens to HUGEINT);
- timestamps are projected as DATE or formatted strings (the fixtures mix
  ms/us/ns units across engines);
- arrays are stringified (sorted, comma-joined) — never emitted raw;
- each window / top-k ordering includes a unique tiebreaker key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None  # None => driver does a rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a query builder to the catalog."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query id {name!r}")
        _REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def registry() -> dict[str, QuerySpec]:
    """All registered queries (imports the operator modules on first use)."""
    # Import for side effect of registration.
    from .operators import relational, joins, windows, setops, scalar_fns, skew, sql_modern, sql_surface, streaming_equiv, udfs, profiling  # noqa: F401
    from .llm import bpe, dedup, sampling, similarity, text  # noqa: F401
    from .llm import export, lexical_index, lm, multimodal, quality_model  # noqa: F401
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in registry().items() if spec.oracle is not None}
