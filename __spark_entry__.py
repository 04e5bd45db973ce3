"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the full operator catalog from SURVEY.md §2 (declared
in substreams_sink_parquet_spark/catalog.py) for the sf0.01 DuckDB-oracle
correctness gate.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q3-style shipping-priority revenue top-10.

    Broadcast dimension join (customer segment filter pushed below the join)
    → fact aggregation with order-independent decimal partial sums → top-k.
    """
    from pyspark.sql import functions as F

    from substreams_sink_parquet_spark.operators._helpers import dsum
    from substreams_sink_parquet_spark.tables import load

    sf_dir = "/root/testdata/sf0.001"
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "22,6").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
        )
        .limit(10)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from substreams_sink_parquet_spark import catalog

    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    from substreams_sink_parquet_spark import catalog

    return catalog.oracle_sql()
