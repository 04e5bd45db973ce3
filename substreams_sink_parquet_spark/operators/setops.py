"""Set operations (SURVEY.md §2B): UNION ALL / UNION / INTERSECT / EXCEPT
and the multiset (ALL) variants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..tables import load


@register(
    "q_setop_union_all",
    """
    SELECT c_nationkey AS nationkey, 'customer' AS src FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS src FROM supplier
    """,
    doc="UNION ALL with provenance marker (no shuffle: pure concatenation)",
)
def q_setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("src")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("src")
    )
    return c.unionByName(s)


@register(
    "q_setop_union",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="UNION DISTINCT (concat + hash-distinct)",
)
def q_setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).distinct()


@register(
    "q_setop_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="INTERSECT (distinct semantics)",
)
def q_setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "q_setop_except",
    """
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 320000
    """,
    doc="EXCEPT (distinct semantics): customers in the mid price band only",
)
def q_setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    mid = orders.filter(F.col("o_totalprice") > 250000).select(F.col("o_custkey").alias("custkey"))
    top = orders.filter(F.col("o_totalprice") > 320000).select(F.col("o_custkey").alias("custkey"))
    return mid.subtract(top)


@register(
    "q_setop_except_all",
    """
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="EXCEPT ALL (multiset difference: occurrence counting)",
)
def q_setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    f = orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return o.exceptAll(f)


@register(
    "q_setop_intersect_all",
    """
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="INTERSECT ALL (multiset intersection)",
)
def q_setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    f = orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return o.intersectAll(f)
