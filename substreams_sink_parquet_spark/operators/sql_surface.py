"""SQL-parser-facing operators (SURVEY.md §2B追加): scalar / IN / correlated
EXISTS subqueries, PIVOT/UNPIVOT, explicit GROUPING SETS. These run through
``spark.sql`` over temp views — certifying the SQL surface in addition to the
DataFrame API (Catalyst de-correlates the subqueries into joins; the plan
tests assert no cartesian products sneak in).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register
from ..tables import load


def _view(spark: SparkSession, sf_dir: str, name: str) -> str:
    vname = f"v_{name}"
    load(spark, sf_dir, name).createOrReplaceTempView(vname)
    return vname


@register(
    "q_subquery_scalar",
    """
    SELECT o_orderkey, o_totalprice,
           o_totalprice - (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                                  / COUNT(*) FROM orders) AS diff_from_avg
    FROM orders
    WHERE o_totalprice > 1.5 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                                     / COUNT(*) FROM orders)
    """,
    doc="Scalar subquery (computed once, broadcast into the filter/projection)",
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _view(spark, sf_dir, "orders")
    return spark.sql(f"""
        SELECT o_orderkey, o_totalprice,
               o_totalprice - (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                                      / COUNT(*) FROM {v}) AS diff_from_avg
        FROM {v}
        WHERE o_totalprice > 1.5 * (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                                         / COUNT(*) FROM {v})
    """)


@register(
    "q_subquery_in",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_nationkey IN (SELECT n_nationkey FROM nation
                          WHERE n_regionkey = (SELECT r_regionkey FROM region
                                               WHERE r_name = 'ASIA'))
    """,
    doc="IN subquery with a nested scalar subquery (decorrelated to semi-join)",
)
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    vc = _view(spark, sf_dir, "customer")
    vn = _view(spark, sf_dir, "nation")
    vr = _view(spark, sf_dir, "region")
    return spark.sql(f"""
        SELECT c_custkey, c_name
        FROM {vc}
        WHERE c_nationkey IN (SELECT n_nationkey FROM {vn}
                              WHERE n_regionkey = (SELECT r_regionkey FROM {vr}
                                                   WHERE r_name = 'ASIA'))
    """)


@register(
    "q_subquery_exists",
    """
    SELECT s_suppkey, s_name
    FROM supplier s
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49)
    """,
    doc="Correlated EXISTS subquery (decorrelated to left-semi join)",
)
def q_subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    vs = _view(spark, sf_dir, "supplier")
    vl = _view(spark, sf_dir, "lineitem")
    return spark.sql(f"""
        SELECT s_suppkey, s_name
        FROM {vs} s
        WHERE EXISTS (SELECT 1 FROM {vl} l
                      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49)
    """)


@register(
    "q_pivot",
    """
    SELECT l_returnflag,
           CAST(COUNT(*) FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS F_cnt,
           CAST(COUNT(*) FILTER (WHERE l_linestatus = 'O') AS BIGINT) AS O_cnt
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="PIVOT: linestatus values to columns with per-cell counts",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    from pyspark.sql import functions as F

    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.count(F.lit(1)))
        .select(
            "l_returnflag",
            F.coalesce("F", F.lit(0)).alias("F_cnt"),
            F.coalesce("O", F.lit(0)).alias("O_cnt"),
        )
    )


@register(
    "q_unpivot",
    """
    SELECT c_custkey, 'acctbal' AS measure, c_acctbal AS value FROM customer
    UNION ALL
    SELECT c_custkey, 'nationkey' AS measure, CAST(c_nationkey AS DOUBLE) AS value
    FROM customer
    """,
    doc="UNPIVOT/melt: wide columns to (measure, value) rows",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    from pyspark.sql import functions as F

    return cust.select(
        "c_custkey", F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    ).unpivot("c_custkey", ["acctbal", "nationkey"], "measure", "value")


@register(
    "q_agg_grouping_sets",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    doc="Explicit GROUPING SETS (neither pure rollup nor cube)",
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _view(spark, sf_dir, "lineitem")
    return spark.sql(f"""
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               COUNT(*) AS n_rows
        FROM {v}
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """)


@register(
    "q_agg_listagg",
    """
    SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, '|' ORDER BY o_orderstatus) AS statuses,
           string_agg(CAST(o_orderkey AS VARCHAR), ','
                      ORDER BY o_totalprice DESC, o_orderkey) FILTER (
               WHERE o_totalprice > 400000) AS top_keys
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Ordered string aggregation: LISTAGG ... WITHIN GROUP (Spark 4) vs "
        "DuckDB ordered string_agg — deterministic via explicit ordering "
        "with a unique tiebreaker",
)
def q_agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_la")
    return spark.sql("""
        SELECT o_orderpriority,
               listagg(DISTINCT o_orderstatus, '|')
                   WITHIN GROUP (ORDER BY o_orderstatus) AS statuses,
               listagg(CASE WHEN o_totalprice > 400000
                            THEN CAST(o_orderkey AS STRING) END, ',')
                   WITHIN GROUP (ORDER BY o_totalprice DESC, o_orderkey) AS top_keys
        FROM orders_la
        GROUP BY o_orderpriority
    """)


@register(
    "q_agg_mode",
    """
    SELECT l_returnflag, l_linestatus,
           mode() WITHIN GROUP (ORDER BY l_quantity) AS mode_qty,
           mode() WITHIN GROUP (ORDER BY l_tax) AS mode_tax,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY ALL
    """,
    doc="Sorted-mode aggregate (mode() WITHIN GROUP, Spark 4) + GROUP BY "
        "ALL — ties resolve to the ordering minimum in both engines, so "
        "the result is deterministic and hash-checkable",
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _view(spark, sf_dir, "lineitem")
    return spark.sql(f"""
        SELECT l_returnflag, l_linestatus,
               mode() WITHIN GROUP (ORDER BY l_quantity) AS mode_qty,
               mode() WITHIN GROUP (ORDER BY l_tax) AS mode_tax,
               COUNT(*) AS n_rows
        FROM {v}
        GROUP BY ALL
    """)
