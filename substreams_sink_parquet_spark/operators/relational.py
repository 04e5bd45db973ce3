"""Scan / projection / filter / aggregation operators (SURVEY.md §2B).

All plans are declared with the DataFrame API: filters and column selections
compile to parquet PushedFilters/ReadSchema, aggregations get map-side partial
aggregation, and Catalyst keeps everything inside whole-stage codegen.
Capability parity targets: the reference delegates querying of its Parquet
lake to downstream engines (reference README.md:3); these are the table-stakes
relational ops over that lake.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..tables import load
from ._helpers import davg, dsum


@register(
    "q_scan",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-06-01'
    """,
    doc="Parquet scan with predicate pushdown + column pruning",
)
def q_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") >= F.lit("1998-06-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    )


@register(
    "q_project",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           l_quantity * 0.5 AS half_qty
    FROM lineitem
    WHERE l_returnflag = 'R'
    """,
    doc="Projection with computed columns (per-row IEEE arithmetic is deterministic)",
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))).alias("charge"),
        (F.col("l_quantity") * 0.5).alias("half_qty"),
    )


@register(
    "q_filter",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_linestatus
    FROM lineitem
    WHERE l_returnflag IN ('A', 'R')
      AND l_quantity BETWEEN 10 AND 30
      AND l_linestatus LIKE 'F%'
      AND (l_returnflag IS NOT DISTINCT FROM 'A' OR l_discount > 0.05)
    """,
    doc="Filter family: IN, BETWEEN, LIKE, null-safe equality",
)
def q_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_returnflag").isin("A", "R")
        & F.col("l_quantity").between(10, 30)
        & F.col("l_linestatus").like("F%")
        & (F.col("l_returnflag").eqNullSafe("A") | (F.col("l_discount") > 0.05))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_linestatus")


@register(
    "q_agg_basic",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style multi-measure hash aggregation (map-side partials)",
)
def q_agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "22,6").alias("sum_disc_price"),
        davg("l_quantity").alias("avg_qty"),
        davg("l_discount").alias("avg_disc"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.count("*").alias("count_order"),
    )


@register(
    "q_agg_distinct",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Distinct aggregation (expand + two-phase agg under AQE)",
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    )


@register(
    "q_agg_approx",
    None,  # approximate results are engine-specific → rows-only check
    doc="approx_count_distinct (HLL++) + approx percentiles; sketch-based, scale path for COUNT DISTINCT",
)
def q_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.percentile_approx("l_extendedprice", [0.5, 0.95], 10000).alias("price_p50_p95"),
    ).select(
        "l_returnflag",
        "approx_parts",
        F.col("price_p50_p95")[0].alias("p50"),
        F.col("price_p50_p95")[1].alias("p95"),
    )


@register(
    "q_agg_approx_delta",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           ABS(approx_count_distinct(l_partkey) - COUNT(DISTINCT l_partkey))
               <= 0.05 * COUNT(DISTINCT l_partkey) AS acd_ok,
           ABS(approx_quantile(CAST(l_extendedprice AS DOUBLE), 0.5)
               - quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5))
               <= 0.05 * quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5)
               AS p50_ok,
           ABS(approx_quantile(CAST(l_extendedprice AS DOUBLE), 0.95)
               - quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95))
               <= 0.05 * quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95)
               AS p95_ok
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="HASHABLE companion to the rows-only q_agg_approx: each engine "
        "checks ITS OWN sketches (HLL distinct count, approx percentiles) "
        "against its own exact aggregates and emits the within-5%-bound "
        "verdict as boolean columns plus the exact distinct count — the "
        "error-bound claim becomes an oracle-hashed row instead of a "
        "pytest-only pin",
)
def q_agg_approx_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("double")
    agg = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey", 0.02).alias("acd"),
        F.percentile_approx(price, 0.5, 10000).alias("p50a"),
        F.percentile(price, F.lit(0.5)).alias("p50e"),
        F.percentile_approx(price, 0.95, 10000).alias("p95a"),
        F.percentile(price, F.lit(0.95)).alias("p95e"),
    )
    ok = lambda a, e: F.abs(F.col(a) - F.col(e)) <= 0.05 * F.col(e)  # noqa: E731
    return agg.select(
        "l_returnflag",
        "exact_parts",
        ok("acd", "exact_parts").alias("acd_ok"),
        ok("p50a", "p50e").alias("p50_ok"),
        ok("p95a", "p95e").alias("p95_ok"),
    )


@register(
    "q_agg_stats_delta",
    """
    WITH s AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS DOUBLE) AS n,
               SUM(q) AS s1, SUM(q*q) AS s2, SUM(q*q*q) AS s3,
               SUM(q*q*q*q) AS s4,
               SUM(p) AS t1, SUM(p*p) AS t2, SUM(q*p) AS sqp,
               stddev_samp(q) AS sd_b, var_pop(q) AS vp_b,
               corr(q, p) AS corr_b, skewness(q) AS skew_b,
               kurtosis(q) AS kurt_b
        FROM (SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS q,
                     CAST(l_extendedprice AS DOUBLE) AS p FROM lineitem)
        GROUP BY l_returnflag
    ),
    m AS (
        SELECT *,
               s2/n - (s1/n)*(s1/n) AS m2,
               s3/n - 3*(s1/n)*(s2/n) + 2*(s1/n)*(s1/n)*(s1/n) AS m3,
               s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n)
                    - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n) AS m4
        FROM s
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
           ABS(sd_b - sqrt(n/(n-1)*m2)) <= 1e-6*GREATEST(ABS(sd_b), 1.0)
               AS sd_ok,
           ABS(vp_b - m2) <= 1e-6*GREATEST(ABS(vp_b), 1.0) AS vp_ok,
           ABS(corr_b - (n*sqp - s1*t1)
               / (sqrt(n*s2 - s1*s1)*sqrt(n*t2 - t1*t1)))
               <= 1e-6*GREATEST(ABS(corr_b), 1.0) AS corr_ok,
           ABS(skew_b - (m3/(m2*sqrt(m2))) * sqrt(n*(n-1))/(n-2))
               <= 1e-6*GREATEST(ABS(skew_b), 1.0) AS skew_ok,
           ABS(kurt_b - ((n-1)/((n-2)*(n-3)))*((n+1)*(m4/(m2*m2) - 3) + 6))
               <= 1e-6*GREATEST(ABS(kurt_b), 1.0) AS kurt_ok
    FROM m
    """,
    doc="HASHABLE companion to the rows-only q_agg_stats_builtin: each "
        "engine re-derives its own moment builtins from raw power sums "
        "and emits within-1e-6 agreement booleans. The closed forms match "
        "each engine's documented definition — Spark's skewness/kurtosis "
        "are population moments (m3/m2^1.5, m4/m2^2-3), DuckDB's are the "
        "sample-adjusted G1/G2 — so the oracle hashes the CLAIM (builtin "
        "== definition) without hashing the order-sensitive doubles",
)
def q_agg_stats_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("double")
    p = F.col("l_extendedprice").cast("double")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(q).alias("s1"), F.sum(q * q).alias("s2"),
        F.sum(q * q * q).alias("s3"), F.sum(q * q * q * q).alias("s4"),
        F.sum(p).alias("t1"), F.sum(p * p).alias("t2"),
        F.sum(q * p).alias("sqp"),
        F.stddev_samp(q).alias("sd_b"), F.var_pop(q).alias("vp_b"),
        F.corr(q, p).alias("corr_b"), F.skewness(q).alias("skew_b"),
        F.kurtosis(q).alias("kurt_b"),
    )
    n, s1 = F.col("n"), F.col("s1")
    mean = s1 / n
    m2 = F.col("s2") / n - mean * mean
    m3 = F.col("s3") / n - 3 * mean * (F.col("s2") / n) + 2 * mean ** 3
    m4 = (F.col("s4") / n - 4 * mean * (F.col("s3") / n)
          + 6 * mean ** 2 * (F.col("s2") / n) - 3 * mean ** 4)
    corr_ref = (n * F.col("sqp") - s1 * F.col("t1")) / (
        F.sqrt(n * F.col("s2") - s1 * s1)
        * F.sqrt(n * F.col("t2") - F.col("t1") * F.col("t1"))
    )
    ok = lambda b, ref: (  # noqa: E731
        F.abs(F.col(b) - ref) <= 1e-6 * F.greatest(F.abs(F.col(b)), F.lit(1.0))
    )
    return s.select(
        "l_returnflag",
        n.cast("long").alias("n_rows"),
        ok("sd_b", F.sqrt(n / (n - 1) * m2)).alias("sd_ok"),
        ok("vp_b", m2).alias("vp_ok"),
        ok("corr_b", corr_ref).alias("corr_ok"),
        # Spark's builtins are POPULATION moments
        ok("skew_b", m3 / (m2 * F.sqrt(m2))).alias("skew_ok"),
        ok("kurt_b", m4 / (m2 * m2) - 3).alias("kurt_ok"),
    )


@register(
    "q_agg_rollup",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP hierarchy aggregation (expands to grouping sets in one shuffle)",
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_rows"), dsum("l_quantity").alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_rows",
            "sum_qty",
        )
    )


@register(
    "q_agg_cube",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE over two dimensions",
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_rows"), dsum("l_extendedprice").alias("sum_price"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_rows",
            "sum_price",
        )
    )


@register(
    "q_agg_collect",
    """
    SELECT l_returnflag,
           array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
           COUNT(DISTINCT l_linestatus) AS n_statuses
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="collect_set → sorted, stringified array (hash-stable array output)",
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.array_join(F.sort_array(F.collect_set("l_linestatus")), ",").alias("statuses"),
        F.countDistinct("l_linestatus").alias("n_statuses"),
    )


@register(
    "q_sort",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    doc="Global multi-key sort + limit (range-partitioned sort; limit pushed to partial TakeOrdered)",
)
def q_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .limit(100)
    )


@register(
    "q_topk",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice, rk
    FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rk
        FROM orders
    )
    WHERE rk <= 3
    """,
    doc="Per-group top-k via ranking window (single shuffle on the group key)",
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        load(spark, sf_dir, "orders")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rk")
    )


@register(
    "q_agg_stats",
    """
    WITH m AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(4,0))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(l_quantity AS DECIMAL(4,0))
                        * CAST(l_quantity AS DECIMAL(4,0))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy,
               CAST(SUM(CAST(l_quantity AS DECIMAL(4,0))
                        * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy,
               median(l_quantity) AS med_qty,
               quantile_cont(l_quantity, 0.25) AS p25_qty
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (sxx - sx * sx / n) / (n - 1) AS var_qty,
           sqrt((sxx - sx * sx / n) / (n - 1)) AS sd_qty,
           (n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qty_price,
           med_qty, p25_qty
    FROM m
    """,
    doc="Statistical aggregates: variance/stddev/corr from exact decimal "
        "moment sums (order-independent, so cross-engine hash-stable — the "
        "built-in stddev/corr accumulate doubles whose merge order varies "
        "with partitioning), plus exact median / percentile_cont",
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(4,0)")
    y = F.col("l_extendedprice").cast("decimal(12,2)")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.median("l_quantity").alias("med_qty"),
        F.percentile("l_quantity", F.lit(0.25)).alias("p25_qty"),
    )
    n = F.col("n").cast("double")
    sx, sxx = F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    var = (sxx - sx * sx / n) / (n - F.lit(1.0))
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return m.select(
        "l_returnflag",
        "n",
        var.alias("var_qty"),
        F.sqrt(var).alias("sd_qty"),
        corr.alias("corr_qty_price"),
        "med_qty",
        "p25_qty",
    )


@register(
    "q_agg_stats_builtin",
    None,  # double-accumulator builtins: merge order varies → rows-only
    doc="Native statistical aggregate builtins: stddev/variance/corr/covar/"
        "skewness/kurtosis (hash-unstable across engines by accumulation "
        "order; the hash-stable decimal-moment versions are q_agg_stats)",
)
def q_agg_stats_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.stddev_samp("l_quantity").alias("sd"),
        F.var_pop("l_quantity").alias("vp"),
        F.corr("l_quantity", "l_extendedprice").alias("corr_qp"),
        F.covar_samp("l_quantity", "l_extendedprice").alias("covar_qp"),
        F.skewness("l_quantity").alias("skew"),
        F.kurtosis("l_quantity").alias("kurt"),
    )


@register(
    "q_agg_conditional",
    """
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
           bool_and(o_totalprice > 900) AS all_above_900,
           bool_or(o_orderstatus = 'F') AS any_finished,
           arg_max(o_totalprice, o_orderkey) AS price_of_max_key,
           arg_min(o_totalprice, o_orderkey) AS price_of_min_key
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Conditional/selective aggregates: count_if, bool_and/bool_or, "
        "max_by/min_by (ordering key unique, so selection is deterministic)",
)
def q_agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 100000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 900).alias("all_above_900"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
        F.max_by("o_totalprice", "o_orderkey").alias("price_of_max_key"),
        F.min_by("o_totalprice", "o_orderkey").alias("price_of_min_key"),
    )


@register(
    "q_agg_bitwise",
    """
    SELECT o_orderpriority,
           bit_and(o_orderkey) AS keys_and,
           bit_or(o_orderkey) AS keys_or,
           bit_xor(o_orderkey) AS keys_xor
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Bitwise aggregates: bit_and / bit_or / bit_xor (exact, "
        "order-independent by definition)",
)
def q_agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.bit_and("o_orderkey").alias("keys_and"),
        F.bit_or("o_orderkey").alias("keys_or"),
        F.bit_xor("o_orderkey").alias("keys_xor"),
    )


@register(
    "q_agg_topk_freq",
    """
    SELECT event_type, user_id AS item, CAST(COUNT(*) AS BIGINT) AS freq
    FROM events
    GROUP BY event_type, user_id
    HAVING COUNT(*) >= 20
    """,
    doc="Heavy hitters via approx_top_k (Spark 4 frequent-items sketch). "
        "The sketch tracks 10k items; fixture user cardinality (150) is far "
        "below that, so counts are exact and the count-threshold cut is "
        "deterministic — which makes the sketch path oracle-checkable "
        "against an exact GROUP BY/HAVING. At real cardinality the same "
        "query runs with k << NDV as a one-pass map-combined approximation "
        "instead of a full shuffle of every (type, user) pair.",
)
def q_agg_topk_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    topk = ev.groupBy("event_type").agg(
        F.expr("approx_top_k(user_id, 500)").alias("tk")
    )
    return (
        topk.select("event_type", F.explode("tk").alias("e"))
        .select(
            "event_type",
            F.col("e.item").alias("item"),
            F.col("e.count").alias("freq"),
        )
        .filter(F.col("freq") >= 20)
    )
