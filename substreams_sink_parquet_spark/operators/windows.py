"""Window functions (SURVEY.md §2B): ranking, analytic lag/lead/first/last,
and explicit ROWS/RANGE frames.

Window ordering always includes a unique tiebreaker so results are
deterministic; frame sums go through DECIMAL so the sliding-accumulation
strategy (Spark's running buffer vs DuckDB's segment tree) cannot change
low-order float bits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import register
from ..tables import load


@register(
    "q_win_rank",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_orderstatus) AS rk,
           DENSE_RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_orderstatus) AS drk,
           NTILE(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
    """,
    doc="Ranking windows: row_number / rank / dense_rank / ntile",
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w_status = Window.partitionBy("o_orderpriority").orderBy("o_orderstatus")
    return orders.select(
        "o_orderpriority",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w_status).alias("rk"),
        F.dense_rank().over(w_status).alias("drk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "q_win_lag",
    """
    SELECT event_id, user_id, value,
           LAG(value) OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           FIRST_VALUE(event_id) OVER w AS first_event,
           CAST(FLOOR(epoch(ts)) AS BIGINT)
             - CAST(FLOOR(epoch(LAG(ts) OVER w)) AS BIGINT) AS gap_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="Analytic windows: lag / lead / first_value + event-time gaps",
)
def q_win_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("event_id").over(w).alias("first_event"),
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))).alias("gap_s"),
    )


@register(
    "q_win_frame",
    """
    SELECT event_id, user_id, value,
           CAST(SUM(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_sum,
           CAST(SUM(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS moving_sum3,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY event_id
                          RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS n_recent_ids
    FROM events
    """,
    doc="Window frames: running sum (ROWS UNBOUNDED), moving sum (ROWS 2 PRECEDING), RANGE frame",
)
def q_win_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dec = F.col("value").cast("decimal(18,2)")
    running = (
        F.sum(dec).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
    )
    moving = F.sum(dec).over(w.rowsBetween(-2, Window.currentRow)).cast("double")
    w_range = Window.partitionBy("user_id").orderBy("event_id").rangeBetween(-100, 0)
    return ev.select(
        "event_id",
        "user_id",
        "value",
        running.alias("running_sum"),
        moving.alias("moving_sum3"),
        F.count("*").over(w_range).alias("n_recent_ids"),
    )


@register(
    "q_win_dist",
    """
    SELECT o_orderpriority, o_orderkey,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd,
           ntile(7) OVER w AS bucket7
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
    doc="Distribution windows: percent_rank / cume_dist / ntile (exact "
        "rational doubles — single IEEE division of small ints, hash-stable)",
)
def q_win_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderpriority",
        "o_orderkey",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(7).over(w).alias("bucket7"),
    )


@register(
    "q_win_nth",
    """
    SELECT o_orderpriority, o_orderkey,
           first_value(o_orderkey) OVER w AS cheapest_key,
           last_value(o_orderkey) OVER (PARTITION BY o_orderpriority
                                        ORDER BY o_totalprice, o_orderkey
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                                 AND UNBOUNDED FOLLOWING) AS priciest_key,
           nth_value(o_orderkey, 3) OVER w AS third_key
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    doc="Positional window values: first_value / last_value / nth_value over "
        "an unbounded frame (unique ordering key for determinism)",
)
def q_win_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_orderpriority",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("cheapest_key"),
        F.last("o_orderkey").over(w).alias("priciest_key"),
        F.nth_value("o_orderkey", 3).over(w).alias("third_key"),
    )


@register(
    "q_win_fill_forward",
    """
    SELECT event_id, user_id, v,
           LAST_VALUE(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS v_filled
    FROM (
        SELECT event_id, user_id, ts,
               CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
        FROM events
    )
    """,
    doc="Forward-fill (gap-fill) of missing readings: last non-null value "
        "per user in event-time order — last(ignorenulls) over a running "
        "frame; the canonical time-series imputation, one shuffle on the "
        "partition key",
)
def q_win_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    v = F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        v.alias("v"),
        F.last(v, ignorenulls=True).over(w).alias("v_filled"),
    )
