"""Batch equivalents of the event-time streaming operators (SURVEY.md §2B).

``F.window`` / ``F.session_window`` have identical semantics on static and
streaming DataFrames, so the oracle-checked batch versions here certify the
same logic the streaming pipeline (streaming/stream_sink.py) runs with
watermarks. Window starts are emitted as epoch seconds: the fixture ``ts`` is
nanosecond parquet, which engines read at different precisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..tables import load


@register(
    "q_stream_window",
    """
    SELECT user_id,
           CAST(FLOOR(epoch(ts) / 21600) * 21600 AS BIGINT) AS wstart,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY user_id, wstart
    """,
    doc="Tumbling event-time window aggregation (6h), epoch-aligned like F.window",
)
def q_stream_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.window("ts", "6 hours").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("wstart"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "q_stream_window_slide",
    """
    WITH expanded AS (
        SELECT e.*,
               CAST(FLOOR(epoch(ts) / 7200) * 7200 - k.k * 7200 AS BIGINT) AS wstart
        FROM events e, (SELECT UNNEST([0, 1, 2]) AS k) k
        WHERE FLOOR(epoch(ts) / 7200) * 7200 - k.k * 7200 + 21600 > epoch(ts)
    )
    SELECT event_type, wstart, COUNT(*) AS n_events
    FROM expanded
    GROUP BY event_type, wstart
    """,
    doc="Sliding window (6h window, 2h slide): each event lands in 3 windows",
)
def q_stream_window_slide(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type", F.window("ts", "6 hours", "2 hours").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "event_type",
            F.unix_timestamp(F.col("w.start")).alias("wstart"),
            "n_events",
        )
    )


@register(
    "q_stream_session",
    """
    WITH seq AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         >= INTERVAL 30 MINUTE
                     OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sess AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM seq
    )
    SELECT user_id,
           CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS session_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM sess
    GROUP BY user_id, session_id
    """,
    doc="Session window (30 min gap) via F.session_window; oracle sessionizes with lag+cumsum",
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "q_rollup_merge",
    """
    SELECT bucket,
           CAST(SUM(v) AS DOUBLE) AS sum_value,
           COUNT(*) AS n_events,
           CAST(MIN(v) AS DOUBLE) AS min_value,
           CAST(MAX(v) AS DOUBLE) AS max_value,
           CAST(SUM(v) AS DOUBLE) / COUNT(*) AS avg_value
    FROM (
        SELECT CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(ts)) AS BIGINT) % 21600
                   AS bucket,
               CAST(value AS DECIMAL(18,2)) AS v
        FROM events
    )
    GROUP BY bucket
    """,
    doc="Continuous-rollup merge algebra, oracle-proven: Spark computes "
        "per-(bucket, shard) PARTIAL aggregates then merges them with the "
        "rollup's combine (streaming/rollup.py RollupSpec) — the exact "
        "two-phase path the incremental hypertable rollup uses across "
        "micro-batches; the oracle aggregates directly. Equality IS the "
        "associativity proof, hash-checked",
)
def q_rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.rollup import RollupSpec

    ev = load(spark, sf_dir, "events").select(
        F.unix_timestamp("ts").alias("sec"),
        F.col("value").cast("decimal(18,2)").alias("v"),
        F.pmod("event_id", F.lit(7)).alias("shard"),
    )
    spec = RollupSpec(
        bucket_col="sec",
        bucket_size=21600,
        measures={
            "sum_value": ("sum", "v"),
            "n_events": ("count", "*"),
            "min_value": ("min", "v"),
            "max_value": ("max", "v"),
        },
    )
    # phase 1: partials at FINER grain (an artificial shard stands in for
    # the micro-batch boundary); phase 2: the rollup's merge
    partials = ev.groupBy(spec.bucket_expr(), "shard").agg(*spec.partial_aggs())
    merged = partials.groupBy("bucket").agg(*spec.merge_aggs())
    return merged.select(
        "bucket",
        F.col("sum_value").cast("double").alias("sum_value"),
        "n_events",
        F.col("min_value").cast("double").alias("min_value"),
        F.col("max_value").cast("double").alias("max_value"),
        (F.col("sum_value").cast("double") / F.col("n_events")).alias("avg_value"),
    )


@register(
    "q_funnel",
    """
    WITH ev AS (
        SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events
    ),
    v AS (
        SELECT user_id, MIN(sec) AS t1 FROM ev
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT ev.user_id, MIN(ev.sec) AS t2
        FROM ev JOIN v ON ev.user_id = v.user_id
        WHERE ev.event_type = 'click' AND ev.sec > v.t1
        GROUP BY ev.user_id
    ),
    p AS (
        SELECT ev.user_id, MIN(ev.sec) AS t3
        FROM ev JOIN c ON ev.user_id = c.user_id
        WHERE ev.event_type = 'purchase' AND ev.sec > c.t2
        GROUP BY ev.user_id
    )
    SELECT v.user_id,
           1 + CASE WHEN t2 IS NULL THEN 0 ELSE 1 END
             + CASE WHEN t3 IS NULL THEN 0 ELSE 1 END AS steps,
           t3 - t1 AS secs_to_convert
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    """,
    doc="Funnel / ordered-sequence analysis (MATCH_RECOGNIZE stand-in): "
        "earliest strictly-ordered view -> click -> purchase per user via "
        "cascaded min-above-threshold aggregations. Every stage shuffles on "
        "the SAME key (user_id), so at 100 TB the three aggs + joins "
        "co-partition into one exchange lineage; no self-join explosion, "
        "no per-user sort",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("sec")
    )
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("sec").alias("t1"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("sec") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("sec").alias("t2"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("sec") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("sec").alias("t3"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            (
                F.lit(1)
                + F.when(F.col("t2").isNull(), 0).otherwise(1)
                + F.when(F.col("t3").isNull(), 0).otherwise(1)
            ).alias("steps"),
            (F.col("t3") - F.col("t1")).alias("secs_to_convert"),
        )
    )


@register(
    "q_retention",
    """
    WITH ev AS (
        SELECT user_id,
               CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS week
        FROM events
    ),
    cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY user_id),
    active AS (SELECT DISTINCT user_id, week FROM ev)
    SELECT c.cohort_week,
           a.week - c.cohort_week AS weeks_since,
           COUNT(DISTINCT a.user_id) AS n_active
    FROM active a JOIN cohort c ON a.user_id = c.user_id
    GROUP BY c.cohort_week, a.week - c.cohort_week
    """,
    doc="Cohort retention matrix: users bucketed by first-activity week, "
        "counted per week-offset since. cohort and activity stages both "
        "shuffle on user_id (co-partitioned lineage); the final matrix agg "
        "keys on the bounded (cohort, offset) pair — classic "
        "growth-analytics shape, one of the reference's delegated queries",
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / F.lit(604800)).cast("long").alias("week"),
    )
    cohort = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = ev.distinct()
    return (
        active.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("weeks_since"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


@register(
    "q_resample_ohlc",
    """
    WITH b AS (
        SELECT event_type,
               CAST(FLOOR(epoch(ts) / 3600) * 3600 AS BIGINT) AS bucket,
               ts, event_id, value
        FROM events
    ),
    r AS (
        SELECT *,
               -- order on MICROSECOND-truncated time: Spark reads the
               -- nanos-shipped fixture truncated to micros (tables.py),
               -- so sub-microsecond ordering must not decide open/close
               ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                                  ORDER BY epoch_us(ts), event_id) AS rn_a,
               ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                                  ORDER BY epoch_us(ts) DESC, event_id DESC)
                   AS rn_d
        FROM b
    )
    SELECT event_type, bucket,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS volume
    FROM r
    GROUP BY event_type, bucket
    """,
    doc="OHLC time-bucket resample (TimescaleDB time_bucket + first/last, "
        "1h buckets): open/close picked by deterministic (ts, event_id) "
        "order via lexicographic struct min/max INSIDE the one aggregation "
        "— no ranking window pass, one shuffle on the (type, bucket) key; "
        "decimal volume sum for order-independent hashing. The oracle "
        "spells the same selection with ROW_NUMBER, proving the struct "
        "min/max == first/last-by-time equivalence",
)
def q_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    bucket = (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("long")
    # lexicographic struct ordering: (ts, event_id) is unique, so min/max
    # structs ARE the first/last events; .value extracts their price
    first_s = F.min(F.struct("ts", "event_id", "value"))
    last_s = F.max(F.struct("ts", "event_id", "value"))
    return (
        ev.select("event_type", bucket.alias("bucket"), "ts", "event_id", "value")
        .groupBy("event_type", "bucket")
        .agg(
            F.count("*").alias("n_events"),
            first_s["value"].alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            last_s["value"].alias("close"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("volume"),
        )
    )
