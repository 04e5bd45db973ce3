"""Modern SQL surface: recursive CTEs, LATERAL joins, interval window
frames, mergeable HLL sketches, and composite multi-join analytics.

These extend SURVEY.md §2B with the query shapes a downstream consumer of the
sink's parquet lake actually runs (the reference delegates ALL querying to
engines like this — reference README.md "query with DuckDB/Spark" guidance):

- ``q_recursive_cte`` — WITH RECURSIVE (Spark 4) building a month spine and
  left-joining order totals: the standard "report every period, even empty"
  pattern. The recursion is driver-side tiny (one row per month); the join
  against it broadcasts, so at 100 TB the cost is one pass over orders.
- ``q_join_lateral`` — correlated LATERAL subquery with ORDER BY/LIMIT:
  per-group top-k expressed as an index-nested-loop; Catalyst decorrelates it
  into a join + window, so it scales like q_topk (no per-row subquery
  execution).
- ``q_win_range_interval`` — event-time RANGE frame (INTERVAL '1' HOUR
  PRECEDING): trailing time-window analytics over the events table. RANGE
  frames treat equal-ts rows as peers, so no tiebreaker is needed for
  hash stability.
- ``q_agg_hll_sketch`` — Apache DataSketches HLL (Spark 3.5+): per-partition
  sketches merge associatively (register-wise max), which is the 100-TB
  pre-aggregation story: sketch per file/range at ingest, union-merge at
  query time instead of rescanning raw data. Estimates are rows-only checked
  (the sketch family is engine-specific); mergeability == direct-sketch is
  pinned by pytest.
- ``q_composite_topk`` / ``q_composite_volume`` — TPC-H Q3/Q5-shaped
  multi-join pipelines (filter → 3-way/6-way join → agg → top-k): the
  end-to-end plans where AQE join reordering, broadcast selection, and
  partial aggregation all have to fire together.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import register
from ..tables import load


def _view(spark: SparkSession, sf_dir: str, name: str) -> str:
    vname = f"vm_{name}"
    load(spark, sf_dir, name).createOrReplaceTempView(vname)
    return vname


@register(
    "q_recursive_cte",
    """
    WITH RECURSIVE months(m) AS (
        SELECT DATE '1995-01-01'
        UNION ALL
        SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
        WHERE m < DATE '2001-08-01'
    ),
    totals AS (
        SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS om,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders GROUP BY om
    )
    SELECT strftime(m, '%Y-%m') AS month,
           COALESCE(n_orders, 0) AS n_orders,
           COALESCE(total_price, 0.0) AS total_price
    FROM months LEFT JOIN totals ON strftime(m, '%Y-%m') = om
    """,
    doc="WITH RECURSIVE month spine (Spark 4) left-joined to order totals — "
        "every month reported even when empty; spine broadcasts at scale. "
        "NOTE: the 80-iteration spine sits under Spark's default "
        "spark.sql.cteRecursionLevelLimit=100; a longer span needs that "
        "conf raised (or generate the spine with sequence() instead)",
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _view(spark, sf_dir, "orders")
    return spark.sql(f"""
        WITH RECURSIVE months(m) AS (
            SELECT DATE '1995-01-01'
            UNION ALL
            SELECT add_months(m, 1) FROM months WHERE m < DATE '2001-08-01'
        ),
        totals AS (
            SELECT date_format(o_orderdate, 'yyyy-MM') AS om,
                   COUNT(*) AS n_orders,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
            FROM {v} GROUP BY om
        )
        SELECT date_format(m, 'yyyy-MM') AS month,
               COALESCE(n_orders, 0) AS n_orders,
               COALESCE(total_price, 0.0D) AS total_price
        FROM months LEFT JOIN totals ON date_format(m, 'yyyy-MM') = om
    """)


@register(
    "q_join_lateral",
    """
    SELECT n_name, t.c_custkey, t.c_acctbal
    FROM nation, LATERAL (
        SELECT c_custkey, c_acctbal
        FROM customer
        WHERE c_nationkey = n_nationkey
        ORDER BY c_acctbal DESC, c_custkey
        LIMIT 3
    ) t
    """,
    doc="Correlated LATERAL subquery with ORDER BY/LIMIT: per-nation top-3 "
        "customers by balance (Catalyst decorrelates to join + window)",
)
def q_join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    vn = _view(spark, sf_dir, "nation")
    vc = _view(spark, sf_dir, "customer")
    return spark.sql(f"""
        SELECT n_name, t.c_custkey, t.c_acctbal
        FROM {vn}, LATERAL (
            SELECT c_custkey, c_acctbal
            FROM {vc}
            WHERE c_nationkey = n_nationkey
            ORDER BY c_acctbal DESC, c_custkey
            LIMIT 3
        ) t
    """)


@register(
    "q_win_range_interval",
    """
    SELECT user_id,
           CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_sec,
           COUNT(*) OVER w AS n_trailing_1h,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_trailing_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """,
    doc="Event-time RANGE frame: trailing-1h count/sum per user (equal-ts "
        "rows are frame peers, so the result needs no tiebreaker)",
)
def q_win_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _view(spark, sf_dir, "events")
    return spark.sql(f"""
        SELECT user_id,
               unix_timestamp(ts) AS ts_sec,
               COUNT(*) OVER w AS n_trailing_1h,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_trailing_1h
        FROM {v}
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW)
    """)


@register(
    "q_agg_hll_sketch",
    None,  # DataSketches-specific estimates → rows-only driver check;
    # mergeability (union of per-group sketches == direct sketch) is pinned
    # in tests/test_sql_modern.py
    doc="Mergeable HLL sketches (DataSketches, Spark 3.5+): per-event-type "
        "distinct-user estimates plus a union-merged overall estimate — the "
        "pre-aggregated-sketch rollup pattern for 100 TB scans",
)
def q_agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _view(spark, sf_dir, "events")
    return spark.sql(f"""
        WITH per_type AS (
            SELECT event_type, hll_sketch_agg(user_id, 12) AS sk
            FROM {v} GROUP BY event_type
        )
        SELECT event_type,
               hll_sketch_estimate(sk) AS approx_users,
               (SELECT hll_sketch_estimate(hll_union_agg(sk, true)) FROM per_type)
                   AS approx_users_total
        FROM per_type
    """)


@register(
    "q_agg_topk_sketch",
    None,  # sketch tie-order at the k boundary is implementation-specific
    # → rows-only; exactness under a roomy maxItemsTracked is driver-hashed
    # by q_agg_topk_sketch_delta
    doc="Mergeable frequent-items sketches (approx_top_k_*, Spark 4.1): "
        "per-(lang, shard) accumulate, per-lang combine, top-10 word "
        "estimate — the two-level pre-aggregated-sketch rollup: at 100 TB, "
        "sketch per range-file at ingest and answer top-k queries from "
        "KB of merged state instead of re-scanning raw text",
)
def q_agg_topk_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _view(spark, sf_dir, "documents")
    return spark.sql(f"""
        WITH w AS (
            SELECT lang, pmod(doc_id, 8) AS shard, word
            FROM {v} LATERAL VIEW explode(split(text, ' ')) AS word
        ),
        acc AS (
            SELECT lang, shard, approx_top_k_accumulate(word, 4096) AS st
            FROM w GROUP BY lang, shard
        ),
        comb AS (
            SELECT lang, approx_top_k_combine(st, 4096) AS cst
            FROM acc GROUP BY lang
        )
        SELECT lang, e.item AS word, e.count AS est_count
        FROM comb LATERAL VIEW explode(approx_top_k_estimate(cst, 10)) AS e
    """)


@register(
    "q_agg_topk_sketch_delta",
    """
    WITH w AS (
        SELECT lang, UNNEST(str_split(text, ' ')) AS word FROM documents
    )
    SELECT lang,
           CAST(COUNT(DISTINCT word) AS BIGINT) AS n_distinct_words,
           TRUE AS all_counts_exact,
           TRUE AS full_coverage
    FROM w GROUP BY lang
    """,
    doc="HASHABLE companion for the frequent-items sketch rollup (the "
        "approx-delta pattern): with maxItemsTracked (4096) >= the "
        "distinct-word domain of every accumulate group, per-shard "
        "sketches are EXACT counters and combine sums them exactly — so "
        "Spark joins the fully-estimated sketch against its own exact "
        "word counts and claims every count equal and every word "
        "tracked; the oracle recomputes the distinct-word count and "
        "claims both booleans, hash-gating the whole "
        "accumulate/combine/estimate path",
)
def q_agg_topk_sketch_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _view(spark, sf_dir, "documents")
    return spark.sql(f"""
        WITH w AS (
            SELECT lang, pmod(doc_id, 8) AS shard, word
            FROM {v} LATERAL VIEW explode(split(text, ' ')) AS word
        ),
        acc AS (
            SELECT lang, shard, approx_top_k_accumulate(word, 4096) AS st
            FROM w GROUP BY lang, shard
        ),
        comb AS (
            SELECT lang, approx_top_k_combine(st, 4096) AS cst
            FROM acc GROUP BY lang
        ),
        flat AS (
            SELECT lang, e.item AS word, e.count AS est
            FROM comb LATERAL VIEW explode(approx_top_k_estimate(cst, 4096)) AS e
        ),
        exact AS (
            SELECT lang, word, COUNT(*) AS c FROM w GROUP BY lang, word
        )
        SELECT exact.lang,
               CAST(COUNT(DISTINCT exact.word) AS BIGINT) AS n_distinct_words,
               BOOL_AND(flat.est IS NOT NULL AND flat.est = exact.c)
                   AS all_counts_exact,
               COUNT(flat.word) = COUNT(*) AS full_coverage
        FROM exact LEFT JOIN flat
          -- null-safe lang key: a NULL-lang group never matches itself
          -- under plain equality, so its own sketch rows would read as
          -- missing and the verdicts would fail open to FALSE
          ON exact.lang <=> flat.lang AND exact.word = flat.word
        GROUP BY exact.lang
    """)


@register(
    "q_composite_topk",
    """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE)
               AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS odate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1997-03-15'
      AND l_shipdate  > DATE '1997-03-15'
    GROUP BY l_orderkey, odate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3-shaped composite: filter → customer⨝orders⨝lineitem → "
        "agg → global top-10 (broadcast dims + TakeOrderedAndProject)",
)
def q_composite_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    vc = _view(spark, sf_dir, "customer")
    vo = _view(spark, sf_dir, "orders")
    vl = _view(spark, sf_dir, "lineitem")
    return spark.sql(f"""
        SELECT l_orderkey,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE)
                   AS revenue,
               date_format(o_orderdate, 'yyyy-MM-dd') AS odate,
               o_orderpriority
        FROM {vc}
        JOIN {vo} ON c_custkey = o_custkey
        JOIN {vl} ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < DATE '1997-03-15'
          AND l_shipdate  > DATE '1997-03-15'
        GROUP BY l_orderkey, odate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """)


@register(
    "q_composite_volume",
    """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE)
               AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= DATE '1997-01-01'
      AND o_orderdate <  DATE '1998-01-01'
    GROUP BY n_name
    """,
    doc="TPC-H Q5-shaped composite: 6-way join (local-supplier revenue by "
        "nation, ASIA 1997) — AQE reorders, dims broadcast, one shuffle agg",
)
def q_composite_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    vc = _view(spark, sf_dir, "customer")
    vo = _view(spark, sf_dir, "orders")
    vl = _view(spark, sf_dir, "lineitem")
    vs = _view(spark, sf_dir, "supplier")
    vn = _view(spark, sf_dir, "nation")
    vr = _view(spark, sf_dir, "region")
    return spark.sql(f"""
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(22,6))) AS DOUBLE)
                   AS revenue
        FROM {vc}
        JOIN {vo} ON c_custkey = o_custkey
        JOIN {vl} ON l_orderkey = o_orderkey
        JOIN {vs} ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN {vn} ON s_nationkey = n_nationkey
        JOIN {vr} ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= DATE '1997-01-01'
          AND o_orderdate <  DATE '1998-01-01'
        GROUP BY n_name
    """)


@register(
    "q_sql_parameterized",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderstatus = 'F' AND o_totalprice > 100000.0
    GROUP BY o_orderpriority
    """,
    doc="Parameterized SQL (Spark 4): named bind parameters + IDENTIFIER() "
        "table resolution — the injection-safe templating surface; the "
        "oracle is the same query with literals inlined",
)
def q_sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _view(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM IDENTIFIER(:tbl)
        WHERE o_orderstatus = :status AND o_totalprice > :floor
        GROUP BY o_orderpriority
        """,
        args={"tbl": v, "status": "F", "floor": 100000.0},
    )


@register(
    "q_agg_hll_sketch_delta",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_5pct
    FROM events GROUP BY event_type
    """,
    doc="HASHABLE companion for the DataSketches HLL rollup (the "
        "approx-delta pattern): Spark compares its own sketch estimate "
        "(lgK=12, ~1.6% standard error — 5%% is ~3 sigma) against its own "
        "exact distinct count and emits the per-type verdict alongside "
        "the exact count; the oracle recomputes the exact count in SQL "
        "and claims TRUE, so a broken sketch agg/estimate path fails the "
        "driver's hash gate, not just the mergeability pytest",
)
def q_agg_hll_sketch_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _view(spark, sf_dir, "events")
    return spark.sql(f"""
        WITH sk AS (
            SELECT event_type,
                   hll_sketch_estimate(hll_sketch_agg(user_id, 12)) AS approx,
                   COUNT(DISTINCT user_id) AS exact_users
            FROM {v} GROUP BY event_type
        )
        SELECT event_type,
               CAST(exact_users AS BIGINT) AS exact_users,
               ABS(approx - exact_users) / exact_users <= 0.05 AS within_5pct
        FROM sk
    """)
