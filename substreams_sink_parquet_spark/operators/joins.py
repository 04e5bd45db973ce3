"""Join family (SURVEY.md §2B): inner / outer / broadcast / semi / anti /
range (non-equi) / as-of.

Catalyst picks the physical strategy (broadcast-hash vs sort-merge vs
shuffled-hash) from statistics + AQE; ``q_join_broadcast`` pins the hint the
way a user would for a known-small dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..tables import load
from ._helpers import dsum
from .asof import asof_join


@register(
    "q_join_inner",
    """
    SELECT o.o_orderkey, c.c_name, c.c_mktsegment, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    """,
    doc="Inner equi-join; filter pushed below the join on the dimension side",
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return orders.join(cust, orders.o_custkey == cust.c_custkey, "inner").select(
        "o_orderkey", "c_name", "c_mktsegment", "o_totalprice"
    )


@register(
    "q_join_left",
    """
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_totalprice > 150000
    """,
    doc="Left outer join with a join-side predicate (NULL-extended misses)",
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    cond = (cust.c_custkey == orders.o_custkey) & (orders.o_totalprice > 150000)
    return cust.join(orders, cond, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@register(
    "q_join_right",
    """
    SELECT o.o_orderkey, o.o_totalprice, c.c_custkey, c.c_name
    FROM orders o RIGHT JOIN customer c
      ON o.o_custkey = c.c_custkey AND o.o_totalprice > 150000
    """,
    doc="Right outer join with a join-side predicate (NULL-extended misses "
        "on the order side); completes the left/right/full row of SURVEY §2B",
)
def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    cond = (orders.o_custkey == cust.c_custkey) & (orders.o_totalprice > 150000)
    return orders.join(cust, cond, "right").select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name"
    )


@register(
    "q_join_full",
    """
    WITH neg AS (SELECT * FROM customer WHERE c_acctbal < 0),
         big AS (SELECT * FROM orders WHERE o_totalprice > 250000)
    SELECT n.c_custkey, n.c_name, b.o_orderkey, b.o_totalprice
    FROM neg n FULL OUTER JOIN big b ON n.c_custkey = b.o_custkey
    """,
    doc="Full outer join with NULLs generated on both sides",
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    neg = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 0)
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    return neg.join(big, neg.c_custkey == big.o_custkey, "full").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@register(
    "q_join_broadcast",
    """
    SELECT p.p_brand,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(22,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size <= 15
    GROUP BY p.p_brand
    """,
    doc="Broadcast-hash join: small dim shipped to every task, no fact shuffle for the join",
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_size") <= 15)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "22,6").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q_join_semi",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    """,
    doc="Left-semi join (EXISTS): no right-side payload duplication",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    fo = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(fo, cust.c_custkey == fo.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_anti",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
    doc="Left-anti join (NOT EXISTS): customers with no large order",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_range",
    """
    SELECT s.s_suppkey, s.s_name, COUNT(*) AS n_richer_customers
    FROM supplier s JOIN customer c
      ON s.s_nationkey = c.c_nationkey AND c.c_acctbal > s.s_acctbal
    GROUP BY s.s_suppkey, s.s_name
    """,
    doc="Range (non-equi) join: equi key prunes the search, inequality refines",
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load(spark, sf_dir, "supplier")
    cust = load(spark, sf_dir, "customer")
    cond = (sup.s_nationkey == cust.c_nationkey) & (cust.c_acctbal > sup.s_acctbal)
    return sup.join(cust, cond).groupBy("s_suppkey", "s_name").agg(
        F.count("*").alias("n_richer_customers")
    )


@register(
    "q_join_asof",
    """
    WITH purchases AS (SELECT * FROM events WHERE event_type = 'purchase'),
         signups   AS (SELECT * FROM events WHERE event_type = 'signup')
    SELECT p.event_id, p.user_id,
           s.event_id AS signup_event_id,
           CAST(FLOOR(epoch(s.ts)) AS BIGINT) AS signup_epoch
    FROM purchases p ASOF LEFT JOIN signups s
      ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
    doc="As-of join: latest signup at-or-before each purchase (union + last(ignorenulls), one shuffle)",
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("event_id").alias("s_event_id")
    )
    joined = asof_join(
        purchases, signups, on="user_id", left_ts="ts", right_ts="ts",
        right_cols=["s_event_id", "ts"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("s_event_id_matched").alias("signup_event_id"),
        F.unix_timestamp("ts_matched").alias("signup_epoch"),
    )


@register(
    "q_join_cross",
    """
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
    doc="Cross join of two small dims (broadcast nested-loop, never a "
        "partitioned CartesianProduct)",
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load(spark, sf_dir, "region").select("r_name")
    nation = load(spark, sf_dir, "nation").select("n_name")
    return region.crossJoin(F.broadcast(nation))


@register(
    "q_join_asof_fwd",
    """
    WITH purchases AS (SELECT * FROM events WHERE event_type = 'purchase'),
         signups   AS (SELECT * FROM events WHERE event_type = 'signup')
    SELECT p.event_id, p.user_id,
           CASE WHEN s.ts IS NOT NULL
                 AND epoch(s.ts) - epoch(p.ts) <= 7200.0
                THEN s.event_id END AS next_signup_id,
           CASE WHEN s.ts IS NOT NULL
                 AND epoch(s.ts) - epoch(p.ts) <= 7200.0
                THEN CAST(FLOOR(epoch(s.ts)) AS BIGINT) END AS next_signup_epoch
    FROM purchases p ASOF LEFT JOIN signups s
      ON p.user_id = s.user_id AND p.ts <= s.ts
    """,
    doc="Forward as-of join with tolerance: earliest signup at-or-after each "
        "purchase, matches farther than 2h nulled (pandas merge_asof parity; "
        "same one-shuffle union formulation, first(ignorenulls) forward)",
)
def q_join_asof_fwd(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", F.col("event_id").alias("s_event_id")
    )
    joined = asof_join(
        purchases, signups, on="user_id", left_ts="ts", right_ts="ts",
        right_cols=["s_event_id", "ts"],
        direction="forward", tolerance=7200.0,
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("s_event_id_matched").alias("next_signup_id"),
        F.unix_timestamp("ts_matched").alias("next_signup_epoch"),
    )
