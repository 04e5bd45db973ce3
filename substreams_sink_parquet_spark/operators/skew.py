"""Skew mitigation: salted joins and two-phase aggregation.

AQE's skew-join splitting (on in session.py) handles most runtime skew, but
two explicit techniques remain necessary at 100 TB when a handful of keys
dominate (the zero-address, a hot contract, an empty-string default):

- ``salted_join``: fact rows scatter across S sub-keys via a deterministic
  hash salt; the (small) build side replicates S times. The shuffle then
  spreads one hot key over S reducers instead of melting one. Semantically
  identical to the plain join — registered with the PLAIN join as its oracle.
- ``two_phase_agg``: partial aggregate on (key, salt), final aggregate on
  key. Turns one hot reducer into S partials + a tiny final exchange. Only
  valid for algebraic aggregates (sum/count/min/max) — exposed per-aggregate
  rather than generically.

Salts are deterministic (hash of a unique column, not rand()) so retries,
resumed stages, and the correctness oracle all see the same rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..catalog import register
from ..tables import load


def with_salt(df: DataFrame, unique_col: str, n_salts: int,
              out_col: str = "__salt") -> DataFrame:
    """Deterministic salt 0..n_salts-1 from a unique column's hash."""
    return df.withColumn(
        out_col, F.pmod(F.xxhash64(unique_col), F.lit(n_salts)).cast("int")
    )


def replicate_salts(df: DataFrame, n_salts: int, out_col: str = "__salt") -> DataFrame:
    """Cross the (small) build side with salt values 0..n_salts-1."""
    return df.withColumn(
        out_col, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )


def salted_join(fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str,
                fact_unique: str, n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Join with the fact side's hot keys scattered over n_salts sub-keys.

    ``dim`` is replicated n_salts times, so it should be the small side
    (when it is broadcastable, prefer F.broadcast — salting only matters
    once both sides are too big to broadcast AND keys are skewed).

    Only fact-side-preserving joins are semantics-preserving under dim
    replication: with right/full outer, an UNMATCHED dim row would surface
    once per salt (n_salts duplicate null-extended rows)."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' only (got {how!r}): "
            "replicating the dim side emits unmatched dim rows once per salt "
            "under right/full outer joins"
        )
    f = with_salt(fact, fact_unique, n_salts)
    d = replicate_salts(dim, n_salts)
    joined = f.join(
        d, (f[fact_key] == d[dim_key]) & (f["__salt"] == d["__salt"]), how
    )
    return joined.drop("__salt")


def two_phase_sum(df: DataFrame, group_col: str, value: Column, alias: str,
                  unique_col: str, n_salts: int = 8) -> DataFrame:
    """SUM(value) GROUP BY group_col, computed as salted partials + final."""
    partial = (
        with_salt(df, unique_col, n_salts)
        .groupBy(group_col, "__salt")
        .agg(F.sum(value).alias("__part"))
    )
    return partial.groupBy(group_col).agg(F.sum("__part").alias(alias))


@register(
    "q_skew_salted_join",
    """
    SELECT l.l_orderkey, l.l_quantity, o.o_orderpriority
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_totalprice > 150000
    """,
    doc="Skew-mitigated salted join — semantically identical to the plain "
        "join (the oracle), with hot fact keys scattered over 8 hash salts",
)
def q_skew_salted_join(spark, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 150000
    ).select("o_orderkey", "o_orderpriority")
    j = salted_join(li, orders, "l_orderkey", "o_orderkey",
                    fact_unique="l_linenumber", n_salts=8)
    return j.select("l_orderkey", "l_quantity", "o_orderpriority")


@register(
    "q_skew_two_phase_agg",
    """
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Two-phase (salted) aggregation over a low-cardinality hot key — "
        "decimal partials keep it order-independent, so it hash-matches the "
        "single-phase oracle",
)
def q_skew_two_phase_agg(spark, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return two_phase_sum(
        li, "l_returnflag",
        F.col("l_quantity").cast("decimal(18,2)"), "sum_qty",
        unique_col="l_orderkey", n_salts=8,
    ).withColumn("sum_qty", F.col("sum_qty").cast("double"))
