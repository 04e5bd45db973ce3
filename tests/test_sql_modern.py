"""Modern SQL surface: recursive CTE spine, LATERAL top-k, interval RANGE
frames, HLL sketch mergeability, composite multi-join pipelines.

The five oracled queries are hash-gated by the driver; these tests pin the
properties the oracle can't see (sketch merge semantics, spine completeness,
LATERAL row bounds).
"""

from pyspark.sql import functions as F

from substreams_sink_parquet_spark.catalog import queries
from substreams_sink_parquet_spark.tables import load

SF = "/root/testdata/sf0.001"


def test_recursive_cte_spine_is_complete(spark):
    rows = queries()["q_recursive_cte"](spark, SF).collect()
    months = sorted(r["month"] for r in rows)
    # spine covers 1995-01 .. 2001-08 inclusive = 80 months, even where the
    # small fixture has no orders
    assert len(months) == 80
    assert months[0] == "1995-01" and months[-1] == "2001-08"
    assert all(r["n_orders"] >= 0 for r in rows)


def test_lateral_topk_bounded_per_group(spark):
    rows = queries()["q_join_lateral"](spark, SF).collect()
    per_nation: dict[str, list[float]] = {}
    for r in rows:
        per_nation.setdefault(r["n_name"], []).append(r["c_acctbal"])
    for bals in per_nation.values():
        assert len(bals) <= 3
        assert bals == sorted(bals, reverse=True)


def test_hll_sketch_union_matches_direct(spark):
    """Merging per-group sketches must equal sketching the whole column —
    the associativity that makes sketch rollups valid at scale."""
    ev = load(spark, SF, "events")
    ev.createOrReplaceTempView("hll_ev")
    merged = spark.sql("""
        SELECT hll_sketch_estimate(hll_union_agg(sk, true)) AS est
        FROM (SELECT event_type, hll_sketch_agg(user_id, 12) AS sk
              FROM hll_ev GROUP BY event_type)
    """).first()["est"]
    direct = spark.sql(
        "SELECT hll_sketch_estimate(hll_sketch_agg(user_id, 12)) AS est FROM hll_ev"
    ).first()["est"]
    assert merged == direct
    # at fixture cardinality the estimate is exact
    exact = ev.select("user_id").distinct().count()
    assert merged == exact


def test_hll_query_total_consistent(spark):
    rows = queries()["q_agg_hll_sketch"](spark, SF).collect()
    totals = {r["approx_users_total"] for r in rows}
    assert len(totals) == 1  # same union estimate on every row
    assert all(r["approx_users"] <= r["approx_users_total"] for r in rows)


def test_composite_topk_plan_broadcasts_and_limits(spark):
    df = queries()["q_composite_topk"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # top-k never global-sorts
    rows = df.collect()
    assert len(rows) <= 10
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)
