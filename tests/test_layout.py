"""Bucketed-layout plan properties: a join of two co-bucketed tables must
run with zero shuffle exchanges; the one-time layout shuffle happens at
write, not per query."""

import pytest
from pyspark.sql import functions as F

from substreams_sink_parquet_spark.layout import bucketize, read_bucketed
from substreams_sink_parquet_spark.plans import plan_report
from substreams_sink_parquet_spark.tables import load


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    warehouse = tmp_path_factory.mktemp("warehouse")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    bucketize(li, "b_lineitem", ["l_orderkey"], 4,
              sort_cols=["l_orderkey"], path=str(warehouse / "b_lineitem"))
    bucketize(orders, "b_orders", ["o_orderkey"], 4,
              sort_cols=["o_orderkey"], path=str(warehouse / "b_orders"))
    yield
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_cobucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    li = read_bucketed(spark, "b_lineitem")
    orders = read_bucketed(spark, "b_orders")
    # force SMJ so the broadcast path can't mask the bucketing property
    joined = li.hint("merge").join(
        orders, li.l_orderkey == orders.o_orderkey
    )
    rep = plan_report(joined)
    assert rep.shuffle_exchanges == 0, rep.text
    # and it still returns the right rows
    expected = (
        load(spark, sf_dir, "lineitem")
        .join(load(spark, sf_dir, "orders"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert joined.count() == expected


def test_agg_on_bucket_key_has_no_shuffle(spark, bucketed_tables):
    li = read_bucketed(spark, "b_lineitem")
    rep = plan_report(li.groupBy("l_orderkey").agg(F.sum("l_quantity")))
    assert rep.shuffle_exchanges == 0, rep.text
