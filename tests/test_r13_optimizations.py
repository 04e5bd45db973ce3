"""Focused pins for the round-13 optimization internals.

Each test pins an equivalence the optimization relies on, so a future
refactor cannot silently break it: tiny_df/collected_df must reproduce the
pickle path's rows and schema exactly; _band_rows must equal the historical
inline band expansion; profile_table's split exact mode must equal the
single-aggregate formulation; line_dedup's window hotness must match
COUNT(DISTINCT) semantics including null doc_ids.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from substreams_sink_parquet_spark.operators._helpers import (
    collected_df,
    tiny_df,
)


@pytest.fixture(scope="module")
def spark():
    from substreams_sink_parquet_spark.session import get_spark

    return get_spark("test-r13-opt")


def test_tiny_df_matches_pickle_path_rows_and_schema(spark):
    rows = [
        (1, 10**12, "ab c", 1.5, [0.1, 0.2], True),
        (2, 5, "x", -0.0, [1.0], False),
        (3, None, None, None, None, None),
    ]
    ddl = ("a int, b bigint, s string, d double, v array<double>, "
           "f boolean")
    a = spark.createDataFrame(rows, ddl)
    b = tiny_df(spark, rows, ddl)
    assert a.schema == b.schema
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_tiny_df_nested_struct_and_empty(spark):
    ddl = "g string, _barr array<struct<score:double, doc_id:bigint>>"
    rows = [("x", [(1.5, 7), (0.25, 9)]), ("y", [])]
    a = spark.createDataFrame(rows, ddl)
    b = tiny_df(spark, rows, ddl)
    assert a.schema == b.schema
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # empty input keeps the declared schema
    e = tiny_df(spark, [], "doc_id long")
    assert e.schema == spark.createDataFrame([], "doc_id long").schema
    assert e.count() == 0


def test_tiny_df_scan_is_jvm_side(spark):
    # the whole point: no Python-eval node in the scan of a control table
    df = tiny_df(spark, [(1, "a"), (2, "b")], "i int, s string")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_collected_df_single_partition_exact_rows(spark):
    src = spark.range(10).select(
        F.col("id").alias("a"),
        F.when(F.col("id") % 3 == 0, None).otherwise(F.col("id") * 1.5)
        .alias("d"),
    )
    rows = src.collect()
    back = collected_df(spark, rows, src.schema)
    assert back.rdd.getNumPartitions() == 1
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, rows))
    assert back.schema == src.schema


def test_band_rows_equals_inline_band_expansion(spark):
    from substreams_sink_parquet_spark.llm.dedup import (
        _band_rows,
        banded_minhash,
        minhash_signatures,
        spread_if_narrow,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i % 3} common words here for shingles {i}") for i in range(30)],
        "doc_id long, text string",
    )
    base = spread_if_narrow(
        docs.select("doc_id", "text").filter(F.size(F.split("text", " ")) >= 3)
    )
    sigs = minhash_signatures(base, n=3, num_hashes=32)
    via_split = sorted(map(tuple, _band_rows(sigs, 32, 8).collect()))
    via_banded = sorted(map(tuple, banded_minhash(docs, 3, 32, 8).collect()))
    assert via_split == via_banded


def test_profile_exact_split_equals_single_aggregate(spark):
    from substreams_sink_parquet_spark.operators.profiling import (
        _repr_expr,
        profile_table,
    )

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (2, None, 3.25), (4, "a", 1.5)],
        "k bigint, s string, d double",
    )
    cols = ["k", "s", "d"]
    got = sorted(map(tuple, profile_table(df, cols, exact_distinct=True).collect()))
    # the historical one-aggregate formulation, inlined as the spec
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).alias(f"__mn_{c}"),
            F.max(F.col(c)).alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)
    entries = F.array(*[
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
            F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
            _repr_expr(dtypes[c], F.col(f"__mn_{c}")).alias("min_repr"),
            _repr_expr(dtypes[c], F.col(f"__mx_{c}")).alias("max_repr"),
        )
        for c in cols
    ])
    want = sorted(map(tuple, wide.select(F.inline(entries)).collect()))
    assert got == want


def test_line_dedup_window_hotness_null_doc_ids(spark):
    # COUNT(DISTINCT doc_id) ignores nulls: a line seen in one real doc and
    # two null-id rows must NOT be hot at min_dup_docs=2 (the lag-marker
    # formulation excludes null doc_ids explicitly)
    from substreams_sink_parquet_spark.llm.dedup import line_dedup

    docs = spark.createDataFrame(
        [
            (1, "shared line\nunique to one"),
            (None, "shared line"),
            (None, "shared line"),
            (2, "another doc\nentirely"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in line_dedup(docs, min_dup_docs=2).collect()}
    # doc 1 keeps both lines: "shared line" appears in docs {1, null, null}
    # -> 1 distinct non-null doc, below the threshold
    assert out[1].n_removed == 0
    assert out[1].clean_text == "shared line\nunique to one"
