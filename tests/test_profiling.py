"""Table profiler + fixed-bound histogram (operators/profiling.py).

The oracle gate pins q_profile_columns / q_profile_histogram against DuckDB;
these tests pin the parts the gate can't see: the approx-distinct scale mode
(sketch exchange, no Expand) against the exact answers, native-type min/max
ordering, and the histogram's clamp-don't-drop contract.
"""

import pytest
from pyspark.sql import functions as F

from substreams_sink_parquet_spark.operators import profiling as P
from substreams_sink_parquet_spark.tables import load


def test_approx_profile_tracks_exact_and_skips_expand(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    exact = {r.column: r for r in
             P.profile_table(orders, cols, exact_distinct=True).collect()}
    approx_df = P.profile_table(orders, cols)
    approx = {r.column: r for r in approx_df.collect()}
    for c in cols:
        e, a = exact[c], approx[c]
        # everything but n_distinct is computed identically in both modes
        assert (a.n_rows, a.n_nulls, a.min_repr, a.max_repr) == \
               (e.n_rows, e.n_nulls, e.min_repr, e.max_repr)
        # HLL++ at rsd=0.05: generous 3-sigma-ish envelope
        assert abs(a.n_distinct - e.n_distinct) <= max(3, 0.15 * e.n_distinct)
    # the scale mode's plan must be a plain sketch aggregate: the Expand
    # (row x n_cols replication) only multi-column COUNT(DISTINCT) needs
    plan = approx_df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan


def test_min_max_are_native_order_not_lexicographic(spark):
    df = spark.createDataFrame(
        [(9, 9.5), (10, 10.25), (2, 2.0)], "k long, v double"
    )
    rows = {r.column: r for r in
            P.profile_table(df, ["k", "v"], exact_distinct=True).collect()}
    # a string-typed min would say '10' < '2' < '9'
    assert (rows["k"].min_repr, rows["k"].max_repr) == ("2", "10")
    assert (rows["v"].min_repr, rows["v"].max_repr) == ("2.00", "10.25")


def test_profile_counts_nulls_and_ignores_them_in_distinct(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), (None,), ("b",)], "s string"
    )
    r = P.profile_table(df, ["s"], exact_distinct=True).collect()[0]
    assert (r.n_rows, r.n_nulls, r.n_distinct) == (4, 1, 2)
    assert (r.min_repr, r.max_repr) == ("a", "b")


def test_histogram_clamps_outliers_and_excludes_nulls(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (9.9,), (55.0,), (None,)], "v double"
    )
    rows = {r.bin: r for r in
            P.numeric_histogram(df, "v", 0.0, 10.0, 4).collect()}
    # -5 clamps into bin 0; 55 clamps into bin 3; null vanishes
    assert rows[0].cnt == 2 and rows[3].cnt == 2
    assert sum(r.cnt for r in rows.values()) == 4
    assert rows[0].bin_lo == 0.0 and rows[3].bin_hi == 10.0
    with pytest.raises(ValueError):
        P.numeric_histogram(df, "v", 10.0, 0.0, 4)
    with pytest.raises(ValueError):
        P.numeric_histogram(df, "v", 0.0, 10.0, 0)


def test_histogram_total_matches_nonnull_rows(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    hist = P.numeric_histogram(orders, "o_totalprice", 0.0, 400000.0, 16)
    total = hist.agg(F.sum("cnt")).collect()[0][0]
    assert total == orders.filter(F.col("o_totalprice").isNotNull()).count()


def test_profile_drift_flags_and_one_sided_columns(spark):
    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0), (4, "d", 4.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", None), (2, "b", None), (3, "c", 3.0), (9, "d", 4.0)],
        "k long, s string, v double",
    )
    drift = {r.column: r for r in P.profile_drift(
        P.profile_table(old, ["k", "s", "v"], exact_distinct=True),
        P.profile_table(new, ["k", "v"], exact_distinct=True),
    ).collect()}
    # s exists only in the old profile: loudest drift, range_changed too
    assert drift["s"].drifted and drift["s"].range_changed
    assert drift["s"].null_rate_new is None
    # v: null rate 0 -> 0.5 and unchanged distinct range min moved 1.0->3.0
    assert drift["v"].drifted and drift["v"].null_rate_new == 0.5
    # k: same null rate, same distinct count, but max moved 4 -> 9
    assert drift["k"].range_changed and drift["k"].drifted


def test_profile_drift_clean_epoch_is_quiet(spark):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "k long, s string")
    p = P.profile_table(df, ["k", "s"], exact_distinct=True)
    rows = P.profile_drift(p, p).collect()
    assert rows and not any(r.drifted or r.range_changed for r in rows)


def test_streaming_sink_records_per_epoch_profiles(spark, tmp_path):
    """run --profile-columns: each micro-batch writes a row-per-column
    snapshot under _profile/epoch={id}/; the lag-window history drift
    flags the moving block range; a fresh checkpoint (epoch ids restart
    at 0) is refused by the _STREAM_ID guard instead of silently
    overwriting recorded history."""
    import pytest

    from substreams_sink_parquet_spark.sink.writer import WriterOptions
    from substreams_sink_parquet_spark.streaming.stream_sink import run_pipeline
    from tests.test_protowire import BLOCK
    from tests.test_streaming import _stage_blocks

    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    opts = WriterOptions(partition_size=10, start_block=0)
    for batch, blocks in enumerate([range(0, 12), range(12, 30)]):
        _stage_blocks(spark, input_dir, list(blocks), batch)
        q, _ = run_pipeline(
            spark, input_dir, out_dir, BLOCK, ckpt, opts=opts,
            profile_columns=["block_number", "s"],
        )
        q.awaitTermination(120)

    hist = P.read_profile_history(spark, out_dir)
    rows = {(r.epoch, r.column): r for r in hist.collect()}
    assert len(rows) == 4  # 2 epochs x 2 columns
    assert rows[(0, "block_number")].n_rows == 12
    assert rows[(1, "block_number")].n_rows == 18
    assert rows[(0, "block_number")].n_nulls == 0
    assert (rows[(0, "block_number")].min_repr,
            rows[(0, "block_number")].max_repr) == ("0", "11")
    assert rows[(1, "block_number")].min_repr == "12"

    drift = P.profile_history_drift(hist).collect()
    # first epoch has no baseline; both columns judged once, at epoch 1
    assert sorted((r.epoch, r.column) for r in drift) == [
        (1, "block_number"), (1, "s")]
    d = {r.column: r for r in drift}
    assert d["block_number"].range_changed and d["block_number"].drifted
    assert d["s"].null_rate_new == 0.0

    # fresh checkpoint => epoch 0 again => guard must refuse, loudly
    _stage_blocks(spark, input_dir, [30, 31], 2)
    q, _ = run_pipeline(
        spark, input_dir, out_dir, BLOCK, str(tmp_path / "ckpt2"), opts=opts,
        profile_columns=["block_number"],
    )
    with pytest.raises(Exception, match="refusing epoch overwrite"):
        q.awaitTermination(120)


def test_profile_quantiles_exact_and_approx(spark):
    df = spark.createDataFrame([(float(v),) for v in range(1, 101)], "v double")
    rows = {r.p: r.q for r in
            P.profile_quantiles(df, ["v"], (0.25, 0.5)).collect()}
    # R-7 interpolation over 1..100: h = 99p + 1
    assert rows[0.25] == 25.75 and rows[0.5] == 50.5
    approx = {r.p: r.q for r in
              P.profile_quantiles(df, ["v"], (0.25, 0.5), exact=False).collect()}
    for p in (0.25, 0.5):
        assert abs(approx[p] - rows[p]) <= 2.0
    import pytest

    with pytest.raises(ValueError):
        P.profile_quantiles(df, [])


def test_histogram_matches_plain_python_binning(spark):
    """Property: for any values/bounds, every non-null value lands in
    exactly the bin plain Python computes with the same clamp rule."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        vals=st.lists(
            st.floats(min_value=-1e6, max_value=1e6,
                      allow_nan=False, allow_infinity=False),
            min_size=1, max_size=30),
        lo=st.floats(min_value=-100, max_value=0),
        width=st.floats(min_value=1, max_value=500),
        n_bins=st.integers(min_value=1, max_value=8),
    )
    @settings(max_examples=12, deadline=None)
    def check(vals, lo, width, n_bins):
        hi = lo + width * n_bins
        import math

        expect = {}
        for v in vals:
            b = min(max(math.floor((v - lo) / ((hi - lo) / n_bins)), 0),
                    n_bins - 1)
            expect[b] = expect.get(b, 0) + 1
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        got = {r.bin: r.cnt for r in
               P.numeric_histogram(df, "v", lo, hi, n_bins).collect()}
        assert got == expect

    check()


def test_profile_drift_empty_side_flags_not_crashes(spark):
    """A profile of an EMPTY table (n_rows=0) must read as loud one-sided
    drift — not an ANSI divide-by-zero abort."""
    full = spark.createDataFrame([(1,)], "k long")
    empty = full.filter("k < 0")
    p_full = P.profile_table(full, ["k"], exact_distinct=True)
    p_empty = P.profile_table(empty, ["k"], exact_distinct=True)
    r = P.profile_drift(p_full, p_empty).collect()[0]
    assert r.null_rate_new is None and r.drifted and r.range_changed


def test_history_drift_survives_an_empty_epoch(spark):
    """An empty epoch (n_rows=0) flags one-sided drift on its own row AND
    the following epoch still appears (judged against the empty baseline)
    — neither vanishes from the on-call report."""
    cols = ("column string, n_rows long, n_nulls long, n_distinct long, "
            "min_repr string, max_repr string")
    mk = lambda rows: spark.createDataFrame(rows, cols)
    hist = (
        mk([("v", 10, 0, 5, "1", "9")]).withColumn("epoch", F.lit(0))
        .unionByName(mk([("v", 0, 0, 0, None, None)]).withColumn("epoch", F.lit(1)))
        .unionByName(mk([("v", 10, 0, 5, "1", "9")]).withColumn("epoch", F.lit(2)))
    )
    drift = {r.epoch: r for r in P.profile_history_drift(hist).collect()}
    assert set(drift) == {1, 2}
    assert drift[1].drifted and drift[2].drifted


def test_drift_all_null_column_is_quiet_not_permanently_flagged(spark):
    """A column that is entirely NULL on both sides: identical, so no
    drift — the 0-distinct ratio must not trip the band, NULL reprs
    compare null-safely, and the verdicts are real booleans."""
    df = spark.createDataFrame(
        [(1, None), (2, None)], "k long, opt string"
    )
    p = P.profile_table(df, ["k", "opt"], exact_distinct=True)
    r = {x.column: x for x in P.profile_drift(p, p).collect()}
    assert r["opt"].drifted is False and r["opt"].range_changed is False
    assert r["k"].drifted is False


def test_profile_survives_nan_inf_and_overflow_under_ansi(spark):
    """The profile of a poisoned double column must DESCRIBE the poison,
    not crash on it (code review r12): NaN/+-Infinity abort the
    DECIMAL(18,2) repr cast under ANSI in both engines, and a finite
    value past 10^16 overflows it the same way. NaN compares greatest in
    Spark, so it IS the max of any column containing one."""
    df = spark.createDataFrame(
        [(float("nan"),), (float("inf"),), (float("-inf"),),
         (1e18,), (5.0,), (None,)],
        "v double",
    )
    ansi_was = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        r = P.profile_table(df, ["v"], exact_distinct=True).collect()[0]
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi_was)
    assert (r.n_rows, r.n_nulls) == (6, 1)
    assert r.min_repr == "-Infinity"
    assert r.max_repr == "NaN"  # NaN sorts greatest — it IS the max
    # an overflowing finite max falls back to the plain double repr
    r2 = P.profile_table(
        spark.createDataFrame([(1e18,), (2.0,)], "v double"), ["v"],
        exact_distinct=True,
    ).collect()[0]
    assert r2.min_repr == "2.00" and r2.max_repr == "1.0E18"


def test_histogram_excludes_nan_like_null(spark):
    """NaN is a non-value, not an outlier: Spark's floor(NaN) binned it
    at 0 while DuckDB's NaN-sorts-greatest clamps it to the TOP bin —
    silently skewing OPPOSITE tails per engine. It now joins the
    corpus-wide NaN-exclusion contract; infinities stay orderable and
    clamp into their edge bins (code review r12)."""
    df = spark.createDataFrame(
        [(float("nan",),), (float("inf"),), (float("-inf"),),
         (5.0,), (None,)],
        "v double",
    )
    rows = {r.bin: r.cnt for r in
            P.numeric_histogram(df, "v", 0.0, 10.0, 4).collect()}
    assert sum(rows.values()) == 3          # NaN and null both excluded
    assert rows == {0: 1, 2: 1, 3: 1}       # -inf->0, 5.0->2, +inf->3


def test_quantiles_exclude_nan_like_null(spark):
    """One NaN row otherwise turns every upper quantile of the column
    into NaN (NaN sorts greatest in both engines) — it is excluded like
    NULL, per the histogram/similarity contract (code review r12)."""
    import math

    df = spark.createDataFrame(
        [(1.0,), (2.0,), (3.0,), (4.0,), (float("nan"),), (None,)],
        "v double",
    )
    rows = {r.p: r.q for r in
            P.profile_quantiles(df, ["v"], probs=(0.5, 0.95)).collect()}
    assert not any(math.isnan(q) for q in rows.values())
    assert rows[0.5] == 2.5  # median of the four FINITE values
