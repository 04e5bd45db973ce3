"""Z-order layout: each written file must carry a tight min/max envelope on
EVERY clustered column (that's the property parquet stats-skipping needs),
where a linear sort is only tight on its leading column."""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from substreams_sink_parquet_spark.layout import zorder_key, zorder_write
from substreams_sink_parquet_spark.tables import load


def _avg_span(path: str, col: str) -> float:
    spans = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        col_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
        lo = min(md.row_group(g).column(col_idx).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(col_idx).statistics.max for g in range(md.num_row_groups))
        spans.append(hi - lo)
    return sum(spans) / len(spans)


def test_zorder_key_is_deterministic_and_monotone_per_dim(spark):
    df = spark.createDataFrame([(i, j) for i in range(8) for j in range(8)], "a int, b int")
    k = df.select("a", "b", zorder_key([("a", 0, 7), ("b", 0, 7)], bits=3).alias("z")).collect()
    zmap = {(r["a"], r["b"]): r["z"] for r in k}
    assert len(set(zmap.values())) == 64  # injective on the grid
    # fixing one dim, the key grows with the other (bit-interleave property)
    assert zmap[(0, 0)] < zmap[(0, 7)] and zmap[(0, 0)] < zmap[(7, 0)]


def test_zorder_files_tight_on_both_dims(spark, tmp_path):
    ev = load(spark, "/root/testdata/sf0.01", "events").select(
        "event_id", "user_id", F.unix_timestamp("ts").alias("tsec")
    )
    lo_u, hi_u, lo_t, hi_t = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("tsec"), F.max("tsec")
    ).first()

    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    zorder_write(ev, zpath, [("user_id", lo_u, hi_u), ("tsec", lo_t, hi_t)], n_files=8)
    # linear baseline: sort by user_id only
    ev.repartitionByRange(8, "user_id").sortWithinPartitions("user_id").write.mode(
        "overwrite"
    ).parquet(lpath)

    assert spark.read.parquet(zpath).count() == ev.count()  # lossless

    full_u, full_t = hi_u - lo_u, hi_t - lo_t
    # z-order: BOTH dims' per-file spans shrink well below the global span
    assert _avg_span(zpath, "user_id") < 0.8 * full_u
    assert _avg_span(zpath, "tsec") < 0.8 * full_t
    # linear clustering is tight on its sort column but NOT on the other dim
    assert _avg_span(lpath, "user_id") < 0.3 * full_u
    assert _avg_span(lpath, "tsec") > 0.9 * full_t


def test_zorder_key_survives_out_of_bounds_values_under_ansi(spark):
    """One corrupt value far outside the declared bounds (a garbage block
    number near 2^62) overflowed the pre-clamp long multiply and
    ANSI-aborted the whole clustered write; values now clamp into
    [lo, hi] BEFORE scaling (code review r12)."""
    from pyspark.sql import functions as F

    from substreams_sink_parquet_spark.layout import zorder_key

    df = spark.createDataFrame(
        [(1 << 62, 5), (50, 5), (-(1 << 62), 5), (100, 5)], "a long, b long"
    )
    ansi_was = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        keys = [r.z for r in df.select(
            zorder_key([("a", 0, 100), ("b", 0, 10)]).alias("z")
        ).collect()]
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi_was)
    assert len(keys) == 4 and all(k is not None for k in keys)
    # the oversized value clamps to the top cell, the negative to the
    # bottom — same keys as the in-bounds extremes would get
    top = df.filter(F.col("a") == 100).select(
        zorder_key([("a", 0, 100), ("b", 0, 10)]).alias("z")
    ).collect()[0].z
    assert keys[0] == top
