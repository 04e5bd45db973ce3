"""Physical lake layout: bucketing for shuffle-free co-located joins.

The reference writes flat per-range files and leaves join performance to
"downstream engines" (its README positions the lake for Clickhouse/DuckDB).
At 100 TB the dominant query cost is the shuffle of fact-fact joins, and the
Spark-native answer is a bucketed layout: both sides hash-clustered into the
same number of buckets on the join key at WRITE time, so every subsequent
join or aggregation on that key runs with zero exchange.

This costs one shuffle when the table is laid down and pays for itself on
every query after — the standard warehouse trade. ``bucketize`` writes the
table, ``bucketed_join_ready`` verifies the plan property tests rely on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def bucketize(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) managed table.

    Sorting within buckets additionally enables shuffle-AND-sort-free
    sort-merge joins. ``n_buckets`` should be sized so one bucket of the
    biggest co-bucketed table fits an executor's memory at target scale
    (100 TB / n_buckets ≲ a few GB ⇒ tens of thousands of buckets there;
    tests use small n)."""
    writer = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, *keys)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read back a bucketed table (bucket metadata comes from the catalog —
    a plain ``spark.read.parquet`` of the files would lose it)."""
    return spark.table(table)


# -- Z-order clustering ----------------------------------------------------


def zorder_key(cols: list[tuple[str, int, int]], bits: int = 16):
    """Morton (Z-order) sort key: interleave the bits of min-max-scaled cell
    ids of each column.

    ``cols`` is [(column, lo, hi), ...] — the value bounds, typically from a
    cheap stats pass or known domain (block numbers, timestamps). Each value
    is scaled to a ``bits``-wide cell id, then bit i of column j lands at
    position ``i * n_cols + j`` of the key. Rows close in the key are close
    in EVERY clustered dimension, so sorting the lake by this key gives each
    file a tight min/max envelope on all of them at once — parquet
    stats-based skipping then works for predicates on any clustered column,
    not just the primary sort key. Linear clustering (plain sort) only prunes
    on the leading column; this is the standard warehouse answer for
    multi-dimensional block-range + address + time predicates at 100 TB.

    Built from shift/mask expressions only: whole-stage codegen, no UDF, no
    shuffle beyond the range partitioning the caller chooses for the write.
    """
    from pyspark.sql import functions as F

    n = len(cols)
    key = F.lit(0).cast("long")
    for j, (c, lo, hi) in enumerate(cols):
        span = max(hi - lo, 1)
        # clamp INTO [lo, hi] BEFORE scaling, and scale through double:
        # the old (v - lo) * (2^bits - 1) long multiply overflowed int64 —
        # an ANSI abort of the whole clustered write — for one corrupt
        # value far outside the declared bounds, exactly the row a stats
        # pass's bounds won't cover (code review r12). Double precision is
        # ample for a 16-bit cell id at any span.
        v = F.least(
            F.greatest(F.col(c).cast("long"), F.lit(lo)), F.lit(hi)
        )
        cell = (
            (v - F.lit(lo)).cast("double")
            * ((1 << bits) - 1) / F.lit(span)
        ).cast("long")
        for i in range(bits):
            bit = F.shiftright(cell, i).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, i * n + j)
    return key


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[tuple[str, int, int]],
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Lay ``df`` down Z-order-clustered: range-partition then sort by the
    Morton key, one parquet file per partition. Each file's footer min/max
    is tight on every clustered column, so engines skip row groups for
    predicates on any of them."""
    keyed = df.withColumn("__z", zorder_key(cols, bits))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
