"""Range-rotating Parquet writer.

Spark translation of the reference's RotatingParquetWriter (writer.go:58-284):
instead of a mutex-guarded single-file rotation loop, the whole batch is
written in one distributed job — rows are assigned their block range at plan
level, shuffled so each range lands in exactly one task (one output file per
range, like the reference's rotation invariant), sorted by block within the
range (subsuming the per-table ordering min-heap, factory.go:118-131), and
written via ``partitionBy``. A driver-side finalize pass then renames Spark's
part-files to the reference's zero-padded ``{start:010d}-{end:010d}.parquet``
layout and backfills empty ranges for gaps (writer.go:220-267) so the lake is
contiguous from the configured anchor.

Codec / row-group / dictionary / page tuning maps to the Parquet options the
reference sets via parquet-go properties (writer.go:93-118).

Scale note: the shuffle key is the range start — cardinality grows with data
volume; the finalize pass touches only file metadata (one rename per range),
so it stays O(files), not O(rows). All data movement is executor-side.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..partition import all_ranges, file_name, range_start_col


@dataclass(frozen=True)
class WriterOptions:
    """Tuning knobs mirroring the reference CLI flags (run.go:40-52)."""

    partition_size: int = 5000          # --partition-size
    start_block: int = 0                # --start-block (range anchor)
    end_block: int | None = None        # --stop-block (clamps last range)
    compression: str = "zstd"           # --compression
    row_group_rows: int = 20000         # --row-group-rows
    dict_encoding: bool = True          # --dict-encoding
    pad: int = 10


def _range_dir_prefix() -> str:
    return "__range_start="


def write_ranges(
    df: DataFrame,
    out_dir: str,
    opts: WriterOptions,
    block_col: str = "block_number",
    backfill: bool = True,
    ranges: list[int] | None = None,
) -> list[str]:
    """Write ``df`` as one zero-pad-named parquet file per block range.

    Returns the list of file names written (sorted). Empty input with
    ``backfill`` still materializes empty ranges up to the anchor.

    ``ranges``: the distinct range starts present in ``df``, if the caller
    already knows them. Discovering them here costs a full extra pass over
    ``df``'s lineage — when ``df`` is the decoded stream, that means decoding
    every payload twice. Callers that hold the raw (block_number, payload)
    frame should derive the ranges from the raw block_number column (a
    pruned one-column parquet scan) and pass them in."""
    spark = df.sparkSession
    ranged = df.withColumn(
        "__range_start", range_start_col(block_col, opts.start_block, opts.partition_size)
    )

    distinct_ranges = (
        list(ranges)
        if ranges is not None
        else [r[0] for r in ranged.select("__range_start").distinct().collect()]
    )
    n_ranges = max(len(distinct_ranges), 1)

    staging = os.path.join(out_dir, "_staging")
    (
        # sort by (partition col, block): satisfies the dynamic-partition
        # write's required ordering, so Spark keeps this order instead of
        # re-sorting by partition column alone (which would shuffle block order)
        ranged.repartition(n_ranges, "__range_start")
        .sortWithinPartitions("__range_start", block_col)
        .write.mode("overwrite")
        .option("compression", opts.compression)
        .option("parquet.block.size", max(opts.row_group_rows * 256, 1 << 20))
        .option("parquet.enable.dictionary", str(opts.dict_encoding).lower())
        .partitionBy("__range_start")
        .parquet(staging)
    )

    written = _finalize(spark, staging, out_dir, distinct_ranges, opts)

    if backfill and distinct_ranges:
        max_block_seen = max(distinct_ranges)
        written += backfill_empty(
            spark, df.drop("__range_start"), out_dir, opts, upto=max_block_seen
        )
    return sorted(set(written))


def _finalize(spark: SparkSession, staging: str, out_dir: str,
              distinct_ranges: list[int], opts: WriterOptions) -> list[str]:
    """Rename staged per-range directories to padded flat file names —
    metadata-only, mirroring the reference's .partial → final rename
    (writer.go:80-85, 176-213)."""
    written = []
    for rs in distinct_ranges:
        part_dir = os.path.join(staging, f"__range_start={rs}")
        parts = sorted(
            f for f in os.listdir(part_dir)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        if len(parts) != 1:
            raise RuntimeError(
                f"range {rs}: expected exactly 1 part file, got {len(parts)} "
                "(range-hash repartition invariant violated)"
            )
        re_ = rs + opts.partition_size
        if opts.end_block is not None:
            re_ = min(re_, opts.end_block)
        name = file_name(rs, re_, opts.pad)
        shutil.move(os.path.join(part_dir, parts[0]), os.path.join(out_dir, name))
        written.append(name)
    shutil.rmtree(staging, ignore_errors=True)
    return written


def backfill_empty(
    spark: SparkSession,
    template_df: DataFrame,
    out_dir: str,
    opts: WriterOptions,
    upto: int,
) -> list[str]:
    """Emit empty parquet files for every missing range from the anchor up to
    ``upto`` — the contiguous-lake guarantee (writer.go:220-267)."""
    existing = set(os.listdir(out_dir)) if os.path.isdir(out_dir) else set()
    empty = spark.createDataFrame([], template_df.schema)
    written = []
    for rs, re_ in all_ranges(opts.start_block, upto, opts.partition_size, opts.end_block):
        name = file_name(rs, re_, opts.pad)
        if name in existing:
            continue
        tmp = os.path.join(out_dir, f"_empty_{rs}")
        empty.coalesce(1).write.mode("overwrite").option(
            "compression", opts.compression
        ).parquet(tmp)
        part = next(
            f for f in os.listdir(tmp) if f.endswith(".parquet") and not f.startswith("_")
        )
        shutil.move(os.path.join(tmp, part), os.path.join(out_dir, name))
        shutil.rmtree(tmp, ignore_errors=True)
        written.append(name)
    return written


def read_lake(
    spark: SparkSession,
    out_dir: str,
    start_block: int | None = None,
    end_block: int | None = None,
) -> DataFrame:
    """Read a sink output directory back as one table, file-pruned by block
    range.

    The padded ``{start}-{end}.parquet`` file names ARE the lake's partition
    index (partitioner.go:34-36 is the same contract): a block-range
    predicate selects the overlapping files by name before Spark ever lists
    a footer, so a 100-block probe of a 100 TB lake opens a handful of
    files. The residual per-row filter still applies (ranges are half-open
    supersets), and row-group stats prune within files because each file is
    written block-sorted."""
    if start_block is None and end_block is None:
        return spark.read.parquet(f"{out_dir}/*.parquet")
    names = []
    for f in sorted(os.listdir(out_dir)):
        if not f.endswith(".parquet"):
            continue
        stem = f[: -len(".parquet")]
        try:
            rs, re_ = (int(p) for p in stem.split("-", 1))
        except ValueError:
            continue
        if end_block is not None and rs > end_block:
            continue
        if start_block is not None and re_ <= start_block:
            continue
        names.append(os.path.join(out_dir, f))
    if not names:
        raise FileNotFoundError(
            f"no range files overlap [{start_block}, {end_block}] in {out_dir}"
        )
    df = spark.read.parquet(*names)
    if start_block is not None:
        df = df.filter(F.col("block_number") >= start_block)
    if end_block is not None:
        df = df.filter(F.col("block_number") <= end_block)
    return df
