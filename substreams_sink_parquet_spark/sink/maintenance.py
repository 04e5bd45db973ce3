"""Lake maintenance: compaction of the streaming sink's live area.

Each micro-batch appends one-or-more small parquet files per live range
(stream_sink.py `_append_live`); a long-running sink with a large
undo-holdback accumulates hundreds of small files per range before
finalization compacts them. Small files are the classic lake pathology —
footer-per-file overhead, listing cost, tiny row groups — so compaction is
a first-class maintenance op, not an afterthought.

``compact_live`` rewrites each live range directory to ``target_files``
block-sorted files (atomic per range: write aside, swap, delete). It is
safe to run between micro-batches of an active query as long as no batch is
concurrently appending (the single-writer discipline the reference also
assumes for its .partial files, writer.go:80-85).

All file metadata operations go through the Hadoop FS layer (fsio), so the
table dir may live on any supported object store.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..fsio import HadoopFS, url_join


def live_file_counts(fs: HadoopFS, table_dir: str) -> dict[int, int]:
    """{range_start: parquet file count} for the live area."""
    live = url_join(table_dir, "_live")
    out: dict[int, int] = {}
    for d in fs.listdir(live):
        if not d.startswith("range_start="):
            continue
        rs = int(d.split("=", 1)[1])
        out[rs] = sum(
            1 for f in fs.listdir(url_join(live, d))
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
    return out


def compact_live(
    spark: SparkSession,
    table_dir: str,
    target_files: int = 1,
    min_files: int = 2,
    compression: str = "zstd",
) -> dict[int, tuple[int, int]]:
    """Compact every live range with >= min_files files.

    Returns {range_start: (files_before, files_after)}. Rows are preserved
    exactly; files come out block-sorted so later finalization keeps the
    per-file ordering invariant."""
    fs = HadoopFS(spark, table_dir)
    live = url_join(table_dir, "_live")
    done: dict[int, tuple[int, int]] = {}
    for rs, n in sorted(live_file_counts(fs, table_dir).items()):
        if n < min_files:
            continue
        src = url_join(live, f"range_start={rs}")
        df = spark.read.parquet(src)
        tmp = src + ".compact"
        (
            df.repartition(target_files)
            .sortWithinPartitions("block_number")
            .write.mode("overwrite")
            .option("compression", compression)
            .parquet(tmp)
        )
        old = src + ".old"
        fs.rename(src, old)
        fs.rename(tmp, src)
        fs.delete(old, recursive=True)
        done[rs] = (n, live_file_counts(fs, table_dir)[rs])
    return done
