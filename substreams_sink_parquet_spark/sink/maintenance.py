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
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


def live_file_counts(table_dir: str) -> dict[int, int]:
    """{range_start: parquet file count} for the live area."""
    live = os.path.join(table_dir, "_live")
    out: dict[int, int] = {}
    if not os.path.isdir(live):
        return out
    for d in os.listdir(live):
        if not d.startswith("range_start="):
            continue
        rs = int(d.split("=", 1)[1])
        out[rs] = sum(
            1 for f in os.listdir(os.path.join(live, d))
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
    live = os.path.join(table_dir, "_live")
    done: dict[int, tuple[int, int]] = {}
    for rs, n in sorted(live_file_counts(table_dir).items()):
        if n < min_files:
            continue
        src = os.path.join(live, f"range_start={rs}")
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
        os.rename(src, old)
        os.rename(tmp, src)
        shutil.rmtree(old, ignore_errors=True)
        done[rs] = (n, live_file_counts(table_dir)[rs])
    return done
