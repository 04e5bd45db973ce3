"""Lake maintenance: compaction of the streaming sink's live area.

Each micro-batch stages its rows under ``_live/epoch={id}/range_start=N/``
(epoch-keyed so at-least-once batch replays overwrite instead of duplicate,
stream_sink.py `_append_live`); a long-running sink with a large
undo-holdback accumulates one epoch directory per micro-batch per range
before finalization compacts them. Small files are the classic lake
pathology — footer-per-file overhead, listing cost, tiny row groups — so
compaction is a first-class maintenance op, not an afterthought.

``compact_live`` merges every live range's epoch directories into a single
block-sorted staging dir under the reserved ``epoch=-1`` (write aside, swap,
delete — atomic per range). Run it ONLY against a terminated query whose
checkpoint is committed: a replayable (uncommitted) trailing epoch merged
into ``epoch=-1`` would duplicate its rows when the replay re-creates the
epoch directory. That is the same single-writer discipline the reference
assumes for its .partial files (writer.go:80-85).

All file metadata operations go through the Hadoop FS layer (fsio), so the
table dir may live on any supported object store.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..fsio import HadoopFS, url_join

COMPACTED_EPOCH = -1


def _epoch_dirs(fs: HadoopFS, live: str) -> list[str]:
    return [d for d in fs.listdir(live) if d.startswith("epoch=")]


def _range_dirs(fs: HadoopFS, live: str, rs: int) -> list[str]:
    return [
        url_join(live, e, f"range_start={rs}")
        for e in _epoch_dirs(fs, live)
        if f"range_start={rs}" in fs.listdir(url_join(live, e))
    ]


def live_file_counts(fs: HadoopFS, table_dir: str) -> dict[int, int]:
    """{range_start: parquet file count across all epochs} for the live area."""
    live = url_join(table_dir, "_live")
    out: dict[int, int] = {}
    for e in _epoch_dirs(fs, live):
        for d in fs.listdir(url_join(live, e)):
            if not d.startswith("range_start="):
                continue
            rs = int(d.split("=", 1)[1])
            n = sum(
                1 for f in fs.listdir(url_join(live, e, d))
                if f.endswith(".parquet") and not f.startswith(("_", "."))
            )
            out[rs] = out.get(rs, 0) + n
    return out


def compact_live(
    spark: SparkSession,
    table_dir: str,
    target_files: int = 1,
    min_files: int = 2,
    compression: str = "zstd",
) -> dict[int, tuple[int, int]]:
    """Compact every live range with >= min_files files (across epochs).

    Returns {range_start: (files_before, files_after)}. Rows are preserved
    exactly; files come out block-sorted so later finalization keeps the
    per-file ordering invariant."""
    fs = HadoopFS(spark, table_dir)
    live = url_join(table_dir, "_live")
    done: dict[int, tuple[int, int]] = {}
    for rs, n in sorted(live_file_counts(fs, table_dir).items()):
        if n < min_files:
            continue
        srcs = _range_dirs(fs, live, rs)
        df = spark.read.parquet(*srcs)
        tmp = url_join(live, f"_compact_{rs}")
        (
            df.repartition(target_files)
            .sortWithinPartitions("block_number")
            .write.mode("overwrite")
            .option("compression", compression)
            .parquet(tmp)
        )
        for src in srcs:
            fs.delete(src, recursive=True)
        dst = url_join(live, f"epoch={COMPACTED_EPOCH}", f"range_start={rs}")
        fs.mkdirs(url_join(live, f"epoch={COMPACTED_EPOCH}"))
        fs.rename(tmp, dst)
        for e in _epoch_dirs(fs, live):  # drop epochs emptied by the merge
            if not fs.listdir(url_join(live, e)):
                fs.delete(url_join(live, e), recursive=True)
        done[rs] = (n, live_file_counts(fs, table_dir)[rs])
    return done
