"""Lake maintenance: compaction of the streaming sink's live area.

Each micro-batch stages its rows under ``_live/epoch={id}/range_start=N/``
(epoch-keyed so at-least-once batch replays overwrite instead of duplicate,
stream_sink.py `_append_live`); a long-running sink with a large
undo-holdback accumulates one epoch directory per micro-batch per range
before finalization compacts them. Small files are the classic lake
pathology — footer-per-file overhead, listing cost, tiny row groups — so
compaction is a first-class maintenance op, not an afterthought.

``compact_live`` merges every live range's epoch directories into a single
block-sorted staging dir under the reserved ``epoch=-1``. Run it ONLY
against a terminated query whose checkpoint is committed: a replayable
(uncommitted) trailing epoch merged into ``epoch=-1`` would duplicate its
rows when the replay re-creates the epoch directory. That is the same
single-writer discipline the reference assumes for its .partial files
(writer.go:80-85).

Crash safety: the multi-directory swap (delete N source epoch dirs, rename
the compacted dir into place) cannot be atomic on a plain FS, so each range
compaction is a tiny write-ahead commit. The compacted data is written to
``_compact_{rs}`` together with a ``_MERGED.json`` manifest naming exactly
the source dirs it merged; only then does the commit phase delete those
sources and rename the tmp dir into ``epoch=-1``. The commit phase is
idempotent (delete is, and the manifest pins the source set), so a crash
anywhere is repaired by re-running it — ``compact_live`` recovers any
committed-but-unswapped leftovers first. A tmp dir WITHOUT a manifest is an
uncommitted partial write: its sources are untouched, so it is simply
deleted. No crash point loses rows.

All file metadata operations go through the Hadoop FS layer (fsio), so the
table dir may live on any supported object store.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession

from ..fsio import HadoopFS, live_index as _shared_live_index, live_range_dirs, url_join

COMPACTED_EPOCH = -1
_MANIFEST = "_MERGED.json"


def _epoch_dirs(fs: HadoopFS, live: str) -> list[str]:
    return [d for d in fs.listdir(live) if d.startswith("epoch=")]


def _live_index(fs: HadoopFS, live: str) -> dict[str, list[int]]:
    return _shared_live_index(fs, live)  # shared sweep (fsio.live_index)


def _range_dirs(fs: HadoopFS, live: str, rs: int,
                idx: dict[str, list[int]] | None = None) -> list[str]:
    if idx is None:
        idx = _live_index(fs, live)
    return live_range_dirs(idx, live, rs)


def live_file_counts(fs: HadoopFS, table_dir: str) -> dict[int, int]:
    """{range_start: parquet file count across all epochs} for the live area."""
    live = url_join(table_dir, "_live")
    out: dict[int, int] = {}
    for e, rss in _live_index(fs, live).items():
        for rs in rss:
            n = sum(
                1 for f in fs.listdir(url_join(live, e, f"range_start={rs}"))
                if f.endswith(".parquet") and not f.startswith(("_", "."))
            )
            out[rs] = out.get(rs, 0) + n
    return out


def _commit_compact(fs: HadoopFS, live: str, rs: int, srcs: list[str]) -> None:
    """Swap a fully-written ``_compact_{rs}`` dir into ``epoch=-1``. Every
    step is idempotent, so this can be re-run from any crash point: deletes
    are no-ops on missing dirs, and the manifest pins the exact source set
    (re-listing after a partial delete would under-count)."""
    tmp = url_join(live, f"_compact_{rs}")
    for src in srcs:
        fs.delete(src, recursive=True)
    dst = url_join(live, f"epoch={COMPACTED_EPOCH}", f"range_start={rs}")
    fs.mkdirs(url_join(live, f"epoch={COMPACTED_EPOCH}"))
    fs.rename(tmp, dst)
    # The manifest must outlive the rename: a _compact_ dir without one is
    # treated as uncommitted (and deleted) by recovery. Dropped only now,
    # from dst, where a crash-stranded copy is inert ("_"-prefixed files are
    # invisible to the parquet reader and to live_file_counts).
    fs.delete(url_join(dst, _MANIFEST), recursive=False)
    for e in _epoch_dirs(fs, live):  # drop epochs emptied by the merge
        if not fs.listdir(url_join(live, e)):
            fs.delete(url_join(live, e), recursive=True)


def recover_compact_leftovers(fs: HadoopFS, table_dir: str) -> dict[str, str]:
    """Repair ``_compact_*`` leftovers from a crashed compact_live run.

    Returns {tmp_dir_name: action}. A leftover WITH a ``_MERGED.json``
    manifest finished its write — its commit phase is re-run to completion
    (the rows may exist only there if the crash hit mid-swap). A leftover
    WITHOUT one never committed — its sources are intact, so it is dropped."""
    live = url_join(table_dir, "_live")
    actions: dict[str, str] = {}
    if not fs.exists(live):
        return actions
    for d in fs.listdir(live):
        if not d.startswith("_compact_"):
            continue
        tmp = url_join(live, d)
        manifest = url_join(tmp, _MANIFEST)
        if fs.exists(manifest):
            rs = int(d[len("_compact_"):])
            srcs = json.loads(fs.read_bytes(manifest))["sources"]
            _commit_compact(fs, live, rs, [url_join(live, s) for s in srcs])
            actions[d] = "committed"
        else:
            fs.delete(tmp, recursive=True)
            actions[d] = "dropped_uncommitted"
    return actions


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
    per-file ordering invariant. Crash-safe via the write-ahead manifest
    protocol (module docstring); any leftovers from a previous crashed run
    are recovered first."""
    fs = HadoopFS(spark, table_dir)
    live = url_join(table_dir, "_live")
    recover_compact_leftovers(fs, table_dir)
    idx = _live_index(fs, live)
    done: dict[int, tuple[int, int]] = {}
    for rs, n in sorted(live_file_counts(fs, table_dir).items()):
        if n < min_files:
            continue
        srcs = _range_dirs(fs, live, rs, idx)
        # mergeSchema: epochs may span an additive schema upgrade; without
        # it one file's footer wins and the added column would be dropped
        # from the compacted output before its sources are deleted
        df = spark.read.option("mergeSchema", "true").parquet(*srcs)
        tmp = url_join(live, f"_compact_{rs}")
        (
            df.repartition(target_files)
            .sortWithinPartitions("block_number")
            .write.mode("overwrite")
            .option("compression", compression)
            .parquet(tmp)
        )
        # Write point-of-no-return marker: from here the commit phase owns
        # the swap and can be replayed from any crash point.
        rel = [s[len(live) + 1:] for s in srcs]
        fs.write_bytes(
            url_join(tmp, _MANIFEST),
            json.dumps({"range_start": rs, "sources": rel}).encode(),
        )
        _commit_compact(fs, live, rs, srcs)
        dst = url_join(live, f"epoch={COMPACTED_EPOCH}", f"range_start={rs}")
        done[rs] = (n, sum(
            1 for f in fs.listdir(dst)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ))
    return done
