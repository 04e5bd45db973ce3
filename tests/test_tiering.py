"""Finalized-area tiering: complete grid-aligned groups of range files merge
into one larger range file; the frontier tail is untouched; every lake
contract (name pruning, contiguity, backfill, ordering) survives; the
write-ahead commit recovers from either side of a crash."""

import json
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from substreams_sink_parquet_spark.fsio import HadoopFS, url_join
from substreams_sink_parquet_spark.sink.maintenance import (
    recover_tier_leftovers,
    tier_finalized,
)
from substreams_sink_parquet_spark.sink.writer import (
    WriterOptions,
    backfill_empty,
    covered_spans,
    lake_coverage,
    read_lake,
    write_ranges,
)


def _lake(spark, tmp_path, blocks, size=10):
    out = str(tmp_path / "lake")
    os.makedirs(out)
    df = spark.createDataFrame(
        [(b, f"0x{b:x}", b * 2) for b in blocks],
        "block_number bigint, block_id string, v bigint",
    )
    write_ranges(df, out, WriterOptions(partition_size=size, start_block=0, pad=10))
    return out


def test_tier_merges_complete_groups_and_leaves_tail(spark, tmp_path):
    # ranges 0-10 .. 70-80 (8 files); tier to 30 blocks: [0,30) and [30,60)
    # complete -> merged; [60,90) incomplete (only 60-80) -> untouched
    out = _lake(spark, tmp_path, list(range(0, 80, 3)) + [79])
    fs = HadoopFS(spark, out)
    done = tier_finalized(spark, out, tier_blocks=30)
    assert set(done) == {
        "0000000000-0000000030.parquet",
        "0000000030-0000000060.parquet",
    }
    names = sorted(n for n in fs.listdir(out) if n.endswith(".parquet"))
    assert names == [
        "0000000000-0000000030.parquet",
        "0000000030-0000000060.parquet",
        "0000000060-0000000070.parquet",
        "0000000070-0000000080.parquet",
    ]
    # rows preserved exactly, per-file still block-sorted
    got = sorted(r.block_number for r in read_lake(spark, out).collect())
    assert got == sorted(set(list(range(0, 80, 3)) + [79]))
    col = pq.read_table(os.path.join(out, "0000000000-0000000030.parquet"))
    bn = col.column("block_number").to_pylist()
    assert bn == sorted(bn)
    # name-pruned reads open only the overlapping tiered file
    probe = read_lake(spark, out, start_block=5, end_block=12)
    assert {os.path.basename(f) for f in probe.inputFiles()} == {
        "0000000000-0000000030.parquet"
    }
    # contiguity metadata still holds
    cov = lake_coverage(fs, out)
    assert cov["gaps"] == [] and cov["overlaps"] == []


def test_tier_is_idempotent_and_respects_existing_tiers(spark, tmp_path):
    out = _lake(spark, tmp_path, list(range(0, 60, 2)))
    tier_finalized(spark, out, tier_blocks=30)
    again = tier_finalized(spark, out, tier_blocks=30)
    assert again == {}  # single-file tiers are left alone


def test_backfill_is_span_aware_after_tiering(spark, tmp_path):
    out = _lake(spark, tmp_path, list(range(0, 60, 2)))
    tier_finalized(spark, out, tier_blocks=30)
    fs = HadoopFS(spark, out)
    assert covered_spans(fs, out) == [(0, 60)]
    # a resumed sink backfilling to block 79 must create ONLY the ranges
    # beyond the tiered span, never inside it
    tmpl = spark.createDataFrame(
        [], "block_number bigint, block_id string, v bigint"
    )
    made = backfill_empty(
        spark, tmpl, out, WriterOptions(partition_size=10, start_block=0, pad=10),
        upto=75,
    )
    assert made == ["0000000060-0000000070.parquet", "0000000070-0000000080.parquet"]
    cov = lake_coverage(fs, out)
    assert cov["gaps"] == [] and cov["overlaps"] == []


def test_tier_crash_recovery_both_sides_of_commit(spark, tmp_path):
    out = _lake(spark, tmp_path, list(range(0, 30, 2)))
    fs = HadoopFS(spark, out)

    # uncommitted leftover (no manifest): dropped, sources intact
    fs.mkdirs(url_join(out, "_tier_999"))
    fs.write_bytes(url_join(out, "_tier_999", "part-0.parquet"), b"junk")
    actions = recover_tier_leftovers(fs, out)
    assert actions == {"_tier_999": "dropped_uncommitted"}
    assert not fs.exists(url_join(out, "_tier_999"))

    # committed leftover: simulate a crash right after the manifest write
    # by building the tmp dir a real run would have produced
    srcs = ["0000000000-0000000010.parquet", "0000000010-0000000020.parquet",
            "0000000020-0000000030.parquet"]
    df = spark.read.parquet(*[os.path.join(out, s) for s in srcs])
    tmp = url_join(out, "_tier_0")
    df.repartition(1).sortWithinPartitions("block_number").write.mode(
        "overwrite"
    ).parquet(tmp)
    fs.write_bytes(
        url_join(tmp, "_TIERED.json"),
        json.dumps({"name": "0000000000-0000000030.parquet", "sources": srcs}).encode(),
    )
    n_before = spark.read.parquet(*[os.path.join(out, s) for s in srcs]).count()
    actions = recover_tier_leftovers(fs, out)
    assert actions == {"_tier_0": "committed"}
    names = sorted(n for n in fs.listdir(out) if n.endswith(".parquet"))
    assert names == ["0000000000-0000000030.parquet"]
    assert read_lake(spark, out).count() == n_before
    # re-running recovery is a no-op
    assert recover_tier_leftovers(fs, out) == {}


def test_undo_on_tiered_lake_restores_native_ranges(spark, tmp_path):
    """Deep-reorg undo through a TIERED file must demote survivors into
    native partition_size ranges so re-finalized names keep the
    name-is-index contract (pruned reads must not lose blocks)."""
    from substreams_sink_parquet_spark.streaming.stream_sink import undo_lake

    out = _lake(spark, tmp_path, list(range(0, 60)), size=10)
    tier_finalized(spark, out, tier_blocks=30)
    undo_lake(spark, out, last_valid_block=15,
              opts=WriterOptions(partition_size=10, start_block=0, pad=10))
    fs = HadoopFS(spark, out)
    # finalized area: everything above the fork's tier is gone
    names = sorted(n for n in fs.listdir(out) if n.endswith(".parquet"))
    assert names == []
    # survivors staged per NATIVE range, not under the tiered file's start
    live = url_join(out, "_live", "epoch=-2")
    assert sorted(fs.listdir(live)) == ["range_start=0", "range_start=10"]
    rows = sorted(
        r.block_number
        for r in spark.read.parquet(url_join(out, "_live")).collect()
    )
    assert rows == list(range(16))


def test_run_pipeline_recovers_tier_leftovers(spark, tmp_path):
    """A sink resumed after a tier crash mid-commit must recover the
    stranded merged rows BEFORE backfill papers empties over the deleted
    source ranges."""
    import json as _json

    from .test_protowire import BLOCK
    from .test_streaming import _stage_blocks
    from substreams_sink_parquet_spark.streaming.stream_sink import run_pipeline

    input_dir = str(tmp_path / "in")
    out = str(tmp_path / "lake")
    _stage_blocks(spark, input_dir, list(range(0, 30)), 0)
    q, _ = run_pipeline(
        spark, input_dir, out, BLOCK, str(tmp_path / "ckpt"),
        opts=WriterOptions(partition_size=10, start_block=0),
        undo_holdback=0,
    )
    q.awaitTermination(120)
    fs = HadoopFS(spark, out)
    n_total = read_lake(spark, out).count()

    # simulate the crash: a fully-written _tier_0 with manifest, sources
    # already deleted (the commit's first phase ran), rename never happened
    srcs = ["0000000000-0000000010.parquet", "0000000010-0000000020.parquet",
            "0000000020-0000000030.parquet"]
    df = spark.read.parquet(*[os.path.join(out, s) for s in srcs])
    tmp = url_join(out, "_tier_0")
    df.repartition(1).sortWithinPartitions("block_number").write.mode(
        "overwrite"
    ).parquet(tmp)
    fs.write_bytes(
        url_join(tmp, "_TIERED.json"),
        _json.dumps({"name": "0000000000-0000000030.parquet",
                     "sources": srcs}).encode(),
    )
    for s in srcs:
        fs.delete(url_join(out, s), recursive=False)

    # resume the sink with one more batch: recovery must run first
    _stage_blocks(spark, input_dir, list(range(30, 40)), 1)
    q2, _ = run_pipeline(
        spark, input_dir, out, BLOCK, str(tmp_path / "ckpt"),
        opts=WriterOptions(partition_size=10, start_block=0),
        undo_holdback=0,
    )
    q2.awaitTermination(120)
    assert not fs.exists(tmp)
    assert fs.exists(url_join(out, "0000000000-0000000030.parquet"))
    assert read_lake(spark, out).count() == n_total + 10


def test_tier_survives_max_records_per_file_split(spark, tmp_path):
    """A session-level spark.sql.files.maxRecordsPerFile splits the tier's
    repartition(1) output into several part files; the old single-part
    commit renamed the FIRST and deleted the rest with the tmp dir —
    silent row loss. The manifest now pins a part->name mapping, every
    part lands as a block-ordered -partNNNN sibling, and the replay is
    idempotent (code review r12)."""
    out = _lake(spark, tmp_path, list(range(0, 60)))
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "25")
    try:
        done = tier_finalized(spark, out, tier_blocks=30)
    finally:
        spark.conf.unset("spark.sql.files.maxRecordsPerFile")
    assert set(done) == {
        "0000000000-0000000030.parquet", "0000000030-0000000060.parquet",
    }
    names = sorted(n for n in os.listdir(out) if n.endswith(".parquet"))
    # 30 rows per tier at 25 rows/file = 2 parts per tier
    assert names == [
        "0000000000-0000000030-part0000.parquet",
        "0000000000-0000000030-part0001.parquet",
        "0000000030-0000000060-part0000.parquet",
        "0000000030-0000000060-part0001.parquet",
    ]
    got = []
    for n in names:
        got += pq.read_table(os.path.join(out, n)).column(
            "block_number"
        ).to_pylist()
    assert sorted(got) == list(range(60))  # every row survived
    # per-file block order holds across the -part split
    first = pq.read_table(os.path.join(out, names[0])).column(
        "block_number"
    ).to_pylist()
    second = pq.read_table(os.path.join(out, names[1])).column(
        "block_number"
    ).to_pylist()
    assert first == sorted(first) and second == sorted(second)
    assert max(first) < min(second)  # name order == block order
    # read_lake pruning still works on the -part siblings
    assert read_lake(spark, out, 0, 29).count() == 30
