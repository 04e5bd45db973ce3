"""Continuous rollup: merge-on-read equals a direct aggregate of all data,
replays cannot double-count, compaction preserves totals and is crash-safe."""

import os

import pytest

from pyspark.sql import functions as F

from substreams_sink_parquet_spark.fsio import HadoopFS, url_join
from substreams_sink_parquet_spark.streaming.rollup import (
    RollupSpec,
    compact_rollup,
    read_rollup,
    rollup_sink,
    write_rollup_partial,
)

SPEC = RollupSpec(
    bucket_col="block_number",
    bucket_size=10,
    group_cols=("kind",),
    measures={
        "total": ("sum", "amount"),
        "n": ("count", "*"),
        "lo": ("min", "amount"),
        "hi": ("max", "amount"),
    },
)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "block_number long, kind string, amount long"
    )


def _view(spark, d):
    return {
        (r.bucket, r.kind): (r.total, r.n, r.lo, r.hi, r.avg_amount)
        for r in read_rollup(
            spark, d, SPEC, derived={"avg_amount": ("total", "n")}
        ).collect()
    }


def test_merge_on_read_equals_direct_aggregate(spark, tmp_path):
    d = str(tmp_path / "rollup")
    os.makedirs(d)
    b1 = [(0, "a", 5), (3, "a", 7), (12, "b", 1)]
    b2 = [(4, "a", 2), (13, "b", 3), (25, "a", 10)]
    write_rollup_partial(_batch(spark, b1), d, SPEC, epoch_id=0)
    write_rollup_partial(_batch(spark, b2), d, SPEC, epoch_id=1)
    direct = {
        ((r.block_number // 10) * 10, r.kind)
        for r in _batch(spark, b1 + b2).collect()
    }
    got = _view(spark, d)
    assert set(got) == direct
    assert got[(0, "a")] == (14, 3, 2, 7, 14 / 3)
    assert got[(10, "b")] == (4, 2, 1, 3, 2.0)
    assert got[(20, "a")] == (10, 1, 10, 10, 10.0)


def test_replay_is_idempotent(spark, tmp_path):
    d = str(tmp_path / "rollup")
    os.makedirs(d)
    rows = [(0, "a", 5), (1, "a", 6)]
    sink = rollup_sink(d, SPEC)
    sink(_batch(spark, rows), 7)
    before = _view(spark, d)
    sink(_batch(spark, rows), 7)  # at-least-once replay of the same epoch
    assert _view(spark, d) == before


def test_compaction_preserves_view_and_bounds_epochs(spark, tmp_path):
    d = str(tmp_path / "rollup")
    os.makedirs(d)
    for e in range(5):
        write_rollup_partial(
            _batch(spark, [(e * 10, "a", e + 1), (3, "b", 2 * e)]), d, SPEC, e
        )
    before = _view(spark, d)
    folded = compact_rollup(spark, d, SPEC, include_latest=True)
    assert folded == 5
    fs = HadoopFS(spark, d)
    assert [x for x in fs.listdir(d) if x.startswith("epoch=")] == ["epoch=-1"]
    assert _view(spark, d) == before
    # further partials stack on top of the compacted epoch
    write_rollup_partial(_batch(spark, [(0, "a", 100)]), d, SPEC, 9)
    assert _view(spark, d)[(0, "a")][0] == before[(0, "a")][0] + 100


def test_compaction_crash_recovery(spark, tmp_path):
    import json

    d = str(tmp_path / "rollup")
    os.makedirs(d)
    for e in range(3):
        write_rollup_partial(_batch(spark, [(0, "a", 1)]), d, SPEC, e)
    before = _view(spark, d)
    fs = HadoopFS(spark, d)

    # uncommitted tmp (no manifest): dropped by the next compact
    fs.mkdirs(url_join(d, "_merge_tmp"))
    fs.write_bytes(url_join(d, "_merge_tmp", "part-junk.parquet"), b"junk")
    assert compact_rollup(spark, d, SPEC, include_latest=True) == 3
    assert _view(spark, d) == before

    # committed tmp (manifest written, swap crashed): replayed by recovery
    write_rollup_partial(_batch(spark, [(0, "a", 4)]), d, SPEC, 5)
    merged = read_rollup(spark, d, SPEC)
    tmp = url_join(d, "_merge_tmp")
    merged.coalesce(1).write.mode("overwrite").parquet(tmp)
    srcs = [x for x in fs.listdir(d) if x.startswith("epoch=")]
    fs.write_bytes(url_join(tmp, "_MERGED.json"),
                   json.dumps({"sources": srcs}).encode())
    # crash here: next compact recovers the swap, then has nothing to fold
    assert compact_rollup(spark, d, SPEC) == 0
    got = _view(spark, d)
    assert got[(0, "a")][0] == before[(0, "a")][0] + 4


def test_non_decomposable_measure_is_rejected():
    with pytest.raises(ValueError, match="not decomposable"):
        RollupSpec(measures={"bad": ("avg", "amount")})


def test_streaming_end_to_end_with_resume(spark, tmp_path):
    """Real readStream -> rollup_sink: totals accumulate across two
    checkpointed drains with no double counting."""
    in_dir, ckpt, d = str(tmp_path / "in"), str(tmp_path / "ck"), str(tmp_path / "r")
    os.makedirs(in_dir), os.makedirs(d)

    def drain():
        stream = spark.readStream.schema(
            "block_number long, kind string, amount long"
        ).parquet(in_dir)
        q = (
            stream.writeStream.foreachBatch(rollup_sink(d, SPEC))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)

    _batch(spark, [(0, "a", 5), (11, "a", 7)]).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    drain()
    assert _view(spark, d)[(0, "a")][0] == 5

    _batch(spark, [(1, "a", 10)]).coalesce(1).write.mode("append").parquet(in_dir)
    drain()  # resume: only the new file lands
    got = _view(spark, d)
    assert got[(0, "a")][0] == 15 and got[(10, "a")][0] == 7


def test_compact_excludes_trailing_epoch_by_default(spark, tmp_path):
    """The highest epoch may belong to a batch whose offset never
    committed; folding it would double-count after checkpoint replay, so
    the default leaves it unfolded — and a replay overwrite stays safe."""
    d = str(tmp_path / "rollup")
    os.makedirs(d)
    for e in range(3):
        write_rollup_partial(_batch(spark, [(0, "a", 10 + e)]), d, SPEC, e)
    before = _view(spark, d)
    assert compact_rollup(spark, d, SPEC) == 2  # epochs 0,1 only
    fs = HadoopFS(spark, d)
    left = sorted(x for x in fs.listdir(d) if x.startswith("epoch="))
    assert left == ["epoch=-1", "epoch=2"]
    # checkpoint replay rewrites the trailing epoch: view unchanged
    write_rollup_partial(_batch(spark, [(0, "a", 12)]), d, SPEC, 2)
    assert _view(spark, d) == before


def test_read_handles_interrupted_swap_without_mutating(spark, tmp_path):
    """A crash BETWEEN source-deletes and the rename must not under-count
    the next read. The read path is NON-MUTATING (a reader may race the
    stream's in-batch compactor, so it must never delete or rename): it
    reads the manifest-bearing tmp as an extra source, excludes the
    manifest's listed epochs, and leaves repair to the next writer-side
    compact."""
    import json

    d = str(tmp_path / "rollup")
    os.makedirs(d)
    for e in range(3):
        write_rollup_partial(_batch(spark, [(0, "a", 1)]), d, SPEC, e)
    before = _view(spark, d)
    fs = HadoopFS(spark, d)
    # build the committed tmp a real compact would have, then simulate the
    # worst crash point: SOME sources deleted, rename never happened
    srcs = sorted(x for x in fs.listdir(d) if x.startswith("epoch="))
    merged = read_rollup(spark, d, SPEC)
    tmp = url_join(d, "_merge_tmp")
    merged.coalesce(1).write.mode("overwrite").parquet(tmp)
    fs.write_bytes(url_join(tmp, "_MERGED.json"),
                   json.dumps({"sources": srcs}).encode())
    fs.delete(url_join(d, srcs[0]), recursive=True)  # partial delete
    assert _view(spark, d) == before   # correct view, surviving srcs excluded
    assert fs.exists(tmp)              # read did NOT mutate
    assert not fs.exists(url_join(d, "epoch=-1"))
    # worst crash point: EVERY source deleted, tmp is the only copy
    for s in srcs[1:]:
        fs.delete(url_join(d, s), recursive=True)
    assert _view(spark, d) == before
    assert fs.exists(tmp)
    # writer-side compact replays the swap and converges the layout
    assert compact_rollup(spark, d, SPEC) == 0
    assert _view(spark, d) == before
    assert fs.exists(url_join(d, "epoch=-1")) and not fs.exists(tmp)


def test_read_ignores_manifestless_tmp_of_inflight_compactor(spark, tmp_path):
    """A manifest-less ``_merge_tmp`` is an IN-FLIGHT compactor write: the
    read must neither count it nor delete it (deleting it would gut the
    compactor's directory right before its manifest lands, and the commit
    would then destroy every source epoch)."""
    d = str(tmp_path / "rollup")
    os.makedirs(d)
    for e in range(2):
        write_rollup_partial(_batch(spark, [(0, "a", 1)]), d, SPEC, e)
    before = _view(spark, d)
    fs = HadoopFS(spark, d)
    tmp = url_join(d, "_merge_tmp")
    # in-flight compactor: data already written, manifest not yet
    read_rollup(spark, d, SPEC).coalesce(1).write.mode("overwrite").parquet(tmp)
    assert _view(spark, d) == before   # tmp not counted
    assert fs.exists(tmp)              # and not deleted


def test_stream_id_guard_refuses_foreign_checkpoint(spark, tmp_path):
    d = str(tmp_path / "rollup")
    os.makedirs(d)
    rollup_sink(d, SPEC, stream_id="ckpt-A")(_batch(spark, [(0, "a", 1)]), 0)
    with pytest.raises(RuntimeError, match="refusing epoch overwrite"):
        rollup_sink(d, SPEC, stream_id="ckpt-B")(_batch(spark, [(5, "a", 2)]), 0)
    # the original stream keeps writing fine (replay included)
    rollup_sink(d, SPEC, stream_id="ckpt-A")(_batch(spark, [(0, "a", 1)]), 0)


def test_sink_pipeline_maintains_rollup(spark, tmp_path):
    """run_pipeline(rollup_spec=...) keeps _rollup/ partials in lockstep
    with the lake: merged view == direct aggregate of read_lake."""
    from .test_protowire import BLOCK
    from .test_streaming import _stage_blocks
    from substreams_sink_parquet_spark.sink.writer import WriterOptions, read_lake
    from substreams_sink_parquet_spark.streaming.stream_sink import run_pipeline

    spec = RollupSpec(
        bucket_col="block_number", bucket_size=10,
        measures={"n_rows": ("count", "*"), "hi_block": ("max", "block_number")},
    )
    in_dir, out, ckpt = str(tmp_path / "in"), str(tmp_path / "lake"), str(tmp_path / "ck")
    _stage_blocks(spark, in_dir, list(range(0, 25)), 0)
    q, _ = run_pipeline(
        spark, in_dir, out, BLOCK, ckpt,
        opts=WriterOptions(partition_size=10, start_block=0),
        undo_holdback=0, rollup_spec=spec,
    )
    q.awaitTermination(120)
    got = {
        r.bucket: (r.n_rows, r.hi_block)
        for r in read_rollup(spark, url_join(out, "_rollup"), spec).collect()
    }
    # the rollup tracks everything INGESTED — finalized ranges plus the
    # not-yet-final live tail (blocks 20-24 under holdback), exactly what a
    # "progress so far" dashboard wants
    assert got == {0: (10, 9), 10: (10, 19), 20: (5, 24)}
    finalized = read_lake(spark, out).count()
    assert finalized == 20  # the live tail is not finalized yet


def test_spec_json_round_trip():
    assert RollupSpec.from_json(SPEC.to_json()) == SPEC


def test_undo_keeps_rollup_in_lockstep(spark, tmp_path):
    """Reorg retraction must drop above-fork buckets, rebuild the spanning
    bucket from surviving rows, and keep below-fork buckets — re-feeding
    the fork must NOT double-count."""
    from .test_protowire import BLOCK
    from .test_streaming import _stage_blocks
    from substreams_sink_parquet_spark.sink.writer import WriterOptions
    from substreams_sink_parquet_spark.streaming.stream_sink import run_pipeline

    spec = RollupSpec(
        bucket_col="block_number", bucket_size=10,
        measures={"n_rows": ("count", "*"), "hi": ("max", "block_number")},
    )
    in_dir, out, ckpt = str(tmp_path / "in"), str(tmp_path / "lake"), str(tmp_path / "ck")
    _stage_blocks(spark, in_dir, list(range(0, 25)), 0)
    q, sink = run_pipeline(
        spark, in_dir, out, BLOCK, ckpt,
        opts=WriterOptions(partition_size=10, start_block=0),
        undo_holdback=0, rollup_spec=spec,
    )
    q.awaitTermination(120)

    sink.undo(last_valid_block=14)
    rd = url_join(out, "_rollup")
    got = {r.bucket: (r.n_rows, r.hi) for r in read_rollup(spark, rd, spec).collect()}
    assert got == {0: (10, 9), 10: (5, 14)}  # 15..24 retracted

    # re-feed the fork: blocks 15..24 arrive again as a new epoch
    df = spark.read.parquet(in_dir).where(F.col("block_number") >= 15)
    sink.process_batch(df, 1)
    got = {r.bucket: (r.n_rows, r.hi) for r in read_rollup(spark, rd, spec).collect()}
    assert got == {0: (10, 9), 10: (10, 19), 20: (5, 24)}


def test_in_stream_auto_compaction_bounds_epochs(spark, tmp_path):
    """rollup_compact_every folds committed epochs during the stream; the
    trailing epoch is never folded."""
    from .test_protowire import BLOCK
    from .test_streaming import _stage_blocks
    from substreams_sink_parquet_spark.fsio import HadoopFS
    from substreams_sink_parquet_spark.sink.writer import WriterOptions
    from substreams_sink_parquet_spark.streaming.stream_sink import StreamingSink

    spec = RollupSpec(bucket_col="block_number", bucket_size=10,
                      measures={"n_rows": ("count", "*")})
    in_dir, out = str(tmp_path / "in"), str(tmp_path / "lake")
    sink = StreamingSink(
        spark=spark, spec=BLOCK, out_dir=out,
        opts=WriterOptions(partition_size=10, start_block=0),
        rollup_spec=spec, rollup_compact_every=2, stream_id="ck",
    )
    for e in range(5):
        _stage_blocks(spark, in_dir, list(range(e * 5, e * 5 + 5)), e)
    staged = spark.read.parquet(in_dir)
    for e in range(5):
        lo, hi = e * 5, e * 5 + 5
        sink.process_batch(
            staged.where((F.col("block_number") >= lo) & (F.col("block_number") < hi)), e
        )
    fs = HadoopFS(spark, out)
    rd = url_join(out, "_rollup")
    epochs = sorted(x for x in fs.listdir(rd) if x.startswith("epoch="))
    # folds ran at epochs 2 and 4; trailing epoch never folded
    assert "epoch=-1" in epochs and len(epochs) <= 3
    got = {r.bucket: r.n_rows for r in read_rollup(spark, rd, spec).collect()}
    assert got == {0: 10, 10: 10, 20: 5}


def test_read_rechecks_manifest_that_appears_mid_scan(spark, tmp_path, monkeypatch):
    """ADVICE r5 TOCTOU: the compactor writes its manifest AND deletes the
    source epochs in the window between read_rollup's manifest check and
    its directory listing. The old read returned a silently under-counted
    view (neither sources nor tmp); the re-check after listdir must detect
    the race and re-snapshot."""
    import json

    d = str(tmp_path / "rollup")
    os.makedirs(d)
    for e in range(3):
        write_rollup_partial(_batch(spark, [(0, "a", 1), (11, "b", e)]), d, SPEC, e)
    before = _view(spark, d)
    fs = HadoopFS(spark, d)
    srcs = sorted(x for x in fs.listdir(d) if x.startswith("epoch="))
    tmp = url_join(d, "_merge_tmp")
    # pre-stage the compactor's merged data, but NOT its manifest yet
    read_rollup(spark, d, SPEC).coalesce(1).write.mode("overwrite").parquet(tmp)

    manifest = url_join(tmp, "_MERGED.json")
    state = {"fired": False}
    real_exists = HadoopFS.exists

    def racing_exists(self, path):
        if path == manifest and not state["fired"]:
            # first manifest probe sees "no manifest"; the compactor then
            # lands the manifest and deletes every source before listdir
            state["fired"] = True
            fs.write_bytes(manifest, json.dumps({"sources": srcs}).encode())
            for s in srcs:
                fs.delete(url_join(d, s), recursive=True)
            return False
        return real_exists(self, path)

    monkeypatch.setattr(HadoopFS, "exists", racing_exists)
    assert _view(spark, d) == before  # re-snapshot saw tmp + manifest


def test_rollup_refuses_changed_spec_and_floors_negative_buckets(spark, tmp_path):
    """Two review closures (r12): (1) partials written under a CHANGED spec
    are schema-heterogeneous and the merge read would silently drop/misread
    older epochs' measure columns — the writer now refuses a spec mismatch
    loudly; (2) bucket_expr uses pmod so a negative bucket value floors to
    the bucket BELOW it instead of bucket 0."""
    import pytest

    from substreams_sink_parquet_spark.streaming.rollup import (
        RollupSpec, read_rollup, write_rollup_partial,
    )

    d = str(tmp_path / "ru")
    spec = RollupSpec(bucket_col="bn", bucket_size=10,
                      measures={"n": ("count", "bn")})
    df = spark.createDataFrame([(-5,), (3,), (15,)], "bn long")
    write_rollup_partial(df, d, spec, epoch_id=0)
    got = {r.bucket: r.n for r in read_rollup(spark, d, spec).collect()}
    assert got == {-10: 1, 0: 1, 10: 1}  # -5 floors to -10, never 0

    changed = RollupSpec(bucket_col="bn", bucket_size=10,
                         measures={"n": ("count", "bn"),
                                   "hi": ("max", "bn")})
    with pytest.raises(ValueError, match="different spec"):
        write_rollup_partial(df, d, changed, epoch_id=1)
    # the SAME spec keeps appending fine
    write_rollup_partial(df, d, spec, epoch_id=1)


def test_derived_ratio_is_null_not_ansi_error_on_zero_count(spark, tmp_path):
    """A count measure over a COLUMN (not *) merges to 0 in a bucket whose
    values are all null; the derived avg must be NULL under ANSI, not a
    DIVIDE_BY_ZERO abort of the whole read (code review r12)."""
    d = str(tmp_path / "ru0")
    spec = RollupSpec(
        bucket_col="bn", bucket_size=10,
        measures={"s": ("sum", "amount"), "n": ("count", "amount")},
    )
    df = spark.createDataFrame(
        [(1, None), (2, None), (12, 4)], "bn long, amount long"
    )
    write_rollup_partial(df, d, spec, epoch_id=0)
    ansi_was = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        got = {
            r.bucket: (r.n, r.avg)
            for r in read_rollup(
                spark, d, spec, derived={"avg": ("s", "n")}
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi_was)
    assert got[0] == (0, None)   # nothing to average — not an error
    assert got[10] == (1, 4.0)
