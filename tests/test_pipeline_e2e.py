"""End-to-end training-data pipeline over the sink's own lake:

  synth blocks (text payloads) → streaming sink → block-range lake →
  pruned lake read → quality filter → exact dedup → near-dup clustering →
  keeper selection → curated parquet export.

This is the composition the engine exists for — every stage is an operator
tested elsewhere; here the contract is that they compose on real sink
output, not fixture tables.
"""

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from substreams_sink_parquet_spark import protowire as pw
from substreams_sink_parquet_spark.llm.dedup import (
    dedup_clusters,
    jaccard_pairs,
)
from substreams_sink_parquet_spark.sink.writer import WriterOptions, read_lake
from substreams_sink_parquet_spark.sources import stage_raw_blocks, synth_blocks
from substreams_sink_parquet_spark.streaming.stream_sink import run_pipeline

DOC = pw.MessageSpec("e2e.Doc", (
    pw.FieldSpec("doc_id", 1, pw.K_INT64),
    pw.FieldSpec("text", 2, pw.K_STRING),
))

# 30 docs: 0-9 unique prose; 10-14 five exact copies of one base text
# (collapse to keeper 10); 15-19 single-word variants of another base
# (near-dup cluster, keeper 15); 20-29 too short to pass the quality cut
_BASE0 = "the quick brown fox jumps over the lazy dog near the river bank today"
_BASE1 = "large scale data processing engines favor declarative plans and columnar io always"


def _text(bn: int) -> str:
    if bn < 10:
        return f"document number {bn} carries its own unique words plus filler token{bn} and more prose"
    if bn < 15:
        return _BASE0
    if bn < 20:
        return _BASE1.replace("always", f"variant{bn}")
    return "too short"


def test_training_pipeline_over_sink_lake(spark, tmp_path):
    in_dir, lake, ckpt = (str(tmp_path / d) for d in ("in", "lake", "ckpt"))
    curated = str(tmp_path / "curated")

    # 1) ingest: 30 blocks through the streaming sink (2 ranges finalized)
    stage_raw_blocks(
        spark, in_dir,
        synth_blocks(DOC, range(30), lambda bn: {"doc_id": bn, "text": _text(bn)}),
    )
    q, _ = run_pipeline(
        spark, in_dir, lake, DOC, ckpt,
        opts=WriterOptions(partition_size=10, start_block=0), available_now=True,
    )
    q.awaitTermination(120)

    # 2) pruned read of the finalized ranges (block 0-19; 20+ still live)
    docs = read_lake(spark, lake, start_block=0, end_block=19).select("doc_id", "text")
    assert docs.count() == 20

    # 3) quality filter (the short-doc cut would drop 20-29 if they were final)
    quality = docs.filter(F.size(F.split("text", " ")) >= 10)

    # 4) exact dedup: docs 10-14 collapse to keeper 10
    exact_keepers = (
        quality.groupBy(F.md5("text").alias("th"))
        .agg(F.min("doc_id").alias("keeper"))
    )
    kept = quality.join(
        exact_keepers, (F.md5(quality.text) == exact_keepers.th)
        & (quality.doc_id == exact_keepers.keeper)
    ).select("doc_id", "text")
    assert kept.count() == 16  # 20 - 4 exact copies

    # 5) near-dup clustering: docs 15-19 (single-word variants) form one cluster
    pairs = jaccard_pairs(kept, n=3, threshold=0.5)
    clusters = dedup_clusters(pairs)
    near_dropped = clusters.filter(F.col("doc_id") != F.col("canonical"))
    final = kept.join(near_dropped, "doc_id", "left_anti")
    n_final = final.count()
    # cluster {15..19} keeps exactly one representative
    assert n_final == 12, [r.doc_id for r in final.orderBy("doc_id").collect()]

    # 6) export the curated set
    final.orderBy("doc_id").coalesce(1).write.mode("overwrite").parquet(curated)
    part = next(f for f in os.listdir(curated) if f.endswith(".parquet"))
    t = pq.read_table(os.path.join(curated, part))
    assert t.num_rows == n_final
    assert set(t.column("doc_id").to_pylist()) == set(range(10)) | {10, 15}


def test_lifecycle_soak_explode_undo_compact_resume(spark, tmp_path):
    """Integration of the round-3 features end-to-end on one lake: explode
    mode, holdback staging, a deep reorg (below the finalize horizon),
    live-area compaction, checkpointed resume of the re-fed branch, and
    terminal close — the lake must come out contiguous with every block
    exactly once in the main table AND each exploded child."""
    import os

    import pyarrow.parquet as pq

    from substreams_sink_parquet_spark.fsio import HadoopFS
    from substreams_sink_parquet_spark.sink.maintenance import compact_live
    from substreams_sink_parquet_spark.sink.writer import WriterOptions, lake_coverage
    from substreams_sink_parquet_spark.streaming.stream_sink import run_pipeline

    from .test_protowire import BLOCK
    from .test_streaming import _stage_blocks

    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    opts = WriterOptions(partition_size=10, start_block=0, end_block=50)

    # phase 1: two micro-batch feeds with a holdback
    _stage_blocks(spark, input_dir, list(range(0, 20)), 0)
    q, sink = run_pipeline(spark, input_dir, out_dir, BLOCK, ckpt, opts=opts,
                           undo_holdback=5, explode=True)
    q.awaitTermination(120)
    _stage_blocks(spark, input_dir, list(range(20, 38)), 1)
    q, sink = run_pipeline(spark, input_dir, out_dir, BLOCK, ckpt, opts=opts,
                           undo_holdback=5, explode=True)
    q.awaitTermination(120)
    # max_seen=37, holdback 5: ranges [0,10),[10,20),[20,30) are final
    assert len([f for f in os.listdir(out_dir) if f.endswith(".parquet")]) == 3

    # phase 2: deep reorg to block 14 (below the finalize horizon)
    sink.undo(last_valid_block=14)

    # phase 3: compact the (multi-epoch) live area of every table
    compact_live(spark, out_dir, target_files=1)
    compact_live(spark, os.path.join(out_dir, "transfers"), target_files=1)
    compact_live(spark, os.path.join(out_dir, "tags"), target_files=1)

    # phase 4: re-feed the new branch 15.. and drain to the stop block
    _stage_blocks(spark, input_dir, list(range(15, 55)), 2)
    q, sink = run_pipeline(spark, input_dir, out_dir, BLOCK, ckpt, opts=opts,
                           undo_holdback=5, explode=True)
    q.awaitTermination(120)
    sink.close()  # terminal drain (stop-block reached)

    for table, rows_per_block in (("", 1), ("transfers", 1), ("tags", 1)):
        tdir = os.path.join(out_dir, table) if table else out_dir
        files = sorted(f for f in os.listdir(tdir) if f.endswith(".parquet"))
        blocks = sorted(
            b for f in files
            for b in pq.read_table(os.path.join(tdir, f)).column("block_number").to_pylist()
        )
        assert blocks == [b for b in range(50) for _ in range(rows_per_block)], (
            table, len(blocks)
        )
        rep = lake_coverage(HadoopFS(spark, tdir), tdir)
        assert rep["contiguous"], (table, rep)
        assert rep["first_block"] == 0 and rep["last_block"] == 50
