"""Custom Python DataSource (synth_blocks): batch + streaming raw block
generation with checkpointable offsets and deterministic replay."""

import os

from pyspark.sql import functions as F

from substreams_sink_parquet_spark import protowire as pw
from substreams_sink_parquet_spark.decode import decode_payloads
from substreams_sink_parquet_spark.sources import block_source

from .test_protowire import BLOCK


def _fds(tmp_path) -> str:
    p = tmp_path / "block.fds"
    p.write_bytes(pw.build_file_descriptor_set("test", [BLOCK]))
    return str(p)


def test_batch_read_generates_partitioned_range(spark, tmp_path):
    block_source.register(spark)
    df = (
        spark.read.format("synth_blocks")
        .option("descriptor_set", _fds(tmp_path))
        .option("output_type", BLOCK.name)
        .option("start_block", 100)
        .option("max_blocks", 50)
        .option("partitions", 4)
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    rows = df.orderBy("block_number").collect()
    assert [r.block_number for r in rows] == list(range(100, 150))
    # payloads decode through the normal path
    decoded = decode_payloads(df, BLOCK).filter(F.col("block_number") == 100).collect()
    assert decoded[0].s == "s-100"


def test_stream_read_resumes_from_checkpoint(spark, tmp_path):
    block_source.register(spark)
    ckpt = str(tmp_path / "ckpt")
    seen: list[int] = []

    def run_once():
        q = (
            spark.readStream.format("synth_blocks")
            .option("descriptor_set", _fds(tmp_path))
            .option("output_type", BLOCK.name)
            .option("blocks_per_batch", 10)
            .option("head_file", str(tmp_path / "head"))
            .option("max_blocks", 25)
            .option("partitions", 2)
            .load()
            .writeStream.foreachBatch(
                lambda df, _eid: seen.extend(r.block_number for r in df.collect())
            )
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once()
    assert sorted(seen) == list(range(25))

    # restart with the same checkpoint: offsets resume, nothing re-emitted
    seen.clear()
    run_once()
    assert seen == []
