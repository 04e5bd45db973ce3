"""Streaming pipeline: staged raw blocks → decoded, range-partitioned lake.

Reference translation (SURVEY.md §3.1):

- gRPC stream source (sinker.go:91) → a file-source ``readStream`` over a
  staging directory of raw block parquet (block_number, block_id, payload).
  An external feeder appends files; Spark's file source tracks what's been
  consumed.
- cursor file save-per-block (cursor.go:27-32, sinker.go:225) →
  ``checkpointLocation``: offsets commit only after the batch's files are
  durable, which strictly improves on the reference's cursor-ahead-of-upload
  hazard (writer.go:350-371).
- flush policy rows/time (sinker.go:166-190) → micro-batch trigger.
- undo/reorg handling, which the reference stubs as a passthrough
  (undo_buffer.go:19-28): implemented here as the *intended* holdback — a
  range is finalized (renamed to its padded name) only once
  ``max_seen_block >= range_end + undo_holdback``; younger blocks stay in a
  re-writable staging area, and ``undo(last_valid_block)`` drops staged rows
  above the fork point.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import protowire as pw
from ..decode import decode_payloads
from ..partition import file_name, range_start_col
from ..schema import SchemaOptions
from ..sink.explode import explode_all
from ..sink.writer import WriterOptions, backfill_empty


@dataclass
class StreamingSink:
    """foreachBatch sink with undo holdback.

    Layout under ``out_dir``:
      - ``_live/range_start=N/`` parquet rows of not-yet-final ranges
        (re-writable on reorg);
      - ``{rs:010d}-{re:010d}.parquet`` finalized immutable range files.
    """

    spark: SparkSession
    spec: pw.MessageSpec
    out_dir: str
    opts: WriterOptions = field(default_factory=WriterOptions)
    schema_opts: SchemaOptions = field(default_factory=SchemaOptions)
    undo_holdback: int = 0
    explode: bool = False
    _max_seen: int = -1

    @property
    def live_dir(self) -> str:
        return os.path.join(self.out_dir, "_live")

    # -- foreachBatch entry -------------------------------------------------

    def process_batch(self, raw_batch: DataFrame, epoch_id: int) -> None:
        decoded = decode_payloads(raw_batch, self.spec, self.schema_opts)
        self._append_live(decoded, self.out_dir)
        if self.explode:
            for name, child in explode_all(decoded, self.spec).items():
                child_dir = os.path.join(self.out_dir, name)
                os.makedirs(child_dir, exist_ok=True)
                self._append_live(child, child_dir)
        hi = raw_batch.agg(F.max("block_number")).collect()[0][0]
        if hi is not None:
            self._max_seen = max(self._max_seen, int(hi))
        self._finalize_ready(self.out_dir)
        if self.explode:
            for f in self.spec.fields:
                if f.repeated and not f.is_map:
                    self._finalize_ready(os.path.join(self.out_dir, f.name))

    def _append_live(self, df: DataFrame, table_dir: str) -> None:
        ranged = df.withColumn(
            "range_start",
            range_start_col("block_number", self.opts.start_block, self.opts.partition_size),
        )
        (
            ranged.write.mode("append")
            .option("compression", self.opts.compression)
            .partitionBy("range_start")
            .parquet(os.path.join(table_dir, "_live"))
        )

    # -- finalize -----------------------------------------------------------

    def _ready_ranges(self, live: str) -> list[int]:
        if not os.path.isdir(live):
            return []
        ready = []
        for d in os.listdir(live):
            if not d.startswith("range_start="):
                continue
            rs = int(d.split("=", 1)[1])
            re_ = rs + self.opts.partition_size
            if self._max_seen >= re_ + self.undo_holdback - 1:
                ready.append(rs)
        return sorted(ready)

    def _finalize_ready(self, table_dir: str) -> None:
        """Compact each fully-past range to one sorted padded-name file."""
        live = os.path.join(table_dir, "_live")
        for rs in self._ready_ranges(live):
            src = os.path.join(live, f"range_start={rs}")
            df = self.spark.read.parquet(src)
            re_ = rs + self.opts.partition_size
            if self.opts.end_block is not None:
                re_ = min(re_, self.opts.end_block)
            tmp = os.path.join(table_dir, f"_final_{rs}")
            (
                df.coalesce(1)
                .sortWithinPartitions("block_number")
                .write.mode("overwrite")
                .option("compression", self.opts.compression)
                .parquet(tmp)
            )
            part = next(
                f for f in os.listdir(tmp)
                if f.endswith(".parquet") and not f.startswith("_")
            )
            name = file_name(rs, re_, self.opts.pad)
            shutil.move(os.path.join(tmp, part), os.path.join(table_dir, name))
            shutil.rmtree(tmp, ignore_errors=True)
            shutil.rmtree(src, ignore_errors=True)
            self._backfill_before(table_dir, rs)

    def _backfill_before(self, table_dir: str, rs: int) -> None:
        """Contiguity guarantee: empty files for gaps below a finalized range."""
        if rs <= self.opts.start_block:
            return
        template = self.spark.read.parquet(
            os.path.join(table_dir, file_name(rs, rs + self.opts.partition_size, self.opts.pad))
        )
        backfill_empty(
            self.spark,
            template,
            table_dir,
            WriterOptions(
                partition_size=self.opts.partition_size,
                start_block=self.opts.start_block,
                end_block=self.opts.end_block,
                compression=self.opts.compression,
                pad=self.opts.pad,
            ),
            upto=rs - 1,
        )

    # -- reorg --------------------------------------------------------------

    def undo(self, last_valid_block: int) -> None:
        """Drop staged rows above the fork point (HandleBlockUndoSignal,
        sinker.go:142-148 — which the reference turns into an error or no-op;
        here it is a real partition-level retraction on the live area)."""
        live = self.live_dir
        if not os.path.isdir(live):
            return
        for d in list(os.listdir(live)):
            if not d.startswith("range_start="):
                continue
            rs = int(d.split("=", 1)[1])
            src = os.path.join(live, d)
            if rs > last_valid_block:
                shutil.rmtree(src)
            elif rs + self.opts.partition_size - 1 > last_valid_block:
                kept = self.spark.read.parquet(src).filter(
                    F.col("block_number") <= last_valid_block
                )
                tmp = src + "_rewrite"
                kept.write.mode("overwrite").parquet(tmp)
                shutil.rmtree(src)
                shutil.move(tmp, src)
        self._max_seen = min(self._max_seen, last_valid_block)


def run_pipeline(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    spec: pw.MessageSpec,
    checkpoint_dir: str,
    opts: WriterOptions | None = None,
    schema_opts: SchemaOptions | None = None,
    undo_holdback: int = 0,
    explode: bool = False,
    available_now: bool = True,
    flush_interval: str = "1 second",
):
    """readStream over staged raw-block parquet → StreamingSink.

    ``available_now=True`` drains the staging dir then stops (batch-like,
    used by tests); otherwise a continuous micro-batch trigger with the
    reference's default 1 s flush cadence (run.go:50)."""
    os.makedirs(out_dir, exist_ok=True)
    sink = StreamingSink(
        spark=spark,
        spec=spec,
        out_dir=out_dir,
        opts=opts or WriterOptions(),
        schema_opts=schema_opts or SchemaOptions(),
        undo_holdback=undo_holdback,
        explode=explode,
    )
    from ..sources.staging import raw_stream

    stream = raw_stream(spark, input_dir)
    writer = stream.writeStream.foreachBatch(sink.process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=flush_interval)
    query = writer.start()
    return query, sink
