"""Staging feeder: append raw block batches for the streaming file source.

The raw shape is the reference's bronze layout (block_number, block_id,
payload) — converter_raw.go:22-26. Files are appended atomically (write then
move would be needed on object stores; the local file source tolerates
append-once files).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession

from .. import protowire as pw
from ..decode import RAW_SCHEMA_DDL


def stage_raw_blocks(
    spark: SparkSession,
    input_dir: str,
    blocks: Iterable[tuple[int, str, bytes]],
) -> None:
    """Append one parquet file containing the given (number, id, payload) rows.
    A None payload stages as NULL — the reference's nil MapOutput (a block
    the module produced no output for; decode skips it, the cursor/horizon
    still advances past it)."""
    rows = [
        (bn, bid, bytearray(payload) if payload is not None else None)
        for bn, bid, payload in blocks
    ]
    df = spark.createDataFrame(rows, RAW_SCHEMA_DDL)
    df.coalesce(1).write.mode("append").parquet(input_dir)


def synth_blocks(
    spec: pw.MessageSpec,
    block_numbers: Iterable[int],
    payload_fn,
) -> list[tuple[int, str, bytes]]:
    """Deterministic synthetic chain segment: payload_fn(bn) -> value dict."""
    return [
        (bn, f"0x{bn:08x}", pw.encode_message(payload_fn(bn), spec))
        for bn in block_numbers
    ]


def raw_stream(spark: SparkSession, input_dir: str, max_files_per_trigger: int = 8) -> DataFrame:
    """readStream over the staging dir (ordered, checkpointable delivery)."""
    return (
        spark.readStream.schema(RAW_SCHEMA_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
