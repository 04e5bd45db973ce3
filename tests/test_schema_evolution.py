"""Cross-run schema evolution: additive drift is writable and readable,
breaking drift is refused before a mixed file lands.

The reference fixes its schema once per run (converter_proto.go:24-45) and
has no story for a lake written across .spkg upgrades; these tests pin the
story this engine defines: schema_drift classification, the streaming-sink
guard, and merge_schema lake reads.
"""

import pytest
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from substreams_sink_parquet_spark import protowire as pw
from substreams_sink_parquet_spark.schema import schema_drift
from substreams_sink_parquet_spark.sink.writer import (
    WriterOptions,
    ensure_schema_compatible,
    lake_schema,
    read_lake,
)
from substreams_sink_parquet_spark.sources import stage_raw_blocks, synth_blocks
from substreams_sink_parquet_spark.streaming.stream_sink import run_pipeline

# v1 -> v2 adds a nullable field (additive); v1 -> v3 retypes one (breaking)
BLOCK_V1 = pw.MessageSpec("test.EvBlock", (
    pw.FieldSpec("i64", 1, pw.K_INT64),
    pw.FieldSpec("s", 2, pw.K_STRING),
))
BLOCK_V2 = pw.MessageSpec("test.EvBlock", (
    pw.FieldSpec("i64", 1, pw.K_INT64),
    pw.FieldSpec("s", 2, pw.K_STRING),
    pw.FieldSpec("fee", 3, pw.K_DOUBLE),
))
BLOCK_V3 = pw.MessageSpec("test.EvBlock", (
    pw.FieldSpec("i64", 1, pw.K_STRING),  # retyped
    pw.FieldSpec("s", 2, pw.K_STRING),
))


def test_schema_drift_classification():
    old = StructType([
        StructField("a", LongType()),
        StructField("nest", StructType([StructField("x", StringType())])),
        StructField("arr", ArrayType(IntegerType())),
    ])
    new = StructType([
        StructField("a", LongType()),
        StructField("nest", StructType([
            StructField("x", StringType()),
            StructField("y", DoubleType()),       # nested addition
        ])),
        StructField("arr", ArrayType(LongType())),  # element retype
        StructField("b", StringType()),           # top-level addition
    ])
    additive, breaking = schema_drift(old, new)
    assert sorted(additive) == ["b: added (string)", "nest.y: added (double)"]
    assert breaking == ["arr.[]: type changed int -> bigint"]
    # reverse direction: additions become removals -> breaking
    additive_r, breaking_r = schema_drift(new, old)
    assert additive_r == []
    assert "b: removed (string)" in breaking_r
    assert "nest.y: removed (double)" in breaking_r


def _run(spark, spec, input_dir, out_dir, ckpt, payloads):
    stage_raw_blocks(spark, input_dir, synth_blocks(spec, payloads, lambda bn: {
        "i64": bn * 10, "s": f"blk-{bn}",
        **({"fee": bn / 2} if spec is BLOCK_V2 else {}),
    }))
    opts = WriterOptions(partition_size=10, start_block=0)
    query, sink = run_pipeline(
        spark, input_dir, out_dir, spec, ckpt, opts=opts, available_now=True
    )
    query.awaitTermination(120)
    return sink


def test_additive_evolution_writes_and_merges(spark, tmp_path):
    out_dir = str(tmp_path / "out")
    # run 1 at v1 finalizes [0,10)
    _run(spark, BLOCK_V1, str(tmp_path / "in1"), out_dir,
         str(tmp_path / "ck1"), list(range(0, 15)))
    assert "fee" not in {f.name for f in lake_schema(spark, out_dir).fields}
    # run 2 at v2 (adds fee) appends [20,30) — the guard allows it
    _run(spark, BLOCK_V2, str(tmp_path / "in2"), out_dir,
         str(tmp_path / "ck2"), list(range(20, 35)))
    merged = read_lake(spark, out_dir, merge_schema=True)
    assert "fee" in merged.columns
    rows = {r.block_number: r.fee for r in merged.collect()}
    assert rows[5] is None          # v1-era file: null-filled
    assert rows[25] == 12.5         # v2-era file: populated


def test_breaking_evolution_is_refused(spark, tmp_path):
    out_dir = str(tmp_path / "out")
    _run(spark, BLOCK_V1, str(tmp_path / "in1"), out_dir,
         str(tmp_path / "ck1"), list(range(0, 15)))
    with pytest.raises(Exception) as exc_info:
        _run(spark, BLOCK_V3, str(tmp_path / "in2"), out_dir,
             str(tmp_path / "ck2"), list(range(20, 35)))
    assert "type changed" in str(exc_info.value)
    # the lake is untouched: still only the v1 finalized file, no v3 rows
    assert {f.name for f in lake_schema(spark, out_dir).fields} == {
        "block_number", "block_id", "i64", "s"
    }
    assert read_lake(spark, out_dir).filter("block_number >= 20").count() == 0


def test_ensure_schema_compatible_empty_lake_is_noop(spark, tmp_path):
    out = str(tmp_path / "empty")
    new = StructType([StructField("a", LongType())])
    assert ensure_schema_compatible(spark, out, new) == []
