"""CLI end-to-end: descriptor set on disk → run --drain-and-exit → lake."""

import os

from substreams_sink_parquet_spark import protowire as pw
from substreams_sink_parquet_spark.cli import main

from .test_protowire import BLOCK
from .test_streaming import _stage_blocks


def test_cli_setup(tmp_path, spark):
    assert main(["setup", f"file://{tmp_path}"]) == 0


def test_cli_run_drain(tmp_path, spark):
    desc = tmp_path / "block.fds"
    desc.write_bytes(pw.build_file_descriptor_set("test", [BLOCK]))
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "lake")
    _stage_blocks(spark, input_dir, list(range(0, 22)), 0)

    rc = main([
        "run", out_dir, input_dir,
        "--descriptor-set", str(desc),
        "--output-type", "test.Block",
        "--checkpoint", str(tmp_path / "ckpt"),
        "--partition-size", "10",
        "--compression", "snappy",
        "--drain-and-exit",
    ])
    assert rc == 0
    files = sorted(f for f in os.listdir(out_dir) if f.endswith(".parquet"))
    assert files == [
        "0000000000-0000000010.parquet",
        "0000000010-0000000020.parquet",
    ]
