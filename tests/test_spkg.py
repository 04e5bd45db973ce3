""".spkg manifest unwrapping (factory.go:183-186, run.go:73-92 parity) and
the endpoint-mode CLI skeleton."""

import pytest

from substreams_sink_parquet_spark import protowire as pw
from substreams_sink_parquet_spark.spkg import build_spkg, parse_spkg

from .test_protowire import BLOCK


def _spkg_bytes():
    fds = pw.build_file_descriptor_set("test", [BLOCK])
    return build_spkg(fds, network="mainnet",
                      modules={"map_blocks": "proto:test.Block"})


def test_spkg_round_trip():
    m = parse_spkg(_spkg_bytes())
    assert m.network == "mainnet"
    assert m.module_output_types == {"map_blocks": "proto:test.Block"}
    assert m.output_type_of("map_blocks") == "test.Block"
    # proto_files retagged as a FileDescriptorSet parses to the same specs
    specs = pw.parse_file_descriptor_set(m.file_descriptor_set)
    assert "test.Block" in specs
    assert [f.name for f in specs["test.Block"].fields] == [
        f.name for f in BLOCK.fields
    ]


def test_spkg_unknown_module():
    m = parse_spkg(_spkg_bytes())
    with pytest.raises(KeyError, match="map_blocks"):
        m.output_type_of("nope")


def test_spkg_empty_module_map_message():
    """With no modules in the manifest the error must say '(none)', not
    trail off (ADVICE r2: '+' bound tighter than 'or')."""
    from substreams_sink_parquet_spark.spkg import SpkgManifest

    m = SpkgManifest(file_descriptor_set=b"x", module_output_types={})
    with pytest.raises(KeyError, match=r"\(none\)"):
        m.output_type_of("anything")


def test_spkg_not_a_package():
    with pytest.raises(ValueError, match="proto_files"):
        parse_spkg(b"\x50\x01")  # field 10 varint, no proto_files


def test_cli_run_accepts_spkg(tmp_path, spark):
    """run with --descriptor-set X.spkg --output-module resolves the type
    from the manifest and drains end-to-end."""
    import os

    from substreams_sink_parquet_spark.cli import main

    from .test_streaming import _stage_blocks

    spkg = tmp_path / "pkg.spkg"
    spkg.write_bytes(_spkg_bytes())
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "lake")
    _stage_blocks(spark, input_dir, list(range(0, 12)), 0)

    rc = main([
        "run", out_dir, input_dir,
        "--descriptor-set", str(spkg),
        "--output-module", "map_blocks",
        "--checkpoint", str(tmp_path / "ckpt"),
        "--partition-size", "10",
        "--drain-and-exit",
    ])
    assert rc == 0
    assert "0000000000-0000000010.parquet" in os.listdir(out_dir)


def test_cli_endpoint_mode_is_explicit_stub(tmp_path):
    """--endpoint / --network resolve like run.go:73-92 then error with the
    staged-feeder pointer (no silent fallback)."""
    from substreams_sink_parquet_spark.cli import main

    spkg = tmp_path / "pkg.spkg"
    spkg.write_bytes(_spkg_bytes())
    common = [
        "run", str(tmp_path / "lake"), str(tmp_path / "in"),
        "--descriptor-set", str(spkg),
        "--output-module", "map_blocks",
        "--checkpoint", str(tmp_path / "ckpt"),
    ]
    with pytest.raises(SystemExit, match="grpc.example:443.*staged-feeder"):
        main(common + ["--endpoint", "grpc.example:443"])
    with pytest.raises(SystemExit, match="mainnet.streamingfast.io:443"):
        main(common + ["--network", "mainnet"])


def test_truncated_spkg_fails_loudly():
    """A partially-downloaded .spkg must name the real problem (truncated
    field), not fail downstream with an unrelated descriptor-parse error
    on a silently-short payload (code review r12)."""
    import pytest

    from substreams_sink_parquet_spark.protowire import (
        K_INT64, FieldSpec, MessageSpec, build_file_descriptor_set,
    )
    from substreams_sink_parquet_spark.spkg import build_spkg, parse_spkg

    spec = MessageSpec("pkg.Block", (FieldSpec("number", 1, K_INT64),))
    full = build_spkg(build_file_descriptor_set("pkg", [spec]),
                      network="mainnet", modules={"map_blocks": "proto:pkg.Block"})
    assert parse_spkg(full).network == "mainnet"  # intact round-trips
    with pytest.raises(ValueError, match="truncated|incomplete"):
        parse_spkg(full[:-5])
