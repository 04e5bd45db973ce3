"""Wire-format codec + descriptor tests (SURVEY.md §5.3-5.4 fixtures)."""

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from substreams_sink_parquet_spark import protowire as pw

# A root message exercising every proto kind (FIXTURES.md sink fixtures).
NESTED = pw.MessageSpec("test.Block.Meta", (
    pw.FieldSpec("author", 1, pw.K_STRING),
    pw.FieldSpec("height", 2, pw.K_UINT32),
))
TRANSFER = pw.MessageSpec("test.Block.Transfer", (
    pw.FieldSpec("from_addr", 1, pw.K_STRING),
    pw.FieldSpec("amount", 2, pw.K_UINT64),
    pw.FieldSpec("ok", 3, pw.K_BOOL),
))
MAP_ENTRY = pw.MessageSpec("test.Block.AttrsEntry", (
    pw.FieldSpec("key", 1, pw.K_STRING),
    pw.FieldSpec("value", 2, pw.K_INT64),
), map_entry=True)
BLOCK = pw.MessageSpec("test.Block", (
    pw.FieldSpec("b", 1, pw.K_BOOL),
    pw.FieldSpec("i32", 2, pw.K_INT32),
    pw.FieldSpec("si32", 3, pw.K_SINT32),
    pw.FieldSpec("sf32", 4, pw.K_SFIXED32),
    pw.FieldSpec("i64", 5, pw.K_INT64),
    pw.FieldSpec("si64", 6, pw.K_SINT64),
    pw.FieldSpec("sf64", 7, pw.K_SFIXED64),
    pw.FieldSpec("u32", 8, pw.K_UINT32),
    pw.FieldSpec("f32", 9, pw.K_FIXED32),
    pw.FieldSpec("u64", 10, pw.K_UINT64),
    pw.FieldSpec("f64", 11, pw.K_FIXED64),
    pw.FieldSpec("fl", 12, pw.K_FLOAT),
    pw.FieldSpec("db", 13, pw.K_DOUBLE),
    pw.FieldSpec("s", 14, pw.K_STRING),
    pw.FieldSpec("by", 15, pw.K_BYTES),
    pw.FieldSpec("en", 16, pw.K_ENUM),
    pw.FieldSpec("meta", 17, pw.K_MESSAGE, message=NESTED),
    pw.FieldSpec("transfers", 18, pw.K_MESSAGE, repeated=True, message=TRANSFER),
    pw.FieldSpec("tags", 19, pw.K_STRING, repeated=True),
    pw.FieldSpec("nums", 20, pw.K_INT64, repeated=True),
    pw.FieldSpec("attrs", 21, pw.K_MESSAGE, repeated=True, message=MAP_ENTRY),
))

FULL_VALUES = {
    "b": True, "i32": -42, "si32": -7, "sf32": -2**31,
    "i64": -(2**62), "si64": -123456789, "sf64": -(2**63),
    "u32": 2**32 - 1, "f32": 2**32 - 1, "u64": 2**64 - 1, "f64": 2**64 - 1,
    "fl": 1.5, "db": math.pi, "s": "héllo", "by": b"\x00\x01\xff",
    "en": 3,
    "meta": {"author": "alice", "height": 99},
    "transfers": [
        {"from_addr": "0xa", "amount": 10, "ok": True},
        {"from_addr": "0xb", "amount": 2**63, "ok": False},
    ],
    "tags": ["x", "y"],
    "nums": [1, -2, 3],
    "attrs": {"k1": 1, "k2": -2},
}


def test_roundtrip_all_kinds():
    buf = pw.encode_message(FULL_VALUES, BLOCK)
    out = pw.decode_message(buf, BLOCK)
    assert out == FULL_VALUES


def test_unset_fields_absent():
    buf = pw.encode_message({"s": "only"}, BLOCK)
    out = pw.decode_message(buf, BLOCK)
    assert out == {"s": "only"}
    assert "i64" not in out  # unset → absent → NULL downstream


def test_unknown_fields_skipped():
    extra = pw.MessageSpec("x", (pw.FieldSpec("zzz", 99, pw.K_STRING),))
    buf = pw.encode_message(FULL_VALUES, BLOCK) + pw.encode_message({"zzz": "?"}, extra)
    out = pw.decode_message(buf, BLOCK)
    assert out == FULL_VALUES


def test_packed_repeated_scalars():
    # packed encoding (wire type LEN) must decode identically to unpacked
    out = bytearray()
    pw.write_varint(out, (20 << 3) | pw.WT_LEN)
    payload = bytearray()
    for v in (5, 6, 7):
        pw.write_varint(payload, v)
    pw.write_varint(out, len(payload))
    out.extend(payload)
    assert pw.decode_message(bytes(out), BLOCK) == {"nums": [5, 6, 7]}


def test_file_descriptor_set_roundtrip():
    fds = pw.build_file_descriptor_set("test", [BLOCK])
    specs = pw.parse_file_descriptor_set(fds)
    blk = specs["test.Block"]
    assert [f.name for f in blk.fields] == [f.name for f in BLOCK.fields]
    assert blk.field("transfers").repeated
    assert blk.field("transfers").message.field("amount").kind == pw.K_UINT64
    assert blk.field("attrs").is_map
    assert blk.field("meta").message.field("height").kind == pw.K_UINT32
    # decode through the parsed spec gives the same values
    buf = pw.encode_message(FULL_VALUES, BLOCK)
    assert pw.decode_message(buf, blk) == FULL_VALUES


@st.composite
def random_values(draw):
    return {
        "i32": draw(st.integers(-(2**31), 2**31 - 1)),
        "si64": draw(st.integers(-(2**63), 2**63 - 1)),
        "u64": draw(st.integers(0, 2**64 - 1)),
        "db": draw(st.floats(allow_nan=False)),
        "s": draw(st.text(max_size=40)),
        "by": draw(st.binary(max_size=40)),
        "tags": draw(st.lists(st.text(max_size=10), max_size=5)),
        "nums": draw(st.lists(st.integers(-(2**63), 2**63 - 1), max_size=5)),
    }


@given(random_values())
@settings(max_examples=200, deadline=None)
def test_roundtrip_property(vals):
    buf = pw.encode_message(vals, BLOCK)
    out = pw.decode_message(buf, BLOCK)
    expected = {k: v for k, v in vals.items() if v != [] }
    assert out == expected


def test_truncated_raises():
    buf = pw.encode_message(FULL_VALUES, BLOCK)
    with pytest.raises(ValueError):
        pw.decode_message(buf[:-3], BLOCK)
