"""Pure-Python protobuf wire-format codec + descriptor model.

The reference decodes block payloads with dynamicpb against descriptors from
the .spkg manifest (reference parquet/sinker/converter_proto.go:24-61,
helpers.go:10-16). This container has no protobuf library, so this module
implements the public, stable protobuf wire format (varint / 64-bit / length-
delimited / 32-bit) and enough of descriptor.proto to parse a serialized
``FileDescriptorSet`` — which is itself a protobuf message, so this codec is
self-hosting: tests build descriptor sets with :func:`encode_message`.

Only the *driver* touches this for schema derivation; per-row decode work is
Arrow-batched inside executors (see decode.py).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

# -- wire types ------------------------------------------------------------

WT_VARINT = 0
WT_I64 = 1
WT_LEN = 2
WT_I32 = 5

# proto field kinds (subset of FieldDescriptorProto.Type numbers, public)
K_DOUBLE = 1
K_FLOAT = 2
K_INT64 = 3
K_UINT64 = 4
K_INT32 = 5
K_FIXED64 = 6
K_FIXED32 = 7
K_BOOL = 8
K_STRING = 9
K_MESSAGE = 11
K_BYTES = 12
K_UINT32 = 13
K_ENUM = 14
K_SFIXED32 = 15
K_SFIXED64 = 16
K_SINT32 = 17
K_SINT64 = 18

_VARINT_KINDS = {K_INT32, K_INT64, K_UINT32, K_UINT64, K_BOOL, K_ENUM, K_SINT32, K_SINT64}
_I64_KINDS = {K_FIXED64, K_SFIXED64, K_DOUBLE}
_I32_KINDS = {K_FIXED32, K_SFIXED32, K_FLOAT}
_LEN_KINDS = {K_STRING, K_BYTES, K_MESSAGE}

_PACKABLE = _VARINT_KINDS | _I64_KINDS | _I32_KINDS


# -- descriptor model ------------------------------------------------------


@dataclass(frozen=True)
class FieldSpec:
    name: str
    number: int
    kind: int
    repeated: bool = False
    message: "MessageSpec | None" = None  # for K_MESSAGE (incl. map entries)

    @property
    def is_map(self) -> bool:
        return self.kind == K_MESSAGE and self.message is not None and self.message.map_entry


@dataclass(frozen=True)
class MessageSpec:
    name: str
    fields: tuple[FieldSpec, ...]
    map_entry: bool = False

    def field_by_number(self) -> dict[int, FieldSpec]:
        return {f.number: f for f in self.fields}

    def field(self, name: str) -> FieldSpec:
        for f in self.fields:
            if f.name == name:
                return f
        raise KeyError(name)


# -- varint ------------------------------------------------------------------


def write_varint(out: bytearray, v: int) -> None:
    if v < 0:
        v &= (1 << 64) - 1  # two's complement, 10 bytes
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift >= 70:
            raise ValueError("varint too long")


def _zigzag_encode(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _zigzag_decode(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _to_signed32(v: int) -> int:
    v &= 0xFFFFFFFF
    return v - (1 << 32) if v >= (1 << 31) else v


def _to_signed64(v: int) -> int:
    v &= (1 << 64) - 1
    return v - (1 << 64) if v >= (1 << 63) else v


# -- scalar decode -----------------------------------------------------------


def _decode_scalar(kind: int, wire_val) -> object:
    if kind in (K_INT32, K_INT64):
        return _to_signed64(wire_val)
    if kind in (K_UINT32, K_UINT64, K_BOOL, K_ENUM):
        return bool(wire_val) if kind == K_BOOL else wire_val
    if kind in (K_SINT32, K_SINT64):
        return _zigzag_decode(wire_val)
    if kind == K_FIXED64:
        return wire_val  # unsigned
    if kind == K_SFIXED64:
        return _to_signed64(wire_val)
    if kind == K_DOUBLE:
        return struct.unpack("<d", struct.pack("<Q", wire_val))[0]
    if kind == K_FIXED32:
        return wire_val
    if kind == K_SFIXED32:
        return _to_signed32(wire_val)
    if kind == K_FLOAT:
        return struct.unpack("<f", struct.pack("<I", wire_val))[0]
    if kind == K_STRING:
        return wire_val.decode("utf-8")
    if kind == K_BYTES:
        return bytes(wire_val)
    raise ValueError(f"unsupported scalar kind {kind}")


def decode_message(buf: bytes, spec: MessageSpec) -> dict:
    """Decode wire bytes into {field_name: python value}.

    Unset fields are ABSENT from the dict (the caller appends nulls —
    mirrors the reference's null handling for unset fields,
    converter_proto.go:137-143). Unknown field numbers are skipped.
    """
    by_num = spec.field_by_number()
    out: dict[str, object] = {}
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = read_varint(buf, pos)
        fnum, wt = tag >> 3, tag & 7
        if wt == WT_VARINT:
            raw, pos = read_varint(buf, pos)
        elif wt == WT_I64:
            (raw,) = struct.unpack_from("<Q", buf, pos)
            pos += 8
        elif wt == WT_LEN:
            ln, pos = read_varint(buf, pos)
            raw = buf[pos : pos + ln]
            if len(raw) != ln:
                raise ValueError("truncated length-delimited field")
            pos += ln
        elif wt == WT_I32:
            (raw,) = struct.unpack_from("<I", buf, pos)
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")

        f = by_num.get(fnum)
        if f is None:
            continue

        if f.kind == K_MESSAGE:
            val = decode_message(raw, f.message)
            if f.is_map:
                out.setdefault(f.name, {})[val.get("key")] = val.get("value")
            elif f.repeated:
                out.setdefault(f.name, []).append(val)
            else:
                out[f.name] = val
        elif f.repeated:
            lst = out.setdefault(f.name, [])
            if wt == WT_LEN and f.kind in _PACKABLE:
                # packed repeated scalars
                p = 0
                while p < len(raw):
                    if f.kind in _VARINT_KINDS:
                        wv, p = read_varint(raw, p)
                    elif f.kind in _I64_KINDS:
                        (wv,) = struct.unpack_from("<Q", raw, p)
                        p += 8
                    else:
                        (wv,) = struct.unpack_from("<I", raw, p)
                        p += 4
                    lst.append(_decode_scalar(f.kind, wv))
            else:
                lst.append(_decode_scalar(f.kind, raw))
        else:
            out[f.name] = _decode_scalar(f.kind, raw)
    return out


# -- encode (test synthesis + self-hosted descriptor building) --------------


def _encode_scalar(kind: int, v) -> tuple[int, bytes]:
    out = bytearray()
    if kind in (K_INT32, K_INT64, K_UINT32, K_UINT64, K_ENUM):
        write_varint(out, int(v))
        return WT_VARINT, bytes(out)
    if kind == K_BOOL:
        write_varint(out, 1 if v else 0)
        return WT_VARINT, bytes(out)
    if kind in (K_SINT32, K_SINT64):
        write_varint(out, _zigzag_encode(int(v)))
        return WT_VARINT, bytes(out)
    if kind == K_FIXED64:
        return WT_I64, struct.pack("<Q", int(v) & ((1 << 64) - 1))
    if kind == K_SFIXED64:
        return WT_I64, struct.pack("<q", int(v))
    if kind == K_DOUBLE:
        return WT_I64, struct.pack("<d", float(v))
    if kind == K_FIXED32:
        return WT_I32, struct.pack("<I", int(v) & 0xFFFFFFFF)
    if kind == K_SFIXED32:
        return WT_I32, struct.pack("<i", int(v))
    if kind == K_FLOAT:
        return WT_I32, struct.pack("<f", float(v))
    if kind == K_STRING:
        return WT_LEN, str(v).encode("utf-8")
    if kind == K_BYTES:
        return WT_LEN, bytes(v)
    raise ValueError(f"unsupported scalar kind {kind}")


def encode_message(values: dict, spec: MessageSpec) -> bytes:
    """Encode {field_name: value} → wire bytes (absent/None fields skipped)."""
    out = bytearray()

    def emit(fnum: int, wt: int, payload: bytes) -> None:
        write_varint(out, (fnum << 3) | wt)
        if wt == WT_LEN:
            write_varint(out, len(payload))
        out.extend(payload)

    for f in spec.fields:
        if f.name not in values or values[f.name] is None:
            continue
        v = values[f.name]
        if f.is_map:
            for k, mv in v.items():
                entry = encode_message({"key": k, "value": mv}, f.message)
                emit(f.number, WT_LEN, entry)
        elif f.kind == K_MESSAGE:
            items = v if f.repeated else [v]
            for item in items:
                emit(f.number, WT_LEN, encode_message(item, f.message))
        elif f.repeated:
            for item in v:
                wt, payload = _encode_scalar(f.kind, item)
                emit(f.number, wt, payload)
        else:
            wt, payload = _encode_scalar(f.kind, v)
            emit(f.number, wt, payload)
    return bytes(out)


# -- FileDescriptorSet parsing (self-hosted) ---------------------------------
# Wire shapes from the public descriptor.proto:
#   FileDescriptorSet   { repeated FileDescriptorProto file = 1; }
#   FileDescriptorProto { name=1 string; package=2 string;
#                         message_type=4 repeated DescriptorProto; }
#   DescriptorProto     { name=1; field=2 repeated FieldDescriptorProto;
#                         nested_type=3 repeated DescriptorProto;
#                         options=7 MessageOptions; }
#   FieldDescriptorProto{ name=1; number=3; label=4; type=5; type_name=6; }
#   MessageOptions      { map_entry=7 bool; }

_FIELD_DESC = MessageSpec("FieldDescriptorProto", (
    FieldSpec("name", 1, K_STRING),
    FieldSpec("number", 3, K_INT32),
    FieldSpec("label", 4, K_ENUM),
    FieldSpec("type", 5, K_ENUM),
    FieldSpec("type_name", 6, K_STRING),
))
_MSG_OPTIONS = MessageSpec("MessageOptions", (
    FieldSpec("map_entry", 7, K_BOOL),
))
_LABEL_REPEATED = 3


def _parse_descriptor_proto(buf: bytes) -> dict:
    """DescriptorProto incl. recursive nested_type=3 and options=7."""
    pos = 0
    out: dict = {"name": None, "field": [], "nested_type": [], "map_entry": False}
    while pos < len(buf):
        tag, pos = read_varint(buf, pos)
        fnum, wt = tag >> 3, tag & 7
        if wt != WT_LEN:
            # skip non-length fields we don't model
            if wt == WT_VARINT:
                _, pos = read_varint(buf, pos)
            elif wt == WT_I64:
                pos += 8
            elif wt == WT_I32:
                pos += 4
            continue
        ln, pos = read_varint(buf, pos)
        raw = buf[pos : pos + ln]
        pos += ln
        if fnum == 1:
            out["name"] = raw.decode("utf-8")
        elif fnum == 2:
            out["field"].append(decode_message(raw, _FIELD_DESC))
        elif fnum == 3:
            out["nested_type"].append(_parse_descriptor_proto(raw))
        elif fnum == 7:
            out["map_entry"] = bool(decode_message(raw, _MSG_OPTIONS).get("map_entry", False))
    return out


def parse_file_descriptor_set(buf: bytes) -> dict[str, MessageSpec]:
    """Serialized FileDescriptorSet → {fully.qualified.Name: MessageSpec}.

    Mirrors the reference's one-time descriptor resolution
    (converter_proto.go:24-45) without a protobuf runtime.
    """
    raw_msgs: dict[str, dict] = {}

    pos = 0
    while pos < len(buf):
        tag, pos = read_varint(buf, pos)
        fnum, wt = tag >> 3, tag & 7
        if wt != WT_LEN:
            raise ValueError("malformed FileDescriptorSet")
        ln, pos = read_varint(buf, pos)
        file_raw = buf[pos : pos + ln]
        pos += ln
        if fnum != 1:
            continue
        # FileDescriptorProto: package=2, message_type=4
        fpos, package, msgs = 0, "", []
        while fpos < len(file_raw):
            ftag, fpos = read_varint(file_raw, fpos)
            ffnum, fwt = ftag >> 3, ftag & 7
            if fwt == WT_LEN:
                fln, fpos = read_varint(file_raw, fpos)
                fraw = file_raw[fpos : fpos + fln]
                fpos += fln
                if ffnum == 2:
                    package = fraw.decode("utf-8")
                elif ffnum == 4:
                    msgs.append(_parse_descriptor_proto(fraw))
            elif fwt == WT_VARINT:
                _, fpos = read_varint(file_raw, fpos)
            elif fwt == WT_I64:
                fpos += 8
            elif fwt == WT_I32:
                fpos += 4

        def collect(msg: dict, prefix: str) -> None:
            fq = f"{prefix}.{msg['name']}" if prefix else msg["name"]
            raw_msgs[fq] = msg
            for nested in msg["nested_type"]:
                collect(nested, fq)

        for msg in msgs:
            collect(msg, package)

    # second pass: materialize MessageSpecs with resolved message refs
    specs: dict[str, MessageSpec] = {}

    def build(fq: str, stack: tuple[str, ...] = ()) -> MessageSpec:
        if fq in specs:
            return specs[fq]
        if fq in stack:
            raise ValueError(f"recursive message type not supported: {fq}")
        msg = raw_msgs[fq]
        fields = []
        for f in msg["field"]:
            kind = f.get("type", 0)
            sub = None
            if kind in (K_MESSAGE, 10):  # 10 = legacy group, treat as message
                tn = f.get("type_name", "").lstrip(".")
                sub = build(tn, stack + (fq,))
            fields.append(
                FieldSpec(
                    name=f["name"],
                    number=f["number"],
                    kind=K_MESSAGE if kind == 10 else kind,
                    repeated=f.get("label") == _LABEL_REPEATED,
                    message=sub,
                )
            )
        spec = MessageSpec(fq, tuple(fields), map_entry=msg["map_entry"])
        specs[fq] = spec
        return spec

    for fq in list(raw_msgs):
        build(fq)
    return specs


# -- helpers to BUILD a FileDescriptorSet from MessageSpecs (tests) ----------


def build_file_descriptor_set(package: str, roots: list[MessageSpec]) -> bytes:
    """Encode MessageSpecs as a FileDescriptorSet (round-trip test support).

    Map-entry and nested message types are emitted as nested_type of their
    parent, named after the spec's last path segment."""

    def field_proto(f: FieldSpec, parent_fq: str) -> dict:
        d = {"name": f.name, "number": f.number,
             "label": _LABEL_REPEATED if (f.repeated or f.is_map) else 1,
             "type": f.kind}
        if f.kind == K_MESSAGE:
            d["type_name"] = "." + f.message.name
        return d

    def msg_proto(spec: MessageSpec) -> bytes:
        out = bytearray()

        def emit(fnum: int, payload: bytes) -> None:
            write_varint(out, (fnum << 3) | WT_LEN)
            write_varint(out, len(payload))
            out.extend(payload)

        emit(1, spec.name.rsplit(".", 1)[-1].encode())
        for f in spec.fields:
            emit(2, encode_message(field_proto(f, spec.name), _FIELD_DESC))
        seen = set()
        for f in spec.fields:
            if f.kind == K_MESSAGE and f.message.name not in seen:
                # nest message types whose fq name extends this spec's name
                if f.message.name.startswith(spec.name + "."):
                    seen.add(f.message.name)
                    emit(3, msg_proto(f.message))
        if spec.map_entry:
            emit(7, encode_message({"map_entry": True}, _MSG_OPTIONS))
        return bytes(out)

    file_out = bytearray()

    def emit_file_field(fnum: int, payload: bytes) -> None:
        write_varint(file_out, (fnum << 3) | WT_LEN)
        write_varint(file_out, len(payload))
        file_out.extend(payload)

    emit_file_field(1, b"test.proto")
    if package:
        emit_file_field(2, package.encode())
    for root in roots:
        emit_file_field(4, msg_proto(root))

    fds = bytearray()
    write_varint(fds, (1 << 3) | WT_LEN)
    write_varint(fds, len(file_out))
    fds.extend(file_out)
    return bytes(fds)
