""".spkg manifest unwrapper — pure wire-format parsing, no protobuf runtime.

The reference reads the substreams package manifest to get the proto
descriptors and the module output type (run.go:73-92 resolves network/
endpoint from the manifest; factory.go:183-186 feeds
``base.Package().ProtoFiles`` into the converter). An .spkg file is a
serialized ``sf.substreams.v1.Package`` (public substreams proto):

    message Package {
      repeated google.protobuf.FileDescriptorProto proto_files = 1;
      uint64 version = 5;
      Modules modules = 6;       // Module{name=1, output=7{type=1}}
      ...
      string network = 9;
    }

``proto_files`` deliberately uses field number 1 — the same number
``FileDescriptorSet.file`` uses — so re-emitting the raw field-1 payloads
under tag 1 IS a valid FileDescriptorSet, byte for byte. That means the
unwrapper needs no descriptor re-encoding at all: slice, retag, done.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .protowire import WT_I32, WT_I64, WT_LEN, WT_VARINT, read_varint, write_varint


def _iter_fields(buf: bytes):
    """Yield (field_number, wire_type, value) over one message's wire bytes.
    LEN fields yield their raw payload; varints their int; fixed their raw."""
    pos = 0
    while pos < len(buf):
        tag, pos = read_varint(buf, pos)
        fnum, wt = tag >> 3, tag & 7
        if wt == WT_LEN:
            ln, pos = read_varint(buf, pos)
            payload = buf[pos : pos + ln]
            if len(payload) != ln:
                # a truncated .spkg (partial download) otherwise yields a
                # silently-short payload whose downstream parse fails with
                # an unrelated error instead of naming the real problem
                # (code review r12)
                raise ValueError(
                    f"truncated length-delimited field {fnum}: declared "
                    f"{ln} bytes, {len(payload)} remain — incomplete or "
                    "corrupt package file"
                )
            yield fnum, wt, payload
            pos += ln
        elif wt == WT_VARINT:
            v, pos = read_varint(buf, pos)
            yield fnum, wt, v
        elif wt == WT_I64:
            yield fnum, wt, buf[pos : pos + 8]
            pos += 8
        elif wt == WT_I32:
            yield fnum, wt, buf[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt} (field {fnum})")


@dataclass(frozen=True)
class SpkgManifest:
    """What the sink needs from a package manifest."""

    file_descriptor_set: bytes                  # ready for parse_file_descriptor_set
    network: str | None = None
    module_output_types: dict[str, str] = field(default_factory=dict)

    def output_type_of(self, module_name: str) -> str:
        """Module name → bare message type ('proto:' prefix stripped —
        OutputModuleTypeUnprefixed parity, factory.go:183-186)."""
        try:
            t = self.module_output_types[module_name]
        except KeyError:
            raise KeyError(
                f"module {module_name!r} not in manifest; modules: "
                + (", ".join(sorted(self.module_output_types)) or "(none)")
            ) from None
        return t.removeprefix("proto:")


def parse_spkg(buf: bytes) -> SpkgManifest:
    """Unwrap a serialized sf.substreams.v1.Package."""
    fds = bytearray()
    network = None
    modules: dict[str, str] = {}
    for fnum, wt, val in _iter_fields(buf):
        if fnum == 1 and wt == WT_LEN:  # proto_files: retag into a FDS
            write_varint(fds, (1 << 3) | WT_LEN)
            write_varint(fds, len(val))
            fds.extend(val)
        elif fnum == 9 and wt == WT_LEN:  # network
            network = val.decode("utf-8")
        elif fnum == 6 and wt == WT_LEN:  # Modules
            for mnum, mwt, mval in _iter_fields(val):
                if mnum == 1 and mwt == WT_LEN:  # Module
                    name, out_type = None, None
                    for fn, fw, fv in _iter_fields(mval):
                        if fn == 1 and fw == WT_LEN:
                            name = fv.decode("utf-8")
                        elif fn == 7 and fw == WT_LEN:  # Module.Output
                            for on, ow, ov in _iter_fields(fv):
                                if on == 1 and ow == WT_LEN:
                                    out_type = ov.decode("utf-8")
                    if name is not None and out_type is not None:
                        modules[name] = out_type
    if not fds:
        raise ValueError("no proto_files found — not a substreams package?")
    return SpkgManifest(bytes(fds), network, modules)


def build_spkg(file_descriptor_set: bytes, network: str | None = None,
               modules: dict[str, str] | None = None) -> bytes:
    """Encode a minimal Package (test support, mirroring
    build_file_descriptor_set). ``modules`` maps name → output type string
    (caller includes the 'proto:' prefix if desired)."""
    out = bytearray()

    def emit(fnum: int, payload: bytes) -> None:
        write_varint(out, (fnum << 3) | WT_LEN)
        write_varint(out, len(payload))
        out.extend(payload)

    # FileDescriptorSet bytes are already (tag 1, len, FileDescriptorProto)*
    # which is exactly Package.proto_files — pass through unchanged.
    out.extend(file_descriptor_set)
    if modules:
        mods = bytearray()
        for name, out_type in modules.items():
            m = bytearray()
            write_varint(m, (1 << 3) | WT_LEN)
            write_varint(m, len(name.encode()))
            m.extend(name.encode())
            o = bytearray()
            write_varint(o, (1 << 3) | WT_LEN)
            write_varint(o, len(out_type.encode()))
            o.extend(out_type.encode())
            write_varint(m, (7 << 3) | WT_LEN)
            write_varint(m, len(o))
            m.extend(o)
            write_varint(mods, (1 << 3) | WT_LEN)
            write_varint(mods, len(m))
            mods.extend(m)
        emit(6, bytes(mods))
    if network is not None:
        emit(9, network.encode())
    return bytes(out)
