"""Protobuf descriptor → Spark StructType (SURVEY.md §1.4 mapping).

Mirrors the reference's one-time schema derivation
(buildArrowSchemaFromMessage, converter_proto.go:69-128) with Spark types:

| proto kind              | Spark type (this engine)                      |
|-------------------------|-----------------------------------------------|
| bool                    | BooleanType                                   |
| int32/sint32/sfixed32   | IntegerType                                   |
| int64/sint64/sfixed64   | LongType                                      |
| uint32/fixed32          | LongType (widened — Spark has no unsigned)    |
| uint64/fixed64          | DecimalType(20,0) default, LongType compat    |
| float / double          | FloatType / DoubleType                        |
| string / bytes          | StringType / BinaryType                       |
| enum                    | IntegerType (the number, converter_proto.go:109) |
| message                 | StructType (recursive)                        |
| repeated T              | ArrayType(T)                                  |
| map<K,V>                | MapType natively; ArrayType(Struct<key,value>)|
|                         | in entries-compat mode (converter_proto.go:82-87) |

Every field nullable (converter_proto.go:80). No timestamp/decimal/interval
kinds exist in the reference's model; ``rewrite_well_known=True`` optionally
maps google.protobuf.Timestamp structs to TimestampType as an extension.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from . import protowire as pw


@dataclass(frozen=True)
class SchemaOptions:
    uint64_as: str = "decimal"      # "decimal" (lossless) | "long" (compat, may overflow)
    map_as: str = "map"             # "map" (native) | "entries" (reference byte-compat)
    rewrite_well_known: bool = False  # google.protobuf.Timestamp → TimestampType


_SCALAR_TYPES: dict[int, DataType] = {
    pw.K_BOOL: BooleanType(),
    pw.K_INT32: IntegerType(),
    pw.K_SINT32: IntegerType(),
    pw.K_SFIXED32: IntegerType(),
    pw.K_INT64: LongType(),
    pw.K_SINT64: LongType(),
    pw.K_SFIXED64: LongType(),
    pw.K_UINT32: LongType(),
    pw.K_FIXED32: LongType(),
    pw.K_FLOAT: FloatType(),
    pw.K_DOUBLE: DoubleType(),
    pw.K_STRING: StringType(),
    pw.K_BYTES: BinaryType(),
    pw.K_ENUM: IntegerType(),
}


def scalar_type(kind: int, opts: SchemaOptions) -> DataType:
    if kind in (pw.K_UINT64, pw.K_FIXED64):
        return DecimalType(20, 0) if opts.uint64_as == "decimal" else LongType()
    t = _SCALAR_TYPES.get(kind)
    if t is None:
        return BinaryType()  # converter_proto.go:119-120 fallback
    return t


def field_type(f: pw.FieldSpec, opts: SchemaOptions) -> DataType:
    if f.is_map:
        entry = f.message
        key_t = scalar_type(entry.field("key").kind, opts)
        val_f = entry.field("value")
        val_t = (
            message_type(val_f.message, opts)
            if val_f.kind == pw.K_MESSAGE
            else scalar_type(val_f.kind, opts)
        )
        if opts.map_as == "entries":
            return ArrayType(
                StructType([StructField("key", key_t), StructField("value", val_t)])
            )
        return MapType(key_t, val_t)
    if f.kind == pw.K_MESSAGE:
        if (
            opts.rewrite_well_known
            and f.message.name == "google.protobuf.Timestamp"
        ):
            base: DataType = TimestampType()
        else:
            base = message_type(f.message, opts)
    else:
        base = scalar_type(f.kind, opts)
    return ArrayType(base) if f.repeated else base


def message_type(spec: pw.MessageSpec, opts: SchemaOptions | None = None) -> StructType:
    opts = opts or SchemaOptions()
    return StructType(
        [StructField(f.name, field_type(f, opts), nullable=True) for f in spec.fields]
    )


def block_schema(spec: pw.MessageSpec, opts: SchemaOptions | None = None,
                 include_block_meta: bool = True) -> StructType:
    """Full row schema for the main (non-exploded) table.

    The reference DROPS block_number/block_id from decoded tables
    (converter_proto.go:53 discards them); we fix that asymmetry by default
    and keep ``include_block_meta=False`` as the byte-compat mode."""
    fields = []
    if include_block_meta:
        fields += [
            StructField("block_number", LongType(), nullable=False),
            StructField("block_id", StringType(), nullable=True),
        ]
    fields += list(message_type(spec, opts).fields)
    return StructType(fields)


def schema_drift(old: StructType, new: StructType) -> tuple[list[str], list[str]]:
    """Classify the changes a new run's schema makes against a lake's
    existing schema: ``(additive, breaking)`` human-readable descriptions.

    The reference fixes the schema for the life of a run and has no story
    for a lake written across .spkg upgrades; this engine defines one:

    - **additive** — a nullable field appears in ``new`` only (a proto
      module added a field). Old files read as null for it; Parquet's
      ``mergeSchema`` unifies the lake, so additive drift is safe to write.
    - **breaking** — a field disappeared or changed type (proto field
      renumbered/retyped, or a SchemaOptions flip like uint64 decimal→long).
      One lake directory would hold irreconcilable footers; the sink must
      refuse before the first mixed file lands.

    Struct fields recurse with dotted paths; array elements as ``[]``, map
    keys/values as ``<key>``/``<value>``. Field order is ignored —
    name-based resolution is how both Parquet and proto identify fields.
    """
    additive: list[str] = []
    breaking: list[str] = []

    def walk(o: DataType, n: DataType, path: str) -> None:
        if isinstance(o, StructType) and isinstance(n, StructType):
            old_f = {f.name: f for f in o.fields}
            new_f = {f.name: f for f in n.fields}
            for name in old_f:
                if name not in new_f:
                    breaking.append(f"{path}{name}: removed ({old_f[name].dataType.simpleString()})")
            for name, f in new_f.items():
                if name not in old_f:
                    additive.append(f"{path}{name}: added ({f.dataType.simpleString()})")
                else:
                    walk(old_f[name].dataType, f.dataType, f"{path}{name}.")
            return
        if isinstance(o, ArrayType) and isinstance(n, ArrayType):
            walk(o.elementType, n.elementType, f"{path}[].")
            return
        if isinstance(o, MapType) and isinstance(n, MapType):
            walk(o.keyType, n.keyType, f"{path}<key>.")
            walk(o.valueType, n.valueType, f"{path}<value>.")
            return
        if o != n:
            breaking.append(
                f"{path[:-1] or '<root>'}: type changed "
                f"{o.simpleString()} -> {n.simpleString()}"
            )

    walk(old, new, "")
    return additive, breaking
