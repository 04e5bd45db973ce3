"""Explode mode: root-level repeated fields → per-field child tables.

Spark translation of the reference's explode path (sinker.go:193-224,
converter_field.go:20-64): for each root repeated field (maps excluded, one
level only — run.go:56, README.md:69),

- message elements are FLATTENED: nested fields become top-level columns
  with no wrapper struct (``select("e.*")``);
- scalar-list elements become a single column named after the field;
- each child table keeps block provenance (block_number/block_id) and is
  written to its own subdirectory named after the field (writer.go:74-79).

Ordering-by-block inside each range file is guaranteed by the writer's
``sortWithinPartitions`` — the plan-level replacement for the reference's
per-table block-order min-heap (factory.go:118-131).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import protowire as pw


def explode_targets(spec: pw.MessageSpec) -> list[pw.FieldSpec]:
    """Root repeated non-map fields — the sink's child tables
    (factory.go:207-220: fd.IsList() && !fd.IsMap())."""
    return [f for f in spec.fields if f.repeated and not f.is_map]


def explode_field(decoded: DataFrame, f: pw.FieldSpec) -> DataFrame:
    """One row per list element, flattened per the reference's layout."""
    base = decoded.select(
        "block_number", "block_id", F.explode(F.col(f.name)).alias("__e")
    )
    if f.kind == pw.K_MESSAGE:
        # message elements: fields become top-level columns, no struct wrapper
        return base.select("block_number", "block_id", "__e.*")
    # scalar lists: single value column named after the field
    return base.select("block_number", "block_id", F.col("__e").alias(f.name))


def explode_all(decoded: DataFrame, spec: pw.MessageSpec) -> dict[str, DataFrame]:
    return {f.name: explode_field(decoded, f) for f in explode_targets(spec)}
