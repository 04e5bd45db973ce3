"""Parquet sink: block-range-partitioned, zero-pad-named files with rotation
semantics, empty-range backfill, and exploded child tables."""
