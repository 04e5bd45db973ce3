"""Block-range partitioning — pure functions mirroring the reference's
partitioner semantics (partitioner.go:20-36): fixed-size ranges anchored at
``start``, clamped to ``end``, zero-padded ``%010d-%010d.parquet`` names.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PAD = 10


def range_for(block: int, start: int, size: int, end: int | None = None) -> tuple[int, int]:
    """[range_start, range_end) containing ``block``; end-clamped."""
    if block < start:
        raise ValueError(f"block {block} below partition anchor {start}")
    k = (block - start) // size
    rs = start + k * size
    re = rs + size
    if end is not None:
        re = min(re, end)
    return rs, re


def file_name(range_start: int, range_end: int, pad: int = PAD) -> str:
    return f"{range_start:0{pad}d}-{range_end:0{pad}d}.parquet"


def all_ranges(start: int, upto: int, size: int, end: int | None = None) -> list[tuple[int, int]]:
    """Every range from the anchor up to (and including) the one holding ``upto``."""
    out = []
    rs = start
    while rs <= upto:
        re = rs + size
        if end is not None:
            re = min(re, end)
        out.append((rs, re))
        rs += size
    return out


def range_start_col(block: Column | str, start: int, size: int) -> Column:
    """Column expression assigning each row its range start (plan-level,
    no Python) — the distributed equivalent of RangeFor."""
    b = F.col(block) if isinstance(block, str) else block
    return (F.lit(start) + F.floor((b - start) / size) * size).cast("long")
