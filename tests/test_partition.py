"""Range partitioner invariants (reference partitioner.go:20-36 semantics)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from substreams_sink_parquet_spark.partition import all_ranges, file_name, range_for


def test_range_for_basics():
    assert range_for(0, 0, 5000) == (0, 5000)
    assert range_for(4999, 0, 5000) == (0, 5000)
    assert range_for(5000, 0, 5000) == (5000, 10000)
    # anchored at a non-zero start
    assert range_for(19_000_123, 19_000_000, 5000) == (19_000_000, 19_005_000)
    # end clamp
    assert range_for(14_500, 0, 5000, end=15_000) == (10_000, 15_000)
    assert range_for(14_999, 0, 5000, end=14_000) == (10_000, 14_000)


def test_below_anchor_rejected():
    with pytest.raises(ValueError):
        range_for(99, 100, 10)


def test_file_name_padding():
    assert file_name(0, 5000) == "0000000000-0000005000.parquet"
    assert file_name(19_000_000, 19_005_000) == "0019000000-0019005000.parquet"
    assert file_name(1, 2, pad=4) == "0001-0002.parquet"


def test_all_ranges_contiguous():
    rngs = all_ranges(0, 12_000, 5000)
    assert rngs == [(0, 5000), (5000, 10000), (10000, 15000)]


@given(
    start=st.integers(0, 10**9),
    size=st.integers(1, 10**6),
    offset=st.integers(0, 10**9),
)
@settings(max_examples=300, deadline=None)
def test_range_for_properties(start, size, offset):
    block = start + offset
    rs, re = range_for(block, start, size)
    assert rs <= block < re
    assert (rs - start) % size == 0
    assert re - rs == size
