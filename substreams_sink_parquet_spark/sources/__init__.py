"""Sources: staging-directory feeder for the streaming file source, and a
deterministic synthetic block generator for tests/demos. The reference's
gRPC endpoint becomes 'anything that appends raw block parquet to a staging
dir' — Kafka connect, a gRPC bridge process, or these helpers."""

from .staging import stage_raw_blocks, synth_blocks  # noqa: F401
