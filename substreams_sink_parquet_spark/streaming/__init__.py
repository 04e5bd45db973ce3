"""Structured Streaming ingestion: the reference's gRPC sinker loop
re-expressed as readStream → foreachBatch → range-partitioned Parquet,
with checkpointed exactly-once resume replacing the cursor file."""
