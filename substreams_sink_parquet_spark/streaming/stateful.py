"""Stateful Structured Streaming operators (SURVEY.md §2B streaming rows).

The reference sink has no event-time or stateful processing at all — its only
"state" is the resume cursor (parquet/sinker/cursor.go:27-32). These are the
operators a Spark-native engine adds on top of the same staged-stream model
(sources/staging.py):

- ``watermarked_window_counts``: tumbling event-time window aggregation with a
  watermark bounding state; late rows beyond the delay are dropped, which is
  what bounds state size on an unbounded 100 TB/day stream.
- ``dedup_within_watermark``: streaming exact dedup whose key-state is evicted
  once the watermark passes (``dropDuplicatesWithinWatermark``) — the
  streaming counterpart of llm/dedup.dedup_exact.
- ``running_counts_stateful``: custom per-key running state via
  ``applyInPandasWithState`` (GroupState): arbitrary Python state machines,
  Arrow-batched per group, state persisted in the checkpoint. This is the
  escape hatch for operators neither SQL aggregation nor window functions can
  express (e.g. per-address balance tracking over the exploded transfer
  stream).

State scaling notes: all three shuffle by their key (window start / dedup key
/ group key) into ``spark.sql.shuffle.partitions`` state stores; watermarks
are what allow eviction. RocksDB state store
(``spark.sql.streaming.stateStore.providerClass``) is the 100 TB setting —
the default in-memory HDFS-backed store is fine at test scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


def watermarked_window_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "kind",
    window: str = "10 seconds",
    delay: str = "10 seconds",
) -> DataFrame:
    """Tumbling-window count per key with bounded state.

    Watermark = max(event time) - delay; windows older than the watermark are
    finalized and their state evicted. Rows later than that are dropped —
    the documented, deterministic-late-data contract the reference lacks.
    """
    return (
        stream.withWatermark(ts_col, delay)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_timestamp("win.start").alias("win_start"),
            F.col(key_col),
            "n",
        )
    )


def dedup_within_watermark(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    delay: str = "10 seconds",
) -> DataFrame:
    """Streaming exact dedup with watermark-bounded key state.

    ``dropDuplicatesWithinWatermark`` keeps a key's state only until the
    watermark passes its event time + delay, so state is O(keys per delay
    window), not O(all keys ever) — the property that makes streaming dedup
    viable on an unbounded stream.
    """
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)


# -- custom stateful operator ----------------------------------------------

_RUNNING_OUT = StructType(
    [
        StructField("key", StringType()),
        StructField("events_total", LongType()),
        StructField("value_total", LongType()),
    ]
)
_RUNNING_STATE = StructType(
    [
        StructField("events_total", LongType()),
        StructField("value_total", LongType()),
    ]
)


def _running_counts_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-key accumulator: total event count and value sum across batches."""
    events, total = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        events += len(pdf)
        total += int(pdf["value"].sum())
    state.update((events, total))
    yield pd.DataFrame(
        {"key": [key[0]], "events_total": [events], "value_total": [total]}
    )


def running_counts_stateful(stream: DataFrame, key_col: str = "kind") -> DataFrame:
    """Running per-key totals via applyInPandasWithState.

    Demonstrates the custom-stateful-operator path: state is a typed tuple in
    the checkpointed state store, groups arrive as Arrow batches, output mode
    "update" emits the new running totals each micro-batch. NoTimeout keeps
    state forever (a real deployment would use EventTimeTimeout + watermark
    to evict idle keys).
    """
    return (
        stream.select(F.col(key_col).alias("key"), F.col("value"))
        .groupBy("key")
        .applyInPandasWithState(
            _running_counts_fn,
            outputStructType=_RUNNING_OUT,
            stateStructType=_RUNNING_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# -- transformWithState (Spark 4 stateful-processor API) -------------------


class RunningTotalsProcessor:
    """Per-key running totals as a Spark 4 ``StatefulProcessor``.

    The modern replacement for ``applyInPandasWithState``: typed state
    variables (ValueState/ListState/MapState) with per-variable TTL, timers,
    and schema evolution, all backed by the RocksDB state store (required by
    the API — which is also the right store at 100 TB). Declared lazily so
    importing this module works even if a future image drops the API.
    """

    def init(self, handle) -> None:
        self._totals = handle.getValueState("totals", _RUNNING_STATE)

    def handleInputRows(self, key, rows, timerValues):
        events, total = (
            self._totals.get() if self._totals.exists() else (0, 0)
        )
        for pdf in rows:
            events += len(pdf)
            total += int(pdf["value"].sum())
        self._totals.update((events, total))
        yield pd.DataFrame(
            {"key": [key[0]], "events_total": [events], "value_total": [total]}
        )

    def close(self) -> None:
        pass


def running_counts_tws(stream: DataFrame, key_col: str = "kind") -> DataFrame:
    """Running per-key totals via ``transformWithStateInPandas`` (Spark 4).

    Same semantics as ``running_counts_stateful`` but on the stateful-v2
    engine: state lives in named, typed state variables inside RocksDB, and
    the processor object can register timers / TTL per variable. The caller
    must run with the RocksDB state-store provider. NOTE: the API's Python
    driver worker imports ``google.protobuf`` at runtime; in images without
    the protobuf package (like this one) the query fails at start, so the
    restart test skips itself and ``running_counts_stateful`` remains the
    supported stateful path here.
    """
    from pyspark.sql.streaming import StatefulProcessor  # noqa: F401 (API gate)

    proc = RunningTotalsProcessor()
    return (
        stream.select(F.col(key_col).alias("key"), F.col("value"))
        .groupBy("key")
        .transformWithStateInPandas(
            statefulProcessor=proc,
            outputStructType=_RUNNING_OUT,
            outputMode="Update",
            timeMode="None",
        )
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "kind",
    left_ts: str = "ts",
    right_ts: str = "ts",
    upper: str = "10 seconds",
    delay: str = "10 seconds",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi-join with an event-time interval condition.

    The reference joins nothing (its sink is a single decoded stream); this
    is the Spark-native correlation primitive for two live streams — e.g.
    matching an order stream against its fill stream, or a block-header
    stream against the exploded transfer stream derived from it.

    Semantics: rows match when keys are equal AND
    ``left_ts <= right_ts <= left_ts + upper``. Both sides carry a
    watermark of ``delay``; together with the interval bound Spark can
    compute exactly how long each side's state must be retained
    (left rows expire once the watermark passes ``left_ts + upper``,
    right rows once it passes ``right_ts``) — without the time bound the
    join state would grow forever on an unbounded stream, so this operator
    REQUIRES the interval. ``how`` may be ``inner`` or ``leftOuter``
    (outer rows emit with nulls only after the watermark proves no match
    can still arrive — so outer results trail the watermark by design).

    100 TB note: state is shuffled by the join key into
    ``spark.sql.shuffle.partitions`` RocksDB stores; retention is
    ``delay + upper`` of per-key traffic, independent of total stream
    length. Skewed keys skew state stores — salt the key upstream if one
    key dominates (operators/skew.py shows the pattern).
    """
    lw = left.withWatermark(left_ts, delay).alias("l")
    rw = right.withWatermark(right_ts, delay).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper}"))
    )
    # generic projection: key once, each side's event time as left_ts /
    # right_ts, every other payload column prefixed with its side
    proj = [
        F.col(f"l.{key}").alias(key),
        F.col(f"l.{left_ts}").alias("left_ts"),
        F.col(f"r.{right_ts}").alias("right_ts"),
    ]
    proj += [F.col(f"l.{c}").alias(f"l_{c}") for c in left.columns if c not in (key, left_ts)]
    proj += [F.col(f"r.{c}").alias(f"r_{c}") for c in right.columns if c not in (key, right_ts)]
    return lw.join(rw, cond, how).select(*proj)


def enrich_stream_static(
    stream: DataFrame,
    dim: DataFrame,
    key: str = "kind",
    how: str = "left",
) -> DataFrame:
    """Stream-static dimension enrichment (broadcast, stateless).

    The static side is re-read per micro-batch (so a dimension table
    updated in place is picked up on the next trigger) and broadcast to
    the stream side — no shuffle of the stream, no state store at all.
    This is the right shape for decorating a 100 TB/day event stream with
    a million-row dimension; only if the dimension itself outgrows
    broadcast range does this become a stateful stream-stream problem.
    """
    return stream.join(F.broadcast(dim), on=key, how=how)
