"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": "...", "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (computes every output
column, no driver collection) after one untimed warm-up of the JVM/codegen.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: covers scan+agg, broadcast join, shuffle join, window frames,
# event-time windows, top-k, dedup (exact + MinHash-LSH), similarity top-k,
# text stats, JSON — the operators whose plans matter at 100 TB.
HEADLINE = [
    "q_agg_basic",
    "q_join_broadcast",
    "q_join_inner",
    "q_join_asof",
    "q_topk",
    "q_win_frame",
    "q_stream_window",
    "q_stream_session",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_sim_topk",
    "q_text_stats",
    "q_fn_json",
    "q_udtf",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from substreams_sink_parquet_spark.catalog import queries
    from substreams_sink_parquet_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()

    def run(name: str) -> None:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    run("q_agg_basic")  # JVM / codegen warm-up, untimed

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        run(name)
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
