"""Lexical-index build + serve probe (optimization r14).

Times write_lexical_index end-to-end (min of N), then serves the bench's
6-query BM25 fixture from the built index and dumps the serve plan
(.explain formatted) plus the per-serve Spark job count — the evidence
files for the build/serve optimization claims.

Usage: python tools/probe_lex_index.py <passes> [plan_out.txt]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    plan_out = sys.argv[2] if len(sys.argv) > 2 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from substreams_sink_parquet_spark.llm.lexical_index import (
        bm25_scores_indexed,
        write_lexical_index,
    )
    from substreams_sink_parquet_spark.llm.text import _BM25_BATCH_QUERIES
    from substreams_sink_parquet_spark.operators._helpers import tiny_df
    from substreams_sink_parquet_spark.session import get_spark
    from substreams_sink_parquet_spark.tables import load

    spark = get_spark("probe_lex_index")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    docs.write.format("noop").mode("overwrite").save()  # warm-up

    build_times = []
    keep_dir = None
    for i in range(passes):
        d = tempfile.mkdtemp(prefix="probe_lexidx_")
        t0 = time.time()
        meta = write_lexical_index(docs, d, n_buckets=64)
        build_times.append(round(time.time() - t0, 3))
        if i == passes - 1:
            keep_dir = d
        else:
            shutil.rmtree(d, ignore_errors=True)
    print(json.dumps({"build_sec": build_times, "min": min(build_times),
                      "meta": meta}), flush=True)

    queries = tiny_df(
        spark, list(_BM25_BATCH_QUERIES), "query_id int, query string"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("bm25").desc(), "doc_id")

    def serve():
        return (
            bm25_scores_indexed(spark, keep_dir, queries)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 10)
        )

    serve().write.format("noop").mode("overwrite").save()  # warm-up
    tracker = spark.sparkContext.statusTracker()
    serve_times = []
    for i in range(passes):
        tag = f"probe_serve_{i}"
        spark.sparkContext.setJobGroup(tag, "serve")
        t0 = time.time()
        serve().write.format("noop").mode("overwrite").save()
        serve_times.append(round(time.time() - t0, 3))
        jobs = len(tracker.getJobIdsForGroup(tag))
        spark.sparkContext.setJobGroup("", "")
    print(json.dumps({"serve_sec": serve_times, "min": min(serve_times),
                      "serve_jobs": jobs}), flush=True)

    if plan_out:
        plan = serve()._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted")
        )
        with open(plan_out, "w") as f:
            f.write(plan)
        print(f"wrote {plan_out}")
    shutil.rmtree(keep_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
