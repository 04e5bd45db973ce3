"""Per-stage time attribution for catalog queries (optimization tooling).

Runs each named query once warm, then re-runs it timed with the Spark UI
enabled and dumps per-stage metrics from the local REST API — the guide
§1.1/§7.1 empirical loop, scripted (the sandbox has no browser). Output per
stage: wall duration, summed executor run time, input/shuffle bytes, task
count, and the first line of the stage's call site, so the expensive stage
maps back to an operator.

Usage: python tools/profile_query.py <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from substreams_sink_parquet_spark.catalog import queries
    from substreams_sink_parquet_spark.session import get_spark

    spark = get_spark("profile_query", extra_conf={
        "spark.ui.enabled": "true",
        "spark.ui.port": "4049",
    })
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    qs["q_agg_basic"](spark, sf_dir).write.format("noop").mode(
        "overwrite").save()
    spark.catalog.clearCache()

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4049/api/v1/applications/{app_id}"

    def stages() -> list:
        with urllib.request.urlopen(f"{base}/stages?status=complete") as r:
            return json.load(r)

    for name in names:
        # one warm pass (codegen/JIT), then the attributed pass
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        seen = {s["stageId"] for s in stages()}
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        spark.catalog.clearCache()
        rows = []
        for s in stages():
            if s["stageId"] in seen:
                continue
            dur = None
            if s.get("firstTaskLaunchedTime") and s.get("completionTime"):
                # ISO strings 'YYYY-MM-DDTHH:MM:SS.mmmGMT'
                from datetime import datetime

                def p(x):
                    return datetime.strptime(x, "%Y-%m-%dT%H:%M:%S.%f%Z")

                dur = (p(s["completionTime"]) - p(s["firstTaskLaunchedTime"])
                       ).total_seconds()
            rows.append({
                "stage": s["stageId"],
                "wall_sec": round(dur, 3) if dur is not None else None,
                "exec_run_sec": round(s.get("executorRunTime", 0) / 1000, 3),
                "cpu_sec": round(
                    s.get("executorCpuTime", 0) / 1e9, 3),
                "tasks": s.get("numCompleteTasks"),
                "input_mb": round(s.get("inputBytes", 0) / 1e6, 2),
                "sh_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 2),
                "sh_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 2),
                "site": (s.get("description") or s.get("name", ""))[:100],
            })
        rows.sort(key=lambda r: -(r["exec_run_sec"] or 0))
        print(f"\n=== {name}: wall {wall:.3f}s, "
              f"{len(rows)} stages ===", flush=True)
        for r in rows:
            print(f"  wall={r['wall_sec']} run={r['exec_run_sec']} "
                  f"cpu={r['cpu_sec']} tasks={r['tasks']} in={r['input_mb']}MB "
                  f"shR={r['sh_read_mb']} shW={r['sh_write_mb']} :: {r['site']}",
                  flush=True)


if __name__ == "__main__":
    main()
