"""Solo per-query timing probe: N noop-sink passes of the named catalog
queries in one session (bench.py methodology: build + noop write timed,
clearCache between passes), reporting per-pass times and the min.

Usage: python tools/probe_query.py <passes> <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.

For optimization A/B probes on a noisy box: min-of-N of a single query,
measured solo, is far more stable than a full bench sweep.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    passes = int(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from substreams_sink_parquet_spark.catalog import queries
    from substreams_sink_parquet_spark.session import get_spark

    spark = get_spark("probe_query")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()

    # same warm-up the bench uses
    qs["q_agg_basic"](spark, sf_dir).write.format("noop").mode(
        "overwrite").save()
    spark.catalog.clearCache()

    out = {}
    for name in names:
        times = []
        for _ in range(passes):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            times.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        out[name] = {"min": min(times), "passes": times}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"summary": {n: v["min"] for n, v in out.items()}}))


if __name__ == "__main__":
    main()
