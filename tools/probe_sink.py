"""One-off probe: run bench_sink in a FRESH session (no query sweep first)
to adjudicate BENCH_r04's collapse (plain 5,830 vs r3's 23,431 blocks/s).
Prints per-mode samples. Usage: python tools/probe_sink.py [--after-sweep]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from substreams_sink_parquet_spark.session import get_spark


def main() -> None:
    spark = get_spark("probe_sink")
    spark.sparkContext.setLogLevel("ERROR")
    if "--after-sweep" in sys.argv:
        # reproduce the r4 ordering: full 3-pass query sweep first
        from substreams_sink_parquet_spark.catalog import queries
        qs = queries()
        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        for group in (bench.HEADLINE, bench.EXTENDED):
            for _ in range(3):
                for name in group:
                    # bench-local names (serve-only overrides, the approx
                    # profile row) live only in bench.main()'s qs merge;
                    # the probe's purpose is JVM-state reproduction, so
                    # skipping them keeps the sweep representative
                    if name not in qs:
                        continue
                    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                    spark.catalog.clearCache()
    out = bench.bench_sink(spark)
    out["after_sweep"] = "--after-sweep" in sys.argv
    print(json.dumps(out))


if __name__ == "__main__":
    main()
