"""Standalone runner for bench.bench_catchup_write: the isolated
write-stage A/B of WriterOptions.write_tasks on a write-dominated
catch-up batch (one shared implementation — the bench owns the synthetic
frame shape so probe and per-round numbers stay comparable).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from substreams_sink_parquet_spark.session import get_spark


def main() -> None:
    spark = get_spark("probe_write_tasks")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(bench.bench_catchup_write(spark)))


if __name__ == "__main__":
    main()
