"""Isolated write-stage probe for WriterOptions.write_tasks: pre-decoded
(persisted) frame of N blocks in 4 large ranges, timing write_ranges alone
with write_tasks off/16/32. This is the shape the knob targets — a catch-up
batch where rows-per-range is large and parquet ENCODE dominates — as
opposed to bench_sink's decode-dominated 20k-block micro-batch.
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from substreams_sink_parquet_spark.session import get_spark
from substreams_sink_parquet_spark.sink.writer import WriterOptions, write_ranges

N = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
PS = N // 4


def main() -> None:
    spark = get_spark("probe_write_tasks")
    spark.sparkContext.setLogLevel("ERROR")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    df = (
        spark.range(N).withColumnRenamed("id", "block_number")
        .withColumn("block_id", F.concat(F.lit("0x"), F.hex("block_number")))
        .withColumn("body", F.repeat(F.sha2(F.col("block_id"), 256), 8))
        .repartition(cpus)
        .persist()
    )
    df.count()
    ranges = list(range(0, N, PS))
    work = tempfile.mkdtemp(prefix="probe_wt_")
    try:
        for wt in (None, 16, 32, None, 16, 32):
            out = tempfile.mkdtemp(dir=work)
            t0 = time.time()
            write_ranges(df, out, WriterOptions(partition_size=PS, write_tasks=wt),
                         ranges=ranges)
            print(f"write_tasks={wt}: {time.time() - t0:.2f}s "
                  f"({N / (time.time() - t0):,.0f} rows/s)")
    finally:
        shutil.rmtree(work, ignore_errors=True)
        df.unpersist()


if __name__ == "__main__":
    main()
