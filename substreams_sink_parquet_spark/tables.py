"""Fixture-table loading helpers.

The driver generates the TPC-H-ish star schema + events/documents/embeddings
tables as one parquet file per table under /root/testdata/sf*/ (TESTDATA.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown fixture table {name!r}")
    if name == "events":
        # events.ts is TIMESTAMP(NANOS) parquet, which the vectorized reader
        # rejects; read nanos as long and truncate to the microsecond domain.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}
