"""Deterministic sampling / splitting / packing invariants (llm.sampling).

The driver hash-gates these against DuckDB; here we pin the semantic
properties the hash can't express: reproducibility, partition-independence,
split proportions, and packing bounds.
"""

from pyspark.sql import functions as F

from substreams_sink_parquet_spark.catalog import queries
from substreams_sink_parquet_spark.llm.sampling import split_col
from substreams_sink_parquet_spark.tables import load

SF = "/root/testdata/sf0.001"


def test_split_deterministic_and_partition_independent(spark):
    docs = load(spark, SF, "documents")
    a = docs.select("doc_id", split_col(F.col("doc_id")).alias("s")).collect()
    b = (
        docs.repartition(7, "lang")  # different layout, same assignment
        .select("doc_id", split_col(F.col("doc_id")).alias("s"))
        .collect()
    )
    assert {(r["doc_id"], r["s"]) for r in a} == {(r["doc_id"], r["s"]) for r in b}


def test_split_proportions_roughly_80_10_10(spark):
    rows = queries()["q_sample_split"](spark, SF).collect()
    by = {r["split"]: r["n_docs"] for r in rows}
    total = sum(by.values())
    assert total == load(spark, SF, "documents").count()
    assert 0.7 <= by["train"] / total <= 0.9
    assert by["val"] / total <= 0.2 and by["test"] / total <= 0.2


def test_stratified_rates_respected(spark):
    rows = queries()["q_sample_stratified"](spark, SF).collect()
    for r in rows:
        assert 0 <= r["n_sampled"] <= r["n_total"]
        frac = r["n_sampled"] / r["n_total"]
        # en downsampled to ~25%, tail kept at ~90% (wide tolerance: small SF)
        if r["lang"] == "en":
            assert frac < 0.5
        else:
            assert frac > 0.6


def test_pack_sequences_bounds(spark):
    rows = queries()["q_pack_sequences"](spark, SF).collect()
    docs_total = load(spark, SF, "documents").count()
    assert sum(r["n_docs"] for r in rows) == docs_total  # every doc packed once
    for r in rows:
        # a sequence exceeds the 4096 budget by at most one document's tokens
        # (greedy chunking property); seq ids are dense non-negative
        assert r["seq_id"] >= 0
        assert r["n_docs"] >= 1
