"""Persisted IVF-PQ index: build -> query parity with the in-memory
composition, physical partition pruning, and frozen-codebook appends."""

import math

from pyspark.sql import functions as F

from substreams_sink_parquet_spark.llm import ann_index as A
from substreams_sink_parquet_spark.llm import similarity as S
from substreams_sink_parquet_spark.tables import load


def _queries(emb):
    return emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )


def test_persisted_index_matches_in_memory_ivfpq(spark, sf_dir, tmp_path):
    """Same deterministic training inputs => the persisted index must
    return exactly the in-memory ivfpq_topk results."""
    emb = load(spark, sf_dir, "embeddings")
    dim = S.embedding_dim(spark, sf_dir)
    idx = str(tmp_path / "ann")
    A.write_ann_index(emb, idx, dim=dim)
    qs = _queries(emb)
    persisted = {(r.q_id, r.neighbor_id, r.rank)
                 for r in A.ann_topk(spark, idx, qs, k=5).collect()}
    memory = {(r.q_id, r.neighbor_id, r.rank)
              for r in S.ivfpq_topk(emb, qs, dim=dim, k=5).collect()}
    assert persisted == memory


def test_query_scans_only_probed_cell_partitions(spark, sf_dir, tmp_path):
    """The point of the layout: the codes scan must carry a STATIC
    partition filter of exactly the probed cells (cent_id IN (...)), so
    unprobed cells' files never enter the plan."""
    import re

    emb = load(spark, sf_dir, "embeddings")
    dim = S.embedding_dim(spark, sf_dir)
    idx = str(tmp_path / "ann")
    A.write_ann_index(emb, idx, dim=dim)
    one_q = _queries(emb).limit(1)
    res = A.ann_topk(spark, idx, one_q, k=3, nprobe=2)
    fmt = res._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    m = re.search(r"PartitionFilters: \[cent_id#\d+ IN \(([^)]+)\)", fmt)
    assert m, fmt
    assert len(m.group(1).split(",")) <= 2  # nprobe=2 => at most two cells


def test_append_encodes_with_frozen_codebooks_and_is_searchable(spark, tmp_path):
    """New vectors appended with the frozen quantizer land in the right
    cells and become nearest neighbors of a matching query, without any
    retrain; metadata is unchanged."""
    dim = 8
    base = [
        (i, [float(math.cos(i)), float(math.sin(i))] + [0.1 * j for j in range(6)])
        for i in range(64)
    ]
    emb = spark.createDataFrame(base, "vec_id long, embedding array<float>")
    idx = str(tmp_path / "ann")
    meta_before = A.write_ann_index(emb, idx, dim=dim, n_centroids=4, m=4)
    planted = spark.createDataFrame(
        [(999, [2.0, 0.1, 0.2, 0.1, 0.3, 0.1, 0.2, 0.4])],
        "vec_id long, embedding array<float>",
    )
    A.append_to_ann_index(planted, idx)
    assert A.read_ann_meta(spark, idx) == meta_before  # frozen
    probe = spark.createDataFrame(
        [(777, [2.0, 0.1, 0.2, 0.1, 0.3, 0.1, 0.2, 0.4])],
        "q_id long, q_vec array<float>",
    )
    # coarse 4x16 codes can tie the planted vector with same-code cluster
    # mates (ADC sees codes, not raw vectors; ties break to the lower id),
    # so pin top-k MEMBERSHIP, which already proves the append is indexed
    # in the right cell and scored
    got = A.ann_topk(spark, idx, probe, k=3, nprobe=2).collect()
    assert 999 in {r.neighbor_id for r in got}


def test_edge_cases_empty_queries_and_oversized_nprobe(spark, tmp_path):
    """No queries => empty ranked frame with the contract schema (not an
    IN () planning error); nprobe > n_centroids degrades to probing every
    cell, equivalent to full-scan PQ over the same codes."""
    base = [(i, [float(i % 7), float((i * 3) % 5), 1.0, -0.5]) for i in range(40)]
    emb = spark.createDataFrame(base, "vec_id long, embedding array<float>")
    idx = str(tmp_path / "ann")
    A.write_ann_index(emb, idx, dim=4, n_centroids=4, m=2, n_codes=8)
    empty_q = spark.createDataFrame([], "q_id long, q_vec array<float>")
    res = A.ann_topk(spark, idx, empty_q, k=5)
    assert res.columns == ["q_id", "neighbor_id", "rank"] and res.count() == 0
    one_q = spark.createDataFrame(
        [(0, base[0][1])], "q_id long, q_vec array<float>"
    )
    wide = A.ann_topk(spark, idx, one_q, k=3, nprobe=99).collect()
    assert len(wide) == 3 and all(r.q_id == 0 for r in wide)
