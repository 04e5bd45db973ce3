"""Persisted IVF-PQ index: the ANN index as a LAKE ARTIFACT.

The in-memory composition (``similarity.ivfpq_topk``) re-trains and
re-encodes per call — right for a one-shot query, wrong for a serving
corpus. This module materializes the index once and prunes at read time:

  ``{index_dir}/codes/cent_id={c}/``  PQ codes, PARTITIONED BY CELL
  ``{index_dir}/_ANN_META.json``      centroids + codebooks + params

- The codes table is the 32x-compressed corpus (m bytes/vector at
  k<=256); partitioning by ``cent_id`` makes an nprobe-cell query a
  PARTITION-PRUNED scan — the files of unprobed cells are never listed
  into the plan (pinned by pytest via ``inputFiles()``), which is the
  whole point of IVF at 100 TB: touch nprobe/n_centroids of the index,
  physically.
- The metadata file holds exactly the driver-resident part of a FAISS
  index (quantizer + codebooks: k*dim + m*k*dsub floats) — kilobytes,
  shipped to executors as literals at query time like every other
  quantizer in ``similarity``.
- Probed cell ids are resolved driver-side from the (tiny) query set, so
  the pruning filter is a STATIC ``isin`` the parquet source sees at
  planning time — no dynamic-partition-pruning dependence.
- Residual encoding (the FAISS default) is preserved end-to-end: codes
  quantize (vector − cell centroid); each (query, probed cell) pair gets
  its own residual distance table.

Incremental growth: ``append_to_ann_index`` encodes NEW vectors with the
frozen quantizer/codebooks (map-only) and appends into the same cell
partitions — the standard serve-time pattern (FAISS ``add``); retrain
(``write_ann_index``) when drift accumulates.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fsio import HadoopFS, url_join
from .similarity import (
    _adc_score,
    _adc_table,
    _centroid_lookup,
    _nearest_centroid,
    _residual,
    ivf_centroids,
    pq_codebooks,
    pq_encode,
)

_META = "_ANN_META.json"


def write_ann_index(
    embeddings: DataFrame,
    index_dir: str,
    dim: int,
    n_centroids: int = 16,
    m: int = 8,
    n_codes: int = 16,
    residual: bool = True,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> dict:
    """Train quantizer + codebooks, encode the corpus, and lay the index
    down partitioned by cell. Returns the metadata dict it persisted."""
    spark = embeddings.sparkSession
    fs = HadoopFS(spark, index_dir)
    src = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    )
    cents = ivf_centroids(src, n_centroids=n_centroids)
    assigned = _nearest_centroid(
        src, cents, "embedding", keep=["vec_id", "embedding"]
    )
    if residual:
        cvec = _centroid_lookup(cents)
        assigned = assigned.withColumn(
            "resid", _residual("embedding", cvec(F.col("cent_id")))
        ).persist()
        cbs = pq_codebooks(assigned, dim=dim, m=m, k=n_codes, vec_col="resid")
        codes = pq_encode(assigned, cbs, vec_col="resid",
                          keep=["vec_id", "cent_id"])
    else:
        cbs = pq_codebooks(src, dim=dim, m=m, k=n_codes)
        codes = pq_encode(assigned, cbs, keep=["vec_id", "cent_id"])
    codes.write.mode("overwrite").partitionBy("cent_id").parquet(
        url_join(index_dir, "codes")
    )
    if residual:
        assigned.unpersist()
    meta = {
        "dim": dim, "m": m, "n_codes": n_codes, "residual": residual,
        "centroids": [[cid, vec] for cid, vec in cents],
        "codebooks": cbs,
    }
    fs.write_bytes(url_join(index_dir, _META), json.dumps(meta).encode())
    return meta


def read_ann_meta(spark: SparkSession, index_dir: str) -> dict:
    fs = HadoopFS(spark, index_dir)
    return json.loads(fs.read_bytes(url_join(index_dir, _META)))


def append_to_ann_index(new_vectors: DataFrame, index_dir: str,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id") -> None:
    """Encode new vectors with the FROZEN quantizer/codebooks and append
    into the existing cell partitions — map-only, no retrain, the FAISS
    ``add`` path. The caller owns dedup of vec_ids (compose with the
    corpus builder's screens upstream)."""
    spark = new_vectors.sparkSession
    meta = read_ann_meta(spark, index_dir)
    cents = [(int(c), list(v)) for c, v in meta["centroids"]]
    src = new_vectors.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    )
    # a wrong-dimension vector would encode into garbage codes via
    # zip_with/slice null propagation — refuse loudly before writing
    bad = src.filter(
        F.col("embedding").isNull() | (F.size("embedding") != meta["dim"])
    ).limit(1).count()
    if bad:
        raise ValueError(
            f"append_to_ann_index: input contains null or non-{meta['dim']}"
            "-dimensional embeddings; the index's dimension is frozen at "
            "build time — filter or re-embed the batch first"
        )
    assigned = _nearest_centroid(
        src, cents, "embedding", keep=["vec_id", "embedding"]
    )
    if meta["residual"]:
        cvec = _centroid_lookup(cents)
        assigned = assigned.withColumn(
            "resid", _residual("embedding", cvec(F.col("cent_id")))
        )
        codes = pq_encode(assigned, meta["codebooks"], vec_col="resid",
                          keep=["vec_id", "cent_id"])
    else:
        codes = pq_encode(assigned, meta["codebooks"],
                          keep=["vec_id", "cent_id"])
    codes.write.mode("append").partitionBy("cent_id").parquet(
        url_join(index_dir, "codes")
    )


def ann_topk(spark: SparkSession, index_dir: str, queries: DataFrame,
             k: int = 5, nprobe: int = 4) -> DataFrame:
    """Approximate top-k against the persisted index: resolve the probed
    cells driver-side from the (tiny) query set, scan ONLY those cells'
    partitions, ADC-score, rank per query. Output matches the in-memory
    ANN operators: (q_id, neighbor_id, rank)."""
    from pyspark.sql.window import Window

    meta = read_ann_meta(spark, index_dir)
    cents = [(int(c), list(v)) for c, v in meta["centroids"]]
    m = meta["m"]
    cbs = meta["codebooks"]
    dsub = meta["dim"] // m
    probes = _nearest_centroid(
        queries, cents, "q_vec", keep=["q_id", "q_vec"], nprobe=nprobe
    )
    q_expr = F.col("q_vec").cast("array<double>")
    if meta["residual"]:
        q_expr = _residual(q_expr, _centroid_lookup(cents)(F.col("cent_id")))
    assert len(cbs[0][0]) == dsub
    probes = probes.select(
        "q_id", F.col("cent_id").alias("p_cent"),
        _adc_table(q_expr, cbs).alias("dt"),
    )
    # driver-side cell resolution: nprobe x |queries| ids — a STATIC
    # partition filter the scan prunes on, never a full-index listing
    cells = sorted({r.p_cent for r in probes.select("p_cent").distinct().collect()})
    codes = spark.read.parquet(url_join(index_dir, "codes"))
    if not cells:  # no queries: an empty ranked frame, not an IN () error
        from pyspark.sql import types as T

        return spark.createDataFrame(
            [],
            T.StructType([
                T.StructField("q_id", queries.schema["q_id"].dataType),
                T.StructField("neighbor_id", codes.schema["vec_id"].dataType),
                T.StructField("rank", T.IntegerType()),
            ]),
        )
    codes = codes.where(F.col("cent_id").isin(cells))
    joined = codes.join(
        F.broadcast(probes),
        (codes.cent_id == probes.p_cent) & (codes.vec_id != probes.q_id),
    )
    scored = (
        joined.select("q_id", "vec_id", _adc_score(m).alias("adc"))
        .dropDuplicates(["q_id", "vec_id"])
    )
    w = Window.partitionBy("q_id").orderBy(F.col("adc").asc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "rank")
    )
