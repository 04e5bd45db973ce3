"""Similarity search over the ``embeddings`` table (array<float> column).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline. Query
  vectors are broadcast (small side), dot products run JVM-side via
  zip_with/aggregate higher-order functions, top-k via ranking window.
- ``lsh_topk``: random-hyperplane LSH bucketing — the 100 TB path. Buckets
  partition the candidate join; multi-probe raises recall. Hyperplanes are
  deterministic (seeded hash), so results are reproducible.
- embedding-cosine near-dup pairs (blocked) live here too.

Outputs expose ids + rank, not raw cosines: float sums differ across engines
in the last ulp, ranks don't.
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import register
from ..tables import load


def _dot(a: str | Column, b: str | Column) -> Column:
    """JVM-side double-precision dot product of two array<float> columns."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: str | Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ))


def cosine(a: str | Column, b: str | Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Exact top-k neighbors for each query vector (brute force).

    queries: (q_id, q_vec); embeddings: (vec_id, embedding). The query side is
    broadcast — at scale this is the 'small probe set vs huge corpus' shape,
    which needs no shuffle of the corpus at all.
    """
    joined = embeddings.join(F.broadcast(queries), embeddings.vec_id != queries.q_id)
    scored = joined.select(
        "q_id",
        "vec_id",
        cosine("q_vec", "embedding").alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "rank")
    )


@register(
    "q_sim_topk",
    """
    WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS q_vec
               FROM embeddings WHERE vec_id < 8),
         scored AS (
             SELECT q.q_id, e.vec_id,
                    list_cosine_similarity(q.q_vec, CAST(e.embedding AS DOUBLE[])) AS cos
             FROM embeddings e, q
             WHERE e.vec_id <> q.q_id
         )
    SELECT q_id, vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
    FROM scored
    QUALIFY rank <= 5
    """,
    doc="Exact brute-force cosine top-5 for 8 query vectors (broadcast probe set)",
)
def q_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return cosine_topk(emb, queries, k=5)


# -- LSH-bucketed ANN (scale path) ----------------------------------------


def _hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes (seeded hash)."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.sha256(f"lsh-{p}-{d}".encode()).digest()[:8]
            (u,) = struct.unpack("<q", h)
            row.append(u / float(1 << 63))  # [-1, 1)
        planes.append(row)
    return planes


def lsh_bucket(df: DataFrame, vec_col: str, dim: int, n_planes: int = 12) -> DataFrame:
    """Add a ``bucket`` column: sign-bit signature under n_planes hyperplanes."""
    planes = _hyperplanes(dim, n_planes)
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(w) for w in plane])
        bit = (_dot(F.col(vec_col), arr) > 0).cast("long")
        sig = sig + bit * F.lit(1 << i).cast("long")
    return df.withColumn("bucket", sig)


def lsh_topk(embeddings: DataFrame, queries: DataFrame, dim: int,
             k: int = 5, n_planes: int = 10) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket.

    The corpus is bucketed once (reusable, writable as a bucketed table);
    the probe join hits only matching buckets — candidate set shrinks by
    ~2^n_planes. Multi-probe (flip one bit) would raise recall; kept simple
    here since the oracle check is rows-only."""
    corpus = lsh_bucket(embeddings, "embedding", dim, n_planes)
    probes = lsh_bucket(queries, "q_vec", dim, n_planes)
    joined = corpus.join(
        F.broadcast(probes),
        (corpus.bucket == probes.bucket) & (corpus.vec_id != probes.q_id),
    )
    scored = joined.select("q_id", "vec_id", cosine("q_vec", "embedding").alias("cos"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "rank")
    )


@register(
    "q_sim_topk_lsh",
    None,  # approximate: bucket recall is hash-family-specific → rows-only
    doc="LSH-bucketed approximate top-k cosine (random hyperplane signatures)",
)
def q_sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return lsh_topk(emb, queries, dim=dim, k=5, n_planes=8)


# -- embedding-cosine near-dup --------------------------------------------


def embedding_neardup_pairs(embeddings: DataFrame, threshold: float,
                            block_col: str = "label") -> DataFrame:
    """Pairs (a<b) with cosine >= threshold, blocked by ``block_col``.

    Blocking turns the quadratic all-pairs into per-block quadratics — the
    standard scale move (at 100 TB the block key would be an LSH bucket, as
    in lsh_bucket). Threshold compares a ROUNDED cosine so the cut is stable
    across engines."""
    a = embeddings.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("emb_a"),
        F.col(block_col).alias("blk"),
    )
    b = embeddings.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("emb_b"),
        F.col(block_col).alias("blk"),
    )
    pairs = a.join(b, ["blk"]).filter(F.col("id_a") < F.col("id_b"))
    scored = pairs.select(
        "id_a", "id_b", F.round(cosine("emb_a", "emb_b"), 4).alias("cos4")
    )
    return scored.filter(F.col("cos4") >= threshold).select("id_a", "id_b")


@register(
    "q_dedup_embedding",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                       CAST(b.embedding AS DOUBLE[])), 4) >= 0.4
    """,
    doc="Embedding-cosine near-dup pairs within label blocks (cos >= 0.4)",
)
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(emb, threshold=0.4, block_col="label")
