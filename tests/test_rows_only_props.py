"""Property pins for the rows-only catalog queries.

The driver's rows-only check only proves these run and return rows; these
tests pin the semantics the hash gate can't see — sketch estimation
accuracy, fingerprint distance behavior, and run-to-run determinism (which
the rows-only row-count check implicitly depends on).
"""

from pyspark.sql import functions as F

from substreams_sink_parquet_spark.catalog import queries

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BASE = "the quick brown fox jumps over the lazy dog again and again every day"


def test_minhash_estimate_tracks_true_jaccard(spark):
    from substreams_sink_parquet_spark.llm.dedup import (
        jaccard_pairs,
        minhash_lsh_pairs,
    )

    docs = _docs(
        spark,
        [
            (1, BASE),
            (2, BASE),  # exact duplicate → jaccard 1.0
            (3, BASE + " with a small tail change"),  # near dup
            (4, "completely different text about spark engines and parquet"),
        ],
    )
    est = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in minhash_lsh_pairs(docs, threshold=0.0).collect()
    }
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(docs, threshold=0.0).collect()
    }
    assert est[(1, 2)] == 1.0  # identical docs: all 32 minima agree
    # every candidate pair's estimate is within sketch error of the truth
    # (32 hashes → std ≈ 0.09; allow 3 sigma)
    for pair, e in est.items():
        assert abs(e - exact.get(pair, 0.0)) <= 0.3, (pair, e, exact.get(pair))
    # the unrelated doc must not pair with anything above the 0.5 threshold
    high = {p for p, e in est.items() if e >= 0.5}
    assert all(4 not in p for p in high)


def test_simhash_distance_orders_by_similarity(spark):
    from substreams_sink_parquet_spark.llm.dedup import simhash_64

    docs = _docs(
        spark,
        [
            (1, BASE),
            (2, BASE),
            (3, BASE + " tail"),
            (4, "utterly unrelated words nowhere near the base sentence at all"),
        ],
    )
    h = {r.doc_id: r.simhash for r in simhash_64(docs).collect()}

    def ham(a, b):
        return bin((h[a] ^ h[b]) & ((1 << 64) - 1)).count("1")

    assert ham(1, 2) == 0  # identical text → identical fingerprint
    assert ham(1, 3) < ham(1, 4)  # near-dup closer than unrelated


def test_rows_only_queries_are_deterministic(spark):
    # the driver's rows-only gate compares row counts across runs; these
    # queries must produce identical full results run-over-run (no RNG, no
    # partition-order dependence)
    for q in ("q_udaf", "q_udtf", "q_text_hashing_tf", "q_sim_topk_lsh"):
        df1 = queries()[q](spark, SF)
        r1 = {tuple(map(str, r)) for r in df1.collect()}
        r2 = {tuple(map(str, r)) for r in queries()[q](spark, SF).collect()}
        assert r1 == r2, q
        assert len(r1) > 0, q
