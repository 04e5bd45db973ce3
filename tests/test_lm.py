"""Persisted bigram LM (llm/lm.py): cross-corpus CCNet fluency scoring."""

import pytest
from pyspark.sql import functions as F

from substreams_sink_parquet_spark.llm import lm as L


def _train(spark):
    rows = [
        (i, "the quick brown fox jumps over the lazy dog again and again")
        for i in range(10)
    ] + [
        (100 + i, "a calm river flows past the old stone bridge at dawn")
        for i in range(10)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_fluency_ordering_and_oov_floor(spark, tmp_path):
    """Target-like phrasing scores LOWER (more fluent) than scrambled
    words AND than fully out-of-vocabulary text; OOV text lands exactly
    on the uniform floor -ln(alpha/(alpha*V)) = ln(V) (with this tiny
    20-word vocab that floor sits BELOW the scrambled doc's score —
    add-alpha correctly punishes an unseen continuation of a common word
    harder than a word it knows nothing about; at a real 100k vocab the
    floor dominates). A single-word doc reports n_bigrams=0 with a null
    score — measurable and unmeasurable stay distinguishable."""
    import math

    lm_dir = str(tmp_path / "lm")
    meta = L.write_bigram_lm(_train(spark), lm_dir, n_buckets=4)
    assert meta["vocab"] > 0 and meta["n_docs"] == 20

    probe = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # in-domain
            (2, "dog the over quick lazy fox brown jumps the"),  # scrambled
            (3, "zxq wvut plomb kraken verdigris xylophone snark"),  # OOV
            (4, "solo"),                                         # 1 word
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in L.score_with_lm(
        spark, lm_dir, probe
    ).collect()}
    assert got[1].neg_avg_logprob < got[2].neg_avg_logprob
    assert got[1].neg_avg_logprob < got[3].neg_avg_logprob
    # the OOV floor is exactly ln(V): every bigram scores alpha/(alpha*V)
    assert abs(got[3].neg_avg_logprob - math.log(meta["vocab"])) < 1e-5
    assert got[4].n_bigrams == 0 and got[4].neg_avg_logprob is None
    assert got[3].n_bigrams == 6  # OOV still measured, never crashed


def test_persisted_scoring_is_deterministic_and_partition_invariant(
        spark, tmp_path):
    lm_dir = str(tmp_path / "lm")
    L.write_bigram_lm(_train(spark), lm_dir, n_buckets=4)
    probe = _train(spark).withColumn("doc_id", F.col("doc_id") + 1000)
    a = sorted((r.doc_id, r.n_bigrams, r.neg_avg_logprob)
               for r in L.score_with_lm(spark, lm_dir, probe).collect())
    b = sorted((r.doc_id, r.n_bigrams, r.neg_avg_logprob)
               for r in L.score_with_lm(
                   spark, lm_dir, probe.repartition(7)).collect())
    assert a == b
    # alpha is a query-time knob on the same artifact
    c = sorted((r.doc_id, r.neg_avg_logprob)
               for r in L.score_with_lm(
                   spark, lm_dir, probe, alpha=1.0).collect())
    assert [x[0] for x in c] == [x[0] for x in a]
    assert any(x[1] != y[2] for x, y in zip(c, a))


def test_missing_meta_refused_and_rebuild_overwrites(spark, tmp_path):
    lm_dir = str(tmp_path / "lm")
    with pytest.raises(FileNotFoundError, match="lm-train"):
        L.read_lm_meta(spark, lm_dir)
    L.write_bigram_lm(_train(spark), lm_dir, n_buckets=4)
    v1 = L.read_lm_meta(spark, lm_dir)["vocab"]
    # retrain on a smaller slice: meta and counts swap wholesale
    L.write_bigram_lm(_train(spark).limit(5), lm_dir, n_buckets=4)
    v2 = L.read_lm_meta(spark, lm_dir)["vocab"]
    assert 0 < v2 < v1


def test_cli_lm_train_and_score(spark, tmp_path, capsys, sf_dir):
    import json

    from substreams_sink_parquet_spark.cli import main
    from substreams_sink_parquet_spark.tables import load

    docs_p = f"{sf_dir}/documents.parquet"
    n = load(spark, sf_dir, "documents").count()
    lm_dir = str(tmp_path / "lm")
    assert main(["lm-train", lm_dir, "--docs", docs_p]) == 0
    assert "lm-train OK" in capsys.readouterr().out

    out = str(tmp_path / "scores")
    assert main(["lm-score", lm_dir, "--docs", docs_p, "--out", out,
                 "--max-score", "9.0"]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["n_docs"] == n
    scores = spark.read.parquet(out)
    assert scores.count() == n
    kept = spark.read.parquet(out + "_kept")
    assert 0 < kept.count() <= n and rep["kept"] == kept.count()


def test_min_count_pruning_bounds_table_not_vocabulary(spark, tmp_path):
    """Pruned-LM contract: min_count shrinks the persisted BIGRAM table
    (hapax pairs dropped) while unigram counts and vocab stay complete,
    so a pruned bigram scores as UNSEEN under the true c_uni — never as
    out-of-vocabulary — and in-domain text still orders below garbled
    text under the pruned model."""
    docs = _train(spark).unionByName(spark.createDataFrame(
        [(500, "one rare bigram pair appears exactly once here")],
        "doc_id long, text string",
    ))
    full_dir, pruned_dir = str(tmp_path / "full"), str(tmp_path / "pruned")
    m_full = L.write_bigram_lm(docs, full_dir, n_buckets=2)
    m_pruned = L.write_bigram_lm(docs, pruned_dir, n_buckets=2, min_count=2)
    assert m_pruned["vocab"] == m_full["vocab"]  # unigrams untouched
    n_full = spark.read.schema(
        "w1 string, w2 string, c_bg long, w_bucket int"
    ).parquet(full_dir + "/bigrams").count()
    n_pruned = spark.read.schema(
        "w1 string, w2 string, c_bg long, w_bucket int"
    ).parquet(pruned_dir + "/bigrams").count()
    assert 0 < n_pruned < n_full

    probe = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "one rare bigram pair appears exactly once here"),
         (3, "zxq wvut plomb kraken verdigris xylophone snark")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.neg_avg_logprob
           for r in L.score_with_lm(spark, pruned_dir, probe).collect()}
    # repeated in-domain text survives pruning and still beats garbled
    assert got[1] < got[3]
    # the hapax doc's bigrams were pruned: it scores WORSE under the
    # pruned model than the full one (unseen mass), but is still scored
    full_score = {r.doc_id: r.neg_avg_logprob
                  for r in L.score_with_lm(spark, full_dir, probe).collect()}
    assert got[2] > full_score[2]
