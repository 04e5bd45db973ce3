"""BPE tokenizer: hand-checked merge order, lossless round-trip, determinism,
and the monotone compression property more merges can only improve."""

import pytest

from pyspark.sql import functions as F

from substreams_sink_parquet_spark.llm.bpe import (
    END,
    bpe_tokenize,
    detokenize_expr,
    train_bpe,
    word_counts,
)
from substreams_sink_parquet_spark.tables import load


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [(1, "low low low"), (2, "lower lowest"), (3, "low lower")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_counts(spark, tiny):
    got = {r.word: r.n for r in word_counts(tiny).collect()}
    assert got == {"low": 4, "lower": 2, "lowest": 1}


def test_train_merge_order_hand_checked(spark, tiny):
    # weighted pair counts: (l,o)=7, (o,w</w>)=4, (o,w)=3, (w,e)=3, ...
    # round 1: (l,o) wins at 7
    # round 2: (lo,w</w>)=4 beats (lo,w)=3 and (w,e)=3
    # round 3: tie (lo,w)=3 vs (w,e)=3 -> lexicographic: ("lo","w")
    merges = train_bpe(tiny, num_merges=3)
    assert merges == [("l", "o"), ("lo", "w" + END), ("lo", "w")]


def test_tokenize_uses_merges_greedily_by_rank(spark, tiny):
    merges = train_bpe(tiny, num_merges=3)
    out = {r.doc_id: r.tokens for r in bpe_tokenize(tiny, merges).collect()}
    assert out[1] == ["low" + END] * 3
    # "lower": low + e + r</w> (merge 3 applies, then no rule for e/r)
    assert out[3] == ["low" + END, "low", "e", "r" + END]


def test_round_trip_is_lossless(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").limit(80)
    merges = train_bpe(docs, num_merges=120)
    toks = bpe_tokenize(docs, merges)
    joined = toks.join(docs.select("doc_id", "text"), "doc_id")
    bad = joined.where(
        detokenize_expr() != F.trim(F.regexp_replace("text", r"\s+", " "))
    ).count()
    assert bad == 0


def test_training_is_deterministic(spark, tiny):
    assert train_bpe(tiny, num_merges=8) == train_bpe(tiny, num_merges=8)


def test_memo_cap_inside_one_document_keeps_output_correct(spark, monkeypatch):
    """The memo cap is enforced on INSERT, so a single document with more
    distinct words than the cap stays bounded mid-document. Correctness
    must not depend on memo hits: with a cap of 4 and a 50-distinct-word
    document, tokenization still round-trips losslessly."""
    from substreams_sink_parquet_spark.llm import bpe as bpe_mod

    monkeypatch.setattr(bpe_mod, "_MEMO_CAP", 4)
    text = " ".join(f"word{i}x" for i in range(50)) + " word0x word1x"
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    merges = train_bpe(docs, num_merges=30)
    toks = bpe_tokenize(docs, merges)
    got = toks.select(detokenize_expr().alias("t")).first().t
    assert got == text


def test_more_merges_compress_monotonically(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").limit(60)
    m40 = train_bpe(docs, num_merges=40)
    m160 = train_bpe(docs, num_merges=160)
    assert m160[:40] == m40  # merge list is prefix-stable
    n40 = bpe_tokenize(docs, m40, keep_tokens=False).agg(F.sum("n_tokens")).first()[0]
    n160, words = bpe_tokenize(docs, m160, keep_tokens=False).agg(
        F.sum("n_tokens"), F.sum("n_words")
    ).first()
    assert words <= n160 <= n40  # merges only ever shrink token counts


def test_tokenize_is_map_only(spark, sf_dir):
    from substreams_sink_parquet_spark.plans.inspect import plan_report

    docs = load(spark, sf_dir, "documents")
    rep = plan_report(bpe_tokenize(docs, [("e", "r" + END)], keep_tokens=False))
    assert rep.shuffle_exchanges == 0


def test_marker_and_unicode_whitespace_are_sanitized_consistently(spark):
    # the U+E000 end-of-word marker is stripped by BOTH training and apply,
    # and U+00A0 (unicode space) is NOT a word boundary in either engine
    docs = spark.createDataFrame(
        [(1, f"x{END}y ab\u00a0cd ab\u00a0cd")], "doc_id long, text string"
    )
    got = {r.word: r.n for r in word_counts(docs).collect()}
    assert got == {"xy": 1, "ab\u00a0cd": 2}
    merges = train_bpe(docs, num_merges=50)
    row = bpe_tokenize(docs, merges).first()
    assert row.n_words == 3  # apply splits identically (ASCII whitespace)
    joined = "".join(row.tokens).replace(END, " ").strip()
    assert joined == "xy ab\u00a0cd ab\u00a0cd"
