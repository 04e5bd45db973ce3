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


def _extra(spark):
    """A second corpus slice: overlaps the training vocabulary (so the
    sum-merge path is exercised, not just concatenation) and adds new
    words (so the merged-vocab recompute is exercised)."""
    rows = [
        (200 + i, "the quick silver fox sleeps under the old bridge")
        for i in range(6)
    ] + [
        (300 + i, "glaciers carve quiet valleys over patient centuries")
        for i in range(6)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _probe(spark):
    return spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "glaciers carve quiet valleys at dawn"),
         (3, "zxq wvut plomb kraken verdigris"),
         (4, "solo")],
        "doc_id long, text string",
    )


def _scores(spark, lm_dir, probe):
    return sorted(
        (r.doc_id, r.n_bigrams, r.neg_avg_logprob)
        for r in L.score_with_lm(spark, lm_dir, probe).collect()
    )


def test_epoch_append_equals_retrain_exactly(spark, tmp_path):
    """Appends are NOT approximate: counts are sum-mergeable and the
    vocabulary is recomputed from the merged unigrams, so base+epochs
    scores every document BIT-IDENTICALLY to a full retrain over the
    grown corpus — including vocab growth from epoch-only words. A
    replayed epoch overwrites itself and converges (at-least-once
    safety)."""
    grown_dir = str(tmp_path / "retrained")
    lm_dir = str(tmp_path / "lm")
    base, extra = _train(spark), _extra(spark)
    half_b = extra.filter(F.col("doc_id") < 300)
    half_c = extra.filter(F.col("doc_id") >= 300)
    L.write_bigram_lm(base.unionByName(extra), grown_dir, n_buckets=4)
    L.write_bigram_lm(base, lm_dir, n_buckets=4)
    L.append_epoch_to_bigram_lm(half_b, lm_dir, epoch_id=0)
    L.append_epoch_to_bigram_lm(half_c, lm_dir, epoch_id=1)
    want = _scores(spark, grown_dir, _probe(spark))
    assert _scores(spark, lm_dir, _probe(spark)) == want
    _, _, stats = L.merged_lm_state(spark, lm_dir)
    retrain_meta = L.read_lm_meta(spark, grown_dir)
    assert stats["vocab"] == retrain_meta["vocab"]
    assert stats["n_tokens"] == retrain_meta["n_tokens"]
    assert stats["n_docs"] == retrain_meta["n_docs"]
    # at-least-once replay of epoch 1: overwrite, not double-count
    L.append_epoch_to_bigram_lm(half_c, lm_dir, epoch_id=1)
    assert _scores(spark, lm_dir, _probe(spark)) == want


def test_lm_compaction_preserves_scores_and_trailing_epoch(spark,
                                                           tmp_path):
    """Folding per-batch deltas into epoch=-1 (a groupBy-SUM merge — the
    same bigram recurs across epochs, unlike postings) changes no score;
    the highest-numbered epoch survives by name (its crashed replay
    relies on overwriting it); the folded stats JSON is the sum of the
    folded deltas."""
    import json

    lm_dir = str(tmp_path / "lm")
    base, extra = _train(spark), _extra(spark)
    L.write_bigram_lm(base, lm_dir, n_buckets=4)
    parts = [
        extra.filter(F.col("doc_id") % 3 == i) for i in range(3)
    ]
    for i, p in enumerate(parts):
        L.append_epoch_to_bigram_lm(p, lm_dir, epoch_id=i)
    before = _scores(spark, lm_dir, _probe(spark))
    assert L.compact_lm_epochs(spark, lm_dir, min_epochs=2)
    ep_root = tmp_path / "lm" / "epochs"
    assert {p.name for p in ep_root.iterdir()} == {"epoch=-1", "epoch=2"}
    assert _scores(spark, lm_dir, _probe(spark)) == before
    folded = json.loads(
        (ep_root / "epoch=-1" / "_EPOCH_STATS.json").read_text()
    )
    assert folded["n_docs"] == parts[0].count() + parts[1].count()
    # idempotent second call with nothing foldable below min_epochs
    assert not L.compact_lm_epochs(spark, lm_dir, min_epochs=2)


def test_crashed_compact_scores_from_armed_fold(spark, tmp_path):
    """A crash INSIDE commit_fold — sources deleted, ``epochs/_compact``
    (manifest still inside) not yet renamed to ``epoch=-1`` — must not
    change a single score: the folded counts exist ONLY in the armed tmp
    at that point, and a plain ``epoch=`` listing would silently drop
    them (wrong scores, no error). merged_lm_state reads the armed fold
    in place of the sources its manifest names; an UNARMED ``_compact``
    (no manifest: never committed, sources intact) is ignored."""
    import json
    import shutil

    lm_dir = str(tmp_path / "lm")
    base, extra = _train(spark), _extra(spark)
    L.write_bigram_lm(base, lm_dir, n_buckets=4)
    for i in range(3):
        L.append_epoch_to_bigram_lm(
            extra.filter(F.col("doc_id") % 3 == i), lm_dir, epoch_id=i
        )
    want = _scores(spark, lm_dir, _probe(spark))
    ep_root = tmp_path / "lm" / "epochs"

    # unarmed tmp (crash BEFORE the manifest write): sources intact,
    # tmp contents are an incomplete duplicate — must be ignored
    shutil.copytree(ep_root / "epoch=0", ep_root / "_compact")
    assert _scores(spark, lm_dir, _probe(spark)) == want
    shutil.rmtree(ep_root / "_compact")

    # armed tmp (crash AFTER source deletes, BEFORE the rename): fold
    # for real, then rewind the rename — epoch=-1 back to _compact with
    # its manifest restored; epochs 0 and 1 are gone, epoch=2 (trailing,
    # never folded) remains listed beside the armed fold
    assert L.compact_lm_epochs(spark, lm_dir, min_epochs=2)
    (ep_root / "epoch=-1").rename(ep_root / "_compact")
    (ep_root / "_compact" / "_MERGED.json").write_text(
        json.dumps({"sources": ["epoch=0", "epoch=1"]})
    )
    assert sorted(p.name for p in ep_root.iterdir()) == [
        "_compact", "epoch=2"
    ]
    assert _scores(spark, lm_dir, _probe(spark)) == want

    # a source the crash had NOT yet deleted is excluded by name (its
    # counts already live in the fold — double-counting is as wrong as
    # dropping): resurrect epoch=1 from the retrained-equivalent append
    L.append_epoch_to_bigram_lm(
        extra.filter(F.col("doc_id") % 3 == 1), lm_dir, epoch_id=1
    )
    assert _scores(spark, lm_dir, _probe(spark)) == want

    # the writer-side recover (next lm-compact run) then converges the
    # on-disk state and scores are still identical
    L.compact_lm_epochs(spark, lm_dir, min_epochs=99)
    assert _scores(spark, lm_dir, _probe(spark)) == want


def test_merged_vocab_memoized_per_epoch_set(spark, tmp_path):
    """With epochs present, the merged-vocab recompute (an eager
    shuffle+count job) runs ONCE per (lm_dir, committed-epoch set) — a
    repeat merged_lm_state (the corpus-stream gate's per-batch call
    pattern) launches ZERO Spark jobs before its scoring plan; growing
    the epoch set invalidates the memo and the vocab tracks the new
    words."""
    lm_dir = str(tmp_path / "lm")
    base, extra = _train(spark), _extra(spark)
    L.write_bigram_lm(base, lm_dir, n_buckets=4)
    L.append_epoch_to_bigram_lm(
        extra.filter(F.col("doc_id") < 300), lm_dir, epoch_id=0
    )
    _, _, first = L.merged_lm_state(spark, lm_dir)

    sc = spark.sparkContext
    sc.setJobGroup("vocab-memo-probe", "repeat merged_lm_state")
    try:
        _, _, again = L.merged_lm_state(spark, lm_dir)
    finally:
        sc.setJobGroup("", "")
    assert again == first
    assert list(
        sc.statusTracker().getJobIdsForGroup("vocab-memo-probe")
    ) == []

    # epoch growth with new words: memo miss, vocab recomputed
    L.append_epoch_to_bigram_lm(
        extra.filter(F.col("doc_id") >= 300), lm_dir, epoch_id=1
    )
    _, _, grown = L.merged_lm_state(spark, lm_dir)
    assert grown["vocab"] > first["vocab"]


def test_append_refuses_pruned_base_and_rebuild_clears_epochs(spark,
                                                              tmp_path):
    """min_count>1 bases refuse appends loudly (the pruned bigram counts
    are gone — merged deltas would under-count what a retrain keeps);
    a full retrain supersedes and CLEARS prior epoch deltas, same rule
    as the lexical index's rebuild."""
    import pytest

    pruned = str(tmp_path / "pruned")
    L.write_bigram_lm(_train(spark), pruned, n_buckets=2, min_count=2)
    with pytest.raises(ValueError, match="min_count=1"):
        L.append_epoch_to_bigram_lm(_extra(spark), pruned, epoch_id=0)

    lm_dir = str(tmp_path / "lm")
    L.write_bigram_lm(_train(spark), lm_dir, n_buckets=2)
    L.append_epoch_to_bigram_lm(_extra(spark), lm_dir, epoch_id=0)
    assert (tmp_path / "lm" / "epochs" / "epoch=0").exists()
    L.write_bigram_lm(_train(spark).unionByName(_extra(spark)), lm_dir,
                      n_buckets=2)
    assert not (tmp_path / "lm" / "epochs").exists()


def test_crashed_lm_epoch_detected_by_name(spark, tmp_path):
    """An epoch dir whose stats JSON is missing (append crashed between
    the counts write and the stats write) is refused BY NAME so the
    operator knows which batch to replay."""
    import pytest

    lm_dir = str(tmp_path / "lm")
    L.write_bigram_lm(_train(spark), lm_dir, n_buckets=2)
    L.append_epoch_to_bigram_lm(_extra(spark), lm_dir, epoch_id=5)
    (tmp_path / "lm" / "epochs" / "epoch=5" / "_EPOCH_STATS.json").unlink()
    with pytest.raises(FileNotFoundError, match="epoch=5"):
        L.score_with_lm(spark, lm_dir, _probe(spark)).collect()


def test_corpus_stream_lm_appends_track_admissions(spark, tmp_path):
    """CorpusSink composition (`corpus --lm-dir`): admitted docs (and
    ONLY admitted docs — exact-dup rejects leave no counts) update the
    fluency model per batch from an EMPTY seed; a replayed epoch
    converges; scores equal a retrain over the admitted corpus. A
    missing or pruned seed model fails at construction, not batch 47."""
    import pytest

    from substreams_sink_parquet_spark.sources.text_corpus import DOC_SCHEMA
    from substreams_sink_parquet_spark.streaming.corpus_stream import (
        CorpusSink,
        corpus_docs,
    )

    with pytest.raises(ValueError, match="lm-train"):
        CorpusSink(spark=spark, out_dir=str(tmp_path / "c0"),
                   lm_dir=str(tmp_path / "nowhere"))
    pruned = str(tmp_path / "pruned")
    L.write_bigram_lm(_train(spark), pruned, n_buckets=2, min_count=2)
    with pytest.raises(ValueError, match="min_count"):
        CorpusSink(spark=spark, out_dir=str(tmp_path / "c1"), lm_dir=pruned)

    lm_dir = str(tmp_path / "lm")
    empty = spark.createDataFrame([], "doc_id long, text string")
    L.write_bigram_lm(empty, lm_dir, n_buckets=4)
    out = str(tmp_path / "corpus")
    sink = CorpusSink(spark=spark, out_dir=out, lm_dir=lm_dir)

    def doc(i, text):
        return (i, text, "en", "web", len(text), None, None)

    b0 = spark.createDataFrame(
        [doc(1, "alpha beta gamma beta"), doc(2, "delta epsilon zeta")],
        DOC_SCHEMA,
    )
    sink.process_batch(b0, 0)
    # batch 1 re-crawls doc 1's text (rejected by the exact index) and
    # adds one new doc
    b1 = spark.createDataFrame(
        [doc(3, "alpha beta gamma beta"), doc(4, "eta theta iota")],
        DOC_SCHEMA,
    )
    sink.process_batch(b1, 1)
    sink.process_batch(b1, 1)  # crash replay of the same epoch
    admitted = corpus_docs(spark, out).select("doc_id", "text")
    assert sorted(r.doc_id for r in admitted.collect()) == [1, 2, 4]
    retrained = str(tmp_path / "retrained")
    L.write_bigram_lm(admitted, retrained, n_buckets=4)
    probe = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "iota eta unseen")],
        "doc_id long, text string",
    )
    assert _scores(spark, lm_dir, probe) == _scores(spark, retrained, probe)


def test_corpus_stream_lm_gate_rejects_disfluent_only(spark, tmp_path):
    """CCNet fluency gate (`corpus --lm-gate-dir/--lm-max-score`): docs
    scoring above the ceiling under the TARGET-DOMAIN model are rejected
    at admission (recorded under _lm_rejects, never entering any index);
    in-domain docs pass; a single-word doc (n_bigrams=0, null score) is
    KEPT — unmeasurable is not disfluent. The ceiling is calibrated in
    the test from the model's own scores, so the pin survives fixture
    edits. Replayed epochs converge; the dir/ceiling pair and a missing
    model fail at construction."""
    import pytest

    from substreams_sink_parquet_spark.sources.text_corpus import DOC_SCHEMA
    from substreams_sink_parquet_spark.streaming.corpus_stream import (
        CorpusSink,
        corpus_docs,
    )

    lm_dir = str(tmp_path / "target_lm")
    L.write_bigram_lm(_train(spark), lm_dir, n_buckets=4)

    with pytest.raises(ValueError, match="pair"):
        CorpusSink(spark=spark, out_dir=str(tmp_path / "c0"),
                   lm_gate_dir=lm_dir)
    with pytest.raises(ValueError, match="target-domain"):
        CorpusSink(spark=spark, out_dir=str(tmp_path / "c1"),
                   lm_gate_dir=str(tmp_path / "nowhere"),
                   lm_gate_max_score=5.0)

    fluent = "the quick brown fox jumps over the lazy dog"
    garbled = "zxq wvut plomb kraken verdigris xylophone snark blee"
    probe = spark.createDataFrame(
        [(0, fluent), (1, garbled)], "doc_id long, text string"
    )
    s = {r.doc_id: r.neg_avg_logprob
         for r in L.score_with_lm(spark, lm_dir, probe).collect()}
    assert s[0] < s[1]
    ceiling = (s[0] + s[1]) / 2  # between in-domain and OOV

    out = str(tmp_path / "corpus")
    sink = CorpusSink(spark=spark, out_dir=out, lm_gate_dir=lm_dir,
                      lm_gate_max_score=ceiling)

    def doc(i, text):
        return (i, text, "en", "web", len(text), None, None)

    b0 = spark.createDataFrame(
        [doc(1, fluent), doc(2, garbled), doc(3, "solo")], DOC_SCHEMA
    )
    sink.process_batch(b0, 0)
    sink.process_batch(b0, 0)  # crash replay converges
    admitted = sorted(
        r.doc_id for r in corpus_docs(spark, out).select("doc_id").collect()
    )
    assert admitted == [1, 3]  # fluent + unmeasurable kept, garbled gone
    rejects = spark.read.parquet(f"{out}/_lm_rejects/epoch=0").collect()
    assert [r.doc_id for r in rejects] == [2]
    assert rejects[0].neg_avg_logprob > ceiling
    # the garbled doc never entered the dedup index: a later IMPROVED
    # crawl of different fluent text with the same doc_id space admits
    b1 = spark.createDataFrame(
        [doc(4, "a calm river flows past the old stone bridge")], DOC_SCHEMA
    )
    sink.process_batch(b1, 1)
    admitted = sorted(
        r.doc_id for r in corpus_docs(spark, out).select("doc_id").collect()
    )
    assert admitted == [1, 3, 4]


def test_cli_lm_append_and_compact(spark, tmp_path, capsys):
    from substreams_sink_parquet_spark.cli import main

    base_p = str(tmp_path / "base.parquet")
    extra_p = str(tmp_path / "extra.parquet")
    _train(spark).write.parquet(base_p)
    _extra(spark).write.parquet(extra_p)
    lm_dir = str(tmp_path / "lm")
    assert main(["lm-train", lm_dir, "--docs", base_p]) == 0
    capsys.readouterr()
    assert main(["lm-append", lm_dir, "--docs", extra_p,
                 "--epoch", "0"]) == 0
    out = capsys.readouterr().out
    assert "lm-append OK" in out and "epochs=1" in out
    assert main(["lm-append", lm_dir, "--docs", extra_p,
                 "--epoch", "1"]) == 0
    capsys.readouterr()
    assert main(["lm-compact", lm_dir, "--min-epochs", "1"]) == 0
    assert "merged" in capsys.readouterr().out
    assert (tmp_path / "lm" / "epochs" / "epoch=-1").exists()


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


def test_writer_mutations_purge_vocab_memo(spark, tmp_path):
    """Every same-process writer mutation (rebuild / append / compact)
    purges the merged-vocab memo for its model dir — closing the stale
    hit where a rebuild plus a fresh-checkpoint epoch-id reset could
    reproduce the (base stats, epoch stats) key over different counts."""
    lm_dir = str(tmp_path / "lm")
    base, extra = _train(spark), _extra(spark)
    L.write_bigram_lm(base, lm_dir, n_buckets=4)
    L.append_epoch_to_bigram_lm(
        extra.filter(F.col("doc_id") < 300), lm_dir, epoch_id=0
    )
    from substreams_sink_parquet_spark.fsio import normalize_store_url

    key_dir = normalize_store_url(lm_dir)
    L.merged_lm_state(spark, lm_dir)
    assert any(k[0] == key_dir for k in L._VOCAB_MEMO)
    L.write_bigram_lm(base, lm_dir, n_buckets=4)
    assert not any(k[0] == key_dir for k in L._VOCAB_MEMO)
    L.append_epoch_to_bigram_lm(
        extra.filter(F.col("doc_id") < 300), lm_dir, epoch_id=0
    )
    L.merged_lm_state(spark, lm_dir)
    assert any(k[0] == key_dir for k in L._VOCAB_MEMO)
    L.append_epoch_to_bigram_lm(
        extra.filter(F.col("doc_id") >= 300), lm_dir, epoch_id=1
    )
    assert not any(k[0] == key_dir for k in L._VOCAB_MEMO)


def test_vocab_memo_misses_after_out_of_band_rebuild(spark, tmp_path):
    """Cross-process staleness is practically unreachable (ADVICE r10):
    the memo key carries the meta file's (bytes, mtime) stamp, so a
    rebuild + epoch replay that reproduces the ENTIRE logical key (same
    base stats, same epoch name, same epoch stats — exactly what
    retraining on the same corpus does) still misses a memo populated
    before the rebuild. Simulated by snapshotting the memo across the
    rebuild — a writer in another process cannot purge this process's
    memo, so its entries would survive exactly like the snapshot."""
    import time as _time

    lm_dir = str(tmp_path / "lm")
    base, extra = _train(spark), _extra(spark)
    L.write_bigram_lm(base, lm_dir, n_buckets=4)
    L.append_epoch_to_bigram_lm(
        extra.filter(F.col("doc_id") < 300), lm_dir, epoch_id=0
    )
    _, _, first = L.merged_lm_state(spark, lm_dir)
    snapshot = dict(L._VOCAB_MEMO)
    assert snapshot
    # out-of-band retrain on the SAME corpus + same epoch replay: every
    # logical key component converges to identical values; only the meta
    # file's stamp differs (the sleep clears local-FS mtime granularity)
    _time.sleep(0.02)
    L.write_bigram_lm(base, lm_dir, n_buckets=4)
    L.append_epoch_to_bigram_lm(
        extra.filter(F.col("doc_id") < 300), lm_dir, epoch_id=0
    )
    L._VOCAB_MEMO.clear()
    L._VOCAB_MEMO.update(snapshot)  # the other process's surviving memo
    sc = spark.sparkContext
    sc.setJobGroup("vocab-stamp-probe", "post-out-of-band-rebuild read")
    try:
        _, _, again = L.merged_lm_state(spark, lm_dir)
    finally:
        sc.setJobGroup("", "")
    # a memo HIT would have launched zero jobs (the memoized-read pin
    # above); the stamp forces a miss, so the vocab count job ran
    assert list(
        sc.statusTracker().getJobIdsForGroup("vocab-stamp-probe")
    ) != []
    assert again == first  # same corpus — same truth, freshly computed
