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


def test_temperature_rates_data_dependent(spark):
    rows = queries()["q_sample_temperature"](spark, SF).collect()
    assert rows, "at least one source"
    by_n = sorted(rows, key=lambda r: r["n_total"])
    for r in rows:
        assert 0 < r["threshold"] <= 1000
        assert 0 <= r["n_kept"] <= r["n_total"]
    # monotone: a bigger source never gets a higher keep rate
    for small, big in zip(by_n, by_n[1:]):
        assert small["threshold"] >= big["threshold"]
    # the largest source is downsampled below cap unless all sources are equal
    if by_n[0]["n_total"] != by_n[-1]["n_total"]:
        assert by_n[-1]["threshold"] < 1000


def test_shuffle_shards_dense_positions_and_deterministic(spark):
    q = queries()["q_shuffle_shards"]
    a = q(spark, SF).collect()
    docs_total = load(spark, SF, "documents").count()
    assert len(a) == docs_total  # every doc placed exactly once
    by_shard = {}
    for r in a:
        assert 0 <= r["shard_id"] < 64
        by_shard.setdefault(r["shard_id"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    b = q(spark, SF).collect()  # rerun: identical placement
    assert {(r["doc_id"], r["shard_id"], r["pos"]) for r in a} == {
        (r["doc_id"], r["shard_id"], r["pos"]) for r in b
    }


def test_quality_weighted_keep_rate_tracks_score(spark, sf_dir):
    """Keep probability equals the quality score, so the kept fraction in
    the top score quartile must exceed the bottom quartile's, and the
    decision must be partition-count invariant."""
    from substreams_sink_parquet_spark.llm.sampling import q_sample_quality_weighted

    df = q_sample_quality_weighted(spark, sf_dir)
    rows = df.collect()
    by_score = sorted(rows, key=lambda r: r.score4)
    q = len(rows) // 4
    lo = sum(r.kept for r in by_score[:q]) / q
    hi = sum(r.kept for r in by_score[-q:]) / q
    assert hi > lo
    again = {(r.doc_id, r.kept) for r in df.repartition(7).collect()}
    assert again == {(r.doc_id, r.kept) for r in rows}


def test_token_budget_is_prefix_of_quality_order_and_bounded(spark, sf_dir):
    """Within each source the selected set must be a PREFIX of the
    quality-descending order (once the budget trips, nothing later is
    selected) and its token sum must respect the 20k budget."""
    from collections import defaultdict

    from substreams_sink_parquet_spark.llm.sampling import q_sample_token_budget

    rows = q_sample_token_budget(spark, sf_dir).collect()
    per_src = defaultdict(list)
    for r in rows:
        per_src[r.source].append(r)
    assert per_src
    for src, rs in per_src.items():
        rs.sort(key=lambda r: r.cum_tokens)
        flags = [r.selected for r in rs]
        assert flags == sorted(flags, reverse=True), src  # prefix property
        assert sum(r.n_tokens for r in rs if r.selected) <= 20000, src


def test_dsir_prefers_target_like_raw_docs_and_is_deterministic(spark):
    """DSIR semantics on planted domains: a raw document written in the
    TARGET slice's vocabulary must out-score a raw document from a
    different domain; dsir_select(k=1) picks it; the draw is identical
    across repeated runs (hash-derived Gumbel, no RNG state)."""
    from pyspark.sql import functions as F

    from substreams_sink_parquet_spark.llm.sampling import (
        dsir_logweights,
        dsir_select,
    )

    medical = "patient dose trial symptom clinical therapy diagnosis"
    legal = "court statute plaintiff ruling appeal verdict contract"
    docs = spark.createDataFrame(
        [
            (1, "t", medical + " cohort outcome relapse"),
            (2, "t", "clinical trial dose patient symptom therapy outcome"),
            (3, "r", medical + " treatment efficacy"),   # target-like raw
            (4, "r", legal + " litigation clause"),      # off-domain raw
            (5, "r", legal + " hearing docket motion"),
        ],
        "doc_id long, grp string, text string",
    )
    is_t = F.col("grp") == "t"
    lw = {r.doc_id: r.dsir_logw for r in dsir_logweights(docs, is_t).collect()}
    assert lw[3] > lw[4] and lw[3] > lw[5]
    pick = [r.doc_id for r in dsir_select(docs, is_t, k=1, temperature=0.1).collect()]
    assert pick == [3]
    again = [r.doc_id for r in dsir_select(docs, is_t, k=1, temperature=0.1).collect()]
    assert pick == again
    # select never returns target rows, k bounds the output
    sel = dsir_select(docs, is_t, k=10).collect()
    assert {r.doc_id for r in sel} <= {3, 4, 5}
    # a NULL predicate (doc 6's grp is NULL) means NOT-target: the doc
    # must stay in the candidate pool, not vanish under three-valued logic
    with_null = docs.union(
        spark.createDataFrame(
            [(6, None, "patient clinical dose therapy trial entry")],
            "doc_id long, grp string, text string",
        )
    )
    sel2 = {r.doc_id for r in dsir_select(with_null, F.col("grp") == "t", k=10).collect()}
    assert 6 in sel2 and sel2 <= {3, 4, 5, 6}


def test_dsir_staging_dir_matches_persisted_and_reads_staged_table(
    spark, tmp_path
):
    """The 100 TB mode: ``staging_dir=`` materializes the hashed feature
    arrays to the lake and both fit and score read THAT table. Outputs
    must be identical to in-catalog (persist) mode, the staged parquet
    must actually exist, and the scoring plan must scan the staged table
    — not recompute features from the raw corpus (VERDICT r5, Next #4)."""
    import os

    from pyspark.sql import functions as F

    from substreams_sink_parquet_spark.llm.sampling import dsir_logweights

    docs = spark.createDataFrame(
        [
            (i, "t" if i % 3 == 0 else "r",
             f"alpha beta gamma{i % 5} delta epsilon{i % 7} zeta")
            for i in range(40)
        ],
        "doc_id long, grp string, text string",
    )
    is_t = F.col("grp") == "t"
    staged_dir = str(tmp_path / "dsir_feats")
    spark.catalog.clearCache()  # isolate: no cross-test cached features
    staged = dsir_logweights(docs, is_t, staging_dir=staged_dir)
    # scoring reads the staged table, not the raw corpus twice
    assert all(staged_dir in f for f in staged.inputFiles()), staged.inputFiles()
    assert any(f.endswith(".parquet") for f in os.listdir(staged_dir))
    plan = staged._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" not in plan  # no executor cache pinned
    got_staged = {r.doc_id: (r.is_target, r.n_features, r.dsir_logw)
                  for r in staged.collect()}
    got_persist = {r.doc_id: (r.is_target, r.n_features, r.dsir_logw)
                   for r in dsir_logweights(docs, is_t).collect()}
    spark.catalog.clearCache()  # release the persist-mode feature cache
    assert got_staged == got_persist
    assert len(got_staged) == 40


def test_cluster_balanced_sample_contract(spark, sf_dir):
    """Exact-cap semantics, determinism, and the rebalancing effect:
    (1) pure function of (id, cell) — identical under a hostile
    repartition; (2) saturated cells keep exactly the cap, undersized
    keep all; (3) the kept set's max cell share is <= the input's (the
    point of the pass); (4) identical planted vectors co-locate."""
    from pyspark.sql import functions as F

    from substreams_sink_parquet_spark.llm.sampling import (
        cluster_balanced_sample,
    )
    from substreams_sink_parquet_spark.tables import load

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cap = 5
    a = cluster_balanced_sample(emb, n_centroids=4, per_cell_cap=cap)
    b = cluster_balanced_sample(
        emb.repartition(7), n_centroids=4, per_cell_cap=cap
    )
    key = lambda r: (r.vec_id, r.cent_id, r.cell_rank, r.kept)
    rows_a = sorted(map(key, a.collect()))
    assert rows_a == sorted(map(key, b.collect()))

    per_cell = {}
    for r in rows_a:
        per_cell.setdefault(r[1], []).append(r)
    n_in = len(rows_a)
    kept_cells = {}
    for cid, rows in per_cell.items():
        n_kept = sum(1 for r in rows if r[3])
        assert n_kept == min(len(rows), cap)
        # ranks dense 1..n within the cell
        assert sorted(r[2] for r in rows) == list(range(1, len(rows) + 1))
        kept_cells[cid] = n_kept
    n_kept_total = sum(kept_cells.values())
    max_share_in = max(len(v) for v in per_cell.values()) / n_in
    max_share_out = max(kept_cells.values()) / n_kept_total
    assert max_share_out <= max_share_in + 1e-12

    # identical vectors co-locate through the trained quantizer
    planted = emb.filter(F.col("vec_id") == 1).select(
        F.explode(F.sequence(F.lit(20000), F.lit(20009))).alias("vec_id"),
        "embedding",
    )
    res = cluster_balanced_sample(
        emb.unionByName(planted), n_centroids=4, per_cell_cap=cap
    )
    cells = (
        res.filter(F.col("vec_id") >= 20000)
        .select("cent_id").distinct().count()
    )
    assert cells == 1

    # cap larger than every cell: everything kept
    all_kept = cluster_balanced_sample(
        emb, n_centroids=4, per_cell_cap=10**9
    )
    assert all_kept.filter(~F.col("kept")).count() == 0


def test_mixture_plan_quotas_upsampling_and_determinism(spark, sf_dir):
    """Mixture semantics: per-group emitted tokens land within one doc of
    the quota (greedy whole-doc prefix); a group whose quota exceeds its
    inventory upsamples (n_copies >= 1 for EVERY doc, full epochs
    unchanged under a new seed); a group under quota downsamples;
    unweighted groups are absent; assignment is repartition-invariant."""
    from pyspark.sql import functions as F

    from substreams_sink_parquet_spark.llm.sampling import mixture_plan
    from substreams_sink_parquet_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    weights = {"en": 0.6, "fr": 0.1}
    budget = 20_000
    res = mixture_plan(docs, weights, budget).collect()
    assert {r.grp for r in res} == {"en", "fr"}  # zh/es/de dropped

    inv = {g: sum(r.n_tokens for r in res if r.grp == g)
           for g in ("en", "fr")}
    for g in ("en", "fr"):
        quota = int(budget * weights[g])
        rows = [r for r in res if r.grp == g]
        emitted = sum(r.n_tokens * r.n_copies for r in rows)
        max_doc = max(r.n_tokens for r in rows)
        assert emitted <= quota < emitted + max_doc + 1
        if quota > inv[g]:  # upsampled: every doc appears at least once
            assert min(r.n_copies for r in rows) >= 1
        else:  # downsampled: some docs dropped, none repeated
            assert max(r.n_copies for r in rows) == 1
            assert any(r.n_copies == 0 for r in rows)

    # repartition invariance
    res2 = mixture_plan(docs.repartition(7), weights, budget).collect()
    key = lambda rs: sorted((r.doc_id, r.grp, r.n_copies) for r in rs)
    assert key(res) == key(res2)

    # a new seed re-draws the fractional prefix only: full-epoch floor
    # identical, per-doc copies move by at most 1
    res3 = mixture_plan(docs, weights, budget, seed=7).collect()
    c1 = {r.doc_id: r.n_copies for r in res}
    c3 = {r.doc_id: r.n_copies for r in res3}
    assert set(c1) == set(c3)
    assert all(abs(c1[d] - c3[d]) <= 1 for d in c1)
    assert any(c1[d] != c3[d] for d in c1)


def test_materialize_mixture_explodes_copies_for_export(spark, sf_dir):
    """Copy materialization: row count == sum(n_copies); mix_ids are
    unique and reversible (doc_id = mix_id // stride, copy = mix_id %
    stride); the guard refuses a stride the copy count would collide;
    the result exports cleanly with per-copy stable positions."""
    import pytest
    from pyspark.sql import functions as F

    from substreams_sink_parquet_spark.llm.export import (
        plan_pretrain_export,
    )
    from substreams_sink_parquet_spark.llm.sampling import (
        materialize_mixture, mixture_plan,
    )
    from substreams_sink_parquet_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    plan = mixture_plan(docs, {"en": 0.9, "fr": 0.05}, 30_000)
    rows = materialize_mixture(docs, plan).collect()
    want = sum(r.n_copies for r in plan.collect())
    assert len(rows) == want > 0
    ids = [r.mix_id for r in rows]
    assert len(set(ids)) == len(ids)
    assert all(r.mix_id == r.doc_id * 4096 + r.copy for r in rows)

    with pytest.raises(ValueError, match="stride"):
        materialize_mixture(docs, plan, stride=1)

    mat = materialize_mixture(docs, plan)
    exported = plan_pretrain_export(
        mat, context_len=256, n_shards=2, id_col="mix_id"
    )
    assert exported.count() == want  # every copy got its own (shard, pos)


def test_mixture_plan_refuses_nonsense_inputs(spark, sf_dir):
    import pytest

    from substreams_sink_parquet_spark.llm.sampling import mixture_plan
    from substreams_sink_parquet_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="budget_tokens"):
        mixture_plan(docs, {"en": 0.5}, 0)
    with pytest.raises(ValueError, match="non-positive"):
        mixture_plan(docs, {"en": -0.5}, 100)
    with pytest.raises(ValueError, match="non-positive"):
        mixture_plan(docs, {"en": 0.0}, 100)


def test_universal_hash_survives_full_range_ids(spark):
    """ADVICE r9 (high): real corpus doc_ids are xxhash64 digests of
    WARC record ids — full-range signed longs. Every universal-hash
    consumer (uhash itself, the split label, the export's shard
    assignment) must neither ARITHMETIC_OVERFLOW under ANSI nor emit
    negative buckets/shards for them."""
    from pyspark.sql import functions as F

    from substreams_sink_parquet_spark.llm.export import plan_pretrain_export
    from substreams_sink_parquet_spark.llm.sampling import _M, split_col, uhash

    ids = [(-(1 << 62) - 12_345, "a b c"), ((1 << 62) + 987, "d e"),
           (-1, "x y z"), (0, "lone"), ((1 << 63) - 1, "m n"),
           (-(1 << 63), "k l m n")]
    docs = spark.createDataFrame(ids, "doc_id long, text string")
    hashed = docs.select(
        uhash(F.col("doc_id")).alias("h"),
        split_col(F.col("doc_id")).alias("s"),
    ).collect()
    assert all(0 <= r.h < _M for r in hashed)
    assert all(r.s in ("train", "val", "test") for r in hashed)

    exported = plan_pretrain_export(docs, context_len=4, n_shards=8).collect()
    assert len(exported) == len(ids)
    assert all(0 <= r.shard_id < 8 for r in exported)
    assert all(r.pos >= 1 for r in exported)


def test_materialize_mixture_refuses_hash_range_ids_in_arith_mode(spark):
    """ADVICE r9 (medium): mix_id = doc_id*stride+copy overflows int64
    for hash-range doc_ids — the arith guard must refuse LOUDLY before
    the export crashes mid-write, and id_strategy='hash' must carry the
    same corpus through with unique in-range mix_ids."""
    import pytest
    from pyspark.sql import functions as F

    from substreams_sink_parquet_spark.llm.export import plan_pretrain_export
    from substreams_sink_parquet_spark.llm.sampling import (
        materialize_mixture, mixture_plan,
    )

    docs = spark.createDataFrame(
        [((1 << 62) + i if i % 2 else -(1 << 62) - i, "en",
          f"tok{i} " * 6) for i in range(6)],
        "doc_id long, lang string, text string",
    )
    plan = mixture_plan(docs, {"en": 1.0}, 200)
    with pytest.raises(ValueError, match="hash"):
        materialize_mixture(docs, plan)

    mat = materialize_mixture(docs, plan, id_strategy="hash")
    rows = mat.collect()
    want = sum(r.n_copies for r in plan.collect())
    assert len(rows) == want > 0
    ids = [r.mix_id for r in rows]
    assert len(set(ids)) == len(ids)
    assert all(0 <= i < (1 << 62) for i in ids)
    # and the composed export path the mix feeds is safe end to end
    exported = plan_pretrain_export(
        mat, context_len=8, n_shards=4, id_col="mix_id"
    )
    assert exported.count() == want

    with pytest.raises(ValueError, match="id_strategy"):
        materialize_mixture(docs, plan, id_strategy="bogus")


def test_salted_running_sum_equals_unsalted_hash_order(spark):
    """The two-phase (salted) running sum is a pure plan-shape change:
    on a deliberately skewed synthetic (one group holds ~80% of rows) it
    must reproduce Window.partitionBy(group)'s values ROW FOR ROW, and
    the group_total_col rider must equal the separate group aggregate."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from substreams_sink_parquet_spark.llm.sampling import (
        _hex_prefix_bucket, salted_running_sum,
    )

    df = (
        spark.range(3000)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 10 < 8, "en")
            .when(F.col("id") % 10 == 8, "fr").otherwise("de").alias("grp"),
            (F.col("id") * 7 % 13 + 1).alias("val"),
            F.md5(F.col("id").cast("string")).alias("sort_key"),
        )
    )
    w = (
        Window.partitionBy("grp").orderBy("sort_key")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        r.doc_id: r.cum
        for r in df.withColumn("cum", F.sum("val").over(w)).collect()
    }
    got_rows = salted_running_sum(
        df, ["grp"], ["sort_key"], "val",
        _hex_prefix_bucket(F.col("sort_key")),
        group_total_col="grp_total",
    ).collect()
    assert {r.doc_id: r.cum for r in got_rows} == want
    tot = {
        r.grp: r.t
        for r in df.groupBy("grp").agg(F.sum("val").alias("t")).collect()
    }
    assert all(r.grp_total == tot[r.grp] for r in got_rows)


def test_pack_sequences_salted_equals_unsalted_on_hash_range_ids(spark):
    """The packing order is doc_id ASC, salted via score = -double(doc_id)
    (long->double is monotone but LOSSY near 2^63): with full-range
    xxhash-style ids that COLLIDE as doubles, the bucket boundary's exact
    long tie-break must keep the decomposition equal to the plain
    Window.partitionBy(source) form row for row."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from substreams_sink_parquet_spark.llm.sampling import (
        ranked_order_buckets, salted_running_sum,
    )

    # ids clustered tightly near 2^62 so consecutive longs map to the
    # same double, plus a skewed 85/15 source split
    df = (
        spark.range(2000)
        .select(
            (F.lit(1 << 62) + F.col("id")).alias("doc_id"),
            F.when(F.col("id") % 20 < 17, "web").otherwise("books")
            .alias("source"),
            (F.col("id") % 9 + 1).alias("n_tokens"),
        )
    )
    w = (
        Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        r.doc_id: r.cum
        for r in df.withColumn("cum", F.sum("n_tokens").over(w)).collect()
    }
    scored = df.withColumn("score", -F.col("doc_id").cast("double"))
    bucketed = ranked_order_buckets(scored, "source", n_buckets=16)
    got = salted_running_sum(
        bucketed, ["source"], [F.col("doc_id")], "n_tokens",
        F.col("_salt_bucket"),
    ).collect()
    assert {r.doc_id: r.cum for r in got} == want


def test_salted_running_sum_equals_unsalted_semantic_order(spark):
    """Same pin for the boundary-bucketed form that salts a SEMANTIC
    (score DESC, id ASC) order — with heavy score TIES, so boundary rows
    and ties straddling bucket edges are exercised: the sharp edge of
    the order-contiguity argument."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from substreams_sink_parquet_spark.llm.sampling import (
        ranked_order_buckets, salted_running_sum,
    )

    df = (
        spark.range(2500)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 8 < 7, "web").otherwise("books")
            .alias("source"),
            (F.col("id") % 11 + 1).alias("n_tokens"),
            # only 5 distinct scores: every bucket boundary lands on a tie
            ((F.col("id") % 5).cast("double") / 10).alias("score"),
        )
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        r.doc_id: r.cum
        for r in df.withColumn("cum", F.sum("n_tokens").over(w)).collect()
    }
    bucketed = ranked_order_buckets(df, "source", n_buckets=16)
    got = salted_running_sum(
        bucketed, ["source"], [F.col("score").desc(), F.col("doc_id")],
        "n_tokens", F.col("_salt_bucket"),
    ).collect()
    assert {r.doc_id: r.cum for r in got} == want
    # and the salting actually split the dominant group's sort: >1 bucket
    n_buckets_used = len({
        r._salt_bucket
        for r in bucketed.filter(F.col("source") == "web")
        .select("_salt_bucket").distinct().collect()
    })
    assert n_buckets_used > 1


def test_ranked_order_buckets_single_job(spark):
    """The boundary sample costs exactly ONE Spark job (VERDICT r9,
    Wrong #1: the pre-r10 form spent two full driver actions — a
    per-group counts collect, then a boundary-key collect — i.e. two
    extra corpus scans per token-budget / packing call). Pinned via a
    job group so a regression to a second action fails here."""
    from pyspark.sql import functions as F

    from substreams_sink_parquet_spark.llm.sampling import (
        ranked_order_buckets,
    )

    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 4 < 3, "web").otherwise("books")
        .alias("source"),
        (F.col("id") % 7).cast("double").alias("score"),
    )
    sc = spark.sparkContext
    # control: ONE aggregate-collect action over the same frame — under
    # AQE a single action surfaces as one job per query stage, so the pin
    # is "same job count as one action", not a literal 1
    sc.setJobGroup("rob-control", "one aggregate action")
    try:
        df.groupBy("source").count().collect()
    finally:
        sc.setJobGroup("", "")
    control = len(sc.statusTracker().getJobIdsForGroup("rob-control"))
    sc.setJobGroup("rob-single-job", "ranked_order_buckets driver actions")
    try:
        bucketed = ranked_order_buckets(df, "source", n_buckets=8)
    finally:
        sc.setJobGroup("", "")
    jobs = sc.statusTracker().getJobIdsForGroup("rob-single-job")
    assert len(jobs) == control, (
        f"expected one driver action ({control} jobs under AQE), got {jobs}"
    )
    # and the bucketing it produced is still real (order-contiguous split)
    assert bucketed.filter(F.col("source") == "web").select(
        "_salt_bucket"
    ).distinct().count() > 1


def test_ranked_order_buckets_null_scores_keep_monotone_order(spark):
    """Null scores sort LAST under (score DESC, id ASC) — Spark's desc
    default — but they are excluded from boundary candidates and the
    boundary-membership predicate evaluates null against them, which
    used to drop every null-score row into bucket 0: order-contiguity
    silently broken on exactly the rows the DESC order puts last
    (ADVICE r10). Pinned: null-score rows land in the LAST bucket, and
    salted == unsalted row for row on a frame containing nulls."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from substreams_sink_parquet_spark.llm.sampling import (
        ranked_order_buckets, salted_running_sum,
    )

    df = (
        spark.range(2000)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 8 < 7, "web").otherwise("books")
            .alias("source"),
            (F.col("id") % 11 + 1).alias("n_tokens"),
            # every 9th row: null score (e.g. an unmeasurable doc)
            F.when(F.col("id") % 9 == 0, F.lit(None).cast("double"))
            .otherwise((F.col("id") % 5).cast("double") / 10)
            .alias("score"),
        )
        # plus a group whose scores are ALL null: boundaries empty,
        # every row must land in (the only) bucket 0
        .unionByName(
            spark.range(2000, 2050).select(
                F.col("id").alias("doc_id"),
                F.lit("nulls").alias("source"),
                (F.col("id") % 11 + 1).alias("n_tokens"),
                F.lit(None).cast("double").alias("score"),
            )
        )
    )
    bucketed = ranked_order_buckets(df, "source", n_buckets=16)
    per_row = {
        r.doc_id: (r.source, r.score, r._salt_bucket)
        for r in bucketed.collect()
    }
    assert {b for _, (s, _, b) in per_row.items() if s == "nulls"} == {0}
    for src in ("web", "books"):
        null_buckets = {b for _, (s, sc, b) in per_row.items()
                        if s == src and sc is None}
        scored_buckets = {b for _, (s, sc, b) in per_row.items()
                          if s == src and sc is not None}
        assert len(null_buckets) == 1, (src, null_buckets)
        assert min(null_buckets) >= max(scored_buckets), (src, per_row)
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        r.doc_id: r.cum
        for r in df.withColumn("cum", F.sum("n_tokens").over(w)).collect()
    }
    got = salted_running_sum(
        bucketed, ["source"], [F.col("score").desc(), F.col("doc_id")],
        "n_tokens", F.col("_salt_bucket"),
    ).collect()
    assert {r.doc_id: r.cum for r in got} == want


def test_salted_running_sum_keeps_null_group_rows(spark):
    """NULL group keys form an ordinary window partition (a missing
    'source' on an ingested corpus is NULL by design), but the old
    name-list equi-join against the bucket-offset broadcast never
    matches NULL — silently dropping every row of the null-keyed group
    and violating the 'identical to Window.partitionBy, row for row'
    contract (code review r11). Null-safe (<=>) join keys fix it."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from substreams_sink_parquet_spark.llm.sampling import (
        ranked_order_buckets, salted_running_sum,
    )

    df = spark.range(600).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, F.lit(None).cast("string"))
        .otherwise(F.lit("web")).alias("source"),
        (F.col("id") % 7 + 1).alias("n_tokens"),
        (F.col("id") % 5).cast("double").alias("score"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = {
        r.doc_id: r.cum
        for r in df.withColumn("cum", F.sum("n_tokens").over(w)).collect()
    }
    bucketed = ranked_order_buckets(df, "source", n_buckets=8)
    got = salted_running_sum(
        bucketed, ["source"], [F.col("score").desc(), F.col("doc_id")],
        "n_tokens", F.col("_salt_bucket"),
    ).collect()
    assert len(got) == 600  # no silent drop of the null group
    assert {r.doc_id: r.cum for r in got} == want


def test_materialize_mixture_arith_guard_handles_int64_min(spark):
    """doc_id = -2^63 is in-range for the hash-range ids the arith guard
    exists to refuse, but F.abs(-2^63) itself overflows under ANSI — the
    guard must raise its DESCRIPTIVE error, not ARITHMETIC_OVERFLOW."""
    import pytest

    from substreams_sink_parquet_spark.llm.sampling import (
        materialize_mixture, mixture_plan,
    )

    docs = spark.createDataFrame(
        [(-(1 << 63), "en", "tok " * 6), (5, "en", "tok " * 6)],
        "doc_id long, lang string, text string",
    )
    plan = mixture_plan(docs, {"en": 1.0}, 100)
    with pytest.raises(ValueError, match="id_strategy='hash'"):
        materialize_mixture(docs, plan)
