"""Property-based checks of the LLM-op primitives against pure-Python
references: the Spark expressions must compute the mathematically defined
quantity on arbitrary inputs, not just on fixture shapes.

One Spark round-trip per hypothesis example is expensive — examples are
capped low; each example batches many documents so the coverage stays wide.
"""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from substreams_sink_parquet_spark.llm.dedup import jaccard_pairs, shingle_array

WORD = st.text(alphabet="abcdef", min_size=1, max_size=4)
DOC = st.lists(WORD, min_size=0, max_size=12).map(" ".join)


def _py_shingles(text: str, n: int = 3) -> set[str]:
    w = text.split(" ")
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)} if len(w) >= n else set()


@settings(max_examples=5, deadline=None)
@given(st.lists(DOC, min_size=1, max_size=20))
def test_shingle_array_matches_python_reference(spark, docs):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r.doc_id: set(r.sh)
        for r in df.select("doc_id", shingle_array("text", 3).alias("sh")).collect()
    }
    for i, d in enumerate(docs):
        assert got[i] == _py_shingles(d), (i, d)


@settings(max_examples=3, deadline=None)
@given(st.lists(DOC, min_size=2, max_size=12))
def test_jaccard_pairs_match_python_reference(spark, docs):
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(df, n=3, threshold=0.3).collect()
    }
    sh = {i: _py_shingles(d) for i, d in enumerate(docs)}
    want = {}
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            inter = len(sh[a] & sh[b])
            union = len(sh[a] | sh[b])
            if union and inter / union >= 0.3:
                want[(a, b)] = inter / union
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12


def test_incremental_dedup_rejects_seen_and_in_batch_dups(spark):
    from pyspark.sql import functions as F

    from substreams_sink_parquet_spark.llm.dedup import incremental_dedup

    batch = spark.createDataFrame(
        [(10, "alpha"), (11, "alpha"),      # in-batch dup: 10 keeps
         (12, "seen before"),               # already in corpus: rejected
         (13, "brand new")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [("seen before",), ("other doc",)], "text string"
    ).select(F.md5("text").alias("text_hash"))
    got = {r.doc_id for r in incremental_dedup(batch, corpus).collect()}
    assert got == {10, 13}


def test_decontaminate_flags_planted_ngram_overlap(spark):
    from substreams_sink_parquet_spark.llm.dedup import decontaminate

    shared = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 words
    train = spark.createDataFrame(
        [
            (1, f"prefix words here {shared} and a suffix tail"),
            (2, "totally unrelated content with no overlap at all whatsoever"),
            (3, "short"),  # < 8 words: must not error, must not match
        ],
        "doc_id long, text string",
    )
    eval_set = spark.createDataFrame(
        [(100, f"the benchmark says {shared} verbatim today")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in decontaminate(train, eval_set, n=8).collect()}
    assert set(rows) == {1}
    assert rows[1]["n_grams_hit"] == 1
    assert rows[1]["n_eval_docs"] == 1
    # broadcast plan: the eval index must never shuffle the corpus by gram
    plan = decontaminate(train, eval_set, n=8)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_chunking_covers_every_char_with_overlap(spark):
    from substreams_sink_parquet_spark.catalog import queries
    from substreams_sink_parquet_spark.tables import load

    SF = "/root/testdata/sf0.001"
    chunks = queries()["q_text_chunk"](spark, SF)
    docs = load(spark, SF, "documents")
    agg = (
        chunks.groupBy("doc_id")
        .agg(
            F.max("chunk_id").alias("last_id"),
            F.count("*").alias("n_chunks"),
            F.min("chunk_chars").alias("min_chars"),
        )
        .join(docs.select("doc_id", "n_chars"), "doc_id")
        .collect()
    )
    assert len(agg) == docs.count()
    for r in agg:
        assert r["n_chunks"] == r["last_id"] + 1  # dense ids from 0
        # coverage: the last window's start + its length reaches the end
        last_start = r["last_id"] * 160
        assert last_start < max(r["n_chars"], 1)
        assert last_start + 200 >= r["n_chars"]  # window spans to the end
        assert r["min_chars"] >= 1  # no empty chunks emitted


def test_bigram_lm_score_ranks_common_phrasing_as_fluent(spark):
    from substreams_sink_parquet_spark.llm.text import bigram_lm_score

    common = "the cat sat on the mat"
    docs = spark.createDataFrame(
        [(i, common) for i in range(1, 10)]
        + [(10, "mat the on sat cat the")]  # same vocabulary, scrambled order
        + [(11, "x")],  # single word: no bigrams, excluded
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in bigram_lm_score(docs).collect()}
    assert 11 not in rows
    assert set(rows) == set(range(1, 11))
    # repeated corpus phrasing is high-probability => low neg-logprob
    assert rows[1]["neg_avg_logprob"] < rows[10]["neg_avg_logprob"]
    assert rows[1]["n_bigrams"] == 5
    # identical docs score identically (determinism across partitions)
    assert rows[1]["neg_avg_logprob"] == rows[9]["neg_avg_logprob"]


def test_decontaminate_empty_eval_set_flags_nothing(spark):
    from substreams_sink_parquet_spark.llm.dedup import decontaminate

    train = spark.createDataFrame(
        [(1, "eight words are needed here for one gram")],
        "doc_id long, text string",
    )
    eval_set = spark.createDataFrame([], "doc_id long, text string")
    assert decontaminate(train, eval_set, n=8).count() == 0


def _cc_star_both_paths(spark, pairs, max_iter):
    """Run cc_star through BOTH strategies — the driver-side union-find
    local solve (default threshold) and the distributed star-contraction
    rounds (local_threshold=0) — and pin that they agree exactly."""
    from substreams_sink_parquet_spark.llm.dedup import cc_star

    local = {r.doc_id: r.canonical for r in cc_star(pairs, max_iter=max_iter).collect()}
    dist = {
        r.doc_id: r.canonical
        for r in cc_star(pairs, max_iter=max_iter, local_threshold=0).collect()
    }
    assert local == dist
    return local


def test_cc_star_collapses_deep_chain_in_log_rounds(spark):
    """A 200-link chain needs ~200 min-label rounds but O(log n) star
    rounds; max_iter=10 must already reach the exact fixpoint — on the
    DISTRIBUTED path (local_threshold=0), with the local solve agreeing."""
    got = _cc_star_both_paths(
        spark,
        spark.createDataFrame(
            [(i, i + 1) for i in range(200)], "doc_a long, doc_b long"
        ),
        max_iter=10,
    )
    assert got == {i: 0 for i in range(201)}


def test_cc_star_matches_min_label_propagation(spark):
    """Both component algorithms must agree on a multi-component graph with
    shared-min collisions, stars, and singleton-free contract."""
    from substreams_sink_parquet_spark.llm.dedup import cc_star, dedup_clusters

    edges = [
        (1, 2), (2, 3), (3, 4),          # path
        (10, 11), (10, 12), (10, 13),    # star centered on the min
        (20, 21), (22, 21), (22, 23),    # zigzag
        (30, 31),                        # isolated pair
        (41, 40), (40, 42), (43, 42),    # min in the middle
    ]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    a = _cc_star_both_paths(spark, pairs, max_iter=10)
    b = {r.doc_id: r.canonical for r in dedup_clusters(pairs).collect()}
    b_dist = {
        r.doc_id: r.canonical
        for r in dedup_clusters(pairs, local_threshold=0).collect()
    }
    assert a == b == b_dist
    assert a[4] == 1 and a[13] == 10 and a[23] == 20 and a[43] == 40


def test_cc_star_matches_min_label_on_random_graphs(spark):
    """Deterministic random graphs (fixed seeds): both component algorithms
    and a pure-Python union-find must agree exactly."""
    import random

    from substreams_sink_parquet_spark.llm.dedup import cc_star, dedup_clusters

    def unionfind(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # canonical = component min
        return {n: find(n) for n in parent}

    for seed in (7, 99):
        rng = random.Random(seed)
        n = 60
        edges = sorted({
            tuple(sorted(rng.sample(range(n), 2)))
            for _ in range(rng.randint(20, 45))
        })
        expect = unionfind([list(e) for e in edges])
        pairs = spark.createDataFrame(
            [(a, b) for a, b in edges], "doc_a long, doc_b long"
        )
        star = _cc_star_both_paths(spark, pairs, max_iter=15)
        minl = {
            r.doc_id: r.canonical
            for r in dedup_clusters(pairs, local_threshold=0).collect()
        }  # distributed min-label path
        assert star == expect, f"seed={seed}"
        assert minl == expect, f"seed={seed}"


def test_cc_star_and_min_label_agree_on_self_pairs(spark):
    """A doc whose ONLY pair is a self-pair (doc_a == doc_b) must label
    itself in BOTH algorithms — the shared output contract ('every doc in
    >= 1 pair'), previously violated by cc_star's u != v filter."""
    from substreams_sink_parquet_spark.llm.dedup import cc_star, dedup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (5, 5), (2, 2)], "doc_a long, doc_b long"
    )
    a = _cc_star_both_paths(spark, pairs, max_iter=10)
    b = {r.doc_id: r.canonical for r in dedup_clusters(pairs).collect()}
    assert a == b == {1: 1, 2: 1, 5: 5}
    # degenerate graph: ONLY self-pairs, no proper edge at all
    only_selfs = spark.createDataFrame([(7, 7), (9, 9)], "doc_a long, doc_b long")
    a2 = {r.doc_id: r.canonical for r in cc_star(only_selfs, max_iter=5).collect()}
    b2 = {r.doc_id: r.canonical for r in dedup_clusters(only_selfs).collect()}
    assert a2 == b2 == {7: 7, 9: 9}


def test_jaccard_hot_shingle_expansion_is_row_bounded(spark):
    """Plant ONE shingle shared by 1000 docs (the max_doc_freq guard
    boundary): the chunked expansion must never materialize more than
    _PAIR_CHUNK * (guard - 1) pair structs in any single row — the
    flattened form would build ~guard²/2 ≈ 500k structs in one task
    buffer. A small shingle (<= one chunk) must stay a single row, the
    unchanged fast path."""
    import math

    from pyspark.sql import functions as F

    from substreams_sink_parquet_spark.llm.dedup import (
        _PAIR_CHUNK,
        _anchored_pair_arrays,
    )

    def widths(n_docs):
        groups = spark.range(1).select(
            F.lit("hot shingle text").alias("shingle"),
            F.array_sort(
                F.transform(
                    F.sequence(F.lit(0), F.lit(n_docs - 1)),
                    lambda i: i.cast("long"),
                )
            ).alias("ds"),
        )
        return _anchored_pair_arrays(groups).select(
            F.size("pair_arr").alias("w")
        ).agg(
            F.max("w").alias("mx"), F.sum("w").alias("total"),
            F.count("*").alias("rows"),
        ).first()

    n_docs = 1000
    hot = widths(n_docs)
    assert hot.mx <= _PAIR_CHUNK * (n_docs - 1)       # per-row buffer bound
    assert hot.rows == math.ceil(n_docs / _PAIR_CHUNK)
    assert hot.total == n_docs * (n_docs - 1) // 2    # all pairs still emitted
    cold = widths(10)
    assert cold.rows == 1                              # small => one row
    assert cold.total == cold.mx == 45


def test_jaccard_pairs_unchanged_by_chunked_expansion(spark):
    """The chunked expansion is a pure plan-shape change: pair set and
    jaccard values must match the direct python reference on a corpus with
    a planted hot shingle shared by every doc."""
    import itertools

    from substreams_sink_parquet_spark.llm.dedup import jaccard_pairs

    texts = [
        (i, "common anchor phrase " + " ".join(f"w{i}_{j}" for j in range(i % 4 + 2)))
        for i in range(12)
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")

    def shingles(t, n=3):
        ws = t.split(" ")
        return {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}

    expect = {}
    sh = {i: shingles(t) for i, t in texts}
    for a, b in itertools.combinations(sorted(sh), 2):
        inter = len(sh[a] & sh[b])
        if inter:
            j = inter / len(sh[a] | sh[b])
            if j >= 0.3:
                expect[(a, b)] = round(j, 9)
    got = {
        (r.doc_a, r.doc_b): round(r.jaccard, 9)
        for r in jaccard_pairs(df, n=3, threshold=0.3).collect()
    }
    assert got == expect


def test_greedy_reject_matches_sequential_simulation():
    """_greedy_reject must equal brute-force sequential admission (docs
    arrive one per batch in ascending id; each is rejected iff it
    near-dups an already-ADMITTED doc) on random pair graphs."""
    import random

    from substreams_sink_parquet_spark.llm.dedup import _greedy_reject

    for seed in range(25):
        rng = random.Random(seed)
        n = rng.randint(2, 30)
        ids = sorted(rng.sample(range(100), n))
        pairs = set()
        for _ in range(rng.randint(0, 40)):
            a, b = rng.sample(ids, 2)
            pairs.add((max(a, b), min(a, b)))
        # sequential simulation
        admitted: set = set()
        for d in ids:
            lower_admitted_dup = any(
                (d, lo) in pairs for lo in admitted if lo < d
            )
            if not lower_admitted_dup:
                admitted.add(d)
        expect_rejected = set(ids) - admitted
        assert _greedy_reject(pairs) == expect_rejected, f"seed={seed}"


def test_substring_span_removal_cuts_planted_boilerplate(spark):
    """ExactSubstr end-to-end on planted data: a shared 10-word license
    header recurring in two docs is detected as ONE merged span in each
    (overlapping 8-gram hits coalesced), removed from both, and a
    boilerplate-free doc passes through byte-identical. Stats and removal
    must agree: words_kept == total_words - dup_words."""
    from substreams_sink_parquet_spark.llm.dedup import (
        duplicated_spans,
        remove_duplicated_spans,
    )

    boiler = "this text is licensed under the sample license terms v1"  # 10 words
    docs = spark.createDataFrame(
        [
            (1, boiler + " alpha beta gamma delta epsilon zeta eta theta"),
            (2, "iota kappa " + boiler + " lambda mu nu xi omicron pi rho"),
            (3, "unique words only here nothing shared across any document at all"),
        ],
        "doc_id long, text string",
    )
    spans = {r.doc_id: r for r in duplicated_spans(docs, n=8).collect()}
    assert set(spans) == {1, 2}
    for d in (1, 2):
        assert spans[d].n_dup_spans == 1  # overlapping hits merged
        assert spans[d].dup_words == 10  # exactly the planted header
    clean = {r.doc_id: r for r in remove_duplicated_spans(docs, n=8).collect()}
    assert clean[1].clean_text == "alpha beta gamma delta epsilon zeta eta theta"
    assert clean[2].clean_text == "iota kappa lambda mu nu xi omicron pi rho"
    assert clean[3].clean_text == docs.filter("doc_id = 3").first().text
    for d in (1, 2):
        total = len(docs.filter(f"doc_id = {d}").first().text.split(" "))
        assert clean[d].n_words_kept == total - spans[d].dup_words


def test_substring_spans_merge_and_multi_span(spark):
    """Two separated duplicated regions in one doc stay TWO spans (the
    gap survives the merge); a doc made entirely of one duplicated
    region reports full coverage and empties on removal."""
    from substreams_sink_parquet_spark.llm.dedup import (
        duplicated_spans,
        remove_duplicated_spans,
    )

    a = "a1 a2 a3 a4 a5 a6 a7 a8"  # 8 words: exactly one 8-gram
    b = "b1 b2 b3 b4 b5 b6 b7 b8"
    docs = spark.createDataFrame(
        [
            (1, a + " gapword1 gapword2 " + b),
            (2, a),
            (3, b + " tailword"),
        ],
        "doc_id long, text string",
    )
    spans = {r.doc_id: r for r in duplicated_spans(docs, n=8).collect()}
    assert spans[1].n_dup_spans == 2 and spans[1].dup_words == 16
    assert spans[2].n_dup_spans == 1 and spans[2].dup_words == 8
    assert spans[2].total_words == 8
    clean = {r.doc_id: r for r in remove_duplicated_spans(docs, n=8).collect()}
    assert clean[1].clean_text == "gapword1 gapword2"
    assert clean[2].clean_text == "" and clean[2].n_words_kept == 0
    assert clean[3].clean_text == "tailword"


def _py_dup_spans(texts: dict[int, str], n: int):
    """Pure-Python ExactSubstr reference: duplicated n-gram hit positions
    merged into half-open spans per doc; returns (spans, clean_text)."""
    grams: dict[str, set[int]] = {}
    words = {d: t.split(" ") for d, t in texts.items()}
    pos: dict[int, list[int]] = {d: [] for d in texts}
    for d, w in words.items():
        for i in range(len(w) - n + 1):
            grams.setdefault(" ".join(w[i:i + n]), set()).add(d)
    dup = {g for g, ds in grams.items() if len(ds) >= 2}
    for d, w in words.items():
        for i in range(len(w) - n + 1):
            if " ".join(w[i:i + n]) in dup:
                pos[d].append(i)
    spans: dict[int, list[tuple[int, int]]] = {}
    clean: dict[int, str] = {}
    for d, ps in pos.items():
        merged: list[list[int]] = []
        for i in ps:
            if merged and i <= merged[-1][1]:
                merged[-1][1] = i + n
            else:
                merged.append([i, i + n])
        spans[d] = [tuple(m) for m in merged]
        covered = {j for s, e in spans[d] for j in range(s, e)}
        clean[d] = " ".join(
            w for j, w in enumerate(words[d]) if j not in covered
        )
    return spans, clean


@settings(max_examples=4, deadline=None)
@given(st.lists(DOC, min_size=2, max_size=10))
def test_exactsubstr_matches_python_reference(spark, docs):
    """duplicated_spans / remove_duplicated_spans must equal the plain-
    Python ExactSubstr on arbitrary corpora (random short words make
    cross-doc n-gram collisions common), and agree with each other:
    words kept + words covered == total words, per document."""
    from substreams_sink_parquet_spark.llm.dedup import (
        duplicated_spans,
        remove_duplicated_spans,
    )

    n = 2  # short grams: dense collisions on the tiny alphabet
    texts = {i: d for i, d in enumerate(docs)}
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    ref_spans, ref_clean = _py_dup_spans(texts, n)
    got_stats = {r.doc_id: r for r in duplicated_spans(df, n=n).collect()}
    got_clean = {r.doc_id: r for r in remove_duplicated_spans(df, n=n).collect()}
    assert set(got_clean) == set(texts)  # clean emits EVERY doc
    for d, sp in ref_spans.items():
        if sp:
            assert got_stats[d].n_dup_spans == len(sp), (d, texts[d])
            assert got_stats[d].dup_words == sum(e - s for s, e in sp)
        else:
            assert d not in got_stats  # span-free docs absent from stats
        assert got_clean[d].clean_text == ref_clean[d], (d, texts[d])
        total = len(texts[d].split(" "))
        assert got_clean[d].n_words_kept == total - sum(e - s for s, e in sp)


@settings(max_examples=4, deadline=None)
@given(st.data())
def test_winnowing_guarantee_random_shared_substrings(spark, data):
    """The winnowing GUARANTEE on random inputs: whenever two documents
    share a substring of length >= k + w - 1, their selected fingerprint
    sets must intersect. Construct the sharing explicitly (random prefix/
    suffix around a random shared core) so the property is exercised on
    every example, not only when collisions happen by chance."""
    from pyspark.sql import functions as F

    k, w = 6, 3
    alpha = "abcdef "
    core = data.draw(st.text(alphabet=alpha, min_size=k + w - 1, max_size=30))
    pre1 = data.draw(st.text(alphabet=alpha, min_size=0, max_size=15))
    suf1 = data.draw(st.text(alphabet=alpha, min_size=0, max_size=15))
    pre2 = data.draw(st.text(alphabet=alpha, min_size=0, max_size=15))
    suf2 = data.draw(st.text(alphabet=alpha, min_size=0, max_size=15))
    docs = spark.createDataFrame(
        [(1, pre1 + core + suf1), (2, pre2 + core + suf2)],
        "doc_id long, text string",
    )
    n_grams = F.length("text") - k + 1
    h = F.transform(
        F.sequence(F.lit(0), n_grams - 1),
        lambda i: F.substring(F.md5(F.col("text").substr(i + 1, F.lit(k))), 1, 8),
    )
    from substreams_sink_parquet_spark.llm.text import _windowed_min

    hs = F.col("h")
    mins = F.slice(_windowed_min(hs, w), 1,
                   F.greatest(F.size(hs) - w + 1, F.lit(0)))
    sets = {
        r.doc_id: set(r.fps)
        for r in docs.select("doc_id", h.alias("h"))
        .select(
            "doc_id",
            F.array_distinct(
                F.when(F.size(hs) >= w, mins)
                .when(F.size(hs) > 0, F.array(F.array_min(hs)))
                .otherwise(F.array().cast("array<string>"))
            ).alias("fps"),
        )
        .collect()
    }
    assert sets[1] & sets[2], (repr(core), repr(pre1), repr(pre2))


@settings(max_examples=4, deadline=None)
@given(st.lists(st.lists(st.text(alphabet="0123456789abcdef", min_size=1,
                                 max_size=8),
                         min_size=0, max_size=25),
                min_size=1, max_size=8),
       st.integers(min_value=1, max_value=7))
def test_windowed_min_doubling_equals_naive_slices(spark, arrays, w):
    """The sparse-table doubling window-min must equal the naive
    per-position slice-and-min for EVERY window size (powers of two and
    not) on arbitrary string arrays — the formulation it replaced."""
    from pyspark.sql import functions as F

    from substreams_sink_parquet_spark.llm.text import _windowed_min

    df = spark.createDataFrame(
        [(i, a) for i, a in enumerate(arrays)], "i long, h array<string>"
    )
    hs = F.col("h")
    fast = F.slice(_windowed_min(hs, w), 1,
                   F.greatest(F.size(hs) - w + 1, F.lit(0)))
    naive = F.transform(
        F.sequence(F.lit(0), F.size(hs) - w),
        lambda j: F.array_min(F.slice(hs, j + 1, w)),
    )
    rows = df.select(
        "i",
        fast.alias("fast"),
        F.when(F.size(hs) >= w, naive)
        .otherwise(F.array().cast("array<string>"))
        .alias("naive"),
    ).collect()
    for r in rows:
        assert r.fast == r.naive, (r.i, arrays[r.i], w)


def test_bm25_batch_matches_plain_python_property(spark):
    """Property: bm25_scores_batch equals a plain-Python Okapi BM25
    (k1=1.2, b=0.75, +1-inside-log idf, per-query distinct terms, sparse
    output) on random small corpora and query tables."""
    import math

    from hypothesis import given, settings, strategies as st

    from substreams_sink_parquet_spark.llm.text import bm25_scores_batch

    word = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"])
    text = st.lists(word, min_size=1, max_size=12).map(" ".join)
    query = st.lists(word, min_size=1, max_size=4).map(" ".join)

    @settings(max_examples=8, deadline=None)
    @given(st.lists(text, min_size=2, max_size=6),
           st.lists(query, min_size=1, max_size=3))
    def check(texts, qs):
        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        queries = spark.createDataFrame(
            list(enumerate(qs)), "query_id long, query string"
        )
        got = {
            (r.query_id, r.doc_id): (r.bm25, r.n_terms_matched)
            for r in bm25_scores_batch(docs, queries).collect()
        }
        toks = {d: t.split(" ") for d, t in enumerate(texts)}
        n = len(toks)
        avgdl = sum(len(w) for w in toks.values()) / n
        want = {}
        for qid, q in enumerate(qs):
            terms = list(dict.fromkeys(q.split(" ")))
            for d, w in toks.items():
                s, matched = 0.0, 0
                for t in terms:
                    tf = w.count(t)
                    if tf == 0:
                        continue
                    matched += 1
                    df = sum(1 for ww in toks.values() if t in ww)
                    idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
                    s += round(
                        idf * tf * 2.2
                        / (tf + 1.2 * (0.25 + 0.75 * len(w) / avgdl)),
                        9,
                    )
                if matched:
                    want[(qid, d)] = (round(s, 6), matched)
        assert set(got) == set(want)
        for key, (score, m) in want.items():
            assert got[key][1] == m, key
            assert abs(got[key][0] - score) < 1e-6, key

    check()


def test_line_dedup_matches_plain_python_property(spark):
    """Property: line_dedup equals a plain-Python reference (cut lines in
    >= min_dup_docs distinct docs by stripped-text identity, reassemble
    survivors in order) on random multi-line corpora, including padded
    and tab/CR-decorated line variants."""
    from hypothesis import given, settings, strategies as st

    from substreams_sink_parquet_spark.llm.dedup import line_dedup

    line = st.sampled_from(
        ["the footer", "  the footer ", "\tthe footer\r", "unique one",
         "unique two", "body text", " ", ""]
    )
    doc = st.lists(line, min_size=1, max_size=6).map("\n".join)

    @settings(max_examples=8, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=5), st.integers(2, 3))
    def check(texts, k):
        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = {
            r.doc_id: (r.n_lines, r.n_removed, r.clean_text)
            for r in line_dedup(docs, min_dup_docs=k).collect()
        }
        # plain-Python reference
        import re

        def strip(s):
            return re.sub(r"^\s+|\s+$", "", s)

        per_doc = {
            d: [ln for ln in t.split("\n") if strip(ln) != ""]
            for d, t in enumerate(texts)
        }
        counts = {}
        for d, lns in per_doc.items():
            for key in {strip(x) for x in lns}:
                counts[key] = counts.get(key, 0) + 1
        want = {}
        for d, lns in per_doc.items():
            if not lns:
                continue
            kept = [x for x in lns if counts[strip(x)] < k]
            want[d] = (len(lns), len(lns) - len(kept), "\n".join(kept))
        assert got == want

    check()


@given(
    toks=st.lists(st.integers(min_value=1, max_value=300),
                  min_size=1, max_size=60),
    ctx=st.integers(min_value=8, max_value=128),
    n_shards=st.integers(min_value=1, max_value=5),
)
@settings(max_examples=4, deadline=None)
def test_export_plan_matches_plain_python_reference(spark, toks, ctx,
                                                    n_shards):
    """Property: the export's (shard, pos, seq_id) equals a plain-Python
    restatement of the contract — universal-hash shard, seeded-md5 order,
    greedy running-sum packing — for arbitrary token-length profiles,
    context lengths, and shard counts (the oracle pins one fixture; this
    pins the law)."""
    import hashlib

    from substreams_sink_parquet_spark.llm.export import plan_pretrain_export
    from substreams_sink_parquet_spark.llm.sampling import _A, _B, _M

    docs = [(i, " ".join("w" for _ in range(n))) for i, n in enumerate(toks)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.shard_id, r.pos, r.seq_id, r.n_tokens)
        for r in plan_pretrain_export(
            df, context_len=ctx, n_shards=n_shards
        ).collect()
    }

    # plain-Python reference
    by_shard: dict[int, list[tuple[str, int, int]]] = {}
    for i, n in enumerate(toks):
        s = ((i % _M) * _A + _B) % _M % n_shards
        k = hashlib.md5(f"{i}:42".encode()).hexdigest()
        by_shard.setdefault(s, []).append((k, i, n))
    want = {}
    for s, rows in by_shard.items():
        run = 0
        for pos, (_, i, n) in enumerate(sorted(rows), start=1):
            want[i] = (s, pos, run // ctx, n)
            run += n
    assert got == want


@given(
    toks=st.lists(st.integers(min_value=1, max_value=200),
                  min_size=2, max_size=40),
    budget=st.integers(min_value=10, max_value=20_000),
    w=st.floats(min_value=0.05, max_value=1.0),
)
@settings(max_examples=4, deadline=None)
def test_mixture_copies_match_plain_python_reference(spark, toks, budget, w):
    """Property: mixture_plan's per-doc copy counts equal the plain-Python
    restatement — quota = floor(budget*w), full epochs = quota //
    inventory, remainder filled by the md5-ordered greedy prefix — for
    arbitrary inventories, budgets, and weights (upsampling and
    downsampling regimes both land here)."""
    import hashlib

    from substreams_sink_parquet_spark.llm.sampling import mixture_plan

    docs = [(i, "g", " ".join("w" for _ in range(n)))
            for i, n in enumerate(toks)]
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    got = {r.doc_id: r.n_copies
           for r in mixture_plan(df, {"g": w}, budget).collect()}

    inv = sum(toks)
    quota = int(budget * w)
    full = quota // inv
    rem = quota - full * inv
    order = sorted(
        (hashlib.md5(f"{i}:42".encode()).hexdigest(), i, n)
        for i, n in enumerate(toks)
    )
    want, run = {}, 0
    for _, i, n in order:
        run += n
        want[i] = full + (1 if run <= rem else 0)
    assert got == want


@given(
    train=st.lists(
        st.lists(st.sampled_from("abcd"), min_size=2, max_size=8),
        min_size=1, max_size=8,
    ),
    probe=st.lists(st.sampled_from("abcdxy"), min_size=2, max_size=10),
    alpha=st.floats(min_value=0.01, max_value=2.0),
)
@settings(max_examples=4, deadline=None)
def test_lm_scoring_matches_plain_python_reference(spark, tmp_path_factory,
                                                   train, probe, alpha):
    """Property: score_with_lm over the persisted artifact equals a
    plain-Python restatement of the add-alpha law — counts from the
    training docs, p = (c_bg + a) / (c_uni + a*V), per-9dp-rounded ln
    sums — for arbitrary tiny vocabularies, probe mixes (in-vocab and
    OOV words), and alphas."""
    import math

    from substreams_sink_parquet_spark.llm import lm as L

    train_docs = [(i, " ".join(ws)) for i, ws in enumerate(train)]
    probe_text = " ".join(probe)
    df = spark.createDataFrame(train_docs, "doc_id long, text string")
    lm_dir = str(tmp_path_factory.mktemp("lm") / "m")
    meta = L.write_bigram_lm(df, lm_dir, n_buckets=2)
    got = L.score_with_lm(
        spark, lm_dir,
        spark.createDataFrame([(99, probe_text)], "doc_id long, text string"),
        alpha=alpha,
    ).collect()[0]

    uni, bg = {}, {}
    for _, t in train_docs:
        ws = t.split(" ")
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bg[(a, b)] = bg.get((a, b), 0) + 1
    v = len(uni)
    assert meta["vocab"] == v
    ps = probe_text.split(" ")
    lps = [
        round(math.log((bg.get((a, b), 0) + alpha)
                       / (uni.get(a, 0) + alpha * v)), 9)
        for a, b in zip(ps, ps[1:])
    ]
    assert got.n_bigrams == len(lps)
    want = round(-sum(lps) / len(lps), 6)
    assert abs(got.neg_avg_logprob - want) < 1e-9


def test_corpus_diversity_keeps_bigramless_language(spark, tmp_path):
    """ADVICE r9 (low): a language whose docs are all single-word produces
    zero bigrams; the diversity report must keep its row with a NULL
    distinct_bigram_ratio — exactly what the DuckDB oracle's correlated
    subquery yields over zero rows — instead of inner-joining it away.
    The fixture corpus never triggers this, so it is pinned here on a
    synthetic one, against the registered oracle SQL itself."""
    import duckdb

    from substreams_sink_parquet_spark.catalog import registry

    docs = spark.createDataFrame(
        [(1, "en", "two words here"), (2, "zz", "single"),
         (3, "zz", "alone")],
        "doc_id long, lang string, text string",
    )
    sf = str(tmp_path / "sf")
    docs.coalesce(1).write.parquet(f"{sf}/documents.parquet")
    spec = registry()["q_corpus_diversity"]
    got = {r.lang: r for r in spec.fn(spark, sf).collect()}
    assert set(got) == {"en", "zz"}
    assert got["zz"].distinct_bigram_ratio is None
    assert got["en"].distinct_bigram_ratio is not None

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    want = {r[0]: r for r in con.execute(spec.oracle).fetchall()}
    assert set(want) == set(got)
    for lang, row in want.items():
        assert got[lang].n_tokens == row[1]
        assert got[lang].n_types == row[2]
        assert got[lang].distinct_bigram_ratio == row[4]


_LM_WORDS = ["the", "river", "fox", "stone", "dawn", "quick", "old"]
_LM_DOC = st.lists(
    st.integers(min_value=0, max_value=len(_LM_WORDS) - 1),
    min_size=1, max_size=8,
)


@given(
    docs=st.lists(_LM_DOC, min_size=1, max_size=14),
    parts=st.lists(st.integers(min_value=0, max_value=2),
                   min_size=14, max_size=14),
)
@settings(max_examples=3, deadline=None)
def test_lm_append_partition_law(spark, docs, parts):
    """Property: for ANY partition of a corpus into (base, epoch0,
    epoch1) — including empty parts — training on the base and appending
    the epochs scores every probe doc BIT-IDENTICALLY to one retrain
    over the whole corpus (the sum-mergeability law the streaming LM
    rests on), with merged n_tokens/n_docs/vocab equal too."""
    import shutil
    import tempfile

    from substreams_sink_parquet_spark.llm import lm as L

    rows = [
        (i, " ".join(_LM_WORDS[w] for w in doc))
        for i, doc in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    split = [parts[i % len(parts)] for i in range(len(rows))]
    probe = spark.createDataFrame(
        [(100, "the quick fox at dawn"), (101, "zz unseen qq"), (102, "the")],
        "doc_id long, text string",
    )
    lm_dir = tempfile.mkdtemp(prefix="lm_prop_")
    full_dir = tempfile.mkdtemp(prefix="lm_prop_full_")
    try:
        L.write_bigram_lm(df, full_dir, n_buckets=2)
        base = df.filter(
            F.array_contains(
                F.array(*[F.lit(i) for i, p in enumerate(split) if p == 0]
                        or [F.lit(-1)]),
                F.col("doc_id").cast("int"),
            )
        )
        L.write_bigram_lm(base, lm_dir, n_buckets=2)
        for ep in (1, 2):
            ids = [i for i, p in enumerate(split) if p == ep]
            part = df.filter(
                F.array_contains(
                    F.array(*[F.lit(i) for i in ids] or [F.lit(-1)]),
                    F.col("doc_id").cast("int"),
                )
            )
            L.append_epoch_to_bigram_lm(part, lm_dir, epoch_id=ep - 1)
        key = lambda d: sorted(
            (r.doc_id, r.n_bigrams, r.neg_avg_logprob)
            for r in L.score_with_lm(spark, d, probe).collect()
        )
        assert key(lm_dir) == key(full_dir)
        _, _, stats = L.merged_lm_state(spark, lm_dir)
        want = L.read_lm_meta(spark, full_dir)
        assert (stats["n_tokens"], stats["n_docs"], stats["vocab"]) == (
            want["n_tokens"], want["n_docs"], want["vocab"]
        )
    finally:
        shutil.rmtree(lm_dir, ignore_errors=True)
        shutil.rmtree(full_dir, ignore_errors=True)


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),    # group
            st.integers(min_value=0, max_value=3),    # score tier (ties!)
            st.integers(min_value=1, max_value=9),    # value
        ),
        min_size=1, max_size=120,
    ),
    st.sampled_from([1, 2, 8, 32]),                   # n_buckets
)
def test_ranked_salted_running_sum_matches_window(spark, rows, n_buckets):
    """The salted (score DESC, id ASC) running sum equals the plain
    Window.partitionBy(group) form ROW FOR ROW on arbitrary inputs —
    arbitrary group skew, heavy score ties (only 4 tiers, so every
    boundary lands on a tie), and every bucket count incl. the
    degenerate n_buckets=1. The property the one-job min_by boundary
    sample must preserve: WHICH rows get sampled can only move the
    bucket split, never a cum value."""
    from pyspark.sql import Window

    from substreams_sink_parquet_spark.llm.sampling import (
        ranked_order_buckets,
        salted_running_sum,
    )

    df = spark.createDataFrame(
        [(i, f"g{g}", float(s) / 2, v) for i, (g, s, v) in enumerate(rows)],
        "doc_id long, source string, score double, n_tokens long",
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
    bucketed = ranked_order_buckets(df, "source", n_buckets=n_buckets)
    got = {
        r.doc_id: r.cum
        for r in salted_running_sum(
            bucketed, ["source"],
            [F.col("score").desc(), F.col("doc_id")],
            "n_tokens", F.col("_salt_bucket"),
        ).collect()
    }
    assert got == want
