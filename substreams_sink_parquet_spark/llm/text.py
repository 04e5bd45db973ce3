"""Text analysis operators over ``documents``: quality scoring, language ID,
token counting, fingerprinting. All JVM-side expressions (regex + HOFs) —
no Python in the hot path, so they ride whole-stage codegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..tables import load

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# Tiny deterministic marker lists for the rule-based language-ID heuristic.
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "fr": ("le", "la", "et"),
    "de": ("der", "die", "und"),
}


def _words(col: str = "text") -> Column:
    return F.split(F.col(col), " ")


@register(
    "q_text_stats",
    r"""
    SELECT doc_id, lang,
           length(text) AS n_chars_calc,
           len(str_split(text, ' ')) AS n_words,
           CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS BIGINT) AS n_punct,
           CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
               / length(text) AS punct_ratio,
           CAST(len(list_filter(str_split(text, ' '),
                                w -> w IN ('the','a','of','and','to','in','is','it'))) AS INTEGER)
               AS n_stopwords,
           CAST(length(replace(text, ' ', '')) AS DOUBLE)
               / len(str_split(text, ' ')) AS avg_word_len
    FROM documents
    """,
    doc="Quality-scoring statistics: char/word/punct counts, stopword count, avg word length",
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    words = _words()
    n_punct = F.length(F.regexp_replace("text", r"[^.,!?;:]", ""))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    return docs.select(
        "doc_id",
        "lang",
        F.length("text").alias("n_chars_calc"),
        F.size(words).alias("n_words"),
        n_punct.cast("long").alias("n_punct"),
        # try_divide: an empty text's 0/0 is NULL, matching DuckDB's
        # divide-by-zero semantics — plain division ABORTS the whole
        # query under ANSI (the session default) on one empty document
        F.try_divide(n_punct.cast("double"), F.length("text"))
        .alias("punct_ratio"),
        F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w))).alias("n_stopwords"),
        (
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / F.size(words)
        ).alias("avg_word_len"),
    )


@register(
    "q_text_quality",
    r"""
    SELECT doc_id,
           CASE WHEN length(text) >= 200
                 AND len(str_split(text, ' ')) >= 30
                 AND len(list_filter(str_split(text, ' '),
                                     w -> w IN ('the','a','of','and','to','in','is','it'))) > 0
                THEN 'keep' ELSE 'drop' END AS quality_gate,
           CAST(FLOOR(LEAST(length(text), 1000) / 10) AS BIGINT)
             + len(list_filter(str_split(text, ' '),
                               w -> w IN ('the','a','of','and','to','in','is','it'))) AS quality_score
    FROM documents
    """,
    doc="Composite quality gate + integer quality score (filterable at scan time)",
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    words = _words()
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w)))
    gate = (
        F.when(
            (F.length("text") >= 200) & (F.size(words) >= 30) & (n_stop > 0), "keep"
        ).otherwise("drop")
    )
    score = F.floor(F.least(F.length("text"), F.lit(1000)) / 10) + n_stop
    return docs.select("doc_id", gate.alias("quality_gate"), score.alias("quality_score"))


@register(
    "q_text_langid",
    r"""
    WITH scored AS (
        SELECT doc_id, lang,
               len(list_filter(str_split(text, ' '), w -> w IN ('the','and','of'))) AS s_en,
               len(list_filter(str_split(text, ' '), w -> w IN ('le','la','et'))) AS s_fr,
               len(list_filter(str_split(text, ' '), w -> w IN ('der','die','und'))) AS s_de
        FROM documents
    )
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN s_en >= s_fr AND s_en >= s_de THEN 'en'
                WHEN s_fr >= s_de THEN 'fr'
                ELSE 'de' END AS guessed_lang,
           CAST(GREATEST(s_en, s_fr, s_de) AS INTEGER) AS marker_hits
    FROM scored
    """,
    doc="Rule-based language ID: marker-word scoring with deterministic argmax",
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    words = _words()

    def marker_count(markers: tuple[str, ...]):
        arr = F.array(*[F.lit(m) for m in markers])
        # single-arg lambda: F.filter treats a second param as the index
        return F.size(F.filter(words, lambda w: F.array_contains(arr, w)))

    scores = {lang: marker_count(m) for lang, m in LANG_MARKERS.items()}
    guess = (
        F.when((scores["en"] >= scores["fr"]) & (scores["en"] >= scores["de"]), "en")
        .when(scores["fr"] >= scores["de"], "fr")
        .otherwise("de")
    )
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        guess.alias("guessed_lang"),
        F.greatest(*scores.values()).alias("marker_hits"),
    )


@register(
    "q_text_tokens",
    r"""
    SELECT doc_id,
           len(str_split(text, ' ')) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS INTEGER)
               AS bpe_ish_tokens,
           CAST(CEIL(length(text) / 4.0) AS BIGINT) AS byte_est_tokens
    FROM documents
    """,
    doc="Token counting: whitespace, BPE-ish regex pieces, bytes/4 estimate",
)
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(_words()).alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), F.lit(0))).alias(
            "bpe_ish_tokens"
        ),
        F.ceil(F.length("text") / 4.0).alias("byte_est_tokens"),
    )


@register(
    "q_text_fingerprint",
    r"""
    SELECT fingerprint, COUNT(*) AS n_docs, CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
    FROM (
        SELECT doc_id,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
        FROM documents
    )
    GROUP BY fingerprint
    """,
    doc="Document fingerprinting: md5 over whitespace-normalized text, grouped",
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    fp = F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "))
    return (
        docs.select("doc_id", fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
    )


@register(
    "q_text_ngram_tf",
    """
    WITH grams AS (
        SELECT doc_id, UNNEST(g) AS bigram
        FROM (
            SELECT doc_id,
                   list_transform(
                       range(len(str_split(text, ' ')) - 1),
                       i -> array_to_string(str_split(text, ' ')[i+1:i+2], ' ')
                   ) AS g
            FROM documents
        )
    )
    SELECT bigram, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
    FROM grams
    GROUP BY bigram
    HAVING COUNT(*) >= 20
    """,
    doc="Corpus n-gram term/document frequencies: per-row bigram expansion "
        "(no stored intermediate), aggregated with map-side combine; the "
        "HAVING mirrors the vocabulary-pruning cut of a TF pipeline",
)
def q_text_ngram_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    words = F.split("text", " ")
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size(words) - 2),
        lambda i: F.array_join(F.slice(words, i + 1, 2), " "),
    )
    grams = docs.select(
        "doc_id",
        F.explode(
            F.when(F.size(words) >= 2, bigrams).otherwise(F.array().cast("array<string>"))
        ).alias("bigram"),
    )
    return (
        grams.groupBy("bigram")
        .agg(F.count("*").alias("tf"), F.countDistinct("doc_id").alias("df"))
        .filter(F.col("tf") >= 20)
    )


@register(
    "q_text_hashing_tf",
    None,  # hashed-bucket indices are implementation-specific → rows-only
    doc="MLlib feature pipeline: Tokenizer → NGram → HashingTF sparse term "
        "vectors (the standard Spark featurization path for text corpora)",
)
def q_text_hashing_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.feature import HashingTF, NGram, Tokenizer

    # input contract: NULL-safe, whitespace-NORMALIZED text (code review
    # r12, hostile-fixture find). MLlib's Tokenizer NPEs on NULL (scala
    # toLowerCase on null — one corrupt row kills the whole job), and its
    # Java split("\\s") drops trailing empties where the SQL-expressible
    # single-space split keeps them — so on hostile whitespace the two
    # tokenizations (and the delta's mass claim) diverge. Normalizing
    # (coalesce + trim + \s+ -> ' ') makes them provably identical on any
    # input, which is also just correct featurization practice.
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.trim(F.regexp_replace(
            F.coalesce(F.col("text"), F.lit("")), r"\s+", " "
        )).alias("text"),
    )
    toks = Tokenizer(inputCol="text", outputCol="words").transform(docs)
    grams = NGram(n=2, inputCol="words", outputCol="grams").transform(toks)
    tf = HashingTF(inputCol="grams", outputCol="tf_vec", numFeatures=1 << 12)
    out = tf.transform(grams)
    # project the sparse vector to stable scalars (nnz + l1 mass)
    from pyspark.ml.functions import vector_to_array

    arr = vector_to_array("tf_vec")
    return out.select(
        "doc_id",
        F.size(F.filter(arr, lambda x: x > 0)).alias("nnz"),
        F.aggregate(arr, F.lit(0.0), lambda a, x: a + x).cast("long").alias("total_terms"),
    )


@register(
    "q_text_repetition",
    """
    WITH base AS (
        SELECT doc_id,
               len(str_split(text, ' ')) AS n_words,
               len(list_distinct(str_split(text, ' '))) AS n_distinct
        FROM documents
    ),
    bg AS (
        SELECT doc_id, UNNEST(g) AS bigram
        FROM (
            SELECT doc_id,
                   list_transform(
                       range(len(str_split(text, ' ')) - 1),
                       i -> array_to_string(str_split(text, ' ')[i+1:i+2], ' ')
                   ) AS g
            FROM documents
        )
    ),
    bgc AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY doc_id, bigram),
    bga AS (SELECT doc_id, MAX(c) AS top_c, SUM(c) AS tot FROM bgc GROUP BY doc_id)
    SELECT b.doc_id,
           CAST(b.n_words AS BIGINT) AS n_words,
           1 - CAST(b.n_distinct AS DOUBLE) / b.n_words AS dup_word_frac,
           CAST(bga.top_c AS DOUBLE) / bga.tot AS top_bigram_frac
    FROM base b JOIN bga USING (doc_id)
    """,
    doc="Repetition signals (Gopher-style quality rules), MAP-ONLY: "
        "duplicate-word fraction via array_distinct; most-frequent-bigram "
        "fraction via a run-length-max fold over the SORTED per-row bigram "
        "array. The explode + per-doc re-aggregate + join alternative "
        "shuffles every bigram of the corpus twice — measured SLOWER even "
        "locally and corpus-shuffle-bound at 100 TB. The split and bigram "
        "arrays are STAGED through projections: interpreted higher-order "
        "expressions get no common-subexpression elimination, so the "
        "single-select form re-split(text) per consumer (~6 evaluations "
        "per row) — staging measured 3.2 s -> 0.7 s at sf0.1 with an "
        "identical output checksum",
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    w = (
        docs.select("doc_id", F.split("text", " ").alias("w"))
        .filter(F.size("w") >= 2)
        .select("doc_id", "w", F.size("w").alias("nw"))
    )
    bigrams = F.transform(
        F.sequence(F.lit(0), F.col("nw") - 2),
        lambda i: F.concat(
            F.element_at(F.col("w"), i + 1), F.lit(" "),
            F.element_at(F.col("w"), i + 2),
        ),
    )
    staged = w.select(
        "doc_id", "nw",
        F.size(F.array_distinct("w")).alias("nd"),
        F.array_sort(bigrams).alias("bg"),
    )
    # fold over the sorted array: equal neighbors extend the current run;
    # the longest run IS the max bigram multiplicity
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    top_c = F.aggregate(F.col("bg"), init, step)["best"]
    return staged.select(
        "doc_id",
        F.col("nw").cast("long").alias("n_words"),
        (F.lit(1.0) - F.col("nd").cast("double") / F.col("nw")).alias("dup_word_frac"),
        (top_c.cast("double") / F.size("bg")).alias("top_bigram_frac"),
    )


def quality_verdict_expr(text_col: str = "text") -> Column:
    """The Gopher-style rule cascade as ONE Column expression — the single
    source of truth shared by q_text_filter_pipeline (its oracle SQL mirrors
    these thresholds) and the weak labeler that bootstraps the trained
    quality classifier (quality_model.weak_quality_labels). Change a
    threshold here and both stay in sync by construction."""
    words = _words(text_col)
    n_words = F.size(words)
    n_distinct = F.size(F.array_distinct(words))
    awl = (
        F.length(F.replace(F.col(text_col), F.lit(" "), F.lit(""))).cast("double")
        / n_words
    )
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w)))
    punct_ratio = (
        F.length(F.regexp_replace(text_col, r"[^.,!?;:]", "")).cast("double")
        / F.length(text_col)
    )
    dup_frac = F.lit(1) - n_distinct.cast("double") / n_words
    return (
        # fail CLOSED on a null text: every numeric rule evaluates NULL
        # (condition false) against it, so without this rule the cascade
        # fell through to 'keep' — a contentless document passing the
        # quality gate (ingest yields NULL text for a missing 'text' key
        # on an otherwise-clean JSONL line, so this is reachable)
        F.when(F.col(text_col).isNull(), "null_text")
        .when(n_words < 30, "too_short")
        .when(n_words > 100000, "too_long")
        .when((awl < 3) | (awl > 12), "word_len")
        .when(n_stop < 1, "no_stopwords")
        .when(punct_ratio > 0.1, "symbol_heavy")
        .when(dup_frac > 0.5, "repetitive")
        .otherwise("keep")
    )



@register(
    "q_text_filter_pipeline",
    """
    WITH s AS (
        SELECT doc_id,
               text IS NULL AS is_null,
               len(str_split(text, ' ')) AS n_words,
               len(list_distinct(str_split(text, ' '))) AS n_distinct,
               CAST(length(replace(text, ' ', '')) AS DOUBLE)
                   / len(str_split(text, ' ')) AS awl,
               len(list_filter(str_split(text, ' '),
                               w -> w IN ('the','a','of','and','to','in','is','it')))
                   AS n_stop,
               CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
                   / length(text) AS punct_ratio
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN is_null THEN 'null_text'
                WHEN n_words < 30 THEN 'too_short'
                WHEN n_words > 100000 THEN 'too_long'
                WHEN awl < 3 OR awl > 12 THEN 'word_len'
                WHEN n_stop < 1 THEN 'no_stopwords'
                WHEN punct_ratio > 0.1 THEN 'symbol_heavy'
                WHEN 1 - CAST(n_distinct AS DOUBLE) / n_words > 0.5 THEN 'repetitive'
                ELSE 'keep' END AS verdict,
           CAST(n_words AS BIGINT) AS n_words
    FROM s
    """,
    doc="Composite quality-filter pipeline (Gopher-style rule cascade): "
        "length bounds, mean word length, stopword presence, symbol ratio, "
        "duplicate-word fraction — first failing rule names the drop reason. "
        "Entirely map-only scalar expressions: at 100 TB this runs at scan "
        "speed with zero shuffle and the verdict is a partition-prunable "
        "write key for the filtered corpus",
)
def q_text_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        quality_verdict_expr().alias("verdict"),
        F.size(_words()).cast("long").alias("n_words"),
    )


@register(
    "q_text_redact",
    r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
                '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INTEGER) AS n_emails,
           CAST(len(regexp_extract_all(text,
                'https?://[^ ]+')) AS INTEGER) AS n_urls,
           CAST(len(regexp_extract_all(text, '[0-9]{6,}')) AS INTEGER) AS n_long_numbers,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
                '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
                'https?://[^ ]+', '<URL>', 'g'),
                '[0-9]{6,}', '<NUM>', 'g')) AS redacted_md5
    FROM documents
    """,
    doc="PII-style scrubbing pass: count emails / URLs / long digit runs and "
        "hash the redacted text — the pre-training scrub step, pure per-row "
        "regex (map-only, scan-speed at any scale). Patterns restricted to "
        "syntax with identical semantics in Java regex and RE2 so the "
        "redacted bytes hash-match the oracle",
)
def q_text_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    email = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
    url = r"https?://[^ ]+"
    num = r"[0-9]{6,}"
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("text", email, "<EMAIL>"), url, "<URL>"
        ),
        num, "<NUM>",
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(email), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(url), F.lit(0))).alias("n_urls"),
        F.size(F.regexp_extract_all("text", F.lit(num), F.lit(0))).alias("n_long_numbers"),
        F.md5(redacted).alias("redacted_md5"),
    )


@register(
    "q_text_length_histogram",
    """
    SELECT CAST(FLOOR(len(str_split(text, ' ')) / 32) * 32 AS BIGINT) AS bucket_lo,
           COUNT(*) AS n_docs,
           CAST(MIN(len(str_split(text, ' '))) AS BIGINT) AS min_words,
           CAST(MAX(len(str_split(text, ' '))) AS BIGINT) AS max_words
    FROM documents
    GROUP BY 1
    """,
    doc="Token-count distribution: fixed-width word-count histogram — the "
        "shard-sizing / curriculum input of a training pipeline; one "
        "map-side-combined aggregation on a bounded key space",
)
def q_text_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    n_words = F.size(_words())
    bucket = (F.floor(n_words / 32) * 32).cast("long")
    return (
        docs.select(bucket.alias("bucket_lo"), n_words.alias("nw"))
        .groupBy("bucket_lo")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("nw").cast("long").alias("min_words"),
            F.max("nw").cast("long").alias("max_words"),
        )
    )


@register(
    "q_text_chunk",
    """
    WITH spec AS (
        SELECT doc_id, text,
               1 + (GREATEST(n_chars - 200, 0) + 159) // 160 AS n_chunks
        FROM documents
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_id,
           CAST(length(substr(text, CAST(i * 160 + 1 AS BIGINT), 200))
                AS BIGINT) AS chunk_chars,
           md5(substr(text, CAST(i * 160 + 1 AS BIGINT), 200)) AS chunk_hash
    FROM spec, UNNEST(range(n_chunks)) AS t(i)
    """,
    doc="Overlapping document chunking (RAG / context-window prep): "
        "200-char windows at stride 160 (40-char overlap), one row per "
        "chunk with offsets and a content hash. Map-only: chunk starts come "
        "from sequence() + explode on each row — no shuffle, no UDF; at "
        "100 TB this is the same embarrassingly-parallel shape as any "
        "per-row projection. The chunk count formula (1 + ceil(max(len-200,"
        "0)/160)) guarantees full coverage incl. a final partial window",
)
def q_text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    size_c, stride = 200, 160
    n_extra = F.greatest(F.col("n_chars") - size_c, F.lit(0))
    n_chunks = 1 + F.floor((n_extra + (stride - 1)) / stride)
    chunk = F.col("text").substr(
        (F.col("i") * stride + 1).cast("int"), F.lit(size_c)
    )
    return (
        docs.select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(0).cast("long"), (n_chunks - 1).cast("long"))).alias("i"),
        )
        .select(
            "doc_id",
            F.col("i").alias("chunk_id"),
            F.length(chunk).cast("long").alias("chunk_chars"),
            F.md5(chunk).alias("chunk_hash"),
        )
    )


def chunk_documents(docs: DataFrame, size_chars: int = 200,
                    stride: int = 160,
                    text_col: str = "text") -> DataFrame:
    """Sliding-window chunking of a documents frame — the pre-export
    escape hatch the export module names: greedy ``pack_sequences`` never
    splits a document, so a corpus with documents longer than the context
    budget chunks HERE first. Returns every input column except
    ``text_col`` unchanged, plus ``chunk_id`` (0-based window index) and
    the chunk text under the original column name; the caller derives a
    chunk-level id from (doc_id, chunk_id). Map-only (sequence + explode
    over per-row window counts — no shuffle, no UDF), the q_text_chunk
    construction: 1 + ceil(max(len - size, 0) / stride) windows covers
    the whole document including a final partial window; overlapping
    windows (stride < size) preserve cross-boundary context."""
    if stride <= 0 or size_chars <= 0:
        raise ValueError(
            f"chunk_documents: size_chars={size_chars}, stride={stride} "
            "must both be positive"
        )
    n_extra = F.greatest(F.length(text_col) - size_chars, F.lit(0))
    n_chunks = 1 + F.floor((n_extra + (stride - 1)) / stride)
    chunk = F.col(text_col).substr(
        (F.col("__ci") * stride + 1).cast("int"), F.lit(size_chars)
    )
    keep = [c for c in docs.columns if c != text_col]
    return (
        docs.filter(F.col(text_col).isNotNull())
        .withColumn(
            "__ci",
            F.explode(F.sequence(F.lit(0).cast("long"),
                                 (n_chunks - 1).cast("long"))),
        )
        .select(
            *keep,
            F.col("__ci").alias("chunk_id"),
            chunk.alias(text_col),
        )
    )


def bigram_lm_score(docs: DataFrame) -> DataFrame:
    """CCNet-style LM fluency score: per-document average bigram log-prob
    under a language model derived from the corpus itself.

    p(w2|w1) = count(w1 w2) / count(w1); score = -avg(ln p) over the doc's
    bigrams (low = fluent/common phrasing, high = rare/garbled — the
    perplexity-filter signal used to screen pre-training text).

    Scale shape (optimization r14, guide §2.3/§2.4): the "model" is ONE
    count table. A single tokenize pass emits every token occurrence as
    (w1, next-token-or-NULL) — the NULL sentinel marks each doc's last
    token (real tokens are never null), so grouping that stream by
    (w1, w2) yields the bigram counts AND, summed per w1 over a window
    sharing no extra occurrence-scale exchange, the exact unigram counts
    (every occurrence of w is w1 of exactly one emitted row). The
    historical formulation tokenized the corpus THREE times (unigram
    explode, bigram-count explode, probe explode) and shuffled the
    occurrence stream three times (bigram agg, probe join by (w1,w2),
    everything re-shuffled by w1 for the unigram join); this one
    tokenizes twice (count stream without doc_id — narrower bytes into
    the exchange — and the per-doc probe) and shuffles occurrences
    twice (count agg, probe join against the prejoined vocabulary-scale
    log-prob table). Stopword hot keys ride AQE skew splitting on the
    (w1, w2) probe join; the w1 window is vocabulary-scale (distinct
    successors per word), never occurrence-scale.

    Hash stability: each ln() is rounded to 9 dp first (absorbing the
    <=1-ulp libm difference between engines), then summed as DECIMAL so
    accumulation order cannot change the result, then the average is
    rounded to 6 dp. Counts are exact integers computed over the same
    multisets as the historical three-pass formulation (pinned by
    pytest), so every rounded log-prob is bit-identical.
    """
    from pyspark.sql.window import Window

    from .dedup import spread_if_narrow

    docs = spread_if_narrow(docs)  # tokenize+explode must use every core
    words = F.split("text", " ")
    # one row per token occurrence: (token, successor-or-NULL sentinel);
    # try_element_at past the end is NULL under ANSI and legacy alike
    occ_pairs = F.transform(
        F.sequence(F.lit(0), F.size(words) - 1),
        lambda i: F.struct(
            F.element_at(words, i + 1).alias("w1"),
            F.try_element_at(words, i + 2).alias("w2"),
        ),
    )
    counts = (
        docs.select(F.explode(occ_pairs).alias("b"))
        .select("b.w1", "b.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c_bg"))
    )
    # c_uni(w) == total occurrences of w: every occurrence emits exactly
    # one row with w1 = w (the last token of each doc pairs with NULL)
    lp = F.round(
        F.log(
            F.col("c_bg").cast("double")
            / F.sum("c_bg").over(Window.partitionBy("w1"))
        ), 9
    ).cast("decimal(12,9)")
    lp_tbl = (
        counts.select("w1", "w2", lp.alias("lp"))
        .filter(F.col("w2").isNotNull())
    )
    seq = F.sequence(F.lit(0), F.size(words) - 2)
    bigs = F.transform(
        seq,
        lambda i: F.struct(
            F.element_at(words, i + 1).alias("w1"),
            F.element_at(words, i + 2).alias("w2"),
        ),
    )
    guarded = F.when(F.size(words) >= 2, bigs).otherwise(
        F.array().cast("array<struct<w1:string,w2:string>>")
    )
    bigrams = docs.select(
        "doc_id", F.explode(guarded).alias("b")
    ).select("doc_id", "b.w1", "b.w2")
    return (
        bigrams.join(lp_tbl, ["w1", "w2"])
        .select("doc_id", "lp")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"), F.sum("lp").alias("slp"))
        .select(
            "doc_id",
            "n_bigrams",
            F.round(
                -F.col("slp").cast("double") / F.col("n_bigrams"), 6
            ).alias("neg_avg_logprob"),
        )
    )


@register(
    "q_text_perplexity",
    """
    WITH toks AS (SELECT doc_id, str_split(text, ' ') AS w FROM documents),
    bigrams AS (
        SELECT doc_id, w[i+1] AS w1, w[i+2] AS w2
        FROM toks, UNNEST(range(len(w) - 1)) AS t(i)
    ),
    uni AS (
        SELECT word AS w1, COUNT(*) AS c_uni
        FROM (SELECT UNNEST(w) AS word FROM toks) GROUP BY word
    ),
    bg AS (SELECT w1, w2, COUNT(*) AS c_bg FROM bigrams GROUP BY w1, w2)
    SELECT b.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(CAST(-SUM(CAST(ROUND(LN(CAST(c_bg AS DOUBLE) / c_uni), 9)
                               AS DECIMAL(12,9))) AS DOUBLE) / COUNT(*),
                 6) AS neg_avg_logprob
    FROM bigrams b JOIN bg USING (w1, w2) JOIN uni USING (w1)
    GROUP BY b.doc_id
    """,
    doc="Perplexity-style quality filter: corpus-derived bigram LM, "
        "per-doc -avg(ln p(w2|w1)) — the CCNet screening signal. Count "
        "tables are joined by their high-cardinality keys (never "
        "broadcast/collected); decimal log-prob sums keep the score "
        "accumulation-order independent",
)
def q_text_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bigram_lm_score(load(spark, sf_dir, "documents"))


@register(
    "q_text_strip_html",
    """
    WITH wrapped AS (
        SELECT doc_id,
               '<html><body><p class="c">' || text || '</p><br/></body></html>'
                   AS raw
        FROM documents
    )
    SELECT doc_id,
           CAST(length(raw) AS BIGINT) AS raw_chars,
           CAST(length(trim(regexp_replace(regexp_replace(raw,
                    '<[^>]*>', ' ', 'g'), ' +', ' ', 'g'))) AS BIGINT)
               AS text_chars,
           md5(trim(regexp_replace(regexp_replace(raw,
                    '<[^>]*>', ' ', 'g'), ' +', ' ', 'g'))) AS text_hash
    FROM wrapped
    """,
    doc="HTML boilerplate stripping (web-crawl preprocessing): tags -> "
        "space, whitespace collapsed, trimmed — map-only regexp_replace "
        "chain at scan speed. The fixture has no HTML, so the query wraps "
        "each doc in a deterministic tag skeleton first; the REGEXES are "
        "deliberately dialect-portable (no lookaround/backrefs) so Java "
        "(Spark) and RE2 (DuckDB) agree byte-for-byte, pinned by the hash",
)
def q_text_strip_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit('<html><body><p class="c">'),
        F.col("text"),
        F.lit("</p><br/></body></html>"),
    )
    stripped = F.trim(
        F.regexp_replace(F.regexp_replace(raw, "<[^>]*>", " "), " +", " ")
    )
    return docs.select(
        "doc_id",
        F.length(raw).cast("long").alias("raw_chars"),
        F.length(stripped).cast("long").alias("text_chars"),
        F.md5(stripped).alias("text_hash"),
    )


@register(
    "q_corpus_report",
    r"""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS total_words,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           CAST(SUM(length(text)) AS DOUBLE) / COUNT(*) AS avg_chars,
           median(length(text)) AS p50_chars,
           quantile_cont(length(text), 0.9) AS p90_chars,
           CAST(SUM(CASE WHEN len(str_split(text, ' ')) >= 30 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_min_length
    FROM documents
    GROUP BY lang
    """,
    doc="Per-language corpus report: doc/word/char totals, exact length "
        "quantiles, min-length pass count — the dataset card a curation "
        "run publishes. One map-side-combined shuffle on the (bounded) "
        "lang key; integer sums are exact so the report is hash-stable "
        "across engines",
)
def q_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    n_words = F.size(_words())
    ln = F.length("text")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(n_words).cast("long").alias("total_words"),
        F.sum(ln).cast("long").alias("total_chars"),
        (F.sum(ln).cast("double") / F.count("*")).alias("avg_chars"),
        F.median(ln.cast("double")).alias("p50_chars"),
        F.percentile(ln.cast("double"), F.lit(0.9)).alias("p90_chars"),
        F.sum(F.when(n_words >= 30, 1).otherwise(0)).cast("long").alias("n_min_length"),
    )


def source_curation_report(docs: DataFrame, dup_rate_max: float = 0.5,
                           keep_rate_min: float = 0.2) -> DataFrame:
    """Domain-level curation report — the whole-source pruning pass
    web-corpus pipelines run before any per-document screen: a domain
    whose pages are mostly self-copies (scraper traps, mirror farms) or
    mostly quality-filter rejects (spam, boilerplate-only sites) gets
    dropped WHOLESALE, which is both cheaper and higher-precision than
    judging its pages one by one. Per source: doc count, distinct-text
    count, within-source exact-dup rate, quality keep rate (the shared
    Gopher-cascade verdict — quality_verdict_expr), mean words, and a
    ``flagged`` verdict when dup_rate > ``dup_rate_max`` or keep_rate <
    ``keep_rate_min``.

    100 TB shape: map-only verdict/hash projection, then ONE
    map-side-combined groupBy(source) exchange (the distinct-text count
    is a two-phase distinct agg on (source, md5) — 16-byte digests, not
    text). Source cardinality is domain-count-sized, no hot keys."""
    v = quality_verdict_expr()
    per = docs.select(
        "source",
        F.md5("text").alias("th"),
        (v == "keep").cast("int").alias("is_keep"),
        F.size(_words()).alias("nw"),
    )
    n_unique = F.countDistinct("th").cast("long")
    rep = per.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        n_unique.alias("n_unique_texts"),
        F.avg("is_keep").alias("__kr"),
        F.avg(F.col("nw").cast("double")).alias("__mw"),
    )
    # flag on the UNROUNDED rates (the oracle does too): flagging on the
    # 6 dp display columns would diverge from DuckDB for a rate within
    # 5e-7 of a threshold
    dr_raw = F.lit(1.0) - F.col("n_unique_texts") / F.col("n_docs")
    return rep.select(
        "source", "n_docs", "n_unique_texts",
        F.round(dr_raw, 6).alias("dup_rate"),
        F.round("__kr", 6).alias("keep_rate"),
        F.round("__mw", 6).alias("mean_words"),
        ((dr_raw > dup_rate_max) | (F.col("__kr") < keep_rate_min))
        .alias("flagged"),
    )


#: planted scraper-trap source for the curation oracle: 20 identical
#: copies of one literal page — dup_rate 0.95; every copy also fails the
#: gate (exactly 30 words, none a stopword -> verdict 'no_stopwords'),
#: so keep_rate pins the STOPWORD rule, and the flag fires on dup_rate
#: regardless
_TRAP_TEXT = ("spam page spam page spam page spam page spam page spam page "
              "spam page spam page spam page spam page spam page spam page "
              "spam page spam page spam page")


@register(
    "q_source_curation",
    f"""
    WITH aug AS (
        SELECT doc_id, text, source FROM documents
        UNION ALL
        SELECT 90000 + i AS doc_id, '{_TRAP_TEXT}' AS text,
               'src_trap' AS source
        FROM range(20) t(i)
    ),
    s AS (
        SELECT source,
               md5(text) AS th,
               len(str_split(text, ' ')) AS n_words,
               CASE WHEN text IS NULL THEN 0
                    WHEN len(str_split(text, ' ')) < 30 THEN 0
                    WHEN len(str_split(text, ' ')) > 100000 THEN 0
                    WHEN CAST(length(replace(text, ' ', '')) AS DOUBLE)
                         / len(str_split(text, ' ')) < 3
                      OR CAST(length(replace(text, ' ', '')) AS DOUBLE)
                         / len(str_split(text, ' ')) > 12 THEN 0
                    WHEN len(list_filter(str_split(text, ' '),
                             w -> w IN ('the','a','of','and','to','in','is','it')))
                         < 1 THEN 0
                    WHEN CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g'))
                         AS DOUBLE) / length(text) > 0.1 THEN 0
                    WHEN 1 - CAST(len(list_distinct(str_split(text, ' ')))
                         AS DOUBLE) / len(str_split(text, ' ')) > 0.5 THEN 0
                    ELSE 1 END AS is_keep
        FROM aug
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT th) AS BIGINT) AS n_unique_texts,
           ROUND(1.0 - COUNT(DISTINCT th) / CAST(COUNT(*) AS DOUBLE), 6)
               AS dup_rate,
           ROUND(AVG(CAST(is_keep AS DOUBLE)), 6) AS keep_rate,
           ROUND(AVG(CAST(n_words AS DOUBLE)), 6) AS mean_words,
           (1.0 - COUNT(DISTINCT th) / CAST(COUNT(*) AS DOUBLE)) > 0.5
               OR AVG(CAST(is_keep AS DOUBLE)) < 0.2 AS flagged
    FROM s GROUP BY source
    """,
    doc="Domain-level curation: per-source doc/unique-text counts, "
        "within-source dup rate, Gopher-cascade keep rate, mean words, "
        "and a whole-source flag (dup_rate > 0.5 or keep_rate < 0.2) — "
        "the RefinedWeb/FineWeb-style domain pruning pass. A planted "
        "scraper-trap source (20 identical literal pages, derived "
        "identically on both engines) MUST flag; organic sources must "
        "not. One map-side-combined groupBy(source) exchange",
)
def q_source_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "source")
    trap = spark.range(20).select(
        (F.col("id") + 90000).alias("doc_id"),
        F.lit(_TRAP_TEXT).alias("text"),
        F.lit("src_trap").alias("source"),
    )
    return source_curation_report(docs.unionByName(trap))


@register(
    "q_pipeline_curate",
    """
    WITH relined AS (
        SELECT doc_id,
               array_to_string(
                   list_transform(
                       range((len(str_split(text, ' ')) + 2) // 3),
                       i -> array_to_string(
                           str_split(text, ' ')[i*3+1 : i*3+3], ' ')
                   ), chr(10)) AS text
        FROM documents
    ),
    lines AS (
        SELECT doc_id, i AS pos, str_split(text, chr(10))[i+1] AS line
        FROM relined, UNNEST(range(len(str_split(text, chr(10))))) AS t(i)
        WHERE regexp_replace(str_split(text, chr(10))[i+1],
                             '^\\s+|\\s+$', '', 'g') <> ''
    ),
    hot AS (
        SELECT md5(regexp_replace(line, '^\\s+|\\s+$', '', 'g')) AS lh
        FROM lines GROUP BY 1
        HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    rebuilt AS (
        SELECT doc_id, string_agg(line, ' ' ORDER BY pos) AS text
        FROM lines
        WHERE md5(regexp_replace(line, '^\\s+|\\s+$', '', 'g'))
              NOT IN (SELECT lh FROM hot)
        GROUP BY doc_id
    ),
    gated AS (
        SELECT doc_id, text,
               len(str_split(text, ' ')) AS n_words
        FROM rebuilt
        WHERE len(str_split(text, ' ')) >= 30
          AND len(str_split(text, ' ')) <= 100000
          AND CAST(length(replace(text, ' ', '')) AS DOUBLE)
              / len(str_split(text, ' ')) BETWEEN 3 AND 12
          AND len(list_filter(str_split(text, ' '),
                  w -> w IN ('the','a','of','and','to','in','is','it'))) >= 1
          AND CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g'))
              AS DOUBLE) / length(text) <= 0.1
          AND 1 - CAST(len(list_distinct(str_split(text, ' '))) AS DOUBLE)
              / len(str_split(text, ' ')) <= 0.5
    )
    SELECT md5(text) AS text_hash,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(ANY_VALUE(n_words) AS BIGINT) AS n_words
    FROM gated
    GROUP BY md5(text)
    """,
    doc="The batch `curate` COMPOSITION, hash-gated end to end: reline "
        "into 3-word lines -> CCNet line dedup (>= 2 distinct docs) -> "
        "rejoin as space-separated text -> Gopher quality gate on the "
        "CLEANED text -> exact dedup keeping min doc_id. Pins the stage "
        "ORDER semantics (gate sees post-boilerplate text; exact hash is "
        "of the cleaned text), not just each stage alone",
)
def q_pipeline_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import line_dedup, spread_if_narrow

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.split("text", " ")
    relined = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.floor((F.size(words) + 2) / 3).cast("int") - 1,
                ),
                lambda i: F.concat_ws(" ", F.slice(words, i * 3 + 1, 3)),
            ),
        ).alias("text"),
    )
    cleaned = (
        line_dedup(spread_if_narrow(relined), min_dup_docs=2)
        .filter(F.col("clean_text") != "")
        # rejoin as one space-separated line: the gate's word split and
        # the content hash must see words, not line breaks
        .select(
            "doc_id",
            F.replace(F.col("clean_text"), F.lit("\n"), F.lit(" ")).alias("text"),
        )
    )
    gated = cleaned.filter(quality_verdict_expr() == "keep")
    return gated.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").alias("keeper_id"),
        F.count("*").cast("long").alias("n_copies"),
        F.any_value(F.size(_words())).cast("long").alias("n_words"),
    )


# -- lexical retrieval: Okapi BM25 -----------------------------------------


def bm25_scores(docs: DataFrame, query_terms: list[str],
                k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Okapi BM25 score of every document against a seed query — the
    lexical-retrieval primitive corpus curation leans on (seed-similarity
    selection, retrieval-based decontamination, eval-set mining). The
    reference sink has no analytics surface; parity target is the
    training-pipeline brief.

    100 TB shape — NO per-term explode of the corpus: the query is a tiny
    literal, so per-document term frequencies are map-only array HOFs
    over the token array (one pass per doc, whole-stage codegen). The
    only aggregates are |terms|-row document-frequency counts and a
    1-row (N, avgdl) corpus stat, both broadcast back; the quadratic
    "score every doc" stage is embarrassingly map-only. Per-term score
    contributions are rounded and decimal-summed so the result is
    accumulation-order independent (hash-stable vs the oracle).
    """
    words = F.split("text", " ")
    toks = docs.select("doc_id", words.alias("w"), F.size(words).alias("dl"))
    tf_cols = [
        F.size(F.filter(F.col("w"), lambda x: x == F.lit(t))).alias(f"tf_{i}")
        for i, t in enumerate(query_terms)
    ]
    tf = toks.select("doc_id", "dl", *tf_cols)
    # document frequency per query term + corpus stats: two tiny aggs,
    # broadcast back onto the map-only scoring pass
    df_agg = tf.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0)).alias(f"df_{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = tf.crossJoin(F.broadcast(df_agg))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    norm = F.lit(k1) * (F.lit(1 - b) + F.lit(b) * F.col("dl") / avgdl)

    def term(i: int):
        tfi = F.col(f"tf_{i}").cast("double")
        idf = F.log(
            (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5))
            / (F.col(f"df_{i}") + F.lit(0.5))
            + F.lit(1.0)
        )
        contrib = idf * tfi * F.lit(k1 + 1.0) / (tfi + norm)
        return F.round(contrib, 9).cast("decimal(20,9)")

    total = term(0)
    for i in range(1, len(query_terms)):
        total = total + term(i)
    return scored.select(
        "doc_id",
        F.round(total.cast("double"), 6).alias("bm25"),
        F.col("dl").cast("long").alias("n_words"),
    )


_BM25_TERMS = ("spark", "merge", "join", "fast")


def _bm25_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    return f"""
    WITH toks AS (
        SELECT doc_id, str_split(text, ' ') AS w,
               len(str_split(text, ' ')) AS dl
        FROM documents
    ),
    tf AS (
        SELECT doc_id, dl, q.term,
               len(list_filter(w, x -> x = q.term)) AS tf
        FROM toks, (SELECT UNNEST([{terms}]) AS term) q
    ),
    stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM toks),
    dfs AS (
        SELECT term, SUM(CASE WHEN tf > 0 THEN 1 ELSE 0 END) AS df
        FROM tf GROUP BY term
    ),
    contrib AS (
        SELECT tf.doc_id, tf.dl,
               CAST(ROUND(
                   LN((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                   * CAST(tf AS DOUBLE) * 2.2
                   / (CAST(tf AS DOUBLE)
                      + 1.2 * (0.25 + 0.75 * dl
                               / (CAST(sum_dl AS DOUBLE) / n_docs))),
                   9) AS DECIMAL(20,9)) AS c
        FROM tf JOIN dfs USING (term) CROSS JOIN stats
    )
    SELECT doc_id,
           ROUND(CAST(SUM(c) AS DOUBLE), 6) AS bm25,
           CAST(ANY_VALUE(dl) AS BIGINT) AS n_words
    FROM contrib
    GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT 25
    """


@register(
    "q_text_bm25",
    _bm25_oracle(),
    doc="BM25 seed-query retrieval: top-25 documents for a fixed 4-term "
        "query (k1=1.2, b=0.75, Lucene-style +1-inside-log idf). "
        "Map-only per-doc term frequencies (query terms are literals — "
        "no corpus explode), |terms|-row df agg + 1-row corpus stats "
        "broadcast back, TakeOrdered top-k; per-term contributions "
        "rounded to 9 decimals and decimal-summed for order-independent "
        "scores",
)
def q_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    scored = bm25_scores(docs, list(_BM25_TERMS))
    return scored.orderBy(F.col("bm25").desc(), "doc_id").limit(25)


def bm25_scores_batch(docs: DataFrame, queries: DataFrame,
                      k1: float = 1.2, b: float = 0.75,
                      max_doc_freq: int | None = None) -> DataFrame:
    """Okapi BM25 of every document against a TABLE of queries — the
    thousand-query workloads :func:`bm25_scores` (one literal seed query)
    cannot express: eval-set mining, retrieval-based decontamination,
    batched seed-similarity curation. Input ``queries`` is
    (query_id, query) with a whitespace-tokenized query string; repeated
    terms within one query are deduplicated (standard qtf-free Okapi — and
    the double-count hazard ADVICE r5 flagged in cmd_retrieve).

    Returns (query_id, doc_id, bm25, n_terms_matched), one row per
    (query, doc) pair with at least one matching term — the sparse
    retrieval contract (a doc matching no term scores 0 and is omitted),
    which is what makes the batch shape scale: output is |postings ∩
    queries|, never |docs| × |queries|.

    100 TB shape — the inverted-index formulation (VERDICT r5, Next #2),
    NOT one tf column per term (column explosion) and NOT a corpus ×
    queries crossJoin: the corpus is tokenized and exploded map-side, a
    BROADCAST semi-filter on the distinct query-term set drops every
    non-query word before any exchange, and the only corpus-scale shuffle
    is the (term, doc_id) tf aggregate over MATCHED postings. Document
    frequencies are a |terms|-row agg and corpus stats a 1-row agg, both
    broadcast back; the per-(query, doc) score sum shuffles only the
    matched-postings × query fan-out. ``max_doc_freq`` is the hot-term
    guard (jaccard's pattern): a stopword-grade term that appears in
    nearly every document would fan out |corpus| postings for a
    near-zero idf contribution — when set, terms with df > max_doc_freq
    are excluded from scoring (classic stop-term pruning; scores of the
    surviving terms are unchanged). Per-term contributions are rounded
    to 9 decimals and decimal-summed: accumulation-order independent,
    hash-stable vs the oracle."""
    words = F.split("text", " ")
    toks = docs.select("doc_id", words.alias("w"), F.size(words).alias("dl"))
    # corpus stats: 1-row agg, broadcast back onto scoring
    stats = toks.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    qterms = queries.select(
        "query_id",
        F.explode(F.array_distinct(F.split("query", " "))).alias("term"),
    ).filter(F.length("term") > 0)
    term_set = qterms.select("term").distinct()
    # map-side semi filter: every non-query word dies before the exchange
    postings = (
        toks.select("doc_id", "dl", F.explode("w").alias("term"))
        .join(F.broadcast(term_set), "term")
        .groupBy("term", "doc_id", "dl")  # dl is functionally dependent
        .agg(F.count("*").alias("tf"))
    )
    # document frequency as a window over the SAME postings, not a second
    # groupBy branch: a separate dfs aggregate re-derives the whole
    # corpus-explode subtree in the static plan (AQE ReuseExchange is
    # runtime-only), doubling the most expensive stage — the window costs
    # one matched-postings exchange on term instead
    from pyspark.sql import Window

    postings = postings.withColumn(
        "df", F.count("*").over(Window.partitionBy("term"))
    )
    if max_doc_freq is not None:
        # hot-term guard (jaccard's pattern): stop-term pruning, decided
        # per term AFTER the df count — inherent, df must exist to test it
        postings = postings.filter(F.col("df") <= max_doc_freq)
    scored = postings.join(F.broadcast(stats)).join(F.broadcast(qterms), "term")
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    norm = F.lit(k1) * (F.lit(1 - b) + F.lit(b) * F.col("dl") / avgdl)
    tfd = F.col("tf").cast("double")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    contrib = F.round(
        idf * tfd * F.lit(k1 + 1.0) / (tfd + norm), 9
    ).cast("decimal(20,9)")
    return (
        scored.select("query_id", "doc_id", contrib.alias("c"))
        .groupBy("query_id", "doc_id")
        .agg(
            F.round(F.sum("c").cast("double"), 6).alias("bm25"),
            F.count("*").cast("long").alias("n_terms_matched"),
        )
    )


# fixed multi-query fixture for the batch oracle: repeated 'data' in query
# 6 pins the per-query term dedup; query 5 mixes a stopword-grade term in
_BM25_BATCH_QUERIES = (
    (1, "spark merge join fast"),
    (2, "hash join"),
    (3, "vector scan batch"),
    (4, "customer order line"),
    (5, "slow window sort the"),
    (6, "data data column"),
)


def _bm25_batch_oracle() -> str:
    vals = ", ".join(f"({i}, '{q}')" for i, q in _BM25_BATCH_QUERIES)
    return f"""
    WITH q(query_id, query) AS (VALUES {vals}),
    qt AS (
        SELECT query_id, UNNEST(list_distinct(str_split(query, ' '))) AS term
        FROM q
    ),
    toks AS (
        SELECT doc_id, str_split(text, ' ') AS w,
               len(str_split(text, ' ')) AS dl
        FROM documents
    ),
    stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM toks),
    terms AS (SELECT DISTINCT term FROM qt),
    postings AS (
        SELECT term, doc_id, dl, COUNT(*) AS tf
        FROM (SELECT doc_id, dl, UNNEST(w) AS term FROM toks) x
        JOIN terms USING (term)
        GROUP BY term, doc_id, dl
    ),
    dfs AS (SELECT term, COUNT(*) AS df FROM postings GROUP BY term),
    contrib AS (
        SELECT qt.query_id, p.doc_id,
               CAST(ROUND(
                   LN((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                   * CAST(tf AS DOUBLE) * 2.2
                   / (CAST(tf AS DOUBLE)
                      + 1.2 * (0.25 + 0.75 * dl
                               / (CAST(sum_dl AS DOUBLE) / n_docs))),
                   9) AS DECIMAL(20,9)) AS c
        FROM postings p
        JOIN dfs USING (term)
        JOIN qt USING (term)
        CROSS JOIN stats
    ),
    scored AS (
        SELECT query_id, doc_id,
               ROUND(CAST(SUM(c) AS DOUBLE), 6) AS bm25,
               COUNT(*) AS n_terms_matched
        FROM contrib GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, bm25,
           CAST(n_terms_matched AS BIGINT) AS n_terms_matched,
           ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY bm25 DESC, doc_id
           ) AS rank
    FROM scored
    QUALIFY rank <= 10
    """


@register(
    "q_text_bm25_batch",
    _bm25_batch_oracle(),
    doc="Batch BM25 over a 6-query table via the inverted-index "
        "formulation: corpus exploded map-side, broadcast semi-filter on "
        "the distinct query-term set, (term, doc) tf aggregate over "
        "matched postings only, broadcast df/stats/query-terms joins, "
        "per-(query, doc) decimal score sum, top-10 per query. No "
        "corpus x queries crossJoin anywhere in the plan",
)
def q_text_bm25_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .dedup import spread_if_narrow

    # the tokenize+explode+semi-filter pass is the corpus-scale cost:
    # spread a narrow few-file scan across cores (identity at scale),
    # same as the single-query q_text_bm25
    docs = spread_if_narrow(
        load(spark, sf_dir, "documents").select("doc_id", "text")
    )
    from ..operators._helpers import tiny_df

    queries = tiny_df(
        spark, list(_BM25_BATCH_QUERIES), "query_id int, query string"
    )
    scored = bm25_scores_batch(docs, queries)
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), "doc_id"
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "doc_id", "bm25", "n_terms_matched", "rank")
    )


# -- winnowing document fingerprints ---------------------------------------


def _shifted_least(arr: Column, shift: int) -> Column:
    """One doubling pass of the sliding-min: element-wise ``least`` of the
    array against its own ``shift``-shifted self (``least`` ignores the
    null pad zip_with adds at the tail). THE shared core of both
    window-min forms — the nested-expression fold (:func:`_windowed_min`,
    the property-tested spec) and the staged-projection production path
    (:func:`_winnow_selected`)."""
    tail = F.slice(arr, shift + 1, F.greatest(F.size(arr) - shift, F.lit(0)))
    return F.zip_with(arr, tail, lambda x, y: F.least(x, y))


def _doubling_schedule(w: int) -> list[int]:
    """Shift amounts whose composition yields a width-``w`` sliding min:
    spans 1, 2, 4, … then one final overlapped shift for non-powers of 2
    — O(log w) passes. Shared by spec and production (see
    :func:`_shifted_least`) so the two cannot diverge."""
    shifts, span = [], 1
    while span * 2 <= w:
        shifts.append(span)
        span *= 2
    if span < w:
        shifts.append(w - span)
    return shifts


def _windowed_min(hs: Column, w: int) -> Column:
    """Element-wise sliding minimum: out[i] = min(hs[i .. i+w)) for every
    position (trailing entries are partial-window minima — callers slice).

    Sparse-table doubling as ONE nested expression — the property-tested
    specification form. Production (:func:`_winnow_selected`) runs the
    SAME ``_doubling_schedule`` of ``_shifted_least`` passes but stages
    each as its own projection: nesting lets the optimizer inline the
    expensive hash-array child into every self-reference (3^passes
    copies), which only the tiny test arrays can afford."""
    arr = hs
    for shift in _doubling_schedule(w):
        arr = _shifted_least(arr, shift)
    return arr


def winnow_fingerprints(docs: DataFrame, k: int = 12, w: int = 4) -> DataFrame:
    """Winnowing fingerprint selection (the published local fingerprinting
    algorithm behind plagiarism/overlap detectors): hash every character
    ``k``-gram, slide a window of ``w`` consecutive hashes, keep each
    window's minimum — any shared substring of length >= k + w - 1 between
    two documents is GUARANTEED to share a selected fingerprint, at ~2/(w+1)
    the density of the full k-gram set.

    Entirely map-only — per-row array HOFs, zero shuffles: the selected
    set is emitted as an exact count + a sorted-join digest (catalog
    convention: arrays never leave stringified). Hash = first 8 hex chars
    of md5 (engine-portable; lexicographic min on hex strings is a
    uniform random min). Window minima come from the sparse-table
    doubling trick (O(log w) whole-array zip_with passes of pairwise
    ``least``), not a per-position slice-and-min — the slice formulation
    allocated a w-element copy per position and ran ~2.4x slower at
    sf0.1. At 100 TB this is a pure scan-side pass whose output is
    O(docs), the index a downstream overlap join buckets on."""
    return _winnow_selected(docs, k, w).select(
        "doc_id",
        F.size("fps").cast("long").alias("n_fingerprints"),
        # a doc too short (or too null) to yield any fingerprint digests
        # to NULL — "nothing to fingerprint" must stay distinguishable
        # from a real digest, and md5('') differed across engines anyway
        # (DuckDB's array_to_string([]) is NULL; code review r12)
        F.when(
            F.size("fps") > 0, F.md5(F.array_join("fps", ","))
        ).alias("fp_digest"),
    )


def _winnow_selected(docs: DataFrame, k: int, w: int) -> DataFrame:
    """(doc_id, fps): each document's SELECTED winnowing fingerprints as a
    sorted-distinct array — the map-only selection pass shared by the
    digest view (:func:`winnow_fingerprints`) and the overlap-pair join
    (:func:`winnow_overlap_pairs`).

    Every doubling pass of the window-min is staged as its OWN projection
    (the q_text_repetition staging rule: interpreted HOFs get no common-
    subexpression elimination). Building the whole chain as one nested
    expression lets the optimizer inline the per-k-gram md5 transform
    into every one of its ~3^passes self-references — measured 63 copies
    of the hash pass in the pre-explode plan of the pair query, 66 s at
    sf0.1 for a stage that computes once per row in ~1 s. With one
    projection per pass, each intermediate array is a materialized column
    the next pass references by name."""
    n_grams = F.length("text") - k + 1
    h = F.transform(
        F.sequence(F.lit(0), n_grams - 1),
        lambda i: F.substring(F.md5(F.col("text").substr(i + 1, F.lit(k))), 1, 8),
    )
    df = docs.select(
        "doc_id",
        F.when(n_grams > 0, h).otherwise(F.array().cast("array<string>")).alias("h"),
    )
    cur = "h"
    for i, shift in enumerate(_doubling_schedule(w)):
        df = df.select(
            "doc_id", "h", _shifted_least(F.col(cur), shift).alias(f"_m{i}")
        )
        cur = f"_m{i}"
    hs = F.col("h")
    mins = F.slice(F.col(cur), 1, F.greatest(F.size(hs) - w + 1, F.lit(0)))
    fps = F.array_sort(
        F.array_distinct(
            F.when(F.size(hs) >= w, mins)
            .when(F.size(hs) > 0, F.array(F.array_min(hs)))
            .otherwise(F.array().cast("array<string>"))
        )
    )
    return df.select("doc_id", fps.alias("fps"))


def winnow_overlap_pairs(docs: DataFrame, k: int = 16, w: int = 6,
                         min_shared: int = 2,
                         max_fp_freq: int | None = 1000) -> DataFrame:
    """Document pairs sharing winnowing fingerprints — the operator the
    winnowing guarantee exists FOR (VERDICT r5, Next #3): any two
    documents sharing a substring of length >= k + w − 1 are GUARANTEED
    to share a selected fingerprint, so the selected set is a sound JOIN
    key for plagiarism / boilerplate / near-dup detection — no pair with
    a long shared substring can be missed, and the index is ~2/(w+1) the
    size of the full k-gram set. Returns (doc_a, doc_b, n_shared_fps)
    with doc_a < doc_b and n_shared_fps >= ``min_shared`` (raising
    ``min_shared`` trades recall on short overlaps for precision against
    hash-collision noise).

    100 TB shape — exactly jaccard's inverted-index machinery over a far
    sparser posting list: map-only selection (zero shuffles), one
    groupBy(fingerprint) exchange whose collected doc lists carry the
    ``max_fp_freq`` hot-key guard folded into the groupBy filter (a
    boilerplate fingerprint shared by millions of docs would otherwise
    make its join key quadratic), chunked anchored pair expansion
    (:func:`~..dedup._anchored_pair_arrays` — per-row buffer bounded
    linearly in the guard), one map-side-combined pair aggregation."""
    from .dedup import _anchored_pair_arrays, spread_if_narrow

    sel = _winnow_selected(
        spread_if_narrow(docs.select("doc_id", "text")), k, w
    )
    groups = (
        # explode_OUTER + a post-filter on the exploded column, NOT a plain
        # explode: InferFiltersFromGenerate turns explode(fps) into a
        # size(fps)>0 filter pushed BELOW the selection projections, which
        # inlines the md5 k-gram pass into every self-reference of the
        # window-min chain — measured 63 copies / 66 s at sf0.1 vs ~1 s.
        # explode_outer infers nothing (it must keep empty rows); the null
        # row an empty fps produces dies in the cheap exploded-side filter.
        sel.select("doc_id", F.explode_outer("fps").alias("fp"))
        .filter(F.col("fp").isNotNull())
        .groupBy("fp")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ds"))
    )
    if max_fp_freq is not None:
        groups = groups.filter(F.size("ds") <= max_fp_freq)
    return (
        _anchored_pair_arrays(groups)
        .select(F.explode("pair_arr").alias("p")).select("p.*")
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("n_shared_fps"))
        .filter(F.col("n_shared_fps") >= min_shared)
    )


@register(
    "q_text_winnow",
    """
    WITH g AS (
        SELECT doc_id,
               CASE WHEN length(text) - 11 > 0
                    THEN list_transform(
                        range(length(text) - 11),
                        i -> substr(md5(substr(text, i + 1, 12)), 1, 8))
                    ELSE [] END AS h
        FROM documents
    ),
    sel AS (
        SELECT doc_id,
               list_sort(list_distinct(
                   CASE WHEN len(h) >= 4
                        THEN list_transform(
                            range(len(h) - 3),
                            j -> list_aggregate(h[j+1:j+4], 'min'))
                        WHEN len(h) > 0
                        THEN [list_aggregate(h, 'min')]
                        ELSE [] END
               )) AS fps
        FROM g
    )
    SELECT doc_id,
           CAST(len(fps) AS BIGINT) AS n_fingerprints,
           md5(array_to_string(fps, ',')) AS fp_digest
    FROM sel
    """,
    doc="Winnowing fingerprint selection (k=12, w=4): window-min of char "
        "k-gram hashes, guaranteeing any shared substring of length >= 15 "
        "surfaces in both documents' fingerprint sets. Map-only, zero "
        "shuffles; exact count + sorted-join digest per document",
)
def q_text_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import spread_if_narrow

    # map-only and md5-per-k-gram-bound: spread a narrow few-file scan so
    # every core hashes (identity on a wide cluster scan)
    docs = spread_if_narrow(load(spark, sf_dir, "documents").select("doc_id", "text"))
    return winnow_fingerprints(docs, k=12, w=4)


@register(
    "q_dedup_winnow_pairs",
    """
    WITH g AS (
        SELECT doc_id,
               CASE WHEN length(text) - 15 > 0
                    THEN list_transform(
                        range(length(text) - 15),
                        i -> substr(md5(substr(text, i + 1, 16)), 1, 8))
                    ELSE [] END AS h
        FROM documents
    ),
    sel AS (
        SELECT doc_id,
               list_distinct(
                   CASE WHEN len(h) >= 6
                        THEN list_transform(
                            range(len(h) - 5),
                            j -> list_aggregate(h[j+1:j+6], 'min'))
                        WHEN len(h) > 0
                        THEN [list_aggregate(h, 'min')]
                        ELSE [] END
               ) AS fps
        FROM g
    ),
    fp_all AS (SELECT doc_id, UNNEST(fps) AS fp FROM sel),
    fp AS (
        SELECT fp_all.doc_id, fp_all.fp FROM fp_all
        JOIN (SELECT fp FROM fp_all GROUP BY fp
              HAVING COUNT(*) <= 1000) ok USING (fp)
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared_fps
    FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= 2
    """,
    doc="Winnowing overlap pairs (k=16, w=6): the guarantee (shared "
        "substring >= 21 chars => shared selected fingerprint) makes the "
        "fingerprints a sound near-dup/plagiarism JOIN key. Inverted-"
        "index pair expansion with the max_fp_freq<=1000 hot-key guard "
        "on BOTH engines; pairs kept at >= 2 shared fingerprints",
)
def q_dedup_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return winnow_overlap_pairs(docs, k=16, w=6, min_shared=2,
                                max_fp_freq=1000)


def winnow_decontaminate(train: DataFrame, eval_set: DataFrame,
                         k: int = 16, w: int = 6) -> DataFrame:
    """Character-level benchmark decontamination with the winnowing
    GUARANTEE: any training document sharing a substring of length >=
    k + w − 1 characters with an eval document MUST surface (shared
    substring ⇒ shared selected fingerprint), at ~2/(w+1) the index
    density of full k-gram hashing. Complements the word-n-gram scan
    (:func:`~.dedup.decontaminate`): n-grams miss contamination that
    crosses tokenization (punctuation/casing/whitespace edits shift word
    boundaries), fingerprints operate on raw characters.

    Same asymmetric 100 TB shape as the n-gram scan: the eval side is
    benchmark-suite-sized, so its fingerprint index BROADCASTS; the
    train side is one map-only selection pass (explode_outer + post-
    filter — see winnow_overlap_pairs for why a plain explode is a 63x
    inlining trap) and the only shuffle is the final doc_id-keyed agg.
    Returns (doc_id, n_fps_hit, n_eval_docs) per contaminated doc."""
    from .dedup import spread_if_narrow

    def fps_of(docs: DataFrame, id_alias: str) -> DataFrame:
        return (
            _winnow_selected(docs.select("doc_id", "text"), k, w)
            .select(
                F.col("doc_id").alias(id_alias),
                F.explode_outer("fps").alias("fp"),
            )
            .filter(F.col("fp").isNotNull())
        )

    train_fp = fps_of(spread_if_narrow(train), "doc_id")
    # spread the EVAL side too (optimization r13, guide §2.5): its
    # fingerprint selection feeds the broadcast build, and an unspread
    # single-file scan ran the whole md5-per-k-gram pass in ONE task
    # (0.47 s serialized at sf0.1 in the stage profile) while the rest of
    # the box idled — identical class to the train-side spread
    eval_fp = fps_of(spread_if_narrow(eval_set), "eval_doc")
    return (
        train_fp.join(F.broadcast(eval_fp), "fp")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("fp").cast("long").alias("n_fps_hit"),
            F.countDistinct("eval_doc").cast("long").alias("n_eval_docs"),
        )
    )


@register(
    "q_decontaminate_winnow",
    """
    WITH g AS (
        SELECT doc_id,
               CASE WHEN length(text) - 15 > 0
                    THEN list_transform(
                        range(length(text) - 15),
                        i -> substr(md5(substr(text, i + 1, 16)), 1, 8))
                    ELSE [] END AS h
        FROM documents
    ),
    sel AS (
        SELECT doc_id,
               list_distinct(
                   CASE WHEN len(h) >= 6
                        THEN list_transform(
                            range(len(h) - 5),
                            j -> list_aggregate(h[j+1:j+6], 'min'))
                        WHEN len(h) > 0
                        THEN [list_aggregate(h, 'min')]
                        ELSE [] END
               ) AS fps
        FROM g
    ),
    fp AS (SELECT doc_id, UNNEST(fps) AS fp FROM sel),
    eval_fp AS (SELECT doc_id AS eval_doc, fp FROM fp WHERE doc_id % 7 = 0),
    train_fp AS (SELECT doc_id, fp FROM fp WHERE doc_id % 7 <> 0)
    SELECT t.doc_id,
           CAST(COUNT(DISTINCT t.fp) AS BIGINT) AS n_fps_hit,
           CAST(COUNT(DISTINCT e.eval_doc) AS BIGINT) AS n_eval_docs
    FROM train_fp t JOIN eval_fp e ON t.fp = e.fp
    GROUP BY t.doc_id
    """,
    doc="Character-level decontamination via winnowing fingerprints "
        "(k=16, w=6): a training doc sharing any >= 21-char substring "
        "with the eval split (doc_id % 7 = 0) is GUARANTEED to surface — "
        "catches contamination that word-n-gram scans miss across "
        "tokenization edits. Broadcast eval fingerprint index, map-only "
        "train selection, one doc_id-keyed agg shuffle",
)
def q_decontaminate_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return winnow_decontaminate(
        docs.filter(F.col("doc_id") % 7 != 0),
        docs.filter(F.col("doc_id") % 7 == 0),
        k=16, w=6,
    )


@register(
    "q_text_hashing_tf_delta",
    r"""
    WITH w AS (
        SELECT doc_id,
               str_split(lower(trim(regexp_replace(
                   COALESCE(text, ''), '\s+', ' ', 'g'))), ' ') AS ws
        FROM documents
    )
    SELECT doc_id,
           CAST(GREATEST(len(ws) - 1, 0) AS BIGINT) AS n_bigrams,
           CAST(len(list_distinct(
               list_transform(range(len(ws) - 1),
                              i -> ws[i+1] || ' ' || ws[i+2])
           )) AS BIGINT) AS n_distinct_bigrams,
           TRUE AS tf_mass_ok,
           TRUE AS nnz_bounded
    FROM w
    """,
    doc="HASHABLE companion for the MLlib HashingTF pipeline (the "
        "q_agg_approx_delta pattern): the hashed buckets are murmur3-"
        "specific, but total term MASS is not — the sparse vector's L1 "
        "must equal the exact bigram count (no tokens dropped or double-"
        "counted by Tokenizer→NGram→HashingTF), and the bucket count "
        "must sit in [1 if any grams else 0, min(distinct bigrams, "
        "numFeatures)] (collisions only merge). The oracle computes both "
        "exact counts in SQL and claims the booleans TRUE",
)
def q_text_hashing_tf_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    tf_out = q_text_hashing_tf(spark, sf_dir)
    # the SAME null-safe whitespace normalization q_text_hashing_tf
    # applies at its input — the mass claim is only engine-independent
    # on normalized text (code review r12)
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.trim(F.regexp_replace(
            F.coalesce(F.col("text"), F.lit("")), r"\s+", " "
        )).alias("text"),
    )
    words = F.split(F.lower("text"), " ")
    # guard, not greatest(…, -1): sequence(0, -1) DESCENDS in Spark
    # ([0, -1]), so a single-word doc would call element_at(words, 0)
    # and element_at(words, 2) — both ANSI errors — instead of an empty
    # bigram list (the when(size >= 2) rule every sibling uses)
    bigrams = F.when(
        F.size(words) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - 2),
            lambda i: F.concat_ws(
                " ", F.element_at(words, i + 1), F.element_at(words, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    expected = docs.select(
        "doc_id",
        F.greatest(F.size(words) - 1, F.lit(0)).cast("long").alias("n_bigrams"),
        F.size(F.array_distinct(bigrams)).cast("long").alias("n_distinct_bigrams"),
    )
    lo = F.when(F.col("n_bigrams") == 0, 0).otherwise(1)
    hi = F.least(F.col("n_distinct_bigrams"), F.lit(1 << 12))
    return expected.join(tf_out, "doc_id").select(
        "doc_id",
        "n_bigrams",
        "n_distinct_bigrams",
        (F.col("total_terms") == F.col("n_bigrams")).alias("tf_mass_ok"),
        ((F.col("nnz") >= lo) & (F.col("nnz") <= hi)).alias("nnz_bounded"),
    )


@register(
    "q_corpus_diversity",
    """
    WITH w AS (
        SELECT lang, doc_id, UNNEST(str_split(text, ' ')) AS w1
        FROM documents
    ),
    b AS (
        SELECT lang,
               str_split(text, ' ')[i+1] || ' ' || str_split(text, ' ')[i+2]
                   AS gram
        FROM documents,
             UNNEST(range(len(str_split(text, ' ')) - 1)) AS t(i)
        WHERE len(str_split(text, ' ')) >= 2
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT w1) AS BIGINT) AS n_types,
           ROUND(COUNT(DISTINCT w1) / CAST(COUNT(*) AS DOUBLE), 6)
               AS type_token_ratio,
           (SELECT ROUND(COUNT(DISTINCT gram) / CAST(COUNT(*) AS DOUBLE), 6)
            FROM b WHERE b.lang = w.lang) AS distinct_bigram_ratio
    FROM w
    GROUP BY lang
    """,
    doc="Corpus diversity report (the self-BLEU-adjacent health metric a "
        "dataset card carries): per language, token count, vocabulary "
        "size, type-token ratio, and distinct-bigram ratio — a collapsing "
        "(template-spam) corpus shows falling ratios long before eyeballs "
        "catch it. Two count-distinct aggregates on the bounded lang key; "
        "the n-gram side reuses the LM tokenization so the two reports "
        "can never diverge",
)
def q_corpus_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .lm import _doc_bigrams

    docs = load(spark, sf_dir, "documents").select("lang", "doc_id", "text")
    words = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("w1")
    )
    uni = words.groupBy("lang").agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("w1").alias("n_types"),
    )
    bigs = _doc_bigrams(docs.select(F.col("lang").alias("doc_id"), "text"))
    bg = (
        bigs.select(
            F.col("doc_id").alias("lang"),
            F.concat_ws(" ", "w1", "w2").alias("gram"),
        )
        .groupBy("lang")
        .agg(
            F.round(
                F.countDistinct("gram") / F.count("*").cast("double"), 6
            ).alias("distinct_bigram_ratio")
        )
    )
    # LEFT join: a language whose docs are all single-word has no bigrams
    # at all — it must surface with a NULL ratio (matching the oracle's
    # correlated subquery over zero rows), not silently vanish from the
    # report (ADVICE r8)
    return uni.join(bg, "lang", "left").select(
        "lang", "n_tokens", "n_types",
        F.round(
            F.col("n_types") / F.col("n_tokens").cast("double"), 6
        ).alias("type_token_ratio"),
        "distinct_bigram_ratio",
    )
