"""Persisted bigram language model: CCNet's fluency filter as a LAKE ARTIFACT.

``text.bigram_lm_score`` scores a corpus under a model derived from THAT
corpus — right for a self-contained fluency signal, but the production
CCNet shape trains the LM on a TARGET domain (Wikipedia) and scores the
CRAWL with it: "does this document read like the reference domain". That
requires the model to outlive the corpus that trained it:

  ``{lm_dir}/unigrams/w_bucket={b}/``  (w1, c_uni) counts
  ``{lm_dir}/bigrams/w_bucket={b}/``   (w1, w2, c_bg) counts
  ``{lm_dir}/_LM_META.json``           n_tokens, vocab size, the COMMIT
                                       MARKER (deleted first on rebuild —
                                       the index-family crash protocol)

Cross-corpus scoring meets words the training corpus never saw, so the
persisted path scores with ADD-ALPHA smoothing:

    p(w2 | w1) = (c_bg + alpha) / (c_uni + alpha * V)

(V = training vocabulary size from the meta; an unseen w1 degrades to the
uniform 1/V; an unseen bigram under a seen w1 gets the discounted mass).
alpha is a QUERY-TIME argument — the artifact stores raw counts, so
retuning costs nothing (the lexical-index rule: no trained artifact, no
freeze drift).

Scale shape: counts are vocabulary-scale tables, so they are JOINED
(shuffle partitioned by the high-cardinality word key — never broadcast,
never collected), exactly the in-memory formulation's plan; bucketing by
``crc32(w1)`` bounds file sizes and keeps both tables co-partitioned by
the join key's prefix. Scoring shuffles the scored corpus's bigrams once
into that join and aggregates per doc_id once.

Hash stability: same rules as bigram_lm_score — each ln() rounds to 9 dp
(absorbing libm ulp differences), sums go through DECIMAL, the average
rounds to 6 dp — so the catalog entry hash-matches DuckDB exactly.

Streaming growth: ``append_epoch_to_bigram_lm`` is the replay-safe form —
each micro-batch's (w1[, w2], count) DELTAS land under
``epochs/epoch={id}/{unigrams,bigrams}/w_bucket={b}/`` and are OVERWRITTEN
per epoch (the idempotence contract shared with the ANN/lexical indexes and
every corpus-builder artifact), with the batch's (n_tokens, n_docs) delta
as ``_EPOCH_STATS.json`` written LAST — an epoch with counts but no stats
file is a detectable crash the replay repairs. Unlike postings, the same
(w1, w2) recurs across epochs, so reads SUM-MERGE base + epochs (counts
are the canonical sum-mergeable state — the reason a count-table LM can
grow incrementally at all) and the vocabulary is recomputed from the
merged unigrams (distinct words are NOT sum-mergeable). ``lm-compact``
folds the per-batch deltas into one ``epoch=-1`` dir via the shared
write-ahead manifest-swap protocol (foldswap.py), as a groupBy-SUM rather
than a concatenation. Appending requires ``min_count == 1``: a pruned base
already forgot its sub-threshold bigram counts, so no merge of deltas can
reproduce what a full retrain would keep — the append refuses loudly
instead of drifting; prune at release time on a frozen model.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..fsio import HadoopFS, url_join
from ..tables import load

_META = "_LM_META.json"
_EPOCH_STATS = "_EPOCH_STATS.json"
_UNI_SCHEMA = "w1 string, c_uni long, w_bucket int"
_BG_SCHEMA = "w1 string, w2 string, c_bg long, w_bucket int"


def _words(docs: DataFrame):
    return F.split("text", " ")


def _doc_bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, w1, w2) — one row per bigram occurrence, short-doc
    guarded; the tokenization shared by training and scoring (identical
    to text.bigram_lm_score's, so the two formulations can never
    tokenize apart)."""
    words = _words(docs)
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
    return docs.select("doc_id", F.explode(guarded).alias("b")).select(
        "doc_id", "b.w1", "b.w2"
    )


def _count_tables(docs: DataFrame, n_buckets: int, min_count: int = 1):
    """The (unigram, bigram, corpus-stats) count construction shared by
    the full train and the per-epoch append — one tokenizer, one bucket
    function, so the two paths can never count apart."""
    from .dedup import spread_if_narrow

    src = spread_if_narrow(docs.select("doc_id", "text"))
    bucket = lambda col: (F.crc32(F.encode(col, "UTF-8")) % n_buckets) \
        .cast("int").alias("w_bucket")
    uni = (
        src.select(F.explode(_words(src)).alias("w1"))
        .groupBy("w1").agg(F.count("*").alias("c_uni"))
        .withColumn("w_bucket", bucket(F.col("w1")))
    )
    bg = (
        _doc_bigrams(src).groupBy("w1", "w2")
        .agg(F.count("*").alias("c_bg"))
        .filter(F.col("c_bg") >= min_count)
        .withColumn("w_bucket", bucket(F.col("w1")))
    )
    stats = src.agg(
        F.coalesce(F.sum(F.size(_words(src))), F.lit(0)).alias("n_tokens"),
        F.count("*").alias("n_docs"),
    ).collect()[0]
    return uni, bg, stats


def write_bigram_lm(docs: DataFrame, lm_dir: str,
                    n_buckets: int = 64, min_count: int = 1) -> dict:
    """Count the training corpus once into bucketed unigram/bigram tables
    + a meta commit marker. Rebuild overwrites under the index-family
    crash protocol (meta deleted first; reads refuse marker-less dirs).

    ``min_count`` prunes bigrams seen fewer times from the persisted
    table — the standard production-LM size bound (a crawl-scale bigram
    table is dominated by hapax pairs that carry almost no signal; KenLM
    ships pruned for the same reason). Unigram counts stay COMPLETE so
    the smoothing denominator is exact: a pruned bigram scores as unseen
    (alpha mass over the true c_uni), never as out-of-vocabulary."""
    spark = docs.sparkSession
    fs = HadoopFS(spark, lm_dir)
    _purge_vocab_memo(lm_dir)
    uni, bg, stats = _count_tables(docs, n_buckets, min_count)
    meta_path = url_join(lm_dir, _META)
    if fs.exists(meta_path):
        fs.delete(meta_path, recursive=False)
    # a rebuild supersedes any streaming deltas (the caller retrains FROM
    # the grown corpus) — same rule as write_lexical_index's epoch clear
    ep_root = url_join(lm_dir, "epochs")
    if fs.exists(ep_root):
        fs.delete(ep_root, recursive=True)
    # release the old stream's epoch-history binding with the epochs it
    # covered — a retrain adopts the model for whatever appends next
    # (code review r12)
    stream_marker = url_join(lm_dir, "_STREAM_ID")
    if fs.exists(stream_marker):
        fs.delete(stream_marker, recursive=False)
    uni.write.mode("overwrite").partitionBy("w_bucket").parquet(
        url_join(lm_dir, "unigrams")
    )
    bg.write.mode("overwrite").partitionBy("w_bucket").parquet(
        url_join(lm_dir, "bigrams")
    )
    vocab = spark.read.schema(_UNI_SCHEMA).parquet(
        url_join(lm_dir, "unigrams")
    ).count()
    meta = {
        "n_buckets": int(n_buckets),
        "n_tokens": int(stats.n_tokens),
        "n_docs": int(stats.n_docs),
        "vocab": int(vocab),
        "min_count": int(min_count),
    }
    fs.write_bytes(meta_path, json.dumps(meta).encode())
    return meta


def read_lm_meta(spark: SparkSession, lm_dir: str) -> dict:
    fs = HadoopFS(spark, lm_dir)
    meta_path = url_join(lm_dir, _META)
    if not fs.exists(meta_path):
        raise FileNotFoundError(
            f"bigram LM at {lm_dir!r} has no {_META} — either it was never "
            "trained (write_bigram_lm / `lm-train`) or a rebuild crashed "
            "mid-overwrite; retrain before scoring with it"
        )
    return json.loads(fs.read_bytes(meta_path))


def append_epoch_to_bigram_lm(new_docs: DataFrame, lm_dir: str,
                              epoch_id: int) -> None:
    """Replay-safe streaming append: the batch's unigram/bigram count
    DELTAS overwrite ``epochs/epoch={id}/`` (bucket partitioning
    preserved, so merged reads stay co-partitioned by the join-key
    prefix) and its (n_tokens, n_docs) delta lands as _EPOCH_STATS.json
    beside them — written LAST, so an epoch with counts but no stats
    file is a detectable crash the replayed batch repairs by overwriting
    its own epoch dir by name. Requires a min_count=1 base: a pruned
    base already forgot its sub-threshold bigram counts, so no delta
    merge can equal a retrain — refuse loudly rather than drift."""
    spark = new_docs.sparkSession
    meta = read_lm_meta(spark, lm_dir)
    if int(meta.get("min_count", 1)) > 1:
        raise ValueError(
            f"bigram LM at {lm_dir!r} was trained with min_count="
            f"{meta['min_count']} — a count-pruned base cannot accept "
            "exact streaming appends (the pruned bigram counts are gone; "
            "merged deltas would under-count what a retrain keeps). "
            "Retrain with min_count=1 (the default) to make the LM "
            "appendable; prune only as a terminal step on a frozen model"
        )
    fs = HadoopFS(spark, lm_dir)
    _purge_vocab_memo(lm_dir)
    ep_dir = url_join(lm_dir, "epochs", f"epoch={int(epoch_id)}")
    # clear a previous attempt's stats first: a replay that crashes
    # before its own stats write must not leave the OLD attempt's stats
    # beside the NEW attempt's counts
    stats_path = url_join(ep_dir, _EPOCH_STATS)
    if fs.exists(stats_path):
        fs.delete(stats_path, recursive=False)
    uni, bg, stats = _count_tables(new_docs, meta["n_buckets"])
    uni.write.mode("overwrite").partitionBy("w_bucket").parquet(
        url_join(ep_dir, "unigrams")
    )
    bg.write.mode("overwrite").partitionBy("w_bucket").parquet(
        url_join(ep_dir, "bigrams")
    )
    fs.write_bytes(stats_path, json.dumps(
        {"n_tokens": int(stats.n_tokens), "n_docs": int(stats.n_docs)}
    ).encode())


def _read_epoch_stats(fs: HadoopFS, ep_dir: str, name: str) -> dict:
    stats_path = url_join(ep_dir, _EPOCH_STATS)
    if not fs.exists(stats_path):
        raise FileNotFoundError(
            f"bigram LM epoch {name} has count tables but no "
            f"{_EPOCH_STATS} — its append crashed between the counts "
            "write and the stats write; replay the batch (the epoch "
            "overwrite repairs both)"
        )
    return json.loads(fs.read_bytes(stats_path))


def _committed_epochs(fs: HadoopFS, lm_dir: str) -> list[str]:
    """Epoch dir NAMES under ``epochs/`` holding committed count deltas —
    tolerant of a crashed ``lm-compact`` (the ann_topk manifest-aware-read
    pattern): ``commit_fold`` deletes its source epoch dirs BEFORE renaming
    ``epochs/_compact`` into ``epoch=-1``, so a crash in that window leaves
    the folded counts ONLY in ``_compact`` (its ``_MERGED.json`` manifest
    still inside — the commit record). A plain ``epoch=`` listing would
    silently DROP those counts from scoring until the compact is re-run;
    instead, when an armed ``_compact`` exists, read it in place of the
    exact sources its manifest names (any source the crash had not yet
    deleted is excluded — its counts are already summed into the fold, and
    double-counting would be as wrong as dropping). A ``_compact`` WITHOUT
    a manifest never committed and its sources are intact — ignored."""
    from ..foldswap import tolerant_epoch_names

    return tolerant_epoch_names(fs, url_join(lm_dir, "epochs"))


# merged-vocab memo: recomputing |distinct w1| over the merged unigrams is
# an eager shuffle+count job, and the corpus-stream fluency gate calls
# score_with_lm once PER MICRO-BATCH against the same grown model — without
# the memo every batch pays that job before its scoring plan even starts.
# Keyed on (lm_dir, base-meta stats, per-epoch (name, stats) fingerprint,
# meta-file (bytes, mtime) stamp): an epoch append/compact/replay changes
# the committed-epoch set or its stats deltas, so a stale hit would need an
# epoch whose dir name AND both count totals survived a content change —
# excluded by the append protocol (replay overwrites an epoch by name only
# to converge to identical counts) — and an out-of-band rebuild from
# another process rewrites the meta file, changing its stamp.
_VOCAB_MEMO: dict = {}


def _purge_vocab_memo(lm_dir: str) -> None:
    """Drop memo entries for one model dir — called by every SAME-PROCESS
    writer mutation (rebuild / append / compact), closing the residual
    stale-hit window where a rebuild plus a fresh-checkpoint epoch-id
    reset reproduces the full (base stats, epoch name, epoch stats) key
    with different underlying counts. A writer in ANOTHER process cannot
    purge this one's memo, but the memo key also carries the meta file's
    (bytes, mtime) stamp — a rebuild rewrites meta, so cross-process
    staleness requires a same-length same-millisecond meta rewrite on
    top of the logical-key collision."""
    from ..fsio import normalize_store_url

    key = normalize_store_url(lm_dir)
    for k in [k for k in _VOCAB_MEMO if k[0] == key]:
        del _VOCAB_MEMO[k]


def merged_lm_state(spark: SparkSession, lm_dir: str):
    """(unigrams, bigrams, effective-stats) as of base + every appended
    epoch. With no epochs this is exactly the base read (no extra
    aggregate — the batch-only path's plan is unchanged); with epochs the
    counts SUM-merge (shuffle keyed on the word — vocabulary-scale, never
    collected) and the vocabulary is recomputed from the merged unigrams,
    since distinct-word counts are not sum-mergeable across overlapping
    epochs — once per (lm_dir, committed-epoch set), memoized after that.
    A marker-less epoch dir raises (crash detection); a crash-stranded
    ``_compact`` fold is read in place of the sources its manifest names
    (see :func:`_committed_epochs`)."""
    meta = read_lm_meta(spark, lm_dir)
    fs = HadoopFS(spark, lm_dir)
    uni = spark.read.schema(_UNI_SCHEMA).parquet(
        url_join(lm_dir, "unigrams")
    ).select("w1", "c_uni")
    bg = spark.read.schema(_BG_SCHEMA).parquet(
        url_join(lm_dir, "bigrams")
    ).select("w1", "w2", "c_bg")
    epochs = _committed_epochs(fs, lm_dir)
    stats = {
        "n_tokens": int(meta["n_tokens"]),
        "n_docs": int(meta["n_docs"]),
        "vocab": int(meta["vocab"]),
        "n_epochs": len(epochs),
    }
    if not epochs:
        return uni, bg, stats
    ep_root = url_join(lm_dir, "epochs")
    ep_fp = []
    for e in epochs:
        s = _read_epoch_stats(fs, url_join(ep_root, e), e)
        stats["n_tokens"] += int(s["n_tokens"])
        stats["n_docs"] += int(s["n_docs"])
        ep_fp.append((e, int(s["n_tokens"]), int(s["n_docs"])))
    # per-epoch reads unioned (a multi-path read trips partition
    # discovery on the epoch= dir mid-path); compaction bounds the
    # epoch count, and the union collapses into the one sum shuffle
    uni = _union_epoch_reads(
        spark, uni, _UNI_SCHEMA, ("w1", "c_uni"),
        [url_join(ep_root, e, "unigrams") for e in epochs],
    ).groupBy("w1").agg(F.sum("c_uni").alias("c_uni"))
    bg = _union_epoch_reads(
        spark, bg, _BG_SCHEMA, ("w1", "w2", "c_bg"),
        [url_join(ep_root, e, "bigrams") for e in epochs],
    ).groupBy("w1", "w2").agg(F.sum("c_bg").alias("c_bg"))
    from ..fsio import normalize_store_url

    # normalized dir in the key so writer purges and reader lookups agree
    # on relative-vs-absolute spellings of the same model dir; the meta
    # file's (bytes, mtime) stamp — one getFileStatus RPC per lookup —
    # makes CROSS-PROCESS staleness practically unreachable: an
    # out-of-band rebuild that reproduces the full logical key (base
    # stats + epoch names + epoch stats, e.g. a retrain plus a
    # fresh-checkpoint epoch-id reset) still rewrites meta and so misses
    # the memo (ADVICE r10)
    memo_key = (normalize_store_url(lm_dir), int(meta["vocab"]),
                int(meta["n_tokens"]), int(meta["n_docs"]), tuple(ep_fp),
                fs.file_stamp(url_join(lm_dir, _META)))
    if memo_key not in _VOCAB_MEMO:
        if len(_VOCAB_MEMO) >= 256:  # bound a long-lived session's memo
            _VOCAB_MEMO.clear()
        _VOCAB_MEMO[memo_key] = uni.count()
    stats["vocab"] = _VOCAB_MEMO[memo_key]
    return uni, bg, stats


def _union_epoch_reads(spark: SparkSession, acc: DataFrame, schema: str,
                       cols: tuple[str, ...], dirs: list[str]) -> DataFrame:
    for d in dirs:
        acc = acc.unionByName(
            spark.read.schema(schema).parquet(d).select(*cols)
        )
    return acc


def compact_lm_epochs(spark: SparkSession, lm_dir: str,
                      min_epochs: int = 2) -> bool:
    """Fold per-batch count deltas into one ``epoch=-1`` dir — bounds the
    O(epochs) listing a long-running corpus stream accumulates. Same
    write-ahead manifest-swap protocol and rules as the ANN/lexical
    compactors (run only against a stopped stream; the HIGHEST-numbered
    epoch is never folded — a crashed batch's replay relies on
    overwriting its own epoch dir by name), but the fold is a
    groupBy-SUM merge, not a concatenation: the same (w1, w2) recurs
    across epochs and the folded table must carry the summed count."""
    from ..foldswap import (
        commit_fold,
        foldable_epoch_names,
        write_fold_manifest,
    )

    fs = HadoopFS(spark, lm_dir)
    _purge_vocab_memo(lm_dir)
    ep_root = url_join(lm_dir, "epochs")
    epochs = foldable_epoch_names(fs, ep_root, min_epochs)
    if epochs is None:
        return False
    stats = {"n_tokens": 0, "n_docs": 0}
    for e in epochs:
        s = _read_epoch_stats(fs, url_join(ep_root, e), e)
        stats["n_tokens"] += int(s["n_tokens"])
        stats["n_docs"] += int(s["n_docs"])
    tmp = url_join(ep_root, "_compact")
    meta = read_lm_meta(spark, lm_dir)
    n_buckets = int(meta["n_buckets"])
    bucket = lambda col: (F.crc32(F.encode(col, "UTF-8")) % n_buckets) \
        .cast("int").alias("w_bucket")
    empty_uni = spark.createDataFrame([], _UNI_SCHEMA).select("w1", "c_uni")
    empty_bg = spark.createDataFrame([], _BG_SCHEMA).select(
        "w1", "w2", "c_bg"
    )
    uni = (
        _union_epoch_reads(
            spark, empty_uni, _UNI_SCHEMA, ("w1", "c_uni"),
            [url_join(ep_root, e, "unigrams") for e in epochs],
        )
        .groupBy("w1").agg(F.sum("c_uni").alias("c_uni"))
        .withColumn("w_bucket", bucket(F.col("w1")))
    )
    bg = (
        _union_epoch_reads(
            spark, empty_bg, _BG_SCHEMA, ("w1", "w2", "c_bg"),
            [url_join(ep_root, e, "bigrams") for e in epochs],
        )
        .groupBy("w1", "w2").agg(F.sum("c_bg").alias("c_bg"))
        .withColumn("w_bucket", bucket(F.col("w1")))
    )
    uni.write.mode("overwrite").partitionBy("w_bucket").parquet(
        url_join(tmp, "unigrams")
    )
    bg.write.mode("overwrite").partitionBy("w_bucket").parquet(
        url_join(tmp, "bigrams")
    )
    fs.write_bytes(url_join(tmp, _EPOCH_STATS), json.dumps(stats).encode())
    write_fold_manifest(fs, tmp, epochs)
    commit_fold(fs, ep_root, "_compact", epochs)
    return True


def score_with_lm(spark: SparkSession, lm_dir: str, docs: DataFrame,
                  alpha: float = 0.1) -> DataFrame:
    """Per-document fluency under the PERSISTED model: (doc_id,
    n_bigrams, neg_avg_logprob) with add-alpha smoothing, so documents
    full of words the training domain never saw score high (garbled /
    off-domain) instead of crashing the join. Single-word docs report
    n_bigrams=0 with a null score — 'nothing to measure' stays
    distinguishable from 'fluent'. Scores against base + every appended
    epoch (merged_lm_state), so a streaming-grown model is current
    without a retrain; with no epochs the plan is the plain base read."""
    uni, bg, stats = merged_lm_state(spark, lm_dir)
    v = float(stats["vocab"]) if stats["vocab"] > 0 else 1.0
    from .dedup import spread_if_narrow

    bigrams = _doc_bigrams(spread_if_narrow(docs.select("doc_id", "text")))
    joined = (
        bigrams.join(bg, ["w1", "w2"], "left")
        .join(uni, "w1", "left")
        .select(
            "doc_id",
            F.coalesce("c_bg", F.lit(0)).alias("c_bg"),
            F.coalesce("c_uni", F.lit(0)).alias("c_uni"),
        )
    )
    lp = F.round(
        F.log(
            (F.col("c_bg") + F.lit(alpha))
            / (F.col("c_uni") + F.lit(alpha) * F.lit(v))
        ),
        9,
    ).cast("decimal(12,9)")
    scored = (
        joined.select("doc_id", lp.alias("lp"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_bigrams"), F.sum("lp").alias("slp"))
        .select(
            "doc_id", "n_bigrams",
            F.round(
                -F.col("slp").cast("double") / F.col("n_bigrams"), 6
            ).alias("neg_avg_logprob"),
        )
    )
    return (
        docs.select("doc_id").distinct()
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0).cast("long")).alias("n_bigrams"),
            "neg_avg_logprob",
        )
    )


_LM_ALPHA = 0.1


@register(
    "q_text_perplexity_lm",
    f"""
    WITH train AS (SELECT doc_id, text FROM documents WHERE lang = 'en'),
    uni AS (
        SELECT w1, COUNT(*) AS c_uni FROM (
            SELECT UNNEST(str_split(text, ' ')) AS w1 FROM train
        ) GROUP BY w1
    ),
    v AS (SELECT COUNT(*) AS vocab FROM uni),
    bg AS (
        SELECT w1, w2, COUNT(*) AS c_bg FROM (
            SELECT str_split(text, ' ')[i+1] AS w1,
                   str_split(text, ' ')[i+2] AS w2
            FROM train, UNNEST(range(len(str_split(text, ' ')) - 1)) AS t(i)
            WHERE len(str_split(text, ' ')) >= 2
        ) GROUP BY w1, w2
    ),
    doc_bg AS (
        SELECT doc_id, str_split(text, ' ')[i+1] AS w1,
               str_split(text, ' ')[i+2] AS w2
        FROM documents, UNNEST(range(len(str_split(text, ' ')) - 1)) AS t(i)
        WHERE len(str_split(text, ' ')) >= 2
    ),
    scored AS (
        SELECT doc_id,
               CAST(ROUND(LN((COALESCE(c_bg, 0) + {_LM_ALPHA})
                    / (COALESCE(c_uni, 0) + {_LM_ALPHA} * vocab)), 9)
                    AS DECIMAL(12,9)) AS lp
        FROM doc_bg
        LEFT JOIN bg USING (w1, w2)
        LEFT JOIN uni USING (w1)
        CROSS JOIN v
    ),
    agg AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               ROUND(-CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6)
                   AS neg_avg_logprob
        FROM scored GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS n_bigrams,
           neg_avg_logprob
    FROM (SELECT DISTINCT doc_id FROM documents) d
    LEFT JOIN agg ON d.doc_id = agg.doc_id
    """,
    doc="Cross-corpus CCNet fluency: a bigram LM trained on the 'en' "
        "slice (the target domain) scores EVERY document with add-alpha "
        "smoothing — off-domain/garbled text scores high, unseen words "
        "degrade to the uniform floor instead of crashing. Exercises the "
        "persisted artifact's exact formula (build + score over a temp "
        "LM dir), hash-checked against a first-principles DuckDB "
        "restatement",
)
def q_text_perplexity_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    lm_dir = tempfile.mkdtemp(prefix="lm_")
    try:
        docs = load(spark, sf_dir, "documents").select(
            "doc_id", "text", "lang"
        )
        write_bigram_lm(
            docs.filter(F.col("lang") == "en").select("doc_id", "text"),
            lm_dir, n_buckets=16,
        )
        out = score_with_lm(spark, lm_dir,
                            docs.select("doc_id", "text"), alpha=_LM_ALPHA)
        # bounded: one row per doc at catalog SF; materialize before the
        # finally removes the artifact the lazy plan reads
        from ..operators._helpers import collected_df

        return collected_df(spark, out.collect(), out.schema)
    finally:
        shutil.rmtree(lm_dir, ignore_errors=True)
