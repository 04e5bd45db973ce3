"""Trained quality classifier: weak rule labels -> MLlib logistic regression.

Production pre-training pipelines (CCNet-style) do exactly this: hand rules
label an initial corpus slice, a cheap linear model over bag-of-words
features generalizes those rules, and the MODEL — not the rules — scores
the full corpus, catching junk the rules miss (the rules see surface
counters; the model sees which words co-occur with junk). The reference
sink has no scoring at all; this completes the quality story next to the
rule cascade (text.py:q_text_filter_pipeline) it bootstraps from.

Why this shape scales to 100 TB:

- **Weak labeling** is the existing map-only rule cascade — one pass, no
  shuffle, no humans.
- **Training** runs on a deterministic hash-sampled slice (a linear model
  over 2^18 hashed features saturates long before millions of examples;
  sampling by universal hash keeps the slice reproducible at any
  parallelism). MLlib's LogisticRegression is a treeAggregate per LBFGS
  iteration over that slice only.
- **Scoring** broadcasts the learned coefficient vector inside the fitted
  pipeline; `model.transform` is map-only over the full corpus — scan
  parallelism, no shuffle, no state.

Spark-first: Tokenizer -> HashingTF -> LogisticRegression is the MLlib
Pipeline idiom; nothing here is hand-scheduled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..tables import load
from .text import quality_verdict_expr

N_FEATURES = 1 << 18


def weak_quality_labels(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Rule-cascade verdict -> binary weak label (1 = keep), from the SAME
    expression q_text_filter_pipeline uses (text.quality_verdict_expr) —
    one source of truth, so the labeler cannot drift from the cascade the
    model claims to generalize."""
    keep = quality_verdict_expr(text_col) == "keep"
    return docs.withColumn("label", keep.cast("double"))


def train_quality_model(
    docs: DataFrame,
    text_col: str = "text",
    sample_mod: int = 1,
    max_iter: int = 30,
):
    """Fit Tokenizer -> HashingTF -> LogisticRegression on weak labels.

    ``sample_mod``: train on the deterministic 1/sample_mod hash-slice of
    doc_id (1 = all docs — fine at test scale; 100 at corpus scale). The
    returned PipelineModel holds the coefficient vector; it rides to the
    executors as a broadcast inside ``transform``.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, Tokenizer

    # null-safe model input (code review r12, hostile-fixture find):
    # MLlib's Tokenizer NPEs on a NULL text; the weak label is already
    # fail-closed ('null_text' != keep), so '' keeps the label while the
    # featurizer sees an empty token list
    docs = docs.withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    labeled = weak_quality_labels(docs, text_col)
    if sample_mod > 1:
        labeled = labeled.where(F.pmod(F.xxhash64("doc_id"), sample_mod) == 0)
    pipe = Pipeline(
        stages=[
            Tokenizer(inputCol=text_col, outputCol="q_words"),
            HashingTF(inputCol="q_words", outputCol="q_feats", numFeatures=N_FEATURES),
            LogisticRegression(
                featuresCol="q_feats",
                labelCol="label",
                maxIter=max_iter,
                regParam=1e-4,
                standardization=False,
            ),
        ]
    )
    return pipe.fit(labeled)


def score_quality(model, docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Map-only corpus scoring: P(keep) per doc from the fitted pipeline.
    Probability extraction stays JVM-side (vector_to_array), no Python UDF."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(
        docs.select(
            "doc_id",
            F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
        )
    )
    return scored.select(
        "doc_id",
        vector_to_array("probability")[1].alias("p_keep"),
        F.col("prediction").cast("long").alias("keep_pred"),
    )


@register(
    "q_text_quality_model",
    None,  # learned coefficients are not expressible in SQL — rows-only + pytest
    doc="Trained quality filter: weak labels from the rule cascade, "
    "HashingTF + logistic regression, map-only corpus scoring",
)
def q_text_quality_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    model = train_quality_model(docs)
    return score_quality(model, docs).select(
        "doc_id", "keep_pred", F.round("p_keep", 3).alias("p_keep_3")
    )


@register(
    "q_text_quality_model_delta",
    """
    WITH s AS (
        SELECT doc_id,
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
    ),
    lab AS (
        SELECT CASE WHEN n_words IS NULL THEN 0
                    WHEN n_words < 30 OR n_words > 100000
                         OR awl < 3 OR awl > 12 OR n_stop < 1
                         OR punct_ratio > 0.1
                         OR 1 - CAST(n_distinct AS DOUBLE) / n_words > 0.5
                    THEN 0 ELSE 1 END AS weak_keep
        FROM s
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(weak_keep) AS BIGINT) AS n_weak_keep,
           TRUE AS acc_floor_met
    FROM lab
    """,
    doc="HASHABLE companion for the trained quality classifier: the "
        "learned coefficients are not SQL-expressible, but the WEAK "
        "LABELS are (the same rule cascade the oracle mirrors for "
        "q_text_filter_pipeline), and training is deterministic "
        "(hash-sampled slice, fixed seed — pytest-pinned), so the "
        "model's agreement with its own weak labels is a FIXED number "
        "per fixture (measured 0.77-0.80 across SFs). Spark emits the "
        "exact label counts plus an accuracy >= 0.65 verdict; the "
        "oracle recomputes the counts and claims TRUE — a broken "
        "featurize/train/score path now fails the driver's hash gate",
)
def q_text_quality_model_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    model = train_quality_model(docs)
    scored = score_quality(model, docs).select("doc_id", "keep_pred")
    weak = weak_quality_labels(docs).select("doc_id", F.col("label").alias("weak"))
    j = scored.join(weak, "doc_id")
    return j.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("weak").cast("long").alias("n_weak_keep"),
        (
            F.avg((F.col("keep_pred").cast("int") == F.col("weak")).cast("double"))
            >= 0.65
        ).alias("acc_floor_met"),
    )


# -- persisted model (lake artifact) -----------------------------------------


def save_quality_model(model, model_dir: str) -> None:
    """Persist the fitted pipeline with MLlib's native writer (metadata +
    coefficient parquet under ``model_dir``) — the frozen-artifact story
    the tokenizer and the indexes already follow: score tomorrow's crawl
    with TODAY'S model, not one silently refit on drifted data. Overwrite
    semantics match a rebuild."""
    model.write().overwrite().save(model_dir)


def load_quality_model(spark: SparkSession, model_dir: str):
    """Load a persisted quality model; refuses a missing/foreign dir with
    an error naming the builder (MLlib's raw load error names a metadata
    path, not the fix)."""
    from pyspark.ml import PipelineModel

    try:
        return PipelineModel.load(model_dir)
    except Exception as e:
        raise FileNotFoundError(
            f"no quality model at {model_dir!r} — train one with "
            "train_quality_model + save_quality_model (or `quality-train`) "
            f"first; loader said: {e}"
        ) from None
