"""User-defined function surface (SURVEY.md §2B): scalar pandas UDF,
grouped UDAF via applyInPandas, and a table function (UDTF-style explode).

Pandas UDFs move data via Arrow in vectorized batches — the only acceptable
Python path at scale. The UDAF partitions by the group key, so it scales with
group cardinality; outputs are integers/strings so the oracle comparison is
exact.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType

from ..catalog import register
from ..tables import load


@F.pandas_udf(StringType())
def _normalize_text(s: pd.Series) -> pd.Series:
    return s.str.lower().str.strip().str.replace(r"\s+", " ", regex=True)


@F.pandas_udf(LongType())
def _vowel_count(s: pd.Series) -> pd.Series:
    # nullable Int64, not int64: a NULL text's count is NaN, and the
    # non-nullable cast aborted the whole batch on one such row (code
    # review r12, hostile-fixture find) — the contract is NULL in, NULL
    # out, matching the SQL oracle's length(regexp_replace(NULL, ...))
    return s.str.count(r"[aeiou]").astype("Int64")


@register(
    "q_udf_scalar",
    r"""
    SELECT doc_id,
           regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS text_norm,
           CAST(length(regexp_replace(text, '[^aeiou]', '', 'g')) AS BIGINT) AS n_vowels
    FROM documents
    """,
    doc="Scalar pandas UDFs (Arrow-vectorized): text normalization + vowel count",
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        _normalize_text("text").alias("text_norm"),
        _vowel_count("text").alias("n_vowels"),
    )


@register(
    "q_udaf",
    r"""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS total_tokens,
           CAST(MAX(length(text)) AS BIGINT) AS max_len
    FROM documents
    GROUP BY lang
    """,
    doc="Grouped UDAF via applyInPandas: per-language corpus statistics",
)
def q_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")

    def corpus_stats(pdf: pd.DataFrame) -> pd.DataFrame:
        # NULL texts are skipped by the aggregates, never crash the cast
        # (code review r12): sum(min_count=1)/max mirror SQL's SUM/MAX —
        # null rows excluded, NULL result when the whole group is null
        toks = pdf["text"].str.split(" ").str.len()
        total = toks.sum(min_count=1)
        ml = pdf["text"].str.len().max()
        return pd.DataFrame(
            {
                "lang": [pdf["lang"].iloc[0]],
                "n_docs": [len(pdf)],
                "total_tokens": [None if pd.isna(total) else int(total)],
                "max_len": [None if pd.isna(ml) else int(ml)],
            }
        )

    return docs.select("lang", "text").groupBy("lang").applyInPandas(
        corpus_stats, "lang string, n_docs bigint, total_tokens bigint, max_len bigint"
    )


@register(
    "q_udtf",
    r"""
    SELECT word, COUNT(*) AS n_docs
    FROM (
        SELECT DISTINCT doc_id, UNNEST(str_split(text, ' ')) AS word
        FROM documents
    )
    WHERE length(word) >= 5
    GROUP BY word
    """,
    doc="Table function: one input row → many output rows (posexplode of tokens), "
        "then document-frequency aggregation",
)
def q_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).distinct()
    return (
        words.filter(F.length("word") >= 5)
        .groupBy("word")
        .agg(F.count("*").alias("n_docs"))
    )
