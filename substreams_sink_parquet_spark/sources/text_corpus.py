"""JSONL text-corpus source with corrupt-record quarantine.

Web-scale training corpora arrive as JSON-lines shards (one document per
line, millions of shards), and at 100 TB some fraction of lines is always
malformed — truncated uploads, encoding damage, schema drift. The engine's
posture mirrors the payload decoder (``decode.py``): never abort the job,
never silently drop — route bad lines to a quarantine side-output with the
raw line preserved for forensics.

Spark-first mechanics: ``spark.read.text`` (line-splittable scan) +
``from_json`` in PERMISSIVE mode with a corrupt-record column — all
JVM-side (Jackson, no Python). One pass, two outputs: the caller filters
the corrupt column, and both branches share the same scan. (The
``spark.read.json`` reader has the same semantics but forbids plans that
reference only its corrupt column — the text+from_json formulation has no
such restriction and additionally captures partially-corrupt rows, e.g. a
well-formed line whose ``doc_id`` is a string.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_line"

# the documents-table shape (TESTDATA.md) + quarantine column; a corpus with
# extra keys still loads — unlisted fields are ignored, missing ones are null
DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        # optional: crawls that ship embeddings inline use the streaming
        # embedding near-dup stage; absent key -> null (PERMISSIVE), and
        # null-embedding docs pass that stage unscreened
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField(CORRUPT_COL, T.StringType()),
    ]
)


def read_jsonl_corpus(
    spark: SparkSession, path: str, schema: T.StructType = DOC_SCHEMA
) -> DataFrame:
    """Read a JSONL corpus with malformed lines captured, not fatal.

    The returned frame has the document columns plus ``_corrupt_line``:
    null for clean rows, the raw line for unparseable (or partially
    untypeable) ones. Schema is explicit — never inferred — so a 100 TB
    read costs one pass, not an extra inference scan, and schema drift
    surfaces as nulls + quarantined lines instead of a changed output type.
    """
    if not any(f.name == CORRUPT_COL for f in schema.fields):
        schema = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
        )
    parsed = spark.read.text(path).select(
        F.from_json(
            "value",
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("__d")
    )
    return parsed.select("__d.*")


def split_quarantine(corpus: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) from one shared scan.

    Clean rows drop the quarantine column; quarantined rows keep only the
    raw line (their typed columns are null by construction).
    """
    clean = corpus.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = corpus.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return clean, bad
