"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — BinaryType columns, typed metadata structs,
Arrow-batched ``mapInPandas`` feature extraction with explicit schemas and
bounded batch sizes. The actual media decode is STUBBED (no image/audio libs
in this container): ``decode_image``/``decode_audio`` raise
NotImplementedError, and the deterministic fake featurizer (byte histogram /
head bytes) stands in so partitioning, UDF signature, and batch shape are all
testable. At scale: binary payloads stay opaque through shuffles, metadata
predicates push down to the parquet scan, and feature extraction is
embarrassingly parallel over partitions.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..catalog import register
from ..tables import load

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("head_bytes", ArrayType(LongType())),
        StructField("byte_mode", LongType()),
    ]
)


def to_media_table(docs: DataFrame) -> DataFrame:
    """Wrap the documents fixture as a binary media table (payload = utf-8)."""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        F.lit("text/plain").alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


def decode_image(payload: bytes) -> object:
    """Decode an image payload via Pillow when it is importable at runtime;
    otherwise a clear NotImplementedError (the lib is absent in this
    container — the deterministic featurizer below keeps the Spark plumbing
    exercised either way)."""
    try:
        from PIL import Image
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires Pillow at runtime (pip install Pillow); "
            "payload stays opaque without it"
        ) from e
    import io

    return Image.open(io.BytesIO(payload))


def decode_audio(payload: bytes) -> object:
    """Decode an audio payload via soundfile when importable; same optional-
    dependency contract as decode_image."""
    try:
        import soundfile
    except ImportError as e:
        raise NotImplementedError(
            "audio decode requires soundfile at runtime (pip install "
            "soundfile); payload stays opaque without it"
        ) from e
    import io

    return soundfile.read(io.BytesIO(payload))


def extract_features(media: DataFrame, batch_size: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Deterministic fake featurizer (first-8-bytes + modal byte) standing in
    for a real decode→embed stage; the mapInPandas plumbing (schema, batch
    iteration, per-partition parallelism) is the production shape.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                rows = []
                for doc_id, payload in zip(chunk["doc_id"], chunk["payload"]):
                    # vectorized byte stats — the honest production shape for
                    # a featurizer (no per-element Python inside the batch);
                    # argmax of bincount = most frequent byte, ties to the
                    # smallest value
                    b = np.frombuffer(bytes(payload), dtype=np.uint8)
                    head = [int(x) for x in b[:8]]
                    mode = int(np.bincount(b).argmax()) if b.size else 0
                    rows.append((int(doc_id), int(b.size), head, mode))
                yield pd.DataFrame(
                    rows, columns=["doc_id", "n_bytes", "head_bytes", "byte_mode"]
                )

    return media.select("doc_id", "payload").mapInPandas(featurize, FEATURE_SCHEMA)


@register(
    "q_multimodal_meta",
    """
    SELECT doc_id,
           'text/plain' AS media_type,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           md5(text) AS payload_md5
    FROM documents
    """,
    doc="Binary media table: typed metadata + payload checksum (payload stays opaque)",
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = to_media_table(load(spark, sf_dir, "documents"))
    return media.select(
        "doc_id",
        "media_type",
        "n_bytes",
        F.md5("payload").alias("payload_md5"),
    )


@register(
    "q_multimodal_features",
    None,  # fake featurizer is engine-side → rows-only check
    doc="mapInPandas feature extraction over binary payloads (stubbed decode)",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = to_media_table(load(spark, sf_dir, "documents"))
    feats = extract_features(media)
    return feats.select(
        "doc_id", "n_bytes", F.col("head_bytes")[0].alias("first_byte"), "byte_mode"
    )
