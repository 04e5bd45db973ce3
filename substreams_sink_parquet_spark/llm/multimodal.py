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
                    if payload is None:
                        # corrupt row: a NULL payload has no features —
                        # emit nulls instead of killing the whole batch
                        # with bytes(None) (code review r12, hostile-
                        # fixture find)
                        rows.append((int(doc_id), None, None, None))
                        continue
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
    # the deterministic featurizer is fully SQL-restatable on the ASCII
    # fixture (payload bytes == character code points — the same
    # assumption q_multimodal_frames' oracle leans on, pinned by
    # test_multimodal_frames_oracle_assumption): n_bytes = strlen,
    # first_byte = code of char 1 (NULL for empty), byte_mode = the most
    # frequent byte with ties to the SMALLEST value (np.bincount.argmax
    # returns the first maximal index; ORDER BY cnt DESC, b ASC mirrors
    # it), 0 for an empty payload
    """
    WITH chars AS (
        SELECT doc_id,
               ascii(substring(text, CAST(i + 1 AS BIGINT), 1)) AS b
        FROM documents, UNNEST(range(strlen(text))) AS t(i)
    ),
    mode AS (
        SELECT doc_id, b FROM (
            SELECT doc_id, b,
                   ROW_NUMBER() OVER (
                       PARTITION BY doc_id ORDER BY COUNT(*) DESC, b ASC
                   ) AS rn
            FROM chars GROUP BY doc_id, b
        ) WHERE rn = 1
    )
    SELECT d.doc_id,
           CAST(strlen(d.text) AS BIGINT) AS n_bytes,
           CASE WHEN strlen(d.text) >= 1
                THEN CAST(ascii(substring(d.text, 1, 1)) AS BIGINT)
           END AS first_byte,
           CAST(CASE WHEN d.text IS NULL THEN NULL
                     ELSE COALESCE(m.b, 0) END AS BIGINT) AS byte_mode
    FROM documents d LEFT JOIN mode m USING (doc_id)
    """,
    doc="mapInPandas feature extraction over binary payloads (stubbed "
        "decode) — the deterministic byte-stat featurizer hash-checked "
        "against a first-principles DuckDB restatement (char explode + "
        "windowed mode with the exact argmax tie-break)",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = to_media_table(load(spark, sf_dir, "documents"))
    feats = extract_features(media)
    return feats.select(
        "doc_id", "n_bytes",
        # try_element_at: an EMPTY payload's head is [] and plain [0]
        # indexing ANSI-aborts on it; NULL mirrors the oracle's CASE
        F.try_element_at("head_bytes", F.lit(1)).alias("first_byte"),
        "byte_mode",
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_md5", StringType()),
    ]
)


def sample_frames(media: DataFrame, frame_bytes: int = 256,
                  stride: int = 4) -> DataFrame:
    """Frame sampling over binary video payloads: one output row per kept
    frame — the fan-out stage of a video-training pipeline.

    A real decoder (pyav/ffmpeg) is absent in this container, so frames are
    modeled as fixed-size byte records: frame i is
    ``payload[i*frame_bytes:(i+1)*frame_bytes]`` (the final partial frame
    counts), and every ``stride``-th frame is kept. That fake is exact
    enough to ORACLE in SQL, while the Spark-side shape — Arrow-batched
    mapInPandas fanning one input row out to many, frames hashed inside the
    worker so only digests cross the wire — is precisely the production
    decode shape. At 100 TB the stage is map-only: payloads never shuffle,
    and output size is output-frames x 32 bytes, not frames x frame_bytes.
    """

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out_doc, out_idx, out_md5 = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue  # corrupt row: no payload, no frames
                raw = bytes(payload)
                n_frames = max((len(raw) + frame_bytes - 1) // frame_bytes, 0)
                for i in range(0, n_frames, stride):
                    chunk = raw[i * frame_bytes:(i + 1) * frame_bytes]
                    out_doc.append(int(doc_id))
                    out_idx.append(i)
                    out_md5.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {"doc_id": out_doc, "frame_idx": out_idx, "frame_md5": out_md5}
            )

    return media.select("doc_id", "payload").mapInPandas(frames, FRAME_SCHEMA)


@register(
    "q_multimodal_frames",
    """
    SELECT doc_id, CAST(k AS BIGINT) AS frame_idx,
           md5(substring(text, CAST(k * 256 + 1 AS BIGINT), 256)) AS frame_md5
    FROM (SELECT doc_id, text,
                 UNNEST(range(CAST(CEIL(strlen(text) / 256.0) AS BIGINT))) AS k
          FROM documents)
    WHERE k % 4 = 0
    """,
    # the VARCHAR substring oracle is byte-exact because the fixture text is
    # pure ASCII (pinned by test_multimodal_frames_oracle_assumption)
    doc="Video-style frame sampling: fixed 256-byte frames, every 4th kept, "
        "digest-only output — mapInPandas fan-out oracled against a "
        "generate-series + substr + md5 SQL equivalent",
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = to_media_table(load(spark, sf_dir, "documents"))
    return sample_frames(media, frame_bytes=256, stride=4)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("thumb_md5", StringType()),
    ]
)


def resize_media(media: DataFrame, width: int = 8, height: int = 8,
                 use_pil: bool | None = None) -> DataFrame:
    """Thumbnail/resize stage: each payload is reduced to a fixed
    ``width x height`` grid. The real path uses Pillow when importable
    (``decode_image`` contract); without it, a deterministic fallback
    stride-samples the raw bytes to exactly width*height values — honest
    about the production batch shape (vectorized numpy inside Arrow
    batches, fixed-size output per row, no per-element Python loop).

    ``use_pil`` overrides the auto-detect: ``False`` forces the
    deterministic fallback regardless of environment (the hash-gate
    companion q_multimodal_resize_delta pins that math against SQL —
    with auto-detect its oracle would break the day someone installs
    Pillow); ``True`` demands Pillow and fails loudly in the worker
    when it is absent."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        if use_pil is None:
            try:
                from PIL import Image  # noqa: F401
                have_pil = True
            except ImportError:
                have_pil = False
        else:
            have_pil = use_pil
        n_out = width * height
        for pdf in batches:
            out_doc, out_md5 = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    # corrupt row: nothing to resize — a NULL digest row
                    # keeps the doc visible to audits without inventing a
                    # thumb for absent bytes (code review r12)
                    out_doc.append(int(doc_id))
                    out_md5.append(None)
                    continue
                raw = bytes(payload)
                if have_pil:
                    try:
                        import io

                        from PIL import Image
                        img = Image.open(io.BytesIO(raw)).resize((width, height))
                        thumb = np.asarray(img, dtype=np.uint8).tobytes()
                    except Exception:
                        thumb = b""  # undecodable payload → empty thumb
                else:
                    b = np.frombuffer(raw, dtype=np.uint8)
                    if b.size == 0:
                        thumb = b"\x00" * n_out
                    else:
                        idx = (np.arange(n_out) * b.size) // n_out
                        thumb = b[idx].tobytes()
                out_doc.append(int(doc_id))
                out_md5.append(hashlib.md5(thumb).hexdigest())
            yield pd.DataFrame({
                "doc_id": out_doc,
                "width": np.full(len(out_doc), width, dtype=np.int64),
                "height": np.full(len(out_doc), height, dtype=np.int64),
                "thumb_md5": out_md5,
            })

    return media.select("doc_id", "payload").mapInPandas(resize, RESIZE_SCHEMA)


@register(
    "q_multimodal_resize",
    None,  # Pillow-vs-fallback output differs by environment → rows-only
    doc="Resize/thumbnail stage over binary payloads (8x8 grid; Pillow when "
        "available, deterministic byte-stride fallback otherwise) — the "
        "fallback math itself is hash-gated by q_multimodal_resize_delta",
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = to_media_table(load(spark, sf_dir, "documents"))
    return resize_media(media, width=8, height=8)


@register(
    "q_multimodal_resize_delta",
    # stride-sample index i of n bytes = byte[(i*n)//64]; the oracle
    # rebuilds the 64-char thumb string and md5s it (ASCII fixture:
    # payload bytes == characters, the pinned frames-oracle assumption).
    # Empty payloads are excluded on BOTH sides: their fallback thumb is
    # 64 NUL bytes, which a VARCHAR oracle cannot restate — the parent
    # rows-only entry still covers them
    """
    SELECT doc_id,
           CAST(8 AS BIGINT) AS width,
           CAST(8 AS BIGINT) AS height,
           md5(array_to_string(list_transform(range(64),
               i -> substring(text,
                              CAST((i * strlen(text)) // 64 + 1 AS BIGINT),
                              1)), '')) AS thumb_md5
    FROM documents
    WHERE strlen(text) > 0
    """,
    doc="The resize fallback's hash gate: use_pil=False forces the "
        "deterministic byte-stride path regardless of environment, so the "
        "exact (i*n)//64 sampling and digest are hash-checked against a "
        "DuckDB reconstruction — the companion that makes the rows-only "
        "q_multimodal_resize's engine-side math pinned instead of trusted",
)
def q_multimodal_resize_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(F.length("text") > 0)
    return resize_media(to_media_table(docs), width=8, height=8,
                        use_pil=False)
