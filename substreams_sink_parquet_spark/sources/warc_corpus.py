"""WARC/WET corpus source: Common-Crawl-shaped web-archive shards → the
same (doc_id, text, …) frame the JSONL corpus source produces, so every
downstream screen (dedup, quality, corpus builder) composes unchanged.

Scalable parse, no Python in the loop:

- **Record splitting is the file format's own marker as a custom line
  separator** (``spark.read.option("lineSep", "WARC/1.")`` — the version
  digit stays with the chunk, so WARC/1.0 and WARC/1.1 shards both
  parse). Hadoop's line reader handles delimiters that straddle HDFS/S3
  split boundaries, so a multi-GB WET shard parallelizes across tasks
  WITHOUT reading any file whole — the move that makes this viable on a
  100 TB crawl, where a wholetext-per-file read would serialize each
  shard into one task.
  KNOWN LIMIT of marker splitting vs the spec's Content-Length framing:
  a record BODY containing the literal marker bytes splits there — the
  document is truncated at the marker and the tail, lacking headers,
  lands in quarantine (visible, not silent). In WET text extracts the
  sequence essentially only occurs in pages about the WARC format
  itself; exact Content-Length framing requires a sequential byte
  reader and gives up split parallelism, the wrong trade at crawl scale
  — archives where that trade inverts opt into
  :func:`read_warc_corpus_exact` (per-file sequential, spec framing).
- **Header fields are JVM-side regexp_extract**, the body a substring
  after the blank line; everything stays inside whole-stage codegen.
  The CR-normalized copy of each record is computed ONCE in a prior
  projection — header extraction, body slicing, and the emptiness
  filter all reuse it (one regex pass per record, not four).
- **Quarantine contract matches the JSONL source**: structurally broken
  records (no WARC-Type header, or a document-typed record missing its
  mandatory WARC-Record-ID) come back as a separate frame with the raw
  record text for forensics, never silently dropped.
- **Raw ``response`` records** (non-WET crawls) carry an HTTP message
  as body; the text is taken AFTER the HTTP header block's blank line,
  so status lines and headers never pollute the document text. WET
  ``conversion`` records — the training-data case and the default —
  use the body as-is.

``doc_id`` is ``xxhash64`` of the WARC-Record-ID (the format's unique
record key), making ids deterministic across re-reads and stable under
shard reordering — the property every downstream epoch-keyed index
relies on. Collisions at 64 bits are negligible at crawl scale
(birthday bound ~1e-4 at a billion records) and are exact-dup-screened
out anyway when two records carry identical content.

Reference anchor: the reference sink ingests pre-decoded substreams
blocks (sinker.go); a training-data pipeline's equivalent "firehose" is
the web crawl, which is what this source adapts to the same corpus
machinery (SURVEY §2C training-data operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Record split marker: the version-agnostic prefix, so 1.0 and 1.1
#: shards both split (the trailing version digit stays in the chunk and
#: is skipped by the line-anchored header regexes).
WARC_MARKER = "WARC/1."


def parse_warc_docs(raw: DataFrame,
                    record_types: tuple[str, ...]) -> DataFrame:
    """One combined DOC-shaped frame from delimiter-chunk rows: document
    records carry parsed fields, structurally broken ones (no WARC-Type)
    carry the raw record in ``_corrupt_record`` with null fields, and
    well-formed non-document records (warcinfo/request/metadata — format
    framing, not documents) are dropped. ONE projection over ONE scan —
    the streaming corpus path feeds this straight into CorpusSink's
    quarantine split, which would otherwise union two filtered branches
    of the same file source and read every shard twice per batch."""
    # the CR-normalized record is computed ONCE here; every downstream
    # expression (header block, body slice, emptiness check) reuses the
    # projected column instead of re-running the regex per consumer.
    # WARC mandates CRLF but hand-made fixtures (and some extractors)
    # emit LF — normalizing CR away accepts both.
    normed = raw.select(
        F.regexp_replace("value", "\r", "").alias("norm"),
        F.col("value").alias("_raw"),
    ).filter(
        # delimiter artifacts (the empty chunk before a file's first
        # marker, a trailing marker): whitespace-only once normalized.
        # translate is a per-char map — no regex pass.
        F.trim(F.translate("norm", "\n\t", "  ")) != ""
    )
    headers = F.substring_index(F.col("norm"), "\n\n", 1)
    body = F.expr(
        "substring(norm, length(substring_index(norm, '\n\n', 1)) + 3)"
    )
    rec = normed.select(
        F.regexp_extract(headers, r"(?m)^WARC-Type:\s*(\S+)", 1).alias("warc_type"),
        F.regexp_extract(headers, r"(?m)^WARC-Record-ID:\s*<?([^>\s]+)", 1).alias("record_id"),
        F.regexp_extract(headers, r"(?m)^WARC-Target-URI:\s*(\S+)", 1).alias("uri"),
        F.regexp_extract(headers, r"(?m)^WARC-Identified-Content-Language:\s*(\S+)", 1).alias("lang_hdr"),
        body.alias("body"),
        "_raw",
    )
    # a raw crawl's `response` record body is an HTTP message: the
    # document text starts after the HTTP header block's blank line
    # (status line + headers are protocol framing, not training text)
    payload = F.when(
        F.col("warc_type") == "response",
        F.expr("substring(body, length(substring_index(body, '\n\n', 1)) + 3)"),
    ).otherwise(F.col("body"))
    rec = rec.select(
        "warc_type", "record_id", "uri", "lang_hdr", "_raw",
        # trim() strips spaces only — record bodies end in newlines, so
        # strip all leading/trailing whitespace classes explicitly
        F.regexp_replace(F.regexp_replace(payload, r"^\s+", ""), r"\s+$", "")
        .alias("text"),
    )
    is_doctype = F.col("warc_type").isin(*record_types)
    is_doc = is_doctype & (F.col("record_id") != "")
    # broken = headerless chunk (incl. the tail of a marker-in-body
    # split) OR a document record missing its spec-mandatory id —
    # both must surface for forensics, never vanish
    is_broken = (F.col("warc_type") == "") | (is_doctype & (F.col("record_id") == ""))
    return rec.filter(is_doc | is_broken).select(
        F.when(is_doc, F.xxhash64("record_id")).alias("doc_id"),
        F.when(is_doc, F.col("text")).alias("text"),
        # first language of a comma list; empty header -> null
        F.when(is_doc, F.nullif(F.substring_index("lang_hdr", ",", 1), F.lit("")))
        .alias("lang"),
        F.when(is_doc, F.nullif(F.col("uri"), F.lit(""))).alias("source"),
        F.when(is_doc, F.length("text")).alias("n_chars"),
        F.when(is_broken, F.col("_raw")).alias("_corrupt_record"),
    )


def _parse_records(raw: DataFrame, record_types: tuple[str, ...]):
    """(clean, quarantined) split of :func:`parse_warc_docs` output."""
    docs = parse_warc_docs(raw, record_types)
    clean = docs.filter(F.col("doc_id").isNotNull()).drop("_corrupt_record")
    bad = docs.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("corrupt_record")
    )
    return clean, bad


def read_warc_corpus(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("conversion",),
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) from WARC/WET shards under ``path``.

    ``record_types``: which WARC record types are documents — WET text
    extracts use ``conversion`` (the default: the training-data case);
    raw crawls opt into ``response``, whose HTTP payload may be
    compressed binary a real pipeline must decode upstream. Metadata
    records (``warcinfo``, ``request``, ``metadata``) are format
    framing, not documents, and are dropped (they are well-formed, so
    they are NOT quarantine material)."""
    raw = spark.read.option("lineSep", WARC_MARKER).text(path)
    return _parse_records(raw, record_types)


def _frame_records_exact(data: bytes) -> list[bytes]:
    """Sequential spec framing of one shard's bytes: records are delimited
    by each record's own ``Content-Length`` header (counted in BYTES, per
    the WARC spec), so a record BODY containing the literal ``WARC/1.``
    marker stays intact instead of splitting there. Each returned chunk
    runs from a record's marker to the next record's marker located AT OR
    AFTER the declared body end — trailing CRLF record separators stay
    attached to the previous chunk, exactly like the lineSep reader's
    chunks, so one downstream parse serves both modes. A record whose
    header block is unterminated or lacks Content-Length cannot be framed
    exactly; it degrades to next-marker splitting for that record alone
    (the tail then surfaces via the normal quarantine contract). Bytes
    BEFORE the first marker (a truncated leading record, transfer
    garbage) come back as their own chunk so they reach quarantine like
    the lineSep reader's first chunk — never silently discarded; a
    marker-less file is likewise one quarantine-bound chunk."""
    import re

    marker = WARC_MARKER.encode()
    recs: list[bytes] = []
    pos = data.find(marker)
    # lineSep parity: the pre-marker prefix (or the whole marker-less
    # file) parses as a headerless record and lands in quarantine;
    # whitespace-only prefixes are the delimiter artifact the parse's
    # emptiness filter drops either way
    first = len(data) if pos == -1 else pos
    if data[:first].strip():
        recs.append(data[:first])
    while pos != -1:
        # every search is BOUNDED by the next marker: an unterminated
        # header block must degrade to next-marker splitting for THIS
        # record alone, not swallow the following record by finding its
        # header terminator / Content-Length instead
        bound = data.find(marker, pos + 1)
        search_end = len(data) if bound == -1 else bound
        ends = [
            (i, sep_len)
            for i, sep_len in ((data.find(b"\r\n\r\n", pos, search_end), 4),
                               (data.find(b"\n\n", pos, search_end), 2))
            if i != -1
        ]
        nxt = bound
        if ends:
            hdr_end, sep_len = min(ends)
            # \r?$ — the spec mandates CRLF header lines, and Python's
            # multiline $ matches before \n but NOT before \r\n, so a
            # bare $ only ever matched when Content-Length happened to
            # be the final header
            m = re.search(
                rb"(?im)^Content-Length:[ \t]*(\d+)[ \t]*\r?$",
                data[pos:hdr_end],
            )
            if m is not None:
                body_end = hdr_end + sep_len + int(m.group(1))
                nxt = data.find(marker, max(body_end, pos + 1))
        recs.append(data[pos:nxt] if nxt != -1 else data[pos:])
        pos = nxt
    return recs


def _gunzip_capped(data: bytes, cap: int) -> bytes | None:
    """Multi-member gzip decompress with a HARD output cap: ``None`` the
    moment the cap fills, so the allocation is bounded by ``cap`` (plus
    one zlib block) rather than by whatever the stream expands to. This
    is the difference between quarantining a gzip bomb and dying to one:
    ``gzip.decompress`` materializes the full expansion FIRST, so a
    100 MB raw shard that passes the pre-check but inflates to 300 GiB
    OOMs the executor before any post-hoc size check runs. Members are
    read back-to-back (Common Crawl packs one gzip member per WARC
    record); a truncated stream raises ``EOFError`` and corrupt bytes
    raise ``zlib.error``, matching ``gzip.decompress``'s contract."""
    import zlib

    out = bytearray()
    buf = data
    while buf:
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        out += d.decompress(buf, cap + 1 - len(out))
        if len(out) > cap:
            return None
        if not d.eof:
            raise EOFError("compressed stream ended before the gzip "
                           "end-of-stream marker")
        buf = d.unused_data
    return bytes(out)


def read_warc_corpus_exact(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("conversion",),
    max_shard_bytes: int = 4 << 30,
) -> tuple[DataFrame, DataFrame]:
    """Correctness-first twin of :func:`read_warc_corpus`: per-file
    sequential framing that honors each record's ``Content-Length``, for
    non-WET archives whose bodies may legitimately contain the
    ``WARC/1.`` marker bytes (pages ABOUT the WARC format; binary HTTP
    payloads in raw ``response`` crawls). The marker-split reader stays
    the scale default — it parallelizes WITHIN multi-GB shards via
    Hadoop's split-safe delimiter reader, while this mode reads each
    shard as ONE task (``binaryFile`` row) and parallelizes across files
    only: the right trade exactly when truncation is not acceptable.
    Handles ``.gz`` shards (the Common Crawl packaging; gzip is
    non-splittable anyway, so the sequential read costs nothing there).
    Downstream parsing, quarantine contract, and doc ids are byte-for-
    byte the lineSep reader's — chunks are re-shaped to the same
    marker-stripped form and fed through the same projection.

    ``max_shard_bytes`` (default 4 GiB) is the executor-memory guard this
    mode needs BECAUSE it is per-shard sequential: each shard
    materializes whole (post-gunzip) in one task, so an unbounded
    archive — one pathological multi-hundred-GiB shard — would OOM the
    executor mid-stage. Oversized shards are QUARANTINED LOUDLY instead:
    one corrupt-record row naming the path, the observed size, and the
    limit. The raw bytes are checked first; ``.gz`` shards then gunzip
    through a CAPPED stream decompress (:func:`_gunzip_capped`) that
    aborts the moment output crosses the limit — so a gzip bomb whose
    raw bytes pass the pre-check is quarantined with at most
    ``max_shard_bytes`` allocated, never materialized in full before
    being measured. Common Crawl's
    ~1 GiB shards pass the default untouched; raise the limit alongside
    executor memory for bigger archives, or use the marker-split default
    reader, which never holds a whole shard."""
    import pandas as pd
    from pyspark.sql import types as T

    n_strip = len(WARC_MARKER)

    def split_files(batches):
        def oversized(p, n_bytes, stage: str) -> str:
            # a headerless chunk: parses as a corrupt record and takes
            # the normal quarantine path, so the skip is VISIBLE in the
            # same place every other unreadable input lands
            return (f"[oversized shard skipped] path={p} {stage}_bytes="
                    f"{n_bytes} exceeds max_shard_bytes={max_shard_bytes}"
                    " — raise the limit (with executor memory) or use the"
                    " marker-split reader")

        for pdf in batches:
            vals: list[str] = []
            for p, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if len(data) > max_shard_bytes:
                    vals.append(oversized(p, len(data), "raw"))
                    continue
                if str(p).endswith(".gz"):
                    data = _gunzip_capped(data, max_shard_bytes)
                    if data is None:
                        # capped decompress aborts at the limit, so the
                        # true expansion is unknown — report the breach
                        vals.append(oversized(
                            p, f">{max_shard_bytes}", "gunzipped"))
                        continue
                vals.extend(
                    # decode per-record (Content-Length counts bytes, so
                    # framing must happen before any str conversion); the
                    # marker prefix is stripped to mimic lineSep chunks —
                    # a pre-marker garbage chunk has none to strip
                    (chunk[n_strip:]
                     if chunk.startswith(WARC_MARKER.encode())
                     else chunk).decode("utf-8", errors="replace")
                    for chunk in _frame_records_exact(data)
                )
            yield pd.DataFrame({"value": vals})

    raw = (
        spark.read.format("binaryFile").load(path)
        .select("path", "content")
        .mapInPandas(
            split_files, T.StructType([T.StructField("value", T.StringType())])
        )
    )
    return _parse_records(raw, record_types)


def stream_warc_corpus(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("conversion",),
) -> tuple[DataFrame, DataFrame]:
    """Streaming twin of :func:`read_warc_corpus` — same parse over
    ``readStream`` file tracking, for feeding ``CorpusSink`` with crawl
    shards as they land (new shard files are the streaming unit, exactly
    like the JSONL staging contract)."""
    raw = spark.readStream.option("lineSep", WARC_MARKER).text(path)
    return _parse_records(raw, record_types)
