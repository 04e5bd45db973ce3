"""JSONL corpus source: clean rows parse typed, malformed lines are
quarantined with the raw text — one shared scan, job never aborts."""

import json
import os

from substreams_sink_parquet_spark.sources.text_corpus import (
    CORRUPT_COL,
    read_jsonl_corpus,
    split_quarantine,
)
from substreams_sink_parquet_spark.tables import load


def test_jsonl_corpus_roundtrip_with_quarantine(spark, tmp_path):
    docs = load(spark, "/root/testdata/sf0.001", "documents")
    rows = [r.asDict() for r in docs.collect()]
    shard = tmp_path / "shard-00000.jsonl"
    bad_lines = ['{"doc_id": 1, "text": "truncated', "not json at all", '["array"]']
    with open(shard, "w") as f:
        for i, r in enumerate(rows):
            f.write(json.dumps(r) + "\n")
            if i < len(bad_lines):  # interleave damage between clean lines
                f.write(bad_lines[i] + "\n")

    corpus = read_jsonl_corpus(spark, str(shard))
    clean, bad = split_quarantine(corpus)

    assert clean.count() == len(rows)
    assert CORRUPT_COL not in clean.columns
    # typed columns survive the round trip
    got = {(r.doc_id, r.lang, r.n_chars) for r in clean.collect()}
    want = {(r["doc_id"], r["lang"], r["n_chars"]) for r in rows}
    assert got == want
    # every damaged line is captured verbatim (array line parses as a JSON
    # value but not as a document row — PERMISSIVE still quarantines it)
    captured = {r[CORRUPT_COL] for r in bad.collect()}
    assert set(bad_lines) <= captured


def test_jsonl_schema_never_inferred(spark, tmp_path):
    # missing fields -> null, extra fields -> ignored; output schema is fixed
    shard = tmp_path / "drift.jsonl"
    shard.write_text('{"doc_id": 7, "text": "t", "unexpected_key": 1}\n')
    clean, bad = split_quarantine(read_jsonl_corpus(spark, str(shard)))
    row = clean.collect()[0]
    assert row.doc_id == 7 and row.lang is None
    assert "unexpected_key" not in clean.columns
    assert bad.count() == 0
