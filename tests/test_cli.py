"""CLI end-to-end: descriptor set on disk → run --drain-and-exit → lake."""

import os

from substreams_sink_parquet_spark import protowire as pw
from substreams_sink_parquet_spark.cli import main

from .test_protowire import BLOCK
from .test_streaming import _stage_blocks


def test_cli_setup(tmp_path, spark):
    assert main(["setup", f"file://{tmp_path}"]) == 0


def test_cli_run_drain(tmp_path, spark):
    desc = tmp_path / "block.fds"
    desc.write_bytes(pw.build_file_descriptor_set("test", [BLOCK]))
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "lake")
    _stage_blocks(spark, input_dir, list(range(0, 22)), 0)

    rc = main([
        "run", out_dir, input_dir,
        "--descriptor-set", str(desc),
        "--output-type", "test.Block",
        "--checkpoint", str(tmp_path / "ckpt"),
        "--partition-size", "10",
        "--compression", "snappy",
        "--drain-and-exit",
    ])
    assert rc == 0
    files = sorted(f for f in os.listdir(out_dir) if f.endswith(".parquet"))
    assert files == [
        "0000000000-0000000010.parquet",
        "0000000010-0000000020.parquet",
    ]


def test_cli_query(tmp_path, spark, capsys):
    import os

    from substreams_sink_parquet_spark.cli import main
    from substreams_sink_parquet_spark.decode import decode_payloads
    from substreams_sink_parquet_spark.sink.writer import WriterOptions, write_ranges

    from .test_protowire import BLOCK
    from .test_sink_writer import _blocks_df

    lake = str(tmp_path / "lake")
    os.makedirs(lake)
    df = decode_payloads(_blocks_df(spark, [0, 5, 12]), BLOCK)
    write_ranges(df, lake, WriterOptions(partition_size=10, start_block=0))

    rc = main([
        "query",
        "SELECT COUNT(*) AS n, MAX(block_number) AS hi FROM lake",
        "--table", f"lake={lake}",
    ])
    out = capsys.readouterr().out
    assert rc == 0 and "3" in out and "12" in out

    # block-range pruned variant
    rc = main([
        "query", "SELECT COUNT(*) AS n FROM lake",
        "--table", f"lake={lake}", "--start-block", "1", "--stop-block", "9",
    ])
    out = capsys.readouterr().out
    assert rc == 0 and "1" in out


def test_cli_stats_reports_coverage_and_gaps(tmp_path, spark, capsys):
    import json

    from substreams_sink_parquet_spark.decode import decode_payloads
    from substreams_sink_parquet_spark.sink.writer import WriterOptions, write_ranges

    from .test_sink_writer import _blocks_df

    lake = str(tmp_path / "lake")
    os.makedirs(lake)
    df = decode_payloads(_blocks_df(spark, [0, 5, 25]), BLOCK)
    write_ranges(df, lake, WriterOptions(partition_size=10, start_block=0))

    rc = main(["stats", lake])
    report = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert report["contiguous"] and report["files"] == 3 and report["gaps"] == []
    assert report["first_block"] == 0 and report["last_block"] == 30

    # delete a middle range: stats must flag the gap and exit nonzero
    os.remove(os.path.join(lake, "0000000010-0000000020.parquet"))
    rc = main(["stats", lake])
    report = json.loads(capsys.readouterr().out)
    assert rc == 1
    assert not report["contiguous"] and report["gaps"] == [[10, 20]]


def test_cli_run_with_tuning_flags(tmp_path, spark):
    """argparse → WriterOptions plumbing for the round-2 knobs, end-to-end
    through a drained run."""
    desc = tmp_path / "block.fds"
    desc.write_bytes(pw.build_file_descriptor_set("test", [BLOCK]))
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "lake")
    _stage_blocks(spark, input_dir, list(range(0, 12)), 0)

    rc = main([
        "run", out_dir, input_dir,
        "--descriptor-set", str(desc),
        "--output-type", "test.Block",
        "--checkpoint", str(tmp_path / "ckpt"),
        "--partition-size", "10",
        "--compression", "zstd",
        "--compression-level", "6",
        "--row-group-rows", "4",
        "--page-size", "4096",
        "--no-parquet-stats",
        "--target-file-bytes", "268435456",
        "--bloom-filter", "block_id",
        "--drain-and-exit",
    ])
    assert rc == 0
    import pyarrow.parquet as pq

    f = os.path.join(out_dir, "0000000000-0000000010.parquet")
    md = pq.ParquetFile(f).metadata
    assert md.row_group(0).column(0).compression == "ZSTD"
    assert md.row_group(0).num_rows <= 4          # --row-group-rows
    assert md.row_group(0).column(0).statistics is None  # --no-parquet-stats


def test_cli_undo_retracts_deep_reorg(tmp_path, spark):
    """cli undo applies the finalized+live retraction to main and exploded
    child tables of a stopped lake (no descriptor required)."""
    import os

    from substreams_sink_parquet_spark.cli import main
    from substreams_sink_parquet_spark.sink.writer import WriterOptions

    from .test_protowire import BLOCK
    from .test_streaming import _final_files, _stage_blocks
    from substreams_sink_parquet_spark.streaming.stream_sink import run_pipeline

    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "lake")
    _stage_blocks(spark, input_dir, list(range(0, 36)), 0)
    q, _ = run_pipeline(
        spark, input_dir, out_dir, BLOCK, str(tmp_path / "ckpt"),
        opts=WriterOptions(partition_size=10, start_block=0), explode=True,
    )
    q.awaitTermination(120)
    assert len(_final_files(out_dir)) == 3

    rc = main(["undo", out_dir, "17", "--partition-size", "10"])
    assert rc == 0
    assert _final_files(out_dir) == ["0000000000-0000000010.parquet"]
    assert _final_files(os.path.join(out_dir, "transfers")) == [
        "0000000000-0000000010.parquet"
    ]
    live = spark.read.parquet(os.path.join(out_dir, "_live"))
    assert live.agg({"block_number": "max"}).collect()[0][0] == 17


def test_cli_compact_live_area(tmp_path, spark):
    """cli compact merges per-epoch small files for every table in the lake."""
    import json

    from substreams_sink_parquet_spark.cli import main
    from substreams_sink_parquet_spark.sink.writer import WriterOptions

    from .test_protowire import BLOCK
    from .test_streaming import _stage_blocks
    from substreams_sink_parquet_spark.streaming.stream_sink import run_pipeline

    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "lake")
    for batch, blocks in enumerate([range(0, 5), range(5, 10), range(10, 15)]):
        _stage_blocks(spark, input_dir, list(blocks), batch)
        q, _ = run_pipeline(
            spark, input_dir, out_dir, BLOCK, str(tmp_path / "ckpt"),
            opts=WriterOptions(partition_size=100, start_block=0),
            undo_holdback=1000,
        )
        q.awaitTermination(120)

    rc = main(["compact", out_dir])
    assert rc == 0
    import os
    rows = sorted(
        r.block_number
        for r in spark.read.parquet(os.path.join(out_dir, "_live")).collect()
    )
    assert rows == list(range(15))


def test_cli_run_round3_flags(tmp_path, spark):
    """--pad-width, --output-prefix, --no-dict-encoding and
    --exploded-write-workers plumbing, end-to-end through a drained
    exploded run."""
    desc = tmp_path / "block.fds"
    desc.write_bytes(pw.build_file_descriptor_set("test", [BLOCK]))
    input_dir = str(tmp_path / "in")
    store = str(tmp_path / "store")
    _stage_blocks(spark, input_dir, list(range(0, 12)), 0)

    rc = main([
        "run", store, input_dir,
        "--descriptor-set", str(desc),
        "--output-type", "test.Block",
        "--checkpoint", str(tmp_path / "ckpt"),
        "--partition-size", "10",
        "--pad-width", "6",
        "--output-prefix", "mainnet/blocks",
        "--no-dict-encoding",
        "--explode",
        "--exploded-write-workers", "1",  # sequential still correct
        "--drain-and-exit",
    ])
    assert rc == 0
    import pyarrow.parquet as pq

    out_dir = os.path.join(store, "mainnet", "blocks")   # --output-prefix
    f = os.path.join(out_dir, "000000-000010.parquet")   # --pad-width 6
    assert os.path.exists(f)
    pf = pq.ParquetFile(f)
    # --no-dict-encoding: no dictionary page in any column chunk
    col = pf.metadata.row_group(0).column(0)
    assert "PLAIN_DICTIONARY" not in str(col.encodings) \
        and "RLE_DICTIONARY" not in str(col.encodings)
    # exploded children under the same prefixed root, same pad width
    assert os.path.exists(
        os.path.join(out_dir, "transfers", "000000-000010.parquet")
    )


def test_cli_corpus_build(tmp_path, spark, capsys):
    import json

    in_dir = tmp_path / "shards"
    in_dir.mkdir()
    lines = [
        json.dumps({"doc_id": i, "text": t, "lang": "en", "source": "web",
                    "n_chars": len(t)})
        for i, t in [(1, "one doc"), (2, "two doc"), (3, "one doc")]
    ]
    (in_dir / "s0.jsonl").write_text("\n".join(lines) + "\n")
    rc = main([
        "corpus", str(in_dir), str(tmp_path / "corpus"),
        "--checkpoint", str(tmp_path / "ckpt"),
    ])
    assert rc == 0
    assert "2 admitted documents" in capsys.readouterr().out


def test_cli_corpus_compact(tmp_path, spark, capsys):
    from substreams_sink_parquet_spark.sources.text_corpus import CORRUPT_COL
    from substreams_sink_parquet_spark.streaming.corpus_stream import CorpusSink

    ddl = (f"doc_id long, text string, lang string, source string, "
           f"n_chars long, {CORRUPT_COL} string")
    out = str(tmp_path / "corpus")
    sink = CorpusSink(spark=spark, out_dir=out)
    sink.process_batch(spark.createDataFrame([(1, "aa", "en", "w", 2, None)], ddl), 0)
    sink.process_batch(spark.createDataFrame([(2, "bb", "en", "w", 2, None)], ddl), 1)
    sink.process_batch(spark.createDataFrame([(3, "cc", "en", "w", 2, None)], ddl), 2)
    assert main(["corpus-compact", out]) == 0
    assert "merged" in capsys.readouterr().out
    # trailing epoch=2 is never merged (uncommitted-replay safety)
    assert sorted(
        e for e in os.listdir(f"{out}/_index") if e.startswith("epoch=")
    ) == ["epoch=-1", "epoch=2"]


def test_cli_corpus_export(tmp_path, spark, capsys):
    import json

    in_dir = tmp_path / "shards_in"
    in_dir.mkdir()
    lines = [
        json.dumps({"doc_id": i, "text": f"doc number {i} body", "lang": "en",
                    "source": "web", "n_chars": 18})
        for i in range(6)
    ]
    (in_dir / "s0.jsonl").write_text("\n".join(lines) + "\n")
    assert main([
        "corpus", str(in_dir), str(tmp_path / "corpus"),
        "--checkpoint", str(tmp_path / "ckpt"),
    ]) == 0
    assert main([
        "corpus-export", str(tmp_path / "corpus"), str(tmp_path / "shards_out"),
        "--shards", "4",
    ]) == 0
    assert "4 shards" in capsys.readouterr().out
    from substreams_sink_parquet_spark.llm.export import (
        read_export_manifest, read_pretrain_export,
    )

    man = read_export_manifest(spark, str(tmp_path / "shards_out"))
    assert man["total_docs"] == 6 and man["n_shards"] == 4
    got = read_pretrain_export(spark, str(tmp_path / "shards_out"))
    assert got.count() == 6
    assert {"shard_id", "pos", "seq_id", "lang", "source"} <= set(got.columns)
    assert {r.shard_id for r in got.select("shard_id").distinct().collect()
            } <= set(range(4))


def test_cli_tier_finalized(tmp_path, spark, capsys):
    """cli tier merges complete finalized range groups for every table."""
    import json
    import os

    from substreams_sink_parquet_spark.cli import main
    from substreams_sink_parquet_spark.sink.writer import (
        WriterOptions,
        read_lake,
        write_ranges,
    )

    out_dir = str(tmp_path / "lake")
    os.makedirs(out_dir)
    df = spark.createDataFrame(
        [(b, f"0x{b:x}") for b in range(0, 60, 2)],
        "block_number bigint, block_id string",
    )
    write_ranges(df, out_dir, WriterOptions(partition_size=10, start_block=0))
    rc = main(["tier", out_dir, "--tier-blocks", "30"])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    (tbl,) = report
    assert set(report[tbl]) == {
        "0000000000-0000000030.parquet",
        "0000000030-0000000060.parquet",
    }
    assert read_lake(spark, out_dir).count() == 30


def test_cli_ann_build_and_query(tmp_path, spark, capsys, sf_dir):
    import json

    from substreams_sink_parquet_spark.cli import main

    idx = str(tmp_path / "ann")
    emb_path = f"{sf_dir}/embeddings.parquet"
    rc = main(["ann-build", idx, "--embeddings", emb_path, "--dim", "64"])
    assert rc == 0
    assert "ann-build OK" in capsys.readouterr().out

    # query the index with two corpus vectors
    q_path = str(tmp_path / "q.parquet")
    spark.read.parquet(emb_path).filter("vec_id < 2").select(
        "vec_id", "embedding"
    ).write.parquet(q_path)
    rc = main(["ann-query", idx, "--queries", q_path, "--k", "3"])
    assert rc == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert {x["q_id"] for x in lines} == {0, 1}
    for x in lines:
        assert len(x["neighbors"]) == 3 and x["q_id"] not in x["neighbors"]

    # --dim is mandatory for a fresh build
    assert main(["ann-build", str(tmp_path / "a2"),
                 "--embeddings", emb_path]) == 2


def test_cli_retrieve_and_select(tmp_path, spark, capsys, sf_dir):
    import json

    from substreams_sink_parquet_spark.cli import main

    docs = f"{sf_dir}/documents.parquet"
    emb = f"{sf_dir}/embeddings.parquet"

    rc = main(["retrieve", docs, "--query", "spark merge join fast", "--k", "5"])
    assert rc == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 5
    assert [x["rank"] for x in lines] == [1, 2, 3, 4, 5]
    assert lines[0]["bm25"] >= lines[-1]["bm25"]

    rc = main(["retrieve", docs, "--query", "spark merge join fast", "--k", "5",
               "--embeddings", emb, "--query-vec-id", "0"])
    assert rc == 0
    fused = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert len(fused) == 5
    assert all(set(x) == {"doc_id", "rrf_score", "n_lists"} for x in fused)
    assert fused[0]["rrf_score"] >= fused[-1]["rrf_score"]

    # empty query is a usage error, not a traceback
    assert main(["retrieve", docs, "--query", "   "]) == 2

    rc = main(["select", docs, "--target-lang", "fr", "--k", "7"])
    assert rc == 0
    sel = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert len(sel) == 7

    out = str(tmp_path / "selected")
    rc = main(["select", docs, "--target-lang", "fr", "--k", "7", "--out", out])
    assert rc == 0
    assert "select OK" in capsys.readouterr().out
    got = spark.read.parquet(out)
    assert got.count() == 7
    assert {r.doc_id for r in got.select("doc_id").collect()} == \
        {x["doc_id"] for x in sel}  # --out writes the same deterministic draw
    assert got.filter("lang = 'fr'").count() == 0  # never target rows


def test_cli_retrieve_batch_queries_table(tmp_path, spark, capsys, sf_dir):
    import json

    from substreams_sink_parquet_spark.cli import main

    docs = f"{sf_dir}/documents.parquet"
    qt = str(tmp_path / "queries")
    spark.createDataFrame(
        [(1, "spark merge join fast"), (2, "hash join")],
        "query_id int, query string",
    ).write.parquet(qt)

    rc = main(["retrieve", docs, "--queries-table", qt, "--k", "3"])
    assert rc == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 6  # 2 queries x top-3
    by_q = {}
    for x in lines:
        by_q.setdefault(x["query_id"], []).append(x)
    assert set(by_q) == {1, 2}
    for rows in by_q.values():
        assert [r["rank"] for r in rows] == [1, 2, 3]
        assert rows[0]["bm25"] >= rows[-1]["bm25"]

    # exactly one of --query / --queries-table
    assert main(["retrieve", docs]) == 2
    assert main(["retrieve", docs, "--query", "x", "--queries-table", qt]) == 2
    capsys.readouterr()
    # hybrid batch needs a vec_id column mapping each query to its probe
    assert main(["retrieve", docs, "--queries-table", qt,
                 "--embeddings", f"{sf_dir}/embeddings.parquet"]) == 2
    capsys.readouterr()
    qtv = str(tmp_path / "queries_v")
    spark.createDataFrame(
        [(1, "spark merge join fast", 0), (2, "hash join", 1)],
        "query_id int, query string, vec_id long",
    ).write.parquet(qtv)
    # a probe vec_id absent from the embeddings table must fail loudly,
    # never silently degrade that query to BM25-only output labeled hybrid
    qtbad = str(tmp_path / "queries_bad")
    spark.createDataFrame(
        [(1, "spark merge", 0), (2, "hash join", 999999999)],
        "query_id int, query string, vec_id long",
    ).write.parquet(qtbad)
    assert main(["retrieve", docs, "--queries-table", qtbad,
                 "--embeddings", f"{sf_dir}/embeddings.parquet"]) == 2
    capsys.readouterr()
    rc = main(["retrieve", docs, "--queries-table", qtv, "--k", "4",
               "--embeddings", f"{sf_dir}/embeddings.parquet"])
    assert rc == 0
    fused = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert len(fused) == 8  # 2 queries x top-4
    assert all(set(x) == {"query_id", "doc_id", "rrf_score", "n_lists", "rank"}
               for x in fused)
    for qid in (1, 2):
        rows = [x for x in fused if x["query_id"] == qid]
        assert [r["rank"] for r in rows] == [1, 2, 3, 4]
        assert rows[0]["rrf_score"] >= rows[-1]["rrf_score"]


def test_cli_curate_end_to_end(tmp_path, spark, capsys):
    """Batch curation capstone: line dedup cuts cross-doc boilerplate,
    the quality gate drops junk, exact dedup keeps min doc_id, near-dup
    pruning keeps one member per cluster — per-stage counts reported."""
    import json

    from substreams_sink_parquet_spark.cli import main

    good = ("the quick brown fox jumps over a lazy dog while the patient "
            "cat watches from a warm sunny windowsill nearby today and it "
            "is a fine day of calm weather in the garden this morning")
    footer = "all rights reserved contact us legal terms apply here now"
    rows = [
        (1, good + " first variant\n" + footer, "en"),
        (2, good + " second variant\n" + footer, "en"),
        (3, good + " third variant\n" + footer, "en"),
        (4, good + " first variant\n" + footer, "en"),   # exact dup of 1
        (5, "x", "en"),                                   # quality reject
        (6, footer, "en"),                                # boilerplate-only
    ]
    src = str(tmp_path / "docs")
    out = str(tmp_path / "curated")
    spark.createDataFrame(rows, "doc_id long, text string, lang string")\
        .write.parquet(src)
    rc = main(["curate", src, out, "--line-dedup-min-docs", "3",
               "--quality-gate", "--near-dup"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["input_docs"] == 6
    assert rep["after_line_dedup"] == 5          # doc 6 emptied out
    assert rep["after_quality_gate"] == 4        # doc 5 too short
    assert rep["after_exact_dedup"] == 3         # doc 4 = doc 1 post-cut
    assert rep["after_near_dup"] == 1            # variants cluster to doc 1
    got = spark.read.parquet(out).collect()
    assert [r.doc_id for r in got] == [1]
    assert footer not in got[0].text and "first variant" in got[0].text
    assert got[0].lang == "en"                   # passthrough columns kept


def test_cli_curate_flattened_semantics_and_preserved_newlines(
    tmp_path, spark, capsys
):
    """The q_pipeline_curate contract in the CLI: dedup and gating run on
    a newline-FLATTENED view (two docs equal modulo line breaks are exact
    duplicates), while the written documents keep their line structure."""
    import json

    from substreams_sink_parquet_spark.cli import main

    body = ("the quick brown fox jumps over a lazy dog while still waiting "
            "and the patient cat watches from a warm sunny windowsill nearby")
    # word-identical texts, line break in different places
    words = body.split(" ")
    rows = [
        (1, " ".join(words[:8]) + "\n" + " ".join(words[8:])),
        (2, " ".join(words[:13]) + "\n" + " ".join(words[13:])),
    ]
    src = str(tmp_path / "docs")
    out = str(tmp_path / "curated")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
    rc = main(["curate", src, out])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["after_exact_dedup"] == 1     # line breaks don't block dedup
    kept = spark.read.parquet(out).collect()
    assert kept[0].doc_id == 1
    assert "\n" in kept[0].text              # line structure preserved


def test_cli_lex_build_and_retrieve_index(tmp_path, spark, capsys, sf_dir):
    """lex-build → retrieve-index end-to-end: the indexed CLI serves the
    SAME ranked hits as the direct `retrieve` CLI over the same corpus
    (indexed == direct at the command layer), for both the single-query
    and the queries-table form; usage errors exit 2, not tracebacks."""
    import json

    from substreams_sink_parquet_spark.cli import main

    docs = f"{sf_dir}/documents.parquet"
    idx = str(tmp_path / "lexidx")

    rc = main(["lex-build", idx, "--docs", docs, "--buckets", "8"])
    assert rc == 0
    assert "lex-build OK" in capsys.readouterr().out

    rc = main(["retrieve", docs, "--query", "spark merge join fast", "--k", "5"])
    assert rc == 0
    direct = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    rc = main(["retrieve-index", idx, "--query", "spark merge join fast",
               "--k", "5"])
    assert rc == 0
    indexed = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert indexed == direct  # same docs, same scores, same order

    qt = str(tmp_path / "queries")
    spark.createDataFrame(
        [(1, "spark merge join fast"), (2, "hash join")],
        "query_id int, query string",
    ).write.parquet(qt)
    rc = main(["retrieve", docs, "--queries-table", qt, "--k", "3"])
    assert rc == 0
    direct_b = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    rc = main(["retrieve-index", idx, "--queries-table", qt, "--k", "3"])
    assert rc == 0
    indexed_b = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert indexed_b == direct_b

    assert main(["retrieve-index", idx]) == 2
    assert main(["retrieve-index", idx, "--query", "x",
                 "--queries-table", qt]) == 2
    assert main(["retrieve-index", idx, "--query", "   "]) == 2
    capsys.readouterr()


def test_cli_profile_reports_columns_and_histograms(tmp_path, spark, capsys):
    import json

    p = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a", 1.5), (2, "a", None), (3, None, 99.0)],
        "k long, s string, v double",
    ).write.parquet(p)

    rc = main(["profile", p, "--exact", "--hist", "v:0:10:4",
               "--quantiles", "v"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    cols = {c["column"]: c for c in out["columns"]}
    assert set(cols) == {"k", "s", "v"}
    assert cols["s"]["n_nulls"] == 1 and cols["s"]["n_distinct"] == 1
    assert cols["k"]["min_repr"] == "1" and cols["k"]["max_repr"] == "3"
    assert cols["v"]["max_repr"] == "99.00"
    qs = {q["p"]: q["q"] for q in out["quantiles"]}
    assert qs[0.5] == 50.25                # interpolated median of {1.5, 99.0}
    hist = out["histograms"]["v"]
    # 1.5 -> bin 0; 99.0 clamps into the top bin; null vanishes
    assert sum(b["cnt"] for b in hist) == 2
    assert hist[-1]["bin"] == 3 and hist[-1]["cnt"] == 1

    # approx default still reports every column with exact nulls/min/max
    rc = main(["profile", p, "--columns", "k,v"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert not out["exact_distinct"]
    assert {c["column"] for c in out["columns"]} == {"k", "v"}

    # malformed --hist fails loudly, not silently
    import pytest

    with pytest.raises(SystemExit):
        main(["profile", p, "--hist", "nope"])


def test_cli_profile_history_reports_drift(tmp_path, spark, capsys):
    import json

    lake = str(tmp_path / "lake")
    cols = "column string, n_rows long, n_nulls long, n_distinct long, min_repr string, max_repr string"
    spark.createDataFrame([("v", 10, 0, 5, "1", "9")], cols) \
        .write.parquet(f"{lake}/_profile/epoch=0")
    spark.createDataFrame([("v", 10, 6, 5, "1", "9")], cols) \
        .write.parquet(f"{lake}/_profile/epoch=1")

    assert main(["profile-history", lake]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out["epochs"]) == 2
    assert len(out["drift"]) == 1
    d = out["drift"][0]
    # null rate 0 -> 0.6 with an unchanged range: drifted, not range_changed
    assert d["epoch"] == 1 and d["drifted"] and not d["range_changed"]

    assert main(["profile-history", lake, "--drift-only"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [r["column"] for r in out["drift"]] == ["v"]


def test_cli_curate_profile_reports_distribution_drift(tmp_path, spark, capsys):
    """--profile: the report carries before-vs-after drift of the derived
    chars/words/lang profiles — curation that guts short junk must move
    the distribution visibly, and a lang that fully survives must not."""
    import json

    good = ("the quick brown fox jumps over a lazy dog while the patient "
            "cat watches from a warm sunny windowsill nearby today and it "
            "is a fine day of calm weather in the garden this morning")
    rows = [(i, f"{good} variant {i}", "en") for i in range(1, 5)] + [
        (i, "x", "en") for i in range(5, 25)  # junk the gate removes
    ]
    src = str(tmp_path / "docs_p")
    out = str(tmp_path / "curated_p")
    spark.createDataFrame(rows, "doc_id long, text string, lang string")\
        .write.parquet(src)
    rc = main(["curate", src, out, "--quality-gate", "--profile"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    drift = {d["column"]: d for d in rep["profile_drift"]}
    assert set(drift) == {"chars", "words", "lang"}
    # junk removal collapses the chars distribution: min moves 1 -> long
    assert drift["chars"]["drifted"] and drift["chars"]["range_changed"]
    # lang is 'en' on both sides: nothing to flag
    assert not drift["lang"]["drifted"]


def test_cli_catalog_lists_and_runs_queries(tmp_path, spark, capsys):
    rc = main(["catalog", "--list"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "q_profile_columns\toracle" in out and "q_agg_approx\trows" in out

    rc = main(["catalog", "q_agg_basic", "--sf-dir", "/root/testdata/sf0.001"])
    assert rc == 0
    assert "l_returnflag" in capsys.readouterr().out

    rc = main(["catalog", "q_filter", "--sf-dir", "/root/testdata/sf0.001",
               "--explain"])
    assert rc == 0
    plan = capsys.readouterr().out
    assert "PushedFilters" in plan and "Scan parquet" in plan

    assert main(["catalog", "q_agg_basic"]) == 2          # no --sf-dir
    assert main(["catalog", "q_profle_columns"]) == 2     # typo
    err = capsys.readouterr().err
    assert "did you mean" in err and "q_profile_columns" in err


def test_cli_profile_history_without_history_is_loud(tmp_path, spark, capsys):
    lake = str(tmp_path / "empty_lake")
    import os

    os.makedirs(lake)
    assert main(["profile-history", lake]) == 2
    assert "_profile" in capsys.readouterr().err


def test_cli_export_pretrain(tmp_path, spark, capsys, sf_dir):
    """export-pretrain end-to-end: writes the sharded artifact with a
    committed manifest whose totals conserve the input; the BPE variant
    reports its tokenizer; re-running with a new --seed reshuffles order
    in place (rebuild semantics, manifest stays consistent)."""
    from substreams_sink_parquet_spark.llm.export import (
        read_export_manifest, read_pretrain_export,
    )
    from substreams_sink_parquet_spark.cli import main

    docs = f"{sf_dir}/documents.parquet"
    n_docs = spark.read.parquet(docs).count()
    out = str(tmp_path / "export")

    rc = main(["export-pretrain", out, "--docs", docs,
               "--context-len", "256", "--n-shards", "4"])
    assert rc == 0
    msg = capsys.readouterr().out
    assert "export-pretrain OK" in msg and f"docs={n_docs}" in msg
    man = read_export_manifest(spark, out)
    assert man["total_docs"] == n_docs and man["n_shards"] == 4
    assert read_pretrain_export(spark, out).count() == n_docs

    # epoch re-export with a new seed: same membership, order moves
    first = {(r.shard_id, r.doc_id): r.pos
             for r in read_pretrain_export(spark, out).collect()}
    rc = main(["export-pretrain", out, "--docs", docs,
               "--context-len", "256", "--n-shards", "4", "--seed", "7"])
    assert rc == 0
    capsys.readouterr()
    second = {(r.shard_id, r.doc_id): r.pos
              for r in read_pretrain_export(spark, out).collect()}
    assert set(first) == set(second)  # same (shard, doc) membership
    assert any(first[k] != second[k] for k in first)  # order reshuffled

    # BPE variant
    out2 = str(tmp_path / "export_bpe")
    rc = main(["export-pretrain", out2, "--docs", docs,
               "--context-len", "256", "--n-shards", "2",
               "--bpe-merges", "30"])
    assert rc == 0
    assert "tokenizer=bpe" in capsys.readouterr().out
    assert "tokens" in read_pretrain_export(spark, out2).columns


def test_cli_bpe_train_and_frozen_export(tmp_path, spark, capsys, sf_dir):
    """bpe-train persists a frozen tokenizer; export-pretrain --tokenizer
    applies it and must tokenize EXACTLY like the same merges trained
    inline (--bpe-merges) on the same corpus — the reproducibility
    contract a persisted model exists for. The two flags together are a
    usage error; a model-less dir refuses loudly."""
    import pytest

    from substreams_sink_parquet_spark.cli import main
    from substreams_sink_parquet_spark.llm.bpe import read_bpe_model
    from substreams_sink_parquet_spark.llm.export import (
        read_pretrain_export,
    )

    docs = f"{sf_dir}/documents.parquet"
    model = str(tmp_path / "bpe_model")
    rc = main(["bpe-train", model, "--docs", docs, "--merges", "40"])
    assert rc == 0
    assert "merges=40" in capsys.readouterr().out
    assert len(read_bpe_model(spark, model)) == 40

    out_frozen = str(tmp_path / "exp_frozen")
    out_inline = str(tmp_path / "exp_inline")
    assert main(["export-pretrain", out_frozen, "--docs", docs,
                 "--n-shards", "2", "--tokenizer", model]) == 0
    assert main(["export-pretrain", out_inline, "--docs", docs,
                 "--n-shards", "2", "--bpe-merges", "40"]) == 0
    capsys.readouterr()
    a = sorted(
        (r.doc_id, r.n_tokens, tuple(r.tokens))
        for r in read_pretrain_export(spark, out_frozen).collect()
    )
    b = sorted(
        (r.doc_id, r.n_tokens, tuple(r.tokens))
        for r in read_pretrain_export(spark, out_inline).collect()
    )
    assert a == b

    assert main(["export-pretrain", str(tmp_path / "x"), "--docs", docs,
                 "--tokenizer", model, "--bpe-merges", "10"]) == 2
    with pytest.raises(FileNotFoundError, match="bpe-train"):
        main(["export-pretrain", str(tmp_path / "y"), "--docs", docs,
              "--tokenizer", str(tmp_path / "nope")])
    capsys.readouterr()


def test_cli_decontaminate(tmp_path, spark, capsys):
    """decontaminate end-to-end: a verbatim 8-gram leak is always caught;
    a punctuation-shifted copy of an eval doc is caught ONLY when
    --winnow is on (the cross-tokenization case word n-grams miss); a
    paraphrase sharing zero text is caught only by the embedding
    detector; the cleaned output excludes exactly the flagged docs and
    the JSON report names each detector's count."""
    import json

    from substreams_sink_parquet_spark.cli import main

    eval_text = ("what is the capital of freedonia the answer is "
                 "sylvania city of course")
    shifted = ("What, is the capital of freedonia; the answer is "
               "sylvania city -- of course!!")
    clean1 = "a completely unrelated document about spark window functions"
    clean2 = "another clean doc covering parquet row group layout details"
    train = spark.createDataFrame(
        [(1, "prefix words " + eval_text + " suffix words"),  # verbatim
         (2, shifted * 3),                                    # edited copy
         (3, clean1), (4, clean2), (5, "paraphrased leak no shared text")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, eval_text)], "doc_id long, text string"
    )
    tr_p, ev_p = str(tmp_path / "train"), str(tmp_path / "eval")
    train.write.parquet(tr_p)
    ev.write.parquet(ev_p)

    # n-gram only: verbatim flagged, shifted copy survives
    out1 = str(tmp_path / "clean1")
    assert main(["decontaminate", tr_p, "--eval", ev_p, "--out", out1]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["detectors"]["ngram"] == 1 and rep["flagged_total"] == 1
    kept = {r.doc_id for r in spark.read.parquet(out1).collect()}
    assert kept == {2, 3, 4, 5}

    # + winnow: the punctuation-shifted copy shares long char substrings
    out2 = str(tmp_path / "clean2")
    assert main(["decontaminate", tr_p, "--eval", ev_p, "--out", out2,
                 "--winnow"]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["detectors"]["winnow"] >= 2  # verbatim + shifted
    kept = {r.doc_id for r in spark.read.parquet(out2).collect()}
    assert 2 not in kept and 1 not in kept and {3, 4} <= kept

    # + semantic: doc 5's embedding sits on the eval vector. vec_id 999
    # also matches but is NOT a train doc (an embeddings table covering a
    # wider corpus — ADVICE r8): it must not inflate flagged_total or
    # skew the kept count, which has to equal the written output exactly
    emb_tr = spark.createDataFrame(
        [(5, [1.0, 0.0, 0.0, 0.0]), (3, [0.0, 1.0, 0.0, 0.0]),
         (4, [0.0, 0.0, 1.0, 0.0]), (999, [1.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    emb_ev = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    tre_p, eve_p = str(tmp_path / "emb_tr"), str(tmp_path / "emb_ev")
    emb_tr.write.parquet(tre_p)
    emb_ev.write.parquet(eve_p)
    out3 = str(tmp_path / "clean3")
    assert main(["decontaminate", tr_p, "--eval", ev_p, "--out", out3,
                 "--winnow", "--embeddings", tre_p,
                 "--eval-embeddings", eve_p]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["detectors"]["semantic"] == 2  # raw detector output: 5 + 999
    kept = {r.doc_id for r in spark.read.parquet(out3).collect()}
    assert kept == {3, 4}
    assert rep["flagged_total"] == 3  # 1, 2, 5 — train docs only, not 999
    assert rep["kept"] == len(kept) == rep["n_train"] - rep["flagged_total"]

    # usage error: embeddings without the eval side
    assert main(["decontaminate", tr_p, "--eval", ev_p,
                 "--out", str(tmp_path / "x"), "--embeddings", tre_p]) == 2
    capsys.readouterr()


def test_cli_quality_train_and_score(tmp_path, spark, capsys, sf_dir):
    """quality-train freezes the classifier; quality-score applies it:
    scores parquet has one row per doc with p_keep in [0,1]; a
    --min-p-keep threshold writes the filtered corpus beside the scores
    and keeps exactly the docs clearing it; a model-less dir refuses
    loudly naming quality-train."""
    import json

    import pytest

    from substreams_sink_parquet_spark.cli import main

    docs = f"{sf_dir}/documents.parquet"
    n = spark.read.parquet(docs).count()
    model = str(tmp_path / "qmodel")
    assert main(["quality-train", model, "--docs", docs]) == 0
    assert "quality-train OK" in capsys.readouterr().out

    out = str(tmp_path / "scores")
    assert main(["quality-score", model, "--docs", docs, "--out", out,
                 "--min-p-keep", "0.5"]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["n_docs"] == n
    scores = spark.read.parquet(out)
    assert scores.count() == n
    from pyspark.sql import functions as F

    assert scores.filter(
        (F.col("p_keep") < 0) | (F.col("p_keep") > 1)
    ).count() == 0
    kept = spark.read.parquet(out + "_kept")
    want = {r.doc_id for r in scores.filter(F.col("p_keep") >= 0.5)
            .collect()}
    assert {r.doc_id for r in kept.collect()} == want
    assert rep["kept"] == len(want)

    with pytest.raises(FileNotFoundError, match="quality-train"):
        main(["quality-score", str(tmp_path / "nope"), "--docs", docs,
              "--out", str(tmp_path / "x")])
    capsys.readouterr()


def test_cli_export_pretrain_mixture(tmp_path, spark, capsys, sf_dir):
    """--mixture runs the weighted-upsampling recipe before export: the
    manifest's doc count equals the mixture's total copy count (an
    upsampled group's docs appear more than once, each copy at its own
    position), only weighted groups are present, and a malformed spec or
    missing budget is a usage error."""
    import json

    from substreams_sink_parquet_spark.cli import main
    from substreams_sink_parquet_spark.llm.export import (
        read_export_manifest, read_pretrain_export,
    )
    from substreams_sink_parquet_spark.llm.sampling import mixture_plan
    from substreams_sink_parquet_spark.tables import load

    docs_p = f"{sf_dir}/documents.parquet"
    out = str(tmp_path / "exp_mix")
    rc = main(["export-pretrain", out, "--docs", docs_p, "--n-shards", "2",
               "--mixture", "lang:en=0.9,fr=0.05",
               "--budget-tokens", "30000"])
    assert rc == 0
    capsys.readouterr()

    docs = load(spark, sf_dir, "documents")
    plan = mixture_plan(docs, {"en": 0.9, "fr": 0.05}, 30_000)
    want_rows = sum(r.n_copies for r in plan.collect())
    man = read_export_manifest(spark, out)
    assert man["total_docs"] == want_rows
    back = read_pretrain_export(spark, out)
    assert back.count() == want_rows
    # upsampling visible: more exported rows than distinct source docs
    n_kept_docs = plan.filter("n_copies > 0").count()
    assert want_rows > n_kept_docs

    assert main(["export-pretrain", str(tmp_path / "x"), "--docs", docs_p,
                 "--mixture", "lang:en=0.9"]) == 2  # no budget
    assert main(["export-pretrain", str(tmp_path / "y"), "--docs", docs_p,
                 "--mixture", "garbage", "--budget-tokens", "10"]) == 2
    capsys.readouterr()


def test_cli_release_end_to_end(tmp_path, spark, capsys, sf_dir):
    """`release` cuts the physical artifact the hash-checked
    q_pipeline_release composition describes: every stage's survivor
    count is monotone non-increasing and recorded in the committed
    _RELEASE_REPORT.json; the export manifest totals agree with the
    report; the artifact passes the integrity audit; the gate-pair
    usage error refuses loudly."""
    import json

    from pyspark.sql import functions as F

    from substreams_sink_parquet_spark.cli import main
    from substreams_sink_parquet_spark.llm.export import (
        read_export_manifest,
        verify_pretrain_export,
    )
    from substreams_sink_parquet_spark.llm.lm import write_bigram_lm

    docs_p = f"{sf_dir}/documents.parquet"
    docs = spark.read.parquet(docs_p)
    # eval set sharing verbatim text (and so every 8-gram) with some docs
    eval_p = str(tmp_path / "eval.parquet")
    docs.filter(F.col("doc_id") % 11 == 0).select(
        "doc_id", "text"
    ).write.parquet(eval_p)
    # fluency reference trained on the 'en' slice
    lm_dir = str(tmp_path / "lm")
    write_bigram_lm(
        docs.filter(F.col("lang") == "en").select("doc_id", "text"),
        lm_dir, n_buckets=8,
    )

    assert main(["release", str(tmp_path / "x"), "--docs", docs_p,
                 "--lm-gate-dir", lm_dir]) == 2  # ceiling missing

    out = str(tmp_path / "release")
    rc = main([
        "release", out, "--docs", docs_p,
        "--quality-gate",
        "--eval", eval_p,
        "--lm-gate-dir", lm_dir, "--lm-max-score", "12.0",
        "--mixture", "lang:en=0.6,fr=0.4", "--budget-tokens", "20000",
        "--context-len", "256", "--n-shards", "4",
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    stages = ["input_docs", "after_quality_gate", "after_exact_dedup",
              "after_decontamination", "after_lm_gate"]
    counts = [report[s] for s in stages]
    assert counts[0] == docs.count()
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert report["after_decontamination"] < report["after_exact_dedup"]
    man = read_export_manifest(spark, out)
    assert man["total_docs"] == report["export"]["total_docs"]
    assert verify_pretrain_export(spark, out)["ok"]
    committed = json.loads(
        (tmp_path / "release" / "_RELEASE_REPORT.json").read_text()
    )
    assert committed == report


def test_cli_release_resumes_after_crash(tmp_path, spark, capsys, sf_dir,
                                         monkeypatch):
    """Kill the release pipeline between stages and rerun: completed
    stages are skipped (their receipts match) and the resumed artifact +
    _RELEASE_REPORT.json equal an uninterrupted run's row for row —
    every stage is deterministic, so resume-from-receipt cannot drift.
    Also: deleting a mid-chain receipt forces that stage and everything
    downstream to recompute, converging to the same artifact."""
    import json

    import pytest
    from pyspark.sql import functions as F

    import substreams_sink_parquet_spark.llm.dedup as dedup_mod
    import substreams_sink_parquet_spark.llm.export as export_mod
    from substreams_sink_parquet_spark.cli import main

    docs_p = f"{sf_dir}/documents.parquet"
    docs = spark.read.parquet(docs_p)
    eval_p = str(tmp_path / "eval.parquet")
    docs.filter(F.col("doc_id") % 11 == 0).select(
        "doc_id", "text"
    ).write.parquet(eval_p)

    def argv(out):
        return [
            "release", out, "--docs", docs_p,
            "--quality-gate", "--eval", eval_p,
            "--mixture", "lang:en=0.6,fr=0.4", "--budget-tokens", "20000",
            "--context-len", "256", "--n-shards", "4",
        ]

    def shard_rows(out):
        return sorted(
            tuple(r) for r in spark.read.parquet(f"{out}/shards").collect()
        )

    # reference: one uninterrupted run
    ref = str(tmp_path / "ref")
    assert main(argv(ref)) == 0
    ref_report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    out = str(tmp_path / "release")

    # crash #1: mid-decontamination (before that stage's receipt)
    real_decontam = dedup_mod.decontaminate
    monkeypatch.setattr(
        dedup_mod, "decontaminate",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("boom-decontam")),
    )
    with pytest.raises(RuntimeError, match="boom-decontam"):
        main(argv(out))
    monkeypatch.setattr(dedup_mod, "decontaminate", real_decontam)

    # crash #2: mid-export (all id stages + mixture committed)
    real_export = export_mod.write_pretrain_export
    monkeypatch.setattr(
        export_mod, "write_pretrain_export",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("boom-export")),
    )
    with pytest.raises(RuntimeError, match="boom-export"):
        main(argv(out))
    monkeypatch.setattr(export_mod, "write_pretrain_export", real_export)
    # upstream receipts survived both crashes
    for name in ("00_input", "01_quality", "02_dedup", "03_decontam",
                 "05_mixture"):
        assert (tmp_path / "release" / "_stages" / name /
                "_STAGE.json").exists(), name

    # resume: only export recomputes; artifact == uninterrupted run
    capsys.readouterr()
    assert main(argv(out)) == 0
    captured = capsys.readouterr()
    report = json.loads(captured.out.strip().splitlines()[-1])
    assert "skipped completed stages" in captured.err
    assert report == ref_report
    assert json.loads(
        (tmp_path / "release" / "_RELEASE_REPORT.json").read_text()
    ) == ref_report
    assert shard_rows(out) == shard_rows(ref)

    # a second full rerun skips EVERY stage and changes nothing
    assert main(argv(out)) == 0
    captured = capsys.readouterr()
    assert json.loads(
        captured.out.strip().splitlines()[-1]
    ) == ref_report
    assert "06_export" in captured.err
    assert shard_rows(out) == shard_rows(ref)

    # deleting a mid-chain receipt recomputes that stage + downstream,
    # converging to the same artifact
    (tmp_path / "release" / "_stages" / "02_dedup" / "_STAGE.json").unlink()
    assert main(argv(out)) == 0
    assert json.loads(
        capsys.readouterr().out.strip().splitlines()[-1]
    ) == ref_report
    assert shard_rows(out) == shard_rows(ref)

    # changing a stage argument invalidates downstream fingerprints
    assert main([
        "release", out, "--docs", docs_p,
        "--quality-gate", "--eval", eval_p,
        "--mixture", "lang:en=0.5,fr=0.5", "--budget-tokens", "20000",
        "--context-len", "256", "--n-shards", "4",
    ]) == 0
    changed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert changed["after_exact_dedup"] == ref_report["after_exact_dedup"]
    assert changed["after_mixture_rows"] != ref_report["after_mixture_rows"]


def test_cli_release_stale_receipt_and_content_invalidation(
        tmp_path, spark, capsys, sf_dir, monkeypatch):
    """Two crash/staleness rules of the stage protocol: (1) a recompute
    deletes the stage's receipt BEFORE overwriting its artifact, so a
    run with changed args that crashes mid-overwrite cannot leave the
    ORIGINAL args' receipt vouching for a clobbered artifact — a rerun
    with the original args recomputes instead of silently trusting it;
    (2) fingerprints carry a CONTENT hash of data-bearing inputs, so
    mutating the --docs dataset in place under the same path invalidates
    every stage rather than silently reusing the stale ids."""
    import json

    import pytest
    from pyspark.sql import functions as F

    import substreams_sink_parquet_spark.llm.sampling as sampling_mod
    from substreams_sink_parquet_spark.cli import main

    docs_p = str(tmp_path / "docs.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.write.parquet(docs_p)

    def argv(weights):
        return [
            "release", str(tmp_path / "rel"), "--docs", docs_p,
            "--mixture", f"lang:{weights}", "--budget-tokens", "20000",
            "--context-len", "256", "--n-shards", "4",
        ]

    assert main(argv("en=0.6,fr=0.4")) == 0
    ref = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    receipt = tmp_path / "rel" / "_stages" / "05_mixture" / "_STAGE.json"
    assert receipt.exists()

    # (1) changed-args run crashes mid-mixture-overwrite: the original
    # receipt must already be GONE (deleted before the overwrite began)
    real = sampling_mod.materialize_mixture
    monkeypatch.setattr(
        sampling_mod, "materialize_mixture",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("boom-mix")),
    )
    with pytest.raises(RuntimeError, match="boom-mix"):
        main(argv("en=0.5,fr=0.5"))
    assert not receipt.exists()
    monkeypatch.setattr(sampling_mod, "materialize_mixture", real)
    # rerun with the ORIGINAL args: no receipt -> recompute, same report
    capsys.readouterr()
    assert main(argv("en=0.6,fr=0.4")) == 0
    assert json.loads(
        capsys.readouterr().out.strip().splitlines()[-1]
    ) == ref

    # (1b) a crash mid-receipt-write leaves truncated JSON: the next
    # run treats it as absent and recomputes instead of wedging on a
    # parse error forever
    receipt.write_text('{"fp": "abc", "cou')
    crc = receipt.parent / ("." + receipt.name + ".crc")
    if crc.exists():
        crc.unlink()
    capsys.readouterr()
    assert main(argv("en=0.6,fr=0.4")) == 0
    assert json.loads(
        capsys.readouterr().out.strip().splitlines()[-1]
    ) == ref

    # (2) mutate the dataset IN PLACE (append one more parquet file):
    # same path, same args — every stage recomputes and sees the new doc
    docs.filter(F.col("doc_id") == 1).withColumn(
        "doc_id", F.lit(99_999_999).cast("long")
    ).write.mode("append").parquet(docs_p)
    assert main(argv("en=0.6,fr=0.4")) == 0
    captured = capsys.readouterr()
    grown = json.loads(captured.out.strip().splitlines()[-1])
    assert grown["input_docs"] == ref["input_docs"] + 1
    assert "skipped completed stages" not in captured.err


def test_cli_release_status_and_no_resume(tmp_path, spark, capsys, sf_dir,
                                          monkeypatch):
    """Operability of the resume machinery (VERDICT r10, Next #5 + ADVICE):
    --status walks the fingerprint chain RUNNING NOTHING and MUTATING
    NOTHING, names the exact stage a rerun would resume at after a
    mid-pipeline crash, says complete on a finished dir, and classifies
    a deleted mid-chain receipt as absent with everything downstream
    invalidated; --no-resume recomputes every stage even when all
    receipts match, converging to the identical report."""
    import json

    import pytest

    import substreams_sink_parquet_spark.llm.export as export_mod
    from substreams_sink_parquet_spark.cli import main

    docs_p = f"{sf_dir}/documents.parquet"
    out = str(tmp_path / "rel")

    def argv(*extra):
        return [
            "release", out, "--docs", docs_p, "--quality-gate",
            "--mixture", "lang:en=0.6,fr=0.4", "--budget-tokens", "20000",
            "--context-len", "256", "--n-shards", "4", *extra,
        ]

    def status():
        capsys.readouterr()
        assert main(argv("--status")) == 0
        st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        return st, {e["stage"]: e["state"] for e in st["stages"]}

    # empty dir: every stage absent, resume point is the first stage,
    # and the status walk created NOTHING
    st, states = status()
    assert st["complete"] is False and st["resume_point"] == "00_input"
    assert set(states.values()) == {"absent"}
    assert not (tmp_path / "rel").exists()

    # crash mid-export: status names 06_export as the resume point and
    # reports the committed stages' counts from their receipts
    monkeypatch.setattr(
        export_mod, "write_pretrain_export",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("boom-export")),
    )
    with pytest.raises(RuntimeError, match="boom-export"):
        main(argv())
    monkeypatch.undo()
    stage_dir = tmp_path / "rel" / "_stages"
    receipts_before = {
        p.relative_to(stage_dir): p.read_bytes()
        for p in stage_dir.rglob("_STAGE.json")
    }
    st, states = status()
    assert st["resume_point"] == "06_export"
    assert states["02_dedup"] == "complete"
    assert states["06_export"] == "absent"
    assert any("count" in e for e in st["stages"])
    # status never mutates: every receipt byte-identical after the walk
    assert {
        p.relative_to(stage_dir): p.read_bytes()
        for p in stage_dir.rglob("_STAGE.json")
    } == receipts_before

    # finish the run; status now reads complete end to end
    capsys.readouterr()
    assert main(argv()) == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    st, states = status()
    assert st["complete"] is True and st["resume_point"] is None
    assert set(states.values()) == {"complete"}

    # deleted mid-chain receipt: that stage reads absent; downstream
    # receipts still MATCH their fingerprints but an upstream recompute
    # forces them — classified invalidated, resume point at the hole
    (stage_dir / "02_dedup" / "_STAGE.json").unlink()
    st, states = status()
    assert st["resume_point"] == "02_dedup"
    assert states["01_quality"] == "complete"
    assert states["02_dedup"] == "absent"
    assert states["05_mixture"] == "invalidated"
    assert states["06_export"] == "invalidated"

    # changed stage argument: that stage and downstream read stale
    capsys.readouterr()
    assert main(argv()) == 0  # repair the hole first
    capsys.readouterr()
    assert main([
        "release", out, "--docs", docs_p, "--quality-gate",
        "--mixture", "lang:en=0.5,fr=0.5", "--budget-tokens", "20000",
        "--context-len", "256", "--n-shards", "4", "--status",
    ]) == 0
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    states = {e["stage"]: e["state"] for e in st["stages"]}
    assert states["02_dedup"] == "complete"
    assert states["05_mixture"] == "stale"
    assert states["06_export"] == "stale"
    assert st["resume_point"] == "05_mixture"

    # --no-resume: every stage recomputes (nothing skipped), identical
    # report, and the receipts end fresh (status reads complete)
    capsys.readouterr()
    assert main(argv("--no-resume")) == 0
    captured = capsys.readouterr()
    assert "skipped completed stages" not in captured.err
    assert json.loads(captured.out.strip().splitlines()[-1]) == report
    st, states = status()
    assert st["complete"] is True
    assert st["orphaned"] == []

    # a receipt the current flag set never visits (a dir produced by a
    # different pipeline shape) surfaces as orphaned, not silently hidden
    orphan = stage_dir / "03_decontam"
    orphan.mkdir()
    (orphan / "_STAGE.json").write_text('{"fp": "x", "count": 1}')
    st, states = status()
    assert st["orphaned"] == ["03_decontam"]
    assert st["complete"] is True  # the chain itself is untouched

    # a stage artifact deleted OUT OF BAND under an intact receipt:
    # status reports artifact-missing at that stage (not a false
    # complete), and a real rerun recomputes from there instead of
    # skipping into a crash on the missing ids path
    import shutil as _shutil

    _shutil.rmtree(stage_dir / "02_dedup" / "ids")
    st, states = status()
    assert states["02_dedup"] == "artifact-missing"
    assert states["05_mixture"] == "invalidated"
    assert st["resume_point"] == "02_dedup"
    capsys.readouterr()
    assert main(argv()) == 0
    assert json.loads(
        capsys.readouterr().out.strip().splitlines()[-1]
    ) == report
    st, states = status()
    assert st["complete"] is True


def test_cli_curate_bare_dedup_fails_closed_on_null_text(tmp_path, spark, capsys):
    """Without --quality-gate or --line-dedup (which each reject null
    text), the bare exact-dedup path hashed every null-text doc into one
    NULL md5 group and ADMITTED the min-doc_id keeper — a contentless doc
    in the curated corpus. Null text now fails closed at entry, with the
    drop counted in the report (code review r12)."""
    import json

    from substreams_sink_parquet_spark.cli import main

    rows = [
        (1, "a real document with words", "en"),
        (2, None, "en"),
        (3, None, "en"),
        (4, "a real document with words", "en"),  # exact dup of 1
    ]
    src = str(tmp_path / "docs")
    out = str(tmp_path / "curated")
    spark.createDataFrame(rows, "doc_id long, text string, lang string")\
        .write.parquet(src)
    assert main(["curate", src, out]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["input_docs"] == 4
    assert rep["null_text_dropped"] == 2
    assert rep["after_exact_dedup"] == 1
    assert [r.doc_id for r in spark.read.parquet(out).collect()] == [1]
