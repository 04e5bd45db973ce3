"""CLI mirroring the reference's commands (cmd/substreams-sink-parquet):

- ``run``   (run.go:17-65): stream staged raw-block parquet into a
  block-range-partitioned lake. The gRPC endpoint of the reference is
  replaced by a staging directory an external feeder appends to — the
  Structured Streaming file source provides ordered, checkpointed delivery.
- ``setup`` (setup.go:18-66): validate store access with a write/read/delete
  probe through the Hadoop filesystem API (file://, s3a://, gs://, abfs://).

Flags map 1:1 to the reference's where semantics carry over:
--partition-size, --start-block/--stop-block, --compression,
--row-group-rows, --explode, --undo-buffer-size; --cursor-file is replaced
by --checkpoint (strictly stronger semantics, SURVEY.md §3.3).
"""

from __future__ import annotations

import argparse
import sys
import time

from . import protowire as pw
from .schema import SchemaOptions
from .session import get_spark
from .sink.writer import WriterOptions
from .streaming.stream_sink import run_pipeline


def _load_manifest(path: str):
    """Read a raw FileDescriptorSet file OR a .spkg package manifest
    (factory.go:183-186: the reference always goes through the manifest).
    Returns (specs dict, SpkgManifest | None)."""
    from .spkg import parse_spkg

    with open(path, "rb") as fh:
        buf = fh.read()
    if path.endswith(".spkg"):
        manifest = parse_spkg(buf)
        return pw.parse_file_descriptor_set(manifest.file_descriptor_set), manifest
    return pw.parse_file_descriptor_set(buf), None


def _load_spec(descriptor_set_path: str, output_type: str | None,
               output_module: str | None = None) -> pw.MessageSpec:
    specs, manifest = _load_manifest(descriptor_set_path)
    if output_type is None:
        if output_module is None:
            raise SystemExit("one of --output-type / --output-module is required")
        if manifest is None:
            raise SystemExit(
                "--output-module requires an .spkg manifest (module output "
                "types live in the package, not in a bare FileDescriptorSet)"
            )
        output_type = manifest.output_type_of(output_module)
    if output_type not in specs:
        raise SystemExit(
            f"output type {output_type!r} not found; descriptor set defines: "
            + ", ".join(sorted(specs))
        )
    return specs[output_type]


def _resolve_endpoint(args: argparse.Namespace) -> None:
    """Endpoint-mode skeleton (run.go:73-92 parity): resolve the endpoint
    from --endpoint or --network, then report that live gRPC delivery is not
    available in this build and point at the staged-feeder contract that
    replaces it. Endpoint mode is opt-in by EXPLICIT flag only: a manifest's
    network field does NOT trigger it (the reference always runs in endpoint
    mode so it can fall back to the manifest; here the default is the staged
    feeder, and a .spkg that happens to declare a network must not break a
    staged run)."""
    endpoint = args.endpoint
    if endpoint is None and args.network is None:
        return  # staged-feeder mode: input_dir is the stream
    if endpoint is None:
        # ExtractNetworkEndpoint shape
        endpoint = f"{args.network}.streamingfast.io:443"
    raise SystemExit(
        f"live gRPC endpoint mode ({endpoint}) is not available in "
        "this build: no substreams gRPC client in the environment. Use the "
        "staged-feeder contract instead — point any gRPC feeder at a staging "
        "directory of raw-block parquet (block_number, block_id, payload) and "
        "pass it as input_dir; delivery/ordering/checkpointing semantics are "
        "identical (sources/staging.py)."
    )


def _rollup_spec_from_args(args: argparse.Namespace):
    """--rollup-bucket-size/-measure/-group -> RollupSpec (None = off)."""
    if getattr(args, "rollup_bucket_size", None) is None:
        if args.rollup_measure or args.rollup_group:
            raise SystemExit(
                "--rollup-measure/--rollup-group require --rollup-bucket-size "
                "(no rollup is maintained without it)"
            )
        return None
    from .streaming.rollup import RollupSpec

    measures = {}
    for m in args.rollup_measure:
        parts = m.split(":", 2)
        if len(parts) != 3:
            raise SystemExit(
                f"--rollup-measure expects NAME:AGG:COL, got {m!r}"
            )
        name, agg, col = parts
        measures[name] = (agg, col)
    if not measures:
        measures = {"n_rows": ("count", "*")}
    try:
        return RollupSpec(
            bucket_col="block_number",
            bucket_size=args.rollup_bucket_size,
            group_cols=tuple(args.rollup_group),
            measures=measures,
        )
    except ValueError as e:  # non-decomposable agg etc. -> CLI-shaped error
        raise SystemExit(f"--rollup-measure: {e}")


def cmd_run(args: argparse.Namespace) -> int:
    _resolve_endpoint(args)
    spark = get_spark("sink-run")
    spec = _load_spec(args.descriptor_set, args.output_type, args.output_module)
    opts = WriterOptions(
        partition_size=args.partition_size,
        start_block=args.start_block,
        end_block=args.stop_block,
        compression=args.compression,
        compression_level=args.compression_level,
        row_group_rows=args.row_group_rows,
        page_size=args.page_size,
        write_stats=not args.no_parquet_stats,
        dict_encoding=not args.no_dict_encoding,
        target_file_bytes=args.target_file_bytes,
        bloom_filter_columns=tuple(args.bloom_filter),
        pad=args.pad_width,
        write_tasks=args.write_tasks,
    )
    out_dir = args.store_url
    if args.output_prefix:
        from .fsio import url_join

        out_dir = url_join(out_dir, args.output_prefix)
    query, sink = run_pipeline(
        spark,
        input_dir=args.input_dir,
        out_dir=out_dir,
        spec=spec,
        checkpoint_dir=args.checkpoint,
        opts=opts,
        schema_opts=SchemaOptions(
            uint64_as=args.uint64_as,
            map_as=args.map_as,
        ),
        undo_holdback=args.undo_buffer_size,
        explode=args.explode,
        available_now=args.drain_and_exit,
        flush_interval=f"{args.flush_interval_s} seconds",
        exploded_write_workers=args.exploded_write_workers,
        max_files_per_trigger=args.max_files_per_trigger,
        rollup_spec=_rollup_spec_from_args(args),
        profile_columns=(args.profile_columns.split(",")
                         if args.profile_columns else None),
    )
    # 30s stats cadence like the reference's ticker (sinker.go:19-90)
    while query.isActive:
        query.awaitTermination(30)
        p = query.lastProgress
        if p:
            print(f"progress: batch={p.get('batchId')} rows={p.get('numInputRows')}",
                  file=sys.stderr)
    if args.stop_block is not None:
        # terminal run: finalize held-back / clamped ranges (Close parity,
        # writer.go:275-277). Only with --stop-block — a plain drain may be
        # resumed later from the same checkpoint, and its live ranges must
        # stay appendable (the resume-no-duplicates contract).
        sink.close()
    return 0


def cmd_query(args: argparse.Namespace) -> int:
    """Run SQL over a sink lake: each ``--table name=dir`` registers the
    directory's range files (block-range file-pruned when --start/--end are
    given) as a temp view, then executes the query and prints it.

    The reference hands its lake to downstream engines for this step
    (README positions Clickhouse/DuckDB); here the engine is the same Spark
    session that wrote the lake."""
    from .sink.writer import read_lake

    spark = get_spark("sink-query")
    for spec_ in args.table:
        name, _, d = spec_.partition("=")
        if not d:
            raise SystemExit(f"--table expects name=dir, got {spec_!r}")
        # --stop-block is EXCLUSIVE everywhere in this CLI (run's contract);
        # read_lake's end_block is an inclusive query bound, so convert
        end = args.stop_block - 1 if args.stop_block is not None else None
        read_lake(spark, d, args.start_block, end).createOrReplaceTempView(name)
    df = spark.sql(args.sql)
    df.show(args.limit, truncate=False)
    return 0


def cmd_stats(args: argparse.Namespace) -> int:
    """Lake health report (metadata-only): file/range counts, bytes, block
    coverage, gap/overlap detection. Extends the reference's runtime stats
    ticker (sinker.go:19-90) with an at-rest integrity check of the
    contiguity invariant its writer maintains (writer.go:220-267)."""
    import json

    from .fsio import HadoopFS
    from .sink.writer import lake_coverage

    spark = get_spark("sink-stats")
    report = lake_coverage(HadoopFS(spark, args.store_url), args.store_url)
    print(json.dumps(report))
    return 0 if report["contiguous"] else 1


def cmd_profile(args: argparse.Namespace) -> int:
    """Per-column profile of any parquet directory (a lake table dir or a
    plain dataset): nulls / distinct / min-max repr per column in ONE
    aggregate pass (operators/profiling.py), printed as a JSON report.
    Distinct counts are HLL sketches by default (the exchange stays
    column-count-sized at any corpus size); ``--exact`` switches to real
    COUNT(DISTINCT). ``--hist col:lo:hi:bins`` appends fixed-bound
    histograms, map-only binning with outliers clamped into edge bins."""
    import json

    from .operators.profiling import numeric_histogram, profile_table

    spark = get_spark("profile")
    df = spark.read.parquet(args.path)
    if args.columns:
        cols = args.columns.split(",")
    else:
        # maps aren't orderable (no min/max); everything else profiles
        cols = [c for c, t in df.dtypes if not t.startswith("map")]
    prof = profile_table(df, cols, exact_distinct=args.exact)
    out = {"table": args.path, "exact_distinct": bool(args.exact),
           "columns": [r.asDict() for r in prof.collect()]}
    if args.quantiles:
        from .operators.profiling import profile_quantiles

        # exact when --exact (distinct-value-bounded state), else the
        # fixed-size percentile_approx sketch — same trade as distinct
        out["quantiles"] = [
            r.asDict()
            for r in profile_quantiles(
                df, args.quantiles.split(","), exact=args.exact
            ).orderBy("column", "p").collect()
        ]
    for spec_ in args.hist or []:
        try:
            col, lo, hi, bins = spec_.rsplit(":", 3)
            hist = numeric_histogram(df, col, float(lo), float(hi), int(bins))
        except ValueError as e:
            raise SystemExit(f"--hist expects col:lo:hi:bins, got {spec_!r}: {e}")
        out.setdefault("histograms", {})[col] = [
            r.asDict() for r in hist.orderBy("bin").collect()
        ]
    print(json.dumps(out))
    return 0


def cmd_profile_history(args: argparse.Namespace) -> int:
    """Read the per-epoch ingest profiles a ``run --profile-columns``
    stream recorded under ``_profile/`` and print them plus the
    epoch-over-epoch drift verdicts (operators/profiling.py lag-window
    path) as a JSON report. ``--drift-only`` trims to flagged rows —
    the page an on-call engineer actually wants."""
    import json

    from .operators.profiling import profile_history_drift, read_profile_history

    spark = get_spark("profile-history")
    from .fsio import HadoopFS, url_join

    if not HadoopFS(spark, args.store_url).exists(
        url_join(args.store_url, "_profile")
    ):
        print(f"profile-history: no _profile/ under {args.store_url} — "
              "run the stream with --profile-columns (block sink) or "
              "--profile (corpus builder) first", file=sys.stderr)
        return 2
    hist = read_profile_history(spark, args.store_url)
    drift = profile_history_drift(hist)
    if args.drift_only:
        drift = drift.filter("drifted")
    out = {
        "store": args.store_url,
        "epochs": [r.asDict() for r in hist.orderBy("epoch", "column").collect()],
        "drift": [r.asDict() for r in drift.orderBy("epoch", "column").collect()],
    }
    print(json.dumps(out))
    return 0


def cmd_undo(args: argparse.Namespace) -> int:
    """Deep-reorg escape hatch: retract every block above the fork point
    from a STOPPED sink lake — live staging AND finalized range files, main
    table and exploded children (SURVEY §7.2; the reference errors on undo
    without a buffer, sinker.go:142-148). Restart the stream afterwards to
    re-feed from the fork."""
    from .sink.writer import WriterOptions as WO
    from .streaming.stream_sink import undo_lake

    spark = get_spark("sink-undo")
    undo_lake(
        spark,
        args.store_url,
        args.last_valid_block,
        WO(partition_size=args.partition_size, start_block=args.start_block),
    )
    print(f"undo OK: retracted blocks > {args.last_valid_block} in {args.store_url}")
    return 0


def cmd_compact(args: argparse.Namespace) -> int:
    """Compact the live staging area's per-epoch small files, per table
    (main + exploded children). Safe to re-run: crashed prior runs are
    recovered first (write-ahead manifest protocol, sink/maintenance.py)."""
    import json

    from .fsio import HadoopFS
    from .sink.maintenance import compact_live
    from .streaming.stream_sink import lake_table_dirs

    spark = get_spark("sink-compact")
    fs = HadoopFS(spark, args.store_url)
    report = {}
    for table_dir in lake_table_dirs(fs, args.store_url):
        done = compact_live(
            spark, table_dir,
            target_files=args.target_files,
            min_files=args.min_files,
            compression=args.compression,
        )
        if done:
            report[table_dir] = {str(rs): list(v) for rs, v in done.items()}
    from .fsio import url_join
    from .streaming.rollup import compact_rollup, load_rollup_spec

    rollup_dir = url_join(args.store_url, "_rollup")
    if fs.exists(rollup_dir):
        spec = load_rollup_spec(fs, rollup_dir)
        if spec is not None:
            # a "stopped" lake includes crashed-not-drained streams, whose
            # trailing rollup epoch may belong to a batch with an
            # uncommitted offset — folding it into epoch=-1 would count
            # that batch twice after checkpoint replay. Fold it only under
            # the explicit --drained assertion.
            folded = compact_rollup(
                spark, rollup_dir, spec, include_latest=args.drained
            )
            report["_rollup"] = {"epochs_folded": folded}
    print(json.dumps(report))
    return 0


def cmd_tier(args: argparse.Namespace) -> int:
    """Re-chunk aged finalized range files into larger tiers, per table
    (main + exploded children). Only complete grid-aligned groups merge,
    so it is safe behind an active sink's finalize horizon; crashed prior
    runs are recovered first (sink/maintenance.py:tier_finalized)."""
    import json

    from .fsio import HadoopFS
    from .sink.maintenance import tier_finalized
    from .streaming.stream_sink import lake_table_dirs

    from .sink.writer import WriterOptions

    spark = get_spark("sink-tier")
    fs = HadoopFS(spark, args.store_url)
    opts = WriterOptions(
        compression=args.compression,
        compression_level=args.compression_level,
        row_group_rows=args.row_group_rows,
        bloom_filter_columns=tuple(args.bloom_filter),
    )
    report = {}
    for table_dir in lake_table_dirs(fs, args.store_url):
        done = tier_finalized(
            spark, table_dir,
            tier_blocks=args.tier_blocks,
            pad=args.pad,
            opts=opts,
        )
        if done:
            report[table_dir] = {k: list(v) for k, v in done.items()}
    print(json.dumps(report))
    return 0


def cmd_corpus(args: argparse.Namespace) -> int:
    """Streaming corpus builder: drain JSONL shards from a staging dir into
    an exact-deduped corpus lake (quarantined bad lines, persistent hash
    index — streaming/corpus_stream.py). Re-runnable: the checkpoint
    resumes file tracking; re-crawled content is rejected by the index."""
    from .streaming.corpus_stream import corpus_docs, run_corpus_pipeline

    spark = get_spark("corpus-build")
    query, _sink = run_corpus_pipeline(
        spark, args.input_dir, args.store_url, args.checkpoint,
        available_now=not args.follow,
        flush_interval=args.flush_interval,
        near_dup=args.near_dup,
        neardup_threshold=args.neardup_threshold,
        embed_dup=args.embed_dup,
        embed_threshold=args.embed_threshold,
        embed_dim=args.embed_dim,
        ann_index_dir=args.ann_index,
        lexical_index_dir=args.lexical_index,
        lm_dir=args.lm_dir,
        lm_gate_dir=args.lm_gate_dir,
        lm_gate_max_score=args.lm_gate_max_score,
        lm_gate_alpha=args.lm_gate_alpha,
        input_format=args.format,
        quality_gate=args.quality_gate,
        line_dedup_min_docs=args.line_dedup_min_docs,
        profile=args.profile,
        decontaminate_eval_dir=args.decontaminate_eval,
        decontaminate_ngram=args.decontaminate_ngram,
        decontaminate_mode=args.decontaminate_mode,
    )
    query.awaitTermination()
    n = corpus_docs(spark, args.store_url).count()
    print(f"corpus OK: {n} admitted documents in {args.store_url}")
    return 0


def cmd_corpus_compact(args: argparse.Namespace) -> int:
    """Merge the corpus hash index's per-batch epoch dirs into one
    (crash-safe manifest swap; run against a STOPPED corpus stream)."""
    from .streaming.corpus_stream import compact_index

    spark = get_spark("corpus-compact")
    did = compact_index(spark, args.store_url, min_epochs=args.min_epochs)
    print(f"corpus-compact OK: {'merged' if did else 'nothing to do'} in {args.store_url}")
    return 0


def cmd_corpus_export(args: argparse.Namespace) -> int:
    """Materialize a (possibly time-travel) snapshot of the streaming
    corpus as the trainer-facing artifact (llm/export.py): one
    pos-ordered file per shard dir + committed manifest, packing seq_ids
    riding along, lang/source metadata kept when present. The streaming
    pipeline's last mile: crawl -> screens -> admitted corpus ->
    `--as-of-epoch N` snapshot -> ordered shards."""
    from .llm.export import write_pretrain_export
    from .streaming.corpus_stream import corpus_docs

    spark = get_spark("corpus-export")
    docs = corpus_docs(spark, args.store_url, as_of_epoch=args.as_of_epoch)
    riders = tuple(c for c in ("lang", "source") if c in docs.columns)
    man = write_pretrain_export(
        docs, args.out_dir, context_len=args.context_len,
        n_shards=args.shards, seed=args.seed, keep_cols=riders,
    )
    print(f"corpus-export OK: {args.shards} shards in {args.out_dir} "
          f"docs={man['total_docs']} tokens={man['total_tokens']}")
    return 0


def cmd_ann_build(args: argparse.Namespace) -> int:
    """Build (or rebuild) a persisted IVF-PQ index from a parquet table of
    (vec_id, embedding) rows: codes partitioned by cell + kilobyte
    metadata (llm/ann_index.py). Query it with ``ann-query``; grow it
    without retraining via ``--append``."""
    from .llm.ann_index import append_to_ann_index, write_ann_index

    if args.append:
        # append encodes under the index's FROZEN quantizer/codebooks —
        # build parameters cannot apply; refuse them rather than letting a
        # user believe they rescaled the index
        explicit = [
            n for n, v in (("--dim", args.dim), ("--cells", args.cells),
                           ("--m", args.m), ("--codes", args.codes))
            if v is not None
        ] + (["--no-residual"] if args.no_residual else []) \
          + (["--opq-iters"] if args.opq_iters else [])
        if explicit:
            print(f"ann-build: {', '.join(explicit)} cannot be combined with "
                  "--append (the existing index's parameters are frozen; "
                  "rebuild without --append to change them)", file=sys.stderr)
            return 2
    elif args.dim is None:
        print("ann-build: --dim is required when building (not --append)",
              file=sys.stderr)
        return 2
    spark = get_spark("ann-build")
    vecs = spark.read.parquet(args.embeddings)
    if args.append:
        append_to_ann_index(vecs, args.index_dir)
        print(f"ann-build OK: appended vectors from {args.embeddings} "
              f"into {args.index_dir}")
        return 0
    meta = write_ann_index(
        vecs, args.index_dir, dim=args.dim,
        n_centroids=args.cells if args.cells is not None else 16,
        m=args.m if args.m is not None else 8,
        n_codes=args.codes if args.codes is not None else 16,
        residual=not args.no_residual,
        opq_iters=args.opq_iters,
    )
    print(
        f"ann-build OK: {args.index_dir} cells={len(meta['centroids'])} "
        f"m={meta['m']} codes={meta['n_codes']} residual={meta['residual']}"
        f" opq={'rotation' in meta}"
    )
    return 0


def cmd_ann_compact(args: argparse.Namespace) -> int:
    """Fold the streaming code appends (``codes_epochs/epoch=N``) into one
    ``epoch=-1`` dir — crash-safe manifest swap, trailing epoch excluded;
    run against a STOPPED corpus stream (single-writer discipline, same as
    corpus-compact)."""
    from .llm.ann_index import compact_ann_epochs

    spark = get_spark("ann-compact")
    did = compact_ann_epochs(spark, args.index_dir, min_epochs=args.min_epochs)
    print(f"ann-compact OK: {'merged' if did else 'nothing to do'} "
          f"in {args.index_dir}")
    return 0


def cmd_ann_query(args: argparse.Namespace) -> int:
    """Top-k search against a persisted index; queries are a parquet table
    of (vec_id, embedding) rows. Prints one JSON line per query id with
    its ranked neighbor ids."""
    import json

    from pyspark.sql import functions as F

    from .llm.ann_index import ann_topk

    spark = get_spark("ann-query")
    queries = spark.read.parquet(args.queries).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    res = ann_topk(spark, args.index_dir, queries, k=args.k, nprobe=args.nprobe)
    out: dict[int, list[int]] = {}
    for r in res.orderBy("q_id", "rank").collect():
        out.setdefault(r.q_id, []).append(r.neighbor_id)
    for q_id in sorted(out):
        print(json.dumps({"q_id": q_id, "neighbors": out[q_id]}))
    return 0


def cmd_lex_build(args: argparse.Namespace) -> int:
    """Build (or rebuild) the persisted BM25 postings index from a parquet
    table of (doc_id, text) rows: postings partitioned by term-hash
    bucket + a 2-number meta (llm/lexical_index.py). Query it with
    ``retrieve-index``; a corpus stream grows it via epoch appends
    (``corpus --lexical-index``)."""
    from .llm.lexical_index import write_lexical_index

    spark = get_spark("lex-build")
    docs = spark.read.parquet(args.docs).select("doc_id", "text")
    meta = write_lexical_index(docs, args.index_dir, n_buckets=args.buckets)
    print(f"lex-build OK: {args.index_dir} buckets={meta['n_buckets']} "
          f"n_docs={meta['n_docs']} sum_dl={meta['sum_dl']}")
    return 0


def cmd_lex_compact(args: argparse.Namespace) -> int:
    """Fold a corpus stream's per-batch postings appends
    (``postings_epochs/epoch=N``) into one ``epoch=-1`` dir — crash-safe
    manifest swap, trailing epoch excluded; run against a STOPPED corpus
    stream (single-writer discipline, same as ann-compact)."""
    from .llm.lexical_index import compact_lexical_epochs

    spark = get_spark("lex-compact")
    did = compact_lexical_epochs(spark, args.index_dir,
                                 min_epochs=args.min_epochs)
    print(f"lex-compact OK: {'merged' if did else 'nothing to do'} "
          f"in {args.index_dir}")
    return 0


def cmd_bpe_train(args: argparse.Namespace) -> int:
    """Train a BPE tokenizer on a corpus and persist the merge list as a
    lake artifact (llm/bpe.py:write_bpe_model) — train once, freeze,
    apply everywhere: exports that retrain per run have token boundaries
    that move whenever the corpus does."""
    from .llm.bpe import train_bpe, write_bpe_model

    spark = get_spark("bpe-train")
    docs = spark.read.parquet(args.docs).select("text")
    merges = train_bpe(docs, num_merges=args.merges,
                       max_words=args.max_words)
    write_bpe_model(spark, merges, args.model_dir, max_words=args.max_words)
    print(f"bpe-train OK: {args.model_dir} merges={len(merges)}")
    return 0


def cmd_export_pretrain(args: argparse.Namespace) -> int:
    """Lay a curated corpus down as the trainer-facing artifact: one
    pos-ordered parquet file per shard dir + a committed manifest
    (llm/export.py). (shard, pos) is a pure function of (doc_id, seed,
    n_shards), so re-exports reproduce byte order and a new --seed
    reshuffles the next epoch's order without moving docs between
    shards. --tokenizer applies a FROZEN persisted BPE model (the
    reproducible path); --bpe-merges trains one on the fly from this
    corpus. Either carries token arrays in the shards. --mixture +
    --budget-tokens runs the Pile/Dolma recipe first: weighted per-group
    quotas with deterministic upsampling, each repeated copy exported at
    its own stable (shard, pos)."""
    from .llm.export import write_pretrain_export

    if args.tokenizer and args.bpe_merges:
        print("export-pretrain: --tokenizer and --bpe-merges are mutually "
              "exclusive (a persisted model IS the trained merges)",
              file=sys.stderr)
        return 2
    spark = get_spark("export-pretrain")
    docs = spark.read.parquet(args.docs)
    id_col = "doc_id"
    if args.mixture:
        from .llm.sampling import materialize_mixture, mixture_plan

        try:
            group_col, rest = args.mixture.split(":", 1)
            weights = {
                k: float(v)
                for k, v in (kv.split("=") for kv in rest.split(","))
            }
        except ValueError:
            print("export-pretrain: --mixture wants COL:g1=w1,g2=w2,... "
                  "(e.g. lang:en=0.5,fr=0.2)", file=sys.stderr)
            return 2
        if not args.budget_tokens:
            print("export-pretrain: --mixture requires --budget-tokens",
                  file=sys.stderr)
            return 2
        plan = mixture_plan(docs, weights, args.budget_tokens,
                            group_col=group_col, seed=args.seed)
        # copies materialize under collision-guarded mix_ids so an
        # upsampled doc's epochs land at their own stable (shard, pos);
        # --mixture-id hash is the any-id-range strategy a real ingested
        # corpus (xxhash64 doc_ids) needs
        docs = materialize_mixture(docs, plan, id_strategy=args.mixture_id)
        id_col = "mix_id"
    docs = docs.select(id_col, "text")
    merges = None
    if args.tokenizer:
        from .llm.bpe import read_bpe_model

        merges = read_bpe_model(spark, args.tokenizer)
    elif args.bpe_merges:
        from .llm.bpe import train_bpe

        merges = train_bpe(docs, num_merges=args.bpe_merges)
    man = write_pretrain_export(
        docs, args.out_dir, context_len=args.context_len,
        n_shards=args.n_shards, seed=args.seed, merges=merges,
        id_col=id_col,
    )
    print(f"export-pretrain OK: {args.out_dir} shards={man['n_shards']} "
          f"docs={man['total_docs']} tokens={man['total_tokens']} "
          f"seqs={man['total_seqs']} tokenizer={man['tokenizer']}")
    return 0


def cmd_release(args: argparse.Namespace) -> int:
    """Cut a training-data RELEASE in one command — the physical-artifact
    twin of the hash-checked q_pipeline_release composition: quality gate
    (opt-in Gopher cascade) -> exact dedup (always; min-doc_id keeper) ->
    benchmark decontamination (--eval) -> CCNet fluency gate
    (--lm-gate-dir + --lm-max-score) -> weighted mixture with
    deterministic upsampling (--mixture COL:g=w,...) -> sharded
    pre-training export with committed manifest + a _RELEASE_REPORT.json
    of per-stage survivor counts.

    RESUMABLE: one shared stage protocol (``_run_stage``) commits a
    receipt per stage (``_stages/<k>_<name>/_STAGE.json``) carrying its
    payload and a fingerprint chained over (stage, params, upstream
    fingerprint); data-bearing params carry a CONTENT fingerprint
    (recursive size+mtime listing), so a dataset mutated in place under
    the same path invalidates its stages instead of silently reusing
    them. Receipts follow BOTH crash rules of the index family:
    marker-LAST on success (artifact first, then receipt — a crash
    between leaves no receipt and the stage recomputes) and
    marker-DELETE-FIRST on recompute (a stale receipt is removed before
    its artifact is overwritten — a crash mid-overwrite cannot leave an
    old receipt vouching for a clobbered artifact). Because every stage
    is deterministic (seeded hashes, min-doc_id keepers), a resumed run
    equals an uninterrupted run row for row (pytest-pinned by killing
    the pipeline between stages).

    Stage artifacts also end the recompute-and-pin economics the
    persist-chain form had (ADVICE r9): survivors are narrow doc_id
    parquet (bytes per row at 100 TB), every stage reads docs ⋈ the
    LAST receipt's ids (a written artifact — no lineage recompute, no
    executor storage pinned for the command's lifetime), and the
    mixture is materialized ONCE — its narrow (mix_id, doc_id, copy,
    grp) rows are written, counted from the artifact, and re-joined to
    text only inside the export job.

    Operability: ``--status`` walks the same chain computing the same
    fingerprints but runs and mutates NOTHING — it prints each stage's
    receipt state (complete / artifact-missing / invalidated / stale /
    torn / absent), receipts orphaned by a different flag set, and the
    exact resume point a rerun would start at; ``--no-resume``
    recomputes every stage, the escape hatch for the content
    fingerprint's documented blind spot (ADVICE r10)."""
    import json as _json

    from pyspark.sql import functions as F

    from .fsio import HadoopFS, url_join
    from .llm.export import write_pretrain_export

    if (args.lm_gate_dir is None) != (args.lm_max_score is None):
        print("release: --lm-gate-dir and --lm-max-score come as a pair",
              file=sys.stderr)
        return 2
    weights = None
    if args.mixture:
        try:
            mix_group_col, rest = args.mixture.split(":", 1)
            weights = {
                k: float(v)
                for k, v in (kv.split("=") for kv in rest.split(","))
            }
        except ValueError:
            print("release: --mixture wants COL:g1=w1,g2=w2,... "
                  "(e.g. lang:en=0.5,fr=0.2)", file=sys.stderr)
            return 2
        if not args.budget_tokens:
            print("release: --mixture requires --budget-tokens",
                  file=sys.stderr)
            return 2
    spark = get_spark("release")
    docs0 = spark.read.parquet(args.docs)
    if "doc_id" not in docs0.columns or "text" not in docs0.columns:
        print("release: input needs doc_id and text columns",
              file=sys.stderr)
        return 2
    fs = HadoopFS(spark, args.out_dir)
    st_root = url_join(args.out_dir, "_stages")
    report: dict = {}
    # --no-resume: recompute every stage (stale receipts are deleted
    # stage-by-stage by the protocol's delete-first rule and rewritten
    # fresh) — the operator's escape hatch for the content fingerprint's
    # documented blind spot (a nested rewrite preserving total bytes,
    # file/dir counts, and every top-level status; fsio.py
    # content_fingerprint), which would otherwise need manual _stages
    # surgery (ADVICE r10)
    state = {"fp": "", "resume": not getattr(args, "no_resume", False),
             "skipped": [],
             # --status: walk the same stage chain computing the same
             # fingerprints, but execute nothing and mutate nothing —
             # just classify each stage's receipt; the resume machinery
             # is the release path's backbone and operators need to SEE
             # it (VERDICT r10, Next #5)
             "status": [] if getattr(args, "status", False) else None}

    def _content(path: str) -> str:
        return HadoopFS(spark, path).content_fingerprint(path)

    def _fp(stage: str, params: dict, prev: str) -> str:
        import hashlib

        return hashlib.md5(_json.dumps(
            [stage, params, prev], sort_keys=True
        ).encode()).hexdigest()

    def _run_stage(name: str, params: dict, from_receipt, recompute,
                   artifact: str | None = None) -> None:
        """THE stage protocol (every stage goes through here — a fix to
        the resume rules lands once): advance the fingerprint chain;
        skip when a committed receipt matches it AND the stage's written
        ``artifact`` still exists (``from_receipt`` restores the report
        entries); otherwise delete the stale receipt FIRST, run
        ``recompute`` (which writes the stage artifact and returns the
        receipt payload), and commit the receipt LAST. The artifact
        existence check keeps a receipt honest after out-of-band artifact
        deletion: the protocol writes artifact-before-receipt, so a
        receipt normally implies its artifact — but a cleanup script
        removing ids/ while leaving _STAGE.json would otherwise make the
        resume skip a stage whose output the next stage then fails to
        read."""
        state["fp"] = _fp(name, params, state["fp"])
        receipt_path = url_join(st_root, name, "_STAGE.json")
        torn = False
        try:
            r = (_json.loads(fs.read_bytes(receipt_path))
                 if fs.exists(receipt_path) else None)
        except ValueError:
            # a crash mid-receipt-write leaves truncated JSON: treat as
            # absent (the recompute path deletes and rewrites it) rather
            # than wedging every future resume on a parse error
            r = None
            torn = True
        art_ok = artifact is None or fs.exists(artifact)
        if state["status"] is not None:
            # status walk: classify and return — no deletes, no writes,
            # no recompute. "complete" = a rerun with these args would
            # skip it; "artifact-missing" = receipt matches but the stage
            # output it vouches for is gone (deleted out of band);
            # "invalidated" = its own receipt matches but an upstream
            # recompute (or --no-resume) forces it anyway; "stale" =
            # receipt fingerprint disagrees with these args / inputs;
            # "torn" = truncated receipt (crash mid-write).
            fp_ok = bool(r) and r.get("fp") == state["fp"]
            entry = {"stage": name,
                     "state": ("complete" if fp_ok and state["resume"]
                               and art_ok
                               else "artifact-missing" if fp_ok
                               and state["resume"]
                               else "invalidated" if fp_ok
                               else "torn" if torn
                               else "stale" if r is not None
                               else "absent")}
            if r is not None:
                entry.update({k: v for k, v in r.items() if k != "fp"})
            state["status"].append(entry)
            if entry["state"] != "complete":
                state["resume"] = False
            return
        if (state["resume"] and r and r.get("fp") == state["fp"]
                and art_ok):
            from_receipt(r)
            state["skipped"].append(name)
            return
        state["resume"] = False
        if fs.exists(receipt_path):
            fs.delete(receipt_path, recursive=False)
        payload = recompute()
        fs.write_bytes(
            receipt_path,
            _json.dumps({"fp": state["fp"], **payload}).encode(),
        )

    # -- input ------------------------------------------------------------
    def _input_recompute() -> dict:
        n = docs0.count()
        report["input_docs"] = n
        return {"count": n}

    def _input_from_receipt(r: dict) -> None:
        report["input_docs"] = int(r["count"])

    _run_stage("00_input",
               {"docs": args.docs, "content": _content(args.docs)},
               _input_from_receipt, _input_recompute)
    docs = docs0

    def _id_stage(name: str, report_key: str, params: dict, compute_kept):
        """One survivor-id stage over the shared protocol; rebinds
        ``docs`` to docs0 ⋈ the stage's WRITTEN ids so downstream stages
        read an artifact, never a recompute chain."""
        nonlocal docs
        ids_dir = url_join(st_root, name, "ids")

        def _recompute() -> dict:
            compute_kept(docs).select("doc_id").write.mode(
                "overwrite"
            ).parquet(ids_dir)
            n = spark.read.parquet(ids_dir).count()
            report[report_key] = n
            return {"count": n}

        def _from_receipt(r: dict) -> None:
            report[report_key] = int(r["count"])

        _run_stage(name, params, _from_receipt, _recompute,
                   artifact=ids_dir)
        if state["status"] is not None:
            return  # status walk: the ids artifact may not exist
        docs = docs0.join(spark.read.parquet(ids_dir), "doc_id")

    if args.quality_gate:
        from .llm.text import quality_verdict_expr

        _id_stage(
            "01_quality", "after_quality_gate", {},
            lambda d: d.filter(quality_verdict_expr() == "keep"),
        )

    def _dedup_kept(d):
        return (
            d.groupBy(F.md5("text").alias("__th"))
            .agg(F.min("doc_id").alias("doc_id"))
        )

    _id_stage("02_dedup", "after_exact_dedup", {}, _dedup_kept)

    if args.eval:
        from .llm.dedup import decontaminate

        def _decontam_kept(d):
            evals = spark.read.parquet(args.eval).select("doc_id", "text")
            flagged = decontaminate(
                d.select("doc_id", "text"), evals,
                n=args.decontaminate_ngram,
            ).select("doc_id")
            return d.join(flagged, "doc_id", "left_anti")

        _id_stage(
            "03_decontam", "after_decontamination",
            {"eval": args.eval, "content": _content(args.eval),
             "ngram": args.decontaminate_ngram},
            _decontam_kept,
        )

    if args.lm_gate_dir:
        from .llm.lm import score_with_lm

        def _lm_kept(d):
            scores = score_with_lm(
                spark, args.lm_gate_dir, d.select("doc_id", "text"),
                alpha=args.lm_gate_alpha,
            )
            # null scores (single-word docs) fail the > and are kept —
            # the same unmeasurable-is-not-disfluent rule as the
            # streaming gate
            disfluent = scores.filter(
                F.col("neg_avg_logprob") > args.lm_max_score
            ).select("doc_id")
            return d.join(disfluent, "doc_id", "left_anti")

        _id_stage(
            "04_lm_gate", "after_lm_gate",
            {"dir": args.lm_gate_dir, "content": _content(args.lm_gate_dir),
             "max": args.lm_max_score, "alpha": args.lm_gate_alpha},
            _lm_kept,
        )

    id_col = "doc_id"
    export_df = docs.select("doc_id", "text")
    if weights is not None:
        from .llm.sampling import materialize_mixture, mixture_plan

        rows_dir = url_join(st_root, "05_mixture", "rows")

        def _mix_recompute() -> dict:
            plan = mixture_plan(docs, weights, args.budget_tokens,
                                group_col=mix_group_col, seed=args.seed)
            # narrow projection: the explode job never materializes text
            materialize_mixture(
                docs, plan, id_strategy=args.mixture_id
            ).select("mix_id", "doc_id", "copy", "grp").write.mode(
                "overwrite"
            ).parquet(rows_dir)
            n = spark.read.parquet(rows_dir).count()
            report["after_mixture_rows"] = n
            return {"count": n}

        def _mix_from_receipt(r: dict) -> None:
            report["after_mixture_rows"] = int(r["count"])

        _run_stage("05_mixture", {
            "mixture": args.mixture, "budget": args.budget_tokens,
            "seed": args.seed, "id": args.mixture_id,
        }, _mix_from_receipt, _mix_recompute, artifact=rows_dir)
        if state["status"] is None:
            export_df = (
                spark.read.parquet(rows_dir)
                .join(docs0.select("doc_id", "text"), "doc_id")
                .select("mix_id", "text")
            )
        id_col = "mix_id"

    def _export_recompute() -> dict:
        merges = None
        if args.tokenizer:
            # read lazily: a fully-resumed run that skips the export must
            # stay metadata-only (the content fingerprint in the stage
            # params already covers tokenizer drift)
            from .llm.bpe import read_bpe_model

            merges = read_bpe_model(spark, args.tokenizer)
        man = write_pretrain_export(
            export_df, args.out_dir,
            context_len=args.context_len, n_shards=args.n_shards,
            seed=args.seed, merges=merges, id_col=id_col,
        )
        report["export"] = {
            k: man[k]
            for k in ("n_shards", "total_docs", "total_tokens",
                      "total_seqs", "tokenizer")
        }
        return {"export": report["export"]}

    def _export_from_receipt(r: dict) -> None:
        report["export"] = r["export"]

    from .llm.export import _MANIFEST as _EXPORT_MANIFEST

    _run_stage("06_export", {
        "context_len": args.context_len, "n_shards": args.n_shards,
        "seed": args.seed, "tokenizer": args.tokenizer,
        "tokenizer_content": (_content(args.tokenizer)
                              if args.tokenizer else None),
    }, _export_from_receipt, _export_recompute,
        # the export's own commit marker (written LAST by
        # write_pretrain_export) stands in for the shards artifact
        artifact=url_join(args.out_dir, _EXPORT_MANIFEST))
    if state["status"] is not None:
        first = next((e["stage"] for e in state["status"]
                      if e["state"] != "complete"), None)
        visited = {e["stage"] for e in state["status"]}
        print(_json.dumps({
            "stages": state["status"],
            "complete": first is None,
            # the exact stage a rerun with these arguments would start
            # recomputing at; null means every stage would be skipped
            "resume_point": first,
            # receipts the CURRENT flag set never visits (e.g. a dir cut
            # with --eval, inspected without it): harmless — the
            # fingerprint chain ignores them — but an operator should
            # see that the artifact was produced by a different pipeline
            # shape than the one being asked about
            "orphaned": sorted(
                set(fs.listdir(st_root)) - visited
            ) if fs.exists(st_root) else [],
        }))
        return 0
    if state["skipped"]:
        print(f"release: resumed — skipped completed stages "
              f"{state['skipped']}", file=sys.stderr)
    fs.write_bytes(
        url_join(args.out_dir, "_RELEASE_REPORT.json"),
        _json.dumps(report).encode(),
    )
    print(_json.dumps(report))
    return 0


def cmd_lm_train(args: argparse.Namespace) -> int:
    """Train a bigram LM on a TARGET-domain corpus and persist the count
    tables as a lake artifact (llm/lm.py) — the CCNet shape: the model
    that decides 'does this crawl doc read like the reference domain'
    must outlive the corpus that trained it."""
    from .llm.lm import write_bigram_lm

    spark = get_spark("lm-train")
    docs = spark.read.parquet(args.docs).select("doc_id", "text")
    meta = write_bigram_lm(docs, args.lm_dir, n_buckets=args.buckets,
                           min_count=args.min_count)
    print(f"lm-train OK: {args.lm_dir} vocab={meta['vocab']} "
          f"tokens={meta['n_tokens']} docs={meta['n_docs']} "
          f"min_count={meta['min_count']}")
    return 0


def cmd_lm_score(args: argparse.Namespace) -> int:
    """Score a corpus's fluency under a persisted bigram LM (add-alpha
    smoothed — unseen words degrade to the uniform floor). Writes
    (doc_id, n_bigrams, neg_avg_logprob) parquet; --max-score also
    writes the docs under the perplexity ceiling beside the scores."""
    import json as _json

    from pyspark.sql import functions as F

    from .llm.lm import score_with_lm

    spark = get_spark("lm-score")
    docs = spark.read.parquet(args.docs)
    scores = score_with_lm(spark, args.lm_dir, docs, alpha=args.alpha)
    scores.write.mode("overwrite").parquet(args.out)
    report = {"n_docs": docs.count()}
    if args.max_score is not None:
        kept = docs.join(
            spark.read.parquet(args.out)
            .filter(F.col("neg_avg_logprob") <= args.max_score)
            .select("doc_id"),
            "doc_id",
        )
        kept.write.mode("overwrite").parquet(args.out + "_kept")
        report["kept"] = kept.count()
        report["max_score"] = args.max_score
    print(_json.dumps(report))
    return 0


def cmd_lm_append(args: argparse.Namespace) -> int:
    """Append one batch of documents' count deltas to a persisted bigram
    LM (replay-safe epoch overwrite — llm/lm.py). The batch-side manual
    form of `corpus --lm-dir`; scoring reads base + epochs sum-merged,
    so the model is current without a retrain."""
    from .llm.lm import append_epoch_to_bigram_lm, merged_lm_state

    spark = get_spark("lm-append")
    docs = spark.read.parquet(args.docs).select("doc_id", "text")
    append_epoch_to_bigram_lm(docs, args.lm_dir, args.epoch)
    _, _, stats = merged_lm_state(spark, args.lm_dir)
    print(f"lm-append OK: {args.lm_dir} epoch={args.epoch} "
          f"vocab={stats['vocab']} tokens={stats['n_tokens']} "
          f"docs={stats['n_docs']} epochs={stats['n_epochs']}")
    return 0


def cmd_lm_compact(args: argparse.Namespace) -> int:
    """Fold a streamed LM's per-batch count deltas into one epoch=-1 dir
    (groupBy-SUM merge under the crash-safe manifest swap; run against a
    STOPPED corpus stream)."""
    from .llm.lm import compact_lm_epochs

    spark = get_spark("lm-compact")
    did = compact_lm_epochs(spark, args.lm_dir, min_epochs=args.min_epochs)
    print(f"lm-compact OK: {'merged' if did else 'nothing to do'} "
          f"in {args.lm_dir}")
    return 0


def cmd_quality_train(args: argparse.Namespace) -> int:
    """Train the weak-label quality classifier (rule cascade -> HashingTF
    -> logistic regression) and freeze it as a lake artifact
    (llm/quality_model.py) — score tomorrow's crawl with today's model
    instead of silently refitting on drifted data."""
    from .llm.quality_model import save_quality_model, train_quality_model

    spark = get_spark("quality-train")
    docs = spark.read.parquet(args.docs).select("doc_id", "text")
    model = train_quality_model(docs, sample_mod=args.sample_mod)
    save_quality_model(model, args.model_dir)
    print(f"quality-train OK: {args.model_dir} sample_mod={args.sample_mod}")
    return 0


def cmd_quality_score(args: argparse.Namespace) -> int:
    """Score a corpus with a frozen quality model: per-doc P(keep) +
    prediction, written as parquet; --min-p-keep also writes the
    filtered corpus beside the scores (map-only — scan parallelism)."""
    from pyspark.sql import functions as F

    from .llm.quality_model import load_quality_model, score_quality

    spark = get_spark("quality-score")
    docs = spark.read.parquet(args.docs)
    model = load_quality_model(spark, args.model_dir)
    scores = score_quality(model, docs)
    scores.write.mode("overwrite").parquet(args.out)
    report = {"n_docs": docs.count()}
    if args.min_p_keep is not None:
        kept = docs.join(
            spark.read.parquet(args.out)
            .filter(F.col("p_keep") >= args.min_p_keep)
            .select("doc_id"),
            "doc_id",
        )
        kept.write.mode("overwrite").parquet(args.out + "_kept")
        report["kept"] = kept.count()
        report["min_p_keep"] = args.min_p_keep
    import json as _json

    print(_json.dumps(report))
    return 0


def cmd_decontaminate(args: argparse.Namespace) -> int:
    """One-command benchmark decontamination: flag training docs that
    leak an eval/benchmark set through any enabled detector — word
    8-grams (verbatim), winnowing char fingerprints (cross-tokenization
    edits, opt-in), embedding cosine (paraphrases, opt-in via embedding
    tables keyed by doc_id) — then write the cleaned corpus and print a
    per-detector JSON report. The asymmetric-join shapes of the
    underlying operators are unchanged: the eval side broadcasts, the
    corpus is never shuffled by anything eval-sized."""
    import json as _json

    from pyspark.sql import functions as F

    from .llm.dedup import decontaminate as ngram_scan
    from .llm.text import winnow_decontaminate

    spark = get_spark("decontaminate")
    train = spark.read.parquet(args.train).select("doc_id", "text")
    ev = spark.read.parquet(args.eval).select("doc_id", "text")
    report: dict = {"n_train": train.count(), "detectors": {}}
    flagged = None

    def _add(name: str, ids_df) -> None:
        nonlocal flagged
        ids = ids_df.select("doc_id").distinct()
        report["detectors"][name] = ids.count()
        flagged = ids if flagged is None else flagged.unionByName(ids)

    _add("ngram", ngram_scan(train, ev, n=args.ngram))
    if args.winnow:
        _add("winnow", winnow_decontaminate(
            train, ev, k=args.winnow_k, w=args.winnow_w
        ))
    if args.embeddings:
        from .llm.similarity import semantic_decontaminate

        if not args.eval_embeddings:
            print("decontaminate: --embeddings requires --eval-embeddings",
                  file=sys.stderr)
            return 2
        tr_emb = spark.read.parquet(args.embeddings)
        ev_emb = spark.read.parquet(args.eval_embeddings)
        sem = semantic_decontaminate(
            tr_emb, ev_emb, threshold=args.threshold
        ).filter(F.col("contaminated"))
        _add("semantic", sem.select(F.col("vec_id").alias("doc_id")))

    # flagged_total counts TRAIN docs only: the semantic detector's vec_ids
    # come from a caller-supplied embeddings table that may cover docs
    # outside --train, and counting those would misreport kept (ADVICE r8).
    # The per-detector counts above stay raw detector outputs by design.
    flagged = flagged.distinct().join(
        train.select("doc_id").distinct(), "doc_id", "left_semi"
    )
    report["flagged_total"] = flagged.count()
    clean = train.join(flagged, "doc_id", "left_anti")
    clean.write.mode("overwrite").parquet(args.out)
    report["kept"] = report["n_train"] - report["flagged_total"]
    print(_json.dumps(report))
    return 0


def cmd_export_verify(args: argparse.Namespace) -> int:
    """Integrity audit of a pre-training export: recompute per-shard
    stats from the shards on disk, compare to the committed manifest,
    re-assert pos density (llm/export.py:verify_pretrain_export). Exit 1
    with the issue list when the artifact is degraded — run it after a
    restore/copy and before burning GPU-hours."""
    import json as _json

    from .llm.export import verify_pretrain_export

    spark = get_spark("export-verify")
    report = verify_pretrain_export(spark, args.out_dir)
    print(_json.dumps(report))
    return 0 if report["ok"] else 1


def cmd_retrieve_index(args: argparse.Namespace) -> int:
    """BM25 retrieval served from a persisted postings index — the
    ``retrieve`` command without its per-call corpus re-tokenize: the
    plan scans only the postings buckets the query terms hash into.
    Scores are identical to ``retrieve`` over the corpus the index was
    built from (+ streamed appends). Prints one JSON line per hit."""
    import json

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .llm.lexical_index import bm25_scores_indexed

    if (args.query is None) == (args.queries_table is None):
        print("retrieve-index: pass exactly one of --query / --queries-table",
              file=sys.stderr)
        return 2
    if args.embeddings is not None and args.queries_table is None:
        print("retrieve-index: --embeddings (hybrid) needs --queries-table "
              "with a vec_id column", file=sys.stderr)
        return 2
    if args.ann_index is not None and args.embeddings is None:
        print("retrieve-index: --ann-index needs --embeddings (the probe "
              "vectors still resolve by vec_id)", file=sys.stderr)
        return 2
    spark = get_spark("retrieve-index")
    if args.embeddings is not None:
        from .llm.similarity import probe_map_issues, retrieve_hybrid_indexed

        qtbl = spark.read.parquet(args.queries_table)
        if "vec_id" not in qtbl.columns:
            print("retrieve-index: hybrid --queries-table needs a vec_id "
                  "column (one probe embedding per query)", file=sys.stderr)
            return 2
        emb = spark.read.parquet(args.embeddings)
        issues = probe_map_issues(qtbl, emb)
        if issues:
            print(
                "retrieve-index: bad probe mapping for query_ids "
                + ", ".join(
                    f"{q} ({n} probe rows, {nv} valid vectors)"
                    for q, n, nv in issues
                )
                + f" in {args.embeddings} (need exactly 1 valid each)",
                file=sys.stderr,
            )
            return 2
        top = retrieve_hybrid_indexed(
            spark, args.index_dir, qtbl, emb, k=args.k,
            max_doc_freq=args.max_doc_freq,
            ann_index_dir=args.ann_index, nprobe=args.nprobe,
        )
        for r in top.orderBy("query_id", "rank").collect():
            print(json.dumps({
                "query_id": r.query_id, "doc_id": r.doc_id,
                "rrf_score": r.rrf_score, "n_lists": r.n_lists,
                "rank": r.rank,
            }))
        return 0
    if args.queries_table is not None:
        qtbl = spark.read.parquet(args.queries_table).select(
            "query_id", "query")
    else:
        if not args.query.split():
            print("retrieve-index: --query must contain at least one term",
                  file=sys.stderr)
            return 2
        from .operators._helpers import tiny_df

        qtbl = tiny_df(
            spark, [(0, args.query)], "query_id int, query string")
    scored = bm25_scores_indexed(
        spark, args.index_dir, qtbl, max_doc_freq=args.max_doc_freq)
    w = Window.partitionBy("query_id").orderBy(F.col("bm25").desc(), "doc_id")
    top = (scored.withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= args.k))
    for r in top.orderBy("query_id", "rank").collect():
        rec = {"doc_id": r.doc_id, "bm25": r.bm25, "rank": r.rank}
        if args.queries_table is not None:
            rec = {"query_id": r.query_id, **rec}
        print(json.dumps(rec))
    return 0


def cmd_retrieve(args: argparse.Namespace) -> int:
    """BM25 retrieval over a documents parquet dir; with ``--embeddings``
    (+ ``--query-vec-id``) the lexical ranking fuses with brute-cosine via
    reciprocal-rank fusion. Prints one JSON line per hit, best first.
    Thin wrapper over the catalog operators (llm/text.py bm25_scores,
    llm/similarity.py rrf_fuse) — same plans, same determinism."""
    import json

    from pyspark.sql import functions as F

    from .llm.similarity import bm25_rank, cosine_rank, rrf_fuse

    if (args.query is None) == (args.queries_table is None):
        print("retrieve: pass exactly one of --query / --queries-table",
              file=sys.stderr)
        return 2
    if args.queries_table is not None:
        from pyspark.sql import Window

        from .llm.text import bm25_scores_batch

        spark = get_spark("retrieve")
        docs = spark.read.parquet(args.docs).select("doc_id", "text")
        qtbl = spark.read.parquet(args.queries_table)
        if not args.embeddings:
            scored = bm25_scores_batch(
                docs, qtbl.select("query_id", "query"),
                max_doc_freq=args.max_doc_freq,
            )
            w = Window.partitionBy("query_id").orderBy(
                F.col("bm25").desc(), "doc_id"
            )
            top = (
                scored.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= args.k)
            )
            for r in top.orderBy("query_id", "rank").collect():
                print(json.dumps({
                    "query_id": r.query_id, "doc_id": r.doc_id,
                    "bm25": r.bm25, "rank": r.rank,
                }))
            return 0
        # hybrid batch: the table must map each query to its probe vector
        if "vec_id" not in qtbl.columns:
            print("retrieve: hybrid --queries-table needs a vec_id column "
                  "(one probe embedding per query)", file=sys.stderr)
            return 2
        from .llm.similarity import probe_map_issues, retrieve_hybrid_batch

        emb = spark.read.parquet(args.embeddings)
        # a vec_id absent/duplicated in the embeddings table (or a null
        # vector) would silently degrade that query to BM25-only output
        # labeled hybrid — fail loudly, the single-query n_qv contract
        issues = probe_map_issues(qtbl, emb)
        if issues:
            print(
                "retrieve: bad probe mapping for query_ids "
                + ", ".join(
                    f"{q} ({n} probe rows, {nv} valid vectors)"
                    for q, n, nv in issues
                )
                + f" in {args.embeddings} (need exactly 1 valid each)",
                file=sys.stderr,
            )
            return 2
        top = retrieve_hybrid_batch(
            docs, qtbl, emb, k=args.k, max_doc_freq=args.max_doc_freq
        )
        for r in top.orderBy("query_id", "rank").collect():
            print(json.dumps({
                "query_id": r.query_id, "doc_id": r.doc_id,
                "rrf_score": r.rrf_score, "n_lists": r.n_lists,
                "rank": r.rank,
            }))
        return 0
    # dict.fromkeys: dedupe repeated terms (bm25_scores builds one tf column
    # per list entry, so 'spark spark' would double-count) preserving order
    terms = list(dict.fromkeys(t for t in args.query.split() if t))
    if not terms:
        print("retrieve: --query must contain at least one term", file=sys.stderr)
        return 2
    spark = get_spark("retrieve")
    docs = spark.read.parquet(args.docs).select("doc_id", "text")
    bmrank = bm25_rank(docs, terms, args.k)
    if not args.embeddings:
        for r in bmrank.orderBy("rank").collect():
            print(json.dumps({"doc_id": r.doc_id, "bm25": r.bm25, "rank": r.rank}))
        return 0
    emb = spark.read.parquet(args.embeddings)
    qv = emb.filter(F.col("vec_id") == args.query_vec_id).select(
        F.col("embedding").alias("q_vec")
    )
    n_qv = qv.count()
    if n_qv != 1:
        # an absent vec_id would silently degrade the "hybrid" output to
        # pure BM25 (the cosine list would be empty) — fail loudly instead
        print(
            f"retrieve: --query-vec-id {args.query_vec_id} matched "
            f"{n_qv} rows in {args.embeddings} (need exactly 1)",
            file=sys.stderr,
        )
        return 2
    cs = cosine_rank(emb, qv, args.k)
    fused = rrf_fuse([bmrank.select("doc_id", "rank"), cs])
    top = fused.orderBy(F.col("rrf_score").desc(), "doc_id").limit(args.k)
    for r in top.collect():
        print(json.dumps(
            {"doc_id": r.doc_id, "rrf_score": r.rrf_score, "n_lists": r.n_lists}
        ))
    return 0


def cmd_select(args: argparse.Namespace) -> int:
    """DSIR data selection: score every document's target-vs-raw
    log-likelihood ratio against the ``--target-lang`` slice and keep the
    reproducible Gumbel top-k non-target documents. Prints JSON ids, or
    writes the selected documents as parquet with ``--out``."""
    import json

    from pyspark.sql import functions as F

    from .llm.sampling import dsir_select

    spark = get_spark("select")
    docs = spark.read.parquet(args.docs).select("doc_id", "lang", "text")
    sel = dsir_select(
        docs, F.col("lang") == args.target_lang, k=args.k,
        temperature=args.temperature, seed=args.seed,
        # at crawl scale, stage the hashed feature arrays to the lake
        # instead of pinning a corpus-sized executor cache
        staging_dir=args.staging_dir,
    )
    if args.out:
        sel.select("doc_id").join(docs, "doc_id").write.mode(
            "overwrite"
        ).parquet(args.out)
        print(f"select OK: wrote top-{args.k} to {args.out}")
        return 0
    for r in sel.collect():
        print(json.dumps({"doc_id": r.doc_id, "dsir_logw": r.dsir_logw}))
    return 0


def cmd_curate(args: argparse.Namespace) -> int:
    """One-command BATCH curation over a static document parquet — the
    offline twin of the streaming corpus builder, composed from the same
    catalog operators so every stage's semantics are the hash-checked
    ones: (1) CCNet cross-corpus line dedup (optional), (2) Gopher-style
    quality gate (optional), (3) exact dedup keeping the min doc_id per
    content hash, (4) MinHash-LSH near-dup pruning keeping each
    cluster's canonical (optional). Writes the curated corpus as parquet
    and prints one JSON report line with per-stage survivor counts.

    The quality gate, exact-dedup hash, and MinHash shingles all run on
    a NEWLINE-FLATTENED view of the text (the hash-gated
    q_pipeline_curate semantics: the gate's word split must see words,
    not line breaks) while the written documents keep their line
    structure."""
    import json

    from pyspark.sql import functions as F

    from .llm.dedup import dedup_clusters, line_dedup, minhash_lsh_pairs
    from .llm.text import quality_verdict_expr

    spark = get_spark("curate")
    docs = spark.read.parquet(args.docs)
    if "doc_id" not in docs.columns or "text" not in docs.columns:
        print("curate: input needs doc_id and text columns", file=sys.stderr)
        return 2
    report: dict = {"input_docs": docs.count()}
    # null text fails CLOSED at entry (code review r12, the r11 admission
    # rule): the quality gate and line-dedup stages each reject it, but a
    # bare exact-dedup run hashed every null-text doc into one NULL group
    # and ADMITTED the min-doc_id keeper — a contentless doc in the
    # curated corpus. The count keeps the drop visible in the report.
    docs = docs.filter(F.col("text").isNotNull())
    report["null_text_dropped"] = report["input_docs"] - docs.count()

    # stage frames persist so each count doesn't recompute the chain, but
    # a predecessor's cache is RELEASED as soon as its successor is
    # materialized (the cmd_release rule, ADVICE r9) — only the newest
    # stage pins executor storage at any point, not the whole cascade
    _pinned: list = []

    def _pin(df):
        df = df.persist()
        n = df.count()
        while _pinned:
            _pinned.pop().unpersist()
        _pinned.append(df)
        return df, n

    # what curation changes about the DISTRIBUTION, not just counts:
    # the shared derived-metrics snapshot (chars/words/lang, sketch mode)
    from .operators.profiling import document_profile

    profile_before = document_profile(docs) if args.profile else None

    if args.line_dedup_min_docs is not None:
        cleaned = line_dedup(
            docs.select("doc_id", "text"),
            min_dup_docs=args.line_dedup_min_docs,
        ).filter(F.col("clean_text") != "")
        docs = (
            docs.join(cleaned.select("doc_id", "clean_text"), "doc_id")
            .withColumn("text", F.col("clean_text"))
            .drop("clean_text")
        )
        docs, report["after_line_dedup"] = _pin(docs)

    # the flattened view every downstream decision uses (the documents
    # themselves keep their newlines)
    docs = docs.withColumn(
        "__flat", F.replace(F.col("text"), F.lit("\n"), F.lit(" "))
    )

    if args.quality_gate:
        docs, report["after_quality_gate"] = _pin(
            docs.filter(quality_verdict_expr("__flat") == "keep")
        )

    # exact dedup: one shuffle on the content hash; min doc_id is the
    # deterministic keeper
    keepers = (
        docs.groupBy(F.md5("__flat").alias("__th"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    docs, report["after_exact_dedup"] = _pin(docs.join(keepers, "doc_id"))

    if args.near_dup:
        pairs = minhash_lsh_pairs(
            docs.select("doc_id", F.col("__flat").alias("text")),
            threshold=args.neardup_threshold,
        ).select("doc_a", "doc_b")
        clusters = dedup_clusters(pairs)
        losers = clusters.filter(
            F.col("doc_id") != F.col("canonical")
        ).select("doc_id")
        docs, report["after_near_dup"] = _pin(
            docs.join(losers, "doc_id", "left_anti")
        )

    if profile_before is not None:
        from .operators.profiling import profile_drift

        drift = profile_drift(profile_before, document_profile(docs))
        report["profile_drift"] = [
            r.asDict() for r in drift.orderBy("column").collect()
        ]
    docs.drop("__flat").write.mode("overwrite").parquet(args.out)
    while _pinned:
        _pinned.pop().unpersist()
    report["written"] = args.out
    print(json.dumps(report))
    return 0


def cmd_catalog(args: argparse.Namespace) -> int:
    """The query catalog as a shell surface: ``catalog --list`` prints
    every registered query id with its check kind and one-line doc;
    ``catalog <name> --sf-dir DIR`` executes one against a directory of
    the standard tables (region/nation/.../documents/embeddings) and
    prints rows. Same registry the driver contract and the bench run —
    nothing here is a second implementation."""
    from .catalog import registry

    reg = registry()
    if args.list or not args.name:
        for name, spec in sorted(reg.items()):
            kind = "oracle" if spec.oracle else "rows"
            doc = " ".join((spec.doc or "").split())
            print(f"{name}\t{kind}\t{doc[:120]}")
        return 0
    if args.name not in reg:
        import difflib

        close = difflib.get_close_matches(args.name, reg, n=3)
        hint = f"; did you mean: {', '.join(close)}?" if close else ""
        print(f"catalog: unknown query {args.name!r}{hint}", file=sys.stderr)
        return 2
    if not args.sf_dir:
        print("catalog: --sf-dir DIR is required to run a query",
              file=sys.stderr)
        return 2
    spark = get_spark("catalog")
    df = reg[args.name].fn(spark, args.sf_dir)
    if args.explain:
        # the physical plan instead of rows — the surface for checking
        # pushdown/pruning/exchange shapes on a live query without
        # writing a pytest (plans/inspect.py is the programmatic twin)
        from .plans.inspect import explain_str

        print(explain_str(df))
        return 0
    df.show(args.limit, truncate=False)
    return 0


def cmd_setup(args: argparse.Namespace) -> int:
    """Probe round-trip (setup.go:31-66): write → read-back-compare → delete."""
    spark = get_spark("sink-setup")
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    conf = jsc.hadoopConfiguration()
    path_cls = jvm.org.apache.hadoop.fs.Path
    probe = path_cls(f"{args.store_url}/.parquet-sink-setup/probe-{int(time.time())}")
    fs = probe.getFileSystem(conf)
    payload = b"parquet-sink-probe"
    out = fs.create(probe, True)
    out.write(bytearray(payload))
    out.close()
    inp = fs.open(probe)
    got = bytes(jvm.org.apache.commons.io.IOUtils.toByteArray(inp))
    inp.close()
    fs.delete(probe, False)
    if bytes(got) != payload:
        print("setup FAILED: probe read-back mismatch", file=sys.stderr)
        return 1
    print(f"setup OK: store {args.store_url} is writable/readable/deletable")
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="substreams-sink-parquet-spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    run_p = sub.add_parser("run", help="stream staged blocks into a parquet lake")
    run_p.add_argument("store_url")
    run_p.add_argument("input_dir", help="staging dir of raw block parquet")
    run_p.add_argument("--descriptor-set", required=True,
                       help="FileDescriptorSet file or .spkg package manifest")
    run_p.add_argument("--output-type", default=None,
                       help="fully-qualified output message type")
    run_p.add_argument("--output-module", default=None,
                       help="module name to resolve the type from (.spkg only)")
    run_p.add_argument("--checkpoint", required=True)
    run_p.add_argument("--endpoint", default=None,
                       help="substreams gRPC endpoint (run.go:73-92 parity; "
                            "errors in this build — see staged-feeder contract)")
    run_p.add_argument("--network", default=None,
                       help="network name for endpoint resolution")
    run_p.add_argument("--partition-size", type=int, default=5000)
    run_p.add_argument("--start-block", type=int, default=0)
    run_p.add_argument("--stop-block", type=int, default=None)
    run_p.add_argument("--compression", default="zstd")
    run_p.add_argument("--compression-level", type=int, default=None,
                       help="zstd compression level (run.go:44)")
    run_p.add_argument("--row-group-rows", type=int, default=20000)
    run_p.add_argument("--page-size", type=int, default=None,
                       help="parquet page size in bytes (run.go:46)")
    run_p.add_argument("--no-parquet-stats", action="store_true",
                       help="disable parquet column statistics (run.go:49)")
    run_p.add_argument("--target-file-bytes", type=int, default=None,
                       help="soft per-file byte target; oversize ranges "
                            "split into -partNNNN files (run.go:48)")
    run_p.add_argument("--write-tasks", type=int, default=None,
                       help="minimum parquet-encode parallelism per write "
                            "job (extension; no reference flag): large "
                            "ranges finalize as ordered -partNNNN files "
                            "instead of capping encode at ranges-per-batch")
    run_p.add_argument("--pad-width", type=int, default=10,
                       help="zero-pad width of range file names (run.go:33)")
    run_p.add_argument("--output-prefix", default=None,
                       help="object key prefix appended to store_url "
                            "(run.go:31)")
    run_p.add_argument("--no-dict-encoding", action="store_true",
                       help="disable parquet dictionary encoding "
                            "(run.go:47 --dict-encoding=false)")
    run_p.add_argument("--exploded-write-workers", type=int, default=0,
                       help="concurrency of per-table exploded writes: "
                            "0=auto (one per table), 1=sequential "
                            "(run.go:51)")
    run_p.add_argument("--bloom-filter", action="append", default=[],
                       metavar="COL",
                       help="write a parquet bloom filter for COL "
                            "(repeatable; point-lookup row-group skipping)")
    run_p.add_argument("--flush-interval-s", type=int, default=1)
    run_p.add_argument("--rollup-bucket-size", type=int, default=None,
                       help="maintain a continuous rollup under _rollup/ "
                       "with this many blocks per bucket (off when unset)")
    run_p.add_argument("--rollup-measure", action="append", default=[],
                       metavar="NAME:AGG:COL",
                       help="rollup measure, e.g. total:sum:amount or "
                       "n:count:* (repeatable; agg in sum|count|min|max)")
    run_p.add_argument("--rollup-group", action="append", default=[],
                       metavar="COLUMN", help="extra rollup group key (repeatable)")
    run_p.add_argument("--max-files-per-trigger", type=int, default=8,
                       help="staged files admitted per micro-batch — the "
                       "backpressure cap (reference processing-buffer "
                       "analogue, run.go:59-61)")
    run_p.add_argument("--explode", action="store_true")
    run_p.add_argument("--undo-buffer-size", type=int, default=0)
    run_p.add_argument("--uint64-as", choices=("decimal", "long"), default="decimal")
    run_p.add_argument("--map-as", choices=("map", "entries"), default="map")
    run_p.add_argument("--drain-and-exit", action="store_true",
                       help="process everything staged, then stop (availableNow)")
    run_p.add_argument("--profile-columns", default=None, metavar="A,B,C",
                       help="per-epoch column profiles of the decoded rows "
                       "under _profile/ (value-level ingest drift history; "
                       "read back with the profile-history command)")
    run_p.set_defaults(fn=cmd_run)

    cat_p = sub.add_parser(
        "catalog", help="list or run registered catalog queries")
    cat_p.add_argument("name", nargs="?", default=None)
    cat_p.add_argument("--list", action="store_true")
    cat_p.add_argument("--sf-dir", default=None,
                       help="directory of the standard parquet tables")
    cat_p.add_argument("--limit", type=int, default=20)
    cat_p.add_argument("--explain", action="store_true",
                       help="print the formatted physical plan instead "
                            "of rows")
    cat_p.set_defaults(fn=cmd_catalog)

    setup_p = sub.add_parser("setup", help="validate store access")
    setup_p.add_argument("store_url")
    setup_p.set_defaults(fn=cmd_setup)

    stats_p = sub.add_parser("stats", help="lake health report (metadata-only)")
    stats_p.add_argument("store_url")
    stats_p.set_defaults(fn=cmd_stats)

    prof_p = sub.add_parser(
        "profile",
        help="per-column profile of a parquet dir (one aggregate pass)",
    )
    prof_p.add_argument("path")
    prof_p.add_argument(
        "--columns", default=None,
        help="comma-separated columns (default: all non-map columns)")
    prof_p.add_argument(
        "--exact", action="store_true",
        help="exact COUNT(DISTINCT) instead of HLL sketches")
    prof_p.add_argument(
        "--hist", action="append", metavar="COL:LO:HI:BINS",
        help="append a fixed-bound numeric histogram (repeatable)")
    prof_p.add_argument(
        "--quantiles", default=None, metavar="A,B,C",
        help="p25/50/75/95 for these numeric columns (exact with --exact, "
        "else the percentile_approx sketch)")
    prof_p.set_defaults(fn=cmd_profile)

    ph_p = sub.add_parser(
        "profile-history",
        help="per-epoch ingest profiles + epoch-over-epoch drift",
    )
    ph_p.add_argument("store_url")
    ph_p.add_argument(
        "--drift-only", action="store_true",
        help="print only epochs/columns whose drifted flag is set")
    ph_p.set_defaults(fn=cmd_profile_history)

    undo_p = sub.add_parser(
        "undo", help="retract blocks above a reorg fork point (stopped lake)"
    )
    undo_p.add_argument("store_url")
    undo_p.add_argument("last_valid_block", type=int)
    undo_p.add_argument("--partition-size", type=int, default=5000)
    undo_p.add_argument("--start-block", type=int, default=0)
    undo_p.set_defaults(fn=cmd_undo)

    compact_p = sub.add_parser(
        "compact", help="compact live-area small files (stopped lake)"
    )
    compact_p.add_argument("store_url")
    compact_p.add_argument("--target-files", type=int, default=1)
    compact_p.add_argument("--min-files", type=int, default=2)
    compact_p.add_argument("--compression", default="zstd")
    compact_p.add_argument(
        "--drained", action="store_true",
        help="assert the stream was TERMINALLY drained (not merely "
             "stopped/crashed): also folds the trailing rollup epoch, "
             "which is unsafe if its batch's offset never committed",
    )
    compact_p.set_defaults(fn=cmd_compact)

    tier_p = sub.add_parser(
        "tier", help="merge aged finalized range files into larger tiers"
    )
    tier_p.add_argument("store_url")
    tier_p.add_argument("--tier-blocks", type=int, required=True,
                        help="blocks per tiered file (multiple of partition size)")
    tier_p.add_argument("--pad", type=int, default=10)
    tier_p.add_argument("--compression", default="zstd")
    tier_p.add_argument("--compression-level", type=int, default=None)
    tier_p.add_argument("--row-group-rows", type=int, default=20000)
    tier_p.add_argument("--bloom-filter", action="append", default=[],
                        metavar="COLUMN",
                        help="parquet bloom filter column (repeatable) — "
                        "match the run command's setting so archive files "
                        "keep point-lookup skipping")
    tier_p.set_defaults(fn=cmd_tier)

    corpus_p = sub.add_parser(
        "corpus", help="build an exact-deduped text corpus from JSONL shards"
    )
    corpus_p.add_argument("input_dir", help="staging dir of JSONL shards")
    corpus_p.add_argument("store_url", help="corpus lake root")
    corpus_p.add_argument("--checkpoint", required=True)
    corpus_p.add_argument("--follow", action="store_true",
                          help="keep running (micro-batch) instead of drain-and-stop")
    corpus_p.add_argument("--flush-interval", default="1 second")
    corpus_p.add_argument("--embed-dup", action="store_true",
                          help="also reject docs whose inline embedding is "
                               "near-identical (LSH-bucketed cosine) to an "
                               "admitted doc's; requires --embed-dim")
    corpus_p.add_argument("--embed-threshold", type=float, default=0.99)
    corpus_p.add_argument("--embed-dim", type=int, default=None,
                          help="embedding dimension (required with --embed-dup)")
    corpus_p.add_argument("--format", choices=("jsonl", "warc"),
                          default="jsonl",
                          help="shard format: jsonl documents or WARC/WET "
                               "crawl archives (Common Crawl shape)")
    corpus_p.add_argument("--ann-index", default=None,
                          help="existing ann-build index dir: admitted docs' "
                               "inline embeddings are appended per batch "
                               "(frozen codebooks, replay-safe) so ann-query "
                               "serves the corpus without a rebuild")
    corpus_p.add_argument("--lexical-index", default=None,
                          help="existing lex-build index dir: admitted docs' "
                               "text is tokenized into postings per batch "
                               "(epoch stats delta, replay-safe) so "
                               "retrieve-index serves the corpus without a "
                               "rebuild or re-tokenize")
    corpus_p.add_argument("--lm-dir", default=None,
                          help="existing lm-train model dir (min_count=1): "
                               "admitted docs' unigram/bigram count deltas "
                               "are appended per batch (epoch stats delta, "
                               "replay-safe) so lm-score reflects the live "
                               "corpus without a retrain")
    corpus_p.add_argument("--lm-gate-dir", default=None,
                          help="existing lm-train TARGET-DOMAIN model dir: "
                               "reject docs scoring above --lm-max-score "
                               "at admission (CCNet fluency screen; "
                               "rejections under _lm_rejects/)")
    corpus_p.add_argument("--lm-max-score", dest="lm_gate_max_score",
                          type=float, default=None,
                          help="neg-avg-logprob ceiling for --lm-gate-dir "
                               "(REQUIRED with it; calibrate via lm-score "
                               "quantiles on a sample)")
    corpus_p.add_argument("--lm-gate-alpha", type=float, default=0.1)
    corpus_p.add_argument("--near-dup", action="store_true",
                          help="also reject MinHash near-duplicates of the corpus")
    corpus_p.add_argument("--line-dedup-min-docs", type=int, default=None,
                          help="cut lines appearing in >= N distinct docs across batch+corpus (CCNet boilerplate stage); emptied docs land in _line_rejects")
    corpus_p.add_argument("--quality-gate", action="store_true",
                          help="drop documents failing the Gopher-style rule "
                               "cascade BEFORE dedup; rejection reasons land "
                               "under _rejects/epoch=N")
    corpus_p.add_argument("--neardup-threshold", type=float, default=0.5)
    corpus_p.add_argument("--decontaminate-eval", default=None,
                          help="parquet of benchmark (doc_id, text) rows: "
                               "reject docs sharing any word n-gram with "
                               "it at admission (recorded under "
                               "_contam_rejects/, never enters an index)")
    corpus_p.add_argument("--decontaminate-ngram", type=int, default=8)
    corpus_p.add_argument("--decontaminate-mode",
                          choices=("ngram", "winnow"), default="ngram",
                          help="ngram = verbatim word grams; winnow = "
                               "char fingerprints (catches punctuation/"
                               "casing-edited copies)")
    corpus_p.add_argument("--profile", action="store_true",
                          help="per-epoch chars/words/lang profiles of the "
                          "admitted docs under _profile/ (read back with "
                          "profile-history)")
    corpus_p.set_defaults(fn=cmd_corpus)

    ccompact_p = sub.add_parser(
        "corpus-compact", help="merge the corpus index's epoch dirs (stopped stream)"
    )
    ccompact_p.add_argument("store_url", help="corpus lake root")
    ccompact_p.add_argument("--min-epochs", type=int, default=2)
    ccompact_p.set_defaults(fn=cmd_corpus_compact)

    cexport_p = sub.add_parser(
        "corpus-export", help="write the corpus as deterministic training shards"
    )
    cexport_p.add_argument("store_url", help="corpus lake root")
    cexport_p.add_argument("out_dir", help="shard output root")
    cexport_p.add_argument("--shards", type=int, default=64)
    cexport_p.add_argument("--seed", type=int, default=42)
    cexport_p.add_argument("--context-len", type=int, default=2048,
                           help="greedy packing bin size in tokens")
    cexport_p.add_argument("--as-of-epoch", type=int, default=None,
                           help="snapshot export: only docs admitted in "
                           "epochs <= N (partition-pruned time travel)")
    cexport_p.set_defaults(fn=cmd_corpus_export)

    annb_p = sub.add_parser(
        "ann-build", help="build/append a persisted IVF-PQ vector index"
    )
    annb_p.add_argument("index_dir", help="index root (codes/ + _ANN_META.json)")
    annb_p.add_argument("--embeddings", required=True,
                        help="parquet of (vec_id, embedding) rows")
    annb_p.add_argument("--dim", type=int, default=None,
                        help="embedding dimension (required unless --append)")
    annb_p.add_argument("--cells", type=int, default=None,
                        help="IVF coarse cells (n_centroids, default 16)")
    annb_p.add_argument("--m", type=int, default=None,
                        help="PQ subspaces (default 8)")
    annb_p.add_argument("--codes", type=int, default=None,
                        help="PQ codes per subspace (default 16)")
    annb_p.add_argument("--opq-iters", type=int, default=0,
                        help="train an OPQ rotation with this many "
                             "alternating-minimization iterations and "
                             "build the index in the rotated space")
    annb_p.add_argument("--no-residual", action="store_true",
                        help="quantize raw vectors instead of cell residuals")
    annb_p.add_argument("--append", action="store_true",
                        help="encode with the existing index's frozen "
                             "quantizer/codebooks and append (no retrain)")
    annb_p.set_defaults(fn=cmd_ann_build)

    annq_p = sub.add_parser(
        "ann-query", help="top-k search against a persisted IVF-PQ index"
    )
    annq_p.add_argument("index_dir")
    annq_p.add_argument("--queries", required=True,
                        help="parquet of (vec_id, embedding) query rows")
    annq_p.add_argument("--k", type=int, default=5)
    annq_p.add_argument("--nprobe", type=int, default=4)
    annq_p.set_defaults(fn=cmd_ann_query)

    annc_p = sub.add_parser(
        "ann-compact",
        help="fold a corpus stream's per-batch ANN code appends into one "
             "epoch dir (stopped stream only)",
    )
    annc_p.add_argument("index_dir")
    annc_p.add_argument("--min-epochs", type=int, default=2)
    annc_p.set_defaults(fn=cmd_ann_compact)

    lexb_p = sub.add_parser(
        "lex-build", help="build a persisted BM25 postings index"
    )
    lexb_p.add_argument("index_dir",
                        help="index root (postings/ + _LEX_META.json)")
    lexb_p.add_argument("--docs", required=True,
                        help="parquet of (doc_id, text) rows")
    lexb_p.add_argument("--buckets", type=int, default=64,
                        help="term-hash partition buckets (default 64)")
    lexb_p.set_defaults(fn=cmd_lex_build)

    lexq_p = sub.add_parser(
        "retrieve-index",
        help="BM25 retrieval from a persisted postings index (no corpus "
             "re-tokenize; scans only the query terms' buckets)",
    )
    lexq_p.add_argument("index_dir")
    lexq_p.add_argument("--query", default=None,
                        help="whitespace-separated query terms")
    lexq_p.add_argument("--queries-table", default=None,
                        help="parquet of (query_id, query) rows")
    lexq_p.add_argument("--max-doc-freq", type=int, default=None,
                        help="drop terms whose document frequency exceeds "
                             "this (hot-term guard)")
    lexq_p.add_argument("--k", type=int, default=20)
    lexq_p.add_argument("--embeddings", default=None,
                        help="with --queries-table (vec_id column): fuse "
                             "index-served BM25 with per-query cosine via "
                             "RRF (hybrid, rows identical to `retrieve "
                             "--embeddings`)")
    lexq_p.add_argument("--ann-index", default=None,
                        help="with --embeddings: serve the vector list "
                             "from this persisted IVF-PQ index (ADC ranks, "
                             "recall set by --nprobe) instead of brute "
                             "cosine — no corpus-scale scan anywhere")
    lexq_p.add_argument("--nprobe", type=int, default=4)
    lexq_p.set_defaults(fn=cmd_retrieve_index)

    lexc_p = sub.add_parser(
        "lex-compact",
        help="fold a corpus stream's per-batch postings appends into one "
             "epoch dir (stopped stream only)",
    )
    lexc_p.add_argument("index_dir")
    lexc_p.add_argument("--min-epochs", type=int, default=2)
    lexc_p.set_defaults(fn=cmd_lex_compact)

    exp_p = sub.add_parser(
        "export-pretrain",
        help="export a corpus as ordered training shards (one pos-ordered "
             "file per shard + committed manifest)",
    )
    exp_p.add_argument("out_dir",
                       help="artifact root (shards/ + _EXPORT_MANIFEST.json)")
    exp_p.add_argument("--docs", required=True,
                       help="parquet of (doc_id, text) rows")
    exp_p.add_argument("--context-len", type=int, default=2048,
                       help="greedy packing bin size in tokens")
    exp_p.add_argument("--n-shards", type=int, default=16,
                       help="shard count (size so one shard fits a task)")
    exp_p.add_argument("--seed", type=int, default=42,
                       help="epoch seed: reshuffles within-shard order, "
                            "shard membership unchanged")
    exp_p.add_argument("--bpe-merges", type=int, default=0,
                       help="train a BPE tokenizer with this many merges "
                            "and carry token arrays in the shards")
    exp_p.add_argument("--tokenizer", default=None,
                       help="apply a persisted BPE model (bpe-train) "
                            "instead of training per run")
    exp_p.add_argument("--mixture", default=None,
                       help="weighted mixture with deterministic "
                            "upsampling before export: COL:g1=w1,g2=w2 "
                            "(e.g. lang:en=0.5,fr=0.2); repeated docs get "
                            "their own stable (shard, pos) per copy")
    exp_p.add_argument("--budget-tokens", type=int, default=None,
                       help="total token budget the mixture weights "
                            "divide (required with --mixture)")
    exp_p.add_argument("--mixture-id", choices=("arith", "hash"),
                       default="arith",
                       help="mix_id strategy: 'arith' (reversible "
                            "doc_id*stride+copy; refuses hash-range ids) "
                            "or 'hash' (any id range, e.g. xxhash64 "
                            "doc_ids from WARC ingest)")
    exp_p.set_defaults(fn=cmd_export_pretrain)

    rel_p = sub.add_parser(
        "release",
        help="cut a training-data release: quality gate -> dedup -> "
             "decontaminate -> fluency gate -> mixture -> sharded export "
             "+ committed report",
    )
    rel_p.add_argument("out_dir", help="export artifact root")
    rel_p.add_argument("--docs", required=True,
                       help="curated parquet of (doc_id, text[, lang...])")
    rel_p.add_argument("--quality-gate", action="store_true",
                       help="drop docs failing the Gopher-style cascade")
    rel_p.add_argument("--eval", default=None,
                       help="benchmark parquet (doc_id, text): drop "
                            "training docs sharing any word n-gram")
    rel_p.add_argument("--decontaminate-ngram", type=int, default=8)
    rel_p.add_argument("--lm-gate-dir", default=None,
                       help="lm-train target-domain model: drop docs "
                            "scoring above --lm-max-score")
    rel_p.add_argument("--lm-max-score", type=float, default=None)
    rel_p.add_argument("--lm-gate-alpha", type=float, default=0.1)
    rel_p.add_argument("--mixture", default=None,
                       help="COL:g1=w1,g2=w2,... weighted mixture with "
                            "deterministic upsampling (needs "
                            "--budget-tokens)")
    rel_p.add_argument("--budget-tokens", type=int, default=None)
    rel_p.add_argument("--mixture-id", choices=("arith", "hash"),
                       default="arith")
    rel_p.add_argument("--context-len", type=int, default=2048)
    rel_p.add_argument("--n-shards", type=int, default=16)
    rel_p.add_argument("--seed", type=int, default=42)
    rel_p.add_argument("--tokenizer", default=None,
                       help="frozen bpe-train model dir (token arrays in "
                            "the shards)")
    rel_p.add_argument("--no-resume", action="store_true",
                       help="ignore committed stage receipts and "
                            "recompute every stage (receipts are "
                            "rewritten fresh) — use when an input was "
                            "rewritten in place without changing its "
                            "size/mtime fingerprint")
    rel_p.add_argument("--status", action="store_true",
                       help="report per-stage receipt state (complete / "
                            "artifact-missing / invalidated / stale / "
                            "torn / absent), orphaned receipts, and the "
                            "resume point for the current arguments, "
                            "running nothing and mutating nothing")
    rel_p.set_defaults(fn=cmd_release)

    lmt_p = sub.add_parser(
        "lm-train",
        help="train + persist a target-domain bigram LM (CCNet fluency "
             "reference)",
    )
    lmt_p.add_argument("lm_dir", help="model artifact root")
    lmt_p.add_argument("--docs", required=True,
                       help="target-domain parquet of (doc_id, text) rows")
    lmt_p.add_argument("--buckets", type=int, default=64)
    lmt_p.add_argument("--min-count", type=int, default=1,
                       help="prune bigrams seen fewer times (production "
                            "size bound; unigrams stay complete so "
                            "smoothing denominators are exact)")
    lmt_p.set_defaults(fn=cmd_lm_train)

    lms_p = sub.add_parser(
        "lm-score",
        help="score a corpus's fluency under a persisted bigram LM "
             "(add-alpha smoothed; optional perplexity ceiling filter)",
    )
    lms_p.add_argument("lm_dir")
    lms_p.add_argument("--docs", required=True)
    lms_p.add_argument("--out", required=True,
                       help="scores output dir (filtered corpus lands at "
                            "<out>_kept with --max-score)")
    lms_p.add_argument("--alpha", type=float, default=0.1,
                       help="add-alpha smoothing mass (query-time knob; "
                            "the artifact stores raw counts)")
    lms_p.add_argument("--max-score", type=float, default=None)
    lms_p.set_defaults(fn=cmd_lm_score)

    lma_p = sub.add_parser(
        "lm-append",
        help="append a document batch's count deltas to a persisted "
             "bigram LM (replay-safe epoch; scoring merges base+epochs)",
    )
    lma_p.add_argument("lm_dir")
    lma_p.add_argument("--docs", required=True,
                       help="parquet of (doc_id, text) rows to count in")
    lma_p.add_argument("--epoch", type=int, required=True,
                       help="epoch id (re-running the same id overwrites "
                            "it — the replay-idempotence contract)")
    lma_p.set_defaults(fn=cmd_lm_append)

    lmc_p = sub.add_parser(
        "lm-compact",
        help="fold a streamed LM's per-batch deltas into one epoch=-1 "
             "dir (stopped stream)",
    )
    lmc_p.add_argument("lm_dir")
    lmc_p.add_argument("--min-epochs", type=int, default=2)
    lmc_p.set_defaults(fn=cmd_lm_compact)

    qt_p = sub.add_parser(
        "quality-train",
        help="train + freeze the weak-label quality classifier",
    )
    qt_p.add_argument("model_dir", help="model artifact root")
    qt_p.add_argument("--docs", required=True,
                      help="parquet of (doc_id, text) rows")
    qt_p.add_argument("--sample-mod", type=int, default=1,
                      help="train on the 1/N hash slice (100 at crawl "
                           "scale; 1 = all docs)")
    qt_p.set_defaults(fn=cmd_quality_train)

    qsc_p = sub.add_parser(
        "quality-score",
        help="score a corpus with a frozen quality model (P(keep) per "
             "doc; optional threshold filter)",
    )
    qsc_p.add_argument("model_dir")
    qsc_p.add_argument("--docs", required=True)
    qsc_p.add_argument("--out", required=True,
                       help="scores output dir (filtered corpus lands "
                            "at <out>_kept with --min-p-keep)")
    qsc_p.add_argument("--min-p-keep", type=float, default=None)
    qsc_p.set_defaults(fn=cmd_quality_score)

    dec_p = sub.add_parser(
        "decontaminate",
        help="flag + drop training docs leaking an eval set (n-gram "
             "always; winnowing and embedding detectors opt-in)",
    )
    dec_p.add_argument("train", help="parquet of (doc_id, text) rows")
    dec_p.add_argument("--eval", required=True, dest="eval",
                       help="parquet of eval/benchmark (doc_id, text) rows")
    dec_p.add_argument("--out", required=True,
                       help="cleaned corpus output dir")
    dec_p.add_argument("--ngram", type=int, default=8,
                       help="word n-gram length (default 8)")
    dec_p.add_argument("--winnow", action="store_true",
                       help="also run char-level winnowing fingerprints "
                            "(catches cross-tokenization edits)")
    dec_p.add_argument("--winnow-k", type=int, default=16)
    dec_p.add_argument("--winnow-w", type=int, default=6)
    dec_p.add_argument("--embeddings", default=None,
                       help="train embeddings parquet (vec_id == doc_id): "
                            "also run the paraphrase detector")
    dec_p.add_argument("--eval-embeddings", default=None,
                       help="eval embeddings parquet (with --embeddings)")
    dec_p.add_argument("--threshold", type=float, default=0.97,
                       help="semantic contamination cosine threshold")
    dec_p.set_defaults(fn=cmd_decontaminate)

    expv_p = sub.add_parser(
        "export-verify",
        help="integrity audit of a pre-training export (manifest vs "
             "shards on disk, pos density); exit 1 when degraded",
    )
    expv_p.add_argument("out_dir", help="export root")
    expv_p.set_defaults(fn=cmd_export_verify)

    bpe_p = sub.add_parser(
        "bpe-train",
        help="train a BPE tokenizer and persist the merge list as a "
             "frozen lake artifact",
    )
    bpe_p.add_argument("model_dir", help="model root (_BPE_MODEL.json)")
    bpe_p.add_argument("--docs", required=True,
                       help="parquet with a text column")
    bpe_p.add_argument("--merges", type=int, default=200)
    bpe_p.add_argument("--max-words", type=int, default=50_000,
                       help="frequency-head size the trainer collects")
    bpe_p.set_defaults(fn=cmd_bpe_train)

    cur_p = sub.add_parser(
        "curate",
        help="batch corpus curation: line dedup -> quality gate -> exact "
             "dedup -> near-dup prune -> curated parquet + JSON report",
    )
    cur_p.add_argument("docs", help="parquet dir of (doc_id, text, ...) rows")
    cur_p.add_argument("out", help="output parquet dir for the curated corpus")
    cur_p.add_argument("--line-dedup-min-docs", type=int, default=None,
                       help="cut lines appearing in >= N distinct docs "
                            "(CCNet boilerplate stage)")
    cur_p.add_argument("--quality-gate", action="store_true",
                       help="drop docs failing the Gopher-style rule cascade")
    cur_p.add_argument("--near-dup", action="store_true",
                       help="prune MinHash-LSH near-dup clusters to their "
                            "canonical (min doc_id) member")
    cur_p.add_argument("--neardup-threshold", type=float, default=0.5)
    cur_p.add_argument("--profile", action="store_true",
                       help="report distribution drift (chars/words/lang "
                       "profiles before vs after) alongside the counts")
    cur_p.set_defaults(fn=cmd_curate)

    retr_p = sub.add_parser(
        "retrieve", help="BM25 (optionally hybrid RRF) retrieval over a corpus"
    )
    retr_p.add_argument("docs", help="parquet dir of (doc_id, text) rows")
    retr_p.add_argument("--query", default=None,
                        help="whitespace-separated query terms")
    retr_p.add_argument("--queries-table", default=None,
                        help="parquet of (query_id, query) rows: batch "
                             "BM25 via the inverted index (one exchange "
                             "over matched postings; no corpus x queries "
                             "crossJoin)")
    retr_p.add_argument("--max-doc-freq", type=int, default=None,
                        help="batch mode: drop terms whose document "
                             "frequency exceeds this (hot-term guard)")
    retr_p.add_argument("--k", type=int, default=20)
    retr_p.add_argument("--embeddings", default=None,
                        help="parquet of (vec_id, embedding) rows: fuse "
                             "cosine ranking via reciprocal-rank fusion")
    retr_p.add_argument("--query-vec-id", type=int, default=0,
                        help="vec_id whose embedding is the vector query")
    retr_p.set_defaults(fn=cmd_retrieve)

    sel_p = sub.add_parser(
        "select", help="DSIR importance-weighted corpus selection"
    )
    sel_p.add_argument("docs", help="parquet dir of (doc_id, lang, text) rows")
    sel_p.add_argument("--target-lang", required=True,
                       help="lang value defining the target slice")
    sel_p.add_argument("--k", type=int, default=100)
    sel_p.add_argument("--temperature", type=float, default=1.0)
    sel_p.add_argument("--seed", type=int, default=42)
    sel_p.add_argument("--staging-dir", default=None,
                       help="materialize the hashed feature arrays to this "
                            "dir (lake path) instead of an executor cache — "
                            "use on real crawls")
    sel_p.add_argument("--out", default=None,
                       help="write selected documents to this parquet dir "
                            "instead of printing ids")
    sel_p.set_defaults(fn=cmd_select)

    query_p = sub.add_parser("query", help="run SQL over a sink lake")
    query_p.add_argument("sql")
    query_p.add_argument("--table", action="append", required=True,
                         metavar="NAME=DIR", help="register lake dir as view")
    query_p.add_argument("--start-block", type=int, default=None,
                         help="inclusive lower block bound")
    query_p.add_argument("--stop-block", type=int, default=None,
                         help="EXCLUSIVE upper block bound (same convention as run)")
    query_p.add_argument("--limit", type=int, default=100)
    query_p.set_defaults(fn=cmd_query)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
