"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": "...", "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (computes every output
column, no driver collection) after one untimed warm-up of the JVM/codegen.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: covers scan+agg, broadcast join, shuffle join, window frames,
# event-time windows, top-k, dedup (exact + MinHash-LSH), similarity top-k,
# text stats, JSON, and the TPC-H-shaped composite pipelines — the operators
# whose plans matter at 100 TB. The reported "value" covers exactly this set
# so round-over-round totals stay comparable.
HEADLINE = [
    "q_agg_basic",
    "q_join_broadcast",
    "q_join_inner",
    "q_join_asof",
    "q_topk",
    "q_win_frame",
    "q_stream_window",
    "q_stream_session",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_sim_topk",
    "q_text_stats",
    "q_fn_json",
    "q_udtf",
    "q_composite_topk",
    "q_composite_volume",
]

# Most expensive plans added in round 2 — benched so regressions are visible,
# totalled separately ("extended_total_sec") to keep "value" comparable with
# earlier rounds.
EXTENDED = [
    "q_dedup_jaccard",
    "q_dedup_clusters",
    "q_dedup_substring",
    "q_text_repetition",
    "q_text_filter_pipeline",
    # round 3
    "q_dedup_semantic",
    "q_multimodal_frames",
    "q_decontaminate",
    "q_text_perplexity",
    "q_pipeline_pretrain",
    "q_sim_topk_pq",
    "q_text_bpe",
    "q_dedup_clusters_star",
]


SINK_BLOCKS = 20_000  # reference worked example is 15k blocks (README.md:28-29)


def bench_sink(spark) -> float:
    """Blocks/sec through the full ingest path: staged raw parquet →
    protobuf decode (mapInPandas) → range partition → rotating padded-name
    parquet writes incl. backfill. This is the reference's primary job
    (stream-to-batch conversion), so its throughput is a headline number."""
    import shutil
    import tempfile

    from substreams_sink_parquet_spark import protowire as pw
    from substreams_sink_parquet_spark.decode import decode_payloads
    from substreams_sink_parquet_spark.sink.writer import WriterOptions, write_ranges
    from substreams_sink_parquet_spark.sources import stage_raw_blocks, synth_blocks

    spec = pw.MessageSpec("bench.Block", (
        pw.FieldSpec("height", 1, pw.K_UINT64),
        pw.FieldSpec("hash", 2, pw.K_STRING),
        pw.FieldSpec("gas", 3, pw.K_DOUBLE),
        pw.FieldSpec("transfers", 4, pw.K_MESSAGE, repeated=True,
                     message=pw.MessageSpec("bench.Transfer", (
                         pw.FieldSpec("from_addr", 1, pw.K_STRING),
                         pw.FieldSpec("to_addr", 2, pw.K_STRING),
                         pw.FieldSpec("amount", 3, pw.K_INT64),
                     ))),
    ))

    def payload(bn: int) -> dict:
        return {
            "height": bn,
            "hash": f"0x{bn:016x}",
            "gas": bn * 1.5,
            "transfers": [
                {"from_addr": f"a{bn % 997}", "to_addr": f"b{(bn + 1) % 997}",
                 "amount": bn * 10 + j}
                for j in range(3)
            ],
        }

    work = tempfile.mkdtemp(prefix="bench_sink_")
    try:
        in_dir = os.path.join(work, "in")
        # stage in 4 files (untimed — the feeder is external in production)
        chunk = SINK_BLOCKS // 4
        for c in range(4):
            stage_raw_blocks(
                spark, in_dir,
                synth_blocks(spec, range(c * chunk, (c + 1) * chunk), payload),
            )
        # untimed warm-up: first run through the decode+dynamic-partition-write
        # path pays one-time JVM/Python-worker setup (~2s) that a long-running
        # sink amortizes to nothing
        warm_in = os.path.join(work, "warm_in")
        warm_out = os.path.join(work, "warm_out")
        os.makedirs(warm_out)
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        stage_raw_blocks(spark, warm_in, synth_blocks(spec, range(1000), payload))
        write_ranges(
            # repartition(cpus): the warm-up must spawn the WHOLE Python
            # worker pool, or the timed run pays ~3s of worker startup
            decode_payloads(spark.read.parquet(warm_in).repartition(cpus), spec),
            warm_out, WriterOptions(partition_size=5000), ranges=[0],
        )

        from substreams_sink_parquet_spark.partition import range_start_col
        from substreams_sink_parquet_spark.sink.explode import explode_all

        ranges = [
            r[0]
            for r in spark.read.parquet(in_dir)
            .select(range_start_col("block_number", 0, 5000).alias("rs"))
            .distinct()
            .collect()
        ]

        # best-of-3 each, like the query timings: the whole measured job is
        # ~2-3 s, where one GC pause or scheduler hiccup is a 30% swing
        def run_plain(out_dir: str) -> float:
            os.makedirs(out_dir)
            t0 = time.time()
            raw = spark.read.parquet(in_dir).repartition(cpus)  # CPU-bound decode
            decoded = decode_payloads(raw, spec)
            write_ranges(decoded, out_dir, WriterOptions(partition_size=5000),
                         ranges=ranges)
            return SINK_BLOCKS / (time.time() - t0)

        # exploded ingest — the reference's flagship mode (README.md:33-41):
        # main table + one table per root repeated field, decode persisted
        # so it runs once, not once per table. Table writes run CONCURRENTLY
        # (independent directories; Spark's cache manager locks per
        # partition, so racing jobs materialize the decode exactly once) —
        # measured ~1.5x over sequential writes at 20k blocks.
        def run_exploded(out_ex: str, workers: int | None = None) -> float:
            from concurrent.futures import ThreadPoolExecutor

            os.makedirs(out_ex)
            t0 = time.time()
            decoded = decode_payloads(
                spark.read.parquet(in_dir).repartition(cpus), spec
            ).persist()
            try:
                jobs = [(out_ex, decoded)]
                for name, child in explode_all(decoded, spec).items():
                    child_dir = os.path.join(out_ex, name)
                    os.makedirs(child_dir, exist_ok=True)
                    jobs.append((child_dir, child))
                with ThreadPoolExecutor(
                    max_workers=workers or len(jobs)
                ) as pool:
                    list(pool.map(
                        lambda j: write_ranges(
                            j[1], j[0], WriterOptions(partition_size=5000),
                            ranges=ranges,
                        ),
                        jobs,
                    ))
            finally:
                decoded.unpersist()
            return SINK_BLOCKS / (time.time() - t0)

        rate_plain = round(max(
            run_plain(os.path.join(work, f"out{i}")) for i in range(3)
        ), 1)
        rate_exploded = round(max(
            run_exploded(os.path.join(work, f"out_ex{i}")) for i in range(3)
        ), 1)
        # sequential control for the same job list: tracks the concurrency
        # win (exploded_write_workers parity) round over round instead of
        # leaving the ~1.5x claim as a code comment
        rate_exploded_seq = round(max(
            run_exploded(os.path.join(work, f"out_exs{i}"), workers=1)
            for i in range(3)
        ), 1)
        return rate_plain, rate_exploded, rate_exploded_seq
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from substreams_sink_parquet_spark.catalog import queries
    from substreams_sink_parquet_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()

    def run(name: str) -> None:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        # measurement isolation: a query that caches internally (e.g. the
        # label-propagation loop in q_dedup_clusters) must not leave its
        # cache behind to slow every later measurement
        spark.catalog.clearCache()

    run("q_agg_basic")  # JVM / codegen warm-up, untimed

    # three passes, report the per-query minimum: steady-state cost, not
    # first-run JIT/shuffle-service jitter (n=1 driver artifacts whipsawed
    # sub-second queries by ±20% in earlier rounds). HEADLINE passes finish
    # before EXTENDED starts so the heavy extended plans can't pollute the
    # round-over-round-comparable headline numbers with GC pressure.
    timings: dict[str, float] = {}
    for group in (HEADLINE, EXTENDED):
        for _pass in range(3):
            for name in group:
                t0 = time.time()
                run(name)
                dt = round(time.time() - t0, 3)
                timings[name] = min(timings.get(name, float("inf")), dt)

    sink_rate, sink_rate_exploded, sink_rate_exploded_seq = bench_sink(spark)

    total = round(sum(timings[n] for n in HEADLINE), 3)
    print(json.dumps({
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "value_covers": HEADLINE,
        "extended_total_sec": round(sum(timings[n] for n in EXTENDED), 3),
        "sink_blocks_per_sec": sink_rate,
        "sink_blocks_per_sec_exploded": sink_rate_exploded,
        "sink_blocks_per_sec_exploded_seq": sink_rate_exploded_seq,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
