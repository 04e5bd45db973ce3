"""Training-ready export: the LAST MILE of the pre-training pipeline.

Everything upstream (ingest -> curate -> dedup -> decontaminate -> sample;
reference parity: the sink's parquet lake is the INPUT side of this story,
``parquet/sinker/sinker.go`` stops at "rows are in parquet") produces a
corpus TABLE; a trainer consumes ORDERED, FIXED-SIZE SHARDS. This module
lays the corpus down as that artifact:

  ``{out_dir}/shards/shard_id={n}/part-*.parquet``  training rows, ONE file
                                                    per shard dir, pos-ordered
  ``{out_dir}/_EXPORT_MANIFEST.json``               params + totals +
                                                    per-shard stats; the
                                                    COMMIT MARKER

Determinism contract (the reason this is an operator, not a bare
``df.write``): the ``(shard_id, pos)`` of every document is a pure function
of ``(doc_id, seed, n_shards)`` — universal-hash shard assignment + seeded
md5 within-shard order, the ``q_shuffle_shards`` construction — so the same
corpus exports the same order at any parallelism, on any engine, twice.
Re-exports are byte-reproducible, trainer resume points are stable
(shard, pos) coordinates, and a NEW SEED reshuffles the within-shard order
for the next training epoch while shard MEMBERSHIP stays put (only the
order exchange reruns; data-parallel shard->worker wiring is unchanged).

Packing rides along rather than being materialized: ``seq_id`` groups
consecutive docs (in shard order) into ``context_len``-token greedy bins
via a per-shard running token sum — the ``q_pack_sequences`` contract — and
``n_tokens`` marks document boundaries for loss masking / attention resets.
A doc longer than ``context_len`` overflows the bin it STARTS in (greedy
running-sum packing never splits a document; chunk upstream with
``text.chunk_documents`` if the trainer needs hard caps).

Tokenization is whitespace by default (count-only, engine-portable —
SQL-oracle-able end to end) and a trained BPE when ``merges`` is passed:
then ``tokens`` (the trainable ids-as-strings) are carried in the shards
and ``n_tokens`` is the BPE count (``bpe.bpe_tokenize``'s map-only Arrow
apply — no extra shuffle beyond the export's own).

Scale shape: everything before the write is map-only expressions; the ONE
exchange is the hash repartition on ``shard_id`` (so one task owns one
shard's rows end-to-end: sort, pack, write a single pos-ordered file).
Window running sums partition by shard — corpus/n_shards rows each, never a
global sort. Size ``n_shards`` so a shard fits a task at your scale (the
knob a 100 TB run raises to thousands; each shard is then still an
independent stream a trainer worker tails).

Crash-safety: the manifest is the commit marker, written LAST from a
read-back of the shards actually on disk (never from a recompute that
could drift from what landed). A re-export deletes it FIRST, so a crash
mid-write leaves a manifest-less directory every reader refuses loudly,
and the old artifact is never half-overwritten silently.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import register
from ..fsio import HadoopFS, url_join
from ..operators._helpers import tiny_df
from ..tables import load

from .sampling import uhash, uhash_sql

_MANIFEST = "_EXPORT_MANIFEST.json"


def plan_pretrain_export(docs: DataFrame, context_len: int = 2048,
                         n_shards: int = 16, seed: int = 42,
                         text_col: str = "text", id_col: str = "doc_id",
                         merges: list[tuple[str, str]] | None = None,
                         keep_cols: tuple[str, ...] = (),
                         ) -> DataFrame:
    """The export as a DataFrame: (shard_id, pos, seq_id, doc_id, n_tokens,
    text[, tokens]) — pure function of (doc_id, seed, n_shards), lazily
    composable (filter it, join it, or hand it to write_pretrain_export).

    shard_id is seed-INDEPENDENT (universal hash of doc_id) so epochs with
    different seeds reshuffle order without moving docs between shards;
    pos/seq_id derive from the seeded md5 sort key. seq packing is the
    greedy per-shard running sum over that order.

    Null contract (code review r12, matching the r11 sampler/dedup rule —
    a contentless doc is never selected, admitted, or kept): rows with a
    null id or null text are EXCLUDED. A null id has no deterministic
    (shard, pos) coordinate — before the filter it landed in a
    shard_id=__HIVE_DEFAULT_PARTITION__ dir whose manifest key crashed
    every reader doing int(shard) — and a null text has no tokens, so its
    null n_tokens poisoned pos-neighbors' seq_id into NULL. Upstream
    corpus admission already quarantines both classes (_drift_rejects /
    the quality gate); this filter makes the public operator honor the
    same contract on raw frames."""
    cols = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(text_col).alias("text"),
        *[F.col(c) for c in keep_cols],  # metadata riders (lang, source…)
    ).where(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
    if merges is None:
        counted = cols.withColumn(
            "n_tokens", F.size(F.split(F.col("text"), " ")).cast("long")
        )
    else:
        from .bpe import bpe_tokenize

        # passthrough keeps this map-only: the historical
        # cols.join(toks, "doc_id") form shuffled the ENTIRE corpus twice
        # (both join sides) just to reunite tokens with text — at 100 TB
        # that join, not the export's own repartition, would have been the
        # dominant exchange (code review r12)
        counted = bpe_tokenize(
            cols, merges, text_col="text",
            passthrough=("text", *keep_cols),
        ).select(
            "doc_id", F.col("n_tokens").cast("long").alias("n_tokens"),
            "tokens", "text", *keep_cols,
        )
    # sampling.uhash pmod-reduces doc_id BEFORE the multiply: real corpus
    # doc_ids are xxhash64 digests (full-range signed longs,
    # warc_corpus.py), for which the naive (doc_id * A + B) % M form
    # overflows int64 — an ARITHMETIC_OVERFLOW crash under ANSI (the
    # session default), negative shard_ids without it. The outer pmod
    # keeps shard_id in [0, n_shards) for any id sign.
    shard = F.pmod(uhash(F.col("doc_id")), F.lit(n_shards)).cast("long")
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f":{seed}")))
    w = Window.partitionBy("shard_id").orderBy("sort_key")
    # the packing increment is clamped to >= 1: a BPE-tokenized empty or
    # whitespace-only doc counts 0 tokens, and an unclamped running sum
    # stacks EVERY such doc into the same seq_id — at crawl scale (where
    # empty docs number in the millions) that one sequence group would OOM
    # materialize_sequences' collect_list (code review r12). With the
    # clamp a bin holds at most context_len docs; n_tokens itself stays
    # the true count, and the whitespace tokenizer (always >= 1 token)
    # is bit-for-bit unchanged, so the SQL oracles need no clamp.
    tok_slot = F.greatest(F.col("n_tokens"), F.lit(1).cast("long"))
    run = F.sum(tok_slot).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        counted.withColumn("shard_id", shard)
        .withColumn("sort_key", key)
        # the export's ONE exchange: hash-repartition on shard_id to
        # n_shards tasks BEFORE the windows — hashpartitioning(shard_id)
        # satisfies the windows' clustering requirement, so ordering and
        # packing reuse this exchange instead of adding their own, and the
        # writer downstream adds none (each shard's rows already live in
        # exactly one task)
        .repartition(n_shards, "shard_id")
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .withColumn(
            "seq_id",
            F.floor((run - tok_slot) / context_len).cast("long"),
        )
    )
    keep = ["shard_id", "pos", "seq_id", "doc_id", "n_tokens", "text",
            *keep_cols]
    if merges is not None:
        keep.append("tokens")
    return out.select(*keep)


def write_pretrain_export(docs: DataFrame, out_dir: str,
                          context_len: int = 2048, n_shards: int = 16,
                          seed: int = 42, text_col: str = "text",
                          id_col: str = "doc_id",
                          merges: list[tuple[str, str]] | None = None,
                          keep_cols: tuple[str, ...] = (),
                          ) -> dict:
    """Materialize the export artifact; returns the manifest it committed.

    One file per shard dir, rows pos-ordered inside it: the plan hash-
    repartitions on shard_id (each shard's rows land in exactly one task)
    and sorts within partitions by (shard_id, pos), so partitionBy splits
    a task's output into one ordered file per shard it owns — a trainer
    worker streams its shard file start to finish with zero further sort.
    Per-shard stats in the manifest come from reading BACK the written
    columns (counts only — text is never rescanned), so manifest ==
    on-disk is true by construction, not by recompute."""
    spark = docs.sparkSession
    fs = HadoopFS(spark, out_dir)
    manifest_path = url_join(out_dir, _MANIFEST)
    tmp_manifest = url_join(out_dir, "." + _MANIFEST + ".tmp")
    if fs.exists(manifest_path):
        fs.delete(manifest_path, recursive=False)
    if fs.exists(tmp_manifest):  # stale tmp from a crashed prior export
        fs.delete(tmp_manifest, recursive=False)
    shards_dir = url_join(out_dir, "shards")
    plan = plan_pretrain_export(
        docs, context_len=context_len, n_shards=n_shards, seed=seed,
        text_col=text_col, id_col=id_col, merges=merges,
        keep_cols=keep_cols,
    )
    (
        # the plan is already hash-partitioned on shard_id (its one
        # exchange); the local sort re-asserts pos order without another
        plan.sortWithinPartitions("shard_id", "pos")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(shards_dir)
    )
    # explicit schema: an EMPTY corpus writes a shards dir with no data
    # files to infer from — the artifact must still commit (manifest with
    # zero totals), not crash the export
    stats = (
        spark.read.schema(plan.schema).parquet(shards_dir)
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.countDistinct("seq_id").alias("n_seqs"),
        )
        .collect()  # bounded: one row per shard
    )
    manifest = {
        "context_len": int(context_len),
        "n_shards": int(n_shards),
        "seed": int(seed),
        "tokenizer": "whitespace" if merges is None else "bpe",
        "n_merges": 0 if merges is None else len(merges),
        # the reader's schema contract — read-side inference would break
        # on an empty export and could drift across mixed-version shards
        "schema": plan.schema.jsonValue(),
        "total_docs": int(sum(r.n_docs for r in stats)),
        "total_tokens": int(sum(r.n_tokens for r in stats)),
        "total_seqs": int(sum(r.n_seqs for r in stats)),
        "shards": {
            str(r.shard_id): {
                "n_docs": int(r.n_docs),
                "n_tokens": int(r.n_tokens),
                "n_seqs": int(r.n_seqs),
            }
            for r in sorted(stats, key=lambda r: r.shard_id)
        },
    }
    # tmp + rename, not a direct write: the manifest is the COMMIT MARKER,
    # and a crash mid-write_bytes would otherwise leave a torn JSON that
    # read_export_manifest rejects with a bare JSONDecodeError instead of
    # the documented loud "uncommitted" contract (code review r12). The
    # dot-prefix keeps the tmp invisible to directory listings and Spark.
    fs.write_bytes(tmp_manifest, json.dumps(manifest).encode())
    fs.rename(tmp_manifest, manifest_path)
    return manifest


def read_export_manifest(spark: SparkSession, out_dir: str) -> dict:
    fs = HadoopFS(spark, out_dir)
    manifest_path = url_join(out_dir, _MANIFEST)
    if not fs.exists(manifest_path):
        raise FileNotFoundError(
            f"pre-training export at {out_dir!r} has no {_MANIFEST} — "
            "either it was never written (write_pretrain_export / "
            "`export-pretrain`) or an export crashed mid-write; re-export "
            "before training on it"
        )
    try:
        return json.loads(fs.read_bytes(manifest_path))
    except ValueError as e:  # torn/corrupt marker (legacy direct writes)
        raise ValueError(
            f"pre-training export at {out_dir!r} has a corrupt {_MANIFEST} "
            f"({e}) — an export crashed mid-commit or the file was damaged "
            "out of band; re-export before training on it"
        ) from e


def read_pretrain_export(spark: SparkSession, out_dir: str,
                         shard_id: int | None = None,
                         shard_ids: list[int] | None = None) -> DataFrame:
    """Read the artifact back (manifest-gated). ``shard_id`` prunes to one
    shard dir via the partition filter — the per-worker read path; rows
    are re-sorted by pos within the shard partition (cheap: the file is
    already in that order, but parquet split planning does not PROMISE
    order, so the contract is re-asserted rather than assumed).
    ``shard_ids`` is the data-parallel form — worker i of W owns shards
    ``range(i, n_shards, W)`` and reads them in one call; the isin filter
    is still pure partition pruning (only the owned dirs' files enter the
    plan), and each shard still lands in its own partition pos-ordered."""
    from pyspark.sql import types as T

    if shard_id is not None and shard_ids is not None:
        raise ValueError(
            "read_pretrain_export: pass shard_id OR shard_ids, not both"
        )
    manifest = read_export_manifest(spark, out_dir)  # refuses uncommitted
    schema = T.StructType.fromJson(manifest["schema"])
    df = spark.read.schema(schema).parquet(url_join(out_dir, "shards"))
    if shard_id is not None:
        df = df.filter(F.col("shard_id") == int(shard_id))
    elif shard_ids is not None:
        df = df.filter(
            F.col("shard_id").isin([int(s) for s in shard_ids])
        )
    return df.repartition("shard_id").sortWithinPartitions("shard_id", "pos")


_EXPORT_N_SHARDS = 8
_EXPORT_CTX = 512


@register(
    "q_export_shards",
    f"""
    WITH t AS (
        SELECT doc_id,
               CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(({uhash_sql('doc_id')}) % {_EXPORT_N_SHARDS}
                    AS BIGINT) AS shard_id,
               md5(CAST(doc_id AS VARCHAR) || ':42') AS k
        FROM documents
        WHERE doc_id IS NOT NULL AND text IS NOT NULL
    ),
    o AS (
        SELECT shard_id, n_tokens,
               SUM(n_tokens) OVER (
                   PARTITION BY shard_id ORDER BY k
                   ROWS UNBOUNDED PRECEDING
               ) AS run
        FROM t
    )
    SELECT shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT FLOOR((run - n_tokens) / {_EXPORT_CTX}))
                AS BIGINT) AS n_seqs
    FROM o
    GROUP BY shard_id
    """,
    doc="Training-ready export, pinned END TO END at the gate: writes the "
        "sharded artifact (deterministic hash-shard + seeded order + "
        "greedy packing), then returns per-shard stats FROM THE COMMITTED "
        "MANIFEST — so the whole write->manifest->read path, not just the "
        "plan, must agree with a first-principles DuckDB restatement of "
        "the (shard, order, packing) contract",
)
def q_export_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    out_dir = tempfile.mkdtemp(prefix="pretrain_export_")
    try:
        docs = load(spark, sf_dir, "documents").select("doc_id", "text")
        manifest = write_pretrain_export(
            docs, out_dir, context_len=_EXPORT_CTX,
            n_shards=_EXPORT_N_SHARDS,
        )
        rows = [
            (int(sid), s["n_docs"], s["n_tokens"], s["n_seqs"])
            for sid, s in manifest["shards"].items()
        ]
        return tiny_df(
            spark, rows,
            "shard_id long, n_docs long, n_tokens long, n_seqs long",
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


_MIX_STRIDE = 4096


def _mixture_oracle_cte() -> str:
    """The q_sample_mixture construction + arith mix_id materialization as
    a reusable CTE chain (ends in ``mixed(mix_id, n_tokens)``) — imported
    literals so the oracle can never drift from the Spark operators'
    constants."""
    from .sampling import _MIX_BUDGET, _MIX_WEIGHTS

    cases = " ".join(f"WHEN '{g}' THEN {w}" for g, w in _MIX_WEIGHTS)
    langs = ", ".join(f"'{g}'" for g, _ in _MIX_WEIGHTS)
    return f"""
    base AS (
        SELECT doc_id, lang AS grp,
               CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
               CASE lang {cases} END AS w,
               md5(CAST(doc_id AS VARCHAR) || ':42') AS mk
        FROM documents
        WHERE lang IN ({langs}) AND text IS NOT NULL
          AND doc_id IS NOT NULL
    ),
    tot AS (SELECT grp, SUM(n_tokens) AS grp_tokens FROM base GROUP BY grp),
    staged AS (
        SELECT b.*, FLOOR({_MIX_BUDGET} * w) AS quota,
               FLOOR(FLOOR({_MIX_BUDGET} * w) / grp_tokens) AS full_epochs,
               FLOOR({_MIX_BUDGET} * w)
                 - FLOOR(FLOOR({_MIX_BUDGET} * w) / grp_tokens) * grp_tokens
                 AS rem,
               SUM(n_tokens) OVER (
                   PARTITION BY b.grp ORDER BY mk ROWS UNBOUNDED PRECEDING
               ) AS cum
        FROM base b JOIN tot USING (grp)
    ),
    copies AS (
        SELECT doc_id, n_tokens,
               CAST(full_epochs + CASE WHEN cum <= rem THEN 1 ELSE 0 END
                    AS BIGINT) AS n_copies
        FROM staged
    ),
    mixed AS (
        SELECT doc_id * {_MIX_STRIDE} + c.copy AS mix_id, n_tokens
        FROM copies, UNNEST(range(1, n_copies + 1)) AS c(copy)
        WHERE n_copies > 0
    )
    """


@register(
    "q_export_mixture",
    f"""
    WITH {_mixture_oracle_cte()},
    t AS (
        SELECT mix_id, n_tokens,
               CAST(({uhash_sql('mix_id')}) % {_EXPORT_N_SHARDS}
                    AS BIGINT) AS shard_id,
               md5(CAST(mix_id AS VARCHAR) || ':42') AS k
        FROM mixed
    ),
    o AS (
        SELECT shard_id, n_tokens,
               SUM(n_tokens) OVER (
                   PARTITION BY shard_id ORDER BY k
                   ROWS UNBOUNDED PRECEDING
               ) AS run
        FROM t
    )
    SELECT shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT FLOOR((run - n_tokens) / {_EXPORT_CTX}))
                AS BIGINT) AS n_seqs
    FROM o
    GROUP BY shard_id
    """,
    doc="The composed mixture->materialize->shard path pinned END TO END "
        "at the gate (the companion to q_pipeline_release, which pins the "
        "selection side): weighted-mixture copy counts explode into "
        "per-copy mix_id rows, the sharded artifact is physically written "
        "with (shard, pos) keyed on mix_id — so an upsampled doc's epoch "
        "k holds its own stable slot — and per-shard stats come FROM THE "
        "COMMITTED MANIFEST, hash-checked against a first-principles "
        "DuckDB restatement of mixture x shard x packing",
)
def q_export_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from .sampling import (
        _MIX_BUDGET,
        _MIX_WEIGHTS,
        materialize_mixture,
        mixture_plan,
    )

    out_dir = tempfile.mkdtemp(prefix="mix_export_")
    try:
        docs = load(spark, sf_dir, "documents")
        mixed = materialize_mixture(
            docs, mixture_plan(docs, dict(_MIX_WEIGHTS), _MIX_BUDGET),
            stride=_MIX_STRIDE,
        )
        manifest = write_pretrain_export(
            mixed.select("mix_id", "text"), out_dir,
            context_len=_EXPORT_CTX, n_shards=_EXPORT_N_SHARDS,
            id_col="mix_id",
        )
        rows = [
            (int(sid), s["n_docs"], s["n_tokens"], s["n_seqs"])
            for sid, s in manifest["shards"].items()
        ]
        return tiny_df(
            spark, rows,
            "shard_id long, n_docs long, n_tokens long, n_seqs long",
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def verify_pretrain_export(spark: SparkSession, out_dir: str) -> dict:
    """Integrity audit of an export artifact — the check a trainer (or an
    operator who just restored/copied 100 TB of shards) runs before
    burning GPU-hours on it: recompute per-shard stats FROM THE SHARDS
    and compare to the committed manifest, and re-assert the pos-density
    invariant (positions 1..n_docs, no gaps — a lost parquet file inside
    a shard dir shows up as a pos hole even when row counts happen to
    survive elsewhere). One counts-only scan (text is never read:
    column pruning keeps the audit cheap at any scale).

    Returns {"ok": bool, "issues": [str...], "shards_checked": int};
    read_export_manifest's loud FileNotFoundError propagates for a
    manifest-less dir (that is not a degraded artifact — it is an
    uncommitted one)."""
    from pyspark.sql import types as T

    man = read_export_manifest(spark, out_dir)
    df = spark.read.schema(
        T.StructType.fromJson(man["schema"])
    ).parquet(url_join(out_dir, "shards"))
    got = {
        r.shard_id: r
        for r in df.groupBy("shard_id").agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.countDistinct("seq_id").alias("n_seqs"),
            F.max("pos").alias("max_pos"),
            F.countDistinct("pos").alias("n_pos"),
            F.countDistinct("doc_id").alias("n_ids"),
        ).collect()
    }
    issues: list[str] = []
    # legacy artifacts (pre null-id exclusion) can carry a null-shard
    # partition; it would make the int() below and the sorted() set math
    # crash the AUDIT — the one tool that must never die on a degraded
    # artifact (code review r12)
    if None in got:
        issues.append(
            f"{got.pop(None).n_docs} rows with null shard_id on disk "
            "(null-doc_id rows from a pre-r12 export) — re-export"
        )
    want: dict[int, dict] = {}
    for sid, s in man["shards"].items():
        try:
            want[int(sid)] = s
        except (TypeError, ValueError):
            issues.append(
                f"manifest shard key {sid!r} is not an integer — corrupt "
                "or pre-r12 manifest; re-export"
            )
    for sid in sorted(set(want) - set(got)):
        issues.append(f"shard {sid}: in manifest but has no rows on disk")
    for sid in sorted(set(got) - set(want)):
        issues.append(f"shard {sid}: on disk but absent from the manifest")
    for sid in sorted(set(want) & set(got)):
        w, g = want[sid], got[sid]
        for k, v in (("n_docs", g.n_docs), ("n_tokens", g.n_tokens),
                     ("n_seqs", g.n_seqs)):
            if w[k] != v:
                issues.append(
                    f"shard {sid}: {k} manifest={w[k]} disk={v}"
                )
        if g.max_pos != g.n_docs or g.n_pos != g.n_docs:
            issues.append(
                f"shard {sid}: pos not dense 1..{g.n_docs} "
                f"(max_pos={g.max_pos}, distinct={g.n_pos}) — rows lost "
                "or duplicated inside the shard"
            )
        if g.n_ids != g.n_docs:
            issues.append(
                f"shard {sid}: {g.n_docs - g.n_ids} duplicate doc_id(s) "
                "— the (doc_id, seed) -> (shard, pos) determinism "
                "contract does not hold; dedup upstream and re-export"
            )
    return {"ok": not issues, "issues": issues,
            "shards_checked": len(set(want) | set(got))}


def materialize_sequences(rows: DataFrame) -> DataFrame:
    """Fold an export's doc rows into trainer-batch SEQUENCE rows: one row
    per (shard_id, seq_id) with pos-ordered doc_ids, per-doc lengths (the
    attention-reset / loss-mask boundaries), the summed token count, and
    — when the export carries BPE ``tokens`` — the concatenated token
    array, i.e. the tensor-ready form. The collect_list is bounded by the
    docs of ONE sequence (a context_len token budget, plus at most one
    overflowing doc), never by a shard or the corpus; the groupBy reuses
    the export's shard hash partitioning prefix."""
    with_tokens = "tokens" in rows.columns
    parts = ["pos", "doc_id", "n_tokens"] + (
        ["tokens"] if with_tokens else []
    )
    s = F.sort_array(F.collect_list(F.struct(*parts)))
    grouped = rows.groupBy("shard_id", "seq_id").agg(s.alias("s"))
    cols = [
        "shard_id", "seq_id",
        F.size("s").cast("long").alias("n_docs"),
        F.transform("s", lambda x: x.doc_id).alias("doc_ids"),
        F.transform("s", lambda x: x.n_tokens).alias("doc_lens"),
        F.aggregate(
            "s", F.lit(0).cast("long"), lambda acc, x: acc + x.n_tokens
        ).alias("seq_tokens"),
    ]
    if with_tokens:
        cols.append(
            F.flatten(F.transform("s", lambda x: x.tokens)).alias("tokens")
        )
    return grouped.select(*cols)


def read_pretrain_sequences(spark: SparkSession, out_dir: str,
                            shard_id: int | None = None) -> DataFrame:
    """The artifact in its trainer-batch shape: manifest-gated read +
    :func:`materialize_sequences` (shard pruning via the partition
    filter, as in read_pretrain_export)."""
    return materialize_sequences(
        read_pretrain_export(spark, out_dir, shard_id=shard_id)
    )


@register(
    "q_export_sequences",
    f"""
    WITH t AS (
        SELECT doc_id,
               CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(({uhash_sql('doc_id')}) % {_EXPORT_N_SHARDS}
                    AS BIGINT) AS shard_id,
               md5(CAST(doc_id AS VARCHAR) || ':42') AS k
        FROM documents
        WHERE doc_id IS NOT NULL AND text IS NOT NULL
    ),
    o AS (
        SELECT shard_id, doc_id, n_tokens, k,
               SUM(n_tokens) OVER (
                   PARTITION BY shard_id ORDER BY k
                   ROWS UNBOUNDED PRECEDING
               ) AS run
        FROM t
    ),
    seqs AS (
        SELECT shard_id, doc_id, n_tokens, k,
               CAST(FLOOR((run - n_tokens) / {_EXPORT_CTX}) AS BIGINT)
                   AS seq_id
        FROM o
    )
    SELECT shard_id, seq_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY k) AS doc_order
    FROM seqs
    GROUP BY shard_id, seq_id
    """,
    doc="The export in its trainer-batch shape: one row per packed "
        "sequence with its pos-ORDERED doc list (the order is part of "
        "the hash, so a broken sort surfaces), doc count, and token sum "
        "— materialize_sequences over the deterministic shard/order/"
        "packing contract, hash-checked end to end",
)
def q_export_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    plan = plan_pretrain_export(
        docs, context_len=_EXPORT_CTX, n_shards=_EXPORT_N_SHARDS
    )
    return materialize_sequences(plan).select(
        "shard_id", "seq_id", "n_docs", "seq_tokens",
        F.array_join(
            F.transform("doc_ids", lambda d: d.cast("string")), ","
        ).alias("doc_order"),
    )
