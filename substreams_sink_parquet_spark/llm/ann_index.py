"""Persisted IVF-PQ index: the ANN index as a LAKE ARTIFACT.

The in-memory composition (``similarity.ivfpq_topk``) re-trains and
re-encodes per call — right for a one-shot query, wrong for a serving
corpus. This module materializes the index once and prunes at read time:

  ``{index_dir}/codes/cent_id={c}/``  PQ codes, PARTITIONED BY CELL
  ``{index_dir}/_ANN_META.json``      centroids + codebooks + params

- The codes table is the 32x-compressed corpus (m bytes/vector at
  k<=256); partitioning by ``cent_id`` makes an nprobe-cell query a
  PARTITION-PRUNED scan — the files of unprobed cells are never listed
  into the plan (pinned by pytest via ``inputFiles()``), which is the
  whole point of IVF at 100 TB: touch nprobe/n_centroids of the index,
  physically.
- The metadata file holds exactly the driver-resident part of a FAISS
  index (quantizer + codebooks: k*dim + m*k*dsub floats) — kilobytes,
  shipped to executors as literals at query time like every other
  quantizer in ``similarity``.
- Probed cell ids are resolved driver-side from the (tiny) query set, so
  the pruning filter is a STATIC ``isin`` the parquet source sees at
  planning time — no dynamic-partition-pruning dependence.
- Residual encoding (the FAISS default) is preserved end-to-end: codes
  quantize (vector − cell centroid); each (query, probed cell) pair gets
  its own residual distance table.
- Optional OPQ (``opq_iters > 0``, FAISS's ``OPQMatrix,IVFxx,PQy``): the
  whole index lives in the trained rotated space; the rotation persists
  in the meta and appends/queries apply it transparently — callers never
  see rotated coordinates, true L2 ranks are unchanged (R orthogonal),
  only quantization error improves.

Incremental growth: ``append_to_ann_index`` encodes NEW vectors with the
frozen quantizer/codebooks (map-only) and appends into the same cell
partitions — the standard serve-time pattern (FAISS ``add``); retrain
(``write_ann_index``) when drift accumulates.

Streaming growth: ``append_epoch_to_ann_index`` is the REPLAY-SAFE form
for foreachBatch callers (the corpus builder's CorpusSink) — each batch's
codes land in ``codes_epochs/epoch={id}/cent_id={c}/`` and are
OVERWRITTEN per epoch, the same idempotence contract as every other
corpus index, so an at-least-once replay converges instead of
double-inserting. ``ann_topk`` scans the base codes and every epoch
append, each with the same static cell pruning.

Crash-safety of rebuilds: ``_ANN_META.json`` is the COMMIT MARKER. An
in-place rebuild deletes it BEFORE overwriting ``codes/`` — a crash
between the two leaves codes without meta, which every read path refuses
loudly, instead of silently decoding new codes against the old run's
centroids/codebooks.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..foldswap import (
    MANIFEST as _EP_MANIFEST,
    commit_fold,
    recover_fold,
    write_fold_manifest,
)
from ..fsio import HadoopFS, url_join
from .similarity import (
    _adc_score,
    _adc_table,
    _centroid_lookup,
    _nearest_centroid,
    _residual,
    ivf_centroids,
    opq_rotation,
    pq_codebooks,
    pq_encode,
    rotate_expr,
)

_META = "_ANN_META.json"


def write_ann_index(
    embeddings: DataFrame,
    index_dir: str,
    dim: int,
    n_centroids: int = 16,
    m: int = 8,
    n_codes: int = 16,
    residual: bool = True,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    opq_iters: int = 0,
) -> dict:
    """Train quantizer + codebooks, encode the corpus, and lay the index
    down partitioned by cell. Returns the metadata dict it persisted.

    ``opq_iters > 0`` trains an OPQ rotation first (the FAISS
    ``OPQMatrix,IVFxx,PQy`` factory string) and builds the ENTIRE index in
    the rotated space — centroids, residuals, codebooks, codes. The
    rotation persists in the meta (dim x dim floats — still a bounded
    driver artifact beside the codebooks) and every later entry point
    (frozen appends, epoch appends, ann_topk's probes) applies it
    transparently, so callers never see rotated coordinates. R orthogonal
    ⇒ true L2 ranks are unchanged; only quantization error improves.

    Rebuild crash-safety: meta is deleted BEFORE the codes overwrite
    (commit-marker protocol). The codes overwrite is not atomic; if this
    run dies mid-write, the next reader finds codes without meta and
    fails loudly instead of pairing the new codes with the PREVIOUS
    build's centroids/codebooks — which would ADC-decode silently-garbage
    neighbors. The deletes happen only AFTER training succeeds (not at
    entry): a rebuild that merely FAILS — wrong dim, empty input, a
    training error — must leave the old, still-consistent index serving,
    not brick it before a single new byte exists. A successful rebuild
    also clears any ``codes_epochs`` appends: they were encoded with the
    old codebooks and are superseded by the retrain's full-corpus
    encode."""
    spark = embeddings.sparkSession
    fs = HadoopFS(spark, index_dir)
    src = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    )
    rotation = None
    if opq_iters > 0:
        rotation, _ = opq_rotation(src, dim, m=m, k=n_codes,
                                   iters=opq_iters)
        src = src.select(
            "vec_id", rotate_expr("embedding", rotation).alias("embedding")
        )
    cents = ivf_centroids(src, n_centroids=n_centroids)
    assigned = _nearest_centroid(
        src, cents, "embedding", keep=["vec_id", "embedding"]
    )
    if residual:
        cvec = _centroid_lookup(cents)
        assigned = assigned.withColumn(
            "resid", _residual("embedding", cvec(F.col("cent_id")))
        ).persist()
        cbs = pq_codebooks(assigned, dim=dim, m=m, k=n_codes, vec_col="resid")
        codes = pq_encode(assigned, cbs, vec_col="resid",
                          keep=["vec_id", "cent_id"])
    else:
        cbs = pq_codebooks(src, dim=dim, m=m, k=n_codes)
        codes = pq_encode(assigned, cbs, keep=["vec_id", "cent_id"])
    # training succeeded — NOW retract the commit marker (and the epoch
    # appends the retrain supersedes) immediately before the overwrite, so
    # the destruction window is only the non-atomic codes write itself
    meta_path = url_join(index_dir, _META)
    if fs.exists(meta_path):
        fs.delete(meta_path, recursive=False)
    ep_root = url_join(index_dir, "codes_epochs")
    if fs.exists(ep_root):
        fs.delete(ep_root, recursive=True)
    # release the old stream's epoch-history binding with the epochs it
    # covered — a retrain adopts the index for whatever appends next
    # (code review r12)
    stream_marker = url_join(index_dir, "_STREAM_ID")
    if fs.exists(stream_marker):
        fs.delete(stream_marker, recursive=False)
    codes.write.mode("overwrite").partitionBy("cent_id").parquet(
        url_join(index_dir, "codes")
    )
    if residual:
        assigned.unpersist()
    meta = {
        "dim": dim, "m": m, "n_codes": n_codes, "residual": residual,
        "centroids": [[cid, vec] for cid, vec in cents],
        "codebooks": cbs,
    }
    if rotation is not None:
        meta["rotation"] = rotation
    fs.write_bytes(url_join(index_dir, _META), json.dumps(meta).encode())
    return meta


def read_ann_meta(spark: SparkSession, index_dir: str) -> dict:
    """Load the index metadata; refuses a missing marker with the
    index-family's loud, actionable error. The module docstring promises
    'codes without meta fail loudly' (the rebuild crash window) — before
    this guard the failure was an opaque Java FileNotFoundException from
    the raw open() instead of naming the builder (code review r12)."""
    fs = HadoopFS(spark, index_dir)
    meta_path = url_join(index_dir, _META)
    if not fs.exists(meta_path):
        raise FileNotFoundError(
            f"ANN index at {index_dir!r} has no {_META} — either it was "
            "never built (write_ann_index / `ann-build`) or a rebuild "
            "crashed mid-overwrite; rebuild before querying"
        )
    return json.loads(fs.read_bytes(meta_path))


def _encode_frozen(new_vectors: DataFrame, meta: dict, vec_col: str,
                   id_col: str, caller: str, validate: bool = True) -> DataFrame:
    """Map-only encode of new vectors under the FROZEN quantizer/codebooks
    (the FAISS ``add`` path — no retrain). ``validate=False`` skips the
    wrong-dimension probe — ONLY for callers that already filtered
    null/wrong-dim vectors (the probe is a Spark action; on a per-batch
    streaming path it would be one extra job per micro-batch)."""
    cents = [(int(c), list(v)) for c, v in meta["centroids"]]
    src = new_vectors.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    )
    if validate:
        # a wrong-dimension vector would encode into garbage codes via
        # zip_with/slice null propagation — refuse loudly before writing
        bad = src.filter(
            F.col("embedding").isNull() | (F.size("embedding") != meta["dim"])
        ).limit(1).count()
        if bad:
            raise ValueError(
                f"{caller}: input contains null or non-{meta['dim']}"
                "-dimensional embeddings; the index's dimension is frozen at "
                "build time — filter or re-embed the batch first"
            )
    if meta.get("rotation") is not None:
        # an OPQ index lives entirely in the rotated space: frozen appends
        # rotate exactly like the build did (dim check above still saw the
        # caller's raw vectors — R is square, dim is unchanged)
        src = src.select(
            "vec_id",
            rotate_expr("embedding", meta["rotation"]).alias("embedding"),
        )
    assigned = _nearest_centroid(
        src, cents, "embedding", keep=["vec_id", "embedding"]
    )
    if meta["residual"]:
        cvec = _centroid_lookup(cents)
        assigned = assigned.withColumn(
            "resid", _residual("embedding", cvec(F.col("cent_id")))
        )
        return pq_encode(assigned, meta["codebooks"], vec_col="resid",
                         keep=["vec_id", "cent_id"])
    return pq_encode(assigned, meta["codebooks"], keep=["vec_id", "cent_id"])


def append_to_ann_index(new_vectors: DataFrame, index_dir: str,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id") -> None:
    """Encode new vectors with the frozen quantizer/codebooks and append
    into the existing cell partitions. The caller owns dedup of vec_ids
    (compose with the corpus builder's screens upstream) AND at-most-once
    invocation — a parquet append is not idempotent; replay-prone callers
    (foreachBatch) must use ``append_epoch_to_ann_index`` instead."""
    spark = new_vectors.sparkSession
    meta = read_ann_meta(spark, index_dir)
    codes = _encode_frozen(new_vectors, meta, vec_col, id_col,
                           "append_to_ann_index")
    codes.write.mode("append").partitionBy("cent_id").parquet(
        url_join(index_dir, "codes")
    )


def append_epoch_to_ann_index(new_vectors: DataFrame, index_dir: str,
                              epoch_id: int, vec_col: str = "embedding",
                              id_col: str = "vec_id",
                              validate: bool = True,
                              meta: dict | None = None) -> None:
    """Replay-safe streaming append: the batch's codes are encoded with
    the frozen codebooks and OVERWRITE ``codes_epochs/epoch={id}/`` —
    the same epoch-keyed idempotence contract as the corpus builder's
    other indexes, so an at-least-once foreachBatch replay converges
    instead of duplicating codes. Cell partitioning (and so query-time
    pruning) is preserved inside each epoch directory. ``validate=False``
    is for callers that already filtered null/wrong-dim embeddings
    (CorpusSink does) — it saves one Spark job per micro-batch. Such
    callers must pass the SAME ``meta`` their pre-filter used: re-reading
    meta here could pick up a concurrent retrain with a different dim, and
    with validation off the stale-filtered vectors would encode into
    garbage codes silently."""
    spark = new_vectors.sparkSession
    if meta is None:
        meta = read_ann_meta(spark, index_dir)
    codes = _encode_frozen(new_vectors, meta, vec_col, id_col,
                           "append_epoch_to_ann_index", validate=validate)
    codes.write.mode("overwrite").partitionBy("cent_id").parquet(
        url_join(index_dir, "codes_epochs", f"epoch={int(epoch_id)}")
    )


def recover_ann_compact(fs: HadoopFS, index_dir: str) -> str | None:
    """Repair a crashed compact_ann_epochs via the shared write-ahead
    protocol (``foldswap.recover_fold``): a ``_compact`` WITH its manifest
    finished writing — re-run its commit; one WITHOUT never committed
    (sources intact) — drop it."""
    ep_root = url_join(index_dir, "codes_epochs")
    if not fs.exists(ep_root):
        return None
    return recover_fold(fs, ep_root, "_compact")


def compact_ann_epochs(spark: SparkSession, index_dir: str,
                       min_epochs: int = 2) -> bool:
    """Fold per-batch code appends into one ``epoch=-1`` dir (still
    cell-partitioned, so query pruning is unchanged) — bounds the
    O(epochs) listing a long-running corpus stream accumulates. Run ONLY
    against a stopped stream; like the corpus index compaction, the
    HIGHEST-numbered epoch is never folded (a crashed batch's replay
    relies on overwriting its own epoch dir BY NAME — folding it first
    would leave its first attempt's codes in epoch=-1 AND the replayed
    dir, double-counting every vector)."""
    fs = HadoopFS(spark, index_dir)
    recover_ann_compact(fs, index_dir)
    ep_root = url_join(index_dir, "codes_epochs")
    if not fs.exists(ep_root):
        return False
    epochs = sorted(e for e in fs.listdir(ep_root) if e.startswith("epoch="))
    numbered = [e for e in epochs if int(e.split("=", 1)[1]) >= 0]
    if numbered:
        trailing = max(numbered, key=lambda e: int(e.split("=", 1)[1]))
        epochs = [e for e in epochs if e != trailing]
    # skip data-less epoch dirs (batches that admitted nothing embeddable)
    with_data = [
        e for e in epochs
        if any(c.startswith("cent_id=") for c in fs.listdir(url_join(ep_root, e)))
    ]
    if len(epochs) < min_epochs:
        return False
    tmp = url_join(ep_root, "_compact")
    if with_data:
        merged = spark.read.option("basePath", ep_root).parquet(
            *[url_join(ep_root, e) for e in with_data]
        ).drop("epoch")
        merged.write.mode("overwrite").partitionBy("cent_id").parquet(tmp)
    else:
        fs.mkdirs(tmp)
    write_fold_manifest(fs, tmp, epochs)
    commit_fold(fs, ep_root, "_compact", epochs)
    return True


def ann_topk(spark: SparkSession, index_dir: str, queries: DataFrame,
             k: int = 5, nprobe: int = 4,
             exclude_self: bool = True) -> DataFrame:
    """Approximate top-k against the persisted index: resolve the probed
    cells driver-side from the (tiny) query set, scan ONLY those cells'
    partitions, ADC-score, rank per query. Output matches the in-memory
    ANN operators: (q_id, neighbor_id, rank).

    ``exclude_self`` (default True, the neighbor-search contract) drops
    candidates whose vec_id equals the probe's q_id. RETRIEVAL callers
    pass False: there a q_id is a query-table key, not a corpus member,
    and an accidental id collision must not silently suppress a hit
    (similarity.retrieve_hybrid_indexed's ANN list)."""
    from pyspark.sql.window import Window

    meta = read_ann_meta(spark, index_dir)
    cents = [(int(c), list(v)) for c, v in meta["centroids"]]
    m = meta["m"]
    cbs = meta["codebooks"]
    dsub = meta["dim"] // m
    if meta.get("rotation") is not None:
        # probes enter the OPQ index's rotated space before cell
        # assignment — the one extra map-only step a rotated index costs
        # at query time (ADC tables and codes are unchanged shapes)
        queries = queries.select(
            "q_id", rotate_expr("q_vec", meta["rotation"]).alias("q_vec")
        )
    probes = _nearest_centroid(
        queries, cents, "q_vec", keep=["q_id", "q_vec"], nprobe=nprobe
    )
    q_expr = F.col("q_vec").cast("array<double>")
    if meta["residual"]:
        q_expr = _residual(q_expr, _centroid_lookup(cents)(F.col("cent_id")))
    assert len(cbs[0][0]) == dsub
    probes = probes.select(
        "q_id", F.col("cent_id").alias("p_cent"),
        _adc_table(q_expr, cbs).alias("dt"),
    )
    # driver-side cell resolution: nprobe x |queries| ids — a STATIC
    # partition filter the scan prunes on, never a full-index listing
    cells = sorted({r.p_cent for r in probes.select("p_cent").distinct().collect()})
    codes = spark.read.parquet(url_join(index_dir, "codes"))
    # streaming appends (append_epoch_to_ann_index) live beside the base
    # build, epoch-keyed; each epoch dir is cell-partitioned so the same
    # static isin prunes it — index freshness == corpus freshness without
    # a rebuild
    fs = HadoopFS(spark, index_dir)
    ep_root = url_join(index_dir, "codes_epochs")
    if fs.exists(ep_root):

        def _epoch_frames() -> list[DataFrame]:
            """One snapshot of the streaming appends. STRICTLY NON-MUTATING
            and tolerant of an in-flight compact_ann_epochs, with the same
            two guards read_rollup uses: a _compact WITH its manifest is a
            finished merge whose sources may be partially deleted — read it
            and exclude the epochs it names; one WITHOUT a manifest is an
            unfinished write — ignore it. The manifest is RE-CHECKED after
            the listing (TOCTOU: the compactor can land the manifest and
            delete sources between the two calls — the one-check version
            would see neither); on a flip the snapshot is retaken, and the
            last attempt completes unconditionally because the eager read
            below retries once on paths deleted mid-scan."""
            tmp = url_join(ep_root, "_compact")
            manifest = url_join(tmp, _EP_MANIFEST)
            for attempt in range(3):
                had_manifest = fs.exists(manifest)
                excluded: set[str] = set()
                extra: list[DataFrame] = []
                if had_manifest:
                    excluded = set(json.loads(fs.read_bytes(manifest))["sources"])
                    if any(c.startswith("cent_id=") for c in fs.listdir(tmp)):
                        extra.append(spark.read.parquet(tmp))
                listing = fs.listdir(ep_root)
                if attempt < 2 and fs.exists(manifest) != had_manifest:
                    continue  # compactor raced the scan: retake the snapshot
                # an epoch whose batch admitted no embeddable docs stages an
                # empty dir (no cent_id= partitions) — skip those or schema
                # inference fails
                ep_dirs = [
                    url_join(ep_root, e)
                    for e in listing
                    if e.startswith("epoch=") and e not in excluded and any(
                        c.startswith("cent_id=")
                        for c in fs.listdir(url_join(ep_root, e))
                    )
                ]
                if ep_dirs:
                    extra.append(
                        spark.read.option("basePath", ep_root).parquet(*ep_dirs)
                        .drop("epoch")
                    )
                return extra
            return []

        try:
            frames = _epoch_frames()
        except Exception:
            frames = _epoch_frames()  # commit completed mid-scan: re-resolve
        for ep in frames:
            codes = codes.unionByName(ep.select(*codes.columns))
    if not cells:  # no queries: an empty ranked frame, not an IN () error
        from pyspark.sql import types as T

        return spark.createDataFrame(
            [],
            T.StructType([
                T.StructField("q_id", queries.schema["q_id"].dataType),
                T.StructField("neighbor_id", codes.schema["vec_id"].dataType),
                T.StructField("rank", T.IntegerType()),
            ]),
        )
    codes = codes.where(F.col("cent_id").isin(cells))
    cond = codes.cent_id == probes.p_cent
    if exclude_self:
        cond = cond & (codes.vec_id != probes.q_id)
    joined = codes.join(F.broadcast(probes), cond)
    scored = (
        joined.select("q_id", "vec_id", _adc_score(m).alias("adc"))
        .dropDuplicates(["q_id", "vec_id"])
    )
    # the pq_topk null rule: corrupt probes score null against every row
    # (corpus-side corruption never reaches the index — pq_encode drops
    # null / wrong-dimension / null-element vectors at build time)
    w = Window.partitionBy("q_id").orderBy(
        F.col("adc").asc_nulls_last(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter((F.col("rank") <= k) & F.col("adc").isNotNull())
        .select("q_id", F.col("vec_id").alias("neighbor_id"), "rank")
    )
