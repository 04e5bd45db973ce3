"""Persisted IVF-PQ index: build -> query parity with the in-memory
composition, physical partition pruning, and frozen-codebook appends."""

import math

from pyspark.sql import functions as F

from substreams_sink_parquet_spark.llm import ann_index as A
from substreams_sink_parquet_spark.llm import similarity as S
from substreams_sink_parquet_spark.tables import load


def _queries(emb):
    return emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )


def test_persisted_index_matches_in_memory_ivfpq(spark, sf_dir, tmp_path):
    """Same deterministic training inputs => the persisted index must
    return exactly the in-memory ivfpq_topk results."""
    emb = load(spark, sf_dir, "embeddings")
    dim = S.embedding_dim(spark, sf_dir)
    idx = str(tmp_path / "ann")
    A.write_ann_index(emb, idx, dim=dim)
    qs = _queries(emb)
    persisted = {(r.q_id, r.neighbor_id, r.rank)
                 for r in A.ann_topk(spark, idx, qs, k=5).collect()}
    memory = {(r.q_id, r.neighbor_id, r.rank)
              for r in S.ivfpq_topk(emb, qs, dim=dim, k=5).collect()}
    assert persisted == memory


def test_query_scans_only_probed_cell_partitions(spark, sf_dir, tmp_path):
    """The point of the layout: the codes scan must carry a STATIC
    partition filter of exactly the probed cells (cent_id IN (...)), so
    unprobed cells' files never enter the plan."""
    import re

    emb = load(spark, sf_dir, "embeddings")
    dim = S.embedding_dim(spark, sf_dir)
    idx = str(tmp_path / "ann")
    A.write_ann_index(emb, idx, dim=dim)
    one_q = _queries(emb).limit(1)
    res = A.ann_topk(spark, idx, one_q, k=3, nprobe=2)
    fmt = res._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    m = re.search(r"PartitionFilters: \[cent_id#\d+ IN \(([^)]+)\)", fmt)
    assert m, fmt
    assert len(m.group(1).split(",")) <= 2  # nprobe=2 => at most two cells


def test_append_encodes_with_frozen_codebooks_and_is_searchable(spark, tmp_path):
    """New vectors appended with the frozen quantizer land in the right
    cells and become nearest neighbors of a matching query, without any
    retrain; metadata is unchanged."""
    dim = 8
    base = [
        (i, [float(math.cos(i)), float(math.sin(i))] + [0.1 * j for j in range(6)])
        for i in range(64)
    ]
    emb = spark.createDataFrame(base, "vec_id long, embedding array<float>")
    idx = str(tmp_path / "ann")
    meta_before = A.write_ann_index(emb, idx, dim=dim, n_centroids=4, m=4)
    planted = spark.createDataFrame(
        [(999, [2.0, 0.1, 0.2, 0.1, 0.3, 0.1, 0.2, 0.4])],
        "vec_id long, embedding array<float>",
    )
    A.append_to_ann_index(planted, idx)
    assert A.read_ann_meta(spark, idx) == meta_before  # frozen
    probe = spark.createDataFrame(
        [(777, [2.0, 0.1, 0.2, 0.1, 0.3, 0.1, 0.2, 0.4])],
        "q_id long, q_vec array<float>",
    )
    # coarse 4x16 codes can tie the planted vector with same-code cluster
    # mates (ADC sees codes, not raw vectors; ties break to the lower id),
    # so pin top-k MEMBERSHIP, which already proves the append is indexed
    # in the right cell and scored
    got = A.ann_topk(spark, idx, probe, k=3, nprobe=2).collect()
    assert 999 in {r.neighbor_id for r in got}


def test_edge_cases_empty_queries_and_oversized_nprobe(spark, tmp_path):
    """No queries => empty ranked frame with the contract schema (not an
    IN () planning error); nprobe > n_centroids degrades to probing every
    cell, equivalent to full-scan PQ over the same codes."""
    base = [(i, [float(i % 7), float((i * 3) % 5), 1.0, -0.5]) for i in range(40)]
    emb = spark.createDataFrame(base, "vec_id long, embedding array<float>")
    idx = str(tmp_path / "ann")
    A.write_ann_index(emb, idx, dim=4, n_centroids=4, m=2, n_codes=8)
    empty_q = spark.createDataFrame([], "q_id long, q_vec array<float>")
    res = A.ann_topk(spark, idx, empty_q, k=5)
    assert res.columns == ["q_id", "neighbor_id", "rank"] and res.count() == 0
    one_q = spark.createDataFrame(
        [(0, base[0][1])], "q_id long, q_vec array<float>"
    )
    wide = A.ann_topk(spark, idx, one_q, k=3, nprobe=99).collect()
    assert len(wide) == 3 and all(r.q_id == 0 for r in wide)


def test_corpus_stream_appends_are_searchable_and_replay_safe(spark, tmp_path):
    """VERDICT r5 #4: docs admitted by the streaming corpus builder are
    findable via ann_topk WITHOUT a rebuild (frozen-codebook epoch append),
    and an at-least-once replay of the same epoch does not double-insert
    codes; an epoch with no embeddable docs leaves the index readable."""
    from substreams_sink_parquet_spark.streaming.corpus_stream import CorpusSink

    dim = 8
    base = [
        (i, [float(math.cos(i)), float(math.sin(i))] + [0.1 * j for j in range(6)])
        for i in range(64)
    ]
    emb = spark.createDataFrame(base, "vec_id long, embedding array<float>")
    idx = str(tmp_path / "ann")
    A.write_ann_index(emb, idx, dim=dim, n_centroids=4, m=4)

    ddl = ("doc_id long, text string, lang string, source string, "
           "n_chars long, embedding array<float>, _corrupt_line string")
    # modestly outside the base ring: quantizes to its own code (same shape
    # as test_append_encodes_with_frozen_codebooks_and_is_searchable — a
    # far-out plant would tie extreme codes and lose id-order tie-breaks)
    planted = [2.0, 0.1, 0.2, 0.1, 0.3, 0.1, 0.2, 0.4]
    out = str(tmp_path / "corpus")
    sink = CorpusSink(spark=spark, out_dir=out, ann_index_dir=idx)
    batch = spark.createDataFrame(
        [
            (1001, "planted doc with a distinctive embedding", "en", "w",
             40, planted, None),
            (1002, "doc without an embedding", "en", "w", 24, None, None),
        ],
        ddl,
    )
    sink.process_batch(batch, 0)

    probe = spark.createDataFrame(
        [(1, planted)], "q_id long, q_vec array<float>"
    )
    got = A.ann_topk(spark, idx, probe, k=3, nprobe=2).collect()
    assert 1001 in {r.neighbor_id for r in got}  # fresh without rebuild

    ep_root = str(tmp_path / "ann" / "codes_epochs")
    n_codes = spark.read.parquet(ep_root).count()
    sink.process_batch(batch, 0)  # crash replay of the same epoch
    assert spark.read.parquet(ep_root).count() == n_codes  # no double insert

    # an epoch admitting nothing embeddable must not corrupt the read path
    sink.process_batch(
        spark.createDataFrame(
            [(1003, "another embedding-less doc", "en", "w", 26, None, None)],
            ddl,
        ),
        1,
    )
    still = A.ann_topk(spark, idx, probe, k=3, nprobe=2).collect()
    assert 1001 in {r.neighbor_id for r in still}


def test_corpus_stream_requires_prebuilt_index(spark, tmp_path):
    from substreams_sink_parquet_spark.streaming.corpus_stream import CorpusSink

    import pytest

    with pytest.raises(ValueError, match="ann-build"):
        CorpusSink(spark=spark, out_dir=str(tmp_path / "c"),
                   ann_index_dir=str(tmp_path / "missing"))


def test_rebuild_crash_fails_loudly_and_rebuild_recovers(spark, tmp_path):
    """ADVICE r4: meta is the commit marker — a crash between the meta
    delete and the codes overwrite leaves an index every read path refuses
    (no silent decode of new codes against old codebooks); a completed
    rebuild recovers and supersedes stale epoch appends."""
    import pytest

    base = [(i, [float(i % 7), float((i * 3) % 5), 1.0, -0.5]) for i in range(64)]
    emb = spark.createDataFrame(base, "vec_id long, embedding array<float>")
    idx = str(tmp_path / "ann")
    A.write_ann_index(emb, idx, dim=4, n_centroids=4, m=2, n_codes=8)
    A.append_epoch_to_ann_index(
        spark.createDataFrame([(900, [9.0, -9.0, 9.0, -9.0])],
                              "vec_id long, embedding array<float>"),
        idx, 0,
    )

    # simulate the crash window: meta deleted, codes half-overwritten
    import os
    os.remove(os.path.join(idx, "_ANN_META.json"))
    probe = spark.createDataFrame(
        [(1, [1.0, 1.0, 1.0, 1.0])], "q_id long, q_vec array<float>"
    )
    # loud AND actionable: the family contract names the builder, not an
    # opaque Java FileNotFoundException from the raw open (code review r12)
    with pytest.raises(FileNotFoundError, match="rebuild before querying"):
        A.ann_topk(spark, idx, probe, k=3)  # loud, not garbage neighbors

    # completed rebuild: meta restored, stale epoch appends cleared
    A.write_ann_index(emb, idx, dim=4, n_centroids=4, m=2, n_codes=8)
    assert not os.path.exists(os.path.join(idx, "codes_epochs"))
    res = A.ann_topk(spark, idx, probe, k=3).collect()
    assert len(res) == 3 and all(r.neighbor_id != 900 for r in res)


def test_compact_ann_epochs_preserves_results_and_trailing_epoch(spark, tmp_path):
    """Folding per-batch code appends into epoch=-1 must not change query
    results; the trailing epoch survives by name (its replay overwrites it);
    a crashed manifest-less _compact is dropped, a manifested one commits."""
    import json
    import os

    base = [
        (i, [float(math.cos(i)), float(math.sin(i))] + [0.1 * j for j in range(6)])
        for i in range(64)
    ]
    emb = spark.createDataFrame(base, "vec_id long, embedding array<float>")
    idx = str(tmp_path / "ann")
    A.write_ann_index(emb, idx, dim=8, n_centroids=4, m=4)
    for ep, vid in ((0, 900), (1, 901), (2, 902)):
        A.append_epoch_to_ann_index(
            spark.createDataFrame(
                [(vid, [2.0 + 0.01 * ep, 0.1, 0.2, 0.1, 0.3, 0.1, 0.2, 0.4])],
                "vec_id long, embedding array<float>",
            ),
            idx, ep,
        )
    probe = spark.createDataFrame(
        [(1, [2.0, 0.1, 0.2, 0.1, 0.3, 0.1, 0.2, 0.4])],
        "q_id long, q_vec array<float>",
    )
    before = {(r.neighbor_id, r.rank)
              for r in A.ann_topk(spark, idx, probe, k=5, nprobe=2).collect()}

    assert A.compact_ann_epochs(spark, idx)
    ep_root = os.path.join(idx, "codes_epochs")
    dirs = sorted(d for d in os.listdir(ep_root) if d.startswith("epoch="))
    assert dirs == ["epoch=-1", "epoch=2"]  # trailing epoch kept by name
    after = {(r.neighbor_id, r.rank)
             for r in A.ann_topk(spark, idx, probe, k=5, nprobe=2).collect()}
    assert after == before

    # crashed manifest-less _compact: dropped, sources intact
    os.makedirs(os.path.join(ep_root, "_compact", "cent_id=0"))
    from substreams_sink_parquet_spark.fsio import HadoopFS
    fs = HadoopFS(spark, idx)
    assert A.recover_ann_compact(fs, idx) == "dropped"
    assert {(r.neighbor_id, r.rank)
            for r in A.ann_topk(spark, idx, probe, k=5, nprobe=2).collect()} == before


def test_failed_rebuild_leaves_old_index_serving(spark, tmp_path):
    """A rebuild that FAILS during training (bad input) must not touch the
    existing index: meta, codes, and streaming appends all survive and
    queries keep serving — only a successful retrain supersedes them."""
    import os

    import pytest

    base = [
        (i, [float(math.cos(i)), float(math.sin(i))] + [0.1 * j for j in range(6)])
        for i in range(64)
    ]
    emb = spark.createDataFrame(base, "vec_id long, embedding array<float>")
    idx = str(tmp_path / "ann")
    A.write_ann_index(emb, idx, dim=8, n_centroids=4, m=4)
    A.append_epoch_to_ann_index(
        spark.createDataFrame(
            [(900, [2.0, 0.1, 0.2, 0.1, 0.3, 0.1, 0.2, 0.4])],
            "vec_id long, embedding array<float>",
        ),
        idx, 0,
    )
    probe = spark.createDataFrame(
        [(1, [2.0, 0.1, 0.2, 0.1, 0.3, 0.1, 0.2, 0.4])],
        "q_id long, q_vec array<float>",
    )
    before = {r.neighbor_id for r in A.ann_topk(spark, idx, probe, k=3).collect()}
    assert 900 in before

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(Exception):
        A.write_ann_index(empty, idx, dim=8, n_centroids=4, m=4)

    assert os.path.exists(os.path.join(idx, "_ANN_META.json"))
    assert os.path.exists(os.path.join(idx, "codes_epochs"))
    after = {r.neighbor_id for r in A.ann_topk(spark, idx, probe, k=3).collect()}
    assert after == before


def test_opq_index_equals_manual_rotation_composition(spark, sf_dir,
                                                      tmp_path):
    """An OPQ index is rotate ∘ plain-index at every entry point: building
    with opq_iters must return EXACTLY what a plain index built over
    manually-rotated vectors returns for manually-rotated queries — which
    pins the rotation's application at build, and at query time, against
    the same deterministic training. Frozen appends then land in the
    rotated space too: an appended exact copy is its query's rank-1
    neighbor through the persisted rotation."""
    emb = load(spark, sf_dir, "embeddings").limit(300)
    dim = S.embedding_dim(spark, sf_dir)
    opq_dir = str(tmp_path / "ann_opq")
    meta = A.write_ann_index(emb, opq_dir, dim=dim, opq_iters=2)
    R = meta["rotation"]
    assert A.read_ann_meta(spark, opq_dir)["rotation"] == R

    rot_emb = emb.select(
        "vec_id", S.rotate_expr("embedding", R).alias("embedding")
    )
    plain_dir = str(tmp_path / "ann_plain_rotated")
    A.write_ann_index(rot_emb, plain_dir, dim=dim)

    qs = _queries(emb)
    got = {(r.q_id, r.neighbor_id, r.rank)
           for r in A.ann_topk(spark, opq_dir, qs, k=5).collect()}
    qs_rot = qs.select("q_id", S.rotate_expr("q_vec", R).alias("q_vec"))
    want = {(r.q_id, r.neighbor_id, r.rank)
            for r in A.ann_topk(spark, plain_dir, qs_rot, k=5).collect()}
    assert got == want and got

    # frozen append rotates like the build did: plant exact copies of
    # vectors 50..53 at +50000, append RAW (the index rotates them), and
    # each original must recover its appended copy at ADC distance 0
    src = emb.filter((F.col("vec_id") >= 50) & (F.col("vec_id") < 54))
    copies = src.select(
        (F.col("vec_id") + 50000).alias("vec_id"), "embedding"
    )
    A.append_to_ann_index(copies, opq_dir)
    probe = src.select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    res = A.ann_topk(spark, opq_dir, probe, k=3)
    top1 = {r.q_id: r.neighbor_id
            for r in res.filter(F.col("rank") == 1).collect()}
    assert top1 == {50: 50050, 51: 50051, 52: 50052, 53: 50053}
