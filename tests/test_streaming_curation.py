"""Continuous-curation stream (streaming/curation.py): after draining any
prefix of the document stream, the persisted label table must equal batch
dedup_survivors over every document ingested so far — the streaming path
IS the batch path, maintained incrementally."""

import os

import pytest
from pyspark.sql import functions as F

from clickhouse_provider_spark.operators import dedup
from clickhouse_provider_spark.streaming import curation


@pytest.fixture(scope="module")
def docs(spark):
    from clickhouse_provider_spark.session import load_tables

    return load_tables(spark, "/root/testdata/sf0.001")["documents"]


def _batch_truth(docs_so_far):
    cand = dedup.lsh_candidate_pairs(dedup.minhash_signatures(docs_so_far))
    pairs = dedup.jaccard_pairs(docs_so_far, pairs=cand, threshold=0.1).select(
        "doc_a", "doc_b"
    )
    return dedup.dedup_survivors(docs_so_far, pairs).select(
        "doc_id", F.col("survivor_doc_id").alias("component_id")
    )


def test_streaming_curation_equals_batch(spark, docs, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("curation"))
    src = os.path.join(root, "incoming")
    os.makedirs(src)
    parts = [docs.filter(F.col("doc_id") % 3 == r) for r in range(3)]
    # three drop files → three micro-batches (maxFilesPerTrigger=1)
    for i, p in enumerate(parts):
        p.coalesce(1).write.parquet(os.path.join(src, f"drop_{i}"))
    # the file source lists drop dirs in one pass; feed files, not dirs
    import glob
    import shutil

    for i, d in enumerate(sorted(glob.glob(os.path.join(src, "drop_*")))):
        f = glob.glob(os.path.join(d, "*.parquet"))[0]
        shutil.move(f, os.path.join(src, f"batch_{i}.parquet"))
        shutil.rmtree(d)

    q = curation.run_curation(
        spark,
        src,
        state_root=os.path.join(root, "state"),
        checkpoint=os.path.join(root, "ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination()

    state = curation.CurationState(os.path.join(root, "state"))
    got = {
        (r["doc_id"], r["component_id"])
        for r in state.labels(spark).collect()
    }
    want = {
        (r["doc_id"], r["component_id"]) for r in _batch_truth(docs).collect()
    }
    assert got == want
    # and the index sidecar really is invisible to the band reader
    idx = spark.read.parquet(state.index_path)
    assert set(idx.columns) == {"doc_id", "band_hash", "batch_id", "band_id"}
    assert idx.select("batch_id").distinct().count() == 3


def test_streaming_curation_resume_midstream(spark, docs, tmp_path_factory):
    """Drain one file, stop, add two more, resume from the checkpoint:
    the final labels must still equal the batch truth (state and
    checkpoint survive the restart)."""
    root = str(tmp_path_factory.mktemp("curation_resume"))
    src = os.path.join(root, "incoming")
    os.makedirs(src)
    parts = [docs.filter(F.col("doc_id") % 3 == r) for r in range(3)]
    import glob
    import shutil

    def drop(i, p):
        d = os.path.join(root, f"stage_{i}")
        p.coalesce(1).write.parquet(d)
        f = glob.glob(os.path.join(d, "*.parquet"))[0]
        shutil.move(f, os.path.join(src, f"batch_{i}.parquet"))
        shutil.rmtree(d)

    drop(0, parts[0])
    kw = dict(
        state_root=os.path.join(root, "state"),
        checkpoint=os.path.join(root, "ckpt"),
        max_files_per_trigger=1,
    )
    curation.run_curation(spark, src, **kw).awaitTermination()
    state = curation.CurationState(os.path.join(root, "state"))
    got0 = {
        (r["doc_id"], r["component_id"])
        for r in state.labels(spark).collect()
    }
    want0 = {
        (r["doc_id"], r["component_id"])
        for r in _batch_truth(parts[0]).collect()
    }
    assert got0 == want0

    drop(1, parts[1])
    drop(2, parts[2])
    curation.run_curation(spark, src, **kw).awaitTermination()
    got = {
        (r["doc_id"], r["component_id"])
        for r in state.labels(spark).collect()
    }
    want = {
        (r["doc_id"], r["component_id"]) for r in _batch_truth(docs).collect()
    }
    assert got == want


def test_curate_batch_replay_is_idempotent(spark, docs, tmp_path_factory):
    """Docstring contract: re-running the SAME batch (foreachBatch replay
    after a failure — including AFTER a successful label swap) must leave
    labels, band index, and text sidecar identical AS BAGS, not just as
    sets (ADVICE r10: a bag-union spine used to double every replayed
    doc's label row)."""
    root = str(tmp_path_factory.mktemp("curation_replay"))
    state = curation.CurationState(os.path.join(root, "state"))
    parts = [docs.filter(F.col("doc_id") % 3 == r) for r in range(2)]
    curation.curate_batch(state, parts[0], batch_id=0)
    curation.curate_batch(state, parts[1], batch_id=1)

    def snapshot():
        lab = state.labels(spark).collect()
        idx = spark.read.parquet(state.index_path)
        txt = spark.read.parquet(os.path.join(state.index_path, "_texts"))
        return (
            sorted((r["doc_id"], r["component_id"]) for r in lab),
            len(lab),  # bag size: duplicates would inflate this
            idx.count(),
            txt.count(),
        )

    first = snapshot()
    # replay the LAST batch after its swap already succeeded (the
    # at-least-once window: failure between os.rename and checkpoint
    # commit) — every artifact must be bag-identical afterwards
    curation.curate_batch(state, parts[1], batch_id=1)
    assert snapshot() == first
    ingested = parts[0].unionByName(parts[1])
    assert first[0] == sorted(
        (r["doc_id"], r["component_id"]) for r in _batch_truth(ingested).collect()
    )
    assert first[1] == ingested.count()  # exactly one label row per doc


def test_labels_delta_crash_recovery(spark, docs, tmp_path_factory):
    """Round 14 (labels are batch-keyed deltas — no rename-swap window
    exists anymore): a crash that leaves the NEXT batch's delta dir
    data-file-less must neither wedge the reader (explicit schema; the
    half-write reads as 0 rows) nor corrupt the replayed batch, and the
    resolved labels stay exact through the replay."""
    root = str(tmp_path_factory.mktemp("curation_crash"))
    state = curation.CurationState(os.path.join(root, "state"))
    parts = [docs.filter(F.col("doc_id") % 3 == r) for r in range(2)]
    curation.curate_batch(state, parts[0], batch_id=0)
    before = sorted(
        (r["doc_id"], r["component_id"]) for r in state.labels(spark).collect()
    )
    # crash window: batch 1 died after mkdir, before any parquet commit
    os.makedirs(os.path.join(state.labels_path, "batch_id=1"))
    recovered = sorted(
        (r["doc_id"], r["component_id"]) for r in state.labels(spark).collect()
    )
    assert recovered == before  # the empty dir is invisible, not an error
    # the replayed batch overwrites its own dir and the loop continues
    curation.curate_batch(state, parts[1], batch_id=1)
    ingested = parts[0].unionByName(parts[1])
    got = sorted(
        (r["doc_id"], r["component_id"]) for r in state.labels(spark).collect()
    )
    assert got == sorted(
        (r["doc_id"], r["component_id"]) for r in _batch_truth(ingested).collect()
    )


def test_curate_batch_releases_caches(spark, docs, tmp_path_factory):
    """ADVICE r10 cache lifecycle: every persist() a micro-batch registers
    (batch pin, jaccard candidates + shingles, relabel edge/component
    sets) is unpersisted before curate_batch returns, so a long-running
    stream holds no CacheManager entries between batches."""
    root = str(tmp_path_factory.mktemp("curation_caches"))
    state = curation.CurationState(os.path.join(root, "state"))
    parts = [docs.filter(F.col("doc_id") % 3 == r) for r in range(2)]
    for b, part in enumerate(parts):
        track = curation.curate_batch(state, part, batch_id=b)
        assert track, "batch must register (and release) cache handles"
        for df in track:
            lvl = df.storageLevel
            assert not (lvl.useMemory or lvl.useDisk or lvl.useOffHeap), (
                f"batch {b} left a persisted relation behind: {lvl}"
            )
