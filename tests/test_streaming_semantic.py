"""Continuous semantic-curation stream (streaming/semantic_curation.py):
after draining any prefix of the embedding stream, the persisted decision
table must equal batch semantic_dedup over every vector ingested so far
(given the frozen first-batch centroids) — the streaming path IS the
batch path, maintained incrementally, and decisions are append-only (the
keep-first rule only compares against lower ids, which the monotone-id
ingest contract makes history)."""

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from clickhouse_provider_spark.operators import similarity
from clickhouse_provider_spark.streaming import semantic_curation as sc

TAU = 0.3


@pytest.fixture(scope="module")
def emb(spark):
    from clickhouse_provider_spark.session import load_tables

    return load_tables(spark, "/root/testdata/sf0.001")["embeddings"].select(
        "vec_id", "embedding"
    )


def _parts(emb):
    """Monotone-id prefix split (the ingest contract): later batches carry
    strictly higher vec_ids."""
    return [
        emb.filter(F.col("vec_id") < 167),
        emb.filter((F.col("vec_id") >= 167) & (F.col("vec_id") < 334)),
        emb.filter(F.col("vec_id") >= 334),
    ]


def _first_batch_centroids(parts):
    return similarity.ivf_train_centroids(parts[0], 8, iters=0).select(
        "cell_id", "centroid"
    )


def _batch_truth(emb_so_far, cents):
    return similarity.semantic_dedup(
        emb_so_far, threshold=TAU, centroids=cents
    )


def _decision_set(df):
    return {
        (r["vec_id"], r["cell_id"], r["cos_to_centroid"], r["is_dropped"])
        for r in df.collect()
    }


def _drop(src, i, p, root):
    d = os.path.join(root, f"stage_{i}")
    p.coalesce(1).write.parquet(d)
    f = glob.glob(os.path.join(d, "*.parquet"))[0]
    shutil.move(f, os.path.join(src, f"batch_{i}.parquet"))
    shutil.rmtree(d)


def test_streaming_semantic_equals_batch(spark, emb, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("semcur"))
    src = os.path.join(root, "incoming")
    os.makedirs(src)
    parts = _parts(emb)
    for i, p in enumerate(parts):
        _drop(src, i, p, root)

    q = sc.run_semantic_curation(
        spark,
        src,
        state_root=os.path.join(root, "state"),
        checkpoint=os.path.join(root, "ckpt"),
        threshold=TAU,
        max_files_per_trigger=1,
    )
    q.awaitTermination()

    state = sc.SemanticCurationState(os.path.join(root, "state"), threshold=TAU)
    got = _decision_set(state.decisions(spark))
    want = _decision_set(_batch_truth(emb, _first_batch_centroids(parts)))
    assert got == want
    # the fixture must exercise both outcomes
    assert any(d for (_, _, _, d) in got) and any(not d for (_, _, _, d) in got)
    # the cell index really is batch-keyed and cell-partitioned
    idx = spark.read.parquet(state.index_path)
    assert set(idx.columns) == {"vec_id", "embedding", "batch_id", "cell_id"}
    assert idx.select("batch_id").distinct().count() == 3


def test_streaming_semantic_resume_midstream(spark, emb, tmp_path_factory):
    """Drain one file, stop, add two more, resume from the checkpoint:
    decisions already made must be byte-stable (append-only — the resumed
    stream may not revise them) and the final table equals batch truth."""
    root = str(tmp_path_factory.mktemp("semcur_resume"))
    src = os.path.join(root, "incoming")
    os.makedirs(src)
    parts = _parts(emb)
    _drop(src, 0, parts[0], root)
    kw = dict(
        state_root=os.path.join(root, "state"),
        checkpoint=os.path.join(root, "ckpt"),
        threshold=TAU,
        max_files_per_trigger=1,
    )
    sc.run_semantic_curation(spark, src, **kw).awaitTermination()
    state = sc.SemanticCurationState(os.path.join(root, "state"), threshold=TAU)
    cents = _first_batch_centroids(parts)
    got0 = _decision_set(state.decisions(spark))
    assert got0 == _decision_set(_batch_truth(parts[0], cents))

    _drop(src, 1, parts[1], root)
    _drop(src, 2, parts[2], root)
    sc.run_semantic_curation(spark, src, **kw).awaitTermination()
    got = _decision_set(state.decisions(spark))
    assert got == _decision_set(_batch_truth(emb, cents))
    assert got0 <= got  # prefix decisions survived unrevised


def test_semantic_batch_replay_is_idempotent(spark, emb, tmp_path_factory):
    """foreachBatch is at-least-once: re-running the SAME batch after its
    writes succeeded must leave decisions, index, and centroids identical
    AS BAGS (batch-keyed overwrites can't accumulate duplicates)."""
    root = str(tmp_path_factory.mktemp("semcur_replay"))
    state = sc.SemanticCurationState(os.path.join(root, "state"), threshold=TAU)
    parts = _parts(emb)
    sc.curate_embeddings_batch(state, parts[0], batch_id=0)
    sc.curate_embeddings_batch(state, parts[1], batch_id=1)

    def snapshot():
        dec = state.decisions(spark).collect()
        return (
            sorted(
                (r["vec_id"], r["cell_id"], r["cos_to_centroid"], r["is_dropped"])
                for r in dec
            ),
            len(dec),  # bag size: duplicate rows would inflate this
            spark.read.parquet(state.index_path).count(),
            sorted(
                (r["cell_id"], tuple(r["centroid"]))
                for r in state.centroids(spark).collect()
            ),
        )

    first = snapshot()
    sc.curate_embeddings_batch(state, parts[1], batch_id=1)
    assert snapshot() == first
    ingested = parts[0].unionByName(parts[1])
    assert first[1] == ingested.count()  # exactly one decision per vector
    want = _decision_set(_batch_truth(ingested, _first_batch_centroids(parts)))
    assert set(first[0]) == want


def test_semantic_batch_releases_caches(spark, emb, tmp_path_factory):
    """ADVICE r10 cache-lifecycle contract: every persist a micro-batch
    registers is unpersisted before curate_embeddings_batch returns."""
    root = str(tmp_path_factory.mktemp("semcur_caches"))
    state = sc.SemanticCurationState(os.path.join(root, "state"), threshold=TAU)
    for b, part in enumerate(_parts(emb)[:2]):
        track = sc.curate_embeddings_batch(state, part, batch_id=b)
        assert track, "batch must register (and release) cache handles"
        for df in track:
            lvl = df.storageLevel
            assert not (lvl.useMemory or lvl.useDisk or lvl.useOffHeap), (
                f"batch {b} left a persisted relation behind: {lvl}"
            )
