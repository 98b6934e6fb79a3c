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


# --------------------------------------------- rollover trigger (round 13)


def test_monitor_relation_tracks_cell_populations(spark, emb, tmp_path_factory):
    """Each micro-batch appends its per-cell ingest counts; summing them
    reproduces the index's true cell populations without scanning it."""
    root = str(tmp_path_factory.mktemp("semmon"))
    state = sc.SemanticCurationState(os.path.join(root, "state"), threshold=TAU)
    parts = _parts(emb)
    for b, p in enumerate(parts):
        sc.curate_embeddings_batch(state, p, batch_id=b)
    pops = {
        r["cell_id"]: r["population"]
        for r in sc.cell_populations(spark, state).collect()
    }
    truth = {
        r["cell_id"]: r["count"]
        for r in state.index(spark).groupBy("cell_id").count().collect()
    }
    assert pops == truth
    assert sum(pops.values()) == emb.count()
    # batch-keyed like the index (idempotent replay)
    assert state.monitor(spark).select("batch_id").distinct().count() == 3


def test_should_rollover_policy(spark, emb, tmp_path_factory, monkeypatch):
    """The trigger is pure data: roll iff the hottest cell's population
    crosses roll_factor x TARGET_CELL_POP; the suggested n_cells
    re-centers cells on the design population."""
    monkeypatch.setattr(sc, "TARGET_CELL_POP", 10)
    root = str(tmp_path_factory.mktemp("semtrig"))
    state = sc.SemanticCurationState(os.path.join(root, "state"), threshold=TAU)
    # empty state: never roll
    v0 = sc.should_rollover(spark, state)
    assert v0 == {
        "roll": False, "hottest_pop": 0, "total": 0,
        "threshold": 40, "suggested_n_cells": 8,
    }
    parts = _parts(emb)
    sc.curate_embeddings_batch(state, parts[0], batch_id=0)
    v1 = sc.should_rollover(spark, state)  # hottest 27 < 40 (calibrated)
    assert v1["roll"] is False and v1["hottest_pop"] < v1["threshold"]
    sc.curate_embeddings_batch(state, parts[1], batch_id=1)
    v2 = sc.should_rollover(spark, state)  # hottest 53 >= 40
    assert v2["roll"] is True and v2["hottest_pop"] >= v2["threshold"]
    assert v2["total"] == 334
    assert v2["suggested_n_cells"] == max(16, -(-334 // 10))


def test_generations_driver_rolls_at_boundary_and_stays_exact(
    spark, emb, tmp_path_factory, monkeypatch
):
    """VERDICT r12 task 2 'done': the loop ITSELF flags and performs the
    rollover at the measured boundary — one checkpoint spans generations
    (no file re-ingestion, ids keep ascending past the carried
    batch_id=-1), carried decisions are bit-identical, and post-rollover
    decisions equal batch SemDeDup over the new generation's cells."""
    monkeypatch.setattr(sc, "TARGET_CELL_POP", 10)  # threshold 40
    root = str(tmp_path_factory.mktemp("semgen"))
    src = os.path.join(root, "incoming")
    os.makedirs(src)
    base = os.path.join(root, "gens")
    ckpt = os.path.join(root, "ckpt")
    parts = _parts(emb)
    kw = dict(threshold=TAU, n_cells=8, max_files_per_trigger=1)

    # wave 1: hottest 27 < 40 — no boundary
    _drop(src, 0, parts[0], root)
    state, log = sc.run_semantic_curation_generations(spark, src, base, ckpt, **kw)
    assert [v["roll"] for v in log] == [False]
    assert state.root.endswith("gen0")
    pre_w1 = _decision_set(state.decisions(spark))
    assert len(pre_w1) == parts[0].count()

    # wave 2: cumulative hottest 53 >= 40 — the loop rolls to gen1
    _drop(src, 1, parts[1], root)
    state, log = sc.run_semantic_curation_generations(spark, src, base, ckpt, **kw)
    assert [(v["gen"], v["roll"]) for v in log] == [(0, True), (1, False)]
    assert state.root.endswith("gen1")
    assert state.n_cells == max(16, -(-334 // 10))
    boundary = parts[1].agg(F.max("vec_id")).first()[0]
    # carried decisions bit-identical to the pre-rollover table
    gen0 = sc.SemanticCurationState(os.path.join(base, "gen0"), threshold=TAU)
    assert _decision_set(state.decisions(spark)) == _decision_set(
        gen0.decisions(spark)
    )
    # monitor seeded with the carried corpus: populations = full history
    assert sum(
        r["population"] for r in sc.cell_populations(spark, state).collect()
    ) == 334

    # wave 3 drains into gen1 (resume discovers the active generation)
    _drop(src, 2, parts[2], root)
    state, log = sc.run_semantic_curation_generations(spark, src, base, ckpt, **kw)
    assert state.root.endswith("gen1") and [v["roll"] for v in log] == [False]
    got = _decision_set(state.decisions(spark))
    assert len(got) == emb.count()
    # prefix decisions survived both the rollover and the next wave
    assert _decision_set(gen0.decisions(spark)) <= got
    # post-rollover truth: batch SemDeDup with the NEW centroids over ALL
    # vectors, restricted to post-boundary ids (keep-first only looks at
    # lower ids — old vectors' presence matters, their old labels don't)
    new_cents = state.centroids(spark)
    want_post = _decision_set(
        similarity.semantic_dedup(
            emb, threshold=TAU, centroids=new_cents
        ).filter(F.col("vec_id") > boundary)
    )
    assert {t for t in got if t[0] > boundary} == want_post


def test_generations_driver_ignores_half_written_rollover(
    spark, emb, tmp_path_factory, monkeypatch
):
    """Crash window: a rollover that died mid-write leaves gen1 partially
    on disk. The resume discovery keys on rollover's LAST artifact (the
    monitor seed's _GEN marker), so a half-written target is ignored —
    the loop stays on gen0, the trigger re-fires on the same monitor
    data, and the rollover re-runs as a deterministic overwrite."""
    monkeypatch.setattr(sc, "TARGET_CELL_POP", 10)  # threshold 40
    root = str(tmp_path_factory.mktemp("semgencrash"))
    src = os.path.join(root, "incoming")
    os.makedirs(src)
    base = os.path.join(root, "gens")
    ckpt = os.path.join(root, "ckpt")
    parts = _parts(emb)
    kw = dict(threshold=TAU, n_cells=8, max_files_per_trigger=1)

    # drain waves 1+2 in one call with rollover SABOTAGED mid-flight:
    # kill the run right after centroids land (before index/decisions/
    # monitor) by making the index write fail once
    _drop(src, 0, parts[0], root)
    _drop(src, 1, parts[1], root)
    real_rollover = sc.rollover_generation

    def crashing_rollover(spark_, state, new_root, **kwargs):
        # replicate the crash: write ONLY the centroid set, then die
        vecs = state.index(spark_).select(state.id_col, state.vec_col)
        from clickhouse_provider_spark.operators import similarity as S

        S.ivf_train_centroids(
            vecs, kwargs["n_cells_new"], iters=kwargs.get("iters", 3),
            seed="ivf-gen", id_col=state.id_col, vec_col=state.vec_col,
        ).select("cell_id", "centroid").write.mode("overwrite").parquet(
            os.path.join(new_root, "centroids")
        )
        raise RuntimeError("rollover crashed mid-write")

    monkeypatch.setattr(sc, "rollover_generation", crashing_rollover)
    with pytest.raises(RuntimeError, match="rollover crashed"):
        sc.run_semantic_curation_generations(spark, src, base, ckpt, **kw)
    assert os.path.isdir(os.path.join(base, "gen1", "centroids"))
    assert not os.path.exists(
        os.path.join(base, "gen1", "monitor", "batch_id=-1", "_GEN")
    )

    # restart with the real rollover: discovery must stay on gen0 (the
    # half-written gen1 is invisible), the trigger re-fires, and the
    # rollover overwrite completes
    monkeypatch.setattr(sc, "rollover_generation", real_rollover)
    state, log = sc.run_semantic_curation_generations(spark, src, base, ckpt, **kw)
    assert state.root.endswith("gen1")
    assert [(v["gen"], v["roll"]) for v in log] == [(0, True), (1, False)]
    # everything the new generation needs is now present and consistent
    assert os.path.exists(
        os.path.join(base, "gen1", "monitor", "batch_id=-1", "_GEN")
    )
    gen0 = sc.SemanticCurationState(os.path.join(base, "gen0"), threshold=TAU)
    assert _decision_set(state.decisions(spark)) == _decision_set(
        gen0.decisions(spark)
    )


def test_batch_compare_volume_relation(spark, emb, tmp_path_factory):
    """The monitor's second face: per-batch prior-compare volume equals
    the independent recomputation sum_c new_b(c) * pop_<b(c)."""
    root = str(tmp_path_factory.mktemp("semvol"))
    state = sc.SemanticCurationState(os.path.join(root, "state"), threshold=TAU)
    parts = _parts(emb)
    for b, p in enumerate(parts):
        sc.curate_embeddings_batch(state, p, batch_id=b)
    got = {
        r["batch_id"]: r["compare_pairs"]
        for r in sc.batch_compare_volume(spark, state).collect()
    }
    mon = [
        (r["batch_id"], r["cell_id"], r["n_new"])
        for r in state.monitor(spark).collect()
    ]
    pops: dict[int, int] = {}
    want: dict[int, int] = {}
    for b in sorted({m[0] for m in mon}):
        vol = 0
        for _, c, n in [m for m in mon if m[0] == b]:
            vol += n * pops.get(c, 0)
        want[b] = vol
        for _, c, n in [m for m in mon if m[0] == b]:
            pops[c] = pops.get(c, 0) + n
    assert got == want
    assert got[0] == 0 and got[2] > got[1] > 0  # grows at fixed cells
