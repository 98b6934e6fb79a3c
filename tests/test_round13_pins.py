"""Round-13 pins for the ADVICE r12 fixes: the compaction
crash-after-rename data-loss window (high), degenerate-embedding handling
in the map-side cell argmax (medium), the broadcast centroid matrix
(VERDICT r12 task 5), manifest half-write sweep and parallelized rollover
rewrite (low)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from clickhouse_provider_spark.operators import similarity
from clickhouse_provider_spark.streaming import compaction


def _write_batches(spark, root, n=4, rows_per=10):
    for b in range(n):
        spark.range(b * rows_per, (b + 1) * rows_per).select(
            F.col("id").alias("doc_id")
        ).write.parquet(os.path.join(root, f"batch_id={b}"))


# ------------------------------------------------ compaction crash windows


def test_compaction_crash_after_rename_keeps_promoted_generation(
    spark, tmp_path
):
    """ADVICE r12 (high): the manifest's source list contains
    ``batch_id=<upto>`` — the same NAME the tmp dir is promoted to in
    step 4. A crash between the rename and the manifest delete used to
    make recovery rmtree the freshly PROMOTED generation (tmp gone → the
    rename can't replay → every folded row permanently lost). Recovery
    must recognize 'manifest present + tmp absent' as the post-rename
    state and never delete the target."""
    root = str(tmp_path / "state")
    _write_batches(spark, root)
    # run a real fold to completion (steps 1-5)
    assert compaction.compact_batch_dirs(spark, root, upto=2) == 3
    gen = os.path.join(root, "batch_id=2")
    assert os.path.exists(os.path.join(gen, "_GEN"))
    # simulate the crash window: step 4 done, step 5 (manifest delete)
    # not — recreate the manifest exactly as step 2 wrote it
    with open(os.path.join(root, "_compact_manifest_2.json"), "w") as f:
        json.dump(
            {"upto": 2, "sources": [f"batch_id={b}" for b in range(3)]}, f
        )
    compaction.recover_compaction(root)
    # the promoted generation survives, the manifest is gone, no row lost
    assert os.path.isdir(gen)
    assert not os.path.exists(os.path.join(root, "_compact_manifest_2.json"))
    assert compaction.list_batch_ids(root) == [2, 3]
    df = spark.read.parquet(root)
    assert df.count() == 40
    assert sorted(
        r["doc_id"] for r in df.filter(F.col("batch_id") == 2).collect()
    ) == list(range(30))
    # and a fresh fold over the recovered state still works end-to-end
    assert compaction.compact_batch_dirs(spark, root, upto=3) == 0  # 1 dir


def test_compaction_recovery_is_idempotent_after_rename_crash(
    spark, tmp_path
):
    """recover_compaction may itself crash and re-run: calling it twice
    on the post-rename state must be a no-op the second time."""
    root = str(tmp_path / "state")
    _write_batches(spark, root)
    compaction.compact_batch_dirs(spark, root, upto=2)
    for _ in range(2):
        with open(os.path.join(root, "_compact_manifest_2.json"), "w") as f:
            json.dump(
                {"upto": 2, "sources": [f"batch_id={b}" for b in range(3)]},
                f,
            )
        compaction.recover_compaction(root)
        compaction.recover_compaction(root)
        assert spark.read.parquet(root).count() == 40


def test_compaction_manifest_tmp_orphan_swept(spark, tmp_path):
    """ADVICE r12 (low): a crash between writing
    ``_compact_manifest_<n>.json.tmp`` and its atomic rename used to
    leave the .tmp file forever (the recovery regex only matches the
    final name). The sweep removes it; sources are intact at that point
    so nothing else moves."""
    root = str(tmp_path / "state")
    _write_batches(spark, root, n=2)
    orphan = os.path.join(root, "_compact_manifest_1.json.tmp")
    with open(orphan, "w") as f:
        json.dump({"upto": 1, "sources": ["batch_id=0", "batch_id=1"]}, f)
    compaction.recover_compaction(root)
    assert not os.path.exists(orphan)
    assert compaction.list_batch_ids(root) == [0, 1]
    assert spark.read.parquet(root).count() == 20


# ------------------------------------------- argmax degenerate embeddings


@pytest.fixture()
def cents2(spark):
    return spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "cell_id int, centroid array<double>",
    )


def test_argmax_cell_null_embedding_graceful(spark, cents2):
    """ADVICE r12 (medium): a NULL embedding must degrade exactly like
    the old relational plan — the row is emitted with the lowest cell_id
    and a NULL cosine (the DESC-NULLS-LAST window result) — not crash the
    whole job inside np.stack."""
    emb = spark.createDataFrame(
        [(1, [0.0, 3.0]), (2, None), (3, [5.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: (r["cell_id"], r["cos_to_centroid"])
        for r in similarity._argmax_cell(
            emb, cents2, "vec_id", "embedding"
        ).collect()
    }
    assert got[1] == (1, 1.0)
    assert got[3] == (0, 1.0)
    assert got[2] == (0, None)  # lowest cell_id, NULL cosine
    # same rule as a zero-norm vector (the already-pinned degenerate)
    z = spark.createDataFrame(
        [(9, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    (row,) = similarity._argmax_cell(z, cents2, "vec_id", "embedding").collect()
    assert (row["cell_id"], row["cos_to_centroid"]) == (0, None)


def test_argmax_cell_ragged_vector_raises_clearly(spark, cents2):
    """A wrong-LENGTH vector is a schema violation, not a degradation:
    fail with the dimensions named, not np.stack's opaque shape error."""
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="centroids are 2-dimensional"):
        similarity._argmax_cell(emb, cents2, "vec_id", "embedding").collect()


def test_argmax_cell_centroids_are_broadcast(spark, monkeypatch, cents2):
    """VERDICT r12 task 5: the centroid matrix ships as an explicit
    sparkContext.broadcast (once per executor, ContextCleaner-reclaimed),
    never a task-closure constant — at production n_cells ~1e4-1e5 x
    d=768 the closure would be a 60-600 MB per-task payload."""
    import numpy as np

    calls = []
    orig = spark.sparkContext.broadcast

    def spy(value):
        calls.append(value)
        return orig(value)

    monkeypatch.setattr(spark.sparkContext, "broadcast", spy)
    emb = spark.createDataFrame(
        [(1, [0.0, 3.0]), (2, [5.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    out = similarity._argmax_cell(emb, cents2, "vec_id", "embedding")
    assert len(calls) == 1
    cell_ids, C, cn = calls[0]
    assert list(cell_ids) == [0, 1] and C.shape == (2, 2)
    assert np.allclose(cn, [1.0, 1.0])
    # the broadcast plan computes the same assignments
    got = {r["vec_id"]: r["cell_id"] for r in out.collect()}
    assert got == {1: 1, 2: 0}


# ------------------------------------------------- auto-engaged skew salt


@pytest.fixture(scope="module")
def emb(spark):
    from clickhouse_provider_spark.session import load_tables

    return load_tables(spark, "/root/testdata/sf0.001")["embeddings"].select(
        "vec_id", "embedding"
    )


def test_semantic_dedup_auto_salt_formula():
    """The derived salt is ceil(hottest^2 / budget), clamped to
    [1, AUTO_SALT_MAX] — spelled out so a budget change is a conscious
    recalibration against SCALE_PROBE data, not a drive-by."""
    T = similarity.AUTO_SALT_TARGET_PAIRS
    assert T == 3_000_000
    calc = lambda h: min(  # noqa: E731 — mirror of the operator's clamp
        similarity.AUTO_SALT_MAX, max(1, -(-(h * h) // T))
    )
    assert calc(0) == 1
    assert calc(1_700) == 1  # healthy cell: ~2.9M pairs, below budget
    assert calc(2_312) == 2  # the r12 probe's uniform hottest cell
    assert calc(9_328) == 30  # the r12 probe's hot cell: flat region
    assert calc(1_000_000) == similarity.AUTO_SALT_MAX  # capped


def test_semantic_dedup_auto_salt_exact_and_engaged(spark, emb):
    """VERDICT r12 task 1: with NO manual knob, a skewed corpus gets a
    salted plan (derived from the hottest cell's population) and the
    decision relation is identical to the unsalted plan — the r12
    exactness pin, now exercised through the auto path."""
    hot = emb.filter(F.col("vec_id") < 250)
    donor = hot.orderBy("vec_id").limit(1).select(
        F.col("embedding").alias("_d")
    )
    hot = hot.crossJoin(F.broadcast(donor)).select(
        "vec_id", F.col("_d").alias("embedding")
    )
    skewed = hot.unionByName(emb.filter(F.col("vec_id") >= 250))
    cents = similarity.ivf_train_centroids(skewed, 8, iters=0)

    def decisions(salt):
        return {
            (r["vec_id"], r["cell_id"], r["cos_to_centroid"], r["is_dropped"])
            for r in similarity.semantic_dedup(
                skewed, threshold=0.3, centroids=cents, skew_salt=salt
            ).collect()
        }

    assert decisions(None) == decisions(0)
    # the derivation really engages at scale: shrink the budget so this
    # 500-vector fixture's hot cell (>=250 members -> >=62.5k pairs)
    # crosses it, and assert the salted join keys appear in the plan
    import unittest.mock as mock

    with mock.patch.object(similarity, "AUTO_SALT_TARGET_PAIRS", 10_000):
        auto = similarity.semantic_dedup(
            skewed, threshold=0.3, centroids=cents
        )
        assert decisions(0) == {
            (r["vec_id"], r["cell_id"], r["cos_to_centroid"], r["is_dropped"])
            for r in auto.collect()
        }
        plan = auto._jdf.queryExecution().optimizedPlan().toString()
        assert "_blk" in plan  # the salted block key is in the join


# ------------------------------------------- map-side pair-compare kernel


def test_dropped_vs_new_kernel_semantics_and_plan(spark):
    """Round-13 kernel pin (_dropped_vs_new): the streaming loop's pair
    compare must (a) reproduce the relational keep-first rule exactly —
    including the NULL-on-zero-norm never-drops rule and the id_a < id_b
    guard — and (b) stay map-side: no Exchange in the kernel's plan (the
    r13 trigger probe caught the relational form's interpreted-HOF cost
    turning the first window fold into a 7x per-batch cliff)."""
    from clickhouse_provider_spark.streaming.semantic_curation import (
        _dropped_vs_new,
    )

    # cell 0: prior 1 ~ new 10 (cos 1.0 -> drop), prior zero-vector vs
    # new 11 (zero norm -> never drops); cell 1: new 12 alone (no prior
    # in cell -> kept); id guard: prior 13 > new 12 must not drop 12
    prior = spark.createDataFrame(
        [
            (0, 1, [1.0, 0.0]),
            (0, 2, [0.0, 0.0]),
            (1, 13, [0.0, 1.0]),
        ],
        "cell_id int, vec_id long, embedding array<double>",
    )
    new_rows = spark.createDataFrame(
        [
            (0, 10, [2.0, 0.0]),
            (0, 11, [0.0, 0.0]),  # zero norm: NULL cosine, never dropped
            (1, 12, [0.0, 3.0]),
        ],
        "cell_id int, vec_id long, embedding array<double>",
    ).collect()
    out = _dropped_vs_new(prior, new_rows, "vec_id", "embedding", 0.9)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    got = sorted(r["vec_id"] for r in out.collect())
    # 10 dropped by prior 1 (cos 1.0); 11 zero-norm never drops; 12 has
    # no lower-id cell-mate (prior 13 > 12 — the id guard)
    assert got == [10]
    # with the batch unioned ahead (the curate_embeddings_batch shape),
    # the result is the same here — the intra-batch 10 -> 11 pair is
    # blocked by 11's zero norm, pinning NULL-never-drops through the
    # full union path too
    both = prior.unionByName(
        spark.createDataFrame(
            [(0, 10, [2.0, 0.0]), (0, 11, [0.0, 0.0]), (1, 12, [0.0, 3.0])],
            "cell_id int, vec_id long, embedding array<double>",
        )
    )
    got2 = sorted(
        r["vec_id"]
        for r in _dropped_vs_new(
            both, new_rows, "vec_id", "embedding", 0.9
        ).distinct().collect()
    )
    assert got2 == [10]
    # empty new side: no kernel, empty relation
    assert _dropped_vs_new(prior, [], "vec_id", "embedding", 0.9).count() == 0
