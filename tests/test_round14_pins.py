"""Round-14 pins.

ADVICE r13 fixes: NULL/ragged embeddings through the streaming pair
kernel ``_dropped_vs_new`` (medium — mirrors ``_argmax_cell``'s
degenerate contract), deterministic compare-volume over compaction-folded
monitor history, the rollover completion marker moved OUT of compactable
data dirs (``_ROLLED`` at the generation root).

VERDICT r13 tasks 3+4: the prior-scan cell-pruned plan (pushed
``cell_id`` filter → O(touched cells) history I/O per batch) and the
bounded / chunked new-side kernel broadcast.
"""

import os

import pytest
from pyspark.sql import functions as F

from clickhouse_provider_spark.operators import similarity
from clickhouse_provider_spark.streaming import semantic_curation as sc

TAU = 0.3


def _emb_df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def _decisions(spark, state):
    return {
        (r["vec_id"], r["is_dropped"])
        for r in state.decisions(spark).collect()
    }


# ------------------------------- ADVICE r13 (medium): degenerate vectors


def test_streaming_null_embedding_graceful(spark, tmp_path):
    """A NULL embedding admitted by _argmax_cell (cell 0, NULL cosine)
    must flow through EVERY subsequent batch's pair compare without
    crashing, and behave exactly as batch semantic_dedup does: NULL
    never drops and is never dropped."""
    state = sc.SemanticCurationState(str(tmp_path / "s"), threshold=TAU)
    b0 = _emb_df(
        spark,
        [
            (1, [1.0, 0.0]),
            (2, None),  # NULL vector — lands in cell 0 via _argmax_cell
            (3, [0.0, 1.0]),
        ],
    )
    sc.curate_embeddings_batch(state, b0, batch_id=0)
    # the NULL row is IN the index now; later batches compare against it
    b1 = _emb_df(spark, [(10, [1.0, 0.001]), (11, None)])
    sc.curate_embeddings_batch(state, b1, batch_id=1)
    got = _decisions(spark, state)
    cents = state.centroids(spark)
    want = {
        (r["vec_id"], r["is_dropped"])
        for r in similarity.semantic_dedup(
            b0.unionByName(b1), threshold=TAU, centroids=cents
        ).collect()
    }
    assert got == want
    # NULLs are kept on both sides (never dropped), and vec 10 is
    # dropped by its near-parallel lower-id cellmate — the fixture
    # exercises both outcomes THROUGH the null-carrying index
    assert (2, False) in got and (11, False) in got
    assert (10, True) in got


def test_dropped_vs_new_ragged_vector_named_error(spark):
    """Wrong-LENGTH vectors fail loudly with the dims named — on the
    driver-side cell build AND the executor-side prior stack — instead
    of np.stack's opaque shape error."""
    prior = spark.createDataFrame(
        [(0, 1, [1.0, 0.0])], "cell_id int, vec_id long, embedding array<float>"
    )
    # driver side: ragged rows within one cell's new side
    with pytest.raises(ValueError, match="length-3 .* 2-dimensional"):
        sc._dropped_vs_new(
            prior,
            [
                {"cell_id": 0, "vec_id": 5, "embedding": [1.0, 0.0]},
                {"cell_id": 0, "vec_id": 6, "embedding": [1.0, 0.0, 0.0]},
            ],
            "vec_id",
            "embedding",
            TAU,
        )
    # executor side: prior rows that don't match the new side's dims
    ragged_prior = spark.createDataFrame(
        [(0, 1, [1.0, 0.0, 0.0])],
        "cell_id int, vec_id long, embedding array<float>",
    )
    df = sc._dropped_vs_new(
        ragged_prior,
        [{"cell_id": 0, "vec_id": 5, "embedding": [1.0, 0.0]}],
        "vec_id",
        "embedding",
        TAU,
    )
    with pytest.raises(Exception, match="length-3 .* 2-dimensional"):
        df.collect()


def test_dropped_vs_new_all_null_new_side(spark):
    """An all-NULL new side builds no cell matrices and returns the
    empty relation (nothing can be dropped) instead of crashing."""
    prior = spark.createDataFrame(
        [(0, 1, [1.0, 0.0])], "cell_id int, vec_id long, embedding array<float>"
    )
    out = sc._dropped_vs_new(
        prior,
        [{"cell_id": 0, "vec_id": 5, "embedding": None}],
        "vec_id",
        "embedding",
        TAU,
    )
    assert out.count() == 0


# --------------------- VERDICT r13 task 3: cell-pruned prior scan plan


def test_prior_scan_cell_pruned_plan(spark, tmp_path):
    """The history side of the pair compare carries BOTH pushed
    predicates: batch_id (partition pruning at listing) and cell_id
    (rowgroup min/max over cell_id-sorted files). The filter must reach
    the parquet scan — not evaluate post-scan."""
    state = sc.SemanticCurationState(str(tmp_path / "s"), threshold=TAU)
    b0 = _emb_df(spark, [(1, [1.0, 0.0]), (2, [0.0, 1.0])])
    sc.curate_embeddings_batch(state, b0, batch_id=0)
    plan = (
        sc._pruned_prior(state.index(spark), 1, [0, 3], "vec_id", "embedding")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "In(cell_id" in plan.split("PushedFilters:")[1]
    assert "batch_id" in plan.split("PartitionFilters:")[1].split("]")[0]


def test_prior_scan_prune_preserves_decisions(spark, tmp_path):
    """Cell pruning is an I/O optimization, not a semantics change:
    decisions with the pruned scan equal batch semantic_dedup."""
    from clickhouse_provider_spark.session import load_tables

    emb = load_tables(spark, "/root/testdata/sf0.001")["embeddings"].select(
        "vec_id", "embedding"
    )
    state = sc.SemanticCurationState(
        str(tmp_path / "s"), threshold=TAU, n_cells=8
    )
    parts = [
        emb.filter(F.col("vec_id") < 200),
        emb.filter(F.col("vec_id") >= 200),
    ]
    for b, p in enumerate(parts):
        sc.curate_embeddings_batch(state, p, batch_id=b)
    cents = state.centroids(spark)
    got = _decisions(spark, state)
    want = {
        (r["vec_id"], r["is_dropped"])
        for r in similarity.semantic_dedup(
            emb, threshold=TAU, centroids=cents
        ).collect()
    }
    assert got == want


# ------------------- VERDICT r13 task 4: bounded/chunked kernel broadcast


def test_chunked_kernel_equals_single(spark, tmp_path, monkeypatch):
    """A micro-batch over KERNEL_BROADCAST_BUDGET_BYTES runs the kernel
    in new-side chunks against the SAME compare side — decisions must be
    bit-identical to the unchunked path (keep-first consults the full
    compare side for every chunk)."""
    from clickhouse_provider_spark.session import load_tables

    emb = load_tables(spark, "/root/testdata/sf0.001")["embeddings"].select(
        "vec_id", "embedding"
    )
    roots = {}
    for name, budget in (("one", None), ("chunked", 64)):
        if budget is not None:
            monkeypatch.setattr(sc, "KERNEL_BROADCAST_BUDGET_BYTES", budget)
        state = sc.SemanticCurationState(
            str(tmp_path / name), threshold=TAU, n_cells=8
        )
        for b, p in enumerate(
            [emb.filter(F.col("vec_id") < 200), emb.filter(F.col("vec_id") >= 200)]
        ):
            sc.curate_embeddings_batch(state, p, batch_id=b)
        roots[name] = {
            tuple(r)
            for r in state.decisions(spark)
            .select("vec_id", "cell_id", "cos_to_centroid", "is_dropped")
            .collect()
        }
    assert roots["one"] == roots["chunked"]
    assert any(d for (_, _, _, d) in roots["one"])


# --------------- ADVICE r13 (low): folded monitor compare-volume ties


def test_compare_volume_deterministic_after_fold(spark, tmp_path):
    """After compaction folds several batches' monitor rows onto one
    batch_id, multiple rows per (cell_id, batch_id) exist; the volume
    window must pre-aggregate them (one row per key) so folded history
    reports deterministic MERGED volume, not row-order-dependent
    same-batch tie counting."""
    from clickhouse_provider_spark.session import load_tables

    emb = load_tables(spark, "/root/testdata/sf0.001")["embeddings"].select(
        "vec_id", "embedding"
    )
    parts = [
        emb.filter(F.col("vec_id") < 120),
        emb.filter((F.col("vec_id") >= 120) & (F.col("vec_id") < 240)),
        emb.filter((F.col("vec_id") >= 240) & (F.col("vec_id") < 360)),
        emb.filter(F.col("vec_id") >= 360),
    ]
    # compact_every=2, keep_last=1 → batch 2 folds monitor ids {0,1}→1
    state = sc.SemanticCurationState(
        str(tmp_path / "s"), threshold=TAU, n_cells=4,
        compact_every=2, keep_last=1,
    )
    for b, p in enumerate(parts):
        sc.curate_embeddings_batch(state, p, batch_id=b)
    mon = state.monitor(spark)
    folded = (
        mon.groupBy("cell_id", "batch_id").count().filter("count > 1").count()
    )
    assert folded > 0, "fixture must actually produce folded monitor ties"
    vol = {
        r["batch_id"]: r["compare_pairs"]
        for r in sc.batch_compare_volume(spark, state).collect()
    }
    # independent recomputation off the PRE-AGGREGATED counts
    agg = {
        (r["batch_id"], r["cell_id"]): r["n"]
        for r in mon.groupBy("cell_id", "batch_id")
        .agg(F.sum("n_new").alias("n"))
        .collect()
    }
    pops: dict[int, int] = {}
    want: dict[int, int] = {}
    for b in sorted({k[0] for k in agg}):
        want[b] = sum(
            n * pops.get(c, 0) for (bb, c), n in agg.items() if bb == b
        )
        for (bb, c), n in agg.items():
            if bb == b:
                pops[c] = pops.get(c, 0) + n
    assert vol == want
    # total volume is conserved by the fold: equals the unfolded truth
    # EXCEPT pairs between batches folded onto the same id (merged away)
    assert vol[3] > vol[2] > 0


# ----------- ADVICE r13 (low): _ROLLED completion marker at the gen root


def test_rolled_marker_survives_major_monitor_fold(
    spark, tmp_path, monkeypatch
):
    """A second-tier major fold (window_only=False) over a rolled
    generation's monitor folds batch_id=-1 — and with it the legacy
    in-data _GEN marker. Resume discovery must still find the rolled
    generation via the root-level _ROLLED marker (written last, outside
    any compactable data dir)."""
    from clickhouse_provider_spark.session import load_tables
    from clickhouse_provider_spark.streaming import compaction

    monkeypatch.setattr(sc, "TARGET_CELL_POP", 10)  # threshold 40
    emb = load_tables(spark, "/root/testdata/sf0.001")["embeddings"].select(
        "vec_id", "embedding"
    )
    import glob
    import shutil

    root = str(tmp_path)
    src = os.path.join(root, "incoming")
    os.makedirs(src)
    base = os.path.join(root, "gens")
    ckpt = os.path.join(root, "ckpt")

    def drop(i, p):
        d = os.path.join(root, f"stage_{i}")
        p.coalesce(1).write.parquet(d)
        f = glob.glob(os.path.join(d, "*.parquet"))[0]
        shutil.move(f, os.path.join(src, f"batch_{i}.parquet"))
        shutil.rmtree(d)

    drop(0, emb.filter(F.col("vec_id") < 250))
    # one wave over the threshold → the driver rolls to gen1
    state, log = sc.run_semantic_curation_generations(
        spark, src, base, ckpt,
        threshold=TAU, n_cells=8, max_files_per_trigger=1,
    )
    assert state.root.endswith("gen1")
    assert os.path.exists(os.path.join(base, "gen1", "_ROLLED"))
    # drain one real batch into gen1 so the fold has a higher id to
    # collapse batch_id=-1 onto
    drop(1, emb.filter((F.col("vec_id") >= 250) & (F.col("vec_id") < 300)))
    state, _ = sc.run_semantic_curation_generations(
        spark, src, base, ckpt,
        threshold=TAU, n_cells=8, max_files_per_trigger=1,
        roll_factor=10**9,
    )
    assert state.root.endswith("gen1")
    gen1 = sc.SemanticCurationState(
        os.path.join(base, "gen1"), threshold=TAU
    )
    # major fold of gen1's monitor: batch_id=-1 (with its legacy _GEN
    # marker) folds away — exactly the ADVICE r13 hazard
    mon = gen1.monitor_path
    ids_before = compaction.list_batch_ids(mon)
    assert -1 in ids_before and max(ids_before) > -1
    folded = compaction.compact_batch_dirs(
        spark, mon, upto=10**9, window_only=False, min_dirs=1
    )
    assert folded == len(ids_before)
    assert -1 not in compaction.list_batch_ids(mon)
    # discovery still resumes into gen1, not gen0
    drop(2, emb.filter((F.col("vec_id") >= 300) & (F.col("vec_id") < 350)))
    state2, _ = sc.run_semantic_curation_generations(
        spark, src, base, ckpt,
        threshold=TAU, n_cells=8, max_files_per_trigger=1,
        roll_factor=10**9,
    )
    assert state2.root.endswith("gen1")
    # populations survived the fold (rows preserved, ids collapsed)
    total = sum(
        r["population"]
        for r in sc.cell_populations(spark, state2).collect()
    )
    assert total == 350
