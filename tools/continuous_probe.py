"""Continuous-stream rollover probe (VERDICT r13 task 7): ONE
long-running Structured Streaming query — no availableNow drain waves —
must flag the generation boundary on the foreachBatch cadence and the
continuous driver must roll it mid-stream.

Drops ``--files`` embedding files (sf-dir embeddings with monotonically
shifted vec_ids, the ingest contract) into a source directory UP FRONT,
then runs ``run_semantic_curation_generations_continuous`` with a small
TARGET_CELL_POP so the boundary fires mid-stream. Records the per-batch
trigger log (the evidence the check ran on the batch cadence), each
generation, and pins:

- every ingested vector decided EXACTLY once in the active generation
  (one checkpoint spans the roll — no file re-ingestion);
- post-boundary decisions equal batch semantic_dedup under the active
  generation's centroids (the per-generation exactness invariant from
  tests/test_streaming_semantic.py).

Usage: python tools/continuous_probe.py [--files 12] [--target-pop 600]
Prints one JSON line; save as SCALE_PROBE_r{N}_continuous.json.
NEVER run other Spark work concurrently — timings are judge-read.
"""

from __future__ import annotations

import argparse
import glob
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=12)
    ap.add_argument("--n-cells", type=int, default=8)
    ap.add_argument("--target-pop", type=int, default=600,
                    help="override TARGET_CELL_POP so the boundary fires "
                    "at probe scale (threshold = 4x this)")
    ap.add_argument("--idle-timeout", type=float, default=20.0)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark(app_name="continuous_probe")
    base = load_tables(spark, args.sf_dir)["embeddings"].select(
        "vec_id", "embedding"
    )
    n_vecs = base.count()
    sc.TARGET_CELL_POP = args.target_pop

    root = tempfile.mkdtemp(prefix="continuous_probe_")
    try:
        src = os.path.join(root, "incoming")
        os.makedirs(src)
        for b in range(args.files):
            stage = os.path.join(root, f"stage_{b}")
            base.select(
                (F.col("vec_id") + F.lit(b * VEC_SPAN)).alias("vec_id"),
                "embedding",
            ).coalesce(1).write.parquet(stage)
            f = glob.glob(os.path.join(stage, "*.parquet"))[0]
            shutil.move(f, os.path.join(src, f"batch_{b}.parquet"))
            shutil.rmtree(stage)

        t0 = time.perf_counter()
        state, log = sc.run_semantic_curation_generations_continuous(
            spark, src, os.path.join(root, "gens"),
            os.path.join(root, "ckpt"),
            threshold=TAU, n_cells=args.n_cells, max_files_per_trigger=1,
            idle_timeout=args.idle_timeout,
        )
        wall = round(time.perf_counter() - t0, 3)

        fired = [
            v for v in log if v.get("roll") and "batch_id" in v
        ]
        # pin 1: active generation holds every vector exactly once
        dec = state.decisions(spark)
        per_vec = dec.groupBy("vec_id").count()
        n_decided = per_vec.count()
        max_dup = per_vec.agg(F.max("count")).first()[0]
        # pin 2: post-boundary exactness under the active centroids
        ingested = spark.createDataFrame(
            [], "vec_id long, embedding array<float>"
        )
        for b in range(args.files):
            ingested = ingested.unionByName(
                base.select(
                    (F.col("vec_id") + F.lit(b * VEC_SPAN)).alias("vec_id"),
                    "embedding",
                )
            )
        ingested = ingested.localCheckpoint(eager=True)
        want = {
            (r["vec_id"], r["is_dropped"])
            for r in similarity.semantic_dedup(
                ingested, threshold=TAU,
                centroids=state.centroids(spark),
            ).collect()
        }
        post = {
            (r["vec_id"], r["is_dropped"])
            for r in dec.filter(F.col("batch_id") >= 0).collect()
        }
        out = {
            "probe": "semantic_curation_continuous_rollover",
            "sf_dir": args.sf_dir,
            "file_vecs": n_vecs,
            "files": args.files,
            "corpus_vecs_final": n_vecs * args.files,
            "target_cell_pop": args.target_pop,
            "wall_sec": wall,
            "active_generation": os.path.basename(state.root),
            "per_batch_trigger_log": [
                {k: v.get(k) for k in (
                    "batch_id", "gen", "roll", "hottest_pop", "threshold",
                    "suggested_n_cells")}
                for v in log
            ],
            "fired_on_batch_cadence": [
                {"batch_id": v["batch_id"], "gen": v["gen"],
                 "hottest_pop": v["hottest_pop"],
                 "threshold": v["threshold"]}
                for v in fired
            ],
            "decided_exactly_once": (
                n_decided == n_vecs * args.files and max_dup == 1
            ),
            # decisions the ACTIVE generation made after the roll (0 ⇒
            # every file drained before the boundary — the invariant is
            # then vacuous; size --files so this stays > 0)
            "post_boundary_decision_rows": len(post),
            "post_boundary_decisions_equal_batch": post <= want,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
