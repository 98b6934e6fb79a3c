"""Why did the ingest bench row swing 5.24 s (r11) -> 1.08-1.40 s (r12)
on a byte-identical extraction path? (VERDICT r12 task 4 — the
pipeline-side rows had no recorded variance, so a real regression was
indistinguishable from host noise.)

The probe isolates the two non-code suspects in ONE process:

1. POSITION: bench.py times ingest AFTER the 78-query section (plus its
   sf0.001 codegen warmup pass), so the JVM arrives with a hot C2
   profile, a populated code cache, and a GC heap shaped by ~80 cached
   plans. Standalone-vs-after-queries in the same process measures that
   delta directly.
2. HOST/JVM LOTTERY: run the probe process N times; the across-process
   spread of the SAME phase bounds what a single-shot gate number can
   mean.

Usage: python tools/ingest_variance_probe.py [--samples 6] [--skip-queries]
Prints one JSON line. Run on an IDLE machine (judge-read timings);
run it 2-3 times and keep all lines.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench
from clickhouse_provider_spark.plans import CATALOG
from clickhouse_provider_spark.session import get_spark, load_tables


def ingest_samples(spark, n: int) -> dict:
    old = bench.REPS
    bench.REPS = n
    try:
        return bench.bench_ingest(spark)
    finally:
        bench.REPS = old


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=6)
    ap.add_argument("--skip-queries", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark(app_name="ingest_variance_probe")
    out = {"probe": "ingest_variance", "pid": os.getpid(), "phases": {}}

    out["phases"]["standalone"] = ingest_samples(spark, args.samples)

    if not args.skip_queries:
        # replicate bench.py's run order: sf0.001 codegen warmup of every
        # headline plan, then one full pass at the bench SF
        tables = load_tables(spark, args.sf_dir)
        small = load_tables(spark, "/root/testdata/sf0.001")
        names = [n for n in bench.HEADLINE if n in CATALOG]
        for name in names:
            bench.force(CATALOG[name].build(spark, small))
        tables = load_tables(spark, args.sf_dir)
        t0 = time.perf_counter()
        for name in names:
            bench.force(CATALOG[name].build(spark, tables))
        out["phases"]["query_section_sec"] = round(time.perf_counter() - t0, 1)
        out["phases"]["after_queries"] = ingest_samples(spark, args.samples)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
