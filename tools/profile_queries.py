"""Per-query cost profile: build-time (plan construction, py4j) vs
exec-time (noop force) split, plus job/stage counts — the guide-§1 signal
that separates driver-side overhead from cluster work.

    python tools/profile_queries.py q1 q2 ... [--reps=3] [--sf=0.1]

Prints one JSON line per query: {name, build_s, exec_s (min of reps),
jobs, ...}. Run on an idle machine; results are same-host comparable only.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_provider_spark.plans import CATALOG
from clickhouse_provider_spark.session import get_spark, load_tables


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    sf = "0.1"
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        if a.startswith("--sf="):
            sf = a.split("=", 1)[1]
    spark = get_spark(app_name="profile_queries")
    sc = spark.sparkContext
    tables = load_tables(spark, f"/root/testdata/sf{sf}")
    for df in tables.values():
        df.limit(1).count()
    # codegen warmup at the smallest sf
    small = load_tables(spark, "/root/testdata/sf0.001")
    for n in names:
        CATALOG[n].build(spark, small).write.format("noop").mode(
            "overwrite"
        ).save()
    # rebind: restores the temp views AND refreshes the frames the
    # queries are built against after the sf0.001 warmup (ADVICE r14 —
    # the unbound call was dead code wrt `tables`)
    tables = load_tables(spark, f"/root/testdata/sf{sf}")

    for n in names:
        builds, execs, jobs = [], [], []
        for _ in range(reps):
            j0 = sc._jsc.sc().dagScheduler().nextJobId()  # noqa: SLF001
            t0 = time.perf_counter()
            df = CATALOG[n].build(spark, tables)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            j1 = sc._jsc.sc().dagScheduler().nextJobId()  # noqa: SLF001
            builds.append(t1 - t0)
            execs.append(t2 - t1)
            jobs.append(j1 - j0)
        print(
            json.dumps(
                {
                    "name": n,
                    "build_s": round(min(builds), 3),
                    "exec_s": round(min(execs), 3),
                    "total_min_s": round(min(b + e for b, e in zip(builds, execs)), 3),
                    "jobs": jobs[-1],
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
