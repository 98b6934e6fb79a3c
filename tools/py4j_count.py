"""Count py4j round-trips during plan CONSTRUCTION of named queries.

The driver-side build cost of a query is dominated by py4j command
round-trips (every Column op is one or more). This wraps the gateway
client's send_command with a counter, builds each named plan (no
execution), and prints {name: {"calls": n, "build_s": s}} — the
instrument behind VERDICT r14 task 5 (cut ANN build round-trips >=3x).

    python tools/py4j_count.py similarity_pq_topk similarity_ivfpq_adc ...
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
    sf = "0.1"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf = a.split("=", 1)[1]
    spark = get_spark(app_name="py4j_count")
    tables = load_tables(spark, f"/root/testdata/sf{sf}")

    import py4j.clientserver as cs
    import py4j.java_gateway as jg

    counter = {"n": 0}
    targets = []
    for cls in (jg.GatewayClient, cs.JavaClient):
        if hasattr(cls, "send_command"):
            targets.append((cls, cls.send_command))

    def wrap(orig):
        def counted(self, *a, **k):
            counter["n"] += 1
            return orig(self, *a, **k)
        return counted

    for cls, orig in targets:
        cls.send_command = wrap(orig)

    out = {}
    for n in names:
        # warm build once (JVM-side parser caches, python imports)
        CATALOG[n].build(spark, tables)
        counter["n"] = 0
        t0 = time.perf_counter()
        CATALOG[n].build(spark, tables)
        out[n] = {
            "calls": counter["n"],
            "build_s": round(time.perf_counter() - t0, 3),
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
