"""Materialize an sf1-class probe dataset for the round-15 scaling block.

The driver's sf0.1 bench is fixed-overhead-bound (8-core ≈ 32-core on
nearly every query — VERDICT r14 scaling section), so parallelism wins
are invisible there. This writes a 10× sf0.1 dataset to disk using the
same key-shifted replication the scale probe uses (tools/scale_probe.py
``scaled_tables`` — join fan-outs and group cardinalities grow
realistically, near-dup texts are perturbed so the pair space stays
linear), split into 32 files per table so scans genuinely split.

Usage: python tools/sf1_probe_gen.py [out_dir] [k]   (default
/root/sf1probe 10). The output is probe input only — nothing in the
bench or oracle path reads it unless SPARK_GRAFT_SF_DIR points at it.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from clickhouse_provider_spark.session import get_spark, load_tables
from tools.scale_probe import scaled_tables


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/sf1probe"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(app_name="sf1_probe_gen")
    base = load_tables(spark, "/root/testdata/sf0.1")
    t = scaled_tables(spark, base, k)
    os.makedirs(out_dir, exist_ok=True)
    for name, df in t.items():
        path = os.path.join(out_dir, f"{name}.parquet")
        # dims stay single-file; replicated facts get 32 splits so the
        # probe's scans parallelize the way a production table's would
        n = 32 if name in ("lineitem", "orders", "events", "documents", "embeddings") and k > 1 else 1
        df.repartition(n).write.mode("overwrite").parquet(path)
        print("wrote", path, "files", n)


if __name__ == "__main__":
    main()
