"""Round-15 larger-SF scaling probe (VERDICT r14 task 7).

Runs a representative query set over the materialized sf1-class dataset
(tools/sf1_probe_gen.py) at 32 and 8 cores via bench.py's restricted
mode — same timing methodology as the driver bench — and writes
SCALE_PROBE_r15_sf.json with the c8/c32 ratios. Data-bound queries
should show ratio ≈ core ratio (4×) once per-query fixed overhead stops
dominating; the sf0.1 bench cannot see this (VERDICT r14 scaling block).

Usage: python tools/sf1_probe_run.py [probe_dir]
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

#: data-bound representatives + every Arrow-kernel path the verdict asks
#: about (kmeans, cogrouped pair kernel, multimodal decode) + the
#: md5-heavy dedup family whose c8/c32 ratios were the only real ones at
#: sf0.1 + the two slowest analytics queries
QUERIES = [
    "q1_pricing_summary",
    "q18_large_volume_customers",
    "spearman_rank_corr",
    "quantile_exact_weighted",
    "dedup_minhash_signatures",
    "dedup_lsh_pairs",
    "dedup_cluster_stats",
    "semantic_dedup_prune",
    "semantic_cluster_kmeans",
    "multimodal_decode_png_stats",
    "knn_label_accuracy",
    "similarity_pq_topk",
]


def run(cpus: int, probe_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=probe_dir,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_BENCH_QUERIES=",".join(QUERIES),
        SPARK_GRAFT_BENCH_QUERIES_ONLY="1",
        SPARK_GRAFT_BENCH_NO_PERSIST="1",
        SPARK_GRAFT_BENCH_REPS=os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"),
    )
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=str(REPO),
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    probe_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/sf1probe"
    r32 = run(32, probe_dir)
    r8 = run(8, probe_dir)
    ratios = {
        q: round(r8["queries"][q] / r32["queries"][q], 2)
        for q in QUERIES
        if r32["queries"].get(q)
    }
    artifact = {
        "probe": "sf1_scaling_r15",
        "probe_dir": probe_dir,
        "note": "10x sf0.1 key-shifted replication, 32 files/fact table; "
        "median-of-REPS per query via bench.py restricted mode",
        "c32": r32["queries"],
        "c8": r8["queries"],
        "ratio_c8_over_c32": ratios,
        "total_c32": r32["value"],
        "total_c8": r8["value"],
    }
    path = REPO / "SCALE_PROBE_r15_sf.json"
    path.write_text(json.dumps(artifact, indent=1))
    print(json.dumps(artifact["ratio_c8_over_c32"], indent=1))
    print("wrote", path)


if __name__ == "__main__":
    main()
