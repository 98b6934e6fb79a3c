"""Pipeline-throughput bench: generate an N-block synthetic chain
(FIXTURES.md §B shape — same generator family as the test fixtures, scaled
up) and measure both pipeline modes end-to-end in blocks/sec.

Not driver-graded (the driver's bench times the query surface); this is
the evidence for the ingest half: the reference daemon's job is
block-stream → 8 tables, so its throughput analog is what this measures.

Usage: python tools/bench_pipeline.py [n_blocks] [txs_per_block]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from tests import fixture_chain as FC


def make_block(height: int, txs_per_block: int) -> dict:
    """One block: each tx submits at `height` and its receipt executes in
    the NEXT block (cross-block state exercised for every tx); receipts
    carry 2 actions + an EVENT_JSON log."""
    submitted = [
        FC.chunk_tx(f"T{height}_{i}", f"user{i}.near", "app.near", [FC.A_FT_CALL], [f"R{height}_{i}"])
        for i in range(txs_per_block)
    ]
    executing = []
    if height > 100:  # receipts of the previous block's txs
        for i in range(txs_per_block):
            rid = f"R{height - 1}_{i}"
            executing.append(
                {
                    "tx_hash": f"T{height - 1}_{i}",
                    "receipt": FC.action_receipt(
                        rid, f"user{i}.near", "app.near", f"user{i}.near", [FC.A_FT_CALL, FC.A_TRANSFER]
                    ),
                    "execution_outcome": FC.outcome(
                        rid,
                        {"SuccessValue": FC.b64('"1"')},
                        [],
                        logs=[FC.VALID_EVENT_LOG],
                        block_hash=f"Hash{height}",
                    ),
                }
            )
    return FC.block(height, [FC.shard(0, transactions=submitted, outcomes=executing)])


def main() -> None:
    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    txs = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from clickhouse_provider_spark.operators.actions import extract_tables
    from clickhouse_provider_spark.operators.transactions import assemble
    from clickhouse_provider_spark.schemas import BLOCK_SCHEMA
    from clickhouse_provider_spark.session import get_spark

    spark = get_spark(app_name="bench_pipeline")
    lines = [json.dumps(make_block(100 + i, txs)) for i in range(n_blocks)]
    blocks = spark.read.schema(BLOCK_SCHEMA).json(
        spark.sparkContext.parallelize(lines, 32)
    )
    blocks.cache().count()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    t0 = time.perf_counter()
    for df in extract_tables(blocks).values():
        force(df)
    t_actions = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = assemble(blocks)
    for name in ("transactions", "account_txs", "block_txs", "receipt_txs", "blocks"):
        force(out[name])
    t_tx = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "metric": "pipeline_throughput",
                "n_blocks": n_blocks,
                "txs_per_block": txs,
                "actions_mode_sec": round(t_actions, 2),
                "actions_blocks_per_sec": round(n_blocks / t_actions, 1),
                "transactions_mode_sec": round(t_tx, 2),
                "transactions_blocks_per_sec": round(n_blocks / t_tx, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
