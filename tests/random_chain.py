"""Deterministic pseudo-random BlockWithTxHashes chains for differential
testing of the transaction-assembly paths (batch fixpoint vs streaming
keyed assembler). Structure varies with the seed: txs open in random
blocks, their receipts execute 1-3 blocks later, spawn random subtrees
(depth ≤ 3, branching ≤ 2), and sometimes consume data receipts whose
data may land a block before, at, or AFTER the consumer's execution —
exercising the router's consume_wait/data_wait out-of-order paths.

Every generated chain is CLOSED: all spawned receipts execute within the
chain, so the batch `incomplete` relation must be empty and both engines
must emit every tx."""

from __future__ import annotations

import random

from tests import fixture_chain as FC

SIGNERS = ["alice.near", "bob.near", "carol.near"]


def make_random_chain(seed: int = 7, n_blocks: int = 16, start_height: int = 500):
    rng = random.Random(seed)
    sched = [
        {"txs": [], "receipts": [], "outcomes": []} for _ in range(n_blocks)
    ]
    counters = {"tx": 0, "r": 0, "d": 0}

    def schedule_receipt(tx_hash: str, signer: str, rid: str, eb: int, depth: int):
        """Receipt ``rid`` of ``tx_hash`` executes at block index ``eb``,
        possibly consuming data and spawning children."""
        input_data_ids = []
        if rng.random() < 0.3:
            counters["d"] += 1
            data_id = f"D{counters['d']}"
            input_data_ids.append(data_id)
            # data receipt lands before, at, or after the consumer's block
            db = min(max(eb + rng.choice([-1, 0, 1]), 0), n_blocks - 1)
            sched[db]["receipts"].append(
                FC.data_receipt(
                    f"DR{counters['d']}", "system", f"{signer}", data_id,
                    FC.b64(f"payload-{data_id}"),
                )
            )
        children = []
        if depth < 3 and eb < n_blocks - 2 and rng.random() < 0.5:
            for _ in range(rng.randint(1, 2)):
                counters["r"] += 1
                children.append(f"RC{counters['r']}")
        receipt = FC.action_receipt(
            rid, signer, f"contract{rng.randint(0, 2)}.near", signer,
            [FC.A_TRANSFER], input_data_ids=input_data_ids,
        )
        status = (
            {"SuccessReceiptId": children[0]}
            if children
            else rng.choice(
                [{"SuccessValue": FC.b64('"ok"')}, {"Failure": {"ActionError": {"index": 0}}}]
            )
        )
        sched[eb]["outcomes"].append(
            {
                "tx_hash": tx_hash,
                "receipt": receipt,
                "execution_outcome": FC.outcome(
                    rid, status, children, block_hash=f"RHash{start_height + eb}"
                ),
            }
        )
        for child in children:
            ceb = min(eb + rng.randint(1, 2), n_blocks - 1)
            schedule_receipt(tx_hash, signer, child, ceb, depth + 1)

    for b in range(n_blocks - 4):
        for _ in range(rng.randint(0, 2)):
            counters["tx"] += 1
            counters["r"] += 1
            tx = f"TX{counters['tx']}"
            rid = f"RC{counters['r']}"
            signer = rng.choice(SIGNERS)
            sched[b]["txs"].append(
                FC.chunk_tx(tx, signer, "app.near", [FC.A_FT_CALL], [rid])
            )
            schedule_receipt(tx, signer, rid, b + rng.randint(1, 3), 0)

    blocks = []
    for i, s in enumerate(sched):
        h = start_height + i
        shards = [
            FC.shard(
                0,
                transactions=s["txs"],
                receipts=s["receipts"],
                outcomes=s["outcomes"],
            )
        ]
        blk = FC.block(h, shards)
        blocks.append(blk)
    return blocks
