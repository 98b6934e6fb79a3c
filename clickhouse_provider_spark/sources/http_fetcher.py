"""HTTP block-fetcher source (reference: fastnear-neardata-fetcher used by
src/main.rs:59-127 — N parallel HTTP fetchers with bearer auth, re-emitting
blocks in height order into a bounded channel; SURVEY.md §2A #1-#2).

Spark-first mapping as a Python Data Source (pyspark.sql.datasource):

- **parallel fetch** — a batch read splits the height range into ordered
  InputPartitions; inside each partition ``num_threads`` concurrent HTTP
  GETs run against the block endpoint (the fetcher's NUM_FETCHING_THREADS,
  main.rs:62-65), and rows are yielded in height order, so partition order
  × in-partition order = global height order
- **ordered re-emit + backpressure** — the streaming reader advances a
  height offset and caps each micro-batch at ``max_blocks_per_batch``
  (the mpsc::channel(100) analog, main.rs:91); offsets are plain height
  ranges, so replay re-plans the exact same partitions. Offset planning
  moves only height numbers through the driver; payload fetches run in
  ``read(partition)`` on executors (partition-based stream reader, same
  shape as the batch path)
- **auth** — ``auth_bearer_token`` option or AUTH_BEARER_TOKEN env
  (main.rs:65,97-99) sent as ``Authorization: Bearer …``
- **genesis discovery** — ``fetch_first_block_height`` (fetcher's
  fetch_first_block, main.rs:67-74) + ``resolve_start_height`` replicating
  the daemon start clamp: actions mode starts at
  max(first_block, last_db+1) (main.rs:88-91); transactions mode rewinds
  SAFE_CATCH_UP_OFFSET when the tx cache isn't ready (main.rs:104-117)

The payload column is the raw block JSON; ``parse_blocks`` applies
BLOCK_SCHEMA with ``from_json`` so parsing happens JVM-side in the scan
stage, not in Python. At 100 TB the source is embarrassingly parallel:
every executor fetches a disjoint height slice, and the per-height GET is
the unit of retry (10 attempts, doubling backoff — the fetcher's policy).

Endpoint shape (public neardata REST API):
    GET {base}/v0/block/{height}      → block JSON, or ``null`` (skipped)
    GET {base}/v0/first_block         → first available block
    GET {base}/v0/last_block/final    → chain tip
"""

from __future__ import annotations

import json
import os
import time
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

SAFE_CATCH_UP_OFFSET = 1000  # main.rs:22
MAX_RETRIES = 10
INITIAL_DELAY_S = 0.1


# ---------------------------------------------------------------------------
# plain HTTP helpers (stdlib only — usable outside Spark too)
# ---------------------------------------------------------------------------


def _get(url: str, token: str | None, timeout: float, retries: int = MAX_RETRIES) -> str | None:
    """GET with bearer auth and doubling backoff. Returns body text, or
    None for 404 (height past the tip / pruned)."""
    req = urllib.request.Request(url)
    if token:
        req.add_header("Authorization", f"Bearer {token}")
    delay = INITIAL_DELAY_S
    for attempt in range(retries):
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                return resp.read().decode("utf-8")
        except urllib.error.HTTPError as err:
            if err.code == 404:
                return None
            # retry only what can heal: 408/429 and 5xx. Other 4xx (401/403
            # bad token, 400 bad request) would burn the full backoff budget
            # per height × threads × partitions before surfacing — fail fast.
            if 400 <= err.code < 500 and err.code not in (408, 429):
                raise
            if attempt == retries - 1:
                raise
        except (urllib.error.URLError, OSError):
            if attempt == retries - 1:
                raise
        time.sleep(delay)
        delay *= 2
    return None


def fetch_block_json(
    base_url: str, height: int, token: str | None = None, timeout: float = 10.0
) -> str | None:
    """One block by height; None when the height was skipped (the endpoint
    serves the literal ``null``) or doesn't exist."""
    body = _get(f"{base_url.rstrip('/')}/v0/block/{height}", token, timeout)
    if body is None or body.strip() == "null":
        return None
    return body


def _height_of(body: str | None) -> int | None:
    if not body or body.strip() == "null":
        return None
    return json.loads(body)["block"]["header"]["height"]


def fetch_first_block_height(
    base_url: str, token: str | None = None, timeout: float = 10.0
) -> int:
    """Genesis/first-block discovery (fetcher::fetch_first_block,
    main.rs:67-74): the chain's earliest available block height."""
    h = _height_of(_get(f"{base_url.rstrip('/')}/v0/first_block", token, timeout))
    if h is None:
        raise RuntimeError("First block doesn't exist")  # main.rs:69
    return h


def fetch_last_block_height(
    base_url: str, token: str | None = None, timeout: float = 10.0
) -> int:
    """Chain tip (final block) — the streaming reader's latest offset."""
    h = _height_of(_get(f"{base_url.rstrip('/')}/v0/last_block/final", token, timeout))
    if h is None:
        raise RuntimeError("Last block doesn't exist")
    return h


def resolve_start_height(
    first_block_height: int,
    last_db_height: int,
    backfill_height: int | None = None,
    cache_ready: bool = True,
    safe_catch_up_offset: int = SAFE_CATCH_UP_OFFSET,
) -> int:
    """The daemon start clamp (main.rs:88-91 actions, 104-117 transactions):

    - resume from the DB watermark (or an explicit backfill height)
    - transactions mode with cold state rewinds SAFE_CATCH_UP_OFFSET so
      in-flight txs spanning the crash point reassemble (replays are
      absorbed by ReplacingMergeTree dedup)
    - never before the chain's first available block
    """
    last = backfill_height if backfill_height is not None else last_db_height
    start = last + 1 if cache_ready else max(last - safe_catch_up_offset, 0)
    return max(first_block_height, start)


def _fetch_ordered(
    base_url: str,
    heights: list[int],
    token: str | None,
    timeout: float,
    num_threads: int,
) -> Iterator[Tuple[int, str]]:
    """Fetch many heights concurrently, yield (height, json) in height
    order, dropping skipped heights — the fetcher's ordered re-emit."""
    with ThreadPoolExecutor(max_workers=max(1, num_threads)) as pool:
        bodies = pool.map(
            lambda h: (h, fetch_block_json(base_url, h, token, timeout)), heights
        )
        for h, body in bodies:  # map preserves input order
            if body is not None:
                yield (h, body)


# ---------------------------------------------------------------------------
# the Spark data source
# ---------------------------------------------------------------------------

_SCHEMA = "block_height BIGINT, block_json STRING"


@dataclass
class _HeightRange(InputPartition):
    start: int  # inclusive
    end: int  # exclusive


class _Options:
    """Shared option parsing for batch + stream readers."""

    def __init__(self, options: dict):
        self.base_url = options.get("url")
        if not self.base_url:
            raise ValueError("neardata source requires option 'url'")
        self.token = options.get("auth_bearer_token") or os.environ.get(
            "AUTH_BEARER_TOKEN"
        )
        self.num_threads = int(options.get("num_threads", 8))  # NUM_FETCHING_THREADS
        self.timeout = float(options.get("timeout", 10.0))
        self.blocks_per_partition = int(options.get("blocks_per_partition", 100))
        self.max_blocks_per_batch = int(options.get("max_blocks_per_batch", 100))
        self.start_height = (
            int(options["start_height"]) if "start_height" in options else None
        )
        self.end_height = (
            int(options["end_height"]) if "end_height" in options else None
        )


class NeardataBatchReader(DataSourceReader):
    """Backfill read of [start_height, end_height] split into ordered
    height-range partitions; each partition fetches with num_threads
    concurrent GETs."""

    def __init__(self, options: dict):
        self.opt = _Options(options)
        if self.opt.start_height is None:
            self.opt.start_height = fetch_first_block_height(
                self.opt.base_url, self.opt.token, self.opt.timeout
            )
        if self.opt.end_height is None:
            self.opt.end_height = fetch_last_block_height(
                self.opt.base_url, self.opt.token, self.opt.timeout
            )

    def partitions(self) -> list[_HeightRange]:
        lo, hi, step = (
            self.opt.start_height,
            self.opt.end_height + 1,
            self.opt.blocks_per_partition,
        )
        return [_HeightRange(s, min(s + step, hi)) for s in range(lo, hi, step)]

    def read(self, partition: _HeightRange) -> Iterator[Tuple[int, str]]:
        yield from _fetch_ordered(
            self.opt.base_url,
            list(range(partition.start, partition.end)),
            self.opt.token,
            self.opt.timeout,
            self.opt.num_threads,
        )


class NeardataStreamReader(DataSourceStreamReader):
    """Tail the chain: offset = next height to fetch; each micro-batch
    covers at most max_blocks_per_batch heights up to the final tip.

    Partition-based (NOT SimpleDataSourceStreamReader): offset planning
    (``initialOffset``/``latestOffset``/``partitions``) runs on the driver
    and moves only height numbers; the block payloads are fetched by
    ``read(partition)`` on EXECUTORS, one ordered height slice per task —
    the same executor-parallel shape as the batch path, so no micro-batch
    is ever materialized through a single driver process.

    Offset protocol: ``latestOffset`` receives no start, so the reader
    tracks a base position ``_base`` (= every height below it is already
    planned or committed). ``latestOffset`` is IDEMPOTENT -- it computes
    ``min(tip+1, base + cap)`` without advancing ``_base`` (Spark may call
    it more than once before planning a batch, and on a fresh query it is
    called BEFORE ``initialOffset``); the base advances only when a batch
    is actually planned (``partitions``, which receives the authoritative
    checkpointed start) or committed (``commit``). When ``_base`` is still
    unknown, the base falls back to the resolved start height -- correct
    for fresh queries; a RESTARTED query whose checkpoint is ahead of that
    start gets one empty batch (``partitions`` returns [] for hi <= lo and
    re-syncs ``_base`` from the checkpointed start), after which the cap
    advances from the true position. A post-restart offset regression
    re-reads an already-processed range at most once -- the source is
    at-least-once by contract and every downstream sink dedups
    (ReplacingMergeTree / assembler seen-set).
    """

    def __init__(self, options: dict):
        self.opt = _Options(options)
        self._base: int | None = None  # heights below this are planned/done

    def _resolved_start(self) -> int:
        if self.opt.start_height is not None:
            return self.opt.start_height
        return fetch_first_block_height(
            self.opt.base_url, self.opt.token, self.opt.timeout
        )

    def initialOffset(self) -> dict:
        start = self._resolved_start()
        self._base = max(self._base or 0, start)
        return {"height": start}

    def latestOffset(self) -> dict:
        tip = fetch_last_block_height(self.opt.base_url, self.opt.token, self.opt.timeout)
        base = self._base if self._base is not None else self._resolved_start()
        # backpressure: the fetcher's bounded-channel analog (main.rs:91)
        end = max(min(tip + 1, base + self.opt.max_blocks_per_batch), base)
        return {"height": end}

    def partitions(self, start: dict, end: dict) -> list[_HeightRange]:
        lo, hi = start["height"], end["height"]
        self._base = max(self._base or 0, lo, hi)
        step = self.opt.blocks_per_partition
        return [_HeightRange(s, min(s + step, hi)) for s in range(lo, hi, step)]

    def read(self, partition: _HeightRange) -> Iterator[Tuple[int, str]]:
        # executor-side: concurrent GETs, yielded in height order
        yield from _fetch_ordered(
            self.opt.base_url,
            list(range(partition.start, partition.end)),
            self.opt.token,
            self.opt.timeout,
            self.opt.num_threads,
        )

    def commit(self, end: dict) -> None:
        self._base = max(self._base or 0, end["height"])


class NeardataBlockSource(DataSource):
    """``spark.read.format("neardata")`` / ``spark.readStream.format(
    "neardata")`` with options url, start_height, end_height, num_threads,
    auth_bearer_token, blocks_per_partition, max_blocks_per_batch.

    Register once per session:
        spark.dataSource.register(NeardataBlockSource)
    """

    @classmethod
    def name(cls) -> str:
        return "neardata"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema: StructType) -> NeardataBatchReader:
        return NeardataBatchReader(self.options)

    def streamReader(self, schema: StructType) -> NeardataStreamReader:
        return NeardataStreamReader(self.options)


def parse_blocks(raw: DataFrame) -> DataFrame:
    """(block_height, block_json) → full BLOCK_SCHEMA rows. from_json runs
    JVM-side, so the Python boundary carries strings only once."""
    from clickhouse_provider_spark.schemas import BLOCK_SCHEMA

    return raw.select(
        F.from_json("block_json", BLOCK_SCHEMA).alias("b")
    ).select("b.*")
