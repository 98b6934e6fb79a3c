"""External-database sink: the reference's batched ClickHouse insert path
(click.rs:50-85) re-expressed for Spark streaming.

The reference sinks every table into ClickHouse through
``insert_rows_with_retry``: up to 10 attempts, exponential backoff from
100 ms doubling each retry, and a ``CLICKHOUSE_SKIP_COMMIT=true`` dry-run
gate that runs the whole pipeline without committing (click.rs:57-85).
Connection parameters come from ``DATABASE_URL/USER/PASSWORD/DATABASE``
(click.rs:42-48); ``verify_connection`` is ``SELECT 1`` (click.rs:36-39)
and resume lookup is ``SELECT max(col) FROM table`` (click.rs:27-34).

Spark mapping:

- the batched insert is a ``foreachBatch`` handler — one handler call per
  micro-batch, one ``insert_with_retry`` per output table (the reference's
  ``min_batch`` buffering is ``maxFilesPerTrigger`` upstream: a micro-batch
  IS the batch)
- the default transport is Spark's JDBC writer, which inserts partitions
  concurrently from the executors — the analog of the reference's
  MAX_COMMIT_HANDLERS=3 async commit pool (click.rs:11), except the pool
  size is the write parallelism (``df.coalesce(n)`` to bound it)
- retry wraps the whole per-table insert, exactly like the reference: a
  mid-insert failure retries the batch, and the target's own dedup (the
  ReplacingMergeTree key) absorbs partial re-inserts — same idempotency
  story as the parquet layer's dedup-on-read view
- ``insert_fn`` is injectable so tests (and non-JDBC protocols, e.g. the
  ClickHouse HTTP interface) can swap the transport without touching the
  retry semantics

At 100 TB nothing here is a bottleneck by construction: the sink never
collects to the driver — `insert_with_retry` hands the *DataFrame* to the
transport, and the JDBC path streams each partition from its executor.
"""

from __future__ import annotations

import os
import re
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

# click.rs:59-61 — 10 attempts, 100 ms initial delay, ×2 per retry
MAX_RETRIES = 10
INITIAL_DELAY_S = 0.1
BACKOFF_MULTIPLIER = 2.0

SKIP_COMMIT_ENV = "CLICKHOUSE_SKIP_COMMIT"  # click.rs:63

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_.]*$")


def _ident(name: str) -> str:
    if not _IDENT.match(name):
        raise ValueError(f"invalid SQL identifier: {name!r}")
    return name


@dataclass
class ExternalSink:
    """Batched external-DB sink with bounded retry/backoff and a dry-run
    gate (reference ClickDB + insert_rows_with_retry, click.rs:14-85).

    ``url/user/password/database`` default to the reference's env contract
    (DATABASE_URL, DATABASE_USER, DATABASE_PASSWORD, DATABASE_DATABASE,
    click.rs:42-48). ``insert_fn(df, table)`` overrides the JDBC transport.
    """

    url: str | None = None
    user: str | None = None
    password: str | None = None
    database: str | None = None
    driver: str | None = None  # e.g. com.clickhouse.jdbc.ClickHouseDriver
    insert_fn: Callable[[DataFrame, str], None] | None = None
    max_retries: int = MAX_RETRIES
    initial_delay_s: float = INITIAL_DELAY_S
    backoff_multiplier: float = BACKOFF_MULTIPLIER
    sleep: Callable[[float], None] = time.sleep
    attempts_log: list[tuple[str, int, str]] = field(default_factory=list)

    def __post_init__(self) -> None:
        self.url = self.url or os.environ.get("DATABASE_URL")
        self.user = self.user or os.environ.get("DATABASE_USER")
        self.password = self.password or os.environ.get("DATABASE_PASSWORD")
        self.database = self.database or os.environ.get("DATABASE_DATABASE")

    # -- transport ----------------------------------------------------------

    def _jdbc_writer(self, df: DataFrame, table: str):
        if not self.url:
            raise RuntimeError(
                "no JDBC url: pass url= or set DATABASE_URL (click.rs:44)"
            )
        w = (
            df.write.format("jdbc")
            .option("url", self.url)
            .option("dbtable", _ident(table))
            .mode("append")
        )
        for k, v in (
            ("user", self.user),
            ("password", self.password),
            ("driver", self.driver),
        ):
            if v:
                w = w.option(k, v)
        return w

    def _insert_once(self, df: DataFrame, table: str) -> None:
        # gate checked per attempt, inside the closure, like click.rs:63
        if os.environ.get(SKIP_COMMIT_ENV) == "true":
            return
        if self.insert_fn is not None:
            self.insert_fn(df, table)
        else:
            self._jdbc_writer(df, table).save()

    # -- the retry loop (click.rs:50-85) ------------------------------------

    def insert_with_retry(self, df: DataFrame, table: str) -> None:
        # validate the identifier BEFORE the retry loop: a malformed table
        # name is not a transient transport failure — retrying it just
        # burns the full backoff schedule (~51 s at the defaults) before
        # surfacing the same ValueError
        _ident(table)
        delay = self.initial_delay_s
        for attempt in range(self.max_retries):
            try:
                self._insert_once(df, table)
                return
            except Exception as err:  # noqa: BLE001 — transport-agnostic
                self.attempts_log.append((table, attempt, str(err)))
                if attempt == self.max_retries - 1:
                    raise
                self.sleep(delay)
                delay *= self.backoff_multiplier

    # -- ClickDB helpers ----------------------------------------------------

    def verify_connection(self, spark: SparkSession) -> None:
        """``SELECT 1`` round-trip (click.rs:36-39)."""
        self._query(spark, "SELECT 1 AS ok").collect()

    def max(self, spark: SparkSession, column: str, table: str) -> int:
        """Resume-point lookup: ``SELECT max(column) FROM table``
        (click.rs:27-34) — the transactions/actions daemons start from
        max(block_height) of their last-written table (main.rs:118-127)."""
        rows = self._query(
            spark,
            f"SELECT max({_ident(column)}) AS h FROM {_ident(table)}",
        ).collect()
        return int(rows[0]["h"] or 0)

    def _query(self, spark: SparkSession, sql: str) -> DataFrame:
        if not self.url:
            raise RuntimeError(
                "no JDBC url: pass url= or set DATABASE_URL (click.rs:44)"
            )
        r = (
            spark.read.format("jdbc")
            .option("url", self.url)
            .option("query", sql)
        )
        for k, v in (
            ("user", self.user),
            ("password", self.password),
            ("driver", self.driver),
        ):
            if v:
                r = r.option(k, v)
        return r.load()

    # -- streaming integration ----------------------------------------------

    def foreach_batch(
        self, tables_fn: Callable[[DataFrame], dict[str, DataFrame]]
    ) -> Callable[[DataFrame, int], None]:
        """``foreachBatch`` handler: run ``tables_fn`` over the micro-batch
        and insert every resulting table with retry. Deployment path for a
        real ClickHouse: pass the clickhouse JDBC driver jar via
        ``spark.jars`` and ``driver=com.clickhouse.jdbc.ClickHouseDriver``.
        """

        def handler(batch_df: DataFrame, batch_id: int) -> None:
            for name, df in tables_fn(batch_df).items():
                self.insert_with_retry(df, name)

        return handler
