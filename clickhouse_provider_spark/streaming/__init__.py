"""Structured Streaming wrappers for both pipeline modes."""

from clickhouse_provider_spark.streaming.pipeline import (
    TransactionsStream,
    run_actions_stream,
    run_transactions_stream,
)

__all__ = ["run_actions_stream", "run_transactions_stream", "TransactionsStream"]
