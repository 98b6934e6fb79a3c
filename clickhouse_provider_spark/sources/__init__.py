"""Block sources: batch + streaming readers for BlockWithTxHashes JSON,
plus the HTTP block-fetcher data source (format "neardata")."""

from clickhouse_provider_spark.sources.blocks import block_stream, read_blocks
from clickhouse_provider_spark.sources.http_fetcher import (
    NeardataBlockSource,
    fetch_first_block_height,
    fetch_last_block_height,
    parse_blocks,
    resolve_start_height,
)

__all__ = [
    "read_blocks",
    "block_stream",
    "NeardataBlockSource",
    "fetch_first_block_height",
    "fetch_last_block_height",
    "parse_blocks",
    "resolve_start_height",
]
