"""Block sources: batch + streaming readers for BlockWithTxHashes JSON."""

from clickhouse_provider_spark.sources.blocks import block_stream, read_blocks

__all__ = ["read_blocks", "block_stream"]
