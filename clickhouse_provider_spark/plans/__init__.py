"""Serving-layer query plans (SURVEY.md §2C) + analytic query surface."""

from clickhouse_provider_spark.plans.catalog import CATALOG, QuerySpec
from clickhouse_provider_spark.plans import llm_catalog  # noqa: F401  (registers LLM entries)

__all__ = ["CATALOG", "QuerySpec"]
