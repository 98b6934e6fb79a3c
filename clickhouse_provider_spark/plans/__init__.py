"""Serving-layer query plans (SURVEY.md §2C) + analytic query surface."""

from clickhouse_provider_spark.plans.catalog import CATALOG, QuerySpec
from clickhouse_provider_spark.plans import catalog2, catalog3, catalog4, catalog_stats, llm_catalog  # noqa: F401  (register entries)

__all__ = ["CATALOG", "QuerySpec"]
