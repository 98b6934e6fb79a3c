"""Serving-layer query plans (SURVEY.md §2C) + analytic query surface."""

from clickhouse_provider_spark.plans.catalog import CATALOG, QuerySpec

__all__ = ["CATALOG", "QuerySpec"]
