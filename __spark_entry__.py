"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over :mod:`clickhouse_provider_spark`: the query surface lives
in ``clickhouse_provider_spark/plans/catalog.py`` (serving-layer classes from
SURVEY.md §2C, the analytic surface, and the LLM-data-pipeline layer); this
module exposes it in the driver's ``entry()`` / ``queries()`` /
``oracle_sql()`` shape.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from clickhouse_provider_spark.plans import CATALOG  # noqa: E402
from clickhouse_provider_spark.session import load_tables  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: regional-revenue multiway join (broadcast dims +
    single fact-fact shuffle) on /root/testdata/sf0.001."""
    spec = CATALOG["q5_regional_revenue"]
    return spec.build(spark, load_tables(spark, "/root/testdata/sf0.001"))


def _make(name: str) -> Callable[[SparkSession, str], DataFrame]:
    def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
        spec = CATALOG[name]
        return spec.build(spark, load_tables(spark, sf_dir))

    runner.__name__ = f"query_{name}"
    runner.__doc__ = CATALOG[name].doc
    return runner


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ LLM layer)."""
    return {name: _make(name) for name in CATALOG}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle for every SQL-expressible query; entries with
    ``oracle=None`` (genuinely non-SQL ops) are omitted → rows-only check."""
    return {
        name: spec.oracle for name, spec in CATALOG.items() if spec.oracle is not None
    }
