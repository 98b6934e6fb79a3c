import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
ORACLE_SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from clickhouse_provider_spark.session import get_spark

    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck(request):
    from tools.parity import make_duckdb

    return make_duckdb(ORACLE_SF_DIR)


@pytest.fixture(scope="session")
def tables(spark):
    from clickhouse_provider_spark.session import load_tables

    return load_tables(spark, ORACLE_SF_DIR)
