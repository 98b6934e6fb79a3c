import os
import sys
import tempfile
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Put the test temp root on tmpfs (round 15, VERDICT task 1): every
# structured-streaming micro-batch fsyncs its offset/commit/state files
# under tmp_path, and on this host /tmp is virtio-DISK-backed while
# /dev/shm is a 126 GiB tmpfs — the per-batch fsync wall was a large
# slice of the 54-minute suite. Pure test infrastructure: product code
# paths and the bench are untouched, and an explicit TMPDIR from the
# caller still wins. The suite's artifacts are sf0.001-scale (MBs);
# pytest's basetemp rotation (keeps 3) bounds tmpfs growth.
if os.path.isdir("/dev/shm") and "TMPDIR" not in os.environ:
    _shm_tmp = "/dev/shm/pytest_tmp"
    os.makedirs(_shm_tmp, exist_ok=True)
    os.environ["TMPDIR"] = _shm_tmp
    tempfile.tempdir = _shm_tmp

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
