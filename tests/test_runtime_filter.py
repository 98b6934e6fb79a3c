"""Runtime bloom-filter semi-join: exactness under any sizing (false
positives die in the verify join), real pruning, codegen-only predicate."""

import pytest
from pyspark.sql import functions as F

from clickhouse_provider_spark.operators import runtime_filter


@pytest.fixture(scope="module")
def facts(spark, tables):
    return tables["lineitem"], (
        tables["supplier"]
        .join(
            tables["nation"].filter(F.col("n_name") == "NATION_9"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )


def _plain_semi(fact, dim):
    keys = dim.select(F.col("s_suppkey").alias("l_suppkey")).distinct()
    return fact.join(keys, "l_suppkey", "left_semi")


def test_bloom_semi_join_equals_plain_semi_join(spark, facts):
    fact, dim = facts
    got = runtime_filter.bloom_semi_join(fact, dim, "l_suppkey", "s_suppkey")
    expected = _plain_semi(fact, dim)
    assert got.count() == expected.count()
    assert got.exceptAll(expected).count() == 0


def test_exact_even_with_tiny_bitset(spark, facts):
    """m_bits=64 forces a high false-positive rate — the verify join must
    still make the result exact."""
    fact, dim = facts
    got = runtime_filter.bloom_semi_join(
        fact, dim, "l_suppkey", "s_suppkey", m_bits=64, k=2
    )
    expected = _plain_semi(fact, dim)
    assert got.count() == expected.count()
    assert got.exceptAll(expected).count() == 0


def test_prefilter_actually_prunes(spark, facts):
    fact, dim = facts
    words = runtime_filter.build_bloom_words(dim, "s_suppkey")
    pre = fact.filter(
        runtime_filter.bloom_might_contain(F.col("l_suppkey"), words, 8192)
    )
    n_fact, n_pre = fact.count(), pre.count()
    n_match = _plain_semi(fact, dim).count()
    assert n_match <= n_pre < n_fact
    # 1%-FP sizing over ~tens of keys: the pass-through set should be
    # close to the true match set, far from the full table
    assert n_pre < n_fact * 0.5


def test_predicate_is_codegen_only(spark, facts):
    fact, dim = facts
    words = runtime_filter.build_bloom_words(dim, "s_suppkey")
    pre = fact.filter(
        runtime_filter.bloom_might_contain(F.col("l_suppkey"), words, 8192)
    )
    plan = pre._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Exchange" not in plan  # the prefilter is map-side by construction
