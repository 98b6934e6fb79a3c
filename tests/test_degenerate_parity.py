"""Degenerate-input cross-engine parity for the statistical family.

Real 100 TB data WILL contain single-row groups, constant columns, and
absent categories. Two failure modes hide there: Spark 4's ANSI mode
throws DIVIDE_BY_ZERO (even for doubles) where DuckDB returns inf, and
DuckDB's sqrt ERRORS on the epsilon-negative variances that
``n*sxx - sx*sx`` produces for constant columns where Spark returns NaN.
Every entry guards those paths (nullif denominators, greatest-clamped
sqrt arguments, coalesced absent-group counts), so both engines must
yield identical rows — NULL statistics, never crashes — on this
deliberately degenerate fixture: a single-event series, a
constant-value/tied-timestamp pair, one sample class missing entirely,
and a one-row contingency table."""

import pytest

from clickhouse_provider_spark.plans import CATALOG
from tools.parity import compare

ENTRIES = [
    "bounding_ratio",
    "simple_linear_regression",
    "spearman_rank_corr",
    "ttest_student_welch",
    "mann_whitney_u",
    "ks_test_2samp",
    "anova_f",
    "skew_kurtosis",
    "cramers_v",
    "association_measures",
    "covar_corr_matrix",
    "quantile_exact_weighted",
    "delta_sum_increases",
    "max_intersections",
    "interval_length_sum",
    "moving_window_aggs",
    "exp_time_decayed_avg",
    "uniq_up_to",
    "entropy_rank_profile",
    "quantile_timing",
    "sparkbar_render",
]


@pytest.fixture(scope="module")
def degenerate(spark, tmp_path_factory):
    import duckdb

    d = tmp_path_factory.mktemp("degenerate")
    rows = [
        (0, 1_000_000_000, 7, "solo", 5.25),   # single-event series
        (1, 2_000_000_000, 8, "pair", 3.00),   # tied ts + constant value
        (2, 2_000_000_000, 9, "pair", 3.00),
        (3, 3_000_000_000, 9, "click", 1.00),  # 'view' absent entirely
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, value double"
    )
    ev.coalesce(1).write.parquet(str(d / "events.parquet"))
    li = spark.createDataFrame(
        [("A", "F", 1.0, 10.0, 0.05)],  # 1-row, 1x1 contingency table
        "l_returnflag string, l_linestatus string, l_quantity double,"
        " l_extendedprice double, l_discount double",
    )
    li.coalesce(1).write.parquet(str(d / "lineitem.parquet"))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT event_id,"
        " make_timestamp(ts // 1000) AS ts, user_id, event_type, value"
        f" FROM read_parquet('{d}/events.parquet/*.parquet')"
    )
    con.execute(
        "CREATE VIEW lineitem AS SELECT *"
        f" FROM read_parquet('{d}/lineitem.parquet/*.parquet')"
    )
    return {"events": ev, "lineitem": li}, con


@pytest.mark.parametrize("name", ENTRIES)
def test_degenerate_inputs_stay_cross_engine_consistent(name, spark, degenerate):
    tables, con = degenerate
    spec = CATALOG[name]
    sdf = spec.build(spark, tables).toPandas()  # must not raise (ANSI-safe)
    odf = con.execute(spec.oracle).df()  # must not raise (no sqrt(<0))
    assert not compare(sdf, odf)
