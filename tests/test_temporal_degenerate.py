"""Degenerate-input cross-engine parity for the temporal / sequence /
windowing families (catalog2/6/7/8/9).

The fixture stresses what sparse real-world partitions look like:
single-event series, tied timestamps, a chain that never starts (no
'signup'), absent event types, and — the case that caught a real oracle
bug — timestamps within 45 minutes of the epoch, where hopping windows
have NEGATIVE start times. Spark's window() emits those windows; the
sliding_event_counts oracle used to drop them with a slot>=0 clause
(fixed in round 8). Every entry must yield identical rows on both
engines; empty results (funnels with no stage-1 events) must be empty
on BOTH."""

import pytest

from clickhouse_provider_spark.plans import CATALOG
from tools.parity import compare

ENTRIES = [
    # hopping/tumbling/session windows
    "sliding_event_counts",
    "tumbling_event_counts",
    "user_sessions",
    "session_gaps",
    # funnels: no 'signup' events at all -> empty on both engines
    "window_funnel",
    "window_funnel_exact",
    "window_funnel_strict_increase",
    "window_funnel_strict_order",
    "window_funnel_strict_dedup",
    # sequences
    "seq_match_user_paths",
    "seq_match_timed",
    "seq_next_node",
    "seq_next_node_backward",
    "seq_next_node_last_match",
    "argmax_latest_event",
    # temporal joins / rollups
    "asof_last_purchase",
    "range_join_1h_windows",
    "hypertable_rollup_1h1d1w",
    "scd2_intervals",
    "retention_cohorts",
    "gap_fill_interpolate",
    # rendering / approx over sparse series
    "topk_weighted",
    "approx_topk_heavy_hitters",
    "lttb_downsample",
    "histogram_adaptive",
    "sparkbar_render",
    "exp_time_decayed_avg",
    "group_array_caps",
    # sketch / combinator families: theta used to emit ZERO rows when a
    # segment type was absent (groupBy-then-filter side; fixed round 8)
    "theta_set_algebra",
    "uniq_state_merge_rollup",
    "quantile_state_merge_rollup",
    "approx_distinct_users",
    "approx_value_quantiles",
    "value_percentiles",
    "sum_map_props",
    "min_max_map_props",
    "bitwise_aggregates",
    "running_total",
    "daily_counts",
    "range_frame_window",
    "null_handling",
    "chain_continuity",
]


@pytest.fixture(scope="module")
def degenerate_events(spark, tmp_path_factory):
    import duckdb

    d = tmp_path_factory.mktemp("degenerate_ev")
    # ts in NANOSECONDS (the canonical LongType convention): 1-3 s after
    # the epoch, so hopping windows have negative starts
    ev = spark.createDataFrame(
        [
            (0, 1_000_000_000, 7, "solo", 5.25),  # single-event series
            (1, 2_000_000_000, 8, "pair", 3.00),  # tied ts + constant value
            (2, 2_000_000_000, 9, "pair", 3.00),
            (3, 3_000_000_000, 9, "click", 1.00),  # no 'signup' anywhere
        ],
        "event_id long, ts long, user_id long, event_type string, value double",
    )
    ev.coalesce(1).write.parquet(str(d / "events.parquet"))
    tables = {"events": spark.read.parquet(str(d / "events.parquet"))}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT event_id,"
        " make_timestamp(ts // 1000) AS ts, user_id, event_type, value"
        f" FROM read_parquet('{d}/events.parquet/*.parquet')"
    )
    return tables, con


@pytest.mark.parametrize("name", ENTRIES)
def test_degenerate_inputs_stay_cross_engine_consistent(
    name, spark, degenerate_events
):
    tables, con = degenerate_events
    spec = CATALOG[name]
    sdf = spec.build(spark, tables).toPandas()
    odf = con.execute(spec.oracle).df()
    assert not compare(sdf, odf)


@pytest.mark.parametrize(
    "name", ["json_props_stats", "pii_scrub_props", "sum_map_props",
             "min_max_map_props"]
)
def test_dirty_json_props_stay_cross_engine_consistent(
    name, spark, tmp_path_factory
):
    """Real props columns carry NULLs, empty strings, truncated JSON,
    arrays-not-objects, and wrong-typed values. DuckDB's json_extract
    ERRORS on invalid JSON and Spark's ANSI cast THROWS on non-numeric
    values — json_props_stats guards both (json_valid + try_cast, round
    8); the map/PII entries were already tolerant. Identical rows on
    both engines, never a crash."""
    import duckdb

    d = tmp_path_factory.mktemp("dirty_props")
    rows = [
        (0, 1_000_000_000, 7, "solo", 5.25, None),
        (1, 2_000_000_000, 8, "pair", 3.00, ""),
        (2, 2_000_000_000, 9, "pair", 3.00, "{}"),
        (3, 3_000_000_000, 9, "click", 1.00, "{not json"),
        (4, 4_000_000_000, 7, "click", 2.00, '{"k":"x"}'),
        (5, 5_000_000_000, 8, "view", 0.00, '{"k":3}'),
        (6, 6_000_000_000, 8, "view", 0.00, "[1,2,3]"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts long, user_id long, event_type string,"
        " value double, props string",
    )
    ev.coalesce(1).write.parquet(str(d / "events.parquet"))
    tables = {"events": spark.read.parquet(str(d / "events.parquet"))}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT event_id,"
        " make_timestamp(ts // 1000) AS ts, user_id, event_type, value,"
        f" props FROM read_parquet('{d}/events.parquet/*.parquet')"
    )
    spec = CATALOG[name]
    sdf = spec.build(spark, tables).toPandas()
    odf = con.execute(spec.oracle).df()
    assert not compare(sdf, odf)
