"""Semantics + physical-plan tests for the temporal operators (as-of join,
binned range join, hierarchical hypertable rollup) and deterministic
sampling. Oracle parity for the catalog entries runs separately in
test_oracle_parity.py; these tests pin the EDGE semantics (ties, no-match,
tolerance, bin-boundary spans, empty intervals) on tiny handcrafted frames
where the expected answer is computable by eye, plus the plan shapes that
make the operators scale."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from clickhouse_provider_spark.operators.sampling import (
    fraction_to_hex_threshold,
    hash_fraction_sample,
    reservoir_per_group,
)
from clickhouse_provider_spark.operators.temporal import (
    asof_join,
    hypertable_rollup,
    range_join_binned,
)
from clickhouse_provider_spark.plans import CATALOG
from clickhouse_provider_spark.session import load_tables
from tests.conftest import ORACLE_SF_DIR


def _left(spark):
    return spark.createDataFrame(
        [
            Row(id=1, k="a", ts=100),
            Row(id=2, k="a", ts=200),
            Row(id=3, k="a", ts=50),  # before any right row
            Row(id=4, k="b", ts=100),  # key with no right rows at all
        ]
    )


def _right(spark):
    return spark.createDataFrame(
        [
            Row(rid=10, k="a", ts=100, v=1.0),  # simultaneous with left id=1
            Row(rid=11, k="a", ts=150, v=2.0),
            Row(rid=12, k="a", ts=150, v=3.0),  # tie on ts: higher rid wins
        ]
    )


class TestAsofJoin:
    def _run(self, spark, **kw):
        out = asof_join(
            _left(spark),
            _right(spark),
            key="k",
            left_ts="ts",
            right_ts="ts",
            value_cols=["v"],
            tiebreak="rid",
            **kw,
        )
        return {r["id"]: r for r in out.collect()}

    def test_backward_inclusive_and_ties(self, spark):
        rows = self._run(spark)
        # id=1 at ts=100: simultaneous right row matches (inclusive)
        assert rows[1]["matched_ts"] == 100 and rows[1]["matched_v"] == 1.0
        # id=2 at ts=200: two right rows tie at ts=150 -> highest tiebreak
        assert rows[2]["matched_ts"] == 150 and rows[2]["matched_v"] == 3.0
        # id=3 at ts=50: no prior right row
        assert rows[3]["matched_ts"] is None and rows[3]["matched_v"] is None
        # id=4 key 'b': right side empty for the key
        assert rows[4]["matched_ts"] is None and rows[4]["matched_v"] is None

    def test_tolerance_nulls_stale_matches(self, spark):
        rows = self._run(spark, tolerance_us=40)
        # id=2 at ts=200: last right at 150, age 50 > 40 -> nulled
        assert rows[2]["matched_ts"] is None and rows[2]["matched_v"] is None
        # id=1 at ts=100: age 0 <= 40 -> kept
        assert rows[1]["matched_v"] == 1.0

    def test_all_left_columns_preserved(self, spark):
        out = asof_join(
            _left(spark),
            _right(spark),
            key="k",
            left_ts="ts",
            right_ts="ts",
            value_cols=["v"],
            tiebreak="rid",
        )
        assert out.columns == ["id", "k", "ts", "matched_ts", "matched_v"]
        assert out.count() == 4

    def test_shared_value_column_does_not_leak(self, spark):
        # left and right BOTH have a column named v: left's values must not
        # pollute the ignorenulls window (the events-joined-to-events case).
        left = spark.createDataFrame([Row(id=1, k="a", ts=200, v=99.0)])
        out = asof_join(
            left,
            _right(spark).withColumn("id", F.col("rid")),
            key="k",
            left_ts="ts",
            right_ts="ts",
            value_cols=["v"],
            tiebreak="id",
        ).collect()[0]
        assert out["matched_v"] == 3.0  # right's tie-winner, not left's 99.0
        assert out["v"] == 99.0  # left's own column untouched

    def test_single_shuffle_plan(self, spark, tables):
        plan = CATALOG["asof_last_purchase"].build(spark, tables)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # union + one window: exactly one shuffle on the key (plus nothing else)
        assert plan.count("Exchange hashpartitioning") == 1


class TestRangeJoinBinned:
    def _intervals(self, spark):
        return spark.createDataFrame(
            [
                Row(iid=1, s=100, e=250),  # spans bins 1 and 2 (width 100)
                Row(iid=2, s=300, e=300),  # empty: e <= s -> no matches
                Row(iid=3, s=0, e=100),  # end-exclusive boundary
            ]
        )

    def _events(self, spark):
        return spark.createDataFrame(
            [Row(eid=1, ts=100), Row(eid=2, ts=249), Row(eid=3, ts=250), Row(eid=4, ts=99)]
        )

    def test_boundary_and_empty_semantics(self, spark):
        out = range_join_binned(
            self._events(spark), "ts", self._intervals(spark), "s", "e", 100
        )
        got = sorted((r["iid"], r["eid"]) for r in out.collect())
        # iid=1 [100,250): eids 1,2 in; eid 3 at 250 excluded (end-exclusive)
        # iid=2 empty; iid=3 [0,100): eid 4 only (eid 1 at 100 excluded)
        assert got == [(1, 1), (1, 2), (3, 4)]

    def test_rejects_nonpositive_bin(self, spark):
        with pytest.raises(ValueError):
            range_join_binned(
                self._events(spark), "ts", self._intervals(spark), "s", "e", 0
            )

    def test_no_nested_loop_join(self, spark, tables):
        plan = CATALOG["range_join_1h_windows"].build(spark, tables)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestHypertableRollup:
    def test_hierarchical_equals_direct(self, spark):
        df = spark.range(1000).select(
            (F.col("id") * 7919 % 100000).alias("ts"),
            (F.col("id") % 3).cast("string").alias("g"),
            F.col("id").cast("decimal(18,6)").alias("v"),
        )
        out = hypertable_rollup(df, "ts", ["g"], F.col("v"), [("x10", 10), ("x100", 100), ("x1000", 1000)])
        direct = {
            (lab, w): {
                (r["bucket_us"], r["g"]): (r["n"], r["sum_value"])
                for r in df.groupBy(
                    F.expr(f"(ts DIV {w}) * {w}").alias("bucket_us"), "g"
                )
                .agg(F.count(F.lit(1)).alias("n"), F.sum("v").cast("double").alias("sum_value"))
                .collect()
            }
            for lab, w in [("x10", 10), ("x100", 100), ("x1000", 1000)]
        }
        for r in out.collect():
            exp = direct[(r["resolution"], {"x10": 10, "x100": 100, "x1000": 1000}[r["resolution"]])]
            assert exp[(r["bucket_us"], r["g"])] == (r["n"], r["sum_value"])

    def test_rejects_nonmultiple_resolutions(self, spark):
        df = spark.range(10).select(F.col("id").alias("ts"), F.lit("g").alias("g"), F.col("id").cast("decimal(18,6)").alias("v"))
        with pytest.raises(ValueError):
            hypertable_rollup(df, "ts", ["g"], F.col("v"), [("a", 10), ("b", 25)])

    def test_finer_levels_reused_not_rescanned(self, spark, tables):
        # hierarchical rollup: day reuses hour's shuffle output and week
        # reuses day's (ReusedExchange x2 in the final adaptive plan) —
        # the raw-data aggregation happens once, vs 3 full scans for the
        # oracle's direct per-resolution form.
        df = CATALOG["hypertable_rollup_1h1d1w"].build(spark, tables)
        df.collect()  # AQE resolves exchange reuse at execution time
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("ReusedExchange") >= 2


class TestSampling:
    def test_threshold_exactness(self):
        assert fraction_to_hex_threshold(0.0) == "00000000"
        assert fraction_to_hex_threshold(0.5) == "80000000"
        assert fraction_to_hex_threshold(1.0) == "ffffffff"
        with pytest.raises(ValueError):
            fraction_to_hex_threshold(1.5)

    def test_stratified_deterministic_and_rate(self, spark):
        df = spark.range(20000).select(
            F.col("id").alias("k"),
            (F.col("id") % 2 == 0).cast("string").alias("s"),
        )
        out = hash_fraction_sample(df, "k", "salt1", {"true": 0.25, "false": 1.0}, "s")
        a = sorted(r["k"] for r in out.collect())
        b = sorted(r["k"] for r in out.collect())
        assert a == b  # reproducible
        n_true = sum(1 for r in out.collect() if r["s"] == "true")
        assert abs(n_true / 10000 - 0.25) < 0.02  # Bernoulli rate holds
        n_false = sum(1 for r in out.collect() if r["s"] == "false")
        assert n_false == 10000  # fraction 1.0 keeps ALL rows

    def test_stratified_is_map_only(self, spark, tables):
        plan = CATALOG["sample_stratified"].build(spark, tables)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # pure filter+project: zero shuffle

    def test_reservoir_exact_k_and_rank(self, spark):
        df = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") % 4).cast("string").alias("g")
        )
        out = reservoir_per_group(df, "g", "k", "rs", 7).collect()
        by_g = {}
        for r in out:
            by_g.setdefault(r["g"], []).append(r["sample_rank"])
        assert set(by_g) == {"0", "1", "2", "3"}
        for ranks in by_g.values():
            assert sorted(ranks) == [1, 2, 3, 4, 5, 6, 7]

    def test_reservoir_k_exceeds_group(self, spark):
        df = spark.range(3).select(F.col("id").alias("k"), F.lit("g").alias("g"))
        assert reservoir_per_group(df, "g", "k", "rs", 10).count() == 3


class TestFunnelLevels:
    def _run(self, spark, rows, window_us):
        from pyspark.sql import Row
        from clickhouse_provider_spark.operators.temporal import funnel_levels

        df = spark.createDataFrame(
            [Row(u=u, eid=i, ts=ts, et=et) for i, (u, ts, et) in enumerate(rows)]
        )
        out = funnel_levels(
            df,
            key="u",
            ts="ts",
            order_col="eid",
            stage_conds=[F.col("et") == "s", F.col("et") == "c", F.col("et") == "p"],
            window_us=window_us,
        )
        return {r["u"]: r["level"] for r in out.collect()}

    def test_exact_beats_greedy(self, spark):
        # greedy chains from the EARLIEST signup (ts=0) and concludes the
        # purchase at ts=1000 is out of window; the exact semantics find
        # the chain (950, 960, 1000) within window=100
        rows = [
            (1, 0, "s"), (1, 10, "c"), (1, 950, "s"), (1, 960, "c"), (1, 1000, "p"),
        ]
        assert self._run(spark, rows, 100)[1] == 3

    def test_out_of_window_stops_at_reached_level(self, spark):
        rows = [(1, 0, "s"), (1, 50, "c"), (1, 1000, "p")]
        assert self._run(spark, rows, 100)[1] == 2  # purchase too late

    def test_order_matters(self, spark):
        # purchase BEFORE any click: no s<=c<=p chain
        rows = [(1, 0, "s"), (1, 10, "p"), (1, 20, "c")]
        assert self._run(spark, rows, 100)[1] == 2

    def test_no_stage1_absent(self, spark):
        rows = [(1, 0, "c"), (1, 10, "p")]
        assert self._run(spark, rows, 100) == {}

    def test_matches_oracle_semantics_on_catalog_entry(self, spark, tables, duck):
        from tools.parity import compare

        sdf = CATALOG["window_funnel_exact"].build(spark, tables).toPandas()
        odf = duck.execute(CATALOG["window_funnel_exact"].oracle).df()
        assert not compare(sdf, odf)

    def test_single_shuffle_plan(self, spark, tables):
        # the exact funnel is not just more correct than the greedy
        # 3-join form — it's cheaper: one exchange on user_id + window
        # columns, no joins at all
        plan = CATALOG["window_funnel_exact"].build(spark, tables)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1
        assert "Join" not in plan
