"""Physical-plan assertions: the declarative catalog queries must compile
to the plans the scale story depends on — pushdown reaching the scan,
broadcast joins for dimensions, TakeOrdered for pagination, partial
aggregation before the exchange."""

import pytest
from pyspark.sql import functions as F

from clickhouse_provider_spark.plans import CATALOG


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def build(name, spark, tables):
    return CATALOG[name].build(spark, tables)


def test_filter_pushdown_point_lookup(spark, tables):
    plan = plan_of(build("point_lookup", spark, tables))
    assert "PushedFilters" in plan
    assert "o_orderkey" in plan.split("PushedFilters:")[1].splitlines()[0]


def test_column_pruning_range_scan(spark, tables):
    plan = plan_of(build("range_scan", spark, tables))
    # scan must read only the 4 projected columns, not all 11
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_shipdate" not in read_schema and "l_extendedprice" not in read_schema


def test_pagination_avoids_global_sort(spark, tables):
    plan = plan_of(build("range_page", spark, tables))
    assert "TakeOrderedAndProject" in plan


def test_broadcast_join_q3(spark, tables):
    plan = plan_of(build("q3_shipping_priority", spark, tables))
    assert "BroadcastHashJoin" in plan


def test_q5_single_fact_shuffle(spark, tables):
    """q5's only sort-merge/shuffle join should be lineitem⋈orders; the
    four dimension joins must all broadcast."""
    plan = plan_of(build("q5_regional_revenue", spark, tables))
    assert plan.count("BroadcastHashJoin") >= 3


def test_partial_aggregation_q1(spark, tables):
    plan = plan_of(build("q1_pricing_summary", spark, tables))
    # two HashAggregate nodes (partial + final) around one exchange
    # (pre-AQE formatted plans don't render WholeStageCodegen spans)
    assert plan.count("HashAggregate") >= 2
    tree = plan.split("(1) Scan")[0]
    assert tree.count("Exchange") == 1


def test_semi_join_plan(spark, tables):
    plan = plan_of(build("semi_join_exists", spark, tables))
    assert "LeftSemi" in plan


def test_minhash_no_python_udf(spark, tables):
    """The dedup/minhash path must stay JVM-side (no BatchEvalPython /
    ArrowEvalPython in the plan)."""
    plan = plan_of(build("dedup_minhash_signatures", spark, tables))
    assert "EvalPython" not in plan


def test_similarity_topk_takeordered(spark, tables):
    plan = plan_of(build("similarity_topk", spark, tables))
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan


def test_q8_broadcast_dims_single_fact_shuffle(spark, tables):
    """q8 joins 7 tables; every dimension side is broadcast — the only
    shuffle join key is lineitem⋈orders on orderkey."""
    plan = plan_of(build("q8_market_share", spark, tables))
    assert plan.count("BroadcastHashJoin") >= 5


def test_q17_brand_filter_prunes_before_shuffle(spark, tables):
    """q17's per-part average runs only over the 16 Brand#9 parts: the
    broadcast semi-reduction must sit below the partkey aggregate."""
    plan = plan_of(build("q17_small_quantity_revenue", spark, tables))
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters" in plan


def test_q18_single_lineitem_aggregation(spark, tables):
    """Round 14: the HAVING pre-aggregate's per-order qty IS the output's
    total_qty (o_orderkey-unique groups), so the old re-scan + semi-join +
    re-sum is gone — ONE lineitem scan, no LeftSemi, orders/customer
    attached by broadcast."""
    plan = plan_of(build("q18_large_volume_customers", spark, tables))
    assert "LeftSemi" not in plan
    assert plan.count("lineitem") == 1
    assert "BroadcastHashJoin" in plan


def test_q21_no_self_join_exists(spark, tables):
    """The EXISTS/NOT-EXISTS pair is rewritten as one per-(order, supplier)
    aggregate read twice by an order-partitioned window (round 14) — no
    exploded l2/l3 self-joins, no second lineitem scan, no Expand."""
    plan = plan_of(build("q21_waiting_suppliers", spark, tables))
    assert "TakeOrderedAndProject" in plan
    # one (order, supplier) aggregate feeds both order-level totals via
    # the window — the textbook EXISTS/NOT-EXISTS translation scans the
    # fact table three times and self-joins it; the r13 form twice
    assert plan.count("lineitem") == 1
    # at most the one fact-fact shuffle; every dimension join broadcasts
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 2
    assert "Expand" not in plan


def test_q11_single_lineitem_scan(spark, tables):
    """The scalar total re-aggregates the checkpointed per-part relation; a
    naive plan scans lineitem twice (once more for the HAVING subquery).
    After the eager checkpoint the final plan reads the materialized
    relation on both sides — lineitem appears at most once."""
    plan = plan_of(build("q11_important_parts", spark, tables))
    assert plan.count("lineitem") <= 1
    assert "BroadcastNestedLoopJoin" in plan  # scalar threshold broadcast


def test_q16_broadcast_anti_join(spark, tables):
    plan = plan_of(build("q16_supplier_concentration", spark, tables))
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan


def test_q20_semi_join_chain(spark, tables):
    plan = plan_of(build("q20_dominant_suppliers", spark, tables))
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan


def test_contamination_broadcast_semi(spark, tables):
    """Corpus shingles must never shuffle — the benchmark set broadcasts."""
    plan = plan_of(build("text_contamination", spark, tables))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_curation_single_shuffle(spark, tables):
    """All curation signals are one projection; survivorship is a window
    over md5(text) — exactly one exchange in the whole plan."""
    plan = plan_of(build("corpus_curation", spark, tables))
    import re

    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    # Spark pushes the rn==1 predicate into a WindowGroupLimit — partial
    # per-partition top-1 before the shuffle
    assert "WindowGroupLimit" in plan


def test_tfidf_stays_jvm_side(spark, tables):
    plan = plan_of(build("text_tfidf_top_terms", spark, tables))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dedup_embedding_pairs_no_cartesian(spark, tables):
    """The candidate-first form must never degenerate to all-pairs: the
    candidate join keys on (band, sig) — equi-join, so no CartesianProduct
    and no BroadcastNestedLoopJoin anywhere in the plan (the O(n²) exact
    form lives only in similarity.cosine_near_pairs as a test baseline)."""
    plan = plan_of(build("dedup_embedding_pairs", spark, tables))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # signature compute is JVM codegen, not a Python UDF
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
