"""Degenerate-input cross-engine parity for the TPC-H / serving /
set-op / subquery families.

The fixture is the smallest relational world with every classic edge:
a nation with no customers or suppliers, a customer with no orders
(q13/q22 left-join semantics), an order with no lineitems, tied
revenues (deterministic tie-breaks), zero-variance measure columns, and
single-row groups. It caught a real bug on first run: price_qty_corr's
Pearson denominator threw ANSI DIVIDE_BY_ZERO on zero-variance groups
(now nullif/greatest-guarded on both engines, like the rest of the
stats family). Every entry must yield identical rows on both engines —
including identical EMPTY results."""

from datetime import datetime

import pytest

from clickhouse_provider_spark.plans import CATALOG
from tools.parity import compare

ENTRIES = [
    # TPC-H suite
    "q1_pricing_summary", "q2_min_price_part", "q3_shipping_priority",
    "q4_order_priority", "q5_regional_revenue", "q6_forecast_revenue",
    "q7_nation_volume", "q8_market_share", "q9_product_profit",
    "q10_returned_revenue", "q11_important_parts", "q12_priority_lines",
    "q13_customer_distribution", "q14_promo_share", "q15_top_supplier",
    "q16_supplier_concentration", "q17_small_quantity_revenue",
    "q18_large_volume_customers", "q19_disjunctive",
    "q20_dominant_suppliers", "q21_waiting_suppliers",
    "q22_global_sales_opportunity",
    # serving / windows / subqueries / set ops
    "point_lookup", "range_scan", "range_page", "top3_per_group",
    "rank_dense_percent", "first_last_window", "ordered_string_agg",
    "rollup_sales", "cube_sales", "grouping_sets_mixed",
    "pivot_priority_status", "monthly_orders", "having_big_brands",
    "above_avg_orders", "in_subquery_nations", "semi_join_exists",
    "anti_join_not_exists", "intersect_nations", "except_nations",
    "distinct_parts_per_flag", "string_brand_stats", "price_buckets",
    "late_shipment_buckets", "date_parts", "regex_classify",
    "conditional_aggregates", "dict_get_enrich", "bloom_runtime_semijoin",
    # stats over zero-variance / single-row groups
    "price_qty_corr", "skew_salted_topk_revenue",
]


@pytest.fixture(scope="module")
def degenerate_tpch(spark, tmp_path_factory):
    import duckdb

    d = tmp_path_factory.mktemp("degenerate_tpch")
    ts = datetime(2024, 3, 1)
    frames = {
        "region": spark.createDataFrame(
            [(0, "R0"), (1, "R1")], "r_regionkey int, r_name string"
        ),
        # nation 1 has NO customers or suppliers
        "nation": spark.createDataFrame(
            [(0, "N0", 0), (1, "N1", 1)],
            "n_nationkey int, n_name string, n_regionkey int",
        ),
        # customer 2 has NO orders; negative acctbal
        "customer": spark.createDataFrame(
            [
                (1, "Customer#1", 0, 100.0, "BUILDING"),
                (2, "Customer#2", 0, -5.0, "BUILDING"),
            ],
            "c_custkey long, c_name string, c_nationkey int,"
            " c_acctbal double, c_mktsegment string",
        ),
        "supplier": spark.createDataFrame(
            [(1, "Supplier#1", 0, 50.0)],
            "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
        ),
        "part": spark.createDataFrame(
            [
                (1, "promo part", "Brand#1", "PROMO X", 1, 10.0),
                (2, "std part", "Brand#1", "STANDARD Y", 1, 20.0),
            ],
            "p_partkey long, p_name string, p_brand string, p_type string,"
            " p_size int, p_retailprice double",
        ),
        # order 20 has NO lineitems
        "orders": spark.createDataFrame(
            [
                (10, 1, "F", 30.0, ts, "1-URGENT"),
                (20, 1, "O", 0.0, ts, "5-LOW"),
            ],
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate timestamp,"
            " o_orderpriority string",
        ),
        # two lines with IDENTICAL revenue (tie-breaks) and zero variance
        # in quantity/price per returnflag group (single-row groups)
        "lineitem": spark.createDataFrame(
            [
                (10, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "R", "F", ts),
                (10, 2, 1, 2, 1.0, 10.0, 0.0, 0.0, "N", "O", ts),
            ],
            "l_orderkey long, l_partkey long, l_suppkey long,"
            " l_linenumber int, l_quantity double, l_extendedprice double,"
            " l_discount double, l_tax double, l_returnflag string,"
            " l_linestatus string, l_shipdate timestamp",
        ),
    }
    tables = {}
    con = duckdb.connect()
    for name, df in frames.items():
        df.coalesce(1).write.parquet(str(d / f"{name}.parquet"))
        tables[name] = spark.read.parquet(str(d / f"{name}.parquet"))
        con.execute(
            f"CREATE VIEW {name} AS SELECT *"
            f" FROM read_parquet('{d}/{name}.parquet/*.parquet')"
        )
    return tables, con


@pytest.mark.parametrize("name", ENTRIES)
def test_degenerate_inputs_stay_cross_engine_consistent(
    name, spark, degenerate_tpch
):
    tables, con = degenerate_tpch
    spec = CATALOG[name]
    sdf = spec.build(spark, tables).toPandas()
    odf = con.execute(spec.oracle).df()
    assert not compare(sdf, odf)
