"""Catalog batch 4: the remaining TPC-H-shaped analytics expressible on the
testdata schema (q8, q9, q12, q13, q15, q17, q18, q21, q22 — adapted: the
testdata has no partsupp table and no l_shipmode / l_commitdate /
l_receiptdate / c_phone / p_container columns, so those predicates are
substituted with schema-available analogs, documented per entry).
Same cross-engine exactness rules as catalog.py (decimal-exact sums,
double casts only at the end, LIMIT only under a total order).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_provider_spark.plans.catalog import (
    D18_4,
    as_double,
    dec,
    register,
)


@register(
    "q8_market_share",
    oracle="""
    SELECT yr,
           CAST(sum(CASE WHEN nation = 'NATION_2' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           / CAST(sum(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INT) AS yr,
             CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS volume,
             n2.n_name AS nation
      FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region    ON n1.n_regionkey = r_regionkey
        JOIN supplier  ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
    ) GROUP BY yr
    """,
    doc="TPC-H Q8 shape: NATION_2's share of STANDARD-part volume sold into "
    "ASIA by order year. Numerator and denominator are exact decimal sums; "
    "the ratio is one double division (deterministic across engines). "
    "Scale: part/supplier/nation/region broadcast; the only fact-fact "
    "shuffle is lineitem⋈orders on orderkey.",
    tags=("analytics", "tpch"),
)
def q8_market_share(spark, t):
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    asia = t["region"].filter(F.col("r_name") == "ASIA").select("r_regionkey")
    parts = t["part"].filter(F.col("p_type") == "STANDARD").select("p_partkey")
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    vol = (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).cast(D18_4)
    zero = F.lit(0).cast(D18_4)
    joined = (
        t["lineitem"]
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t["customer"].select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(asia), F.col("c_rk") == F.col("r_regionkey"))
        .join(
            F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .select(
            F.year("o_orderdate").cast("int").alias("yr"),
            vol.alias("volume"),
            F.col("nation"),
        )
    )
    return joined.groupBy("yr").agg(
        (
            as_double(
                F.sum(F.when(F.col("nation") == "NATION_2", F.col("volume")).otherwise(zero))
            )
            / as_double(F.sum("volume"))
        ).alias("mkt_share")
    )


@register(
    "q9_product_profit",
    oracle="""
    SELECT nation, yr, CAST(sum(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS yr,
             CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4)) AS amount
      FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    ) GROUP BY nation, yr
    """,
    doc="TPC-H Q9 shape: profit on red-named parts by supplier nation and "
    "year. Adapted: no partsupp in the testdata, so profit omits the "
    "ps_supplycost*l_quantity term (revenue-only profit). Scale: part "
    "filter broadcast to the lineitem scan; one orderkey shuffle.",
    tags=("analytics", "tpch"),
)
def q9_product_profit(spark, t):
    parts = t["part"].filter(F.col("p_name").like("%red%")).select("p_partkey")
    amount = (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).cast(D18_4)
    joined = (
        t["lineitem"]
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(t["orders"].select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(t["nation"].select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("yr"),
            amount.alias("amount"),
        )
    )
    return joined.groupBy("nation", "yr").agg(
        as_double(F.sum("amount")).alias("sum_profit")
    )


@register(
    "q12_priority_lines",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    """,
    doc="TPC-H Q12 shape: high/low-priority line counts for late lines "
    "shipped in 1996. Adapted: no l_shipmode/commitdate/receiptdate — "
    "grouping key is l_linestatus and 'late' is shipdate > orderdate. "
    "Scale: conditional counts fold map-side into a 2-row aggregate.",
    tags=("analytics", "tpch"),
)
def q12_priority_lines(spark, t):
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            t["orders"].select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c_custkey
    ) GROUP BY c_count
    """,
    doc="TPC-H Q13: distribution of per-customer order counts (left join so "
    "zero-order customers appear in the c_count=0 bucket; the "
    "'not like special requests' comment filter is adapted to "
    "priority <> 4-NOT SPECIFIED). Scale: two-level aggregation — the "
    "second groupBy runs on at most max(c_count) rows after partial agg.",
    tags=("analytics", "tpch"),
)
def q13_customer_distribution(spark, t):
    o = t["orders"].filter(F.col("o_orderpriority") != "4-NOT SPECIFIED").select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        t["customer"]
        .select("c_custkey")
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15: supplier(s) with the maximum quarterly revenue. The "
    "max-selection compares exact decimals (not doubles), so ties and the "
    "winner are engine-independent. Scale: revenue agg is one shuffle on "
    "suppkey; the scalar max broadcasts back (no global sort).",
    tags=("analytics", "tpch"),
)
def q15_top_supplier(spark, t):
    rev_expr = F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
    revenue = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(rev_expr.alias("total_revenue_dec"))
    )
    max_rev = revenue.agg(F.max("total_revenue_dec").alias("max_rev"))
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue_dec") == F.col("max_rev"))
        .join(
            F.broadcast(t["supplier"].select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            as_double(F.col("total_revenue_dec")).alias("total_revenue"),
        )
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
           AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#9' AND p_size < 10
      AND l_quantity < 0.2 * (
        SELECT CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*)
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
    doc="TPC-H Q17 shape: revenue lost to small-quantity orders of "
    "Brand#9 small parts (p_container adapted to p_size < 10). The "
    "correlated per-part average is an exact decimal sum / count cast to "
    "double, so the 0.2*avg threshold is bit-identical across engines. "
    "Scale: per-part averages shuffle on partkey once and broadcast-join "
    "back against the filtered brand subset.",
    tags=("analytics", "tpch"),
)
def q17_small_quantity_revenue(spark, t):
    parts = t["part"].filter(
        (F.col("p_brand") == "Brand#9") & (F.col("p_size") < 10)
    ).select("p_partkey")
    li = t["lineitem"].select("l_partkey", "l_quantity", "l_extendedprice")
    # Per-part exact average over ALL lineitems of that part (the correlated
    # subquery scans lineitem unfiltered), restricted to the 16 brand parts
    # via broadcast semi-join before the shuffle.
    per_part = (
        li.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("l_partkey").alias("ap_partkey"))
        .agg(
            (
                as_double(F.sum(dec("l_quantity"))) / F.count(F.lit(1))
            ).alias("avg_qty")
        )
    )
    small = (
        li.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(per_part),
            F.col("l_partkey") == F.col("ap_partkey"),
        )
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
    )
    return small.agg(
        (as_double(F.sum(dec("l_extendedprice"))) / F.lit(7.0)).alias("avg_yearly")
    )


@register(
    "q18_large_volume_customers",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 250)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
    doc="TPC-H Q18: customers whose orders total > 250 units (threshold "
    "adapted to the testdata's ~4-line orders; quantity summed as exact "
    "decimal so the HAVING cut is engine-independent). Scale: the HAVING "
    "pre-aggregate shuffles lineitem once on orderkey; the qualifying key "
    "set is tiny and semi-joins back broadcast.",
    tags=("analytics", "tpch"),
)
def q18_large_volume_customers(spark, t):
    # ONE lineitem aggregation (round 14, guide §1.2-1): the HAVING
    # pre-aggregate's per-order decimal qty IS the query's total_qty —
    # the output's group (customer, order, date, price) is keyed by the
    # unique o_orderkey, so re-scanning lineitem, semi-joining, and
    # re-summing per output group (the old plan) recomputed the exact
    # same decimal sums a second time. The qualifying set is tiny after
    # the >250 cut; both dimension attaches are broadcast-side, so the
    # single lineitem shuffle is the whole data motion.
    li = t["lineitem"].select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("qty_dec"))
        .filter(F.col("qty_dec") > 250)
    )
    return (
        big.join(
            t["orders"].select(
                "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(t["customer"].select("c_custkey", "c_name")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            as_double(dec("o_totalprice")).alias("o_totalprice"),
            as_double(F.col("qty_dec")).alias("total_qty"),
        )
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND n_name = 'NATION_2'
      AND l1.l_shipdate > o_orderdate
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name LIMIT 20
    """,
    doc="TPC-H Q21 shape: NATION_2 suppliers who were the sole late shipper "
    "on a finished multi-supplier order ('late' adapted to shipdate > "
    "orderdate; no receipt/commit dates). LIMIT is under a total order "
    "(numwait DESC, unique s_name). Scale: the EXISTS/NOT-EXISTS pair "
    "becomes one per-order aggregate (other-supplier count + other-late "
    "count) — a single extra shuffle on orderkey instead of two "
    "self-joins.",
    tags=("analytics", "tpch"),
)
def q21_waiting_suppliers(spark, t):
    nat = t["nation"].filter(F.col("n_name") == "NATION_2").select("n_nationkey")
    supp = (
        t["supplier"]
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    o = t["orders"].filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    l1 = (
        t["lineitem"]
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    # Per (order, supplier): did any OTHER supplier ship on this order, and
    # was any OTHER supplier late? One aggregation instead of two
    # exists-self-joins — and (round 14, guide §1.2-1/§2.3) ONE pass over
    # the lineitem⋈orders join instead of two: the old plan aggregated
    # `late` and `l1` separately, scanning/joining lineitem twice, and the
    # order-level countDistincts planned as Expand (2× the shuffle rows).
    # Both levels fold out of a single (order, supplier) aggregate:
    # suppkey is unique within a per_os group, so n_suppliers =
    # count(groups per order) and n_late_suppliers = count(groups with
    # own_late > 0) — identical integers, no distinct machinery.
    from pyspark.sql.window import Window as W

    per_os = l1.groupBy(
        F.col("l_orderkey").alias("g_orderkey"), F.col("l_suppkey").alias("g_suppkey")
    ).agg(
        F.sum(
            F.when(F.col("l_shipdate") > F.col("o_orderdate"), 1).otherwise(0)
        ).alias("own_late")
    )
    # order-level totals as ORDER-PARTITIONED windows over per_os rather
    # than a groupBy + self-join: the join form duplicates the whole
    # lineitem⋈orders aggregate subtree (Spark shares nothing across a
    # self-join), scanning lineitem twice; the window reuses the one
    # per_os relation — plan: 2 lineitem scans → 1, SMJ removed.
    wo = W.partitionBy("g_orderkey")
    waiting = (
        per_os.withColumn("n_suppliers", F.count(F.lit(1)).over(wo))
        .withColumn(
            "n_late_suppliers",
            F.sum(F.when(F.col("own_late") > 0, 1).otherwise(0)).over(wo),
        )
        .filter(
            (F.col("own_late") > 0)
            & (F.col("n_suppliers") > 1)
            & (F.col("n_late_suppliers") == 1)
        )
        .join(F.broadcast(supp), F.col("g_suppkey") == F.col("s_suppkey"), "inner")
    )
    return (
        waiting.groupBy("s_name")
        # numwait counts late LINES (each l1 row), not (order, supplier)
        # pairs — own_late carries the per-pair line count.
        .agg(F.sum("own_late").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
    SELECT n_name AS cntry, count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE n_name IN ('NATION_1','NATION_3','NATION_5','NATION_7','NATION_9',
                     'NATION_11','NATION_13')
      AND c_acctbal > (
        SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*)
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > 0.0
          AND n_name IN ('NATION_1','NATION_3','NATION_5','NATION_7','NATION_9',
                         'NATION_11','NATION_13'))
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY n_name
    """,
    doc="TPC-H Q22 shape: wealthy never-ordered customers per country "
    "(c_phone country code adapted to nation name). The average threshold "
    "is exact-decimal-sum / count in double on both engines. Scale: "
    "scalar avg broadcasts; NOT EXISTS is a left-anti against the "
    "o_custkey projection (shuffles custkeys only).",
    tags=("analytics", "tpch"),
)
def q22_global_sales_opportunity(spark, t):
    nations = (
        "NATION_1", "NATION_3", "NATION_5", "NATION_7", "NATION_9",
        "NATION_11", "NATION_13",
    )
    nat = (
        t["nation"]
        .filter(F.col("n_name").isin(*nations))
        .select("n_nationkey", "n_name")
    )
    cust = t["customer"].join(
        F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (as_double(F.sum(dec("c_acctbal"))) / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            t["orders"].select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy(F.col("n_name").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            as_double(F.sum(dec("c_acctbal"))).alias("totacctbal"),
        )
    )
