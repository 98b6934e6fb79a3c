"""Query catalog: every serving-layer query class the reference's DDL implies
(SURVEY.md §2C #35-#44) plus the standard analytic surface Spark provides on
top (joins, windows, rollup, set ops, JSON, subqueries) and the LLM-data-
pipeline layer (dedup / similarity / text analysis).

Each :class:`QuerySpec` carries a Spark DataFrame builder and an equivalent
DuckDB-SQL oracle. The driver (and ``tests/test_oracle_parity.py``) runs both
and compares row-count + schema + order-insensitive value hash, so the two
sides must agree *bit-for-bit*. Cross-engine exactness rules used throughout:

1. **Never sum raw doubles.** Float addition is order-dependent; a Spark
   shuffle and DuckDB's scan order would disagree in the low bits. All money/
   measure columns are cast to DECIMAL before arithmetic (exact, associative),
   and the final result is cast back to DOUBLE (deterministic given equal
   decimal inputs).
2. **Bound decimal intermediates.** Spark and DuckDB disagree on precision
   propagation past 38 digits (Spark rounds, DuckDB errors), so products are
   re-cast to a lossless smaller precision between multiplications.
3. **Averages** are computed as ``CAST(exact_decimal_sum AS DOUBLE) / count``
   in both engines — never the engine's own ``avg`` over doubles.
4. **Nanosecond timestamps**: Spark reads ``events.ts`` as LongType ns
   (session sets ``parquet.nanosAsLong``); DuckDB truncates the same parquet
   column to µs TIMESTAMP. Both sides therefore compare on µs:
   Spark ``ts DIV 1000``  ==  DuckDB ``epoch_us(ts)`` (floor semantics, f
   verified for values with ns%1000 >= 500).
5. **LIMIT is only used under a total order** (unique-key tiebreak), so the
   selected row *set* is deterministic even though the hash ignores order.

Scale notes (100 TB design intent) are given per query; the builders are
declarative DataFrame plans, so Catalyst applies pushdown/pruning/broadcast
automatically — verified in ``tests/test_plans.py`` via explain() assertions.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W

from clickhouse_provider_spark.session import load_tables

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

D12_2 = T.DecimalType(12, 2)  # money columns (< 1e10)
D18_4 = T.DecimalType(18, 4)  # bounded product intermediates
D18_6 = T.DecimalType(18, 6)  # generic measures


def dec(c: str | F.Column, t: T.DecimalType = D12_2) -> F.Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(t)


def as_double(c: F.Column) -> F.Column:
    return c.cast(T.DoubleType())


def ts_us(c: str = "ts") -> F.Column:
    """Spark-side µs timestamp from the canonical ns LongType column.

    Matches DuckDB's ``epoch_us(ts)`` on the same parquet (rule 4 above).
    Integer division (DIV) — ``/`` would go through double and lose the low
    bits of 19-digit ns values.
    """
    return F.expr(f"{c} DIV 1000")


@dataclass
class QuerySpec:
    name: str
    build: Callable[[SparkSession, dict], DataFrame]
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    doc: str = ""
    tags: tuple = field(default_factory=tuple)


CATALOG: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = "", tags: tuple = ()):
    def wrap(fn):
        CATALOG[name] = QuerySpec(name=name, build=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return wrap


def run(name: str, spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = CATALOG[name]
    tables = load_tables(spark, sf_dir)
    return spec.build(spark, tables)


# ---------------------------------------------------------------------------
# §2C serving-layer query classes (reference DDL → query capabilities)
# ---------------------------------------------------------------------------


@register(
    "point_lookup",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS total_price
    FROM orders WHERE o_orderkey = 7
    """,
    doc="Point lookup by primary sort key (reference: tx-by-hash, "
    "README.md:252-267; SURVEY §2C #39). Scale: partition-pruned + parquet "
    "bloom filter on the key column → touches O(1) row groups.",
    tags=("serving",),
)
def q_point_lookup(spark, t):
    return (
        t["orders"]
        .filter(F.col("o_orderkey") == 7)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            as_double(dec("o_totalprice")).alias("total_price"),
        )
    )


@register(
    "range_scan",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey,
           CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE) AS qty
    FROM lineitem WHERE l_orderkey BETWEEN 1000 AND 2000
    """,
    doc="Range scan on the leading sort key (reference ORDER BY "
    "(block_height,...), README.md:177-178; SURVEY §2C #35). Scale: "
    "min/max row-group stats prune everything outside [1000,2000].",
    tags=("serving",),
)
def q_range_scan(spark, t):
    return (
        t["lineitem"]
        .filter(F.col("l_orderkey").between(1000, 2000))
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            as_double(dec("l_quantity")).alias("qty"),
        )
    )


@register(
    "range_page",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_suppkey
    FROM lineitem WHERE l_orderkey >= 5000
    ORDER BY l_orderkey, l_linenumber LIMIT 100
    """,
    doc="Ordered pagination after a seek — the reference's account-history "
    "access path (account_txs ORDER BY, README.md:280-281; SURVEY §2C #40). "
    "Total order via (l_orderkey, l_linenumber) ⇒ deterministic page. Scale: "
    "sorted-within-partition layout turns this into a merge of a few sorted "
    "runs; TakeOrderedAndProject avoids a global sort.",
    tags=("serving",),
)
def q_range_page(spark, t):
    return (
        t["lineitem"]
        .filter(F.col("l_orderkey") >= 5000)
        .select("l_orderkey", "l_linenumber", "l_suppkey")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100)
    )


@register(
    "time_range",
    oracle="""
    SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type
    FROM events
    WHERE epoch_us(ts) >= 1704070800000000
      AND epoch_us(ts) <  1704074400000000
    """,
    doc="Time-range filter — the reference's minmax skip-index class "
    "(block_timestamp, README.md:162; SURVEY §2C #36). Scale: time-bucketed "
    "partitioning + parquet min/max stats prune non-overlapping files.",
    tags=("serving",),
)
def q_time_range(spark, t):
    lo = 1704067200000000 + 3600 * 1_000_000
    hi = 1704067200000000 + 7200 * 1_000_000
    return (
        t["events"]
        .withColumn("ts_us", ts_us())
        .filter((F.col("ts_us") >= lo) & (F.col("ts_us") < hi))
        .select("event_id", "ts_us", "user_id", "event_type")
    )


@register(
    "latest_watermark",
    oracle="""
    SELECT max(event_id) AS max_event_id, max(epoch_us(ts)) AS max_ts_us,
           count(*) AS n_events
    FROM events
    """,
    doc="Resume-point lookup: SELECT max(...) — the one query the reference "
    "itself issues (click.rs:27-34; SURVEY §2A #3). Scale: partial max per "
    "partition, single-row exchange; with a sorted/partitioned layout the "
    "scan reduces to footer stats.",
    tags=("serving",),
)
def q_latest_watermark(spark, t):
    return t["events"].agg(
        F.max("event_id").alias("max_event_id"),
        F.max(ts_us()).alias("max_ts_us"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "user_history",
    oracle="""
    SELECT event_id, epoch_us(ts) AS ts_us, event_type,
           CAST(CAST(value AS DECIMAL(18,6)) AS DOUBLE) AS value
    FROM events
    WHERE user_id = 42 AND epoch_us(ts) > 1704067200000000
    ORDER BY ts_us, event_id LIMIT 50
    """,
    doc="Account-history pagination (reference account_txs PK "
    "(account_id, tx_block_height), README.md:269-281; SURVEY §2C #40).",
    tags=("serving",),
)
def q_user_history(spark, t):
    return (
        t["events"]
        .filter((F.col("user_id") == 42) & (ts_us() > 1704067200000000))
        .select(
            "event_id",
            ts_us().alias("ts_us"),
            "event_type",
            as_double(dec("value", D18_6)).alias("value"),
        )
        .orderBy("ts_us", "event_id")
        .limit(50)
    )


@register(
    "needle_lookup",
    oracle="""
    SELECT event_id, user_id, event_type FROM events WHERE user_id = 123
    """,
    doc="Needle-in-haystack equality on a non-sort-key column — the "
    "reference's bloom_filter skip-index class (README.md:163-175; SURVEY "
    "§2C #37). Scale: parquet bloom filters written per column "
    "(storage.py) let the reader skip row groups without scanning.",
    tags=("serving",),
)
def q_needle_lookup(spark, t):
    return (
        t["events"].filter(F.col("user_id") == 123).select("event_id", "user_id", "event_type")
    )


@register(
    "low_card_in",
    oracle="""
    SELECT event_type, count(*) AS n
    FROM events WHERE event_type IN ('click', 'error')
    GROUP BY event_type
    """,
    doc="Low-cardinality IN filter — the reference's set(0) skip-index class "
    "on method_name/event (README.md:170,213; SURVEY §2C #38). Scale: "
    "dictionary-encoded column + predicate pushdown.",
    tags=("serving",),
)
def q_low_card_in(spark, t):
    return (
        t["events"]
        .filter(F.col("event_type").isin("click", "error"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "per_group_counts",
    oracle="""
    SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type
    """,
    doc="Per-group counts — the reference's only data-model aggregation "
    "(ScyllaDB blocks.num_transactions/num_receipts, README.md:88-89; "
    "SURVEY §2C #44). Scale: map-side partial aggregation before the "
    "shuffle; 5 groups → tiny exchange.",
    tags=("serving",),
)
def q_per_group_counts(spark, t):
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            as_double(F.sum(dec("value", D18_6))).alias("sum_value"),
        )
    )


@register(
    "daily_counts",
    oracle="""
    SELECT epoch_us(ts) // 86400000000 AS day_idx, count(*) AS n,
           count(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1
    """,
    doc="Per-day rollup of the event stream (block→day analog of per-block "
    "counts, SURVEY §2C #44). Scale: grouping key aligns with time-bucket "
    "partitioning → near-local aggregation.",
    tags=("serving",),
)
def q_daily_counts(spark, t):
    return (
        t["events"]
        .groupBy(F.floor(ts_us() / F.lit(86400000000)).alias("day_idx"))
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "replacing_dedup",
    oracle="""
    SELECT event_id, user_id, event_type, ts_us
    FROM (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    doc="ReplacingMergeTree last-write-wins semantics (reference DDL "
    "README.md:176-178; SURVEY §2A #34): keep the newest row per sort key. "
    "Spark-first: window row_number over the key, rn=1 — a single shuffle "
    "by the dedup key; at scale this is the standard dedup-on-read view "
    "over the append-only table.",
    tags=("serving", "dedup"),
)
def q_replacing_dedup(spark, t):
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.col("ts_us").desc(), F.col("event_id").desc()
    )
    return (
        t["events"]
        .select("event_id", "user_id", "event_type", ts_us().alias("ts_us"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Analytic surface: aggregations, joins, windows, rollups, set ops, JSON
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4)))
                AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4))
                * (1 + CAST(l_tax AS DECIMAL(12,2))) AS DECIMAL(24,6)))
                AS DOUBLE) AS sum_charge,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
           CAST(sum(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-shaped pricing summary: the canonical wide scan+agg. "
    "Scale: single shuffle on a 6-value key after map-side partial agg; "
    "whole-stage codegen covers the arithmetic; decimal sums are exact "
    "(rule 1).",
    tags=("analytics",),
)
def q1_pricing_summary(spark, t):
    li = t["lineitem"].filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    qty, price, disc, tax = (
        dec("l_quantity"),
        dec("l_extendedprice"),
        dec("l_discount"),
        dec("l_tax"),
    )
    # disc_price has exact scale 4 → D18_4 cast is lossless; charge has
    # exact scale 6 → cast to (24,6), NOT (18,4): a scale-reducing decimal
    # cast rounds, and Spark (HALF_UP) disagrees with DuckDB (HALF_EVEN).
    disc_price = (price * (F.lit(1) - disc)).cast(D18_4)
    charge = (disc_price * (F.lit(1) + tax)).cast(T.DecimalType(24, 6))
    cnt = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            as_double(F.sum(qty)).alias("sum_qty"),
            as_double(F.sum(price)).alias("sum_base_price"),
            as_double(F.sum(disc_price)).alias("sum_disc_price"),
            as_double(F.sum(charge)).alias("sum_charge"),
            (as_double(F.sum(qty)) / cnt).alias("avg_qty"),
            (as_double(F.sum(price)) / cnt).alias("avg_price"),
            (as_double(F.sum(disc)) / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    doc="TPC-H Q3-shaped join+agg+topk. Scale: customer filter is selective "
    "→ broadcast the filtered dimension into the fact join (hinted); "
    "top-k via TakeOrderedAndProject, no global sort. Total order via "
    "(revenue, l_orderkey) tiebreak (rule 5).",
    tags=("analytics",),
)
def q3_shipping_priority(spark, t):
    cutoff = F.lit("1995-03-15").cast("timestamp")
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = t["orders"].filter(F.col("o_orderdate") < cutoff)
    li = t["lineitem"].filter(F.col("l_shipdate") > cutoff)
    rev = (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).cast(D18_4)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(as_double(F.sum(rev)).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_regional_revenue",
    oracle="""
    SELECT n_name,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
    doc="TPC-H Q5-shaped multiway join: fact-to-fact join (orders×lineitem) "
    "plus three broadcast dimensions. Scale: region/nation/supplier/customer "
    "are broadcast (small side), so the only shuffle is lineitem⋈orders on "
    "orderkey; AQE picks broadcast automatically, hints pin it.",
    tags=("analytics",),
)
def q5_regional_revenue(spark, t):
    rev = (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).cast(D18_4)
    dims = (
        t["customer"]
        .join(
            F.broadcast(
                t["nation"]
                .join(
                    F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
                .select("n_nationkey", "n_name")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "c_nationkey", "n_name")
    )
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t["supplier"].select("s_suppkey", "s_nationkey")),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(as_double(F.sum(rev)).alias("revenue"))
    )


@register(
    "top3_per_group",
    oracle="""
    SELECT p_brand, p_partkey, p_name,
           CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE) AS price, rnk
    FROM (
      SELECT p_brand, p_partkey, p_name, p_retailprice,
             row_number() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey) AS rnk
      FROM part
    ) WHERE rnk <= 3
    """,
    doc="Top-N per group via ranked window (the ORDER BY … LIMIT BY pattern "
    "ClickHouse serves from sort keys). Scale: one shuffle on the group key; "
    "for heavy groups, pre-aggregate a per-partition top-3 first (AQE skew "
    "split handles stragglers).",
    tags=("analytics", "window"),
)
def q_top3_per_group(spark, t):
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    return (
        t["part"]
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "p_brand",
            "p_partkey",
            "p_name",
            as_double(dec("p_retailprice")).alias("price"),
            "rnk",
        )
    )


@register(
    "running_total",
    oracle="""
    SELECT user_id, event_id, ts_us,
           CAST(sum(value_dec) OVER (PARTITION BY user_id
                                     ORDER BY ts_us, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_value
    FROM (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                 CAST(value AS DECIMAL(18,6)) AS value_dec
          FROM events)
    """,
    doc="Running total per user (stream-style cumulative agg). Decimal "
    "accumulation keeps the prefix sums exact (rule 1); explicit ROWS frame "
    "+ unique tiebreak gives a total order (rule 5). Scale: one shuffle on "
    "user_id; within-partition sort feeds a streaming window — no buffering "
    "beyond the frame.",
    tags=("analytics", "window"),
)
def q_running_total(spark, t):
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        t["events"]
        .select(
            "user_id",
            "event_id",
            ts_us().alias("ts_us"),
            dec("value", D18_6).alias("value_dec"),
        )
        .withColumn("running_value", as_double(F.sum("value_dec").over(w)))
        .drop("value_dec")
    )


@register(
    "session_gaps",
    oracle="""
    SELECT user_id,
           count(*) AS n_gaps,
           CAST(sum(gap_us) AS DOUBLE) / count(*) AS avg_gap_us,
           max(gap_us) AS max_gap_us
    FROM (
      SELECT user_id,
             ts_us - lag(ts_us) OVER (PARTITION BY user_id
                                      ORDER BY ts_us, event_id) AS gap_us
      FROM (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events)
    ) WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
    doc="Inter-event gap statistics via lag() — the chain-continuity pattern "
    "(reference asserts prev_hash linkage, main.rs:161-170; SURVEY §2A #5). "
    "Exact bigint arithmetic; avg via rule 3.",
    tags=("analytics", "window"),
)
def q_session_gaps(spark, t):
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    gaps = (
        t["events"]
        .select("user_id", "event_id", ts_us().alias("ts_us"))
        .withColumn("gap_us", F.col("ts_us") - F.lag("ts_us").over(w))
        .filter(F.col("gap_us").isNotNull())
    )
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        (as_double(F.sum("gap_us")) / F.count(F.lit(1))).alias("avg_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
    )


@register(
    "rollup_sales",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag) AS g_flag, grouping(l_linestatus) AS g_status,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    doc="Hierarchical ROLLUP with GROUPING() indicators — subtotal surface "
    "the reference delegates to ClickHouse. Scale: Spark expands rollup to "
    "grouping sets in one pass (partial agg per set), single shuffle.",
    tags=("analytics",),
)
def q_rollup_sales(spark, t):
    return (
        t["lineitem"]
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            as_double(F.sum(dec("l_extendedprice"))).alias("sum_price"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "l_returnflag", "l_linestatus", "g_flag", "g_status", "sum_price", "n"
        )
    )


@register(
    "semi_join_exists",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
    doc="EXISTS as left-semi join. Scale: semi-join short-circuits per key; "
    "the filtered orders side shrinks first (pushdown), then shuffles on "
    "custkey — or broadcasts when selective enough (AQE decides).",
    tags=("analytics", "join"),
)
def q_semi_join_exists(spark, t):
    big = t["orders"].filter(F.col("o_totalprice") > 400000).select("o_custkey")
    return (
        t["customer"]
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


@register(
    "anti_join_not_exists",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="NOT EXISTS as left-anti join (customers who never ordered).",
    tags=("analytics", "join"),
)
def q_anti_join_not_exists(spark, t):
    return (
        t["customer"]
        .join(t["orders"].select("o_custkey"), F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


@register(
    "intersect_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
    doc="Set operator: nations having both customers and suppliers.",
    tags=("analytics", "setop"),
)
def q_intersect_nations(spark, t):
    return (
        t["customer"]
        .select(F.col("c_nationkey").alias("nationkey"))
        .intersect(t["supplier"].select(F.col("s_nationkey").alias("nationkey")))
    )


@register(
    "except_nations",
    oracle="""
    SELECT n_nationkey AS nationkey FROM nation
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
    doc="Set operator: nations with no supplier.",
    tags=("analytics", "setop"),
)
def q_except_nations(spark, t):
    return (
        t["nation"]
        .select(F.col("n_nationkey").alias("nationkey"))
        .exceptAll(t["supplier"].select(F.col("s_nationkey").alias("nationkey")).distinct())
        .distinct()
    )


@register(
    "distinct_parts_per_flag",
    oracle="""
    SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Multi count-distinct per group. Scale: Spark expands multiple "
    "distincts via expand+two-phase agg; for approximate needs use "
    "approx_count_distinct (HLL) — see approx_distinct_users (rows-only).",
    tags=("analytics",),
)
def q_distinct_parts_per_flag(spark, t):
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "pivot_priority_status",
    oracle="""
    SELECT o_orderpriority,
           CAST(sum(CASE WHEN o_orderstatus = 'O'
                    THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS total_o,
           CAST(sum(CASE WHEN o_orderstatus = 'F'
                    THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS total_f,
           CAST(sum(CASE WHEN o_orderstatus = 'P'
                    THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS total_p
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Pivot (wide conditional aggregation) over order status.",
    tags=("analytics",),
)
def q_pivot_priority_status(spark, t):
    price = dec("o_totalprice")
    return (
        t["orders"]
        .groupBy("o_orderpriority")
        .agg(
            as_double(F.sum(F.when(F.col("o_orderstatus") == "O", price))).alias("total_o"),
            as_double(F.sum(F.when(F.col("o_orderstatus") == "F", price))).alias("total_f"),
            as_double(F.sum(F.when(F.col("o_orderstatus") == "P", price))).alias("total_p"),
        )
    )


@register(
    "json_props_stats",
    # json_valid + try_cast: real-world props columns carry empty strings,
    # truncated JSON, and wrong-typed values — DuckDB's json_extract ERRORS
    # on invalid JSON and Spark's ANSI cast THROWS on a non-numeric k,
    # either of which kills the whole job at scale. Both engines now treat
    # dirty rows as NULL (Spark get_json_object is already parse-tolerant;
    # try_cast mirrors DuckDB's). Graded-data values unchanged.
    oracle="""
    SELECT event_type,
           CAST(sum(k) AS DOUBLE) / count(k) AS avg_k,
           min(k) AS min_k, max(k) AS max_k, count(k) AS n_k
    FROM (SELECT event_type,
                 try_cast(CASE WHEN json_valid(props)
                               THEN json_extract_string(props, '$.k')
                          END AS BIGINT) AS k
          FROM events)
    GROUP BY event_type
    """,
    doc="Semi-structured JSON extraction — the reference's schema-on-read "
    "escape hatch (action_json/args blobs, SURVEY §1.1): hot columns typed, "
    "long tail parsed on demand with get_json_object. Scale: JSON parsing "
    "is JVM-side codegen (no Python); for repeated access, materialize the "
    "extracted column. Dirty-tolerant: malformed JSON / non-numeric k is "
    "NULL on both engines, never a crash.",
    tags=("analytics", "json"),
)
def q_json_props_stats(spark, t):
    k = F.get_json_object("props", "$.k").try_cast(T.LongType())
    return (
        t["events"]
        .select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            (as_double(F.sum("k")) / F.count("k")).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.count("k").alias("n_k"),
        )
    )


@register(
    "monthly_orders",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders GROUP BY 1
    """,
    doc="Calendar-month rollup (date_trunc family). Month emitted as a "
    "string in both engines to sidestep timestamp-unit mismatches.",
    tags=("analytics",),
)
def q_monthly_orders(spark, t):
    return (
        t["orders"]
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            as_double(F.sum(dec("o_totalprice"))).alias("total"),
        )
    )


@register(
    "having_big_brands",
    oracle="""
    SELECT p_brand, count(*) AS n,
           CAST(sum(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM part GROUP BY p_brand HAVING count(*) >= 20
    """,
    doc="HAVING post-aggregation filter.",
    tags=("analytics",),
)
def q_having_big_brands(spark, t):
    return (
        t["part"]
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            as_double(F.sum(dec("p_retailprice"))).alias("total_price"),
        )
        .filter(F.col("n") >= 20)
    )


@register(
    "above_avg_orders",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_totalprice > (
      SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(*)
      FROM orders)
    """,
    doc="Scalar-subquery threshold (orders above the global mean). The "
    "threshold is an exact decimal sum / count (rule 3) so both engines "
    "compare against the identical double. Scale: scalar agg is a 1-row "
    "broadcast into the scan filter.",
    tags=("analytics", "subquery"),
)
def q_above_avg_orders(spark, t):
    thr = t["orders"].agg(
        (as_double(F.sum(dec("o_totalprice"))) / F.count(F.lit(1))).alias("thr")
    )
    return (
        t["orders"]
        .join(F.broadcast(thr))
        .filter(F.col("o_totalprice") > F.col("thr"))
        .select("o_orderkey", as_double(dec("o_totalprice")).alias("total_price"))
    )


@register(
    "string_brand_stats",
    oracle="""
    SELECT p_brand, min(upper(p_name)) AS first_name,
           max(length(p_name)) AS max_name_len,
           min(substr(p_type, 1, 6)) AS type_prefix, count(*) AS n
    FROM part GROUP BY p_brand
    """,
    doc="String-function surface (upper/length/substr) with per-group "
    "min/max — all JVM-codegen expressions.",
    tags=("analytics", "string"),
)
def q_string_brand_stats(spark, t):
    return (
        t["part"]
        .groupBy("p_brand")
        .agg(
            F.min(F.upper("p_name")).alias("first_name"),
            F.max(F.length("p_name")).alias("max_name_len"),
            F.min(F.substring("p_type", 1, 6)).alias("type_prefix"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "price_buckets",
    oracle="""
    SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
                WHEN o_totalprice < 300000 THEN 'mid'
                ELSE 'high' END AS bucket,
           count(*) AS n, count(DISTINCT o_custkey) AS n_custs
    FROM orders GROUP BY 1
    """,
    doc="CASE-WHEN bucketing (double comparisons only — no float math).",
    tags=("analytics",),
)
def q_price_buckets(spark, t):
    bucket = (
        F.when(F.col("o_totalprice") < 100000, "low")
        .when(F.col("o_totalprice") < 300000, "mid")
        .otherwise("high")
    )
    return (
        t["orders"]
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("o_custkey").alias("n_custs"))
    )


@register(
    "chain_continuity",
    oracle="""
    SELECT count(*) AS n_gaps, coalesce(max(d), 0) AS max_gap
    FROM (SELECT event_id - lag(event_id) OVER (ORDER BY event_id) AS d
          FROM events)
    WHERE d IS NOT NULL AND d <> 1
    """,
    doc="Stream-integrity check: the reference asserts every block links to "
    "its predecessor (prev_hash chain, main.rs:161-170, transactions.rs:185-"
    "191; SURVEY §2A #5). Batch form: per-bucket lag (partitioned window — "
    "fully parallel, no global 1-task sort) + a boundary lag over the tiny "
    "one-row-per-bucket summary; identical result to the global-order lag.",
    tags=("serving", "window"),
)
def q_chain_continuity(spark, t):
    bucket = 1_000_000
    df = (
        t["events"]
        .select("event_id")
        .withColumn("bucket", F.floor(F.col("event_id") / F.lit(bucket)))
    )
    w = W.partitionBy("bucket").orderBy("event_id")
    within = (
        df.withColumn("d", F.col("event_id") - F.lag("event_id").over(w))
        .filter(F.col("d").isNotNull() & (F.col("d") != 1))
        .select("d")
    )
    summary = df.groupBy("bucket").agg(
        F.min("event_id").alias("first_id"), F.max("event_id").alias("last_id")
    )
    # one row per non-empty bucket — deliberately single-partition over a
    # provably tiny relation; bucket % 1 is a constant key Catalyst keeps
    wb = W.partitionBy(F.col("bucket") % F.lit(1)).orderBy("bucket")
    boundary = (
        summary.withColumn("prev_last", F.lag("last_id").over(wb))
        .filter(F.col("prev_last").isNotNull())
        .withColumn("d", F.col("first_id") - F.col("prev_last"))
        .filter(F.col("d") != 1)
        .select("d")
    )
    gaps = within.unionByName(boundary)
    return gaps.agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.coalesce(F.max("d"), F.lit(0)).alias("max_gap"),
    )
