"""ClickHouse idiom batch 8: the combinator / lambda-function surface a
ClickHouse user reaches for daily, re-expressed as Catalyst-native
expressions — `-If` aggregate combinators, array lambda functions
(arrayMap / arrayFilter / arrayReduce / arrayExists), and dictionary
lookups (dictGet / dictGetOrDefault).

All three are map-side or broadcast shapes: the combinators fold into the
same partial aggregation as their unconditional forms; the array lambdas
run inside whole-stage codegen over the scan; the dictionary is a
broadcast hash join — ClickHouse's in-RAM dictionary replica, Spark's
broadcast exchange. Exactness rules follow plans/catalog.py (decimal
sums; array folds are left-to-right in BOTH engines, so double folds over
identical arrays are bit-identical).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_provider_spark.plans.catalog import as_double, dec, register


@register(
    "conditional_aggregates",
    # DuckDB's FILTER clause is the SQL-standard spelling of ClickHouse's
    # -If combinators; Spark's is an aggregate over CASE/when. avgIf is
    # computed as exact-decimal sumIf / countIf in both engines (catalog
    # rule 3: never the engine's own avg over doubles).
    oracle="""
    SELECT l_linestatus,
           count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)))
                       FILTER (WHERE l_discount > 0.05) AS DECIMAL(18,2))
                AS DOUBLE) AS sum_discounted_price,
           CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)))
                       FILTER (WHERE l_discount > 0.05) AS DECIMAL(18,2))
                AS DOUBLE)
             / count(*) FILTER (WHERE l_discount > 0.05)
             AS avg_discounted_price,
           min(l_shipdate) FILTER (WHERE l_quantity > 40)
             AS min_bulk_shipdate
    FROM lineitem GROUP BY l_linestatus
    """,
    doc="ClickHouse -If aggregate combinators (countIf / sumIf / avgIf / "
    "minIf) per line status: conditional aggregation without a "
    "pre-filter, so one scan feeds every conditional branch. Spark form "
    "is agg(when(...)) — identical partial-aggregation profile to the "
    "unconditional aggregate (combiner-friendly, one shuffle); avgIf is "
    "exact-decimal sumIf/countIf in both engines.",
    tags=("analytics", "combinators"),
)
def q_conditional_aggregates(spark, t):
    disc = F.col("l_discount") > 0.05
    price_if = F.when(disc, dec("l_extendedprice"))
    g = t["lineitem"].groupBy("l_linestatus").agg(
        F.count(F.when(disc, F.lit(1))).alias("n_discounted"),
        F.sum(price_if).cast("decimal(18,2)").alias("_sum"),
        F.min(
            F.when(F.col("l_quantity") > 40, F.col("l_shipdate"))
        ).alias("min_bulk_shipdate"),
    )
    return g.select(
        "l_linestatus",
        "n_discounted",
        as_double(F.col("_sum")).alias("sum_discounted_price"),
        (as_double(F.col("_sum")) / F.col("n_discounted")).alias(
            "avg_discounted_price"
        ),
        "min_bulk_shipdate",
    )


@register(
    "array_lambda_ops",
    # Spark's higher-order functions (transform/filter/aggregate/exists)
    # == ClickHouse's arrayMap/arrayFilter/arrayReduce/arrayExists ==
    # DuckDB's list_* family. The double fold is left-to-right over the
    # SAME array in all engines -> bit-identical sums (no shuffle-order
    # hazard: the fold never crosses rows).
    oracle="""
    WITH v AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
               FROM embeddings)
    SELECT vec_id,
           CAST(len(list_filter(e, x -> x > 0)) AS INT) AS n_pos,
           list_reduce(list_prepend(0.0, list_transform(e, x -> x * x)),
                       (acc, x) -> acc + x) AS sum_sq,
           list_max(e) AS max_val,
           EXISTS(FROM unnest(e) AS u(x) WHERE abs(x) > 2.0) AS has_large
    FROM v
    """,
    doc="ClickHouse array lambda functions over the embedding column: "
    "arrayFilter (count of positive components), arrayReduce('sum', "
    "arrayMap(x -> x*x, e)) via a left-to-right fold, arrayMax, and "
    "arrayExists — all as Spark higher-order functions inside "
    "whole-stage codegen: map-only, zero shuffles, scales with the "
    "scan. Per-row folds are order-pinned (array order), so double "
    "arithmetic is cross-engine exact.",
    tags=("analytics", "combinators"),
)
def q_array_lambda_ops(spark, t):
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return t["embeddings"].select(
        "vec_id",
        F.size(F.filter(e, lambda x: x > 0)).alias("n_pos"),
        F.aggregate(
            F.transform(e, lambda x: x * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("sum_sq"),
        F.array_max(e).alias("max_val"),
        F.exists(e, lambda x: F.abs(x) > F.lit(2.0)).alias("has_large"),
    )


@register(
    "dict_get_enrich",
    # The "dictionary" is nation restricted to keys < 20 so some lookups
    # MISS and exercise the default path (dictGetOrDefault), not just the
    # hit path.
    oracle="""
    WITH d AS (SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 20)
    SELECT coalesce(d.n_name, 'UNKNOWN') AS nation_name,
           count(*) AS n_customers,
           CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(18,2))
                AS DOUBLE) AS sum_acctbal
    FROM customer c LEFT JOIN d ON c.c_nationkey = d.n_nationkey
    GROUP BY 1
    """,
    doc="ClickHouse dictGet / dictGetOrDefault: enrich a fact row by key "
    "lookup into an in-RAM dictionary, with a default for misses. The "
    "Spark equivalent IS the broadcast hash join — the dim ships to "
    "every executor exactly like a ClickHouse dictionary replica — plus "
    "coalesce for the default. Broadcast pinned by hint; the fact table "
    "never shuffles for the lookup (one shuffle only for the final "
    "rollup).",
    tags=("serving", "combinators"),
)
def q_dict_get_enrich(spark, t):
    d = t["nation"].filter(F.col("n_nationkey") < 20).select(
        "n_nationkey", "n_name"
    )
    return (
        t["customer"]
        .join(
            F.broadcast(d),
            F.col("c_nationkey") == F.col("n_nationkey"),
            "left",
        )
        .groupBy(F.coalesce("n_name", F.lit("UNKNOWN")).alias("nation_name"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            as_double(
                F.sum(dec("c_acctbal")).cast("decimal(18,2)")
            ).alias("sum_acctbal"),
        )
    )


@register(
    "group_array_caps",
    # groupArray(5) keeps the FIRST 5 in time order — list(... ORDER BY)
    # + 1-based slice in DuckDB, array_sort(collect_list(struct)) + slice
    # in Spark (same (ts_us, event_id) total order). Arrays are
    # CSV-serialized (driver canonicalizer bans top-level containers);
    # values render as DECIMAL(18,6) strings, identical in both engines.
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list_distinct(list(event_type))), ',')
             AS event_kinds,
           array_to_string(
             list_transform(
               (list(CAST(value AS DECIMAL(18,6))
                     ORDER BY epoch_us(ts), event_id))[1:5],
               x -> CAST(x AS VARCHAR)),
             ',') AS first5_values
    FROM events GROUP BY user_id
    """,
    doc="ClickHouse groupUniqArray + groupArray(N): per user, the sorted "
    "distinct event kinds and the first 5 values in time order — "
    "collect_list/collect_set with an order-pinning struct sort and a "
    "cap, serialized for the driver. One combiner-friendly shuffle; the "
    "cap bounds result width exactly like ClickHouse's "
    "groupArray(max_size) bounds aggregate state.",
    tags=("analytics", "combinators"),
)
def q_group_array_caps(spark, t):
    e = t["events"].select(
        "user_id",
        "event_type",
        F.expr("ts DIV 1000").alias("ts_us"),
        "event_id",
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    g = e.groupBy("user_id").agg(
        F.array_join(
            F.array_sort(F.collect_set("event_type")), ","
        ).alias("event_kinds"),
        F.array_join(
            F.transform(
                F.slice(
                    F.array_sort(
                        F.collect_list(F.struct("ts_us", "event_id", "v"))
                    ),
                    1,
                    5,
                ),
                lambda s: s["v"].cast("string"),
            ),
            ",",
        ).alias("first5_values"),
    )
    return g


@register(
    "sum_map_props",
    # sumMap: key-wise sums across rows of a map column. Both engines
    # explode the map, sum per key EXACTLY (decimal), and re-serialize
    # sorted 'key:sum' pairs — the canonical mergeable-map aggregation.
    oracle="""
    WITH kv AS (
      SELECT user_id, event_type AS k,
             CAST(value AS DECIMAL(18,6)) AS v
      FROM events
    ), s AS (
      SELECT user_id, k, CAST(sum(v) AS DECIMAL(18,6)) AS sv
      FROM kv GROUP BY 1, 2
    )
    SELECT user_id,
           string_agg(k || ':' || CAST(sv AS VARCHAR), ',' ORDER BY k)
             AS value_sum_map
    FROM s GROUP BY user_id
    """,
    doc="ClickHouse sumMap((k),(v)): key-wise sums of a map column across "
    "rows — here map(event_type -> value) per user. Spark form: explode "
    "to (key, value) pairs, exact decimal sums per (group, key), then "
    "sort_array + concat back to the serialized map. Two "
    "combiner-friendly shuffles (per-key partial sums, then per-group "
    "re-assembly); per-key state is bounded by map-key cardinality, the "
    "same bound ClickHouse's sumMap state has.",
    tags=("analytics", "combinators"),
)
def q_sum_map_props(spark, t):
    kv = t["events"].select(
        "user_id",
        F.col("event_type").alias("k"),
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    s = kv.groupBy("user_id", "k").agg(
        F.sum("v").cast("decimal(18,6)").alias("sv")
    )
    return (
        s.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("k", "sv"))
                    ),
                    lambda x: F.concat(
                        x["k"], F.lit(":"), x["sv"].cast("string")
                    ),
                ),
                ",",
            ).alias("value_sum_map")
        )
    )


@register(
    "bitwise_aggregates",
    # groupBitAnd/Or/Xor are order-independent exact integer folds, so
    # they hash-match across engines with no special handling.
    oracle="""
    SELECT event_type,
           bit_and(user_id) AS users_bit_and,
           bit_or(user_id) AS users_bit_or,
           bit_xor(event_id) AS events_bit_xor
    FROM events GROUP BY event_type
    """,
    doc="ClickHouse groupBitAnd / groupBitOr / groupBitXor: bitwise "
    "aggregate folds per group (bitmask intersection/union fingerprints, "
    "xor checksums for set-equality probes). Associative, commutative, "
    "constant-size state — fully combiner-friendly, one shuffle, exact "
    "in both engines.",
    tags=("analytics", "combinators"),
)
def q_bitwise_aggregates(spark, t):
    return t["events"].groupBy("event_type").agg(
        F.bit_and("user_id").alias("users_bit_and"),
        F.bit_or("user_id").alias("users_bit_or"),
        F.bit_xor("event_id").alias("events_bit_xor"),
    )


@register(
    "gap_fill_interpolate",
    # Spine = full [min_day, max_day] range (global, deterministic);
    # zero-fill counts, forward-fill the daily sum (WITH FILL
    # INTERPOLATE's carry-forward). Sums are exact decimals cast to
    # double BEFORE the fill, so the filled copies are bit-identical.
    oracle="""
    WITH d AS (
      SELECT event_type,
             epoch_us(ts) // 86400000000 AS day_idx,
             count(*) AS n,
             CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,6))
                  AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT min(day_idx) AS lo, max(day_idx) AS hi FROM d
    ), spine AS (
      SELECT t.event_type, g.day_idx
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (SELECT unnest(generate_series(lo, hi)) AS day_idx
                  FROM bounds) g
    )
    SELECT s.event_type, s.day_idx,
           coalesce(d.n, 0) AS n,
           last_value(d.sum_value IGNORE NULLS) OVER (
             PARTITION BY s.event_type ORDER BY s.day_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS sum_value_ffill
    FROM spine s LEFT JOIN d USING (event_type, day_idx)
    """,
    doc="ClickHouse ORDER BY ... WITH FILL + INTERPOLATE: dense daily "
    "time series per event type — missing days materialized from a "
    "generated spine (sequence + explode), counts zero-filled, the "
    "daily sum carried forward with last_value(ignoreNulls). Scale: the "
    "spine is |types| x |days| (tiny vs the stream) broadcast against "
    "the aggregated days, so the raw scan is touched once; the fill is "
    "one window over the already-small result. The standard dashboard "
    "densification step ClickHouse ships as a SELECT modifier.",
    tags=("analytics", "timeseries"),
)
def q_gap_fill_interpolate(spark, t):
    from pyspark.sql.window import Window as W

    day = F.expr("(ts DIV 1000) DIV 86400000000")
    d = t["events"].groupBy(
        F.col("event_type"), day.alias("day_idx")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        as_double(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("decimal(18,6)")
        ).alias("sum_value"),
    )
    bounds = d.agg(
        F.min("day_idx").alias("lo"), F.max("day_idx").alias("hi")
    )
    spine = (
        t["events"]
        .select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi")).alias("day_idx"),
        )
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("day_idx")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        spine.join(d, ["event_type", "day_idx"], "left")
        .select(
            "event_type",
            "day_idx",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.last("sum_value", ignorenulls=True)
            .over(w)
            .alias("sum_value_ffill"),
        )
    )
