"""Statistical aggregates — done exactly. Engine-native corr/stddev are
streaming/Welford implementations whose float results differ across
engines; both Pearson and stddev decompose into pure sums, so computing
the moments as exact decimals and combining them as doubles gives
bit-identical results in Spark and DuckDB (catalog.py rule 1 applied to
second moments).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from clickhouse_provider_spark.plans.catalog import as_double, dec, register

D20_4 = T.DecimalType(20, 4)


@register(
    "price_qty_corr",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             count(*) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))
                      * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))
                      * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (n * sxy - sx * sy)
             / nullif(sqrt(greatest(n * sxx - sx * sx, 0.0))
                      * sqrt(greatest(n * syy - sy * sy, 0.0)), 0.0)
             AS corr_qty_price,
           sqrt((n * sxx - sx * sx) / nullif(n * (n - 1), 0)) AS stddev_qty
    FROM m
    """,
    doc="Pearson correlation + sample stddev per group from exact decimal "
    "moments (sums/sums-of-squares are exact and order-free; the final "
    "combination is double arithmetic on identical inputs). Engine-native "
    "corr()/stddev() are Welford-streamed and NOT cross-engine stable — "
    "this decomposition is.",
    tags=("analytics", "stats"),
)
def q_price_qty_corr(spark, t):
    x = dec("l_quantity")
    y = dec("l_extendedprice")
    g = t["lineitem"].groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        as_double(F.sum(x)).alias("sx"),
        as_double(F.sum(y)).alias("sy"),
        as_double(F.sum((x * x).cast(D20_4))).alias("sxx"),
        as_double(F.sum((y * y).cast(D20_4))).alias("syy"),
        as_double(F.sum((x * y).cast(D20_4))).alias("sxy"),
    )
    # nullif/greatest guards mirror the oracle (catalog10 discipline):
    # constant columns and single-row groups yield NULL on BOTH engines
    # instead of an ANSI DIVIDE_BY_ZERO killing the Spark job — values on
    # non-degenerate groups are bit-identical (the guards never bind)
    n = F.col("n")
    corr = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / F.nullif(
        F.sqrt(F.greatest(n * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0.0)))
        * F.sqrt(F.greatest(n * F.col("syy") - F.col("sy") * F.col("sy"), F.lit(0.0))),
        F.lit(0.0),
    )
    std = F.sqrt(
        (n * F.col("sxx") - F.col("sx") * F.col("sx"))
        / F.nullif(n * (n - 1), F.lit(0))
    )
    return g.select(
        "l_returnflag", "n", corr.alias("corr_qty_price"), std.alias("stddev_qty")
    )


@register(
    "value_percentiles",
    oracle="""
    SELECT event_type,
           quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.9) AS p90,
           quantile_cont(value, 0.99) AS p99
    FROM events GROUP BY event_type
    """,
    doc="Exact interpolated percentiles (SQL-standard continuous "
    "quantile: both engines sort and linearly interpolate the same "
    "doubles — deterministic, verified). Scale note: exact percentiles "
    "need the full per-group sort; at 100 TB use approx_percentile "
    "(t-digest) unless the group fits a task.",
    tags=("analytics", "stats"),
)
def q_value_percentiles(spark, t):
    return t["events"].groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("p50"),
        F.percentile("value", 0.9).alias("p90"),
        F.percentile("value", 0.99).alias("p99"),
    )


@register(
    "approx_value_quantiles",
    # Same oracle pattern as approx_distinct_users: a sketch's raw output
    # (Greenwald-Khanna rank estimates here) is engine-specific, so the
    # oracle grades the sketch's CLAIM — the approx median must land
    # within 1% (relative) of the exact interpolated median — alongside
    # the exact value itself. A sketch regression (merge bug, wrong rank
    # math) flips the boolean → hash mismatch.
    oracle="""
    SELECT event_type,
           quantile_cont(value, 0.5) AS p50_exact,
           true AS approx_within_1pct
    FROM events GROUP BY event_type
    """,
    doc="approx_percentile (Greenwald-Khanna, accuracy 10000) vs the "
    "exact interpolated median, graded by error bound — the "
    "approximate-quantile class for 100 TB groups where the exact "
    "per-group sort (value_percentiles) is unaffordable. Constant-size "
    "sketch per group, mergeable map-side.",
    tags=("analytics", "stats", "approx"),
)
def q_approx_value_quantiles(spark, t):
    agg = t["events"].groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("p50_exact"),
        F.percentile_approx("value", 0.5, 10000).alias("_approx"),
    )
    return agg.select(
        "event_type",
        "p50_exact",
        (
            F.abs(F.col("_approx") - F.col("p50_exact"))
            <= 0.01 * F.abs(F.col("p50_exact"))
        ).alias("approx_within_1pct"),
    )


@register(
    "approx_topk_heavy_hitters",
    # Same oracle stance as approx_distinct_users / approx_value_quantiles:
    # a sketch's raw output is engine-specific, so the oracle grades the
    # exact side plus the sketch's CLAIM. Here the claim is the SpaceSaving
    # guarantee: every STRICT heavy hitter (count strictly above the
    # (k+1)-th count, so no tie ambiguity) must appear in the sketch's
    # top-k with its exact estimate — with maxItemsTracked >= distinct
    # items the sketch is exact, so a tracking/merge regression flips the
    # boolean -> hash mismatch.
    oracle="""
    WITH c AS (SELECT event_type, user_id, count(*) AS n_events
               FROM events GROUP BY 1, 2),
    r AS (SELECT event_type, user_id, n_events,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY n_events DESC, user_id) AS rnk
          FROM c)
    SELECT event_type, rnk, user_id, n_events,
           true AS approx_contains_strict_top
    FROM r WHERE rnk <= 5
    """,
    doc="ClickHouse topK analog — approximate heavy hitters per group via "
    "Spark's approx_top_k (bounded-memory frequent-items sketch, the "
    "SpaceSaving family ClickHouse topK uses). The exact top-5 users per "
    "event type (count desc, user_id tiebreak) is the graded output; the "
    "boolean carries the sketch's guarantee that every strict heavy "
    "hitter appears in its top-k with an exact estimate. Scale: the "
    "sketch side is ONE combiner-friendly shuffle on event_type with "
    "constant per-group state (maxItemsTracked entries) — at 100 TB that "
    "replaces the full (event_type, user_id) expansion the exact side "
    "pays; the exact side here exists to grade the sketch.",
    tags=("analytics", "approx"),
)
def q_approx_topk_heavy_hitters(spark, t):
    from pyspark.sql.window import Window as W

    K = 5
    counts = (
        t["events"]
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    w = W.partitionBy("event_type").orderBy(
        F.desc("n_events"), F.asc("user_id")
    )
    ranked = counts.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= K + 1
    )
    # (k+1)-th count per group: anything strictly above it is an
    # unambiguous heavy hitter the sketch MUST surface
    kth = (
        ranked.filter(F.col("rnk") == K + 1)
        .select("event_type", F.col("n_events").alias("_c_kplus1"))
    )
    top = ranked.filter(F.col("rnk") <= K)
    strict = (
        top.join(F.broadcast(kth), "event_type", "left")
        .filter(F.col("n_events") > F.coalesce("_c_kplus1", F.lit(-1)))
        .select("event_type", "user_id", "n_events")
    )
    sketch = (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.expr(f"approx_top_k(user_id, {K}, 10000)").alias("_tk")
        )
        .select(
            "event_type",
            F.explode("_tk").alias("_e"),
        )
        .select(
            "event_type",
            F.col("_e.item").alias("user_id"),
            F.col("_e.count").alias("_est"),
        )
    )
    claim = (
        strict.join(F.broadcast(sketch), ["event_type", "user_id"], "left")
        .groupBy("event_type")
        .agg(
            F.min(
                F.coalesce(F.col("_est") == F.col("n_events"), F.lit(False))
            ).alias("_ok")
        )
    )
    return (
        top.join(F.broadcast(claim), "event_type", "left")
        .select(
            "event_type",
            "rnk",
            "user_id",
            "n_events",
            F.coalesce("_ok", F.lit(True)).alias("approx_contains_strict_top"),
        )
    )


@register(
    "uniq_state_merge_rollup",
    # Oracle pattern of the approx family: exact side + the sketch's
    # CLAIM as a boolean. The claim here is MERGEABILITY — ClickHouse's
    # uniqState/uniqMerge contract: per-hour HLL partials unioned to a
    # day estimate must land within the sketch error bound of the exact
    # day distinct (lgConfigK=12 -> rsd ~1.6%; 5% ~ 3 sigma). A merge
    # regression (union over mismatched configs, lossy serialization)
    # flips the boolean -> hash mismatch.
    oracle="""
    SELECT event_type,
           epoch_us(ts) // 86400000000 AS day_idx,
           count(DISTINCT user_id) AS n_users_exact,
           true AS merge_within_5pct
    FROM events GROUP BY 1, 2
    """,
    doc="ClickHouse uniqState/uniqMerge analog (AggregatingMergeTree "
    "pre-aggregation): per-hour HyperLogLog partials (hll_sketch_agg — "
    "Apache DataSketches, a serialized mergeable state like uniqState) "
    "rolled up to per-day estimates via hll_union_agg (uniqMerge), "
    "graded against the exact day distinct. THE 100 TB pattern for "
    "repeated distinct-count dashboards: the raw stream is touched once "
    "to build constant-size hourly partials; every coarser grain (day/"
    "week/month, any late query) merges partials instead of rescanning — "
    "the same reason the reference DDL leans on materialized rollups. "
    "Two combiner-friendly shuffles (hour build, day merge), sketch "
    "state is a few KB per group at any row count.",
    tags=("analytics", "approx", "rollup"),
)
def q_uniq_state_merge_rollup(spark, t):
    e = t["events"].select(
        "event_type",
        "user_id",
        F.expr("(ts DIV 1000) DIV 3600000000").alias("hour_idx"),
        F.expr("(ts DIV 1000) DIV 86400000000").alias("day_idx"),
    )
    hourly = e.groupBy("event_type", "hour_idx", "day_idx").agg(
        F.hll_sketch_agg("user_id").alias("_sk")  # the uniqState partial
    )
    merged = hourly.groupBy("event_type", "day_idx").agg(
        F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("_est")
    )
    exact = e.groupBy("event_type", "day_idx").agg(
        F.countDistinct("user_id").alias("n_users_exact")
    )
    return exact.join(merged, ["event_type", "day_idx"]).select(
        "event_type",
        "day_idx",
        "n_users_exact",
        (
            F.abs(F.col("_est") - F.col("n_users_exact"))
            <= 0.05 * F.col("n_users_exact")
        ).alias("merge_within_5pct"),
    )


@register(
    "quantile_state_merge_rollup",
    # Third member of the -State/-Merge family (uniq_state_merge_rollup's
    # quantile sibling). The oracle grades the exact interpolated median
    # (cross-engine exact: F.percentile == quantile_cont, see
    # approx_value_quantiles) plus the merged sketch's CLAIM, expressed in
    # RANK space (KLL's native guarantee): the number of day values at or
    # below the merged estimate must put its rank within 0.5 +/- 0.05 of
    # the group, with a +/-1-item slack so 1-2-row day groups (where any
    # order statistic is >5% of the group away from rank 0.5) stay
    # well-defined. Far looser than KLL k=200's ~1% rank error, so only
    # a merge/serialization regression flips the boolean -> mismatch.
    # (A value-space band — exact p45..p55 — is NOT robust: get_quantile
    # returns an actual retained item, and for tiny groups that order
    # statistic can sit outside the interpolated band.)
    oracle="""
    SELECT event_type,
           epoch_us(ts) // 86400000000 AS day_idx,
           quantile_cont(value, 0.5) AS p50_exact,
           true AS merge_rank_within_5pct
    FROM events GROUP BY 1, 2
    """,
    doc="ClickHouse quantileState/quantileMerge analog: per-hour KLL "
    "sketch partials (kll_sketch_agg_double — Apache DataSketches, a "
    "mergeable serialized state) folded to a per-day median estimate "
    "with the pairwise kll_sketch_merge_double inside aggregate() over "
    "the collected hour partials (bounded: <= 24 few-KB sketches per "
    "fold), graded against the exact day median. Same 100 TB shape as "
    "the uniq rollup: the raw stream is touched once at the finest "
    "grain; every coarser grain merges constant-size partials. Two "
    "combiner-friendly shuffles; the exact side exists to grade the "
    "sketch.",
    tags=("analytics", "approx", "rollup"),
)
def q_quantile_state_merge_rollup(spark, t):
    e = t["events"].select(
        "event_type",
        F.col("value").cast("double").alias("value"),
        F.expr("(ts DIV 1000) DIV 3600000000").alias("hour_idx"),
        F.expr("(ts DIV 1000) DIV 86400000000").alias("day_idx"),
    )
    hourly = e.groupBy("event_type", "hour_idx", "day_idx").agg(
        F.kll_sketch_agg_double("value").alias("_sk")  # quantileState
    )
    merged = (
        hourly.groupBy("event_type", "day_idx")
        .agg(F.collect_list("_sk").alias("_sks"))
        .select(
            "event_type",
            "day_idx",
            # quantileMerge: left fold of the hour partials. NOTE the
            # indexing conventions differ on purpose: element_at is
            # 1-based (the FIRST sketch seeds the fold) while slice is
            # also 1-based (from the 2nd element, size-1 long — empty
            # for single-sketch groups). arr[i] bracket indexing is
            # 0-BASED in Spark and was a bug here once: _sks[1] seeded
            # with the SECOND sketch, dropping hour 1 — caught only when
            # a 1-sketch group threw under ANSI mode; the error-bound
            # claim had absorbed the distortion at sf0.01.
            F.expr(
                "kll_sketch_get_quantile_double("
                "  aggregate(slice(_sks, 2, size(_sks) - 1),"
                "            element_at(_sks, 1),"
                "            (acc, x) -> kll_sketch_merge_double(acc, x)),"
                "  0.5d)"
            ).alias("_est"),
        )
    )
    # rank the estimate among the day's raw values (broadcast: one row
    # per (event_type, day)) — n_le/n is the estimate's inclusive rank
    ranked = (
        e.join(F.broadcast(merged), ["event_type", "day_idx"])
        .groupBy("event_type", "day_idx")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(
                (F.col("value") <= F.col("_est")).cast("long")
            ).alias("_n_le"),
            F.sum(
                (F.col("value") < F.col("_est")).cast("long")
            ).alias("_n_lt"),
            F.percentile("value", 0.5).alias("p50_exact"),
        )
    )
    return ranked.select(
        "event_type",
        "day_idx",
        "p50_exact",
        (
            (F.col("_n_le") >= 0.45 * F.col("_n") - 1)
            & (F.col("_n_lt") <= 0.55 * F.col("_n") + 1)
        ).alias("merge_rank_within_5pct"),
    )


@register(
    "theta_set_algebra",
    # Approx-family grading stance: exact segment cardinalities plus the
    # sketches' CLAIM booleans. Theta sketches (lgK=12 default) are in
    # exact mode below ~4k distinct keys, so at the grading SF the
    # estimates are exact and only an algebra/serialization regression
    # can flip a boolean.
    oracle="""
    WITH u AS (
      SELECT user_id,
             bool_or(event_type = 'view') AS v,
             bool_or(event_type = 'purchase') AS p
      FROM events GROUP BY 1
    )
    SELECT count(*) FILTER (WHERE v) AS n_view_exact,
           count(*) FILTER (WHERE p) AS n_purchase_exact,
           count(*) FILTER (WHERE v AND p) AS n_both_exact,
           count(*) FILTER (WHERE v AND NOT p) AS n_view_only_exact,
           true AS intersect_within_5pct,
           true AS difference_within_5pct
    FROM u
    """,
    doc="ClickHouse uniqTheta set algebra (uniqThetaIntersect / "
    "uniqThetaNot): distinct users who did BOTH view and purchase, and "
    "view-but-never-purchase, estimated by intersecting / differencing "
    "per-segment theta sketches (Apache DataSketches via "
    "theta_sketch_agg + theta_intersection / theta_difference) and "
    "graded against the exact per-user-flag rollup. THE pattern for "
    "segment-overlap dashboards at 100 TB: each segment is sketched "
    "once (combiner-bound, constant state), and any boolean combination "
    "of segments is sketch algebra on few-KB objects instead of a "
    "multi-way distinct join over the raw stream.",
    tags=("analytics", "approx"),
)
def q_theta_set_algebra(spark, t):
    # each side is a GLOBAL agg over its filtered segment: a global agg
    # emits exactly one row even when the segment is EMPTY (theta_sketch_agg
    # of nothing is a valid empty sketch, estimate 0) — the groupBy-then-
    # filter form emitted ZERO rows for an absent event type, dropping the
    # whole output where the oracle still reports a 0-count row (caught by
    # the degenerate-events fixture)
    e = t["events"]
    v = e.filter(F.col("event_type") == "view").agg(
        F.theta_sketch_agg("user_id").alias("_v")
    )
    p = e.filter(F.col("event_type") == "purchase").agg(
        F.theta_sketch_agg("user_id").alias("_p")
    )
    est = v.crossJoin(p).select(  # 1x1: two single-row sketch frames
        F.theta_sketch_estimate(
            F.expr("theta_intersection(_v, _p)")
        ).alias("_both_est"),
        F.theta_sketch_estimate(
            F.expr("theta_difference(_v, _p)")
        ).alias("_only_est"),
    )
    exact = (
        t["events"]
        .groupBy("user_id")
        .agg(
            F.max(F.col("event_type") == "view").alias("_vf"),
            F.max(F.col("event_type") == "purchase").alias("_pf"),
        )
        .agg(
            F.count(F.when(F.col("_vf"), 1)).alias("n_view_exact"),
            F.count(F.when(F.col("_pf"), 1)).alias("n_purchase_exact"),
            F.count(
                F.when(F.col("_vf") & F.col("_pf"), 1)
            ).alias("n_both_exact"),
            F.count(
                F.when(F.col("_vf") & ~F.col("_pf"), 1)
            ).alias("n_view_only_exact"),
        )
    )
    return exact.crossJoin(F.broadcast(est)).select(
        "n_view_exact",
        "n_purchase_exact",
        "n_both_exact",
        "n_view_only_exact",
        (
            F.abs(F.col("_both_est") - F.col("n_both_exact"))
            <= 0.05 * F.col("n_both_exact")
        ).alias("intersect_within_5pct"),
        (
            F.abs(F.col("_only_est") - F.col("n_view_only_exact"))
            <= 0.05 * F.col("n_view_only_exact")
        ).alias("difference_within_5pct"),
    )
