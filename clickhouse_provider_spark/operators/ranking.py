"""Distributed (mid)ranking — the scale path for rank statistics.

A plain ``rank() OVER (ORDER BY value)`` funnels the whole relation into
ONE task (Spark compiles a global window to a single partition), and a
per-group window parallelizes only as far as the group count. Rank
statistics (Mann-Whitney, Spearman) don't need a per-ROW sort though —
midranks are a function of the VALUE-level counts alone, so the rank pass
can collapse to distinct values first:

1. ``groupBy(group, value).count()`` — one combiner-friendly shuffle over
   the raw data; output is |distinct values| rows;
2. per-group running sum over the distinct values — a window whose input
   is the collapsed relation (for quantized/bounded-cardinality metrics,
   orders of magnitude smaller than the data; the common case for rank
   statistics), giving ``min_rank = cum - count + 1`` and
   ``avg_rank = min_rank + (count - 1)/2``;
3. join the per-value midrank back to the rows (plain equi-join; skipped
   entirely by callers that can aggregate on the collapsed relation).

The raw relation is never globally sorted: it pays one aggregation
shuffle and one join shuffle, both fully parallel. Midranks come out as
the same half-integers as the window formulation, so swapping this in
under an oracle-checked entry changes the PLAN, never the values.

Why not range-repartition + per-partition prefix offsets (the classic
two-pass rank for near-unique keys)? ``repartitionByRange`` picks its
boundaries by SAMPLING at execution time, so ``spark_partition_id()`` is
not stable across the two jobs that scheme needs (the offset job and the
rank job can see different partitionings — observed as wrong ranks, and
also breaks under task retry). A sound implementation must pin the
boundaries (persist the repartitioned relation, or compute explicit
boundary values first); for value-collapsible statistics the
distinct-collapse form is both simpler and cheaper, so it is the one
shipped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def value_midranks(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    out_col: str = "avg_rank",
) -> DataFrame:
    """Midrank per DISTINCT value within each group: one row per
    (group, value) with its tie count and midrank. The collapsed relation
    callers can aggregate directly (rank-sum statistics never need the
    join back)."""
    group_cols = list(group_cols or [])
    g = df.groupBy(*group_cols, value_col).agg(F.count(F.lit(1)).alias("_cnt"))
    w = W.partitionBy(*group_cols).orderBy(value_col) if group_cols else W.orderBy(
        value_col
    )
    cum = F.sum("_cnt").over(w)
    return g.withColumn(
        out_col,
        cum - F.col("_cnt") + F.lit(1) + (F.col("_cnt") - F.lit(1)) / F.lit(2.0),
    ).withColumnRenamed("_cnt", "tie_count")


def grouped_midrank(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    out_col: str = "avg_rank",
) -> DataFrame:
    """Append ``out_col`` = midrank of ``value_col`` within each group
    (global when ``group_cols`` is empty/None), via the distinct-collapse
    two-pass rank. Values are identical to
    ``rank() OVER (PARTITION BY group ORDER BY value)`` plus tie-count
    averaging — only the physical plan differs."""
    group_cols = list(group_cols or [])
    ranks = value_midranks(df, value_col, group_cols, out_col).drop("tie_count")
    return df.join(ranks, [*group_cols, value_col])


def bucketed_cumsum(
    df: DataFrame,
    order_col: str,
    val_col: str,
    bucket: "F.Column",
    group_cols: list[str] | None = None,
    out_col: str = "cum",
) -> DataFrame:
    """Distributed running sum of ``val_col`` in ``order_col`` order within
    each group — the two-level prefix-sum that replaces a per-group
    cumulative window (whose parallelism is capped at |groups|):

    1. per-(group, bucket) subtotals — tiny parallel aggregate (``bucket``
       must be a monotone non-decreasing function of ``order_col``, e.g. a
       coarse range bucket);
    2. running sum over buckets per group — a window over |buckets| rows;
    3. local running sum within each (group, bucket) partition + the
       bucket's prefix offset — parallel across |groups| x |buckets|
       partitions.

    Exact integer/decimal arithmetic throughout (same values as the
    single-window cumsum, any input order). Rows must be unique per
    (group, order_col) — pre-aggregate first, as rank statistics already
    do.
    """
    group_cols = list(group_cols or [])
    b = df.withColumn("_bkt", bucket)
    sub = b.groupBy(*group_cols, "_bkt").agg(F.sum(val_col).alias("_bw"))
    wb = (
        W.partitionBy(*group_cols).orderBy("_bkt")
        if group_cols
        else W.orderBy("_bkt")
    )
    offsets = sub.withColumn(
        "_off", F.sum("_bw").over(wb) - F.col("_bw")
    ).select(*group_cols, "_bkt", "_off")
    wl = W.partitionBy(*group_cols, "_bkt").orderBy(order_col)
    # offsets is |groups|x|buckets| rows — BOUNDED by construction (the
    # bucket fn is a coarse range), so broadcast it: the alternative is a
    # full shuffle of the collapsed relation just to meet a few-KB table,
    # and step 3's window re-shuffles on (group, bucket) anyway.
    return (
        b.join(F.broadcast(offsets), [*group_cols, "_bkt"])
        .withColumn(out_col, F.col("_off") + F.sum(val_col).over(wl))
        .drop("_bkt", "_off")
    )
