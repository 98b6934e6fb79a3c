"""Temporal join / rollup operators Spark lacks as built-ins.

Three operators, each expressed as a composition of existing DataFrame ops
(no UDFs, no driver-side loops) so Catalyst/Tungsten keep the whole plan in
codegen:

- :func:`asof_join` — point-in-time ("most recent prior") join, the
  time-series primitive ClickHouse exposes as ``ASOF JOIN`` (the serving DB
  the reference writes into; its consumers can run ASOF queries against the
  produced tables today, so this repo must express them too).
- :func:`range_join_binned` — interval/range join without a cartesian
  product, via the standard bin-and-equi-join rewrite (the "range join
  optimization" pattern; Spark's optimizer would otherwise pick
  BroadcastNestedLoopJoin for a pure inequality join).
- :func:`hypertable_rollup` — multi-resolution time-bucket continuous
  aggregate (TimescaleDB "hypertable rollup" / ClickHouse materialized-view
  cascade shape), computed HIERARCHICALLY: raw → finest bucket, each coarser
  level re-aggregated from the previous one.

Scale notes (100 TB):

- ``asof_join`` is ONE shuffle on the join key (both sides union first, so
  left and right co-partition by construction), then a streamed window per
  key — no per-key cross join, no state blowup. Skewed keys can be salted
  by appending a coarse time bucket to the partition key (the window is
  order-correct within a key-bucket as long as buckets are processed with
  carry-in; for bounded-staleness joins use ``tolerance`` ≤ bucket width and
  duplicate each right row into the next bucket).
- ``range_join_binned`` turns an O(|L|·|R|) nested loop into an equi-join on
  ``floor(ts / bin)``: each interval explodes into its covered bins
  (≤ ``ceil(len/bin)+1`` rows), each event hashes to exactly one bin. Pick
  ``bin_width`` ≥ the max interval length so intervals land in ≤ 2 bins.
- ``hypertable_rollup`` re-aggregates hour → day → week from the PREVIOUS
  level, so the big shuffle over raw data happens once at the finest
  resolution; coarser levels shuffle only bucket-cardinality rows (~1/3600th
  of the input for hour buckets). Decimal sums make the re-aggregation exact
  (float sums would drift between the direct and hierarchical paths).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tiebreak: str,
    tolerance_us: int | None = None,
) -> DataFrame:
    """Backward, inclusive as-of join: for each left row, attach the right
    row with the greatest ``right_ts`` ≤ ``left_ts`` for the same ``key``
    (NULLs when no prior right row exists).

    Implementation: tag sides, union, and take ``last(value, ignorenulls)``
    over a per-key window ordered by ``(ts, side, tiebreak)`` — right rows
    sort BEFORE left rows at equal timestamps, so an exactly-simultaneous
    right row is matched (ClickHouse ``ASOF JOIN ... ON l.ts >= r.ts``
    semantics, and DuckDB's ``ASOF LEFT JOIN`` default). ``tiebreak`` (a
    RIGHT-side column) makes the order among equal-``right_ts`` right rows
    total, so ties resolve deterministically (latest ``tiebreak`` wins).

    ``tolerance_us``: if set, matches older than ``left_ts - tolerance_us``
    are nulled out (pandas ``merge_asof(tolerance=...)`` shape) — the
    bounded-staleness form that also enables time-bucket salting at scale.

    Returns all left columns plus ``matched_<right_ts>`` and the requested
    ``value_cols`` (right-side names prefixed ``matched_``).
    """
    lcols = list(left.columns)
    carry = list(value_cols)
    # Right-side payloads get private names pre-union so a column present on
    # BOTH sides (events as-of-joined to events share `value`) can't leak
    # left values into the ignorenulls window.
    l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).cast("long").alias("__ts"),
        F.lit(1).alias("__side"),
        # tiebreak orders RIGHT rows only (a left row's window result is
        # unaffected by its order relative to other left rows at the same
        # ts, since right rows sort before it either way)
        F.lit(None).alias("__tb"),
        F.lit(None).cast("long").alias("__m_ts"),
        *[F.lit(None).alias(f"__v_{c}") for c in carry],
        *[F.col(c) for c in lcols],
    )
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).cast("long").alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(tiebreak).alias("__tb"),
        F.col(right_ts).cast("long").alias("__m_ts"),
        *[F.col(c).alias(f"__v_{c}") for c in carry],
        *[F.lit(None).alias(c) for c in lcols],
    )
    w = (
        W.partitionBy("__k")
        .orderBy("__ts", "__side", "__tb")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    m = l.unionByName(r, allowMissingColumns=False).withColumn(
        "__last_ts", F.last("__m_ts", ignorenulls=True).over(w)
    )
    for c in carry:
        m = m.withColumn(f"matched_{c}", F.last(f"__v_{c}", ignorenulls=True).over(w))
    stale: Column = F.lit(False)
    if tolerance_us is not None:
        stale = F.col("__ts") - F.col("__last_ts") > F.lit(tolerance_us)
    m = m.filter(F.col("__side") == 1)
    match_ts = F.when(stale, F.lit(None)).otherwise(F.col("__last_ts")).alias("matched_ts")
    out_vals = [
        F.when(stale, F.lit(None)).otherwise(F.col(f"matched_{c}")).alias(f"matched_{c}")
        for c in carry
    ]
    return m.select(*lcols, match_ts, *out_vals)


def range_join_binned(
    left: DataFrame,
    left_ts: str,
    intervals: DataFrame,
    start: str,
    end: str,
    bin_width_us: int,
    extra_key: str | None = None,
) -> DataFrame:
    """Interval join ``left.ts ∈ [start, end)`` as an equi-join on time bins.

    Each interval is exploded into the bins it covers
    (``sequence(start div w, (end-1) div w)``); each left row computes its
    single bin; the join is then a plain shuffled equi-join on
    ``(bin [, extra_key])`` followed by the exact range filter. No
    BroadcastNestedLoopJoin / CartesianProduct appears in the plan
    (asserted in tests/test_temporal.py).

    Empty intervals (``end <= start``) produce no bins and thus no matches.
    Returns the joined rows (all interval columns + all left columns).
    """
    if bin_width_us <= 0:
        raise ValueError("bin_width_us must be positive")
    # Explicit aliases: both sides may share lineage (e.g. intervals derived
    # from the same events table), which would make bare column references
    # ambiguous in the self-join.
    iv = (
        intervals.filter(F.col(end) > F.col(start))
        .withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    F.expr(f"{start} DIV {bin_width_us}"),
                    F.expr(f"({end} - 1) DIV {bin_width_us}"),
                )
            ),
        )
        .alias("__iv")
    )
    lv = left.withColumn("__bin", F.expr(f"{left_ts} DIV {bin_width_us}")).alias(
        "__lv"
    )
    on = F.col("__iv.__bin") == F.col("__lv.__bin")
    if extra_key is not None:
        on = on & (F.col(f"__iv.{extra_key}") == F.col(f"__lv.{extra_key}"))
    joined = iv.join(lv, on, "inner").filter(
        (F.col(f"__lv.{left_ts}") >= F.col(f"__iv.{start}"))
        & (F.col(f"__lv.{left_ts}") < F.col(f"__iv.{end}"))
    )
    cols = [F.col(f"__iv.{c}").alias(c) for c in intervals.columns] + [
        F.col(f"__lv.{c}").alias(c)
        for c in left.columns
        if c not in intervals.columns
    ]
    return joined.select(*cols)


def hypertable_rollup(
    events: DataFrame,
    ts_col: str,
    dims: Sequence[str],
    sum_col: Column,
    resolutions_us: Sequence[tuple[str, int]],
) -> DataFrame:
    """Multi-resolution continuous aggregate, computed hierarchically.

    ``resolutions_us`` is (label, width_us) pairs, FINEST FIRST; each width
    must divide the next (hour → day → week), so every coarser bucket is an
    exact union of finer ones and the level-(k+1) aggregate can be computed
    from level k's output instead of rescanning raw data. ``sum_col`` must
    be a decimal expression (exact re-aggregation; float sums would make
    the hierarchical result diverge from a direct groupBy).

    Output: ``resolution, bucket_us, *dims, n, sum_value`` (sum as double).
    """
    for (la, wa), (lb, wb) in zip(resolutions_us, resolutions_us[1:]):
        if wb % wa != 0:
            raise ValueError(f"{lb} width {wb} not a multiple of {la} width {wa}")
    label0, w0 = resolutions_us[0]
    level = (
        events.groupBy(
            F.expr(f"({ts_col} DIV {w0}) * {w0}").alias("bucket_us"), *dims
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum(sum_col).alias("__sum"))
    )
    outs = [
        level.select(
            F.lit(label0).alias("resolution"),
            "bucket_us",
            *dims,
            "n",
            F.col("__sum").cast("double").alias("sum_value"),
        )
    ]
    for label, width in resolutions_us[1:]:
        level = (
            level.groupBy(
                F.expr(f"(bucket_us DIV {width}) * {width}").alias("bucket_us"),
                *dims,
            )
            .agg(F.sum("n").alias("n"), F.sum("__sum").alias("__sum"))
        )
        outs.append(
            level.select(
                F.lit(label).alias("resolution"),
                "bucket_us",
                *dims,
                "n",
                F.col("__sum").cast("double").alias("sum_value"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def funnel_levels(
    events: DataFrame,
    key: str,
    ts: str,
    order_col: str,
    stage_conds: Sequence[Column],
    window_us: int,
    strict_increase: bool = False,
) -> DataFrame:
    """EXACT N-stage funnel (ClickHouse ``windowFunnel`` semantics, default
    mode): per key, the highest stage k such that SOME chain of events
    e1 ≤ e2 ≤ ... ≤ ek (row order: ``ts`` then ``order_col``) matches the
    stage conditions with ``ts(ek) - ts(e1) <= window_us``.

    Not greedy: rather than chaining from the earliest stage-1 event (which
    misses chains a later stage-1 event would enable), compute per event
    the OPTIMAL chain start via composed window maxima —

        start_1(e) = max ts over stage-1 rows ≤ e
        start_k(e) = max start_{k-1} over stage-k-1... rows ≤ e

    ``start_{k-1}`` is monotone non-decreasing in row order, so the max
    over stage-(k-1) rows ≤ e IS the chain with the latest possible start
    among chains of length k-1 ending at-or-before e; a chain ending at a
    stage-k event e fits the window iff ``ts(e) - start_{k-1}(e) <=
    window_us``. One shuffle on the key; N-1 window columns over the same
    sorted partition (a single Window exec, no extra exchanges).

    ``strict_increase=True`` is the OPTIMAL-CHAIN strict-increase
    variant: adjacent chain events must have STRICTLY increasing
    timestamps (the default mode lets same-``ts`` rows chain). The carry
    then reads the previous stage's best start over a ``RANGE … 1
    PRECEDING`` frame on ``ts`` — rows with equal ``ts`` are excluded
    from the prefix, and the composed-maxima argument is unchanged (a
    max over strictly-earlier rows is still monotone in row order).
    Property-tested against a brute-force enumeration of strictly
    increasing chains (tests/test_funnel_property.py,
    ``test_funnel_strict_increase_matches_brute_force``).

    .. warning:: this is NOT ClickHouse's ``strict_increase`` mode.
       ClickHouse's greedy single-slot scan refreshes slot 0 on EVERY
       stage-1 event, so on timestamp-backtracking streams it can
       forget a viable earlier chain start this recurrence keeps.
       Counterexample (found by Hypothesis, round 11): events
       ``s@0, s@22, s@19, c@22`` — this recurrence answers 2 (chain
       s@19 → c@22 is strictly increasing), ClickHouse answers 1 (the
       later ``s@22`` overwrote slot 0; ``c@22`` fails ``22 > 22``).
       Default mode has no such divergence (greedy slot overwrite ≡
       optimal chain there — the equality is property-tested); under
       strict_increase it is a false theorem, pinned as a documented
       divergence in ``test_funnel_strict_increase_scan_vs_recurrence_
       divergence_pinned``. For ClickHouse-faithful strict_increase use
       :func:`funnel_levels_scan` with ``strict_increase=True``.

    The remaining ClickHouse modes — ``strict_order`` (scan dies at the
    first non-matching event after the chain starts) and
    ``strict_deduplication`` (scan dies when an already-matched condition
    repeats) — are likewise ORDER-DEPENDENT EARLY-EXIT semantics, not
    expressible as the optimal-chain window recurrence; they live in
    :func:`funnel_levels_scan`, a faithful port of ClickHouse's
    single-slot scan.

    Returns (key, level) — level in [1, N] for keys with at least one
    stage-1 event; keys with none are absent.
    """
    n = len(stage_conds)
    w = (
        W.partitionBy(key)
        .orderBy(ts, order_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # strictly-earlier-ts prefix (range frame on the ts value): max over
    # it = best previous-stage chain start among events the current row
    # may legally follow under strict_increase
    w_strict = (
        W.partitionBy(key)
        .orderBy(ts)
        .rangeBetween(W.unboundedPreceding, -1)
    )
    df = events
    prev = F.when(stage_conds[0], F.col(ts))
    df = df.withColumn("__start_1", F.max(prev).over(w))
    for k in range(2, n + 1):
        if strict_increase:
            # c_{k-1}(e): start of the best (k-1)-chain ending exactly at
            # e (stage-1: its own ts; else: cond_{k-1} gating the
            # strictly-earlier best start computed one iteration ago);
            # __q_{k-1} = max c_{k-1} over STRICTLY earlier ts. Carrying
            # its running max (below) is sound because extending an
            # earlier completion by the current row preserves strict
            # increase (the tie can only be between the old and new k-th
            # element, and the frame already excluded ties from the carry)
            c_prev = (
                prev
                if k == 2
                else F.when(stage_conds[k - 2], F.col(f"__q_{k - 2}"))
            )
            df = df.withColumn(f"__q_{k - 1}", F.max(c_prev).over(w_strict))
            carried = F.when(stage_conds[k - 1], F.col(f"__q_{k - 1}"))
        else:
            carried = F.when(stage_conds[k - 1], F.col(f"__start_{k - 1}"))
        df = df.withColumn(f"__start_{k}", F.max(carried).over(w))
    # __start_k at a stage-k row e is the best chain start; levels:
    reached = [
        F.max(
            F.when(
                stage_conds[k - 1]
                & (F.col(ts) - F.col(f"__start_{k}") <= F.lit(window_us)),
                F.lit(1),
            ).otherwise(F.lit(0))
        ).alias(f"__r_{k}")
        for k in range(1, n + 1)
    ]
    agg = df.groupBy(key).agg(*reached)
    level = F.lit(0)
    for k in range(1, n + 1):
        level = F.when(F.col(f"__r_{k}") == 1, F.lit(k)).otherwise(level)
    return agg.select(key, level.cast("int").alias("level")).filter(
        F.col("level") >= 1
    )


def funnel_levels_scan(
    events: DataFrame,
    key: str,
    ts: str,
    order_col: str,
    stage_conds: Sequence[Column],
    window_us: int,
    strict_order: bool = False,
    strict_deduplication: bool = False,
    strict_increase: bool = False,
) -> DataFrame:
    """ClickHouse ``windowFunnel`` via a faithful port of its single-pass
    slot scan (public ClickHouse source,
    ``AggregateFunctions/AggregateFunctionWindowFunnel.h::getEventLevel``),
    for the ORDER-DEPENDENT EARLY-EXIT modes the optimal-chain window
    recurrence of :func:`funnel_levels` cannot express:

    - ``strict_order``: events matching NO condition are skipped until the
      first stage-1 match, and ABORT the whole scan after it (no chain
      restart: ``s,c,x,s,c,p`` → 2, ``s,x,s,c,p`` → 1). An event matching
      condition k whose predecessor slot k-1 is still empty after the
      chain has started also ends the scan, returning the current level
      (``s,p,c`` → 1). Repeats of an already-matched condition are NOT
      interventions — they re-advance from the tracked predecessor slot
      (``s,c,c,p`` → 3), and chain events need not be consecutive rows.
    - ``strict_deduplication``: when an event matches a condition k whose
      slot is ALREADY filled, the scan returns ``k - 1`` (ClickHouse's
      ``return events_list[i].second - 1`` — the level just below the
      duplicated stage, which can be LOWER than the level already
      reached: the repeat makes stage k's match non-unique, voiding it).
      ``s,c,c,p`` → 1; stage-1 repeats never trigger it (the slot-0
      refresh branch precedes the dedup check): ``s,s,c,p`` → 3.
    - ``strict_increase`` composes as in ClickHouse: an advance also
      requires ``ts`` strictly greater than the predecessor slot's last
      event time.

    Per key the scan keeps one ``(chain_first_ts, last_ts)`` pair per
    stage; a stage-k event with slot k-1 filled and
    ``ts - chain_first_ts <= window_us`` fills slot k (slots never expire
    or clear, exactly as in ClickHouse); filling slot N returns N
    immediately; otherwise the result is the number of lead slots filled.
    A row matching several conditions is processed per condition in
    ascending stage order (ClickHouse stores one events_list entry per
    matched condition, pushed in condition order).

    Execution: ``repartition(key)`` + ``sortWithinPartitions(key, ts,
    order)`` + ``mapInPandas`` — the same data movement as ClickHouse's
    own aggregate function (one hash shuffle on the key), but ONE Python
    invocation per Arrow batch instead of one per key:
    ``applyInPandas`` pays a per-group call + pandas-frame construction
    (~ms) which dominates wall-clock when keys are numerous and small
    (the common funnel shape — millions of users, tens of events each).
    The partition scan walks key change-points over the pre-sorted
    batch and runs the per-key slot scan on numpy slices; a group whose
    rows straddle an Arrow batch boundary is carried into the next
    batch. The semantics are inherently sequential WITH early exit, so a
    per-key linear scan is the right physical plan at any scale:
    Arrow-batched transfer of only (ts, order, N bools) per row,
    O(events-per-key) work, constant state. Rows are totally ordered by
    ``(ts, order_col)`` (ClickHouse sorts by timestamp only — stable,
    insertion order breaking ties — so a deterministic tiebreaker column
    is required for reproducibility on an unordered distributed input).

    Returns (key, level) with level in [1, N]; keys whose scan yields
    level 0 are absent (matching :func:`funnel_levels`'s convention).
    """
    import pandas as pd

    n = len(stage_conds)
    proj = events.select(
        F.col(key),
        F.col(ts).cast("long").alias("__ts"),
        F.col(order_col).alias("__ord"),
        *[
            F.coalesce(c.cast("boolean"), F.lit(False)).alias(f"__c{i}")
            for i, c in enumerate(stage_conds)
        ],
    )
    out_schema = (
        proj.select(key).schema.add("level", "integer").simpleString()
    )
    window = int(window_us)

    def _scan_one(tsv, conds) -> int:
        slots: list = [None] * n  # per stage: (chain_first_ts, last_ts)
        first_event = False
        for i in range(len(tsv)):
            t = int(tsv[i])
            row = conds[i]
            any_match = False
            for j in range(n):
                if not row[j]:
                    continue
                any_match = True
                if j == 0:
                    slots[0] = (t, t)
                    first_event = True
                elif strict_deduplication and slots[j] is not None:
                    return j  # ClickHouse: events_list[i].second - 1
                elif strict_order and first_event and slots[j - 1] is None:
                    break_level = 0
                    while break_level < n and slots[break_level] is not None:
                        break_level += 1
                    return break_level
                elif slots[j - 1] is not None:
                    first_ts, last_ts = slots[j - 1]
                    ok = t <= first_ts + window
                    if strict_increase:
                        ok = ok and last_ts < t
                    if ok:
                        slots[j] = (first_ts, t)
                        if j + 1 == n:
                            return n
            if strict_order and not any_match and first_event:
                break
        level = 0
        while level < n and slots[level] is not None:
            level += 1
        return level

    cnames = [f"__c{i}" for i in range(n)]

    def _scan_batch(pdf: pd.DataFrame):
        """Scan every complete key-group in a sorted batch; return
        (result_frame, trailing_group) — the trailing group may continue
        in the next Arrow batch."""
        import numpy as np

        keys = pdf[key].to_numpy()
        starts = np.flatnonzero(
            np.concatenate(([True], keys[1:] != keys[:-1]))
        )
        tail = pdf.iloc[starts[-1] :]
        tsv = pdf["__ts"].to_numpy()
        conds = pdf[cnames].to_numpy(dtype=bool)
        out_keys, out_levels = [], []
        for lo, hi in zip(starts[:-1], starts[1:]):
            level = _scan_one(tsv[lo:hi], conds[lo:hi])
            if level >= 1:
                out_keys.append(keys[lo])
                out_levels.append(level)
        return (
            pd.DataFrame(
                {key: out_keys, "level": pd.array(out_levels, "int32")}
            ),
            tail,
        )

    def _scan_partition(batches):
        carry = None
        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                carry = None
                continue
            res, carry = _scan_batch(pdf)
            if len(res):
                yield res
        if carry is not None and len(carry):
            level = _scan_one(
                carry["__ts"].to_numpy(),
                carry[cnames].to_numpy(dtype=bool),
            )
            if level >= 1:
                yield pd.DataFrame(
                    {
                        key: [carry[key].iloc[0]],
                        "level": pd.array([level], "int32"),
                    }
                )

    return (
        proj.repartition(key)
        .sortWithinPartitions(key, "__ts", "__ord")
        .mapInPandas(_scan_partition, out_schema)
    )
