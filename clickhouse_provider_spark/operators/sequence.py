"""Ordered-event sequence operators (ClickHouse behavioral parity).

The reference's serving database exposes ``sequenceMatch`` /
``sequenceCount`` / ``argMax`` over the produced event tables (the same
family as ``windowFunnel`` / ``retention``, already in
``operators/temporal.py``) — per-key pattern queries over a
time-ordered event stream. Spark has no built-in for them; these are
compositions of DataFrame ops, no UDFs:

- Each key's events collapse to an ordered **tag string** (one char per
  event, sorted by ``(ts, tag)`` — total order, duplicate-proof), then
  pattern ops become JVM-side regex on that string. This mirrors how
  ClickHouse's sequenceMatch compiles its ``(?1)(?t<=..)(?2)`` patterns
  to a scan over the per-key sorted event buffer: state per key is
  O(events-per-key) there and here — the string just makes it
  codegen-friendly.
- ``argmax_by_key`` is the classic ``argMax(tuple, key)``: a single
  partial-aggregatable ``max(struct(ordering..., payload...))`` — one
  combiner-friendly shuffle, no window, no self-join.

Scale: one shuffle on the grouping key for either operator. The tag
string is bounded by events-per-key (same bound ClickHouse's in-memory
sequence buffer has); for pathological keys, pre-filter to the relevant
event kinds first — patterns only mention a few tags, so dropping
non-participating events before the groupBy keeps strings short.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def event_tag_strings(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts_us",
    tag: Column | str = "event_type",
    tag_chars: int = 1,
) -> DataFrame:
    """Collapse each key's events to one chronologically ordered string of
    per-event tags (first ``tag_chars`` chars of ``tag``).

    Ordering is by ``(ts, tag)`` — a total order even when two events of a
    key share a timestamp, so the result is deterministic under any input
    partitioning. One shuffle (the groupBy); ``array_sort`` over structs
    sorts field-lexicographically JVM-side.
    """
    tag_col = F.col(tag) if isinstance(tag, str) else tag
    ch = F.substring(tag_col, 1, tag_chars)
    ordered = F.array_sort(
        F.collect_list(F.struct(F.col(ts).alias("t"), ch.alias("c")))
    )
    return df.groupBy(key).agg(
        F.array_join(F.transform(ordered, lambda x: x["c"]), "").alias("seq")
    )


def sequence_match(seqs: DataFrame, pattern: str) -> DataFrame:
    """ClickHouse ``sequenceMatch``: does the key's ordered tag string
    contain the pattern (as a regex over tag chars, e.g. ``v.*c.*p`` for
    the subsequence view→click→purchase)? Adds boolean ``seq_matched``."""
    return seqs.withColumn("seq_matched", F.col("seq").rlike(pattern))


def sequence_count(seqs: DataFrame, pattern: str) -> DataFrame:
    """ClickHouse ``sequenceCount``: number of NON-OVERLAPPING occurrences
    of the pattern in the ordered tag string (left-to-right greedy — the
    same scan order ClickHouse uses). Adds long ``chain_count``."""
    return seqs.withColumn(
        "chain_count",
        F.size(F.regexp_extract_all("seq", F.lit(pattern), F.lit(0))).cast(
            "long"
        ),
    )


def argmax_by_key(
    df: DataFrame,
    key: str,
    order_cols: list[str],
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """``argMax``/``argMin`` family: per key, the payload carried by the
    row with the greatest (and least) ``order_cols`` tuple.

    Implemented as ``max(struct(order..., payload...))`` /
    ``min(struct(...))`` — struct comparison is field-lexicographic, so
    including the payload in the comparator makes the result a TOTAL
    order (deterministic even if the ordering tuple ties; ClickHouse's
    argMax picks an arbitrary row on ties — we pin the max payload).
    Partial-aggregatable: combiners shrink every partition to one struct
    per key before the single shuffle.

    Returns one row per key with ``last_<col>`` / ``first_<col>`` for
    every order+payload column.
    """
    payload_cols = payload_cols or []
    cols = list(order_cols) + [c for c in payload_cols if c not in order_cols]
    comparator = F.struct(*[F.col(c).alias(c) for c in cols])
    agg = df.groupBy(key).agg(
        F.max(comparator).alias("_mx"), F.min(comparator).alias("_mn")
    )
    out = [F.col(key)]
    out += [F.col(f"_mx.{c}").alias(f"last_{c}") for c in cols]
    out += [F.col(f"_mn.{c}").alias(f"first_{c}") for c in cols]
    return agg.select(*out)


def timed_chain_match(
    df: DataFrame,
    key: str,
    ts: str,
    order_col: str,
    stage_conds: list[Column],
    max_gaps_us: list[int],
) -> DataFrame:
    """ClickHouse ``sequenceMatch`` with time conditions —
    ``(?1)(?t<=g1)(?2)(?t<=g2)(?3)…``: per key, does SOME ordered event
    chain match the stage conditions with EACH adjacent step at most
    ``max_gaps_us[i]`` after the previous one?

    Exact (not greedy), by the same composed-monotone-maxima trick as
    ``temporal.funnel_levels``, but carrying the PREVIOUS STEP's
    timestamp instead of the chain start:

        p_1(e) = max ts over stage-1 rows ≤ e
        p_k(e) = max ts over stage-k rows e' ≤ e
                 with ts(e') - p_{k-1}(e') <= max_gaps_us[k-2]

    Carrying the max is exact because a LATER previous-step timestamp is
    always feasible-superset for the next gap constraint (gaps point
    backward), so the maximum dominates every other chain. p_k is a
    running max → one shuffle on the key, n window columns over one
    sorted partition, no self-joins, no per-key explosion.

    Returns (key, matched boolean, completed_ts_us nullable long — the
    latest chain-completion time) for every key present in ``df``.
    """
    n = len(stage_conds)
    assert len(max_gaps_us) == n - 1, "need one gap per adjacent stage pair"
    w = (
        W.partitionBy(key)
        .orderBy(ts, order_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = df.withColumn(
        "__p_1", F.max(F.when(stage_conds[0], F.col(ts))).over(w)
    )
    for k in range(2, n + 1):
        ok = stage_conds[k - 1] & (
            F.col(ts) - F.col(f"__p_{k - 1}") <= F.lit(int(max_gaps_us[k - 2]))
        )
        out = out.withColumn(f"__p_{k}", F.max(F.when(ok, F.col(ts))).over(w))
    return out.groupBy(key).agg(
        F.max(F.col(f"__p_{n}")).isNotNull().alias("matched"),
        F.max(F.col(f"__p_{n}")).alias("completed_ts_us"),
    )
