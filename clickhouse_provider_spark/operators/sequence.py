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

import re as _re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

#: greedy quantifier (* + {m,} {m,n}) not already lazy, outside escapes
#: and character classes — see :func:`_lazy_quantifiers`.
_GREEDY_QUANT = _re.compile(
    r"(\\.)"  # escaped char — copy verbatim
    r"|(\[(?:\\.|[^\]])*\])"  # character class — copy verbatim
    r"|((?:[*+]|\{\d+(?:,\d*)?\})(?!\?))"  # greedy quantifier — lazify
)


def _lazy_quantifiers(pattern: str) -> str:
    """Rewrite every greedy quantifier in ``pattern`` to its lazy form
    (``.*`` → ``.*?`` etc.), leaving escapes and character classes alone.

    ClickHouse ``sequenceCount`` scans left-to-right and restarts counting
    right after the EARLIEST completion of each chain; a greedy ``.*``
    instead consumes to the LAST occurrence, silently undercounting (on
    tags ``cpcp``, greedy ``c.*p`` finds 1 chain, ClickHouse finds 2).
    Lazy quantifiers make java.util.regex's leftmost-earliest match order
    coincide with ClickHouse's scan, so callers can write the natural
    subsequence pattern translation directly.
    """
    return _GREEDY_QUANT.sub(
        lambda m: m.group(0) + ("?" if m.group(3) else ""), pattern
    )


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
    of the pattern in the ordered tag string, counted in ClickHouse's scan
    order — left-to-right, restarting right after the EARLIEST completion
    of each chain. Greedy quantifiers in ``pattern`` are rewritten lazy
    internally (:func:`_lazy_quantifiers`) so the natural translation
    ``c.*p`` of ClickHouse ``(?1)(?2)`` counts every chain (greedy would
    swallow to the last ``p`` and undercount). Adds long ``chain_count``.
    """
    return seqs.withColumn(
        "chain_count",
        F.size(
            F.regexp_extract_all(
                "seq", F.lit(_lazy_quantifiers(pattern)), F.lit(0)
            )
        ).cast("long"),
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

        c_1(e) = ts(e) if e satisfies stage 1
        q_k(e) = max c_k over rows STRICTLY BEFORE e   (prefix excl. e)
        c_k(e) = ts(e) if e satisfies stage k
                 and ts(e) - q_{k-1}(e) <= max_gaps_us[k-2]

    The strict prefix (``rowsBetween(unboundedPreceding, -1)``) is what
    makes one event unable to fill two consecutive pattern slots: a row
    satisfying both stage k-1 and stage k only sees OTHER rows' stage-
    (k-1) completions, matching ClickHouse ``sequenceMatch``'s rule that
    each event is consumed by at most one slot (chain rows are therefore
    strictly increasing in the (ts, order_col) total order — all
    distinct events, though ties in raw ts between different rows still
    chain with gap 0). Carrying the max is exact because a LATER
    previous-step timestamp is always feasible-superset for the next gap
    constraint (gaps point backward), so the maximum dominates every
    other chain. Each q_k is a running max → one shuffle on the key, n-1
    window columns over one sorted partition, no self-joins, no per-key
    explosion.

    Returns (key, matched boolean, completed_ts_us nullable long — the
    latest chain-completion time) for every key present in ``df``.
    """
    n = len(stage_conds)
    assert len(max_gaps_us) == n - 1, "need one gap per adjacent stage pair"
    w_prev = (
        W.partitionBy(key)
        .orderBy(ts, order_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    out = df.withColumn("__c_1", F.when(stage_conds[0], F.col(ts)))
    for k in range(2, n + 1):
        q_prev = F.max(F.col(f"__c_{k - 1}")).over(w_prev)
        out = out.withColumn(f"__q_{k - 1}", q_prev).withColumn(
            f"__c_{k}",
            F.when(
                stage_conds[k - 1]
                & (
                    F.col(ts) - F.col(f"__q_{k - 1}")
                    <= F.lit(int(max_gaps_us[k - 2]))
                ),
                F.col(ts),
            ),
        )
    return out.groupBy(key).agg(
        F.max(F.col(f"__c_{n}")).isNotNull().alias("matched"),
        F.max(F.col(f"__c_{n}")).alias("completed_ts_us"),
    )


def sequence_next_node(
    df: DataFrame,
    key: str,
    ts: str,
    order_col: str,
    event_col: str,
    stage_conds: list[Column],
    direction: str = "forward",
    base: str = "first_match",
) -> DataFrame:
    """ClickHouse ``sequenceNextNode(direction, base)`` for the match-based
    bases: per key, the event value immediately adjacent to a chain of
    CONSECUTIVE events matching the stage conditions (sequenceNextNode
    compares adjacent stored events — an intervening row of any other
    kind breaks the candidate chain; note this is NOT windowFunnel
    strict_order, which tracks per-stage slots and aborts the scan on
    interventions).

    - ``direction='forward'``: the chain runs ``cond_1 .. cond_n`` in
      ascending ``(ts, order_col)`` order; the next node is the event
      AFTER the chain's last row (``lead(event, 1)`` at the completion).
    - ``direction='backward'``: the chain is anchored at a ``cond_1`` row
      and runs BACKWARD in time (``cond_2`` on the row immediately
      before, …); the next node is the event BEFORE the chain's earliest
      row (``lag(event, n)`` at the anchor).
    - ``base='first_match'`` picks the earliest matched chain,
      ``base='last_match'`` the latest (anchor position in the total
      order; both directions anchor on the chain's latest row, so the
      orderings coincide).

    Recurrence: boolean lag cascade ``m_1 = c_1``,
    ``m_k = c_k AND lag(m_{k-1})`` over the conditions in scan order
    (reversed for ``backward``, whose anchor is the chain's LATEST row) —
    ``m_n`` marks completion rows; the neighbour event at the selected
    completion row is the next node (null when the chain touches the
    key's stream edge, as in ClickHouse). One shuffle on the key, a
    lag/lead cascade over one sorted partition, then a combiner-friendly
    ``min/max(struct(...))`` arg-extreme — no self-joins, no per-key
    explosion.

    Returns (key, next_node) for keys with at least one match.
    """
    if direction not in ("forward", "backward"):
        raise ValueError(f"unknown direction {direction!r}")
    if base not in ("first_match", "last_match"):
        raise ValueError(f"unknown base {base!r}")
    n = len(stage_conds)
    w_lag = W.partitionBy(key).orderBy(ts, order_col)
    # scan order: forward completes at the cond_n row (conditions read in
    # chain order); backward anchors at the cond_1 row with cond_2..cond_n
    # on the rows before it, which is the same cascade over the REVERSED
    # condition list
    ordered = list(stage_conds) if direction == "forward" else list(
        reversed(stage_conds)
    )
    m = ordered[0]
    for k in range(2, n + 1):
        m = ordered[k - 1] & F.coalesce(
            F.lag(m, 1).over(w_lag), F.lit(False)
        )
    neighbour = (
        F.lead(F.col(event_col), 1).over(w_lag)
        if direction == "forward"
        else F.lag(F.col(event_col), n).over(w_lag)
    )
    pick = F.min if base == "first_match" else F.max
    out = (
        df.withColumn("__m", m)
        .withColumn("__nxt", neighbour)
        .filter(F.col("__m"))
        .groupBy(key)
        # (ts, order_col) is a total order, so the struct min/max is the
        # unique earliest/latest completion; __nxt rides along as payload
        .agg(
            pick(
                F.struct(F.col(ts), F.col(order_col), F.col("__nxt"))
            ).alias("__pick")
        )
        .select(key, F.col("__pick.__nxt").alias("next_node"))
    )
    return out
