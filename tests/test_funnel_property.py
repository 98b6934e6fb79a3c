"""Property test for the exact windowFunnel: the composed-window-maxima
implementation vs an INDEPENDENT brute-force chain enumeration, on random
per-user event streams (duplicate timestamps, interleaved noise events,
boundary windows). The brute force enumerates actual index chains — a
completely different algorithm, so agreement over random inputs is strong
evidence the maxima recurrence implements the declared semantics."""

from itertools import combinations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from clickhouse_provider_spark.operators.temporal import funnel_levels

STAGES = ["s", "c", "p"]
WINDOW = 10


def brute_force_level(events: list[tuple[int, int, str]]) -> int:
    """Max k s.t. SOME strictly-ordered index chain matches stages[0..k-1]
    with ts(last) - ts(first) <= WINDOW. Events sorted by (ts, event_id)
    — the same total order the operator declares."""
    rows = sorted(events)
    best = 0
    for k in range(1, len(STAGES) + 1):
        for idxs in combinations(range(len(rows)), k):
            if [rows[i][2] for i in idxs] != STAGES[:k]:
                continue
            if rows[idxs[-1]][0] - rows[idxs[0]][0] <= WINDOW:
                best = max(best, k)
                break
    return best


#: one user's stream: up to 8 events, small ts range (forces duplicate
#: timestamps and window-boundary chains), noise type 'x' included
user_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=25),
        st.sampled_from(STAGES + ["x"]),
    ),
    min_size=0,
    max_size=8,
)


@settings(max_examples=6, deadline=None)
@given(st.lists(user_events, min_size=1, max_size=12))
def test_funnel_levels_match_brute_force(spark, users):
    rows = []
    expected = {}
    eid = 0
    for uid, evs in enumerate(users):
        tagged = []
        for ts, et in evs:
            rows.append((uid, eid, ts, et))
            tagged.append((ts, eid, et))
            eid += 1
        lvl = brute_force_level(tagged)
        if lvl >= 1:
            expected[uid] = lvl
    if not rows:
        return
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_us long, event_type string"
    )
    got = {
        r["user_id"]: r["level"]
        for r in funnel_levels(
            df,
            key="user_id",
            ts="ts_us",
            order_col="event_id",
            stage_conds=[F.col("event_type") == s for s in STAGES],
            window_us=WINDOW,
        ).collect()
    }
    assert got == expected


def brute_force_timed(events, gaps) -> tuple[bool, int | None]:
    """Independent reference for timed_chain_match: enumerate index chains
    matching STAGES with each adjacent gap within bounds; return (matched,
    latest completion ts)."""
    rows = sorted(events)
    n = len(STAGES)
    best_end = None
    for idxs in combinations(range(len(rows)), n):
        if [rows[i][2] for i in idxs] != STAGES:
            continue
        ok = all(
            rows[idxs[j + 1]][0] - rows[idxs[j]][0] <= gaps[j]
            for j in range(n - 1)
        )
        if ok:
            end = rows[idxs[-1]][0]
            best_end = end if best_end is None else max(best_end, end)
    return best_end is not None, best_end


@settings(max_examples=6, deadline=None)
@given(st.lists(user_events, min_size=1, max_size=12))
def test_timed_chain_match_matches_brute_force(spark, users):
    from clickhouse_provider_spark.operators.sequence import timed_chain_match

    gaps = [7, 4]
    rows = []
    expected = {}
    eid = 0
    for uid, evs in enumerate(users):
        tagged = []
        for ts, et in evs:
            rows.append((uid, eid, ts, et))
            tagged.append((ts, eid, et))
            eid += 1
        if tagged:  # keys with no rows are absent from the output relation
            expected[uid] = brute_force_timed(tagged, gaps)
    if not rows:
        return
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_us long, event_type string"
    )
    got = {
        r["user_id"]: (r["matched"], r["completed_ts_us"])
        for r in timed_chain_match(
            df,
            key="user_id",
            ts="ts_us",
            order_col="event_id",
            stage_conds=[F.col("event_type") == s for s in STAGES],
            max_gaps_us=gaps,
        ).collect()
    }
    assert got == expected


def brute_force_level_strict(events: list[tuple[int, int, str]]) -> int:
    """Strict-increase variant: chains additionally need STRICTLY
    increasing timestamps between adjacent elements."""
    rows = sorted(events)
    best = 0
    for k in range(1, len(STAGES) + 1):
        for idxs in combinations(range(len(rows)), k):
            if [rows[i][2] for i in idxs] != STAGES[:k]:
                continue
            if any(
                rows[idxs[j + 1]][0] <= rows[idxs[j]][0]
                for j in range(k - 1)
            ):
                continue
            if rows[idxs[-1]][0] - rows[idxs[0]][0] <= WINDOW:
                best = max(best, k)
                break
    return best


@settings(max_examples=6, deadline=None)
@given(st.lists(user_events, min_size=1, max_size=12))
def test_funnel_strict_increase_matches_brute_force(spark, users):
    rows = []
    expected = {}
    eid = 0
    for uid, evs in enumerate(users):
        tagged = []
        for ts, et in evs:
            rows.append((uid, eid, ts, et))
            tagged.append((ts, eid, et))
            eid += 1
        lvl = brute_force_level_strict(tagged)
        if lvl >= 1:
            expected[uid] = lvl
    if not rows:
        return
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_us long, event_type string"
    )
    got = {
        r["user_id"]: r["level"]
        for r in funnel_levels(
            df,
            key="user_id",
            ts="ts_us",
            order_col="event_id",
            stage_conds=[F.col("event_type") == s for s in STAGES],
            window_us=WINDOW,
            strict_increase=True,
        ).collect()
    }
    assert got == expected


def test_funnel_strict_increase_blocks_same_ts_chain(spark):
    # s@10, c@10, p@11: default mode chains all three (same-ts rows may
    # chain); strict_increase stops at level 1 (c cannot follow s@10)
    rows = [(1, 1, 10, "s"), (1, 2, 10, "c"), (1, 3, 11, "p")]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_us long, event_type string"
    )
    kw = dict(
        key="user_id", ts="ts_us", order_col="event_id",
        stage_conds=[F.col("event_type") == s for s in STAGES],
        window_us=WINDOW,
    )
    assert funnel_levels(df, **kw).collect()[0]["level"] == 3
    assert funnel_levels(df, **kw, strict_increase=True).collect()[0]["level"] == 1
    # spreading the timestamps restores level 3 under strict mode
    rows2 = [(2, 1, 10, "s"), (2, 2, 11, "c"), (2, 3, 12, "p")]
    df2 = spark.createDataFrame(
        rows2, "user_id long, event_id long, ts_us long, event_type string"
    )
    assert funnel_levels(df2, **kw, strict_increase=True).collect()[0]["level"] == 3


def brute_force_level_strict_order(events: list[tuple[int, int, str]]) -> int:
    """strict_order: chain elements must be CONSECUTIVE rows in the
    (ts, event_id) total order — any intervening row kills the chain."""
    rows = sorted(events)
    best = 0
    for k in range(1, len(STAGES) + 1):
        for i in range(len(rows) - k + 1):
            seg = rows[i : i + k]
            if [r[2] for r in seg] != STAGES[:k]:
                continue
            if seg[-1][0] - seg[0][0] <= WINDOW:
                best = max(best, k)
                break
    return best


@settings(max_examples=6, deadline=None)
@given(st.lists(user_events, min_size=1, max_size=12))
def test_funnel_strict_order_matches_brute_force(spark, users):
    rows = []
    expected = {}
    eid = 0
    for uid, evs in enumerate(users):
        tagged = []
        for ts, et in evs:
            rows.append((uid, eid, ts, et))
            tagged.append((ts, eid, et))
            eid += 1
        lvl = brute_force_level_strict_order(tagged)
        if lvl >= 1:
            expected[uid] = lvl
    if not rows:
        return
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_us long, event_type string"
    )
    got = {
        r["user_id"]: r["level"]
        for r in funnel_levels(
            df,
            key="user_id",
            ts="ts_us",
            order_col="event_id",
            stage_conds=[F.col("event_type") == s for s in STAGES],
            window_us=WINDOW,
            strict_order=True,
        ).collect()
    }
    assert got == expected


def test_funnel_strict_order_intervention_kills_chain(spark):
    # the documented ClickHouse example: A -> B -> D -> C stops at D
    rows = [(1, 1, 0, "s"), (1, 2, 1, "c"), (1, 3, 2, "x"), (1, 4, 3, "p")]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_us long, event_type string"
    )
    kw = dict(
        key="user_id", ts="ts_us", order_col="event_id",
        stage_conds=[F.col("event_type") == s for s in STAGES],
        window_us=WINDOW,
    )
    assert funnel_levels(df, **kw).collect()[0]["level"] == 3  # default: ok
    assert funnel_levels(df, **kw, strict_order=True).collect()[0]["level"] == 2
    # a repeated stage is also an intervention: s,c,c,p stops at level 2
    rows2 = [(2, 1, 0, "s"), (2, 2, 1, "c"), (2, 3, 2, "c"), (2, 4, 3, "p")]
    df2 = spark.createDataFrame(
        rows2, "user_id long, event_id long, ts_us long, event_type string"
    )
    assert funnel_levels(df2, **kw, strict_order=True).collect()[0]["level"] == 2


def test_funnel_strict_order_plus_increase_composition(spark):
    # s@5,c@5,p@6 are consecutive rows: strict_order alone chains all
    # three (ties may chain); adding strict_increase blocks the same-ts
    # s->c step, capping the level at 1
    rows = [(1, 1, 5, "s"), (1, 2, 5, "c"), (1, 3, 6, "p")]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_us long, event_type string"
    )
    kw = dict(
        key="user_id", ts="ts_us", order_col="event_id",
        stage_conds=[F.col("event_type") == s for s in STAGES],
        window_us=WINDOW,
    )
    assert funnel_levels(df, **kw, strict_order=True).collect()[0]["level"] == 3
    assert (
        funnel_levels(df, **kw, strict_order=True, strict_increase=True)
        .collect()[0]["level"]
        == 1
    )
