"""Property test for the exact windowFunnel: the composed-window-maxima
implementation vs an INDEPENDENT brute-force chain enumeration, on random
per-user event streams (duplicate timestamps, interleaved noise events,
boundary windows). The brute force enumerates actual index chains — a
completely different algorithm, so agreement over random inputs is strong
evidence the maxima recurrence implements the declared semantics."""

from itertools import combinations

from hypothesis import given, settings

from tests.prop_settings import prop_examples
from hypothesis import strategies as st
from pyspark.sql import functions as F

from clickhouse_provider_spark.operators.temporal import (
    funnel_levels,
    funnel_levels_scan,
)

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


@settings(max_examples=prop_examples(6), deadline=None)
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


@settings(max_examples=prop_examples(6), deadline=None)
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


@settings(max_examples=prop_examples(6), deadline=None)
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


def reference_scan_level(
    events: list[tuple[int, int, str]],
    strict_order: bool = False,
    strict_dedup: bool = False,
    strict_increase: bool = False,
) -> int:
    """Plain-python transliteration of ClickHouse's getEventLevel slot
    scan (AggregateFunctionWindowFunnel.h) — a differential twin for the
    Arrow applyInPandas implementation (dict-of-slots scan over tuples vs
    vectorized grouped numpy scan), plus the pinned concrete ClickHouse
    cases below. Events are (ts, event_id, type)."""
    n = len(STAGES)
    slots: dict[int, tuple[int, int]] = {}
    first = False
    for t, _eid, et in sorted(events):
        stage = STAGES.index(et) + 1 if et in STAGES else 0
        if stage == 0:
            if strict_order and first:
                break
            continue
        j = stage - 1
        if j == 0:
            slots[0] = (t, t)
            first = True
        elif strict_dedup and j in slots:
            return j  # ClickHouse: events_list[i].second - 1
        elif strict_order and first and (j - 1) not in slots:
            lvl = 0
            while lvl in slots:
                lvl += 1
            return lvl
        elif (j - 1) in slots:
            ft, lt = slots[j - 1]
            if t <= ft + WINDOW and (not strict_increase or lt < t):
                slots[j] = (ft, t)
                if stage == n:
                    return n
    lvl = 0
    while lvl in slots:
        lvl += 1
    return lvl


def _scan_levels(spark, rows, **mode):
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_us long, event_type string"
    )
    return {
        r["user_id"]: r["level"]
        for r in funnel_levels_scan(
            df,
            key="user_id",
            ts="ts_us",
            order_col="event_id",
            stage_conds=[F.col("event_type") == s for s in STAGES],
            window_us=WINDOW,
            **mode,
        ).collect()
    }


@settings(max_examples=prop_examples(4), deadline=None)
@given(st.lists(user_events, min_size=1, max_size=12))
def test_funnel_scan_modes_match_reference(spark, users):
    rows = []
    tagged = {}
    eid = 0
    for uid, evs in enumerate(users):
        tagged[uid] = []
        for ts, et in evs:
            rows.append((uid, eid, ts, et))
            tagged[uid].append((ts, eid, et))
            eid += 1
    if not rows:
        return
    for mode in (
        dict(),
        dict(strict_increase=True),
        dict(strict_order=True),
        dict(strict_deduplication=True),
        dict(strict_order=True, strict_increase=True),
        dict(strict_order=True, strict_deduplication=True),
        dict(strict_deduplication=True, strict_increase=True),
    ):
        ref_mode = dict(
            strict_order=mode.get("strict_order", False),
            strict_dedup=mode.get("strict_deduplication", False),
            strict_increase=mode.get("strict_increase", False),
        )
        expected = {
            uid: lvl
            for uid, evs in tagged.items()
            if (lvl := reference_scan_level(evs, **ref_mode)) >= 1
        }
        assert _scan_levels(spark, rows, **mode) == expected, mode


@settings(max_examples=prop_examples(4), deadline=None)
@given(st.lists(user_events, min_size=1, max_size=12))
def test_funnel_scan_default_equals_window_recurrence(spark, users):
    """ClickHouse's slot scan without strict flags computes the same
    levels as the optimal-chain window recurrence of funnel_levels — two
    completely different algorithms (sequential single-slot overwrite vs
    composed window maxima), so agreement over random streams is strong
    evidence for both.

    DEFAULT MODE ONLY: under strict_increase the equivalence is a FALSE
    THEOREM — the greedy scan refreshes slot 0 on every stage-1 event
    and can forget a viable earlier chain start on timestamp-backtracking
    streams, answering LOWER than the optimal chain (Hypothesis
    counterexample, round 11). The divergence is pinned below in
    test_funnel_strict_increase_scan_vs_recurrence_divergence_pinned;
    each implementation is independently verified against its own
    semantics (brute force for the recurrence, the plain-python
    ClickHouse port for the scan)."""
    rows = []
    eid = 0
    for uid, evs in enumerate(users):
        for ts, et in evs:
            rows.append((uid, eid, ts, et))
            eid += 1
    if not rows:
        return
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_us long, event_type string"
    )
    kw = dict(
        key="user_id", ts="ts_us", order_col="event_id",
        stage_conds=[F.col("event_type") == s for s in STAGES],
        window_us=WINDOW,
    )
    via_window = {
        r["user_id"]: r["level"]
        for r in funnel_levels(df, **kw).collect()
    }
    via_scan = {
        r["user_id"]: r["level"]
        for r in funnel_levels_scan(df, **kw).collect()
    }
    assert via_scan == via_window


def test_funnel_strict_increase_scan_vs_recurrence_divergence_pinned(spark):
    """DOCUMENTED DIVERGENCE (round-11 Hypothesis find, kept as a pinned
    regression so it can never un-find itself): under strict_increase,
    ClickHouse's greedy slot scan and the optimal-chain recurrence are
    DIFFERENT semantics.

    Stream (ts order): s@0 x5, s@19, s@22, c@22.
      - optimal chain: s@19 -> c@22 is strictly increasing and within the
        window -> level 2 (funnel_levels, entry
        window_funnel_strict_increase).
      - ClickHouse scan: every later s overwrites slot 0, ending at
        (22, 22); c@22 fails ts > 22 -> level 1 (funnel_levels_scan,
        entry window_funnel_strict_increase_scan).
    Both answers are asserted exactly, and both implementations must
    agree with their independent references (brute force / python port).
    """
    evs = [(0, "s"), (0, "s"), (0, "s"), (0, "s"), (22, "s"), (19, "s"),
           (0, "s"), (22, "c")]
    rows = [(7, eid, ts, et) for eid, (ts, et) in enumerate(evs)]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_us long, event_type string"
    )
    kw = dict(
        key="user_id", ts="ts_us", order_col="event_id",
        stage_conds=[F.col("event_type") == s for s in STAGES],
        window_us=WINDOW,
    )
    recurrence = funnel_levels(df, **kw, strict_increase=True).collect()
    scan = funnel_levels_scan(df, **kw, strict_increase=True).collect()
    assert recurrence[0]["level"] == 2
    assert scan[0]["level"] == 1
    tagged = [(ts, eid, et) for eid, (ts, et) in enumerate(evs)]
    assert brute_force_level_strict(tagged) == 2
    assert reference_scan_level(tagged, strict_increase=True) == 1


def test_funnel_strict_order_clickhouse_cases(spark):
    # The documented ClickHouse strict_order semantics: the scan ABORTS at
    # the first non-matching event after the chain starts — no restart.
    cases = [
        # s,c,x,s,c,p: x kills the whole scan -> level 2 (not 3)
        ([(0, "s"), (1, "c"), (2, "x"), (3, "s"), (4, "c"), (5, "p")], 2),
        # s,x,s,c,p: x right after the first s ends the scan -> level 1
        ([(0, "s"), (1, "x"), (2, "s"), (3, "c"), (4, "p")], 1),
        # s,c,c,p: a repeated matched stage is NOT an intervention -> 3
        ([(0, "s"), (1, "c"), (2, "c"), (3, "p")], 3),
        # s,p,c: p's predecessor slot is empty -> scan ends at level 1
        ([(0, "s"), (1, "p"), (2, "c")], 1),
        # x,x,s,c,p: non-matching events BEFORE the chain are skipped
        ([(0, "x"), (1, "x"), (2, "s"), (3, "c"), (4, "p")], 3),
    ]
    rows = [
        (uid, eid, ts, et)
        for uid, (evs, _) in enumerate(cases)
        for eid, (ts, et) in enumerate(evs)
    ]
    expected = {uid: lvl for uid, (_, lvl) in enumerate(cases)}
    assert _scan_levels(spark, rows, strict_order=True) == expected


def test_funnel_strict_dedup_clickhouse_cases(spark):
    cases = [
        # s,c,c,p: dup of matched stage 2 -> return 2-1 = 1 (ClickHouse's
        # `second - 1`: the repeat voids stage 2, undercutting level 2)
        ([(0, "s"), (1, "c"), (2, "c"), (3, "p")], 1),
        # s,s,c,p: stage-1 repeats only refresh slot 0 -> 3
        ([(0, "s"), (1, "s"), (2, "c"), (3, "p")], 3),
        # clean chain completes -> 3 (dedup after completion can't fire)
        ([(0, "s"), (1, "c"), (2, "p"), (3, "c")], 3),
        # s,c,x,c,p: noise is ignored in dedup mode, but the second c
        # still dups stage 2 -> 1
        ([(0, "s"), (1, "c"), (2, "x"), (3, "c"), (4, "p")], 1),
    ]
    rows = [
        (uid, eid, ts, et)
        for uid, (evs, _) in enumerate(cases)
        for eid, (ts, et) in enumerate(evs)
    ]
    expected = {uid: lvl for uid, (_, lvl) in enumerate(cases)}
    assert _scan_levels(spark, rows, strict_deduplication=True) == expected


def test_funnel_strict_order_plus_increase_composition(spark):
    # s@5,c@5,p@6: strict_order alone chains all three (ties chain, and
    # repeats/valid advances are not interventions); adding
    # strict_increase blocks the same-ts s->c advance, so p then finds
    # slot 2 empty and the scan ends at level 1
    rows = [(1, 1, 5, "s"), (1, 2, 5, "c"), (1, 3, 6, "p")]
    assert _scan_levels(spark, rows, strict_order=True) == {1: 3}
    assert _scan_levels(
        spark, rows, strict_order=True, strict_increase=True
    ) == {1: 1}
