"""Round-13 equivalence properties (VERDICT r12 task 6): extend the
thorough-sweep coverage to the Arrow-scan / recurrence operators Sweep A
did not reach — sequenceNextNode (both directions x both bases), the
sequence-regex lazy-quantifier translation, LTTB's integer argmax, and
the retention / decayed-average streaming folds — EACH against an
independent reference (plain-python ports, Fraction-exact math, or
set-based recomputation; never the implementation under test).

Gate runs use the derandomized default profile at small budgets; the
recorded exploration runs at PROP_MAX_EXAMPLES=500 live in
bisect/PROP_SWEEP_r13.md.
"""

from __future__ import annotations

from fractions import Fraction

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tests.prop_settings import prop_examples

from clickhouse_provider_spark.operators import sequence as SEQ
from clickhouse_provider_spark.operators.downsample import lttb_select
from clickhouse_provider_spark.streaming import decay, retention

ALPHABET = "abcd"


# ------------------------------------------------------------ references


def _ref_next_node(rows, stages, direction, base):
    """Independent plain-python port of ClickHouse sequenceNextNode for
    the match bases: rows = [(ts, order, event)] for ONE key, consecutive
    stored events must match the stages, the neighbour beyond the chain
    is the node. Returns (found, node_or_None)."""
    rows = sorted(rows)
    n = len(stages)
    anchors = []
    for i in range(len(rows)):
        if i - n + 1 < 0:
            continue
        if direction == "forward":
            ok = all(rows[i - n + 1 + k][2] == stages[k] for k in range(n))
            nxt = rows[i + 1][2] if i + 1 < len(rows) else None
        else:
            ok = all(rows[i - k][2] == stages[k] for k in range(n))
            nxt = rows[i - n][2] if i - n >= 0 else None
        if ok:
            anchors.append((rows[i][0], rows[i][1], nxt))
    if not anchors:
        return False, None
    pick = min(anchors) if base == "first_match" else max(anchors)
    return True, pick[2]


def _ref_chain_count(s: str, stages: list[str], min_gaps: list[int]) -> int:
    """Independent ClickHouse sequenceCount scan: left-to-right, restart
    right after the EARLIEST completion of each chain; min_gaps[i] is the
    minimum characters between stage i and stage i+1 (0 for '.*'
    separators, 1 for '.+')."""
    count, i = 0, 0
    while True:
        pos = i
        for k, ch in enumerate(stages):
            if k > 0:
                pos += min_gaps[k - 1]
            j = s.find(ch, pos)
            if j < 0:
                return count
            pos = j + 1
        count += 1
        i = pos


def _ref_lttb(xs: list[int], ys: list[int], n_out: int) -> list[int]:
    """Independent LTTB: the paper's formulation with Fraction-exact
    bucket averages and triangle areas (the implementation under test
    never divides — this reference does, exactly)."""
    m = len(xs)
    if m <= n_out:
        return list(range(m))
    big_m, big_n = m - 2, n_out - 2
    sel = [0]
    prev = 0
    for i in range(1, big_n + 1):
        s = 1 + ((i - 1) * big_m) // big_n
        e = 1 + (i * big_m) // big_n
        if i < big_n:
            ns, ne = 1 + (i * big_m) // big_n, 1 + ((i + 1) * big_m) // big_n
        else:
            ns, ne = m - 1, m
        ax = Fraction(sum(xs[ns:ne]), ne - ns)
        ay = Fraction(sum(ys[ns:ne]), ne - ns)
        px, py = xs[prev], ys[prev]
        best = None
        for j in range(s, e):
            area = abs(
                (px - ax) * (ys[j] - py) - (px - xs[j]) * (ay - py)
            ) / 2
            cand = (area, -xs[j])
            if best is None or cand > best[0]:
                best = (cand, j)
        sel.append(best[1])
        prev = best[1]
    sel.append(m - 1)
    return sel


class _FakeState:
    """Minimal GroupState stand-in for driving the applyInPandasWithState
    fold functions directly (exists/get/update are all they touch)."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        assert self._v is not None
        return self._v

    def update(self, v):
        self._v = tuple(v)


# ------------------------------------------------- sequenceNextNode


@st.composite
def _event_streams(draw):
    n_rows = draw(st.integers(1, 14))
    rows = []
    for i in range(n_rows):
        ts = draw(st.integers(0, 6))  # ties exercised; order disambiguates
        ev = draw(st.sampled_from(ALPHABET))
        rows.append((ts, i, ev))
    n_stages = draw(st.integers(1, 3))
    stages = [draw(st.sampled_from(ALPHABET)) for _ in range(n_stages)]
    return rows, stages


@pytest.mark.parametrize("direction", ["forward", "backward"])
@settings(max_examples=prop_examples(8))
@given(data=_event_streams())
def test_sequence_next_node_vs_python_port(spark, direction, data):
    rows, stages = data
    df = spark.createDataFrame(
        [(1, ts, o, ev) for ts, o, ev in rows],
        "user_id long, ts_us long, ord long, event string",
    )
    conds = [F.col("event") == s for s in stages]
    for base in ("first_match", "last_match"):
        got = SEQ.sequence_next_node(
            df, "user_id", "ts_us", "ord", "event", conds,
            direction=direction, base=base,
        ).collect()
        found, node = _ref_next_node(rows, stages, direction, base)
        if not found:
            assert got == []
        else:
            assert len(got) == 1
            assert got[0]["next_node"] == node


# ------------------------------------------ sequenceCount lazy rewrite


@st.composite
def _tag_strings(draw):
    strings = draw(
        st.lists(
            st.text(alphabet=ALPHABET, min_size=0, max_size=24),
            min_size=1, max_size=5,
        )
    )
    n_stages = draw(st.integers(1, 3))
    stages = [draw(st.sampled_from(ALPHABET)) for _ in range(n_stages)]
    seps = [draw(st.sampled_from([".*", ".+"])) for _ in range(n_stages - 1)]
    return strings, stages, seps


@settings(max_examples=prop_examples(8))
@given(data=_tag_strings())
def test_sequence_count_vs_scan_reference(spark, data):
    """The _lazy_quantifiers rewrite makes java.util.regex's match order
    coincide with ClickHouse's restart-after-earliest-completion scan —
    verified against an independent find()-based scanner, through the
    REAL Spark regexp path (python re agreeing would prove nothing about
    the JVM engine)."""
    strings, stages, seps = data
    pattern = stages[0] + "".join(
        sep + stg for sep, stg in zip(seps, stages[1:])
    )
    min_gaps = [0 if sep == ".*" else 1 for sep in seps]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strings)], "k long, seq string"
    )
    got = {
        r["k"]: r["chain_count"]
        for r in SEQ.sequence_count(df, pattern).collect()
    }
    want = {
        i: _ref_chain_count(s, stages, min_gaps)
        for i, s in enumerate(strings)
    }
    assert got == want


def test_lazy_quantifier_rewrite_leaves_escapes_and_classes():
    """Token-level pins for the rewriter itself (the property above only
    exercises .* / .+): escapes, classes, bounded reps, already-lazy."""
    lq = SEQ._lazy_quantifiers
    assert lq("c.*p") == "c.*?p"
    assert lq("c.+p{2,3}") == "c.+?p{2,3}?"
    assert lq("a{4}b{2,}") == "a{4}?b{2,}?"
    assert lq(r"c\*p") == r"c\*p"  # escaped star is a literal
    assert lq("c[*+]p") == "c[*+]p"  # class contents untouched
    assert lq(r"[\]*]+x") == r"[\]*]+?x"  # escaped ] inside class
    assert lq("c.*?p") == "c.*?p"  # already lazy stays lazy


# ----------------------------------------------------------------- LTTB


@st.composite
def _series(draw):
    m = draw(st.integers(3, 40))
    xs = sorted(
        draw(
            st.lists(
                st.integers(0, 10_000), min_size=m, max_size=m, unique=True
            )
        )
    )
    ys = draw(st.lists(st.integers(-1000, 1000), min_size=m, max_size=m))
    n_out = draw(st.integers(3, 12))
    return xs, ys, n_out


@settings(max_examples=prop_examples(50))
@given(data=_series())
def test_lttb_select_vs_fraction_reference(data):
    """The division-free BIGINT argmax (|cross| * cnt) must pick exactly
    the points the paper's averaged-triangle formulation picks — checked
    against a Fraction-exact reference (same tie-break: smallest x)."""
    xs, ys, n_out = data
    assert lttb_select(xs, ys, n_out) == _ref_lttb(xs, ys, n_out)


# --------------------------------------------- streaming folds vs truth


@st.composite
def _retention_traffic(draw):
    days = tuple(draw(st.lists(st.integers(0, 9), min_size=1, max_size=4,
                               unique=True)))
    events = draw(st.lists(st.integers(0, 9), min_size=0, max_size=30))
    # arbitrary micro-batch split points + duplicated chunk redelivery
    n_batches = draw(st.integers(1, 4))
    batches = [events[i::n_batches] for i in range(n_batches)]
    if draw(st.booleans()) and batches:
        batches.append(list(batches[draw(st.integers(0, len(batches) - 1))]))
    return days, events, batches


@settings(max_examples=prop_examples(50))
@given(data=_retention_traffic())
def test_retention_fold_vs_set_reference(data):
    """The keyed-OR fold is order/split/duplicate-insensitive: final
    flags equal the set-based recomputation under ANY batching."""
    days, events, batches = data
    fold = retention.make_fold(days)
    state = _FakeState()
    for b in batches:
        pdf = pd.DataFrame({"user_id": [7] * len(b), "d": b})
        list(fold((7,), iter([pdf]), state))
    want = 0
    for i, day in enumerate(days):
        if day in events:
            want |= 1 << i
    got = state._v[0] if state._v is not None else 0
    if not any(len(b) for b in batches):
        assert state._v is None
    else:
        assert got == want


@st.composite
def _decay_traffic(draw):
    n = draw(st.integers(1, 25))
    days = sorted(draw(st.lists(st.integers(0, 20), min_size=n, max_size=n)))
    vals = draw(st.lists(st.integers(0, 1000), min_size=n, max_size=n))
    # in-order arrival, arbitrary batch boundaries (days stay sorted)
    cuts = sorted(draw(st.lists(st.integers(0, n), max_size=3)))
    return days, vals, cuts


@settings(max_examples=prop_examples(50))
@given(data=_decay_traffic())
def test_decay_fold_vs_fraction_reference(data):
    """In-order replay of the (W, S) recurrence is BIT-identical to the
    closed-form decayed average: with integer values and a <=20-day span
    every intermediate is an exactly-representable dyadic, and both the
    fold's final division and float(Fraction) are correctly rounded, so
    they must agree exactly — the module docstring's claim, checked
    against independent Fraction math."""
    days, vals, cuts = data
    rows = list(zip(days, vals))
    bounds = [0] + cuts + [len(rows)]
    state = _FakeState()
    last_emit = None
    for a, b in zip(bounds, bounds[1:]):
        chunk = rows[a:b]
        pdf = pd.DataFrame(
            {
                "event_type": ["e"] * len(chunk),
                "day_idx": [d for d, _ in chunk],
                "value": [float(v) for _, v in chunk],
            }
        )
        out = list(decay._fold(("e",), iter([pdf]), state))
        if out:
            last_emit = out[-1]
    per_day: dict[int, int] = {}
    for d, v in rows:
        per_day[d] = per_day.get(d, 0) + v
    d0, d = min(per_day), max(per_day)
    num = sum(x * 2 ** (i - d0) for i, x in per_day.items())
    want = float(Fraction(num, 2 ** (d - d0 + 1) - 1))
    assert last_emit is not None
    assert float(last_emit["ema_halflife_1d"].iloc[0]) == want
    assert int(last_emit["day_idx"].iloc[0]) == d
