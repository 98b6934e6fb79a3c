"""Unit tests for the round-7 operators: sequenceNextNode direction/base
variants, weighted SpaceSaving top-k, and LTTB downsampling."""

import random

import pytest
from pyspark.sql import functions as F

from clickhouse_provider_spark.operators.downsample import (
    lttb_downsample,
    lttb_select,
)
from clickhouse_provider_spark.operators.heavy_hitters import weighted_topk
from clickhouse_provider_spark.operators.sequence import sequence_next_node


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts_us long, event_type string"
    )


SEQ_KW = dict(
    key="user_id", ts="ts_us", order_col="event_id", event_col="event_type"
)


def test_seq_next_node_backward_first_match(spark):
    # user 1: v, s, c, p — backward chain (click anchored, signup before)
    # matches at c; node BEFORE the chain = v
    # user 2: s, c at stream start — chain matches, nothing before -> NULL
    # user 3: c alone (no preceding signup) -> no match, absent
    df = _events(
        spark,
        [
            (1, 1, 0, "v"), (1, 2, 1, "s"), (1, 3, 2, "c"), (1, 4, 3, "p"),
            (2, 5, 0, "s"), (2, 6, 1, "c"),
            (3, 7, 0, "c"),
        ],
    )
    got = {
        r["user_id"]: r["next_node"]
        for r in sequence_next_node(
            df,
            **SEQ_KW,
            stage_conds=[
                F.col("event_type") == "c",
                F.col("event_type") == "s",
            ],
            direction="backward",
            base="first_match",
        ).collect()
    }
    assert got == {1: "v", 2: None}


def test_seq_next_node_backward_picks_earliest_anchor(spark):
    # two backward matches: anchors at c@2 (preceded by x? no)...
    # stream: s,c,x,s,c,p -> anchors where c is directly preceded by s:
    # c@1 (before-chain node NULL at rank -1? chain rows s@0,c@1; node
    # before = none -> NULL) and c@4 (node before chain s@3 is x@2).
    # first_match -> earliest anchor c@1 -> NULL; last_match -> "x"
    df = _events(
        spark,
        [
            (1, 1, 0, "s"), (1, 2, 1, "c"), (1, 3, 2, "x"),
            (1, 4, 3, "s"), (1, 5, 4, "c"), (1, 6, 5, "p"),
        ],
    )
    conds = [F.col("event_type") == "c", F.col("event_type") == "s"]
    first = sequence_next_node(
        df, **SEQ_KW, stage_conds=conds, direction="backward",
        base="first_match",
    ).collect()
    last = sequence_next_node(
        df, **SEQ_KW, stage_conds=conds, direction="backward",
        base="last_match",
    ).collect()
    assert first[0]["next_node"] is None
    assert last[0]["next_node"] == "x"


def test_seq_next_node_forward_last_match(spark):
    # s,c,A,s,c,B: forward s->c completions at c@1 (next A) and c@4
    # (next B); first_match -> A, last_match -> B
    df = _events(
        spark,
        [
            (1, 1, 0, "s"), (1, 2, 1, "c"), (1, 3, 2, "A"),
            (1, 4, 3, "s"), (1, 5, 4, "c"), (1, 6, 5, "B"),
        ],
    )
    conds = [F.col("event_type") == "s", F.col("event_type") == "c"]
    first = sequence_next_node(
        df, **SEQ_KW, stage_conds=conds, direction="forward",
        base="first_match",
    ).collect()
    last = sequence_next_node(
        df, **SEQ_KW, stage_conds=conds, direction="forward",
        base="last_match",
    ).collect()
    assert first[0]["next_node"] == "A"
    assert last[0]["next_node"] == "B"


def test_seq_next_node_rejects_bad_args(spark):
    df = _events(spark, [(1, 1, 0, "s")])
    with pytest.raises(ValueError):
        sequence_next_node(
            df, **SEQ_KW, stage_conds=[F.lit(True)], direction="sideways"
        )
    with pytest.raises(ValueError):
        sequence_next_node(
            df, **SEQ_KW, stage_conds=[F.lit(True)], base="head"
        )


def _weighted_rows(seed=7, n=400, items=12, groups=2):
    rng = random.Random(seed)
    return [
        (f"g{rng.randrange(groups)}", rng.randrange(items),
         rng.randrange(1, 50))
        for _ in range(n)
    ]


def test_weighted_topk_exact_when_capacity_sufficient(spark):
    rows = _weighted_rows()
    df = spark.createDataFrame(
        rows, "grp string, item long, w long"
    ).repartition(4)
    got = weighted_topk(df, "grp", "item", "w", k=3, capacity=100).collect()
    # exact reference
    exact = {}
    for g, it, w in rows:
        exact.setdefault(g, {})
        exact[g][it] = exact[g].get(it, 0) + w
    for g, acc in exact.items():
        top = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        mine = sorted(
            [(r["rnk"], r["item"], r["est"], r["err"]) for r in got
             if r["grp"] == g]
        )
        assert mine == [
            (i + 1, it, w, 0) for i, (it, w) in enumerate(top)
        ], g


def test_weighted_topk_bounds_under_eviction(spark):
    # capacity below distinct items: SpaceSaving guarantees
    # true <= est and est - err <= true for every reported item
    rows = _weighted_rows(seed=11, n=600, items=40, groups=1)
    df = spark.createDataFrame(
        rows, "grp string, item long, w long"
    ).repartition(4)
    got = weighted_topk(df, "grp", "item", "w", k=10, capacity=8).collect()
    true = {}
    for _, it, w in rows:
        true[it] = true.get(it, 0) + w
    assert len(got) == 8  # summary truncated to capacity
    for r in got:
        t = true.get(r["item"], 0)
        assert r["est"] >= t, (r, t)
        assert r["est"] - r["err"] <= t, (r, t)


def test_weighted_topk_deterministic_across_runs(spark):
    rows = _weighted_rows(seed=3, n=500, items=30, groups=2)
    df = spark.createDataFrame(
        rows, "grp string, item long, w long"
    ).repartition(5)
    a = sorted(map(tuple, weighted_topk(df, "grp", "item", "w", 5, 10).collect()))
    b = sorted(map(tuple, weighted_topk(df, "grp", "item", "w", 5, 10).collect()))
    assert a == b


def test_lttb_select_short_series_kept_whole():
    assert lttb_select([1, 2, 3], [5, 6, 7], 12) == [0, 1, 2]
    assert lttb_select([], [], 12) == []


def test_lttb_select_known_example():
    # spike at x=5 must survive; flat tail must not displace first/last
    xs = list(range(10))
    ys = [0, 0, 0, 0, 0, 100, 0, 0, 0, 0]
    sel = lttb_select(xs, ys, 5)
    assert sel[0] == 0 and sel[-1] == 9
    assert len(sel) == 5
    assert 5 in sel  # the spike is the largest-triangle point of its bucket


def test_lttb_select_invariants():
    rng = random.Random(42)
    for _ in range(20):
        m = rng.randrange(13, 120)
        n_out = rng.randrange(3, 13)
        xs = sorted(rng.sample(range(10_000), m))
        ys = [rng.randrange(-50, 50) for _ in range(m)]
        sel = lttb_select(xs, ys, n_out)
        assert len(sel) == n_out
        assert sel[0] == 0 and sel[-1] == m - 1
        assert sel == sorted(sel)  # one point per bucket, left to right
        assert len(set(sel)) == n_out


def test_lttb_downsample_matches_local_selection(spark):
    rng = random.Random(9)
    rows = []
    series = {}
    for sid in ("a", "b", "c"):
        m = rng.randrange(20, 60)
        xs = sorted(rng.sample(range(5_000), m))
        ys = [rng.randrange(0, 200) for _ in range(m)]
        series[sid] = (xs, ys)
        rows += [(sid, x, y) for x, y in zip(xs, ys)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "sid string, x long, y long").repartition(4)
    got = lttb_downsample(df, "sid", "x", "y", n_out=9).collect()
    for sid, (xs, ys) in series.items():
        sel = lttb_select(xs, ys, 9)
        expect = [(i, xs[j], ys[j]) for i, j in enumerate(sel)]
        mine = sorted(
            (r["step"], r["x"], r["y"]) for r in got if r["sid"] == sid
        )
        assert mine == expect, sid


def test_merge_centroids_pinned():
    from clickhouse_provider_spark.operators.histogram import merge_centroids

    # gaps 1,1,97: leftmost tie merges first -> (1,2), then (1..3)
    out = merge_centroids([1, 2, 3, 100], [1, 1, 1, 1], 2)
    assert out == [(1, 3, 3, 6), (100, 100, 1, 100)]
    # n_bins >= V keeps per-value bins
    assert merge_centroids([5, 9], [2, 3], 10) == [(5, 5, 2, 10), (9, 9, 3, 27)]
    assert merge_centroids([], [], 4) == []


def test_merge_centroids_invariants():
    from clickhouse_provider_spark.operators.histogram import merge_centroids

    rng = random.Random(13)
    for _ in range(15):
        v = sorted(rng.sample(range(100_000), rng.randrange(1, 300)))
        c = [rng.randrange(1, 20) for _ in v]
        n_bins = rng.randrange(1, 16)
        out = merge_centroids(v, c, n_bins)
        assert len(out) == min(n_bins, len(v))
        assert sum(h for _, _, h, _ in out) == sum(c)
        assert sum(s for _, _, _, s in out) == sum(a * b for a, b in zip(v, c))
        assert out[0][0] == v[0] and out[-1][1] == v[-1]
        for (l1, h1, _, _), (l2, h2, _, _) in zip(out, out[1:]):
            assert l1 <= h1 < l2 <= h2
        # deterministic
        assert out == merge_centroids(v, c, n_bins)


def test_adaptive_histogram_spark_matches_local(spark):
    from clickhouse_provider_spark.operators.histogram import (
        adaptive_histogram,
        merge_centroids,
    )

    rng = random.Random(21)
    rows = [
        (f"g{rng.randrange(3)}", rng.randrange(0, 500)) for _ in range(2_000)
    ]
    df = spark.createDataFrame(rows, "grp string, v long").repartition(4)
    got = adaptive_histogram(df, "grp", "v", 6).collect()
    for g in ("g0", "g1", "g2"):
        counts = {}
        for gg, v in rows:
            if gg == g:
                counts[v] = counts.get(v, 0) + 1
        vs = sorted(counts)
        expect = [
            (b, lo, hi, h, s)
            for b, (lo, hi, h, s) in enumerate(
                merge_centroids(vs, [counts[v] for v in vs], 6)
            )
        ]
        mine = sorted(
            (r["bin"], r["lo"], r["hi"], r["height"], r["val_sum"])
            for r in got
            if r["grp"] == g
        )
        assert mine == expect, g


def test_seq_next_node_backward_last_match(spark):
    # two backward signup->click chains for user 1: anchors at the two
    # clicks (each immediately preceded by a signup); last_match picks the
    # LATEST anchor, whose before-chain node is 'p' (the first chain's
    # before-node is 'v')
    rows = [
        (1, 10, 100, "v"),
        (1, 11, 200, "s"),
        (1, 12, 300, "c"),
        (1, 13, 400, "p"),
        (1, 14, 500, "s"),
        (1, 15, 600, "c"),
        # user 2: chain starts the stream -> next_node NULL kept
        (2, 20, 100, "s"),
        (2, 21, 200, "c"),
    ]
    out = sequence_next_node(
        _events(spark, rows),
        stage_conds=[F.col("event_type") == "c", F.col("event_type") == "s"],
        direction="backward",
        base="last_match",
        **SEQ_KW,
    ).collect()
    got = {r["user_id"]: r["next_node"] for r in out}
    assert got == {1: "p", 2: None}
