"""Edge semantics for the ordered-sequence operators (catalog batch 7):
tie ordering, non-overlapping counts, argMax total order, quantization
edges, frame-slice boundaries — pinned on tiny hand-built frames so the
oracle-parity test can't silently agree on the easy cases only."""

import pytest
from pyspark.sql import functions as F

from clickhouse_provider_spark.operators import multimodal, similarity
from clickhouse_provider_spark.operators.sequence import (
    argmax_by_key,
    event_tag_strings,
    sequence_count,
    sequence_match,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts_us long, event_type string, value double"
    )


def test_tag_string_orders_by_ts_then_tag(spark):
    # same-ts events must order by tag — deterministic under any shuffle
    df = _events(
        spark,
        [(1, 10, "view", 0.0), (1, 10, "click", 0.0), (1, 5, "signup", 0.0)],
    )
    seqs = event_tag_strings(df).collect()
    assert seqs[0]["seq"] == "scv"  # signup first (ts=5), then c<v at ts=10


def test_sequence_match_is_subsequence_not_adjacency(spark):
    df = _events(
        spark,
        [(1, i, t, 0.0) for i, t in enumerate(["view", "error", "click", "error", "purchase"])],
    )
    out = sequence_match(event_tag_strings(df), "v.*c.*p").collect()
    assert out[0]["seq_matched"] is True


def test_sequence_count_non_overlapping(spark):
    # c p c p  -> 2 chains; c c p -> 1 chain (greedy left-to-right)
    rows = [(1, i, t, 0.0) for i, t in enumerate(["click", "purchase", "click", "purchase"])]
    rows += [(2, i, t, 0.0) for i, t in enumerate(["click", "click", "purchase"])]
    df = _events(spark, rows)
    out = {
        r["user_id"]: r["chain_count"]
        for r in sequence_count(event_tag_strings(df), "c[^p]*p").collect()
    }
    assert out == {1: 2, 2: 1}


def test_argmax_total_order_on_ts_tie(spark):
    # two rows tie on ts: the (event_type, value) tail breaks the tie the
    # same way on every run/partitioning
    df = _events(
        spark, [(1, 10, "view", 2.0), (1, 10, "view", 9.0), (1, 3, "click", 1.0)]
    )
    r = argmax_by_key(df, "user_id", ["ts_us", "event_type", "value"]).collect()[0]
    assert (r["last_ts_us"], r["last_event_type"], r["last_value"]) == (10, "view", 9.0)
    assert (r["first_ts_us"], r["first_event_type"]) == (3, "click")


def test_quantize_int8_edges(spark):
    emb = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, -1.0]), (2, [0.5, -0.25])],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in similarity.quantize_int8(emb).collect()}
    assert rows[0]["codes"] == [0, 0] and rows[0]["scale"] == 0.0  # zero vec
    assert rows[1]["codes"] == [127, -127]  # floor(-127 + 0.5) = -127
    assert rows[2]["codes"] == [127, -63]  # scale=0.5: floor(-63.5 + 0.5) = -63
    assert rows[1]["code_min"] >= -127 and rows[1]["code_max"] <= 127


def test_quantize_int8_rounding_matches_formula(spark):
    # pin the exact floor(x*127/scale + 0.5) convention (half toward +inf)
    import math

    vec = [1.0, -1.0, 0.5, -0.25, 0.003]
    emb = spark.createDataFrame([(0, vec)], "vec_id long, embedding array<float>")
    row = similarity.quantize_int8(emb).collect()[0]
    scale = max(abs(float(x)) for x in vec)
    expect = [math.floor(float(x) * 127.0 / scale + 0.5) for x in vec]
    assert row["codes"] == expect


def test_frame_slices_boundaries(spark):
    # 300-byte blob, stride 256, frame 64: offsets 0 (full 64), 256 (44-byte
    # tail) — and NO empty frame since 300 is off-grid
    media = spark.createDataFrame(
        [(1, b"x" * 300)], "media_id long, content binary"
    )
    out = {r["frame_off"]: r for r in multimodal.frame_slices(media).collect()}
    assert set(out) == {0, 256}
    assert out[0]["frame_n_bytes"] == 64
    assert out[256]["frame_n_bytes"] == 44
    # exact multiple: final empty EOF frame IS emitted
    media2 = spark.createDataFrame([(2, b"y" * 256)], "media_id long, content binary")
    out2 = {r["frame_off"]: r["frame_n_bytes"] for r in multimodal.frame_slices(media2).collect()}
    assert out2 == {0: 64, 256: 0}


def test_sequence_and_quantize_plans_stay_jvm_side(spark, tables):
    from clickhouse_provider_spark.plans import CATALOG

    for name in ("seq_match_user_paths", "argmax_latest_event",
                 "embedding_quantize_int8", "multimodal_frame_sample",
                 "pii_scrub_props"):
        plan = CATALOG[name].build(spark, tables)._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan, name
        # map-only entries must not shuffle at all
        if name in ("embedding_quantize_int8", "multimodal_frame_sample", "pii_scrub_props"):
            assert "Exchange" not in plan, name


def _timed(spark, rows, gaps):
    from clickhouse_provider_spark.operators.sequence import timed_chain_match

    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_us long, event_type string"
    )
    out = timed_chain_match(
        df,
        key="user_id",
        ts="ts_us",
        order_col="event_id",
        stage_conds=[
            F.col("event_type") == "s",
            F.col("event_type") == "c",
            F.col("event_type") == "p",
        ],
        max_gaps_us=gaps,
    ).collect()
    return {r["user_id"]: (r["matched"], r["completed_ts_us"]) for r in out}


def test_timed_chain_per_step_bound_not_whole_window(spark):
    # s@0, c@8, p@16 with gaps [10, 10]: every STEP fits (8, 8) but the
    # whole chain (16) would fail a 10-window funnel — timed must match
    rows = [(1, 1, 0, "s"), (1, 2, 8, "c"), (1, 3, 16, "p")]
    assert _timed(spark, rows, [10, 10])[1][0] is True
    # and a single oversized step fails even though the total fits
    rows = [(2, 1, 0, "s"), (2, 2, 1, "c"), (2, 3, 15, "p")]
    assert _timed(spark, rows, [10, 10])[2][0] is False


def test_timed_chain_is_not_greedy(spark):
    # s@0 then c@30 violates gap 10; the LATER s@25 rescues the chain —
    # a greedy earliest-start scan would miss it
    rows = [(1, 1, 0, "s"), (1, 2, 25, "s"), (1, 3, 30, "c"), (1, 4, 35, "p")]
    got = _timed(spark, rows, [10, 10])
    assert got[1] == (True, 35)


def test_timed_chain_reports_latest_completion(spark):
    rows = [
        (1, 1, 0, "s"), (1, 2, 5, "c"), (1, 3, 9, "p"),
        (1, 4, 12, "c"), (1, 5, 20, "p"),
    ]
    # the only valid chain is s@0 → c@5 → p@9: c@12 exceeds the first gap
    # (12-0 > 10) and p@20 exceeds the second from c@5 (20-5 > 10), so
    # the later events must NOT inflate completed_ts_us
    assert _timed(spark, rows, [10, 10])[1] == (True, 9)


def test_sequence_count_lazy_matches_clickhouse_scan_order(spark):
    # ClickHouse sequenceCount('(?1)(?2)') on tags c p c p finds 2 chains:
    # it restarts after the EARLIEST completion. The natural regex
    # translation 'c.*p' must count the same — greedy matching would
    # consume to the last p and report 1 (the round-5 ADVICE divergence).
    rows = [(1, i, t, 0.0) for i, t in enumerate(["click", "purchase", "click", "purchase"])]
    df = _events(spark, rows)
    out = sequence_count(event_tag_strings(df), "c.*p").collect()
    assert out[0]["chain_count"] == 2


def test_lazy_quantifier_rewrite_spares_classes_and_escapes():
    from clickhouse_provider_spark.operators.sequence import _lazy_quantifiers

    assert _lazy_quantifiers("c.*p") == "c.*?p"
    assert _lazy_quantifiers("a+b{2,}c{1,3}") == "a+?b{2,}?c{1,3}?"
    assert _lazy_quantifiers("c.*?p") == "c.*?p"  # already lazy: unchanged
    assert _lazy_quantifiers("[a*+]x*") == "[a*+]x*?"  # class interior kept
    assert _lazy_quantifiers(r"\*x*") == r"\*x*?"  # escaped literal kept


def test_timed_chain_one_event_cannot_fill_two_slots(spark):
    # With OVERLAPPING stage conditions, a single event satisfying both
    # stage 1 and stage 2 must not chain with itself (ClickHouse
    # sequenceMatch consumes each event for at most one slot).
    from clickhouse_provider_spark.operators.sequence import timed_chain_match

    conds = [F.col("event_type").isin("a", "b"), F.col("event_type") == "b"]

    def run(rows):
        df = spark.createDataFrame(
            rows, "user_id long, event_id long, ts_us long, event_type string"
        )
        out = timed_chain_match(
            df, key="user_id", ts="ts_us", order_col="event_id",
            stage_conds=conds, max_gaps_us=[10],
        ).collect()
        return {r["user_id"]: r["matched"] for r in out}

    # lone 'b' satisfies both conds — must NOT self-chain
    assert run([(1, 1, 5, "b")]) == {1: False}
    # a@0 then b@5: real two-event chain
    assert run([(2, 1, 0, "a"), (2, 2, 5, "b")]) == {2: True}
    # b@0 then b@5: first b consumes stage 1, second completes stage 2
    assert run([(3, 1, 0, "b"), (3, 2, 5, "b")]) == {3: True}
    # same-ts distinct rows still chain (gap 0)
    assert run([(4, 1, 7, "a"), (4, 2, 7, "b")]) == {4: True}


def test_sequence_next_node_first_match_forward(spark):
    from clickhouse_provider_spark.operators.sequence import sequence_next_node

    def run(rows):
        df = spark.createDataFrame(
            rows, "user_id long, event_id long, ts_us long, event_type string"
        )
        out = sequence_next_node(
            df, key="user_id", ts="ts_us", order_col="event_id",
            event_col="event_type",
            stage_conds=[F.col("event_type") == "s", F.col("event_type") == "c"],
        ).collect()
        return {r["user_id"]: r["next_node"] for r in out}

    # s,c,p: next node after the pair is p
    assert run([(1, 1, 0, "s"), (1, 2, 1, "c"), (1, 3, 2, "p")]) == {1: "p"}
    # intervening event breaks adjacency: s,x,c never matches
    assert run([(2, 1, 0, "s"), (2, 2, 1, "x"), (2, 3, 2, "c")]) == {}
    # FIRST match wins: s,c,a,s,c,b -> a (not b)
    assert run(
        [(3, i, i, t) for i, t in enumerate(["s", "c", "a", "s", "c", "b"])]
    ) == {3: "a"}
    # chain at end of stream -> null next node, row still emitted
    assert run([(4, 1, 0, "s"), (4, 2, 1, "c")]) == {4: None}
