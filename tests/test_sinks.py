"""External-DB sink shim: retry/backoff loop, dry-run gate, and streaming
integration (reference click.rs:50-85 semantics)."""

import json
from collections import Counter

import pytest

from clickhouse_provider_spark.sinks import ExternalSink
from clickhouse_provider_spark.streaming import run_actions_stream
from tests import fixture_chain as FC


@pytest.fixture()
def docs_df(spark):
    return spark.range(5).withColumnRenamed("id", "n")


def test_retry_then_success_with_backoff(spark, docs_df):
    calls = {"n": 0}
    delays = []

    def flaky(df, table):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise RuntimeError(f"transient #{calls['n']}")
        assert df.count() == 5

    sink = ExternalSink(insert_fn=flaky, sleep=delays.append)
    sink.insert_with_retry(docs_df, "actions")
    assert calls["n"] == 3
    # click.rs:59-61: 100 ms initial, doubled per retry
    assert delays == [pytest.approx(0.1), pytest.approx(0.2)]
    assert [(t, a) for t, a, _ in sink.attempts_log] == [("actions", 0), ("actions", 1)]


def test_retry_exhaustion_raises_last_error(spark, docs_df):
    delays = []

    def always_fails(df, table):
        raise RuntimeError("down")

    sink = ExternalSink(insert_fn=always_fails, sleep=delays.append, max_retries=4)
    with pytest.raises(RuntimeError, match="down"):
        sink.insert_with_retry(docs_df, "actions")
    # max_retries attempts, sleeps BETWEEN attempts only (click.rs: no
    # sleep after the final failure)
    assert len(sink.attempts_log) == 4
    assert delays == [pytest.approx(d) for d in (0.1, 0.2, 0.4)]


def test_skip_commit_gate(spark, docs_df, monkeypatch):
    """CLICKHOUSE_SKIP_COMMIT=true runs the pipeline but never commits
    (click.rs:63) — the transport must not be touched."""
    monkeypatch.setenv("CLICKHOUSE_SKIP_COMMIT", "true")
    called = []
    sink = ExternalSink(insert_fn=lambda df, t: called.append(t), sleep=lambda s: None)
    sink.insert_with_retry(docs_df, "actions")
    assert called == []
    assert sink.attempts_log == []


def test_invalid_identifier_rejected(spark, docs_df):
    sink = ExternalSink(url="jdbc:h2:mem:x")
    with pytest.raises(ValueError, match="identifier"):
        sink.insert_with_retry(docs_df, "actions; DROP TABLE blocks")


def test_actions_stream_into_external_sink(spark, tmp_path_factory):
    """Full streaming path with the sink as destination: same tables and
    row counts as the parquet warehouse path, delivered per micro-batch
    through insert_with_retry (one transient failure injected)."""
    src = tmp_path_factory.mktemp("sinkdrops")
    for b in FC.make_chain():
        h = b["block"]["header"]["height"]
        (src / f"block-{h:012d}.json").write_text(json.dumps(b))

    got = Counter()
    fail_once = {"armed": True}

    def capture(df, table):
        if fail_once["armed"]:
            fail_once["armed"] = False
            raise RuntimeError("transient insert failure")
        got[table] += df.count()

    sink = ExternalSink(insert_fn=capture, sleep=lambda s: None)
    ckpt = str(tmp_path_factory.mktemp("ckpt_sink"))
    q = run_actions_stream(
        spark, str(src), warehouse="", checkpoint=ckpt,
        max_files_per_trigger=1, sink=sink,
    )
    q.awaitTermination(120)
    assert got["actions"] == 11  # matches test_actions_stream's counts
    assert got["data"] == 4
    assert got["events"] == 3
    assert len(sink.attempts_log) == 1  # the injected transient retried
