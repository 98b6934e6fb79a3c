"""HTTP block-fetcher data source against a local stdlib HTTP server
serving the fixture chain (reference fetcher semantics, main.rs:59-127)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from clickhouse_provider_spark.sources import http_fetcher as HF
from tests import fixture_chain as FC


@pytest.fixture(scope="module")
def server():
    chain = {b["block"]["header"]["height"]: b for b in FC.make_chain()}
    first_h, last_h = min(chain), max(chain)
    seen_auth = []

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            seen_auth.append(self.headers.get("Authorization"))
            if self.path == "/v0/first_block":
                body = json.dumps(chain[first_h])
            elif self.path == "/v0/last_block/final":
                body = json.dumps(chain[last_h])
            elif self.path.startswith("/v0/block/"):
                h = int(self.path.rsplit("/", 1)[1])
                if h > last_h + 3:
                    self.send_response(404)
                    self.end_headers()
                    return
                # one skipped height past the tip exercises the null path
                body = json.dumps(chain.get(h)) if h in chain else "null"
            else:
                self.send_response(404)
                self.end_headers()
                return
            data = body.encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield {
        "url": f"http://127.0.0.1:{srv.server_address[1]}",
        "first": first_h,
        "last": last_h,
        "auth": seen_auth,
    }
    srv.shutdown()


def test_discovery_helpers(server):
    assert HF.fetch_first_block_height(server["url"]) == server["first"]
    assert HF.fetch_last_block_height(server["url"]) == server["last"]
    assert HF.fetch_block_json(server["url"], server["last"] + 1) is None  # skipped
    assert HF.fetch_block_json(server["url"], server["last"] + 99) is None  # 404


def test_start_clamp():
    """main.rs:88-91 (actions) and 104-117 (transactions cold cache)."""
    # fresh DB (watermark 0) → genesis
    assert HF.resolve_start_height(100, 0) == 100
    # resume past genesis → watermark + 1
    assert HF.resolve_start_height(100, 250) == 251
    # explicit backfill wins over the watermark
    assert HF.resolve_start_height(100, 250, backfill_height=180) == 181
    # cold tx cache rewinds SAFE_CATCH_UP_OFFSET, clamped at first block
    assert HF.resolve_start_height(100, 250, cache_ready=False) == 100
    assert HF.resolve_start_height(100, 5000, cache_ready=False) == 4000


def test_batch_read_ordered(spark, server):
    spark.dataSource.register(HF.NeardataBlockSource)
    df = (
        spark.read.format("neardata")
        .option("url", server["url"])
        .option("start_height", server["first"])
        .option("end_height", server["last"] + 2)  # 2 skipped → dropped
        .option("blocks_per_partition", 2)
        .option("num_threads", 4)
        .load()
    )
    rows = df.collect()
    assert [r["block_height"] for r in rows] == list(
        range(server["first"], server["last"] + 1)
    )
    # partition boundaries: ceil(7/2) = 4 ordered height ranges
    assert df.rdd.getNumPartitions() == 4


def test_batch_parse_and_extract(spark, server):
    """End-to-end: HTTP rows → JVM-side from_json → actions extraction
    matches the file-source pipeline's counts."""
    from clickhouse_provider_spark.operators.actions import extract_tables

    spark.dataSource.register(HF.NeardataBlockSource)
    raw = (
        spark.read.format("neardata")
        .option("url", server["url"])
        .option("start_height", server["first"])
        .option("end_height", server["last"])
        .load()
    )
    blocks = HF.parse_blocks(raw)
    out = extract_tables(blocks)
    assert out["actions"].count() == 11
    assert out["data"].count() == 4
    assert out["events"].count() == 3


def test_auth_bearer_header(spark, server):
    spark.dataSource.register(HF.NeardataBlockSource)
    before = len(server["auth"])
    (
        spark.read.format("neardata")
        .option("url", server["url"])
        .option("auth_bearer_token", "sekret")
        .option("start_height", server["first"])
        .option("end_height", server["first"])
        .load()
        .collect()
    )
    assert "Bearer sekret" in server["auth"][before:]


def test_stream_tail(spark, server, tmp_path_factory):
    """Streaming: offset-paced micro-batches capped at max_blocks_per_batch
    (the channel(100) backpressure analog), availableNow drains to the tip."""
    spark.dataSource.register(HF.NeardataBlockSource)
    got = []
    stream = (
        spark.readStream.format("neardata")
        .option("url", server["url"])
        .option("start_height", server["first"])
        .option("max_blocks_per_batch", 2)
        .load()
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, bid: got.append(
                [r["block_height"] for r in df.orderBy("block_height").collect()]
            )
        )
        .option(
            "checkpointLocation", str(tmp_path_factory.mktemp("ckpt_http"))
        )
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    import time

    want = list(range(server["first"], server["last"] + 1))
    deadline = time.monotonic() + 90
    while time.monotonic() < deadline:
        if [h for batch in got for h in batch] == want:
            break
        time.sleep(0.5)
    q.stop()
    assert [h for batch in got for h in batch] == want
    assert all(len(b) <= 2 for b in got)  # backpressure cap respected


def test_4xx_fails_fast_5xx_retries():
    """401/403 must raise on the FIRST attempt (no backoff burn with a bad
    bearer token); 5xx stays retryable."""
    import time as _time
    import urllib.error

    calls = {"n": 0}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            calls["n"] += 1
            code = int(self.path.rsplit("/", 1)[1])
            self.send_response(code)
            self.end_headers()

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        t0 = _time.perf_counter()
        with pytest.raises(urllib.error.HTTPError):
            HF._get(f"{url}/code/401", token="bad", timeout=5, retries=10)
        assert calls["n"] == 1  # fail-fast, no retries
        assert _time.perf_counter() - t0 < 2

        calls["n"] = 0
        with pytest.raises(urllib.error.HTTPError):
            HF._get(f"{url}/code/503", token=None, timeout=5, retries=3)
        assert calls["n"] == 3  # 5xx retried to exhaustion

        assert HF._get(f"{url}/code/404", token=None, timeout=5) is None
    finally:
        srv.shutdown()


def test_stream_restart_from_checkpoint(spark, server, tmp_path_factory):
    """Restart with a checkpoint AHEAD of the configured start: Spark never
    replays initialOffset, the reader's first latestOffset under-caps from
    the options start, partitions() sees hi <= lo, returns [] and re-syncs
    — the query must keep draining to the tip (duplicates allowed: the
    source is at-least-once; order within each batch still holds)."""
    import time

    spark.dataSource.register(HF.NeardataBlockSource)
    ckpt = str(tmp_path_factory.mktemp("ckpt_http_restart"))
    want = list(range(server["first"], server["last"] + 1))

    def run(got, stop_after_heights, interval="300 milliseconds"):
        q = (
            spark.readStream.format("neardata")
            .option("url", server["url"])
            .option("start_height", server["first"])
            .option("max_blocks_per_batch", 2)
            .load()
            .writeStream.foreachBatch(
                lambda df, bid: got.append(
                    [r["block_height"] for r in df.orderBy("block_height").collect()]
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(processingTime=interval)
            .start()
        )
        deadline = time.monotonic() + 90
        while time.monotonic() < deadline:
            if len({h for b in got for h in b}) >= stop_after_heights:
                break
            time.sleep(0.3)
        q.stop()

    first_run: list = []
    # 2 s between micro-batches: the 0.3 s poll reliably stops the query
    # between batches, so the first run deterministically ends mid-chain
    # (on a fast machine a 300 ms trigger drains all 5 heights before the
    # poll loop can react → checkpoint would NOT be mid-chain)
    run(first_run, stop_after_heights=3, interval="2 seconds")
    done1 = {h for b in first_run for h in b}
    assert len(done1) >= 3 and len(done1) < len(want)

    second_run: list = []
    run(second_run, stop_after_heights=len(want) - len(done1) + 2)
    time.sleep(0.1)
    all_heights = {h for run_ in (first_run, second_run) for b in run_ for h in b}
    assert all_heights == set(want)  # drained to the tip across the restart
    for b in first_run + second_run:
        assert b == sorted(b) and len(b) <= 2  # order + cap hold in every batch
