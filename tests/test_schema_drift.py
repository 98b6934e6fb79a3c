"""Schema-drift canary for the driver-owned testdata.

The testdata's ``events.ts`` physical encoding has already changed once
under us (rounds 1-3 shipped INT64 TIMESTAMP(NANOS); round 4 regenerated as
plain ``timestamp[us]``), which broke every ts-family catalog entry and the
bench harness. ``load_tables`` now normalizes ``ts`` to the canonical
ns-LongType by introspecting the READ dtype (session._normalize_ts_ns), so
the engine must produce identical ts-family results no matter which of the
three plausible encodings the driver ships next:

- ``timestamp[us]``           (current testdata; Spark reads TIMESTAMP_NTZ)
- ``timestamp[ns]`` as INT64  (prior testdata; read as LongType via
                               ``nanosAsLong`` or the explicit-schema
                               fallback)
- raw INT64 nanoseconds       (the canonical form itself)

Each encoding of the SAME logical rows is written to a temp dir and the
ts-family queries are run through the same Spark-vs-DuckDB parity check the
driver uses. DuckDB's side uses ``epoch_us(ts)`` / raw arithmetic which is
encoding-agnostic, so all three encodings must agree with it.
"""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

# ts-family entries broken by the round-4 re-encode (VERDICT round 4 §wrong
# #1); all must stay green under every encoding.
TS_FAMILY = [
    "time_range",
    "latest_watermark",
    "user_history",
    "daily_counts",
    "replacing_dedup",
    "running_total",
    "session_gaps",
    "user_sessions",
    "tumbling_event_counts",
    "range_frame_window",
]


def _write_encodings(tmpdir: str) -> dict[str, str]:
    """The sf0.001 events table re-encoded three ways; every other table
    symlinked unchanged. Returns {encoding_name: sf_dir}."""
    src_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    table = pq.read_table(os.path.join(src_dir, "events.parquet"))
    ts = table.column("ts")
    # normalize the source to int64 ns regardless of its own encoding
    if pa.types.is_timestamp(ts.type):
        ns = ts.cast(pa.timestamp("ns")).cast(pa.int64())
    else:
        ns = ts.cast(pa.int64())

    def with_ts(arr: pa.ChunkedArray) -> pa.Table:
        i = table.schema.get_field_index("ts")
        return table.set_column(i, pa.field("ts", arr.type), arr)

    ts_ns = ns.cast(pa.timestamp("ns"))
    encodings = {
        "timestamp_us": with_ts(ts_ns.cast(pa.timestamp("us"))),
        "timestamp_ns_int64": with_ts(ts_ns),
        "raw_long_ns": with_ts(ns),
    }
    out = {}
    for name, tbl in encodings.items():
        sf_dir = os.path.join(tmpdir, name)
        os.makedirs(sf_dir)
        for f in os.listdir(src_dir):
            if f.endswith(".parquet") and f != "events.parquet":
                os.symlink(os.path.join(src_dir, f), os.path.join(sf_dir, f))
        pq.write_table(tbl, os.path.join(sf_dir, "events.parquet"))
        out[name] = sf_dir
    return out


@pytest.fixture(scope="module")
def encoded_dirs(tmp_path_factory):
    tmpdir = str(tmp_path_factory.mktemp("ts_encodings"))
    yield _write_encodings(tmpdir)
    shutil.rmtree(tmpdir, ignore_errors=True)


def test_events_ts_reads_as_long_under_every_encoding(spark, encoded_dirs):
    from pyspark.sql import types as T

    from clickhouse_provider_spark.session import load_tables

    for name, sf_dir in encoded_dirs.items():
        t = load_tables(spark, sf_dir)
        dt = t["events"].schema["ts"].dataType
        assert isinstance(dt, T.LongType), f"{name}: ts read as {dt}"


def test_ts_family_parity_under_every_encoding(spark, encoded_dirs):
    """The driver's own differential check, per encoding: identical
    row-count + column set + order-insensitive values vs the DuckDB oracle
    on the same files."""
    from tools.parity import run_parity

    for enc_name, sf_dir in encoded_dirs.items():
        if enc_name == "raw_long_ns":
            # DuckDB's epoch_us() needs a timestamp column, so the shared
            # oracle SQL cannot run on raw-int64 files — an encoding the
            # driver (pandas/arrow writer) cannot produce anyway. The
            # engine side is still covered for it by the other two tests.
            continue
        failures = run_parity(
            names=TS_FAMILY, sf_dir=sf_dir, spark=spark, verbose=False
        )
        assert not failures, f"{enc_name}: {failures}"


def test_nanos_values_identical_across_encodings(spark, encoded_dirs):
    """Same logical instant → same canonical ns value, bit-for-bit, under
    all three encodings (µs-sourced encodings have ns = µs*1000)."""
    from clickhouse_provider_spark.session import load_tables

    sums = {}
    for name, sf_dir in encoded_dirs.items():
        t = load_tables(spark, sf_dir)
        row = t["events"].selectExpr(
            "sum(cast(ts as decimal(38,0))) as s",  # long sum would overflow
            "min(ts) as mn",
            "max(ts) as mx",
            "count(*) as n",
        ).collect()[0]
        sums[name] = (row["s"], row["mn"], row["mx"], row["n"])
    assert len(set(sums.values())) == 1, sums


# --- embeddings drift -------------------------------------------------------

#: Embedding-family entries that would break if the driver re-encodes the
#: embeddings parquet (the same class of risk the ts re-encode realized).
EMB_FAMILY = ["similarity_topk", "embedding_norms", "embedding_quantize_int8"]


def _write_embedding_encodings(tmpdir: str) -> dict[str, str]:
    """The sf0.001 embeddings table re-encoded two plausible ways
    (element type float32 — current — and float64; vec_id int64 — current
    — and int32); every other table symlinked unchanged."""
    src_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    table = pq.read_table(os.path.join(src_dir, "embeddings.parquet"))

    def recode(emb_type, vec_id_type) -> pa.Table:
        t = table
        i = t.schema.get_field_index("embedding")
        t = t.set_column(
            i, pa.field("embedding", emb_type), t.column("embedding").cast(emb_type)
        )
        j = t.schema.get_field_index("vec_id")
        t = t.set_column(
            j, pa.field("vec_id", vec_id_type), t.column("vec_id").cast(vec_id_type)
        )
        return t

    encodings = {
        "f32_id64": recode(pa.list_(pa.float32()), pa.int64()),  # current
        "f64_id64": recode(pa.list_(pa.float64()), pa.int64()),
        "f32_id32": recode(pa.list_(pa.float32()), pa.int32()),
    }
    out = {}
    for name, tbl in encodings.items():
        sf_dir = os.path.join(tmpdir, name)
        os.makedirs(sf_dir)
        for f in os.listdir(src_dir):
            if f.endswith(".parquet") and f != "embeddings.parquet":
                os.symlink(os.path.join(src_dir, f), os.path.join(sf_dir, f))
        pq.write_table(tbl, os.path.join(sf_dir, "embeddings.parquet"))
        out[name] = sf_dir
    return out


@pytest.fixture(scope="module")
def embedding_dirs(tmp_path_factory):
    tmpdir = str(tmp_path_factory.mktemp("emb_encodings"))
    yield _write_embedding_encodings(tmpdir)
    shutil.rmtree(tmpdir, ignore_errors=True)


def test_embedding_family_parity_under_every_encoding(spark, embedding_dirs):
    """Both engines read the SAME re-encoded file, and every embedding
    consumer casts elements to double before arithmetic — so Spark and
    DuckDB must agree under each encoding (float64 files carry more
    precision than the float32 original; agreement is per-encoding, not
    across encodings)."""
    from tools.parity import run_parity

    for enc_name, sf_dir in embedding_dirs.items():
        failures = run_parity(
            names=EMB_FAMILY, sf_dir=sf_dir, spark=spark, verbose=False
        )
        assert not failures, f"{enc_name}: {failures}"
