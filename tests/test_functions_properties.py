"""Property tests for the pure column functions (SURVEY §5 #3), run
vectorized: hypothesis generates the corpus, one Spark job evaluates it,
and a Python reference model checks every row."""

import base64

import pytest
from hypothesis import given, settings

from tests.prop_settings import prop_examples
from hypothesis import strategies as st
from pyspark.sql import functions as F

from clickhouse_provider_spark import functions as fn


@pytest.fixture(scope="module")
def evaluate(spark):
    def run(values: list[bytes]):
        df = spark.createDataFrame([(v,) for v in values], ["b"])
        return [
            r["s"] for r in df.select(fn.utf8_or_base64(F.col("b")).alias("s")).collect()
        ]

    return run


BYTES = st.binary(min_size=0, max_size=64)


@settings(max_examples=prop_examples(1), deadline=None)
@given(st.lists(BYTES, min_size=1, max_size=300))
def test_utf8_or_base64_matches_reference_model(evaluate, values):
    got = evaluate(values)
    for raw, out in zip(values, got):
        try:
            expect = raw.decode("utf-8")
            # Spark's is_valid_utf8 also rejects nothing the codec allows;
            # both treat lone surrogates etc. as invalid
        except UnicodeDecodeError:
            expect = "base64:" + base64.b64encode(raw).decode()
        assert out == expect, raw


def test_utf8_or_base64_roundtrip_property(evaluate):
    """The encoded form is always losslessly invertible."""
    corpus = [b"", b"plain", "ünïcode".encode(), bytes([0xFF, 0x00, 0x41]), b"base64:tricky"]
    for raw, out in zip(corpus, evaluate(corpus)):
        if out.startswith("base64:") and _not_utf8(raw):
            assert base64.b64decode(out[7:]) == raw
        else:
            assert out.encode() == raw


def _not_utf8(raw: bytes) -> bool:
    try:
        raw.decode("utf-8")
        return False
    except UnicodeDecodeError:
        return True


@pytest.fixture(scope="module")
def eval_str(spark):
    def run(col_fn, values):
        df = spark.createDataFrame([(v,) for v in values], ["s"])
        return [r["o"] for r in df.select(col_fn(F.col("s")).alias("o")).collect()]

    return run


def test_limit_length_boundary(eval_str):
    vals = ["x" * n for n in (0, 1, 63, 64, 65, 100)] + ["é" * 32, "é" * 33]
    out = eval_str(fn.limit_length, vals)
    # byte semantics: 'é' is 2 bytes → 33 chars = 66 bytes → NULL
    assert out == vals[:4] + [None, None, "é" * 32, None]


def test_limit_length_idempotent(eval_str):
    vals = ["ok", "x" * 70, "é" * 40]
    once = eval_str(fn.limit_length, vals)
    twice = eval_str(lambda c: fn.limit_length(fn.limit_length(c)), vals)
    assert once == twice


def test_parse_u128_domain(eval_str):
    vals = ["0", "42", "1" * 38, "1" * 39, "-5", "1.5", " 7", "7 ", "a", "", None]
    out = eval_str(fn.parse_u128, vals)
    assert out[0] == 0 and out[1] == 42
    assert out[2] == int("1" * 38)
    assert out[3] is None  # 39 digits overflows Decimal(38,0)
    assert out[4:] == [None] * 7  # sign/decimal/space/alpha/empty/null all rejected


def test_account_id_grammar(eval_str):
    vals = [
        "alice.near", "a-b_c.near", "system", "aurora",
        "x",            # too short
        "A.near",       # uppercase
        "bad..near",    # empty segment
        "-lead.near",   # separator at edge
        "a" * 64, "a" * 65,
    ]
    out = eval_str(lambda c: fn.account_id_valid(c).cast("boolean"), vals)
    assert out == [True, True, True, True, False, False, False, False, True, False]


def test_cap_token_ids(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(a=["t1", "x" * 70, "t2", "t3", "t4", "t5"]), Row(a=[]), Row(a=None)]
    )
    out = [r["o"] for r in df.select(fn.cap_token_ids(F.col("a")).alias("o")).collect()]
    assert out[0] == ["t1", "t2", "t3", "t4"]  # drop oversize, then cap at 4
    assert out[1] == []
    assert out[2] is None
