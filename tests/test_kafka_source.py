"""Kafka source variant: the payload→blocks mapping must behave exactly
like the file source's schema read, against kafka-shaped records (no
broker in the container; the record schema is Spark's documented Kafka
source output)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clickhouse_provider_spark.sources import kafka_blocks
from tests import fixture_chain as FC

KAFKA_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
    ]
)


@pytest.fixture(scope="module")
def kafka_records(spark):
    rows = [
        (
            str(i).encode(),
            line.encode(),
            "blocks",
            i % 2,
            i,
            None,
        )
        for i, line in enumerate(FC.chain_jsonl())
    ]
    # a null-body record (fetcher skips these, main.rs:93-96)
    rows.append((b"x", b"null", "blocks", 0, 999, None))
    return spark.createDataFrame(rows, KAFKA_SCHEMA)


def test_payload_parses_to_block_schema(spark, kafka_records):
    blocks = kafka_blocks.kafka_payload_to_blocks(kafka_records)
    from clickhouse_provider_spark.schemas import BLOCK_SCHEMA

    block_fields = {f.name for f in BLOCK_SCHEMA.fields}
    out_fields = {f.name for f in blocks.schema.fields}
    assert block_fields <= out_fields
    assert {"_source_partition", "_source_offset"} <= out_fields


def test_null_payloads_dropped(spark, kafka_records):
    blocks = kafka_blocks.kafka_payload_to_blocks(kafka_records)
    assert blocks.count() == len(FC.chain_jsonl())  # 999-offset null dropped


def test_same_result_as_file_source(spark, kafka_records):
    """Kafka-fed and file-fed blocks must produce identical extraction
    output — the source is swappable without touching the pipeline."""
    from clickhouse_provider_spark.operators.actions import extract_tables
    from clickhouse_provider_spark.schemas import BLOCK_SCHEMA

    via_kafka = kafka_blocks.kafka_payload_to_blocks(kafka_records).drop(
        "_source_partition", "_source_offset"
    )
    via_file = spark.read.schema(BLOCK_SCHEMA).json(
        spark.sparkContext.parallelize(FC.chain_jsonl(), 2)
    )
    k_actions = extract_tables(via_kafka)["actions"]
    f_actions = extract_tables(via_file)["actions"]
    k_rows = sorted(map(str, k_actions.collect()))
    f_rows = sorted(map(str, f_actions.collect()))
    assert k_rows == f_rows


def test_parse_stays_jvm_side(spark, kafka_records):
    plan = kafka_blocks.kafka_payload_to_blocks(kafka_records)._jdf.queryExecution().toString()
    assert "EvalPython" not in plan


def test_starting_offsets_json():
    s = kafka_blocks.starting_offsets_json("blocks", {0: 123, 1: 456})
    import json

    assert json.loads(s) == {"blocks": {"0": 123, "1": 456}}
