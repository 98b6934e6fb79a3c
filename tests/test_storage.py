"""Storage semantics: MergeTree-like layout + replay idempotency
(SURVEY.md §5 test #4: ingest [0,N], re-ingest a tail window, tables
unchanged through the dedup view — the SAFE_CATCH_UP_OFFSET scenario)."""

import glob

import pytest
from pyspark.sql import functions as F

from clickhouse_provider_spark import storage
from tests import fixture_chain as FC


@pytest.fixture(scope="module")
def blocks(spark):
    from clickhouse_provider_spark.schemas import BLOCK_SCHEMA

    return spark.read.schema(BLOCK_SCHEMA).json(
        spark.sparkContext.parallelize(FC.chain_jsonl(), 2)
    )


@pytest.fixture(scope="module")
def warehouse(tmp_path_factory, blocks):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    storage.ingest_batch(blocks, wh)
    return wh


ALL_TABLES = ["actions", "events", "data", "transactions", "account_txs", "block_txs", "receipt_txs", "blocks"]


def test_all_tables_written(spark, warehouse):
    for name in ALL_TABLES:
        assert storage.read_table(spark, warehouse, name).count() > 0, name


def test_partition_layout(warehouse):
    # height 100-104 with bucket 100k → single bucket dir per table
    dirs = glob.glob(f"{warehouse}/actions/height_bucket=*")
    assert [d.rsplit("=", 1)[1] for d in dirs] == ["0"]


def test_replay_idempotent(spark, blocks, warehouse):
    before = {
        name: storage.read_table(spark, warehouse, name).count() for name in ALL_TABLES
    }
    # re-ingest the last 3 blocks (catch-up replay window)
    tail = blocks.filter(F.col("block.header.height") >= 102)
    storage.ingest_batch(tail, warehouse)  # append duplicates
    for name in ALL_TABLES:
        raw = spark.read.parquet(f"{warehouse}/{name}").count()
        deduped = storage.read_table(spark, warehouse, name).count()
        assert deduped == before[name], f"{name}: dedup view changed by replay"
        if name in ("blocks", "data"):
            assert raw > before[name]  # duplicates really were appended


def test_dedup_view_content_stable(spark, blocks, warehouse):
    """Dedup is last-write-wins on the sort key: values, not just counts."""
    rows = storage.read_table(spark, warehouse, "blocks").orderBy("block_height").collect()
    assert [r["block_height"] for r in rows] == [100, 101, 102, 103, 104]
    assert rows[0]["block_hash"] == "Hash100"


def test_merge_collapses_duplicates(spark, blocks, warehouse):
    """OPTIMIZE-FINAL analog: after a replay appended duplicates, merge
    physically removes them; content through the view is unchanged and
    raw count == deduped count afterwards."""
    before_view = storage.read_table(spark, warehouse, "blocks").orderBy("block_height").collect()
    removed = storage.merge_table(spark, warehouse, "blocks")
    assert removed > 0  # test_replay_idempotent appended duplicates
    raw = spark.read.parquet(f"{warehouse}/blocks").count()
    view = storage.read_table(spark, warehouse, "blocks")
    assert raw == view.count() == len(before_view)
    assert view.orderBy("block_height").collect() == before_view


def test_upsert_partition_scoped(spark, blocks, tmp_path_factory):
    """MERGE analog: updated rows replace same-key rows, only touched
    buckets rewritten, untouched buckets byte-identical."""
    from pyspark.sql import functions as F

    wh = str(tmp_path_factory.mktemp("upsert_wh"))
    base = storage.ingest_batch(blocks, wh, mode="overwrite")
    assert "blocks" in base
    # bucket the table finely so block 104 lives in its own partition
    raw = (
        spark.read.parquet(f"{wh}/blocks")
        .drop("height_bucket")
        .localCheckpoint(eager=True)  # materialize before deleting the source
    )
    import shutil

    shutil.rmtree(f"{wh}/blocks")
    storage.write_table(raw, wh, "blocks", mode="overwrite", bucket_size=2)
    untouched_dir = f"{wh}/blocks/height_bucket=50"  # heights 100-101
    before_files = sorted(
        p.name for p in __import__("pathlib").Path(untouched_dir).glob("*.parquet")
    )
    # upsert: new version of block 104 + brand-new block 105
    updated = raw.filter(F.col("block_height") == 104).withColumn(
        "author_id", F.lit("replacement.near")
    )
    new = raw.filter(F.col("block_height") == 104).withColumn(
        "block_height", F.lit(105).cast("long")
    )
    storage.upsert_table(spark, wh, "blocks", updated.unionByName(new), bucket_size=2)
    view = storage.read_table(spark, wh, "blocks")
    assert view.count() == 6  # 100..105, no duplicate 104
    assert view.filter(F.col("block_height") == 104).first()["author_id"] == "replacement.near"
    after_files = sorted(
        p.name for p in __import__("pathlib").Path(untouched_dir).glob("*.parquet")
    )
    assert after_files == before_files  # untouched bucket not rewritten


def test_pruned_range_scan(spark, warehouse):
    """Height filter must reach the parquet scan (partition + row-group
    pruning at scale)."""
    df = storage.read_table(spark, warehouse, "actions").filter(
        (F.col("block_height") >= 101) & (F.col("block_height") <= 101)
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")  # noqa: SLF001
    assert "PushedFilters" in plan
    assert "block_height" in plan.split("PushedFilters")[1][:200]


def test_upsert_into_nonexistent_table(spark, blocks, tmp_path_factory):
    """First-ever write through upsert_table: the table root doesn't exist
    yet — the bucket swap must create it instead of FileNotFoundError."""
    from clickhouse_provider_spark.operators.transactions import block_rows

    wh = str(tmp_path_factory.mktemp("upsert_fresh_wh"))
    rows = block_rows(blocks)
    storage.upsert_table(spark, wh, "blocks", rows, bucket_size=2)
    got = storage.read_table(spark, wh, "blocks")
    assert got.count() == 5
    assert {r["block_height"] for r in got.select("block_height").collect()} == {100, 101, 102, 103, 104}
