"""Incremental MinHash-LSH index: appends cost O(new docs) and the
incremental candidates provably equal the batch operator's candidates
restricted to pairs touching the new docs."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from clickhouse_provider_spark.operators import dedup, dedup_index


@pytest.fixture(scope="module")
def docs(spark):
    from clickhouse_provider_spark.session import load_tables

    return load_tables(spark, "/root/testdata/sf0.01")["documents"]


def _full_pairs(docs):
    return dedup.lsh_candidate_pairs(dedup.minhash_signatures(docs))


def test_incremental_candidates_match_batch_operator(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("lsh_idx") / "index")
    old = docs.filter(F.col("doc_id") % 3 != 0)
    new = docs.filter(F.col("doc_id") % 3 == 0)
    dedup_index.lsh_index_append(old, path, batch_id=0)
    dedup_index.lsh_index_append(new, path, batch_id=1)

    inc = dedup_index.lsh_new_candidates(spark, path, batch_id=1)

    new_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    expected = (
        _full_pairs(docs)
        .filter(
            F.col("doc_a").isin(list(new_ids)) | F.col("doc_b").isin(list(new_ids))
        )
    )
    assert inc.exceptAll(expected).count() == 0
    assert expected.exceptAll(inc).count() == 0
    assert inc.count() > 0  # the split really produces cross-batch pairs


def test_batch0_candidates_are_within_batch_pairs(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("lsh_idx0") / "index")
    old = docs.filter(F.col("doc_id") % 3 != 0)
    dedup_index.lsh_index_append(old, path, batch_id=0)
    got = dedup_index.lsh_new_candidates(spark, path, batch_id=0)
    expected = _full_pairs(old)
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_append_only_touches_new_files(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("lsh_idx_app") / "index")
    old = docs.filter(F.col("doc_id") % 3 != 0)
    new = docs.filter(F.col("doc_id") % 3 == 0)
    dedup_index.lsh_index_append(old, path, batch_id=0)
    before = {
        p: os.path.getmtime(p)
        for p in glob.glob(path + "/**/*.parquet", recursive=True)
    }
    dedup_index.lsh_index_append(new, path, batch_id=1)
    after = {
        p: os.path.getmtime(p)
        for p in glob.glob(path + "/**/*.parquet", recursive=True)
    }
    # batch-0 files are untouched byte-for-byte (mtime preserved)
    for p, m in before.items():
        assert after[p] == m
    assert len(after) > len(before)
    assert dedup_index.lsh_index_batches(spark, path) == [0, 1]


def test_new_side_is_broadcast(spark, docs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("lsh_idx_bc") / "index")
    dedup_index.lsh_index_append(docs, path, batch_id=0)
    plan = (
        dedup_index.lsh_new_candidates(spark, path, batch_id=0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
