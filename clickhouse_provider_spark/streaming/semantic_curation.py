"""Continuous SEMANTIC dedup curation — the embedding-space twin of the
text loop (streaming/curation.py): embedding batches arrive as a stream,
each micro-batch is assigned to coarse cells against a PERSISTED centroid
set (frozen at the first batch, so decisions are stable across the
stream), compared against the prior members of ONLY its touched cells
(partition-pruned scan of the on-disk cell index, new side broadcast),
and its keep/drop decisions are appended to a decision table.

The decision layer is strictly simpler than the text loop's label table:
SemDeDup's keep-first rule (operators/similarity.semantic_dedup — a
vector is dropped iff some LOWER-id cell-mate is >= tau-similar) only
ever compares a vector against lower ids, and the ingest contract gives
later batches strictly higher ids, so a decision NEVER needs revision
once made — the table is append-only (batch-keyed overwrite subdirs,
idempotent on foreachBatch replay), with no relabel fixpoint and no
crash-window swap at all.

Invariant (pinned by tests/test_streaming_semantic.py): after draining
any prefix of the stream, the decision table equals batch
``semantic_dedup`` over every vector ingested so far, given the same
(first-batch) centroids — the streaming path is the batch path,
incrementally.

Scale: per batch, assignment is map-only (broadcast centroids); the
prior-member comparison broadcasts the NEW batch against a cell-pruned,
column-pruned index scan that never shuffles — cost is O(new x members
of touched cells), the incremental slice of batch SemDeDup's
sum(|cell|^2) pair space. As with the batch operator, per-cell
cardinality is the knob: production scales n_cells with the corpus to
hold |cell| fixed; with frozen centroids that means re-clustering at
generation boundaries (a new state root), not inside the loop.

Reference parity note: the reference has no vector surface
(SURVEY.md S2D); this module is part of the training-data-pipeline
layer the build brief adds on top.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_provider_spark.operators import similarity


class SemanticCurationState:
    """Paths + parameters for one continuous semantic-curation pipeline."""

    def __init__(self, root: str, threshold: float = 0.35, n_cells: int = 8):
        self.centroids_path = os.path.join(root, "centroids")
        self.index_path = os.path.join(root, "cell_index")
        self.decisions_path = os.path.join(root, "decisions")
        self.threshold = threshold
        self.n_cells = n_cells

    def centroids(self, spark: SparkSession) -> DataFrame | None:
        if not os.path.exists(self.centroids_path):
            return None
        return spark.read.parquet(self.centroids_path)

    def decisions(self, spark: SparkSession) -> DataFrame | None:
        """Every decided vector: (vec_id, cell_id, cos_to_centroid,
        is_dropped). batch_id rides along as the partition column."""
        if not os.path.exists(self.decisions_path):
            return None
        return spark.read.parquet(self.decisions_path)


def curate_embeddings_batch(
    state: SemanticCurationState,
    batch: DataFrame,
    batch_id: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[DataFrame]:
    """One micro-batch of the continuous semantic-curation loop
    (foreachBatch body). ``batch`` carries (vec_id, embedding) with ids
    strictly above every previously ingested id (the ingest contract —
    the same monotone-id contract the text loop's doc_ids follow).

    Replaying the SAME batch_id after a failure is idempotent at the
    storage layer: the cell index and the decision table are batch-keyed
    overwrites (no duplicate rows can accumulate), the centroid write is
    deterministic from the first batch, and prior-member comparison
    filters to ``batch_id < this`` so a replayed batch never sees its own
    crashed half-write as history.

    Per-batch plan shape: centroid assignment is map-only (broadcast
    centroids, per-vector argmax); the prior-member join broadcasts the
    new batch (an ingest batch fits by definition) against the index
    scan filtered to the batch's touched cells — the historical side is
    column-pruned, cell-pruned, and never shuffles; the intra-batch pair
    check self-joins only the batch. Every persist this batch registers
    is released before return (ADVICE r10 cache-lifecycle contract)."""
    spark = batch.sparkSession
    track: list[DataFrame] = []
    batch = batch.select(id_col, vec_col).persist()
    track.append(batch)
    if not batch.take(1):
        # empty micro-batch (a drained availableNow tail, a no-op
        # trigger): nothing to decide, and an empty FIRST batch must not
        # freeze an empty centroid set
        batch.unpersist()
        return track

    cents = state.centroids(spark)
    if cents is None:
        # first batch: freeze the coarse structure. Seeded 0-Lloyd
        # centroids (md5-ranked sample) — deterministic, so a replayed
        # first batch rewrites identical content.
        similarity.ivf_train_centroids(
            batch, state.n_cells, iters=0, id_col=id_col, vec_col=vec_col
        ).select("cell_id", "centroid").write.mode("overwrite").parquet(
            state.centroids_path
        )
        cents = spark.read.parquet(state.centroids_path)

    assigned = (
        similarity._argmax_cell(
            batch, cents.select("cell_id", "centroid"), id_col, vec_col
        )
        .select(id_col, vec_col, "cell_id", "cos_to_centroid")
        .persist()
    )
    track.append(assigned)

    # per-row norms materialized BEFORE the pair joins: each pair then
    # evaluates only the dot product (same ops in the same order as
    # cosine(), so decisions are bit-identical to batch semantic_dedup)
    new_side = assigned.select(
        "cell_id",
        F.col(id_col).alias("_id_b"),
        F.col(vec_col).alias("_e_b"),
        similarity.norm(F.col(vec_col)).alias("_n_b"),
    )
    low_side = assigned.select(
        "cell_id",
        F.col(id_col).alias("_id_a"),
        F.col(vec_col).alias("_e_a"),
        similarity.norm(F.col(vec_col)).alias("_n_a"),
    )
    pair_cos = similarity.dot(F.col("_e_a"), F.col("_e_b")) / F.nullif(
        F.col("_n_a") * F.col("_n_b"), F.lit(0.0)
    )
    # intra-batch: lower-id cell-mates within the batch itself
    dropped = (
        low_side.join(F.broadcast(new_side), "cell_id")
        .filter(F.col("_id_a") < F.col("_id_b"))
        .filter(pair_cos >= F.lit(state.threshold))
        .select(F.col("_id_b").alias(id_col))
    )
    if os.path.exists(state.index_path):
        # prior batches' members of the touched cells. The contract makes
        # every prior id lower than every batch id; the _id_a < _id_b
        # guard stays as a correctness backstop for out-of-order ids.
        prior = (
            spark.read.parquet(state.index_path)
            .filter(F.col("batch_id") < int(batch_id))
            .select(
                "cell_id",
                F.col(id_col).alias("_id_a"),
                F.col(vec_col).alias("_e_a"),
                similarity.norm(F.col(vec_col)).alias("_n_a"),
            )
        )
        hist = (
            prior.join(F.broadcast(new_side), "cell_id")
            .filter(F.col("_id_a") < F.col("_id_b"))
            .filter(pair_cos >= F.lit(state.threshold))
            .select(F.col("_id_b").alias(id_col))
        )
        dropped = dropped.unionByName(hist)
    dropped = dropped.distinct().withColumn("_dropped", F.lit(True))

    decisions = assigned.join(dropped, id_col, "left").select(
        id_col,
        "cell_id",
        "cos_to_centroid",
        F.coalesce(F.col("_dropped"), F.lit(False)).alias("is_dropped"),
    )
    # append-only, batch-keyed, idempotent: decisions never change after
    # this write (keep-first only looks DOWN the id order)
    decisions.write.mode("overwrite").parquet(
        os.path.join(state.decisions_path, f"batch_id={int(batch_id)}")
    )
    # index append: the batch's vectors become history for later batches.
    # One compact sorted file set per batch — NOT partitionBy(cell_id):
    # an ingest batch is small, so cell directories would fragment the
    # index into n_cells tiny files per batch (measured 5x slower and
    # growing at n_cells=256), and the prior-member read filters cells
    # via the broadcast join anyway, which partition directories cannot
    # prune. Sorting by cell_id keeps row-group stats tight for readers
    # that DO filter cells statically (compaction, serving scans).
    (
        assigned.select(id_col, vec_col, "cell_id")
        .coalesce(1)
        .sortWithinPartitions("cell_id")
        .write.mode("overwrite")
        .parquet(os.path.join(state.index_path, f"batch_id={int(batch_id)}"))
    )
    for df in track:
        df.unpersist()
    return track


def run_semantic_curation(
    spark: SparkSession,
    source_dir: str,
    state_root: str,
    checkpoint: str,
    threshold: float = 0.35,
    n_cells: int = 8,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
):
    """Drive the semantic-curation loop over a parquet drop-directory of
    embedding files: readStream -> foreachBatch(curate_embeddings_batch).
    Returns the started StreamingQuery (availableNow drains everything
    then stops)."""
    state = SemanticCurationState(
        state_root, threshold=threshold, n_cells=n_cells
    )
    src = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    writer = src.writeStream.foreachBatch(
        lambda df, bid: curate_embeddings_batch(state, df, bid)
    ).option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
