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

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_provider_spark.operators.dedup import (
    BAND_SIZE,
    N_HASHES,
    minhash_signatures,
)

#: Per-directory band-hash Bloom sidecars (round 14 — VERDICT r13 task 1c:
#: the candidate probe used to SCAN the full accumulated index every batch;
#: the 512-batch probe measured the creep). Each ``batch_id=N`` dir carries
#: a ``_BLOOM.npz`` membership sketch over its ``band_id|band_hash`` keys;
#: the probe tests the NEW batch's (bounded, driver-collected) keys against
#: each dir's sketch and reads ONLY dirs with a potential match, filtered
#: to the surviving hashes (pushed IN filter → rowgroup-pruned via the
#: band_hash sort). No false negatives (keys are inserted exactly), so
#: candidates are EXACT — a false positive merely reads a dir the join
#: then filters. ~10 bits/key ≈ 0.9% fp at k=7; a missing/corrupt sidecar
#: degrades gracefully to the old full-dir read.
BLOOM_BITS_PER_KEY = 10
BLOOM_K = 7
_BLOOM_FILE = "_BLOOM.npz"
#: Above this many surviving hashes for one dir, read the dir outright:
#: the IN pushdown would be a mostly-true filter over a dir we will read
#: almost all of anyway (and matches the raised
#: spark.sql.parquet.pushdown.inFilterThreshold in session.py).
BLOOM_HIT_READ_ALL = 1024


def _bloom_hashes(keys: list) -> "tuple":
    """(h1, h2) uint64 arrays for double hashing — md5 of each key split
    into two 64-bit halves. uint64 wraparound is the defined, build/test
    -consistent arithmetic (both sides use numpy uint64)."""
    import numpy as np

    h1 = np.empty(len(keys), dtype=np.uint64)
    h2 = np.empty(len(keys), dtype=np.uint64)
    for i, kk in enumerate(keys):
        d = hashlib.md5(kk.encode("utf-8")).digest()
        h1[i] = int.from_bytes(d[:8], "big")
        h2[i] = int.from_bytes(d[8:], "big")
    return h1, h2


def _bloom_positions(h1, h2, m: int):
    """(n, k) bit positions via double hashing: (h1 + i·h2) mod m."""
    import numpy as np

    i = np.arange(BLOOM_K, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m)).astype(
        np.int64
    )


def _bloom_size(n_keys: int) -> int:
    return max(1024, int(n_keys) * BLOOM_BITS_PER_KEY)


def _bloom_set(bits, pos) -> None:
    import numpy as np

    flat = pos.ravel()
    np.bitwise_or.at(bits, flat >> 3, (1 << (flat & 7)).astype(np.uint8))


def _bloom_test(bits, pos):
    """Per-row all-k-bits-set mask."""
    return ((bits[pos >> 3].astype("int64") >> (pos & 7)) & 1).all(axis=1)


def _bloom_write(dir_path: str, bits, m: int) -> None:
    import numpy as np

    tmp = os.path.join(dir_path, "." + _BLOOM_FILE + ".tmp")
    with open(tmp, "wb") as f:
        np.savez(f, bits=bits, m=np.int64(m), k=np.int64(BLOOM_K))
    os.rename(tmp, os.path.join(dir_path, _BLOOM_FILE))


def _bloom_load(dir_path: str):
    """(bits, m) or None — any read problem degrades to 'no sketch'
    (the probe then reads the dir in full, the pre-r14 behavior)."""
    import numpy as np

    p = os.path.join(dir_path, _BLOOM_FILE)
    if not os.path.exists(p):
        return None
    try:
        with np.load(p) as z:
            return z["bits"], int(z["m"])
    except Exception:
        return None


def _bloom_from_keys(dir_path: str, keys: list) -> None:
    """Build + write a dir's sketch from its (driver-bounded) key list —
    the append path, where the batch's band rows are already in hand."""
    import numpy as np

    m = _bloom_size(len(keys))
    bits = np.zeros(m // 8 + 1, dtype=np.uint8)
    if keys:
        h1, h2 = _bloom_hashes(keys)
        _bloom_set(bits, _bloom_positions(h1, h2, m))
    _bloom_write(dir_path, bits, m)


def write_band_bloom(spark: SparkSession, dir_path: str) -> None:
    """(Re)build a directory's band-hash Bloom sidecar from its parquet
    rows — the COMPACTION path (a fold rewrites several batch dirs into
    one generation dir, whose per-dir sidecars vanish with them; the
    curation loop passes this as ``post_fold`` so the generation gets a
    fresh sketch before promotion). Distributed: each scan partition
    builds a partial bitmap (Arrow batch → md5 → vectorized bit set),
    the driver ORs the m/8-byte partials — nothing key-sized ever
    reaches the driver, so the rebuild scales to generation dirs of any
    row count (bitmap size is fixed by the row COUNT, ~10 bits/key)."""
    import numpy as np

    df = spark.read.parquet(dir_path).select("band_id", "band_hash")
    m = _bloom_size(df.count())
    nbytes = m // 8 + 1

    def part(it):
        import pandas as pd

        bits = np.zeros(nbytes, dtype=np.uint8)
        seen = False
        for pdf in it:
            if not len(pdf):
                continue
            seen = True
            keys = [
                f"{b}|{h}"
                for b, h in zip(pdf["band_id"], pdf["band_hash"])
            ]
            h1, h2 = _bloom_hashes(keys)
            _bloom_set(bits, _bloom_positions(h1, h2, m))
        if seen:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    partials = df.mapInPandas(part, "bits binary").collect()
    bits = np.zeros(nbytes, dtype=np.uint8)
    for r in partials:
        bits |= np.frombuffer(r["bits"], dtype=np.uint8)
    _bloom_write(dir_path, bits, m)


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
) -> list[str]:
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
    column.

    Returns the batch's distinct ``band_id|band_hash`` keys (bounded —
    one ingest batch × n_bands), which also seed the directory's Bloom
    sidecar (round 14) and can be passed straight to
    :func:`lsh_new_candidates` as ``new_keys`` to save a re-read."""
    dir_path = os.path.join(path, f"batch_id={int(batch_id)}")
    rows = band_rows(docs, **band_kwargs).persist()
    (
        rows.repartition("band_id")
        .sortWithinPartitions("band_hash")
        .write.mode("overwrite")
        .partitionBy("band_id")
        .parquet(dir_path)
    )
    keys = sorted(
        f"{r['band_id']}|{r['band_hash']}"
        for r in rows.select("band_id", "band_hash").distinct().collect()
    )
    rows.unpersist()
    _bloom_from_keys(dir_path, keys)
    return keys


def lsh_new_candidates(
    spark: SparkSession,
    path: str,
    batch_id: int,
    new_keys: list[str] | None = None,
) -> DataFrame:
    """Candidate pairs introduced by ``batch_id``: every (doc_a < doc_b)
    sharing a band where at least one side is from the new batch and the
    other is not newer. Equals the full-corpus
    ``dedup.lsh_candidate_pairs`` restricted to pairs touching the new
    docs (given the index holds batches 0..batch_id).

    Plan shape: the new side is one ingest batch — broadcast it; the
    historical index is probed PER DIRECTORY through each dir's Bloom
    sidecar (round 14 — VERDICT r13 task 1c): the new batch's
    ``band_id|band_hash`` keys (bounded, driver-side — pass the append's
    return as ``new_keys`` to skip the re-read) are tested against each
    ``batch_id=N`` dir's sketch, and only dirs with a potential match
    are read at all, filtered to the surviving hashes (pushed IN →
    rowgroup-pruned via the band_hash file sort). Disjoint history
    therefore costs a few KB of sidecar reads per dir instead of a full
    index scan — the probe's corpus term drops from O(corpus) to
    O(dirs + true matches). Exact: sketches have no false negatives,
    and a false positive only reads rows the equi-join then discards.
    Dirs without a sidecar (pre-r14 indexes) are read in full, the old
    behavior. The historical side still NEVER shuffles; hot buckets
    cost m·n_new pairs — the true output size, not incidental skew.
    """
    from clickhouse_provider_spark.streaming.compaction import (
        list_batch_ids,
    )

    new_dir = os.path.join(path, f"batch_id={int(batch_id)}")
    base = spark.read.option("basePath", path)
    new = base.parquet(new_dir)
    if new_keys is None:
        new_keys = sorted(
            f"{r['band_id']}|{r['band_hash']}"
            for r in new.select("band_id", "band_hash")
            .distinct()
            .collect()
        )
    h1, h2 = _bloom_hashes(new_keys)
    key_hashes = [k.split("|", 1)[1] for k in new_keys]
    parts = [new]  # the new dir itself: intra-batch pairs
    for b in list_batch_ids(path):
        if b >= int(batch_id):
            continue
        d = os.path.join(path, f"batch_id={b}")
        bl = _bloom_load(d)
        if bl is None:
            parts.append(base.parquet(d))
            continue
        bits, m = bl
        if not len(h1):
            continue
        mask = _bloom_test(bits, _bloom_positions(h1, h2, m))
        if not mask.any():
            continue
        hits = sorted({key_hashes[i] for i in mask.nonzero()[0]})
        part = base.parquet(d)
        if len(hits) <= BLOOM_HIT_READ_ALL:
            part = part.filter(F.col("band_hash").isin(hits))
        parts.append(part)
    seen = parts[0]
    for p in parts[1:]:
        seen = seen.unionByName(p)
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


#: Above this many ids, the label-history lookups below fall back from a
#: pushed IN filter (rowgroup-pruning over doc_id-sorted delta files) to
#: a broadcast join over the full skinny scan — a giant IN literal costs
#: more to plan/evaluate than the scan it would prune, and a batch that
#: touches that many docs reads most rowgroups anyway. Matches the raised
#: spark.sql.parquet.pushdown.inFilterThreshold (session.py).
LABEL_PUSH_LIMIT = 1024


def _filter_ids(df: DataFrame, col: str, ids: list):
    """``col ∈ ids`` as a scan-pushable predicate when the list is small
    (IN → rowgroup pruning), else a broadcast semi-join (full skinny
    scan, no shuffle)."""
    if len(ids) <= LABEL_PUSH_LIMIT:
        return df.filter(F.col(col).isin(ids))
    spark = df.sparkSession
    id_df = spark.createDataFrame([(int(i),) for i in ids], f"{col} long")
    return df.join(F.broadcast(id_df), col, "left_semi")


def components_delta(
    history: DataFrame | None,
    new_edges: DataFrame,
    max_iterations: int = 50,
    track: list | None = None,
) -> DataFrame:
    """Label DELTA for one batch of verified near-dup edges against a
    batch-keyed label-history relation — the O(touched) replacement for
    rebuilding the whole label table per micro-batch (round 14, VERDICT
    r13 task 1a: the 512-batch probe measured the full spine-distinct +
    full parquet rewrite creeping per-batch cost up ~50%).

    ``history`` is the RAW delta relation (doc_id, component_id[, ...]):
    every row any prior batch wrote, INCLUDING stale rows superseded by
    later, smaller labels. The reader contract that makes deltas exact
    (streaming/curation.py CurationState.labels): a doc's current label
    is ``min(component_id)`` over its rows, because min-label CC over a
    growing edge set is per-doc NON-INCREASING (components only ever
    merge, so the min reachable id only falls). Docs absent from history
    are self-labeled by convention (same as components_apply_edges).

    Stale rows cannot corrupt the relabel: a touched component's id is
    its CURRENT min (live label), and a dead label never revives — once
    doc A's component merged into B < A, every component containing A
    has min ≤ B forever — so joining history rows on live touched
    component ids picks up (a) every current member (its current-label
    row exists) and (b) possibly docs via stale rows whose stale label
    coincides with a live touched label, which the dead-label argument
    rules out entirely. Extra star edges from a member's stale rows
    connect nodes already in one component — harmless to CC.

    Cost: two ID-PRUNED scans of the skinny history (touched-doc lookup,
    member lookup — pushed IN filters over doc_id-sorted delta files
    when the touched set is small, broadcast semi-joins otherwise) plus
    the localized fixpoint — O(edges + touched members), never a corpus
    shuffle or rewrite. Returns (doc_id, component_id) rows to WRITE as
    this batch's delta (callers add the batch's self rows; pinned
    streaming==batch by tests/test_streaming_curation.py).
    """
    from clickhouse_provider_spark.operators.dedup import (
        connected_components,
    )

    edges = new_edges.select("doc_a", "doc_b").distinct().persist()
    if track is not None:
        track.append(edges)
    if history is None:
        return connected_components(
            edges, max_iterations=max_iterations
        ).select("doc_id", "component_id")
    touched_ids = sorted(
        {r["doc_a"] for r in edges.select("doc_a").distinct().collect()}
        | {r["doc_b"] for r in edges.select("doc_b").distinct().collect()}
    )
    hist = history.select("doc_id", "component_id")
    # current labels of touched docs: min over their (pruned) history rows
    comp_ids = sorted(
        {
            r["component_id"]
            for r in _filter_ids(hist, "doc_id", touched_ids)
            .groupBy("doc_id")
            .agg(F.min("component_id").alias("component_id"))
            .select("component_id")
            .distinct()
            .collect()
        }
    )
    if not comp_ids:
        return connected_components(
            edges, max_iterations=max_iterations
        ).select("doc_id", "component_id")
    members = (
        _filter_ids(hist, "component_id", comp_ids)
        .select("doc_id", "component_id")
        .distinct()
    )
    old_star = members.filter(
        F.col("doc_id") != F.col("component_id")
    ).select(
        F.col("component_id").alias("doc_a"), F.col("doc_id").alias("doc_b")
    )
    return connected_components(
        old_star.unionByName(edges), max_iterations=max_iterations
    ).select("doc_id", "component_id")


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
