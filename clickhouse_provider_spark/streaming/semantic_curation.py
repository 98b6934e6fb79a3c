"""Continuous SEMANTIC dedup curation — the embedding-space twin of the
text loop (streaming/curation.py): embedding batches arrive as a stream,
each micro-batch is assigned to coarse cells against a PERSISTED centroid
set (frozen at the first batch, so decisions are stable across the
stream), compared against the prior members of ONLY its touched cells
(column-pruned scan of the on-disk cell index against the new side
broadcast as per-cell numpy matrices — the map-side Arrow kernel
:func:`_dropped_vs_new`), and its keep/drop decisions are appended to a
decision table.

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
generation boundaries (a new state root) — mechanized by
:func:`rollover_generation` (re-cluster the accumulated index into
n_cells' > n_cells, carry every decision over, restart the stream
against the new root). Batch-keyed index subdirs are periodically
folded into one generation directory (``compact_every`` —
streaming/compaction.py), bounding the per-batch listing/scan term.

Reference parity note: the reference has no vector surface
(SURVEY.md S2D); this module is part of the training-data-pipeline
layer the build brief adds on top.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from clickhouse_provider_spark.operators import similarity
from clickhouse_provider_spark.streaming import compaction

#: Driver/broadcast budget for the new-side kernel matrices (VERDICT r13
#: task 4 — the micro-batch collect's documented ceiling). The collect in
#: curate_embeddings_batch materializes one ingest micro-batch as per-cell
#: float64 numpy matrices: bytes ≈ rows × dim × 8 (+ ~100 B/row of Row
#: overhead, freed after the matrices build). 256 MiB ≈ 400k vectors at
#: d=64 or 40k at d=768 — far above any sane maxFilesPerTrigger ingest
#: wave, and well inside both the 48 GiB driver and Spark's broadcast
#: target. A batch ABOVE the budget does not fail: the kernel runs in
#: ceil(bytes/budget) chunks of new-side rows against the SAME prior scan
#: (keep-first consults the full compare side for every chunk, so chunked
#: decisions are bit-identical — pinned by
#: tests/test_streaming_semantic.py::test_chunked_kernel_equals_single).
#: The tradeoff is one extra prior-scan pass per extra chunk, which is
#: why the budget is generous rather than tight.
KERNEL_BROADCAST_BUDGET_BYTES = 256 << 20


class SemanticCurationState:
    """Paths + parameters for one continuous semantic-curation pipeline.

    ``id_col``/``vec_col`` name the embedding relation's columns and fix
    the state's on-disk schemas (ADVICE r11: reads pass these schemas
    EXPLICITLY, so a crash that leaves a data-file-less directory — dir
    created, no parquet committed — can never wedge recovery on 'Unable
    to infer schema'). ``compact_every``/``keep_last``: fold batch-keyed
    cell-index subdirs into one generation dir every that-many batches
    (streaming/compaction.py), always leaving ``keep_last`` replayable.
    """

    def __init__(
        self,
        root: str,
        threshold: float = 0.35,
        n_cells: int = 8,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        vec_sql_type: str = "array<float>",
        compact_every: int = 16,
        keep_last: int = 2,
    ):
        self.root = root
        self.centroids_path = os.path.join(root, "centroids")
        self.index_path = os.path.join(root, "cell_index")
        self.decisions_path = os.path.join(root, "decisions")
        self.monitor_path = os.path.join(root, "monitor")
        self.threshold = threshold
        self.n_cells = n_cells
        self.id_col = id_col
        self.vec_col = vec_col
        self.vec_sql_type = vec_sql_type
        self.compact_every = compact_every
        self.keep_last = keep_last

    @property
    def centroids_schema(self) -> str:
        return "cell_id int, centroid array<double>"

    @property
    def index_schema(self) -> str:
        return (
            f"{self.id_col} long, {self.vec_col} {self.vec_sql_type}, "
            "cell_id int, batch_id int"
        )

    @property
    def decisions_schema(self) -> str:
        return (
            f"{self.id_col} long, cell_id int, cos_to_centroid double, "
            "is_dropped boolean, batch_id int"
        )

    def centroids(self, spark: SparkSession) -> DataFrame | None:
        """None means 'not yet frozen' — including the crash window where
        the directory exists but no data file committed (explicit schema
        + count, so the probe never throws on a half-write)."""
        if not os.path.exists(self.centroids_path):
            return None
        df = spark.read.schema(self.centroids_schema).parquet(
            self.centroids_path
        )
        if not df.take(1):
            return None
        return df

    def index(self, spark: SparkSession) -> DataFrame | None:
        """The accumulated (id, vec, cell_id, batch_id) history, explicit
        schema (an empty/partial first write reads as 0 rows, not an
        inference error)."""
        if not os.path.exists(self.index_path):
            return None
        return spark.read.schema(self.index_schema).parquet(self.index_path)

    def decisions(self, spark: SparkSession) -> DataFrame | None:
        """Every decided vector: (vec_id, cell_id, cos_to_centroid,
        is_dropped). batch_id rides along as the partition column."""
        if not os.path.exists(self.decisions_path):
            return None
        return spark.read.schema(self.decisions_schema).parquet(
            self.decisions_path
        )

    @property
    def monitor_schema(self) -> str:
        return "cell_id int, n_new long, batch_id int"

    def monitor(self, spark: SparkSession) -> DataFrame | None:
        """Per-batch, per-cell ingest counts (cell_id, n_new, batch_id) —
        the monitoring relation the rollover trigger reads (VERDICT r12
        task 2). Summing n_new over batches gives current cell
        populations; joining a batch's rows against the prior cumulative
        sum gives that batch's prior-compare volume. Tiny (≤ n_cells rows
        per batch), batch-keyed like the index, folded on the same
        compaction cadence."""
        if not os.path.exists(self.monitor_path):
            return None
        return spark.read.schema(self.monitor_schema).parquet(
            self.monitor_path
        )


def _dropped_vs_new(
    prior: DataFrame,
    new_rows: list,
    id_col: str,
    vec_col: str,
    threshold: float,
) -> DataFrame:
    """New-batch ids dropped by keep-first against ``prior`` — the
    streaming loop's pair compare as a strictly MAP-SIDE Arrow kernel
    (round 13; the _argmax_cell pattern a second time).

    Why: the relational form (broadcast-hash-join the new side against
    the prior scan, cosine as a zip_with/aggregate fold per pair) is
    interpreted per element — ~5 µs per 64-dim pair — so per-batch cost
    is pairs x 5 µs spread over however many SCAN SPLITS the prior side
    happens to have. The round-13 trigger probe caught the consequence:
    after the first window fold rewrote 15 batch dirs into one small
    generation file, the prior scan collapsed to ~1 split and per-batch
    cost jumped 5.6 s -> 39.7 s (SCALE_PROBE_r13_trigger.json, batches
    18-23) on IDENTICAL pair volume. This kernel keeps the exact same
    dataflow shape — new side driver-collected (bounded: it is one
    ingest micro-batch, the same contract that justified
    F.broadcast(new_side)), prior side streamed through its scan with
    ZERO shuffle — but evaluates each Arrow batch's pairs as dense
    numpy, ~50-100x cheaper per pair, so even a one-split generation
    file stays in the noise at probe scale and a 128 MB production
    split costs ~0.5 s instead of ~50 s.

    Bit-identity with the relational form (and the batch operator's
    oracle): every dot/norm is the left-to-right per-dimension fold in
    float64 (explicit accumulation loops — never np.dot/einsum), cosine
    = dot / (norm_a * norm_b) with the NULL-on-zero-norm rule (zero
    denominator never drops), and the keep-first guard is the same
    ``id_a < id_b`` predicate. Assumes finite embeddings (the index
    holds only what this loop ingested). Returns a DataFrame of
    ``id_col`` values (may contain duplicates across tasks — caller
    distincts, as the relational form did).

    Degenerate inputs (ADVICE r13, medium — mirrors _argmax_cell): a
    NULL embedding is EXCLUDED from both kernel sides, which is exactly
    the batch operator's behavior (norm NULL → cosine NULL → the pair
    neither drops nor is dropped): _argmax_cell deliberately admits a
    NULL vector (cell 0, NULL cosine), so the streaming index can carry
    one, and np.stack over it would otherwise poison every later
    batch's pair compare with an opaque 0-d error. A wrong-LENGTH
    vector is a schema violation — fail loudly with the dims named, on
    either side, rather than np.stack/broadcast's shape error.
    """
    import numpy as np

    from pyspark.sql import types as T

    spark = prior.sparkSession
    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType(), False)]
    )
    if not new_rows:
        return spark.createDataFrame([], out_schema)
    by_cell: dict = {}
    for r in new_rows:
        if r[vec_col] is None:
            continue  # NULL never drops and is never dropped — exclude
        by_cell.setdefault(r["cell_id"], []).append(
            (r[id_col], r[vec_col])
        )
    cells = {}
    for cell, rows in by_cell.items():
        d = len(rows[0][1])
        for _, v in rows:
            if len(v) != d:
                raise ValueError(
                    f"{vec_col!r} has a length-{len(v)} vector but cell "
                    f"{cell}'s first vector is {d}-dimensional"
                )
        ids = np.array([i for i, _ in rows], dtype=np.int64)
        V = np.stack([np.asarray(v, dtype=np.float64) for _, v in rows])
        k, d = V.shape
        v2 = np.zeros(k, dtype=np.float64)
        for j in range(d):
            v2 += V[:, j] * V[:, j]
        cells[cell] = (ids, V, np.sqrt(v2))
    if not cells:
        return spark.createDataFrame([], out_schema)
    bc = spark.sparkContext.broadcast(cells)
    tau = float(threshold)

    def batches(it):
        import pandas as pd

        cells = bc.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            dropped: list = []
            for cell, grp in pdf.groupby("cell_id", sort=False):
                hit = cells.get(cell)
                if hit is None:
                    continue
                n_ids, N, n_n = hit
                d = N.shape[1]
                rows = []
                row_ids = []
                for rid, v in zip(grp[id_col], grp[vec_col]):
                    if v is None:
                        continue  # NULL prior never drops anyone
                    if len(v) != d:
                        raise ValueError(
                            f"{vec_col!r} has a length-{len(v)} vector "
                            f"but cell {cell}'s new side is "
                            f"{d}-dimensional"
                        )
                    rows.append(np.asarray(v, dtype=np.float64))
                    row_ids.append(rid)
                if not rows:
                    continue
                P = np.stack(rows)
                m, d = P.shape
                p2 = np.zeros(m, dtype=np.float64)
                dots = np.zeros((m, len(n_ids)), dtype=np.float64)
                for j in range(d):
                    p2 += P[:, j] * P[:, j]
                    dots += P[:, j, None] * N[None, :, j]
                p_n = np.sqrt(p2)
                denom = p_n[:, None] * n_n[None, :]
                p_ids = np.array(row_ids, dtype=np.int64)
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = dots / denom
                mask = (
                    (denom != 0.0)
                    & (cos >= tau)
                    & (p_ids[:, None] < n_ids[None, :])
                )
                if mask.any():
                    dropped.append(n_ids[mask.any(axis=0)])
            if dropped:
                yield pd.DataFrame(
                    {id_col: np.unique(np.concatenate(dropped))}
                )

    return prior.select("cell_id", id_col, vec_col).mapInPandas(
        batches, out_schema
    )


def _pruned_prior(
    prior_index: DataFrame,
    batch_id: int,
    touched: list,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """The history side of one batch's pair compare: prior batches only,
    ROW-PRUNED to the batch's touched cells (VERDICT r13 task 3). Both
    predicates push to the parquet scan — ``batch_id`` is the partition
    directory (pruned at listing) and ``cell_id`` hits rowgroup min/max
    stats (generation files are written cell_id-sorted), so per-batch
    history I/O is O(touched cells), not O(corpus). Plan pinned by
    tests/test_round14_pins.py::test_prior_scan_cell_pruned_plan."""
    return prior_index.filter(
        (F.col("batch_id") < int(batch_id))
        & F.col("cell_id").isin([int(c) for c in touched])
    ).select("cell_id", id_col, vec_col)


def curate_embeddings_batch(
    state: SemanticCurationState,
    batch: DataFrame,
    batch_id: int,
    id_col: str | None = None,
    vec_col: str | None = None,
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
    centroids, per-vector argmax); the pair compare broadcasts the new
    batch (bounded by KERNEL_BROADCAST_BUDGET_BYTES — oversized batches
    run the kernel in chunks, bit-identically) against the column-pruned
    index scan via the map-side Arrow kernel :func:`_dropped_vs_new` —
    the historical side never shuffles AND is row-pruned to the batch's
    touched cells (pushed cell_id-IN filter over cell_id-sorted files,
    so history I/O is O(touched cells) per batch), and the intra-batch
    check rides the same kernel pass (the batch unioned ahead of the
    history). Every persist this batch registers is released before
    return (ADVICE r10 cache-lifecycle contract)."""
    spark = batch.sparkSession
    id_col = id_col or state.id_col
    vec_col = vec_col or state.vec_col
    track: list[DataFrame] = []
    # finish any compaction a crash interrupted BEFORE reading the index
    compaction.recover_compaction(state.index_path)
    compaction.recover_compaction(state.monitor_path)
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
        cents = state.centroids(spark)

    assigned = (
        similarity._argmax_cell(
            batch, cents.select("cell_id", "centroid"), id_col, vec_col
        )
        .select(id_col, vec_col, "cell_id", "cos_to_centroid")
        .persist()
    )
    track.append(assigned)

    # pair compares run through the map-side Arrow kernel (round 13 —
    # see _dropped_vs_new: the relational broadcast-join form paid ~5 µs
    # of interpreted HOF per pair, which the first window fold turned
    # into a 7x per-batch cliff by collapsing the prior scan's splits).
    # The dataflow shape is unchanged: new side driver-bounded, prior
    # side scanned in place, zero shuffles; the keep-first guard
    # (id_a < id_b) stays as the correctness backstop for out-of-order
    # ids, and every float op keeps the relational fold order.
    new_rows = assigned.select("cell_id", id_col, vec_col).collect()
    compare_side = assigned.select("cell_id", id_col, vec_col)
    prior_index = state.index(spark)
    if prior_index is not None:
        # prior batches' members (explicit-schema read: a crashed
        # half-write can never wedge replay — ADVICE r11); one union plan
        # = one kernel pass over intra-batch + history rows. The history
        # read is ROW-PRUNED to the batch's touched cells (VERDICT r13
        # task 3): generation files are cell_id-sorted, so the pushed
        # cell_id-IN filter rowgroup-prunes and per-batch history I/O is
        # O(touched cells), not O(corpus) — previously untouched cells
        # cost a full scan plus one kernel dict-miss per row. Exact: the
        # kernel ignores untouched cells' rows anyway (no new-side
        # matrix to compare against).
        touched = sorted({r["cell_id"] for r in new_rows})
        compare_side = compare_side.unionByName(
            _pruned_prior(prior_index, batch_id, touched, id_col, vec_col)
        )
    # new-side kernel passes, chunked iff the micro-batch exceeds the
    # broadcast budget (VERDICT r13 task 4 — see
    # KERNEL_BROADCAST_BUDGET_BYTES for the bound and why chunks stay
    # bit-identical)
    est_bytes = sum(
        8 * len(r[vec_col]) for r in new_rows if r[vec_col] is not None
    )
    n_chunks = max(1, -(-est_bytes // KERNEL_BROADCAST_BUDGET_BYTES))
    chunk_sz = -(-len(new_rows) // n_chunks)
    dropped = None
    for i in range(0, len(new_rows), chunk_sz):
        part = _dropped_vs_new(
            compare_side,
            new_rows[i : i + chunk_sz],
            id_col,
            vec_col,
            state.threshold,
        )
        dropped = part if dropped is None else dropped.unionByName(part)
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
    # monitoring relation (VERDICT r12 task 2): per-cell ingest counts for
    # this batch — ≤ n_cells rows off the already-persisted assignment,
    # batch-keyed overwrite so replay is idempotent like every other write
    (
        assigned.groupBy("cell_id")
        .agg(F.count("*").alias("n_new"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(state.monitor_path, f"batch_id={int(batch_id)}"))
    )
    if (
        state.compact_every
        and batch_id > 0
        and batch_id % state.compact_every == 0
    ):
        # fold old batch dirs into one generation (crash-safe protocol in
        # streaming/compaction.py). Readers compare batch_id only against
        # the CURRENT id, and upto < current - keep_last, so collapsing
        # old ids onto upto preserves every comparison.
        compaction.compact_batch_dirs(
            spark,
            state.index_path,
            int(batch_id) - state.keep_last,
            sort_within=["cell_id"],
        )
        compaction.compact_batch_dirs(
            spark,
            state.monitor_path,
            int(batch_id) - state.keep_last,
            sort_within=["cell_id"],
        )
    for df in track:
        df.unpersist()
    return track


class RolloverWatch:
    """Per-batch trigger surface for a CONTINUOUSLY-running stream
    (VERDICT r13 task 7): the foreachBatch body consults
    :func:`should_rollover` after every committed micro-batch (the
    monitoring relation updates per batch, so the check is one tiny agg)
    and records the verdict here. ``fired`` flips once the boundary
    condition holds; the driver (human or
    :func:`run_semantic_curation_generations_continuous`) reacts by
    stopping the query, draining, and rolling — the WATCH is
    deliberately read-only with respect to the stream, because a
    foreachBatch body cannot safely stop its own query mid-commit."""

    def __init__(self, roll_factor: float = 4.0):
        self.roll_factor = roll_factor
        self.fired = False
        self.log: list[dict] = []


def run_semantic_curation(
    spark: SparkSession,
    source_dir: str,
    state_root: str,
    checkpoint: str,
    threshold: float = 0.35,
    n_cells: int = 8,
    max_files_per_trigger: int = 1,
    available_now: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vec_sql_type: str = "array<float>",
    compact_every: int = 16,
    keep_last: int = 2,
    watch: RolloverWatch | None = None,
):
    """Drive the semantic-curation loop over a parquet drop-directory of
    embedding files: readStream -> foreachBatch(curate_embeddings_batch).
    ``id_col``/``vec_col``/``vec_sql_type`` parameterize both the source
    schema and the state's on-disk schemas (ADVICE r11: previously the
    source schema was hardcoded, making curate_embeddings_batch's
    column parameters unreachable from the stream driver).
    ``available_now=False`` runs a CONTINUOUS stream (per-trigger file
    caps still apply); pass a :class:`RolloverWatch` to get the rollover
    trigger evaluated on the foreachBatch cadence (VERDICT r13 task 7).
    Returns the started StreamingQuery (availableNow drains everything
    then stops)."""
    state = SemanticCurationState(
        state_root,
        threshold=threshold,
        n_cells=n_cells,
        id_col=id_col,
        vec_col=vec_col,
        vec_sql_type=vec_sql_type,
        compact_every=compact_every,
        keep_last=keep_last,
    )

    def _body(df: DataFrame, bid: int) -> None:
        curate_embeddings_batch(state, df, bid)
        if watch is not None and not watch.fired:
            v = should_rollover(spark, state, roll_factor=watch.roll_factor)
            v["batch_id"] = int(bid)
            watch.log.append(v)
            if v["roll"]:
                watch.fired = True

    src = (
        spark.readStream.schema(f"{id_col} long, {vec_col} {vec_sql_type}")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    writer = src.writeStream.foreachBatch(_body).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


#: Design cell population: the largest cell whose within-cell pair space
#: stays inside the calibrated per-task budget of the batch operator
#: (operators/similarity.AUTO_SALT_TARGET_PAIRS — SCALE_PROBE_r12_skew):
#: sqrt(3M pairs) ≈ 1,732 members. The trigger and the suggested new
#: n_cells both derive from this one constant so the whole skew story
#: (batch auto-salt, streaming rollover) shares a single calibration.
TARGET_CELL_POP = int(similarity.AUTO_SALT_TARGET_PAIRS ** 0.5)


def cell_populations(
    spark: SparkSession, state: SemanticCurationState
) -> DataFrame | None:
    """Current per-cell populations — sum of the monitoring relation's
    per-batch ingest counts (one agg over a tiny table; never scans the
    vector index). None until the first batch lands."""
    mon = state.monitor(spark)
    if mon is None:
        return None
    return mon.groupBy("cell_id").agg(F.sum("n_new").alias("population"))


def batch_compare_volume(
    spark: SparkSession, state: SemanticCurationState
) -> DataFrame | None:
    """Per-batch prior-compare volume — the second face of the
    monitoring relation (VERDICT r12 task 2): for each batch b, the
    number of (prior, new) pairs its kernel pass evaluated,
    ``sum over cells of new_b(c) x pop_{<b}(c)`` where pop is the
    running per-cell population over earlier batches (the carried
    ``batch_id=-1`` generation counts as before-everything). All window
    arithmetic over the tiny monitor table — never touches the vector
    index. Returns (batch_id, compare_pairs) ordered by batch_id; None
    until the first batch lands.

    This is the curve an operator watches between rollovers: it grows
    ~linearly at fixed granularity and resets at a generation boundary
    (should_rollover's threshold is the policy version of the same
    signal).

    Compaction-folded history reports MERGED volume (ADVICE r13): a fold
    collapses several batches' monitor rows onto one ``batch_id=<upto>``,
    so the per-(cell, batch) counts are pre-aggregated here BEFORE the
    running window — same-id ties collapse deterministically into one
    row per (cell, batch) instead of counting each other as 'prior' in
    nondeterministic row order — and a folded id's ``compare_pairs`` is
    the whole folded window's volume attributed to that id."""
    mon = state.monitor(spark)
    if mon is None:
        return None
    mon = mon.groupBy("cell_id", "batch_id").agg(
        F.sum("n_new").alias("n_new")
    )
    w = (
        W.partitionBy("cell_id")
        .orderBy("batch_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        mon.withColumn(
            "_prior_pop", F.coalesce(F.sum("n_new").over(w), F.lit(0))
        )
        .groupBy("batch_id")
        .agg(F.sum(F.col("n_new") * F.col("_prior_pop")).alias("compare_pairs"))
        .orderBy("batch_id")
    )


def should_rollover(
    spark: SparkSession,
    state: SemanticCurationState,
    roll_factor: float = 4.0,
) -> dict:
    """The rollover trigger policy (VERDICT r12 task 2 — the boundary is
    mechanized by :func:`rollover_generation`, but at 100 TB the WATCH
    must be part of the loop, not an operator someone remembers to run).

    Policy: roll when the hottest cell's population reaches
    ``roll_factor x TARGET_CELL_POP``. Rationale: per-batch compare cost
    is Σ_c pop(c)·new(c), so the hottest cell dominates wall-clock once
    its population leaves the design range; the r12 skew probe measured
    the cliff concretely (a 9,328-member cell = 5.4x target was a 262 s
    straggler for the batch operator). The default factor 4 (~6.9k)
    triggers before that measured point. The suggested new cell count
    re-centers every cell on TARGET_CELL_POP: ``max(2 x n_cells,
    ceil(total / TARGET_CELL_POP))``.

    Returns a dict — 'roll now' surfaced as data: ``{"roll": bool,
    "hottest_pop": int, "total": int, "threshold": int,
    "suggested_n_cells": int}``.
    """
    threshold = int(roll_factor * TARGET_CELL_POP)
    pops = cell_populations(spark, state)
    if pops is None:
        return {
            "roll": False, "hottest_pop": 0, "total": 0,
            "threshold": threshold, "suggested_n_cells": state.n_cells,
        }
    row = pops.agg(
        F.max("population").alias("h"), F.sum("population").alias("t")
    ).first()
    hottest, total = int(row["h"] or 0), int(row["t"] or 0)
    suggested = max(state.n_cells * 2, -(-total // TARGET_CELL_POP))
    return {
        "roll": hottest >= threshold,
        "hottest_pop": hottest,
        "total": total,
        "threshold": threshold,
        "suggested_n_cells": int(suggested),
    }


def run_semantic_curation_generations(
    spark: SparkSession,
    source_dir: str,
    root_base: str,
    checkpoint: str,
    threshold: float = 0.35,
    n_cells: int = 8,
    max_files_per_trigger: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vec_sql_type: str = "array<float>",
    compact_every: int = 16,
    keep_last: int = 2,
    roll_factor: float = 4.0,
    rollover_iters: int = 3,
    rollover_n_files: int = 1,
    max_rollovers_per_call: int = 4,
) -> tuple[SemanticCurationState, list[dict]]:
    """Drain → check → (rollover → resume) — the loop that OWNS the
    generation boundary (VERDICT r12 task 2's "ideally" path).

    One call drains everything currently in ``source_dir`` (availableNow)
    into the CURRENT generation root ``<root_base>/gen<k>``, then consults
    :func:`should_rollover`; if the trigger fires, it rolls the state
    into ``gen<k+1>`` (suggested n_cells) and drains again so any files
    ingested mid-check land in the new generation. Call it per ingest
    wave (or from a scheduler) — repeated calls resume where the last
    left off.

    The ONE checkpoint spans all generations: a fresh checkpoint would
    make the file source re-ingest every historical file into the new
    generation (duplicating decisions against the carried history), while
    a continued checkpoint resumes from the recorded file offsets — batch
    ids keep ascending, and the carried history's ``batch_id=-1`` stays
    below them all, which is exactly why rollover parks it at -1.

    Generation discovery is directory-based (``gen<k>`` with a frozen
    centroid set = active): crash between rollover and the next drain
    re-runs rollover idempotently (every rollover write is a
    deterministic overwrite of the new root).

    Returns ``(active_state, trigger_log)`` where trigger_log carries one
    :func:`should_rollover` verdict dict per drain (with ``"gen"`` added)
    — the operational record of WHY each boundary did or didn't fire.
    """
    def _state_for(gen: int) -> SemanticCurationState:
        return SemanticCurationState(
            os.path.join(root_base, f"gen{gen}"),
            threshold=threshold,
            n_cells=_gen_cells[gen],
            id_col=id_col,
            vec_col=vec_col,
            vec_sql_type=vec_sql_type,
            compact_every=compact_every,
            keep_last=keep_last,
        )

    # resume: the active generation is the highest gen<k> whose rollover
    # COMPLETED — proven by rollover_generation's LAST artifact, the
    # _ROLLED marker at the generation ROOT (centroids/_SUCCESS alone
    # would accept a target whose index/decisions/monitor never landed).
    # The marker deliberately lives OUTSIDE the compactable data dirs
    # (ADVICE r13: the previous key, monitor/batch_id=-1/_GEN, sat
    # inside a batch-keyed directory that a second-tier major fold
    # legitimately folds away — after which resume would silently land
    # on gen0 and drain new batches against stale centroids). The legacy
    # marker is still honored for pre-r14 state roots. A half-written
    # target is simply ignored: the loop stays on gen<k>, the trigger
    # re-fires on the same monitor data, and the rollover re-runs as a
    # deterministic overwrite of the same root.
    gen, _gen_cells = _discover_generation(spark, root_base, n_cells)

    log: list[dict] = []
    for _ in range(max_rollovers_per_call + 1):
        state = _state_for(gen)
        run_semantic_curation(
            spark,
            source_dir,
            state.root,
            checkpoint,
            threshold=threshold,
            n_cells=_gen_cells[gen],
            max_files_per_trigger=max_files_per_trigger,
            available_now=True,
            id_col=id_col,
            vec_col=vec_col,
            vec_sql_type=vec_sql_type,
            compact_every=compact_every,
            keep_last=keep_last,
        ).awaitTermination()
        verdict = should_rollover(spark, state, roll_factor=roll_factor)
        verdict["gen"] = gen
        log.append(verdict)
        if not verdict["roll"]:
            return state, log
        new_root = os.path.join(root_base, f"gen{gen + 1}")
        rollover_generation(
            spark,
            state,
            new_root,
            n_cells_new=verdict["suggested_n_cells"],
            iters=rollover_iters,
            n_files=rollover_n_files,
        )
        gen += 1
        _gen_cells[gen] = verdict["suggested_n_cells"]
    return _state_for(gen), log


def _discover_generation(
    spark: SparkSession, root_base: str, n_cells: int
) -> tuple[int, dict]:
    """Resume discovery shared by both generation drivers: highest gen
    whose rollover COMPLETED (the root-level _ROLLED marker; legacy
    monitor/_GEN honored for pre-r14 roots), plus the per-gen cell
    counts."""
    gen_cells: dict[int, int] = {0: n_cells}
    gen = 0
    while os.path.exists(
        os.path.join(root_base, f"gen{gen + 1}", "_ROLLED")
    ) or os.path.exists(
        os.path.join(
            root_base, f"gen{gen + 1}", "monitor", "batch_id=-1", "_GEN"
        )
    ):
        gen += 1
        st = SemanticCurationState(os.path.join(root_base, f"gen{gen}"))
        c = st.centroids(spark)
        gen_cells[gen] = c.count() if c is not None else n_cells
    return gen, gen_cells


def run_semantic_curation_generations_continuous(
    spark: SparkSession,
    source_dir: str,
    root_base: str,
    checkpoint: str,
    threshold: float = 0.35,
    n_cells: int = 8,
    max_files_per_trigger: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vec_sql_type: str = "array<float>",
    compact_every: int = 16,
    keep_last: int = 2,
    roll_factor: float = 4.0,
    rollover_iters: int = 3,
    rollover_n_files: int = 1,
    max_rollovers_per_call: int = 4,
    idle_timeout: float = 15.0,
    poll: float = 0.25,
) -> tuple[SemanticCurationState, list[dict]]:
    """One CONTINUOUSLY-running stream that rolls itself at the boundary
    (VERDICT r13 task 7 — the drain-wave driver
    :func:`run_semantic_curation_generations` consults the trigger only
    BETWEEN availableNow drains; a stream that never stops needs the
    check on the foreachBatch cadence). The stream runs with a
    processing-time trigger; every committed micro-batch evaluates
    :func:`should_rollover` via :class:`RolloverWatch`. When it fires:

    1. stop the query (a foreachBatch body must not stop itself);
    2. run one availableNow drain on the SAME root + checkpoint — this
       closes the stop-interrupt window exactly: an in-flight batch the
       stop cut mid-write is REPLAYED and committed into the old
       generation (batch-keyed idempotence), so the rollover never
       carries uncommitted orphan rows and the resumed stream never
       re-ingests a carried vector (which would leave conflicting
       decision rows across generations);
    3. re-check the trigger on the committed state, roll via
       :func:`rollover_generation`, and resume the continuous stream
       against the new root under the ONE shared checkpoint.

    Returns once the source has been idle (no rows ingested) for
    ``idle_timeout`` seconds with the trigger quiet — the probe/test
    harness termination condition; a production deployment simply never
    reaches it. Trigger log entries carry ``batch_id`` + ``gen``."""
    import time

    gen, _gen_cells = _discover_generation(spark, root_base, n_cells)

    def _params(gen: int) -> dict:
        return dict(
            threshold=threshold,
            n_cells=_gen_cells[gen],
            max_files_per_trigger=max_files_per_trigger,
            id_col=id_col,
            vec_col=vec_col,
            vec_sql_type=vec_sql_type,
            compact_every=compact_every,
            keep_last=keep_last,
        )

    log: list[dict] = []
    rolls = 0
    while True:
        state = SemanticCurationState(
            os.path.join(root_base, f"gen{gen}"), **{
                k: v for k, v in _params(gen).items()
                if k != "max_files_per_trigger"
            }
        )
        watch = RolloverWatch(roll_factor=roll_factor)
        q = run_semantic_curation(
            spark, source_dir, state.root, checkpoint,
            available_now=False, watch=watch, **_params(gen)
        )
        last_data = time.monotonic()
        last_batch = -1
        try:
            while q.isActive:
                if watch.fired:
                    break
                # a query ACTIVELY processing a data batch is not idle —
                # without this, a first batch slower than idle_timeout
                # (loaded host, big carried state) gets its query stopped
                # MID-BATCH: the recovery drain then replays everything
                # as one batch and no per-batch trigger verdict ever
                # lands (observed as a flaky
                # test_continuous_stream_rolls_itself_at_boundary)
                st = q.status
                if st and st.get("isTriggerActive") and st.get("isDataAvailable"):
                    last_data = time.monotonic()
                p = q.lastProgress
                if p is not None:
                    if (
                        p["batchId"] != last_batch
                        and p.get("numInputRows", 0) > 0
                    ):
                        last_batch = p["batchId"]
                        last_data = time.monotonic()
                if time.monotonic() - last_data > idle_timeout:
                    break
                time.sleep(poll)
        finally:
            q.stop()
            q.awaitTermination()
        # close the stop-interrupt window: replay/commit any in-flight
        # batch into the CURRENT generation before deciding anything
        run_semantic_curation(
            spark, source_dir, state.root, checkpoint,
            available_now=True, **_params(gen)
        ).awaitTermination()
        for v in watch.log:
            v["gen"] = gen
        log.extend(watch.log)
        verdict = should_rollover(spark, state, roll_factor=roll_factor)
        verdict["gen"] = gen
        if not verdict["roll"] or rolls >= max_rollovers_per_call:
            log.append(verdict)
            return state, log
        new_root = os.path.join(root_base, f"gen{gen + 1}")
        rollover_generation(
            spark, state, new_root,
            n_cells_new=verdict["suggested_n_cells"],
            iters=rollover_iters, n_files=rollover_n_files,
        )
        gen += 1
        rolls += 1
        _gen_cells[gen] = verdict["suggested_n_cells"]


def rollover_generation(
    spark: SparkSession,
    state: SemanticCurationState,
    new_root: str,
    n_cells_new: int,
    iters: int = 3,
    seed: str = "ivf-gen",
    n_files: int = 1,
) -> SemanticCurationState:
    """Generation rollover (VERDICT r11 task 4 — mechanizing the one
    documented scale cliff): re-cluster the ACCUMULATED corpus into a
    finer cell structure under a NEW state root, carrying every decision
    over, so the stream can continue against centroids sized for the
    corpus it now has instead of the first batch's frozen guess.

    Why it exists: the loop freezes centroids at batch 1 so decisions
    stay stable, but per-batch cost is O(new x members of touched
    cells) — with a fixed n_cells, cell populations grow linearly with
    the corpus and the prior-member compare degrades toward a full-corpus
    pair scan. Production holds |cell| constant by growing n_cells at
    generation boundaries; this operator IS that boundary.

    What it does (one batch job, all DataFrame ops):

    1. train n_cells_new spherical-kmeans centroids over ALL accumulated
       index vectors (``iters`` Lloyd rounds — a real re-cluster, not the
       first batch's 0-round seed sample);
    2. re-assign every indexed vector to its new cell and write the
       whole history as ONE compacted generation dir ``batch_id=-1``
       (below any streaming batch id, so the new stream's
       ``batch_id < current`` prior-filter always includes it);
    3. carry the decision table over VERBATIM into ``batch_id=-1``
       (keep-first only ever compares a vector against LOWER ids, and a
       re-cluster does not change the ids below a decided vector — so a
       decision, once made, survives any number of rollovers; its
       ``cell_id``/``cos_to_centroid`` keep describing the generation it
       was decided under).

    The new root is written non-destructively: the OLD root stays the
    authoritative state until the caller switches the stream driver to
    ``new_root``, CARRYING THE SAME CHECKPOINT across the switch
    (ADVICE r13 — run_semantic_curation_generations' one-checkpoint
    contract): a fresh checkpoint would make the file source re-ingest
    every historical file into the new generation, duplicating decisions
    against the carried history, while the continued checkpoint resumes
    from the recorded offsets with batch ids still ascending — the
    carried history's ``batch_id=-1`` stays below them all, which is why
    history lands at -1. Re-running a crashed rollover is idempotent:
    every write is a deterministic overwrite of new_root.

    Post-rollover semantics (pinned by tests/test_streaming_semantic.py
    ::test_rollover_*): carried decisions are bit-identical to the
    pre-rollover table; a vector ingested AFTER the rollover is dropped
    iff some lower-id vector (any generation) lands in the same NEW cell
    with cosine >= tau — i.e. the stream keeps computing exact SemDeDup,
    just over the new cell structure.

    ``n_files`` (ADVICE r12): the generation rewrite passes the ENTIRE
    accumulated corpus through the writer — at exactly the scale point
    rollover exists for, a ``coalesce(1)`` would funnel it into one task.
    Pass ``n_files ≈ corpus_bytes / 1 GiB`` at scale; the writes go
    through ``repartitionByRange(n_files, key)`` +
    ``sortWithinPartitions`` so the rewrite parallelizes while files stay
    cell-clustered with tight row-group min/max stats (same guidance as
    streaming/compaction.py). The default of 1 suits test-sized corpora.

    Returns the new generation's :class:`SemanticCurationState`.
    """
    index = state.index(spark)
    if index is None or not index.take(1):
        raise ValueError("rollover requires a non-empty accumulated index")
    new_state = SemanticCurationState(
        new_root,
        threshold=state.threshold,
        n_cells=n_cells_new,
        id_col=state.id_col,
        vec_col=state.vec_col,
        vec_sql_type=state.vec_sql_type,
        compact_every=state.compact_every,
        keep_last=state.keep_last,
    )
    vecs = index.select(state.id_col, state.vec_col)
    similarity.ivf_train_centroids(
        vecs,
        n_cells_new,
        iters=iters,
        seed=seed,
        id_col=state.id_col,
        vec_col=state.vec_col,
    ).select("cell_id", "centroid").write.mode("overwrite").parquet(
        new_state.centroids_path
    )
    cents = new_state.centroids(spark)
    (
        similarity._argmax_cell(
            vecs, cents.select("cell_id", "centroid"),
            state.id_col, state.vec_col,
        )
        .select(state.id_col, state.vec_col, "cell_id")
        .repartitionByRange(n_files, "cell_id", state.id_col)
        .sortWithinPartitions("cell_id")
        .write.mode("overwrite")
        .parquet(os.path.join(new_state.index_path, "batch_id=-1"))
    )
    # the migrated history IS a generation: window folds must never
    # re-read it (streaming/compaction.py _GEN contract)
    with open(os.path.join(new_state.index_path, "batch_id=-1", "_GEN"), "w") as f:
        f.write("")
    decisions = state.decisions(spark)
    if decisions is not None:
        (
            decisions.drop("batch_id")
            .repartitionByRange(n_files, state.id_col)
            .sortWithinPartitions(state.id_col)
            .write.mode("overwrite")
            .parquet(os.path.join(new_state.decisions_path, "batch_id=-1"))
        )
    # seed the new generation's MONITORING relation with the carried
    # corpus's per-NEW-cell populations (read back off the just-written
    # index — one cell_id-only column-pruned scan): without this,
    # should_rollover would see the carried vectors as population zero
    # and the next boundary would fire arbitrarily late.
    (
        spark.read.schema(new_state.index_schema)
        .parquet(new_state.index_path)
        .groupBy("cell_id")
        .agg(F.count("*").alias("n_new"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(new_state.monitor_path, "batch_id=-1"))
    )
    with open(
        os.path.join(new_state.monitor_path, "batch_id=-1", "_GEN"), "w"
    ) as f:
        f.write("")
    # COMPLETION marker, written last of all, at the generation ROOT —
    # run_semantic_curation_generations' resume discovery keys on it
    # (everything the new generation needs exists once it does; a crash
    # anywhere earlier leaves the old generation authoritative and the
    # re-fired trigger re-runs this overwrite). It must NOT live inside
    # a batch-keyed data dir (ADVICE r13): those are legitimately folded
    # by a second-tier major compaction, which would erase an in-data
    # marker and make resume silently fall back to gen0.
    with open(os.path.join(new_root, "_ROLLED"), "w") as f:
        f.write("")
    return new_state
