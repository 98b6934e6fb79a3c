"""Deterministic distributed k-means for embedding columns (semantic
clustering / semantic dedup for training-data curation).

Why another k-means (vs MLlib's KMeans): curation pipelines need the
cluster assignment to be REPRODUCIBLE — rerunning the job on the same
corpus must bucket every document identically, or downstream dedup/mixing
decisions churn. MLlib's k-means|| seeding is randomized and its float
reductions are order-dependent. This implementation is deterministic end
to end:

- **Seeding**: the k lowest-id vectors (k-means with explicit seeds is the
  documented reproducible mode of every large-scale curation pipeline).
- **Quantized integer domain**: vectors are quantized once up front to
  ``floor(x * 2^20)`` (exact: power-of-two scaling of a double is exact,
  floor is exact). All distances are then sums of integer-valued doubles
  bounded far below 2^53 — EXACT and addition-order-free, so the argmin
  assignment cannot flip under Spark's nondeterministic reduce order.
- **Centroid update**: per-dimension integer sums (exact) with
  floor-division by the member count — centroids stay integer-valued, so
  every subsequent iteration remains exact.
- **Fixed iteration count**: Lloyd iterations are unrolled a compile-time
  number of times (no driver-side convergence loop, no collect).

Squared L2 in the quantized domain is computed as
``|a|^2 + |b|^2 - 2<a,b>`` from per-vector cached norms — three exact
integer quantities (the identity is exact here because every term is an
exact integer-valued double, unlike in float arithmetic).

Scale: each iteration is one broadcast join (k centroid rows) + one
groupBy((cluster, dim)) shuffle over |rows|*dim exploded entries. For
100 TB corpora keep dim-major aggregation (combiner-friendly partial
sums); k and dim are broadcast-sized by construction. Reference parity:
the reference has no clustering operator — this extends the engine's LLM
curation surface (SURVEY.md "beyond the reference" mandate) alongside
operators/similarity.py IVF (which uses assignment-only seeds,
similarity.py:229-338).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

#: quantization scale: 2^20 keeps |q| <= ~2^21 for unit-ish embeddings, so
#: 64-dim squared distances stay < 2^53 (exact in double)
Q_SCALE = 1 << 20


def quantize(vec: Column) -> Column:
    """``floor(x * 2^20)`` per component — exact, cross-engine portable
    (CAST double→int truncates in Spark but rounds in DuckDB; floor
    agrees everywhere)."""
    return F.transform(vec, lambda x: F.floor(x.cast("double") * F.lit(float(Q_SCALE))))


def sq_norm(vec: Column) -> Column:
    """Exact squared L2 norm of an integer-valued quantized vector."""
    return F.aggregate(
        F.transform(vec, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )


def dot_q(a: Column, b: Column) -> Column:
    """Exact dot product of two integer-valued quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )


def _assign(vecs: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: broadcast the k centroid rows, exact
    quantized distances, ties to the lowest cluster id.

    Input ``vecs``: (vec_id, qv, qn); ``centroids``: (cluster_id, cv, cn).
    Output: (vec_id, qv, cluster_id, dist).
    """
    joined = vecs.crossJoin(F.broadcast(centroids))
    dist = F.col("qn") + F.col("cn") - F.lit(2.0) * dot_q(F.col("qv"), F.col("cv"))
    scored = joined.select(
        "vec_id", "qv", "qn", F.col("cluster_id"), dist.alias("dist")
    )
    best = scored.groupBy("vec_id").agg(
        F.min(F.struct("dist", "cluster_id")).alias("best"),
        F.first("qv").alias("qv"),
        F.first("qn").alias("qn"),
    )
    return best.select(
        "vec_id",
        "qv",
        "qn",
        F.col("best.cluster_id").alias("cluster_id"),
        F.col("best.dist").alias("dist"),
    )


def _update(assigned: DataFrame) -> DataFrame:
    """Floored-mean centroid per cluster from exploded per-dimension exact
    integer sums; clusters keep integer-valued components so the next
    iteration's arithmetic stays exact."""
    per_dim = (
        assigned.select("cluster_id", F.posexplode("qv").alias("pos", "q"))
        .groupBy("cluster_id", "pos")
        .agg(
            # component sums fit long exactly (|q| <= 2^21, members << 2^31)
            F.floor(
                F.sum(F.col("q").cast("long")) / F.count(F.lit(1))
            ).alias("c")
        )
    )
    return (
        per_dim.groupBy("cluster_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda x: x["c"].cast("double"),
            ).alias("cv")
        )
        .select("cluster_id", "cv", sq_norm(F.col("cv")).alias("cn"))
    )


def _kmeans_assign_relational(
    emb: DataFrame,
    k: int,
    iters: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """The original all-relational formulation — retained as the
    bit-equality reference for the kernel path (same discipline as
    similarity._semantic_dedup's relational twin)."""
    vecs = emb.select(
        F.col(id_col).alias("vec_id"), quantize(F.col(vec_col)).alias("qv")
    ).withColumn("qn", sq_norm(F.col("qv")))
    # seed centroids: the k lowest vec_ids, renumbered 0..k-1 in id order
    centroids = (
        vecs.orderBy("vec_id")
        .limit(k)
        .select(
            (F.row_number().over(W.orderBy("vec_id")) - 1).alias("cluster_id"),
            F.col("qv").alias("cv"),
            F.col("qn").alias("cn"),
        )
    )
    assigned = _assign(vecs, centroids)
    for _ in range(iters - 1):
        centroids = _update(assigned)
        assigned = _assign(vecs, centroids)
    return assigned.select("vec_id", "cluster_id", "dist")


def _quantize_np(rows, d):
    """Driver/executor-side quantize of a python list vector: the exact
    numpy replay of :func:`quantize` — float→double cast is exact, the
    2^20 multiply only shifts the exponent (exact), floor is exact."""
    import numpy as np

    out = np.empty((len(rows), d), dtype=np.float64)
    for i, v in enumerate(rows):
        out[i] = np.floor(np.asarray(v, dtype=np.float64) * float(Q_SCALE))
    return out


def kmeans_assign(
    emb: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_kernel: bool = True,
) -> DataFrame:
    """Deterministic quantized k-means: seeds = k lowest ids, ``iters``
    unrolled Lloyd rounds. Returns (vec_id, cluster_id, dist) with dist
    the exact quantized squared L2 to the final centroid.

    Round 14 (guide §2.3 "aggregate before you shuffle", §4.2): the
    default path runs each Lloyd round as a map-only Arrow kernel over
    the corpus with the k centroids as a task-closure constant (k·d ≤
    a few KB by construction — same bounded class as the IVF/PQ codebook
    collects) and reduces the centroid update to k×d partial-sum rows
    per task. The relational form shuffled the FULL corpus of vectors
    through a groupBy(vec_id) once per round (the n×k scored relation
    carried qv) plus a posexplode'd n×d shuffle for the update, and
    evaluated the n×k×d distance folds as interpreted HOF lambdas
    (~µs/element — the r13 pair-kernel cliff). The kernel moves ZERO
    vector bytes across any exchange at any corpus size; per round one
    scan + a ≤k·d-row aggregate.

    Bit-equality (pinned kernel≡relational in test_round14_opt_pins),
    SCOPED to corpora whose k lowest ids are all non-NULL vectors:
    every quantity in the quantized domain is an exact integer-valued
    double below 2^53, so numpy's per-dimension accumulation reproduces
    the JVM folds exactly; the floored-mean update replays Spark's
    op sequence (long sums → double divide → floor); ties argmin to the
    lowest cluster id exactly like min(struct(dist, cluster_id)). A NULL
    vector among the NON-seed rows mirrors the relational plan (all
    dists NULL → lowest live cluster id, NULL dist, contributes nothing
    to any centroid); a wrong-length vector fails loudly with the dims
    named (the _argmax_cell / ADVICE-r12 stance) instead of the
    relational form's silent NULL cascade.

    INTENTIONAL DIVERGENCE on NULL-contaminated SEED windows (ADVICE
    r14; same stance as the r13 ``ivf_train_centroids`` NULL-seed
    filter): a NULL vector among the k lowest ids is dropped from the
    seed set here (fewer live centroids, ids renumbered 0..len(live)-1),
    and an all-NULL corpus returns an EMPTY frame at any ``iters``. The
    relational form instead keeps a NULL centroid whose NULL distance
    wins every min(struct(dist, cid)) via NULLS-FIRST struct ordering —
    round 1 collapses every assignment onto the NULL seed's cluster
    (and the Lloyd update then turns that centroid real, so at iters>=2
    the output is one real cluster; on an all-NULL corpus at iters=1
    every row comes back with NULL dist). A degenerate artifact of SQL
    null ordering, not a useful clustering.
    Pinned in test_round15_pins.py (NULL-in-seed-window and all-NULL
    corpora); no declared query feeds NULL seed vectors.
    """
    if not use_kernel:
        return _kmeans_assign_relational(emb, k, iters, id_col, vec_col)

    import numpy as np
    from pyspark.sql import types as T

    base = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast(T.ArrayType(T.DoubleType())).alias("_v"),
    )
    # seeds: the k lowest ids (TakeOrdered — one bounded job), quantized
    # driver-side with the identical exact arithmetic
    seed_rows = [
        r
        for r in base.orderBy("vec_id").limit(k).collect()
        if r["_v"] is not None
    ]
    sc = emb.sparkSession
    out_schema = T.StructType(
        [
            T.StructField("vec_id", emb.schema[id_col].dataType, True),
            T.StructField("cluster_id", T.IntegerType(), True),
            T.StructField("dist", T.DoubleType(), True),
        ]
    )
    if not seed_rows:
        return sc.createDataFrame([], out_schema)
    d = len(seed_rows[0]["_v"])
    for r in seed_rows:
        if len(r["_v"]) != d:
            raise ValueError(
                f"{vec_col!r} seed vector for id {r['vec_id']} has length "
                f"{len(r['_v'])} but the first seed is {d}-dimensional"
            )
    C = _quantize_np([r["_v"] for r in seed_rows], d)
    cids = np.arange(len(seed_rows), dtype=np.int64)

    def _norms(M):
        # left-to-right self-dot fold per row — exact (integer domain)
        n2 = np.zeros(M.shape[0], dtype=np.float64)
        for j in range(M.shape[1]):
            n2 += M[:, j] * M[:, j]
        return n2

    def _assign_np(Q, qn, C, cn):
        # dist = |q|^2 + |c|^2 - 2<q,c> — exact integers, per-dim folds
        dots = np.zeros((Q.shape[0], C.shape[0]), dtype=np.float64)
        for j in range(C.shape[1]):
            dots += Q[:, j, None] * C[None, :, j]
        return qn[:, None] + cn[None, :] - 2.0 * dots

    def _quantize_batch(pdf):
        """(Q, qn, null_mask) for one pandas batch; loud on ragged."""
        n = len(pdf)
        Q = np.zeros((n, d), dtype=np.float64)
        null = np.zeros(n, dtype=bool)
        for i, v in enumerate(pdf["_v"]):
            if v is None:
                null[i] = True
                continue
            if len(v) != d:
                raise ValueError(
                    f"{vec_col!r} has a length-{len(v)} vector but the "
                    f"centroids are {d}-dimensional"
                )
            Q[i] = np.floor(np.asarray(v, dtype=np.float64) * float(Q_SCALE))
        return Q, _norms(Q), null

    part_schema = T.StructType(
        [
            T.StructField("cluster_id", T.IntegerType(), False),
            T.StructField("pos", T.IntegerType(), False),
            T.StructField("s", T.LongType(), False),
            T.StructField("n", T.LongType(), False),
        ]
    )

    for it in range(iters - 1):
        cC, ccn, ccids = C, _norms(C), cids  # bind loop-local for closure

        def _partials(batches, C=cC, cn=ccn, cids=ccids):
            import pandas as pd

            kk = C.shape[0]
            sums = np.zeros((kk, d), dtype=np.int64)
            cnts = np.zeros(kk, dtype=np.int64)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                Q, qn, null = _quantize_batch(pdf)
                best = np.argmin(_assign_np(Q, qn, C, cn), axis=1)
                live = ~null
                np.add.at(sums, best[live], Q[live].astype(np.int64))
                cnts += np.bincount(best[live], minlength=kk)
            out_c, out_p, out_s, out_n = [], [], [], []
            for ci in range(kk):
                if cnts[ci] == 0:
                    continue  # empty cluster: emits nothing (≡ posexplode)
                out_c.extend([int(cids[ci])] * d)
                out_p.extend(range(d))
                out_s.extend(int(x) for x in sums[ci])
                out_n.extend([int(cnts[ci])] * d)
            yield pd.DataFrame(
                {
                    "cluster_id": pd.array(out_c, dtype="int32"),
                    "pos": pd.array(out_p, dtype="int32"),
                    "s": pd.array(out_s, dtype="int64"),
                    "n": pd.array(out_n, dtype="int64"),
                }
            )

        agg = (
            base.mapInPandas(_partials, part_schema)
            .groupBy("cluster_id", "pos")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .collect()  # ≤ k·d rows — bounded (centroid-class collect)
        )
        by_cluster: dict[int, list] = {}
        for r in agg:
            by_cluster.setdefault(r["cluster_id"], []).append(r)
        new_cids = sorted(by_cluster)
        C = np.zeros((len(new_cids), d), dtype=np.float64)
        for i, ci in enumerate(new_cids):
            for r in by_cluster[ci]:
                # replay Spark's floor(sum_long / count_long): both sides
                # cast to double, IEEE divide, floor
                C[i, r["pos"]] = np.floor(float(r["s"]) / float(r["n"]))
        cids = np.array(new_cids, dtype=np.int64)
        if len(cids) == 0:  # every vector NULL: no live centroids remain
            return sc.createDataFrame([], out_schema)

    fC, fcn, fcids = C, _norms(C), cids
    lowest = int(fcids[0])

    def _final(batches, C=fC, cn=fcn, cids=fcids):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            Q, qn, null = _quantize_batch(pdf)
            D = _assign_np(Q, qn, C, cn)
            best = np.argmin(D, axis=1)
            dist = D[np.arange(len(pdf)), best]
            out = pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cluster_id": cids[best].astype(np.int32),
                    "dist": dist,
                }
            )
            if null.any():
                # NULL vector ≡ relational: every dist NULL → the
                # min-struct fold lands on the lowest live cluster id
                out.loc[null, "cluster_id"] = np.int32(lowest)
                out["dist"] = out["dist"].astype(object)
                out.loc[null, "dist"] = None
            yield out

    return base.mapInPandas(_final, out_schema)
