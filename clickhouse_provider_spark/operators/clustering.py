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


def kmeans_assign(
    emb: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic quantized k-means: seeds = k lowest ids, ``iters``
    unrolled Lloyd rounds. Returns (vec_id, cluster_id, dist) with dist
    the exact quantized squared L2 to the final centroid."""
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
