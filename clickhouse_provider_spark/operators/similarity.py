"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Dot/norm arithmetic via F.aggregate/zip_with in DOUBLE, strictly
  left-to-right over the array, which makes the result bit-identical to a
  sequential SQL implementation (DuckDB list_* fold the same way).
- ``lsh_bucket_topk``: the scale path — deterministic random-hyperplane
  LSH. Hyperplane p's j-th component is ±1 derived from md5(p|j), so the
  whole index is reproducible with no stored model. Buckets bound the
  candidate set; at 100 TB the bucketed table is partitioned by signature
  and a query touches one partition (+ optional multi-probe neighbors).

No Python UDFs: everything is higher-order-function codegen on the JVM.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dot(a: F.Column, b: F.Column) -> F.Column:
    """Left-to-right double dot product (deterministic fold order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: F.Column) -> F.Column:
    return F.sqrt(dot(a, a))


def cosine(a: F.Column, b: F.Column) -> F.Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    emb: DataFrame, query_vec_id: int, k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact top-k by cosine against the vector with ``query_vec_id``.

    The 1-row query side is broadcast; candidates stream through a map-only
    stage; top-k via TakeOrderedAndProject (no global sort). Ties broken by
    vec_id for a deterministic result set.
    """
    q = (
        emb.filter(F.col(id_col) == query_vec_id)
        .select(F.col(vec_col).alias("q_vec"))
    )
    return (
        emb.filter(F.col(id_col) != query_vec_id)
        .join(F.broadcast(q))
        .select(
            F.col(id_col),
            cosine(F.col(vec_col), F.col("q_vec")).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def hyperplane_signs(n_planes: int, dim: int) -> list[list[int]]:
    """Deterministic pseudo-random ±1 hyperplanes: sign = parity of the
    first md5 byte of 'p|j'. Reproducible anywhere (incl. the SQL oracle)."""
    return [
        [
            1 if hashlib.md5(f"{p}|{j}".encode()).digest()[0] % 2 == 0 else -1
            for j in range(dim)
        ]
        for p in range(n_planes)
    ]


def lsh_signature(vec: F.Column, planes: list[list[int]]) -> F.Column:
    """Bit p of the signature = sign(dot(vec, plane_p)) >= 0."""
    sig = F.lit(0)
    for p, signs in enumerate(planes):
        plane = F.array(*[F.lit(float(s)) for s in signs])
        d = dot(vec, plane)
        sig = sig + F.when(d >= 0, F.lit(2**p)).otherwise(0)
    return sig


def lsh_bucket_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: exact cosine restricted to the query's LSH bucket.

    With 2^n_planes buckets the candidate set shrinks ~2^n_planes-fold;
    recall is tuned by n_planes (fewer planes → bigger buckets → higher
    recall). Deterministic: planes derive from md5 (see hyperplane_signs).
    """
    dim = len(emb.select(vec_col).first()[0])
    planes = hyperplane_signs(n_planes, dim)
    with_sig = emb.withColumn("lsh_bucket", lsh_signature(F.col(vec_col), planes))
    q = (
        with_sig.filter(F.col(id_col) == query_vec_id)
        .select(F.col(vec_col).alias("q_vec"), F.col("lsh_bucket").alias("q_bucket"))
    )
    return (
        with_sig.filter(F.col(id_col) != query_vec_id)
        .join(F.broadcast(q), F.col("lsh_bucket") == F.col("q_bucket"))
        .select(
            F.col(id_col),
            F.col("lsh_bucket"),
            cosine(F.col(vec_col), F.col("q_vec")).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def embedding_norms(emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Per-vector L2 norm + per-label aggregates feedstock."""
    return emb.select(
        F.col(id_col),
        F.col("label"),
        norm(F.col(vec_col)).alias("l2_norm"),
        F.size(F.col(vec_col)).alias("dim"),
    )
