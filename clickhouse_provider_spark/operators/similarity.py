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
    dim: int | None = None,
) -> DataFrame:
    """ANN top-k: exact cosine restricted to the query's LSH bucket.

    With 2^n_planes buckets the candidate set shrinks ~2^n_planes-fold;
    recall is tuned by n_planes (fewer planes → bigger buckets → higher
    recall). Deterministic: planes derive from md5 (see hyperplane_signs).

    Pass ``dim`` (the embedding dimensionality) when known — otherwise a
    single-row probe infers it, which is a (bounded: LIMIT 1) driver
    action inside the plan-building path.
    """
    if dim is None:
        dim = len(emb.select(vec_col).limit(1).first()[0])
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


def cosine_near_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact): all (a, b), a < b,
    with cosine ≥ threshold. This is the verification/baseline form — at
    100 TB, generate candidates with the LSH buckets (lsh_bucket_topk's
    signature) or IVF cells first and verify only those; the exact form
    here is what the candidates are verified *against*."""
    a = emb.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("ea"))
    b = emb.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("eb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a", "vec_b", cosine(F.col("ea"), F.col("eb")).alias("cos_sim")
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def ivf_assignments(
    emb: DataFrame, n_cells: int = 8, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """IVF-flat cell assignment: each vector → its max-cosine centroid.

    Centroid 'training' is a deterministic stub (the first n_cells vectors
    by id) — a k-means step would slot in here without changing the
    operator shape; what matters for the engine is the assignment plan:
    broadcast the centroid table, one map-side argmax per vector, NO
    shuffle. The cell id becomes the partition key of the vector table at
    scale (a query probes nprobe cells → reads nprobe partitions)."""
    from pyspark.sql.window import Window as W

    cents = emb.filter(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("cell_id"), F.col(vec_col).alias("centroid")
    )
    w = W.partitionBy(id_col).orderBy(F.col("cos_to_centroid").desc(), F.col("cell_id"))
    return (
        emb.join(F.broadcast(cents))
        .select(
            F.col(id_col),
            F.col(vec_col),
            F.col("cell_id"),
            cosine(F.col(vec_col), F.col("centroid")).alias("cos_to_centroid"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def ivf_topk(
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_cells: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN top-k: probe the query's nprobe best cells, exact cosine
    within them. Recall/latency dial = nprobe/n_cells."""
    assigned = ivf_assignments(emb, n_cells, id_col, vec_col).localCheckpoint(
        eager=True
    )
    cents = emb.filter(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("cell_id"), F.col(vec_col).alias("centroid")
    )
    q_vec = emb.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("q_vec")
    )
    probes = (
        q_vec.join(F.broadcast(cents))
        .select("cell_id", "q_vec", cosine(F.col("q_vec"), F.col("centroid")).alias("c"))
        .orderBy(F.col("c").desc(), F.col("cell_id"))
        .limit(nprobe)
        .select("cell_id", "q_vec")
    )
    return (
        assigned.filter(F.col(id_col) != query_vec_id)
        .join(F.broadcast(probes), "cell_id")
        .select(
            F.col(id_col),
            F.col("cell_id"),
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
