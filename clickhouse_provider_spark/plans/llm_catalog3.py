"""LLM training-data pipeline batch 3 (round 7):

- ``boilerplate_ngrams`` — cross-document repeated word-8-gram detection,
  the boilerplate-removal primitive (CCNet/C4-style pipelines drop or
  down-weight spans whose shingles recur across many documents; the same
  scan feeds suffix-array-style exact-substring dedup at coarser grain);
- ``semantic_cluster_kmeans`` — deterministic quantized k-means over the
  embedding column (semantic bucketing for dedup/mixing), via
  operators/clustering.py.

Exactness: the n-gram entry is pure string/count arithmetic; k-means runs
entirely in the floor(x*2^20) integer domain where every distance and
centroid is an exact integer-valued double (see operators/clustering.py) —
the DuckDB oracle replays the identical two Lloyd rounds with
list_dot_product (same left-fold as Spark's aggregate; llm_catalog
precedent).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from clickhouse_provider_spark.operators import clustering
from clickhouse_provider_spark.plans.catalog import as_double, register


@register(
    "boilerplate_ngrams",
    oracle="""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ), g AS (
      SELECT doc_id,
             unnest(list_transform(range(0, len(words) - 7),
                    i -> array_to_string(words[i+1:i+8], ' '))) AS gram
      FROM d WHERE len(words) >= 8
    ), s AS (
      SELECT gram, count(DISTINCT doc_id) AS doc_freq, count(*) AS occurrences
      FROM g GROUP BY gram
    )
    SELECT gram, doc_freq, occurrences
    FROM s WHERE doc_freq >= 3
    ORDER BY doc_freq DESC, occurrences DESC, gram LIMIT 15
    """,
    doc="Cross-document boilerplate detection: word-8-gram shingles per "
    "document (array slice, no window shuffle), grouped to (distinct-doc "
    "frequency, total occurrences), top 15 recurring grams with a full "
    "deterministic tie order. The grams a curation pipeline strips or "
    "caps (C4/CCNet-style boilerplate and near-duplicate span removal). "
    "Scale: shuffle carries one row per gram occurrence — at 100 TB "
    "group on a 64-bit gram hash first and resolve the winning hashes "
    "back to strings via one broadcast semi-join, so full grams never "
    "dominate shuffle bytes.",
    tags=("llm", "text", "dedup"),
)
def q_boilerplate_ngrams(spark, t):
    d = t["documents"].select(
        "doc_id", F.split("text", " ").alias("words")
    ).filter(F.size("words") >= 8)
    g = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("words") - 8),
                lambda i: F.array_join(F.slice(F.col("words"), i + 1, 8), " "),
            )
        ).alias("gram"),
    )
    s = g.groupBy("gram").agg(
        F.countDistinct("doc_id").alias("doc_freq"),
        F.count(F.lit(1)).alias("occurrences"),
    )
    return (
        s.filter(F.col("doc_freq") >= 3)
        .orderBy(
            F.col("doc_freq").desc(), F.col("occurrences").desc(), F.col("gram")
        )
        .limit(15)
    )


@register(
    "semantic_cluster_kmeans",
    oracle="""
    WITH v AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> floor(CAST(x AS DOUBLE) * 1048576.0)) AS qv
      FROM embeddings
    ), vn AS (
      SELECT vec_id, qv, list_dot_product(qv, qv) AS qn FROM v
    ), seeds AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster_id,
             qv AS cv, qn AS cn
      FROM vn ORDER BY vec_id LIMIT 4
    ), a1 AS (
      SELECT vec_id, qv, qn, cluster_id,
             qn + cn - 2.0 * list_dot_product(qv, cv) AS dist
      FROM vn, seeds
      QUALIFY row_number() OVER (PARTITION BY vec_id
                                 ORDER BY dist, cluster_id) = 1
    ), upd AS (
      SELECT cluster_id, pos, floor(sum(q) / count(*)) AS c
      FROM (SELECT cluster_id, unnest(qv) AS q,
                   unnest(range(1, len(qv) + 1)) AS pos FROM a1)
      GROUP BY cluster_id, pos
    ), c2 AS (
      SELECT cluster_id, list(c ORDER BY pos) AS cv FROM upd GROUP BY cluster_id
    ), c2n AS (
      SELECT cluster_id, cv, list_dot_product(cv, cv) AS cn FROM c2
    ), a2 AS (
      SELECT vn.vec_id, c2n.cluster_id,
             qn + cn - 2.0 * list_dot_product(qv, cv) AS dist
      FROM vn, c2n
      QUALIFY row_number() OVER (PARTITION BY vn.vec_id
                                 ORDER BY dist, c2n.cluster_id) = 1
    )
    SELECT cluster_id, count(*) AS size,
           CAST(sum(CAST(dist AS DECIMAL(18,0))) AS DOUBLE) AS inertia
    FROM a2 GROUP BY cluster_id
    """,
    doc="Deterministic quantized k-means (k=4, seeds = 4 lowest vec_ids, "
    "2 Lloyd rounds) over the embedding column: cluster sizes + exact "
    "quantized inertia. Reproducible semantic bucketing for curation "
    "(operators/clustering.py: floor(x*2^20) integer domain makes every "
    "distance/centroid exact and reduce-order-free; floored-mean updates "
    "keep iterations exact; ties to the lowest cluster id). The oracle "
    "replays the identical two rounds in SQL. Inertia summed as "
    "DECIMAL(18,0) — per-vector distances are exact integers but their "
    "corpus sum can exceed 2^53. Scale: per round one k-row broadcast "
    "join + one (cluster, dim) combiner shuffle; no driver loop, no "
    "collect.",
    tags=("llm", "similarity", "clustering"),
)
def q_semantic_cluster_kmeans(spark, t):
    assigned = clustering.kmeans_assign(t["embeddings"], k=4, iters=2)
    return assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("size"),
        as_double(F.sum(F.col("dist").cast(T.DecimalType(18, 0)))).alias(
            "inertia"
        ),
    )
