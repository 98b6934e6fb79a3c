"""Round-11 batch 16: predicate-filtered ANN (VERDICT r10 task 5).

``similarity_filtered_ann_eval`` measures the retrieval shape real
hybrid-RAG / curation pipelines hit constantly — "top-k neighbors WHERE a
document predicate holds" — comparing the two classic strategies against
filtered exact ground truth in one relation:

- **in-probe filter**: predicate pushed below the probe (semi-join before
  any distance compute) — returns up to k, recall bounded only by cell
  pruning;
- **post-filter**: unfiltered probe for k·expansion, predicate applied
  after — under-fills whenever expansion < 1/selectivity, which the
  entry's fixture demonstrates (lang='de' is ~14% of documents, expansion
  4 < 1/0.14).

No reference counterpart (the reference delegates analytics to ClickHouse
and has no vector surface — SURVEY.md §2); this is part of the
LLM-training-data layer the build brief adds. The index-backed form
(predicate inside the partition-pruned parquet probe, landing in
PushedFilters) is :func:`operators.similarity.ivf_query_index` with
``predicate=``, pinned by tests/test_round11_pins.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from clickhouse_provider_spark.operators import similarity
from clickhouse_provider_spark.plans.catalog import register
from clickhouse_provider_spark.plans.llm_catalog import _cos_sql

_K = 10
_EXPANSION = 4
_LANG = "de"

_IN_EXACT = "CASE WHEN vec_id IN (SELECT vec_id FROM exact) THEN 1 ELSE 0 END"


@register(
    "similarity_filtered_ann_eval",
    # Same oracle stance as similarity_ivf_topk: seeded-sample centroids
    # with ZERO Lloyd rounds (cross-engine float exactness); counts are
    # exact integers, recall an exact n/10 rational.
    oracle=f"""
    WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
               FROM embeddings),
    allowed AS (SELECT doc_id AS vec_id FROM documents WHERE lang = '{_LANG}'),
    r AS (SELECT vec_id, e, md5('ivf|' || CAST(vec_id AS VARCHAR)) AS _r FROM v),
    cents AS (
      SELECT row_number() OVER (ORDER BY _r) - 1 AS cell_id, e AS centroid
      FROM r ORDER BY _r LIMIT 8
    ),
    assigned AS (
      SELECT vec_id, e, cell_id FROM (
        SELECT v.vec_id, v.e, c.cell_id,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY {_cos_sql('v.e', 'c.centroid')} DESC, c.cell_id
               ) AS rn
        FROM v CROSS JOIN cents c
      ) WHERE rn = 1
    ),
    q AS (SELECT e AS qv FROM v WHERE vec_id = 0),
    probes AS (
      SELECT c.cell_id, q.qv FROM cents c, q
      ORDER BY {_cos_sql('q.qv', 'c.centroid')} DESC, c.cell_id LIMIT 2
    ),
    exact AS (
      SELECT v.vec_id, {_cos_sql('v.e', 'q.qv')} AS cos_sim
      FROM v JOIN allowed USING (vec_id), q
      WHERE v.vec_id <> 0
      ORDER BY cos_sim DESC, v.vec_id LIMIT {_K}
    ),
    inprobe AS (
      SELECT a.vec_id, {_cos_sql('a.e', 'p.qv')} AS cos_sim
      FROM assigned a JOIN allowed USING (vec_id) JOIN probes p USING (cell_id)
      WHERE a.vec_id <> 0
      ORDER BY cos_sim DESC, a.vec_id LIMIT {_K}
    ),
    prefetch AS (
      SELECT a.vec_id, {_cos_sql('a.e', 'p.qv')} AS cos_sim
      FROM assigned a JOIN probes p USING (cell_id)
      WHERE a.vec_id <> 0
      ORDER BY cos_sim DESC, a.vec_id LIMIT {_K * _EXPANSION}
    ),
    postfilter AS (
      SELECT pf.vec_id, pf.cos_sim FROM prefetch pf JOIN allowed USING (vec_id)
      ORDER BY pf.cos_sim DESC, pf.vec_id LIMIT {_K}
    ),
    summ AS (
      SELECT 'exact' AS method, count(*) AS n_returned,
             coalesce(sum({_IN_EXACT}), 0) AS n_hits FROM exact
      UNION ALL
      SELECT 'ivf_inprobe', count(*), coalesce(sum({_IN_EXACT}), 0) FROM inprobe
      UNION ALL
      SELECT 'ivf_postfilter', count(*), coalesce(sum({_IN_EXACT}), 0) FROM postfilter
    )
    SELECT method, n_returned, CAST(n_hits AS BIGINT) AS n_hits,
           CAST(n_hits AS DOUBLE) / {_K} AS recall_at_k
    FROM summ
    """,
    doc="Filtered-ANN evaluation: top-10 cosine neighbors of vec 0 among "
    f"documents WHERE lang='{_LANG}' (~14% selectivity), by (a) filtered "
    "exact brute force (ground truth), (b) IVF with the predicate pushed "
    "INTO the probe (semi-join before any distance compute — the scale "
    "path: cost is O(matching vectors in nprobe cells)), and (c) IVF "
    "post-filter (unfiltered probe for k*4, predicate after — the naive "
    "path, which under-fills when expansion < 1/selectivity). One row "
    "per method: returned count, overlap with exact, recall@10. The "
    "index-backed in-probe form additionally pushes the predicate into "
    "the parquet scan of the partition-pruned cells "
    "(similarity.ivf_query_index(predicate=...), PushedFilters pinned in "
    "tests). Oracle mirrors the seeded 0-Lloyd centroids, both probe "
    "strategies, and the overlap counts verbatim.",
    tags=("llm", "similarity", "eval-harness"),
)
def q_similarity_filtered_ann_eval(spark, t) -> DataFrame:
    emb, docs = t["embeddings"], t["documents"]
    allowed = docs.filter(F.col("lang") == _LANG).select(
        F.col("doc_id").alias("vec_id")
    )
    q_vec = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_vec")
    )
    exact = (
        emb.join(allowed, "vec_id")
        .filter(F.col("vec_id") != 0)
        .join(F.broadcast(q_vec))
        .select(
            "vec_id",
            similarity.cosine_expr("embedding", "q_vec").alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(_K)
    )
    # train the seeded centroids ONCE and share them across both probe
    # strategies (round 14, guide §1.2-1): the two ivf_filtered_topk
    # calls used to each run their own identical seeded-sample job —
    # same emb, same n_cells, same iters → the SAME centroid relation by
    # construction, so sharing is value-invisible.
    cents = similarity.ivf_train_centroids(emb, 8, iters=0)
    # share ONE assignment relation across both probe strategies too
    # (round 15): each ivf_filtered_topk call otherwise rebuilds the
    # identical ivf_assignments plan — one more centroid collect and a
    # second Arrow-kernel construction for the same relation.
    assigned = similarity.ivf_assignments(
        emb, centroids=cents.select("cell_id", "centroid")
    )
    inprobe = similarity.ivf_filtered_topk(
        emb, allowed, query_vec_id=0, k=_K, n_cells=8, nprobe=2,
        mode="inprobe", iters=0, centroids=cents, assigned=assigned,
    )
    postfilter = similarity.ivf_filtered_topk(
        emb, allowed, query_vec_id=0, k=_K, n_cells=8, nprobe=2,
        mode="postfilter", expansion=_EXPANSION, iters=0, centroids=cents,
        assigned=assigned,
    )
    ex_ids = exact.select("vec_id", F.lit(1).alias("_x"))

    def summarize(name: str, topk: DataFrame) -> DataFrame:
        return (
            topk.select("vec_id")
            .join(F.broadcast(ex_ids), "vec_id", "left")
            .agg(
                F.count(F.lit(1)).alias("n_returned"),
                F.coalesce(F.sum(F.coalesce(F.col("_x"), F.lit(0))), F.lit(0))
                .cast("long")
                .alias("n_hits"),
            )
            .select(F.lit(name).alias("method"), "n_returned", "n_hits")
        )

    out = (
        summarize("exact", exact)
        .unionByName(summarize("ivf_inprobe", inprobe))
        .unionByName(summarize("ivf_postfilter", postfilter))
    )
    return out.withColumn(
        "recall_at_k", F.col("n_hits").cast("double") / F.lit(float(_K))
    )
