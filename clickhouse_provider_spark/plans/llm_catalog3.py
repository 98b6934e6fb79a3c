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


#: the deterministic 2-round quantized k-means as a reusable CTE chain
#: ending at ``a2`` (vec_id, cluster_id, dist) — shared by the k-means
#: entry and the cluster-balanced selection entry.
KMEANS_A2_SQL = """\
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
    )"""


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
    from clickhouse_provider_spark.operators import spread_scan

    # spread before the 8-gram explode (round 14): the gram build is the
    # CPU-heavy map stage, and a single-split documents scan ran it on
    # one task; no-op on well-split inputs
    d = spread_scan(t["documents"], "doc_id").select(
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
    oracle=f"""
    {KMEANS_A2_SQL}
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


@register(
    "mixture_sampling_temperature",
    oracle="""
    WITH c AS (
      SELECT source, count(*) AS n_docs FROM documents GROUP BY source
    ), z AS (
      SELECT list_reduce(list(sqrt(CAST(n_docs AS DOUBLE)) ORDER BY source),
                         (a, b) -> a + b) AS zsum,
             CAST(sum(n_docs) AS BIGINT) AS n_total
      FROM c
    ), w AS (
      SELECT source, n_docs,
             sqrt(CAST(n_docs AS DOUBLE)) / zsum AS weight_temp,
             least(((n_total // 2) * (sqrt(CAST(n_docs AS DOUBLE)) / zsum))
                     / n_docs, 1.0) AS keep_frac
      FROM c, z
    ), sel AS (
      SELECT d.source, d.doc_id, w.n_docs, w.weight_temp, w.keep_frac,
             substr(md5('mix7|' || CAST(d.doc_id AS VARCHAR)), 1, 8)
               < lower(lpad(to_hex(CAST(floor(keep_frac * 4294967296.0)
                                        AS BIGINT)), 8, '0')) AS keep
      FROM documents d JOIN w USING (source)
    )
    SELECT source, max(n_docs) AS n_docs, max(weight_temp) AS weight_temp,
           CAST(coalesce(sum(CASE WHEN keep THEN 1 END), 0) AS BIGINT)
             AS n_selected
    FROM sel GROUP BY source
    """,
    doc="Temperature-weighted mixture sampling (T=2, i.e. weights ~ "
    "n^(1/2)): per source, weight = sqrt(n_s)/sum(sqrt(n_s)) — the "
    "standard size-temperature rebalancing for multi-source training "
    "mixes — with a budget of half the corpus allocated by weight and "
    "selected via the deterministic md5-threshold Bernoulli "
    "(operators/sampling.py). The hex threshold is computed IN-ENGINE "
    "(floor(frac*2^32) -> fixed-width lowercase hex) so the "
    "data-dependent fraction never touches the driver; sqrt is "
    "IEEE-exact and the weight normalizer folds in fixed source order. "
    "Scale: one count shuffle + a broadcast of |sources| rows + a "
    "map-only hash filter — no per-row state anywhere.",
    tags=("llm", "sampling"),
)
def q_mixture_sampling_temperature(spark, t):
    docs = t["documents"]
    c = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    z = c.agg(
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "source",
                            F.sqrt(F.col("n_docs").cast("double")).alias("rt"),
                        )
                    )
                ),
                lambda x: x["rt"],
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("zsum"),
        F.sum("n_docs").alias("n_total"),
    )
    w = c.crossJoin(F.broadcast(z)).select(
        "source",
        "n_docs",
        (F.sqrt(F.col("n_docs").cast("double")) / F.col("zsum")).alias(
            "weight_temp"
        ),
        F.least(
            (
                F.expr("n_total DIV 2")
                * (F.sqrt(F.col("n_docs").cast("double")) / F.col("zsum"))
            )
            / F.col("n_docs"),
            F.lit(1.0),
        ).alias("keep_frac"),
    )
    thresh = F.lower(
        F.lpad(
            F.hex(
                F.floor(F.col("keep_frac") * F.lit(4294967296.0)).cast("long")
            ),
            8,
            "0",
        )
    )
    sel = docs.join(F.broadcast(w), "source").select(
        "source",
        "n_docs",
        "weight_temp",
        (
            F.substring(
                F.md5(F.concat(F.lit("mix7|"), F.col("doc_id").cast("string"))),
                1,
                8,
            )
            < thresh
        ).alias("keep"),
    )
    return sel.groupBy("source").agg(
        F.max("n_docs").alias("n_docs"),
        F.max("weight_temp").alias("weight_temp"),
        F.coalesce(F.sum(F.when(F.col("keep"), F.lit(1))), F.lit(0)).alias(
            "n_selected"
        ),
    )


@register(
    "cluster_balanced_selection",
    oracle=f"""
    {KMEANS_A2_SQL},
    q AS (
      SELECT doc_id,
             CASE WHEN len(toks) > 0
                  THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                  ELSE 0.0 END AS unique_ratio
      FROM (SELECT doc_id,
                   list_filter(string_split_regex(text, '\\s+'), x -> x <> '')
                     AS toks
            FROM documents)
    )
    SELECT cluster_id, doc_id, unique_ratio, sel_rank
    FROM (
      SELECT a2.cluster_id, q.doc_id, q.unique_ratio,
             row_number() OVER (PARTITION BY a2.cluster_id
                                ORDER BY q.unique_ratio DESC, q.doc_id)
               AS sel_rank
      FROM a2 JOIN q ON a2.vec_id = q.doc_id
    ) WHERE sel_rank <= 5
    """,
    doc="Diversity-aware curation: the top-5 highest-quality documents "
    "PER SEMANTIC CLUSTER — k-means buckets (semantic_cluster_kmeans's "
    "deterministic clusters, docs joined to embeddings on id) crossed "
    "with the text-quality unique-token ratio (text_quality), ranked "
    "with a full (quality desc, doc_id) tie order. The cluster-balanced "
    "selection pattern modern data mixes use so one dominant topic "
    "cannot eat the whole quality budget. Scale: the k-means plan + one "
    "id equi-join + one per-cluster top-k window (k rows per cluster "
    "survive the partial TakeOrdered).",
    tags=("llm", "similarity", "text", "clustering"),
)
def q_cluster_balanced_selection(spark, t):
    from pyspark.sql.window import Window as W

    from clickhouse_provider_spark.operators import text

    assigned = clustering.kmeans_assign(t["embeddings"], k=4, iters=2)
    q = text.quality_scores(t["documents"]).select("doc_id", "unique_ratio")
    joined = assigned.join(q, assigned.vec_id == q.doc_id).select(
        "cluster_id", "doc_id", "unique_ratio"
    )
    rn = F.row_number().over(
        W.partitionBy("cluster_id").orderBy(
            F.col("unique_ratio").desc(), F.col("doc_id")
        )
    )
    return (
        joined.withColumn("sel_rank", rn)
        .filter(F.col("sel_rank") <= 5)
        .select("cluster_id", "doc_id", "unique_ratio", "sel_rank")
    )
