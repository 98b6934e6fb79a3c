"""Round-10 batch 15: retrieval fusion + dedup evaluation loop.

Three additions that close operational gaps around existing families:

- ``hybrid_rrf_topk`` — reciprocal-rank fusion of the lexical (BM25) and
  dense (cosine) retrievers: the standard hybrid-RAG ranking both sides
  already existed for but nothing combined.
- ``dedup_simhash_clusters`` — the SimHash family gets the same scale-form
  clustering the MinHash family got in round 10 (hub edges per byte-band
  bucket, hamming-verified, CC) — and unlike MinHash, SimHash verification
  needs no text join at all: the 32-bit signatures carry it.
- ``dedup_lsh_recall_eval`` — MEASURES the banding recall the
  dedup_cluster_stats doc states analytically (ADVICE r10): LSH-recalled
  pair counts vs the exact all-pairs ground truth, per threshold. Like
  similarity_recall_eval / knn_label_accuracy this is an EVAL-HARNESS
  entry: the ground-truth side is the all-shared-shingle baseline, which
  is only tractable at sample scale — production runs it on a corpus
  sample to pick (b, r, threshold), never on the full 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_provider_spark.operators import dedup, similarity, text
from clickhouse_provider_spark.plans.catalog import register
from clickhouse_provider_spark.plans.catalog14 import _BM25_TERMS
from clickhouse_provider_spark.plans.llm_catalog import (
    SQL_SHINGLES,
    _cos_sql,
    _minhash_cols_sql,
    _simhash_sql,
    SQL_WORDS,
)

_RRF_K = 60  # the standard RRF damping constant (Cormack et al. 2009)


@register(
    "hybrid_rrf_topk",
    oracle=f"""
    WITH d AS (SELECT doc_id, {SQL_WORDS} AS words FROM documents),
    lens AS (SELECT doc_id, len(words) AS dl FROM d),
    stats AS (
      SELECT count(*) AS n_docs,
             CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
      FROM lens
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM (SELECT doc_id, unnest(words) AS term FROM d)
      WHERE term IN {_BM25_TERMS!r}
      GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, count(*) AS df_count FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id, tf.term,
             ((n_docs - df_count + CAST(0.5 AS DOUBLE))
              / (df_count + CAST(0.5 AS DOUBLE)))
             * (tf * CAST(2.2 AS DOUBLE))
             / (tf + CAST(1.2 AS DOUBLE)
                     * (CAST(0.25 AS DOUBLE)
                        + CAST(0.75 AS DOUBLE) * dl / avgdl)) AS term_score
      FROM tf JOIN dfreq USING (term) JOIN lens ON lens.doc_id = tf.doc_id,
           stats
    ),
    lex10 AS (
      SELECT doc_id,
             list_reduce(list(term_score ORDER BY term),
                         (a, b) -> a + b) AS score
      FROM scored GROUP BY doc_id
      ORDER BY score DESC, doc_id LIMIT 10
    ),
    lex AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY score DESC, doc_id) AS lex_rank
      FROM lex10
    ),
    q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
          FROM embeddings WHERE vec_id = 0),
    c AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings WHERE vec_id <> 0),
    den10 AS (
      SELECT vec_id AS doc_id, {_cos_sql('v', 'qv')} AS cos_sim
      FROM c, q ORDER BY cos_sim DESC, vec_id LIMIT 10
    ),
    den AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY cos_sim DESC, doc_id) AS dense_rank
      FROM den10
    ),
    fused AS (
      SELECT coalesce(lex.doc_id, den.doc_id) AS doc_id,
             lex.lex_rank, den.dense_rank,
             coalesce(CAST(1.0 AS DOUBLE) / ({_RRF_K} + lex.lex_rank),
                      CAST(0.0 AS DOUBLE))
             + coalesce(CAST(1.0 AS DOUBLE) / ({_RRF_K} + den.dense_rank),
                        CAST(0.0 AS DOUBLE)) AS rrf_score
      FROM lex FULL OUTER JOIN den USING (doc_id)
    )
    SELECT doc_id, lex_rank, dense_rank, rrf_score
    FROM fused ORDER BY rrf_score DESC, doc_id LIMIT 10
    """,
    doc="Hybrid retrieval: reciprocal-rank fusion (RRF, k=60) of the "
    "BM25 lexical top-10 (bm25_topk's fixed 3-term query) and the dense "
    "cosine top-10 (similarity_topk's vec_id=0 query) — the standard "
    "score-free combiner hybrid-RAG pipelines run, robust to the two "
    "retrievers' incomparable score scales. doc_id and vec_id share the "
    "0..N id space in this corpus, so the fusion join is direct. Float "
    "exactness: each fused score is the FIXED-ORDER sum of at most two "
    "doubles (lexical term first), so it is bit-reproducible across "
    "engines. Scale: both inputs are k-row relations (TakeOrdered on "
    "their own plans) — the rank windows and the full-outer join run on "
    "2k rows total regardless of corpus size (windows allowlisted in "
    "tests/test_plan_audit.py with that bound).",
    tags=("llm", "similarity", "text"),
)
def q_hybrid_rrf_topk(spark, t):
    lex10 = text.bm25_topk(t["documents"], _BM25_TERMS, k=10).select(
        "doc_id", "score"
    )
    from pyspark.sql.window import Window as W

    lex = lex10.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.col("score").desc(), "doc_id"))
        .alias("lex_rank"),
    )
    den10 = similarity.cosine_topk(t["embeddings"], query_vec_id=0, k=10).select(
        F.col("vec_id").alias("doc_id"), "cos_sim"
    )
    den = den10.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.col("cos_sim").desc(), "doc_id"))
        .alias("dense_rank"),
    )
    fused = lex.join(den, "doc_id", "full_outer").select(
        "doc_id",
        "lex_rank",
        "dense_rank",
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(_RRF_K) + F.col("lex_rank")), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(_RRF_K) + F.col("dense_rank")), F.lit(0.0)
            )
        ).alias("rrf_score"),
    )
    return fused.orderBy(F.col("rrf_score").desc(), "doc_id").limit(10)


@register(
    "dedup_simhash_clusters",
    oracle=f"""
    WITH sig AS ({_simhash_sql()}),
    bands AS (
      SELECT doc_id, simhash, band_id,
             (simhash >> (8 * band_id)) & 255 AS byte
      FROM sig, (SELECT unnest([0, 1, 2, 3]) AS band_id)
    ),
    hubs AS (
      SELECT band_id, byte, min(doc_id) AS hub
      FROM bands GROUP BY 1, 2 HAVING count(*) >= 2
    ),
    cand AS (
      SELECT DISTINCT h.hub AS doc_a, b.doc_id AS doc_b
      FROM bands b JOIN hubs h USING (band_id, byte)
      WHERE b.doc_id <> h.hub
    ),
    pairs AS (
      SELECT doc_a, doc_b
      FROM cand
        JOIN sig a ON a.doc_id = cand.doc_a
        JOIN sig b2 ON b2.doc_id = cand.doc_b
      WHERE bit_count(xor(a.simhash, b2.simhash)) <= 3
    ),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    comp AS (
      SELECT a AS doc_id, least(a, min(b)) AS component_id
      FROM reach GROUP BY a
    ),
    labeled AS (
      SELECT d.doc_id, coalesce(comp.component_id, d.doc_id) AS comp_id
      FROM documents d LEFT JOIN comp USING (doc_id)
    ),
    clusters AS (
      SELECT comp_id, count(*) AS cluster_size FROM labeled GROUP BY comp_id
    )
    SELECT cluster_size, count(*) AS n_clusters,
           CAST(cluster_size * count(*) AS BIGINT) AS n_docs
    FROM clusters GROUP BY cluster_size
    """.replace("WITH sig AS", "WITH RECURSIVE sig AS", 1),
    doc="SimHash near-dup clustering in SCALE form — the hub-edge "
    "treatment dedup_cluster_stats got this round, applied to the OTHER "
    "signature family: byte-band buckets → star edges to each bucket's "
    "min doc_id (operators/dedup.py:simhash_hub_pairs, O(m) per bucket) "
    "→ exact hamming ≤ 3 verification → CC → component-size "
    "distribution. Unlike MinHash, verification never joins text: the "
    "32-bit signature pair carries the exact distance (bit_count of "
    "xor), so the verify stage is a signature-only join — and since r11 "
    "that one join BROADCASTS the hub-signature side, which is <= "
    "n_bands*256 = 1,024 rows BY CONSTRUCTION (one hub per (band, byte) "
    "bucket): at 100 TB neither the text column nor the candidate "
    "relation ever shuffles anywhere in this plan. Bucket-density recall "
    "regime: banding recall is unchanged (hubs don't alter which docs "
    "share a bucket); the star form equals the clique form whenever a "
    "bucket's members are pairwise within the radius — i.e. in DENSE "
    "buckets of true near-dups, exactly where the O(m^2) saving matters; "
    "it can under-merge only in mixed buckets where the hub sits outside "
    "the radius of two members that are within it of each other (those "
    "members still co-bucket in 3 other bands, so a miss needs all four "
    "to fail). Oracle mirrors bands, hubs, hamming and the recursive "
    "closure verbatim.",
    tags=("llm", "dedup", "scale-path"),
)
def q_dedup_simhash_clusters(spark, t):
    docs = t["documents"]
    pairs = dedup.simhash_hub_pairs(dedup.simhash32(docs)).select(
        "doc_a", "doc_b"
    )
    labeled = dedup.dedup_survivors(docs, pairs, oriented_distinct=True).select(
        "doc_id", F.col("survivor_doc_id").alias("comp_id")
    )
    clusters = labeled.groupBy("comp_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return clusters.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        (F.col("cluster_size") * F.count(F.lit(1))).alias("n_docs"),
    )


_RECALL_THRESHOLDS = (0.1, 0.2, 0.3, 0.4, 0.5)


@register(
    "dedup_lsh_recall_eval",
    oracle=f"""
    {SQL_SHINGLES},
    sizes AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT doc_a, doc_b,
             CAST(n_common AS DOUBLE)
               / (sa.n_shingles + sb.n_shingles - n_common) AS jaccard
      FROM common
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
    ),
    sig AS (SELECT doc_id, {_minhash_cols_sql()} FROM sh GROUP BY doc_id),
    bands AS (
      SELECT doc_id, band_id,
             CASE band_id
               WHEN 0 THEN concat(mh_0, '|', mh_1) WHEN 1 THEN concat(mh_2, '|', mh_3)
               WHEN 2 THEN concat(mh_4, '|', mh_5) ELSE concat(mh_6, '|', mh_7)
             END AS band_hash
      FROM sig, (SELECT unnest([0,1,2,3]) AS band_id)
    ),
    cand AS (
      SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
      FROM bands l JOIN bands r
        ON l.band_id = r.band_id AND l.band_hash = r.band_hash
       AND l.doc_id < r.doc_id
    ),
    flagged AS (
      SELECT t.jaccard, cand.doc_a IS NOT NULL AS hit
      FROM truth t LEFT JOIN cand USING (doc_a, doc_b)
    )
    SELECT th.threshold,
           count(*) FILTER (jaccard >= th.threshold) AS n_true_pairs,
           count(*) FILTER (jaccard >= th.threshold AND hit) AS n_lsh_pairs,
           CAST(count(*) FILTER (jaccard >= th.threshold AND hit) AS DOUBLE)
             / nullif(count(*) FILTER (jaccard >= th.threshold), 0) AS recall
    FROM flagged,
         (SELECT unnest([{', '.join(str(t) for t in _RECALL_THRESHOLDS)}])
            AS threshold) th
    GROUP BY th.threshold
    """,
    doc="The dedup parameter-tuning loop: measured recall of the b=4,r=2 "
    "MinHash banding against the EXACT all-pairs Jaccard ground truth, "
    "at thresholds 0.1–0.5 — the number the dedup_cluster_stats doc "
    "states analytically (collision probability 1−(1−s²)⁴), measured on "
    "the real corpus. n_lsh_pairs ≤ n_true_pairs by construction "
    "(verification never admits a non-true pair), so precision is 1 and "
    "recall is the whole story. EVAL-HARNESS SCOPE (like "
    "similarity_recall_eval / knn_label_accuracy): the ground-truth side "
    "is the all-shared-shingle baseline — tractable on a corpus SAMPLE, "
    "which is how production picks (bands, rows, threshold) before a "
    "full run; the operational path never computes it at corpus scale. "
    "Spark side: truth relation computed once with its Jaccard, LSH "
    "candidates left-joined as a hit flag, then ONE conditional "
    "aggregate over all thresholds unpivoted via stack — no per-"
    "threshold rescan.",
    tags=("llm", "dedup", "eval"),
)
def q_dedup_lsh_recall_eval(spark, t):
    docs = t["documents"]
    truth = dedup.jaccard_pairs(docs).select("doc_a", "doc_b", "jaccard")
    cand = (
        dedup.lsh_candidate_pairs(dedup.minhash_signatures(docs))
        .withColumn("_hit", F.lit(True))
    )
    flagged = truth.join(cand, ["doc_a", "doc_b"], "left").select(
        "jaccard", F.coalesce("_hit", F.lit(False)).alias("hit")
    )
    aggs = []
    for i, th in enumerate(_RECALL_THRESHOLDS):
        aggs.append(
            F.sum(F.when(F.col("jaccard") >= th, 1).otherwise(0)).alias(
                f"t{i}"
            )
        )
        aggs.append(
            F.sum(
                F.when((F.col("jaccard") >= th) & F.col("hit"), 1).otherwise(0)
            ).alias(f"h{i}")
        )
    wide = flagged.agg(*aggs)
    stack = ", ".join(
        f"CAST({th} AS DOUBLE), t{i}, h{i}"
        for i, th in enumerate(_RECALL_THRESHOLDS)
    )
    tall = wide.select(
        F.expr(
            f"stack({len(_RECALL_THRESHOLDS)}, {stack}) AS "
            "(threshold, n_true_pairs, n_lsh_pairs)"
        )
    )
    return tall.select(
        "threshold",
        "n_true_pairs",
        "n_lsh_pairs",
        (
            F.col("n_lsh_pairs").cast("double")
            / F.nullif(F.col("n_true_pairs"), F.lit(0))
        ).alias("recall"),
    )
