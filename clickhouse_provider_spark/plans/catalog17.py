"""Round-11 batch 17: composed IVF-PQ ANN and SemDeDup-style semantic
deduplication — the two remaining "standard shapes" of the LLM-curation
vector surface.

- ``similarity_ivfpq_adc``: the FULL FAISS-style composition (coarse cell
  pruning feeding the PQ/ADC compressed scan feeding an exact rerank).
  Until now the repo oracle-checked the two halves separately
  (``similarity_ivf_topk``, ``similarity_pq_topk``) and covered the
  composition only by a rows-only pytest
  (tests/test_llm_ops.py::test_ivfpq_index_layout_and_query); this entry
  makes the composed plan oracle-green.
- ``semantic_dedup_prune``: embedding-space near-duplicate pruning
  (SemDeDup, Abbas et al. 2023 shape): cluster, then within-cluster
  cosine >= tau marks duplicates, keep-first by id. The text-side dedup
  family (MinHash/SimHash/ExactSubstr) judges SURFACE overlap; this is
  the SEMANTIC member of the family the curation stack was missing as an
  oracle-checked entry.

No reference counterpart for either (the reference has no vector surface
— SURVEY.md §2D); LLM-training-data layer, per the build brief.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_provider_spark.operators import similarity
from clickhouse_provider_spark.plans.catalog import register
from clickhouse_provider_spark.plans.llm_catalog import _cos_sql

_SEM_THR = 0.35  # within-cell near-dup threshold (see entry doc)

_ADC_SUM = " + ".join(f"p{s}" for s in range(16))
_ADC_CASES = ",\n             ".join(
    f"sum(CASE WHEN a.sub_id = {s} THEN p.pd END) AS p{s}" for s in range(16)
)


@register(
    "similarity_ivfpq_adc",
    # Oracle stance = the union of similarity_ivf_topk's and
    # similarity_pq_topk's: seeded md5-ranked centroids ('ivf|') and
    # codebooks ('pq|') with ZERO Lloyd rounds, min-L2 code assignment
    # written as (v·v - 2·v·c) + c·c in both engines, ADC summed in fixed
    # subspace order p0+p1+...+p15. The candidate restriction (probed
    # cells only) is applied on the ADC score relation — per-vector codes
    # are independent, so restricting the scan (what the Spark plan does)
    # and restricting the scored set (what SQL expresses most readably)
    # are value-identical.
    oracle=f"""
    WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
               FROM embeddings),
    ri AS (SELECT vec_id, e, md5('ivf|' || CAST(vec_id AS VARCHAR)) AS _r FROM v),
    cents AS (
      SELECT row_number() OVER (ORDER BY _r) - 1 AS cell_id, e AS centroid
      FROM ri ORDER BY _r LIMIT 8
    ),
    cell_assign AS (
      SELECT vec_id, cell_id FROM (
        SELECT v.vec_id, c.cell_id,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY {_cos_sql('v.e', 'c.centroid')} DESC, c.cell_id
               ) AS rn
        FROM v CROSS JOIN cents c
      ) WHERE rn = 1
    ),
    q0 AS (SELECT e AS qv FROM v WHERE vec_id = 0),
    probes AS (
      SELECT c.cell_id FROM cents c, q0
      ORDER BY {_cos_sql('q0.qv', 'c.centroid')} DESC, c.cell_id LIMIT 2
    ),
    cand AS (SELECT vec_id FROM cell_assign JOIN probes USING (cell_id)),
    rp AS (SELECT vec_id, e, md5('pq|' || CAST(vec_id AS VARCHAR)) AS _r FROM v),
    cw AS (
      SELECT row_number() OVER (ORDER BY _r) - 1 AS code, e
      FROM rp ORDER BY _r LIMIT 32
    ),
    subs AS (SELECT unnest(range(16)) AS sub_id),
    cbs AS (
      SELECT s.sub_id, c.code,
             list_slice(c.e, s.sub_id * 4 + 1, (s.sub_id + 1) * 4) AS cwv
      FROM cw c CROSS JOIN subs s
    ),
    vs AS (
      SELECT vec_id, s.sub_id,
             list_slice(e, s.sub_id * 4 + 1, (s.sub_id + 1) * 4) AS sv
      FROM v CROSS JOIN subs s
    ),
    code_assign AS (
      SELECT vec_id, sub_id, code FROM (
        SELECT vs.vec_id, vs.sub_id, cbs.code,
               row_number() OVER (
                 PARTITION BY vs.vec_id, vs.sub_id
                 ORDER BY (list_dot_product(vs.sv, vs.sv)
                           - 2 * list_dot_product(vs.sv, cbs.cwv)
                           + list_dot_product(cbs.cwv, cbs.cwv)) ASC, cbs.code
               ) AS rn
        FROM vs JOIN cbs ON vs.sub_id = cbs.sub_id
      ) WHERE rn = 1
    ),
    q AS (SELECT sub_id, sv AS qv FROM vs WHERE vec_id = 0),
    partials AS (
      SELECT cbs.sub_id, cbs.code, list_dot_product(q.qv, cbs.cwv) AS pd
      FROM cbs JOIN q ON cbs.sub_id = q.sub_id
    ),
    scores AS (
      SELECT a.vec_id,
             {_ADC_CASES}
      FROM code_assign a JOIN partials p
        ON a.sub_id = p.sub_id AND a.code = p.code
      WHERE a.vec_id IN (SELECT vec_id FROM cand)
      GROUP BY a.vec_id
    ),
    top AS (
      SELECT vec_id, ({_ADC_SUM}) AS approx_dot
      FROM scores WHERE vec_id <> 0
      ORDER BY approx_dot DESC, vec_id LIMIT 50
    ),
    qq AS (SELECT e AS qfull FROM v WHERE vec_id = 0)
    SELECT t.vec_id, t.approx_dot,
           list_dot_product(v.e, qq.qfull)
             / (sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(qq.qfull, qq.qfull)))
             AS cos_sim
    FROM top t JOIN v USING (vec_id) CROSS JOIN qq
    ORDER BY cos_sim DESC, t.vec_id LIMIT 10
    """,
    doc="Composed FAISS-style IVF-PQ ANN top-k "
    "(similarity.ivfpq_topk): coarse IVF cells prune the corpus to the "
    "query's 2 best of 8 partitions, the survivors are ADC-scored from "
    "16 small-int PQ codes against a broadcast 512-row partial-dot "
    "table (16x scan compression — codes, never floats), and the ADC "
    "top-50 window is re-ranked by TRUE cosine to the final 10. At "
    "100 TB: nprobe/n_cells of the corpus scanned at 16x compression "
    "with exactly 50 full vectors touched — the standard billion-scale "
    "ANN shape; the materialized-index twin is "
    "similarity.ivfpq_write_index/ivfpq_query_index (partition-pruned "
    "parquet layout, pinned by tests/test_llm_ops.py). Seeded 0-Lloyd "
    "centroids/codebooks keep the oracle bit-exact; Lloyd refinement is "
    "the same plan with iters>0.",
    tags=("llm", "similarity"),
)
def q_similarity_ivfpq_adc(spark, t):
    return similarity.ivfpq_topk(
        t["embeddings"], query_vec_id=0, k=10, rerank=50,
        n_cells=8, nprobe=2, iters=0,
    )


@register(
    "semantic_dedup_prune",
    oracle=f"""
    WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
               FROM embeddings),
    ri AS (SELECT vec_id, e, md5('ivf|' || CAST(vec_id AS VARCHAR)) AS _r FROM v),
    cents AS (
      SELECT row_number() OVER (ORDER BY _r) - 1 AS cell_id, e AS centroid
      FROM ri ORDER BY _r LIMIT 8
    ),
    assigned AS (
      SELECT vec_id, e, cell_id, cc AS cos_to_centroid FROM (
        SELECT v.vec_id, v.e, c.cell_id,
               {_cos_sql('v.e', 'c.centroid')} AS cc,
               row_number() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY {_cos_sql('v.e', 'c.centroid')} DESC, c.cell_id
               ) AS rn
        FROM v CROSS JOIN cents c
      ) WHERE rn = 1
    ),
    dropped AS (
      SELECT DISTINCT b.vec_id
      FROM assigned a JOIN assigned b
        ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
      WHERE {_cos_sql('a.e', 'b.e')} >= {_SEM_THR}
    )
    SELECT CAST(a.cell_id AS BIGINT) AS cell_id,
           count(*) AS n_docs,
           count(*) FILTER (a.vec_id IN (SELECT vec_id FROM dropped))
             AS n_dropped,
           count(*) FILTER (a.vec_id NOT IN (SELECT vec_id FROM dropped))
             AS n_kept,
           min(a.cos_to_centroid) AS min_cos_to_centroid,
           max(a.cos_to_centroid) AS max_cos_to_centroid
    FROM assigned a
    GROUP BY a.cell_id
    """,
    doc="SemDeDup-style semantic dedup (similarity.semantic_dedup): "
    "cluster by embedding (8 seeded coarse cells — n_cells scales with "
    "corpus so per-cell cardinality stays fixed), within each cell drop "
    f"any doc whose cosine to a lower-id cell-mate is >= {_SEM_THR} "
    "(deterministic keep-first). Pair space shrinks from O(n^2) to "
    "sum(|cell|^2); the within-cell self-join shuffles each vector once "
    "on cell_id, and a hot cell auto-engages the exact triangle salt "
    "(round 13: skew_salt derived from the hottest cell's population vs "
    "a 3M-pairs-per-task budget — decisions identical, straggler split). "
    "Output: per-cell doc/dropped/kept counts (exact "
    "integers) + min/max cosine-to-centroid (order-independent extremes "
    "of bit-identical floats). Catches paraphrase-level duplicates the "
    "surface family (MinHash/SimHash/ExactSubstr) cannot see; "
    "cross-cell near-dups are the documented recall trade.",
    tags=("llm", "dedup", "similarity"),
)
def q_semantic_dedup_prune(spark, t):
    sd = similarity.semantic_dedup(
        t["embeddings"], threshold=_SEM_THR, n_cells=8, iters=0
    )
    return sd.groupBy(F.col("cell_id").cast("long").alias("cell_id")).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("is_dropped").cast("long")).alias("n_dropped"),
        F.sum((~F.col("is_dropped")).cast("long")).alias("n_kept"),
        F.min("cos_to_centroid").alias("min_cos_to_centroid"),
        F.max("cos_to_centroid").alias("max_cos_to_centroid"),
    )


@register(
    "sequence_packing_bins",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS cum
      FROM d
    ),
    p AS (
      SELECT doc_id, n_tokens,
             (cum - n_tokens) // 512 AS bin_id,
             (n_tokens > 0 AND (cum - 1) // 512 <> (cum - n_tokens) // 512)
               AS is_straddler
      FROM c
    )
    SELECT CAST(bin_id AS BIGINT) AS bin_id,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
           CAST(sum(CASE WHEN is_straddler THEN 1 ELSE 0 END) AS BIGINT)
             AS n_straddlers,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM p
    GROUP BY bin_id
    """,
    doc="Training-sequence packing audit (text.pack_sequences): concat "
    "the corpus in doc_id order and cut every 512 tokens; each doc "
    "belongs to the bin where its first token lands, and docs whose "
    "last token crosses the boundary are straddlers (the split-document "
    "rate of the packed training layout — the dial a packing budget is "
    "tuned against). Exact integer arithmetic on regexp token counts; "
    "the global running offset is the two-level bucketed prefix sum "
    "(operators/ranking.bucketed_cumsum, <=4096 range buckets by "
    "construction from one metadata agg) — no unpartitioned window at "
    "any corpus size. Output: per-bin doc/token/straddler counts and "
    "id range. No reference counterpart; LLM-training-data layer.",
    tags=("llm", "text"),
)
def q_sequence_packing_bins(spark, t):
    from clickhouse_provider_spark.operators import text

    p = text.pack_sequences(t["documents"], budget=512)
    return p.groupBy("bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("tokens_total"),
        F.sum(F.col("is_straddler").cast("long")).alias("n_straddlers"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )
