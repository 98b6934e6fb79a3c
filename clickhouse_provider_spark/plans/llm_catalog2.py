"""LLM-data-pipeline catalog, batch 2: corpus statistics (TF-IDF, corpus
frequency), boilerplate/repetition, benchmark decontamination, and the
end-to-end curation gate (BASELINE.json north star — no reference
counterpart; built Spark-first).

Oracle strategy follows llm_catalog.py: every score is exact integer
counting plus at most one double division or multiplication — operations
that are correctly rounded IEEE in both engines — so results hash-match
bit-for-bit. The one classically-logarithmic quantity (IDF) uses the
rational N/df form; see ``text.tfidf_top_terms`` for why that preserves
the ranking contract.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_provider_spark.operators import text
from clickhouse_provider_spark.plans.catalog import register
from clickhouse_provider_spark.plans.llm_catalog import SQL_SHINGLES, SQL_WORDS

SQL_TF = f"""
  WITH d AS (SELECT doc_id, {SQL_WORDS} AS words FROM documents),
  w AS (SELECT doc_id, unnest(words) AS term FROM d),
  tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY 1, 2)
"""


@register(
    "text_tfidf_top_terms",
    oracle=f"""
    {SQL_TF},
    dfreq AS (SELECT term, count(*) AS df_count FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, dfreq.df_count,
             CAST(tf.tf * n.n_docs AS DOUBLE) / dfreq.df_count AS score
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, df_count, score, rank FROM (
      SELECT doc_id, term, tf, df_count, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, term) AS rank
      FROM scored
    ) WHERE rank <= 3
    """,
    doc="Top-3 characteristic terms per document by tf·idf (rational "
    "N/df idf — cross-engine exact; same top-k membership as ln-idf "
    "under the (score, term) total order). Scale: two combiner-friendly "
    "groupBys + a term-keyed join + a bounded per-doc window; corpus "
    "size N via broadcast 1-row cross join, no driver action.",
    tags=("llm", "text"),
)
def q_text_tfidf_top_terms(spark, t):
    out = text.tfidf_top_terms(t["documents"], k=3)
    return out.withColumn("rank", F.col("rank").cast("long"))


@register(
    "text_ngram_repetition",
    oracle=f"""
    WITH d AS (SELECT doc_id, {SQL_WORDS} AS words FROM documents),
    g AS (
      SELECT doc_id,
             CASE WHEN len(words) >= 3
                  THEN [array_to_string(words[i:i+2], ' ')
                        for i in generate_series(1, len(words) - 2)]
                  ELSE [] END AS grams
      FROM d
    )
    SELECT doc_id, len(grams) AS n_ngrams,
           len(list_distinct(grams)) AS n_distinct,
           CASE WHEN len(grams) > 0
                THEN CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE)
                     / len(grams)
                ELSE 0.0 END AS repeated_frac
    FROM g
    """,
    doc="Within-document repetition (Gopher/C4 boilerplate signal): "
    "fraction of word 3-gram occurrences that are repeats. Pure per-row "
    "codegen — zero shuffles, scales with the scan.",
    tags=("llm", "text"),
)
def q_text_ngram_repetition(spark, t):
    return text.ngram_repetition(t["documents"], n=3)


@register(
    "text_contamination",
    oracle=f"""
    {SQL_SHINGLES},
    bench AS (SELECT DISTINCT shingle FROM sh JOIN documents USING (doc_id)
              WHERE source = 'src0'),
    corpus AS (SELECT sh.doc_id, sh.shingle FROM sh
               JOIN documents USING (doc_id) WHERE source <> 'src0'),
    tot AS (SELECT doc_id, count(*) AS n_shingles FROM corpus GROUP BY 1),
    ov AS (SELECT doc_id, count(*) AS n_overlap FROM corpus
           WHERE shingle IN (SELECT shingle FROM bench) GROUP BY 1)
    SELECT t.doc_id, t.n_shingles,
           coalesce(o.n_overlap, 0) AS n_overlap,
           CAST(coalesce(o.n_overlap, 0) AS DOUBLE) / t.n_shingles
             AS contamination
    FROM tot t LEFT JOIN ov o USING (doc_id)
    """,
    doc="Benchmark decontamination: per corpus doc (source<>'src0'), the "
    "fraction of its distinct word 3-grams appearing in any benchmark doc "
    "(source='src0'). Scale: the benchmark shingle set (eval suites) is "
    "tiny vs a 100 TB corpus → broadcast left-semi, so corpus shingles "
    "never shuffle; only the per-doc counts do.",
    tags=("llm", "text"),
)
def q_text_contamination(spark, t):
    docs = t["documents"]
    bench = docs.filter(F.col("source") == "src0")
    corpus = docs.filter(F.col("source") != "src0")
    return text.contamination(corpus, bench, n=3)


@register(
    "text_token_rarity",
    oracle=f"""
    {SQL_TF},
    corpus AS (SELECT term, CAST(sum(tf) AS BIGINT) AS corpus_freq
               FROM tf GROUP BY 1)
    SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
           CAST(sum(tf * corpus_freq) AS DOUBLE) / CAST(sum(tf) AS BIGINT)
             AS mean_corpus_freq,
           min(corpus_freq) AS min_freq
    FROM tf JOIN corpus USING (term)
    GROUP BY doc_id
    """,
    doc="Corpus-frequency scoring (UDF-free unigram-LM stand-in): mean and "
    "min corpus-wide frequency of each document's token occurrences — low "
    "mean ⇒ rare/noisy vocabulary, high ⇒ templated. Exact integer sums + "
    "one division (rule 3). Scale: groupBy(term) with map-side combine, "
    "then a term-keyed join over the (doc,term)-distinct tf relation — "
    "Zipf-head fan-out bounded by docs-per-term; AQE splits hot buckets.",
    tags=("llm", "text"),
)
def q_text_token_rarity(spark, t):
    return text.token_rarity(t["documents"])


@register(
    "corpus_curation",
    oracle="""
    WITH sig AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> ''))
               AS n_tokens,
             list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')
               AS toks,
             list_filter(string_split(trim(regexp_replace(lower(text),
               '[^a-z0-9]+', ' ', 'g')), ' '), w -> w <> '') AS words,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM documents
    ), scored AS (
      SELECT doc_id, n_tokens,
             CASE WHEN n_tokens > 0
                  THEN CAST(len(list_distinct(toks)) AS DOUBLE) / n_tokens
                  ELSE 0.0 END AS unique_ratio,
             CASE WHEN len(words) >= 3 THEN
               CAST(len(words) - 2 - len(list_distinct(
                 [array_to_string(words[i:i+2], ' ')
                  for i in generate_series(1, len(words) - 2)])) AS DOUBLE)
               / (len(words) - 2)
             ELSE 0.0 END AS repeated_frac,
             rn
      FROM sig
    )
    SELECT doc_id, n_tokens, unique_ratio, repeated_frac
    FROM scored
    WHERE rn = 1 AND n_tokens >= 25 AND unique_ratio >= 0.4
      AND repeated_frac <= 0.2
    """,
    doc="End-to-end curation gate: quality thresholds (≥25 tokens, "
    "unique-token ratio ≥0.4) ∧ boilerplate gate (3-gram repetition "
    "≤0.2) ∧ exact-dedup survivorship — all signals in ONE projection, "
    "survivorship as a window over md5(text), so the whole pipeline "
    "costs exactly one shuffle on a uniform key at any corpus size.",
    tags=("llm", "text", "dedup"),
)
def q_corpus_curation(spark, t):
    return text.curated_corpus(t["documents"])


# Multimodal ------------------------------------------------------------------


@register(
    "multimodal_feature_stats",
    # The mapInPandas feature extractor's integer outputs (byte count +
    # 16-bin high-nibble histogram) are exactly reproducible in SQL from
    # the blob's hex encoding: high nibble of byte i == hex char 2i. The
    # float entropy feature is exercised by tests/test_llm_ops.py, not
    # the oracle (log2 folds differ across engines).
    oracle="""
    WITH b AS (SELECT doc_id AS media_id, encode(text) AS blob FROM documents),
    n AS (SELECT media_id, CAST(octet_length(blob) AS BIGINT) AS n_bytes,
                 hex(blob) AS hx
          FROM b),
    nib AS (
      SELECT media_id,
             unnest(list_transform(range(CAST(n_bytes AS INT)),
                                   i -> substr(hx, 2*CAST(i AS INT)+1, 1))) AS c
      FROM n
    ),
    cnt AS (SELECT media_id, histogram(c) AS m FROM nib GROUP BY media_id)
    SELECT n.media_id, n.n_bytes,
           array_to_string(
             list_transform(range(16), b -> CAST(coalesce(
               cnt.m[substr('0123456789ABCDEF', CAST(b AS INT)+1, 1)][1], 0)
               AS BIGINT)), ',') AS histogram_csv
    FROM n LEFT JOIN cnt USING (media_id)
    """,
    doc="Multimodal binary-column features: documents adapted to the "
    "opaque-blob media table (operators/multimodal.py), byte count + "
    "16-bin byte histogram extracted via Arrow-batched mapInPandas "
    "(vectorized numpy per blob; the decode step is the injected decoder "
    "— identity here, PIL/codec in production). Scale: blobs move as "
    "Arrow chunks, never row-at-a-time; feature output is fixed-width so "
    "downstream ops prune the blob column immediately. The histogram is "
    "emitted CSV-serialized (histogram_csv): the official driver's "
    "canonicalizer cannot sort list cells, so top-level arrays are "
    "banned from oracle-checked entries (tests/test_catalog_guard.py).",
    tags=("llm", "multimodal"),
)
def q_multimodal_feature_stats(spark, t):
    from clickhouse_provider_spark.operators import multimodal

    media = multimodal.documents_as_media(t["documents"])
    return multimodal.extract_features(media).select(
        "media_id",
        "n_bytes",
        F.array_join(
            F.transform("histogram", lambda c: c.cast("string")), ","
        ).alias("histogram_csv"),
    )


@register(
    "similarity_pq_topk",
    # PQ twin of similarity_ivf_topk's oracle stance: seeded md5-ranked
    # codebooks (no k-means refinement in the oracle-checked form), min-L2
    # assignment written as dot(v,v) - 2*dot(v,c) + dot(c,c) in BOTH
    # engines (identical float-op order), ADC sum in fixed subspace order
    # p0+p1+...+p15 (never an unordered SUM over doubles). 16 subspaces x
    # 32 codewords, ADC top-50 window re-ranked by true cosine to top-10.
    oracle="""
    WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
               FROM embeddings),
    r AS (SELECT vec_id, e, md5('pq|' || CAST(vec_id AS VARCHAR)) AS _r FROM v),
    cw AS (
      SELECT row_number() OVER (ORDER BY _r) - 1 AS code, e
      FROM r ORDER BY _r LIMIT 32
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
    assigned AS (
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
             sum(CASE WHEN a.sub_id = 0 THEN p.pd END) AS p0,
             sum(CASE WHEN a.sub_id = 1 THEN p.pd END) AS p1,
             sum(CASE WHEN a.sub_id = 2 THEN p.pd END) AS p2,
             sum(CASE WHEN a.sub_id = 3 THEN p.pd END) AS p3,
             sum(CASE WHEN a.sub_id = 4 THEN p.pd END) AS p4,
             sum(CASE WHEN a.sub_id = 5 THEN p.pd END) AS p5,
             sum(CASE WHEN a.sub_id = 6 THEN p.pd END) AS p6,
             sum(CASE WHEN a.sub_id = 7 THEN p.pd END) AS p7,
             sum(CASE WHEN a.sub_id = 8 THEN p.pd END) AS p8,
             sum(CASE WHEN a.sub_id = 9 THEN p.pd END) AS p9,
             sum(CASE WHEN a.sub_id = 10 THEN p.pd END) AS p10,
             sum(CASE WHEN a.sub_id = 11 THEN p.pd END) AS p11,
             sum(CASE WHEN a.sub_id = 12 THEN p.pd END) AS p12,
             sum(CASE WHEN a.sub_id = 13 THEN p.pd END) AS p13,
             sum(CASE WHEN a.sub_id = 14 THEN p.pd END) AS p14,
             sum(CASE WHEN a.sub_id = 15 THEN p.pd END) AS p15
      FROM assigned a JOIN partials p ON a.sub_id = p.sub_id AND a.code = p.code
      GROUP BY a.vec_id
    ),
    top AS (
      SELECT vec_id, (p0 + p1 + p2 + p3 + p4 + p5 + p6 + p7 + p8 + p9 + p10 + p11 + p12 + p13 + p14 + p15) AS approx_dot
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
    doc="Product-quantization ANN top-k (similarity.pq_topk): 16 subspaces "
    "x 32 seeded codewords; candidates are scanned as 16 small ints per "
    "vector (16x memory compression vs raw floats, 26x with 5-bit "
    "packing) and scored by ADC — per-subspace dot(query_slice, codeword) "
    "lookups in a broadcast 512-row table, summed in fixed order — then "
    "the ADC top-50 window re-ranked by TRUE cosine to the final 10 "
    "(recall dial; true top-10 fully inside the window on this corpus). "
    "The memory-compression half of FAISS-style IVF-PQ (compose with "
    "ivf_assignments for the partition-pruning half). Encode stage: "
    "Arrow-batched vectorized numpy (pq_encode_arrow — dense per-row "
    "linear algebra over a tiny broadcast constant, the deliberate "
    "Python exception; 1.6x the relational join form at bench scale), "
    "row-identical to the join encoder and the SQL oracle by unrolled "
    "left-to-right float folds.",
    tags=("llm", "similarity"),
)
def q_similarity_pq_topk(spark, t):
    from clickhouse_provider_spark.operators import similarity

    return similarity.pq_topk(t["embeddings"], query_vec_id=0, k=10)
