"""Text-analysis operators over a document table — the LLM-training-data
capability layer (BASELINE.json north star; no reference counterpart).

All operators are pure JVM-side column expressions (regexp/split/aggregate)
— no Python UDFs in the hot path — so they whole-stage-codegen and scale
linearly with the scan. Determinism notes per function; ratios are exact
integer counts divided as doubles (catalog rule 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Stopword marker sets for the language-ID heuristic. Tiny on purpose: a
# real deployment swaps in per-language lists; the *operator shape* (token
# overlap scoring + deterministic argmax) is what scales.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "des"),
    "es": ("el", "la", "los", "las", "y", "es", "un", "una"),
}

TOKEN_RE = r"\S+"
# BPE-ish word/number/punctuation splitter (GPT-2-style coarse classes):
# word runs, digit runs, and single non-space punctuation.
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")


def tokens(col: F.Column) -> F.Column:
    """Whitespace tokens as an array (empty array for empty/blank text)."""
    return F.filter(F.split(col, r"\s+"), lambda x: x != "")


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token statistics: whitespace tokens and BPE-ish
    sub-tokens (regexp classes). Counting via regexp_count keeps the whole
    expression in codegen."""
    c = F.col(text_col)
    return df.select(
        "doc_id",
        F.length(c).alias("n_chars"),
        F.regexp_count(c, F.lit(TOKEN_RE)).alias("n_tokens"),
        F.regexp_count(c, F.lit(BPE_RE)).alias("n_bpe_tokens"),
        F.size(F.array_distinct(tokens(c))).alias("n_unique_tokens"),
    )


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality signals: length, mean token length, stopword
    ratio, unique-token ratio, non-alnum ratio. All exact-integer counts →
    double ratios, so cross-engine deterministic."""
    c = F.col(text_col)
    toks = tokens(c)
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    n_uniq = F.size(F.array_distinct(toks))
    n_alnum = F.regexp_count(c, F.lit(r"[A-Za-z0-9]"))
    n_nonspace = F.regexp_count(c, F.lit(r"\S"))
    n_chars = F.length(c)
    safe = lambda num, den: F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))  # noqa: E731
    return df.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tok.alias("n_tokens"),
        safe(n_nonspace, n_tok).alias("mean_token_len"),
        safe(n_stop, n_tok).alias("stopword_ratio"),
        safe(n_uniq, n_tok).alias("unique_ratio"),
        safe(n_chars - n_alnum, n_chars).alias("non_alnum_ratio"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """N-gram/stopword language-ID heuristic: score = count of language
    marker tokens; deterministic argmax (ties broken by language code asc,
    zero-score → 'und'). Pure column expressions."""
    toks = tokens(F.col(text_col))
    scored = df.select(
        "doc_id",
        *[
            F.size(F.filter(toks, lambda x: x.isin(*marks))).alias(f"score_{lang}")
            for lang, marks in LANG_MARKERS.items()
        ],
    )
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier langs win ties → apply last
        pred = F.when((best > 0) & (F.col(f"score_{lang}") == best), lang).otherwise(pred)
    return scored.select("doc_id", *[f"score_{lang}" for lang in langs], pred.alias("pred_lang"))


def fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 over the normalized text (lowercase,
    non-alnum collapsed to single spaces, trimmed) — a content-defined key
    for exact-after-normalization dedup. (The rolling-hash variant for
    shingle fingerprinting lives in dedup.shingles.)"""
    c = F.col(text_col)
    norm = F.trim(F.regexp_replace(F.lower(c), r"[^a-z0-9]+", " "))
    return df.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        F.length(norm).alias("norm_len"),
    )


def term_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, term, tf) — normalized-word term counts per document.
    One explode + one combiner-friendly groupBy; the base relation for
    TF-IDF and corpus-frequency scoring."""
    from clickhouse_provider_spark.operators.dedup import normalized_words

    return (
        df.select("doc_id", F.explode(normalized_words(text_col)).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf_top_terms(df: DataFrame, k: int = 3, text_col: str = "text") -> DataFrame:
    """Top-k characteristic terms per document by tf·idf.

    IDF is the *rational* form N/df (not ln(N/df)): ln is the one operation
    whose low bits legitimately differ across engines, while ints and a
    single double division are exactly rounded everywhere — and within one
    document the ranking it induces differs from ln-idf only through the
    monotone map, so top-k membership ordered by (score, term) is
    identical. Scale: tf is explode+groupBy(doc,term); df is a second
    groupBy(term) over the (already small) tf relation; the tf⋈df join
    shuffles on term; the final top-k is a bounded per-doc window. No
    full-corpus collect — N arrives via a broadcast 1-row cross join.
    """
    tf = term_frequencies(df, text_col)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_count"))
    n_docs = df.groupBy().agg(F.count(F.lit(1)).alias("n_docs"))
    from pyspark.sql.window import Window as W

    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df_count",
            ((F.col("tf") * F.col("n_docs")).cast("double") / F.col("df_count")).alias("score"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def bm25_topk(
    df: DataFrame,
    query_terms: tuple[str, ...],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """Lexical retrieval: top-k documents for a fixed query term set under
    a BM25 scoring shape — the sparse twin of the similarity_* dense
    retrieval entries (hybrid RAG pipelines run both).

    Per-term score = idf · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl)) with
    the RATIONAL idf (N − df + 0.5)/(df + 0.5): like tfidf_top_terms, ln
    is the one op whose low bits may differ across engines, so the
    portable form drops it (monotone PER TERM; a production deployment
    swaps ln back in — the plan is identical). CAVEAT (ADVICE r10):
    per-term monotonicity does NOT survive the cross-term SUM — rare
    terms carry exp(idf)-scale weight here vs linear under ln, so
    MULTI-term orderings can differ from true ln-idf BM25; treat this
    ranking as "BM25-shaped, rational-idf", not a drop-in BM25 scorer. Per-doc scores fold in
    lexicographic term order (array_sort + aggregate), so the double sum
    is reproducible and oracle-exact.

    Scale: the postings relation is FILTERED to the |Q| query terms
    before any shuffle (an IN over a literal set, pushed into the scan);
    df/N/avgdl are 1-row or |Q|-row broadcast frames; the final top-k is
    a TakeOrdered over per-doc scores — no global sort, no full-corpus
    postings shuffle. Round 14 (guide §1.2-1, §2.4): ONE tokenize pass —
    the corpus is projected once to (doc_id, dl, query-term hits) and
    localCheckpointed (tiny rows: two longs + ≤|Q| short strings), so
    the old second tokenize scan for the doc-length relation AND its
    full-corpus doc_id join back onto the postings (an SMJ shuffle of
    every doc's length at scale) are gone; dl rides through the explode.

    ASSUMES ``doc_id`` is unique in ``df`` (ADVICE r14): dl is carried
    through the (doc_id, term) aggregate with ``F.min("dl")``, which is
    constant-per-group precisely because one doc_id has one length. A
    corpus with duplicate doc_ids would silently score the merged tf
    against the shortest duplicate's dl, where the old doc-length join
    emitted one score row per duplicate — dedup first (dedup_exact /
    replacing_dedup) if doc_id may repeat.
    """
    from clickhouse_provider_spark.operators.dedup import normalized_words

    if not query_terms:
        # F.col().isin() with zero args raises from py4j; an empty query
        # has a well-defined answer (no term hits → no scored docs)
        return df.sparkSession.createDataFrame(
            [], "doc_id long, n_terms_hit long, score double"
        )
    words = normalized_words(text_col)
    # size() and filter() share the words subexpression inside one
    # codegen stage — the text is normalized/split once per row
    base = df.select(
        "doc_id",
        F.size(words).alias("dl"),
        F.filter(words, lambda x: x.isin(*query_terms)).alias("hits"),
    ).localCheckpoint(eager=True)
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        base.select("doc_id", "dl", F.explode("hits").alias("term"))
        .groupBy("doc_id", "term")
        # min(dl) is a constant-per-group carry, not an aggregation:
        # doc_id is unique in the corpus (docstring contract), so every
        # row of the group holds the same dl
        .agg(F.count(F.lit(1)).alias("tf"), F.min("dl").alias("dl"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_count"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "term",
            (
                ((F.col("n_docs") - F.col("df_count") + F.lit(0.5))
                 / (F.col("df_count") + F.lit(0.5)))
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.col("avgdl")
                    )
                )
            ).alias("term_score"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_terms_hit"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("term", "term_score"))),
            F.lit(0.0),
            lambda acc, x: acc + x["term_score"],
        ).alias("score"),
    )
    return (
        per_doc.orderBy(F.col("score").desc(), "doc_id")
        .limit(k)
        .select("doc_id", "n_terms_hit", "score")
    )


def ngram_repetition(df: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """Within-document repetition: fraction of word n-gram occurrences that
    are repeats (the Gopher/C4-style boilerplate signal). Pure per-row
    column expressions — zero shuffles, scales with the scan."""
    from clickhouse_provider_spark.operators.dedup import normalized_words

    words = normalized_words(text_col)
    grams = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_total = F.size(grams)
    n_distinct = F.size(F.array_distinct(grams))
    return df.select(
        "doc_id",
        n_total.alias("n_ngrams"),
        n_distinct.alias("n_distinct"),
        F.when(n_total > 0, (n_total - n_distinct).cast("double") / n_total)
        .otherwise(F.lit(0.0))
        .alias("repeated_frac"),
    )


def contamination(df: DataFrame, benchmark: DataFrame, n: int = 3) -> DataFrame:
    """Benchmark-contamination check: per corpus document, the fraction of
    its distinct word n-grams that also appear in *any* benchmark document
    (the n-gram-overlap decontamination test used for eval-set leakage).

    Scale: the benchmark side (eval sets) is tiny relative to a 100 TB
    corpus — its distinct-shingle set is broadcast, so the corpus scan is
    joined map-side with no shuffle of corpus shingles; the only shuffle is
    the per-doc count aggregation. Documents shorter than n words have no
    shingles and are absent from the result (no 0/0 rows).
    """
    from clickhouse_provider_spark.operators.dedup import shingles

    corpus_sh = shingles(df, n)
    bench_sh = shingles(benchmark, n).select("shingle").distinct()
    totals = corpus_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    overlap = (
        corpus_sh.join(F.broadcast(bench_sh), "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        totals.join(overlap, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce(F.col("n_overlap"), F.lit(0)).alias("n_overlap"),
            (
                F.coalesce(F.col("n_overlap"), F.lit(0)).cast("double") / F.col("n_shingles")
            ).alias("contamination"),
        )
    )


def token_rarity(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-frequency document scoring: per document, the mean and min
    corpus-wide frequency of its token occurrences. Low mean ⇒ rare/noisy
    vocabulary; high mean ⇒ common/templated text — the UDF-free stand-in
    for unigram-LM perplexity (avg log-prob needs ln; sum/min of exact
    integer counts + one final division is bit-stable across engines).

    Scale: corpus counts = one groupBy(term) over the tf relation (combiner
    collapses per-partition duplicates); the occurrence⋈counts join
    shuffles on term — at Zipfian skew the head terms are hot keys, but the
    tf relation is (doc,term)-distinct so the fan-out is bounded by
    docs-containing-term, and AQE skew-join splits the heavy buckets.
    """
    tf = term_frequencies(df, text_col)
    corpus = tf.groupBy("term").agg(F.sum("tf").alias("corpus_freq"))
    return (
        tf.join(corpus, "term")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("corpus_freq")).alias("sum_freq"),
            F.min("corpus_freq").alias("min_freq"),
        )
        .select(
            "doc_id",
            "n_tokens",
            (F.col("sum_freq").cast("double") / F.col("n_tokens")).alias("mean_corpus_freq"),
            "min_freq",
        )
    )


def curated_corpus(
    df: DataFrame,
    min_tokens: int = 25,
    min_unique_ratio: float = 0.4,
    max_repeated_frac: float = 0.2,
    text_col: str = "text",
) -> DataFrame:
    """The end-to-end curation gate a training-data pipeline runs last:
    quality thresholds (length, vocabulary diversity) ∧ boilerplate gate
    (3-gram repetition) ∧ exact-dedup survivorship, in ONE pass.

    All per-document signals are computed in a single projection over the
    scan, and survivorship is a row_number window over md5(text) rather
    than a groupBy+join back — so the whole operator costs exactly one
    shuffle (on the uniform 128-bit content hash) at any corpus size.
    Thresholds compare exact-integer-ratio doubles, so the kept set is
    bit-stable across engines.
    """
    c = F.col(text_col)
    toks = tokens(c)
    n_tok = F.size(toks)
    words = F.filter(
        F.split(F.trim(F.regexp_replace(F.lower(c), r"[^a-z0-9]+", " ")), " "),
        lambda x: x != "",
    )
    grams = F.when(
        F.size(words) >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - 3),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, 3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_g = F.size(grams)
    from pyspark.sql.window import Window as W

    sig = df.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.when(n_tok > 0, F.size(F.array_distinct(toks)).cast("double") / n_tok)
        .otherwise(F.lit(0.0))
        .alias("unique_ratio"),
        F.when(n_g > 0, (n_g - F.size(F.array_distinct(grams))).cast("double") / n_g)
        .otherwise(F.lit(0.0))
        .alias("repeated_frac"),
        F.md5(c).alias("text_hash"),
    )
    rn = F.row_number().over(W.partitionBy("text_hash").orderBy("doc_id"))
    return (
        sig.withColumn("rn", rn)
        .filter(
            (F.col("rn") == 1)
            & (F.col("n_tokens") >= min_tokens)
            & (F.col("unique_ratio") >= min_unique_ratio)
            & (F.col("repeated_frac") <= max_repeated_frac)
        )
        .select("doc_id", "n_tokens", "unique_ratio", "repeated_frac")
    )


def lang_id_sql_scores(langs: dict[str, tuple[str, ...]] = LANG_MARKERS) -> str:
    """DuckDB oracle fragment builder for lang_id (kept beside the operator
    so both sides evolve together)."""
    parts = []
    for lang, marks in sorted(langs.items()):
        in_list = ", ".join(f"'{m}'" for m in marks)
        parts.append(
            f"len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x IN ({in_list}))) AS score_{lang}"
        )
    return ", ".join(parts)


def pack_sequences(
    docs: DataFrame,
    budget: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Training-sequence packing (round 11): assign documents, in id
    order, to contiguous fixed-token-budget bins — the "concatenate the
    corpus and cut every ``budget`` tokens" layout LLM training runs use
    to build packed sequences. A document belongs to the bin where its
    FIRST token lands (``bin_id = start_offset div budget``); a document
    whose last token crosses the next boundary is flagged a straddler
    (the share of straddlers is the packing-quality signal: high
    straddle ratio at a given budget means many docs get split across
    training sequences).

    Determinism: pure integer arithmetic on exact token counts
    (regexp_count of '\\S+', the same TOKEN_RE every token-stats entry
    uses) over the total doc_id order — both engines agree bit-for-bit.

    Scale: the global running offset is the two-level bucketed prefix
    sum (operators/ranking.bucketed_cumsum), NOT an unpartitioned
    window — the doc_id range is split into ≤4096 equal-width buckets
    (width from one bounded metadata agg), so the offsets relation the
    middle stage windows over is ≤4096 rows BY CONSTRUCTION at any
    corpus size, and every other stage is parallel across buckets.

    Returns one row per document: (doc_id, n_tokens, start_offset,
    bin_id, is_straddler).
    """
    d = docs.select(
        F.col(id_col),
        F.regexp_count(F.col(text_col), F.lit(TOKEN_RE))
        .cast("long")
        .alias("n_tokens"),
    )
    # bounded metadata: two scalars fix the bucket width so the bucket
    # count is ≤4096 regardless of the doc_id span (the bucketed_cumsum
    # broadcast contract). This one eager action is unavoidable plan
    # input (the bucket expression needs the span); on an EMPTY relation
    # min/max are NULL — short-circuit to the empty result instead of
    # crashing on int(None) (ADVICE r11)
    lo, hi = docs.agg(F.min(id_col), F.max(id_col)).first()
    if lo is None or hi is None:
        return d.select(
            id_col,
            "n_tokens",
            F.lit(None).cast("long").alias("start_offset"),
            F.lit(None).cast("long").alias("bin_id"),
            F.lit(None).cast("boolean").alias("is_straddler"),
        ).limit(0)
    width = max(1, (int(hi) - int(lo) + 1 + 4095) // 4096)
    from clickhouse_provider_spark.operators.ranking import bucketed_cumsum

    c = bucketed_cumsum(
        d,
        id_col,
        "n_tokens",
        bucket=F.floor((F.col(id_col) - F.lit(int(lo))) / F.lit(width)),
        out_col="cum",
    )
    start = (F.col("cum") - F.col("n_tokens")).alias("start_offset")
    return c.select(
        F.col(id_col),
        "n_tokens",
        start,
        F.expr(f"(cum - n_tokens) div {int(budget)}").alias("bin_id"),
        (
            (F.col("n_tokens") > 0)
            & (
                F.expr(f"(cum - 1) div {int(budget)}")
                != F.expr(f"(cum - n_tokens) div {int(budget)}")
            )
        ).alias("is_straddler"),
    )
