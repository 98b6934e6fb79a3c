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
