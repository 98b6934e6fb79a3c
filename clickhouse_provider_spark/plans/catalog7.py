"""Catalog batch 7: ordered-sequence analytics (ClickHouse
``sequenceMatch``/``sequenceCount``/``argMax`` behavioral parity — the
remaining members of the event-analytics family the reference's serving DB
offers over the produced tables, alongside windowFunnel/retention in
catalog6), plus LLM-pipeline storage/scrubbing operators (int8 embedding
quantization, binary frame sampling, PII redaction).

Oracle strategy (same rules as the earlier batches):

- The sequence entries share the exact tag-string construction with the
  oracle (string_agg ORDER BY (ts, tag) == array_sort of (ts, tag)
  structs) and regex over the SAME pattern subset — character classes,
  ``.*``, literals — where java.util.regex and RE2 agree; matches and
  non-overlapping greedy counts are value-identical.
- ``argmax_latest_event``'s comparator is a struct compared
  field-lexicographically in BOTH engines (Spark struct ordering, DuckDB
  struct_pack ordering) — a total order including the payload, so ties on
  the timestamp cannot produce engine-dependent rows. The testdata has
  duplicate-free (user_id, ts) at every SF, but correctness does not rely
  on it.
- ``embedding_quantize_int8`` writes rounding as ``floor(x*127/scale+0.5)``
  — one parse, identical IEEE evaluation order both sides; code summaries
  are integer-exact.
- ``multimodal_frame_sample`` is graded via the blob's hex encoding
  (byte i == hex chars 2i,2i+1) — Spark slices the BINARY directly,
  DuckDB slices the hex string: independent formulations, equal bytes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_provider_spark.operators import multimodal, similarity
from clickhouse_provider_spark.operators.sequence import (
    argmax_by_key,
    event_tag_strings,
    sequence_count,
    sequence_match,
)
from clickhouse_provider_spark.plans.catalog import register, ts_us

#: view → click → purchase as a subsequence (tags are event_type initials:
#: c=click, v=view, p=purchase, e=error, s=signup — distinct in testdata).
_SEQ_PATTERN = "v.*c.*p"
#: click …no-purchase… purchase — non-overlapping left-to-right chains.
_CHAIN_PATTERN = "c[^p]*p"

_SQL_SEQ = """
    WITH s AS (
      SELECT user_id,
             string_agg(substr(event_type, 1, 1), ''
                        ORDER BY epoch_us(ts), substr(event_type, 1, 1)) AS seq
      FROM events GROUP BY user_id
    )
"""


@register(
    "seq_match_user_paths",
    oracle=f"""
    {_SQL_SEQ}
    SELECT user_id, seq,
           regexp_matches(seq, '{_SEQ_PATTERN}') AS seq_matched,
           CAST(len(regexp_extract_all(seq, '{_CHAIN_PATTERN}')) AS BIGINT)
             AS chain_count
    FROM s
    """,
    doc="ClickHouse sequenceMatch + sequenceCount over each user's "
    "time-ordered event stream: did view→click→purchase happen in order "
    "(subsequence regex on the per-user tag string), and how many "
    "non-overlapping click→purchase chains completed. operators/sequence "
    "— one combiner-friendly shuffle on user_id, regex JVM-side; per-key "
    "state is O(events-per-key), the same bound ClickHouse's sequence "
    "buffer has (pre-filter to participating event kinds to shrink it).",
    tags=("analytics", "sequence"),
)
def q_seq_match_user_paths(spark, t):
    e = t["events"].select("user_id", ts_us().alias("ts_us"), "event_type")
    seqs = event_tag_strings(e, key="user_id", ts="ts_us", tag="event_type")
    return sequence_count(sequence_match(seqs, _SEQ_PATTERN), _CHAIN_PATTERN)


@register(
    "argmax_latest_event",
    oracle="""
    WITH m AS (
      SELECT user_id,
             max(struct_pack(a := epoch_us(ts), b := event_type, c := value))
               AS mx,
             min(struct_pack(a := epoch_us(ts), b := event_type, c := value))
               AS mn
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           mx.a AS last_ts_us, mx.b AS last_event_type, mx.c AS last_value,
           mn.a AS first_ts_us, mn.b AS first_event_type, mn.c AS first_value
    FROM m
    """,
    doc="ClickHouse argMax/argMin: per user, the event-type and value "
    "carried by the latest (and earliest) event. operators/sequence."
    "argmax_by_key — max(struct(ts, type, value)): field-lexicographic "
    "struct comparison is a TOTAL order (deterministic under ts ties, "
    "where ClickHouse argMax is 'any'), and the aggregate is partial — "
    "combiners reduce each partition to one struct per key before the "
    "single shuffle. No window, no self-join.",
    tags=("analytics", "sequence"),
)
def q_argmax_latest_event(spark, t):
    e = t["events"].select(
        "user_id", ts_us().alias("ts_us"), "event_type", "value"
    )
    return argmax_by_key(
        e, key="user_id", order_cols=["ts_us", "event_type", "value"]
    ).select(
        "user_id",
        F.col("last_ts_us"),
        F.col("last_event_type"),
        F.col("last_value"),
        F.col("first_ts_us"),
        F.col("first_event_type"),
        F.col("first_value"),
    )


@register(
    "embedding_quantize_int8",
    oracle="""
    WITH v AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
               FROM embeddings),
    s AS (SELECT vec_id, e,
                 list_max(list_transform(e, x -> abs(x))) AS scale
          FROM v),
    c AS (SELECT vec_id, scale,
                 list_transform(e, x -> CAST(CASE WHEN scale > 0
                     THEN floor(x * 127.0 / scale + 0.5)
                     ELSE 0 END AS BIGINT)) AS codes
          FROM s)
    SELECT vec_id, scale,
           CAST(list_sum(codes) AS BIGINT) AS code_sum,
           list_min(codes) AS code_min,
           list_max(codes) AS code_max,
           array_to_string(codes, ',') AS codes_csv
    FROM c
    """,
    doc="Symmetric per-vector int8 quantization (similarity.quantize_int8) "
    "— the embedding storage/bandwidth path at corpus scale: 4x smaller "
    "than float32, codes feed ADC/dot kernels directly. floor(x*127/scale"
    "+0.5) is the identical IEEE expression in both engines; summaries "
    "are integer-exact. Map-only codegen over the scan — zero shuffles. "
    "The code vector is emitted CSV-serialized (codes_csv): the official "
    "driver canonicalizes results with a raw-column pandas sort, which "
    "cannot order list cells — top-level arrays are banned from "
    "oracle-checked entries (tests/test_catalog_guard.py).",
    tags=("llm", "similarity"),
)
def q_embedding_quantize_int8(spark, t):
    q = similarity.quantize_int8(t["embeddings"])
    return q.select(
        "vec_id",
        "scale",
        "code_sum",
        "code_min",
        "code_max",
        F.array_join(
            F.transform("codes", lambda c: c.cast("string")), ","
        ).alias("codes_csv"),
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH b AS (SELECT doc_id AS media_id, encode(text) AS blob FROM documents),
    n AS (SELECT media_id, hex(blob) AS hx,
                 CAST(octet_length(blob) AS BIGINT) AS nb
          FROM b),
    f AS (SELECT media_id, hx, nb,
                 unnest(generate_series(0, nb, 256)) AS frame_off
          FROM n)
    SELECT media_id, frame_off,
           CAST(least(64, nb - frame_off) AS BIGINT) AS frame_n_bytes,
           md5(substr(hx, CAST(2 * frame_off + 1 AS INT), 128)) AS frame_md5
    FROM f
    """,
    doc="Binary frame sampling over opaque media blobs (multimodal."
    "frame_slices): every 256th byte offset yields a 64-byte frame via "
    "JVM-side binary substr — the container-seek step of video/audio "
    "frame extraction, with the codec decode plugged in downstream "
    "(extract_features' injected decoder). Sequence+explode fan-out "
    "happens BEFORE any Python, so Arrow batches stay per-frame small; "
    "this entry is pure codegen, zero shuffles. Oracle slices the hex "
    "encoding instead of the blob — independent path, equal bytes.",
    tags=("llm", "multimodal"),
)
def q_multimodal_frame_sample(spark, t):
    media = multimodal.documents_as_media(t["documents"])
    return multimodal.frame_slices(media, stride=256, frame_bytes=64)


#: Shared regexes — the java.util.regex/RE2 common subset (character
#: classes, +, {m,}; no lookaround), so Spark and DuckDB agree exactly.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_NUM_RE = r"[0-9]+"


@register(
    "pii_scrub_props",
    oracle=f"""
    SELECT event_id,
           CAST(len(regexp_extract_all(props, '{_EMAIL_RE}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(props, '{_NUM_RE}')) AS BIGINT)
             AS n_numbers,
           regexp_replace(regexp_replace(props, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                          '{_NUM_RE}', '[NUM]', 'g') AS scrubbed
    FROM events
    """,
    doc="PII scrubbing for training-data curation: count and redact "
    "email-shaped and numeric tokens in the raw props payload "
    "(regexp_extract_all + chained global regexp_replace — patterns are "
    "from the java-regex/RE2 common subset, so the redacted text is "
    "byte-identical across engines). Map-only codegen over the scan: "
    "zero shuffles, scales with the read; at 100 TB the scrub runs as a "
    "projection inside the same stage as the parquet scan.",
    tags=("llm", "text"),
)
def q_pii_scrub_props(spark, t):
    return t["events"].select(
        "event_id",
        F.size(F.regexp_extract_all("props", F.lit(_EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("props", F.lit(_NUM_RE), F.lit(0)))
        .cast("long")
        .alias("n_numbers"),
        F.regexp_replace(
            F.regexp_replace("props", _EMAIL_RE, "[EMAIL]"), _NUM_RE, "[NUM]"
        ).alias("scrubbed"),
    )


@register(
    "bloom_runtime_semijoin",
    # The oracle is the PLAIN semi join: bloom false positives are
    # eliminated by the exact verify join, so the composed operator is
    # value-identical to IN (...) for any filter sizing — that equality
    # is precisely what this entry gates.
    oracle="""
    SELECT l_suppkey, count(*) AS n_items,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
    FROM lineitem
    WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
                        JOIN nation ON s_nationkey = n_nationkey
                        WHERE n_name = 'NATION_9')
    GROUP BY l_suppkey
    """,
    doc="Big-big semi join with an explicit runtime bloom filter "
    "(operators/runtime_filter.py): the dim keys fold into a few-KB md5 "
    "bitset (driver artifact, bounded by m_bits — not a data collect), "
    "the fact is pruned map-side INSIDE the scan stage, and the exact "
    "semi join runs on survivors only — at 100 TB the fact's shuffle is "
    "proportional to the match count, not the table size, which is what "
    "keeps non-broadcastable joins alive. ClickHouse's bloom skip "
    "indexes play this role on the reference's tables (reference "
    "README.md DDL); Spark's AQE row-level runtime filtering is the "
    "automatic form — this is the deterministic, caller-sized one.",
    tags=("analytics", "join"),
)
def q_bloom_runtime_semijoin(spark, t):
    from clickhouse_provider_spark.operators import runtime_filter
    from clickhouse_provider_spark.plans.catalog import D18_6, as_double, dec

    dim = (
        t["supplier"]
        .join(
            t["nation"].filter(F.col("n_name") == "NATION_9"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    picked = runtime_filter.bloom_semi_join(
        t["lineitem"], dim, "l_suppkey", "s_suppkey"
    )
    return picked.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        as_double(F.sum(dec("l_quantity", D18_6))).alias("sum_qty"),
    )


_DAY_US = 86_400_000_000


@register(
    "seq_match_timed",
    # Same composed-maxima recurrence spelled in SQL windows — the
    # carried quantity is the PREVIOUS step's timestamp, gated by each
    # step's own gap bound (ClickHouse (?1)(?t<=g1)(?2)(?t<=g2)(?3)).
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events
    ), s1 AS (
      SELECT *, max(CASE WHEN event_type = 'signup' THEN ts_us END) OVER w AS p1
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), s2 AS (
      SELECT *, max(CASE WHEN event_type = 'click'
                          AND ts_us - p1 <= {2 * _DAY_US} THEN ts_us END)
                  OVER w AS p2
      FROM s1 WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), s3 AS (
      SELECT *, max(CASE WHEN event_type = 'purchase'
                          AND ts_us - p2 <= {5 * _DAY_US} THEN ts_us END)
                  OVER w AS p3
      FROM s2 WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, max(p3) IS NOT NULL AS matched,
           max(p3) AS completed_ts_us
    FROM s3 GROUP BY user_id
    """,
    doc="ClickHouse sequenceMatch with TIME conditions — "
    "(?1)(?t<=2d)(?2)(?t<=5d)(?3): signup, then a click within 2 days, "
    "then a purchase within 5 days of that click. operators/sequence."
    "timed_chain_match: exact (non-greedy) via composed monotone window "
    "maxima carrying the previous step's timestamp — a later prior-step "
    "time is feasibility-dominant for a backward gap bound, so the "
    "running max is the optimal chain, ONE shuffle on user_id, no "
    "self-joins. Complements window_funnel_exact (whole-chain bound) "
    "with per-step bounds.",
    tags=("analytics", "sequence"),
)
def q_seq_match_timed(spark, t):
    from clickhouse_provider_spark.operators.sequence import timed_chain_match

    e = t["events"].select(
        "user_id", "event_id", ts_us().alias("ts_us"), "event_type"
    )
    return timed_chain_match(
        e,
        key="user_id",
        ts="ts_us",
        order_col="event_id",
        stage_conds=[
            F.col("event_type") == "signup",
            F.col("event_type") == "click",
            F.col("event_type") == "purchase",
        ],
        max_gaps_us=[2 * _DAY_US, 5 * _DAY_US],
    )


@register(
    "seq_next_node",
    # Same lag/lead cascade in DuckDB over the same (ts_us, event_id)
    # total order: m_2 marks rows completing a consecutive signup->click
    # pair; the earliest completion's lead(event_type) is the next node
    # (NULL when the pair ends the user's stream — kept, like ClickHouse).
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events
    ), m AS (
      SELECT user_id, ts_us, event_id,
             (event_type = 'click' AND coalesce(
                lag(event_type = 'signup') OVER w, false)) AS m_2,
             lead(event_type) OVER w AS nxt
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    )
    SELECT user_id, nxt AS next_node
    FROM m WHERE m_2
    QUALIFY row_number() OVER (PARTITION BY user_id
                               ORDER BY ts_us, event_id) = 1
    """,
    doc="ClickHouse sequenceNextNode('forward','first_match') analog: per "
    "user, the event type immediately after the first consecutive "
    "signup->click pair (operators/sequence.sequence_next_node — boolean "
    "lag cascade marks completions, lead() reads the next node, a "
    "combiner-friendly min(struct) argmin picks the earliest; one "
    "shuffle, one sorted partition pass, no self-joins). Null next_node "
    "kept when the chain ends the stream, as in ClickHouse.",
    tags=("analytics", "sequence"),
)
def q_seq_next_node(spark, t):
    from clickhouse_provider_spark.operators.sequence import sequence_next_node

    e = t["events"].select(
        "user_id", ts_us().alias("ts_us"), "event_id", "event_type"
    )
    return sequence_next_node(
        e,
        key="user_id",
        ts="ts_us",
        order_col="event_id",
        event_col="event_type",
        stage_conds=[
            F.col("event_type") == "signup",
            F.col("event_type") == "click",
        ],
    )
