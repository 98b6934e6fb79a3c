"""Behavior pins for batch 13 (catalog13.py) beyond the oracle parity:
independent reference implementations and edge semantics that a matching
pair of wrong engines could not catch.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from clickhouse_provider_spark.plans import CATALOG


def run(name, spark, tables):
    return CATALOG[name].build(spark, tables)


# --------------------------------------------------------------------------
# geohash: compare against the textbook bisection algorithm
# --------------------------------------------------------------------------

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_reference(lat: float, lon: float, precision: int = 8) -> str:
    """Classic interval-bisection geohash (independent of the bit-interleave
    formulation in catalog13)."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits = []
    even = True  # lon first
    while len(bits) < precision * 5:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                bits.append(1)
                lon_lo = mid
            else:
                bits.append(0)
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits.append(1)
                lat_lo = mid
            else:
                bits.append(0)
                lat_hi = mid
        even = not even
    out = []
    for c in range(precision):
        idx = 0
        for b in bits[c * 5 : c * 5 + 5]:
            idx = idx * 2 + b
        out.append(_B32[idx])
    return "".join(out)


def test_geohash_matches_bisection_reference(spark, tables):
    # recompute per-user geohash exactly as the entry does, but keep user
    # granularity: reuse the entry's internals by grouping on min_geohash
    # for single-user prefixes is lossy, so re-derive from the formula.
    df = run("geohash_encode", spark, tables).toPandas()
    # derive the expected prefix3 histogram from the reference algorithm
    users = (
        tables["events"].select("user_id").distinct().toPandas()["user_id"].tolist()
    )
    def expected_hash(uid: int) -> str:
        lat = (uid * 7) % 180 - 90 + 0.25
        lon = (uid * 13) % 360 - 180 + 0.5
        return _geohash_reference(lat, lon, 8)

    # per-user geohash must be constant → min over events per prefix equals
    # min over users mapping to that prefix
    from collections import defaultdict

    by_prefix = defaultdict(list)
    for uid in users:
        gh = expected_hash(uid)
        by_prefix[gh[:3]].append(gh)
    exp = {p: (min(v), max(v)) for p, v in by_prefix.items()}
    got = {
        r["prefix3"]: (r["min_geohash"], r["max_geohash"]) for _, r in df.iterrows()
    }
    assert got == exp


# --------------------------------------------------------------------------
# retention: the first condition gates the rest
# --------------------------------------------------------------------------


def test_retention_first_condition_gates(spark):
    import pandas as pd

    # user 1: active day0+day1; user 2: active day1 ONLY (gated out);
    # user 3: active day0 only. ns timestamps like the canonical loader.
    day0 = 19723 * 86400 * 10**9
    day1 = 19724 * 86400 * 10**9
    rows = [
        (1, day0), (1, day1),
        (2, day1),
        (3, day0),
    ]
    events = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts"])
    )
    out = CATALOG["retention_aggregate"].build(spark, {"events": events}).collect()[0]
    assert out["r1"] == 2  # users 1 and 3 in the day-0 cohort
    assert out["r2"] == 1  # only user 1 retained; user 2's day-1 visit gated
    assert out["ratio_d1"] == 0.5


# --------------------------------------------------------------------------
# multiSearch family: first-index/first-position semantics
# --------------------------------------------------------------------------


def test_string_search_first_index_and_counts(spark):
    import pandas as pd

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "lang": ["en", "en", "fr"],
            "text": [
                "a join then hash then join",   # join@3(1-based), hash@13
                "window spark window",           # window first, then spark
                "nothing here",                  # no needle
            ],
        }
    )
    out = (
        CATALOG["string_search_multi"]
        .build(spark, {"documents": spark.createDataFrame(docs)})
        .toPandas()
        .set_index("lang")
    )
    en = out.loc["en"]
    # doc1: first match = 'join' (index 3 in needle order spark,hash,join,window)
    # at pos 3; doc2: first match = 'window' (index 4) at pos 1
    assert en["n_any"] == 2
    assert en["sum_first_pos"] == 3 + 1
    assert en["sum_first_index"] == 3 + 4
    assert en["count_join"] == 2  # two 'join' occurrences in doc1
    assert en["count_window"] == 2  # two in doc2
    fr = out.loc["fr"]
    assert fr["n_any"] == 0 and fr["sum_first_pos"] == 0


# --------------------------------------------------------------------------
# ngramDistance: independent trigram-multiset reference
# --------------------------------------------------------------------------


def _trigram_multiset(s: str):
    from collections import Counter

    return Counter(s[i : i + 3] for i in range(len(s) - 2)) if len(s) >= 3 else None


def test_ngram_distance_reference(spark, tables):
    got = run("ngram_string_distance", spark, tables).toPandas().set_index("p_brand")
    parts = tables["part"].select("p_partkey", "p_brand", "p_name").toPandas()
    from collections import Counter, defaultdict

    ref_name = parts.groupby("p_brand")["p_name"].min().to_dict()
    sums = defaultdict(lambda: [0, 0, 0.0])  # common, total, max_dist
    for _, r in parts.iterrows():
        s1, s2 = r["p_name"], ref_name[r["p_brand"]]
        c1 = Counter(s1[i : i + 3] for i in range(max(len(s1) - 2, 0)))
        c2 = Counter(s2[i : i + 3] for i in range(max(len(s2) - 2, 0)))
        common = sum(min(c1[g], c2[g]) for g in c1)
        total = (max(len(s1) - 2, 0)) + (max(len(s2) - 2, 0))
        d = sums[r["p_brand"]]
        d[0] += common
        d[1] += total
        d[2] = max(d[2], 1.0 - 2.0 * common / total)
    for brand, (common, total, max_dist) in sums.items():
        row = got.loc[brand]
        assert row["sum_common"] == common, brand
        assert row["sum_total"] == total, brand
        assert row["max_part_distance"] == pytest.approx(max_dist, abs=0), brand


# --------------------------------------------------------------------------
# bitmap set ops: inclusion-exclusion consistency + numpy reference
# --------------------------------------------------------------------------


def test_bitmap_set_ops_reference(spark, tables):
    got = run("bitmap_set_ops", spark, tables).toPandas()
    ev = tables["events"].select("event_type", "user_id").distinct().toPandas()
    sets = {t: set(g["user_id"]) for t, g in ev.groupby("event_type")}
    for _, r in got.iterrows():
        a, b = sets[r["type_a"]], sets[r["type_b"]]
        assert r["card_and"] == len(a & b)
        assert r["card_or"] == len(a | b)
        assert r["card_xor"] == len(a ^ b)
    # all unordered pairs with nonempty intersection present
    assert len(got) == sum(
        1
        for x in sets
        for y in sets
        if x < y and sets[x] & sets[y]
    )


# --------------------------------------------------------------------------
# kNN eval: numpy brute-force reference (cosine, majority vote, ties)
# --------------------------------------------------------------------------


def test_knn_label_accuracy_numpy_reference(spark, tables):
    got = run("knn_label_accuracy", spark, tables).toPandas().set_index("true_label")
    emb = tables["embeddings"].toPandas()
    ids = emb["vec_id"].to_numpy()
    X = np.array([np.array(v, dtype=np.float64) for v in emb["embedding"]])
    labels = emb["label"].to_numpy()
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    correct = {}
    total = {}
    for qi in np.where(ids % 20 == 0)[0]:
        sims = Xn @ Xn[qi]
        order = sorted(
            (i for i in range(len(ids)) if ids[i] != ids[qi]),
            key=lambda i: (-sims[i], ids[i]),
        )[:5]
        votes = {}
        for i in order:
            votes[labels[i]] = votes.get(labels[i], 0) + 1
        pred = min(votes, key=lambda l: (-votes[l], l))
        tl = labels[qi]
        total[tl] = total.get(tl, 0) + 1
        correct[tl] = correct.get(tl, 0) + (1 if pred == tl else 0)
    for tl in total:
        assert got.loc[tl, "n_queries"] == total[tl]
        assert got.loc[tl, "n_correct"] == correct[tl]


# --------------------------------------------------------------------------
# logistic quality gate: scaled-integer score recomputation
# --------------------------------------------------------------------------


def test_quality_logistic_score_reference(spark, tables):
    from clickhouse_provider_spark.operators.text import STOPWORDS
    from clickhouse_provider_spark.plans.catalog13 import (
        _BIAS_U,
        _W_NONALNUM,
        _W_STOP,
        _W_UNIQ,
    )
    import re

    got = run("quality_logistic_score", spark, tables).toPandas().set_index("source")
    docs = tables["documents"].select("source", "text").toPandas()
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0, None, None, 0])
    for _, r in docs.iterrows():
        text = r["text"]
        toks = [t for t in re.split(r"\s+", text) if t]
        n_chars = len(text)
        if not toks or not n_chars:
            continue
        n_alnum = len(re.findall(r"[A-Za-z0-9]", text))
        r_stop = len([t for t in toks if t in STOPWORDS]) * 1_000_000 // len(toks)
        r_uniq = len(set(toks)) * 1_000_000 // len(toks)
        r_na = (n_chars - n_alnum) * 1_000_000 // n_chars
        score = _W_STOP * r_stop + _W_UNIQ * r_uniq + _W_NONALNUM * r_na + _BIAS_U
        a = agg[r["source"]]
        a[0] += 1
        a[1] += 1 if score > 0 else 0
        a[2] = score if a[2] is None else min(a[2], score)
        a[3] = score if a[3] is None else max(a[3], score)
        a[4] += score
    for src, (n, keep, mn, mx, total) in agg.items():
        row = got.loc[src]
        assert row["n_docs"] == n
        assert row["n_keep"] == keep
        assert row["min_score_u"] == mn
        assert row["max_score_u"] == mx
        assert row["sum_score_u"] == total


# --------------------------------------------------------------------------
# ipv4: round trip holds for every row; group_array_sorted shape
# --------------------------------------------------------------------------


def test_ipv4_roundtrip_total(spark, tables):
    got = run("ipv4_functions", spark, tables).toPandas()
    assert (got["n_roundtrip_ok"] == got["n_events"]).all()
    assert got["n_events"].sum() == tables["events"].count()


def test_group_array_sorted_shape(spark, tables):
    got = run("group_array_sorted", spark, tables).toPandas()
    for _, r in got.iterrows():
        vals = [int(x) for x in r["bottom10_csv"].split(",")]
        assert len(vals) == min(10, r["n"])
        assert vals == sorted(vals)
