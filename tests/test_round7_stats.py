"""Brute-force differential tests for the round-7 statistical family
(plans/catalog10, operators/clustering): each Spark operator vs an
independent single-machine reference on seeded random inputs. The oracle
parity suite already cross-checks DuckDB; these pin the SEMANTICS against
straight-line Python/numpy implementations that share no code with the
DataFrame plans."""

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from clickhouse_provider_spark.plans.catalog import CATALOG

SEED = 20260814


def _events_tables(spark, rows):
    """Minimal events table shaped like the testdata (ns LongType ts)."""
    df = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, value double"
    )
    return {"events": df}


def _random_events(n_groups=8, per_group=40):
    rng = random.Random(SEED)
    rows = []
    eid = 0
    for g in range(n_groups):
        for _ in range(rng.randint(3, per_group)):
            ts_us = rng.randint(0, 5000) * 60_000_000  # minute grid → overlaps
            rows.append(
                (eid, ts_us * 1000, rng.randint(0, 5), f"g{g}",
                 float(rng.randint(0, 120)) + rng.choice([0.0, 0.25, 0.5]))
            )
            eid += 1
    return rows


@pytest.fixture(scope="module")
def stats_tables(spark):
    return _events_tables(spark, _random_events())


def _intervals_by_group(rows):
    by_g = {}
    for eid, ts_ns, _, g, v in rows:
        s = ts_ns // 1000
        e = s + int(math.floor(v)) * 60_000_000
        if e > s:
            by_g.setdefault(g, []).append((s, e))
    return by_g


def test_max_intersections_vs_brute(spark, stats_tables):
    rows = _random_events()
    got = {
        r["event_type"]: (r["max_concurrent"], r["first_peak_pos_us"])
        for r in CATALOG["max_intersections"].build(spark, stats_tables).collect()
    }
    for g, ivs in _intervals_by_group(rows).items():
        # brute force: open-interval count at every start position
        best, best_pos = 0, None
        for p in sorted({s for s, _ in ivs}):
            c = sum(1 for s, e in ivs if s <= p < e)
            if c > best:
                best, best_pos = c, p
        assert got[g] == (best, best_pos), g


def test_interval_length_sum_vs_brute(spark, stats_tables):
    rows = _random_events()
    got = {
        r["event_type"]: (r["union_len_us"], r["n_islands"])
        for r in CATALOG["interval_length_sum"].build(spark, stats_tables).collect()
    }
    for g, ivs in _intervals_by_group(rows).items():
        merged = []
        for s, e in sorted(ivs):
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        assert got[g] == (sum(e - s for s, e in merged), len(merged)), g


def test_delta_sum_vs_brute(spark, stats_tables):
    rows = _random_events()
    got = {
        r["event_type"]: (r["delta_sum"], r["n_increases"])
        for r in CATALOG["delta_sum_increases"].build(spark, stats_tables).collect()
    }
    by_g = {}
    for eid, ts_ns, _, g, v in rows:
        by_g.setdefault(g, []).append((ts_ns // 1000, eid, v))
    for g, evs in by_g.items():
        evs.sort()
        deltas = [b[2] - a[2] for a, b in zip(evs, evs[1:]) if b[2] - a[2] > 0]
        want = float(sum(round(d, 6) for d in deltas))
        assert got[g][1] == len(deltas), g
        assert got[g][0] == pytest.approx(want, abs=1e-9), g


def test_mann_whitney_vs_pairwise_brute(spark):
    """U from midrank sums must equal the O(n^2) pairwise definition:
    U_x = #\\{x>y\\} + 0.5*#\\{x=y\\}."""
    rng = random.Random(SEED + 1)
    rows = []
    for i in range(60):
        rows.append((i, 1_000_000 * i, 0, "click", float(rng.randint(0, 12)) / 2))
    for i in range(45):
        rows.append((100 + i, 1_000_000 * i, 0, "view", float(rng.randint(0, 12)) / 2))
    t = _events_tables(spark, rows)
    r = CATALOG["mann_whitney_u"].build(spark, t).collect()[0]
    xs = [v for _, _, _, g, v in rows if g == "click"]
    ys = [v for _, _, _, g, v in rows if g == "view"]
    u_brute = sum(
        1.0 if x > y else (0.5 if x == y else 0.0) for x in xs for y in ys
    )
    assert r["u_x"] == pytest.approx(u_brute)
    assert r["u_x"] + r["u_y"] == pytest.approx(len(xs) * len(ys))
    # z sign follows the shift direction
    assert (np.mean(xs) - np.mean(ys)) * r["z_tie_corrected"] >= 0 or u_brute == len(xs) * len(ys) / 2


def test_ttest_vs_numpy(spark):
    rng = random.Random(SEED + 2)
    rows = []
    for i in range(80):
        rows.append((i, 10 ** 6 * i, 0, "click", rng.randint(0, 400) / 4.0))
    for i in range(70):
        rows.append((1000 + i, 10 ** 6 * i, 0, "view", rng.randint(40, 440) / 4.0))
    t = _events_tables(spark, rows)
    r = CATALOG["ttest_student_welch"].build(spark, t).collect()[0]
    xs = np.array([v for *_, g, v in rows if g == "click"])
    ys = np.array([v for *_, g, v in rows if g == "view"])
    nx, ny = len(xs), len(ys)
    vx, vy = xs.var(ddof=1), ys.var(ddof=1)
    sp2 = ((nx - 1) * vx + (ny - 1) * vy) / (nx + ny - 2)
    t_student = (xs.mean() - ys.mean()) / math.sqrt(sp2 * (1 / nx + 1 / ny))
    t_welch = (xs.mean() - ys.mean()) / math.sqrt(vx / nx + vy / ny)
    df_welch = (vx / nx + vy / ny) ** 2 / (
        (vx / nx) ** 2 / (nx - 1) + (vy / ny) ** 2 / (ny - 1)
    )
    assert r["t_student"] == pytest.approx(t_student, rel=1e-12)
    assert r["t_welch"] == pytest.approx(t_welch, rel=1e-12)
    assert r["df_welch"] == pytest.approx(df_welch, rel=1e-12)


def test_spearman_vs_numpy(spark):
    rng = random.Random(SEED + 3)
    rows = [
        (1, float(rng.randint(1, 20)), float(rng.randint(1, 30)) + 0.5)
        for _ in range(120)
    ]
    li = spark.createDataFrame(
        rows, "l_returnflag string, l_quantity double, l_extendedprice double"
    ).withColumn("l_returnflag", F.lit("A"))
    r = CATALOG["spearman_rank_corr"].build(spark, {"lineitem": li}).collect()[0]

    def midranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and vals[order[j]] == vals[order[i]]:
                j += 1
            avg = (i + 1 + j) / 2.0
            for k in range(i, j):
                ranks[order[k]] = avg
            i = j
        return np.array(ranks)

    rq = midranks([q for _, q, _ in rows])
    rp = midranks([p for _, _, p in rows])
    want = np.corrcoef(rq, rp)[0, 1]
    assert r["spearman_rho"] == pytest.approx(want, rel=1e-12)


def test_weighted_median_vs_brute(spark):
    rng = random.Random(SEED + 4)
    rows = [
        ("A", float(rng.randint(1, 10)), float(rng.randint(1, 9)) * 10 + 0.25)
        for _ in range(200)
    ]
    li = spark.createDataFrame(
        rows, "l_returnflag string, l_quantity double, l_extendedprice double"
    )
    r = CATALOG["quantile_exact_weighted"].build(spark, {"lineitem": li}).collect()[0]
    expanded = sorted(
        p for _, w, p in rows for _ in range(int(w))
    )
    total = len(expanded)
    cum, med = 0, None
    for p in sorted(set(expanded)):
        cum += sum(1 for x in expanded if x == p)
        if 2 * cum >= total:
            med = p
            break
    assert r["total_weight"] == total
    assert r["weighted_median_price"] == pytest.approx(med)


def test_kmeans_vs_numpy_reference(spark):
    """kmeans_assign vs an independent numpy replay of the declared
    algorithm (quantize → seed by lowest ids → 2 Lloyd rounds with
    floored-mean updates, ties to lowest cluster)."""
    from clickhouse_provider_spark.operators.clustering import Q_SCALE, kmeans_assign

    rng = np.random.RandomState(SEED)
    n, dim, k = 120, 8, 4
    vecs = rng.uniform(-0.5, 0.5, size=(n, dim)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["vec_id"]: (r["cluster_id"], r["dist"])
        for r in kmeans_assign(emb, k=k, iters=2).collect()
    }

    q = np.floor(vecs.astype(np.float64) * Q_SCALE)
    cent = q[:k].copy()

    def assign(c):
        d = ((q[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return d.argmin(axis=1), d.min(axis=1)  # argmin ties → lowest id

    lab, _ = assign(cent)
    new = np.stack(
        [
            np.floor(q[lab == j].sum(axis=0) / (lab == j).sum())
            if (lab == j).any()
            else None
            for j in range(k)
            if (lab == j).any()
        ]
    )
    alive = [j for j in range(k) if (lab == j).any()]
    lab2, dist2 = assign(new)
    for i in range(n):
        assert got[i][0] == alive[lab2[i]], i
        assert got[i][1] == pytest.approx(dist2[i]), i


def test_kmeans_deterministic_across_runs(spark):
    from clickhouse_provider_spark.operators.clustering import kmeans_assign

    rng = np.random.RandomState(SEED + 9)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in rng.uniform(-1, 1, 16)]) for i in range(60)],
        "vec_id long, embedding array<float>",
    ).repartition(7)
    a = sorted(map(tuple, kmeans_assign(emb, k=3, iters=2).collect()))
    b = sorted(map(tuple, kmeans_assign(emb, k=3, iters=2).collect()))
    assert a == b


def test_ks_test_vs_brute(spark):
    rng = random.Random(SEED + 5)
    rows = []
    for i in range(70):
        rows.append((i, 10**6 * i, 0, "click", rng.randint(0, 30) / 2.0))
    for i in range(55):
        rows.append((500 + i, 10**6 * i, 0, "view", rng.randint(5, 35) / 2.0))
    t = _events_tables(spark, rows)
    r = CATALOG["ks_test_2samp"].build(spark, t).collect()[0]
    xs = sorted(v for *_, g, v in rows if g == "click")
    ys = sorted(v for *_, g, v in rows if g == "view")

    def ecdf(sorted_vals, v):
        import bisect

        return bisect.bisect_right(sorted_vals, v) / len(sorted_vals)

    points = sorted(set(xs) | set(ys))
    gaps = [abs(ecdf(xs, v) - ecdf(ys, v)) for v in points]
    d = max(gaps)
    assert r["d_stat"] == pytest.approx(d, abs=1e-12)
    assert r["d_location"] == points[gaps.index(d)]


def test_anova_f_vs_numpy(spark):
    rng = random.Random(SEED + 6)
    rows = []
    eid = 0
    for g, (mu, n) in enumerate([(10, 40), (12, 55), (9, 35), (11, 60)]):
        for _ in range(n):
            rows.append((eid, 10**6 * eid, 0, f"g{g}", mu + rng.randint(-8, 8) / 4.0))
            eid += 1
    t = _events_tables(spark, rows)
    r = CATALOG["anova_f"].build(spark, t).collect()[0]
    groups = {}
    for *_, g, v in rows:
        groups.setdefault(g, []).append(v)
    arrs = [np.array(v) for v in groups.values()]
    all_v = np.concatenate(arrs)
    ssb = sum(len(a) * (a.mean() - all_v.mean()) ** 2 for a in arrs)
    ssw = sum(((a - a.mean()) ** 2).sum() for a in arrs)
    k, n = len(arrs), len(all_v)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert r["k"] == k and r["n_total"] == n
    assert r["df_between"] == k - 1 and r["df_within"] == n - k
    assert r["f_stat"] == pytest.approx(f, rel=1e-10)


def test_skew_kurtosis_vs_numpy(spark):
    rng = random.Random(SEED + 7)
    rows = [
        (i, 10**6 * i, 0, "g0", rng.randint(0, 2000) ** 2 / 40000.0)
        for i in range(300)
    ]
    # keep 2dp (the entry integerizes at value*100)
    rows = [(a, b, c, d, round(v, 2)) for a, b, c, d, v in rows]
    t = _events_tables(spark, rows)
    r = CATALOG["skew_kurtosis"].build(spark, t).collect()[0]
    v = np.array([x[4] for x in rows])
    m = v.mean()
    var = ((v - m) ** 2).mean()
    skew = (((v - m) ** 3).mean()) / var**1.5
    kurt = (((v - m) ** 4).mean()) / var**2
    assert r["n"] == len(v)
    assert r["skew_pop"] == pytest.approx(skew, rel=1e-9)
    assert r["kurt_pop"] == pytest.approx(kurt, rel=1e-9)
