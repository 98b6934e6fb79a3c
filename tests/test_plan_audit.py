"""Plan-quality audit over the whole catalog: no entry may compile a new
UNPARTITIONED window (Spark's "No Partition Defined ... moving all data to
a single partition" WindowExec) — the single-task sort that killed
ks_test_2samp's and mann_whitney_u's 100x story before round 9 replaced
them with the bucketed prefix sum (operators/ranking.py).

A small allowlist covers windows whose input is BOUNDED by construction
(k-row seed/codebook frames, per-day entropy ranks) — each with the bound
stated; anything else failing here needs either a bucketed rewrite or an
explicit, justified allowlist entry.
"""

import re

import pytest

from clickhouse_provider_spark.plans import CATALOG

#: entries whose unpartitioned window is over a provably bounded relation
#: (the bound, not the data, is the invariant — see each note). Keep this
#: list MINIMAL: it is re-derived each round by running the detector over
#: its members; anything at 0 nodes comes off.
BOUNDED_WINDOW_OK = {
    # rank over per-day entropy rows: |distinct days| rows (calendar-
    # bounded at the month grain this entry reports)
    "entropy_rank_profile",
    # row_number over the k-row k-means seed frame (k = cluster count, a
    # constant of the operator; operators/clustering.py seeds)
    "semantic_cluster_kmeans",
    "cluster_balanced_selection",
    # rank windows over the two TakeOrdered top-10 retriever outputs —
    # both inputs are limit(k) relations regardless of corpus size
    "hybrid_rrf_topk",
}


def _top_level_groups(args: str) -> list[str]:
    groups, depth, cur = [], 0, []
    for ch in args:
        if ch == "[":
            if depth == 0:
                cur = []
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(cur))
        elif depth > 0:
            cur.append(ch)
    return groups


def _unpartitioned_window_nodes(plan: str) -> int:
    """Count WindowExec nodes whose spec has no partition columns.

    ``explain('formatted')`` prints a Window node's Arguments as the
    top-level bracket groups ``[exprs][, partitionSpec][, orderSpec]`` —
    3 groups = partitioned+ordered (fine), 1 group = fully global
    (flag), 2 groups = EITHER partitioned-unordered (fine) or
    global-ordered (flag) — disambiguated by ASC/DESC markers, which
    only order specs carry. ``WindowGroupLimit`` (the top-k pushdown
    node) is always partition-scoped here and is excluded by the exact
    node-name match.
    """
    n = 0
    for node in re.split(r"\n\(\d+\) ", plan):
        if not re.match(r"Window(\s|$)", node):
            continue
        m = re.search(r"Arguments: (.+)", node)
        if not m:
            continue
        groups = _top_level_groups(m.group(1))
        if len(groups) >= 3:
            continue
        if len(groups) == 2 and not re.search(r"\b(ASC|DESC)\b", groups[1]):
            continue  # partitioned, unordered (whole-partition frame)
        n += 1
    return n


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_no_unpartitioned_windows(spark, tables, name):
    if name in BOUNDED_WINDOW_OK:
        pytest.skip("bounded-input window allowlisted (see module doc)")
    df = CATALOG[name].build(spark, tables)
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    bad = _unpartitioned_window_nodes(plan)
    assert bad == 0, (
        f"{name}: {bad} unpartitioned Window node(s) — a single-task sort "
        "at scale; use operators/ranking.bucketed_cumsum / value_midranks "
        "(bucket=...) or add a justified BOUNDED_WINDOW_OK entry"
    )
