"""Adaptive histogram — ClickHouse ``histogram(N)(x)``.

ClickHouse's ``histogram`` builds an adaptive (non-uniform-bin) summary by
greedily merging the closest centroids of a streaming histogram (the
Ben-Haim & Tom-Tov "streaming parallel decision tree" sketch). This
operator computes the same family of summary DETERMINISTICALLY over a
batch: exact per-value counts first (one combiner-friendly shuffle), then
an agglomerative pass per group that repeatedly merges the ADJACENT
centroid pair with the smallest gap (ties → leftmost pair) until
``n_bins`` remain. Heap + doubly-linked list makes the merge
O(V log V) in the distinct-value count V; per-group state is (sum,
weight, lo, hi) per centroid with integer sums, so the result is exact
and replay-stable.

Invariants (what the catalog entry's claim boolean grades):
- bin count == min(n_bins, V); heights sum to the row count;
- bins are disjoint, ordered, and cover [min, max];
- mean preservation: Σ per-bin value sums == the exact total (integer
  arithmetic — pass a fixed-point integer value column, as ClickHouse's
  UInt64 topKWeighted contract does for weights).

Scale: the expensive part is the exact (group, value) count — one
shuffle, combiner-friendly. The merge runs on V ≤ distinct-values rows
per group via ``applyInPandas``; for unbounded-cardinality doubles,
pre-quantize the value column (the same knob ClickHouse exposes as the
sketch's intermediate-centroid cap).
"""

from __future__ import annotations

import heapq

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def merge_centroids(
    values: list[int], counts: list[int], n_bins: int
) -> list[tuple[int, int, int, int]]:
    """Agglomerative merge of per-value centroids (values ascending) down
    to ``n_bins``: repeatedly merge the adjacent pair with the smallest
    centroid gap (ties → leftmost). Returns [(lo, hi, height, sum)] with
    exact integer sums."""
    v = len(values)
    if v == 0:
        return []
    # per-centroid state
    lo = list(values)
    hi = list(values)
    wt = list(counts)
    sm = [a * c for a, c in zip(values, counts)]
    nxt = list(range(1, v)) + [-1]
    prv = [-1] + list(range(v - 1))
    alive = [True] * v
    version = [0] * v

    def gap(i: int) -> float:
        j = nxt[i]
        return sm[j] / wt[j] - sm[i] / wt[i]

    heap: list[tuple[float, int, int, int]] = []
    for i in range(v - 1):
        heapq.heappush(heap, (gap(i), i, version[i], version[nxt[i]]))
    remaining = v
    while remaining > n_bins:
        g, i, vi, vj = heapq.heappop(heap)
        j = nxt[i] if alive[i] else -1
        if not alive[i] or j == -1 or version[i] != vi or version[j] != vj:
            continue  # stale entry
        # merge j into i
        sm[i] += sm[j]
        wt[i] += wt[j]
        hi[i] = hi[j]
        alive[j] = False
        version[i] += 1
        nxt[i] = nxt[j]
        if nxt[j] != -1:
            prv[nxt[j]] = i
        remaining -= 1
        if nxt[i] != -1:
            heapq.heappush(heap, (gap(i), i, version[i], version[nxt[i]]))
        if prv[i] != -1:
            p = prv[i]
            heapq.heappush(heap, (gap(p), p, version[p], version[i]))
    out = []
    i = 0
    while i != -1:
        if alive[i]:
            out.append((lo[i], hi[i], wt[i], sm[i]))
            i = nxt[i]
        else:  # pragma: no cover - head is always alive (merges keep left)
            i = nxt[i]
    return out


def adaptive_histogram(
    df: DataFrame, group: str, value: str, n_bins: int,
    pre_counted: bool = False,
) -> DataFrame:
    """ClickHouse ``histogram(n_bins)(value)`` per ``group`` over an
    INTEGER value column (fixed-point-scale fractional inputs first).

    Returns (group, bin, lo, hi, height, val_sum) — bin 0..k-1 in value
    order, k = min(n_bins, distinct values).

    ``pre_counted=True`` (round 14, guide §1.2-1): ``df`` already IS the
    per-(group, value) count relation with the weight in ``__n`` —
    callers that need the same counts elsewhere (histogram_adaptive's
    equi-depth ranks + exact totals) share one scan/aggregation instead
    of three. The merge input is identical (the pandas kernel sorts by
    value either way), so bins are bit-identical.
    """
    import pandas as pd

    counts = (
        df.select(group, value, "__n")
        if pre_counted
        else df.groupBy(group, value).agg(F.count(F.lit(1)).alias("__n"))
    )
    gtype = counts.schema[group].dataType
    out_schema = T.StructType(
        [
            T.StructField(group, gtype),
            T.StructField("bin", T.IntegerType()),
            T.StructField("lo", T.LongType()),
            T.StructField("hi", T.LongType()),
            T.StructField("height", T.LongType()),
            T.StructField("val_sum", T.LongType()),
        ]
    )

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(value, kind="mergesort")
        bins = merge_centroids(
            [int(x) for x in pdf[value]],
            [int(c) for c in pdf["__n"]],
            n_bins,
        )
        return pd.DataFrame(
            [
                (pdf[group].iloc[0], b, lo, hi, h, s)
                for b, (lo, hi, h, s) in enumerate(bins)
            ],
            columns=[group, "bin", "lo", "hi", "height", "val_sum"],
        )

    return counts.groupBy(group).applyInPandas(_one, out_schema)
