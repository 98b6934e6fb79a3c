"""Largest-Triangle-Three-Buckets (LTTB) time-series downsampling.

The dashboard-serving sibling of the gap-fill entry: reduce each series to
``n_out`` visually-representative points (Steinarsson, "Downsampling Time
Series for Visual Representation", 2013). ClickHouse ships this as
``largestTriangleThreeBuckets`` / ``lttb``.

Canonical algorithm, made CROSS-ENGINE EXACT by integer arithmetic:

- points of a series sorted by x; first and last always kept;
- the ``m - 2`` middle points are split into ``n_out - 2`` buckets with
  the canonical ranges ``[floor((i-1)·M/N), floor(i·M/N))`` over the
  middle rank (M = m-2, N = n_out-2);
- scanning left to right, each bucket contributes the point maximizing
  the triangle area formed with the PREVIOUSLY SELECTED point and the
  average of the NEXT bucket (the last point for the final bucket).

The area comparison is done on ``|cross| · cnt_next`` — the cross product
scaled by the next bucket's point count so the average never needs a
division: with integer x and y this is exact BIGINT arithmetic, so the
argmax (ties broken by smallest x) is bit-identical in any engine.
Series with ``m <= n_out`` are returned whole (steps 0..m-1), as in the
reference implementation.

Scale: selection is sequential per series by construction (each pick
depends on the previous one), so the physical plan is ONE shuffle on the
series key + an Arrow-batched linear scan per series (``applyInPandas``)
— O(m) work and O(n_out) output per series, no self-joins. For a single
huge series, pre-aggregate to the plot's time resolution first (the
catalog entry feeds daily buckets, not raw events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def lttb_select(xs: list[int], ys: list[int], n_out: int) -> list[int]:
    """Indices of the LTTB-selected points of one series (xs ascending,
    integer coordinates). Pure-python ints — no float ever enters the
    argmax."""
    m = len(xs)
    if m <= n_out:
        return list(range(m))
    big_m, big_n = m - 2, n_out - 2
    sel = [0]
    prev = 0
    for i in range(1, big_n + 1):
        s = 1 + ((i - 1) * big_m) // big_n
        e = 1 + (i * big_m) // big_n  # exclusive
        if i < big_n:
            ns, ne = 1 + (i * big_m) // big_n, 1 + ((i + 1) * big_m) // big_n
        else:
            ns, ne = m - 1, m
        sx = sum(xs[ns:ne])
        sy = sum(ys[ns:ne])
        cnt = ne - ns
        px, py = xs[prev], ys[prev]
        best = None
        for j in range(s, e):
            score = abs(
                (px * cnt - sx) * (ys[j] - py)
                - (px - xs[j]) * (sy - py * cnt)
            )
            cand = (score, -xs[j])
            if best is None or cand > best[0]:
                best = (cand, j)
        sel.append(best[1])
        prev = best[1]
    sel.append(m - 1)
    return sel


def lttb_downsample(
    df: DataFrame, series: str, x: str, y: str, n_out: int
) -> DataFrame:
    """Downsample each ``series`` of integer (x, y) points to ``n_out``
    LTTB-selected points. Returns (series, step, x, y) with step the
    0-based output position."""
    import pandas as pd

    proj = df.select(
        series,
        F.col(x).cast("long").alias("__x"),
        F.col(y).cast("long").alias("__y"),
    )
    stype = proj.schema[series].dataType
    out_schema = T.StructType(
        [
            T.StructField(series, stype),
            T.StructField("step", T.IntegerType()),
            T.StructField(x, T.LongType()),
            T.StructField(y, T.LongType()),
        ]
    )

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__x", kind="mergesort")
        xs = [int(v) for v in pdf["__x"]]
        ys = [int(v) for v in pdf["__y"]]
        sel = lttb_select(xs, ys, n_out)
        return pd.DataFrame(
            {
                series: [pdf[series].iloc[0]] * len(sel),
                "step": pd.array(range(len(sel)), "int32"),
                x: [xs[j] for j in sel],
                y: [ys[j] for j in sel],
            }
        )

    return proj.groupBy(series).applyInPandas(_one, out_schema)
