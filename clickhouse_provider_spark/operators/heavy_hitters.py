"""Batch weighted heavy hitters — ClickHouse ``topKWeighted(k)(x, w)``.

ClickHouse's topKWeighted is SpaceSaving with weighted increments (weight
must be an unsigned integer there; same contract here — scale fractional
weights to fixed-point first). The Spark shape is the canonical two-level
mergeable-summary plan:

1. **Partition fold** (``mapInPandas``): each input partition folds its
   rows into one bounded SpaceSaving summary per group present — at most
   ``capacity`` (item, estimate, error) entries plus one overflow-floor
   sentinel per (partition, group). Items are folded in deterministic
   (weight desc, item) order so the summary is a function of the
   partition's multiset alone (stable across task retries).
2. **Merge** (``applyInPandas`` after ONE shuffle on the group): partial
   summaries combine by summing per-item estimates; a summary that
   overflowed contributes its minimum estimate (the floor) as both
   estimate and error for items it doesn't track — the standard
   mergeable-SpaceSaving bound (Berinde et al., "Space-optimal heavy
   hitters with strong error bounds"). The merged summary is re-truncated
   to ``capacity`` and the top ``k`` by (estimate desc, item) emitted.

Scale: the shuffle carries at most ``capacity + 1`` rows per (partition,
group) — constant per-group state exactly like ClickHouse's aggregate —
instead of the full (group, item) expansion an exact top-k pays. With
``capacity`` ≥ the distinct-item count no eviction ever happens, floors
stay 0, and every estimate is exact (error 0) — the property the catalog
entry's claim boolean grades.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T


def _fold(pairs, capacity: int) -> dict:
    """Fold (item, weight) pairs — already aggregated per item — into a
    SpaceSaving summary {item: [estimate, error]} in deterministic
    (weight desc, item) order."""
    summary: dict = {}
    for item, w in sorted(pairs, key=lambda kv: (-kv[1], kv[0])):
        if item in summary:
            summary[item][0] += w
        elif len(summary) < capacity:
            summary[item] = [w, 0]
        else:
            evict = min(summary.items(), key=lambda kv: (kv[1][0], kv[0]))
            floor = evict[1][0]
            del summary[evict[0]]
            summary[item] = [w + floor, floor]
    return summary


def weighted_topk(
    df: DataFrame,
    group: str,
    item: str,
    weight: str,
    k: int,
    capacity: int = 10_000,
) -> DataFrame:
    """Top-``k`` items per ``group`` by summed integer ``weight`` via
    mergeable weighted SpaceSaving (see module docstring).

    Returns (group, rnk, item, est, err) — rnk 1..k by (est desc, item).
    """
    import pandas as pd

    proj = df.select(group, item, F.col(weight).cast("long").alias("__w"))
    gtype = proj.schema[group].dataType
    itype = proj.schema[item].dataType
    part_schema = T.StructType(
        [
            T.StructField(group, gtype),
            T.StructField("item", itype),
            T.StructField("est", T.LongType()),
            T.StructField("err", T.LongType()),
            T.StructField("is_floor", T.BooleanType()),
            T.StructField("pid", T.IntegerType()),
        ]
    )
    out_schema = T.StructType(
        [
            T.StructField(group, gtype),
            T.StructField("rnk", T.IntegerType()),
            T.StructField(item, itype),
            T.StructField("est", T.LongType()),
            T.StructField("err", T.LongType()),
        ]
    )

    def fold_partition(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        totals: dict = {}  # group -> {item: weight}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            agg = pdf.groupby([group, item], sort=False)["__w"].sum()
            for (g, it), w in agg.items():
                acc = totals.setdefault(g, {})
                acc[it] = acc.get(it, 0) + int(w)
        rows = []
        for g, acc in totals.items():
            summary = _fold(acc.items(), capacity)
            floor = 0
            if len(summary) >= capacity:
                floor = min(v[0] for v in summary.values())
            for it, (est, err) in summary.items():
                rows.append((g, it, est, err, False, pid))
            rows.append((g, None, floor, 0, True, pid))
        yield pd.DataFrame(
            rows, columns=[group, "item", "est", "err", "is_floor", "pid"]
        )

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf[group].iloc[0]
        floors: dict = {}
        per_item: dict = {}  # item -> {pid: (est, err)}
        for r in pdf.itertuples(index=False):
            if r.is_floor:
                floors[r.pid] = int(r.est)
            else:
                per_item.setdefault(r.item, {})[r.pid] = (
                    int(r.est),
                    int(r.err),
                )
        merged = []
        for it, parts in per_item.items():
            est = err = 0
            for pid, floor in floors.items():
                if pid in parts:
                    est += parts[pid][0]
                    err += parts[pid][1]
                else:
                    est += floor
                    err += floor
            merged.append((it, est, err))
        merged.sort(key=lambda r: (-r[1], r[0]))
        top = merged[: min(k, capacity)]
        return pd.DataFrame(
            [(g, i + 1, it, est, err) for i, (it, est, err) in enumerate(top)],
            columns=[group, "rnk", item, "est", "err"],
        )

    partials = proj.mapInPandas(fold_partition, part_schema)
    return partials.groupBy(group).applyInPandas(merge_group, out_schema)
