"""Deterministic sampling operators for training-data pipelines.

Corpus curation needs REPRODUCIBLE samples: the same (salt, key) must select
the same rows on every run, engine, and partition layout — Spark's
``df.sample()`` is seed-stable only for a fixed partitioning, so these
operators derive selection from a content hash instead (md5 is available
and bit-identical in Spark, DuckDB, and everything else, which is what makes
the DuckDB oracle exact).

- :func:`hash_fraction_sample` — per-stratum Bernoulli sampling by hash
  threshold (class rebalancing: downsample dominant classes, keep rare ones).
  Map-only: NO shuffle, NO state; the filter is a pure projection predicate
  and scales embarrassingly to 100 TB.
- :func:`reservoir_per_group` — exact-k-per-group sample as the top-k rows
  by hash order within each group (equivalent to a seeded reservoir in
  distribution, but deterministic). One shuffle on the group key; at scale
  the per-partition pre-rank (rank ≤ k within each map partition first)
  bounds shuffle volume to ``k × partitions`` rows per group.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window as W

#: 16^8 — the hash-threshold denominator (first 8 hex chars of md5).
_HASH_SPACE = 1 << 32


def fraction_to_hex_threshold(fraction: float) -> str:
    """Exact 8-hex-char threshold for ``P(substr(md5,1,8) < t) = fraction``.

    Shared with the SQL oracles: both engines compare the same lowercase-hex
    strings lexicographically, which for fixed-width hex equals numeric
    comparison.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return format(min(int(fraction * _HASH_SPACE), _HASH_SPACE - 1), "08x")


def _hash8(key_col: str, salt: str) -> F.Column:
    return F.substring(F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 8)


def hash_fraction_sample(
    df: DataFrame,
    key_col: str,
    salt: str,
    fractions: Mapping[str, float] | float,
    stratum_col: str | None = None,
) -> DataFrame:
    """Keep each row iff ``substr(md5(salt || key), 1, 8)`` falls under its
    stratum's threshold. ``fractions`` is either a single float or a
    ``{stratum_value: fraction}`` map (unlisted strata are dropped).
    """
    h = _hash8(key_col, salt)
    if isinstance(fractions, Mapping):
        if stratum_col is None:
            raise ValueError("stratum_col required with per-stratum fractions")
        cond = F.lit(False)
        for stratum, frac in fractions.items():
            keep = (
                F.lit(True)
                if frac >= 1.0  # keep-all: a hash threshold would drop the
                # 2^-32 tail where the prefix is exactly 'ffffffff'
                else h < F.lit(fraction_to_hex_threshold(frac))
            )
            cond = cond | ((F.col(stratum_col) == stratum) & keep)
    else:
        frac = float(fractions)
        if frac >= 1.0:
            return df
        cond = h < F.lit(fraction_to_hex_threshold(frac))
    return df.filter(cond)


def reservoir_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    salt: str,
    k: int,
) -> DataFrame:
    """Deterministic k-row sample per group: rank rows by
    ``(md5(salt || key), key)`` within each group and keep rank ≤ k.
    Adds ``sample_rank`` (1-based)."""
    h = _hash8(key_col, salt)
    w = W.partitionBy(group_col).orderBy(h, F.col(key_col))
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )
