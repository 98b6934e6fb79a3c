"""Runtime bloom-filter semi-join pruning — the big-big join survival
technique at 100 TB.

When BOTH join sides are too large to broadcast, a plain semi join
shuffles the entire fact table just to discard most of it. The fix every
warehouse engine ships (ClickHouse set/bloom skip indexes on the storage
side — reference README.md DDL; Spark's own runtime row-level filtering
on the join side) is: build a compact bloom filter over the dim keys,
apply it to the fact INSIDE the scan stage (map-side, before the
exchange), and run the exact join only on the survivors. False positives
cost nothing but wasted candidates — the exact verify join makes the
result identical to the plain semi join (the oracle IS the plain semi
join).

This implementation is deterministic and engine-portable: bit positions
come from md5 over the key (the same hash family the dedup/ANN operators
use), the bitset folds driver-side into ``m/32`` 32-bit words (32-bit so
the probe side's double arithmetic stays exact) — a fixed
few-KB artifact like a trained codebook, NOT a data-path collect — and
membership tests are word/bit arithmetic in whole-stage codegen. At
100 TB the build side is one combiner-friendly distinct over the dim
keys; the probe side adds zero shuffles.

Spark's AQE can inject a similar filter automatically when statistics
line up; making it an explicit operator makes the plan deterministic and
lets callers size ``m_bits``/``k`` for their key cardinality (classic
1%-FP sizing: m ≈ 10·n keys, k = 3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bit_positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k deterministic bit positions for a key: the first 8 hex chars of
    md5(f"{i}|{key}") as an integer, mod m_bits. Same md5 family as the
    minhash/LSH operators — reproducible anywhere, including SQL."""
    return [
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{i}|"), key.cast("string"))), 1, 8
                ),
                16,
                10,
            ).cast("long"),
            F.lit(m_bits),
        )
        for i in range(k)
    ]


def build_bloom_words(
    dim: DataFrame, dim_key: str, m_bits: int = 8192, k: int = 3
) -> list[int]:
    """Fold the dim keys' bit positions into an ``m_bits``-bit bitset,
    returned as m/32 unsigned 32-bit words (32-bit packing keeps every
    word and every intermediate of the probe-side arithmetic exactly
    representable in doubles — see :func:`bloom_might_contain`).

    Distributed: positions explode + distinct cluster-side (bounded by
    m_bits regardless of dim size), only the ≤ m_bits distinct positions
    reach the driver."""
    pos = (
        dim.select(
            F.explode(
                F.array(*_bit_positions(F.col(dim_key), m_bits, k))
            ).alias("p")
        )
        .distinct()
        .collect()
    )
    words = [0] * ((m_bits + 31) // 32)
    for r in pos:
        p = int(r["p"])
        words[p // 32] |= 1 << (p % 32)
    return words


def bloom_might_contain(
    key: Column, words: list[int], m_bits: int, k: int = 3
) -> Column:
    """Membership predicate: all k bit positions set in the literal
    bitset. Arithmetic bit test — ``(word DIV 2^(pos mod 32)) mod 2`` —
    because PySpark's shiftleft/shiftright only accept literal shift
    amounts; with 32-bit words every value is < 2^32, so the double
    ``pow``/division is exact. Whole-stage codegen, no UDF, no shuffle."""
    warr = F.array(*[F.lit(int(w)).cast("long") for w in words])
    cond: Column | None = None
    for pos in _bit_positions(key, m_bits, k):
        word = F.element_at(
            warr, F.floor(pos / F.lit(32)).cast("int") + F.lit(1)
        )
        bit_pow = F.pow(F.lit(2.0), F.pmod(pos, F.lit(32)).cast("double"))
        test = (
            F.pmod(F.floor(word / bit_pow).cast("long"), F.lit(2)) == F.lit(1)
        )
        cond = test if cond is None else (cond & test)
    assert cond is not None
    return cond


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 8192,
    k: int = 3,
) -> DataFrame:
    """Exact semi join of ``fact`` against ``dim`` keys, bloom-prefiltered:

    1. build the bitset over dim keys (few-KB driver artifact),
    2. drop fact rows failing the bloom INSIDE the scan stage (map-side —
       at scale this is what keeps the fact's shuffle proportional to the
       match count, not the table size),
    3. exact semi join on the survivors (false positives die here, so the
       result equals the plain semi join for ANY m_bits/k sizing).
    """
    words = build_bloom_words(dim, dim_key, m_bits=m_bits, k=k)
    pre = fact.filter(
        bloom_might_contain(F.col(fact_key), words, m_bits, k=k)
    )
    keys = dim.select(F.col(dim_key).alias(fact_key)).distinct()
    return pre.join(keys, fact_key, "left_semi")
