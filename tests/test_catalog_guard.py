"""Catalog-wide guards on oracle-checked entries.

The official correctness driver canonicalizes each result with a raw-column
``pandas.DataFrame.sort_values`` before hashing. That sort factorizes cell
values and dies with ``TypeError: unhashable type`` on list/dict cells — in
round 5 this killed ``embedding_quantize_int8`` and
``multimodal_feature_stats`` (both emitted a top-level array column) while
the local sim, which stringified rows before sorting, passed them blind.

Two layers of defense now exist:

1. ``tools/parity.canon`` performs the same raw-column sort (driver
   fidelity), so such an entry fails the local differential gate too.
2. This test statically bans container types (ArrayType / MapType /
   StructType) from the TOP-LEVEL schema of every oracle-checked entry —
   schema analysis only, no execution, so it covers all entries cheaply.
   Serialize arrays instead (``array_join`` in Spark, ``array_to_string``
   in DuckDB), as the two repaired entries now do.

Rows-only entries (``oracle is None``) are exempt: the driver never hashes
them, and container outputs (e.g. raw code arrays) are legitimate there.
"""

from pyspark.sql import types as T

from clickhouse_provider_spark.plans import CATALOG

_BANNED = (T.ArrayType, T.MapType, T.StructType)


def test_no_container_columns_in_oracle_checked_entries(spark, tables):
    offenders = {}
    for name, spec in CATALOG.items():
        if spec.oracle is None:
            continue
        schema = spec.build(spark, tables).schema  # analysis only, lazy
        bad = [
            f.name for f in schema.fields if isinstance(f.dataType, _BANNED)
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracle-checked entries emit container-typed top-level columns the "
        f"driver's canonicalizer cannot hash: {offenders} — serialize them "
        "(array_join / array_to_string) or drop the oracle"
    )


def test_quantile_merge_handles_single_sketch_groups(spark):
    """Regression: the KLL fold seeds with element_at(_sks, 1) (1-based).
    The 0-based _sks[1] bug dropped hour 1's sketch and THREW under ANSI
    mode for groups with exactly one hourly partial — sf0.001 has such
    groups, so building and checking the claim there pins both the
    crash and the dropped-partial distortion."""
    from clickhouse_provider_spark.plans import CATALOG
    from clickhouse_provider_spark.session import load_tables

    t = load_tables(spark, "/root/testdata/sf0.001")
    df = CATALOG["quantile_state_merge_rollup"].build(spark, t)
    assert df.filter("NOT merge_rank_within_5pct").count() == 0
    assert df.count() > 0


def test_parity_canon_rejects_list_cells_like_the_driver():
    """tools/parity.canon must die on list-typed cells the same way the
    official driver's raw-column sort does (round 5 shipped two blind
    reds because the sim stringified rows first and hashed them fine)."""
    import pandas as pd
    import pytest as _pytest

    from tools.parity import canon

    ok = pd.DataFrame({"a": [2, 1], "b": ["y", "x"]})
    cols, rows = canon(ok)
    assert cols == ["a", "b"] and len(rows) == 2
    bad = pd.DataFrame({"a": [1, 2], "codes": [[1, 2], [3, 4]]})
    with _pytest.raises(TypeError):
        canon(bad)
