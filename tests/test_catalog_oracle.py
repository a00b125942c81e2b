"""Differential testing: every catalog query vs its DuckDB oracle.

Mirrors the driver's correctness gate: run the Spark DataFrame program and
the oracle SQL on the same parquet fixtures, compare row count, column
names, and the order-insensitive multiset of row values.
"""

from __future__ import annotations

import datetime
import math

import pytest

from cloudfloe_spark.queries import all_queries

CATALOG = all_queries()
ORACLE_CASES = sorted(n for n, q in CATALOG.items() if q.oracle is not None)
ROWS_ONLY_CASES = sorted(n for n, q in CATALOG.items() if q.oracle is None)


def _norm(v):
    """Normalize a cell for comparison across engines."""
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse float noise below round-trip significance
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        # Mirror the driver's pandas canonicalizer, which cannot hash
        # top-level list cells (TypeError: unhashable type: 'list' — the
        # r02/r03 red-row class). Fail loudly here so the in-repo gate is
        # at least as strict as the driver's.
        raise TypeError(
            "top-level list cell reached comparison; stringify the array "
            "column (F.array_join / array_to_string) on both sides"
        )
    if isinstance(v, int):
        return int(v)
    return v


def _spark_numeric_family(dt) -> str:
    """Map a Spark type to the pandas numeric family the driver sees."""
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    return "other"


def _pandas_numeric_family(dtype) -> str:
    import pandas.api.types as pt

    if pt.is_bool_dtype(dtype):
        return "other"
    if pt.is_integer_dtype(dtype):
        return "int"
    if pt.is_float_dtype(dtype):
        return "float"
    return "other"


def _assert_dtype_families_match(name, df, duck, oracle):
    """Mirror the driver's dtype-sensitive hash: DuckDB results reach the
    driver through pandas (`.df()`), where HUGEINT (bare COUNT_IF, SUM over
    integer inputs) renders as float64 while the Spark twin is int64 — the
    values compare equal in Python (2129 == 2129.0) but the driver's hash
    diverges. This is the class behind every red row in r02-r04.

    Rule: an int-family/float-family split between Spark's schema and the
    oracle's pandas rendering fails, EXCEPT when the Spark side is integral
    and the oracle column's float-ness comes from null promotion (both
    engines promote nullable ints to float64 identically, so the driver
    hash still matches).
    """
    odf = duck.execute(oracle).df()
    offenders = []
    for field in df.schema.fields:
        sfam = _spark_numeric_family(field.dataType)
        dfam = _pandas_numeric_family(odf[field.name].dtype)
        if {sfam, dfam} != {"int", "float"}:
            continue
        if sfam == "int" and dfam == "float" and odf[field.name].isna().any():
            continue  # null promotion hits both engines the same way
        offenders.append(
            f"{field.name}: spark={field.dataType.simpleString()}({sfam}) "
            f"oracle-pandas={odf[field.name].dtype}({dfam})"
        )
    assert not offenders, (
        f"{name}: int/float family drift between Spark and the oracle's "
        "pandas rendering (driver hash would diverge). For DuckDB "
        "HUGEINT producers (COUNT_IF, SUM over integer inputs) add "
        f"CAST(... AS BIGINT) in the oracle: {offenders}"
    )


def _spark_rows(df, cols):
    return sorted(
        (tuple(_norm(row[c]) for c in cols) for row in df.collect()), key=repr
    )


def _duck_rows(con, sql, cols):
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    rows = cur.fetchall()
    idx = [names.index(c) for c in cols]
    return sorted((tuple(_norm(r[i]) for i in idx) for r in rows), key=repr)


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_query_matches_oracle(name, spark, duck, sf_dir):
    q = CATALOG[name]
    df = q.fn(spark, sf_dir)

    spark_cols = sorted(df.columns)
    cur = duck.execute(q.oracle)
    duck_cols = sorted(d[0] for d in cur.description)
    assert spark_cols == duck_cols, (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    _assert_dtype_families_match(name, df, duck, q.oracle)

    got = _spark_rows(df, spark_cols)
    want = _duck_rows(duck, q.oracle, spark_cols)
    assert len(got) == len(want), (
        f"{name}: row count spark={len(got)} duck={len(want)}"
    )
    mismatches = [
        (g, w) for g, w in zip(got, want) if g != w
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first 3: {mismatches[:3]}"
    )


@pytest.mark.parametrize("name", ROWS_ONLY_CASES)
def test_rows_only_query_runs(name, spark, sf_dir):
    q = CATALOG[name]
    df = q.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_no_toplevel_array_or_map_outputs(spark, sf_dir):
    """Catalog-wide guard: no registered query may return a top-level
    array/map column.

    The driver's correctness gate canonicalizes results through pandas,
    which cannot hash list cells — this class produced the only red row in
    rounds 2 AND 3 (`dedup_minhash_signatures`, `agg_collect_sorted`).
    Schema analysis only for batch entries; streaming entries are SKIPPED
    here because their fn() runs the stream to completion just to build
    the DataFrame — they stay covered by the oracle comparison itself,
    whose `_norm` raises on any top-level list cell.
    """
    from pyspark.sql.types import ArrayType, MapType

    offenders = []
    for name, q in sorted(CATALOG.items()):
        if "streaming" in (q.tags or ()):
            continue
        df = q.fn(spark, sf_dir)
        for field in df.schema.fields:
            if isinstance(field.dataType, (ArrayType, MapType)):
                offenders.append(f"{name}.{field.name}: {field.dataType.simpleString()}")
    assert not offenders, (
        "top-level array/map output columns crash the driver canonicalizer; "
        "stringify with F.array_join on the Spark side and array_to_string "
        f"in the oracle: {offenders}"
    )


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_contract_shape():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert len(qs) >= 40, f"catalog too small: {len(qs)}"
    assert set(os_) <= set(qs)
