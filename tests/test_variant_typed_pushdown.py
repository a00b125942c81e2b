"""Shredded-variant TYPED-PATH projection pushdown (r13, VERDICT r12
#2): ``variant_get(parse_json(col), '$.path', 'type')`` over an
``iceberg_scan`` is factored into a hidden scan column; file groups
whose shred descriptor carries the path as a pure ``typed_value`` chain
(no residual ``value`` anywhere along it, top-level residual column
absent) project the NATIVE parquet subcolumn — the plan contains no
Python stage and the FileScan's ReadSchema prunes to the subcolumn.
Everything else (unshredded files, residual-bearing layouts, joins,
``SELECT *``) falls back to the JSON surface, value-identical."""

from __future__ import annotations

import pyarrow as pa

from cloudfloe_spark.functions.variant import (
    encode_variant,
    shred_rows,
    shredded_typed_steps,
)
from cloudfloe_spark.service.config import ConnectionConfig
from cloudfloe_spark.sources.iceberg_fixture import LocalIcebergTable

T1 = 1700000000000

SHRED_TYPED_ONLY = {
    "kind": "object",
    "fields": {
        "a": {"value": False, "typed": {"kind": "int"}},
        "s": {"value": False, "typed": {"kind": "string"}},
        "n": {
            "value": False,
            "typed": {
                "kind": "object",
                "fields": {
                    "x": {"value": False, "typed": {"kind": "double"}}
                },
            },
        },
    },
}

OBJS = [{"a": i, "s": f"x{i}", "n": {"x": i * 0.5}} for i in range(8)] + [
    {"a": 99}  # s and n missing: both-null groups → NULL extraction
]


def _cfg():
    return ConnectionConfig(
        storageType="local", endpoint="", accessKey="", secretKey=""
    )


def _rows(spark, sql):
    from cloudfloe_spark.service.engine import run_query

    return [tuple(r) for r in run_query(spark, sql, _cfg()).rows]


def _typed_table(tmp_path, name="t"):
    col = shred_rows(OBJS, SHRED_TYPED_ONLY, top_value=False)
    tbl = pa.table(
        {"id": pa.array(list(range(len(OBJS))), pa.int64()), "v": col}
    )
    root = str(tmp_path / name)
    t = LocalIcebergTable(root, tbl.schema, variant_cols=("v",))
    t.append_snapshot([tbl], timestamp_ms=T1)
    return root, t


def _plan(spark, sql):
    from cloudfloe_spark.service.iceberg_local import resolve_iceberg_reads
    from cloudfloe_spark.sources.tables import ensure_runtime_conf

    sess = spark.newSession()
    ensure_runtime_conf(sess)
    resolved = resolve_iceberg_reads(sess, sql)
    return (
        resolved,
        sess.sql(resolved)
        ._jdf.queryExecution()
        .executedPlan()
        .toString(),
    )


def test_typed_steps_resolution():
    d = SHRED_TYPED_ONLY
    assert shredded_typed_steps(d, ["a"], "bigint") == [
        "typed_value", "a", "typed_value",
    ]
    assert shredded_typed_steps(d, ["n", "x"], "double") == [
        "typed_value", "n", "typed_value", "x", "typed_value",
    ]
    # kind mismatch, unknown field, unsupported type → None
    assert shredded_typed_steps(d, ["a"], "string") is None
    assert shredded_typed_steps(d, ["zz"], "bigint") is None
    assert shredded_typed_steps(d, ["a"], "int") is None
    # a residual-bearing leaf can hide the datum → None
    resid = {
        "kind": "object",
        "fields": {"a": {"value": True, "typed": {"kind": "int"}}},
    }
    assert shredded_typed_steps(resid, ["a"], "bigint") is None


def test_pushdown_values_and_plan(spark, tmp_path):
    root, _ = _typed_table(tmp_path)
    got = _rows(
        spark,
        "SELECT sum(variant_get(parse_json(v), '$.a', 'bigint')) AS s, "
        "count(try_variant_get(parse_json(v), '$.s', 'string')) AS n, "
        "sum(variant_get(parse_json(v), '$.n.x', 'double')) AS x "
        f"FROM iceberg_scan('{root}')",
    )
    assert got == [(sum(range(8)) + 99, 8, sum(i * 0.5 for i in range(8)))]
    _, plan = _plan(
        spark,
        "SELECT sum(variant_get(parse_json(v), '$.a', 'bigint')) AS s "
        f"FROM iceberg_scan('{root}')",
    )
    assert "ArrowEvalPython" not in plan
    assert "pythonudf" not in plan.lower()
    # column pruning reached the scan: only the typed subcolumn is read
    assert "typed_value:struct<a:struct<typed_value:bigint>>" in (
        plan.replace(" ", "")
    )


def test_pushdown_predicate_in_where(spark, tmp_path):
    root, _ = _typed_table(tmp_path)
    got = _rows(
        spark,
        f"SELECT id FROM iceberg_scan('{root}') "
        "WHERE variant_get(parse_json(v), '$.a', 'bigint') >= 6 "
        "ORDER BY id",
    )
    assert [r[0] for r in got] == [6, 7, 8]
    _, plan = _plan(
        spark,
        f"SELECT id FROM iceberg_scan('{root}') "
        "WHERE variant_get(parse_json(v), '$.a', 'bigint') >= 6",
    )
    assert "ArrowEvalPython" not in plan


def test_mixed_layouts_value_identical(spark, tmp_path):
    """Typed-only shredded + residual-bearing shredded + unshredded
    files in ONE table: the hidden column unions native projections
    with JSON-surface fallbacks — values identical to the pure
    JSON-surface computation."""
    root, t = _typed_table(tmp_path, "mix")
    # residual-bearing shredded file (type-mismatched 'a')
    shred2 = {
        "kind": "object",
        "fields": {"a": {"value": True, "typed": {"kind": "int"}}},
    }
    objs2 = [{"a": 1000}, {"a": "not-an-int"}]
    t.append_snapshot(
        [
            pa.table(
                {
                    "id": pa.array([100, 101], pa.int64()),
                    "v": shred_rows(objs2, shred2),
                }
            )
        ],
        timestamp_ms=T1 + 1000,
    )
    # unshredded file
    objs3 = [{"a": 2000, "s": "plain"}]
    t.append_snapshot(
        [
            pa.table(
                {
                    "id": pa.array([200], pa.int64()),
                    "v": pa.array(
                        [
                            dict(
                                zip(
                                    ("metadata", "value"),
                                    encode_variant(o),
                                )
                            )
                            for o in objs3
                        ],
                        pa.struct(
                            [
                                ("metadata", pa.binary()),
                                ("value", pa.binary()),
                            ]
                        ),
                    ),
                }
            )
        ],
        timestamp_ms=T1 + 2000,
    )
    got = _rows(
        spark,
        "SELECT sum(try_variant_get(parse_json(v), '$.a', 'bigint')) "
        f"AS s FROM iceberg_scan('{root}')",
    )
    assert got == [(sum(range(8)) + 99 + 1000 + 2000,)]
    # per-row spot check across all three layouts
    got = _rows(
        spark,
        "SELECT id, try_variant_get(parse_json(v), '$.a', 'bigint') "
        f"AS a FROM iceberg_scan('{root}') "
        "WHERE id IN (0, 100, 101, 200) ORDER BY id",
    )
    assert got == [(0, 0), (100, 1000), (101, None), (200, 2000)]


def test_no_rewrite_on_join_or_star(spark, tmp_path):
    root, _ = _typed_table(tmp_path)
    # SELECT * keeps the schema stable (no hidden columns leak)
    got = _rows(
        spark, f"SELECT * FROM iceberg_scan('{root}') WHERE id = 1"
    )
    assert len(got[0]) == 2  # (id, v) only
    # self-join still evaluates correctly (pushdown skipped, surface UDF)
    got = _rows(
        spark,
        "SELECT sum(variant_get(parse_json(x.v), '$.a', 'bigint')) AS s "
        f"FROM iceberg_scan('{root}') x "
        f"JOIN iceberg_scan('{root}') y ON x.id = y.id",
    )
    assert got == [(sum(range(8)) + 99,)]


def test_no_rewrite_on_cte_or_subquery(spark, tmp_path):
    """ADVICE r13 medium: a CTE or nested SELECT can derive/re-alias
    the variant column, so the hidden ``__cf_vx_*`` scan column would
    not be visible where the extraction sits — the rewrite must bail
    (the JSON-surface UDF path still answers, value-identical)."""
    root, _ = _typed_table(tmp_path)
    expected = [(sum(range(8)) + 99,)]
    # CTE re-exposing the variant column
    cte = (
        f"WITH c AS (SELECT id, v FROM iceberg_scan('{root}')) "
        "SELECT sum(variant_get(parse_json(v), '$.a', 'bigint')) AS s "
        "FROM c"
    )
    assert _rows(spark, cte) == expected
    resolved, _ = _plan(spark, cte)
    assert "__cf_vx_" not in resolved
    # derived-table (nested SELECT) alias
    sub = (
        "SELECT sum(variant_get(parse_json(w), '$.a', 'bigint')) AS s "
        f"FROM (SELECT v AS w FROM iceberg_scan('{root}'))"
    )
    assert _rows(spark, sub) == expected
    resolved, _ = _plan(spark, sub)
    assert "__cf_vx_" not in resolved
    # IN (SELECT ...) predicate — second select token, must also bail
    inq = (
        "SELECT sum(variant_get(parse_json(v), '$.a', 'bigint')) AS s "
        f"FROM iceberg_scan('{root}') WHERE id IN "
        f"(SELECT id FROM iceberg_scan('{root}') WHERE id < 8)"
    )
    assert _rows(spark, inq) == [(sum(range(8)),)]
    # a string literal containing the words must NOT trip the guard
    lit = (
        "SELECT variant_get(parse_json(v), '$.s', 'string') AS s "
        f"FROM iceberg_scan('{root}') "
        "WHERE variant_get(parse_json(v), '$.s', 'string') "
        "<> 'select with select' AND id = 1"
    )
    assert _rows(spark, lit) == [("x1",)]
    resolved, plan = _plan(spark, lit)
    assert "__cf_vx_" in resolved
    assert "ArrowEvalPython" not in plan


def test_qualified_alias_reference(spark, tmp_path):
    root, _ = _typed_table(tmp_path)
    got = _rows(
        spark,
        "SELECT sum(variant_get(parse_json(t.v), '$.a', 'bigint')) AS s "
        f"FROM iceberg_scan('{root}') t",
    )
    assert got == [(sum(range(8)) + 99,)]
    _, plan = _plan(
        spark,
        "SELECT sum(variant_get(parse_json(t.v), '$.a', 'bigint')) AS s "
        f"FROM iceberg_scan('{root}') t",
    )
    assert "ArrowEvalPython" not in plan


def test_json_surface_still_whole(spark, tmp_path):
    """Referencing BOTH an extraction and the full JSON column keeps
    the surface whole (the reassembly UDF still feeds ``v``)."""
    root, _ = _typed_table(tmp_path)
    got = _rows(
        spark,
        "SELECT variant_get(parse_json(v), '$.a', 'bigint') AS a, v "
        f"FROM iceberg_scan('{root}') WHERE id = 1",
    )
    assert got == [(1, '{"a":1,"n":{"x":0.5},"s":"x1"}')]


def test_get_json_object_pushdown_string_leaf(spark, tmp_path):
    """r13: get_json_object over a typed-only STRING leaf is served
    natively (a JSON string value renders as its raw string); other
    leaves keep the surface expression, value-identical."""
    root, _ = _typed_table(tmp_path)
    got = _rows(
        spark,
        "SELECT count(get_json_object(v, '$.s')) AS n, "
        "max(get_json_object(v, '$.s')) AS m, "
        "max(get_json_object(v, '$.a')) AS a "
        f"FROM iceberg_scan('{root}')",
    )
    assert got == [(8, "x7", "99")]
    _, plan = _plan(
        spark,
        "SELECT count(get_json_object(v, '$.s')) AS n "
        f"FROM iceberg_scan('{root}')",
    )
    assert "ArrowEvalPython" not in plan
