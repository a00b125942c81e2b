"""Scan-rewrite + dialect-translation tests — ports
`backend/tests/test_query_conversion.py` and pins the transpiler on the
reference's demo corpus shapes (`backend/main.py:743-769`)."""

from __future__ import annotations

from cloudfloe_spark.service.config import ConnectionConfig
from cloudfloe_spark.service.convert import (
    convert_scan_functions,
    transpile_duckdb,
)


def _cfg(**kw):
    base = dict(storageType="s3", endpoint="e", accessKey="k", secretKey="s")
    base.update(kw)
    return ConnectionConfig(**base)


# --- read_parquet rewrite (test_query_conversion.py:3-37) ----------------------


def test_read_parquet_glob_passes_through_without_runtime():
    out = convert_scan_functions(
        "SELECT * FROM read_parquet('s3://b/wh/t/**/*.parquet')", _cfg()
    )
    assert "read_parquet" not in out
    assert "parquet.`s3://b/wh/t/**/*.parquet`" in out


def test_read_parquet_glob_becomes_table_root_with_runtime():
    out = convert_scan_functions(
        "SELECT * FROM read_parquet('s3://b/wh/t/**/*.parquet')",
        _cfg(),
        iceberg_available=True,
    )
    assert "iceberg.`s3://b/wh/t`" in out


def test_read_parquet_single_file_kept_verbatim():
    out = convert_scan_functions(
        "SELECT * FROM read_parquet('/data/t/orders.parquet')", _cfg()
    )
    assert "parquet.`/data/t/orders.parquet`" in out


def test_read_parquet_rest_catalog_rewritten_to_table_ref():
    cfg = _cfg(
        catalogType="rest",
        catalogEndpoint="http://cat:8181",
        namespace="analytics",
    )
    out = convert_scan_functions(
        "SELECT * FROM read_parquet('s3://b/wh/events/*.parquet')", cfg
    )
    assert "iceberg_catalog.analytics.events" in out


def test_non_matching_sql_untouched():
    sql = "SELECT * FROM my_table WHERE x > 1"
    assert convert_scan_functions(sql, _cfg()) == sql


def test_case_insensitive():
    out = convert_scan_functions(
        "SELECT * FROM READ_PARQUET('s3://b/t/*.parquet')", _cfg()
    )
    assert "READ_PARQUET" not in out and "read_parquet" not in out


# --- iceberg_* function mapping -------------------------------------------------


def test_iceberg_scan_mapped_to_engine_scan_form(tmp_path):
    # Remote root, no runtime → parquet over the root (undecidable layout)
    out = convert_scan_functions("SELECT * FROM iceberg_scan('s3://b/t')")
    assert out == "SELECT * FROM parquet.`s3://b/t`"
    # With the Iceberg runtime → native path read
    out = convert_scan_functions(
        "SELECT * FROM iceberg_scan('s3://b/t')", iceberg_available=True
    )
    assert out == "SELECT * FROM iceberg.`s3://b/t`"
    # Local Iceberg layout, no runtime → scan the data dir
    (tmp_path / "data").mkdir()
    out = convert_scan_functions(f"SELECT * FROM iceberg_scan('{tmp_path}')")
    assert out == f"SELECT * FROM parquet.`{tmp_path}/data`"


def test_iceberg_metadata_tables_mapped():
    assert (
        convert_scan_functions("SELECT * FROM iceberg_snapshots('s3://b/t')")
        == "SELECT * FROM iceberg.`s3://b/t`.snapshots"
    )
    assert (
        convert_scan_functions("SELECT * FROM iceberg_metadata('s3://b/t')")
        == "SELECT * FROM iceberg.`s3://b/t`.files"
    )


# --- duckdb → spark transpile ----------------------------------------------------


def test_string_split_renamed():
    assert transpile_duckdb("SELECT string_split(g, ',')") == "SELECT split(g, ',')"


def test_unnest_renamed():
    out = transpile_duckdb("SELECT UNNEST(string_split(genres, ',')) as genre")
    assert out == "SELECT explode(split(genres, ',')) as genre"


def test_cast_suffix_rewritten():
    assert (
        transpile_duckdb("SELECT COALESCE(SUM(rc),0)::BIGINT AS n")
        == "SELECT CAST(COALESCE(SUM(rc),0) AS BIGINT) AS n"
    )
    assert transpile_duckdb("SELECT x::INT") == "SELECT CAST(x AS INT)"
    assert (
        transpile_duckdb("SELECT '1'::DECIMAL(10,2)")
        == "SELECT CAST('1' AS DECIMAL(10,2))"
    )


def test_rewrites_never_fire_inside_literals():
    """Literal-awareness (ADVICE r01): the reference's sqlglot transpile
    never rewrites inside string literals / quoted identifiers / comments,
    so ours must not either."""
    keep = [
        "SELECT 'a::b' AS x",
        "SELECT 'string_split(' AS x",
        "SELECT 'read_parquet(''s3://b/t'')' AS x",
        'SELECT "a::b" FROM t',
        "SELECT 'UNNEST(xs)' AS s",
    ]
    for sql in keep:
        assert transpile_duckdb(sql) == sql, sql
        assert convert_scan_functions(sql) == sql, sql


def test_cast_of_string_literal_with_spaces():
    assert (
        transpile_duckdb("SELECT 'a b'::INT")
        == "SELECT CAST('a b' AS INT)"
    )


def test_cast_rewrite_skips_comment_but_rewrites_code():
    out = transpile_duckdb("SELECT x::INT -- c::d\nFROM t")
    assert out == "SELECT CAST(x AS INT) -- c::d\nFROM t"


def test_popular_genres_corpus_query_translates_and_runs(spark, sf_dir):
    """The reference's most dialect-heavy demo query (backend/main.py:767)
    end-to-end: rewrite + transpile + execute on Spark."""
    sql = (
        "SELECT TRIM(word) as word, COUNT(*) as count FROM "
        "(SELECT UNNEST(string_split(text, ' ')) as word "
        f"FROM read_parquet('{sf_dir}/documents.parquet')) "
        "GROUP BY word ORDER BY count DESC LIMIT 5"
    )
    out = convert_scan_functions(sql)
    out = transpile_duckdb(out)
    rows = spark.sql(out).collect()
    assert len(rows) == 5 and rows[0]["count"] >= rows[-1]["count"]


# --- DuckDB file table functions (read_csv/read_json) -------------------------


def test_read_csv_auto_over_run_query(spark, tmp_path):
    from cloudfloe_spark.service.config import ConnectionConfig
    from cloudfloe_spark.service.engine import run_query

    p = tmp_path / "people.csv"
    p.write_text("name,age\nada,36\ngrace,45\n")
    cfg = ConnectionConfig(
        storageType="local", endpoint="", accessKey="", secretKey=""
    )
    r = run_query(
        spark,
        f"SELECT name, age FROM read_csv_auto('{p}') ORDER BY age",
        cfg,
    )
    assert r.columns == ["name", "age"]
    assert r.rows == [["ada", 36], ["grace", 45]]


def test_read_json_over_run_query(spark, tmp_path):
    from cloudfloe_spark.service.config import ConnectionConfig
    from cloudfloe_spark.service.engine import run_query

    p = tmp_path / "rows.json"
    p.write_text('{"k": "a", "v": 1}\n{"k": "b", "v": 2}\n')
    cfg = ConnectionConfig(
        storageType="local", endpoint="", accessKey="", secretKey=""
    )
    r = run_query(
        spark, f"SELECT k, v FROM read_json('{p}') ORDER BY v", cfg
    )
    assert r.rows == [["a", 1], ["b", 2]]


def test_read_csv_missing_file_is_400(spark):
    import pytest as _pytest

    from cloudfloe_spark.service.config import ConnectionConfig
    from cloudfloe_spark.service.engine import run_query
    from cloudfloe_spark.service.errors import CloudfloeError

    cfg = ConnectionConfig(
        storageType="local", endpoint="", accessKey="", secretKey=""
    )
    with _pytest.raises(CloudfloeError) as e:
        run_query(spark, "SELECT * FROM read_csv('/no/such.csv')", cfg)
    assert e.value.status_code == 400


def test_read_csv_inside_literal_untouched(spark):
    from cloudfloe_spark.service.config import ConnectionConfig
    from cloudfloe_spark.service.engine import run_query

    cfg = ConnectionConfig(
        storageType="local", endpoint="", accessKey="", secretKey=""
    )
    r = run_query(spark, "SELECT 'read_csv(''/x.csv'')' AS s", cfg)
    assert r.rows[0][0] == "read_csv('/x.csv')"
