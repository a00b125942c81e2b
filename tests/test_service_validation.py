"""SQL policy gate tests — ports the reference's pinned behaviors
(`backend/tests/test_sql_validation.py`, `test_sql_string_literal.py`)
plus the Spark-specific extensions from SURVEY.md §2B."""

from __future__ import annotations

import pytest

from cloudfloe_spark.service.errors import CloudfloeError
from cloudfloe_spark.service.validation import (
    sql_string_literal,
    validate_and_limit_sql,
)


# --- allow + LIMIT injection (test_sql_validation.py:3-14,36-44) -------------


def test_select_gets_limit_injected():
    out = validate_and_limit_sql("SELECT * FROM t", 100)
    assert out.endswith("LIMIT 100")


def test_user_limit_never_overridden():
    out = validate_and_limit_sql("SELECT * FROM t LIMIT 5", 100)
    assert "LIMIT 5" in out and "LIMIT 100" not in out


def test_cte_allowed_and_limited():
    out = validate_and_limit_sql("WITH c AS (SELECT 1 AS x) SELECT * FROM c", 50)
    assert out.startswith("WITH") and out.endswith("LIMIT 50")


def test_cte_inner_limit_does_not_count_as_outer():
    out = validate_and_limit_sql(
        "WITH c AS (SELECT 1 AS x LIMIT 3) SELECT * FROM c", 50
    )
    assert out.endswith("LIMIT 50")


def test_union_allowed():
    out = validate_and_limit_sql("SELECT 1 UNION SELECT 2", 10)
    assert out.endswith("LIMIT 10")


def test_values_allowed():
    out = validate_and_limit_sql("VALUES (1), (2)", 10)
    assert out.startswith("VALUES")


def test_parenthesized_setop_allowed():
    out = validate_and_limit_sql("(SELECT 1) UNION ALL (SELECT 2)", 10)
    assert out.endswith("LIMIT 10")


def test_trailing_semicolon_is_single_statement():
    assert validate_and_limit_sql("SELECT 1;", 10).endswith("LIMIT 10")


def test_comments_stripped():
    out = validate_and_limit_sql(
        "SELECT 1 -- trailing comment\n/* block */ AS x", 10
    )
    assert "comment" not in out and "block" not in out


# --- reject (test_sql_validation.py:16-34) ------------------------------------


@pytest.mark.parametrize(
    "sql",
    [
        "INSERT INTO t VALUES (1)",
        "DROP TABLE t",
        "DELETE FROM t",
        "UPDATE t SET x = 1",
        "CREATE TABLE t (x INT)",
        "ATTACH 'f' AS db",
        "TRUNCATE TABLE t",
        "MERGE INTO t USING s ON t.id = s.id WHEN MATCHED THEN DELETE",
        "COPY t TO 'f.csv'",
        # Spark-specific side effects (SURVEY.md §2B)
        "SET spark.sql.shuffle.partitions=1",
        "CACHE TABLE t",
        "REFRESH TABLE t",
        "ANALYZE TABLE t COMPUTE STATISTICS",
        "ADD JAR '/tmp/x.jar'",  # first-token rule
        "SHOW TABLES",  # Command in reference sqlglot → rejected
        "EXPLAIN SELECT 1",
        "DESCRIBE t",
    ],
)
def test_side_effecting_statements_rejected(sql):
    with pytest.raises(CloudfloeError) as e:
        validate_and_limit_sql(sql, 100)
    assert e.value.status_code == 400


def test_nested_side_effect_rejected():
    with pytest.raises(CloudfloeError):
        validate_and_limit_sql("WITH c AS (DELETE FROM t) SELECT 1", 100)


def test_multi_statement_rejected():
    with pytest.raises(CloudfloeError) as e:
        validate_and_limit_sql("SELECT 1; SELECT 2", 100)
    assert "single" in e.value.detail


def test_empty_rejected():
    for sql in ("", "   ", ";", "-- only a comment"):
        with pytest.raises(CloudfloeError) as e:
            validate_and_limit_sql(sql, 100)
        assert e.value.status_code == 400


def test_forbidden_word_inside_string_is_fine():
    out = validate_and_limit_sql("SELECT 'DROP TABLE t' AS s", 10)
    assert "'DROP TABLE t'" in out


def test_unterminated_string_rejected():
    with pytest.raises(CloudfloeError):
        validate_and_limit_sql("SELECT 'oops", 10)


# --- Spark-parser defence in depth --------------------------------------------


def test_plan_guard_rejects_commands(spark):
    from cloudfloe_spark.service.validation import assert_plan_is_query

    assert_plan_is_query(spark, "SELECT 1 AS x")  # passes
    for sql in (
        "DROP TABLE IF EXISTS t",
        "CREATE TABLE t (x INT) USING parquet",
        "INSERT INTO t VALUES (1)",
        "SET spark.foo=1",
    ):
        with pytest.raises(CloudfloeError):
            assert_plan_is_query(spark, sql)


@pytest.mark.parametrize(
    "sql",
    [
        "SELECT java_method('java.lang.System','getenv','AWS_SECRET_ACCESS_KEY')",
        "SELECT java_method('java.lang.System','exit',1)",
        "SELECT reflect('java.lang.Thread','sleep',60000)",
        "SELECT try_reflect('java.lang.System','getProperty','user.dir')",
        "SELECT Java_Method ('a','b')",  # case + space before paren
        "SELECT java_method/*c*/('a','b')",  # comment before paren
        "SELECT `reflect`('a','b')",  # backtick-quoted call
        'SELECT "reflect"(\'a\',\'b\')',  # double-quoted call
        "SELECT system.builtin.reflect('a','b')",  # qualified builtin
    ],
)
def test_reflection_builtins_rejected(sql):
    """reflect()/java_method() invoke arbitrary static JVM methods from a
    plain SELECT — credential leak / JVM kill on the shared session
    (ADVICE r01 high). Must be rejected lexically, in every spelling."""
    with pytest.raises(CloudfloeError):
        validate_and_limit_sql(sql, 100)


def test_reflection_builtins_rejected_by_plan_guard(spark):
    from cloudfloe_spark.service.validation import assert_plan_is_query

    for sql in (
        "SELECT java_method('java.lang.System','getenv','PATH')",
        "SELECT reflect('java.lang.UUID','randomUUID')",
    ):
        with pytest.raises(CloudfloeError):
            assert_plan_is_query(spark, sql)


def test_reflect_as_bare_identifier_still_allowed():
    """A column literally NAMED reflect (no call parens) stays legal —
    the block targets function calls, not identifiers."""
    out = validate_and_limit_sql("SELECT reflect FROM t", 100)
    assert out.startswith("SELECT reflect FROM t")


def test_reflect_inside_string_literal_still_allowed():
    out = validate_and_limit_sql("SELECT 'reflect(x)' AS s", 100)
    assert "reflect(x)" in out


def test_plan_guard_parse_error(spark):
    from cloudfloe_spark.service.validation import assert_plan_is_query

    with pytest.raises(CloudfloeError) as e:
        assert_plan_is_query(spark, "SELEC 1")
    assert "Invalid SQL" in e.value.detail


# --- literal escaping (test_sql_string_literal.py) -----------------------------


def test_literal_quotes_doubled():
    assert sql_string_literal("a'b") == "'a''b'"


def test_literal_tab_allowed():
    assert sql_string_literal("a\tb") == "'a\tb'"


@pytest.mark.parametrize("bad", ["a\x00b", "a\nb", "a\rb", "a\x1bb"])
def test_literal_control_chars_rejected(bad):
    with pytest.raises(ValueError):
        sql_string_literal(bad)
