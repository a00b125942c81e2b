"""Property-based fuzzing of the SQL policy gate.

The validator is a security boundary (it decides what reaches
``spark.sql``), so it must never crash, never let a forbidden statement
keyword through outside a string literal, and stay idempotent on its own
output."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from cloudfloe_spark.service.errors import CloudfloeError
from cloudfloe_spark.service.validation import (
    _FORBIDDEN_WORDS,
    tokenize,
    validate_and_limit_sql,
)

sql_chars = st.text(
    alphabet=string.ascii_letters + string.digits + " \t\n'\"`()*,;._-<>=/+%[]{}:!|&^~?@#$\\",
    max_size=200,
)


@settings(max_examples=300, deadline=None)
@given(sql_chars)
def test_validator_never_crashes_unexpectedly(sql):
    """Any input → either a normalized string or CloudfloeError(400);
    nothing else may escape (a crash here is a 500 on the API)."""
    try:
        out = validate_and_limit_sql(sql, 100)
        assert isinstance(out, str) and out
    except CloudfloeError as e:
        assert e.status_code == 400
    except ValueError:
        pass  # int() of row_limit can't fail here; no other ValueError path


@settings(max_examples=300, deadline=None)
@given(sql_chars)
def test_no_forbidden_keyword_survives_outside_strings(sql):
    """If validation passes, the accepted text contains no forbidden
    statement keyword as a bare word token."""
    try:
        out = validate_and_limit_sql(sql, 100)
    except CloudfloeError:
        return
    for t in tokenize(out):
        if t.kind == "word":
            assert t.text.upper() not in _FORBIDDEN_WORDS, (sql, out)


@settings(max_examples=200, deadline=None)
@given(sql_chars)
def test_validation_idempotent_on_accepted_output(sql):
    """validate(validate(x)) == validate(x): normalization is a fixpoint
    (re-validating a stored normalized query must not change or reject it)."""
    try:
        once = validate_and_limit_sql(sql, 100)
    except CloudfloeError:
        return
    twice = validate_and_limit_sql(once, 100)
    assert twice == once


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=string.printable, max_size=100))
def test_tokenizer_covers_or_rejects_every_character(s):
    """The lexer either consumes the whole input or raises 400 — a silent
    gap would blind the policy scan."""
    try:
        toks = tokenize(s)
    except CloudfloeError:
        return
    assert "".join(t.text for t in toks) == s


_TRIGGERS = [
    "a::b",
    "x::INT",
    "string_split(",
    "UNNEST(",
    "read_parquet('s3://b/t')",
    "iceberg_scan('/x')",
    "reflect(",
]


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.sampled_from(_TRIGGERS),
            st.text(alphabet=string.ascii_letters + " ,.1", max_size=12),
        ),
        min_size=1,
        max_size=5,
    )
)
def test_transpile_never_rewrites_inside_string_literals(parts):
    """Any rewrite-trigger substring placed INSIDE a string literal must
    come out of the dialect transpile byte-identical (ADVICE r01: the
    reference's sqlglot transpile is literal-aware)."""
    from cloudfloe_spark.service.convert import (
        convert_scan_functions,
        transpile_duckdb,
    )

    payload = "".join(parts).replace("'", "''")
    sql = f"SELECT '{payload}' AS s FROM t"
    try:
        out = transpile_duckdb(convert_scan_functions(sql))
    except CloudfloeError:
        return  # lexer-rejected input (e.g. control chars) is fine
    assert out == sql, (sql, out)


@settings(max_examples=200, deadline=None)
@given(
    st.sampled_from(_TRIGGERS),
    st.text(alphabet=string.ascii_letters + " _", max_size=10),
)
def test_transpile_still_rewrites_code_next_to_literals(trigger, ident):
    """A literal containing a trigger must not suppress a REAL rewrite in
    the code region of the same statement."""
    from cloudfloe_spark.service.convert import transpile_duckdb

    payload = trigger.replace("'", "''")
    sql = f"SELECT x::INT, '{payload}' FROM t"
    out = transpile_duckdb(sql)
    assert out.startswith("SELECT CAST(x AS INT), "), out
    assert f"'{payload}'" in out, out
