"""SQL policy layer: read-only validation + LIMIT injection (A1/A2/A8/A9).

Re-implements the reference's sqlglot-based gate (`backend/main.py:36-111`)
without a third-party parser. Two complementary gates:

1. :func:`validate_and_limit_sql` — a lexical gate built on a small SQL
   tokenizer (comment/string-aware). It enforces the reference's policy:
   single statement; top level must be SELECT / WITH / VALUES / a
   parenthesized query; no side-effecting statement keyword anywhere
   (`backend/main.py:45-62,95-100`), extended with Spark-side effects the
   DuckDB list doesn't know about (SET, CACHE, REFRESH, ANALYZE, …) per
   SURVEY.md §2B. It also injects an outer ``LIMIT row_limit`` iff the
   statement has none at top level (`backend/main.py:104-110` — never
   overrides a user LIMIT, pinned by
   `backend/tests/test_sql_validation.py:10-14`).

2. :func:`assert_plan_is_query` — defence in depth using Spark's own
   parser (`sessionState().sqlParser().parsePlan``): the parsed logical
   plan must not be or contain a command/DML node. This runs BEFORE
   ``spark.sql`` ever sees the text (``spark.sql`` executes commands
   eagerly, so guarding after the fact would be too late).

Design note vs the reference: a token-level keyword scan can false-positive
on unquoted identifiers that happen to be statement keywords (a column
literally named ``copy``). That direction is safe — valid-but-odd queries
get rejected, side effects never get through — and quoting the identifier
(`"copy"`) unblocks the query.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from cloudfloe_spark.service.errors import bad_request

# --- tokenizer --------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
      --[^\n]*                      # line comment
    | /\*.*?\*/                     # block comment (non-nesting)
    | '(?:[^']|'')*'                # single-quoted string ('' escape)
    | "(?:[^"]|"")*"                # double-quoted identifier
    | `(?:[^`]|``)*`                # backtick identifier (Spark)
    | [A-Za-z_][A-Za-z0-9_$]*       # word
    | \d+(?:\.\d*)?(?:[eE][+-]?\d+)?  # number
    | ::                            # cast operator
    | <> | \|\| | [<>!=]=?          # operators (multi-char first)
    | [(),;*+\-/%.\[\]{}:&|^~?@#]   # punctuation
    | \s+                           # whitespace
    """,
    re.VERBOSE | re.DOTALL,
)


@dataclass(frozen=True)
class Token:
    text: str
    kind: str  # word | string | quoted_ident | number | punct | comment | ws


def _classify(t: str) -> str:
    c = t[0]
    if c in " \t\r\n\f\v":
        return "ws"
    if t.startswith("--") or t.startswith("/*"):
        return "comment"
    if c == "'":
        return "string"
    if c in '"`':
        return "quoted_ident"
    if c.isdigit():
        return "number"
    if c.isalpha() or c == "_":
        return "word"
    return "punct"


def tokenize(sql: str) -> list[Token]:
    """Lex ``sql``; raises 400 on an unterminated string/comment.

    Every character must be consumed by some token — a lexer gap would mean
    the policy scan could be blind to part of the input, so any unmatched
    character is a hard error rather than a skip.
    """
    out: list[Token] = []
    pos = 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if not m:
            raise bad_request(f"Invalid SQL: unexpected character {sql[pos]!r}")
        text = m.group(0)
        kind = _classify(text)
        if kind == "string" and (len(text) < 2 or not text.endswith("'")):
            raise bad_request("Invalid SQL: unterminated string literal")
        if kind == "comment" and text.startswith("/*") and not text.endswith("*/"):
            raise bad_request("Invalid SQL: unterminated comment")
        out.append(Token(text, kind))
        pos = m.end()
    return out


def _code_tokens(tokens: list[Token]) -> list[Token]:
    return [t for t in tokens if t.kind not in ("ws", "comment")]


# --- policy -----------------------------------------------------------------

# Statement keywords that may legitimately start a read-only query
# (`backend/main.py:36-43`; `(` covers parenthesized set-op operands).
_ALLOWED_FIRST = {"SELECT", "WITH", "VALUES", "("}

# Side-effecting statement keywords, forbidden ANYWHERE in the text
# (`backend/main.py:45-62` + Spark-specific additions per SURVEY.md §2B).
# Only words that cannot appear as bare keywords inside a valid SELECT
# belong here; statement starters that are also SELECT-internal keywords
# (DESC, SHOW has no conflict but EXPLAIN/DESCRIBE/TABLE do) are handled
# by the first-token allowlist instead.
_FORBIDDEN_WORDS = {
    # DuckDB-reference list (backend/main.py:45-62)
    "INSERT",
    "UPDATE",
    "DELETE",
    "CREATE",
    "DROP",
    "ALTER",
    "TRUNCATE",
    "COMMIT",
    "ROLLBACK",
    "TRANSACTION",
    "ATTACH",
    "DETACH",
    "MERGE",
    "COPY",
    "PRAGMA",
    "INSTALL",
    # Spark-specific side effects (SURVEY.md §2B)
    "SET",
    "RESET",
    "CACHE",
    "UNCACHE",
    "REFRESH",
    "ANALYZE",
    "MSCK",
    "GRANT",
    "REVOKE",
    "CALL",
    "EXPORT",
    "IMPORT",
}
# USE is forbidden as a statement but `USING` / window `USE`... USE never
# appears inside a SELECT either; keep it in the anywhere-list.
_FORBIDDEN_WORDS.add("USE")

# Expression-level side channels: Spark builtins that invoke arbitrary
# static JVM methods from inside a plain SELECT (CallMethodViaReflection).
# e.g. java_method('java.lang.System','getenv','AWS_SECRET_ACCESS_KEY')
# leaks credentials and java_method('java.lang.System','exit',1) kills the
# shared JVM — neither is a statement keyword nor a command plan node, so
# the two statement-level gates above cannot see them. Blocked as
# function-CALL tokens (name immediately followed by '('), including the
# backtick-quoted (`reflect`(...)) and system.builtin-qualified spellings.
_FORBIDDEN_FUNCTIONS = {"reflect", "java_method", "try_reflect"}


def split_statements(tokens: list[Token]) -> list[list[Token]]:
    """Split on top-level ``;`` — empty trailing segments are dropped, so
    ``SELECT 1;`` is one statement but ``SELECT 1; SELECT 2`` is two."""
    stmts: list[list[Token]] = [[]]
    for t in tokens:
        if t.kind == "punct" and t.text == ";":
            stmts.append([])
        else:
            stmts[-1].append(t)
    return [s for s in stmts if _code_tokens(s)]


def _has_top_level_limit(code: list[Token]) -> bool:
    depth = 0
    for t in code:
        if t.kind == "punct":
            if t.text == "(":
                depth += 1
            elif t.text == ")":
                depth -= 1
        elif t.kind == "word" and depth == 0 and t.text.upper() == "LIMIT":
            return True
    return False


def validate_statement_shape(sql: str) -> list[Token]:
    """Policy checks WITHOUT LIMIT injection: single statement, allowed
    first token, no forbidden statement keyword / JVM-function call,
    balanced parentheses. Returns the statement's code tokens.

    This is the pre-rewrite gate: :func:`run_query` calls it on the raw
    request text BEFORE any side-effectful rewrite (file reads register
    temp views and run schema inference), so a request that will be
    rejected never triggers a file load — matching the reference, which
    validates first (`backend/main.py:567-575`)."""
    if not sql or not sql.strip():
        raise bad_request("Empty query")

    tokens = tokenize(sql)
    statements = split_statements(tokens)
    if len(statements) == 0:
        raise bad_request("Empty query")
    if len(statements) > 1:
        raise bad_request("Only a single SQL statement is allowed")

    code = _code_tokens(statements[0])
    first = code[0]
    first_word = first.text.upper() if first.kind == "word" else first.text
    if first_word not in _ALLOWED_FIRST:
        raise bad_request(
            f"Only SELECT queries are allowed (got {first_word})"
        )

    for t in code:
        if t.kind == "word" and t.text.upper() in _FORBIDDEN_WORDS:
            raise bad_request(
                f"{t.text.upper()} statements are not allowed"
            )

    for i, t in enumerate(code):
        name = None
        if t.kind == "word":
            name = t.text.lower()
        elif t.kind == "quoted_ident":
            inner = t.text[1:-1]
            quote = t.text[0]
            name = inner.replace(quote * 2, quote).lower()
        if (
            name in _FORBIDDEN_FUNCTIONS
            and i + 1 < len(code)
            and code[i + 1].text == "("
        ):
            raise bad_request(
                f"Function {name} is not allowed (invokes arbitrary JVM "
                "methods from SQL)"
            )

    # Structural sanity: parentheses must balance. Unbalanced input is
    # never valid SQL, and (found by fuzzing) it breaks the top-level
    # LIMIT detection — 'LIMIT' after an unclosed '(' sits at depth>0, so
    # injection would stack a second LIMIT on every re-validation.
    depth = 0
    for t in code:
        if t.kind == "punct":
            if t.text == "(":
                depth += 1
            elif t.text == ")":
                depth -= 1
                if depth < 0:
                    raise bad_request("Invalid SQL: unbalanced parentheses")
    if depth != 0:
        raise bad_request("Invalid SQL: unbalanced parentheses")

    return code


def validate_and_limit_sql(sql: str, row_limit: int) -> str:
    """Validate ``sql`` as one read-only query; append ``LIMIT row_limit``
    iff no top-level LIMIT exists. Returns the normalized statement
    (comments stripped, whitespace collapsed). Raises 400 otherwise.

    Port of `_validate_and_limit_sql` (`backend/main.py:65-111`).
    """
    code = validate_statement_shape(sql)
    # Re-emit: original code tokens, single-space separated (comment
    # stripping + whitespace normalization ≈ the reference's sqlglot
    # re-emission at backend/main.py:111). The injected LIMIT goes through
    # the SAME renderer as everything else — a plain string append is not
    # a fixed point of _render when the statement ends in a no-space-after
    # token (fuzz: '().' → '(). LIMIT n' → '().LIMIT n' on re-validation).
    if not _has_top_level_limit(code):
        code = code + [
            Token("LIMIT", "word"),
            Token(str(int(row_limit)), "number"),
        ]
    return _render(code)


_NO_SPACE_BEFORE = {",", ")", ".", ";", "::", "]"}
_NO_SPACE_AFTER = {"(", ".", "::", "["}


def _render(code: list[Token]) -> str:
    parts: list[str] = []
    prev: Token | None = None
    for t in code:
        if parts and not (
            t.text in _NO_SPACE_BEFORE
            or (prev is not None and prev.text in _NO_SPACE_AFTER)
        ):
            parts.append(" ")
        parts.append(t.text)
        prev = t
    return "".join(parts)


# --- Spark-parser defence in depth -------------------------------------------

# Logical-plan node names that indicate a side effect. The lexical gate is
# the primary policy; this catches anything that slips through it once a
# SparkSession is available. Spark parses all DDL/DML/commands into plans
# whose class names appear in the plan tree string.
_FORBIDDEN_PLAN_NODES = (
    "InsertIntoStatement",
    "InsertIntoDir",
    "UpdateTable",
    "DeleteFromTable",
    "MergeIntoTable",
    "CreateTable",
    "CreateView",
    "CreateNamespace",
    "CreateFunction",
    "DropTable",
    "DropView",
    "DropNamespace",
    "DropFunction",
    "AlterTable",
    "AlterColumns",
    "RenameTable",
    "SetCatalogAndNamespace",
    "SetNamespace",
    "SetCommand",
    "ResetCommand",
    "CacheTable",
    "UncacheTable",
    "RefreshTable",
    "RefreshFunction",
    "AnalyzeTable",
    "AnalyzeColumn",
    "AddJarsCommand",
    "AddFilesCommand",
    "TruncateTable",
    "RepairTable",
    "LoadData",
    "CommentOn",
    "Call",
)


def assert_plan_is_query(spark, sql: str) -> None:
    """Parse ``sql`` with Spark's own parser and reject command/DML plans.

    MUST be called before ``spark.sql(sql)`` — Spark executes commands
    eagerly on ``sql()``. Catalyst analog of the reference's AST walk
    (`backend/main.py:95-100`).
    """
    try:
        plan = spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)
    except Exception as e:  # ParseException via py4j
        raise bad_request(f"Invalid SQL: {_first_line(str(e))}") from None
    tree = plan.toString()
    for node in _FORBIDDEN_PLAN_NODES:
        if node in tree:
            raise bad_request(f"{node} is not allowed (read-only endpoint)")
    # Reflection-call expressions render as 'reflect(…)/'java_method(…) in
    # the unresolved tree. Substring scan — a string literal containing
    # "reflect(" also trips it, which is the safe direction (rejected
    # query, never a leaked side effect); the lexical gate above is the
    # precise primary check.
    low = tree.lower()
    for fn in _FORBIDDEN_FUNCTIONS:
        if f"{fn}(" in low:
            raise bad_request(
                f"Function {fn} is not allowed (invokes arbitrary JVM "
                "methods from SQL)"
            )


def _first_line(s: str) -> str:
    return s.strip().splitlines()[0] if s.strip() else "parse error"


# --- input allowlists (A9, backend/main.py:120-131) ---------------------------

ENDPOINT_RE = re.compile(r"^[A-Za-z0-9\-._:/@+%]+$")
REGION_RE = re.compile(r"^[A-Za-z0-9\-]+$")
SESSION_TOKEN_RE = re.compile(r"^[A-Za-z0-9+/=\-_.]+$")
URL_RE = re.compile(r"^https?://[A-Za-z0-9\-._:/@]+$")
SQL_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
# Reference allows only s3:// (backend/main.py:125); the port additionally
# accepts file:// and absolute local paths so the engine is testable and
# usable against local warehouses.
TABLE_PATH_RE = re.compile(r"^(s3://[A-Za-z0-9\-._/]+|file://[A-Za-z0-9\-._/]+|/[A-Za-z0-9\-._/]+)$")


def require_match(value: str, pattern: re.Pattern[str], field: str) -> str:
    """Allowlist check (`backend/main.py:128-131`)."""
    if not pattern.fullmatch(value):
        raise ValueError(f"{field} contains invalid characters")
    return value


def sql_string_literal(value: str) -> str:
    """Quote a pre-validated string as a SQL literal: double embedded
    ``'``, reject control chars except tab (`backend/main.py:134-144`)."""
    if "\x00" in value or any(ord(c) < 0x20 and c != "\t" for c in value):
        raise ValueError("Value contains control characters")
    return "'" + value.replace("'", "''") + "'"
