"""Differential fuzz of the SQL safety gate against Spark's OWN parser.

The gate (`plans/safety.py`) is a lexical classifier; rounds 3 and 4
each surfaced a desync between its scanner and Spark's real lexer
(CTE-laundered DML, backslash escapes, comment markers in literals).
Example pins exist for each found hole — this test closes the CLASS:
hypothesis composes statements from adversarial fragments (escaped
literals, comment markers, parenthesized bodies, CTE chains) and
checks BOTH directions against `sqlParser().parsePlan`:

- soundness: any statement Spark parses to a plan containing a write
  node MUST be blocked by the gate (no laundering);
- precision: any statement Spark parses to a pure query plan MUST
  pass the gate (no false-positive blocks of valid reads).

Statements Spark itself rejects are skipped — the engine would fail
them at parse time regardless of the gate's verdict.

Reference behavior parity: `sql_generator.py:253-266` (demo-mode
write blocking) — here hardened to Spark's grammar instead of a
keyword prefix check.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from etl_generator_demo_spark.plans.safety import validate_sql_safety

# Logical-plan node class names that can mutate state. treeString()
# prints literal VALUES raw, but these are Scala class names — a
# string literal containing the SQL keyword "INSERT" cannot collide.
_WRITE_NODES = (
    "InsertIntoStatement",
    "InsertIntoDir",
    "DeleteFromTable",
    "UpdateTable",
    "MergeIntoTable",
    "DropTable",
    "DropView",
    "CreateTable",
    "CreateView",
    "ReplaceTable",
    "TruncateTable",
    "AlterTable",
    "LoadData",
)

# Expression fragments chosen to desync naive scanners: quote escapes
# (both families), comment markers inside literals, unbalanced parens
# inside literals, write keywords as data.
_EXPRS = (
    "1",
    "'a'",
    "''''",
    "'it''s'",
    "'\\''",
    "'a\\\\'",
    '"d\\""',
    "'--x'",
    "'/*'",
    "'*/'",
    "')'",
    "'(('",
    "'), y AS (SELECT 1) SELECT 1'",
    "'INSERT INTO t SELECT 1'",
    "'DROP TABLE t'",
    "';'",
    "'WITH'",
)

_COMMENTS = (
    "",
    " ",
    " -- c('\n",
    " /* ')-- */ ",
    " /* \"( */ ",
    # Spark bracketed comments NEST — a depth-unaware scanner ends the
    # comment at the first '*/' and resurfaces the tail as live SQL
    " /* /* x */ y */ ",
    " /* a /* b /* c */ */ d */ ",
    " /* /* ')( */ -- */ ",
    # Spark line comments CONTINUE over backslash-newline
    # (SIMPLE_COMMENT: '--' ('\\\n' | ~[\r\n])*) — found by the
    # round-7 grammar-aware fuzz, pinned in
    # test_line_comment_continuation_cannot_launder_writes
    " --\\\n swallowed line\n",
    " --\\\\\n also swallowed (double backslash re-pairs)\n",
)

_READ_BODIES = (
    "SELECT {e} AS v",
    "SELECT {e} AS v FROM src",
    "(SELECT {e} AS v)",
    "(SELECT 1) UNION ALL (SELECT 2)",
    "SELECT * FROM src WHERE s = {e}",
    "VALUES ({e})",
    "TABLE src",
)

_WRITE_BODIES = (
    "INSERT INTO t SELECT {e} AS v",
    "INSERT INTO t VALUES ({e})",
    "DELETE FROM t WHERE s = {e}",
    "UPDATE t SET s = {e}",
    "MERGE INTO t USING u ON t.a = u.a WHEN MATCHED THEN DELETE",
    "DROP TABLE t",
    "TRUNCATE TABLE t",
    "CREATE TABLE t (a INT)",
)

_expr = st.sampled_from(_EXPRS)
_comment = st.sampled_from(_COMMENTS)


@st.composite
def _statement(draw) -> str:
    body_t = draw(st.sampled_from(_READ_BODIES + _WRITE_BODIES))
    body = body_t.format(e=draw(_expr))
    parts = [draw(_comment)]
    n_ctes = draw(st.integers(min_value=0, max_value=3))
    if n_ctes:
        ctes = []
        for i in range(n_ctes):
            name = f"c{i}" if draw(st.booleans()) else f"`c``{i}`"
            cols = draw(st.sampled_from(("", "(s)", "(2b)")))
            ctes.append(
                f"{name}{cols} AS (SELECT {draw(_expr)} AS s)"
            )
        parts += ["WITH ", ", ".join(ctes), draw(_comment), " "]
    parts += [body, draw(_comment)]
    if draw(st.booleans()):
        parts.append(";")
    return "".join(parts)


@pytest.fixture(scope="module")
def parser(spark):
    return spark._jsparkSession.sessionState().sqlParser()


@settings(max_examples=400, deadline=None, derandomize=True)
@given(sql=_statement())
def test_gate_agrees_with_spark_parser(parser, sql):
    try:
        tree = parser.parsePlan(sql).treeString()
    except Exception:
        return  # Spark rejects it; the gate's verdict is moot
    is_write = any(node in tree for node in _WRITE_NODES)
    v = validate_sql_safety(sql, allow_writes=False)
    if is_write:
        assert v.is_blocked and v.is_write, (
            f"gate passed a statement Spark parses as a write:\n{sql!r}\n{tree}"
        )
    else:
        assert not v.is_blocked and not v.is_write, (
            f"gate blocked a statement Spark parses as a pure read "
            f"({v.reason}):\n{sql!r}\n{tree}"
        )


def test_write_nodes_cover_every_write_body(parser):
    """Meta-check: each write-body template actually parses to a plan
    containing one of the pinned write node names (else the fuzz
    property would silently stop testing that statement family)."""
    for body_t in _WRITE_BODIES:
        sql = body_t.format(e="1")
        tree = parser.parsePlan(sql).treeString()
        assert any(n in tree for n in _WRITE_NODES), f"{sql}: {tree}"


# ---------------------------------------------------------------------------
# Round 7 (r6 verdict advice #6): grammar-aware generation. The r6
# nested-comment hole was found by review, not by this fuzz — the
# hand-seeded corpus above only contains trivia shapes someone already
# thought of. The strategies below BUILD trivia and literals from the
# lexer grammar itself: bracketed comments nest recursively around
# adversarial character soup, line comments carry arbitrary content,
# string literals interleave BOTH escape families with comment markers
# and unicode escapes, backquoted identifiers embed quotes/comment
# markers, and trivia is interleaved between EVERY token of the
# statement — so the next scanner/lexer divergence is a generated
# example, not a review find.
# ---------------------------------------------------------------------------

# character soup for comment interiors: quote chars, paren/semicolon
# structure chars, escape chars, keyword fragments. Sanitized so that
# comment DELIMITERS only come from the explicit recursion below.
_soup = st.text(
    alphabet="ab'\"`()*;,-/\\nu0DROPINSET x\n",
    max_size=10,
).map(lambda s: s.replace("*/", "* /").replace("/*", "/ *"))

_ws = st.sampled_from([" ", "\n", "\t", "  ", "\r\n"])
_line_comment = st.one_of(
    _soup.map(lambda s: "--" + s.replace("\n", "") + "\n"),
    # explicit backslash-newline CONTINUATION (Spark SIMPLE_COMMENT:
    # '--' ('\\\n' | ~[\r\n])*): the second line is STILL comment —
    # this exact shape produced the round-7 laundering find
    st.tuples(_soup, _soup).map(
        lambda t: "--"
        + t[0].replace("\n", "")
        + "\\\n"
        + t[1].replace("\n", "")
        + "\n"
    ),
)
_bracketed_comment = st.recursive(
    _soup.map(lambda s: f"/*{s}*/"),
    lambda inner: st.tuples(_soup, inner, _soup, st.one_of(inner, st.just("")), _soup).map(
        lambda t: "/*" + "".join(t) + "*/"
    ),
    max_leaves=5,
)
#: token separator: at least one whitespace/comment unit (comments ARE
#: separators in Spark's lexer), optionally several interleaved.
#: Whitespace-weighted (comments ~1 in 3 draws) so most generated
#: statements stay parseable — the differential property only bites
#: on statements Spark accepts.
_trivia_unit = st.integers(0, 5).flatmap(
    lambda k: _ws if k < 4 else (_line_comment if k == 4 else _bracketed_comment)
)
_sep = st.lists(_trivia_unit, min_size=1, max_size=3).map("".join)

# string-literal interior units: both escape families, the OTHER quote
# family, comment markers, structure chars, unicode escapes, DML text
_sq_unit = st.sampled_from(
    ["a", "''", "\\'", "\\\\", "--", "/*", "*/", "(", ")", ";", '"', "`",
     "\\u0027", "\\u005c", "DROP TABLE t", ", y AS (SELECT 1) INSERT INTO t SELECT 1"]
)
_dq_unit = st.sampled_from(
    ["a", '""', '\\"', "\\\\", "--", "/*", "*/", "(", ")", ";", "'", "`",
     "\\u0022", "INSERT INTO t VALUES (1)"]
)
_lit_single = st.lists(_sq_unit, max_size=5).map(lambda u: "'" + "".join(u) + "'")
_lit_double = st.lists(_dq_unit, max_size=5).map(lambda u: '"' + "".join(u) + '"')
_literal = st.one_of(st.just("1"), _lit_single, _lit_double)

# backquoted identifiers: doubled-backtick escape; quotes, comment
# markers and structure chars are ORDINARY characters inside
_bq_unit = st.sampled_from(["a", "``", "'", '"', "--", "/*", "*/", "(", ")", ";", " "])
_bq_ident = st.lists(_bq_unit, max_size=4).map(lambda u: "`" + "".join(u) + "`")
# digit-leading plain names are legal Spark identifiers (lexer:
# (LETTER|DIGIT|'_')+, maximal munch) — the round-8 advice exploit class
_ident = st.one_of(st.just("v"), st.just("2b"), _bq_ident)


@st.composite
def _grammar_statement(draw) -> tuple[str, bool]:
    """A statement with grammar-generated trivia between every token.
    Returns (sql, wrote) where `wrote` is the generator's intent —
    used only to bias coverage reporting, the property still asks
    Spark's parser for the truth."""
    s = lambda: draw(_sep)  # noqa: E731 — fresh trivia at every seam
    e = draw(_literal)
    ident = draw(_ident)
    kind = draw(st.integers(0, 11))
    if kind == 0:
        body, wrote = f"SELECT{s()}{e}{s()}AS{s()}{ident}", False
    elif kind == 1:
        body, wrote = f"SELECT{s()}*{s()}FROM{s()}src{s()}WHERE{s()}s{s()}={s()}{e}", False
    elif kind == 2:
        body, wrote = f"({s()}SELECT{s()}{e}{s()}AS{s()}{ident}{s()})", False
    elif kind == 3:
        body, wrote = f"VALUES{s()}({s()}{e}{s()})", False
    elif kind == 4:
        body, wrote = f"INSERT{s()}INTO{s()}t{s()}SELECT{s()}{e}{s()}AS{s()}{ident}", True
    elif kind == 5:
        body, wrote = f"DELETE{s()}FROM{s()}t{s()}WHERE{s()}s{s()}={s()}{e}", True
    elif kind == 6:
        body, wrote = f"UPDATE{s()}t{s()}SET{s()}s{s()}={s()}{e}", True
    elif kind == 7:
        body, wrote = f"DROP{s()}TABLE{s()}t", True
    elif kind == 8:
        body, wrote = f"TABLE{s()}src", False
    elif kind == 9:
        # AS-omitted CTE-in-view composition: CREATE is a write no
        # matter how read-shaped its query body is
        body, wrote = (
            f"CREATE{s()}VIEW{s()}v{s()}AS{s()}SELECT{s()}{e}{s()}AS{s()}{ident}",
            True,
        )
    elif kind == 10:
        body, wrote = f"INSERT{s()}OVERWRITE{s()}TABLE{s()}t{s()}SELECT{s()}{e}", True
    else:
        body, wrote = f"MERGE{s()}INTO{s()}t{s()}USING{s()}u{s()}ON{s()}t.a{s()}={s()}u.a{s()}WHEN{s()}MATCHED{s()}THEN{s()}DELETE", True
    n_ctes = draw(st.integers(0, 2))
    if n_ctes:
        ctes = []
        for i in range(n_ctes):
            name = draw(st.one_of(st.just(f"c{i}"), st.just(f"`c`` {i}'--`")))
            cols = draw(st.sampled_from(["", "(s)", "(2b)"]))
            # AS is optional in namedQuery — omit it only when a column
            # list disambiguates (name (query) without either parses as
            # a function-call-shaped relation error in some positions)
            as_kw = "AS" if not cols or draw(st.booleans()) else ""
            ctes.append(f"{name}{cols}{s()}{as_kw}{s()}({s()}SELECT{s()}{draw(_literal)}{s()}AS{s()}s{s()})")
        stmt = f"WITH{s()}" + ("," + s()).join(ctes) + s() + body
    else:
        stmt = body
    lead = draw(st.lists(st.one_of(_ws, _line_comment, _bracketed_comment), max_size=2).map("".join))
    tail = draw(st.lists(st.one_of(_ws, _line_comment, _bracketed_comment), max_size=2).map("".join))
    semi = draw(st.sampled_from(["", ";"]))
    return lead + stmt + tail + semi, wrote


@settings(max_examples=400, deadline=None, derandomize=True)
@given(sw=_grammar_statement())
@pytest.mark.slow
def test_gate_agrees_with_spark_parser_grammar_aware(parser, sw):
    sql, _intent = sw
    try:
        tree = parser.parsePlan(sql).treeString()
    except Exception:
        return  # Spark rejects it; the gate's verdict is moot
    is_write = any(node in tree for node in _WRITE_NODES)
    v = validate_sql_safety(sql, allow_writes=False)
    if is_write:
        assert v.is_blocked and v.is_write, (
            f"gate passed a statement Spark parses as a write:\n{sql!r}\n{tree}"
        )
    else:
        assert not v.is_blocked and not v.is_write, (
            f"gate blocked a statement Spark parses as a pure read "
            f"({v.reason}):\n{sql!r}\n{tree}"
        )


@settings(max_examples=400, deadline=None, derandomize=True)
@given(sw=_grammar_statement())
@pytest.mark.slow
def test_grammar_strategy_reaches_spark_parser(parser, sw):
    """Meta-guard: the generated statements must not be rejected
    wholesale by Spark (a strategy drifting into 100% parse errors
    would silently stop testing the gate). Tracked per-example via a
    module-level counter asserted in the sibling coverage test."""
    sql, _ = sw
    try:
        parser.parsePlan(sql)
        _PARSE_OK.append(True)
    except Exception:
        _PARSE_OK.append(False)


_PARSE_OK: list[bool] = []


@pytest.mark.slow  # reads _PARSE_OK, populated by the slow sampler above
def test_grammar_strategy_parse_rate():
    """Run after the sampler above (pytest executes in file order):
    a healthy majority of generated statements must be real SQL that
    Spark accepts — the differential property only bites on those."""
    assert _PARSE_OK, "sampler did not run"
    rate = sum(_PARSE_OK) / len(_PARSE_OK)
    assert rate >= 0.5, f"only {rate:.0%} of generated statements parse"


def test_line_comment_continuation_cannot_launder_writes(parser):
    """Round-7 grammar-aware-fuzz find, pinned: Spark's SIMPLE_COMMENT
    lexes ``'--' ('\\\\\\n' | ~[\\r\\n])*`` — a backslash immediately
    before a newline keeps the comment going. A scanner ending the
    comment at the first newline classifies the NEXT line's decoy
    SELECT while Spark swallows that line as comment and executes the
    statement after it:

        --\\
        SELECT 1 FROM t WHERE x = 1
        INSERT INTO t VALUES (1)

    parses to InsertIntoStatement. The gate must block it."""
    sql = "--\\\nSELECT 1 FROM t WHERE x = 1\nINSERT INTO t VALUES (1)"
    tree = parser.parsePlan(sql).treeString()
    assert "InsertIntoStatement" in tree  # the exploit premise still holds
    v = validate_sql_safety(sql, allow_writes=False)
    assert v.is_blocked and v.is_write

    # double backslash re-pairs into a continuation too
    sql2 = "--\\\\\nSELECT 1\nDROP TABLE t"
    assert "DropTable" in parser.parsePlan(sql2).treeString()
    v2 = validate_sql_safety(sql2, allow_writes=False)
    assert v2.is_blocked and v2.is_write

    # precision side: continuation followed by a pure read still passes
    sql3 = "--\\\nthis whole line is comment\nSELECT 1"
    assert "InsertInto" not in parser.parsePlan(sql3).treeString()
    v3 = validate_sql_safety(sql3, allow_writes=False)
    assert not v3.is_blocked and not v3.is_write

    # \r TERMINATES the comment (outside both grammar alternatives):
    # a write hidden "after" a CR is live SQL to Spark and to the gate
    v4 = validate_sql_safety("--x\rDROP TABLE t", allow_writes=False)
    assert v4.is_blocked and v4.is_write


def test_as_omitted_cte_cannot_launder_writes(parser):
    """Second round-7 grammar-aware-fuzz find, pinned: Spark's
    ``namedQuery`` makes AS optional — ``name (columnAliases)? AS?
    '(' query ')'`` — so ``WITH c0(s) (SELECT 1) INSERT INTO t ...``
    is valid DML. The walker used to treat any depth-0 '(' after a
    closed group as a parenthesized READ body and passed the INSERT.
    Disambiguation now matches the parser's binding: identifier-list
    -shaped groups are column aliases (the next group is the CTE's
    query); query-shaped groups end the definition (the next group is
    the body)."""
    cases_write = [
        "WITH c0(s) (SELECT 1 AS s) INSERT INTO t SELECT * FROM c0",
        # keyword-named column, backquoted-comma column, backquoted name
        "WITH c0 (select) (SELECT 1 AS `select`) INSERT INTO t SELECT 1",
        "WITH c0 (`a,b`) (SELECT 1 AS `a,b`) INSERT INTO t SELECT 1",
        "WITH `c,0`(s) (SELECT 1 AS s) INSERT INTO t SELECT 1",
        # composed with the line-continuation find: the comment
        # swallows the AS and the walker still must not misbind
        "WITH c0(s)--\\\nAS\n( SELECT 1 AS s ) INSERT INTO t SELECT 1 AS v",
        "WITH a AS (SELECT 1), b(x) (SELECT 2) DELETE FROM t",
        # round-8 advice find, pinned: Spark's lexer is IDENTIFIER:
        # (LETTER|DIGIT|'_')+ with maximal munch — DIGIT-LEADING
        # aliases like 2b are legal column names, and rejecting them
        # in _is_identifier_list made the walker read the query paren
        # as a parenthesized read body, laundering the INSERT
        "WITH c(2b) (SELECT 1) INSERT INTO t SELECT * FROM c",
        "WITH c(2b, 9_x) (SELECT 1, 2) DELETE FROM t",
        "WITH a(1x) (SELECT 1), b AS (SELECT 2) INSERT INTO t SELECT 1",
    ]
    cases_read = [
        "WITH c0(s) (SELECT 1 AS s) SELECT * FROM c0",
        "WITH c(2b) (SELECT 1) SELECT * FROM c",
        "WITH c0 AS (SELECT 1 AS s) (SELECT 2)",
        # group IS the query (starts with a query token), so the next
        # paren is a parenthesized read body
        "WITH c0 (SELECT 1 AS s) (SELECT * FROM c0)",
        "WITH a AS (SELECT 1), b(x) (SELECT 2) SELECT * FROM b",
    ]
    for sql in cases_write:
        assert any(
            n in parser.parsePlan(sql).treeString() for n in _WRITE_NODES
        ), f"premise broke: {sql!r} no longer parses as a write"
        v = validate_sql_safety(sql, allow_writes=False)
        assert v.is_blocked and v.is_write, f"laundered: {sql!r}"
    for sql in cases_read:
        parser.parsePlan(sql)  # must be valid
        v = validate_sql_safety(sql, allow_writes=False)
        assert not v.is_blocked, f"false positive: {sql!r} ({v.block_reason})"


def test_execute_immediate_is_blocked_as_indirection(parser):
    """Spark 4's EXECUTE IMMEDIATE is dynamic SQL — the payload can be
    a session variable bound at runtime, so no lexical gate can prove
    the inner statement reads. The only sound verdict for a read-only
    gate is to block the INDIRECTION itself, even when the literal
    payload happens to be a SELECT (same posture as blocking
    unrecognized statements). Both forms parse in Spark
    (UnresolvedExecuteImmediate), both must block; DECLARE (session
    variable creation, the other half of the vector) likewise."""
    for sql in (
        "EXECUTE IMMEDIATE 'SELECT 1'",
        "EXECUTE IMMEDIATE 'DROP TABLE t'",
        "EXECUTE IMMEDIATE 'SELECT ?' USING 5",
        "EXECUTE IMMEDIATE sql_text_variable",
        "DECLARE sql_text_variable STRING",
    ):
        try:
            parser.parsePlan(sql)
        except Exception:
            pass  # parseability is incidental; the verdict must hold
        v = validate_sql_safety(sql, allow_writes=False)
        assert v.is_blocked, f"dynamic-SQL indirection passed the gate: {sql!r}"
