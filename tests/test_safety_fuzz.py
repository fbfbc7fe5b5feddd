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
            cols = draw(st.sampled_from(("", "(s)")))
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
