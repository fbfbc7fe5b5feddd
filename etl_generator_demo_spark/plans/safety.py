"""SQL safety gate.

The reference has two gates: a live-mode hook that allows everything
(``sql_generator.py:65-67``) and a demo-mode keyword blocklist that
rejects DML/DDL-looking requests with a "SELECT only" reason
(``sql_generator.py:253-266``). Response objects carry
``is_blocked``/``block_reason`` (``main.py:48-49``).

This engine validates structurally: the first statement keyword
decides read-vs-write (robust to identifiers that merely *contain* a
blocked word, unlike the reference's substring scan), with a keyword
fallback for unparseable text. Write statements are blocked unless the
caller opts in (``allow_writes=True``), mirroring D2/D3 in SURVEY §2.9.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

#: Statement-leading keywords that read.
_READ_KEYWORDS = {"SELECT", "WITH", "VALUES", "TABLE", "SHOW", "DESCRIBE", "DESC", "EXPLAIN"}
#: Statement-leading keywords that mutate.
_WRITE_KEYWORDS = {
    "INSERT",
    "UPDATE",
    "DELETE",
    "MERGE",
    "DROP",
    "TRUNCATE",
    "CREATE",
    "ALTER",
    "REPLACE",
    "SET",
    "RESET",
    "GRANT",
    "REVOKE",
    "LOAD",
}

_COMMENT_RE = re.compile(r"(--[^\n]*\n?)|(/\*.*?\*/)", re.DOTALL)


@dataclass(frozen=True)
class SafetyVerdict:
    is_blocked: bool
    block_reason: str | None
    is_write: bool


def _first_keyword(sql: str) -> str:
    stripped = _COMMENT_RE.sub(" ", sql).strip().rstrip(";").strip()
    m = re.match(r"[A-Za-z_]+", stripped)
    return m.group(0).upper() if m else ""


def _cte_body_keyword(sql: str) -> str:
    """Leading keyword of the statement BODY after a WITH clause.

    A CTE prefix does not make a statement a read: ``WITH d AS
    (SELECT ...) INSERT INTO t ...`` is DML (and Spark would happily
    execute it). Walk the CTE list at paren depth 0 — after each
    definition's closing paren the next token is either ``,`` (another
    CTE) or the body's first keyword. String literals and quoted
    identifiers are skipped so parens inside them don't count.
    Returns "" when no body is found (malformed WITH) — the caller's
    conservative-block branch handles it."""
    stripped = _COMMENT_RE.sub(" ", sql).strip().rstrip(";").strip()
    i, n, depth = 0, len(stripped), 0
    while i < n:
        ch = stripped[i]
        if ch in "'\"`":
            quote = ch
            i += 1
            while i < n:
                if stripped[i] == quote:
                    if i + 1 < n and stripped[i + 1] == quote:  # escaped ''
                        i += 2
                        continue
                    break
                i += 1
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                j = i + 1
                while j < n and stripped[j].isspace():
                    j += 1
                if j < n and stripped[j] == ",":
                    i = j  # next CTE definition
                else:
                    m = re.match(r"[A-Za-z_]+", stripped[j:])
                    tok = m.group(0).upper() if m else ""
                    if tok == "AS":
                        # the paren we just closed was a CTE column
                        # list (WITH t(n) AS ...): keep walking
                        i = j
                        continue
                    return tok
        i += 1
    return ""


def validate_sql_safety(sql: str, allow_writes: bool = False) -> SafetyVerdict:
    """Classify a statement and decide whether to block it.

    Read statements always pass. Write statements pass only with
    ``allow_writes`` (the engine's equivalent of the reference's
    live-mode allow-all hook); otherwise blocked with a reason string,
    matching the demo-mode behavior of ``sql_generator.py:253-266``.
    """
    if not sql or not sql.strip():
        return SafetyVerdict(True, "empty SQL statement", False)
    kw = _first_keyword(sql)
    if kw == "WITH":
        # classify by the statement BODY: a CTE prefix on DML is DML
        body = _cte_body_keyword(sql)
        if body in _WRITE_KEYWORDS:
            kw = body
        elif body in _READ_KEYWORDS or body == "":
            # "" = malformed WITH; Spark's parser will reject it, and
            # a statement with no body cannot write
            return SafetyVerdict(False, None, False) if body else SafetyVerdict(
                True, "malformed WITH statement (no body)", False
            )
        else:
            return SafetyVerdict(
                True, f"unrecognized WITH body statement: {body!r}", False
            )
    if kw in _READ_KEYWORDS:
        return SafetyVerdict(False, None, False)
    if kw in _WRITE_KEYWORDS:
        if allow_writes:
            return SafetyVerdict(False, None, True)
        return SafetyVerdict(
            True, f"only read-only queries are allowed (statement starts with {kw})", True
        )
    # Unrecognized leading token: conservative block (the reference
    # would have sent it to the DB and surfaced the DB error).
    return SafetyVerdict(True, f"unrecognized statement type: {kw or sql[:20]!r}", False)
