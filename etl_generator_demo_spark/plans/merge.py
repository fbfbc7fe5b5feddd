"""Textual ``MERGE INTO`` front door.

The reference executes arbitrary DML text by handing it to PostgreSQL
and returning the affected rowcount (``db_connector.py:244-251``).
Plain-parquet Spark has no MERGE executor (that is a lakehouse-format
feature), so the engine routes the canonical star-form statement

    MERGE INTO <table> [AS t]
    USING (<select ...>) [AS s] | <table_or_view> [AS s]
    ON t.k1 = s.k1 [AND t.k2 = s.k2 ...]
    WHEN MATCHED THEN UPDATE SET *
    WHEN NOT MATCHED THEN INSERT *

to :func:`etl_generator_demo_spark.sources.mutations.merge_parquet`,
which implements exactly those semantics (anti-join + union + staged
atomic swap, source-cardinality error included). Anything outside the
star form — per-column SET lists, DELETE actions, extra WHEN branches,
non-equi ON — raises ``UnsupportedMergeError`` rather than guessing:
a mutation router must refuse what it cannot execute faithfully.

Parsing is a quote/paren-aware scan (the safety gate's scanner, so
string literals containing ``WHEN`` or ``ON`` cannot desync it), not a
grammar; the accepted surface is deliberately the one canonical form.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from etl_generator_demo_spark.plans.safety import _skip_string, _strip_comments

_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"
_KEYWORDS = {"ON", "WHEN", "USING", "AS"}


class UnsupportedMergeError(ValueError):
    """Statement is a MERGE but outside the supported star form."""


@dataclass(frozen=True)
class MergeSpec:
    target: str  # target table name (catalog-resolved to a parquet path)
    source_table: str | None  # bare identifier source, or
    source_sql: str | None  # parenthesized subquery source
    key_cols: tuple[str, ...]  # equi-join keys from the ON clause


def _scan_balanced(s: str, i: int) -> int:
    """``s[i]`` is '('; return index just past the matching ')'.
    Quote-aware so parens inside string literals don't count."""
    depth, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch in "'\"`":
            i = _skip_string(s, i) + 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise UnsupportedMergeError("unbalanced parentheses in MERGE source")


def _find_top_level_word(s: str, word: str, start: int = 0) -> int:
    """Index of the first occurrence of ``word`` (case-insensitive,
    word-bounded) at paren depth 0 and outside string literals; -1 if
    absent."""
    depth, i, n, w = 0, start, len(s), len(word)
    upper = s.upper()
    while i < n:
        ch = s[i]
        if ch in "'\"`":
            i = _skip_string(s, i) + 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif (
            depth == 0
            and upper.startswith(word, i)
            and (i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_"))
            and (i + w >= n or not (s[i + w].isalnum() or s[i + w] == "_"))
        ):
            return i
        i += 1
    return -1


def _take_ident(s: str, i: int) -> tuple[str | None, int]:
    """Read one bare identifier at s[i:] (skipping leading space);
    returns (identifier-or-None, next index). Keywords don't count."""
    m = re.match(r"\s*(" + _IDENT + ")", s[i:])
    if not m or m.group(1).upper() in _KEYWORDS:
        return None, i
    return m.group(1), i + m.end()


def _skip_optional_alias(s: str, i: int) -> int:
    """Consume ``[AS] alias`` if present."""
    m = re.match(r"\s*AS\s+(" + _IDENT + ")", s[i:], re.I)
    if m:
        return i + m.end()
    ident, j = _take_ident(s, i)
    return j if ident is not None else i


_WHEN_TAIL = re.compile(
    r"\s*WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*"
    r"\s+WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*$|"
    r"\s*WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*"
    r"\s+WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*\s*$",
    re.I | re.S,
)

_CONJUNCT = re.compile(
    r"^\s*(?:(" + _IDENT + r")\s*\.\s*)?(" + _IDENT + r")\s*=\s*"
    r"(?:(" + _IDENT + r")\s*\.\s*)?(" + _IDENT + r")\s*$"
)


def _parse_on_keys(cond: str, target_names: set[str], source_names: set[str]) -> tuple[str, ...]:
    """AND-of-equi-conjuncts ``t.k = s.k`` → key column tuple. Each
    conjunct must name the same column on both sides, one side per
    relation (alias-qualified or bare)."""
    keys: list[str] = []
    i = 0
    while True:
        j = _find_top_level_word(cond, "AND", i)
        part = cond[i:j] if j >= 0 else cond[i:]
        m = _CONJUNCT.match(part)
        if not m:
            raise UnsupportedMergeError(
                f"unsupported ON conjunct {part.strip()!r}: only t.key = s.key equi-conditions"
            )
        la, lc, ra, rc = m.groups()
        if lc.lower() != rc.lower():
            raise UnsupportedMergeError(
                f"ON conjunct {part.strip()!r} joins differently-named columns; "
                "star-form MERGE requires shared key names"
            )
        for alias in (la, ra):
            if alias is not None and alias.lower() not in target_names | source_names:
                raise UnsupportedMergeError(f"unknown alias {alias!r} in ON clause")
        if la is not None and ra is not None and la.lower() == ra.lower():
            raise UnsupportedMergeError(
                f"ON conjunct {part.strip()!r} references one relation on both sides"
            )
        keys.append(lc)
        if j < 0:
            break
        i = j + 3
    return tuple(dict.fromkeys(keys))


def parse_merge(sql: str) -> MergeSpec:
    """Parse the canonical star-form MERGE; raise
    :class:`UnsupportedMergeError` for anything else. The caller has
    already run the safety gate — this is a router, not a gate."""
    s = _strip_comments(sql).strip().rstrip(";")
    m = re.match(r"\s*MERGE\s+INTO\s+(" + _IDENT + ")", s, re.I)
    if not m:
        raise UnsupportedMergeError("not a MERGE INTO <identifier> statement")
    target = m.group(1)
    i = m.end()
    t_alias, i2 = None, _skip_optional_alias(s, i)
    if i2 != i:
        t_alias = s[i:i2].split()[-1]
        i = i2
    m = re.match(r"\s*USING\b", s[i:], re.I)
    if not m:
        raise UnsupportedMergeError("expected USING after MERGE INTO target")
    i += m.end()
    source_table: str | None = None
    source_sql: str | None = None
    m = re.match(r"\s*\(", s[i:])
    if m:
        open_at = i + m.end() - 1
        close = _scan_balanced(s, open_at)
        source_sql = s[open_at + 1 : close - 1].strip()
        i = close
    else:
        source_table, i = _take_ident(s, i)
        if source_table is None:
            raise UnsupportedMergeError("expected a table name or (subquery) after USING")
    s_alias, i2 = None, _skip_optional_alias(s, i)
    if i2 != i:
        s_alias = s[i:i2].split()[-1]
        i = i2
    if source_sql is not None and s_alias is None:
        raise UnsupportedMergeError("a (subquery) source requires an alias")
    m = re.match(r"\s*ON\b", s[i:], re.I)
    if not m:
        raise UnsupportedMergeError("expected ON <condition> after USING source")
    i += m.end()
    when_at = _find_top_level_word(s, "WHEN", i)
    if when_at < 0:
        raise UnsupportedMergeError("expected WHEN clauses after ON condition")
    cond = s[i:when_at]
    if not _WHEN_TAIL.match(s[when_at:]):
        raise UnsupportedMergeError(
            "only the star form is routable: WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT * (no conditions, no DELETE, no column lists)"
        )
    target_names = {target.lower()} | ({t_alias.lower()} if t_alias else set())
    source_names = ({source_table.lower()} if source_table else set()) | (
        {s_alias.lower()} if s_alias else set()
    )
    keys = _parse_on_keys(cond, target_names, source_names)
    if not keys:
        raise UnsupportedMergeError("MERGE ON clause yielded no key columns")
    return MergeSpec(target=target, source_table=source_table, source_sql=source_sql, key_cols=keys)
