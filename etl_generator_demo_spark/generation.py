"""NL -> SQL generation layer — SURVEY.md §2.10 G1-G7.

The reference's core pipeline: assemble a prompt from the metadata
document, call an LLM (OpenAI/Gemini dispatch, ``sql_generator.py:
69-82``), parse its JSON (fence-strip + loads + safety gate,
``:154-180``), or fall back to a deterministic template when no API
key is present (``:249-313``). The response contract is
``{intent_summary, sql, assumptions, safety_notes, tables_used,
is_blocked, block_reason[, etl_pipeline]}`` (``main.py:41-50``).

This engine keeps the same pipeline with two changes:
- prompts target the Spark SQL dialect and are built from the Spark
  catalog's metadata document (catalog.py);
- generation and execution are strictly separated: nothing here
  touches an LLM in tests — the demo path is deterministic and the
  provider hooks raise cleanly when unconfigured.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

from etl_generator_demo_spark.plans.safety import validate_sql_safety

#: Demo-mode blocklist (reference semantics, ``sql_generator.py:253-266``:
#: destructive-intent keywords in Korean or English block generation).
BLOCKED_KEYWORDS = (
    "delete",
    "drop",
    "truncate",
    "update",
    "insert",
    "삭제",
    "제거",
    "수정",
    "추가",
    "변경",
)

SYSTEM_PROMPT = """You are a Spark SQL generation assistant for an analytics engine.
You receive a database schema as JSON metadata and a natural-language request.
Respond ONLY with a JSON object of this exact shape:
{"intent_summary": str, "sql": str, "assumptions": [str], "safety_notes": [str],
 "tables_used": [str], "is_blocked": bool, "block_reason": str|null}
Rules:
- Target the Apache Spark SQL dialect.
- Read-only: generate SELECT/WITH statements only.
- Honor every entry in constraints.mandatory_filters as a WHERE predicate.
- Prefer explicit JOIN ... ON over implicit joins; use the foreign keys in the metadata.
"""

ETL_PROMPT_ADDITION = """Additionally include an "etl_pipeline" object:
{"extract": {"source_tables": [str], "conditions": [str]},
 "transform": {"steps": [{"op": str, ...}]},
 "load": {"target_table": str, "write_mode": "append"|"overwrite"}}
Allowed transform ops: fill_nulls, standardize_dates, cast, filter, select, derive, dedup, near_dedup, join, expect.
"""


#: Reference demo-gate message, verbatim (``sql_generator.py:262``) —
#: a UI that string-matches the reference's Korean reply keeps working.
DEMO_BLOCK_REASON_KO = "파괴적인 작업 요청이 감지되었습니다. SELECT 쿼리만 허용됩니다."


def blocked_response(reason: str, intent_summary: str = "") -> dict[str, Any]:
    # sql is None (not "") when blocked — reference wire shape
    # (``sql_generator.py:256-266``, Optional[str] in ``main.py:43``).
    return {
        "intent_summary": intent_summary,
        "sql": None,
        "assumptions": [],
        "safety_notes": [],
        "tables_used": [],
        "is_blocked": True,
        "block_reason": reason,
    }


def _demo_keyword_block(request: str) -> str | None:
    low = request.lower()
    for kw in BLOCKED_KEYWORDS:
        if kw in low:
            # Korean first (reference parity), English appended.
            return (
                f"{DEMO_BLOCK_REASON_KO} "
                f"(destructive request detected — only SELECT queries are "
                f"allowed in demo mode; matched {kw!r})"
            )
    return None


def generate_demo_response(
    request: str, metadata: dict[str, Any], include_etl: bool = False
) -> dict[str, Any]:
    """Deterministic offline generation (G5): first table, first <=5
    columns, constraint filters, LIMIT 10 — the reference's template
    shape, plus it doubles as the test fixture for the whole layer."""
    reason = _demo_keyword_block(request)
    if reason:
        # reference echoes the user's request as intent_summary when
        # the demo gate blocks (``sql_generator.py:259``)
        return blocked_response(reason, intent_summary=request)

    tables = metadata.get("schema_summary", {}).get("tables", [])
    if not tables:
        return blocked_response("metadata contains no tables")
    table = tables[0]
    tname = table["table_name"]
    cols = [c["column_name"] for c in table.get("columns", [])][:5] or ["*"]

    constraints = metadata.get("constraints", {}) or {}
    where_parts = list(constraints.get("mandatory_filters") or [])
    soft_delete = constraints.get("soft_delete_rule")
    if soft_delete and soft_delete not in where_parts:
        where_parts.append(soft_delete)
    where = f"\nWHERE {' AND '.join(where_parts)}" if where_parts else ""

    sql = f"SELECT {', '.join(cols)}\nFROM {tname}{where}\nLIMIT 10"
    out: dict[str, Any] = {
        "intent_summary": f"demo preview of table {tname} (no LLM key configured)",
        "sql": sql,
        "assumptions": [
            "demo mode: request text not interpreted; template over the first table"
        ],
        "safety_notes": ["read-only SELECT with LIMIT 10"],
        "tables_used": [tname],
        "is_blocked": False,
        "block_reason": None,
    }
    if include_etl:
        out["etl_pipeline"] = {
            "extract": {"source_tables": [tname], "conditions": where_parts},
            "transform": {
                "steps": [
                    {"op": "fill_nulls", "columns": {c: 0 for c in cols[:1]}},
                    {"op": "dedup", "columns": cols[:1]},
                ]
            },
            "load": {"target_table": f"{tname}_clean", "write_mode": "append"},
        }
    return out


_FENCE_RE = re.compile(r"^```(?:json)?\s*|\s*```$", re.MULTILINE)


def parse_llm_response(text: str) -> dict[str, Any]:
    """G2: strip markdown fences, decode JSON, gate the SQL. Parse
    failure -> blocked envelope (reference ``sql_generator.py:171-180``)."""
    try:
        doc = json.loads(_FENCE_RE.sub("", text.strip()).strip())
    except json.JSONDecodeError:
        return blocked_response("response format error: LLM output was not valid JSON")
    if not isinstance(doc, dict):
        return blocked_response("response format error: expected a JSON object")
    doc.setdefault("is_blocked", False)
    doc.setdefault("block_reason", None)
    for key, default in (
        ("intent_summary", ""),
        ("sql", ""),
        ("assumptions", []),
        ("safety_notes", []),
        ("tables_used", []),
    ):
        doc.setdefault(key, default)
    if doc["sql"] and not isinstance(doc["sql"], str):
        # a truthy non-string "sql" (nested object, number) would crash
        # the gate's .strip(); malformed output gets the same graceful
        # block as invalid JSON
        return blocked_response(
            "response format error: sql must be a string, got "
            + type(doc["sql"]).__name__
        )
    if doc["sql"] and not doc["is_blocked"]:
        verdict = validate_sql_safety(doc["sql"])
        if verdict.is_blocked:
            doc["is_blocked"] = True
            doc["block_reason"] = verdict.block_reason
    return doc


def build_prompt(
    request: str, metadata: dict[str, Any], include_etl: bool = False
) -> str:
    """G1: prompt assembly — system contract + schema JSON + request."""
    prompt = SYSTEM_PROMPT
    if include_etl:
        prompt += "\n" + ETL_PROMPT_ADDITION
    prompt += "\n## Database metadata\n" + json.dumps(metadata, ensure_ascii=False, indent=1)
    prompt += "\n## Request\n" + request
    return prompt


def generate_sql(
    request: str,
    metadata: dict[str, Any],
    include_etl: bool = False,
    provider: str = "demo",
    model_name: str | None = None,
) -> dict[str, Any]:
    """G1 provider dispatch. 'demo' (or a missing API key) uses the
    deterministic template; 'openai'/'gemini' call out only when their
    SDK + key are available, mirroring ``sql_generator.py:74-82``. A
    CALLABLE provider is the bring-your-own-LLM hook: it receives the
    assembled prompt and returns raw model text, which flows through
    the same parse + post-parse safety validation as the SDK paths —
    this is also what makes the full live-path contract testable
    without any SDK."""
    if not request or not request.strip():
        return blocked_response("empty request")
    if callable(provider):
        return parse_llm_response(provider(build_prompt(request, metadata, include_etl)))
    if provider == "openai" and os.environ.get("OPENAI_API_KEY"):
        return _generate_openai(request, metadata, include_etl, model_name)
    if provider == "gemini" and os.environ.get("GOOGLE_API_KEY"):
        return _generate_gemini(request, metadata, include_etl, model_name)
    return generate_demo_response(request, metadata, include_etl)


def _generate_openai(request, metadata, include_etl, model_name) -> dict[str, Any]:
    try:
        from openai import OpenAI  # not bundled in this environment
    except ImportError:
        return generate_demo_response(request, metadata, include_etl)
    client = OpenAI()
    resp = client.chat.completions.create(
        model=model_name or "gpt-4o-mini",
        messages=[{"role": "user", "content": build_prompt(request, metadata, include_etl)}],
        response_format={"type": "json_object"},
    )
    return parse_llm_response(resp.choices[0].message.content or "")


def _generate_gemini(request, metadata, include_etl, model_name) -> dict[str, Any]:
    try:
        import google.generativeai as genai  # not bundled in this environment
    except ImportError:
        return generate_demo_response(request, metadata, include_etl)
    model = genai.GenerativeModel(model_name or "gemini-1.5-flash")
    resp = model.generate_content(build_prompt(request, metadata, include_etl))
    return parse_llm_response(resp.text)


def generate_sample_queries(metadata: dict[str, Any], n: int = 10) -> list[str]:
    """G4: suggested NL questions derived from the metadata document —
    deterministic templates over tables, group-by keys, and FK edges
    (the reference asks an LLM for 'simple lookups through aggregation,
    grouping, joins'; same classes, no LLM)."""
    out: list[str] = []
    summary = metadata.get("schema_summary", {})
    tables = summary.get("tables", [])
    rels = summary.get("relationships", [])
    for tbl in tables:
        tname = tbl["table_name"]
        out.append(f"Show the first rows of {tname}")
        string_cols = [
            c["column_name"]
            for c in tbl.get("columns", [])
            if c.get("data_type") == "string" and not c.get("primary_key")
        ]
        num_cols = [
            c["column_name"]
            for c in tbl.get("columns", [])
            if c.get("data_type") in ("double", "bigint", "int") and not c.get("primary_key")
        ]
        if string_cols:
            out.append(f"Count {tname} rows grouped by {string_cols[0]}")
        if num_cols:
            out.append(f"Top 10 {tname} rows by {num_cols[0]}")
    for rel in rels:
        child, parent = rel.split(" → ")
        out.append(
            f"Join {child.split('.')[0]} with {parent.split('.')[0]} and count per {parent}"
        )
    return out[:n]


def resolve_metadata(
    request_supplied: dict[str, Any] | None, catalog=None
) -> dict[str, Any]:
    """G6 three-tier resolution: request-supplied > live catalog >
    bundled sample (reference ``main.py:91-107``)."""
    if request_supplied:
        return request_supplied
    if catalog is not None:
        return catalog.metadata_document()
    return bundled_sample_metadata()


def bundled_sample_metadata() -> dict[str, Any]:
    """Offline sample document in the reference's shape, derived from
    the fixture star schema (not a copy of the reference's samples)."""
    from etl_generator_demo_spark.catalog import SIDECAR

    tables = []
    rels: list[str] = []
    fixture_cols = {
        "orders": [
            ("o_orderkey", "bigint"),
            ("o_custkey", "bigint"),
            ("o_orderstatus", "string"),
            ("o_totalprice", "double"),
            ("o_orderdate", "timestamp"),
            ("o_orderpriority", "string"),
        ],
        "customer": [
            ("c_custkey", "bigint"),
            ("c_name", "string"),
            ("c_nationkey", "int"),
            ("c_acctbal", "double"),
            ("c_mktsegment", "string"),
        ],
    }
    for tname, cols in fixture_cols.items():
        side = SIDECAR[tname]
        columns = []
        for cname, dtype in cols:
            col: dict[str, Any] = {
                "column_name": cname,
                "data_type": dtype,
                "nullable": True,
                "description": "",
                "primary_key": cname in side["pk"],
            }
            if cname in side["fk"]:
                ref_t, ref_c = side["fk"][cname]
                col["foreign_key"] = {"ref_table": ref_t, "ref_column": ref_c}
                rels.append(f"{tname}.{cname} → {ref_t}.{ref_c}")
            columns.append(col)
        tables.append({"table_name": tname, "description": side["description"], "columns": columns})
    return {
        "db_type": "spark",
        "db_version": "sample",
        "schema_summary": {"tables": tables, "relationships": rels},
        "constraints": {
            "soft_delete_rule": None,
            "valid_status_values": {"orders.o_orderstatus": ["O", "F", "P"]},
            "mandatory_filters": [],
        },
    }
