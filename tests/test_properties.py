"""Property-based tests (hypothesis) over the engine's pure surfaces:
the safety gate, row scalarization, and the generation layer must
never crash and must hold their invariants on arbitrary input."""

from __future__ import annotations

import datetime as dt
import decimal
import json
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_generator_demo_spark.engine import scalarize
from etl_generator_demo_spark.generation import (
    generate_demo_response,
    parse_llm_response,
)
from etl_generator_demo_spark.plans.safety import validate_sql_safety

# -- safety gate -----------------------------------------------------------

@given(st.text(max_size=500))
@settings(max_examples=300)
def test_safety_gate_total_function(sql):
    """Never raises; always returns a verdict; blocked XOR allowed."""
    v = validate_sql_safety(sql)
    assert isinstance(v.is_blocked, bool) and isinstance(v.is_write, bool)


@given(st.text(alphabet=st.characters(codec="ascii"), max_size=100))
@settings(max_examples=200)
def test_safety_gate_select_prefix_allowed(fragment):
    v = validate_sql_safety("SELECT " + fragment)
    assert not v.is_blocked and not v.is_write


@given(st.sampled_from(["DROP", "DELETE", "INSERT", "UPDATE", "TRUNCATE"]), st.text(max_size=80))
def test_safety_gate_write_prefix_always_blocked(kw, rest):
    assert validate_sql_safety(f"{kw} {rest}").is_blocked


# -- scalarization ---------------------------------------------------------

json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=50),
    st.datetimes(min_value=dt.datetime(1, 1, 1), max_value=dt.datetime(9999, 1, 1)),
    st.dates(),
    st.decimals(allow_nan=False, allow_infinity=False),
    st.binary(max_size=30),
)
json_values = st.recursive(
    json_scalars,
    lambda inner: st.one_of(
        st.lists(inner, max_size=4),
        st.dictionaries(st.text(max_size=10), inner, max_size=4),
    ),
    max_leaves=10,
)


@given(json_values)
@settings(max_examples=300)
def test_scalarize_always_json_serializable(value):
    """Whatever a row contains, the serialized form must be JSON-safe —
    the reference's contract (db_connector.py:259-265)."""
    out = scalarize(value)
    json.dumps(out)  # must not raise


@given(st.floats(allow_nan=True, allow_infinity=True))
def test_scalarize_floats_pass_through(x):
    out = scalarize(x)
    assert isinstance(out, float)
    if not math.isnan(x):
        assert out == x


# -- generation layer ------------------------------------------------------

@given(st.text(max_size=300))
@settings(max_examples=200)
def test_parse_llm_response_total_function(text):
    """Arbitrary LLM output (garbage, partial JSON, fences) must yield a
    well-formed response envelope, never an exception."""
    out = parse_llm_response(text)
    assert set(out) >= {
        "intent_summary", "sql", "assumptions", "safety_notes",
        "tables_used", "is_blocked", "block_reason",
    }
    if out["sql"] and not out["is_blocked"]:
        assert not validate_sql_safety(out["sql"]).is_blocked


@given(st.text(min_size=1, max_size=120))
@settings(max_examples=200)
def test_demo_generation_never_emits_write_sql(request_text):
    """Whatever the user asks, demo mode yields blocked OR read-only SQL."""
    from etl_generator_demo_spark.generation import bundled_sample_metadata

    out = generate_demo_response(request_text, bundled_sample_metadata())
    if not out["is_blocked"]:
        v = validate_sql_safety(out["sql"])
        assert not v.is_write and not v.is_blocked
