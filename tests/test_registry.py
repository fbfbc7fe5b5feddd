"""Registry integrity: the driver surface must never silently shrink."""

from __future__ import annotations


def test_registry_surface_does_not_shrink():
    """A lost module import would silently drop registered queries —
    the driver would record fewer rows without any test failing. Pin
    the floor (grow it when adding operators, never lower it)."""
    from etl_generator_demo_spark.registry import load_all

    reg = load_all()
    assert len(reg) >= 107, f"registry shrank to {len(reg)} queries"
    n_oracle = sum(1 for rq in reg.values() if rq.oracle is not None)
    assert n_oracle >= 99, f"oracle coverage shrank to {n_oracle}"
    # every oracle mentions at least one fixture table it reads
    tables = ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings")
    for name, rq in reg.items():
        if rq.oracle is not None:
            assert any(t in rq.oracle for t in tables), name
