"""Operator library: each module registers driver-checkable queries."""
