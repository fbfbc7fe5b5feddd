"""placeholder — filled in incrementally."""
