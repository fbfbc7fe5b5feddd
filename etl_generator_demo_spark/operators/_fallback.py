"""One-time warning for persisted-index fallback paths.

The persisted-store fallbacks (``dedup.corpus_shingles``,
``dedup.corpus_candidate_pairs``, ``similarity._bucket_assignments``)
are row-identical to the inline pipelines, so a permanent index-build
failure — unwritable cache root, corrupt store — is otherwise
invisible: every query silently pays the full inline ingest cost the
bench numbers assume amortized. This module owns the once-per-site
warning state so unrelated operator modules don't import each other's
private helpers (round-6 advice).
"""

from __future__ import annotations

import logging

_log = logging.getLogger(__name__)
_warned_fallbacks: set[str] = set()


def warn_fallback_once(site: str, exc: Exception) -> None:
    """Log the persisted-index-unavailable warning once per site."""
    if site not in _warned_fallbacks:
        _warned_fallbacks.add(site)
        _log.warning(
            "%s: persisted index unavailable (%s: %s); falling back to "
            "the inline pipeline — results identical, ingest-stage cost "
            "now paid per query",
            site,
            type(exc).__name__,
            exc,
        )
