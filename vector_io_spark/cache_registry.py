"""Deferred release registry for persisted query-scoped intermediates.

Operators that persist a shared relation consumed several times inside
ONE query build (e.g. semdedup's scored frame, the passage-dedup window
relation) register it here instead of unpersisting eagerly — the frame
must stay cached until the query's action has actually run, which the
operator cannot see. ``release_pending`` runs when the NEXT registered
query is built (queries._register wraps every query body with it), so
a cache lives for exactly one query's lifetime: the scope that bounds
block-manager pressure at 100 TB without a session-wide leak.

Split out of queries.py (r13) so OPERATORS can register without the
circular operators→queries import; queries.py keeps its thin
``_finalize_release`` / ``_release_pending_caches`` wrappers.
"""

from __future__ import annotations

_LIVE: list = []


def register(*dfs) -> None:
    """Queue persisted DataFrames for release at the next query build."""
    _LIVE.extend(dfs)


def release_pending() -> None:
    """Unpersist every queued frame (best effort — the session may have
    been stopped/rebuilt between queries)."""
    while _LIVE:
        c = _LIVE.pop()
        try:
            c.unpersist()
        except Exception:
            pass
