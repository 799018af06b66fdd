"""Process-lifetime temp-artifact registry (VERDICT r12 #6).

Queries that materialize on-disk fixtures (CSV round-trips, Derby
tables, streaming arrival directories, inverted-index stores under
/tmp) register the path here; everything is reclaimed once at
interpreter exit.  Paths are per-application (callers salt with the
Spark application id), so cleanup never races a concurrent session.

This used to live as a private module global in queries/sources_q.py
that queries/events.py and queries/retrieval_q.py reached into
(`from ..sources_q import _ARTIFACTS`) — promoted to a first-class
shared helper so no module depends on another's private state.
"""

from __future__ import annotations

import atexit
import os
import shutil

#: Registered artifact paths (files or directory trees).
ARTIFACTS: set[str] = set()


def register_artifact(path: str) -> str:
    """Mark ``path`` for deletion at interpreter exit; returns it so
    call sites can register inline (``base = register_artifact(p)``)."""
    ARTIFACTS.add(path)
    return path


def cleanup_artifacts() -> None:
    """Remove every registered path (idempotent; missing paths are
    fine — a query may have cleaned up after itself already)."""
    for p in ARTIFACTS:
        if os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
        else:
            try:
                os.remove(p)
            except OSError:
                pass


atexit.register(cleanup_artifacts)
