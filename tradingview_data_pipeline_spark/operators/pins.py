"""Session-level registry of operator-created persisted frames.

Operators that pin multi-consumer frames (``corpus.bigram_lm_profile``,
``similarity.semantic_dedup`` — the NOTES-31/34 DISK_ONLY pin rule)
attach the handles to their result as ``_pinned_deps``, but callers
that wrap the result in further projections lose that attribute, and a
long-lived session running many such queries accumulates disk-cached
blocks until the JVM context cleaner happens to reclaim them — measured
as a 39 GB block-manager directory after one 50-query bench session.

Every pin is therefore ALSO tracked here; harnesses that run many
queries in one session (bench.py, tools/scale_bench.py,
tools/verify_oracle.py) call ``release_all()`` between queries. Safe to
call at any time: unpersist is idempotent, lazy re-computation keeps
results correct even if a pin is released while its frame is still
referenced (the pin is a performance artifact, never a correctness
one).
"""

from __future__ import annotations

_LIVE: list = []


def track(df):
    """Register a persisted frame for later bulk release; returns it."""
    _LIVE.append(df)
    return df


def release_all(*, blocking: bool = False) -> int:
    """Unpersist every tracked pin; returns how many were released."""
    n = len(_LIVE)
    for d in _LIVE:
        try:
            d.unpersist(blocking=blocking)
        except Exception:  # session gone / already released — harmless
            pass
    _LIVE.clear()
    return n
