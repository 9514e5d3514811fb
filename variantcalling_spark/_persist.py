"""Bounded persist bookkeeping (layer-neutral: operators and queries
both chain through it).

Query functions persist shared intermediates but return LAZY
DataFrames, so they can never unpersist themselves (the caller's action
materializes the cache). A long-lived session running the full registry
would accumulate one cached relation per persist site; this ring keeps
at most ``_PERSIST_CAP`` of them alive, unpersisting the oldest
(non-blocking) once the cap is hit. The cap comfortably exceeds any
single bench/correctness phase, so warm-run cache reuse within a phase
is unaffected.
"""

from __future__ import annotations

from collections import deque

_PERSIST_CAP = 48
_persist_ring: deque = deque()


def managed_persist(df):
    """``df.persist()`` with session-lifetime bounded accumulation.
    Chains as ``df.transform(managed_persist)``."""
    df = df.persist()
    _persist_ring.append(df)
    while len(_persist_ring) > _PERSIST_CAP:
        try:
            _persist_ring.popleft().unpersist(blocking=False)
        except Exception:
            pass  # session already stopped; nothing to release
    return df
