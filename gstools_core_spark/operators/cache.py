"""Registry of persisted intermediates, so long-lived drivers can release
them.

Operators that persist a reused intermediate (minhash signatures, simhash
band tables, n-gram posting lists) return LAZY DataFrames that still
reference the cached data — they cannot unpersist before the caller's
terminal action.  They register the handle here instead; callers running
many queries in one session (the registry's _prep, bench.py, notebooks,
services) call ``clear_tracked()`` between jobs.

Strong references on purpose: the Python handle is tiny, and a weakref
would be collected as soon as the operator returns — leaving the JVM-side
cache block unreachable from Python and therefore unreleasable.
"""

from __future__ import annotations

_TRACKED: list = []


def track(df):
    """Register a persisted DataFrame for later cleanup; returns it."""
    _TRACKED.append(df)
    return df


def clear_tracked() -> int:
    """Unpersist every tracked DataFrame; returns the count released."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist(blocking=False)
            n += 1
        except Exception:  # session already stopped
            pass
    return n
