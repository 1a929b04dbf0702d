"""Session-scoped registry of persisted intermediates.

Several operators persist small intermediate frames that feed multiple
consumers (LSH signatures/edges, shingle frames, the model-matrix span
frames).  The persist is load-bearing — without it Catalyst re-executes
the producing stage once per consumer — but the frames would otherwise
accumulate in executor storage across a long-lived session that runs many
registry queries (bench.py runs all headline queries in one session and
releases between queries; the scaling children are one-shot subprocesses).

``tracked_persist`` is a drop-in replacement for ``df.persist()`` that
records the frame; ``release_all()`` unpersists everything recorded so
far.  Call it after the final action of a query when the session outlives
the query (tests do this via an autouse fixture; one-shot subprocesses
don't need to).
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame

_TRACKED: List[DataFrame] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() + register for later release_all()."""
    df = df.persist()
    _TRACKED.append(df)
    return df


def release_all() -> int:
    """Unpersist every tracked frame (blocking=False); returns the count."""
    n = 0
    while _TRACKED:
        df = _TRACKED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    return n
