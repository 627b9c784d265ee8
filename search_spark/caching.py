"""Session-lifetime bookkeeping for persisted pipeline intermediates.

``build_triples`` / ``link_stage`` persist shared subtrees (mentions,
distinct surface forms, the canonical mapping) so the expensive UDF chain
runs once per job. In a long-lived session those cached blocks would
otherwise accumulate across repeated pipeline runs until eviction; callers
that finish a run release them here (``run_to_snapshot`` does this
automatically after its snapshot write).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_INTERMEDIATES: list[DataFrame] = []


def register(df: DataFrame) -> DataFrame:
    """Track a persisted intermediate for later release; returns ``df``."""
    _INTERMEDIATES.append(df)
    return df


def release_intermediates() -> int:
    """Unpersist every tracked intermediate (non-blocking); returns count."""
    n = len(_INTERMEDIATES)
    for df in _INTERMEDIATES:
        try:
            df.unpersist()
        except Exception:  # session already stopped — nothing to release
            pass
    _INTERMEDIATES.clear()
    return n
