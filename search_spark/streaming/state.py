"""Atomic versioned parquet state for ``foreachBatch`` maintainers.

Every streaming state module here follows read-merge-write: fold the
micro-batch, merge with the persisted state, persist the result. A plain
``mode("overwrite")`` of one fixed path is NOT crash-safe for that shape —
Spark deletes the old files before the new ones land, so a crash in
between loses state that checkpoint replay cannot rebuild (the already-
folded batches are gone from the source). The fix is the classic
versioned-commit protocol (what table formats do natively):

1. write the new state to a fresh ``<name>_v<batch_id>`` directory
   beside the old one,
2. flip a ``<name>.CURRENT`` marker file with ``os.replace`` (atomic on
   POSIX),
3. best-effort-drop the superseded version directory.

A crash before (2) leaves the old state live (the replayed batch rewrites
the same ``_v<batch_id>`` dir — batch ids are stable across restarts); a
crash after (2) leaves at worst an orphaned old directory. Readers always
resolve the marker, so they never observe a partial write.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame


def current_state_path(state_dir: str, name: str) -> str | None:
    """Resolve ``<name>.CURRENT`` to the live state directory, or None
    before the first commit (or if the marker points at a missing dir)."""
    marker = os.path.join(state_dir, f"{name}.CURRENT")
    if not os.path.isfile(marker):
        return None
    with open(marker) as fh:
        version = fh.read().strip()
    path = os.path.join(state_dir, version)
    return path if os.path.isdir(path) else None


def commit_state(
    df: DataFrame, state_dir: str, name: str, version: int
) -> str:
    """Persist ``df`` as the new current state; returns the new path."""
    old = current_state_path(state_dir, name)
    new_name = f"{name}_v{version}"
    new_path = os.path.join(state_dir, new_name)
    df.write.mode("overwrite").parquet(new_path)
    os.makedirs(state_dir, exist_ok=True)
    tmp = os.path.join(state_dir, f"{name}.CURRENT.tmp")
    with open(tmp, "w") as fh:
        fh.write(new_name)
    os.replace(tmp, os.path.join(state_dir, f"{name}.CURRENT"))
    if old is not None and old != new_path:
        shutil.rmtree(old, ignore_errors=True)
    return new_path


def read_state(spark, state_dir: str, name: str) -> DataFrame:
    """Read the current committed state; raises if none exists."""
    current = current_state_path(state_dir, name)
    if current is None:
        raise FileNotFoundError(
            f"no committed '{name}' state under {state_dir}"
        )
    return spark.read.parquet(current)
