"""Lineage-truncation strategy for the iterative operator family.

Every iterative loop in the engine (PageRank / personalized PageRank,
large-star/small-star connected components, label propagation, k-core
peeling, HITS, BFS, forward chaining, SPARQL path repetition) must cut
its growing lineage each round — SURVEY.md §7.3 names "connected
components convergence + lineage growth — checkpoint every iteration"
as a hard part, and the reference bar for a 10^12-document corpus is a
loop that neither re-derives round 1 at round N nor accumulates an
unbounded plan.

Two strategies, selected by the session conf
``spark.searchSpark.checkpoint.strategy``:

``local`` (default)
    ``DataFrame.localCheckpoint`` — blocks live on the executors
    (MEMORY_AND_DISK). Cheapest per round; the right choice for
    bench/test scale and for any loop whose per-round state is
    vocabulary-sized. NOT fault-tolerant on a real cluster (an executor
    loss kills the lineage and the job), and at stress scale the
    accumulated blocks are why the 20M-triple harness historically
    needed a 48g driver heap.

``reliable``
    ``DataFrame.checkpoint`` into a real checkpoint directory
    (``sparkContext.setCheckpointDir``) — the round's state is written
    to files and re-read, so (a) executor loss replays from files, not
    from round 1, and (b) per-round state leaves the JVM heap. This is
    the 1000-executor-cluster default: point
    ``spark.searchSpark.checkpoint.dir`` at shared storage (HDFS/S3).
    Costs one extra computation of the round plan (Spark's reliable
    checkpoint re-runs the RDD to write it) plus the file write/read —
    measured per-round overhead is recorded in BENCH.md / SCALING_GRAPH.

Both strategies preserve the physical partitioning of the checkpointed
plan (``LogicalRDD`` carries ``outputPartitioning``), so the
co-partitioned pagerank/PPR loops keep their no-exchange property on
the cached sides under either strategy.

The strategy is deliberately a *session* conf, not a per-call argument:
a production job flips one submit-time ``--conf`` and every loop in the
engine switches together, exactly like ``spark.sql.shuffle.partitions``.
``truncate(..., strategy=...)`` exists for tests that pin one mode.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame

STRATEGY_KEY = "spark.searchSpark.checkpoint.strategy"
DIR_KEY = "spark.searchSpark.checkpoint.dir"

_VALID = ("local", "reliable")


def strategy(spark) -> str:
    """The session's active truncation strategy (``local``|``reliable``)."""
    s = spark.conf.get(STRATEGY_KEY, "local")
    if s not in _VALID:
        raise ValueError(
            f"{STRATEGY_KEY}={s!r}: expected one of {_VALID}"
        )
    return s


def _ensure_checkpoint_dir(spark) -> str:
    """Make sure the context has a checkpoint dir; create one if not.

    Order: an already-set context dir wins (spark-submit may have set
    it); else ``spark.searchSpark.checkpoint.dir``; else a fresh
    tempdir under ``$TMPDIR`` (sandbox/local-mode convenience — a real
    cluster must point DIR_KEY at shared storage).
    """
    sc = spark.sparkContext
    existing = sc._jsc.sc().getCheckpointDir()
    if existing.isDefined():
        return existing.get()
    conf_dir = spark.conf.get(DIR_KEY, "")
    if not conf_dir:
        conf_dir = tempfile.mkdtemp(
            prefix="search-spark-ckpt-",
            dir=os.environ.get("SPARK_LOCAL_DIRS", None),
        )
    sc.setCheckpointDir(conf_dir)
    return conf_dir


def truncate(
    df: DataFrame, eager: bool = True, strategy: str | None = None
) -> DataFrame:
    """Cut ``df``'s lineage per the session's checkpoint strategy.

    Drop-in replacement for the iterative loops' per-round
    ``localCheckpoint`` calls. ``strategy`` overrides the session conf
    (tests / harnesses that pin one mode).
    """
    spark = df.sparkSession
    s = strategy if strategy is not None else globals()["strategy"](spark)
    if s == "local":
        return df.localCheckpoint(eager=eager)
    if s == "reliable":
        _ensure_checkpoint_dir(spark)
        return df.checkpoint(eager=eager)
    raise ValueError(f"unknown checkpoint strategy {s!r}")


def chain(eager: bool = True, strategy: str | None = None):
    """Chainable form of :func:`truncate` for ``.transform`` call sites:

    ``df.groupBy(...).agg(...).transform(chain(eager=True))``
    """
    return lambda df: truncate(df, eager=eager, strategy=strategy)
