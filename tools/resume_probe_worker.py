"""Batch worker for the kill/resume probe (tools/resume_probe.py).

Runs the spot-check corpus into a snapshot table in N_BATCHES url-hash
batches, one ``run_to_snapshot`` commit per batch, emitting one JSON
progress line per event on stdout:

    {"event": "write_started", "batch": k}
    {"event": "batch_done", "batch": k, "n_docs": n}

``write_started`` fires just before the batch's pipeline+write action —
the window the parent's SIGKILL must land in. The worker is oblivious
to the killing: resume correctness must come entirely from the snapshot
table's commit protocol (data write THEN atomic lineage rename) + the
anti-join on committed processed urls, not from any in-worker handling.

Usage: python tools/resume_probe_worker.py <output_root> <corpus_parquet>
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BATCHES = 4


def main() -> int:
    root, corpus = sys.argv[1], sys.argv[2]

    from pyspark.sql import functions as F

    from search_spark.pipeline import run_to_snapshot
    from search_spark.session import get_spark

    spark = get_spark("resume-probe-worker", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(corpus)

    for k in range(1, N_BATCHES + 1):
        batch = pages.filter(
            F.pmod(F.xxhash64("url"), F.lit(N_BATCHES)) == k - 1
        )
        print(json.dumps({"event": "write_started", "batch": k}),
              flush=True)
        metrics = run_to_snapshot(spark, batch, root)
        print(
            json.dumps({
                "event": "batch_done", "batch": k,
                "n_docs": metrics["n_docs"],
                "n_triples": metrics.get("n_triples", 0),
            }),
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
