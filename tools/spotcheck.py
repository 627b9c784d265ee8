"""Large-corpus spot check: one big end-to-end run → SPOTCHECK.json.

Runs the full production path (parquet web_pages input → build_triples
incl. link + canonicalize → bucketed snapshot write + lineage + read-back
metrics) on a corpus 4× the scaling table's largest, at local[32]. The
point is cliff detection: the CC loop, the persist barriers, and the write
path must hold the scaling-table throughput trend as data grows.

Usage: python tools/spotcheck.py [n_docs] [--learned]
(default 128000; --learned additionally runs the trained linear artifacts
through both model slots — PipelineConfig(ner_scoring=True,
learned_models=True) — the production-profile FLOP path plus real weights)

After the snapshot commits, a maintenance pass sizes small-file compaction
at the same corpus: file counts before/after `SnapshotTable.compact()` and
its wall are recorded (the operational path a 100-TB table hits first).

Writes SPOTCHECK.json at the repo root; `tools/bench_scaling.py` folds it
into BENCH.md on its next regeneration so the section survives re-runs.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BENCH_PARA_RANGE = (8, 12)
BENCH_SENT_RANGE = (2, 4)


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--learned"]
    learned = "--learned" in sys.argv[1:]
    n_docs = int(args[0]) if args else 128000

    from search_spark import datagen
    from search_spark.pipeline import PipelineConfig, run_to_snapshot
    from search_spark.session import get_spark

    spark = get_spark("spotcheck", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    # same corpus convention as the scaling workers so one generated
    # parquet serves every bench tool
    corpus = f"/tmp/scaling_corpus_v3_{n_docs}"
    if not os.path.isdir(corpus):
        datagen.generate_web_pages(
            spark,
            n_docs,
            seed=42,
            partitions=128,
            n_para_range=BENCH_PARA_RANGE,
            n_sent_range=BENCH_SENT_RANGE,
        ).write.parquet(corpus)

    cfg = PipelineConfig(ner_scoring=True, learned_models=True) \
        if learned else None

    out_root = tempfile.mkdtemp(prefix="spotcheck_snap_")
    try:
        pages = spark.read.parquet(corpus)
        metrics = run_to_snapshot(spark, pages, out_root, config=cfg)
        # maintenance at the same scale: small-file compaction stats
        from search_spark.io.snapshots import SnapshotTable

        table = SnapshotTable(spark, out_root)
        t0 = time.time()
        comp = table.compact(min_files_per_bucket=1)
        comp["wall_seconds"] = round(time.time() - t0, 2)
    finally:
        shutil.rmtree(out_root, ignore_errors=True)

    record = {
        "generated": dt.datetime.now(dt.timezone.utc).isoformat(
            timespec="seconds"
        ),
        "n_docs": metrics["n_docs"],
        "n_triples": metrics["n_triples"],
        "wall_seconds": metrics["wall_seconds"],
        "docs_per_sec": metrics["docs_per_sec"],
        "triples_per_sec": metrics["triples_per_sec"],
        "mentions_per_doc": metrics["mentions_per_doc"],
        "master": "local[32]",
        "config": {"ner_scoring": bool(learned),
                   "learned_models": bool(learned)},
        "compaction": comp,
    }
    with open(os.path.join(REPO, "SPOTCHECK.json"), "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps(record))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
