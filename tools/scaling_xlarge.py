"""Large-corpus scaling addendum: total-throughput efficiency at a corpus
size where per-job fixed costs stop mattering.

The primary scaling table (tools/bench_scaling.py) pairs two mid-size
corpora and reports both total and *marginal* efficiency; at 32k docs the
~5-7 s of per-job driver orchestration (persist barriers, CC loop, AQE
re-planning — constant per job) still depresses the total. Real cluster
jobs at the north rule's scale run for hours, so the fair total-efficiency
number is the asymptotic one: this script times ONE large corpus (default
128k docs, 4× the main table) at N and 4N cores and records totals to
SCALING_XL.json, which tools/bench_scaling.py folds into BENCH.md.

Usage: python tools/scaling_xlarge.py [n_docs [reps]]
"""

from __future__ import annotations

import datetime as dt
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEVELS = (2, 8)

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from search_spark import datagen
from search_spark.pipeline import PipelineConfig, build_triples
from search_spark.session import get_spark

cpus, n_docs, reps = {cpus}, {n_docs}, {reps}
spark = get_spark(f"scaling-xl-{{cpus}}", master=f"local[{{cpus}}]",
                  extra_conf={{"spark.sql.shuffle.partitions": str(cpus)}})
spark.sparkContext.setLogLevel("ERROR")

path = f"/tmp/scaling_corpus_v3_{{n_docs}}"
if not os.path.isdir(path):
    datagen.generate_web_pages(
        spark, n_docs, seed=42, partitions=128,
        n_para_range=(8, 12), n_sent_range=(2, 4),
    ).write.parquet(path)

warm = datagen.generate_web_pages(spark, 200, seed=7)
build_triples(spark, warm, PipelineConfig(ner_scoring=True)).count()
spark.catalog.clearCache()

pages = spark.read.parquet(path)
walls, n_triples = [], 0
for _ in range(reps):
    t0 = time.time()
    n_triples = build_triples(
        spark, pages, PipelineConfig(ner_scoring=True)).count()
    walls.append(round(time.time() - t0, 3))
    spark.catalog.clearCache()
wall = min(walls)
print(json.dumps({{"cpus": cpus, "n_docs": n_docs, "n_triples": n_triples,
                  "wall_sec": wall, "all_walls": walls,
                  "docs_per_sec": round(n_docs / wall, 2),
                  "triples_per_sec": round(n_triples / wall, 2)}}))
spark.stop()
"""


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 128000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    levels = {}
    for cpus in LEVELS:
        out = subprocess.run(
            [sys.executable, "-c",
             WORKER.format(repo=REPO, cpus=cpus, n_docs=n_docs, reps=reps)],
            capture_output=True, text=True, check=True, cwd=REPO,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        levels[cpus] = json.loads(line)
        print(line)

    lo, hi = levels[LEVELS[0]], levels[LEVELS[1]]
    factor = LEVELS[1] / LEVELS[0]
    record = {
        "generated": dt.datetime.now(dt.timezone.utc).isoformat(
            timespec="seconds"
        ),
        "n_docs": n_docs,
        "reps": reps,
        "levels": levels,
        "total_efficiency": round(
            (hi["docs_per_sec"] / lo["docs_per_sec"]) / factor, 3
        ),
    }
    with open(os.path.join(REPO, "SCALING_XL.json"), "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps({"total_efficiency": record["total_efficiency"]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
