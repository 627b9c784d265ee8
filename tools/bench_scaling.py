"""Two-parallelism scaling bench → BENCH.md.

The north rule's criterion — throughput scaling efficiency ≥ 0.8 from N to
4N executors — cannot use a real cluster in this sandbox; per the driver
instruction it is evidenced by running the identical job on the identical
input at two local parallelism levels (local[8] vs local[32]) in separate
JVMs and reporting throughput at both plus efficiency
``(T_N / T_4N) / 4``.

Usage: python tools/bench_scaling.py [n_docs] (default 8000)
"""

from __future__ import annotations

import datetime as dt
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEVELS = (8, 32)


def run_level(cpus: int, n_docs: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "scaling_worker.py"),
         str(cpus), str(n_docs)],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    results = [run_level(c, n_docs) for c in LEVELS]
    r_n, r_4n = results
    efficiency = (r_n["wall_sec"] / r_4n["wall_sec"]) / (
        LEVELS[1] / LEVELS[0]
    )
    summary = {
        "n_docs": n_docs,
        "levels": results,
        "scaling_efficiency": round(efficiency, 3),
        "target": 0.8,
        "passed": efficiency >= 0.8,
    }
    print(json.dumps(summary))

    lines = [
        "# BENCH — KG-pipeline throughput and scaling",
        "",
        f"Generated {dt.datetime.now(dt.timezone.utc).isoformat(timespec='seconds')} "
        "by `python tools/bench_scaling.py`.",
        "",
        "Same job (synthetic `web_pages` corpus, seed=42 → extract → segment →",
        "NER → relations → link → canonicalize → triples), same input, two",
        "parallelism levels in separate JVMs (the sandbox stand-in for N vs 4N",
        "executors — no real cluster here, per BASELINE.md). A warmup run",
        "precedes each measurement; timing covers the pipeline action only.",
        "",
        "| parallelism | docs | triples | wall (s) | docs/sec | triples/sec |",
        "|---|---|---|---|---|---|",
    ]
    for r in results:
        lines.append(
            f"| local[{r['cpus']}] | {r['n_docs']} | {r['n_triples']} "
            f"| {r['wall_sec']} | {r['docs_per_sec']} | {r['triples_per_sec']} |"
        )
    lines += [
        "",
        f"**Scaling efficiency (N→4N)** = (T_8 / T_32) / 4 = "
        f"**{summary['scaling_efficiency']}** "
        f"(target ≥ 0.8: {'PASS' if summary['passed'] else 'FAIL'})",
        "",
        "Method notes:",
        "- separate JVM per level; `spark.sql.shuffle.partitions` = core count;",
        "  AQE enabled (same settings as production path, `search_spark/session.py`).",
        "- corpus generated distributed (`mapInPandas` over `spark.range`) —",
        "  no driver-side data path anywhere in the measured job.",
        "- throughput metric matches BASELINE.json (`triples/sec`, plus",
        "  docs/sec and mentions/doc recorded by `bench.py` / lineage rows).",
    ]
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
