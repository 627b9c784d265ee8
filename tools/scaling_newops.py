"""Two-level scale stress for the round-5 continuation graph ops.

Same harness shape as scaling_graph.py: each parallelism level runs in
its own JVM over the 20M-triple skewed KG, min-of-reps walls, and the
merged record lands under SCALING_GRAPH.json["newops_run"]. Asserts
identical result fingerprints across levels (determinism across
parallelism) before recording efficiencies.

Usage: python tools/scaling_newops.py [n_triples [reps]]
"""

from __future__ import annotations

import datetime as dt
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEVELS = (8, 32)


def main() -> int:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_triples = int(argv[0]) if len(argv) > 0 else 20_000_000
    reps = int(argv[1]) if len(argv) > 1 else 2
    strategy = os.environ.get("SPARK_GRAFT_CKPT_STRATEGY", "reliable")

    levels = {}
    for cpus in LEVELS:
        print(f"=== local[{cpus}] strategy={strategy} ===", flush=True)
        out = subprocess.run(
            [sys.executable, "tools/scaling_newops_worker.py",
             str(cpus), str(n_triples), str(reps)],
            capture_output=True, text=True, cwd=REPO,
            env=dict(os.environ, SPARK_GRAFT_CKPT_STRATEGY=strategy),
        )
        if out.returncode != 0:
            sys.stderr.write(out.stderr[-4000:])
            return 1
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        levels[cpus] = json.loads(line)
        print(line, flush=True)

    lo, hi = (levels[c] for c in LEVELS)
    mismatches = [
        name for name in lo["ops"]
        if lo["ops"][name]["fingerprint"] != hi["ops"][name]["fingerprint"]
        or lo["ops"][name]["n_rows"] != hi["ops"][name]["n_rows"]
    ]
    ratio = LEVELS[1] / LEVELS[0]
    per_op = {
        name: round(
            lo["ops"][name]["wall_sec"]
            / (hi["ops"][name]["wall_sec"] * ratio),
            3,
        )
        for name in lo["ops"]
    }
    record = {
        "date": dt.date.today().isoformat(),
        "n_triples": n_triples,
        "strategy": strategy,
        "levels": {str(c): levels[c] for c in LEVELS},
        "efficiency_8_to_32": per_op,
        "efficiency_total": round(
            lo["total_wall_sec"] / (hi["total_wall_sec"] * ratio), 3
        ),
        "results_identical_across_levels": not mismatches,
        "mismatched_ops": mismatches,
    }
    path = os.path.join(REPO, "SCALING_GRAPH.json")
    doc = {}
    if os.path.exists(path):
        with open(path) as f:
            doc = json.load(f)
    doc["newops_run"] = record
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"newops_run": record["efficiency_8_to_32"],
                      "total": record["efficiency_total"],
                      "identical": record["results_identical_across_levels"]}))
    return 0 if not mismatches else 2


if __name__ == "__main__":
    raise SystemExit(main())
