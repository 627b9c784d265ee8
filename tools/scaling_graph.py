"""Graph scale-stress harness (VERDICT r3 "Next round" item 1).

Times the iterative graph/SPARQL family on their DISTRIBUTED paths
(``local_threshold=0``) over a synthetic skewed KG 10-50× the bench edge
count, at two parallelism levels in separate JVMs, and writes
SCALING_GRAPH.json with per-op wall / rounds / shuffle bytes plus the
N→4N scaling efficiency — the evidence the north rule's two-cluster-size
criterion asks for, applied to the loops the sf0.01 BENCH numbers never
exercise distributed (they all sit under the count gate there).

Usage: python tools/scaling_graph.py [n_triples [reps]]
Defaults: 2,000,000 triples (~1.2M linked_to edges vs ~40k at bench
scale), min-of-2 walls, levels local[8] vs local[32].
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
    strategy = "local"
    merge_key = None
    for a in sys.argv[1:]:
        if a.startswith("--strategy="):
            strategy = a.split("=", 1)[1]
        if a.startswith("--key="):
            # merge this run under SCALING_GRAPH.json[<key>] instead of
            # overwriting the whole document (e.g. small_graph_run)
            merge_key = a.split("=", 1)[1]
    n_triples = int(argv[0]) if len(argv) > 0 else 2_000_000
    reps = int(argv[1]) if len(argv) > 1 else 2

    env = dict(os.environ, SPARK_GRAFT_CKPT_STRATEGY=strategy)
    levels = {}
    for cpus in LEVELS:
        print(f"=== local[{cpus}] strategy={strategy} ===", flush=True)
        out = subprocess.run(
            [sys.executable, "tools/scaling_graph_worker.py",
             str(cpus), str(n_triples), str(reps)],
            capture_output=True, text=True, cwd=REPO, env=env,
        )
        if out.returncode != 0:
            sys.stderr.write(out.stderr[-4000:])
            return 1
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        levels[cpus] = json.loads(line)
        print(line, flush=True)

    lo, hi = (levels[c] for c in LEVELS)
    ratio = LEVELS[1] / LEVELS[0]
    per_op = {}
    for name in lo["ops"]:
        w_lo, w_hi = lo["ops"][name]["wall_sec"], hi["ops"][name]["wall_sec"]
        per_op[name] = round(w_lo / (w_hi * ratio), 3)
    eff_total = round(
        lo["total_wall_sec"] / (hi["total_wall_sec"] * ratio), 3
    )

    # per-round blowup check: PageRank wall should scale ~linearly in
    # iteration count (lineage truncation holding); record the ratio at
    # the wider level where per-round cost dominates fixed cost least
    blowup = {
        str(c): round(
            levels[c]["ops"]["kg_pagerank_8iter"]["wall_sec"]
            / max(levels[c]["ops"]["kg_pagerank_4iter"]["wall_sec"], 1e-9),
            3,
        )
        for c in LEVELS
    }

    # identical results at both levels (determinism across parallelism)
    rows_match = all(
        lo["ops"][n]["n_rows"] == hi["ops"][n]["n_rows"] for n in lo["ops"]
    )

    doc = {
        "generated_at": dt.datetime.now(dt.timezone.utc).isoformat(
            timespec="seconds"
        ),
        "purpose": (
            "distributed-path stress for the iterative graph/SPARQL ops "
            "(local_threshold=0) on a skewed synthetic KG; evidences the "
            "north rule's N->4N criterion for the loops the sf-scale "
            "bench runs under the count gate"
        ),
        "levels": levels,
        "scaling_efficiency_total": eff_total,
        "scaling_efficiency_per_op": per_op,
        "pagerank_wall_ratio_8iter_over_4iter": blowup,
        "rows_match_across_levels": rows_match,
        "method": (
            f"min-of-{reps} walls, separate JVMs per level, shared corpus "
            "parquet, shuffle bytes from UI REST stage deltas (rep 1)"
        ),
    }
    out_path = os.path.join(REPO, "SCALING_GRAPH.json")
    if merge_key:
        try:
            with open(out_path) as f:
                existing = json.load(f)
        except (OSError, ValueError):
            existing = {}
        prev = existing.get(merge_key)
        if isinstance(prev, dict) and "history" not in doc:
            doc["previous"] = {
                "generated_at": prev.get("generated_at"),
                "scaling_efficiency_total": prev.get(
                    "scaling_efficiency_total"
                ),
                "total_wall_sec_by_level": {
                    c: prev.get("levels", {}).get(c, {}).get(
                        "total_wall_sec"
                    )
                    for c in prev.get("levels", {})
                },
            }
        existing[merge_key] = doc
        with open(out_path, "w") as f:
            json.dump(existing, f, indent=2)
    elif strategy == "reliable":
        # merge under a dedicated key, preserving the local-strategy
        # record (the two runs together are the strategy-overhead
        # evidence VERDICT r4 item 1 asks for)
        try:
            with open(out_path) as f:
                existing = json.load(f)
        except (OSError, ValueError):
            existing = {}
        doc["purpose"] = (
            "reliable-checkpoint-strategy rerun (file-backed round "
            "state, driver heap at the ordinary default instead of "
            "48g) — compare per-op walls vs the local-strategy record"
        )
        existing["reliable_run"] = doc
        with open(out_path, "w") as f:
            json.dump(existing, f, indent=2)
    else:
        with open(out_path, "w") as f:
            json.dump(doc, f, indent=2)
    print(json.dumps({
        "scaling_efficiency_total": eff_total,
        "per_op": per_op,
        "pagerank_8v4_ratio": blowup,
        "rows_match": rows_match,
    }, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
