"""Bench continuity check (VERDICT r2 item 7): compare a fresh bench.py
JSON line against the previous round's recorded bench and flag per-query
regressions beyond a threshold.

Usage:
    python bench.py > /tmp/bench_now.json   # or let the driver run it
    python tools/bench_compare.py /tmp/bench_now.json [BENCH_r02.json] [1.3]

The baseline file may be either a raw bench.py JSON line or the driver's
wrapper format (JSON with a ``tail`` field containing the line).

Exit code 1 when any query regressed more than the threshold — so the
check can gate a commit.
"""

from __future__ import annotations

import json
import re
import sys


def load_bench(path: str) -> dict:
    with open(path) as f:
        raw = f.read()
    try:
        doc = json.loads(raw)
    except json.JSONDecodeError:
        # maybe a multi-line log; grab the last JSON-looking line
        line = [l for l in raw.splitlines() if l.startswith("{")][-1]
        doc = json.loads(line)
    if "queries" in doc:
        return doc
    if "tail" in doc:  # driver wrapper: bench line is embedded in the tail
        m = re.search(r'\{"metric".*\}', doc["tail"])
        if not m:
            raise ValueError(f"no bench line inside {path}")
        return json.loads(m.group(0))
    raise ValueError(f"unrecognized bench format: {path}")


def main() -> int:
    now_path = sys.argv[1]
    base_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_r02.json"
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3

    now, base = load_bench(now_path), load_bench(base_path)
    nq, bq = now["queries"], base["queries"]
    shared = sorted(set(nq) & set(bq))

    regressions, improvements = [], []
    for name in shared:
        if bq[name] <= 0:
            continue
        ratio = nq[name] / bq[name]
        if ratio > threshold:
            regressions.append((name, bq[name], nq[name], ratio))
        elif ratio < 1 / threshold:
            improvements.append((name, bq[name], nq[name], ratio))

    shared_base = sum(bq[n] for n in shared)
    shared_now = sum(nq[n] for n in shared)
    print(
        f"shared queries: {len(shared)}  "
        f"total {shared_base:.1f}s -> {shared_now:.1f}s "
        f"({shared_now / shared_base:.2f}x)"
    )
    new = sorted(set(nq) - set(bq))
    if new:
        print(f"new queries ({len(new)}): {', '.join(new)}")
    for name, b, n, r in sorted(improvements, key=lambda t: t[3]):
        print(f"  faster  {name}: {b:.2f}s -> {n:.2f}s ({r:.2f}x)")
    for name, b, n, r in sorted(regressions, key=lambda t: -t[3]):
        print(f"  REGRESSED  {name}: {b:.2f}s -> {n:.2f}s ({r:.2f}x)")
    if not regressions:
        print(f"no query regressed beyond {threshold}x")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
