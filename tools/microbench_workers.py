"""Pure-CPU Arrow-UDF scaling microbenchmark (environment ceiling).

Runs an identical CPU-bound ``mapInPandas`` job (sha256 hash chains — no
pipeline code, no shuffle, no skew) at several ``local[N]`` levels, each in
a fresh JVM of this process's session, and prints rows/sec per level. This
bounds how far ANY python-UDF stage can scale on this machine — used by
BENCH.md to separate the pipeline's scaling from the host's.

Usage: python tools/microbench_workers.py [levels...]   (default 2 8 32)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = 32768
HASH_ITERS = 2000


def run_level(cpus: int) -> float:
    import hashlib

    import pandas as pd

    from search_spark.session import get_spark

    spark = get_spark(
        f"micro-{cpus}",
        master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": str(cpus)},
    )
    spark.sparkContext.setLogLevel("ERROR")

    def work(batches):
        for pdf in batches:
            out = []
            for i in pdf["id"]:
                h = hashlib.sha256(str(i).encode()).digest()
                for _ in range(HASH_ITERS):
                    h = hashlib.sha256(h).digest()
                out.append(h.hex())
            yield pd.DataFrame({"h": out})

    df = spark.range(0, 2048, numPartitions=cpus)
    df.mapInPandas(work, schema="h string").count()  # warmup
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        spark.range(0, N_ROWS, numPartitions=cpus).mapInPandas(
            work, schema="h string"
        ).count()
        best = min(best, time.time() - t0)
    spark.stop()
    return N_ROWS / best


def main() -> int:
    levels = [int(a) for a in sys.argv[1:]] or [2, 8, 32]
    rates = {}
    for c in levels:
        rates[c] = run_level(c)
        print(f"local[{c}]: {rates[c]:.0f} rows/s", flush=True)
    base = levels[0]
    for c in levels[1:]:
        speedup = rates[c] / rates[base]
        print(
            f"{base}->{c}: speedup {speedup:.2f}x, "
            f"efficiency {speedup / (c / base):.2f}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
