"""Spark-free host-scaling control: the environment's achievable ceiling.

Runs the SAME numpy forward pass the NER scoring model uses (chunked
residual MLP over token tiles — operators/ner_scoring.py) under plain
``multiprocessing`` at several process counts, no Spark anywhere. The
aggregate-throughput ratio between process counts is the best ANY
framework can do on this machine — BENCH.md normalizes the pipeline's
measured scaling against this ceiling to separate engine behavior from
shared-host virtualization effects (vCPU steal, neighbors).

Usage: python tools/microbench_host.py [proc_counts...]   (default 2 8 32)
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time

for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ[_v] = "1"

N_SENT_PER_PROC = 6000
SECONDS_CAP = 120


def _work(n_sent: int, out_q) -> None:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import pandas as pd

    from search_spark.operators.ner_scoring import _Model

    model = _Model()
    # small vocabulary like the corpus → token-embedding cache hits dominate,
    # matching the pipeline's per-sentence cost profile (GEMM-bound)
    vocab = [f"tok{i}" for i in range(128)]
    texts = pd.Series(
        [
            " ".join(vocab[(i * 7 + j) % 128] for j in range(18))
            for i in range(n_sent)
        ]
    )
    t0 = time.time()
    model.score_batch(texts)
    out_q.put(time.time() - t0)


def run_level(n_proc: int) -> float:
    q = mp.Queue()
    ps = [
        mp.Process(target=_work, args=(N_SENT_PER_PROC, q))
        for _ in range(n_proc)
    ]
    t0 = time.time()
    for p in ps:
        p.start()
    for p in ps:
        p.join(SECONDS_CAP)
    wall = time.time() - t0
    return n_proc * N_SENT_PER_PROC / wall


def main() -> int:
    levels = [int(a) for a in sys.argv[1:]] or [2, 8, 32]
    rates = {}
    for n in levels:
        best = 0.0
        for _ in range(2):  # min-of-2 walls == max-of-2 rates
            best = max(best, run_level(n))
        rates[n] = best
        print(f"procs={n}: {best:.0f} sentences/s", flush=True)
    base = levels[0]
    for n in levels[1:]:
        speedup = rates[n] / rates[base]
        print(
            f"{base}->{n}: speedup {speedup:.2f}x, "
            f"efficiency {speedup / (n / base):.2f}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
