"""Kill/resume probe at the 128k spot-check corpus (VERDICT r4 item 4).

BASELINE.md's resumability target is a kill/rerun test at real scale:
run the pipeline into a snapshot table, SIGKILL the driver mid-write,
rerun, and verify (a) only the un-committed work reprocesses and (b)
the final triple multiset is identical to an uninterrupted run.

Protocol (parent process):
1. Reference run — fresh root, the corpus in 4 url-hash batches, each
   committed as its own snapshot; record every batch's doc count and
   the table's order-independent content fingerprint.
2. Interrupted run — a worker subprocess runs the same batches into a
   second root; the parent watches its progress stream and SIGKILLs the
   whole process group while batch 3's snapshot write is in flight.
   The kill must land between data-write start and the lineage-JSON
   commit rename — verified post-mortem (uncommitted
   ``data/snapshot=3`` debris, no lineage for it).
3. ``SnapshotTable.remove_orphans`` sweeps the partial write.
4. Rerun the worker to completion: batches 1-2 must report
   ``resumed, n_docs=0`` (anti-join resume — no recompute), batches
   3-4 process exactly their own docs.
5. Fingerprint equality vs the reference run.

Writes a dated ``resume_after_kill`` entry into SPOTCHECK.json.
The deterministic small-scale twin of this probe (simulated crash
debris instead of a timing-dependent SIGKILL) runs in CI:
tests/test_resume_kill.py.

Usage: python tools/resume_probe.py [n_docs] (default 128000)
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import signal
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_BATCHES = 4


def _fingerprint(spark, root):
    """Order-independent multiset fingerprint + count of a table."""
    from pyspark.sql import functions as F

    from search_spark.io.snapshots import SnapshotTable

    df = SnapshotTable(spark, root).load()
    if df is None:
        return {"n": 0, "h": 0}
    row = (
        df.select(
            F.xxhash64(
                "subj", "pred", "obj", "prov", "url"
            ).alias("h")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("h").cast("decimal(38,0)")).alias("s"),
            F.sum(F.abs("h") % 1_000_003).alias("m"),
        )
        .collect()[0]
    )
    return {"n": row["n"], "h": str(row["s"]), "m": int(row["m"])}


def _run_worker(root, corpus, kill_during_batch=None):
    """Run the batch worker; optionally SIGKILL its process group while
    the given batch's snapshot DATA write is in flight — triggered by
    the snapshot directory appearing on disk before its lineage-JSON
    commit (the writer creates the dir at write start and part files
    land progressively, so polling catches the in-flight window).
    Returns (status, per-batch n_docs dict)."""
    cmd = [sys.executable, "tools/resume_probe_worker.py", root, corpus]
    proc = subprocess.Popen(
        cmd, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True, start_new_session=True,
    )
    batches = {}
    killed = False
    try:
        for line in proc.stdout:
            line = line.strip()
            if not line.startswith("{"):
                continue
            ev = json.loads(line)
            print(f"# worker: {ev}", file=sys.stderr, flush=True)
            if ev.get("event") == "batch_done":
                batches[ev["batch"]] = ev["n_docs"]
            if (
                kill_during_batch is not None
                and ev.get("event") == "write_started"
                and ev["batch"] == kill_during_batch
            ):
                # the batch id is also its snapshot id (fresh root,
                # batches commit in order)
                data_dir = f"{root}/data/snapshot={kill_during_batch}"
                lineage = (
                    f"{root}/_lineage/"
                    f"snapshot={kill_during_batch}.json"
                )
                deadline = time.time() + 600
                while time.time() < deadline:
                    if os.path.exists(lineage):
                        break  # write already committed — too late
                    if os.path.isdir(data_dir):
                        os.killpg(proc.pid, signal.SIGKILL)
                        killed = True
                        break
                    time.sleep(0.05)
                break
    finally:
        proc.stdout.close()
        proc.wait()
    return ("killed" if killed else "completed"), batches


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 128_000

    from search_spark import datagen
    from search_spark.io.snapshots import SnapshotTable
    from search_spark.session import get_spark

    spark = get_spark("resume-probe", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    corpus = f"/tmp/scaling_corpus_v3_{n_docs}"
    if not os.path.isdir(corpus):
        datagen.generate_web_pages(
            spark, n_docs, seed=42, partitions=128,
            n_para_range=(8, 12), n_sent_range=(2, 4),
        ).write.parquet(corpus)

    base = tempfile.mkdtemp(prefix="resume-probe-")
    ref_root = os.path.join(base, "ref")
    kill_root = os.path.join(base, "killed")

    print("=== reference (uninterrupted) run ===", file=sys.stderr)
    t0 = time.time()
    status, ref_batches = _run_worker(ref_root, corpus)
    ref_wall = round(time.time() - t0, 1)
    assert status == "completed", status
    ref_fp = _fingerprint(spark, ref_root)

    print("=== interrupted run (SIGKILL mid-batch-3 write) ===",
          file=sys.stderr)
    status, pre_batches = _run_worker(
        kill_root, corpus, kill_during_batch=3
    )
    assert status == "killed", status
    # post-mortem: the killed batch must NOT be committed...
    committed = SnapshotTable(spark, kill_root).snapshots()
    uncommitted_debris = [
        d for d in os.listdir(f"{kill_root}/data")
        if d.startswith("snapshot=")
        and int(d.split("=")[1]) not in committed
    ] if os.path.isdir(f"{kill_root}/data") else []
    kill_landed_mid_write = bool(uncommitted_debris)
    print(f"# committed={committed} debris={uncommitted_debris}",
          file=sys.stderr)

    swept = SnapshotTable(spark, kill_root).remove_orphans()
    print(f"# orphan sweep: {swept}", file=sys.stderr)

    print("=== rerun to completion ===", file=sys.stderr)
    t0 = time.time()
    status, rerun_batches = _run_worker(kill_root, corpus)
    rerun_wall = round(time.time() - t0, 1)
    assert status == "completed", status

    fp = _fingerprint(spark, kill_root)
    already_done = set(pre_batches)
    reprocessed = {
        b: n for b, n in rerun_batches.items() if n > 0
    }
    resume_correct = all(
        rerun_batches.get(b, -1) == 0 for b in already_done
    )
    match = fp == ref_fp

    entry = {
        "at": dt.datetime.now(dt.timezone.utc).isoformat(
            timespec="seconds"
        ),
        "n_docs": n_docs,
        "protocol": (
            "4 url-hash batches -> 4 snapshot commits; SIGKILL the "
            "worker process group 2s into batch 3's snapshot write; "
            "remove_orphans; rerun all batches"
        ),
        "kill_landed_mid_write": kill_landed_mid_write,
        "committed_before_rerun": committed,
        "uncommitted_debris_dirs": uncommitted_debris,
        "orphan_sweep": swept,
        "batches_done_before_kill": pre_batches,
        "rerun_docs_per_batch": rerun_batches,
        "resume_skipped_committed_batches": resume_correct,
        "fingerprint_matches_uninterrupted": match,
        "ref_fingerprint": ref_fp,
        "rerun_fingerprint": fp,
        "ref_wall_sec": ref_wall,
        "rerun_wall_sec": rerun_wall,
    }
    spot_path = os.path.join(REPO, "SPOTCHECK.json")
    try:
        with open(spot_path) as f:
            spot = json.load(f)
    except (OSError, ValueError):
        spot = {}
    spot["resume_after_kill"] = entry
    with open(spot_path, "w") as f:
        json.dump(spot, f, indent=2)
    print(json.dumps(entry))
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()
    ok = resume_correct and match and kill_landed_mid_write
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
