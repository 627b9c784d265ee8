"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column names,
and an order-insensitive value hash (columns sorted by name, rows sorted,
values canonicalized). Usage:

    python tools/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def frame_fingerprint(cols: list[str], rows: list[tuple]) -> tuple:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    canon_rows = sorted(
        "\x1f".join(_canon(r[i]) for i in order) for r in rows
    )
    import hashlib

    h = hashlib.sha256("\x1e".join(canon_rows).encode()).hexdigest()
    return sorted_cols, len(rows), h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from search_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]",
                      extra_conf={"spark.sql.shuffle.partitions": "8"})

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"✗ {name}: SPARK ERROR {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"• {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = [tuple(r) for r in res.fetchall()]
        except Exception as e:  # noqa: BLE001
            print(f"✗ {name}: DUCKDB ERROR {type(e).__name__}: {e}")
            failures.append(name)
            continue
        sfp = frame_fingerprint(scols, srows)
        ofp = frame_fingerprint(ocols, orows)
        if sfp == ofp:
            print(f"✓ {name}: {sfp[1]} rows match ({time.time()-t0:.1f}s)")
        else:
            print(f"✗ {name}: MISMATCH spark(cols={sfp[0]}, n={sfp[1]}, "
                  f"h={sfp[2][:12]}) duckdb(cols={ofp[0]}, n={ofp[1]}, "
                  f"h={ofp[2][:12]})")
            if sfp[1] <= 20 and ofp[1] <= 20:
                print("  spark:", sorted(srows)[:20])
                print("  duckdb:", sorted(orows)[:20])
            failures.append(name)
    print(f"\n{len(failures)} failures: {failures}" if failures
          else "\nALL MATCH")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
