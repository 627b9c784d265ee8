"""Triple-pattern serving queries over the snapshot table.

`SnapshotTable.match_triples` is the point-lookup surface of the
materialized KG: a bound url must prune to its hash bucket before the
scan (partition pruning), bound terms must reach the parquet reader as
pushed filters, and results must equal a plain filter over the full load.
"""

import pytest
from pyspark.sql import functions as F

from search_spark import datagen, pipeline
from search_spark.io.snapshots import SnapshotTable
from tests.test_plans import plan_of


@pytest.fixture(scope="module")
def snapshot(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("triples"))
    pages = datagen.generate_web_pages(spark, 40, seed=11)
    pipeline.run_to_snapshot(spark, pages, root)
    return SnapshotTable(spark, root)


def test_match_triples_equals_plain_filter(snapshot):
    full = snapshot.load()
    some = full.select("subj", "pred", "obj", "url").first()
    got = snapshot.match_triples(
        subj=some["subj"], pred=some["pred"], url=some["url"]
    )
    want = full.filter(
        (F.col("subj") == some["subj"])
        & (F.col("pred") == some["pred"])
        & (F.col("url") == some["url"])
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert got.count() >= 1


def test_match_triples_wildcards(snapshot):
    # all-unbound = the whole table
    assert snapshot.match_triples().count() == snapshot.load().count()
    # pred-only binds one column
    n_type = snapshot.match_triples(pred="has_type").count()
    assert 0 < n_type < snapshot.load().count()


def test_url_probe_prunes_to_one_bucket(snapshot):
    url = snapshot.load().select("url").first()["url"]
    plan = plan_of(snapshot.match_triples(url=url))
    # partition pruning: the scan's partition filter mentions the bucket
    # column; the url equality reaches the parquet pushed filters
    assert "bucket" in plan
    assert "PushedFilters: [" in plan
    assert "IsNotNull(url)" in plan or "EqualTo(url" in plan
    # and the scan reads a single partition directory
    df = snapshot.match_triples(url=url)
    n_parts = df.select(F.input_file_name()).distinct().count()
    buckets = {
        p.split("bucket=")[1].split("/")[0]
        for (p,) in df.select(F.input_file_name()).distinct().collect()
    }
    assert len(buckets) == 1
    assert n_parts >= 1


def test_subj_pred_pushdown(snapshot):
    plan = plan_of(snapshot.match_triples(subj="join", pred="has_type"))
    assert "EqualTo(subj,join)" in plan.replace(" ", "") or "subj" in plan
    assert "PushedFilters: [" in plan


def test_cli_triples_subcommand(snapshot):
    import os
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "tools/cli.py", "triples",
         "--snapshot", snapshot.root, "--pred", "has_type", "--limit", "5"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln]
    assert lines[0].split(",")[:3] == ["subj", "pred", "obj"]
    assert 1 < len(lines) <= 6
    assert all(ln.split(",")[1] == "has_type" for ln in lines[1:])


def test_cli_graph_and_compact_subcommands(snapshot):
    """graph/pagerank prints a rank CSV; compact prints a stats JSON and
    the table remains queryable (incl. time travel) afterwards."""
    import json
    import os
    import subprocess
    import sys

    env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}
    out = subprocess.run(
        [sys.executable, "tools/cli.py", "graph",
         "--snapshot", snapshot.root, "--op", "pagerank",
         "--n-iter", "3", "--limit", "5"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln]
    assert lines[0] == "entity,rank"
    assert 1 < len(lines) <= 6
    ranks = [float(ln.rsplit(",", 1)[1]) for ln in lines[1:]]
    assert ranks == sorted(ranks, reverse=True)

    out2 = subprocess.run(
        [sys.executable, "tools/cli.py", "compact",
         "--snapshot", snapshot.root, "--min-files-per-bucket", "1"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        env=env,
    )
    assert out2.returncode == 0, out2.stderr[-2000:]
    stats = json.loads(out2.stdout.strip().splitlines()[-1])
    assert stats["files_after"] <= stats["files_before"]
    # table still answers a time-travel probe after the rewrite
    assert snapshot.match_triples(pred="has_type", as_of=1).count() > 0


def test_cli_bgp_subcommand(snapshot):
    """bgp runs a two-pattern conjunctive query over the snapshot and
    prints one CSV column per variable."""
    import os
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "tools/cli.py", "bgp",
         "--snapshot", snapshot.root,
         "--pattern", "?m has_type ?t",
         "--not-exists", "?x ?p ?m",
         "--limit", "10"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln]
    assert lines[0] == "m,t"
    assert 1 < len(lines) <= 11


def test_cli_validate_subcommand(snapshot, tmp_path):
    """validate prints the violation CSV and signals conformance via the
    exit code (0 = conforms, 2 = violations)."""
    import json
    import os
    import subprocess
    import sys

    env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}
    ok_shapes = tmp_path / "ok.json"
    ok_shapes.write_text(json.dumps(
        [{"name": "tv", "kind": "pattern", "pred": "has_type",
          "regex": "^[A-Z_]+$"}]
    ))
    out = subprocess.run(
        [sys.executable, "tools/cli.py", "validate",
         "--snapshot", snapshot.root, "--shapes", str(ok_shapes)],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.splitlines()[0] == "shape,node,detail"

    bad_shapes = tmp_path / "bad.json"
    bad_shapes.write_text(json.dumps(
        [{"name": "impossible", "kind": "pattern", "pred": "has_type",
          "regex": "^zzz$"}]
    ))
    out2 = subprocess.run(
        [sys.executable, "tools/cli.py", "validate",
         "--snapshot", snapshot.root, "--shapes", str(bad_shapes),
         "--limit", "5"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        env=env,
    )
    assert out2.returncode == 2, out2.stderr[-2000:]
    lines = [ln for ln in out2.stdout.splitlines() if ln]
    assert 1 < len(lines) <= 6
    assert all(ln.startswith("impossible,") for ln in lines[1:])


def test_cli_graph_hits_and_walks_subcommands(snapshot):
    """hits prints authority-sorted CSV; walks prints a deterministic
    walk-row CSV whose step-0 rows seed every entity."""
    import os
    import subprocess
    import sys

    env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}
    out = subprocess.run(
        [sys.executable, "tools/cli.py", "graph",
         "--snapshot", snapshot.root, "--op", "hits",
         "--n-iter", "3", "--limit", "5"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln]
    assert lines[0] == "entity,authority,hub"
    auths = [float(ln.split(",")[1]) for ln in lines[1:]]
    assert auths == sorted(auths, reverse=True)

    out = subprocess.run(
        [sys.executable, "tools/cli.py", "graph",
         "--snapshot", snapshot.root, "--op", "walks",
         "--n-walks", "1", "--walk-len", "2", "--limit", "500"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln]
    assert lines[0] == "entity,walk_no,step,node"
    seeds = {ln.split(",")[0] for ln in lines[1:] if ln.split(",")[2] == "0"}
    starts = {
        ln.split(",")[3] for ln in lines[1:] if ln.split(",")[2] == "0"
    }
    assert seeds == starts and len(seeds) > 1


def test_cli_kgtrain_subcommand(snapshot, tmp_path):
    """kgtrain writes a labeled parquet: distinct positives, ~k filtered
    negatives per positive, and no negative that is also a true triple."""
    import json
    import os
    import subprocess
    import sys

    out_dir = str(tmp_path / "train")
    out = subprocess.run(
        [sys.executable, "tools/cli.py", "kgtrain",
         "--snapshot", snapshot.root, "--output", out_dir, "-k", "2"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(out.stdout.splitlines()[-1])
    assert stats["n_pos"] > 0
    # filtered protocol: some corruptions collide and are dropped
    assert 0 < stats["n_neg"] <= 2 * stats["n_pos"]

    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT label, COUNT(*) FROM read_parquet('{out_dir}/*.parquet')"
        " GROUP BY label ORDER BY label"
    ).fetchall()
    assert dict(rows) == {0: stats["n_neg"], 1: stats["n_pos"]}
    overlap = con.execute(
        f"""SELECT COUNT(*) FROM read_parquet('{out_dir}/*.parquet') n
            JOIN read_parquet('{out_dir}/*.parquet') p
              ON p.label = 1 AND n.label = 0
             AND p.subj = n.subj AND p.pred = n.pred AND p.obj = n.obj"""
    ).fetchone()[0]
    assert overlap == 0


def test_cli_kgtrain_deepwalk_mode(snapshot, tmp_path):
    """deepwalk mode writes (center, context, n_pairs) skip-gram pairs
    from walks over the snapshot graph; pairs are symmetric."""
    import json
    import os
    import subprocess
    import sys

    out_dir = str(tmp_path / "pairs")
    out = subprocess.run(
        [sys.executable, "tools/cli.py", "kgtrain",
         "--snapshot", snapshot.root, "--output", out_dir,
         "--mode", "deepwalk", "--n-walks", "1", "--walk-len", "3",
         "--window", "1"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(out.stdout.splitlines()[-1])
    assert stats["mode"] == "deepwalk" and stats["n_pairs"] > 0

    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT center, context, n_pairs"
        f" FROM read_parquet('{out_dir}/*.parquet')"
    ).fetchall()
    got = {(c, x): n for c, x, n in rows}
    # window-1 adjacency pairs are symmetric: (a,b) count == (b,a) count
    for (c, x), n in got.items():
        assert got.get((x, c)) == n, (c, x)


def test_cli_sparql_subcommand(snapshot):
    """sparql runs SELECT and ASK query strings over the snapshot."""
    import os
    import subprocess
    import sys

    env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}
    out = subprocess.run(
        [sys.executable, "tools/cli.py", "sparql",
         "--snapshot", snapshot.root,
         "--query",
         "SELECT DISTINCT ?t WHERE { ?m <has_type> ?t . } ORDER BY ?t"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln]
    assert lines[0] == "t" and len(lines) > 1

    ask = subprocess.run(
        [sys.executable, "tools/cli.py", "sparql",
         "--snapshot", snapshot.root,
         "--query", 'ASK { ?m <has_type> ?t . }'],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        env=env,
    )
    assert ask.returncode == 0, ask.stderr[-2000:]
    assert ask.stdout.strip().splitlines()[-1] == "true"


def test_cli_graph_closeness_and_roles(snapshot):
    """The round-5 analytics ride the same graph subcommand: closeness
    prints a harmonic CSV (descending), roles prints role classes."""
    import os
    import subprocess
    import sys

    env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}
    out = subprocess.run(
        [sys.executable, "tools/cli.py", "graph",
         "--snapshot", snapshot.root, "--op", "closeness",
         "--n-iter", "3", "--limit", "5"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln]
    assert lines[0] == "entity,n_reached,harmonic"
    scores = [float(ln.rsplit(",", 1)[1]) for ln in lines[1:]]
    assert scores == sorted(scores, reverse=True) and scores

    out2 = subprocess.run(
        [sys.executable, "tools/cli.py", "graph",
         "--snapshot", snapshot.root, "--op", "roles",
         "--n-iter", "2", "--limit", "8"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        env=env,
    )
    assert out2.returncode == 0, out2.stderr[-2000:]
    lines2 = [ln for ln in out2.stdout.splitlines() if ln]
    assert lines2[0] == "entity,role,class_size"
    assert len(lines2) > 1
