"""BPE merge learning: distributed learner vs the single-machine reference
(Sennrich et al. 2016 semantics — greedy left-to-right, count-then-lex
tie-break), plus the zero-UDF segmentation expression."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_spark.operators.bpe import (
    learn_bpe,
    reference_bpe,
    reference_segment,
    segment_expr,
)

# the classic toy corpus (word → count)
TOY = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


@pytest.fixture(scope="module")
def words(spark):
    return spark.createDataFrame(list(TOY.items()), ["word", "n"])


def test_learn_bpe_matches_reference(words):
    got = learn_bpe(words, 6)
    assert got == reference_bpe(TOY, 6)
    # sanity on the classic example: 'es' (newest+widest = 9) merges first
    assert (got[0][1], got[0][2], got[0][3]) == ("e", "s", 9)


def test_learn_bpe_stops_when_no_pairs(spark):
    one = spark.createDataFrame([("a", 3), ("b", 2)], ["word", "n"])
    assert learn_bpe(one, 4) == []


def test_reference_greedy_overlap_semantics():
    # "aaa" under merge (a,a) → [aa, a], never [a, aa]
    assert reference_segment("aaa", [("a", "a")]) == ["aa", "a"]
    assert reference_segment("aaaa", [("a", "a")]) == ["aa", "aa"]


def test_segment_expr_matches_reference(spark, words):
    merges = [(l, r) for _, l, r, _ in reference_bpe(TOY, 6)]
    got = {
        r["word"]: r["segs"]
        for r in words.select(
            "word", segment_expr(F.col("word"), merges).alias("segs")
        ).collect()
    }
    for w in TOY:
        assert got[w] == reference_segment(w, merges), w


def test_segment_expr_regex_special_symbols(spark):
    # symbols that are regex metacharacters must be escaped in both the
    # pattern and the Java replacement string
    df = spark.createDataFrame([("$$..",)], ["word"])
    merges = [("$", "$"), ("$$", "."), (".", ".")]
    got = df.select(segment_expr(F.col("word"), merges).alias("s")).head()["s"]
    assert got == reference_segment("$$..", merges)


def test_segment_expr_overlap_on_spark(spark):
    df = spark.createDataFrame([("aaa",), ("aaaa",)], ["word"])
    got = {
        r["word"]: r["s"]
        for r in df.select(
            "word", segment_expr(F.col("word"), [("a", "a")]).alias("s")
        ).collect()
    }
    assert got["aaa"] == ["aa", "a"]
    assert got["aaaa"] == ["aa", "aa"]


def test_cli_tokenizer_subcommand(tmp_path, spark):
    import os
    import subprocess
    import sys

    inp = str(tmp_path / "texts.parquet")
    spark.createDataFrame(
        [("low low low low low lower lower",),
         ("newest newest newest widest widest widest newest newest newest",)],
        ["text"],
    ).write.parquet(inp)
    out = subprocess.run(
        [sys.executable, "tools/cli.py", "tokenizer", "--input", inp,
         "--merges", "4", "--segment", "lowest"],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        env={**os.environ, "SPARK_GRAFT_CPUS": "4"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l]
    assert lines[0] == "merge_rank,lhs,rhs,pair_count"
    got = [tuple(l.split(",")) for l in lines[1:5]]
    expected = reference_bpe(
        {"low": 5, "lower": 2, "newest": 6, "widest": 3}, 4
    )
    assert got == [(str(a), b, c, str(d)) for a, b, c, d in expected]
    seg_line = [l for l in lines if l.startswith("lowest\t")]
    merges = [(l, r) for _, l, r, _ in expected]
    assert seg_line == [
        "lowest\t" + " ".join(reference_segment("lowest", merges))
    ]
