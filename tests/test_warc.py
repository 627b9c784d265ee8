"""WARC container I/O: encode/decode unit tests + distributed roundtrip.

The container format is public (ISO 28500 / Common Crawl framing); parity
target is *self-consistency* (write → read is byte-identical per url) plus
framing rules a third-party WARC would rely on (per-record gzip members,
skipped non-response records, HTTP head stripping).
"""

import datetime as dt
import gzip

import pytest

from search_spark import datagen
from search_spark.io import warc as W

UTC = dt.timezone.utc
TS = dt.datetime(2024, 3, 1, 12, 0, 5, tzinfo=UTC)


def _rows(n=10, seed=3):
    return [datagen.generate_doc(seed, i)[0] for i in range(n)]


# ---------------------------------------------------------------- encode/decode


def test_single_record_roundtrip_plain():
    rec = W.warc_record_bytes("https://x.org/a", TS, b"<html>hi</html>")
    got = list(W.parse_warc_bytes(rec))
    assert got == [("https://x.org/a", TS, b"<html>hi</html>")]


def test_payload_with_crlf_crlf_inside_html_survives():
    # Content-Length framing must win over separator scanning
    payload = b"<html>\r\n\r\n<body>x</body></html>"
    rec = W.warc_record_bytes("https://x.org/b", TS, payload)
    (_, _, html), = W.parse_warc_bytes(rec)
    assert html == payload


def test_gzip_multistream_members_split():
    recs = [
        W.warc_record_bytes(f"https://x.org/{i}", TS, f"<p>{i}</p>".encode())
        for i in range(5)
    ]
    data = b"".join(gzip.compress(r, 6) for r in recs)
    got = list(W.parse_warc_bytes(data))
    assert [u for u, _, _ in got] == [f"https://x.org/{i}" for i in range(5)]
    assert got[3][2] == b"<p>3</p>"


def test_non_response_records_skipped():
    info = W._warcinfo_record("f.warc")
    rec = W.warc_record_bytes("https://x.org/c", TS, b"<html/>")
    got = list(W.parse_warc_bytes(info + rec))
    assert len(got) == 1 and got[0][0] == "https://x.org/c"


def test_bad_framing_raises():
    with pytest.raises(ValueError, match="bad WARC framing"):
        list(W.parse_warc_bytes(b"NOT-A-WARC\r\n\r\n"))


def test_truncated_block_raises():
    rec = W.warc_record_bytes("https://x.org/d", TS, b"<html>full</html>")
    with pytest.raises(ValueError, match="truncated"):
        list(W.parse_warc_bytes(rec[:-12]))


# ---------------------------------------------------------------- spark paths


@pytest.mark.parametrize("gz", [True, False])
def test_distributed_roundtrip(spark, tmp_path, gz):
    rows = _rows(24)
    pages = datagen.generate_web_pages(spark, 24, seed=3, partitions=4)
    out = str(tmp_path / ("gz" if gz else "plain"))
    manifest = W.write_warc(pages, out, gzip_members=gz).collect()

    # one file per non-empty partition; counts add up
    assert sum(m.n_records for m in manifest) == 24
    assert len(manifest) == 4
    for m in manifest:
        assert m.n_bytes > 0

    back = W.read_warc(spark, out).collect()
    got = {r.url: (r.warc_ts, bytes(r.html)) for r in back}
    assert len(got) == 24
    for row in rows:
        ts, html = got[row["url"]]
        assert html == row["html"]  # byte-identical per url
        assert ts.replace(tzinfo=UTC) == row["warc_ts"]


def test_read_warc_plan_prunes_file_metadata(spark, tmp_path):
    pages = datagen.generate_web_pages(spark, 8, seed=3, partitions=2)
    out = str(tmp_path / "w")
    W.write_warc(pages, out).collect()
    df = W.read_warc(spark, out)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # only the content column feeds the parser (path/length/modTime pruned)
    assert "ReadSchema" in plan and "content" in plan
    assert "modificationTime" not in plan.split("ReadSchema")[1][:200]


# ---------------------------------------------------------------- cdx index


def test_surt_key():
    assert W.surt("https://news.example.org/d3/x?q=1") == "org,example,news)/d3/x?q=1"
    assert W.surt("http://Example.ORG") == "org,example)/"
    assert W.surt("https://u:p@example.org:8080/a") == "org,example)/a"


@pytest.mark.parametrize("gz", [True, False])
def test_cdx_fetch_is_byte_identical(spark, tmp_path, gz):
    rows = _rows(20)
    pages = datagen.generate_web_pages(spark, 20, seed=3, partitions=3)
    out = str(tmp_path / "w")
    W.write_warc(pages, out, gzip_members=gz, cdx=True).collect()

    cdx = W.read_cdx(spark, out)
    assert cdx.count() == 20
    # point lookup: one url through the byte-range path
    want = rows[7]
    hit = cdx.filter(cdx.url == want["url"])
    got = W.fetch_records(spark, hit).collect()
    assert len(got) == 1
    assert bytes(got[0].html) == want["html"]
    assert got[0].warc_ts.replace(tzinfo=dt.timezone.utc) == want["warc_ts"]


def test_cdx_prefix_range_prunes_before_fetch(spark, tmp_path):
    pages = datagen.generate_web_pages(spark, 40, seed=3, partitions=4)
    out = str(tmp_path / "w")
    W.write_warc(pages, out, cdx=True).collect()
    cdx = W.read_cdx(spark, out)
    # SURT prefix = one path subtree (urls are example.org/d{id%20}/doc{id})
    sub = cdx.filter(cdx.urlkey.startswith("org,example)/d3/"))
    fetched = W.fetch_records(spark, sub).collect()
    want_urls = {
        datagen.generate_doc(3, i)[0]["url"]
        for i in range(40)
        if i % 20 == 3
    }
    assert {r.url for r in fetched} == want_urls and len(want_urls) == 2


def test_cdx_sidecar_is_surt_sorted(spark, tmp_path):
    pages = datagen.generate_web_pages(spark, 16, seed=3, partitions=1)
    out = str(tmp_path / "w")
    W.write_warc(pages, out, cdx=True).collect()
    import glob

    (cdx_path,) = glob.glob(out + "/*.cdx")
    keys = [line.split(" ", 1)[0] for line in open(cdx_path)]
    assert keys == sorted(keys) and len(keys) == 16


# ------------------------------------------------------------ pipeline input


def test_read_warc_skips_cdx_sidecars(spark, tmp_path):
    pages = datagen.generate_web_pages(spark, 8, seed=3, partitions=2)
    out = str(tmp_path / "w")
    W.write_warc(pages, out, cdx=True).collect()
    assert W.read_warc(spark, out).count() == 8  # .cdx files ignored


def test_warc_dir_feeds_kg_pipeline(spark, tmp_path):
    """Raw crawl → triples: WARC archives are a first-class pipeline input
    (derive_lang fills the lang column the input_hint table carries)."""
    from search_spark.pipeline import PipelineConfig, run_to_snapshot

    pages = datagen.generate_web_pages(spark, 30, seed=3, partitions=3)
    warc_dir = str(tmp_path / "crawl")
    W.write_warc(pages, warc_dir).collect()

    crawl = W.derive_lang(W.read_warc(spark, warc_dir))
    assert set(crawl.columns) == {"url", "warc_ts", "html", "lang"}
    metrics = run_to_snapshot(
        spark, crawl, str(tmp_path / "kg"), PipelineConfig(), n_buckets=4
    )
    assert metrics["n_docs"] > 0 and metrics["n_triples"] > 0


def test_run_pipeline_cli_warc_format(spark, tmp_path, capsys):
    """tools/run_pipeline.py --input-format warc end-to-end (argparse +
    auto-detection), reusing the active test session."""
    import json as _json
    import sys

    sys.path.insert(0, "tools")
    import run_pipeline

    pages = datagen.generate_web_pages(spark, 12, seed=3, partitions=2)
    warc_dir = str(tmp_path / "crawl.warc.d")
    W.write_warc(pages, warc_dir).collect()

    argv = sys.argv
    sys.argv = [
        "run_pipeline.py", "--input", warc_dir, "--input-format", "warc",
        "--output", str(tmp_path / "kg"), "--n-buckets", "4",
    ]
    try:
        assert run_pipeline.main() == 0
    finally:
        sys.argv = argv
    metrics = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert metrics["n_docs"] > 0
