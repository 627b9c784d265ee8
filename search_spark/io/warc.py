"""WARC container I/O — the Common-Crawl wire format for web pages.

The north-star input is "an Iceberg table of Common-Crawl-style web pages"
(BASELINE.json ``input_hint``); the table side is covered by
``datagen.WEB_PAGES_SCHEMA`` + ``io.snapshots``.  This module covers the
*container* side: real Common Crawl data arrives as WARC/1.0 files
(ISO 28500) — ~1 GB archives where **each record is an independent gzip
member** so readers can skip to any record without decompressing the whole
file.  A from-scratch ingestion pipeline therefore needs:

  * ``read_warc(spark, path)``   WARC files → (url, warc_ts, html) DataFrame
  * ``write_warc(df, out_dir)``  web_pages DataFrame → WARC files (one per
    partition, written executor-side; returns a manifest DataFrame)

Scale notes (the part that matters at 10^12 documents):

  * WARC is **not splittable** — gzip members carry no sync markers, so the
    unit of parallelism is the *file*, exactly how Common Crawl ships data
    (a crawl is ~80k × ~1 GB segments → ~80k parallel tasks, far above any
    realistic executor count; per-file skew is bounded because the crawler
    rolls files at a target size).  We read via ``binaryFile`` (one row =
    one file, loaded on the executor that parses it — never the driver) and
    parse inside ``mapInPandas`` so the html bytes stay in Arrow batches.
  * A 1 GB archive decompresses to ~3-5 GB of records, but the parser is a
    *generator*: it walks gzip members one at a time and yields bounded
    pandas batches, so peak executor memory is O(file + batch), not
    O(decompressed archive).
  * The writer emits one WARC file per input partition from inside
    ``mapInPandas`` (records stream to disk per-row) and returns a
    one-row-per-file manifest — the same lineage shape as
    ``snapshots.SnapshotTable`` — so ingestion is resumable per file.

Reference parity: the reference ingests article *files* from a local
directory scan (``data_and_models/pipelines/.../download``, scoped out by
SURVEY §7.4 as HTTP); WARC is the web-corpus equivalent of that source
slot, done Spark-first.  Only stdlib (``gzip``/``zlib``) is used — no
``warcio`` dependency.
"""

from __future__ import annotations

import datetime as _dt
import gzip
import io as _io
import json
import os
import uuid
import zlib
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_CRLF = b"\r\n"
_GZIP_MAGIC = b"\x1f\x8b"

# (url, warc_ts, html) — the container carries no derived columns; `text`
# and `lang` are *computed* downstream (extract stage / langid), matching
# how Common Crawl's WARC → WET derivation works.
WARC_PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
    ]
)

WARC_MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("n_records", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)


# --------------------------------------------------------------------------
# record encode
# --------------------------------------------------------------------------


def _warc_date(ts: _dt.datetime) -> str:
    if ts.tzinfo is None:
        ts = ts.replace(tzinfo=_dt.timezone.utc)
    return ts.astimezone(_dt.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")


def warc_record_bytes(
    url: str,
    ts: _dt.datetime,
    payload: bytes,
    record_type: str = "response",
) -> bytes:
    """Serialize one WARC/1.0 record. ``response`` records wrap the payload
    in a minimal HTTP/1.1 response block (Content-Length framing, never
    chunked), which is how Common Crawl stores fetched pages."""
    if record_type == "response":
        http_head = (
            b"HTTP/1.1 200 OK" + _CRLF
            + b"Content-Type: text/html; charset=utf-8" + _CRLF
            + b"Content-Length: " + str(len(payload)).encode() + _CRLF
            + _CRLF
        )
        block = http_head + payload
        content_type = b"application/http; msgtype=response"
    else:
        block = payload
        content_type = b"application/warc-fields"

    headers = [
        b"WARC/1.0",
        b"WARC-Type: " + record_type.encode(),
        b"WARC-Record-ID: <urn:uuid:"
        + str(uuid.uuid5(uuid.NAMESPACE_URL, url + _warc_date(ts))).encode()
        + b">",
        b"WARC-Date: " + _warc_date(ts).encode(),
        b"Content-Type: " + content_type,
        b"Content-Length: " + str(len(block)).encode(),
    ]
    if record_type == "response":
        headers.insert(2, b"WARC-Target-URI: " + url.encode())
    return _CRLF.join(headers) + _CRLF + _CRLF + block + _CRLF + _CRLF


def _warcinfo_record(filename: str) -> bytes:
    fields = (
        b"software: search_spark\r\nformat: WARC File Format 1.0\r\n"
    )
    return warc_record_bytes(
        "urn:warcinfo:" + filename,
        _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc),
        fields,
        record_type="warcinfo",
    )


# --------------------------------------------------------------------------
# record decode
# --------------------------------------------------------------------------


_GZ_CHUNK = 1 << 20  # feed the decompressor 1 MiB at a time


def _split_gzip_members(data: bytes) -> Iterator[bytes]:
    """Yield the decompressed payload of each gzip member in a multistream
    file (Common Crawl framing: one member per record).

    Linear in the archive size: input is fed in fixed chunks off a
    zero-copy memoryview — slicing ``data[pos:]`` per member (and letting
    ``unused_data`` copy the whole tail) would be quadratic on an archive
    with tens of thousands of members."""
    view = memoryview(data)
    n = len(data)
    pos = 0
    while pos < n:
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        out = bytearray()
        while not d.eof:
            if pos >= n:
                raise ValueError("truncated gzip member in WARC file")
            chunk = view[pos : pos + _GZ_CHUNK]
            out += d.decompress(chunk)
            pos += len(chunk) - len(d.unused_data)
        yield bytes(out)


def _parse_record(
    data: bytes, pos: int
) -> tuple[dict[str, str], bytes, int]:
    """Parse one record starting at absolute offset ``pos``. Returns
    (headers, block, next absolute offset past the trailing CRLF CRLF).
    Absolute offsets keep the scan linear — re-slicing ``data[pos:]`` per
    record would copy the remaining stream every record."""
    if data[pos : pos + 5] != b"WARC/":
        raise ValueError(
            "bad WARC framing: record does not start with WARC/ "
            f"(got {data[pos : pos + 16]!r})"
        )
    head_end = data.index(_CRLF + _CRLF, pos)
    headers: dict[str, str] = {}
    for line in data[pos:head_end].split(_CRLF)[1:]:
        k, _, v = line.partition(b":")
        headers[k.decode().strip().lower()] = v.decode("utf-8", "replace").strip()
    n = int(headers["content-length"])
    block_start = head_end + 4
    block = data[block_start : block_start + n]
    if len(block) != n:
        raise ValueError("truncated WARC record block")
    return headers, block, block_start + n + 4  # + record-final CRLF CRLF


def _iter_records(data: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Iterate (headers, block) over a *plain* (already-decompressed) WARC
    byte stream that may hold many concatenated records."""
    pos = 0
    while pos < len(data):
        # tolerate extra blank lines between records
        while pos < len(data) and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= len(data):
            break
        headers, block, pos = _parse_record(data, pos)
        yield headers, block


def _http_payload(block: bytes) -> bytes:
    """Strip the HTTP response head from a ``response`` record block."""
    sep = block.find(_CRLF + _CRLF)
    if sep < 0 or not block.startswith(b"HTTP/"):
        return block  # non-HTTP response payload: take the block verbatim
    return block[sep + 4 :]


def parse_warc_bytes(
    data: bytes,
) -> Iterator[tuple[str, _dt.datetime, bytes]]:
    """Yield (url, warc_ts, html) for every ``response`` record in a WARC
    file given as bytes. Handles both per-record-gzip (Common Crawl) and
    plain framing; other record types (warcinfo/request/metadata) are
    skipped, matching what a WET-style text derivation consumes."""
    if data[:2] == _GZIP_MAGIC:
        streams: Iterable[bytes] = _split_gzip_members(data)
    else:
        streams = [data]
    for chunk in streams:
        for headers, block in _iter_records(chunk):
            if headers.get("warc-type") != "response":
                continue
            url = headers["warc-target-uri"]
            ts = _dt.datetime.strptime(
                headers["warc-date"], "%Y-%m-%dT%H:%M:%SZ"
            ).replace(tzinfo=_dt.timezone.utc)
            yield url, ts, _http_payload(block)


# --------------------------------------------------------------------------
# Spark reader / writer
# --------------------------------------------------------------------------

_READ_BATCH_ROWS = 1024


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC file(s) → DataFrame(url, warc_ts, html).

    ``binaryFile`` gives one row per file with the content loaded lazily on
    the executor (`PushedFilters` keep directory listing cheap); each file
    is parsed independently inside an Arrow pass, yielding bounded batches
    so a large archive never materializes as one Python object list.
    Parallelism = number of files — the natural WARC unit (see module
    docstring).
    """
    from pyspark.sql import functions as F

    # a directory glob may also match CDX sidecars (<archive>.cdx) — they
    # are index text, not WARC, so drop them before the parse
    files = spark.read.format("binaryFile").load(path)
    files = files.filter(~F.col("path").endswith(".cdx"))

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                urls: list[str] = []
                tss: list[_dt.datetime] = []
                htmls: list[bytes] = []
                for url, ts, html in parse_warc_bytes(bytes(content)):
                    urls.append(url)
                    tss.append(ts)  # tz-aware UTC, same as datagen rows
                    htmls.append(html)
                    if len(urls) >= _READ_BATCH_ROWS:
                        yield pd.DataFrame(
                            {"url": urls, "warc_ts": tss, "html": htmls}
                        )
                        urls, tss, htmls = [], [], []
                if urls:
                    yield pd.DataFrame(
                        {"url": urls, "warc_ts": tss, "html": htmls}
                    )

    return files.select("content").mapInPandas(_parse, schema=WARC_PAGES_SCHEMA)


def write_warc(
    df: DataFrame,
    out_dir: str,
    gzip_members: bool = True,
    cdx: bool = False,
) -> DataFrame:
    """web_pages-shaped DataFrame → WARC files, one per partition, written
    on the executors (records stream straight to disk — nothing collects).

    Returns the manifest DataFrame (path, n_records, n_bytes); the caller
    is expected to materialize it (e.g. ``.collect()`` its few rows) —
    that action *is* the write.  ``gzip_members=True`` produces the
    Common-Crawl framing (one gzip member per record).

    ``cdx=True`` additionally writes a CDXJ-style sidecar per archive
    (``<archive>.cdx``): one ``urlkey ts_epoch {json}`` line per record,
    SURT-sorted, carrying the member's (offset, length) — the Common Crawl
    index layer that turns "fetch these k urls" into k byte-range reads
    instead of a full-archive scan (see :func:`read_cdx` /
    :func:`fetch_records`).
    """
    os.makedirs(out_dir, exist_ok=True)

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.warc")
        if gzip_members:
            out_path += ".gz"
        n = 0
        f: _io.BufferedWriter | None = None
        index: list[tuple[str, str, int, int, int]] = []

        def _emit(rec: bytes) -> tuple[int, int]:
            nonlocal f
            if f is None:
                f = open(out_path, "wb")
                info = _warcinfo_record(os.path.basename(out_path))
                f.write(gzip.compress(info, 6) if gzip_members else info)
            member = gzip.compress(rec, 6) if gzip_members else rec
            off = f.tell()
            f.write(member)
            return off, len(member)

        for pdf in batches:
            for url, ts, html in zip(pdf["url"], pdf["warc_ts"], pdf["html"]):
                ts_py = ts.to_pydatetime() if hasattr(ts, "to_pydatetime") else ts
                off, length = _emit(
                    warc_record_bytes(str(url), ts_py, bytes(html))
                )
                if cdx:
                    index.append(
                        (surt(str(url)), str(url),
                         int(ts_py.timestamp()), off, length)
                    )
                n += 1
        if f is None:  # empty partition: no file
            return
        f.close()
        if cdx:
            with open(out_path + ".cdx", "w", encoding="utf-8") as cf:
                for key, url, ts_epoch, off, length in sorted(index):
                    meta = json.dumps(
                        {"url": url, "offset": off, "length": length},
                        separators=(",", ":"),
                    )
                    cf.write(f"{key} {ts_epoch} {meta}\n")
        yield pd.DataFrame(
            {
                "path": [out_path],
                "n_records": [n],
                "n_bytes": [os.path.getsize(out_path)],
            }
        )

    return (
        df.select("url", "warc_ts", "html")
        .mapInPandas(_write, schema=WARC_MANIFEST_SCHEMA)
    )


# --------------------------------------------------------------------------
# CDX index: pruned random access (the Common Crawl cc-index pattern)
# --------------------------------------------------------------------------


def surt(url: str) -> str:
    """Sort-friendly URI Reordering Transform — the key Common Crawl's CDX
    index sorts by: scheme dropped, host dot-reversed and comma-joined, so
    all pages of a site (and of a path subtree) are one contiguous key
    range. ``https://news.example.org/d3/x`` → ``org,example,news)/d3/x``.
    """
    rest = url.split("://", 1)[-1]
    host, sep, path = rest.partition("/")
    host = host.split("@")[-1].split(":")[0].lower()
    return ",".join(reversed(host.split("."))) + ")/" + (path if sep else "")


CDX_SCHEMA = T.StructType(
    [
        T.StructField("urlkey", T.StringType(), False),
        T.StructField("ts_epoch", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("archive", T.StringType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("length", T.LongType(), False),
    ]
)


def read_cdx(spark: SparkSession, warc_dir: str) -> DataFrame:
    """CDX sidecars → DataFrame(urlkey, ts_epoch, url, archive, offset,
    length). Pure JVM parse (``F.from_json`` over ``spark.read.text``) —
    the index is the *small* side, scanned without touching any archive;
    filters on ``urlkey`` (site / path-subtree prefixes thanks to SURT)
    prune before a single archive byte is read."""
    from pyspark.sql import functions as F

    lines = spark.read.text(os.path.join(warc_dir, "*.cdx"))
    lines = lines.withColumn("_file", F.input_file_name())
    key_ts_json = F.split(F.col("value"), " ", 3)
    meta = F.from_json(
        key_ts_json.getItem(2),
        "url STRING, offset BIGINT, length BIGINT",
    )
    return lines.select(
        key_ts_json.getItem(0).alias("urlkey"),
        key_ts_json.getItem(1).cast("long").alias("ts_epoch"),
        meta["url"].alias("url"),
        F.regexp_replace(
            F.regexp_replace(F.col("_file"), r"^file:/+", "/"), r"\.cdx$", ""
        ).alias("archive"),
        meta["offset"].alias("offset"),
        meta["length"].alias("length"),
    )


def fetch_records(spark: SparkSession, cdx: DataFrame) -> DataFrame:
    """Byte-range fetch: a (filtered) CDX DataFrame → (url, warc_ts, html).

    Repartitions by archive so each task opens each file once, then
    seek+read exactly (offset, length) per record — I/O is proportional to
    the *lookup result*, not the corpus. This is how a 10^12-page corpus
    serves point queries ("re-extract these 10k urls") without a scan.
    """
    n_part = max(1, min(spark.sparkContext.defaultParallelism, 64))

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        handles: dict[str, _io.BufferedReader] = {}
        try:
            for pdf in batches:
                urls: list[str] = []
                tss: list[_dt.datetime] = []
                htmls: list[bytes] = []
                # sequential offsets within each archive (CDX order is not
                # file order after a filter)
                pdf = pdf.sort_values(["archive", "offset"])
                for archive, off, length in zip(
                    pdf["archive"], pdf["offset"], pdf["length"]
                ):
                    fh = handles.get(archive)
                    if fh is None:
                        fh = handles[archive] = open(archive, "rb")
                    fh.seek(int(off))
                    member = fh.read(int(length))
                    for url, ts, html in parse_warc_bytes(member):
                        urls.append(url)
                        tss.append(ts)
                        htmls.append(html)
                if urls:
                    yield pd.DataFrame(
                        {"url": urls, "warc_ts": tss, "html": htmls}
                    )
        finally:
            for fh in handles.values():
                fh.close()

    return (
        cdx.select("archive", "offset", "length")
        .repartition(n_part, "archive")
        .mapInPandas(_fetch, schema=WARC_PAGES_SCHEMA)
    )


# --------------------------------------------------------------------------
# WET-style derivation: fill the input_hint columns a raw crawl lacks
# --------------------------------------------------------------------------

# mirror of the langid_ngram marker heuristic (queries.py EN_MARKERS) —
# duplicated here so io/ never imports the query registry
_EN_MARKERS = ("the", "a", "of", "is")


def derive_lang(pages: DataFrame, threshold: float = 0.03) -> DataFrame:
    """Add the ``lang`` column the input_hint table carries but a raw WARC
    crawl does not: marker-token ratio over the (lowercased) html bytes,
    entirely JVM-side so the heuristic fuses into the scan and the
    downstream ``lang = 'en'`` filter prunes *before* the expensive
    extraction UDF — the same pushdown shape as parquet input. The default
    threshold sits below the text-side langid_ngram cut (0.05) because tag
    and attribute tokens dilute the ratio on raw html."""
    from pyspark.sql import functions as F

    toks = F.split(
        F.lower(F.decode(F.col("html"), "UTF-8")), r"[^a-z]+"
    )
    n = F.size(toks)
    n_en = F.size(F.filter(toks, lambda x: x.isin(*_EN_MARKERS)))
    return pages.withColumn(
        "lang",
        F.when((n > 0) & (n_en / n >= threshold), F.lit("en")).otherwise(
            F.lit("other")
        ),
    )
