"""Seeded randomized parity, batch 3: the byte-level web extractors —
sitemap staleness, JSON-LD blocks, web-table cells, politeness slots.
Regex- and parser-shaped operators get random *documents* (pretty-printed,
reordered attributes, missing optional fields, malformed values) and are
checked against independent pure-Python reconstructions of the spec."""

from __future__ import annotations

import datetime
import json
import random


def _mk_rng():
    return random.Random(20260821)


def test_sitemap_frontier_random_vs_python(spark):
    from search_spark.operators.crawl import sitemap_frontier

    rng = _mk_rng()
    hosts = [f"w{i}.example" for i in range(4)]
    locs, entries = [], {}
    sitemap_rows = []
    for h in hosts:
        recs = []
        for i in range(rng.randint(2, 8)):
            loc = f"https://{h}/p{i}"
            locs.append(loc)
            parts = [f"<loc>{loc}</loc>"]
            lastmod = None
            if rng.random() < 0.7:
                day = rng.randint(1, 28)
                lastmod = f"2026-03-{day:02d} 00:00:00"
                parts.append(f"<lastmod>2026-03-{day:02d} 00:00:00</lastmod>")
            elif rng.random() < 0.3:
                parts.append("<lastmod>not-a-date</lastmod>")  # degrade, not throw
            prio = 0.5
            if rng.random() < 0.5:
                prio = round(rng.random(), 1)
                parts.append(f"<priority>{prio}</priority>")
            # pretty-print across lines: the record regex must be DOTALL
            recs.append("<url>\n  " + "\n  ".join(parts) + "\n</url>")
            entries[loc] = (lastmod, prio)
        body = '<?xml version="1.0"?>\n<urlset>\n' + "\n".join(recs) + "\n</urlset>"
        sitemap_rows.append((f"https://{h}/sitemap.xml", body.encode()))

    crawled_rows = []
    captures: dict[str, str] = {}
    for loc in locs:
        for _ in range(rng.randint(0, 2)):
            day = rng.randint(1, 28)
            ts = f"2026-03-{day:02d} 00:00:00"
            crawled_rows.append((loc, ts))
            captures[loc] = max(captures.get(loc, ""), ts)

    expected = {}
    for loc, (lastmod, prio) in entries.items():
        last_fetch = captures.get(loc)
        if last_fetch is None:
            expected[loc] = (prio, "new")
        elif lastmod is not None and lastmod > last_fetch:
            expected[loc] = (prio, "stale")

    sitemaps = spark.createDataFrame(
        sitemap_rows, schema="url string, html binary"
    )
    crawled = spark.createDataFrame(
        [
            (loc, datetime.datetime.fromisoformat(ts))
            for loc, ts in crawled_rows
        ],
        schema="url string, warc_ts timestamp",
    )
    got = {
        r.loc: (r.priority, r.reason)
        for r in sitemap_frontier(sitemaps, crawled).collect()
    }
    assert got == expected


def test_jsonld_triples_random_vs_python(spark):
    from search_spark.operators.jsonld import jsonld_triples

    rng = _mk_rng()
    keys = ["name", "color", "height", "brand"]
    pages, expected = [], set()
    for i in range(25):
        url = f"https://shop.example/item{i}"
        blocks_html = []
        b_idx = 0
        for _ in range(rng.randint(0, 3)):
            block = {}
            if rng.random() < 0.5:
                block["@id"] = f"urn:item:{i}:{b_idx}"
            if rng.random() < 0.8:
                block["@type"] = rng.choice(["Product", "Offer"])
            for k in rng.sample(keys, rng.randint(0, len(keys))):
                block[k] = f"{k}-{rng.randint(0, 9)}"
            nested = rng.random() < 0.25
            if nested:
                # nested values survive the map cast as canonical JSON text
                block["offers"] = {"price": "9.99"}
            attrs = rng.choice(
                [
                    'type="application/ld+json"',
                    "type='application/ld+json'",
                    'async type="application/ld+json" nonce="x"',
                ]
            )
            blocks_html.append(
                f"<script {attrs}>\n{json.dumps(block)}\n</script>"
            )
            subj = block.get("@id") or block.get("name") or f"{url}#b{b_idx}"
            prov = f"{url}#b{b_idx}"
            if "@type" in block:
                expected.add((subj, "rdf:type", block["@type"], prov))
            for k, v in block.items():
                if k.startswith("@"):
                    continue
                if isinstance(v, dict):
                    v = json.dumps(v, separators=(",", ":"))
                expected.add((subj, k, v, prov))
            b_idx += 1
        html = f"<html><head>{''.join(blocks_html)}</head><body>x</body></html>"
        pages.append((url, html.encode()))

    df = spark.createDataFrame(pages, schema="url string, html binary")
    got = {
        (r.subj, r.pred, r.obj, r.prov)
        for r in jsonld_triples(df).collect()
    }
    assert got == expected


def test_webtable_triples_random_vs_python(spark):
    from search_spark.operators.webtables import webtable_triples

    rng = _mk_rng()
    pages, expected = [], set()
    for i in range(20):
        url = f"https://data.example/t{i}"
        tables_html = []
        for t_idx in range(rng.randint(1, 2)):
            n_cols = rng.randint(2, 4)
            has_header = rng.random() < 0.7
            headers = [f"h{c}" if rng.random() < 0.9 else "" for c in range(n_cols)]
            rows = []
            for _ in range(rng.randint(1, 4)):
                rows.append(
                    [
                        f"c{rng.randint(0, 9)}" if rng.random() < 0.85 else ""
                        for _ in range(n_cols)
                    ]
                )
            parts = ["<table>"]
            if has_header:
                parts.append(
                    "<tr>" + "".join(f"<th>{h}</th>" for h in headers) + "</tr>"
                )
            for row in rows:
                parts.append(
                    "<tr>" + "".join(f"<td>{v}</td>" for v in row) + "</tr>"
                )
            parts.append("</table>")
            tables_html.append("".join(parts))
            if has_header:
                # r_idx in prov is the cell-table row index: the header row
                # is row 0, so body rows start at 1
                for r_idx, row in enumerate(rows, start=1):
                    subj = row[0]
                    if subj == "":
                        continue
                    for c in range(1, n_cols):
                        if headers[c] != "" and row[c] != "":
                            expected.add(
                                (
                                    subj,
                                    headers[c],
                                    row[c],
                                    f"{url}#t{t_idx}:r{r_idx}",
                                )
                            )
        html = f"<html><body>{''.join(tables_html)}</body></html>"
        pages.append((url, html.encode()))

    df = spark.createDataFrame(pages, schema="url string, html binary")
    got = {
        (r.subj, r.pred, r.obj, r.prov)
        for r in webtable_triples(df).collect()
    }
    assert got == expected


def test_politeness_schedule_random_vs_python(spark):
    from search_spark.operators.crawl import politeness_schedule

    rng = _mk_rng()
    rows = [
        (
            f"https://h{rng.randint(0, 3)}.example/p{i}",
            rng.choice([0.1, 0.5, 0.9]),
        )
        for i in range(80)
    ]
    delay, cap = 2.0, 5

    from collections import defaultdict

    by_host = defaultdict(list)
    for loc, prio in rows:
        host = loc.split("://")[1].split("/")[0]
        by_host[host].append((-prio, loc))
    expected = {}
    for host, items in by_host.items():
        for slot, (_, loc) in enumerate(sorted(items)):
            if slot < cap:
                expected[loc] = (host, slot, slot * delay)

    df = spark.createDataFrame(rows, schema="loc string, priority double")
    got = {
        r.loc: (r.host, r.slot, r.fetch_offset_s)
        for r in politeness_schedule(df, delay, cap).collect()
    }
    assert got == expected
