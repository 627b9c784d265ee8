"""Multi-format parser registry tests (the ArticleParser slot)."""

from __future__ import annotations

import json

from search_spark.extraction.parsers import (
    PARSERS,
    extract_stage_multi,
    parse_cord19_json,
    register_parser,
)

CORD19_DOC = {
    "paper_id": "abc123",
    "metadata": {"title": "A study"},
    "abstract": [{"text": "We study things."}, {"text": ""}],
    "body_text": [
        {"section": "Introduction", "text": "Glucose rises in Diabetes."},
        {"section": "Methods", "text": "Mouse models were used."},
    ],
    "ref_entries": {
        "FIGREF0": {"text": "Figure 1: a plot.", "type": "figure"},
    },
}


def test_parse_cord19_json_sections_and_order():
    paras = parse_cord19_json(json.dumps(CORD19_DOC))
    assert paras == [
        ("Abstract", "We study things."),
        ("Abstract", ""),  # reference-verbatim: empty rows pass through
        ("Introduction", "Glucose rises in Diabetes."),
        ("Methods", "Mouse models were used."),
        ("Caption", "Figure 1: a plot."),
    ]


def test_extract_stage_multi_dispatches_mixed_formats(spark):
    rows = [
        ("https://a.org/1", "cord19_json",
         json.dumps(CORD19_DOC).encode()),
        ("https://a.org/2", "html",
         b"<html><body><h2>S</h2><p>Insulin helps.</p></body></html>"),
        ("https://a.org/3", "unknown_fmt", b"whatever"),
    ]
    pages = spark.createDataFrame(rows, ["url", "source_format", "html"])
    out = extract_stage_multi(pages, english_only=False).collect()
    by_url = {}
    for r in out:
        by_url.setdefault(r["url"], []).append(
            (r["ppos"], r["section"], r["text"])
        )
    assert len(by_url["https://a.org/1"]) == 5  # incl. verbatim empty row
    assert by_url["https://a.org/1"][0] == (0, "Abstract", "We study things.")
    assert by_url["https://a.org/2"] == [(0, "S", "Insulin helps.")]
    assert "https://a.org/3" not in by_url  # unknown formats skipped
    # uid contract preserved
    assert all(len(r["uid"]) == 32 for r in out)


def test_register_parser_extension_point(spark):
    def parse_lines(raw):
        text = raw.decode() if isinstance(raw, bytes) else raw
        return [("Line", ln) for ln in text.splitlines() if ln.strip()]

    register_parser("plain_lines", parse_lines)
    try:
        pages = spark.createDataFrame(
            [("https://a.org/x", "plain_lines", b"alpha\nbeta\n")],
            ["url", "source_format", "html"],
        )
        out = extract_stage_multi(pages, english_only=False).collect()
        assert [(r["ppos"], r["text"]) for r in out] == [(0, "alpha"), (1, "beta")]
    finally:
        PARSERS.pop("plain_lines", None)
