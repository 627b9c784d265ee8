"""Rule-pattern store: the reference's ``PatternCreator`` re-expressed.

Reference analogue: ``bluesearch.mining.entity.PatternCreator``
(mining/entity.py:30-380) — a table of rule patterns (one row per pattern:
label + per-token attribute/value/op columns), round-tripped to spaCy
``EntityRuler`` JSONL (entity.py:221-255), consumed by the NER pipeline.

Here the store keeps one row per pattern — ``label`` plus either an exact
``phrase`` (optionally case-insensitive) or a token ``regex`` — serializes
to/from JSONL, and compiles to a matcher whose span-conflict resolution is
spaCy's ``filter_spans`` (longest span wins, earlier span breaks ties),
the same policy ``EntityRuler`` applies to overlapping rule matches.

The compiled matcher is broadcast into the NER ``mapInPandas`` stage via
the UDF closure (SURVEY.md §2.12: "broadcast patterns into the NER UDF").
"""

from __future__ import annotations

import json
import re
from dataclasses import asdict, dataclass


@dataclass(frozen=True)
class PatternRow:
    label: str
    kind: str  # "phrase" | "regex"
    value: str
    case_sensitive: bool = True


def filter_spans(
    spans: list[tuple[int, int, str, str]]
) -> list[tuple[int, int, str, str]]:
    """spaCy ``util.filter_spans`` policy: prefer longer spans, then
    earlier ones; drop every span overlapping an already-kept span."""
    kept: list[tuple[int, int, str, str]] = []
    for span in sorted(spans, key=lambda s: (-(s[1] - s[0]), s[0])):
        if all(span[1] <= k[0] or span[0] >= k[1] for k in kept):
            kept.append(span)
    return sorted(kept, key=lambda s: s[0])


class CompiledPatterns:
    """All pattern rows compiled to regexes + filter_spans resolution."""

    def __init__(self, rows: list[PatternRow]):
        self._compiled: list[tuple[re.Pattern, str]] = []
        for row in rows:
            if row.kind == "phrase":
                pat = r"\b" + re.escape(row.value) + r"\b"
            elif row.kind == "regex":
                pat = row.value
            else:  # pragma: no cover - guarded by add_*
                raise ValueError(f"unknown pattern kind {row.kind!r}")
            flags = 0 if row.case_sensitive else re.IGNORECASE
            self._compiled.append((re.compile(pat, flags), row.label))

    def find(self, text: str) -> list[tuple[int, int, str, str]]:
        """Return non-overlapping ``(start, end, mention, label)`` spans."""
        candidates = [
            (m.start(), m.end(), m.group(0), label)
            for rx, label in self._compiled
            for m in rx.finditer(text)
        ]
        return filter_spans(candidates)


class PatternStore:
    """Mutable pattern table with JSONL round-trip (entity.py:221-255)."""

    def __init__(self, rows: list[PatternRow] | None = None):
        self.rows: list[PatternRow] = list(rows or [])

    def add_phrase(
        self, label: str, phrase: str, case_sensitive: bool = True
    ) -> "PatternStore":
        self.rows.append(PatternRow(label, "phrase", phrase, case_sensitive))
        return self

    def add_regex(self, label: str, regex: str) -> "PatternStore":
        re.compile(regex)  # validate eagerly, like EntityRuler add-time checks
        self.rows.append(PatternRow(label, "regex", regex))
        return self

    # -- JSONL round-trip -------------------------------------------------
    def to_jsonl(self, path: str) -> None:
        with open(path, "w") as f:
            for row in self.rows:
                f.write(json.dumps(asdict(row)) + "\n")

    @classmethod
    def from_jsonl(cls, path: str) -> "PatternStore":
        rows = []
        with open(path) as f:
            for line in f:
                if line.strip():
                    rows.append(PatternRow(**json.loads(line)))
        return cls(rows)

    # -- consumption ------------------------------------------------------
    def compile(self) -> CompiledPatterns:
        return CompiledPatterns(self.rows)

    @classmethod
    def from_gazetteer(
        cls, patterns: list[tuple[str, str]]
    ) -> "PatternStore":
        """Lift a plain ``(term, label)`` gazetteer into a store."""
        store = cls()
        for term, label in patterns:
            store.add_phrase(label, term)
        return store
