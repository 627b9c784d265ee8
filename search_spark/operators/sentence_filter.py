"""SentenceFilter: the reference's chainable predicate builder as a
DataFrame-native query plan.

Reference analogue: ``SentenceFilter`` (`/root/reference/src/bluesearch/
sql.py:387-718`) — the search server restricts candidate sentences with a
chain of optional predicates before any similarity scoring:

* ``only_good`` → ``is_bad = 0``  (sql.py predicate chain)
* ``is_english`` → article-level boolean
* ``discard_bad_sentences`` / journal present → ``journal IS NOT NULL``
* ``date_range(y1, y2)`` → ``publish_time BETWEEN y1-01-01 AND y2-12-31``
* ``restrict_sentence_ids`` → ``sentence_id IN (...)``
* substring include/exclude (MySQL ``MATCH..AGAINST``/``LIKE``) →
  ``text CONTAINS s`` / ``NOT CONTAINS s`` (case-folded, sql.py:542-563)

The reference pushes article-level predicates into an
``article_id IN (SELECT ...)`` subquery (sql.py:618-628). Here that is a
**left-semi join against the articles table** — Catalyst pushes the
article filters into the articles scan and broadcasts the (small)
surviving key set; sentence-level predicates push into the sentences scan
directly. Everything stays declarative: one ``apply()`` produces a single
DataFrame plan, no SQL assembly.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class SentenceFilter:
    """Chainable sentence restriction over (sentences, articles).

    Sentences must carry the composite key column(s) in ``article_key``
    (default ``url``) plus ``text``; articles carry article-level columns
    (``journal``, ``publish_time``, ``is_english``, …). Each ``with_*``
    call returns self (builder style, like the reference's fluent API).
    """

    article_key: str = "url"
    only_good: bool = False
    english_only: bool = False
    journal_required: bool = False
    year_from: int | None = None
    year_to: int | None = None
    include_strings: list[str] = field(default_factory=list)
    exclude_strings: list[str] = field(default_factory=list)
    restrict_ids: DataFrame | None = None

    # -- builder -----------------------------------------------------------
    def discard_bad(self) -> "SentenceFilter":
        self.only_good = True
        return self

    def require_english(self) -> "SentenceFilter":
        self.english_only = True
        return self

    def require_journal(self) -> "SentenceFilter":
        self.journal_required = True
        return self

    def date_range(self, year_from: int, year_to: int) -> "SentenceFilter":
        self.year_from, self.year_to = year_from, year_to
        return self

    def include_text(self, *substrings: str) -> "SentenceFilter":
        self.include_strings.extend(substrings)
        return self

    def exclude_text(self, *substrings: str) -> "SentenceFilter":
        self.exclude_strings.extend(substrings)
        return self

    def restrict_to(self, ids: DataFrame) -> "SentenceFilter":
        """Restrict to a sentence-id set (single- or composite-key
        DataFrame) — the ``sentence_id IN (...)`` predicate."""
        self.restrict_ids = ids
        return self

    # -- plan --------------------------------------------------------------
    def _article_predicate(self) -> Column | None:
        preds = []
        if self.english_only:
            preds.append(F.col("is_english"))
        if self.journal_required:
            preds.append(F.col("journal").isNotNull())
        if self.year_from is not None:
            preds.append(
                F.col("publish_time") >= F.lit(f"{self.year_from}-01-01")
            )
        if self.year_to is not None:
            preds.append(
                F.col("publish_time") <= F.lit(f"{self.year_to}-12-31")
            )
        out = None
        for p in preds:
            out = p if out is None else out & p
        return out

    def apply(
        self, sentences: DataFrame, articles: DataFrame | None = None
    ) -> DataFrame:
        """Build the restricted-sentences plan.

        Sentence-level predicates are plain filters (pushed into the
        scan); article-level predicates become a left-semi join on
        ``article_key`` against the filtered articles table (the
        sql.py:618-628 subquery pushup).
        """
        out = sentences
        if self.only_good:
            # fail loud like the reference (sql.py builds `is_bad = 0`
            # unconditionally): silently dropping a requested restriction
            # would return a superset of the reference's result
            if "is_bad" not in sentences.columns:
                raise ValueError(
                    "discard_bad() requires an 'is_bad' column on sentences"
                )
            out = out.filter(~F.col("is_bad"))
        for s in self.include_strings:
            # case-folded contains (sql.py:542-543)
            out = out.filter(F.lower(F.col("text")).contains(s.lower()))
        for s in self.exclude_strings:
            out = out.filter(~F.lower(F.col("text")).contains(s.lower()))

        art_pred = self._article_predicate()
        if art_pred is not None:
            if articles is None:
                raise ValueError(
                    "article-level predicates need an articles DataFrame"
                )
            keys = articles.filter(art_pred).select(self.article_key)
            out = out.join(keys, on=self.article_key, how="left_semi")

        if self.restrict_ids is not None:
            out = out.join(
                self.restrict_ids, on=self.restrict_ids.columns, how="left_semi"
            )
        return out
