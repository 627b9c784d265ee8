"""Topic accept/reject rules over per-article topic-list columns.

Reference analogue: ``TopicRule`` / ``check_topic_rules``
(`/root/reference/src/bluesearch/database/topic_rule.py:27-127`):

* a rule is ``(level, source, pattern)``, each optionally ``None``
  (= match anything on that axis); ``level`` ∈ {article, journal};
* a rule matches when the source matches (or is unconstrained) and the
  regex **searches** (unanchored) some topic in the article-level and/or
  journal-level topic lists, per ``level``;
* an article is accepted iff **no** reject rule matches and **at least
  one** accept rule matches.

Spark-first: topic lists are ``array<string>`` columns and each rule is an
``F.exists(topics, x -> x.rlike(pattern))`` predicate — pure codegen, no
UDF, fully pushable by Catalyst.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class TopicRule:
    level: str | None = None  # "article" | "journal" | None (= both)
    source: str | None = None  # None = any source
    pattern: str | None = None  # None = any topic

    def __post_init__(self):
        if self.level is not None and self.level not in {"article", "journal"}:
            raise ValueError(f"Unsupported level {self.level}.")

    def match_col(
        self,
        source_col: Column,
        article_topics: Column,
        journal_topics: Column,
    ) -> Column:
        """Boolean column: does this rule match the row (topic_rule.py:55-79)."""
        ok = F.lit(True)
        if self.source is not None:
            ok = source_col == F.lit(self.source)
        if self.pattern is None:
            return ok
        hits = []
        if self.level in (None, "article"):
            hits.append(
                F.exists(article_topics, lambda t: t.rlike(self.pattern))
            )
        if self.level in (None, "journal"):
            hits.append(
                F.exists(journal_topics, lambda t: t.rlike(self.pattern))
            )
        return ok & reduce(lambda a, b: a | b, hits)


def check_topic_rules_col(
    accept: list[TopicRule],
    reject: list[TopicRule],
    source_col: Column,
    article_topics: Column,
    journal_topics: Column,
) -> Column:
    """Accept iff no reject rule matches and ≥1 accept rule matches
    (``check_topic_rules``, topic_rule.py:92-127)."""
    any_of = lambda rules: reduce(  # noqa: E731
        lambda a, b: a | b,
        [r.match_col(source_col, article_topics, journal_topics) for r in rules],
        F.lit(False),
    )
    return ~any_of(reject) & any_of(accept)
