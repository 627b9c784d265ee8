"""Attribute/measurement typing: the most-common-quantity vote.

Reference analogue: ``AttributeExtractor.get_measurement_type``
(`/root/reference/src/bluesearch/mining/attribute.py:92-126`) — a Grobid
measurement holds several quantities, each with a (possibly empty) type;
the measurement's type is the most common quantity type with the tie-break
**empty loses** (sort key ``(-count, type == "")``, attribute.py:119-126).
Counter.most_common is insertion-ordered for equal counts and the sort is
stable, so remaining ties resolve by *first-seen position* — reproduced
here with an explicit ``min(first_pos)`` so the distributed result is
deterministic and identical to the reference on any quantity order.

The Grobid/CoreNLP servers themselves are out of scope (SURVEY.md §7.4);
this portable aggregation is the piece SURVEY §2.3/§2.6 lists.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def measurement_type_vote(
    quantities: DataFrame,
    keys: list[str],
    type_col: str = "quantity_type",
    pos_col: str = "pos",
) -> DataFrame:
    """Per-``keys`` winning quantity type.

    Parameters
    ----------
    quantities
        One row per quantity: ``keys + [type_col, pos_col]``; ``pos_col``
        is the quantity's position within the measurement (drives the
        reference's first-seen tie-break).

    Returns
    -------
    ``keys + [measurement_type]`` — one row per measurement.
    """
    counted = quantities.groupBy(*keys, type_col).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min(pos_col).alias("first_pos"),
    )
    # struct min ≡ ORDER BY cnt DESC, (type = '') ASC, first_pos ASC LIMIT 1
    # per group — one hash agg, no window shuffle
    ranked = counted.groupBy(*keys).agg(
        F.min(
            F.struct(
                (-F.col("cnt")).alias("neg_cnt"),
                (F.col(type_col) == "").cast("int").alias("is_empty"),
                F.col("first_pos").alias("first_pos"),
                F.col(type_col).alias("t"),
            )
        ).alias("best")
    )
    return ranked.select(*keys, F.col("best.t").alias("measurement_type"))


def count_measurement_types(
    measurement_types: DataFrame, type_col: str = "measurement_type"
) -> DataFrame:
    """Counts of all measurement types (``count_measurement_types``,
    attribute.py:128-143) as a hash aggregation."""
    return measurement_types.groupBy(type_col).agg(
        F.count(F.lit(1)).alias("n")
    )
