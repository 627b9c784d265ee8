"""Data-layout keys: Z-order (Morton) interleaving for multi-column
clustering.

A 100-TB table is read through its file layout: min/max statistics per
file let the scan skip everything outside the predicate range, but only
for columns the data is *sorted* by — and a linear sort privileges one
column. Interleaving the bits of several columns (the Z-order curve —
what Delta's ``OPTIMIZE ZORDER BY`` and Iceberg's ``sort_order`` with a
Z transform compute) gives every interleaved column partial locality,
so multi-dimensional point/range predicates skip files on any of them.

:func:`zorder_key` builds the Morton code as a pure JVM expression tree
(``shiftright`` / ``bitwiseAND`` / ``shiftleft`` / ``+``) — codegen-able,
no UDF, bit-identical in any engine with integer shifts (the DuckDB
oracle generates the same formula via :func:`zorder_key_sql`). Inputs
are clamped to ``bits`` low-order bits; pre-hash or quantile-bucket
wider domains first (locality only means anything on bounded domains).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ZORDER_BITS = 16


def zorder_key(cols: list[Column], bits: int = ZORDER_BITS) -> Column:
    """Morton code interleaving ``bits`` low bits of each column.

    Column *j*'s bit *i* lands at output position ``i·k + (k-1-j)`` for
    ``k`` columns — column 0 owns the most-significant bit of each
    round, matching the conventional (x, y) → yxyxyx… layout. Output
    fits a BIGINT for ``k·bits ≤ 63``.
    """
    k = len(cols)
    if k * bits > 63:
        raise ValueError(f"{k} cols × {bits} bits exceeds a signed int64")
    out = F.lit(0).cast("bigint")
    for j, c in enumerate(cols):
        cc = c.cast("bigint")
        for i in range(bits):
            bit = F.shiftright(cc, i).bitwiseAND(F.lit(1))
            out = out + F.shiftleft(bit, i * k + (k - 1 - j))
    return out


def zorder_key_sql(cols: list[str], bits: int = ZORDER_BITS) -> str:
    """The same Morton code as a SQL expression string (DuckDB/ANSI:
    explicit bit ops, identical bit placement)."""
    k = len(cols)
    terms = []
    for j, c in enumerate(cols):
        for i in range(bits):
            shift = i * k + (k - 1 - j)
            terms.append(
                f"(((CAST({c} AS BIGINT) >> {i}) & 1) << {shift})"
            )
    return " + ".join(terms)
