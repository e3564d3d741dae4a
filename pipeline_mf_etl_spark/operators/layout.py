"""Data-layout operators: Z-order (Morton) clustering keys.

At 100 TB, scan cost is dominated by how much data a filter can SKIP.
Parquet row-group statistics prune on the sort order of the written
files: sorting by one column makes its min/max ranges tight but leaves
every other column's ranges full-width. Interleaving the bits of two
(or more) filter columns into one Morton key and sorting by THAT gives
every participating column locality at once — the multi-dimensional
clustering Delta/Iceberg expose as OPTIMIZE ZORDER BY, expressed here
as plain deterministic integer arithmetic so any engine (and the DuckDB
oracle) reproduces the same key.

The reference has no layout concept at all (one file per ticker is its
only clustering — SURVEY.md §1.1); this is an engine addition.

Implementation note: the classic magic-number bit spread
(x | x<<S) & MASK per power-of-two stage stays in JVM whole-stage
codegen (shiftleft / bitwise and-or only, no UDF), and is restated
verbatim in SQL for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (shift, mask) stages spreading a 16-bit value to even bit positions
#: of a 32-bit lane. Classic Morton magic numbers.
_SPREAD_STAGES = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)

MORTON_BITS = 16
_CAP = (1 << MORTON_BITS) - 1


def _spread16(c: Column) -> Column:
    """Spread the low 16 bits of ``c`` so bit i lands at position 2i."""
    out = c.bitwiseAND(F.lit(_CAP))
    for shift, mask in _SPREAD_STAGES:
        out = (out.bitwiseOR(F.shiftleft(out, shift))).bitwiseAND(F.lit(mask))
    return out


def morton_key(a: Column, b: Column) -> Column:
    """Interleave two non-negative 16-bit-clamped ints into one 32-bit
    Morton key (a's bits at even positions, b's at odd). Values above
    2^16-1 clamp to the top bucket — at layout time the inputs are
    bucketed ranks, which the caller bounds."""
    aa = _spread16(F.least(a.cast("long"), F.lit(_CAP)))
    bb = _spread16(F.least(b.cast("long"), F.lit(_CAP)))
    return aa.bitwiseOR(F.shiftleft(bb, 1)).cast("long")


def morton_key_sql(a: str, b: str) -> str:
    """The identical arithmetic as ANSI SQL (DuckDB oracle fragment)."""

    def spread(expr: str) -> str:
        out = f"({expr} & {_CAP})"
        for shift, mask in _SPREAD_STAGES:
            out = f"(({out} | ({out} << {shift})) & {mask})"
        return out

    sa = spread(f"least(CAST({a} AS BIGINT), {_CAP})")
    sb = spread(f"least(CAST({b} AS BIGINT), {_CAP})")
    return f"CAST(({sa} | ({sb} << 1)) AS BIGINT)"
