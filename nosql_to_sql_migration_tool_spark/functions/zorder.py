"""Z-order (Morton) clustering keys — multi-dimensional data skipping.

Why: parquet/table-format data skipping prunes on per-file (row-group)
min/max ranges, which only helps for columns the data is SORTED by. A
lexicographic sort gives perfect skipping on the first column and none
on the second; interleaving the bits of both keys (Morton order) gives
each file a tight bounding BOX in (a, b) space, so range predicates on
EITHER column — or both — prune files. This is exactly what Delta/
Iceberg `OPTIMIZE ZORDER BY` does; here it is a plain deterministic
Column expression, so `df.repartitionByRange(F.col(zkey)).sortWithinPartitions(zkey)
.write...` lays out vanilla parquet the same way.

Implementation notes:
- Inputs are rank-normalized by the CALLER to small non-negative ints
  (bucket ids, days, percent ranks × 2^bits) — Morton interleaving is
  only meaningful on bounded uniform-ish codes, and normalization
  choices (quantile vs linear) are a per-table decision.
- The interleave is a fold of shift/mask terms — pure JVM-side
  expressions, and the identical ``<< >> & |`` chain runs in DuckDB,
  so the key is oracle-checkable like any other column.
- ``bits`` per dimension is bounded so the result fits a BIGINT
  (2 dims × 31 bits max; 16 is plenty for file-level skipping).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

MAX_BITS = 31


def morton_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of two non-negative integer codes:
    result bit 2i holds a's bit i, bit 2i+1 holds b's bit i. Values are
    masked to ``bits`` first, so out-of-range codes wrap instead of
    colliding across dimensions."""
    if not 1 <= bits <= MAX_BITS:
        raise ValueError(f"bits must be in [1, {MAX_BITS}]")
    mask = (1 << bits) - 1
    am = a.cast("long").bitwiseAND(F.lit(mask))
    bm = b.cast("long").bitwiseAND(F.lit(mask))
    out = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(am, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(bm, i).bitwiseAND(F.lit(1))
        out = out.bitwiseOR(F.shiftleft(abit, 2 * i)).bitwiseOR(
            F.shiftleft(bbit, 2 * i + 1)
        )
    return out


def morton_key_sql(a_expr: str, b_expr: str, bits: int = 16) -> str:
    """DuckDB twin — the identical shift/mask fold."""
    if not 1 <= bits <= MAX_BITS:
        raise ValueError(f"bits must be in [1, {MAX_BITS}]")
    mask = (1 << bits) - 1
    am = f"(CAST({a_expr} AS BIGINT) & {mask})"
    bm = f"(CAST({b_expr} AS BIGINT) & {mask})"
    terms = []
    for i in range(bits):
        terms.append(f"((({am} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({bm} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"
