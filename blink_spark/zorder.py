"""Z-order (Morton) interleaved sort keys — the Iceberg
``rewrite_data_files(strategy => 'sort', sort_order => 'zorder(a, b)')``
analog for the snapshot layer.

Why: per-dir min/max bounds (checkpoint manifest ``dir_bounds``) prune a
probe only along the column the data happens to be sorted by.  Sorting
by the Morton interleave of TWO columns makes every data dir cover a
compact rectangle of the (a, b) key space, so a 2-D box predicate
(user range AND time range — the shape of every backfill/repair probe
over an event table) prunes on BOTH columns at once.  At 100 TB this is
the difference between touching O(box) dirs and scanning a whole
timeline stripe.

The interleave is the classic 64-bit bit-spreading ladder (public
domain "Interleave bits by Binary Magic Numbers" bit hack): each input
is masked to 31 bits, spread onto even bit positions (5 shift+mask
steps), and OR-combined with the second operand shifted up one.  All
intermediates stay below 2^62, so the math is exact signed-64 in both
engines (bitwise ops are not ANSI-overflow-checked in Spark, and none
can overflow here anyway).

The same constants drive the Spark Column expression and the DuckDB SQL
mirror, and ``evt_zorder_key`` puts the kernel under the driver's hash
gate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (shift, mask) ladder spreading a 31-bit value onto even bit positions
_SPREAD = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]
_IN_MASK = 0x7FFFFFFF  # 31 bits per dimension


def _spread_col(c: Column) -> Column:
    x = c.cast("long").bitwiseAND(F.lit(_IN_MASK))
    for shift, mask in _SPREAD:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def morton_col(a: Column, b: Column) -> Column:
    """Morton/Z-order key of two non-negative integer columns (each
    truncated to its low 31 bits; a's bits land on even positions)."""
    return _spread_col(a).bitwiseOR(F.shiftleft(_spread_col(b), 1))


def _sql_spread(expr: str) -> str:
    x = f"(({expr})::BIGINT & {_IN_MASK})"
    for shift, mask in _SPREAD:
        x = f"(({x} | ({x} << {shift})) & {mask})"
    return x


def sql_morton(a_expr: str, b_expr: str) -> str:
    """The DuckDB mirror of :func:`morton_col` — identical ladder,
    identical constants."""
    return f"({_sql_spread(a_expr)} | ({_sql_spread(b_expr)} << 1))"
