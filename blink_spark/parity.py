"""Oracle-parity helpers shared by every query family (er_queries,
textops, similarity)."""

from __future__ import annotations

from pyspark.sql import functions as F


def r6(col, scale: int = 6) -> F.Column:
    """``round(col, scale)`` with the sign of zero canonicalized
    (-0.0 → 0.0).

    The DuckDB oracle and Spark sum doubles in different orders; a tiny
    negative (e.g. cosine = -1e-9) rounds to IEEE ``-0.0`` in one engine
    and ``+0.0`` in the other — numerically equal, but serialized
    differently by the driver's value-hash. Adding ``+ 0.0`` collapses
    the sign of zero without changing any other value. The oracle SQL
    applies the same ``round(x, n) + 0.0`` on its side.
    """
    return F.round(col, scale) + F.lit(0.0)
