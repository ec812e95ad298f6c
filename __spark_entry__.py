"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The engine's input table (``source_files(repo, path, commit, lang,
content)`` per BASELINE.json ``input_hint``) is synthesized
deterministically at each scale (blink_spark.fixtures, seed=42) and
committed under fixtures/ — both the Spark queries and the DuckDB
oracles read the same parquet, and the oracle recomputes the full
chain (sha ids → shingles → minhash/LSH → candidate self-join →
embedding cosine + JW/Lev + logistic match_p → recursive-CTE
connected components) independently of Spark.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full record-linkage pipeline at sf0.001 → cluster table."""
    from blink_spark import er_queries

    return er_queries.q_clusters(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from blink_spark import (
        er_queries, events, multimodal, relational, similarity, textops,
    )

    return {
        **er_queries.QUERIES,
        **relational.QUERIES,
        **textops.QUERIES,
        **similarity.QUERIES,
        **events.QUERIES,
        # all four media queries carry full DuckDB oracles: the committed
        # fixture payloads are re-decoded independently via BLOB hex slicing
        **multimodal.QUERIES,
    }


def oracle_sql() -> dict[str, str]:
    from blink_spark import (
        er_queries, events, multimodal, relational, similarity, textops,
    )

    return {
        **er_queries.oracle_sqls(),
        **relational.oracle_sqls(),
        **textops.oracle_sqls(),
        **similarity.oracle_sqls(),
        **events.oracle_sqls(),
        **multimodal.oracle_sqls(),
    }
