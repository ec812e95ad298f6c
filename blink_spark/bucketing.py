"""Bucketed feature tables — the cluster-scale replacement for the
broadcast feature join (SURVEY.md §4; `scoring.score_pairs` docstring).

At 10^12 rows the per-file feature table (hash arrays + embeddings) far
exceeds broadcast limits. Writing it bucketed by ``file_id`` means the
scoring joins read pre-hashed buckets: the WIDE side never shuffles again
— only the thin pair table (two ids) moves, once per join key. On Iceberg
this is the ``bucket(N, file_id)`` partition transform; here it is Spark's
native bucketed parquet (``bucketBy().sortBy().saveAsTable``), which the
scan reports as ``SelectedBucketsCount`` and the planner exploits by
omitting the Exchange on the bucketed side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 64


def write_bucketed_features(
    features: DataFrame, table: str, n_buckets: int = DEFAULT_BUCKETS
) -> None:
    """Materialize the per-file feature table bucketed+sorted by file_id."""
    import shutil

    spark = features.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # the in-memory catalog forgets tables across sessions but their
    # managed location survives; a stale dir makes saveAsTable refuse
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(os.path.join(warehouse, table.lower()), ignore_errors=True)
    (
        features.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, "file_id")
        .sortBy("file_id")
        .saveAsTable(table)
    )


def read_features(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def feature_side_shuffles(scored: DataFrame) -> int:
    """Count Exchange operators whose child is a relation scan of the
    feature table — 0 when bucketing is being exploited. Diagnostic for
    tests/plan reviews."""
    plan = scored._jdf.queryExecution().executedPlan().toString()
    count = 0
    for block in plan.split("Exchange hashpartitioning")[1:]:
        head = block[:400]
        if "FileScan" in head and "Bucketed: true" in head:
            count += 1
    return count
