"""Scan-discipline evidence: partition pruning and predicate pushdown must
reach the parquet scan — at 100 TB a filter that runs post-scan reads the
whole table.

The reference never partitions storage (flat pickle/npy files); these pins
are the Spark-native replacement for its "load only the split you need"
idiom (``blink/main_dense.py:464-476`` loads one split file per mode).
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def _scan_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partition_pruning_on_date_partitioned_events(spark, tmp_path):
    """Writing events hive-partitioned by day and filtering on the
    partition column must prune at planning time: the scan's
    PartitionFilters is populated and untouched partitions are never
    listed as inputs."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").withColumn(
        "day", F.to_date("ts")
    )
    out = str(tmp_path / "events_by_day")
    ev.write.partitionBy("day").parquet(out)

    days = sorted(d for d in os.listdir(out) if d.startswith("day="))
    assert len(days) > 1
    one_day = days[0].split("=", 1)[1]

    pruned = spark.read.parquet(out).filter(F.col("day") == one_day)
    plan = _scan_plan(pruned)
    assert "PartitionFilters: [" in plan
    assert "isnotnull(day" in plan

    # row counts agree with the unpruned filter — pruning is not sampling
    assert pruned.count() == ev.filter(F.col("day") == one_day).count()


def test_predicate_and_projection_reach_parquet_scan(spark):
    """A filter on a scan column must appear in PushedFilters, and a
    two-column projection must shrink ReadSchema to those columns."""
    df = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .filter(F.col("event_type") == "click")
        .select("user_id", "value")
    )
    plan = _scan_plan(df)
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)" in plan
    # ReadSchema carries only the projected + filtered columns, never ts/payload
    read_schema = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "user_id" in read_schema and "value" in read_schema
    assert "ts" not in read_schema
