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
    # the equality predicate must land in PartitionFilters (the inferred
    # isnotnull(day) conjunct disappeared when the session factory turned
    # spark.sql.constraintPropagation off — it added nothing: the
    # equality alone selects exactly the one partition)
    assert "PartitionFilters: [" in plan
    assert "day" in plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]

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
    # IsNotNull(event_type) was an InferFiltersFromConstraints artifact
    # (constraint propagation is off session-wide); EqualTo subsumes it
    # for both row-group stats skipping and row filtering
    assert "PushedFilters: [EqualTo(event_type,click)" in plan
    # ReadSchema carries only the projected + filtered columns, never ts/payload
    read_schema = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "user_id" in read_schema and "value" in read_schema
    assert "ts" not in read_schema


def test_merge_touched_dir_probe_reads_only_key_columns(spark, tmp_path):
    """The CoW MERGE's touched-dir discovery scans the whole target — at
    100 TB that is only acceptable if column pruning shrinks the probe to
    the key columns (real Iceberg prunes further with per-file stats).
    Pin ReadSchema of the probe scan to the key column alone."""
    from blink_spark.checkpoint import StageWriter

    w = StageWriter(spark, str(tmp_path), "r1")
    w.publish(
        "t",
        spark.createDataFrame(
            [(i, "v" * 50, float(i)) for i in range(100)], ["id", "payload", "x"]
        ),
    )
    cur = w.current_snapshot("t")
    keys = spark.createDataFrame([(3,), (7,)], ["id"])
    probe_plans: list[str] = []

    orig = w._touched_dirs

    def capture(stage, rec, probe, dirs=None):
        target = spark.read.parquet(*w._data_dirs(stage, rec))
        dir_col = F.element_at(F.split(F.input_file_name(), "/"), -2)
        hits = probe(target.withColumn("__dir", dir_col))
        probe_plans.append(
            hits.select("__dir").distinct()._jdf.queryExecution()
            .executedPlan().toString()
        )
        return orig(stage, rec, probe, dirs=dirs)

    w._touched_dirs = capture
    rec = w.merge(
        "t",
        spark.createDataFrame([(3, "new", 0.0), (999, "ins", 1.0)],
                              ["id", "payload", "x"]),
        ["id"],
    )
    assert rec["merge_updated"] == 1 and rec["merge_inserted"] == 1

    (plan,) = probe_plans
    # the probe's scan of the TARGET must read only the key column —
    # never payload/x (the dir name comes from input_file_name metadata)
    target_schemas = [
        seg.splitlines()[0]
        for seg in plan.split("ReadSchema:")[1:]
        if "struct<" in seg.splitlines()[0]
    ]
    assert any("struct<id:" in s and "payload" not in s and "x:" not in s
               for s in target_schemas), target_schemas
    assert all("payload" not in s for s in target_schemas), target_schemas
