"""SparkSession factory with scale-appropriate defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (sandbox), but every
conf here is chosen for a multi-executor cluster at 10^12-row scale:

- AQE on (runtime coalescing + skew-join splitting) — the reference had no
  skew story at all (single node); we make it explicit.
- Arrow enabled for the pandas-UDF scoring stage (the reference's torch
  ``DataLoader`` batching analog, ``blink/main_dense.py:254-268``).
- UTC session timezone so results compare bit-for-bit with the DuckDB
  oracle harness.
"""

from __future__ import annotations

import os
import zipfile

from pyspark.sql import SparkSession


def _package_zip() -> str:
    """Zip the blink_spark package for shipment to executors.

    This is the local-mode equivalent of ``spark-submit --py-files``: the
    pandas UDFs in blink_spark.scoring are module-level functions, which
    cloudpickle serializes BY REFERENCE — every worker must be able to
    ``import blink_spark`` regardless of the driver's cwd.
    """
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    out = os.path.join(pkg_dir, os.pardir, ".blink_spark_pkg.zip")
    out = os.path.abspath(out)
    src_mtime = max(
        os.path.getmtime(os.path.join(pkg_dir, f))
        for f in os.listdir(pkg_dir)
        if f.endswith(".py")
    )
    if not os.path.exists(out) or os.path.getmtime(out) < src_mtime:
        with zipfile.ZipFile(out, "w") as z:
            for root, _dirs, files in os.walk(pkg_dir):
                if "__pycache__" in root:
                    continue
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                        z.write(full, rel)
    return out


def get_spark(
    app_name: str = "blink_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # ~1 partition per core locally; on a real cluster this is set to
        # 2-3x total executor cores (AQE coalesces the excess anyway).
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # pair-scoring UDFs return float64 features; keep Arrow safe-cast on
        .config("spark.sql.execution.arrow.pyspark.fallback.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # AQE re-renders the explain string on EVERY runtime plan update
        # (AdaptiveSparkPlanExec.onUpdatePlan) even with the UI off; on a
        # lineage-heavy DAG (a multi-batch incremental chain) the default
        # unbounded render itself OOMs the driver building a plan STRING
        # (observed: OutOfMemoryError in QueryExecution.explainString
        # during localCheckpoint). 1 MiB keeps every diagnostic readable
        # and bounds the render cost.
        .config("spark.sql.maxPlanStringLength", str(1024 * 1024))
        # InferFiltersFromConstraints re-derives isnotnull() guards from a
        # Filter's expression tree and pushes them into the joins BELOW it.
        # For match_edges (threshold over scored pairs) that plants
        # isnotnull(<full cosine zip_with + panel expression>) as residual
        # join conditions evaluated per PRE-threshold row — measured 92.2s
        # vs 21.3s for the identical threshold count over 19.3M pairs at
        # sf0.25 (4.3x; the whole r3/r4 "in-pipeline scoring compression").
        # Nothing in this workload needs inferred constraints: inputs are
        # cached/parquet scans with explicit filters, joins are explicitly
        # broadcast, and the rule never changes results — only plans.
        .config("spark.sql.constraintPropagation.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # bucketed-table warehouse (scale path for the feature join); kept
        # out of the repo tree
        .config("spark.sql.warehouse.dir", "/tmp/blink_spark_warehouse")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    try:
        spark.sparkContext.addPyFile(_package_zip())
    except Exception:
        pass  # already added in a reused session
    return spark
