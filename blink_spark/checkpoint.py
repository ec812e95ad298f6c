"""Iceberg-style stage checkpoints with lineage manifests + resume.

The reference's crash-safety idiom is file-level: each script writes its
output files and a summary CSV, and reruns skip tasks already present
(``scripts/feature_ablation_study.py:906-915``; partial-write appends at
``scripts/kbp_simulation.py:763-769``). Here that idiom becomes per-stage
parquet tables plus a JSON manifest row per stage:

    <dir>/<run_id>/<stage>/           parquet data (atomic: _SUCCESS marker)
    <dir>/<run_id>/manifest.jsonl     one line per completed stage:
        {run_id, stage, rows, n_partitions (total in the written table),
         n_nonempty_partitions, partition_rows{min,max,mean},
         skew_max_over_mean, wall_s, finished_utc_ns}

Resume = "is the stage's manifest line present and the _SUCCESS marker on
disk"; if so the stage is read back instead of recomputed — so a killed run
re-executes only downstream stages (tested in tests/test_resume.py). On a
real deployment these tables are Iceberg and the manifest is the table
snapshot log; parquet + JSONL keeps the sandbox dependency-free while
preserving the exact semantics (atomic publish, idempotent re-run, lineage).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class StageWriter:
    def __init__(self, spark: SparkSession, base_dir: str, run_id: str):
        self.spark = spark
        self.dir = os.path.join(base_dir, run_id)
        self.run_id = run_id
        os.makedirs(self.dir, exist_ok=True)
        self.manifest_path = os.path.join(self.dir, "manifest.jsonl")
        self._done = self._load_manifest()

    def _load_manifest(self) -> dict[str, dict]:
        done = {}
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                for line in f:
                    if line.strip():
                        rec = json.loads(line)
                        done[rec["stage"]] = rec
        return done

    def _stage_path(self, stage: str) -> str:
        return os.path.join(self.dir, stage)

    def is_done(self, stage: str) -> bool:
        path = self._stage_path(stage)
        return stage in self._done and os.path.exists(os.path.join(path, "_SUCCESS"))

    def materialize(self, stage: str, build) -> DataFrame:
        """Build + persist the stage unless already complete; return a
        DataFrame reading the persisted table (stable across restarts)."""
        path = self._stage_path(stage)
        if not self.is_done(stage):
            from pyspark.sql import functions as F

            t0 = time.monotonic()
            df = build()
            df.write.mode("overwrite").parquet(path)
            out = self.spark.read.parquet(path)
            # per-partition lineage + skew metrics (north-rule: every stage
            # records enough to spot a hot partition without re-running):
            # one tiny aggregate over spark_partition_id per materialization
            pstats = (
                out.groupBy(F.spark_partition_id().alias("pid"))
                .agg(F.count("*").alias("n"))
                .agg(
                    F.count("*").alias("parts"),
                    F.sum("n").alias("rows"),
                    F.min("n").alias("p_min"),
                    F.max("n").alias("p_max"),
                    F.avg("n").alias("p_mean"),
                )
                .collect()[0]
            )
            skew = (
                float(pstats["p_max"]) / float(pstats["p_mean"])
                if pstats["p_mean"]
                else 1.0
            )
            rec = {
                "run_id": self.run_id,
                "stage": stage,
                "rows": pstats["rows"] or 0,
                # total partitions of the written table; the skew stats
                # below see only non-empty ones (groupBy drops empties)
                "n_partitions": out.rdd.getNumPartitions(),
                "n_nonempty_partitions": pstats["parts"],
                "partition_rows": {
                    "min": pstats["p_min"] or 0,
                    "max": pstats["p_max"] or 0,
                    "mean": round(float(pstats["p_mean"] or 0.0), 1),
                },
                "skew_max_over_mean": round(skew, 3),
                "wall_s": round(time.monotonic() - t0, 3),
                "finished_utc_ns": time.time_ns(),
            }
            with open(self.manifest_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
            self._done[stage] = rec
        return self.spark.read.parquet(path)

    def manifest(self) -> list[dict]:
        return list(self._done.values())
