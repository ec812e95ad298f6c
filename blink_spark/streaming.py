"""Structured Streaming front-end: a stream of source-file batches drives
the incremental linker (blink_spark.incremental) via ``foreachBatch``.

The reference has no true streaming — its incremental behavior is
batch-append KB population (SURVEY.md §2.10). This module is the Spark
shape of that loop: ``readStream`` over an arriving-files directory →
each micro-batch links against the accumulated state exactly like
``scripts/kbp_simulation.py``'s loop indexes newly discovered entities.
State (accumulated source + current clustering) is versioned per batch
under ``state_dir`` so replays of a micro-batch (at-least-once semantics)
are idempotent — the batch id is the version key.

Because every linkage step is order-independent at the fixpoint (CC over
the union of edges), the final clustering equals the one-shot batch run
regardless of how the stream chunks the input (tested in
tests/test_streaming.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from blink_spark import incremental

SOURCE_SCHEMA = (
    "repo string, path string, commit string, lang string, content string, "
    "gold_cluster string"
)

SOURCE_SCHEMA_NO_GOLD = (
    "repo string, path string, commit string, lang string, content string"
)


def _latest_version(state_dir: str, prefix: str) -> int | None:
    if not os.path.isdir(state_dir):
        return None
    versions = [
        int(d.split("_v")[1])
        for d in os.listdir(state_dir)
        if d.startswith(f"{prefix}_v") and not d.endswith("_tmp")
    ]
    return max(versions) if versions else None


def _state_path(state_dir: str, prefix: str, version: int) -> str:
    return os.path.join(state_dir, f"{prefix}_v{version}")


def make_batch_processor(spark: SparkSession, state_dir: str):
    """Returns the foreachBatch callback: link batch_df against state,
    publish state version = batch_id + 1 (idempotent on replay)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        version = int(batch_id) + 1
        done = os.path.join(_state_path(state_dir, "clusters", version), "_SUCCESS")
        if os.path.exists(done):
            return  # replayed micro-batch: state already published
        prev = _latest_version(state_dir, "clusters")
        if prev is None:
            prior_src = prior_clusters = None
        else:
            prior_src = spark.read.parquet(_state_path(state_dir, "source", prev))
            prior_clusters = spark.read.parquet(
                _state_path(state_dir, "clusters", prev)
            )
        merged = incremental.link_batch(prior_src, prior_clusters, batch_df)
        merged.write.mode("overwrite").parquet(
            _state_path(state_dir, "clusters", version)
        )
        src_cols = [c for c in batch_df.columns]
        new_src = (
            batch_df.select(*src_cols)
            if prior_src is None
            else prior_src.select(*src_cols).unionByName(batch_df.select(*src_cols))
        )
        new_src.write.mode("overwrite").parquet(
            _state_path(state_dir, "source", version)
        )

    return process


def stream_link(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    schema: str = SOURCE_SCHEMA,
    max_files_per_trigger: int | None = 1,
):
    """Start (availableNow) a streaming linkage over parquet files arriving
    in ``input_dir``. Returns the StreamingQuery; the caller awaits it.
    Final clusters: ``latest_clusters(spark, state_dir)``."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(input_dir)
    return (
        stream.writeStream.foreachBatch(make_batch_processor(spark, state_dir))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def latest_clusters(spark: SparkSession, state_dir: str) -> DataFrame:
    v = _latest_version(state_dir, "clusters")
    if v is None:
        raise FileNotFoundError(f"no clusters state under {state_dir}")
    return spark.read.parquet(_state_path(state_dir, "clusters", v))
