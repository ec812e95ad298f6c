"""Structured Streaming front-end: a stream of source-file batches drives
the incremental linker (blink_spark.incremental) via ``foreachBatch``.

The reference has no true streaming — its incremental behavior is
batch-append KB population (SURVEY.md §2.10). This module is the Spark
shape of that loop: ``readStream`` over an arriving-files directory →
each micro-batch links against the accumulated state exactly like
``scripts/kbp_simulation.py``'s loop indexes newly discovered entities.

State layout (append-only; scale-safe at a long-running stream):

    <state_dir>/features/batch=<id>/   index features of THAT batch only
                                       (written once, never rewritten —
                                       cumulative I/O is O(corpus), not
                                       O(batches²))
    <state_dir>/clusters_v<N>/         assignment snapshot per version
                                       (thin 2-column table)
    <state_dir>/manifest.jsonl         one line per PUBLISHED version:
        {version, batch_id, feature_dir, clusters_path}
                                       (feature_dir is THAT version's new
                                       dir only; the cumulative index is
                                       the union over committed lines —
                                       manifest size stays O(batches),
                                       not O(batches²))

Publish protocol (crash-safe, at-least-once replay → exactly-once state):
feature parquet first, clusters snapshot second, manifest line LAST — the
manifest append is the atomic commit. A crash before the append leaves
orphan dirs that the replayed micro-batch simply overwrites (all writes
are deterministic functions of the batch), and discovery never trusts a
directory that the manifest does not name, so a partial write can never
wedge the stream: a torn trailing manifest line (killed mid-append) is
treated as uncommitted and ignored by discovery, then cleanly re-appended
by the replayed batch. Discovery reads only the manifest (no directory
listing — object-store safe, the Iceberg snapshot-log idiom).

Because every linkage step is order-independent at the fixpoint (CC over
the union of edges), the final clustering equals the one-shot batch run
regardless of how the stream chunks the input (tested in
tests/test_streaming.py).
"""

from __future__ import annotations

import json
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


def _manifest_path(state_dir: str) -> str:
    return os.path.join(state_dir, "manifest.jsonl")


def _read_manifest(state_dir: str) -> list[dict]:
    path = _manifest_path(state_dir)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        lines = [ln for ln in f if ln.strip()]
    out = []
    for i, line in enumerate(lines):
        try:
            out.append(json.loads(line))
        except json.JSONDecodeError:
            if i == len(lines) - 1:
                # torn trailing append (crash mid-write): the line never
                # committed — ignore it; the replayed batch re-publishes
                break
            raise  # interior corruption is NOT expected — surface it
    return out


def _append_manifest(state_dir: str, rec: dict) -> None:
    """Append one committed line; first truncate any torn trailing
    fragment (bytes after the last newline) left by a crashed append, so
    the new line never concatenates onto garbage. Committed lines always
    end with a newline (json.dumps emits none), so "after the last
    newline" is exactly the uncommitted residue."""
    path = _manifest_path(state_dir)
    with open(path, "a+b"):
        pass  # ensure existence without clobbering
    with open(path, "r+b") as f:
        data = f.read()
        cut = data.rfind(b"\n") + 1
        if cut != len(data):
            f.seek(cut)
            f.truncate()
        f.seek(0, os.SEEK_END)
        f.write((json.dumps(rec) + "\n").encode())


def _feature_dirs(entries: list[dict], up_to_version: int | None = None) -> list[str]:
    """Cumulative feature-index dirs from the per-version manifest lines."""
    es = sorted(entries, key=lambda e: e["version"])
    return [
        e["feature_dir"]
        for e in es
        if up_to_version is None or e["version"] <= up_to_version
    ]


def _published(state_dir: str) -> dict | None:
    """Latest committed version (highest version among manifest lines)."""
    entries = _read_manifest(state_dir)
    return max(entries, key=lambda e: e["version"]) if entries else None


def make_batch_processor(
    spark: SparkSession,
    state_dir: str,
    tau: float | None = None,
    block_cap: int | None = None,
):
    """Returns the foreachBatch callback: link batch_df against state,
    publish version = batch_id + 1 via a manifest append (idempotent on
    replay — a version already in the manifest is skipped). ``tau`` /
    ``block_cap`` override the linker's match threshold and block cap
    (defaults: scoring.MATCH_TAU / blocking.DEFAULT_BLOCK_CAP)."""
    link_kwargs = {}
    if tau is not None:
        link_kwargs["tau"] = tau
    if block_cap is not None:
        link_kwargs["block_cap"] = block_cap

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        version = int(batch_id) + 1
        entries = _read_manifest(state_dir)
        if any(e["version"] == version for e in entries):
            return  # replayed micro-batch: already committed
        latest = max(entries, key=lambda e: e["version"]) if entries else None

        if latest is None:
            prior = None
        else:
            prior = incremental.LinkState(
                features=spark.read.parquet(
                    *_feature_dirs(entries, latest["version"])
                ),
                clusters=spark.read.parquet(latest["clusters_path"]),
            )

        # 1. index features for the NEW rows only → their own batch dir.
        #    Written before linking and read back so the (nondeterministic
        #    across replans) UDF outputs are computed exactly once.
        feat_dir = os.path.join(state_dir, "features", f"batch={int(batch_id)}")
        incremental.batch_features(batch_df).write.mode("overwrite").parquet(feat_dir)
        new_feat = spark.read.parquet(feat_dir)

        # 2. link; 3. snapshot the (thin) assignment table
        state = incremental.link_features(prior, new_feat, **link_kwargs)
        clusters_path = os.path.join(state_dir, f"clusters_v{version}")
        state.clusters.write.mode("overwrite").parquet(clusters_path)

        # 4. commit: manifest line LAST — the atomic publish point. Only
        #    the NEW feature dir is recorded (cumulative list derives from
        #    prior lines) so the manifest grows linearly with batches.
        rec = {
            "version": version,
            "batch_id": int(batch_id),
            "feature_dir": feat_dir,
            "clusters_path": clusters_path,
        }
        _append_manifest(state_dir, rec)

    return process


def stream_link(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    schema: str = SOURCE_SCHEMA,
    max_files_per_trigger: int | None = 1,
    tau: float | None = None,
    block_cap: int | None = None,
):
    """Start (availableNow) a streaming linkage over parquet files arriving
    in ``input_dir``. Returns the StreamingQuery; the caller awaits it.
    Final clusters: ``latest_clusters(spark, state_dir)``."""
    os.makedirs(state_dir, exist_ok=True)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(input_dir)
    return (
        stream.writeStream.foreachBatch(
            make_batch_processor(spark, state_dir, tau=tau, block_cap=block_cap)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def latest_clusters(spark: SparkSession, state_dir: str) -> DataFrame:
    pub = _published(state_dir)
    if pub is None:
        raise FileNotFoundError(f"no published clusters state under {state_dir}")
    return spark.read.parquet(pub["clusters_path"])


def latest_state(spark: SparkSession, state_dir: str) -> incremental.LinkState:
    """Reload the full LinkState (feature index + assignment) — the entry
    point for resuming batch-mode linking from a streamed state."""
    entries = _read_manifest(state_dir)
    if not entries:
        raise FileNotFoundError(f"no published state under {state_dir}")
    pub = max(entries, key=lambda e: e["version"])
    return incremental.LinkState(
        features=spark.read.parquet(*_feature_dirs(entries, pub["version"])),
        clusters=spark.read.parquet(pub["clusters_path"]),
    )
