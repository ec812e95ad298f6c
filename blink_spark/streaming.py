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
from pyspark.sql import functions as F

from blink_spark import incremental, ingest

SOURCE_SCHEMA = (
    "repo string, path string, commit string, lang string, content string, "
    "gold_cluster string"
)

SOURCE_SCHEMA_NO_GOLD = (
    "repo string, path string, commit string, lang string, content string"
)

# CDC retract stream: each event is an insert (full row) or a delete
# (key triple only — file_id = sha2(repo‖path‖commit) needs no payload)
CDC_SCHEMA = SOURCE_SCHEMA + ", op string"


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
        if e.get("feature_dir")  # a delete-only CDC version adds no dir
        and (up_to_version is None or e["version"] <= up_to_version)
    ]


def _delete_paths(entries: list[dict], up_to_version: int | None = None) -> list[str]:
    """Cumulative tombstone files (merge-on-read deletes): feature dirs are
    immutable, so a retraction is recorded as a per-version parquet of
    deleted file_ids, anti-joined at read time — the Iceberg
    position/equality-delete-file idiom, never a rewrite of old data."""
    es = sorted(entries, key=lambda e: e["version"])
    return [
        e["deletes_path"]
        for e in es
        if e.get("deletes_path")
        and (up_to_version is None or e["version"] <= up_to_version)
    ]


def _state_as_of(
    spark: SparkSession, entries: list[dict], version: int
) -> incremental.LinkState:
    """Reconstruct the LinkState at a committed version: cumulative feature
    dirs minus cumulative tombstones (merge-on-read), plus that version's
    assignment snapshot (already net of deletes)."""
    pub = next(e for e in entries if e["version"] == version)
    feats = spark.read.parquet(*_feature_dirs(entries, version))
    dels = _delete_paths(entries, version)
    if dels:
        feats = feats.join(
            spark.read.parquet(*dels).select("file_id"), "file_id", "left_anti"
        )
    return incremental.LinkState(
        features=feats, clusters=spark.read.parquet(pub["clusters_path"])
    )


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
            prior = _state_as_of(spark, entries, latest["version"])

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


def make_cdc_batch_processor(
    spark: SparkSession,
    state_dir: str,
    tau: float | None = None,
    block_cap: int | None = None,
):
    """foreachBatch callback for a CDC retract stream (``op`` column:
    ``insert`` carries a full source row, ``delete`` needs only the key
    triple — payload columns may be null).

    Per micro-batch, inserts are linked first, then deletes are retracted
    (delete-wins within one batch; producers that need
    delete-then-reinsert of the SAME key must split it across batches —
    the op sets carry no intra-batch ordering). Feature dirs stay
    immutable: a retraction commits a per-version tombstone parquet of the
    deleted file_ids that every later read anti-joins (merge-on-read), so
    delete cost is O(affected clusters) repair + O(batch) tombstone I/O,
    never a rewrite of accumulated state. Same crash protocol as
    :func:`make_batch_processor` — manifest append is the commit point,
    every write is a deterministic function of the batch, replays of
    committed versions are no-ops.
    """
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
        prior = (
            _state_as_of(spark, entries, latest["version"]) if latest else None
        )

        op = F.coalesce(F.col("op"), F.lit("insert"))
        inserts = batch_df.filter(op != "delete").drop("op")
        deletes = batch_df.filter(op == "delete")

        state, feat_dir = prior, None
        if not inserts.isEmpty():
            feat_dir = os.path.join(
                state_dir, "features", f"batch={int(batch_id)}"
            )
            incremental.batch_features(inserts).write.mode("overwrite").parquet(
                feat_dir
            )
            state = incremental.link_features(
                prior, spark.read.parquet(feat_dir), **link_kwargs
            )

        deletes_path = None
        if not deletes.isEmpty() and state is not None:
            del_ids = deletes.select(
                ingest.file_id_col().alias("file_id")
            ).distinct()
            # a delete for a never-inserted (or already-deleted) key is a
            # no-op; only live ids repair clusters and need a tombstone
            live = del_ids.join(state.clusters, "file_id", "left_semi")
            deletes_path = os.path.join(state_dir, f"deletes_v{version}")
            live.write.mode("overwrite").parquet(deletes_path)
            live_back = spark.read.parquet(deletes_path)
            if live_back.isEmpty():
                deletes_path = None
            else:
                state = incremental.unlink_batch(state, live_back, **link_kwargs)

        if state is None:
            return  # batch held only deletes against an empty state
        clusters_path = os.path.join(state_dir, f"clusters_v{version}")
        state.clusters.write.mode("overwrite").parquet(clusters_path)
        rec = {
            "version": version,
            "batch_id": int(batch_id),
            "feature_dir": feat_dir,
            "clusters_path": clusters_path,
            "deletes_path": deletes_path,
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


def stream_link_cdc(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    schema: str = CDC_SCHEMA,
    max_files_per_trigger: int | None = 1,
    tau: float | None = None,
    block_cap: int | None = None,
):
    """Start (availableNow) a CDC retract-stream linkage: events carry an
    ``op`` column (``insert``/``delete``); deletes retract rows and
    delta-repair their clusters via :func:`incremental.unlink_batch`."""
    os.makedirs(state_dir, exist_ok=True)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(input_dir)
    return (
        stream.writeStream.foreachBatch(
            make_cdc_batch_processor(spark, state_dir, tau=tau, block_cap=block_cap)
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
    return _state_as_of(spark, entries, pub["version"])
