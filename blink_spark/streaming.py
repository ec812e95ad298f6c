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

# CDC change stream: each event is an insert/update (full row) or a
# delete (key triple only — file_id = sha2(repo‖path‖commit) needs no
# payload); update = in-place correction of an existing key's payload
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


def _entries_window(
    entries: list[dict], up_to_version: int | None = None
) -> list[dict]:
    """Committed lines that contribute to state at a version: everything
    from the latest ``reset`` line (a compaction that folded all earlier
    dirs + tombstones into one rewritten dir) onward."""
    es = sorted(
        (
            e
            for e in entries
            if up_to_version is None or e["version"] <= up_to_version
        ),
        key=lambda e: e["version"],
    )
    for i in range(len(es) - 1, -1, -1):
        if es[i].get("reset"):
            return es[i:]
    return es


def _feature_dirs(entries: list[dict], up_to_version: int | None = None) -> list[str]:
    """Cumulative feature-index dirs from the per-version manifest lines."""
    return [
        e["feature_dir"]
        for e in _entries_window(entries, up_to_version)
        if e.get("feature_dir")  # a delete-only CDC version adds no dir
    ]


def _delete_paths(entries: list[dict], up_to_version: int | None = None) -> list[str]:
    """Cumulative tombstone files (merge-on-read deletes): feature dirs are
    immutable, so a retraction is recorded as a per-version parquet of
    deleted file_ids, anti-joined at read time — the Iceberg
    position/equality-delete-file idiom, never a rewrite of old data."""
    return [
        e["deletes_path"]
        for e in _entries_window(entries, up_to_version)
        if e.get("deletes_path")
    ]


def _state_as_of(
    spark: SparkSession, entries: list[dict], version: int
) -> incremental.LinkState:
    """Reconstruct the LinkState at a committed version: cumulative feature
    dirs merged with cumulative tombstones (merge-on-read), plus that
    version's assignment snapshot (already net of deletes).

    Sequencing rule (the Iceberg equality-delete semantics): a tombstone
    at version T masks feature rows from versions STRICTLY BEFORE T only —
    so a key deleted at T and re-inserted at a later version resurfaces,
    and an update's own replacement row (same version as its tombstone)
    survives while the old row it shadows (earlier version) is masked.
    This single rule is also a full dedupe: any key with more than one
    feature row was retracted between the writes (updates and
    delete+re-insert both tombstone the key), so after masking, exactly
    one row per live key remains — no per-key window over the corpus.
    Keys that never saw a tombstone skip the join entirely (anti-join on
    the small tombstone set), so steady-state read cost is one multi-dir
    scan plus a tombstone-sized join.
    """
    pub = next(e for e in entries if e["version"] == version)
    es = _entries_window(entries, version)
    feats = None
    for e in es:
        if e.get("feature_dir"):
            df = spark.read.parquet(e["feature_dir"]).withColumn(
                "_v", F.lit(e["version"])
            )
            feats = df if feats is None else feats.unionByName(df)
    if feats is None:
        raise FileNotFoundError("no committed feature dirs at this version")
    tombs = None
    for e in es:
        if e.get("deletes_path"):
            t = spark.read.parquet(e["deletes_path"]).select(
                "file_id", F.lit(e["version"]).alias("_tv")
            )
            tombs = t if tombs is None else tombs.unionByName(t)
    if tombs is not None:
        latest_tomb = tombs.groupBy("file_id").agg(F.max("_tv").alias("_tv"))
        feats = (
            feats.join(latest_tomb, "file_id", "left")
            .filter(F.col("_tv").isNull() | (F.col("_v") >= F.col("_tv")))
            .drop("_tv")
        )
    return incremental.LinkState(
        features=feats.drop("_v"),
        clusters=spark.read.parquet(pub["clusters_path"]),
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
        entries = _read_manifest(state_dir)
        if any(e.get("batch_id") == int(batch_id) for e in entries):
            return  # replayed micro-batch: already committed
        # versions are allocated monotonically over ALL committed lines
        # (stream batches AND maintenance compactions), so batch ids and
        # versions may diverge once compact_cdc_state has run
        version = max((e["version"] for e in entries), default=0) + 1
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
    """foreachBatch callback for a CDC change stream (``op`` column:
    ``insert``/``update`` carry a full source row, ``delete`` needs only
    the key triple — payload columns may be null).

    Per micro-batch, retractions apply against the PRIOR state first
    (delete keys plus the keys of update rows), then insert+update rows
    are linked — so ``update`` is an in-place correction of a row the
    stream already carries (same file_id, new payload), and a delete of a
    key inserted in the SAME batch does not retract it (the op sets carry
    no intra-batch ordering; split retract-after-insert across batches).
    Feature dirs stay immutable: a retraction commits a per-version
    tombstone parquet of the retracted file_ids, and reconstruction
    applies highest-version-wins per key with tombstones masking strictly
    earlier versions (see :func:`_state_as_of`), so delete/update cost is
    O(affected clusters) repair + O(batch) tombstone I/O, never a rewrite
    of accumulated state. Same crash protocol as
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
        entries = _read_manifest(state_dir)
        if any(e.get("batch_id") == int(batch_id) for e in entries):
            return  # replayed micro-batch: already committed
        # versions are allocated monotonically over ALL committed lines
        # (stream batches AND maintenance compactions), so batch ids and
        # versions may diverge once compact_cdc_state has run
        version = max((e["version"] for e in entries), default=0) + 1
        latest = max(entries, key=lambda e: e["version"]) if entries else None
        prior = (
            _state_as_of(spark, entries, latest["version"]) if latest else None
        )

        op = F.coalesce(F.col("op"), F.lit("insert"))
        upserts = batch_df.filter(op != "delete").drop("op")
        # retract keys: explicit deletes + the keys update rows replace
        retract = batch_df.filter((op == "delete") | (op == "update"))

        state = prior
        deletes_path = None
        if not retract.isEmpty() and prior is not None:
            keys = retract.select(
                ingest.file_id_col().alias("file_id")
            ).distinct()
            # a retraction of a never-inserted (or already-deleted) key is
            # a no-op; only live ids repair clusters and need a tombstone
            live = keys.join(prior.clusters, "file_id", "left_semi")
            deletes_path = os.path.join(state_dir, f"deletes_v{version}")
            live.write.mode("overwrite").parquet(deletes_path)
            live_back = spark.read.parquet(deletes_path)
            if live_back.isEmpty():
                deletes_path = None
            else:
                state = incremental.unlink_batch(prior, live_back, **link_kwargs)

        feat_dir = None
        if not upserts.isEmpty():
            feat_dir = os.path.join(
                state_dir, "features", f"batch={int(batch_id)}"
            )
            incremental.batch_features(upserts).write.mode("overwrite").parquet(
                feat_dir
            )
            state = incremental.link_features(
                state, spark.read.parquet(feat_dir), **link_kwargs
            )

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
    """Start (availableNow) a CDC change-stream linkage: events carry an
    ``op`` column (``insert``/``update``/``delete``); deletes and the old
    versions under updates retract rows and delta-repair their clusters
    via :func:`incremental.unlink_batch`."""
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


def compact_cdc_state(spark: SparkSession, state_dir: str) -> dict:
    """Maintenance compaction for a CDC state dir (run while the stream is
    stopped — the availableNow pattern makes that the natural cadence):
    fold the cumulative feature dirs MINUS the cumulative tombstones into
    ONE rewritten dir and publish a ``reset`` manifest line, so subsequent
    reads scan a single dir with zero tombstone joins. Merge-on-read keeps
    per-batch cost O(delta); this is the copy-on-write counterpart that
    bounds read amplification over a long-lived stream — Iceberg's
    rewrite_data_files + rewrite_position_delete_files maintenance pair.

    Crash-safe like every publish: the compacted dir is written first and
    the manifest append IS the commit; a crash in between leaves an orphan
    dir that discovery never trusts. Old dirs are not removed (earlier
    versions stay readable); storage reclamation is a separate concern.
    """
    entries = _read_manifest(state_dir)
    if not entries:
        raise FileNotFoundError(f"no published state under {state_dir}")
    pub = max(entries, key=lambda e: e["version"])
    state = _state_as_of(spark, entries, pub["version"])
    version = pub["version"] + 1
    out = os.path.join(state_dir, "features", f"compacted_v{version}")
    state.features.write.mode("overwrite").parquet(out)
    rec = {
        "version": version,
        "batch_id": None,  # maintenance line: never matches a replay probe
        "feature_dir": out,
        "clusters_path": pub["clusters_path"],
        "deletes_path": None,
        "reset": True,
    }
    _append_manifest(state_dir, rec)
    return rec


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
