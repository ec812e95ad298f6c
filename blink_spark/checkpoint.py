"""Iceberg-style stage checkpoints: snapshots, lineage manifests, resume,
time travel.

The reference's crash-safety idiom is file-level: each script writes its
output files and a summary CSV, and reruns skip tasks already present
(``scripts/feature_ablation_study.py:906-915``; partial-write appends at
``scripts/kbp_simulation.py:763-769``). Here that idiom becomes per-stage
parquet SNAPSHOTS plus a JSON manifest row per commit — the same metadata
shape Iceberg uses (immutable snapshot data files + an append-only snapshot
log whose last entry is the current table state):

    <dir>/<run_id>/<stage>/snap-NNNNNN/   immutable parquet data (+ _SUCCESS)
    <dir>/<run_id>/manifest.jsonl         one line per COMMITTED snapshot:
        {run_id, stage, snapshot_id, parent_snapshot_id, operation,
         schema, rows, n_partitions, n_nonempty_partitions,
         partition_rows{min,max,mean}, skew_max_over_mean,
         dir_bounds{dir: {col: [min,max]}}  (lifted from parquet footers,
         Iceberg's manifest column stats — drives merge min/max pruning),
         wall_s, finished_utc_ns}

Commit protocol (object-store safe, mirrors blink_spark.streaming): write
the snapshot directory, let Spark drop the ``_SUCCESS`` marker, then append
ONE manifest line — the manifest append is the atomic commit point. A crash
before the append leaves an orphan directory that no reader ever sees (and
that the next publish simply supersedes); a torn trailing line is ignored on
load. Readers never list data directories — the manifest alone names every
live snapshot — so the layout is safe on eventually-consistent stores.

Semantics carried over from Iceberg:
- resume-if-done:   ``materialize`` re-reads the current snapshot
- re-publish:       ``publish`` commits a NEW snapshot; old ones stay
                    readable (snapshot isolation for concurrent readers)
- fast-append:      ``append`` commits a snapshot that REFERENCES the
                    parent's data dirs plus one new delta dir — old data
                    is never rewritten, the commit cost is O(delta)
                    (Iceberg's append manifest-list shape)
- merge (upsert):   ``merge(stage, source, key_cols)`` — copy-on-write
                    row-level MERGE: only data dirs containing a matched
                    key are rewritten; untouched dirs are re-referenced
                    unchanged (Iceberg's CoW MERGE INTO at file
                    granularity)
- delete:           ``delete_where(stage, condition)`` — CoW row-level
                    delete with the same touched-dir pruning
- time travel:      ``read_as_of(stage, snapshot_id)``
- schema evolution: each snapshot records (and serves) its own schema
- expiration:       ``expire_snapshots(stage, keep_last=k)`` deletes data
                    dirs no surviving snapshot references (appends share
                    dirs, so expiration is reference-counted); the log
                    keeps the lineage rows

On a real deployment these tables are Iceberg and this module is replaced
by the catalog; parquet + JSONL keeps the sandbox dependency-free while
preserving the exact semantics.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession


class SnapshotNotFound(LookupError):
    pass


def _dir_column_bounds(path: str) -> dict[str, list]:
    """Per-column [min, max] of one data dir, read from the parquet
    footers Spark already wrote — no extra jobs (Iceberg lifts the same
    stats into its manifest entries). Only top-level scalar columns with
    JSON-representable stats are kept; anything else simply records no
    bound (pruning stays conservative). Parquet writers keep truncated
    string stats valid bounds (truncated max is incremented), and UTF-8
    byte order equals code-point order, so Python comparisons against
    these values are sound."""
    import pyarrow.parquet as pq

    bounds: dict[str, list] = {}
    for fname in sorted(os.listdir(path)):
        if not fname.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, fname)).metadata
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            for j in range(rg.num_columns):
                col = rg.column(j)
                st = col.statistics
                if st is None or not st.has_min_max or "." in col.path_in_schema:
                    continue
                lo, hi = st.min, st.max
                if isinstance(lo, bytes):
                    try:
                        lo, hi = lo.decode(), hi.decode()
                    except UnicodeDecodeError:
                        continue
                if not isinstance(lo, (str, int, float, bool)):
                    continue
                cur = bounds.get(col.path_in_schema)
                if cur is None:
                    bounds[col.path_in_schema] = [lo, hi]
                else:
                    cur[0] = min(cur[0], lo)
                    cur[1] = max(cur[1], hi)
    return bounds


class StageWriter:
    def __init__(self, spark: SparkSession, base_dir: str, run_id: str):
        self.spark = spark
        self.dir = os.path.join(base_dir, run_id)
        self.run_id = run_id
        os.makedirs(self.dir, exist_ok=True)
        self.manifest_path = os.path.join(self.dir, "manifest.jsonl")
        # full snapshot log per stage, commit order == file order
        self._log: dict[str, list[dict]] = {}
        self._load_manifest()

    def _load_manifest(self) -> None:
        self._log = {}
        tombstones: list[dict] = []
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        rec = json.loads(line)
                    except json.JSONDecodeError:
                        # torn trailing line from a crash mid-append: the
                        # commit never happened; ignore it
                        continue
                    if rec["stage"] == "__expire__":
                        tombstones.append(rec)
                    else:
                        self._log.setdefault(rec["stage"], []).append(rec)
        for ts in tombstones:
            for rec in self._log.get(ts["target_stage"], []):
                if rec["snapshot_id"] == ts["snapshot_id"]:
                    rec["expired"] = True

    # -- paths ------------------------------------------------------------

    def _snap_path(self, stage: str, snapshot_id: int) -> str:
        return os.path.join(self.dir, stage, f"snap-{snapshot_id:06d}")

    def _data_dirs(self, stage: str, rec: dict) -> list[str]:
        """Absolute data dirs of a snapshot. Overwrite snapshots own one
        dir; append snapshots reference their parent's dirs + one delta
        dir (recorded relative in the manifest for portability)."""
        rel = rec.get("data_dirs") or [f"snap-{rec['snapshot_id']:06d}"]
        return [os.path.join(self.dir, stage, d) for d in rel]

    def _append_line(self, rec: dict) -> None:
        """Append one manifest line; if a previous append tore mid-line
        (crash without trailing newline), start on a fresh line so the
        torn tail stays an isolated, ignorable fragment."""
        lead = ""
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path, "rb") as f:
                f.seek(0, os.SEEK_END)
                if f.tell() > 0:
                    f.seek(-1, os.SEEK_END)
                    if f.read(1) != b"\n":
                        lead = "\n"
        with open(self.manifest_path, "a") as f:
            f.write(lead + json.dumps(rec) + "\n")

    # -- log accessors ----------------------------------------------------

    def snapshots(self, stage: str) -> list[dict]:
        """The stage's committed snapshot log, oldest first."""
        return list(self._log.get(stage, []))

    def current_snapshot(self, stage: str) -> dict | None:
        log = self._log.get(stage)
        return log[-1] if log else None

    def is_done(self, stage: str) -> bool:
        cur = self.current_snapshot(stage)
        if cur is None:
            return False
        # the snapshot's OWN write is the last data dir (appends reference
        # parent dirs first, then their delta)
        return os.path.exists(
            os.path.join(self._data_dirs(stage, cur)[-1], "_SUCCESS")
        )

    def manifest(self) -> list[dict]:
        """Current (latest) snapshot row per stage — the table state."""
        return [log[-1] for log in self._log.values() if log]

    def history(self) -> list[dict]:
        """Every committed snapshot row, commit order within each stage."""
        return [rec for log in self._log.values() for rec in log]

    # -- reads ------------------------------------------------------------

    def read(self, stage: str) -> DataFrame:
        cur = self.current_snapshot(stage)
        if cur is None:
            raise SnapshotNotFound(f"stage {stage!r} has no committed snapshot")
        return self.read_as_of(stage, cur["snapshot_id"])

    def read_as_of(self, stage: str, snapshot_id: int) -> DataFrame:
        """Time travel: the stage exactly as committed at ``snapshot_id``
        (including that snapshot's schema)."""
        for rec in self._log.get(stage, []):
            if rec["snapshot_id"] == snapshot_id:
                if rec.get("expired"):
                    raise SnapshotNotFound(
                        f"snapshot {snapshot_id} of stage {stage!r} was expired"
                    )
                return self.spark.read.parquet(*self._data_dirs(stage, rec))
        raise SnapshotNotFound(
            f"stage {stage!r} has no snapshot {snapshot_id} in the log"
        )

    # -- commits ----------------------------------------------------------

    def materialize(self, stage: str, build) -> DataFrame:
        """Build + publish the stage unless already committed; return a
        DataFrame reading the current snapshot (stable across restarts)."""
        if not self.is_done(stage):
            self.publish(stage, build())
        return self.read(stage)

    def _write_stats(self, path: str) -> tuple[DataFrame, dict]:
        """Per-partition lineage + skew metrics of one written dir
        (north-rule: every stage records enough to spot a hot partition
        without re-running): one tiny aggregate over spark_partition_id
        per commit."""
        from pyspark.sql import functions as F

        out = self.spark.read.parquet(path)
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
        return out, {
            "rows": pstats["rows"] or 0,
            # total partitions of the written dir; the skew stats
            # below see only non-empty ones (groupBy drops empties)
            "n_partitions": out.rdd.getNumPartitions(),
            "n_nonempty_partitions": pstats["parts"],
            "partition_rows": {
                "min": pstats["p_min"] or 0,
                "max": pstats["p_max"] or 0,
                "mean": round(float(pstats["p_mean"] or 0.0), 1),
            },
            "skew_max_over_mean": round(skew, 3),
        }

    def publish(self, stage: str, df: DataFrame, operation: str = "overwrite") -> dict:
        """Commit ``df`` as a NEW immutable snapshot of ``stage`` and return
        its manifest row. Prior snapshots remain readable via
        ``read_as_of`` until expired — a re-publish never mutates data a
        concurrent reader may hold (snapshot isolation)."""
        cur = self.current_snapshot(stage)
        snapshot_id = (cur["snapshot_id"] + 1) if cur else 1
        path = self._snap_path(stage, snapshot_id)

        t0 = time.monotonic()
        df.write.mode("overwrite").parquet(path)
        out, stats = self._write_stats(path)
        rec = {
            "run_id": self.run_id,
            "stage": stage,
            "snapshot_id": snapshot_id,
            "parent_snapshot_id": cur["snapshot_id"] if cur else None,
            "operation": operation,
            "data_dirs": [os.path.basename(path)],
            "dir_bounds": {os.path.basename(path): _dir_column_bounds(path)},
            "schema": [f"{f.name}:{f.dataType.simpleString()}" for f in out.schema],
            **stats,
            "wall_s": round(time.monotonic() - t0, 3),
            "finished_utc_ns": time.time_ns(),
        }
        # the manifest append IS the commit — everything above is invisible
        # to readers until this line lands
        self._append_line(rec)
        self._log.setdefault(stage, []).append(rec)
        return rec

    def append(self, stage: str, df: DataFrame) -> dict:
        """Iceberg fast-append: commit a snapshot whose data = the parent
        snapshot's dirs + ONE new delta dir. Old data is never rewritten
        or re-scanned — commit cost (write + stats) is O(delta rows) —
        and the parent snapshot stays readable as-of, sharing the same
        dirs. The delta must match the current schema exactly; schema
        evolution goes through ``publish`` (an overwrite snapshot), as in
        Iceberg where appends conform to the table's current schema."""
        cur = self.current_snapshot(stage)
        if cur is None:
            return self.publish(stage, df, operation="append")
        schema = [f"{f.name}:{f.dataType.simpleString()}" for f in df.schema]
        if schema != cur["schema"]:
            raise ValueError(
                f"append schema {schema} != current snapshot schema "
                f"{cur['schema']}; use publish() to evolve the schema"
            )
        snapshot_id = cur["snapshot_id"] + 1
        path = self._snap_path(stage, snapshot_id)

        t0 = time.monotonic()
        df.write.mode("overwrite").parquet(path)
        _, stats = self._write_stats(path)
        delta_rows = stats.pop("rows")
        parent_dirs = cur.get("data_dirs") or [f"snap-{cur['snapshot_id']:06d}"]
        rec = {
            "run_id": self.run_id,
            "stage": stage,
            "snapshot_id": snapshot_id,
            "parent_snapshot_id": cur["snapshot_id"],
            "operation": "fast-append",
            "data_dirs": [*parent_dirs, os.path.basename(path)],
            "dir_bounds": {
                **(cur.get("dir_bounds") or {}),
                os.path.basename(path): _dir_column_bounds(path),
            },
            "schema": cur["schema"],
            "rows": cur["rows"] + delta_rows,
            "delta_rows": delta_rows,
            **stats,  # partition/skew metrics of the DELTA write
            "wall_s": round(time.monotonic() - t0, 3),
            "finished_utc_ns": time.time_ns(),
        }
        self._append_line(rec)
        self._log.setdefault(stage, []).append(rec)
        return rec

    # -- row-level writes (copy-on-write) -----------------------------------

    def _schema_of(self, df: DataFrame) -> list[str]:
        return [f"{f.name}:{f.dataType.simpleString()}" for f in df.schema]

    def _touched_dirs(
        self, stage: str, cur: dict, probe, dirs: list[str] | None = None
    ) -> list[str]:
        """Dir basenames of ``cur`` whose files contain ≥1 row selected by
        ``probe`` (a fn DataFrame→DataFrame). One key/predicate-column-only
        parquet scan over ``dirs`` (default: every dir of ``cur``) —
        column pruning keeps it cheap relative to the rewrite, and merge
        narrows ``dirs`` first via the manifest's footer-stat key bounds."""
        from pyspark.sql import functions as F

        if dirs is not None:
            if not dirs:
                return []
            paths = [os.path.join(self.dir, stage, d) for d in dirs]
        else:
            paths = self._data_dirs(stage, cur)
        target = self.spark.read.parquet(*paths)
        dir_col = F.element_at(F.split(F.input_file_name(), "/"), -2)
        hits = probe(target.withColumn("__dir", dir_col))
        return [r["__dir"] for r in hits.select("__dir").distinct().collect()]

    @staticmethod
    def _bounds_may_match(dir_bounds: dict | None, src_bounds: dict) -> bool:
        """False only when some key column's [min,max] interval in the dir
        is provably disjoint from the source keys' interval — the same
        min/max pruning Iceberg does with manifest column stats. Missing
        or incomparable bounds keep the dir (conservative)."""
        if not dir_bounds:
            return True
        for col, (slo, shi) in src_bounds.items():
            db = dir_bounds.get(col)
            if db is None or slo is None or shi is None:
                continue
            try:
                if shi < db[0] or slo > db[1]:
                    return False
            except TypeError:
                continue
        return True

    def merge(self, stage: str, source: DataFrame, key_cols: list[str]) -> dict:
        """Row-level MERGE (upsert), Iceberg ``MERGE INTO ... WHEN MATCHED
        THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`` with copy-on-
        write: target rows whose ``key_cols`` match a source row are
        replaced by that source row, unmatched source rows are inserted,
        and ONLY data dirs containing a matched key are rewritten — every
        untouched dir is referenced unchanged by the new snapshot, so the
        commit cost is O(touched + delta), not O(table). The parent
        snapshot stays readable as-of (snapshot isolation). The source
        must be key-unique (Iceberg's MERGE cardinality check) and match
        the current schema (evolution goes through ``publish``)."""
        from pyspark.sql import functions as F

        cur = self.current_snapshot(stage)
        if cur is None:
            return self.publish(stage, source, operation="merge")
        schema = self._schema_of(source)
        if schema != cur["schema"]:
            raise ValueError(
                f"merge source schema {schema} != current snapshot schema "
                f"{cur['schema']}; use publish() to evolve the schema"
            )
        card = source.agg(
            F.count("*").alias("n"),
            F.count_distinct(*[F.col(k) for k in key_cols]).alias("d"),
            *[f for k in key_cols
              for f in (F.min(k).alias(f"lo_{k}"), F.max(k).alias(f"hi_{k}"))],
        ).collect()[0]
        if card["n"] != card["d"]:
            raise ValueError(
                f"merge source has {card['n'] - card['d']} duplicate "
                f"key rows on {key_cols} — a target row would match more "
                "than one source row (Iceberg cardinality violation)"
            )
        src_rows = card["n"]
        src_bounds = {k: (card[f"lo_{k}"], card[f"hi_{k}"]) for k in key_cols}
        parent_rel = cur.get("data_dirs") or [f"snap-{cur['snapshot_id']:06d}"]
        # min/max pruning BEFORE the probe scan: a dir whose footer-stat
        # key interval is disjoint from the source keys' interval cannot
        # contain a match and is never read
        all_bounds = cur.get("dir_bounds") or {}
        candidates = [
            d for d in parent_rel
            if self._bounds_may_match(all_bounds.get(d), src_bounds)
        ]
        keys = source.select(*key_cols)
        touched = self._touched_dirs(
            stage, cur,
            lambda t: t.select("__dir", *key_cols).join(keys, key_cols, "left_semi"),
            dirs=candidates,
        )
        untouched_rel = [d for d in parent_rel if d not in set(touched)]
        colnames = [s.split(":", 1)[0] for s in cur["schema"]]

        snapshot_id = cur["snapshot_id"] + 1
        path = self._snap_path(stage, snapshot_id)
        t0 = time.monotonic()
        if touched:
            touched_abs = [os.path.join(self.dir, stage, d) for d in touched]
            old = self.spark.read.parquet(*touched_abs)
            touched_total = old.count()
            new_df = old.join(keys, key_cols, "left_anti").unionByName(source)
        else:
            touched_total = 0
            new_df = source
        new_df.select(*colnames).write.mode("overwrite").parquet(path)
        _, stats = self._write_stats(path)
        delta_rows = stats.pop("rows")
        updated = touched_total - (delta_rows - src_rows)
        rec = {
            "run_id": self.run_id,
            "stage": stage,
            "snapshot_id": snapshot_id,
            "parent_snapshot_id": cur["snapshot_id"],
            "operation": "merge",
            "data_dirs": [*untouched_rel, os.path.basename(path)],
            "dir_bounds": {
                **{d: b for d, b in all_bounds.items() if d in set(untouched_rel)},
                os.path.basename(path): _dir_column_bounds(path),
            },
            "schema": cur["schema"],
            "rows": cur["rows"] - touched_total + delta_rows,
            "delta_rows": delta_rows,
            "merge_updated": updated,
            "merge_inserted": src_rows - updated,
            "rewritten_dirs": len(touched),
            "probe_pruned_dirs": len(parent_rel) - len(candidates),
            **stats,  # partition/skew metrics of the rewritten delta
            "wall_s": round(time.monotonic() - t0, 3),
            "finished_utc_ns": time.time_ns(),
        }
        self._append_line(rec)
        self._log.setdefault(stage, []).append(rec)
        return rec

    def delete_where(self, stage: str, condition: str) -> dict:
        """Row-level DELETE with copy-on-write: dirs containing ≥1 row
        matching ``condition`` (a SQL boolean expression) are rewritten
        without those rows; untouched dirs are re-referenced. A delete
        matching nothing is a no-op (no new snapshot), as in Iceberg."""
        from pyspark.sql import functions as F

        cur = self.current_snapshot(stage)
        if cur is None:
            raise SnapshotNotFound(f"stage {stage!r} has no committed snapshot")
        cond = F.expr(condition)
        touched = self._touched_dirs(stage, cur, lambda t: t.filter(cond))
        if not touched:
            return cur
        parent_rel = cur.get("data_dirs") or [f"snap-{cur['snapshot_id']:06d}"]
        untouched_rel = [d for d in parent_rel if d not in set(touched)]
        colnames = [s.split(":", 1)[0] for s in cur["schema"]]

        snapshot_id = cur["snapshot_id"] + 1
        path = self._snap_path(stage, snapshot_id)
        t0 = time.monotonic()
        touched_abs = [os.path.join(self.dir, stage, d) for d in touched]
        old = self.spark.read.parquet(*touched_abs)
        touched_total = old.count()
        old.filter(~cond).select(*colnames).write.mode("overwrite").parquet(path)
        _, stats = self._write_stats(path)
        delta_rows = stats.pop("rows")
        rec = {
            "run_id": self.run_id,
            "stage": stage,
            "snapshot_id": snapshot_id,
            "parent_snapshot_id": cur["snapshot_id"],
            "operation": "delete",
            "data_dirs": [*untouched_rel, os.path.basename(path)],
            "dir_bounds": {
                **{
                    d: b
                    for d, b in (cur.get("dir_bounds") or {}).items()
                    if d in set(untouched_rel)
                },
                os.path.basename(path): _dir_column_bounds(path),
            },
            "schema": cur["schema"],
            "rows": cur["rows"] - touched_total + delta_rows,
            "delta_rows": delta_rows,
            "deleted_rows": touched_total - delta_rows,
            "rewritten_dirs": len(touched),
            **stats,
            "wall_s": round(time.monotonic() - t0, 3),
            "finished_utc_ns": time.time_ns(),
        }
        self._append_line(rec)
        self._log.setdefault(stage, []).append(rec)
        return rec

    # -- maintenance -------------------------------------------------------

    def rewrite_data_files(
        self,
        stage: str,
        target_partitions: int | None = None,
        zorder_by: tuple[str, str] | None = None,
        n_dirs: int = 8,
    ) -> dict:
        """Compaction (Iceberg's ``rewrite_data_files``): rewrite the
        current snapshot's data — typically many small fast-append /
        merge delta dirs — into ONE bin-packed dir and commit it as a new
        snapshot with identical rows. Parents keep time-traveling until
        expired; a stage already in one dir is a no-op. Pair with
        ``expire_snapshots`` to actually reclaim the small files.

        With ``zorder_by=(a, b)`` this is Iceberg's
        ``strategy => 'sort', sort_order => 'zorder(a, b)'``: rows are
        bucketed by quantiles of their Morton key (blink_spark.zorder)
        and written as ``n_dirs`` data dirs in ONE partitioned write
        job, so each dir covers a compact rectangle of the (a, b) key
        space and the manifest's per-dir min/max bounds prune 2-D box
        probes (user range AND time range) on BOTH columns — see the
        layout A/B in tests/test_checkpoint_snapshots.py. Dirs stand in
        for Iceberg's stat-tracked files: this layer's pruning
        granularity."""
        from pyspark.sql import functions as F

        cur = self.current_snapshot(stage)
        if cur is None:
            raise SnapshotNotFound(f"stage {stage!r} has no committed snapshot")
        if zorder_by is None:
            if len(cur.get("data_dirs") or [""]) <= 1:
                return cur
            df = self.read(stage)
            if target_partitions:
                df = df.coalesce(target_partitions)
            return self.publish(stage, df, operation="rewrite")

        from blink_spark import zorder

        a, b = zorder_by
        df = self.read(stage).withColumn(
            "__z", zorder.morton_col(F.col(a), F.col(b))
        )
        cuts = df.approxQuantile(
            "__z", [i / n_dirs for i in range(1, n_dirs)], 0.001
        )
        bucket = F.lit(0)
        for cut in cuts:
            bucket = bucket + (F.col("__z") > F.lit(cut)).cast("int")

        snapshot_id = cur["snapshot_id"] + 1
        path = self._snap_path(stage, snapshot_id)
        colnames = [s.split(":", 1)[0] for s in cur["schema"]]
        t0 = time.monotonic()
        (
            df.withColumn("__zb", bucket)
            .select(*colnames, "__zb")
            .write.mode("overwrite")
            .partitionBy("__zb")
            .parquet(path)
        )
        rel_dirs = sorted(
            f"{os.path.basename(path)}/{d}"
            for d in os.listdir(path)
            if d.startswith("__zb=")
        )
        rec = {
            "run_id": self.run_id,
            "stage": stage,
            "snapshot_id": snapshot_id,
            "parent_snapshot_id": cur["snapshot_id"],
            "operation": "rewrite-zorder",
            "zorder_by": [a, b],
            "data_dirs": rel_dirs,
            "dir_bounds": {
                d: _dir_column_bounds(os.path.join(self.dir, stage, d))
                for d in rel_dirs
            },
            "schema": cur["schema"],
            "rows": cur["rows"],
            "n_partitions": len(rel_dirs),
            "wall_s": round(time.monotonic() - t0, 3),
            "finished_utc_ns": time.time_ns(),
        }
        self._append_line(rec)
        self._log.setdefault(stage, []).append(rec)
        return rec

    def expire_snapshots(self, stage: str, keep_last: int = 1) -> list[int]:
        """Expire all but the newest ``keep_last`` snapshots (Iceberg's
        expire_snapshots). Data dirs are reference-counted: append
        snapshots SHARE their parent's dirs, so only dirs no surviving
        snapshot references are deleted. Lineage rows stay in the log,
        flagged ``expired`` via a tombstone commit line so readers get a
        clear error instead of a missing-path stack trace."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1: the current snapshot is live")
        log = self._log.get(stage, [])
        live_dirs = {
            d
            for rec in log[-keep_last:]
            if not rec.get("expired")
            for d in self._data_dirs(stage, rec)
        }
        expired: list[int] = []
        for rec in log[:-keep_last]:
            if rec.get("expired"):
                continue
            rec["expired"] = True
            for d in self._data_dirs(stage, rec):
                if d not in live_dirs:
                    shutil.rmtree(d, ignore_errors=True)
            self._append_line(
                {
                    "run_id": self.run_id,
                    "stage": "__expire__",
                    "target_stage": stage,
                    "snapshot_id": rec["snapshot_id"],
                    "finished_utc_ns": time.time_ns(),
                }
            )
            expired.append(rec["snapshot_id"])
        return expired
