"""Iceberg-semantics snapshot layer of the checkpoint store: immutable
snapshots + append-only log, time travel, snapshot isolation across a
re-publish, schema evolution, expiration, and torn/orphan crash recovery.

The reference has no table format at all (flat files + resume-if-present,
``scripts/feature_ablation_study.py:906-915``); the north rule mandates
Iceberg checkpoints, and these are the semantics that phrase buys.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blink_spark.checkpoint import SnapshotNotFound, StageWriter


def _df(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_publish_creates_new_snapshot_and_time_travel(spark, tmp_path):
    w = StageWriter(spark, str(tmp_path), "r1")
    w.publish("t", _df(spark, [(1, "a"), (2, "b")], ["id", "v"]))
    w.publish("t", _df(spark, [(1, "a"), (2, "B"), (3, "c")], ["id", "v"]))

    log = w.snapshots("t")
    assert [r["snapshot_id"] for r in log] == [1, 2]
    assert log[1]["parent_snapshot_id"] == 1
    assert w.current_snapshot("t")["snapshot_id"] == 2

    # current read sees the re-publish; time travel sees the original
    cur = {(r["id"], r["v"]) for r in w.read("t").collect()}
    old = {(r["id"], r["v"]) for r in w.read_as_of("t", 1).collect()}
    assert cur == {(1, "a"), (2, "B"), (3, "c")}
    assert old == {(1, "a"), (2, "b")}

    with pytest.raises(SnapshotNotFound):
        w.read_as_of("t", 99)
    with pytest.raises(SnapshotNotFound):
        w.read("missing_stage")


def test_snapshot_log_survives_restart(spark, tmp_path):
    w = StageWriter(spark, str(tmp_path), "r1")
    w.publish("t", _df(spark, [(1,)], ["id"]))
    w.publish("t", _df(spark, [(1,), (2,)], ["id"]))

    w2 = StageWriter(spark, str(tmp_path), "r1")  # fresh load from disk
    assert [r["snapshot_id"] for r in w2.snapshots("t")] == [1, 2]
    assert w2.read_as_of("t", 1).count() == 1
    assert w2.read("t").count() == 2


def test_schema_evolution_each_snapshot_serves_its_own_schema(spark, tmp_path):
    w = StageWriter(spark, str(tmp_path), "r1")
    w.publish("t", _df(spark, [(1, "x")], ["id", "v"]))
    w.publish("t", _df(spark, [(1, "x", 0.5)], ["id", "v", "score"]))

    assert w.read_as_of("t", 1).columns == ["id", "v"]
    assert w.read("t").columns == ["id", "v", "score"]
    assert w.snapshots("t")[0]["schema"] == ["id:bigint", "v:string"]
    assert w.snapshots("t")[1]["schema"] == ["id:bigint", "v:string", "score:double"]


def test_expire_snapshots_keeps_current_and_tombstones_survive_restart(
    spark, tmp_path
):
    w = StageWriter(spark, str(tmp_path), "r1")
    for n in (1, 2, 3):
        w.publish("t", _df(spark, [(i,) for i in range(n)], ["id"]))

    assert w.expire_snapshots("t", keep_last=1) == [1, 2]
    assert w.read("t").count() == 3  # current untouched
    with pytest.raises(SnapshotNotFound):
        w.read_as_of("t", 1)
    # lineage rows stay in the log, flagged
    assert [r.get("expired", False) for r in w.snapshots("t")] == [True, True, False]
    # idempotent: nothing left to expire
    assert w.expire_snapshots("t", keep_last=1) == []
    with pytest.raises(ValueError):
        w.expire_snapshots("t", keep_last=0)

    w2 = StageWriter(spark, str(tmp_path), "r1")  # tombstones reload
    with pytest.raises(SnapshotNotFound):
        w2.read_as_of("t", 2)
    assert w2.read("t").count() == 3


def test_orphan_snapshot_dir_is_invisible_and_superseded(spark, tmp_path):
    """Crash AFTER the data write but BEFORE the manifest append: the
    manifest line is the commit, so readers never see the orphan and the
    next publish simply takes the next snapshot id past it."""
    w = StageWriter(spark, str(tmp_path), "r1")
    w.publish("t", _df(spark, [(1,)], ["id"]))

    # simulate the torn publish: data + _SUCCESS exist, no manifest line
    orphan = _df(spark, [(999,)], ["id"])
    orphan.write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "r1", "t", "snap-000002")
    )

    w2 = StageWriter(spark, str(tmp_path), "r1")
    assert w2.current_snapshot("t")["snapshot_id"] == 1
    assert {r["id"] for r in w2.read("t").collect()} == {1}

    # the next commit supersedes the orphan (same id, overwrite mode)
    w2.publish("t", _df(spark, [(7,)], ["id"]))
    assert {r["id"] for r in w2.read("t").collect()} == {7}


def test_torn_manifest_tail_is_ignored(spark, tmp_path):
    w = StageWriter(spark, str(tmp_path), "r1")
    w.publish("t", _df(spark, [(1,)], ["id"]))
    manifest = os.path.join(str(tmp_path), "r1", "manifest.jsonl")
    with open(manifest, "a") as f:
        f.write('{"run_id": "r1", "stage": "t", "snapsho')  # crash mid-append

    w2 = StageWriter(spark, str(tmp_path), "r1")
    assert [r["snapshot_id"] for r in w2.snapshots("t")] == [1]
    assert w2.read("t").count() == 1
    # and the store still accepts commits afterwards (append self-heals:
    # the next line begins on its own line? JSONL appends always end with
    # a newline, so one torn tail line is the worst case)
    w2.publish("u", _df(spark, [(5,)], ["id"]))
    w3 = StageWriter(spark, str(tmp_path), "r1")
    assert w3.current_snapshot("u")["snapshot_id"] == 1


def test_fast_append_shares_parent_dirs_and_time_travels(spark, tmp_path):
    """Appends commit O(delta): the new snapshot references the parent's
    data dirs + one delta dir, the parent stays readable as-of, and row
    accounting tracks totals + deltas."""
    w = StageWriter(spark, str(tmp_path), "r1")
    w.publish("t", _df(spark, [(1,), (2,)], ["id"]))
    rec = w.append("t", _df(spark, [(3,)], ["id"]))

    assert rec["operation"] == "fast-append"
    assert rec["data_dirs"] == ["snap-000001", "snap-000002"]
    assert rec["rows"] == 3 and rec["delta_rows"] == 1

    assert {r["id"] for r in w.read("t").collect()} == {1, 2, 3}
    assert {r["id"] for r in w.read_as_of("t", 1).collect()} == {1, 2}

    # survives a restart (dirs resolved from the manifest alone)
    w2 = StageWriter(spark, str(tmp_path), "r1")
    assert {r["id"] for r in w2.read("t").collect()} == {1, 2, 3}

    # appends conform to the current schema; evolution goes through publish
    with pytest.raises(ValueError):
        w2.append("t", _df(spark, [(4, "x")], ["id", "v"]))

    # append on an empty stage degrades to the table-creating snapshot
    rec0 = w2.append("fresh", _df(spark, [(9,)], ["id"]))
    assert rec0["snapshot_id"] == 1 and rec0["operation"] == "append"


def test_expire_is_reference_counted_across_appends(spark, tmp_path):
    """Expiring an overwrite snapshot whose dir a LIVE append still
    references must not delete that dir; once no survivor references it,
    it goes."""
    w = StageWriter(spark, str(tmp_path), "r1")
    w.publish("t", _df(spark, [(1,)], ["id"]))          # snap-1
    w.append("t", _df(spark, [(2,)], ["id"]))           # snap-2 = dirs {1,2}
    w.append("t", _df(spark, [(3,)], ["id"]))           # snap-3 = dirs {1,2,3}

    assert w.expire_snapshots("t", keep_last=1) == [1, 2]
    # snapshot 3 still reads ALL rows — dirs 1 and 2 were shared, not deleted
    assert {r["id"] for r in w.read("t").collect()} == {1, 2, 3}
    with pytest.raises(SnapshotNotFound):
        w.read_as_of("t", 1)

    # an overwrite releases the old dirs; expiring then deletes them
    w.publish("t", _df(spark, [(7,)], ["id"]))          # snap-4, own dir
    assert w.expire_snapshots("t", keep_last=1) == [3]
    stage_dir = os.path.join(str(tmp_path), "r1", "t")
    assert sorted(os.listdir(stage_dir)) == ["snap-000004"]
    assert {r["id"] for r in w.read("t").collect()} == {7}


def test_materialize_resumes_from_current_snapshot(spark, tmp_path):
    w = StageWriter(spark, str(tmp_path), "r1")
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return _df(spark, [(1,)], ["id"])

    w.materialize("t", build)
    w.materialize("t", build)  # resume: no rebuild
    assert calls["n"] == 1
    assert w.manifest()[0]["snapshot_id"] == 1


def test_merge_upserts_and_rewrites_only_touched_dirs(spark, tmp_path):
    """Copy-on-write MERGE: matched rows replaced, unmatched source rows
    inserted, and a data dir containing no matched key is re-referenced
    byte-identical (never rewritten)."""
    w = StageWriter(spark, str(tmp_path), "r1")
    w.publish("t", _df(spark, [(1, "a"), (2, "b")], ["id", "v"]))   # snap-1
    w.append("t", _df(spark, [(3, "c"), (4, "d")], ["id", "v"]))    # snap-2

    base_dir = os.path.join(str(tmp_path), "r1", "t", "snap-000001")
    before = {f: os.path.getmtime(os.path.join(base_dir, f))
              for f in os.listdir(base_dir)}

    # keys 3 (update) and 5 (insert) live only in the snap-2 delta dir
    rec = w.merge("t", _df(spark, [(3, "C"), (5, "e")], ["id", "v"]), ["id"])

    assert rec["operation"] == "merge"
    assert rec["merge_updated"] == 1 and rec["merge_inserted"] == 1
    assert rec["rewritten_dirs"] == 1
    assert rec["rows"] == 5
    assert "snap-000001" in rec["data_dirs"]  # untouched dir re-referenced
    after = {f: os.path.getmtime(os.path.join(base_dir, f))
             for f in os.listdir(base_dir)}
    assert after == before  # base dir bytes never touched

    got = {(r["id"], r["v"]) for r in w.read("t").collect()}
    assert got == {(1, "a"), (2, "b"), (3, "C"), (4, "d"), (5, "e")}
    # parent snapshot unchanged (snapshot isolation)
    old = {(r["id"], r["v"]) for r in w.read_as_of("t", 2).collect()}
    assert old == {(1, "a"), (2, "b"), (3, "c"), (4, "d")}

    # log + data survive a restart
    w2 = StageWriter(spark, str(tmp_path), "r1")
    assert {(r["id"], r["v"]) for r in w2.read("t").collect()} == got


def test_merge_guards_cardinality_and_schema(spark, tmp_path):
    w = StageWriter(spark, str(tmp_path), "r1")
    w.publish("t", _df(spark, [(1, "a")], ["id", "v"]))
    with pytest.raises(ValueError, match="cardinality"):
        w.merge("t", _df(spark, [(1, "x"), (1, "y")], ["id", "v"]), ["id"])
    with pytest.raises(ValueError, match="schema"):
        w.merge("t", _df(spark, [(1, "x", 0)], ["id", "v", "extra"]), ["id"])
    # merge into an empty stage is the table-creating insert
    rec = w.merge("fresh", _df(spark, [(9, "z")], ["id", "v"]), ["id"])
    assert rec["snapshot_id"] == 1 and rec["operation"] == "merge"


def test_delete_where_cow_and_noop(spark, tmp_path):
    w = StageWriter(spark, str(tmp_path), "r1")
    w.publish("t", _df(spark, [(1, "a"), (2, "b")], ["id", "v"]))   # snap-1
    w.append("t", _df(spark, [(3, "c"), (4, "d")], ["id", "v"]))    # snap-2

    rec = w.delete_where("t", "id = 3")
    assert rec["operation"] == "delete"
    assert rec["deleted_rows"] == 1 and rec["rows"] == 3
    assert rec["rewritten_dirs"] == 1
    assert "snap-000001" in rec["data_dirs"]
    assert {r["id"] for r in w.read("t").collect()} == {1, 2, 4}
    # time travel still sees the deleted row
    assert {r["id"] for r in w.read_as_of("t", 2).collect()} == {1, 2, 3, 4}

    # a delete matching nothing commits no new snapshot (Iceberg no-op)
    cur_before = w.current_snapshot("t")["snapshot_id"]
    noop = w.delete_where("t", "id = 999")
    assert noop["snapshot_id"] == cur_before
    assert w.current_snapshot("t")["snapshot_id"] == cur_before


def test_expire_is_reference_counted_across_merges(spark, tmp_path):
    """A merge's new snapshot shares the untouched dirs with its parent;
    expiring the parent must not delete dirs the merge still references."""
    w = StageWriter(spark, str(tmp_path), "r1")
    w.publish("t", _df(spark, [(1, "a"), (2, "b")], ["id", "v"]))   # snap-1
    w.append("t", _df(spark, [(3, "c")], ["id", "v"]))              # snap-2
    w.merge("t", _df(spark, [(3, "C")], ["id", "v"]), ["id"])       # snap-3

    assert w.expire_snapshots("t", keep_last=1) == [1, 2]
    # snap-3 references snap-1's dir (untouched by the merge) — still whole
    assert {(r["id"], r["v"]) for r in w.read("t").collect()} == {
        (1, "a"), (2, "b"), (3, "C")
    }


def test_rewrite_data_files_compacts_append_chain(spark, tmp_path):
    """Compaction: a chain of fast-append delta dirs collapses into one
    bin-packed dir with identical rows; expiring then reclaims the small
    dirs while the compacted snapshot stays whole."""
    w = StageWriter(spark, str(tmp_path), "r1")
    w.publish("t", _df(spark, [(1,)], ["id"]))
    for i in range(2, 5):
        w.append("t", _df(spark, [(i,)], ["id"]))
    assert len(w.current_snapshot("t")["data_dirs"]) == 4

    rec = w.rewrite_data_files("t", target_partitions=1)
    assert rec["operation"] == "rewrite"
    assert len(rec["data_dirs"]) == 1
    assert rec["rows"] == 4
    assert {r["id"] for r in w.read("t").collect()} == {1, 2, 3, 4}
    # already compact → no-op, no new snapshot
    assert w.rewrite_data_files("t")["snapshot_id"] == rec["snapshot_id"]

    w.expire_snapshots("t", keep_last=1)
    stage_dir = os.path.join(str(tmp_path), "r1", "t")
    assert os.listdir(stage_dir) == [f"snap-{rec['snapshot_id']:06d}"]
    assert {r["id"] for r in w.read("t").collect()} == {1, 2, 3, 4}


def test_merge_minmax_prunes_disjoint_dirs_before_probe(spark, tmp_path):
    """Iceberg-style manifest column stats: each commit lifts per-dir
    [min,max] from the parquet footers, and a merge whose source keys are
    provably disjoint from a dir's interval never reads that dir — on
    range-clustered keys the probe scan is delta-local. Bounds survive the
    JSON manifest round-trip (restart)."""
    w = StageWriter(spark, str(tmp_path), "r1")
    w.publish("t", _df(spark, [(i, "a") for i in range(100)], ["id", "v"]))
    w.append("t", _df(spark, [(i, "b") for i in range(100, 200)], ["id", "v"]))
    w.append("t", _df(spark, [(i, "c") for i in range(200, 300)], ["id", "v"]))

    cur = w.current_snapshot("t")
    assert cur["dir_bounds"]["snap-000001"]["id"] == [0, 99]
    assert cur["dir_bounds"]["snap-000003"]["id"] == [200, 299]

    # restart → bounds reloaded from the manifest, then a merge whose keys
    # live entirely in the middle dir's range
    w2 = StageWriter(spark, str(tmp_path), "r1")
    rec = w2.merge(
        "t", _df(spark, [(150, "B"), (160, "B2")], ["id", "v"]), ["id"]
    )
    assert rec["probe_pruned_dirs"] == 2     # dirs 1 and 3 never read
    assert rec["rewritten_dirs"] == 1
    assert rec["merge_updated"] == 2 and rec["merge_inserted"] == 0
    assert rec["rows"] == 300
    got = {r["v"] for r in w2.read("t").filter("id in (150, 160)").collect()}
    assert got == {"B", "B2"}

    # an out-of-range source prunes EVERY dir: no probe, pure insert
    rec2 = w2.merge("t", _df(spark, [(999, "z")], ["id", "v"]), ["id"])
    assert rec2["probe_pruned_dirs"] == 3
    assert rec2["rewritten_dirs"] == 0
    assert rec2["merge_inserted"] == 1 and rec2["rows"] == 301


def test_zorder_rewrite_prunes_both_dimensions(spark, tmp_path):
    """Layout A/B: the natural arrival layout (dirs = hour-range
    appends) prunes probes only along time; a Z-order rewrite makes the
    SAME rows prunable along BOTH (user, hour) — the Iceberg
    zorder-compaction payoff, measured through the manifest bounds the
    merge/delete probes actually use."""
    w = StageWriter(spark, str(tmp_path), "rz")
    rows = [
        (u, h, float(u * 64 + h)) for u in range(64) for h in range(64)
    ]
    cols = "user_id long, hour_idx long, value double"
    # arrival layout: 8 hour-range delta dirs (each spans ALL users)
    for k in range(8):
        chunk = [r for r in rows if k * 8 <= r[1] < (k + 1) * 8]
        w.append("ev", spark.createDataFrame(chunk, cols))
    before = w.current_snapshot("ev")
    assert len(before["data_dirs"]) == 8

    rec = w.rewrite_data_files("ev", zorder_by=("user_id", "hour_idx"))
    assert rec["operation"] == "rewrite-zorder"
    assert len(rec["data_dirs"]) == 8

    # identical rows after the rewrite
    got = {(r.user_id, r.hour_idx, r.value) for r in w.read("ev").collect()}
    assert got == set(rows)

    def kept(rec_, src_bounds):
        return sum(
            bool(
                StageWriter._bounds_may_match(
                    (rec_.get("dir_bounds") or {}).get(d), src_bounds
                )
            )
            for d in rec_["data_dirs"]
        )

    # user-only slice: the arrival layout cannot prune AT ALL (every
    # hour dir spans all users); the z-layout prunes most dirs
    user_probe = {"user_id": (8, 15)}
    assert kept(before, user_probe) == 8
    assert kept(rec, user_probe) <= 4
    # 2-D box: still near-minimal under the z-layout (a box may straddle
    # one z-bucket boundary — 2 dirs, vs 1 for a probe aligned with the
    # arrival axis; the win is the user axis above, where the arrival
    # layout keeps everything)
    box = {"user_id": (8, 15), "hour_idx": (8, 15)}
    assert kept(rec, box) <= 2
    # time slice: the z-layout still prunes (no regression to a scan)
    time_probe = {"hour_idx": (8, 15)}
    assert kept(rec, time_probe) < 8
