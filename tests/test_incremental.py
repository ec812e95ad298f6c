"""Incremental linkage equivalence: linking batch-by-batch must produce
the same clusters as linking everything at once (the fork's KBP loop,
``scripts/kbp_simulation.py:316-366``), including cluster MERGES bridged
by a late-arriving file and NIL-founded new clusters.

Also pins the state-reuse contract: batch 2 runs the feature kernels
(tokenize → minhash → embedding) over the NEW rows only, and a compacted
state links new mentions to grown clusters via each cluster's
representative (``scripts/kbp_simulation.py:227-251``).
"""

from __future__ import annotations

import os
import sys

import pandas as pd
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blink_spark import incremental
from blink_spark.fixtures import ensure_fixture
from blink_spark.pipeline import run_pipeline


def _canon(clusters):
    """Cluster ids are min(file_id) per component → directly comparable."""
    return sorted((r["file_id"], r["cluster_id"]) for r in clusters.collect())


def test_two_batch_equals_one_shot(spark):
    src = spark.read.parquet(ensure_fixture(0.001)).persist()
    one_shot = _canon(run_pipeline(spark, src)["clusters"])

    # deterministic split: alternate rows by stable hash of the commit
    b1 = src.filter(F.pmod(F.xxhash64("commit"), F.lit(2)) == 0).persist()
    b2 = src.filter(F.pmod(F.xxhash64("commit"), F.lit(2)) == 1).persist()
    assert b1.count() > 0 and b2.count() > 0

    s1 = incremental.link_batch(None, b1).persist()
    s2 = incremental.link_batch(s1, b2)
    assert _canon(s2.clusters) == one_shot


def test_first_batch_matches_pipeline(spark):
    src = spark.read.parquet(ensure_fixture(0.001))
    via_inc = _canon(incremental.link_batch(None, src).clusters)
    via_pipe = _canon(run_pipeline(spark, src)["clusters"])
    assert via_inc == via_pipe


def test_batch2_runs_kernels_on_new_rows_only(spark, monkeypatch):
    """The scale contract from VERDICT r1: linking batch 2 must not
    re-ingest/re-embed the accumulated corpus. batch_features is the only
    entry point to the feature kernels, so counting the rows fed to it
    during the batch-2 link is a structural proof."""
    src = spark.read.parquet(ensure_fixture(0.001)).persist()
    b1 = src.filter(F.pmod(F.xxhash64("commit"), F.lit(2)) == 0).persist()
    b2 = src.filter(F.pmod(F.xxhash64("commit"), F.lit(2)) == 1).persist()
    n_b2 = b2.count()

    fed: list[int] = []
    orig = incremental.batch_features

    def counting(source):
        fed.append(source.count())
        return orig(source)

    monkeypatch.setattr(incremental, "batch_features", counting)
    s1 = incremental.link_batch(None, b1).persist()
    s1.features.count()  # materialize so batch-2 actions cannot re-run b1 lineage
    s1.clusters.count()

    fed.clear()
    s2 = incremental.link_batch(s1, b2)
    s2.clusters.count()
    assert fed == [n_b2], f"batch-2 link fed {fed} rows to the kernels, want [{n_b2}]"


def test_links_to_grown_cluster_via_representative(spark):
    """Compact the state to one representative feature row per cluster
    (medoid), then link a near-duplicate of a representative's content:
    it must join the existing cluster through the representative alone —
    all other member features are gone from the index."""
    src = spark.read.parquet(ensure_fixture(0.001)).persist()
    s1 = incremental.link_batch(None, src).persist()
    compact = incremental.compact_state(s1, mode="medoid").persist()

    # a genuinely multi-member cluster and its surviving representative
    sizes = (
        s1.clusters.groupBy("cluster_id").agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 3)
    )
    target = sizes.limit(1).collect()[0]["cluster_id"]
    rep_fid = (
        compact.features.join(
            s1.clusters.filter(F.col("cluster_id") == target), "file_id"
        )
        .select("file_id")
        .collect()[0]["file_id"]
    )

    # rebuild the representative's raw source row, mutate it into a fresh
    # near-duplicate "mention" (new commit → new file_id, +1 comment line)
    from blink_spark import ingest

    ing = ingest.ingest(src)
    rep_src = (
        ing.filter(F.col("file_id") == rep_fid)
        .select("repo", "path", "commit", "lang", "content", "gold_cluster")
        .collect()[0]
    )
    new_row = pd.DataFrame(
        [
            {
                "repo": rep_src["repo"],
                "path": rep_src["path"],
                "commit": "f" * 40,
                "lang": rep_src["lang"],
                "content": rep_src["content"] + "\n# trailing incremental note",
                "gold_cluster": rep_src["gold_cluster"],
            }
        ]
    )
    b2 = spark.createDataFrame(new_row)

    s2 = incremental.link_batch(compact, b2)
    new_fid = ingest.ingest(b2).select("file_id").collect()[0]["file_id"]
    got = {
        r["file_id"]: r["cluster_id"] for r in s2.clusters.collect()
    }
    prior = {r["file_id"]: r["cluster_id"] for r in s1.clusters.collect()}
    # cluster ids are min(file_id) per component, so the id itself may move
    # to the new file — compare memberships, not labels
    target_members = {fid for fid, cid in prior.items() if cid == target}
    new_cid = got[new_fid]
    grown = {fid for fid, cid in got.items() if cid == new_cid}
    assert grown == target_members | {new_fid}, (
        f"new mention's cluster {sorted(grown)[:4]}… != grown target cluster"
    )
    # every other cluster's membership is preserved
    def partition(assign):
        out: dict[str, set] = {}
        for fid, cid in assign.items():
            out.setdefault(cid, set()).add(fid)
        return {frozenset(v) for v in out.values()}

    assert partition(got) - {frozenset(grown)} == partition(prior) - {
        frozenset(target_members)
    }


def test_cluster_representatives_column_contract(spark):
    """Medoid representatives must carry FEATURE_COLS + cluster_id exactly
    once; a duplicated cluster_id column makes any downstream
    select/groupBy on it raise AMBIGUOUS_REFERENCE."""
    # orderBy before limit: a bare LIMIT over a parquet scan takes whichever
    # partitions respond first, so the 120-row sample is scheduling-dependent
    # (observed as a once-per-suite flake under heavy host contention)
    src = (
        spark.read.parquet(ensure_fixture(0.001))
        .orderBy("repo", "path", "commit")
        .limit(120)
    )
    s = incremental.link_batch(None, src)
    reps = incremental.cluster_representatives(
        s.features, s.clusters, mode="medoid"
    )
    assert sorted(reps.columns) == sorted(
        [*incremental.FEATURE_COLS, "cluster_id"]
    )
    # one representative per cluster, addressable by name
    assert (
        reps.select("cluster_id").distinct().count()
        == reps.count()
        == s.clusters.select("cluster_id").distinct().count()
    )


def test_snapshot_link_store_resumes_across_restart(spark, tmp_path):
    """KBP state as snapshot tables: batch 1 committed, process 'restarts'
    (fresh StageWriter over the same dir), batch 2 linked from the LOADED
    state — final clusters equal the one-shot run, features were
    fast-appended (delta only), and the cluster commit was a CoW MERGE
    that shipped only changed assignments."""
    from blink_spark.checkpoint import StageWriter
    from blink_spark.incremental import SnapshotLinkStore

    src = spark.read.parquet(ensure_fixture(0.001)).persist()
    one_shot = _canon(run_pipeline(spark, src)["clusters"])
    b1 = src.filter(F.pmod(F.xxhash64("commit"), F.lit(2)) == 0).persist()
    b2 = src.filter(F.pmod(F.xxhash64("commit"), F.lit(2)) == 1).persist()

    store1 = SnapshotLinkStore(StageWriter(spark, str(tmp_path), "kbp"))
    store1.link_and_commit(b1)

    # restart: a brand-new writer loads the committed snapshots from disk
    store2 = SnapshotLinkStore(StageWriter(spark, str(tmp_path), "kbp"))
    final = store2.link_and_commit(b2)
    assert _canon(final.clusters) == one_shot

    flog = store2.writer.snapshots(SnapshotLinkStore.FEATURES)
    assert [r["operation"] for r in flog] == ["append", "fast-append"]
    assert flog[-1]["delta_rows"] == b2.count()
    assert flog[-1]["rows"] == src.count()

    clog = store2.writer.snapshots(SnapshotLinkStore.CLUSTERS)
    assert [r["operation"] for r in clog] == ["overwrite", "merge"]
    m = clog[-1]
    # every batch-2 file is a fresh assignment row (insert); and batch 2
    # bridges batch-1 clusters, so the merge must also UPDATE existing
    # assignments, not just insert the new files
    assert m["merge_inserted"] == b2.count()
    assert m["merge_updated"] > 0
    assert m["rows"] == src.count()
