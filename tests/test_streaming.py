"""Streaming linkage: chunked arrival through Structured Streaming
(foreachBatch + availableNow) must converge to the same clustering as the
one-shot batch pipeline, independent of chunking."""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blink_spark import streaming
from blink_spark.fixtures import ensure_fixture
from blink_spark.pipeline import run_pipeline


def _canon(df):
    return sorted((r["file_id"], r["cluster_id"]) for r in df.collect())


def test_streamed_batches_equal_one_shot(spark, tmp_path):
    pdf = pd.read_parquet(ensure_fixture(0.001))
    input_dir = str(tmp_path / "in")
    os.makedirs(input_dir)
    third = len(pdf) // 3
    pdf.iloc[:third].to_parquet(os.path.join(input_dir, "b1.parquet"), index=False)
    pdf.iloc[third : 2 * third].to_parquet(
        os.path.join(input_dir, "b2.parquet"), index=False
    )
    pdf.iloc[2 * third :].to_parquet(
        os.path.join(input_dir, "b3.parquet"), index=False
    )

    q = streaming.stream_link(
        spark,
        input_dir,
        state_dir=str(tmp_path / "state"),
        checkpoint_dir=str(tmp_path / "ck"),
    )
    q.awaitTermination(600)
    assert not q.isActive

    state_dir = str(tmp_path / "state")
    got = _canon(streaming.latest_clusters(spark, state_dir))

    src = spark.read.parquet(ensure_fixture(0.001))
    expected = _canon(run_pipeline(spark, src)["clusters"])
    assert got == expected

    # --- state-shape contract (VERDICT r1 #2/#3) ---
    # append-only feature index: one dir per batch, sizes sum to the corpus
    # (never a rewritten accumulated copy)
    entries = streaming._read_manifest(state_dir)
    assert [e["version"] for e in entries] == [1, 2, 3]
    # each manifest line names ONLY its own new dir (manifest stays
    # O(batches)); the cumulative index is derived
    assert all("feature_dirs" not in e for e in entries)
    dirs = streaming._feature_dirs(entries)
    assert len(dirs) == 3
    sizes = [spark.read.parquet(d).count() for d in dirs]
    assert sum(sizes) == src.count() and all(s > 0 for s in sizes)
    # discovery is manifest-based and the full state reloads
    st = streaming.latest_state(spark, state_dir)
    assert st.features.count() == src.count()

    # replaying an already-committed micro-batch is a no-op (idempotence)
    before = os.path.getmtime(os.path.join(state_dir, "manifest.jsonl"))
    processor = streaming.make_batch_processor(spark, state_dir)
    processor(spark.read.parquet(ensure_fixture(0.001)), 2)  # batch_id 2 → v3
    assert streaming._read_manifest(state_dir) == entries
    assert os.path.getmtime(os.path.join(state_dir, "manifest.jsonl")) == before


def test_partial_publish_recovers_on_replay(spark, tmp_path):
    """Crash-safety of the manifest-last protocol: orphan data dirs from a
    crash BEFORE the manifest append (the only unsafe window) must be
    ignored by discovery and cleanly overwritten by the replayed batch."""
    import pandas as pd

    pdf = pd.read_parquet(ensure_fixture(0.001)).iloc[:200]
    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir)
    batch = spark.createDataFrame(pdf)

    # simulate the crash: feature + clusters dirs written, NO manifest line
    feat_dir = os.path.join(state_dir, "features", "batch=0")
    incremental_feats = __import__(
        "blink_spark.incremental", fromlist=["batch_features"]
    ).batch_features(batch)
    incremental_feats.write.mode("overwrite").parquet(feat_dir)
    spark.range(1).write.mode("overwrite").parquet(
        os.path.join(state_dir, "clusters_v1")
    )  # garbage partial snapshot

    # discovery must see nothing published
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        streaming.latest_clusters(spark, state_dir)

    # replayed micro-batch rebuilds both dirs and commits
    streaming.make_batch_processor(spark, state_dir)(batch, 0)
    entries = streaming._read_manifest(state_dir)
    assert [e["version"] for e in entries] == [1]
    got = streaming.latest_clusters(spark, state_dir)
    assert got.count() == 200
    assert set(got.columns) == {"file_id", "cluster_id"}


def test_torn_manifest_tail_is_ignored_and_recovered(spark, tmp_path):
    """A crash mid-append leaves a truncated trailing manifest line; it
    must read as uncommitted (not wedge discovery) and the replayed batch
    must commit cleanly over it."""
    import pandas as pd

    pdf = pd.read_parquet(ensure_fixture(0.001)).iloc[:120]
    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir)
    batch = spark.createDataFrame(pdf)

    processor = streaming.make_batch_processor(spark, state_dir)
    processor(batch, 0)
    good = streaming._read_manifest(state_dir)
    assert [e["version"] for e in good] == [1]

    # simulate the torn append of version 2
    with open(os.path.join(state_dir, "manifest.jsonl"), "a") as f:
        f.write('{"version": 2, "batch_id": 1, "feature_d')
    assert streaming._read_manifest(state_dir) == good
    assert streaming._published(state_dir)["version"] == 1

    # replay of batch 1 publishes v2 after the torn fragment
    pdf2 = pd.read_parquet(ensure_fixture(0.001)).iloc[120:240]
    processor(spark.createDataFrame(pdf2), 1)
    entries = streaming._read_manifest(state_dir)
    assert [e["version"] for e in entries] == [1, 2]
    assert streaming.latest_state(spark, state_dir).features.count() == 240


def test_cdc_stream_with_deletes_equals_one_shot_on_net_corpus(spark, tmp_path):
    """CDC retract stream: inserts arrive across micro-batches, later
    batches delete some of them (by key triple only — no payload), and the
    final clustering must equal the one-shot batch pipeline over the NET
    corpus (inserted ∖ deleted). Feature dirs stay immutable: deletes
    commit per-version tombstone files that reads anti-join
    (merge-on-read), and a delete for a never-inserted key is a no-op."""
    import pandas as pd
    import numpy as np

    pdf = pd.read_parquet(ensure_fixture(0.001))
    half = len(pdf) // 2
    b1 = pdf.iloc[:half].copy()
    b2_ins = pdf.iloc[half:].copy()
    for b in (b1, b2_ins):
        b["op"] = "insert"

    # batch 2 also deletes a deterministic slice of batch 1 (key-only
    # events: payload columns nulled) plus one key that never existed
    import hashlib

    key = b1["repo"] + "\0" + b1["path"] + "\0" + b1["commit"]
    del_mask = np.array(
        [int(hashlib.sha256(k.encode()).hexdigest()[0], 16) < 4 for k in key]
    )
    deleted1 = b1.loc[del_mask, ["repo", "path", "commit"]].copy()
    assert 0 < len(deleted1) < len(b1)
    ghost = pd.DataFrame(
        [{"repo": "no-such-repo", "path": "x.py", "commit": "deadbeef"}]
    )
    b2_del = pd.concat([deleted1, ghost], ignore_index=True)
    for c in ("lang", "content", "gold_cluster"):
        b2_del[c] = pd.Series([None] * len(b2_del), dtype="string")
    b2_del["op"] = "delete"
    b2 = pd.concat([b2_ins, b2_del], ignore_index=True)

    # batch 3: deletes only (exercises the no-insert commit path)
    key2 = b2_ins["repo"] + "\0" + b2_ins["path"] + "\0" + b2_ins["commit"]
    del_mask2 = np.array(
        [int(hashlib.sha256(k.encode()).hexdigest()[0], 16) < 2 for k in key2]
    )
    b3 = b2_ins.loc[del_mask2, ["repo", "path", "commit"]].copy()
    assert len(b3) > 0
    for c in ("lang", "content", "gold_cluster"):
        b3[c] = pd.Series([None] * len(b3), dtype="string")
    b3["op"] = "delete"

    input_dir = str(tmp_path / "in")
    os.makedirs(input_dir)
    cols = ["repo", "path", "commit", "lang", "content", "gold_cluster", "op"]
    for i, b in enumerate((b1, b2, b3), 1):
        b[cols].to_parquet(os.path.join(input_dir, f"b{i}.parquet"), index=False)

    q = streaming.stream_link_cdc(
        spark,
        input_dir,
        state_dir=str(tmp_path / "state"),
        checkpoint_dir=str(tmp_path / "ck"),
    )
    q.awaitTermination(600)
    assert not q.isActive

    state_dir = str(tmp_path / "state")
    got = _canon(streaming.latest_clusters(spark, state_dir))

    net = pd.concat(
        [b1.loc[~del_mask], b2_ins.loc[~del_mask2]], ignore_index=True
    ).drop(columns=["op"])
    src = spark.createDataFrame(net)
    expected = _canon(run_pipeline(spark, src)["clusters"])
    assert got == expected

    # merge-on-read shape: all three versions committed; only v2/v3 carry
    # tombstones, feature dirs exist for the two insert batches only and
    # are never rewritten (their row counts still sum to ALL inserts)
    entries = streaming._read_manifest(state_dir)
    assert [e["version"] for e in entries] == [1, 2, 3]
    assert entries[0].get("deletes_path") is None
    assert entries[1]["deletes_path"] and entries[2]["deletes_path"]
    assert entries[2]["feature_dir"] is None  # delete-only version
    dirs = streaming._feature_dirs(entries)
    assert len(dirs) == 2
    assert sum(spark.read.parquet(d).count() for d in dirs) == len(pdf)
    # ...but the reconstructed state anti-joins the tombstones
    st = streaming.latest_state(spark, state_dir)
    assert st.features.count() == len(net)
    # the ghost delete tombstoned nothing
    tomb = spark.read.parquet(entries[1]["deletes_path"])
    assert tomb.count() == len(deleted1)


def test_cdc_update_and_reinsert_semantics(spark, tmp_path):
    """op=update replaces an existing key's payload in place (same
    file_id, new content → old feature row shadowed by version
    sequencing, cluster membership re-derived), and a key deleted in one
    batch then re-inserted in a later one RESURFACES — the tombstone masks
    strictly earlier versions only. Final state must equal the one-shot
    pipeline over the corrected corpus."""
    import hashlib

    import pandas as pd

    pdf = pd.read_parquet(ensure_fixture(0.001))
    b1 = pdf.copy()
    b1["op"] = "insert"

    key = pdf["repo"] + "\0" + pdf["path"] + "\0" + pdf["commit"]
    bucket = key.map(lambda k: int(hashlib.sha256(k.encode()).hexdigest()[0], 16))

    # batch 2: update a slice in place (same key, mutated content) and
    # delete a disjoint slice
    upd_mask = (bucket < 3).to_numpy()
    del_mask = ((bucket >= 3) & (bucket < 5)).to_numpy()
    assert upd_mask.sum() > 0 and del_mask.sum() > 0
    updates = pdf.loc[upd_mask].copy()
    updates["content"] = updates["content"] + "\nmutated_for_cdc_update_test"
    updates["op"] = "update"
    deletes = pdf.loc[del_mask, ["repo", "path", "commit"]].copy()
    for c in ("lang", "content", "gold_cluster"):
        deletes[c] = pd.Series([None] * len(deletes), dtype="string")
    deletes["op"] = "delete"
    b2 = pd.concat([updates, deletes], ignore_index=True)

    # batch 3: re-insert a sub-slice of the deleted keys verbatim
    re_mask = ((bucket >= 3) & (bucket < 4)).to_numpy()
    assert 0 < re_mask.sum() < del_mask.sum()
    b3 = pdf.loc[re_mask].copy()
    b3["op"] = "insert"

    input_dir = str(tmp_path / "in")
    os.makedirs(input_dir)
    cols = ["repo", "path", "commit", "lang", "content", "gold_cluster", "op"]
    for i, b in enumerate((b1, b2, b3), 1):
        b[cols].to_parquet(os.path.join(input_dir, f"b{i}.parquet"), index=False)

    q = streaming.stream_link_cdc(
        spark,
        input_dir,
        state_dir=str(tmp_path / "state"),
        checkpoint_dir=str(tmp_path / "ck"),
    )
    q.awaitTermination(600)
    assert not q.isActive

    # expected corpus: updates applied in place, only the never-re-inserted
    # slice stays deleted
    net = pdf.copy()
    net.loc[upd_mask, "content"] = (
        net.loc[upd_mask, "content"] + "\nmutated_for_cdc_update_test"
    )
    net = net.loc[~(del_mask & ~re_mask)]
    expected = _canon(run_pipeline(spark, spark.createDataFrame(net))["clusters"])

    state_dir = str(tmp_path / "state")
    got = _canon(streaming.latest_clusters(spark, state_dir))
    assert got == expected

    # reconstructed features carry the UPDATED content hashes and the
    # re-inserted keys, not the shadowed/deleted originals
    st = streaming.latest_state(spark, state_dir)
    assert st.features.count() == len(net)
    from blink_spark import ingest as _ing

    upd_ids = _ing.ingest(spark.createDataFrame(pdf.loc[upd_mask])).select(
        "file_id", "content_sha"
    )
    joined = st.features.join(
        upd_ids.withColumnRenamed("content_sha", "old_sha"), "file_id"
    )
    assert joined.count() == int(upd_mask.sum())
    assert joined.filter("content_sha = old_sha").count() == 0


def test_cdc_compaction_resets_dirs_and_preserves_state(spark, tmp_path):
    """compact_cdc_state folds dirs+tombstones into one rewritten dir and
    publishes a reset line: the reconstructed state is unchanged, later
    reads scan only the compacted dir, new batches stack on top, and a
    replayed pre-compaction batch is still skipped."""
    import hashlib

    import pandas as pd

    pdf = pd.read_parquet(ensure_fixture(0.001))
    key = pdf["repo"] + "\0" + pdf["path"] + "\0" + pdf["commit"]
    bucket = key.map(lambda k: int(hashlib.sha256(k.encode()).hexdigest()[0], 16))
    del_mask = (bucket < 3).to_numpy()
    late_mask = (bucket >= 13).to_numpy()
    base = pdf.loc[~late_mask].copy()
    assert del_mask[~late_mask].sum() > 0 and late_mask.sum() > 0

    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir)
    cols = ["repo", "path", "commit", "lang", "content", "gold_cluster", "op"]
    proc = streaming.make_cdc_batch_processor(spark, state_dir)

    b1 = base.copy()
    b1["op"] = "insert"
    proc(spark.createDataFrame(b1[cols]), 0)
    dels = pdf.loc[del_mask & ~late_mask, ["repo", "path", "commit"]].copy()
    for c in ("lang", "content", "gold_cluster"):
        dels[c] = pd.Series([None] * len(dels), dtype="string")
    dels["op"] = "delete"
    proc(spark.createDataFrame(dels[cols]), 1)

    before = _canon(streaming.latest_clusters(spark, state_dir))
    feats_before = sorted(
        r["file_id"]
        for r in streaming.latest_state(spark, state_dir)
        .features.select("file_id")
        .collect()
    )

    rec = streaming.compact_cdc_state(spark, state_dir)
    assert rec["reset"] is True and rec["version"] == 3

    entries = streaming._read_manifest(state_dir)
    # reads now see exactly one dir and zero tombstones
    assert streaming._feature_dirs(entries) == [rec["feature_dir"]]
    assert streaming._delete_paths(entries) == []
    st = streaming.latest_state(spark, state_dir)
    assert (
        sorted(r["file_id"] for r in st.features.select("file_id").collect())
        == feats_before
    )
    assert _canon(streaming.latest_clusters(spark, state_dir)) == before

    # a replayed pre-compaction batch is still a no-op (batch_id probe,
    # not version arithmetic)
    proc(spark.createDataFrame(dels[cols]), 1)
    assert streaming._read_manifest(state_dir) == entries

    # new arrivals stack on the compacted base; final equals one-shot
    b3 = pdf.loc[late_mask].copy()
    b3["op"] = "insert"
    proc(spark.createDataFrame(b3[cols]), 2)
    net = pdf.loc[~del_mask | late_mask]
    expected = _canon(run_pipeline(spark, spark.createDataFrame(net))["clusters"])
    assert _canon(streaming.latest_clusters(spark, state_dir)) == expected
    assert streaming._read_manifest(state_dir)[-1]["version"] == 4
