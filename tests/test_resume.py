"""Checkpoint/resume semantics (SURVEY.md §2.10 I4): a run killed mid-
pipeline must, on re-run, skip completed stages and produce the identical
final clustering — the reference's resume-if-done idiom
(``scripts/feature_ablation_study.py:906-915``) promoted to stage tables.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blink_spark.checkpoint import StageWriter
from blink_spark.fixtures import ensure_fixture
from blink_spark.pipeline import PipelineConfig, run_pipeline


class _Boom(RuntimeError):
    pass


def _cluster_set(df):
    rows = df.collect()
    return sorted((r["file_id"], r["cluster_id"]) for r in rows)


def test_kill_and_resume(spark, tmp_path):
    src = spark.read.parquet(ensure_fixture(0.001))
    ckdir = str(tmp_path / "ck")

    # reference run: no checkpointing
    expected = _cluster_set(run_pipeline(spark, src)["clusters"])

    # killed run: die after the 4th materialized stage
    orig = StageWriter.materialize
    calls = {"n": 0}

    def dying(self, stage, build):
        calls["n"] += 1
        if calls["n"] > 4:
            raise _Boom(stage)
        return orig(self, stage, build)

    StageWriter.materialize = dying
    try:
        with pytest.raises(_Boom):
            run_pipeline(
                spark, src, PipelineConfig(checkpoint_dir=ckdir, run_id="r1")
            )
    finally:
        StageWriter.materialize = orig

    w = StageWriter(spark, ckdir, "r1")
    done_before = {m["stage"]: m["finished_utc_ns"] for m in w.manifest()}
    assert len(done_before) == 4

    # resumed run: completes, and the first 4 stages were NOT recomputed
    tables = run_pipeline(
        spark, src, PipelineConfig(checkpoint_dir=ckdir, run_id="r1")
    )
    got = _cluster_set(tables["clusters"])
    assert got == expected

    w2 = StageWriter(spark, ckdir, "r1")
    after = {m["stage"]: m["finished_utc_ns"] for m in w2.manifest()}
    for stage, ts in done_before.items():
        assert after[stage] == ts, f"stage {stage} was recomputed on resume"
    assert len(after) > len(done_before)


def test_rerun_converged_is_noop(spark, tmp_path):
    """Re-running a fully completed run touches nothing (idempotence)."""
    src = spark.read.parquet(ensure_fixture(0.001))
    ckdir = str(tmp_path / "ck2")
    conf = PipelineConfig(checkpoint_dir=ckdir, run_id="r2")
    first = _cluster_set(run_pipeline(spark, src, conf)["clusters"])
    w = StageWriter(spark, ckdir, "r2")
    stamps = {m["stage"]: m["finished_utc_ns"] for m in w.manifest()}

    second = _cluster_set(run_pipeline(spark, src, conf)["clusters"])
    assert second == first
    w2 = StageWriter(spark, ckdir, "r2")
    assert {m["stage"]: m["finished_utc_ns"] for m in w2.manifest()} == stamps
