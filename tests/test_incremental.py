"""Incremental linkage equivalence: linking batch-by-batch must produce
the same clusters as linking everything at once (the fork's KBP loop,
``scripts/kbp_simulation.py:316-366``), including cluster MERGES bridged
by a late-arriving file and NIL-founded new clusters."""

from __future__ import annotations

import os
import sys

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

    c1 = incremental.link_batch(None, None, b1).persist()
    merged = incremental.link_batch(b1, c1, b2)
    assert _canon(merged) == one_shot


def test_first_batch_matches_pipeline(spark):
    src = spark.read.parquet(ensure_fixture(0.001))
    via_inc = _canon(incremental.link_batch(None, None, src))
    via_pipe = _canon(run_pipeline(spark, src)["clusters"])
    assert via_inc == via_pipe
