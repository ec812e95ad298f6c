"""Calibrated-pipeline path: train the spark.ml combiner on a labeled
corpus, link with match_p_ml, and reach the same F1=1.0 as the
fixed-weight path (the trained-NIL-predictor serving flow)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blink_spark.fixtures import ensure_fixture
from blink_spark.pipeline import evaluate_run, run_calibrated


def test_run_calibrated_self_trained(spark):
    src = spark.read.parquet(ensure_fixture(0.001))
    tables = run_calibrated(spark, src)
    metrics = evaluate_run(tables, src)
    assert metrics["f1"] == 1.0
    assert metrics["sha_invariant_violations"] == 0
    assert "match_p_ml" in tables["scored_pairs_ml"].columns
