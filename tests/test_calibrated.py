"""Calibrated-pipeline path: train the spark.ml combiner on a labeled
corpus, link with match_p_ml, and reach the same F1=1.0 as the
fixed-weight path (the trained-NIL-predictor serving flow).

Plus training hygiene (M2/M3): seeded undersampling + holdout split, and
a label-noise evaluation where a broken calibration would actually fail —
the fixture corpus alone is perfectly separable, so F1=1.0 there is a
weak test of M1 (VERDICT r1)."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blink_spark import evaluate, scoring
from blink_spark.fixtures import ensure_fixture
from blink_spark.pipeline import evaluate_run, run_calibrated, run_pipeline


def test_run_calibrated_self_trained(spark):
    src = spark.read.parquet(ensure_fixture(0.001))
    tables = run_calibrated(spark, src)
    metrics = evaluate_run(tables, src)
    assert metrics["f1"] == 1.0
    assert metrics["sha_invariant_violations"] == 0
    assert "match_p_ml" in tables["scored_pairs_ml"].columns


def _labeled_scored(spark):
    src = spark.read.parquet(ensure_fixture(0.001))
    tables = run_pipeline(spark, src)
    gold = tables["ingested"].select("file_id", "gold_cluster")
    return evaluate.labeled_pairs(
        tables["scored_pairs"].select("left_id", "right_id", "block_key"), gold
    ).join(tables["scored_pairs"], ["left_id", "right_id", "block_key"])


def test_train_test_split_undersamples_and_holds_out(spark):
    labeled = _labeled_scored(spark).persist()
    n_pos = labeled.filter("is_match").count()
    train, hold = scoring.train_test_split(labeled, max_neg_per_pos=2.0)
    train.persist(), hold.persist()
    tr_pos = train.filter("label = 1.0").count()
    tr_neg = train.filter("label = 0.0").count()
    ho = hold.count()
    # majority class sampled down to ~ratio (Bernoulli sampling → slack)
    assert tr_neg <= 3.0 * tr_pos
    assert 0 < ho < labeled.count() / 2
    assert tr_pos > 0.5 * n_pos  # positives kept (only split removes them)


def test_ablation_study_grid(spark):
    """Feature-ablation grid (``scripts/feature_ablation_study.py`` main
    loop): one row per feature family, shared undersample/split across
    fits. On the fixture corpus the path/basename string distances alone
    carry no match signal (filenames are random shas), while any subset
    containing shingle/embedding features separates perfectly — the grid
    must expose exactly that contrast."""
    labeled = _labeled_scored(spark)
    grid = {r["feature_set"]: r.asDict()
            for r in scoring.ablation_study(labeled).collect()}
    assert set(grid) == set(scoring.ABLATION_GROUPS)
    ho = {r["n_holdout"] for r in grid.values()}
    assert len(ho) == 1  # same holdout rows for every subset
    assert grid["full"]["f1"] == 1.0
    assert grid["no_string"]["f1"] == 1.0
    assert grid["string_only"]["f1"] < 0.5, grid["string_only"]


def test_calibrated_holdout_under_label_noise(spark):
    """Flip a deterministic ~10% of labels: the combiner trained on noisy
    labels must still generalize (holdout F1 well above the all-positive
    baseline) but can no longer be trivially perfect — this assertion
    fails if calibration breaks (e.g. unscaled features, degenerate
    weights), unlike F1=1.0 on the separable fixture."""
    labeled = _labeled_scored(spark)
    noisy = labeled.withColumn(
        "is_match",
        F.when(
            F.pmod(F.xxhash64("left_id", "right_id"), F.lit(10)) == 0,
            ~F.col("is_match"),
        ).otherwise(F.col("is_match")),
    ).persist()
    train, hold = scoring.train_test_split(noisy)
    model = scoring.fit_combiner(train)
    m = scoring.holdout_metrics(model, hold)
    assert m["n_holdout"] > 50
    # all-positive baseline on the undersampled holdout
    pos = m["tp"] + m["fn"]
    base_p = pos / m["n_holdout"]
    base_f1 = 2 * base_p / (base_p + 1.0)
    assert m["f1"] >= base_f1 + 0.1, (m, base_f1)
    # ~10% of labels are wrong, so a faithful model cannot be perfect
    assert m["f1"] < 1.0, m
