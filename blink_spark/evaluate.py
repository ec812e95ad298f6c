"""Stage E — evaluation (SURVEY.md §2.5 A2, A8-A9).

Pairwise precision/recall/F1 on labeled same-block pairs — the driver's
headline metric (``BASELINE.json``: F1 ≥ 0.99). Analog of the reference's
benchmark accuracy roll-up (``blink/main_dense.py:634-679``) and classifier
reports (``scripts/feature_ablation_study.py:997-1026``), computed as
confusion counts via groupBy — never a driver-side loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def labeled_pairs(candidate_pairs: DataFrame, gold: DataFrame) -> DataFrame:
    """candidate_pairs(left_id,right_id,block_key) × gold(file_id,gold_cluster)
    → labeled pairs (FIXTURES.md §3): is_match = same gold cluster."""
    gl = gold.select(F.col("file_id").alias("left_id"), F.col("gold_cluster").alias("g_l"))
    gr = gold.select(F.col("file_id").alias("right_id"), F.col("gold_cluster").alias("g_r"))
    return (
        candidate_pairs.join(gl, "left_id")
        .join(gr, "right_id")
        .withColumn("is_match", F.col("g_l") == F.col("g_r"))
        .select("left_id", "right_id", "block_key", "is_match")
    )


def predicted_pair_labels(pairs: DataFrame, clusters: DataFrame) -> DataFrame:
    """Adds pred_match = (same predicted cluster_id) to a pair table."""
    cl = clusters.select(F.col("file_id").alias("left_id"), F.col("cluster_id").alias("c_l"))
    cr = clusters.select(F.col("file_id").alias("right_id"), F.col("cluster_id").alias("c_r"))
    return (
        pairs.join(cl, "left_id")
        .join(cr, "right_id")
        .withColumn("pred_match", F.col("c_l") == F.col("c_r"))
        .drop("c_l", "c_r")
    )


def pairwise_confusion(labeled: DataFrame) -> DataFrame:
    """(is_match, pred_match) → counts. One groupBy, map-side combined."""
    return labeled.groupBy("is_match", "pred_match").agg(F.count("*").alias("n"))


def pairwise_f1(labeled: DataFrame) -> dict[str, float]:
    rows = pairwise_confusion(labeled).collect()
    tp = fp = fn = tn = 0
    for r in rows:
        if r["is_match"] and r["pred_match"]:
            tp = r["n"]
        elif r["is_match"] and not r["pred_match"]:
            fn = r["n"]
        elif not r["is_match"] and r["pred_match"]:
            fp = r["n"]
        else:
            tn = r["n"]
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "tp": tp, "fp": fp, "fn": fn, "tn": tn,
        "precision": precision, "recall": recall, "f1": f1,
    }


def gold_positive_pairs(gold: DataFrame) -> DataFrame:
    """All same-gold-cluster pairs (canonical order) — blocking-recall
    denominator. Quadratic per cluster; fixture clusters are small."""
    a = gold.select(F.col("gold_cluster"), F.col("file_id").alias("left_id"))
    b = gold.select(F.col("gold_cluster"), F.col("file_id").alias("right_id"))
    return (
        a.join(b, "gold_cluster")
        .filter(F.col("left_id") < F.col("right_id"))
        .select("left_id", "right_id")
    )


def blocking_recall(candidate_pairs: DataFrame, gold: DataFrame) -> float:
    """Fraction of gold-positive pairs surviving blocking — the recall@k
    analog (``blink/main_dense.py:536-553``), where blocking plays the role
    of bi-encoder top-k retrieval."""
    pos = gold_positive_pairs(gold)
    total = pos.count()
    if total == 0:
        return 1.0
    hit = pos.join(
        candidate_pairs.select("left_id", "right_id").distinct(),
        ["left_id", "right_id"],
        "left_semi",
    ).count()
    return hit / total
