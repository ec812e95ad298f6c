"""Blocking-stage invariants: salted-join semantic invariance, canonical
pair order, exact-dup star shape, rep-map consistency (SURVEY.md §5)."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blink_spark import blocking
from blink_spark.fixtures import ensure_fixture
from blink_spark.ingest import ingest


def _membership(spark):
    src = spark.read.parquet(ensure_fixture(0.001))
    with_sig = blocking.with_lsh_columns(ingest(src))
    reps = blocking.representatives(with_sig)
    return blocking.block_membership(
        reps.select("file_id", "lang", "path_stem", "band_keys")
    ).select("file_id", "block_key")


def _pairset(df):
    return sorted(
        (r["left_id"], r["right_id"], r["block_key"]) for r in df.collect()
    )


def test_salting_is_semantically_invisible(spark):
    """Pairs from the salted replication join (tiny cap forces every block
    through it) equal pairs from the direct join (huge cap)."""
    m = _membership(spark).persist()
    direct = _pairset(blocking.candidate_pairs(m, block_cap=10**9))
    salted = _pairset(blocking.candidate_pairs(m, block_cap=5))
    assert salted == direct
    assert len(direct) > 0


def test_pairs_canonical_and_unique(spark):
    m = _membership(spark)
    pairs = blocking.candidate_pairs(m).persist()
    assert pairs.filter(F.col("left_id") >= F.col("right_id")).count() == 0
    assert (
        pairs.groupBy("left_id", "right_id").count().filter("count > 1").count()
        == 0
    )


def test_exact_dup_star_shape(spark):
    """Every sha group of size n yields exactly n−1 edges from its min id."""
    src = spark.read.parquet(ensure_fixture(0.001))
    ing = ingest(src).persist()
    edges = blocking.exact_dup_edges(ing)
    n_files = ing.count()
    n_groups = ing.select("content_sha").distinct().count()
    assert edges.count() == n_files - n_groups
    # left side is always the group minimum → never appears as a right side
    assert (
        edges.join(
            edges.select(F.col("right_id").alias("left_id")), "left_id", "left_semi"
        ).count()
        == 0
    )


def test_dedup_is_hash_aggregate_and_min_key_matches_string_min(spark):
    """The pair dedup must stay a whole-stage-codegen HashAggregate (min
    over longs) — a min over the block_key STRING falls back to
    SortAggregate, which double-sorts the O(bands × Σ block²) pre-dedup
    union and dominated the blocking stage at sf0.25 — and the rank
    indirection must still select exactly min(block_key) per pair."""
    m = _membership(spark).persist()
    pairs = blocking.candidate_pairs(m)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "SortAggregate" not in plan
    assert "HashAggregate" in plan

    # independent recompute of min(block_key) straight from membership
    l, r = m.alias("l"), m.alias("r")
    naive = (
        l.join(r, "block_key")
        .filter(F.col("l.file_id") < F.col("r.file_id"))
        .groupBy(
            F.col("l.file_id").alias("left_id"),
            F.col("r.file_id").alias("right_id"),
        )
        .agg(F.min("block_key").alias("block_key"))
    )
    assert _pairset(pairs) == _pairset(naive)


def test_order_rank_preserves_string_order(spark):
    """file_rank/key_rank comparisons must agree with string comparisons —
    canonical pair orientation and the min-key selection both ride on it."""
    m = _membership(spark)
    fd = blocking._ranked_files(m)
    rows = sorted(
        (r["file_id"], r["file_rank"]) for r in fd.collect()
    )
    ranks = [rk for _, rk in rows]
    assert ranks == sorted(ranks)
    assert len(set(ranks)) == len(ranks)


def test_rep_map_consistent_with_representatives(spark):
    src = spark.read.parquet(ensure_fixture(0.001))
    with_sig = blocking.with_lsh_columns(ingest(src)).persist()
    reps = blocking.representatives(with_sig).select("file_id")
    rm = blocking.rep_map(with_sig)
    assert sorted(r["file_id"] for r in reps.collect()) == sorted(
        r["rep_id"] for r in rm.select("rep_id").distinct().collect()
    )
    # reps map to themselves
    assert rm.filter(
        (F.col("file_id") == F.col("rep_id"))
    ).count() == reps.count()
