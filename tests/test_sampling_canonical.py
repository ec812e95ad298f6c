"""Semantic pins for the round-3 corpus-curation / ER-metric queries:

- ``doc_stratified_sample`` — deterministic hash-threshold sampling must be
  engine-invariant (a pure per-row predicate reproducible outside Spark),
  honor the per-stratum rates, and be monotone in the rate (sample at r1
  is a subset of sample at r2 when r1 <= r2 — unlike ``df.sample()``,
  whose kept set shifts with seed AND partitioning).
- ``doc_canonical_pick`` — one canonical per near-dup cluster, and it is
  the argmax-quality member (tie: lowest doc_id).
- ``er_bcubed`` — on the fixture corpus the clustering is exact
  (pairwise F1 = 1.0), so B-cubed precision/recall/F1 must all be 1.0.
- ``er_reduction_ratio`` — consistency bounds of the blocking census.
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blink_spark import er_queries, textops

SF_DIR = "/root/testdata/sf0.001"


def test_stratified_sample_matches_driver_side_recompute(spark):
    """The kept set must be reproducible with plain hashlib on the driver —
    the definition of engine/partitioning invariance."""
    kept = {
        (r.doc_id, r.lang)
        for r in textops.q_doc_stratified_sample(spark, SF_DIR).collect()
    }
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang"
    )
    expected = set()
    for r in docs.collect():
        rate = textops.SAMPLE_RATES.get(r.lang, textops.SAMPLE_DEFAULT_RATE)
        bucket = hashlib.md5(f"{r.doc_id}:{r.lang}".encode()).hexdigest()[:8]
        if bucket < textops._rate_threshold_hex(rate):
            expected.add((r.doc_id, r.lang))
    assert kept == expected
    assert 0 < len(kept) < docs.count()


def test_stratified_sample_rate_monotone(spark):
    """rate r1 <= r2 ⇒ sample(r1) ⊆ sample(r2): widening never resamples."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang"
    )
    buckets = {
        r.doc_id: hashlib.md5(f"{r.doc_id}:{r.lang}".encode()).hexdigest()[:8]
        for r in docs.collect()
    }
    lo = {d for d, b in buckets.items() if b < textops._rate_threshold_hex(0.2)}
    hi = {d for d, b in buckets.items() if b < textops._rate_threshold_hex(0.5)}
    assert lo < hi  # strict: monotone and actually grows on this corpus


def test_stratified_sample_rates_are_honored(spark):
    """Per-stratum keep fraction lands near its configured rate (md5 is
    uniform; tolerance sized for the sf0.001 stratum counts)."""
    out = textops.q_doc_stratified_sample(spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    totals = {r.lang: r.n for r in docs.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    kept = {r.lang: r.n for r in out.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    for lang, total in totals.items():
        if total < 20:
            continue  # too small for a rate assertion
        rate = textops.SAMPLE_RATES.get(lang, textops.SAMPLE_DEFAULT_RATE)
        frac = kept.get(lang, 0) / total
        assert abs(frac - rate) < 0.35, (lang, frac, rate, total)


def test_canonical_pick_is_cluster_argmax(spark):
    clusters = {
        r.doc_id: r.cluster_id
        for r in textops.q_doc_dup_clusters(spark, SF_DIR).collect()
    }
    quality = {
        r.doc_id: r.quality for r in textops.q_doc_quality(spark, SF_DIR).collect()
    }
    picks = textops.q_doc_canonical_pick(spark, SF_DIR).collect()

    members: dict[str, list[str]] = {}
    for doc_id, cid in clusters.items():
        members.setdefault(cid, []).append(doc_id)

    assert {p.cluster_id for p in picks} == set(members)
    assert len(picks) == len(members)  # exactly one canonical per cluster
    for p in picks:
        docs = members[p.cluster_id]
        best = min(docs, key=lambda d: (-quality[d], d))
        assert p.canonical_doc_id == best
        assert p.n_members == len(docs)
        assert abs(p.quality - quality[best]) < 1e-9


def test_bcubed_is_perfect_on_exact_clustering(spark):
    row = er_queries.q_bcubed(spark, SF_DIR).collect()[0]
    assert row.bcubed_precision == 1.0
    assert row.bcubed_recall == 1.0
    assert row.bcubed_f1 == 1.0
    assert row.n_records > 0


def test_reduction_ratio_bounds(spark):
    row = er_queries.q_reduction_ratio(spark, SF_DIR).collect()[0]
    assert row.n_reps <= row.n_records
    assert row.n_candidate_pairs <= row.n_possible_pairs
    assert 0.0 < row.reduction_ratio < 1.0
