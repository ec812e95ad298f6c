"""Bucketed feature join: same results as the broadcast path, with the
bucketed scan visible in the plan and fewer exchanges than an unbucketed
sort-merge join — the 10^12-row strategy where features outgrow broadcast.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blink_spark import blocking, bucketing, scoring
from blink_spark.fixtures import ensure_fixture
from blink_spark.ingest import ingest


@pytest.fixture()
def no_broadcast(spark):
    """Force sort-merge joins so the bucketing effect is observable."""
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ]
    saved = {}
    for k in keys:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, "-1")
    yield
    for k, v in saved.items():
        if v is not None:
            spark.conf.set(k, v)


def _stages(spark):
    src = spark.read.parquet(ensure_fixture(0.001))
    with_sig = blocking.with_lsh_columns(ingest(src)).persist()
    reps = blocking.representatives(with_sig)
    pairs = blocking.candidate_pairs(
        blocking.block_membership(
            reps.select("file_id", "lang", "path_stem", "band_keys")
        ).select("file_id", "block_key")
    ).persist()
    features = scoring.with_embedding(with_sig).select(
        "file_id", "path", "content_sha", "shingle_hashes", "embedding"
    )
    return pairs, features


def _pairset(df):
    return sorted(
        (r["left_id"], r["right_id"], round(r["match_p"], 6))
        for r in df.select("left_id", "right_id", "match_p").collect()
    )


def test_bucketed_join_matches_broadcast_and_prunes_exchanges(
    spark, no_broadcast
):
    pairs, features = _stages(spark)
    bucketing.write_bucketed_features(features, "feat_bucketed", n_buckets=4)
    feat_b = bucketing.read_features(spark, "feat_bucketed")

    scored_bucketed = scoring.score_pairs(pairs, feat_b, broadcast_features=False)
    scored_plain = scoring.score_pairs(pairs, features, broadcast_features=False)
    scored_bcast = scoring.score_pairs(pairs, features, broadcast_features=True)

    # capture the INITIAL plans before any action: once a query executes,
    # executedPlan() returns the AQE final plan, which is not comparable
    # exchange-for-exchange against another query's initial plan
    plan_b = scored_bucketed._jdf.queryExecution().executedPlan().toString()
    plan_p = scored_plain._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan_b
    # the planner exploits the bucketing: no Exchange sits on top of any
    # bucketed feature scan (the wide side never reshuffles) ...
    assert bucketing.feature_side_shuffles(scored_bucketed) == 0
    # ... which makes the bucketed plan strictly cheaper in exchanges
    assert plan_b.count("Exchange hashpartitioning") < plan_p.count(
        "Exchange hashpartitioning"
    )

    got_b = _pairset(scored_bucketed)
    assert got_b == _pairset(scored_bcast)
