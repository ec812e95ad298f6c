"""Pins for the doc/emb near-dup band-join discipline (shared with the ER
blocking stage): the pre-dedup pair union must be fixed-width (no payload
arrays through the band self-join), hot bands must go through the
capped+salted replication join, and the salting must be semantically
invisible — the distinct pair set equals the naive uncapped band join's."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blink_spark import blocking, textops

# payload columns that must never ride the pre-dedup pair shuffle
_PAYLOADS = {
    "sh_hashes", "g_h", "embedding",
    "l_h", "r_h", "l_e", "r_e",
    "l_sh_hashes", "r_sh_hashes", "l_g_h", "r_g_h",
    "l_embedding", "r_embedding",
}


def _long_membership(spark, n_docs=40, hot_block_members=25):
    """Synthetic (file_id, block_key) membership with one hot block."""
    rows = []
    for i in range(n_docs):
        rows.append((i, f"bk{i % 7}"))
        rows.append((i, f"bk{(i * 3) % 5}"))
    for i in range(hot_block_members):
        rows.append((i, "hot"))
    return spark.createDataFrame(rows, "file_id long, block_key string")


def _pairset(df):
    return sorted((r["left_id"], r["right_id"]) for r in df.collect())


def test_banded_salting_is_semantically_invisible(spark):
    m = _long_membership(spark).persist()
    naive = (
        m.alias("l")
        .join(m.alias("r"), "block_key")
        .filter(F.col("l.file_id") < F.col("r.file_id"))
        .select(
            F.col("l.file_id").alias("left_id"),
            F.col("r.file_id").alias("right_id"),
        )
        .distinct()
    )
    direct = _pairset(blocking.banded_pairs(m, block_cap=10**9))
    salted = _pairset(blocking.banded_pairs(m, block_cap=4))
    assert direct == _pairset(naive)
    assert salted == direct
    assert len(direct) > 0


def test_banded_pairs_canonical_unique_and_thin(spark):
    m = _long_membership(spark)
    pairs = blocking.banded_pairs(m, block_cap=4).persist()
    assert pairs.columns == ["left_id", "right_id"]
    assert pairs.filter(F.col("left_id") >= F.col("right_id")).count() == 0
    assert pairs.count() == pairs.select("left_id", "right_id").distinct().count()


def _iter_nodes(node):
    yield node
    for i in range(node.children().size()):
        yield from _iter_nodes(node.children().apply(i))


def _output_names(node):
    try:
        out = node.output()
    except Exception:
        return []
    return [out.apply(i).name() for i in range(out.size())]


def _dedup_subtrees(plan):
    """Aggregate nodes whose output is exactly the canonical pair — the
    banded_pairs distinct."""
    for node in _iter_nodes(plan):
        if node.nodeName() == "Aggregate" and _output_names(node) == [
            "left_id",
            "right_id",
        ]:
            yield node


def _assert_no_payload_below_dedup(df):
    plan = df._jdf.queryExecution().optimizedPlan()
    dedups = list(_dedup_subtrees(plan))
    assert dedups, "pair-dedup Aggregate not found in optimized plan"
    for agg in dedups:
        for node in _iter_nodes(agg):
            if "Join" in node.nodeName():
                bad = _PAYLOADS.intersection(_output_names(node))
                assert not bad, (
                    f"payload {bad} rides the pre-dedup band join "
                    f"({node.nodeName()})"
                )


def test_doc_near_dup_band_join_is_payload_free(spark):
    sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    for q in (
        textops.q_doc_near_dup_pairs,
        textops.q_doc_ngram_jaccard,
        textops.q_doc_emb_near_dup,
    ):
        df = q(spark, sf)
        _assert_no_payload_below_dedup(df)
        # dedup must stay a whole-stage-codegen HashAggregate over longs
        phys = df._jdf.queryExecution().executedPlan().toString()
        assert "SortAggregate" not in phys
