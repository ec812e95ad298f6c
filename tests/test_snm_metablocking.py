"""Semantic pins for the round-3 blocking additions:

- ``blocking.dense_order_rank`` — ranks must be DENSE (exactly 1..n) and
  order-isomorphic to the string sort of the key column (the property the
  sorted-neighborhood window join depends on; the gapped ``_order_rank``
  cannot provide it).
- ``er_sorted_neighborhood`` — pairs must equal a driver-side recompute:
  sort the rep sort-keys in Python, pair every row with its w-1 successors.
- ``er_meta_blocking`` — CBS weights must equal the per-pair count of
  shared blocks, and the pruning must keep exactly the above-mean edges.
- ``doc_repetition`` — fractions must equal a plain-Python recompute.
"""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from blink_spark import blocking, er_queries, textops

SF_DIR = "/root/testdata/sf0.001"


def test_dense_order_rank_is_dense_and_order_preserving(spark):
    df = spark.createDataFrame(
        [(k,) for k in ["pear", "apple", "fig", "zz", "banana", "kiwi"]], ["k"]
    ).repartition(3)
    ranked = {r.k: r.rnk for r in blocking.dense_order_rank(df, "k", "rnk").collect()}
    in_order = sorted(ranked, key=lambda k: ranked[k])
    assert in_order == sorted(ranked)  # rank order == string order
    assert sorted(ranked.values()) == list(range(1, len(ranked) + 1))  # dense


def _snm_keys(spark):
    reps = blocking.representatives(
        er_queries._with_sig(spark, SF_DIR)
    ).select(
        "file_id",
        F.concat_ws(
            ":",
            F.col("lang"),
            F.col("path_stem"),
            F.element_at(F.split(F.col("path"), "/"), -1),
            F.col("file_id"),
        ).alias("snm_key"),
    )
    return {r.file_id: r.snm_key for r in reps.collect()}


def test_sorted_neighborhood_matches_python_window(spark):
    keys = _snm_keys(spark)
    order = sorted(keys, key=keys.get)
    w = er_queries.SNM_WINDOW
    expected = set()
    for i, a in enumerate(order):
        for d in range(1, w):
            if i + d < len(order):
                b = order[i + d]
                expected.add((min(a, b), max(a, b), d))
    got = {
        (r.left_id, r.right_id, r.rank_distance)
        for r in er_queries.q_sorted_neighborhood(spark, SF_DIR).collect()
    }
    assert got == expected


def test_meta_blocking_weights_and_pruning(spark):
    memb = er_queries._membership(spark, SF_DIR).select("file_id", "block_key")
    blocks: dict[str, list[str]] = {}
    for r in memb.collect():
        blocks.setdefault(r.block_key, []).append(r.file_id)
    weights: Counter = Counter()
    for members in blocks.values():
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1:]:
                weights[(a, b)] += 1
    mean = sum(weights.values()) / len(weights)
    expected = {
        (a, b, n) for (a, b), n in weights.items() if n > mean
    }
    got = {
        (r.left_id, r.right_id, r.cbs_weight)
        for r in er_queries.q_meta_blocking(spark, SF_DIR).collect()
    }
    assert got == expected
    assert 0 < len(got) < len(weights)  # pruning actually removes edges


def test_meta_blocking_is_subset_of_candidate_pairs(spark):
    """Every surviving meta-blocking edge is a candidate pair — WEP prunes
    the blocking graph, it never invents comparisons."""
    cand = {
        (r.left_id, r.right_id)
        for r in er_queries._pairs(spark, SF_DIR).collect()
    }
    kept = {
        (r.left_id, r.right_id)
        for r in er_queries.q_meta_blocking(spark, SF_DIR).collect()
    }
    assert kept <= cand


def test_repetition_matches_python(spark):
    docs = textops._with_tokens(
        textops.load_documents(spark, SF_DIR)
    ).select("doc_id", "tokens").limit(50)
    toks = {r.doc_id: list(r.tokens) for r in docs.collect()}
    out = {
        r.doc_id: r
        for r in textops.q_doc_repetition(spark, SF_DIR).collect()
        if r.doc_id in toks
    }
    for doc_id, tokens in toks.items():
        r = out[doc_id]
        n = len(tokens)
        assert r.n_tokens == n
        if n == 0:
            assert r.dup_token_frac == 0.0 == r.top_token_frac
            continue
        counts = Counter(tokens)
        assert abs(r.dup_token_frac - (n - len(counts)) / n) < 1e-6
        assert abs(r.top_token_frac - max(counts.values()) / n) < 1e-6
        bigrams = [f"{a} {b}" for a, b in zip(tokens, tokens[1:])]
        exp_bg = (
            (len(bigrams) - len(set(bigrams))) / len(bigrams) if bigrams else 0.0
        )
        assert abs(r.dup_bigram_frac - exp_bg) < 1e-6
