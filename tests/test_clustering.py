"""Connected-components unit tests on hand-computed graphs (SURVEY.md §5)."""

from __future__ import annotations

from blink_spark.clustering import connected_components, large_star, small_star


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["left_id", "right_id"])


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], ["file_id"])


def _result(df):
    return {r["file_id"]: r["cluster_id"] for r in df.collect()}


def test_chain(spark):
    # a-b-c-d chain → one cluster rooted at min
    e = _edges(spark, [("b", "a"), ("c", "b"), ("d", "c")])
    got = _result(connected_components(e, _nodes(spark, list("abcd"))))
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a"}


def test_two_components_and_singleton(spark):
    e = _edges(spark, [("a", "b"), ("c", "d")])
    got = _result(connected_components(e, _nodes(spark, list("abcde"))))
    assert got == {"a": "a", "b": "a", "c": "c", "d": "c", "e": "e"}


def test_dense_clique(spark):
    ids = [f"n{i}" for i in range(6)]
    e = _edges(spark, [(a, b) for a in ids for b in ids if a < b])
    got = _result(connected_components(e, _nodes(spark, ids)))
    assert set(got.values()) == {"n0"}


def test_long_path_converges_logarithmically(spark):
    ids = [f"p{i:03d}" for i in range(33)]
    e = _edges(spark, list(zip(ids, ids[1:])))
    got = _result(connected_components(e, _nodes(spark, ids), max_iter=12))
    assert set(got.values()) == {"p000"}


def test_fixpoint_idempotent(spark):
    """FIXTURES.md §6.4: one more LS/SS round changes nothing at fixpoint."""
    e = _edges(spark, [("b", "a"), ("c", "b"), ("z", "y")]).selectExpr(
        "left_id as src", "right_id as dst"
    )
    for _ in range(8):
        e = small_star(large_star(e)).localCheckpoint(eager=True)
    before = {(r["src"], r["dst"]) for r in e.collect()}
    again = small_star(large_star(e))
    after = {(r["src"], r["dst"]) for r in again.collect()}
    assert before == after


def test_pagerank_mass_and_hub_ordering(spark):
    """PageRank over the sf0.001 match graph: total mass stays 1 (no
    dangling leakage in the symmetric graph) and rank orders hubs —
    a max-degree node outranks a min-degree node."""
    from blink_spark import er_queries

    rows = er_queries.q_er_pagerank(spark, "/root/testdata/sf0.001").collect()
    total = sum(r.pagerank for r in rows)
    assert abs(total - 1.0) < 1e-3  # 6dp-rounded ranks over ~1k nodes
    hi = max(rows, key=lambda r: r.degree)
    lo = min(rows, key=lambda r: r.degree)
    assert hi.pagerank > lo.pagerank
