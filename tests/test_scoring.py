"""Scoring-stage units: JW parity with DuckDB, embedding determinism +
unit norm, fixed-weight combiner separation, spark.ml calibrated combiner
(SURVEY.md §2.3, §2.8 F1-F3, §2.9 M1)."""

from __future__ import annotations

import math
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blink_spark import blocking, scoring
from blink_spark.fixtures import ensure_fixture
from blink_spark.ingest import ingest

JW_CASES = [
    ("martha", "marhta"), ("dixon", "dicksonx"), ("jellyfish", "smellyfish"),
    ("", ""), ("a", ""), ("", "b"), ("abc", "abc"), ("LICENSE", "license"),
    ("parse_args.py", "parse_args.java"), ("utils.c", "utils.go"),
    ("x", "y"), ("ab", "ba"),
]


def test_jaro_winkler_matches_duckdb(duck):
    for a, b in JW_CASES:
        got = scoring.jaro_winkler(a, b)
        want = duck.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert math.isclose(got, want, abs_tol=1e-12), (a, b, got, want)


def test_panel_distances_match_duckdb(duck):
    """The whole basename panel is pinned to DuckDB semantics: unrestricted
    Damerau-Levenshtein (transposition + interleaving edits), Jaro, and
    character-set Jaccard (DuckDB's jaccard throws on empty input — the
    engine-side guard defines those cases)."""
    for a, b in JW_CASES + [("ca", "abc"), ("abcdef", "badcfe")]:
        got_dl = scoring.damerau_levenshtein(a, b)
        want_dl = duck.execute(
            "SELECT damerau_levenshtein(?, ?)", [a, b]
        ).fetchone()[0]
        assert got_dl == want_dl, ("dl", a, b, got_dl, want_dl)

        got_j = scoring._jaro(a, b)
        want_j = duck.execute(
            "SELECT jaro_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert math.isclose(got_j, want_j, abs_tol=1e-12), ("jaro", a, b)

        if a and b:  # duckdb jaccard raises on empty strings
            got_cj = scoring.char_jaccard(a, b)
            want_cj = duck.execute(
                "SELECT jaccard(?, ?)", [a, b]
            ).fetchone()[0]
            assert math.isclose(got_cj, want_cj, abs_tol=1e-12), ("cj", a, b)


def test_embedding_unit_norm_and_determinism(spark):
    src = spark.read.parquet(ensure_fixture(0.001)).limit(50)
    with_sig = blocking.with_lsh_columns(ingest(src))
    emb = scoring.with_embedding(with_sig).select("file_id", "embedding")
    rows1 = {r["file_id"]: r["embedding"] for r in emb.collect()}
    rows2 = {r["file_id"]: r["embedding"] for r in emb.collect()}
    assert rows1 == rows2
    for v in rows1.values():
        n = math.sqrt(sum(x * x for x in v))
        assert math.isclose(n, 1.0, rel_tol=1e-9)
        assert len(v) == scoring.EMBED_DIM


def _scored_with_gold(spark):
    src = spark.read.parquet(ensure_fixture(0.001))
    ing = ingest(src).persist()
    with_sig = blocking.with_lsh_columns(ing)
    reps = blocking.representatives(with_sig)
    pairs = blocking.candidate_pairs(
        blocking.block_membership(
            reps.select("file_id", "lang", "path_stem", "band_keys")
        ).select("file_id", "block_key")
    )
    feats = scoring.with_embedding(with_sig).select(
        "file_id", "path", "content_sha", "shingle_hashes", "embedding"
    )
    scored = scoring.score_pairs(pairs, feats)
    gold = ing.select("file_id", "gold_cluster")
    gl = gold.select(F.col("file_id").alias("left_id"), F.col("gold_cluster").alias("gl"))
    gr = gold.select(F.col("file_id").alias("right_id"), F.col("gold_cluster").alias("gr"))
    return (
        scored.join(gl, "left_id").join(gr, "right_id")
        .withColumn("is_match", F.col("gl") == F.col("gr"))
    ).persist()


def test_fixed_combiner_separates_fixture(spark):
    labeled = _scored_with_gold(spark)
    # margin: positives ≫ τ, negatives ≪ τ (not merely on the right side)
    pos_min = labeled.filter("is_match").agg(F.min("match_p")).collect()[0][0]
    neg_max = labeled.filter("NOT is_match").agg(F.max("match_p")).collect()[0][0]
    assert pos_min >= scoring.MATCH_TAU
    assert neg_max < scoring.MATCH_TAU
    assert pos_min - neg_max > 0.2, (pos_min, neg_max)


def test_spark_ml_combiner(spark):
    labeled = _scored_with_gold(spark)
    model = scoring.fit_combiner(labeled)
    out = scoring.apply_combiner(model, labeled)
    agg = (
        out.groupBy("is_match")
        .agg(F.avg("match_p_ml").alias("p"))
        .collect()
    )
    by = {r["is_match"]: r["p"] for r in agg}
    assert by[True] > 0.9
    assert by[False] < 0.1
    # calibrated decisions at τ=0.5 reproduce the fixed-weight decisions
    disagree = out.filter(
        (F.col("match_p_ml") >= 0.5) != (F.col("match_p") >= 0.5)
    ).count()
    assert disagree == 0
