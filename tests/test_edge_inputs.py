"""Degenerate-input robustness: empty source, single row, unicode /
control-char / empty-string content. These are the inputs that null out a
minhash signature or divide by zero if any invariant (never-empty
shingles, guarded ratios) slips — cheap to run, expensive to debug at
scale."""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blink_spark import incremental
from blink_spark.pipeline import run_pipeline

COLS = ["repo", "path", "commit", "lang", "content", "gold_cluster"]
SCHEMA = ", ".join(f"{c} string" for c in COLS)


def _df(spark, rows):
    if not rows:
        return spark.createDataFrame([], SCHEMA)
    return spark.createDataFrame(pd.DataFrame(rows, columns=COLS))


def test_empty_source(spark):
    src = _df(spark, [])
    tables = run_pipeline(spark, src)
    assert tables["clusters"].count() == 0
    assert tables["candidate_pairs"].count() == 0


def test_single_row_founds_single_cluster(spark):
    src = _df(spark, [("o/r", "src/a.py", "c" * 40, "py", "def f(): pass", "g0")])
    tables = run_pipeline(spark, src)
    rows = tables["clusters"].collect()
    assert len(rows) == 1
    assert rows[0]["file_id"] == rows[0]["cluster_id"]  # self-founded cluster


def test_pathological_content_rows(spark):
    """Empty content, control chars, unicode, whitespace-only — every row
    must survive to a cluster assignment with a non-null signature path."""
    rows = [
        ("o/r", "src/empty.py", "a" * 40, "py", "", "g0"),
        ("o/r", "src/empty2.py", "b" * 40, "py", "", "g0"),  # exact-dup of empty
        ("o/r", "src/ws.py", "c" * 40, "py", "   \n\t  ", "g1"),
        ("o/r", "src/uni.py", "d" * 40, "py", "día π 🚀 naïve Ωmega\nречь 测试", "g2"),
        ("o/r", "src/ctrl.py", "e" * 40, "py", "a\x01b\x02c\x00d", "g3"),
        ("o/r", "src/one.py", "f" * 40, "py", "solo", "g4"),
    ]
    src = _df(spark, rows)
    tables = run_pipeline(spark, src)
    clusters = {r["file_id"]: r["cluster_id"] for r in tables["clusters"].collect()}
    assert len(clusters) == len(rows)
    # the two empty files are exact sha duplicates → same cluster
    ing = {r["path"]: r["file_id"] for r in tables["ingested"].collect()}
    assert clusters[ing["src/empty.py"]] == clusters[ing["src/empty2.py"]]
    # signatures never null
    assert (
        tables["signatures"].filter("minhash_sig IS NULL").count() == 0
    )


def test_incremental_empty_then_rows(spark):
    b1 = _df(spark, [("o/r", "src/a.py", "1" * 40, "py", "x = 1", "g0")])
    s1 = incremental.link_batch(None, b1).persist()
    assert s1.clusters.count() == 1
    b2 = _df(spark, [("o/r", "src/a.py", "2" * 40, "py", "x = 1", "g0")])
    s2 = incremental.link_batch(s1, b2)
    got = [r["cluster_id"] for r in s2.clusters.collect()]
    assert len(got) == 2 and len(set(got)) == 1  # exact dup joins the cluster


def test_bpe_token_count_parity(spark, duck):
    """The BPE-ish pretokenizer count must agree byte-for-byte between
    Java regex (Spark) and RE2 (DuckDB) on whitespace/control/unicode
    edge cases the fixture corpus doesn't cover."""
    import pyspark.sql.functions as F

    from blink_spark.textops import BPE_TOKEN_RE

    cases = [
        "hello world",
        "  x=42;\n\tfoo_bar(a1,b2)",
        "",
        "a",
        "   ",
        "naïve café ©µ",
        "tab\tsep\r\nwin",
        "x\x0by",  # vertical tab: excluded from the explicit \s class on purpose
        "don't stop",
        "a1b2",
        "!!!  ???",
        " leading",
        "trailing ",
        "\f\f\f",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "text string")
    got = [
        r[0]
        for r in df.select(
            F.regexp_count("text", F.lit(BPE_TOKEN_RE))
        ).collect()
    ]
    want = [
        duck.execute(
            "SELECT len(regexp_extract_all(?, '" + BPE_TOKEN_RE + "'))", [c]
        ).fetchone()[0]
        for c in cases
    ]
    assert got == want, list(zip(cases, got, want))


def test_char_ngrams_parity(spark, duck):
    """char_ngrams_col must agree with its DuckDB mirror on the inputs
    that break naive slicing: empty text (sentinel ['']), text shorter
    than n (itself as the one gram), multibyte unicode (both engines
    slice by codepoint, hash UTF-8 bytes), control chars, repeats."""
    from pyspark.sql import functions as F

    from blink_spark.textops import NGRAM_N, char_ngrams_col, sql_char_ngrams

    cases = [
        "",
        "a",
        "abcdef",  # == n-1 for n=7
        "abcdefg",
        "abcdefgh",
        "naïve café ©µ — ünïcödé",
        "aaaaaaaaaaaa",  # repeats: distinct set collapses
        "tab\tsep\r\nwin\x0bvt",
        "don't stop me now",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "text string")
    got = [
        sorted(r[0])
        for r in df.select(char_ngrams_col(F.col("text"))).collect()
    ]
    want = [
        sorted(
            duck.execute(
                "SELECT " + sql_char_ngrams("?", NGRAM_N), [c]
            ).fetchone()[0]
        )
        for c in cases
    ]
    assert got == want, list(zip(cases, got, want))
    # never-empty invariant: every row must produce >= 1 gram
    assert all(len(g) >= 1 for g in got)
