"""Spark ↔ DuckDB parity of the shared deterministic hash scheme.

The DuckDB side is the oracle the driver runs (CORRECTNESS_r{N}.json); this
test pins every layer of the chain — tokens, shingles, base hash, minhash
signature, band keys — so an oracle mismatch can be localized instantly.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from blink_spark import minhash

SAMPLES = [
    "def load_buffer(x, y):\n    return merge(x, y)",
    "short",
    "a b c d e f g h",
    "",
    "SAME same SaMe tokens tokens tokens",
]


def _spark_rows(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], ["content"])
    toks = minhash.tokens_col(F.col("content"))
    df = df.withColumn("tokens", toks)
    df = df.withColumn("shingles", minhash.shingles_col(F.col("tokens")))
    df = df.withColumn("hashes", minhash.shingle_hashes_col(F.col("shingles")))
    df = df.withColumn("sig", minhash.minhash_signature_col(F.col("hashes")))
    df = df.withColumn("bands", minhash.band_keys_col(F.col("sig")))
    return df.select("content", "tokens", "shingles", "sig", "bands").collect()


def _duck_rows(duck):
    toks = minhash.sql_tokens("content")
    sh = minhash.sql_shingles("__toks")
    hs = minhash.sql_shingle_hashes("__sh")
    sig = minhash.sql_minhash_signature("__hs")
    bands = minhash.sql_band_keys("__sig")
    vals = ", ".join(f"('{s}')" for s in (x.replace("'", "''") for x in SAMPLES))
    q = f"""
    WITH src(content) AS (VALUES {vals}),
    t1 AS (SELECT content, {toks} AS __toks FROM src),
    t2 AS (SELECT content, __toks, {sh} AS __sh FROM t1),
    t3 AS (SELECT content, __toks, __sh, {hs} AS __hs FROM t2),
    t4 AS (SELECT content, __toks, __sh, {sig} AS __sig FROM t3)
    SELECT content, __toks AS tokens, __sh AS shingles, __sig AS sig,
           {bands} AS bands
    FROM t4
    """
    return duck.execute(q).fetchall()


def test_full_chain_parity(spark, duck):
    srows = {r["content"]: r for r in _spark_rows(spark)}
    for content, tokens, shingles, sig, bands in _duck_rows(duck):
        s = srows[content.replace("''", "'")]
        assert list(s["tokens"]) == list(tokens), f"tokens diverge for {content!r}"
        assert sorted(s["shingles"]) == sorted(shingles), f"shingles diverge for {content!r}"
        assert list(s["sig"]) == list(sig), f"signature diverges for {content!r}"
        assert list(s["bands"]) == list(bands), f"band keys diverge for {content!r}"


def test_signature_shape(spark):
    rows = _spark_rows(spark)
    for r in rows:
        if r["content"].strip():
            assert len(r["sig"]) == minhash.NUM_PERM
            assert len(r["bands"]) == minhash.LSH_BANDS
            assert all(0 <= v < minhash.MERSENNE_P for v in r["sig"])
