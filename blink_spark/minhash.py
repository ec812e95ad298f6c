"""Deterministic MinHash-LSH primitives, shared between Spark and SQL.

This is the engine's analog of the reference's FAISS candidate retrieval
(``blink/indexer/faiss_indexer.py:47-141``; IVF bucketing at
``elq/index/faiss_indexer.py:71-90`` is the closest structural relative of
LSH blocking — bucket first, search within bucket). Instead of a binary
index artifact, the "index" is just deterministic hash columns on the table:
recomputable, partition-parallel, and resumable for free.

Design constraints:

- **Everything is a pure function of the row** — no fitted state, no index
  build step, no driver-side randomness at run time. Permutation parameters
  are baked constants from a seeded RNG (mirrors the reference's fixed
  seeds, ``blink/common/params.py:84-85``).
- **SQL-reproducible**: the exact same token → shingle → base-hash →
  permuted-min → band-key computation is emitted as ANSI SQL (DuckDB
  dialect) by the ``sql_*`` helpers, so the driver's DuckDB oracle checks
  the Spark output value-for-value.
- **JVM-side execution**: the Spark side uses only built-in higher-order
  functions (``transform`` / ``aggregate`` / ``array_min``) → whole-stage
  codegen, zero Python in the blocking hot path.

Hash scheme
-----------
``base_hash(s) = int(md5(s)[:15 hex], 16)``  (60-bit, engine-agnostic)
``perm_i(h)    = (A[i] * (h % P) + B[i]) % P``  with ``P = 2^31 - 1``
``sig[i]       = min over distinct shingles of perm_i(base_hash(shingle))``
``band_key[j]  = 'b' || j || ':' || sig[j*r] || ':' ... ':' || sig[j*r+r-1]``

All intermediates fit int64 (``A,B < P`` so ``A*(h%P)+B < 2^62``).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = (1 << 31) - 1  # 2^31 - 1, prime
NUM_PERM = 64
LSH_BANDS = 16
LSH_ROWS = 4
SHINGLE_K = 3  # word-level shingle width
EMBED_DIM = 64  # hashed-shingle embedding dimensionality (bi-encoder analog)

assert LSH_BANDS * LSH_ROWS == NUM_PERM

_rng = np.random.RandomState(42)
PERM_A: list[int] = [int(x) for x in _rng.randint(1, MERSENNE_P, size=NUM_PERM)]
PERM_B: list[int] = [int(x) for x in _rng.randint(0, MERSENNE_P, size=NUM_PERM)]

TOKEN_SPLIT_RE = "[^a-z0-9]+"


# ---------------------------------------------------------------------------
# Spark Column builders (JVM-side, codegen-friendly)
# ---------------------------------------------------------------------------

def tokens_col(content: Column) -> Column:
    """Lowercased word tokens of ``content`` (empty strings dropped).

    Analog of the reference's lowercase-at-ingest + WordPiece tokenize
    (``blink/main_dense.py:89-96``, ``blink/biencoder/data_process.py:37-43``)
    with a code-friendly alnum tokenizer.
    """
    toks = F.split(F.lower(content), TOKEN_SPLIT_RE)
    return F.filter(toks, lambda t: t != F.lit(""))


def shingles_col(tokens: Column, k: int = SHINGLE_K) -> Column:
    """Distinct k-word shingles (space-joined). Rows with < k tokens fall
    back to single-token "shingles" so short files still block.

    Analog of the context-window builder (``blink/biencoder/data_process.py:26-69``).
    """
    n = F.size(tokens)
    idx = F.sequence(F.lit(0), n - F.lit(k))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, (i + F.lit(j + 1)).cast("int")) for j in range(k)]
        ),
    )
    # never-empty: token fallback for short rows, sentinel for empty rows
    # (an empty shingle set would null the signature and diverge from SQL)
    return F.array_distinct(
        F.when(n >= F.lit(k), grams)
        .when(n > 0, tokens)
        .otherwise(F.array(F.lit("")))
    )


def grams_col(tokens: Column, k: int) -> Column:
    """ORDERED k-word grams (no dedup, no fallback) — the sequence input
    for winnowing fingerprints, where window position matters. Rows with
    fewer than k tokens yield an empty list."""
    n = F.size(tokens)
    idx = F.sequence(F.lit(0), n - F.lit(k))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, (i + F.lit(j + 1)).cast("int")) for j in range(k)]
        ),
    )
    return F.when(n >= F.lit(k), grams).otherwise(F.array().cast("array<string>"))


def sql_grams(tokens_expr: str, k: int) -> str:
    gram_parts = " || ' ' || ".join(f"__t[i + {j}]" for j in range(k))
    return (
        f"(SELECT CASE WHEN len(__t) >= {k} THEN "
        f"list_transform(range(1, len(__t) - {k} + 2), i -> {gram_parts}) "
        f"ELSE [] END FROM (SELECT {tokens_expr} AS __t))"
    )


def base_hash_col(s: Column) -> Column:
    """60-bit engine-agnostic hash: first 15 hex chars of md5."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def shingle_hashes_col(shingles: Column) -> Column:
    return F.transform(shingles, base_hash_col)


def minhash_signature_col(hashes: Column) -> Column:
    """``array<long>`` of NUM_PERM minimums over permuted shingle hashes.

    Arrow-batched numpy implementation: the pure-Column version (64
    ``transform``/``array_min`` higher-order lambdas) is interpreted
    per-element by Catalyst — ~300M boxed evaluations at sf0.1 — while the
    broadcasted int64 matmul below is exact (all intermediates < 2^62) and
    ~30× faster. Values are bit-identical to the SQL oracle.
    """
    return _minhash_sig_udf(hashes)


def _minhash_sig_batch(hashes):
    import pandas as pd

    a = np.asarray(PERM_A, dtype=np.int64)[:, None]
    b = np.asarray(PERM_B, dtype=np.int64)[:, None]
    out = []
    for v in hashes:
        if v is None or len(v) == 0:
            out.append(None)
            continue
        h = np.asarray(v, dtype=np.int64) % MERSENNE_P
        out.append((a * h[None, :] + b) % MERSENNE_P)
    # one vectorized min over the concatenated row blocks
    return pd.Series(
        [None if m is None else m.min(axis=1) for m in out]
    )


def _make_minhash_sig_udf():
    from pyspark.sql.types import ArrayType, LongType

    return F.pandas_udf(_minhash_sig_batch, ArrayType(LongType()))


_minhash_sig_udf = _make_minhash_sig_udf()


def band_keys_col(sig: Column, bands: int = LSH_BANDS, rows: int = LSH_ROWS) -> Column:
    """``array<string>`` of LSH band keys ``'b<j>:<sig..>'``."""
    keys = []
    for j in range(bands):
        parts = [F.lit(f"b{j}")] + [
            F.element_at(sig, j * rows + r + 1).cast("string") for r in range(rows)
        ]
        keys.append(F.concat_ws(":", *parts))
    return F.array(*keys)


# ---------------------------------------------------------------------------
# SQL (DuckDB-dialect) emitters — the oracle mirror of the Spark builders.
# ---------------------------------------------------------------------------

def sql_tokens(content_expr: str) -> str:
    return (
        f"list_filter(regexp_split_to_array(lower({content_expr}), "
        f"'{TOKEN_SPLIT_RE}'), t -> t <> '')"
    )


def sql_shingles(tokens_expr: str, k: int = SHINGLE_K) -> str:
    gram_parts = " || ' ' || ".join(f"__t[i + {j}]" for j in range(k))
    return (
        f"(SELECT CASE WHEN len(__t) >= {k} THEN "
        f"list_distinct(list_transform(range(1, len(__t) - {k} + 2), i -> {gram_parts})) "
        f"WHEN len(__t) > 0 THEN list_distinct(__t) ELSE [''] END "
        f"FROM (SELECT {tokens_expr} AS __t))"
    )


def sql_base_hash(s_expr: str) -> str:
    return f"CAST(('0x' || substring(md5({s_expr}), 1, 15)) AS BIGINT)"


def sql_shingle_hashes(shingles_expr: str) -> str:
    return f"list_transform({shingles_expr}, __s -> {sql_base_hash('__s')})"


def sql_minhash_signature(hashes_expr: str) -> str:
    mins = ", ".join(
        f"list_min(list_transform(__hm, h -> ({a} * h + {b}) % {MERSENNE_P}))"
        for a, b in zip(PERM_A, PERM_B)
    )
    return (
        f"(SELECT [{mins}] FROM (SELECT list_transform({hashes_expr}, "
        f"h -> h % {MERSENNE_P}) AS __hm))"
    )


def sql_band_keys(sig_expr: str, bands: int = LSH_BANDS, rows: int = LSH_ROWS) -> str:
    keys = []
    for j in range(bands):
        parts = " || ':' || ".join(f"CAST(__sg[{j * rows + r + 1}] AS VARCHAR)" for r in range(rows))
        keys.append(f"'b{j}:' || {parts}")
    return f"(SELECT [{', '.join(keys)}] FROM (SELECT {sig_expr} AS __sg))"
