"""Stage A — ingest + normalize (SURVEY.md §2.1 S1-S3, §2.2 P1, §2.8 F9).

Reference behavior reproduced:
- lowercase-at-ingest projection (``blink/main_dense.py:89-96,233-236``)
- stable per-row identity (the catalogue's unique-id discipline,
  ``blink/main_dense.py:142``) → ``file_id = sha2(repo∥path∥commit)``
- per-row ``content_sha = sha2(content, 256)`` — the BASELINE-mandated
  invariant carried through every downstream checkpoint.

Everything is a narrow projection — zero shuffles; Catalyst pushes the
column pruning into the parquet/Iceberg scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from blink_spark import minhash

SEP = "\x00"


def path_stem_col(path):
    """Basename without extension: 'src/util/parse_args.py' → 'parse_args'."""
    base = F.element_at(F.split(path, "/"), -1)
    return F.regexp_replace(base, r"\.[^.]*$", "")


def file_id_col(repo="repo", path="path", commit="commit"):
    """Stable row identity from the key triple alone (no content) — CDC
    delete events carry just the key, so retraction never needs payloads."""
    return F.sha2(
        F.concat(F.col(repo), F.lit(SEP), F.col(path), F.lit(SEP), F.col(commit)),
        256,
    )


def ingest(source: DataFrame) -> DataFrame:
    """source_files(repo,path,commit,lang,content[,...]) → normalized table.

    Adds: file_id, content_sha, path_stem, tokens, shingles, n_tokens.
    Token/shingle arrays are computed once here (JVM higher-order fns) and
    reused by blocking + scoring, so content is tokenized exactly once.
    """
    toks = minhash.tokens_col(F.col("content"))
    df = (
        source.withColumn("file_id", file_id_col())
        .withColumn("content_sha", F.sha2(F.col("content"), 256))
        .withColumn("path_stem", path_stem_col(F.col("path")))
        .withColumn("tokens", toks)
    )
    df = df.withColumn("shingles", minhash.shingles_col(F.col("tokens")))
    df = df.withColumn("n_tokens", F.size("tokens"))
    return df


def sql_ingest(source_rel: str) -> str:
    """DuckDB oracle mirror of :func:`ingest` (projection columns only)."""
    toks = minhash.sql_tokens("content")
    return f"""
    SELECT
      repo, path, commit, lang,
      sha256(repo || chr(0) || path || chr(0) || commit) AS file_id,
      sha256(content) AS content_sha,
      regexp_replace(list_extract(string_split(path, '/'), -1),
                     '\\.[^.]*$', '') AS path_stem,
      len({toks}) AS n_tokens
    FROM {source_rel}
    """
