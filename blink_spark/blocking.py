"""Stage B — blocking / candidate-pair generation (SURVEY.md §2.4 J1-J5).

Two block families, mirroring the reference's two retrieval modes:

- **Composite keys** ``ck:<lang>:<path_stem>`` — the keyword/attribute block,
  analog of the Solr edismax candidate generator
  (``blink/candidate_retrieval/candidate_generators.py:16-116``).
- **MinHash-LSH bands** ``mh:b<j>:<sig..>`` over content token shingles —
  the sublinear ANN block, analog of FAISS HNSW/IVF retrieval
  (``blink/indexer/faiss_indexer.py:71-141``, ``elq/index/faiss_indexer.py:71-90``).

Scale design (10^12 rows):

1. **Exact-duplicate collapse first.** Files sharing ``content_sha`` are
   linked by O(n) star edges to a representative (min ``file_id``) and only
   representatives enter pair generation. Boilerplate blocks (LICENSE,
   ``__init__.py``) with millions of identical copies collapse to a handful
   of reps instead of a quadratic pair explosion.
2. **Block-size census + salted replication join** for oversized blocks:
   a block of n reps with cap B is split into s = ⌈n/B⌉ parts by a
   deterministic hash of ``file_id``; the left side is replicated s ways so
   the self-join shuffles on ``(block_key, part)`` instead of one hot key.
   (The reference never faced this — single node; SURVEY.md §4 skew row.)
3. AQE skew-join remains on as the runtime backstop.

All pair rows are canonical (``left_id < right_id``) and globally deduped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from blink_spark import minhash

DEFAULT_BLOCK_CAP = 1000


def composite_key_col() -> F.Column:
    return F.concat_ws(":", F.lit("ck"), F.col("lang"), F.col("path_stem"))


def with_lsh_columns(ingested: DataFrame) -> DataFrame:
    """Adds minhash signature + band-key array (JVM-side, no shuffle)."""
    hashes = minhash.shingle_hashes_col(F.col("shingles"))
    df = ingested.withColumn("shingle_hashes", hashes)
    df = df.withColumn("minhash_sig", minhash.minhash_signature_col(F.col("shingle_hashes")))
    df = df.withColumn(
        "band_keys",
        F.transform(
            minhash.band_keys_col(F.col("minhash_sig")),
            lambda k: F.concat(F.lit("mh:"), k),
        ),
    )
    return df


def block_membership(ingested_lsh: DataFrame) -> DataFrame:
    """(file_id, block_key) — union of composite-key and LSH-band blocks."""
    comp = ingested_lsh.select("file_id", composite_key_col().alias("block_key"))
    lsh = ingested_lsh.select(
        "file_id", F.explode("band_keys").alias("block_key")
    )
    return comp.unionByName(lsh)


def exact_dup_edges(ingested: DataFrame) -> DataFrame:
    """O(n) star edges linking files with identical content_sha.

    Analog of trivial exact-match linking; keeps quadratic pair generation
    away from mass-duplicated boilerplate.
    Returns (left_id, right_id, block_key='sha', salt=0) canonical rows.
    """
    w_min = F.min("file_id").over(Window.partitionBy("content_sha"))
    reps = ingested.select("file_id", "content_sha").withColumn("rep_id", w_min)
    return (
        reps.filter(F.col("file_id") != F.col("rep_id"))
        .select(
            F.col("rep_id").alias("left_id"),
            F.col("file_id").alias("right_id"),
            F.lit("sha").alias("block_key"),
            F.lit(0).alias("salt"),
        )
    )


def rep_map(ingested: DataFrame) -> DataFrame:
    """(file_id, rep_id) — every file mapped to its exact-duplicate
    representative (min file_id per content_sha); reps map to themselves."""
    w_min = F.min("file_id").over(Window.partitionBy("content_sha"))
    return ingested.select("file_id", w_min.alias("rep_id"))


def representatives(ingested: DataFrame) -> DataFrame:
    """One row per distinct content_sha: rep = min(file_id)."""
    w = Window.partitionBy("content_sha").orderBy("file_id")
    return (
        ingested.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _part_col(s_col):
    """Deterministic part id from the file_id hex prefix (not Spark hash —
    reproducible in the SQL oracle)."""
    return F.pmod(F.conv(F.substring(F.col("file_id"), 1, 15), 16, 10).cast("long"), s_col)


def candidate_pairs(
    membership: DataFrame,
    block_cap: int = DEFAULT_BLOCK_CAP,
) -> DataFrame:
    """Self-join each block into canonical candidate pairs.

    Blocks with ≤ block_cap members join directly; larger blocks go through
    the salted replication join. Output: (left_id, right_id, block_key, salt),
    deduped to one row per (left_id, right_id) keeping the min block_key.
    """
    # census is one row per block key — small at test scale (AQE will
    # auto-broadcast), potentially huge at 10^12 rows (AQE falls back to a
    # sort-merge join); no explicit broadcast hint on purpose.
    census = membership.groupBy("block_key").agg(F.count("*").alias("block_n"))
    m = membership.join(census, "block_key")

    small = m.filter(F.col("block_n") <= block_cap).select("block_key", "file_id")
    big = m.filter(F.col("block_n") > block_cap).select("block_key", "file_id", "block_n")

    l, r = small.alias("l"), small.alias("r")
    pairs_small = l.join(r, "block_key").filter(F.col("l.file_id") < F.col("r.file_id")).select(
        F.col("l.file_id").alias("left_id"),
        F.col("r.file_id").alias("right_id"),
        F.col("block_key").alias("block_key"),
        F.lit(0).alias("salt"),
    )

    # salted replication join: left replicated s ways, join on (block, part(right))
    s_col = F.ceil(F.col("block_n") / F.lit(block_cap)).cast("int")
    big_p = big.withColumn("s", s_col).withColumn("part", _part_col(F.col("s").cast("long")))
    lrep = (
        big_p.withColumn("q", F.explode(F.sequence(F.lit(0), F.col("s") - 1)))
        .select("block_key", F.col("file_id"), F.col("q").cast("long").alias("q"))
        .alias("lb")
    )
    rb = big_p.select("block_key", "file_id", "part").alias("rb")
    pairs_big = (
        lrep.join(
            rb,
            (F.col("lb.block_key") == F.col("rb.block_key"))
            & (F.col("lb.q") == F.col("rb.part")),
        )
        .filter(F.col("lb.file_id") < F.col("rb.file_id"))
        .select(
            F.col("lb.file_id").alias("left_id"),
            F.col("rb.file_id").alias("right_id"),
            F.col("lb.block_key").alias("block_key"),
            F.col("rb.part").cast("int").alias("salt"),
        )
    )

    allp = pairs_small.unionByName(pairs_big)
    return allp.groupBy("left_id", "right_id").agg(
        F.min("block_key").alias("block_key"), F.min("salt").alias("salt")
    )
