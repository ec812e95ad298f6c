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


# Soundex-style digit map for a-z: vowels/h/w/y → 0 (dropped), consonant
# classes → 1-6 (b f p v → 1, c g j k q s x z → 2, d t → 3, l → 4,
# m n → 5, r → 6). The classic American-Soundex H/W "transparent
# separator" nuance is deliberately omitted so the key is a short chain
# of translate/regexp_replace steps WITHOUT regex backreferences —
# identical semantics under Java regex (Spark) and RE2 (DuckDB), which
# has no backreference support.
_SOUNDEX_MAP = ("abcdefghijklmnopqrstuvwxyz", "01230120022455012623010202")


def phonetic_key_col(col: F.Column) -> F.Column:
    """Soundex-style 4-char phonetic key (first letter + 3 consonant
    codes, zero-padded) of a string column — the phonetic blocker family
    (names that sound alike block together despite spelling variance)."""
    s = F.regexp_replace(F.lower(col), "[^a-z]", "")
    code = F.translate(s, *_SOUNDEX_MAP)
    for d in "0123456":
        code = F.regexp_replace(code, d + "{2,}", d)
    rest = F.regexp_replace(code.substr(F.lit(2), F.length(code)), "0", "")
    return F.when(
        F.length(s) > 0,
        F.concat(F.upper(F.substring(s, 1, 1)), F.rpad(F.substring(rest, 1, 3), 3, "0")),
    ).otherwise(F.lit(""))


def sql_phonetic_key(expr: str) -> str:
    """DuckDB mirror of :func:`phonetic_key_col` — the same
    translate/replace chain, no backreferences."""
    s = f"regexp_replace(lower({expr}), '[^a-z]', '', 'g')"
    code = f"translate({s}, '{_SOUNDEX_MAP[0]}', '{_SOUNDEX_MAP[1]}')"
    for d in "0123456":
        code = f"regexp_replace({code}, '{d}{{2,}}', '{d}', 'g')"
    rest = f"regexp_replace(substr({code}, 2, len({code})), '0', '', 'g')"
    return (
        f"CASE WHEN len({s}) > 0 THEN upper(substr({s}, 1, 1)) ||"
        f" rpad(substr({rest}, 1, 3), 3, '0') ELSE '' END"
    )


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


_RANK_PARTS = 64  # range partitions of the rank dictionaries


def _order_rank(df: DataFrame, col: str, rank_col: str) -> DataFrame:
    """Adds ``rank_col``: a deterministic long whose order over the rows of
    ``df`` equals the STRING order of ``df[col]`` (rows must be distinct on
    ``col``).

    Construction is JVM-only and never single-partition: range-partition by
    the column (range boundaries are sampled with Spark's deterministic
    per-partition seeds), then row_number within each partition — rank =
    (partition ordinal << 40) + row ordinal. Persisted because every
    dictionary here feeds ≥2 consumers in one plan; the persist freezes one
    materialization so all consumers see identical ranks. Long-running
    callers (per-batch incremental/streaming linkage) don't leak these:
    Spark's ContextCleaner unpersists cached blocks once the batch's
    DataFrames are garbage-collected (referenceTracking, on by default),
    and MEMORY_AND_DISK evicts under pressure meanwhile.
    """
    w = Window.partitionBy("_pid").orderBy(col)
    return (
        df.repartitionByRange(_RANK_PARTS, col)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn(
            rank_col,
            F.col("_pid").cast("long") * F.lit(1 << 40).cast("long")
            + F.row_number().over(w).cast("long"),
        )
        .drop("_pid")
        .persist()
    )


def _ranked_census(membership: DataFrame) -> DataFrame:
    """(block_key, block_n, key_rank) — one row per distinct block key with
    a deterministic integer rank whose order equals the STRING order of
    ``block_key``.

    Why: the pair dedup keeps ``min(block_key)`` per pair, but a min over a
    string column cannot use hash aggregation (the agg buffer is not
    fixed-width), so Spark plans SortAggregate — two full sorts of the
    O(bands × Σ block²) pre-dedup pair table; measured at sf0.25 that sort
    dominated the blocking stage (72.5M fat rows). Ranking the O(distinct
    blocks) census once lets the pair table carry a long, dedup in a single
    whole-stage-codegen HashAggregate, and join the string back onto the
    O(pairs) result. ``min(key_rank)`` selects exactly the key
    ``min(block_key)`` would, so the output is byte-identical.
    """
    census = membership.groupBy("block_key").agg(F.count("*").alias("block_n"))
    return _order_rank(census, "block_key", "key_rank")


def _ranked_files(membership: DataFrame) -> DataFrame:
    """(file_id, file_rank) — the distinct file ids with an order-preserving
    long rank (SURVEY J11's row-idx remap, applied where it pays: file ids
    are 64-char sha hex, so every pre-dedup pair row carries ~130 bytes of
    id strings through the widest shuffle of the pipeline; two longs carry
    the same information in 16). ``l.file_rank < r.file_rank`` iff
    ``l.file_id < r.file_id``, so canonical pair orientation is preserved
    exactly."""
    return _order_rank(membership.select("file_id").distinct(), "file_id", "file_rank")


def candidate_pairs(
    membership: DataFrame,
    block_cap: int = DEFAULT_BLOCK_CAP,
) -> DataFrame:
    """Self-join each block into canonical candidate pairs.

    Blocks with ≤ block_cap members join directly; larger blocks go through
    the salted replication join. Output: (left_id, right_id, block_key, salt),
    deduped to one row per (left_id, right_id) keeping the min block_key.

    Scale shape: every pre-dedup pair row is FIXED-WIDTH — (file_rank,
    file_rank, key_rank, salt) = 4 numerics instead of two 64-char sha ids
    plus a ~50-char band-key string (~28 B vs ~150 B through the widest
    shuffle of the pipeline), and the dedup ``min`` runs over longs, which
    keeps it a whole-stage-codegen HashAggregate (a min over a string
    column falls back to SortAggregate — two full sorts of the
    O(bands × Σ block²) union; that sort dominated the stage at sf0.25).
    ``min(key_rank)`` selects exactly the key ``min(block_key)`` would and
    rank order preserves id order, so the output is byte-identical to the
    direct string aggregation (the DuckDB oracle keeps computing
    ``min(block_key)``). The id/key strings are joined back onto the
    O(pairs) result from the O(n) dictionaries — the J11 row-idx remap
    shape, same class as the scoring stage's per-side feature fetch.
    """
    ranked = _ranked_census(membership)
    fdict = _ranked_files(membership)
    allp = _pair_block_rows(membership, ranked, fdict, block_cap)
    deduped = allp.groupBy("left_rank", "right_rank").agg(
        F.min("key_rank").alias("key_rank"), F.min("salt").alias("salt")
    )
    lf = fdict.select(
        F.col("file_rank").alias("left_rank"), F.col("file_id").alias("left_id")
    )
    rf = fdict.select(
        F.col("file_rank").alias("right_rank"), F.col("file_id").alias("right_id")
    )
    return (
        deduped.join(ranked.select("key_rank", "block_key"), "key_rank")
        .join(lf, "left_rank")
        .join(rf, "right_rank")
        .select("left_id", "right_id", "block_key", "salt")
    )


def _pair_block_rows(
    membership: DataFrame,
    ranked: DataFrame,
    fdict: DataFrame,
    block_cap: int,
) -> DataFrame:
    """Pre-dedup pair union: one fixed-width row (left_rank, right_rank,
    key_rank, salt) per (pair, block) co-occurrence. Every pair of members
    of a block appears EXACTLY once per block — in the salted path each
    right row lands in one part and each left row meets it in exactly one
    replica — so downstream aggregates can take min (candidate dedup) or
    count (meta-blocking CBS weights) per pair without correction terms.
    """
    # dictionaries are one row per distinct key/file — small at test scale
    # (AQE will auto-broadcast the join-backs), O(n) at 10^12 rows (AQE
    # falls back to sort-merge joins); no explicit broadcast hint on
    # purpose.
    m = membership.join(ranked, "block_key").join(fdict, "file_id")

    small = m.filter(F.col("block_n") <= block_cap).select("key_rank", "file_rank")
    # the salt partition is computed from the file-id hex prefix BEFORE the
    # id string is dropped, so salts stay identical to the pre-rank layout
    big = m.filter(F.col("block_n") > block_cap).select(
        "key_rank", "file_id", "file_rank", "block_n"
    )

    l, r = small.alias("l"), small.alias("r")
    pairs_small = (
        l.join(r, "key_rank")
        .filter(F.col("l.file_rank") < F.col("r.file_rank"))
        .select(
            F.col("l.file_rank").alias("left_rank"),
            F.col("r.file_rank").alias("right_rank"),
            F.col("key_rank").alias("key_rank"),
            F.lit(0).alias("salt"),
        )
    )

    # salted replication join: left replicated s ways, join on (block, part(right))
    s_col = F.ceil(F.col("block_n") / F.lit(block_cap)).cast("int")
    big_p = (
        big.withColumn("s", s_col)
        .withColumn("part", _part_col(F.col("s").cast("long")))
        .drop("file_id")
    )
    lrep = (
        big_p.withColumn("q", F.explode(F.sequence(F.lit(0), F.col("s") - 1)))
        .select("key_rank", "file_rank", F.col("q").cast("long").alias("q"))
        .alias("lb")
    )
    rb = big_p.select("key_rank", "file_rank", "part").alias("rb")
    pairs_big = (
        lrep.join(
            rb,
            (F.col("lb.key_rank") == F.col("rb.key_rank"))
            & (F.col("lb.q") == F.col("rb.part")),
        )
        .filter(F.col("lb.file_rank") < F.col("rb.file_rank"))
        .select(
            F.col("lb.file_rank").alias("left_rank"),
            F.col("rb.file_rank").alias("right_rank"),
            F.col("lb.key_rank").alias("key_rank"),
            F.col("rb.part").cast("int").alias("salt"),
        )
    )

    return pairs_small.unionByName(pairs_big)


def banded_pairs(
    membership: DataFrame,
    block_cap: int = DEFAULT_BLOCK_CAP,
) -> DataFrame:
    """Distinct canonical candidate pairs from a LONG-id ``(file_id,
    block_key)`` membership table — the doc/emb near-dup analog of
    :func:`candidate_pairs`.

    Same scale discipline as the ER path: the pre-dedup pair union is
    FIXED-WIDTH (key_rank + two long ids — no band-key string, no payload
    arrays), oversized blocks go through the salted replication join
    (each pair still appears exactly once per block, so the distinct set
    is invariant), and the dedup is a whole-stage-codegen HashAggregate
    over longs. Payload columns (shingle-hash arrays, embeddings) must be
    fetched AFTER this dedup via ``scoring.pair_feature_join`` — never
    carried through the band join (measured on the ER side: fat pre-dedup
    rows dominated the blocking stage at sf0.25; see
    :func:`candidate_pairs`). Ids must be integral and distinct per
    member; ids are already fixed-width, so no rank dictionary is needed.
    Output: the DISTINCT ``(left_id, right_id)`` set with
    ``left_id < right_id`` — byte-identical to a naive uncapped band
    self-join, which is what the DuckDB oracles keep computing.
    """
    census = membership.groupBy("block_key").agg(F.count("*").alias("block_n"))
    ranked = _order_rank(census, "block_key", "key_rank")
    m = membership.join(
        ranked.select("block_key", "block_n", "key_rank"), "block_key"
    )

    small = m.filter(F.col("block_n") <= block_cap).select("key_rank", "file_id")
    big = m.filter(F.col("block_n") > block_cap).select(
        "key_rank", "file_id", "block_n"
    )

    l, r = small.alias("l"), small.alias("r")
    pairs_small = (
        l.join(r, "key_rank")
        .filter(F.col("l.file_id") < F.col("r.file_id"))
        .select(
            F.col("l.file_id").alias("left_id"),
            F.col("r.file_id").alias("right_id"),
        )
    )

    s_col = F.ceil(F.col("block_n") / F.lit(block_cap)).cast("int")
    big_p = big.withColumn("s", s_col).withColumn(
        "part", F.pmod(F.col("file_id").cast("long"), F.col("s").cast("long"))
    )
    lrep = (
        big_p.withColumn("q", F.explode(F.sequence(F.lit(0), F.col("s") - 1)))
        .select("key_rank", "file_id", F.col("q").cast("long").alias("q"))
        .alias("lb")
    )
    rb = big_p.select("key_rank", "file_id", "part").alias("rb")
    pairs_big = (
        lrep.join(
            rb,
            (F.col("lb.key_rank") == F.col("rb.key_rank"))
            & (F.col("lb.q") == F.col("rb.part")),
        )
        .filter(F.col("lb.file_id") < F.col("rb.file_id"))
        .select(
            F.col("lb.file_id").alias("left_id"),
            F.col("rb.file_id").alias("right_id"),
        )
    )

    return pairs_small.unionByName(pairs_big).distinct()


def pair_weights(
    membership: DataFrame,
    block_cap: int = DEFAULT_BLOCK_CAP,
) -> DataFrame:
    """Meta-blocking edge weights: (left_id, right_id, cbs_weight) where
    cbs_weight = number of blocks the pair co-occurs in (the CBS scheme of
    Papadakis et al.'s blocking-graph framework). Shares the fixed-width
    pre-dedup union with :func:`candidate_pairs` — the count aggregate is
    exactly as combinable/skew-safe as the min it replaces."""
    ranked = _ranked_census(membership)
    fdict = _ranked_files(membership)
    allp = _pair_block_rows(membership, ranked, fdict, block_cap)
    weighted = allp.groupBy("left_rank", "right_rank").agg(
        F.count("*").cast("long").alias("cbs_weight")
    )
    lf = fdict.select(
        F.col("file_rank").alias("left_rank"), F.col("file_id").alias("left_id")
    )
    rf = fdict.select(
        F.col("file_rank").alias("right_rank"), F.col("file_id").alias("right_id")
    )
    return (
        weighted.join(lf, "left_rank")
        .join(rf, "right_rank")
        .select("left_id", "right_id", "cbs_weight")
    )


def dense_order_rank(df: DataFrame, col: str, rank_col: str) -> DataFrame:
    """Adds ``rank_col``: the DENSE global ordinal (1..n) of each row under
    the string order of ``df[col]`` (rows must be distinct on ``col``).

    Unlike :func:`_order_rank` (whose ranks are order-preserving but
    gapped), sorted-neighborhood needs adjacency — rank i and i+1 must be
    neighbors in the sort. Construction stays distributed: range-partition
    by the column, count rows per partition (one ~#partitions-row collect,
    the standard zipWithIndex offset pattern — O(partitions), never
    O(rows), on the driver), then offset + row_number within partitions.
    Persisted so both sides of the neighbor self-join see one
    materialization."""
    parts = (
        df.repartitionByRange(_RANK_PARTS, col)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {r._pid: r.n for r in parts.groupBy("_pid").agg(F.count("*").alias("n")).collect()}
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    off_df = parts.sparkSession.createDataFrame(
        offsets or [(0, 0)], "_pid int, _offset long"
    )
    w = Window.partitionBy("_pid").orderBy(col)
    ranked = (
        parts.join(F.broadcast(off_df), "_pid")
        .withColumn(
            rank_col, F.col("_offset") + F.row_number().over(w).cast("long")
        )
        .drop("_pid", "_offset")
        .persist()
    )
    parts.unpersist()
    return ranked
