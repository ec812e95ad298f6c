"""Training-data text operators over the ``documents`` table: exact +
near-duplicate detection, SimHash fingerprints, token/quality statistics,
heuristic language ID, winnowing document fingerprints.

These generalize the record-linkage engine's primitives (sha dedup,
MinHash-LSH blocking, jaccard scoring, connected components — SURVEY.md
§2.4, §2.8) from source-code files to a generic document corpus: the
operations a large-scale training-data pipeline runs before anything else.
Every query has a DuckDB oracle that recomputes it independently over the
pre-registered ``documents`` view.

All hot-path transforms are JVM column expressions; SimHash is the one
Arrow-batched numpy kernel (bit-majority over 60-bit shingle hashes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType
from pyspark.sql.window import Window

from blink_spark import blocking, clustering, minhash, scoring
from blink_spark.parity import r6 as _r6

SIMHASH_BITS = 60  # base_hash is 60-bit (15 hex chars of md5)
NEAR_DUP_TAU = 0.5
# Character n-gram dedup family: n=7 keeps the banded LSH selective —
# measured at sf0.001, trigrams pass 56,548 of 124,750 possible pairs into
# the confirm stage (same-language text shares most trigrams: banding
# prunes nothing and the query degenerates toward all-pairs), while 7-grams
# admit 69 candidates and the SAME 28 true near-dup pairs as 5-grams at
# every τ in [0.6, 0.8]. At corpus scale only the n=7 version is honest.
NGRAM_N = 7
NGRAM_TAU = 0.7
WINNOW_K = 4  # k-gram width for winnowing
WINNOW_W = 5  # window width

STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "on", "for", "with"]

LANG_PROFILES = {
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"],
    "en": ["the", "and", "of", "to", "in", "is", "was", "for", "that", "with"],
    "es": ["el", "los", "de", "y", "en", "que", "un", "para", "con", "por"],
    "fr": ["le", "la", "et", "les", "des", "une", "est", "pour", "que", "dans"],
}
LANG_ORDER = sorted(LANG_PROFILES)  # deterministic argmax tie-break order




def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _with_tokens(docs: DataFrame) -> DataFrame:
    toks = minhash.tokens_col(F.col("text"))
    df = docs.withColumn("tokens", toks)
    df = df.withColumn("shingles", minhash.shingles_col(F.col("tokens")))
    return df.withColumn(
        "sh_hashes", minhash.shingle_hashes_col(F.col("shingles"))
    )


# ---------------------------------------------------------------------------
# Queries (Spark side)
# ---------------------------------------------------------------------------

def q_doc_exact_dedup(spark, sf_dir):
    """Exact dedup: hash-groupBy on sha2(text) → representative + count
    (map-side combined; the dedup primitive of any corpus pipeline)."""
    docs = load_documents(spark, sf_dir)
    return (
        docs.select(F.col("doc_id"), F.sha2(F.col("text"), 256).alias("text_sha"))
        .groupBy("text_sha")
        .agg(
            F.min("doc_id").alias("rep_doc_id"),
            F.count("*").cast("long").alias("n_docs"),
        )
    )


# GPT-2-style pretokenizer: letter runs / digit runs / punctuation runs
# (each absorbing one leading space) / residual whitespace runs. ASCII
# classes + an explicit whitespace class so Java regex (Spark) and RE2
# (DuckDB) agree byte-for-byte; both use leftmost-first alternation.
BPE_TOKEN_RE = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \\t\\n\\r\\f]+|[ \\t\\n\\r\\f]+"


def q_doc_token_stats(spark, sf_dir):
    """Token counting (whitespace/alnum tokenizer + BPE-ish regex
    pretokenizer count): totals, distincts, type-token ratio, mean token
    length."""
    df = _with_tokens(load_documents(spark, sf_dir))
    n = F.size("tokens")
    total_len = F.aggregate(
        F.transform(F.col("tokens"), F.length),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return df.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.regexp_count(F.col("text"), F.lit(BPE_TOKEN_RE))
        .cast("long")
        .alias("n_bpe_tokens"),
        F.size(F.array_distinct("tokens")).cast("long").alias("n_distinct_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        _r6(F.when(n > 0, total_len / n).otherwise(F.lit(0.0)), 6).alias(
            "avg_token_len"
        ),
        _r6(
            F.when(n > 0, F.size(F.array_distinct("tokens")) / n).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("type_token_ratio"),
    )


def _quality_parts() -> dict[str, Column]:
    """Shared quality expressions over (text, tokens) columns — used by
    both the per-doc quality query and the mixture-allocation census so
    the bucket boundaries are byte-identical between the two."""
    n_chars = F.length("text")
    alpha = F.length(F.regexp_replace(F.col("text"), "[^A-Za-z]", ""))
    digit = F.length(F.regexp_replace(F.col("text"), "[^0-9]", ""))
    space = F.length(F.regexp_replace(F.col("text"), "[^ ]", ""))
    n_tok = F.size("tokens")
    stop_n = F.size(
        F.filter(F.col("tokens"), lambda t: t.isin(STOPWORDS))
    )
    alpha_r = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))
    digit_r = F.when(n_chars > 0, digit / n_chars).otherwise(F.lit(0.0))
    space_r = F.when(n_chars > 0, space / n_chars).otherwise(F.lit(0.0))
    stop_r = F.when(n_tok > 0, stop_n / n_tok).otherwise(F.lit(0.0))
    z = F.lit(-1.0) + 3.0 * alpha_r + 2.0 * stop_r - 4.0 * digit_r
    return {
        "alpha_r": alpha_r,
        "digit_r": digit_r,
        "space_r": space_r,
        "stop_r": stop_r,
        "quality": 1.0 / (1.0 + F.exp(-z)),
    }


def q_doc_quality(spark, sf_dir):
    """Quality scoring: character-class ratios + stopword ratio combined
    into a fixed logistic score (the NIL-predictor shape applied to
    corpus filtering)."""
    df = _with_tokens(load_documents(spark, sf_dir))
    p = _quality_parts()
    alpha_r, digit_r, space_r, stop_r = (
        p["alpha_r"], p["digit_r"], p["space_r"], p["stop_r"],
    )
    return df.select(
        "doc_id",
        _r6(alpha_r, 6).alias("alpha_ratio"),
        _r6(digit_r, 6).alias("digit_ratio"),
        _r6(space_r, 6).alias("space_ratio"),
        _r6(stop_r, 6).alias("stopword_ratio"),
        _r6(p["quality"], 6).alias("quality"),
    )


def q_doc_langid(spark, sf_dir):
    """Heuristic language ID: distinct-token overlap with tiny per-language
    stopword profiles; deterministic argmax (fixed evaluation order)."""
    df = _with_tokens(load_documents(spark, sf_dir))
    toks_d = F.array_distinct("tokens")
    n_d = F.size(toks_d)
    scores = {
        lang: F.when(
            n_d > 0,
            F.size(F.array_intersect(toks_d, F.array(*[F.lit(w) for w in prof])))
            / n_d,
        ).otherwise(F.lit(0.0))
        for lang, prof in LANG_PROFILES.items()
    }
    df = df.select(
        "doc_id", *[_r6(s, 6).alias(f"s_{lang}") for lang, s in scores.items()]
    )
    best = F.greatest(*[F.col(f"s_{lang}") for lang in LANG_ORDER])
    pred = F.lit("unknown")
    for lang in reversed(LANG_ORDER):  # earlier langs win ties
        pred = F.when(F.col(f"s_{lang}") == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit("unknown"))
    return df.select(
        "doc_id", pred.alias("pred_lang"), _r6(best, 6).alias("score")
    )


def _simhash_batch(hashes: pd.Series) -> pd.Series:
    shifts = np.arange(SIMHASH_BITS, dtype=np.int64)
    out = np.zeros(len(hashes), dtype=np.int64)
    for i, v in enumerate(hashes):
        if v is None or len(v) == 0:
            continue
        h = np.asarray(v, dtype=np.int64)
        bits = (h[:, None] >> shifts[None, :]) & 1  # [m × 60]
        maj = (2 * bits - 1).sum(axis=0) > 0
        out[i] = int((maj.astype(np.int64) << shifts).sum())
    return pd.Series(out)


simhash_udf = F.pandas_udf(_simhash_batch, LongType())


def q_doc_simhash(spark, sf_dir):
    """60-bit SimHash over shingle hashes (bit-majority), plus 4×15-bit
    band keys for hamming-bucket blocking."""
    df = _with_tokens(load_documents(spark, sf_dir))
    df = df.select("doc_id", simhash_udf(F.col("sh_hashes")).alias("simhash"))
    bands = [
        F.shiftrightunsigned(F.col("simhash"), 15 * j).bitwiseAND(F.lit((1 << 15) - 1))
        .cast("long")
        .alias(f"band{j}")
        for j in range(4)
    ]
    return df.select("doc_id", "simhash", *bands)


def _banded_verify(feat: DataFrame, payload: str) -> DataFrame:
    """Shared band-join discipline for the doc/emb near-dup family:
    ids-only band membership → ``blocking.banded_pairs`` (fixed-width
    pre-dedup rows, capped+salted hot bands) → post-dedup payload fetch
    via ``scoring.pair_feature_join``. The payload array NEVER rides the
    pre-dedup pair shuffle — the same fat-row/hot-key fix the ER blocking
    stage measured at sf0.25 (blocking.py:candidate_pairs). ``feat`` is
    (file_id, <payload>, block_keys); persisted because membership and
    both fetch sides read it.

    Feature fetch leaves the join strategy to AQE
    (``broadcast_features=False``): at test scale the payload table
    broadcasts; at corpus scale both sides bucket by file_id instead of
    the caller asserting a broadcast that would OOM."""
    feat = feat.persist()
    memb = feat.select("file_id", F.explode("block_keys").alias("block_key"))
    pairs = blocking.banded_pairs(memb)
    return scoring.pair_feature_join(
        pairs, feat.select("file_id", payload), broadcast_features=False
    )


def _near_dup_pairs(spark, sf_dir):
    df = _with_tokens(load_documents(spark, sf_dir))
    feat = df.select(
        F.col("doc_id").alias("file_id"),
        "sh_hashes",
        minhash.band_keys_col(
            minhash.minhash_signature_col(F.col("sh_hashes"))
        ).alias("block_keys"),
    )
    fetched = _banded_verify(feat, "sh_hashes")
    return (
        fetched.withColumn(
            "jaccard", scoring.jaccard_col(F.col("l_sh_hashes"), F.col("r_sh_hashes"))
        )
        .filter(F.col("jaccard") >= NEAR_DUP_TAU)
        .select("left_id", "right_id", "jaccard")
    )


def q_doc_near_dup_pairs(spark, sf_dir):
    """MinHash-LSH near-duplicate pairs with exact jaccard confirmation —
    the shingle→minhash→band→bucket-join dedup pattern."""
    return _near_dup_pairs(spark, sf_dir).select(
        "left_id", "right_id", _r6("jaccard", 6).alias("jaccard")
    )


def char_ngrams_col(text: Column, n: int = NGRAM_N) -> Column:
    """Distinct character n-grams of ``text`` (JVM-side: sequence +
    substr, no Python). Texts shorter than n yield themselves as the one
    gram; empty text yields the '' sentinel — never an empty set, so the
    minhash signature stays non-null (same discipline as
    :func:`minhash.shingles_col`)."""
    ln = F.length(text)
    idx = F.sequence(F.lit(1), F.greatest(ln - F.lit(n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: text.substr(i, F.lit(n))))


def sql_char_ngrams(text_expr: str, n: int = NGRAM_N) -> str:
    """DuckDB mirror of :func:`char_ngrams_col` (both engines slice by
    codepoint and hash the UTF-8 bytes, so values agree on any input)."""
    return (
        f"(SELECT list_distinct(list_transform("
        f"range(1, greatest(len(__t) - {n - 1}, 1) + 1), "
        f"i -> substring(__t, i, {n}))) FROM (SELECT {text_expr} AS __t))"
    )


def q_doc_ngram_jaccard(spark, sf_dir):
    """Character-n-gram Jaccard near-duplicates — the char-level dedup
    family next to word-shingle MinHash, SimHash, and embedding-cosine:
    distinct char trigram sets, MinHash-LSH banding over the trigram
    hashes (never all-pairs), exact trigram-set Jaccard confirm ≥ τ.

    Char n-grams are robust where word shingles are brittle (token-less
    scripts, heavy punctuation edits, OCR noise), which is why corpus
    pipelines run both. Same signature→band→bucket-join→verify shape, so
    it scales identically to the other dedup families."""
    docs = load_documents(spark, sf_dir)
    g_h = minhash.shingle_hashes_col(char_ngrams_col(F.col("text")))
    feat = docs.select(
        F.col("doc_id").alias("file_id"),
        g_h.alias("g_h"),
        minhash.band_keys_col(minhash.minhash_signature_col(g_h)).alias(
            "block_keys"
        ),
    )
    fetched = _banded_verify(feat, "g_h")
    return (
        fetched.withColumn(
            "jaccard", scoring.jaccard_col(F.col("l_g_h"), F.col("r_g_h"))
        )
        .filter(F.col("jaccard") >= NGRAM_TAU)
        .select("left_id", "right_id", _r6("jaccard", 6).alias("jaccard"))
    )


def q_doc_dup_clusters(spark, sf_dir):
    """Near-duplicate groups: connected components over the LSH pairs."""
    edges = _near_dup_pairs(spark, sf_dir).select("left_id", "right_id")
    nodes = load_documents(spark, sf_dir).select(
        F.col("doc_id").alias("file_id")
    )
    cc = clustering.connected_components(
        edges.select(
            F.col("left_id").alias("left_id"), F.col("right_id").alias("right_id")
        ),
        nodes,
    )
    return cc.select(
        F.col("file_id").alias("doc_id"), F.col("cluster_id").alias("cluster_id")
    )


EMB_ND_TAU = 0.8  # cosine threshold for embedding near-duplicates
EMB_ND_BANDS = 8
EMB_ND_ROWS = 4  # bits per band; P(band hit) = (1 - θ/π)^4, 8 bands OR'd
_emb_nd_rng = np.random.RandomState(23)
EMB_ND_PLANES: list[list[float]] = [
    [round(float(x), 6) + 0.0 for x in _emb_nd_rng.randn(scoring.EMBED_DIM)]
    for _ in range(EMB_ND_BANDS * EMB_ND_ROWS)
]


def q_doc_emb_near_dup(spark, sf_dir):
    """Embedding-cosine near-duplicates — the third dedup family next to
    MinHash-Jaccard and SimHash: unit feature-hash embeddings, banded
    random-hyperplane LSH (8 bands × 4 sign bits; a single 16-bit table
    would recall only ~8% of cosine-0.9 pairs, the OR of 8 short bands
    recalls ~99.8%), bucket self-join, exact cosine confirm ≥ τ.
    The same signature→band→bucket-join→verify shape as the MinHash path,
    so it scales identically (no all-pairs comparison anywhere)."""
    df = _with_tokens(load_documents(spark, sf_dir))
    emb = scoring.with_embedding(df, "sh_hashes").select("doc_id", "embedding")
    keys = []
    for j in range(EMB_ND_BANDS):
        key = F.lit(0)
        for r_ in range(EMB_ND_ROWS):
            plane = EMB_ND_PLANES[j * EMB_ND_ROWS + r_]
            d = F.aggregate(
                F.zip_with(
                    F.col("embedding"),
                    F.array(*[F.lit(p) for p in plane]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            key = key + F.when(d > 0, F.lit(1 << r_)).otherwise(F.lit(0))
        keys.append(F.concat(F.lit(f"b{j}:"), key.cast("string")))
    feat = emb.select(
        F.col("doc_id").alias("file_id"),
        "embedding",
        F.array(*keys).alias("block_keys"),
    )
    fetched = _banded_verify(feat, "embedding")
    cos = F.aggregate(
        F.zip_with(F.col("l_embedding"), F.col("r_embedding"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        fetched.withColumn("cosine", cos)
        .filter(F.col("cosine") >= EMB_ND_TAU)
        .select("left_id", "right_id", _r6("cosine", 6).alias("cosine"))
    )


def q_doc_winnow_fingerprints(spark, sf_dir):
    """Winnowing fingerprints (Schleimer et al.): rolling k-gram hashes,
    per-window minimum, distinct — the standard plagiarism/near-dup
    document signature."""
    docs = load_documents(spark, sf_dir)
    toks = minhash.tokens_col(F.col("text"))
    grams = minhash.grams_col(toks, WINNOW_K)
    gh = F.transform(grams, minhash.base_hash_col)
    df = docs.select("doc_id", gh.alias("gh"))
    n = F.size("gh")
    starts = F.sequence(F.lit(1), n - F.lit(WINNOW_W - 1))
    mins = F.transform(starts, lambda i: F.array_min(F.slice(F.col("gh"), i, WINNOW_W)))
    fps = F.when(n >= F.lit(WINNOW_W), F.array_distinct(mins)).otherwise(
        F.array_distinct(F.col("gh"))
    )
    return df.select("doc_id", F.explode(fps).alias("fingerprint"))


CLONE_MIN_SHARED = 5   # fingerprints two docs must share to pair
CLONE_MAX_DF = 50      # drop boilerplate fingerprints in > this many docs


def q_doc_winnow_clone_pairs(spark, sf_dir):
    """MOSS-style clone detection over the winnowing fingerprints: doc
    pairs sharing ≥ CLONE_MIN_SHARED fingerprints, with a containment
    score n_shared / min(|A|, |B|) — the plagiarism/code-clone join
    (Schleimer et al. §5, the use the fingerprint table exists for).

    Plan (100 TB): a fingerprint-keyed equi-join — never all-pairs —
    with the same posting-list discipline as the LSH blocker: a
    boilerplate fingerprint present in > CLONE_MAX_DF docs is dropped
    BEFORE the self-join (license headers would otherwise pair every
    file with every other), so bucket fan-out is bounded exactly like
    the blocking cap in blocking.py."""
    fp = q_doc_winnow_fingerprints(spark, sf_dir)
    fdf = fp.groupBy("fingerprint").agg(F.count(F.lit(1)).alias("_dfc"))
    fp = (
        fp.join(fdf, "fingerprint")
        .filter(F.col("_dfc") <= CLONE_MAX_DF)
        .select("doc_id", "fingerprint")
    )
    sizes = fp.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp"))
    l = fp.select(F.col("doc_id").alias("left_id"), "fingerprint")
    r = fp.select(F.col("doc_id").alias("right_id"), "fingerprint")
    pairs = (
        l.join(r, "fingerprint")
        .filter(F.col("left_id") < F.col("right_id"))
        .groupBy("left_id", "right_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= CLONE_MIN_SHARED)
    )
    sl = sizes.select(F.col("doc_id").alias("left_id"), F.col("n_fp").alias("_nl"))
    sr = sizes.select(F.col("doc_id").alias("right_id"), F.col("n_fp").alias("_nr"))
    return (
        pairs.join(sl, "left_id")
        .join(sr, "right_id")
        .select(
            "left_id",
            "right_id",
            "n_shared",
            _r6(
                F.col("n_shared") / F.least(F.col("_nl"), F.col("_nr")), 6
            ).alias("containment"),
        )
    )


TFIDF_TOP_K = 5

# Per-stratum sampling rates for doc_stratified_sample (langs not listed
# fall back to the default). Rates are encoded as 8-hex-digit thresholds so
# membership is a plain string compare on a md5 prefix — identical bytes on
# any engine, any partitioning, any cluster size.
SAMPLE_RATES = {"en": 0.5, "de": 0.25, "fr": 0.125, "zh": 0.75}
SAMPLE_DEFAULT_RATE = 0.2


def _rate_threshold_hex(rate: float) -> str:
    """Map a sampling rate in [0, 1] to the 8-hex-digit threshold such that
    P(substr(md5(key),1,8) < threshold) = rate for a uniform hash."""
    return format(min(int(rate * (1 << 32)), (1 << 32) - 1), "08x")


def q_doc_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling: keep each document iff the first
    8 hex chars of md5(doc_id ':' lang) fall below a per-language-stratum
    threshold (the reference's class undersampling,
    scripts/feature_ablation_study.py:938-967, generalized to corpus
    subsampling).

    Scale shape: ``df.sample()``'s output depends on the seed AND the
    partitioning, so the same corpus sampled on 10 vs 1000 executors (or
    after a repartition) yields different rows — unusable as a pipeline
    contract. A hash-threshold sample is a pure per-row predicate: no
    shuffle, pushdown-friendly, byte-identical on any engine at any
    parallelism, and a superset/subset relation holds between any two
    rates (rate 0.2 ⊂ rate 0.5), so samples can be widened without
    resampling."""
    docs = load_documents(spark, sf_dir)
    bucket = F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("lang"))),
        1,
        8,
    )
    thr = F.lit(_rate_threshold_hex(SAMPLE_DEFAULT_RATE))
    rate = F.lit(float(SAMPLE_DEFAULT_RATE))
    for lang in sorted(SAMPLE_RATES):
        thr = F.when(
            F.col("lang") == lang, F.lit(_rate_threshold_hex(SAMPLE_RATES[lang]))
        ).otherwise(thr)
        rate = F.when(
            F.col("lang") == lang, F.lit(float(SAMPLE_RATES[lang]))
        ).otherwise(rate)
    return (
        docs.select(
            "doc_id",
            "lang",
            bucket.alias("bucket"),
            rate.cast("double").alias("rate"),
            thr.alias("_thr"),
        )
        .filter(F.col("bucket") < F.col("_thr"))
        .drop("_thr")
    )


def q_doc_canonical_pick(spark, sf_dir):
    """Canonical-document selection: within each near-duplicate cluster
    (MinHash-LSH pairs → connected components) keep the single
    highest-quality member (tie-break: lowest doc_id) — dedup that keeps
    the BEST copy, not an arbitrary one (the per-entity argmax/medoid
    pattern, scripts/kbp_simulation.py:229-251, applied to corpus dedup).

    Scale shape: composition of already-scaling pieces — banded LSH pairs
    (never all-pairs), large-star/small-star CC, one doc_id join against
    the column-expression quality scores, one window shuffle on
    cluster_id. Nothing new is quadratic."""
    clusters = q_doc_dup_clusters(spark, sf_dir)
    qual = q_doc_quality(spark, sf_dir).select("doc_id", "quality")
    joined = clusters.join(qual, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(F.desc("quality"), F.asc("doc_id"))
    wc = Window.partitionBy("cluster_id")
    return (
        joined.withColumn("rnk", F.row_number().over(w))
        .withColumn("n_members", F.count("*").over(wc).cast("long"))
        .filter(F.col("rnk") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("canonical_doc_id"),
            "quality",
            "n_members",
        )
    )


def q_doc_repetition(spark, sf_dir):
    """Repetition quality signals (the Gopher/MassiveText family): per
    document the duplicate-token fraction, most-frequent-token fraction,
    and duplicate-bigram fraction — the standard filters for boilerplate
    and degenerate repetition in LLM training corpora, next to
    ``doc_quality``'s character-class score.

    Scale shape: distinct/bigram stats are pure JVM array expressions
    (zero shuffle); the top-token count is one explode + combinable
    two-level groupBy — linear in corpus size, never O(doc_len²) (the
    per-row list-scan alternative degenerates on pathological
    million-token docs)."""
    df = _with_tokens(load_documents(spark, sf_dir))
    n = F.size("tokens")
    top = (
        df.select("doc_id", F.explode("tokens").alias("token"))
        .groupBy("doc_id", "token")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top_cnt"))
    )
    bigrams = F.when(n >= 2, F.expr(
        "transform(slice(tokens, 1, size(tokens) - 1),"
        " (t, i) -> concat(t, ' ', element_at(tokens, i + 2)))"
    )).otherwise(F.array().cast("array<string>"))
    base = df.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.size(F.array_distinct("tokens")).alias("n_dis"),
        bigrams.alias("bigrams"),
    ).withColumn("n_bg", F.size("bigrams")).withColumn(
        "n_bg_dis", F.size(F.array_distinct("bigrams"))
    )
    joined = base.join(top, "doc_id", "left")
    nn = F.col("n_tokens")
    return joined.select(
        "doc_id",
        "n_tokens",
        _r6(
            F.when(nn > 0, (nn - F.col("n_dis")) / nn).otherwise(F.lit(0.0)), 6
        ).alias("dup_token_frac"),
        _r6(
            F.when(nn > 0, F.coalesce(F.col("top_cnt"), F.lit(0)) / nn)
            .otherwise(F.lit(0.0)),
            6,
        ).alias("top_token_frac"),
        _r6(
            F.when(
                F.col("n_bg") > 0,
                (F.col("n_bg") - F.col("n_bg_dis")) / F.col("n_bg"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_bigram_frac"),
    )


def q_doc_tfidf_top_terms(spark, sf_dir):
    """TF-IDF top-K terms per document — the corpus-statistics primitive
    (keyword extraction / relevance weighting) every training-data
    pipeline needs at some point.

    Scale shape: explode → tf is ONE map-side-combinable shuffle on
    (doc_id, term); document frequency is a second combinable aggregate
    over the tf table (vocabulary-sized output — broadcastable, like any
    term dictionary); the corpus size N is a 1-row aggregate broadcast
    via crossJoin (never a driver collect); top-K per doc is a window
    row_number over one shuffle on doc_id. Nothing is quadratic in
    corpus size and no stage materializes the vocabulary per executor
    beyond the broadcast dictionary.

    Parity: idf = ln((N+1)/(df+1)) + 1 (smoothed, sklearn-style) with
    the same IEEE-double op order on both engines; ranking ties break on
    term ASC, a total order within a document."""
    docs = _with_tokens(load_documents(spark, sf_dir)).select("doc_id", "tokens")
    terms = docs.select("doc_id", F.explode("tokens").alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").cast("long").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    n_docs = docs.agg(F.count("*").cast("double").alias("_n"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "_tfidf",
            F.col("tf")
            * (F.log((F.col("_n") + 1.0) / (F.col("df") + 1.0)) + 1.0),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("_tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOP_K)
        .select(
            "doc_id",
            F.col("rank").cast("long").alias("rank"),
            "term",
            "tf",
            "df",
            _r6(F.col("_tfidf"), 6).alias("tfidf"),
        )
    )


BPE_MERGE_TOP_K = 50


def q_doc_bpe_merges(spark, sf_dir):
    """First BPE-training iteration (Sennrich et al. 2016, "Neural
    Machine Translation of Rare Words with Subword Units"): pretokenize
    the corpus with the GPT-2-style regex, census the letter-run
    pretokens (leading space kept — the Ġ-marker convention), then count
    every adjacent character pair weighted by pretoken frequency and
    rank the top ``BPE_MERGE_TOP_K`` merge candidates.  This is the
    statistic a tokenizer-training pipeline computes over the whole
    corpus before the first merge is chosen.

    Restricted to ``^ ?[A-Za-z]+$`` pretokens: merges over letter runs
    are the ones BPE vocabularies are made of, and ASCII-only symbols
    keep character indexing engine-independent.

    Scale shape: the corpus collapses to a vocabulary-sized word census
    at the FIRST shuffle (words repeat at Zipf rates), pair extraction
    runs over distinct words only (JVM array ops — ``sequence`` →
    ``substring``), and the final ranking window runs over the pair
    alphabet (bounded ~(53)², a few kB) — the corpus-sized data is
    touched exactly once, by the pretokenizer scan."""
    docs = load_documents(spark, sf_dir)
    toks = F.regexp_extract_all(F.col("text"), F.lit(BPE_TOKEN_RE), 0)
    words = (
        docs.select(F.explode(toks).alias("w"))
        .filter(F.col("w").rlike("^ ?[A-Za-z]+$"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pair_counts = (
        words.filter(F.length("w") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(w) - 1),"
                    " i -> substring(w, i, 2))"
                )
            ).alias("pair"),
            "n",
        )
        .groupBy("pair")
        .agg(F.sum("n").cast("long").alias("n_occurrences"))
    )
    w_rank = Window.orderBy(F.desc("n_occurrences"), F.asc("pair"))
    return (
        pair_counts.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= BPE_MERGE_TOP_K)
        .select(F.col("rank").cast("long").alias("rank"), "pair", "n_occurrences")
    )


# ---------------------------------------------------------------------------
# Oracle SQL (DuckDB) over the pre-registered `documents` view
# ---------------------------------------------------------------------------

def _doc_cte() -> str:
    toks = minhash.sql_tokens("text")
    shingles = minhash.sql_shingles("tokens")
    hashes = minhash.sql_shingle_hashes("shingles")
    return f"""
WITH d0 AS (SELECT doc_id, text, {toks} AS tokens FROM documents),
d1 AS (SELECT *, {shingles} AS shingles FROM d0),
docs AS (SELECT *, {hashes} AS sh_hashes FROM d1)
"""


def oracle_sqls(sf: float = 0.01) -> dict[str, str]:
    """DuckDB mirrors. ``sf`` selects the source_files fixture scale for
    ``doc_line_dedup`` (the driver's harness runs at 0.01; the entry
    contract test at 0.001) — all other queries read the driver-provided
    ``documents`` view, which the harness already points at the right
    scale."""
    c = _doc_cte()
    sql = {}
    sql["doc_exact_dedup"] = """
SELECT sha256(text) AS text_sha, min(doc_id) AS rep_doc_id,
       count(*) AS n_docs
FROM documents GROUP BY 1"""

    sql["doc_token_stats"] = c + f"""
SELECT doc_id,
  len(tokens) AS n_tokens,
  len(regexp_extract_all(text, '{BPE_TOKEN_RE}')) AS n_bpe_tokens,
  len(list_distinct(tokens)) AS n_distinct_tokens,
  len(text) AS n_chars,
  (round(CASE WHEN len(tokens) > 0 THEN
    CAST(list_sum(list_transform(tokens, t -> len(t))) AS DOUBLE) / len(tokens)
    ELSE 0.0 END, 6) + 0.0) AS avg_token_len,
  (round(CASE WHEN len(tokens) > 0 THEN
    CAST(len(list_distinct(tokens)) AS DOUBLE) / len(tokens)
    ELSE 0.0 END, 6) + 0.0) AS type_token_ratio
FROM docs"""

    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    sql["doc_quality"] = c + f"""
SELECT doc_id,
  (round(alpha_r, 6) + 0.0) AS alpha_ratio,
  (round(digit_r, 6) + 0.0) AS digit_ratio,
  (round(space_r, 6) + 0.0) AS space_ratio,
  (round(stop_r, 6) + 0.0) AS stopword_ratio,
  (round(1.0 / (1.0 + exp(-(-1.0 + 3.0*alpha_r + 2.0*stop_r - 4.0*digit_r))), 6)
    + 0.0) AS quality
FROM (
  SELECT doc_id,
    CASE WHEN len(text) > 0 THEN
      CAST(len(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)/len(text)
      ELSE 0.0 END AS alpha_r,
    CASE WHEN len(text) > 0 THEN
      CAST(len(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)/len(text)
      ELSE 0.0 END AS digit_r,
    CASE WHEN len(text) > 0 THEN
      CAST(len(regexp_replace(text, '[^ ]', '', 'g')) AS DOUBLE)/len(text)
      ELSE 0.0 END AS space_r,
    CASE WHEN len(tokens) > 0 THEN
      CAST(len(list_filter(tokens, t -> list_contains([{stop_list}], t)))
           AS DOUBLE)/len(tokens) ELSE 0.0 END AS stop_r
  FROM docs
)"""

    lang_scores = ", ".join(
        f"CASE WHEN len(toks_d) > 0 THEN "
        f"CAST(len(list_intersect(toks_d, [{', '.join(repr(w) for w in prof)}])) "
        f"AS DOUBLE)/len(toks_d) ELSE 0.0 END AS s_{lang}"
        for lang, prof in LANG_PROFILES.items()
    )
    best = f"greatest({', '.join('s_' + la for la in LANG_ORDER)})"
    pred_chain = "CASE "
    for lang in LANG_ORDER:
        pred_chain += f"WHEN s_{lang} = {best} THEN '{lang}' "
    pred_chain += "END"
    sql["doc_langid"] = c + f"""
SELECT doc_id,
  CASE WHEN {best} > 0 THEN {pred_chain} ELSE 'unknown' END AS pred_lang,
  (round({best}, 6) + 0.0) AS score
FROM (
  SELECT doc_id, {lang_scores}
  FROM (SELECT doc_id, list_distinct(tokens) AS toks_d FROM docs)
)"""

    bit_sum = " + ".join(
        f"(CASE WHEN list_sum(list_transform(sh_hashes, "
        f"h -> 2*((h // {1 << b}) % 2) - 1)) > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    sql["doc_simhash"] = c + f"""
SELECT doc_id, simhash,
  (simhash // {1 << 0}) % 32768 AS band0,
  (simhash // {1 << 15}) % 32768 AS band1,
  (simhash // {1 << 30}) % 32768 AS band2,
  (simhash // {1 << 45}) % 32768 AS band3
FROM (
  SELECT doc_id,
    CASE WHEN len(sh_hashes) > 0 THEN ({bit_sum}) ELSE 0 END AS simhash
  FROM docs
)"""

    sig = minhash.sql_minhash_signature("sh_hashes")
    bands = minhash.sql_band_keys("msig")
    lsh_cte = c + f""",
sig AS (SELECT doc_id, sh_hashes, {sig} AS msig FROM docs),
bands AS (SELECT doc_id, sh_hashes, {bands} AS band_keys FROM sig),
memb AS (SELECT doc_id, sh_hashes, unnest(band_keys) AS bk FROM bands),
nd_pairs AS (
  SELECT left_id, right_id, jaccard FROM (
    SELECT DISTINCT l.doc_id AS left_id, r.doc_id AS right_id,
      CAST(len(list_intersect(l.sh_hashes, r.sh_hashes)) AS DOUBLE)
        / (len(l.sh_hashes) + len(r.sh_hashes)
           - len(list_intersect(l.sh_hashes, r.sh_hashes))) AS jaccard
    FROM memb l JOIN memb r ON l.bk = r.bk AND l.doc_id < r.doc_id
  ) WHERE jaccard >= {NEAR_DUP_TAU}
)"""
    sql["doc_near_dup_pairs"] = lsh_cte + """
SELECT left_id, right_id, (round(jaccard, 6) + 0.0) AS jaccard FROM nd_pairs"""

    sql["doc_dup_clusters"] = (
        lsh_cte
        + """,
sym AS (
  SELECT left_id AS src, right_id AS dst FROM nd_pairs
  UNION
  SELECT right_id AS src, left_id AS dst FROM nd_pairs
),
walk(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT s.dst, w.lbl FROM walk w JOIN sym s ON s.src = w.node
)
SELECT node AS doc_id, min(lbl) AS cluster_id FROM walk GROUP BY node"""
    ).replace("WITH d0 AS", "WITH RECURSIVE d0 AS", 1)

    ngrams = sql_char_ngrams("text")
    g_hashes = minhash.sql_shingle_hashes("grams")
    g_sig = minhash.sql_minhash_signature("g_h")
    g_bands = minhash.sql_band_keys("gsig")
    sql["doc_ngram_jaccard"] = f"""
WITH g0 AS (SELECT doc_id, {ngrams} AS grams FROM documents),
g1 AS (SELECT doc_id, {g_hashes} AS g_h FROM g0),
g2 AS (SELECT doc_id, g_h, {g_sig} AS gsig FROM g1),
g3 AS (SELECT doc_id, g_h, {g_bands} AS band_keys FROM g2),
gmemb AS (SELECT doc_id, g_h, unnest(band_keys) AS bk FROM g3),
gpairs AS (
  SELECT DISTINCT l.doc_id AS left_id, r.doc_id AS right_id,
    CAST(len(list_intersect(l.g_h, r.g_h)) AS DOUBLE)
      / (len(l.g_h) + len(r.g_h) - len(list_intersect(l.g_h, r.g_h))) AS jaccard
  FROM gmemb l JOIN gmemb r ON l.bk = r.bk AND l.doc_id < r.doc_id
)
SELECT left_id, right_id, (round(jaccard, 6) + 0.0) AS jaccard
FROM gpairs WHERE jaccard >= {NGRAM_TAU}"""

    emb = scoring.sql_embedding("sh_hashes")
    band_selects = []
    for j in range(EMB_ND_BANDS):
        bits = []
        for r_ in range(EMB_ND_ROWS):
            plane = EMB_ND_PLANES[j * EMB_ND_ROWS + r_]
            arr = ", ".join(repr(x) for x in plane)
            bits.append(
                f"(CASE WHEN list_dot_product(v, [{arr}]) > 0 "
                f"THEN {1 << r_} ELSE 0 END)"
            )
        band_selects.append(
            f"SELECT doc_id, v, 'b{j}:' || CAST(({' + '.join(bits)}) AS VARCHAR)"
            f" AS bk FROM emb"
        )
    emb_memb = "\nUNION ALL\n".join(band_selects)
    sql["doc_emb_near_dup"] = c + f""",
emb AS (SELECT doc_id, {emb} AS v FROM docs),
emb_memb AS ({emb_memb}),
cand AS (
  SELECT DISTINCT l.doc_id AS left_id, r.doc_id AS right_id
  FROM emb_memb l JOIN emb_memb r ON l.bk = r.bk AND l.doc_id < r.doc_id
),
emb_scored AS (
  SELECT p.left_id, p.right_id, list_dot_product(a.v, b.v) AS cosine
  FROM cand p JOIN emb a ON a.doc_id = p.left_id
              JOIN emb b ON b.doc_id = p.right_id
)
SELECT left_id, right_id, (round(cosine, 6) + 0.0) AS cosine
FROM emb_scored WHERE cosine >= {EMB_ND_TAU}"""

    grams = minhash.sql_grams("tokens", WINNOW_K)
    gh = f"list_transform(grams, __g -> {minhash.sql_base_hash('__g')})"
    sql["doc_winnow_fingerprints"] = f"""
WITH d0 AS (SELECT doc_id, {minhash.sql_tokens('text')} AS tokens FROM documents),
d1 AS (SELECT doc_id, {grams} AS grams FROM d0),
d2 AS (SELECT doc_id, {gh} AS gh FROM d1),
d3 AS (
  SELECT doc_id,
    CASE WHEN len(gh) >= {WINNOW_W} THEN
      list_distinct(list_transform(range(1, len(gh) - {WINNOW_W} + 2),
                    i -> list_min(gh[i:i+{WINNOW_W - 1}])))
    ELSE list_distinct(gh) END AS fps
  FROM d2
)
SELECT doc_id, unnest(fps) AS fingerprint FROM d3"""

    sql["doc_winnow_clone_pairs"] = (
        sql["doc_winnow_fingerprints"].replace(
            "SELECT doc_id, unnest(fps) AS fingerprint FROM d3",
            f""" , fpq AS (SELECT doc_id, unnest(fps) AS fingerprint FROM d3),
fdf AS (SELECT fingerprint, count(*) AS dfc FROM fpq GROUP BY 1),
fp AS (SELECT f.doc_id, f.fingerprint FROM fpq f
       JOIN fdf USING (fingerprint) WHERE dfc <= {CLONE_MAX_DF}),
sizes AS (SELECT doc_id, count(*) AS n_fp FROM fp GROUP BY 1),
p AS (SELECT l.doc_id AS left_id, r.doc_id AS right_id,
             count(*) AS n_shared
      FROM fp l JOIN fp r
        ON l.fingerprint = r.fingerprint AND l.doc_id < r.doc_id
      GROUP BY 1, 2)
SELECT left_id, right_id, n_shared::BIGINT AS n_shared,
       round(n_shared::DOUBLE / least(sl.n_fp, sr.n_fp), 6) + 0.0
         AS containment
FROM p JOIN sizes sl ON sl.doc_id = left_id
       JOIN sizes sr ON sr.doc_id = right_id
WHERE n_shared >= {CLONE_MIN_SHARED}""",
        )
    )

    sql["doc_tfidf_top_terms"] = c + f"""
, terms AS (SELECT doc_id, unnest(tokens) AS term FROM docs),
tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*)::DOUBLE AS n FROM docs),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
    tf.tf * (ln((n.n + 1.0) / (dfq.df + 1.0)) + 1.0) AS tfidf_raw
  FROM tf JOIN dfq USING (term) CROSS JOIN n
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY tfidf_raw DESC, term ASC
  ) AS rank
  FROM scored
)
SELECT doc_id, rank, term, tf, df,
  round(tfidf_raw, 6) + 0.0 AS tfidf
FROM ranked WHERE rank <= {TFIDF_TOP_K}"""

    sql["doc_repetition"] = c + """
SELECT doc_id,
  len(tokens) AS n_tokens,
  (round(CASE WHEN len(tokens) > 0 THEN
     CAST(len(tokens) - len(list_distinct(tokens)) AS DOUBLE) / len(tokens)
     ELSE 0.0 END, 6) + 0.0) AS dup_token_frac,
  (round(CASE WHEN len(tokens) > 0 THEN
     CAST(list_max(list_transform(list_distinct(tokens),
            t -> len(list_filter(tokens, x -> x = t)))) AS DOUBLE)
       / len(tokens)
     ELSE 0.0 END, 6) + 0.0) AS top_token_frac,
  (round(CASE WHEN len(tokens) >= 2 THEN
     CAST(len(bg) - len(list_distinct(bg)) AS DOUBLE) / len(bg)
     ELSE 0.0 END, 6) + 0.0) AS dup_bigram_frac
FROM (
  SELECT doc_id, tokens,
    list_transform(range(1, len(tokens)),
                   i -> tokens[i] || ' ' || tokens[i+1]) AS bg
  FROM docs
)"""

    thr_cases = " ".join(
        f"WHEN '{lang}' THEN '{_rate_threshold_hex(SAMPLE_RATES[lang])}'"
        for lang in sorted(SAMPLE_RATES)
    )
    rate_cases = " ".join(
        f"WHEN '{lang}' THEN {SAMPLE_RATES[lang]!r}::DOUBLE"
        for lang in sorted(SAMPLE_RATES)
    )
    sql["doc_stratified_sample"] = f"""
SELECT doc_id, lang, bucket, rate FROM (
  SELECT doc_id, lang,
    substr(md5(doc_id::VARCHAR || ':' || lang), 1, 8) AS bucket,
    CASE lang {rate_cases} ELSE {SAMPLE_DEFAULT_RATE!r}::DOUBLE END AS rate,
    CASE lang {thr_cases}
      ELSE '{_rate_threshold_hex(SAMPLE_DEFAULT_RATE)}' END AS thr
  FROM documents
) WHERE bucket < thr"""

    # quality mirror of oracle_sqls()["doc_quality"]'s score column only
    qual_cte = f""",
qual AS (
  SELECT doc_id,
    (round(1.0 / (1.0 + exp(-(-1.0 + 3.0*alpha_r + 2.0*stop_r - 4.0*digit_r))), 6)
      + 0.0) AS quality
  FROM (
    SELECT doc_id,
      CASE WHEN len(text) > 0 THEN
        CAST(len(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)/len(text)
        ELSE 0.0 END AS alpha_r,
      CASE WHEN len(text) > 0 THEN
        CAST(len(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)/len(text)
        ELSE 0.0 END AS digit_r,
      CASE WHEN len(tokens) > 0 THEN
        CAST(len(list_filter(tokens, t -> list_contains([{stop_list}], t)))
             AS DOUBLE)/len(tokens) ELSE 0.0 END AS stop_r
    FROM docs
  )
)"""
    sql["doc_canonical_pick"] = (
        lsh_cte
        + """,
sym AS (
  SELECT left_id AS src, right_id AS dst FROM nd_pairs
  UNION
  SELECT right_id AS src, left_id AS dst FROM nd_pairs
),
walk(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT s.dst, w.lbl FROM walk w JOIN sym s ON s.src = w.node
),
clusters AS (SELECT node AS doc_id, min(lbl) AS cluster_id FROM walk GROUP BY node)"""
        + qual_cte
        + """,
ranked AS (
  SELECT c.cluster_id, c.doc_id, q.quality,
    row_number() OVER (
      PARTITION BY c.cluster_id ORDER BY q.quality DESC, c.doc_id ASC
    ) AS rnk,
    count(*) OVER (PARTITION BY c.cluster_id) AS n_members
  FROM clusters c JOIN qual q USING (doc_id)
)
SELECT cluster_id, doc_id AS canonical_doc_id, quality, n_members
FROM ranked WHERE rnk = 1"""
    ).replace("WITH d0 AS", "WITH RECURSIVE d0 AS", 1)

    from blink_spark.fixtures import fixture_path

    sql["doc_line_dedup"] = f"""
WITH src AS (SELECT * FROM read_parquet('{fixture_path(sf)}')),
l0 AS (
  SELECT sha256(repo || chr(0) || path || chr(0) || commit) AS file_id,
         trim(line) AS line
  FROM src, unnest(string_split(content, chr(10))) AS u(line)
),
l1 AS (SELECT file_id, sha256(line) AS lh FROM l0 WHERE len(line) > 0),
l2 AS (SELECT file_id, count(*) OVER (PARTITION BY lh) AS n_occ FROM l1),
d AS (
  SELECT file_id, count(*) AS n_lines,
         CAST(sum(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_lines
  FROM l2 GROUP BY file_id
)
SELECT file_id, n_lines, n_dup_lines,
  round(n_dup_lines::DOUBLE / n_lines, 6) + 0.0 AS dup_line_frac
FROM d"""

    decon_sh = minhash.sql_shingles("tokens", k=DECON_N)
    sql["doc_decontamination"] = f"""
WITH t0 AS (SELECT doc_id, {minhash.sql_tokens('text')} AS tokens
            FROM documents),
sh AS (
  SELECT doc_id, unnest({decon_sh}) AS g FROM t0
),
bench AS (
  SELECT DISTINCT g AS bg FROM sh WHERE doc_id % {DECON_BENCH_MOD} = 0
),
hits AS (
  SELECT s.doc_id, b.bg
  FROM sh s LEFT JOIN bench b ON s.g = b.bg
  WHERE s.doc_id % {DECON_BENCH_MOD} <> 0
),
d AS (
  SELECT doc_id, count(*) AS n_shingles,
         CAST(sum(CASE WHEN bg IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_contaminated
  FROM hits GROUP BY doc_id
)
SELECT doc_id, n_shingles, n_contaminated,
  round(n_contaminated::DOUBLE / n_shingles, 6) + 0.0 AS contamination_frac
FROM d"""

    sql["doc_pii_census"] = f"""
WITH aug AS (
  SELECT doc_id,
    text
    || CASE WHEN doc_id % {PII_EMAIL_MOD} = 0 THEN
         ' contact user' || doc_id::VARCHAR || '@example.com or ops.admin+'
         || doc_id::VARCHAR || '@mail.example.org' ELSE '' END
    || CASE WHEN doc_id % {PII_IP_MOD} = 0 THEN
         ' from 10.' || (doc_id % 256)::VARCHAR || '.0.'
         || ((doc_id * 7) % 256)::VARCHAR
         || ' and host 192.168.1.' || (doc_id % 100)::VARCHAR ELSE '' END
    || CASE WHEN doc_id % {PII_PHONE_MOD} = 0 THEN
         ' call +1 555 ' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
         ELSE '' END AS aug
  FROM documents
),
c AS (
  SELECT doc_id, aug,
    len(regexp_extract_all(aug, '{PII_EMAIL_RE}')) AS n_emails,
    len(regexp_extract_all(aug, '{PII_IP_RE}')) AS n_ips,
    len(regexp_extract_all(aug, '{PII_PHONE_RE}')) AS n_phones,
    regexp_replace(
      regexp_replace(
        regexp_replace(aug, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
        '{PII_IP_RE}', '<IP>', 'g'),
      '{PII_PHONE_RE}', '<PHONE>', 'g') AS redacted
  FROM aug
)
SELECT doc_id, n_emails, n_ips, n_phones,
  (n_emails + n_ips + n_phones) AS n_pii,
  sha256(redacted) AS redacted_sha
FROM c"""

    sql["doc_trigram_logprob"] = f"""
WITH g0 AS (
  SELECT doc_id,
    list_transform(
      range(1, greatest(len(text) - {TRIGRAM_N - 1}, 1) + 1),
      i -> substring(text, i, {TRIGRAM_N})) AS tris
  FROM documents
),
g AS (SELECT doc_id, unnest(tris) AS g FROM g0),
counts AS (SELECT g, count(*) AS cnt FROM g GROUP BY g),
tot AS (SELECT sum(cnt)::DOUBLE AS total FROM counts),
per AS (
  SELECT doc_id, count(*) AS n_trigrams, avg(log2(cnt)) AS ml
  FROM g JOIN counts USING (g) GROUP BY doc_id
)
SELECT doc_id, n_trigrams,
  round(log2(total) - ml, 6) + 0.0 AS xent_bits
FROM per, tot"""

    sql["doc_mixture_allocation"] = c + f""",
r AS (
  SELECT d.doc_id, dd.lang, len(d.tokens) AS n_tok_cnt,
    CASE WHEN len(d.text) > 0 THEN
      CAST(len(regexp_replace(d.text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
        / len(d.text) ELSE 0.0 END AS alpha_r,
    CASE WHEN len(d.text) > 0 THEN
      CAST(len(regexp_replace(d.text, '[^0-9]', '', 'g')) AS DOUBLE)
        / len(d.text) ELSE 0.0 END AS digit_r,
    CASE WHEN len(d.tokens) > 0 THEN
      CAST(len(list_filter(d.tokens, t -> list_contains([{stop_list}], t)))
           AS DOUBLE) / len(d.tokens) ELSE 0.0 END AS stop_r
  FROM docs d JOIN documents dd USING (doc_id)
),
q AS (
  SELECT doc_id, lang, n_tok_cnt,
    1.0 / (1.0 + exp(-(-1.0 + 3.0*alpha_r + 2.0*stop_r - 4.0*digit_r)))
      AS quality
  FROM r
),
b AS (
  SELECT lang,
    CASE WHEN quality >= {MIX_Q_HI} THEN 'high'
         WHEN quality >= {MIX_Q_LO} THEN 'mid'
         ELSE 'low' END AS quality_bucket,
    count(*) AS n_docs,
    sum(n_tok_cnt)::BIGINT AS n_tokens
  FROM q GROUP BY 1, 2
)
SELECT lang, quality_bucket, n_docs, n_tokens,
  round(n_tokens::DOUBLE / sum(n_tokens) OVER (), 6) + 0.0 AS token_share
FROM b"""

    qrows = ", ".join(
        f"({qid}, '{t}')"
        for qid, q in BM25_QUERIES
        for t in dict.fromkeys(q.split())
    )
    sql["doc_bm25_search"] = f"""
WITH t0 AS (SELECT doc_id, {minhash.sql_tokens('text')} AS tokens
            FROM documents),
toks AS (SELECT doc_id, unnest(tokens) AS term FROM t0),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
na AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
q(query_id, term) AS (VALUES {qrows}),
hits AS (
  SELECT q.query_id, tf.doc_id,
    ln((na.n_docs - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
      * (tf.tf * ({BM25_K1} + 1))
      / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / na.avgdl))
      AS part
  FROM tf JOIN q USING (term) JOIN dft USING (term)
       JOIN dl USING (doc_id), na
),
scored AS (
  SELECT query_id, doc_id, sum(part) AS score
  FROM hits GROUP BY 1, 2
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY score DESC, doc_id ASC
  ) AS rank FROM scored
)
SELECT query_id, rank, doc_id, (round(score, 6) + 0.0) AS score
FROM r WHERE rank <= {BM25_TOP_K}"""

    pivot_cols = ",\n       ".join(
        f"count(*) FILTER (WHERE lang = '{lg}') AS n_{lg},\n       "
        f"coalesce(sum(n_chars) FILTER (WHERE lang = '{lg}'), 0)::BIGINT "
        f"AS chars_{lg}"
        for lg in PIVOT_LANGS
    )
    sql["doc_lang_source_pivot"] = f"""
SELECT source,
       {pivot_cols}
FROM documents GROUP BY source"""

    sql["doc_chunk_sliding"] = c + f"""
, d AS (SELECT doc_id, tokens, len(tokens) AS n FROM docs
        WHERE len(tokens) > 0),
s AS (SELECT doc_id, tokens,
             unnest(range(0, n, {CHUNK_STRIDE})) AS start FROM d)
SELECT doc_id,
       (start // {CHUNK_STRIDE})::BIGINT AS chunk_idx,
       len(tokens[start + 1 : start + {CHUNK_TOKENS}])::BIGINT
         AS n_chunk_tokens,
       sha256(array_to_string(tokens[start + 1 : start + {CHUNK_TOKENS}],
                              ' ')) AS chunk_sha
FROM s"""

    sig_sql = minhash.sql_minhash_signature("sh_hashes")
    inter = "len(list_intersect(l.sh_hashes, r.sh_hashes))"
    tune_ctes = [f"""
, s AS (SELECT doc_id, sh_hashes, {sig_sql} AS msig FROM docs),
truth AS (
  SELECT l.doc_id AS a, r.doc_id AS b
  FROM s l JOIN s r ON l.doc_id < r.doc_id
  WHERE CAST({inter} AS DOUBLE)
        / (len(l.sh_hashes) + len(r.sh_hashes) - {inter})
        >= {NEAR_DUP_TAU}
)"""]
    tune_rows = []
    for bnd, rws in LSH_TUNE_CONFIGS:
        bk = minhash.sql_band_keys("msig", bnd, rws)
        tune_ctes.append(f""",
mb{bnd} AS (SELECT doc_id, unnest({bk}) AS bk FROM s),
cd{bnd} AS (SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
            FROM mb{bnd} l JOIN mb{bnd} r
              ON l.bk = r.bk AND l.doc_id < r.doc_id),
st{bnd} AS (SELECT (SELECT count(*) FROM cd{bnd}) AS n_candidates,
                   (SELECT count(*) FROM truth) AS n_true,
                   (SELECT count(*) FROM cd{bnd} JOIN truth USING (a, b))
                     AS n_hits)""")
        tune_rows.append(f"""
SELECT {bnd}::BIGINT AS bands, {rws}::BIGINT AS rows_per_band,
       n_candidates::BIGINT AS n_candidates, n_true::BIGINT AS n_true,
       n_hits::BIGINT AS n_hits,
       round(n_hits::DOUBLE / n_true, 6) + 0.0 AS recall,
       round(CASE WHEN n_candidates > 0
             THEN n_hits::DOUBLE / n_candidates ELSE -1.0 END, 6) + 0.0
         AS precision
FROM st{bnd}""")
    sql["doc_lsh_band_tuning"] = (
        c + "".join(tune_ctes) + "\nUNION ALL".join(tune_rows)
    )

    # the same greedy fill state machine, replayed as a recursive CTE
    # stepping row_number-by-row_number within each shard
    sql["doc_pack_sequences"] = c + f"""
, d AS (
  SELECT doc_id,
         least(len(tokens), {PACK_BUDGET})::BIGINT AS n_tokens,
         (doc_id % {PACK_SHARDS})::BIGINT AS shard
  FROM docs
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
  FROM d
),
p AS (
  WITH RECURSIVE walk AS (
    SELECT shard, rn, doc_id, n_tokens,
           0::BIGINT AS seq_id, 0::BIGINT AS pos_in_seq,
           n_tokens AS fill
    FROM r WHERE rn = 1
    UNION ALL
    SELECT r.shard, r.rn, r.doc_id, r.n_tokens,
           CASE WHEN w.fill + r.n_tokens > {PACK_BUDGET}
                THEN w.seq_id + 1 ELSE w.seq_id END,
           CASE WHEN w.fill + r.n_tokens > {PACK_BUDGET}
                THEN 0::BIGINT ELSE w.pos_in_seq + 1 END,
           CASE WHEN w.fill + r.n_tokens > {PACK_BUDGET}
                THEN r.n_tokens ELSE w.fill + r.n_tokens END
    FROM walk w JOIN r ON r.shard = w.shard AND r.rn = w.rn + 1
  )
  SELECT * FROM walk
)
SELECT doc_id, shard, seq_id, pos_in_seq, n_tokens FROM p"""

    sql["doc_bpe_merges"] = f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(text, '{BPE_TOKEN_RE}')) AS w
  FROM documents
),
words AS (
  SELECT w, count(*) AS n FROM toks
  WHERE regexp_full_match(w, ' ?[A-Za-z]+')
  GROUP BY w
),
prs AS (
  SELECT unnest(list_transform(range(1, length(w)),
                               i -> w[CAST(i AS INTEGER):CAST(i AS INTEGER) + 1]))
           AS pair,
         n
  FROM words WHERE length(w) >= 2
),
pc AS (SELECT pair, CAST(sum(n) AS BIGINT) AS n_occurrences FROM prs GROUP BY pair)
SELECT * FROM (
  SELECT row_number() OVER (ORDER BY n_occurrences DESC, pair ASC) AS rank,
         pair, n_occurrences
  FROM pc
) WHERE rank <= {BPE_MERGE_TOP_K}"""
    return sql


def q_doc_line_dedup(spark, sf_dir):
    """CCNet-style line-level (paragraph) dedup census over the
    source-code corpus: per document, the fraction of its non-empty
    trimmed lines that occur ≥2 times corpus-wide — the signal CCNet/C4
    use to strip boilerplate (license headers, nav bars) before training.
    Runs on the ``source_files`` fixture because its content is genuinely
    multi-line (the ``documents`` fixture is single-line prose).

    Plan (100 TB): explode to one row per line, key every line by its
    sha256 (fixed-width shuffle key, no long-string comparisons), then
    ONE shuffle on the hash computes corpus occurrence counts via a
    partition window — no groupBy + join-back second shuffle — and a
    final shuffle on file_id rolls up the per-document census. Line
    payloads never survive the projection; only (file_id, lh) shuffles.
    """
    from blink_spark import ingest
    from blink_spark.fixtures import ensure_fixture, sf_from_dir

    src = spark.read.parquet(ensure_fixture(sf_from_dir(sf_dir)))
    lines = (
        src.select(
            ingest.file_id_col().alias("file_id"),
            F.explode(F.split("content", "\n", -1)).alias("raw"),
        )
        .select("file_id", F.trim(F.col("raw")).alias("line"))
        .filter(F.length("line") > 0)
        .select("file_id", F.sha2(F.col("line"), 256).alias("lh"))
    )
    occ = lines.withColumn(
        "n_occ", F.count("*").over(Window.partitionBy("lh"))
    )
    per_doc = occ.groupBy("file_id").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(F.when(F.col("n_occ") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_dup_lines"),
    )
    return per_doc.select(
        "file_id",
        "n_lines",
        "n_dup_lines",
        _r6(
            (F.col("n_dup_lines") / F.col("n_lines")).cast("double"), 6
        ).alias("dup_line_frac"),
    )


# Decontamination: token n-gram width + the deterministic "benchmark"
# subset (doc_id % MOD == 0 stands in for an eval suite's documents).
DECON_N = 8
DECON_BENCH_MOD = 50


def q_doc_decontamination(spark, sf_dir):
    """Eval-decontamination census: for every non-benchmark document, how
    many of its distinct token 8-grams also appear in any benchmark
    document (doc_id % 50 == 0 is the stand-in eval suite). The standard
    pre-training hygiene op (GPT-3 appendix C / PaLM use 8-13 token
    n-gram collision against eval sets).

    Plan (100 TB): the benchmark side is an eval suite — thousands of
    documents vs billions — so its distinct-shingle set is BROADCAST and
    the corpus side probes it with a broadcast LEFT join: the corpus
    never shuffles on shingle text. Per-doc rollup is one shuffle on
    doc_id.
    """
    docs = load_documents(spark, sf_dir)
    toks = minhash.tokens_col(F.col("text"))
    sh = docs.select(
        "doc_id",
        F.explode(minhash.shingles_col(toks, k=DECON_N)).alias("g"),
    )
    is_bench = (F.col("doc_id") % DECON_BENCH_MOD) == 0
    bench = sh.filter(is_bench).select(F.col("g").alias("bg")).distinct()
    corpus = sh.filter(~is_bench)
    hits = corpus.join(F.broadcast(bench), corpus.g == bench.bg, "left")
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum(F.when(F.col("bg").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_contaminated"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_contaminated",
            _r6(
                (F.col("n_contaminated") / F.col("n_shingles")).cast("double"),
                6,
            ).alias("contamination_frac"),
        )
    )


# --- PII census/redaction -------------------------------------------------
# The driver's documents are synthetic word salad with zero natural PII, so
# the query deterministically augments a subset of rows with synthetic
# emails/IPs/phones derived from doc_id (the same stand-in pattern as
# DECON_BENCH_MOD) — built identically in Spark and DuckDB, so the detector
# and redactor are exercised on real positives AND negatives. Regexes stick
# to character classes + bounded quantifiers, a dialect Java regex and RE2
# agree on.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\+\d{1,2} \d{3} \d{4}"
PII_EMAIL_MOD, PII_IP_MOD, PII_PHONE_MOD = 7, 11, 13


def _pii_augmented_col() -> Column:
    d = F.col("doc_id")
    s = d.cast("string")
    email = F.when(
        d % PII_EMAIL_MOD == 0,
        F.concat(
            F.lit(" contact user"), s, F.lit("@example.com or ops.admin+"),
            s, F.lit("@mail.example.org"),
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        d % PII_IP_MOD == 0,
        F.concat(
            F.lit(" from 10."), (d % 256).cast("string"),
            F.lit(".0."), ((d * 7) % 256).cast("string"),
            F.lit(" and host 192.168.1."), (d % 100).cast("string"),
        ),
    ).otherwise(F.lit(""))
    phone = F.when(
        d % PII_PHONE_MOD == 0,
        F.concat(
            F.lit(" call +1 555 "), F.lpad((d % 10000).cast("string"), 4, "0")
        ),
    ).otherwise(F.lit(""))
    return F.concat(F.col("text"), email, ip, phone)


def q_doc_pii_census(spark, sf_dir):
    """PII detection + redaction census: per document, how many
    emails/IPv4s/phone numbers a regex detector finds, plus the sha256 of
    the REDACTED text (each class replaced by a <TYPE> token) — so the
    redaction transform itself, not just the counter, is oracle-pinned.

    Plan (100 TB): pure column expressions (regexp_count/replace run in
    the JVM inside whole-stage codegen); no shuffle at all — the census
    is embarrassingly parallel over document partitions, and only the
    64-char sha leaves the scan, never the redacted payload."""
    docs = load_documents(spark, sf_dir).select("doc_id", "text")
    aug = docs.withColumn("aug", _pii_augmented_col())
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("aug"), PII_EMAIL_RE, "<EMAIL>"),
            PII_IP_RE,
            "<IP>",
        ),
        PII_PHONE_RE,
        "<PHONE>",
    )
    n_e = F.regexp_count(F.col("aug"), F.lit(PII_EMAIL_RE)).cast("long")
    n_i = F.regexp_count(F.col("aug"), F.lit(PII_IP_RE)).cast("long")
    n_p = F.regexp_count(F.col("aug"), F.lit(PII_PHONE_RE)).cast("long")
    return aug.select(
        "doc_id",
        n_e.alias("n_emails"),
        n_i.alias("n_ips"),
        n_p.alias("n_phones"),
        (n_e + n_i + n_p).alias("n_pii"),
        F.sha2(redacted, 256).alias("redacted_sha"),
    )


# --- char-trigram LM quality proxy -----------------------------------------
TRIGRAM_N = 3


def q_doc_trigram_logprob(spark, sf_dir):
    """KenLM-ish perplexity proxy: a unigram LM over character trigrams
    trained on the corpus itself, then each document scored by its mean
    trigram cross-entropy in bits (low = typical of the corpus, high =
    outlier — the standard cheap quality filter before a real LM exists).

    Plan (100 TB): pass 1 counts trigrams (explode → map-side partial →
    one shuffle on the trigram; the state is the trigram VOCABULARY,
    ~|charset|³ regardless of corpus size). Pass 2 probes that vocabulary
    with a BROADCAST join (the model is tiny by construction) and rolls
    up per document — one shuffle on doc_id. The corpus total is a
    1-row broadcast. Exactly the two-pass shape of TF-IDF above."""
    docs = load_documents(spark, sf_dir).select("doc_id", "text")
    ln = F.length("text")
    idx = F.sequence(F.lit(1), F.greatest(ln - F.lit(TRIGRAM_N - 1), F.lit(1)))
    tri = F.transform(idx, lambda i: F.col("text").substr(i, F.lit(TRIGRAM_N)))
    g = docs.select("doc_id", F.explode(tri).alias("g"))
    counts = g.groupBy("g").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").cast("double").alias("total"))
    per_doc = (
        g.join(F.broadcast(counts), "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_trigrams"),
            F.avg(F.log2("cnt")).alias("mean_log_cnt"),
        )
    )
    return per_doc.crossJoin(F.broadcast(total)).select(
        "doc_id",
        "n_trigrams",
        _r6(F.log2("total") - F.col("mean_log_cnt"), 6).alias("xent_bits"),
    )


# --- training-mixture allocation census -------------------------------------
MIX_Q_HI = 0.835  # ~75th pct of the corpus quality score
MIX_Q_LO = 0.825  # ~25th pct


def q_doc_mixture_allocation(spark, sf_dir):
    """Training-mixture census: token budget per (lang, quality bucket) —
    the table a data-mixture planner reads to weight sources before
    sampling (the Pile/Dolma-style composition report). Buckets reuse the
    exact quality expression of ``doc_quality``.

    Plan (100 TB): one narrow scan → map-side partial agg → ONE shuffle
    on the tiny (lang, bucket) key; the share computation is a window
    over the already-aggregated ~|langs|×3-row result, essentially free."""
    df = _with_tokens(load_documents(spark, sf_dir))
    q = _quality_parts()["quality"]
    bucket = (
        F.when(q >= MIX_Q_HI, F.lit("high"))
        .when(q >= MIX_Q_LO, F.lit("mid"))
        .otherwise(F.lit("low"))
    )
    agg = (
        df.groupBy(F.col("lang"), bucket.alias("quality_bucket"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.size("tokens")).cast("long").alias("n_tokens"),
        )
    )
    w = Window.partitionBy()
    return agg.select(
        "lang",
        "quality_bucket",
        "n_docs",
        "n_tokens",
        _r6(
            (F.col("n_tokens") / F.sum("n_tokens").over(w)).cast("double"), 6
        ).alias("token_share"),
    )


# --- BM25 keyword retrieval --------------------------------------------------
# The full-scale analog of the reference's Solr keyword-candidate source
# (blink/candidate_retrieval/ J5): an inverted-index scoring pass instead
# of an external search service. Query strings are fixed constants (a
# search workload is part of the query, like TOP_K elsewhere).
BM25_QUERIES = [
    (0, "spark table scan"),
    (1, "customer order value"),
    (2, "window batch stream"),
]
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 10


def q_doc_bm25_search(spark, sf_dir):
    """BM25 keyword retrieval: score every document against a fixed
    3-query workload, return the top-10 per query (score desc, doc_id
    asc — exact ties break deterministically because equal integer
    inputs produce bit-equal scores in both engines).

    Plan (100 TB): explode tokens → ONE combinable shuffle builds the
    (doc_id, term, tf) postings; document frequencies and lengths are
    VOCABULARY- and CORPUS-ROW-sized aggregates of that table; the query
    side is a handful of terms — broadcast — so the postings table is
    filtered to query terms BEFORE any further shuffle (an inverted-
    index probe, never a corpus×queries cross). Top-k is one window
    over the per-query candidate set."""
    docs = load_documents(spark, sf_dir).select("doc_id", "text")
    toks = docs.select(
        "doc_id", F.explode(minhash.tokens_col(F.col("text"))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    n_and_avg = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    qterms = spark.createDataFrame(
        [
            (qid, t)
            for qid, q in BM25_QUERIES
            for t in dict.fromkeys(q.split())  # distinct, order-stable
        ],
        "query_id long, term string",
    )
    hits = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(df_t), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(n_and_avg))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    tf_norm = (F.col("tf") * (BM25_K1 + 1)) / (
        F.col("tf")
        + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    scored = hits.groupBy("query_id", "doc_id").agg(
        F.sum(idf * tf_norm).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BM25_TOP_K)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "doc_id",
            _r6(F.col("score"), 6).alias("score"),
        )
    )


# --- MinHash-LSH banding calibration -----------------------------------------
LSH_TUNE_CONFIGS = [(64, 1), (32, 2), (16, 4), (8, 8)]  # bands × rows = 64


def q_doc_lsh_band_tuning(spark, sf_dir):
    """Banding calibration for the MinHash-LSH near-dup blocker: for
    each (bands, rows-per-band) split of the 64-perm signature, the
    candidate volume and recall/precision against exact-Jaccard truth
    at τ=NEAR_DUP_TAU — the S-curve table an operator reads to pick the
    banding before a corpus-scale dedup run (the `emb_ann_recall`
    analog for the text path).

    Scale note: the exact-truth side is all-pairs BY DESIGN and runs on
    a SAMPLE — banding is calibrated on a few thousand documents, then
    applied at corpus scale where only the banded bucket-join ever
    executes.  The tiny sample side broadcasts (BroadcastNestedLoopJoin,
    never a shuffled cartesian); every candidate set is a keyed
    bucket-join exactly like the production blocker."""
    df = (
        _with_tokens(load_documents(spark, sf_dir))
        .select("doc_id", "sh_hashes")
        .withColumn(
            "msig", minhash.minhash_signature_col(F.col("sh_hashes"))
        )
        .persist()
    )
    l = df.select(F.col("doc_id").alias("a"), F.col("sh_hashes").alias("l_h"))
    r = df.select(F.col("doc_id").alias("b"), F.col("sh_hashes").alias("r_h"))
    truth = (
        l.crossJoin(F.broadcast(r))
        .filter(F.col("a") < F.col("b"))
        .withColumn("j", scoring.jaccard_col(F.col("l_h"), F.col("r_h")))
        .filter(F.col("j") >= NEAR_DUP_TAU)
        .select("a", "b")
        .persist()
    )
    out = None
    for bnd, rws in LSH_TUNE_CONFIGS:
        memb = df.select(
            "doc_id",
            F.explode(
                minhash.band_keys_col(F.col("msig"), bnd, rws)
            ).alias("bk"),
        )
        cand = (
            memb.select(F.col("doc_id").alias("a"), "bk")
            .join(memb.select(F.col("doc_id").alias("b"), "bk"), "bk")
            .filter(F.col("a") < F.col("b"))
            .select("a", "b")
            .distinct()
        )
        hits = cand.join(truth, ["a", "b"])
        row = (
            cand.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
            .crossJoin(
                hits.agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
            )
            .crossJoin(
                truth.agg(F.count(F.lit(1)).cast("long").alias("n_true"))
            )
            .select(
                F.lit(bnd).cast("long").alias("bands"),
                F.lit(rws).cast("long").alias("rows_per_band"),
                "n_candidates",
                "n_true",
                "n_hits",
                _r6(F.col("n_hits") / F.col("n_true"), 6).alias("recall"),
                _r6(
                    F.when(
                        F.col("n_candidates") > 0,
                        F.col("n_hits") / F.col("n_candidates"),
                    ).otherwise(F.lit(-1.0)),
                    6,
                ).alias("precision"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


# --- context-window chunking -------------------------------------------------
CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


def q_doc_chunk_sliding(spark, sf_dir):
    """Sliding-window context chunking: each document fans out into
    overlapping CHUNK_TOKENS-token windows every CHUNK_STRIDE tokens —
    the chunk table an embedding/pretraining pipeline feeds to the
    model.  Chunks carry their token count and a content sha for
    downstream chunk-level dedup (trailing windows shorter than a full
    chunk are emitted; packers drop or dedup them by sha).

    Plan (100 TB): entirely JVM-side array ops — ``sequence`` generates
    the starts, ``explode`` fans out, ``slice`` takes the window, sha on
    the joined slice; no shuffle at all (embarrassingly parallel per
    document) and no Python in the path."""
    df = _with_tokens(load_documents(spark, sf_dir)).select("doc_id", "tokens")
    n = F.size("tokens")
    df = df.where(n > 0).select(
        "doc_id",
        "tokens",
        F.explode(
            F.sequence(F.lit(0), n - 1, F.lit(CHUNK_STRIDE))
        ).alias("start"),
    )
    chunk = F.slice("tokens", F.col("start") + 1, CHUNK_TOKENS)
    return df.select(
        "doc_id",
        (F.col("start") / CHUNK_STRIDE).cast("long").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.sha2(F.concat_ws(" ", chunk), 256).alias("chunk_sha"),
    )


# --- greedy sequence packing -------------------------------------------------
PACK_BUDGET = 512   # token budget per packed training sequence
PACK_SHARDS = 8     # shards packed independently (parallelism unit)


def _pack_shard(pdf):
    """Greedy first-fit-in-doc_id-order packing of one shard.  The scan
    is inherently sequential (each placement depends on the running
    fill), so it runs as a plain loop over the shard's (doc_id,
    n_tokens) pairs — payload text never enters the frame, and the loop
    is O(docs/shard) scalar ops, parallel ACROSS shards."""
    import numpy as np
    import pandas as pd

    pdf = pdf.sort_values("doc_id")
    n = pdf["n_tokens"].to_numpy()
    seq = np.empty(len(n), dtype=np.int64)
    pos = np.empty(len(n), dtype=np.int64)
    s = p = 0
    fill = 0
    for i, ni in enumerate(n):
        if fill + ni > PACK_BUDGET and i > 0:
            s += 1
            p = 0
            fill = 0
        seq[i] = s
        pos[i] = p
        fill += ni
        p += 1
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"].to_numpy(),
            "shard": pdf["shard"].to_numpy(),
            "seq_id": seq,
            "pos_in_seq": pos,
            "n_tokens": n,
        }
    )


def q_doc_pack_sequences(spark, sf_dir):
    """Greedy sequence packing — the context-window packing step of a
    pretraining data pipeline: documents (token counts clipped to the
    budget) are packed first-fit in doc_id order into training
    sequences of ≤ PACK_BUDGET tokens, independently within
    ``doc_id % PACK_SHARDS`` shards.

    Plan (100 TB): exact greedy packing is sequential by nature, so the
    scalable form is shard-parallel — ONE shuffle keyed on shard, then
    ``applyInPandas`` scans each shard's (doc_id, n_tokens) pairs;
    document text never moves, only the two integers per doc.  Shard
    count scales with the cluster; sequence identity is (shard,
    seq_id).  The DuckDB oracle replays the same greedy recurrence as a
    recursive CTE — an independent formulation of the fill state
    machine."""
    df = _with_tokens(load_documents(spark, sf_dir)).select(
        "doc_id",
        F.least(F.size("tokens"), F.lit(PACK_BUDGET))
        .cast("long")
        .alias("n_tokens"),
        (F.col("doc_id") % PACK_SHARDS).cast("long").alias("shard"),
    )
    return df.groupBy("shard").applyInPandas(
        _pack_shard,
        "doc_id long, shard long, seq_id long, pos_in_seq long, "
        "n_tokens long",
    )


# --- lang × source PIVOT census ---------------------------------------------
PIVOT_LANGS = ["de", "en", "es", "fr", "zh"]


def q_doc_lang_source_pivot(spark, sf_dir):
    """Corpus composition as a wide crosstab: one row per source, a
    (doc-count, char-volume) column pair per language — the PIVOT shape
    every mixture dashboard renders.

    Plan (100 TB): ``groupBy(source).pivot(lang, PIVOT_LANGS)`` with the
    value list supplied explicitly — Spark then plans ONE hash aggregate
    with pivot-conditional expressions (map-side partials, single
    shuffle on source); omitting the list would trigger a full extra
    distinct-scan just to discover the pivot columns, and would make the
    output schema data-dependent.  Absent cells surface as NULL and are
    canonicalized to 0 (the DuckDB mirror's FILTER aggregates yield the
    same zeros)."""
    docs = load_documents(spark, sf_dir)
    p = (
        docs.groupBy("source")
        .pivot("lang", PIVOT_LANGS)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("chars"),
        )
    )
    cols = [F.col("source")]
    for lg in PIVOT_LANGS:
        cols.append(
            F.coalesce(F.col(f"{lg}_n"), F.lit(0)).cast("long").alias(f"n_{lg}")
        )
        cols.append(
            F.coalesce(F.col(f"{lg}_chars"), F.lit(0))
            .cast("long")
            .alias(f"chars_{lg}")
        )
    return p.select(*cols)


QUERIES = {
    "doc_exact_dedup": q_doc_exact_dedup,
    "doc_token_stats": q_doc_token_stats,
    "doc_quality": q_doc_quality,
    "doc_langid": q_doc_langid,
    "doc_simhash": q_doc_simhash,
    "doc_near_dup_pairs": q_doc_near_dup_pairs,
    "doc_ngram_jaccard": q_doc_ngram_jaccard,
    "doc_emb_near_dup": q_doc_emb_near_dup,
    "doc_dup_clusters": q_doc_dup_clusters,
    "doc_winnow_fingerprints": q_doc_winnow_fingerprints,
    "doc_tfidf_top_terms": q_doc_tfidf_top_terms,
    "doc_stratified_sample": q_doc_stratified_sample,
    "doc_canonical_pick": q_doc_canonical_pick,
    "doc_repetition": q_doc_repetition,
    "doc_line_dedup": q_doc_line_dedup,
    "doc_decontamination": q_doc_decontamination,
    "doc_pii_census": q_doc_pii_census,
    "doc_trigram_logprob": q_doc_trigram_logprob,
    "doc_mixture_allocation": q_doc_mixture_allocation,
    "doc_bm25_search": q_doc_bm25_search,
    "doc_lang_source_pivot": q_doc_lang_source_pivot,
    "doc_chunk_sliding": q_doc_chunk_sliding,
    "doc_pack_sequences": q_doc_pack_sequences,
    "doc_lsh_band_tuning": q_doc_lsh_band_tuning,
    "doc_winnow_clone_pairs": q_doc_winnow_clone_pairs,
    "doc_bpe_merges": q_doc_bpe_merges,
}
