"""Stage C — pairwise scoring (SURVEY.md §2.3 E2-E4, §2.8 F1-F3, §2.9 M1).

Reference mapping:
- hashed-shingle embedding + cosine = the bi-encoder dot-product retrieval
  score (``blink/biencoder/biencoder.py:126-166``), made deterministic: the
  1024-d BERT CLS vector becomes a unit-normalized signed feature-hash
  vector over content shingles, computed in ONE Arrow-vectorized pandas UDF
  (the analog of torch DataLoader batching, ``blink/main_dense.py:254-268``).
- Jaro-Winkler / Levenshtein on paths = the NIL predictor's string-distance
  features (``scripts/prepare_nil_dataset.py:209-253`` — 20 textdistance
  sims; the north rule mandates JW + Levenshtein).
- shingle Jaccard = the serve-time Jaccard feature (``blink/main_api.py:422-429``).
- the logistic combiner = the NIL LogisticRegression match/no-match decision
  (``scripts/feature_ablation_study.py:969-977``; served at
  ``blink/main_api.py:414-433``). Two flavors: fixed deterministic weights
  (SQL-reproducible, used by the oracle-checked queries) and a spark.ml
  ``Pipeline(StandardScaler, LogisticRegression)`` fit on labeled pairs
  (the calibrated path used by the full pipeline).

Everything except the two pandas UDFs stays in whole-stage codegen.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from blink_spark import minhash
from blink_spark.minhash import EMBED_DIM

# Fixed combiner weights (deterministic, SQL-reproducible). Chosen so the
# fixture corpus separates cleanly: near-dup positives (cos≳0.6, jac≳0.4)
# land ≫ 0.5; same-block hard negatives (cos≈0, jac≈0, jw/lev high because
# the *paths* collide by construction) land ≪ 0.5.
W_BIAS = -7.0
W_COS = 6.0
W_JAC = 6.0
W_JW = 1.0
W_LEV = 1.0
W_SHA = 16.0
MATCH_TAU = 0.5


# ---------------------------------------------------------------------------
# Embeddings (bi-encoder analog)
# ---------------------------------------------------------------------------

def _embed_batch(hashes: pd.Series) -> pd.Series:
    """Vectorized signed feature-hashing over shingle-hash lists.

    idx  = h mod D
    sign = +1 if (h div D) even else -1
    vec  = unit-normalized scatter-add (zeros row if no shingles).
    """
    lens = hashes.str.len().fillna(0).astype(np.int64).to_numpy()
    n = len(lens)
    out = np.zeros((n, EMBED_DIM), dtype=np.float64)
    if lens.sum() > 0:
        flat = np.concatenate([np.asarray(v, dtype=np.int64) for v in hashes if v is not None and len(v) > 0])
        rows = np.repeat(np.arange(n), lens)
        idx = flat % EMBED_DIM
        sign = np.where(((flat // EMBED_DIM) % 2) == 0, 1.0, -1.0)
        np.add.at(out, (rows, idx), sign)
        norms = np.linalg.norm(out, axis=1)
        nz = norms > 0
        out[nz] /= norms[nz, None]
    return pd.Series(list(out))


embed_udf = F.pandas_udf(_embed_batch, ArrayType(DoubleType()))


def with_embedding(df: DataFrame, hashes_col: str = "shingle_hashes") -> DataFrame:
    return df.withColumn("embedding", embed_udf(F.col(hashes_col)))


def sql_embedding(hashes_expr: str, dim: int = EMBED_DIM) -> str:
    """DuckDB mirror of :func:`_embed_batch` (unit-normalized)."""
    comps = ", ".join(
        f"list_sum(list_transform(__h, h -> CASE WHEN h % {dim} = {d} THEN "
        f"(CASE WHEN (h // {dim}) % 2 = 0 THEN 1.0 ELSE -1.0 END) ELSE 0.0 END))"
        for d in range(dim)
    )
    return (
        f"(SELECT CASE WHEN list_sum(list_transform(__v, x -> x*x)) > 0 THEN "
        f"list_transform(__v, x -> x / sqrt(list_sum(list_transform(__v, y -> y*y)))) "
        f"ELSE __v END FROM "
        f"(SELECT [{comps}] AS __v FROM (SELECT {hashes_expr} AS __h)))"
    )


# ---------------------------------------------------------------------------
# Jaro-Winkler (pandas UDF; matches DuckDB jaro_winkler_similarity)
# ---------------------------------------------------------------------------

def _jaro(s1, s2) -> float:  # str or bytes (bytes = DuckDB parity)
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        # both-empty included: DuckDB jaro_winkler_similarity('','') = 0,
        # and the oracle defines parity
        return 0.0
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0
    flags2 = [False] * len2
    matches1 = []
    for i, c in enumerate(s1):
        lo = max(0, i - match_window)
        hi = min(len2, i + match_window + 1)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c:
                flags2[j] = True
                matches1.append(c)
                break
    m = len(matches1)
    if m == 0:
        return 0.0
    matches2 = [s2[j] for j in range(len2) if flags2[j]]
    # DuckDB FLOORS the half-transposition count (integer division) — an
    # odd number of mismatched match positions rounds down (fuzz-pinned:
    # jaro('0Yü','0üY00') = 0.80555…, not 0.76388…)
    t = sum(a != b for a, b in zip(matches1, matches2)) // 2
    return (m / len1 + m / len2 + (m - t) / m) / 3.0


def jaro_winkler(s1, s2, p: float = 0.1, boost_threshold: float = 0.7) -> float:
    j = _jaro(s1, s2)
    if j > boost_threshold:
        prefix = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            prefix += 1
        j += prefix * p * (1 - j)
    return j


def damerau_levenshtein(s1, s2) -> int:  # str or bytes
    """Unrestricted Damerau-Levenshtein distance (matches DuckDB's
    ``damerau_levenshtein``: 'ca'→'abc' = 2, not the OSA 3)."""
    n1, n2 = len(s1), len(s2)
    if n1 == 0:
        return n2
    if n2 == 0:
        return n1
    maxdist = n1 + n2
    da: dict = {}
    d = [[0] * (n2 + 2) for _ in range(n1 + 2)]
    d[0][0] = maxdist
    for i in range(n1 + 1):
        d[i + 1][0] = maxdist
        d[i + 1][1] = i
    for j in range(n2 + 1):
        d[0][j + 1] = maxdist
        d[1][j + 1] = j
    for i in range(1, n1 + 1):
        db = 0
        for j in range(1, n2 + 1):
            k = da.get(s2[j - 1], 0)
            l = db
            if s1[i - 1] == s2[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,
                d[i + 1][j] + 1,
                d[i][j + 1] + 1,
                d[k][l] + (i - k - 1) + 1 + (j - l - 1),
            )
        da[s1[i - 1]] = i
    return d[n1 + 1][n2 + 1]


def char_jaccard(s1, s2) -> float:
    """Symbol-set Jaccard (matches DuckDB ``jaccard``; the empty-string
    guard mirrors the CASE the oracle wraps around DuckDB's, which throws).
    Call with bytes for exact DuckDB parity (it is byte-based)."""
    a, b = set(s1), set(s2)
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


# explicit StructType (a DDL string would need an active SparkContext at
# import time)
_PANEL_SCHEMA = StructType(
    [
        StructField("jw", DoubleType()),
        StructField("jaro", DoubleType()),
        StructField("dl_sim", DoubleType()),
        StructField("cj", DoubleType()),
    ]
)


def _panel_batch(a: pd.Series, b: pd.Series) -> pd.DataFrame:
    """All per-basename-pair string distances in one Arrow round-trip —
    the NIL predictor's textdistance panel
    (``scripts/prepare_nil_dataset.py:209-253``), evaluated once per
    DISTINCT pair (see score_pairs).

    Distances are computed over the UTF-8 BYTES of each string: DuckDB's
    jaro/jaro_winkler/damerau_levenshtein/jaccard are all byte-based, and
    the oracle defines parity (fuzz-verified over unicode in
    tests/test_fuzz_parity.py). dl_sim is normalized by the max BYTE
    length (the oracle mirrors with strlen); both-empty → 1.0."""
    rows = []
    for x, y in zip(a, b):
        xb = (x or "").encode("utf-8")
        yb = (y or "").encode("utf-8")
        dl = damerau_levenshtein(xb, yb)
        mx = max(len(xb), len(yb))
        rows.append(
            (jaro_winkler(xb, yb), _jaro(xb, yb),
             1.0 - dl / mx if mx else 1.0, char_jaccard(xb, yb))
        )
    return pd.DataFrame(rows, columns=["jw", "jaro", "dl_sim", "cj"])


panel_udf = F.pandas_udf(_panel_batch, _PANEL_SCHEMA)


# ---------------------------------------------------------------------------
# Pair features + combiner
# ---------------------------------------------------------------------------

def cosine_col(a: Column, b: Column) -> Column:
    """Dot product of two unit vectors (JVM higher-order fns, no Python)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def jaccard_col(a: Column, b: Column) -> Column:
    """Exact Jaccard over distinct-element arrays. |A∪B| is derived as
    |A|+|B|−|A∩B| — one hash-set build per pair instead of two (array_union
    costs the same as array_intersect; this halves the dominant scoring
    expense)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def ascii_proj_col(c: Column) -> Column:
    """Project non-printable-ASCII characters to '?' — the cross-engine
    Levenshtein contract: Spark's levenshtein counts codepoints while
    DuckDB's counts UTF-8 bytes, so only pure-ASCII inputs agree. The
    oracle applies the identical projection."""
    return F.regexp_replace(c, "[^ -~]", "?")


def lev_sim_col(a: Column, b: Column) -> Column:
    a, b = ascii_proj_col(a), ascii_proj_col(b)
    mx = F.greatest(F.length(a), F.length(b))
    return F.when(mx > 0, 1.0 - F.levenshtein(a, b) / mx).otherwise(F.lit(1.0))


def basename_col(path: Column) -> Column:
    return F.element_at(F.split(path, "/"), -1)


def sigmoid_col(x: Column) -> Column:
    return 1.0 / (1.0 + F.exp(-x))


def match_p_col(cos, jac, jw, lev, exact_sha) -> Column:
    z = (
        F.lit(W_BIAS)
        + F.lit(W_COS) * cos
        + F.lit(W_JAC) * jac
        + F.lit(W_JW) * jw
        + F.lit(W_LEV) * lev
        + F.lit(W_SHA) * exact_sha.cast("double")
    )
    return sigmoid_col(z)


def sql_match_p(cos: str, jac: str, jw: str, lev: str, exact_sha: str) -> str:
    z = (
        f"({W_BIAS} + {W_COS}*({cos}) + {W_JAC}*({jac}) + {W_JW}*({jw}) "
        f"+ {W_LEV}*({lev}) + {W_SHA}*(CASE WHEN {exact_sha} THEN 1.0 ELSE 0.0 END))"
    )
    return f"(1.0 / (1.0 + exp(-{z})))"


def pair_feature_join(
    pairs: DataFrame, feat: DataFrame, broadcast_features: bool = True
) -> DataFrame:
    """The gated two-sided feature fetch shared by ``score_pairs`` and the
    string-panel queries: pairs(left_id, right_id, ...) joined twice
    against feat(file_id, ...), returning the pair columns plus l_*/r_*
    copies of every feature column.

    With ``broadcast_features`` the caller asserts the projected feature
    table fits executor memory and both fetches are map-side hash joins;
    with False the choice is left to AQE (or a bucketed sort-merge when
    both tables are bucketed by file_id) — no unconditional broadcast
    anywhere downstream of this gate.

    NOTE: the SAME un-aliased feature subtree is joined twice and renamed
    AFTER each join. Measured round 2: under AQE the two broadcast stages
    do NOT unify into a ReusedExchange at runtime — each builds its own
    hash relation from the child plan. Callers must therefore persist the
    feature table (pipeline/bench/er_queries all do) so the expensive
    columns (the Arrow embedding kernel) materialize once and both
    broadcast builds read the cache."""
    if broadcast_features:
        feat = F.broadcast(feat)
    feat_cols = feat.columns
    pair_cols = pairs.columns
    fa, fb = feat.alias("__fa"), feat.alias("__fb")
    j1 = pairs.join(fa, pairs["left_id"] == F.col("__fa.file_id"))
    j1 = j1.select(
        *[pairs[c] for c in pair_cols],
        *[F.col(f"__fa.{c}").alias(f"l_{c}") for c in feat_cols],
    )
    df = j1.join(fb, F.col("right_id") == F.col("__fb.file_id"))
    return df.select(
        *[j1[c] for c in j1.columns],
        *[F.col(f"__fb.{c}").alias(f"r_{c}") for c in feat_cols],
    )


def score_pairs(
    pairs: DataFrame, features: DataFrame, broadcast_features: bool = True
) -> DataFrame:
    """pairs(left_id, right_id, ...) × features(file_id, path, content_sha,
    shingle_hashes, embedding) → scored pair table.

    Join order matters at scale: the pair table is thin (two ids) but the
    per-side payload (~2 KB of hash array + embedding) is wide, so a
    shuffle join on the second side would reshuffle pairs × payload —
    gigabytes at sf0.1, petabytes at 10^12 rows. With
    ``broadcast_features`` both fetches are map-side hash joins and the
    wide intermediate never crosses the network. At cluster scale, where
    the feature table outgrows broadcast, set False and bucket BOTH tables
    by file_id (Iceberg bucket partition transform) so the sort-merge
    joins are co-located — same plan shape either way.

    Jaccard is computed over the 60-bit md5 shingle hashes, not the
    shingle strings: identical value (md5 collisions aside, and the SQL
    oracle mirrors the same hash set) at a quarter of the payload width.
    """
    feat = features.select(
        F.col("file_id"),
        basename_col(F.col("path")).alias("base"),
        F.col("path"),
        F.col("content_sha"),
        F.col("shingle_hashes"),
        F.col("embedding"),
    )
    df = pair_feature_join(pairs, feat, broadcast_features)
    df = df.withColumn("cosine", cosine_col(F.col("l_embedding"), F.col("r_embedding")))
    # one hash-set build per pair feeds the whole shingle-set similarity
    # family: |A∪B| = |A|+|B|−|A∩B|, dice/overlap/cosine all derive from
    # the same three sizes (shingle sets are never empty by construction —
    # minhash.shingles_col has an empty-row sentinel)
    la = F.size(F.col("l_shingle_hashes"))
    lb = F.size(F.col("r_shingle_hashes"))
    df = df.withColumn(
        "__inter",
        F.size(F.array_intersect(F.col("l_shingle_hashes"), F.col("r_shingle_hashes"))),
    )
    inter = F.col("__inter")
    union = la + lb - inter
    df = (
        df.withColumn("jaccard_sh", F.when(union > 0, inter / union).otherwise(F.lit(0.0)))
        .withColumn("dice_sh", 2.0 * inter / (la + lb))
        .withColumn("overlap_sh", inter / F.least(la, lb))
        .withColumn("cosine_sh", inter / F.sqrt(la.cast("double") * lb))
    )
    # The string-distance panel depends only on the basename pair, and
    # distinct basename pairs are orders of magnitude fewer than candidate
    # pairs (paths repeat massively — that is exactly why (lang, path_stem)
    # is a blocking key). Evaluating ONE Arrow UDF once per distinct pair
    # and joining back removes the Python round-trip from the 3M-row hot
    # path (~4x scoring-stage speedup at sf0.1, identical values).
    panel_map = (
        df.select("l_base", "r_base")
        .distinct()
        .withColumn("__panel", panel_udf(F.col("l_base"), F.col("r_base")))
        .select(
            "l_base",
            "r_base",
            F.col("__panel.jw").alias("jw_path"),
            F.col("__panel.jaro").alias("jaro_base"),
            F.col("__panel.dl_sim").alias("damerau_base"),
            F.col("__panel.cj").alias("charjac_base"),
        )
    )
    # Broadcast gate: with broadcast_features the caller asserts the
    # per-file payload fits executor memory, and panel_map (distinct
    # basename pairs, ~100 B/row) is strictly smaller — hint it explicitly.
    # On the bucketed scale path (broadcast_features=False) leave the
    # choice to AQE: the distinct's exchange gives it exact runtime stats,
    # so it broadcasts when small and degrades to a shuffle join instead of
    # OOMing the driver when basename diversity explodes at 100×.
    if broadcast_features:
        panel_map = F.broadcast(panel_map)
    df = df.join(panel_map, ["l_base", "r_base"], "left")
    df = df.withColumn("lev_path", lev_sim_col(F.col("l_path"), F.col("r_path")))
    df = df.withColumn("exact_sha", F.col("l_content_sha") == F.col("r_content_sha"))
    df = df.withColumn(
        "match_p",
        match_p_col(
            F.col("cosine"),
            F.col("jaccard_sh"),
            F.col("jw_path"),
            F.col("lev_path"),
            F.col("exact_sha"),
        ),
    )
    return df.select(
        "left_id", "right_id", "block_key", "salt",
        "cosine", "jaccard_sh", "dice_sh", "overlap_sh", "cosine_sh",
        "jw_path", "jaro_base", "damerau_base", "charjac_base", "lev_path",
        "exact_sha", "match_p",
    )


def match_edges(scored: DataFrame, tau: float = MATCH_TAU) -> DataFrame:
    """Threshold = the NIL match/no-match decision (below τ ⇒ no edge,
    the mention is 'out of KB'; ``scripts/kbp_simulation.py:124-136``)."""
    return scored.filter(F.col("match_p") >= F.lit(tau)).select("left_id", "right_id")


# ---------------------------------------------------------------------------
# Calibrated spark.ml combiner (the trained NIL-predictor analog)
# ---------------------------------------------------------------------------

FEATURE_COLS = [
    "cosine", "jaccard_sh", "dice_sh", "overlap_sh", "cosine_sh",
    "jw_path", "jaro_base", "damerau_base", "charjac_base", "lev_path",
]


def train_test_split(
    labeled: DataFrame,
    seed: int = 1234,
    holdout_frac: float = 0.2,
    max_neg_per_pos: float = 3.0,
):
    """Training hygiene for the combiner (M2/M3): seeded undersampling of
    the majority class via ``sampleBy`` + seeded ``randomSplit`` holdout —
    mirrors ``RandomUnderSampler`` + ``train_test_split(random_state=1234)``
    at ``scripts/feature_ablation_study.py:925-945``.

    ``labeled`` needs FEATURE_COLS + boolean ``is_match``. Returns
    (train, holdout); both carry a ``label`` double column. The only
    driver-side collect is the 2-row class census.
    """
    lab = labeled.withColumn("label", F.col("is_match").cast("double"))
    counts = {r["label"]: r["n"] for r in
              lab.groupBy("label").agg(F.count("*").alias("n")).collect()}
    n_pos, n_neg = counts.get(1.0, 0), counts.get(0.0, 0)
    fractions = {0.0: 1.0, 1.0: 1.0}
    if n_pos and n_neg > max_neg_per_pos * n_pos:
        fractions[0.0] = max_neg_per_pos * n_pos / n_neg
    elif n_neg and n_pos > max_neg_per_pos * n_neg:
        fractions[1.0] = max_neg_per_pos * n_neg / n_pos
    bal = lab.sampleBy("label", fractions, seed=seed)
    train, holdout = bal.randomSplit([1.0 - holdout_frac, holdout_frac], seed=seed)
    return train, holdout


def holdout_metrics(model, holdout: DataFrame, tau: float = MATCH_TAU) -> dict:
    """Precision/recall/F1 of the fitted combiner on a held-out labeled
    set at threshold ``tau`` — the classification_report of
    ``scripts/feature_ablation_study.py:997-1026``, as one groupBy."""
    pred = apply_combiner(model, holdout).withColumn(
        "pred_match", F.col("match_p_ml") >= F.lit(tau)
    )
    rows = pred.groupBy("is_match", "pred_match").agg(
        F.count("*").alias("n")
    ).collect()
    tp = fp = fn = tn = 0
    for r in rows:
        if r["is_match"] and r["pred_match"]:
            tp = r["n"]
        elif r["is_match"]:
            fn = r["n"]
        elif r["pred_match"]:
            fp = r["n"]
        else:
            tn = r["n"]
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "tp": tp, "fp": fp, "fn": fn, "tn": tn,
        "precision": precision, "recall": recall, "f1": f1,
        "n_holdout": tp + fp + fn + tn,
    }


def fit_combiner(labeled: DataFrame, seed: int = 1234, feature_cols=None):
    """Pipeline(StandardScaler, LogisticRegression) on labeled pairs.

    Mirrors ``make_pipeline(StandardScaler(), LogisticRegression(
    random_state=1234, max_iter=200))`` at
    ``scripts/feature_ablation_study.py:969-977``.
    ``labeled`` needs ``feature_cols`` (default FEATURE_COLS) + boolean
    ``is_match``.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    assembler = VectorAssembler(
        inputCols=list(feature_cols or FEATURE_COLS), outputCol="raw_features"
    )
    scaler = StandardScaler(inputCol="raw_features", outputCol="features",
                            withMean=True, withStd=True)
    lr = LogisticRegression(
        featuresCol="features", labelCol="label", maxIter=200, regParam=1e-4
    )
    train = labeled.withColumn("label", F.col("is_match").cast("double"))
    return Pipeline(stages=[assembler, scaler, lr]).fit(train)


ABLATION_GROUPS: dict[str, list[str]] = {
    "full": FEATURE_COLS,
    "no_embedding": [c for c in FEATURE_COLS if c != "cosine"],
    "no_shingle_set": [c for c in FEATURE_COLS if not c.endswith("_sh")],
    "no_string": ["cosine", "jaccard_sh", "dice_sh", "overlap_sh", "cosine_sh"],
    "string_only": ["jw_path", "jaro_base", "damerau_base", "charjac_base",
                    "lev_path"],
}


def ablation_study(
    labeled: DataFrame,
    feature_sets: dict[str, list[str]] | None = None,
    seed: int = 1234,
    tau: float = MATCH_TAU,
) -> DataFrame:
    """Feature-ablation grid of the calibrated combiner — which feature
    families carry the match signal (the fork's headline analysis,
    ``scripts/feature_ablation_study.py`` main loop: per feature subset,
    undersample → split → fit → holdout classification_report).

    The undersample/split is computed ONCE and shared by every subset, so
    rows are identical across fits and the comparison isolates the
    feature set (the reference fixes random_state the same way).  Each
    fit/score is distributed; only the per-subset confusion counts (4
    rows) come back to the driver, and the result is a tiny summary
    DataFrame — one row per subset.
    """
    sets = feature_sets or ABLATION_GROUPS
    train, holdout = train_test_split(labeled, seed=seed)
    train = train.persist()
    holdout = holdout.persist()
    rows = []
    try:
        for name, cols in sets.items():
            model = fit_combiner(train, seed=seed, feature_cols=cols)
            m = holdout_metrics(model, holdout, tau=tau)
            rows.append((
                name, len(cols), m["tp"], m["fp"], m["fn"], m["tn"],
                float(m["precision"]), float(m["recall"]), float(m["f1"]),
                m["n_holdout"],
            ))
    finally:
        train.unpersist()
        holdout.unpersist()
    return labeled.sparkSession.createDataFrame(
        rows,
        "feature_set string, n_features long, tp long, fp long, fn long, "
        "tn long, precision double, recall double, f1 double, n_holdout long",
    )


def apply_combiner(model, scored: DataFrame) -> DataFrame:
    """Adds ``match_p_ml`` = P(match) from the fitted combiner."""
    from pyspark.ml.functions import vector_to_array

    out = model.transform(scored)
    return out.withColumn(
        "match_p_ml", vector_to_array(F.col("probability")).getItem(1)
    ).drop("raw_features", "features", "rawPrediction", "probability", "prediction")
