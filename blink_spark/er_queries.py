"""Driver-facing query surface: every pipeline stage as a (spark, sf_dir)
callable plus a DuckDB oracle-SQL mirror (SURVEY.md §5 oracle cross-check).

The oracle SQL recomputes the ENTIRE stage chain — sha ids, tokens,
shingles, minhash signatures, band keys, candidate self-join, embedding
cosine, Jaro-Winkler, logistic match probability, recursive-CTE connected
components — independently in DuckDB, so a value-hash match is a real
end-to-end correctness proof, not a tautology.

Float columns are rounded to 6 dp on BOTH sides: the engines sum doubles in
different orders, and last-bit noise must not fail the driver's value-hash.
Rounded floats additionally get ``+ 0.0`` on BOTH sides: a tiny negative
(e.g. cosine = -1e-9 from a different summation order) rounds to IEEE -0.0
in one engine and +0.0 in the other — numerically equal, but serialized
differently by the driver's value-hash. Adding +0.0 canonicalizes the sign
of zero without changing any other value.

Reference parity anchors (what each query reproduces) are cited per
function; see SURVEY.md §2 for the full operator mapping.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from blink_spark import blocking, clustering, evaluate, ingest, minhash, scoring, strdist
from blink_spark.fixtures import ensure_fixture, sf_from_dir
from blink_spark.parity import r6 as _r6

ORACLE_SF = 0.01  # the scale the driver's DuckDB harness runs at


# ---------------------------------------------------------------------------
# Shared stage builders (Spark side)
# ---------------------------------------------------------------------------

def load_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic source_files table for the sf implied by
    ``sf_dir`` (generated once, committed under fixtures/)."""
    return spark.read.parquet(ensure_fixture(sf_from_dir(sf_dir)))


# Shared-stage cache: the driver's CORRECTNESS harness calls each of the
# 16 ER queries independently, and every one re-derives the same
# ingest→signatures→scoring chain. One persisted instance per
# (application, sf_dir) is reused across calls instead — ~3× less work
# for a full verify sweep, and exactly one persist per stage (round-1
# leaked a persist per query invocation).
_stage_cache: dict[tuple[str, str, str], DataFrame] = {}


def _cached(spark, sf_dir: str, name: str, build) -> DataFrame:
    app = spark.sparkContext.applicationId
    # entries from earlier (stopped) applications hold dead references —
    # drop them so the dict doesn't grow across session restarts
    for stale in [k for k in _stage_cache if k[0] != app]:
        del _stage_cache[stale]
    key = (app, sf_dir, name)
    if key not in _stage_cache:
        _stage_cache[key] = build().persist()
    return _stage_cache[key]


def clear_stage_cache() -> None:
    """Unpersist and drop every cached stage — call between sweeps of
    different sf_dirs in one long-lived session so each scale's persisted
    ingest/signature/feature/scored tables don't stay pinned in executor
    memory simultaneously."""
    for df in _stage_cache.values():
        try:
            df.unpersist()
        except Exception:
            pass  # context already stopped
    _stage_cache.clear()


def _ingested(spark, sf_dir):
    return _cached(
        spark, sf_dir, "ingested",
        lambda: ingest.ingest(load_source(spark, sf_dir)),
    )


def _with_sig(spark, sf_dir):
    return _cached(
        spark, sf_dir, "with_sig",
        lambda: blocking.with_lsh_columns(_ingested(spark, sf_dir)),
    )


def _membership(spark, sf_dir):
    reps = blocking.representatives(_with_sig(spark, sf_dir))
    return blocking.block_membership(
        reps.select("file_id", "lang", "path_stem", "band_keys")
    )


def _pairs(spark, sf_dir):
    return _cached(
        spark, sf_dir, "pairs",
        lambda: blocking.candidate_pairs(
            _membership(spark, sf_dir).select("file_id", "block_key")
        ),
    )


def _features(spark, sf_dir):
    # cached separately: score_pairs broadcasts the feature table twice
    # (left/right fetch) and AQE builds each broadcast stage independently
    # — without this cache the embedding kernel runs twice per fill
    return _cached(
        spark, sf_dir, "features",
        lambda: scoring.with_embedding(_with_sig(spark, sf_dir)).select(
            "file_id", "path", "content_sha", "shingle_hashes", "embedding"
        ),
    )


def _scored(spark, sf_dir):
    return _cached(
        spark, sf_dir, "scored",
        lambda: scoring.score_pairs(
            _pairs(spark, sf_dir), _features(spark, sf_dir)
        ),
    )


def _edges(spark, sf_dir):
    scored = _scored(spark, sf_dir)
    sha = blocking.exact_dup_edges(_ingested(spark, sf_dir))
    return (
        scoring.match_edges(scored)
        .unionByName(sha.select("left_id", "right_id"))
        .distinct()
    )


def _clusters(spark, sf_dir):
    def build():
        # match_edges is a cheap filter over the persisted scored table,
        # so CC's iterations re-read memory, not the scoring DAG
        rep_edges = scoring.match_edges(_scored(spark, sf_dir))
        membership = blocking.rep_map(_ingested(spark, sf_dir))
        return clustering.connected_components_via_reps(rep_edges, membership)

    return _cached(spark, sf_dir, "clusters", build)


# ---------------------------------------------------------------------------
# Queries (Spark side) — names match oracle_sqls() keys
# ---------------------------------------------------------------------------

def q_ingest(spark, sf_dir):
    """Stage A projection (``blink/main_dense.py:195-241`` analog)."""
    return _ingested(spark, sf_dir).select(
        "file_id",
        "content_sha",
        "lang",
        "path_stem",
        F.col("n_tokens").cast("long").alias("n_tokens"),
    )


def q_block_membership(spark, sf_dir):
    """Stage B block keys per representative (Solr/FAISS retrieval analog)."""
    return _membership(spark, sf_dir).select("file_id", "block_key")


def q_candidate_pairs(spark, sf_dir):
    return _pairs(spark, sf_dir).select("left_id", "right_id", "block_key")


def q_sha_edges(spark, sf_dir):
    return blocking.exact_dup_edges(_ingested(spark, sf_dir)).select(
        "left_id", "right_id"
    )


def q_scored_pairs(spark, sf_dir):
    """Stage C features + calibrated match probability (E2-E4, M1) with
    the full string-distance panel (F1: JW, Jaro, Damerau-Levenshtein,
    char-Jaccard, Levenshtein + shingle-set Jaccard/Dice/overlap/cosine —
    the textdistance grid of ``scripts/prepare_nil_dataset.py:209-253``)."""
    s = _scored(spark, sf_dir)
    return s.select(
        "left_id",
        "right_id",
        "block_key",
        _r6("cosine", 6).alias("cosine"),
        _r6("jaccard_sh", 6).alias("jaccard_sh"),
        _r6("dice_sh", 6).alias("dice_sh"),
        _r6("overlap_sh", 6).alias("overlap_sh"),
        _r6("cosine_sh", 6).alias("cosine_sh"),
        _r6("jw_path", 6).alias("jw_path"),
        _r6("jaro_base", 6).alias("jaro_base"),
        _r6("damerau_base", 6).alias("damerau_base"),
        _r6("charjac_base", 6).alias("charjac_base"),
        _r6("lev_path", 6).alias("lev_path"),
        "exact_sha",
        _r6("match_p", 6).alias("match_p"),
    )


def _base_pairs(spark, sf_dir):
    """Distinct proj()-canonicalized basename pairs of the candidate-pair
    universe — the domain of the string-distance panel (distinct pairs are
    orders of magnitude fewer than candidate pairs; see score_pairs).
    The feature fetch goes through scoring.pair_feature_join — the same
    broadcast gate as the scored hot path, not a bare F.broadcast."""
    feat = _features(spark, sf_dir).select(
        "file_id", scoring.basename_col(F.col("path")).alias("base")
    )
    p = _pairs(spark, sf_dir).select("left_id", "right_id")
    return (
        scoring.pair_feature_join(p, feat)
        .select(
            strdist.proj_col(F.col("l_base")).alias("base_a"),
            strdist.proj_col(F.col("r_base")).alias("base_b"),
        )
        .distinct()
    )


def q_string_panel(spark, sf_dir):
    """Extended string-distance panel, SQL-expressible half (F1 breadth:
    the textdistance grid of ``scripts/prepare_nil_dataset.py:209-253``) —
    Hamming, MLIPNS, bag, Tversky, Monge-Elkan(DL), LCS-substring over
    distinct basename pairs; every column has a DuckDB mirror."""
    bp = _base_pairs(spark, sf_dir).withColumn(
        "__p", strdist.ext_panel_udf(F.col("base_a"), F.col("base_b"))
    )
    return bp.select(
        "base_a",
        "base_b",
        *[_r6(F.col(f"__p.{c}"), 6).alias(c) for c in strdist.PY_PANEL],
    )


def q_string_panel_full(spark, sf_dir):
    """The COMPLETE per-basename-pair grid — the six SQL-expressible
    distances plus the six alignment-DP/phonetic ones (StrCmp95,
    Needleman-Wunsch, Gotoh, Smith-Waterman, LCS-subsequence, Editex) and
    the classic five, all from one Arrow kernel.  The DP half has no
    tractable plain-SQL form, so this query intentionally ships WITHOUT
    an oracle entry (driver records the rows-only check); its kernels are
    instead fuzz-pinned in tests/test_strdist.py, and the SQL-expressible
    columns are oracle-proven via er_string_panel."""
    bp = _base_pairs(spark, sf_dir).withColumn(
        "__p", strdist.full_panel_udf(F.col("base_a"), F.col("base_b"))
    )
    return bp.select(
        "base_a",
        "base_b",
        *[_r6(F.col(f"__p.{c}"), 6).alias(c) for c in strdist._FULL_COLS],
    )


def q_string_panel_word(spark, sf_dir):
    """Word-level (qval=None) string-distance panel — the reference
    grid's ACTUAL token semantics (``textdistance.X(qval=None)`` =
    whitespace-token sequences, multiset set-family,
    ``scripts/prepare_nil_dataset.py:209-253``): positional Hamming,
    multiset Jaccard/Sorensen/overlap/cosine, and Monge-Elkan with the
    reference's ``str.split()`` tokenizer.  Word semantics are degenerate
    on single-token basenames, so the domain is each candidate pair's
    PATH as a token sequence (separators → spaces) — where multi-token
    structure actually exists.  Every column has a DuckDB mirror
    (multiset intersection as a pure list expression)."""
    feat = _features(spark, sf_dir).select("file_id", "path")
    p = _pairs(spark, sf_dir).select("left_id", "right_id")
    wp = (
        scoring.pair_feature_join(p, feat)
        .select(
            F.regexp_replace(
                strdist.proj_col(F.col("l_path")), "[/._-]+", " "
            ).alias("path_a"),
            F.regexp_replace(
                strdist.proj_col(F.col("r_path")), "[/._-]+", " "
            ).alias("path_b"),
        )
        .distinct()
        .withColumn(
            "__p", strdist.word_panel_udf(F.col("path_a"), F.col("path_b"))
        )
    )
    return wp.select(
        "path_a",
        "path_b",
        *[_r6(F.col(f"__p.{c}"), 6).alias(c) for c in strdist.WORD_PANEL],
    )


def q_match_edges(spark, sf_dir):
    return _edges(spark, sf_dir)


def q_er_cluster_density(spark, sf_dir):
    """Cluster cohesion audit: for every non-singleton cluster, its
    size, internal match-edge count, edge density 2E/(n(n-1)), and the
    mean match probability of its scored internal edges — the
    over-merge diagnostic (a big low-density cluster held together by a
    few low-p edges is the classic transitive-closure failure mode; the
    reference eyeballs this via per-entity score stats, §2.5 A1).

    Plan (100 TB): three aggregates over the already-persisted cluster
    and scored stages, each ONE shuffle keyed on cluster_id after an
    equi-join from edge endpoint to cluster label; nothing quadratic —
    density comes from counts, never from materializing pairs."""
    clusters = _clusters(spark, sf_dir).select(
        "file_id", "cluster_id"
    )
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    lbl = clusters.withColumnRenamed("file_id", "left_id")
    e = (
        _edges(spark, sf_dir)
        .join(lbl, "left_id")
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    )
    se = (
        _scored(spark, sf_dir)
        .filter(F.col("match_p") >= F.lit(scoring.MATCH_TAU))
        .select("left_id", "match_p")
        .join(lbl, "left_id")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_scored_edges"),
            F.avg("match_p").alias("_mp"),
        )
    )
    out = (
        sizes.filter(F.col("n_members") >= 2)
        .join(e, "cluster_id")
        .join(se, "cluster_id", "left")
    )
    n = F.col("n_members")
    return out.select(
        "cluster_id",
        "n_members",
        "n_edges",
        _r6(F.lit(2.0) * F.col("n_edges") / (n * (n - 1)), 6).alias(
            "density"
        ),
        F.coalesce(F.col("n_scored_edges"), F.lit(0))
        .cast("long")
        .alias("n_scored_edges"),
        _r6(F.coalesce(F.col("_mp"), F.lit(-1.0)), 6).alias("mean_match_p"),
    )


PR_DAMPING = 0.85
PR_ITERS = 3


def q_er_pagerank(spark, sf_dir):
    """PageRank over the symmetric match-edge graph (3 fixed power
    iterations, d=0.85) — the hub-record diagnostic: high-rank nodes
    are the records gluing many matches together, exactly the ones
    worth human review when a cluster looks over-merged (the
    review-routing complement of ``er_review_queue``; the reference
    eyeballs such hubs via its score-stat dumps,
    ``scripts/analysis_tools.py``).

    Plan (100 TB): the classic edge-partitioned iteration — each step
    is one shuffle of the rank vector on ``src`` (join with edges) and
    one on ``dst`` (contribution sum); the graph itself never
    re-materializes.  Every node of the symmetric graph has in- and
    out-degree ≥ 1, so there is no dangling mass and the iteration is a
    pure join+agg pipeline.  The DuckDB oracle unrolls the same three
    iterations as CTEs — an independent evaluation order whose double
    sums agree to ~1e-16, far inside the 6dp hash rounding."""
    edges = _edges(spark, sf_dir)
    sym = (
        edges.select(
            F.col("left_id").alias("src"), F.col("right_id").alias("dst")
        )
        .unionByName(
            edges.select(
                F.col("right_id").alias("src"), F.col("left_id").alias("dst")
            )
        )
        .distinct()
        .persist()
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nn = deg.agg(F.count(F.lit(1)).alias("n"))
    ranks = deg.crossJoin(F.broadcast(nn)).select(
        F.col("src").alias("node"), "deg", "n", (F.lit(1.0) / F.col("n")).alias("r")
    )
    for _ in range(PR_ITERS):
        contrib = (
            sym.join(ranks, sym.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("r") / F.col("deg")).alias("c"))
        )
        ranks = (
            ranks.drop("r")
            .join(contrib, ranks.node == contrib.dst)
            .select(
                "node",
                "deg",
                "n",
                (
                    F.lit(1.0 - PR_DAMPING) / F.col("n")
                    + F.lit(PR_DAMPING) * F.col("c")
                ).alias("r"),
            )
        )
    return ranks.select(
        "node",
        F.col("deg").cast("long").alias("degree"),
        _r6(F.col("r"), 6).alias("pagerank"),
    )


# Fellegi–Sunter EM: (feature, agreement threshold) comparison levels,
# fixed iteration count, initial parameters and probability clamp — all
# shared bit-for-bit with the DuckDB oracle, which unrolls the same EM
# as a CTE chain.
# jw_path is deliberately absent: within blocks the basenames are
# near-identical, so a JW agreement indicator is constant-true — both m
# and u hit the clamp and its weight is 0 (measured at sf0.01: P(jw
# >= .9) = 1.0). The panel keeps levels that stay informative GIVEN the
# blocking.
FS_FEATURES = [
    ("cosine", 0.8),
    ("jaccard_sh", 0.5),
    ("overlap_sh", 0.5),
    ("lev_path", 0.8),
]
FS_ITERS = 3
FS_LAM0 = 0.1
FS_M0 = 0.9
FS_U0 = 0.1
FS_PMIN = 1e-6
FS_PMAX = 0.999999


def _fs_census_rows(spark, sf_dir):
    """Collected agreement-pattern census: one row per 2^F pattern with
    the pair count and the count of pairs the supervised logistic path
    also calls a match — O(2^F) rows regardless of data scale."""
    nf = len(FS_FEATURES)
    return (
        _scored(spark, sf_dir)
        .select(
            *[
                (F.col(c) >= F.lit(t)).alias(f"a{i}")
                for i, (c, t) in enumerate(FS_FEATURES)
            ],
            (F.col("match_p") >= F.lit(scoring.MATCH_TAU)).alias("lg"),
        )
        .groupBy(*[f"a{i}" for i in range(nf)])
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(F.col("lg").cast("long")).alias("n_log"),
        )
        .collect()
    )


def _fs_em_params(patterns):
    """Run the fixed-iteration EM over (agreement-tuple, count) patterns;
    returns (lam, m, u) — the exact arithmetic the DuckDB oracle unrolls."""
    nf = len(FS_FEATURES)
    lam, m, u = FS_LAM0, [FS_M0] * nf, [FS_U0] * nf
    for _ in range(FS_ITERS):
        sum_n = sum_rn = sum_un = 0.0
        am, au = [0.0] * nf, [0.0] * nf
        for a, n in patterns:
            pm, pu = lam, 1.0 - lam
            for i in range(nf):
                pm *= m[i] if a[i] else 1.0 - m[i]
                pu *= u[i] if a[i] else 1.0 - u[i]
            r = pm / (pm + pu)
            sum_n += n
            sum_rn += r * n
            sum_un += (1.0 - r) * n
            for i in range(nf):
                if a[i]:
                    am[i] += r * n
                    au[i] += (1.0 - r) * n
        lam = sum_rn / sum_n
        m = [max(min(am[i] / sum_rn, FS_PMAX), FS_PMIN) for i in range(nf)]
        u = [max(min(au[i] / sum_un, FS_PMAX), FS_PMIN) for i in range(nf)]
    return lam, m, u


def _fs_posterior(a, lam, m, u):
    """P(match | agreement pattern a) under the fitted mixture — the
    same left-to-right product order as the SQL mirror."""
    pm, pu = lam, 1.0 - lam
    for i in range(len(a)):
        pm *= m[i] if a[i] else 1.0 - m[i]
        pu *= u[i] if a[i] else 1.0 - u[i]
    return pm / (pm + pu)


def q_er_fs_em(spark, sf_dir):
    """Fellegi–Sunter parameter estimation by EM over candidate-pair
    agreement patterns — unsupervised m/u/λ learning (Fellegi & Sunter
    1969; the shape the Splink engine popularized on Spark).  The
    reference's NIL combiner learns SUPERVISED weights over the same
    feature panel (``scripts/feature_ablation_study.py:969-975``); this
    is its unsupervised complement: a two-class latent mixture over
    binary agreement indicators, no labels consumed.

    Plan (100 TB): EM never touches the pair table more than ONCE.
    Pairs collapse to the O(2^F) agreement-pattern census (one shuffle
    whose reduced size is 16 rows regardless of data scale) and every
    E/M iteration runs on that census — the naive formulation would
    re-scan 10^12 pairs per iteration for bit-identical results.  The
    census ``collect()`` is the same O(1)-rows pattern as the confusion
    rollup.  Output: per-feature m/u probabilities, log2 agreement /
    disagreement match weights, and the class prior λ.
    """
    nf = len(FS_FEATURES)
    patterns = [
        (tuple(bool(r[f"a{i}"]) for i in range(nf)), float(r["n"]))
        for r in _fs_census_rows(spark, sf_dir)
    ]
    lam, m, u = _fs_em_params(patterns)
    rows = [
        (
            name,
            m[i],
            u[i],
            math.log2(m[i] / u[i]),
            math.log2((1.0 - m[i]) / (1.0 - u[i])),
            lam,
        )
        for i, (name, _) in enumerate(FS_FEATURES)
    ]
    out = spark.createDataFrame(
        rows,
        "feature string, m double, u double, w_agree double,"
        " w_disagree double, lam double",
    )
    # rounding happens in Spark (F.round = HALF_UP, matching DuckDB's
    # round), never via Python's banker's-rounding round()
    return out.select(
        "feature",
        _r6("m", 6).alias("m"),
        _r6("u", 6).alias("u"),
        _r6("w_agree", 6).alias("w_agree"),
        _r6("w_disagree", 6).alias("w_disagree"),
        _r6("lam", 6).alias("lam"),
    )


def q_er_fs_posteriors(spark, sf_dir):
    """Pattern-level Fellegi–Sunter decisions next to the supervised
    path: for every agreement pattern, the pair count, the fitted
    posterior P(match | pattern), the resulting FS decision, and how
    many of those pairs the calibrated logistic scorer ALSO calls a
    match — the unsupervised-vs-supervised model-agreement table
    (Splink's "predictions by comparison vector" view; the reference's
    ablation study compares feature subsets the supervised way,
    ``scripts/feature_ablation_study.py``).

    Plan (100 TB): the posterior depends ONLY on the agreement pattern,
    so this is the same single census shuffle as ``er_fs_em`` — no
    per-pair posterior materialization; 2^F output rows at any scale.
    """
    nf = len(FS_FEATURES)
    census = _fs_census_rows(spark, sf_dir)
    patterns = [
        (tuple(bool(r[f"a{i}"]) for i in range(nf)), float(r["n"]))
        for r in census
    ]
    lam, m, u = _fs_em_params(patterns)
    rows = [
        (
            *[bool(r[f"a{i}"]) for i in range(nf)],
            int(r["n"]),
            int(r["n_log"]),
            _fs_posterior([bool(r[f"a{i}"]) for i in range(nf)], lam, m, u),
        )
        for r in census
    ]
    names = [f"agree_{c}" for c, _ in FS_FEATURES]
    out = spark.createDataFrame(
        rows,
        ", ".join(f"{a} boolean" for a in names)
        + ", n_pairs long, n_logistic_match long, fs_posterior double",
    )
    return out.select(
        *names,
        "n_pairs",
        "n_logistic_match",
        _r6("fs_posterior", 6).alias("fs_posterior"),
        (F.col("fs_posterior") >= F.lit(0.5)).alias("fs_match"),
    )


def q_er_fs_tf(spark, sf_dir):
    """Term-frequency adjustment for the path-stem agreement level —
    the Splink ``tf_adjustments`` idea: agreeing on a RARE stem is far
    stronger match evidence than agreeing on a ubiquitous one, so the
    value-specific u-probability is the value's frequency share
    (u_v = tf_v) instead of the global u = Σ tf_v².  Output per stem:
    its record count, tf share, and the additive weight correction
    log2(u / u_v) to apply on top of the base agreement weight
    (positive for rare stems, negative for common ones).

    Plan (100 TB): ONE census aggregate over the deduplicated record
    table (vocabulary-sized result) plus a scalar Σtf² broadcast — the
    pair table is never touched; adjustments join onto scored pairs by
    stem at serve time exactly like the broadcast dictionary lookups
    (J6/J7)."""
    reps = blocking.representatives(_with_sig(spark, sf_dir))
    census = reps.groupBy("path_stem").agg(
        F.count(F.lit(1)).cast("long").alias("n_records")
    )
    tot = census.agg(
        F.sum("n_records").cast("double").alias("n"),
    )
    tf = census.crossJoin(F.broadcast(tot)).select(
        "path_stem",
        "n_records",
        (F.col("n_records") / F.col("n")).alias("tf"),
    )
    u = tf.agg(F.sum(F.col("tf") * F.col("tf")).alias("u"))
    return tf.crossJoin(F.broadcast(u)).select(
        "path_stem",
        "n_records",
        _r6("tf", 6).alias("tf"),
        _r6(F.log2(F.col("u") / F.col("tf")), 6).alias("tf_adjustment"),
    )


def q_er_golden_record(spark, sf_dir):
    """Golden-record construction (MDM survivorship): every
    multi-member cluster fused into ONE record with per-attribute
    survivorship rules — most-frequent for ``lang``, most-complete
    (max ``n_tokens``) for the canonical path, most-recent proxy
    (max ``commit``; lexicographic over shas here, max-by-timestamp on
    a real table) for the commit, plus member/repo cardinalities.  The
    fusion step downstream of clustering that the reference's KBP loop
    sidesteps by keying on the first-seen member (A6,
    ``scripts/kbp_simulation.py:229-251``); ``doc_canonical_pick``
    keeps one best ROW — this builds a best-of-breed COMPOSITE row.

    Plan (100 TB): everything keys on cluster_id — two grouped
    aggregates plus two rank-1 windows over the members table, no
    pairs, nothing quadratic; survivorship ties broken deterministically
    (count DESC then value ASC; n_tokens DESC then file_id ASC)."""
    members = (
        _clusters(spark, sf_dir)
        .select("file_id", "cluster_id")
        .join(
            _ingested(spark, sf_dir).select(
                "file_id", "repo", "path", "commit", "lang", "n_tokens"
            ),
            "file_id",
        )
    )
    base = members.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.countDistinct("repo").cast("long").alias("n_repos"),
        F.max("commit").alias("latest_commit"),
    )
    wl = Window.partitionBy("cluster_id").orderBy(
        F.col("cnt").desc(), F.col("lang").asc()
    )
    mode_lang = (
        members.groupBy("cluster_id", "lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rk", F.row_number().over(wl))
        .filter(F.col("rk") == 1)
        .select("cluster_id", "lang")
    )
    wp = Window.partitionBy("cluster_id").orderBy(
        F.col("n_tokens").desc(), F.col("file_id").asc()
    )
    canon = (
        members.withColumn("rk", F.row_number().over(wp))
        .filter(F.col("rk") == 1)
        .select(
            "cluster_id",
            F.col("path").alias("canonical_path"),
            F.col("n_tokens").cast("long").alias("canonical_n_tokens"),
        )
    )
    return (
        base.filter(F.col("n_members") >= 2)
        .join(mode_lang, "cluster_id")
        .join(canon, "cluster_id")
        .select(
            "cluster_id",
            "n_members",
            "n_repos",
            "lang",
            "canonical_path",
            "canonical_n_tokens",
            "latest_commit",
        )
    )


O2O_ROUNDS = 6


def q_er_one_to_one(spark, sf_dir):
    """One-to-one assignment over the thresholded match edges:
    ``O2O_ROUNDS`` fixed rounds of locally-dominant ("mutual best")
    matching.  Each round keeps every edge that is rank-1 for BOTH of
    its endpoints under ``(match_p DESC, partner ASC)``, removes the
    matched endpoints, and repeats — the distributed analog of
    sequential greedy maximum-weight matching (identical to it whenever
    the round budget drains the frontier; locally-dominant edges are
    exactly the ones sequential greedy would take).  This is the
    assignment constraint deduplication systems apply when each record
    may merge with at most ONE partner per pass — the uniqueness
    discipline of the reference's per-mention argmax best-candidate
    (W4, ``blink/main_dense.py:476-489``) lifted from a bipartite
    mention→entity argmax to a symmetric record graph.

    Plan (100 TB): each round is one window shuffle on ``node`` plus
    two semi/anti joins keyed on ids — no global sort of all edges (the
    sequential-greedy formulation) and no driver state; the edge
    frontier shrinks monotonically and matched pairs leave the loop via
    ``localCheckpoint`` so round k+1 never re-derives round k.  The
    round count is FIXED (not converged-probed) so the DuckDB oracle
    can unroll the identical computation; the emitted ``match_round``
    column pins per-round parity, not just the final set.
    """
    e = (
        _scored(spark, sf_dir)
        .filter(F.col("match_p") >= F.lit(scoring.MATCH_TAU))
        .select("left_id", "right_id", "match_p")
        .localCheckpoint()
    )
    matched = []
    for rnd in range(1, O2O_ROUNDS + 1):
        pern = e.select(
            F.col("left_id").alias("node"),
            F.col("right_id").alias("partner"),
            "match_p",
        ).unionByName(
            e.select(
                F.col("right_id").alias("node"),
                F.col("left_id").alias("partner"),
                "match_p",
            )
        )
        w = Window.partitionBy("node").orderBy(
            F.col("match_p").desc(), F.col("partner").asc()
        )
        best = (
            pern.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("node", "partner")
        )
        bl = best.select(
            F.col("node").alias("left_id"), F.col("partner").alias("right_id")
        )
        br = best.select(
            F.col("partner").alias("left_id"), F.col("node").alias("right_id")
        )
        mutual = (
            e.join(bl, ["left_id", "right_id"], "left_semi")
            .join(br, ["left_id", "right_id"], "left_semi")
            .withColumn("match_round", F.lit(rnd))
            .localCheckpoint()
        )
        matched.append(mutual)
        nodes = mutual.select(F.col("left_id").alias("id")).unionByName(
            mutual.select(F.col("right_id").alias("id"))
        )
        e = (
            e.join(nodes, e.left_id == nodes.id, "left_anti")
            .join(nodes, e.right_id == nodes.id, "left_anti")
            .localCheckpoint()
        )
    out = matched[0]
    for mdf in matched[1:]:
        out = out.unionByName(mdf)
    return out.select(
        "left_id",
        "right_id",
        F.col("match_round").cast("long").alias("match_round"),
        _r6("match_p", 6).alias("match_p"),
    )


def q_er_blocking_rules(spark, sf_dir):
    """Blocking-rule attribution: per rule family — the ``ck:`` composite
    (lang, path_stem) key vs the ``mh:`` MinHash-LSH band keys — how many
    blocks and raw pair slots it generates, how many distinct candidate
    pairs it contributes, how many of those are gold matches, how many
    pairs ONLY it finds, and its standalone recall of the blocked gold
    universe.  This is the rule-level union analysis record-linkage
    practitioners run before committing to a blocking scheme (the
    reference fixes its scheme a priori — Solr keyword + FAISS dense
    retrieval, ``blink/main_dense.py:104-173`` — and never quantifies
    each retriever's marginal contribution; this query does).

    Plan (100 TB): block volume comes from the membership census alone
    (one shuffle on block_key — counts, never pairs); the per-rule
    distinct-pair sets run through the SAME capped/salted
    ``blocking.candidate_pairs`` machinery as production, so a hot block
    cannot blow up the diagnostic any more than it can the pipeline; the
    rule-overlap census is one fixed-width groupBy over (left, right).
    """
    memb = _membership(spark, sf_dir).select("file_id", "block_key")
    fam = memb.withColumn(
        "rule",
        F.when(
            F.col("block_key").startswith("ck:"), F.lit("composite_key")
        ).otherwise(F.lit("minhash_band")),
    )
    census = fam.groupBy("rule", "block_key").agg(F.count(F.lit(1)).alias("n"))
    vol = census.groupBy("rule").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum(F.col("n") * (F.col("n") - 1) / F.lit(2))
        .cast("long")
        .alias("n_pair_slots"),
    )
    rp = None
    for r in ("composite_key", "minhash_band"):
        p = (
            blocking.candidate_pairs(
                fam.filter(F.col("rule") == r).select("file_id", "block_key")
            )
            .select("left_id", "right_id")
            .withColumn("rule", F.lit(r))
        )
        rp = p if rp is None else rp.unionByName(p)
    gold = _rep_gold(spark, sf_dir)
    gl = gold.select(
        F.col("file_id").alias("left_id"), F.col("gold_cluster").alias("g_l")
    )
    gr = gold.select(
        F.col("file_id").alias("right_id"), F.col("gold_cluster").alias("g_r")
    )
    rpl = (
        rp.join(gl, "left_id")
        .join(gr, "right_id")
        .select(
            "rule",
            "left_id",
            "right_id",
            (F.col("g_l") == F.col("g_r")).alias("is_gold"),
        )
        .persist()
    )
    per_rule = rpl.groupBy("rule").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.col("is_gold").cast("long")).cast("long").alias("n_gold_pairs"),
    )
    pair_rules = rpl.groupBy("left_id", "right_id").agg(
        F.countDistinct("rule").alias("n_rules"),
        F.min("rule").alias("only_rule"),
        F.max("is_gold").alias("is_gold"),
    )
    uniq = (
        pair_rules.filter(F.col("n_rules") == 1)
        .groupBy(F.col("only_rule").alias("rule"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_unique_pairs"),
            F.sum(F.col("is_gold").cast("long"))
            .cast("long")
            .alias("n_unique_gold_pairs"),
        )
    )
    tot = pair_rules.agg(
        F.sum(F.col("is_gold").cast("long")).alias("total_gold")
    )
    return (
        vol.join(per_rule, "rule")
        .join(uniq, "rule", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "rule",
            "n_blocks",
            "n_pair_slots",
            "n_pairs",
            "n_gold_pairs",
            F.coalesce("n_unique_pairs", F.lit(0))
            .cast("long")
            .alias("n_unique_pairs"),
            F.coalesce("n_unique_gold_pairs", F.lit(0))
            .cast("long")
            .alias("n_unique_gold_pairs"),
            # -1.0 sentinel on a corpus with no blocked gold pair: 0/0 is
            # NULL in Spark but NaN/inf under DuckDB's IEEE division —
            # the one degenerate input where the engines would diverge
            _r6(
                F.when(
                    F.col("total_gold") > 0,
                    F.col("n_gold_pairs") / F.col("total_gold"),
                ).otherwise(F.lit(-1.0)),
                6,
            ).alias("recall_vs_union"),
        )
    )


# thresholds for the cluster-level operating-point sweep; MATCH_TAU first
# so the sweep contains the production operating point as its anchor row
THRESHOLD_TAUS = [0.5, 0.9, 0.99]


def q_er_threshold_clusters(spark, sf_dir):
    """Cluster-level threshold sweep: re-run transitive closure at each
    match threshold in ``THRESHOLD_TAUS`` and report what the CLUSTERS
    look like — edge count, non-singleton cluster count, max cluster
    size, matched-file count, and pairwise precision/recall/F1 against
    gold computed FROM the cluster assignment (every intra-cluster pair
    counts, including pairs transitive closure inferred without scoring
    them).  The edge-level ROC (``er_roc_curve``) cannot see
    closure-induced over-merging; this sweep is the operating-point
    picker for the actual deliverable, the clusters (the reference
    tunes its NIL threshold the same way, on final-answer accuracy —
    ``blink/main_dense.py:476-489``).

    Plan (100 TB): per threshold, edges are a FILTER over the persisted
    scored table (no re-scoring) and clustering reuses the rep-collapsed
    large-star/small-star CC; all pairwise counts come from C(n,2) over
    group sizes — aggregates only, never materialized pairs."""
    ing = _ingested(spark, sf_dir)
    membership = blocking.rep_map(ing)
    gold = ing.select("file_id", "gold_cluster")
    gp_row = (
        gold.groupBy("gold_cluster")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.sum(F.col("n") * (F.col("n") - 1) / F.lit(2))
            .cast("long")
            .alias("gold_pairs")
        )
    )
    scored = _scored(spark, sf_dir)
    out = None
    for tau in THRESHOLD_TAUS:
        rep_edges = scored.filter(F.col("match_p") >= F.lit(tau)).select(
            "left_id", "right_id"
        )
        ne = rep_edges.agg(F.count(F.lit(1)).cast("long").alias("n_match_edges"))
        clusters = clustering.connected_components_via_reps(
            rep_edges, membership
        )
        lbl = clusters.join(gold, "file_id")
        sizes = lbl.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n"))
        cstats = sizes.agg(
            F.sum(F.when(F.col("n") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("n_clusters"),
            F.max("n").cast("long").alias("max_cluster_size"),
            F.sum(F.when(F.col("n") >= 2, F.col("n")).otherwise(0))
            .cast("long")
            .alias("n_matched_files"),
            F.sum(F.col("n") * (F.col("n") - 1) / F.lit(2))
            .cast("long")
            .alias("pred_pairs"),
        )
        correct = (
            lbl.groupBy("cluster_id", "gold_cluster")
            .agg(F.count(F.lit(1)).alias("m"))
            .agg(
                F.sum(F.col("m") * (F.col("m") - 1) / F.lit(2))
                .cast("long")
                .alias("correct_pairs")
            )
        )
        row = (
            ne.crossJoin(cstats)
            .crossJoin(correct)
            .crossJoin(gp_row)
            .select(F.lit(float(tau)).alias("tau"), "*")
        )
        out = row if out is None else out.unionByName(row)
    prec = F.when(
        F.col("pred_pairs") > 0, F.col("correct_pairs") / F.col("pred_pairs")
    ).otherwise(F.lit(-1.0))
    rec = F.col("correct_pairs") / F.col("gold_pairs")
    return out.select(
        _r6("tau", 6).alias("tau"),
        "n_match_edges",
        "n_clusters",
        "max_cluster_size",
        "n_matched_files",
        "pred_pairs",
        "correct_pairs",
        "gold_pairs",
        _r6(prec, 6).alias("precision"),
        _r6(rec, 6).alias("recall"),
        _r6(
            F.when(
                (prec > 0) & (prec + rec > 0),
                F.lit(2.0) * prec * rec / (prec + rec),
            ).otherwise(F.lit(-1.0)),
            6,
        ).alias("f1"),
    )


def q_er_triangles(spark, sf_dir):
    """Per-cluster triangle census over the match-edge graph: wedges
    (open 2-paths), closed triangles, and the transitivity ratio
    3T/W — the structural over-merge diagnostic that separates clique-like
    clusters (every match independently confirmed) from chain-like ones
    held together by transitive inference alone (``er_cluster_density``'s
    edge-count view cannot tell a path from a near-clique at equal
    density; triangles can).

    Plan (100 TB): edges are already canonically oriented left<right, so
    the triangle count is the standard two-join enumeration on the
    oriented graph (each triangle counted exactly once); wedge counts are
    C(deg,2) over the symmetric degree — one aggregate.  Both shuffles key
    on node/edge ids; nothing touches payloads and nothing is quadratic
    in cluster size beyond the true wedge/triangle counts themselves."""
    e = _edges(spark, sf_dir).persist()
    lbl = _clusters(spark, sf_dir)
    sym = e.select(
        F.col("left_id").alias("src"), F.col("right_id").alias("dst")
    ).unionByName(
        e.select(F.col("right_id").alias("src"), F.col("left_id").alias("dst"))
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    wedges = (
        deg.join(lbl, deg.src == lbl.file_id)
        .groupBy("cluster_id")
        .agg(
            F.sum(F.col("deg") * (F.col("deg") - 1) / F.lit(2))
            .cast("long")
            .alias("n_wedges")
        )
    )
    e1 = e.select(F.col("left_id").alias("a"), F.col("right_id").alias("b"))
    e2 = e.select(F.col("left_id").alias("b"), F.col("right_id").alias("c"))
    e3 = e.select(F.col("left_id").alias("a"), F.col("right_id").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    tric = (
        tri.join(lbl, tri.a == lbl.file_id)
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    edges_c = (
        e.join(lbl, e.left_id == lbl.file_id)
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    )
    sizes = lbl.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    out = (
        sizes.filter(F.col("n_members") >= 2)
        .join(edges_c, "cluster_id", "left")
        .join(wedges, "cluster_id", "left")
        .join(tric, "cluster_id", "left")
        .select(
            "cluster_id",
            "n_members",
            F.coalesce("n_edges", F.lit(0)).cast("long").alias("n_edges"),
            F.coalesce("n_wedges", F.lit(0)).cast("long").alias("n_wedges"),
            F.coalesce("n_triangles", F.lit(0))
            .cast("long")
            .alias("n_triangles"),
        )
    )
    return out.withColumn(
        "transitivity",
        _r6(
            F.when(
                F.col("n_wedges") > 0,
                F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"),
            ).otherwise(F.lit(-1.0)),
            6,
        ),
    )


def q_er_model_disagreement(spark, sf_dir):
    """Model-disagreement review queue: the candidate pairs where the
    UNSUPERVISED Fellegi–Sunter decision (posterior ≥ 0.5 under the
    EM-fitted mixture) and the supervised calibrated logistic
    (match_p ≥ τ) disagree — committee-disagreement sampling, the
    highest-value human-labeling targets in active-learning linkage
    loops.  ``er_fs_posteriors`` aggregates this agreement per pattern;
    this emits the actual pairs with both scores so a reviewer can act
    (the confidence-band queue ``er_review_queue`` flags ONE model's
    uncertainty; this flags two models' conflict).

    Plan (100 TB): the fitted mixture is O(2^F) numbers computed from
    the same census collapse as ``er_fs_em``; posteriors attach to pairs
    via ONE broadcast join on the agreement pattern; the queue itself is
    a filter over the persisted scored table — no new shuffle of pair
    payloads."""
    nf = len(FS_FEATURES)
    census = _fs_census_rows(spark, sf_dir)
    patterns = [
        (tuple(bool(r[f"a{i}"]) for i in range(nf)), float(r["n"]))
        for r in census
    ]
    lam, m, u = _fs_em_params(patterns)
    post_rows = [
        tuple(list(a) + [_fs_posterior(list(a), lam, m, u)])
        for a, _ in patterns
    ]
    schema = (
        ", ".join(f"a{i} boolean" for i in range(nf)) + ", fs_posterior double"
    )
    post = spark.createDataFrame(post_rows, schema)
    s = _scored(spark, sf_dir).select(
        "left_id",
        "right_id",
        "match_p",
        *[
            (F.col(c) >= F.lit(t)).alias(f"a{i}")
            for i, (c, t) in enumerate(FS_FEATURES)
        ],
    )
    joined = s.join(F.broadcast(post), [f"a{i}" for i in range(nf)])
    lg = F.col("match_p") >= F.lit(scoring.MATCH_TAU)
    fsm = F.col("fs_posterior") >= F.lit(0.5)
    return joined.filter(lg != fsm).select(
        "left_id",
        "right_id",
        *[
            F.col(f"a{i}").alias(f"agree_{c}")
            for i, (c, _) in enumerate(FS_FEATURES)
        ],
        _r6("match_p", 6).alias("match_p"),
        _r6("fs_posterior", 6).alias("fs_posterior"),
        lg.alias("logistic_match"),
        fsm.alias("fs_match"),
    )


def q_er_phonetic_block(spark, sf_dir):
    """Phonetic-key blocking — the fifth blocker family (after composite
    key, MinHash-LSH bands, sorted neighborhood, and meta-blocking):
    records whose ``path_stem`` SOUNDS alike block together despite
    spelling variance ("parseargs" / "parse_args" / "parsargs" share a
    key), the classic name-matching blocker of census-era record linkage
    (Soundex-style: first letter + 3 consonant-class codes).  Emits the
    candidate pairs the phonetic blocker generates with their gold
    verdict, so its precision/recall can be read next to
    ``er_blocking_rules``.

    Plan (100 TB): the key is a pure column-expression chain (translate
    + regexp_replace, no UDF, identical under Java regex and RE2 — no
    backreferences); pair generation reuses the capped/salted
    ``blocking.candidate_pairs`` machinery, so phonetic collisions on
    ubiquitous stems cannot blow up the join."""
    reps = blocking.representatives(_with_sig(spark, sf_dir))
    memb = reps.select(
        "file_id",
        F.concat(
            F.lit("px:"), blocking.phonetic_key_col(F.col("path_stem"))
        ).alias("block_key"),
    ).filter(F.length("block_key") > 3)
    pairs = blocking.candidate_pairs(memb)
    gold = _rep_gold(spark, sf_dir)
    gl = gold.select(
        F.col("file_id").alias("left_id"), F.col("gold_cluster").alias("g_l")
    )
    gr = gold.select(
        F.col("file_id").alias("right_id"), F.col("gold_cluster").alias("g_r")
    )
    return (
        pairs.select("left_id", "right_id", "block_key")
        .join(gl, "left_id")
        .join(gr, "right_id")
        .select(
            "left_id",
            "right_id",
            "block_key",
            (F.col("g_l") == F.col("g_r")).alias("is_gold"),
        )
    )


CLK_M = 256  # Bloom-filter width (bit positions)
CLK_K = 4    # hash functions per bigram (Kirsch–Mitzenmacher double hashing)


def q_er_clk_linkage(spark, sf_dir):
    """Privacy-preserving record linkage (Schnell/Bachteler/Reiher
    cryptographic long-term keys): each record's ``path_stem`` is encoded
    as the SET-BIT positions of a Bloom filter over its padded character
    bigrams — ``CLK_K`` positions per bigram by double-hashing the
    engine-agnostic 60-bit md5 base hash — and candidate pairs are scored
    by Dice similarity over the ENCODINGS alone, never the plaintext.
    Emits the encoded Dice next to the plaintext bigram Dice and the gold
    verdict, so the privacy-utility gap of the encoding is measured on
    the same pairs (the linkage mode used when two parties cannot share
    raw identifiers; the reference always links plaintext).

    Plan (100 TB): the encoding is a pure JVM column chain on the record
    table (md5 + integer arithmetic inside ``transform`` — no UDF, no
    shuffle); pair scoring is array intersection over two ~M-bit sorted
    sets fetched by the same id-keyed joins as every scored stage; pairs
    come from the persisted candidate stage, so nothing new is
    generated."""
    h = "CAST(conv(substring(md5(b), 1, 15), 16, 10) AS BIGINT)"
    reps = blocking.representatives(_with_sig(spark, sf_dir)).select(
        "file_id", "path_stem", "gold_cluster"
    )
    enc = (
        reps.withColumn(
            "_pad", F.concat(F.lit("_"), F.lower(F.col("path_stem")), F.lit("_"))
        )
        .withColumn(
            "_bi",
            F.expr(
                "transform(sequence(1, length(_pad) - 1),"
                " i -> substring(_pad, i, 2))"
            ),
        )
        .withColumn(
            "clk",
            F.expr(
                "array_sort(array_distinct(flatten(transform(_bi, b -> "
                f"transform(sequence(0, {CLK_K - 1}), i -> "
                f"CAST(({h} div 1073741824 + i * ({h} % 1073741824))"
                f" % {CLK_M} AS INT))))))"
            ),
        )
        .select(
            "file_id",
            "gold_cluster",
            F.array_distinct("_bi").alias("bid"),
            "clk",
        )
    )
    p = _pairs(spark, sf_dir).select("left_id", "right_id")
    le = enc.select(
        F.col("file_id").alias("left_id"),
        F.col("gold_cluster").alias("g_l"),
        F.col("bid").alias("l_bid"),
        F.col("clk").alias("l_clk"),
    )
    re_ = enc.select(
        F.col("file_id").alias("right_id"),
        F.col("gold_cluster").alias("g_r"),
        F.col("bid").alias("r_bid"),
        F.col("clk").alias("r_clk"),
    )
    j = p.join(le, "left_id").join(re_, "right_id")
    clk_dice = (
        F.lit(2.0)
        * F.size(F.array_intersect("l_clk", "r_clk"))
        / (F.size("l_clk") + F.size("r_clk"))
    )
    stem_dice = (
        F.lit(2.0)
        * F.size(F.array_intersect("l_bid", "r_bid"))
        / (F.size("l_bid") + F.size("r_bid"))
    )
    return j.select(
        "left_id",
        "right_id",
        _r6(clk_dice, 6).alias("clk_dice"),
        _r6(stem_dice, 6).alias("stem_dice"),
        (F.col("g_l") == F.col("g_r")).alias("is_gold"),
    )


def q_er_fs_waterfall(spark, sf_dir):
    """Match-weight waterfall (the Splink explainability chart as data):
    for every OBSERVED agreement pattern, one row per evidence term —
    the λ prior plus each feature's log2 agreement/disagreement weight —
    with the running cumulative log-odds and the pattern's final
    posterior, so a reviewer can see exactly which comparisons pushed a
    pair over (or under) the match line.  ``er_fs_em`` publishes the
    weights; this composes them into the per-decision audit trail.

    Plan (100 TB): pure driver-side composition over the O(2^F) fitted
    mixture — ≤ 2^F × (F+1) rows at any data scale; the pair table is
    never touched beyond the census collapse ``er_fs_em`` already does."""
    nf = len(FS_FEATURES)
    census = _fs_census_rows(spark, sf_dir)
    patterns = [
        (tuple(bool(r[f"a{i}"]) for i in range(nf)), float(r["n"]))
        for r in census
    ]
    lam, m, u = _fs_em_params(patterns)
    prior = math.log2(lam / (1.0 - lam))
    rows = []
    for a, n in patterns:
        label = "".join("T" if x else "F" for x in a)
        total = prior
        # agree is a 3-state STRING ('T'/'F', '' for the prior term): a
        # null boolean surfaces as None in Spark but float-NaN through
        # DuckDB→pandas, and the driver canonicalizer encodes those
        # differently — a nullable column here would hash-mismatch on
        # representation alone
        rows.append((label, int(n), 0, "prior", "", prior, prior))
        for i, (name, _) in enumerate(FS_FEATURES):
            w = (
                math.log2(m[i] / u[i])
                if a[i]
                else math.log2((1.0 - m[i]) / (1.0 - u[i]))
            )
            total = total + w
            rows.append(
                (label, int(n), i + 1, name, "T" if a[i] else "F", w, total)
            )
    # posterior from the pattern's TOTAL log-odds (2^total odds) — the
    # same log-space formula the SQL mirror uses, so the two engines
    # share op order
    out = []
    totals = {r[0]: r[6] for r in rows if r[2] == nf}
    for label, n, idx, term, agree, w, cum in rows:
        odds = 2.0 ** totals[label]
        out.append(
            (label, n, idx, term, agree, w, cum, odds / (1.0 + odds))
        )
    return spark.createDataFrame(
        out,
        "pattern string, n_pairs long, term_index long, term string,"
        " agree string, log2_weight double, cum_log_odds double,"
        " fs_posterior double",
    ).select(
        "pattern",
        "n_pairs",
        "term_index",
        "term",
        "agree",
        _r6("log2_weight", 6).alias("log2_weight"),
        _r6("cum_log_odds", 6).alias("cum_log_odds"),
        _r6("fs_posterior", 6).alias("fs_posterior"),
    )


def q_er_rand_index(spark, sf_dir):
    """Pair-counting external cluster-quality indices vs gold: Rand,
    Adjusted Rand (Hubert–Arabie), Fowlkes–Mallows, and pairwise Jaccard
    — the standard ER evaluation complement to ``er_bcubed`` (B-cubed is
    record-averaged; these are pair-counted, so huge clusters weigh
    quadratically — exactly the sensitivity an over-merge audit wants).

    Plan (100 TB): everything derives from the (cluster, gold)
    contingency cells — three combinable aggregates over the labeled
    record table, output is ONE row; no pair is ever materialized."""
    lbl = _clusters(spark, sf_dir).join(
        _ingested(spark, sf_dir).select("file_id", "gold_cluster"), "file_id"
    )
    c2 = lambda c: F.sum(F.col(c) * (F.col(c) - 1) / F.lit(2))  # noqa: E731
    cells = (
        lbl.groupBy("cluster_id", "gold_cluster")
        .agg(F.count(F.lit(1)).alias("m"))
        .agg(c2("m").cast("long").alias("agree_pairs"))
    )
    rows = (
        lbl.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(c2("n").cast("long").alias("pred_pairs"))
    )
    cols = (
        lbl.groupBy("gold_cluster")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(c2("n").cast("long").alias("gold_pairs"))
    )
    nrec = lbl.agg(F.count(F.lit(1)).cast("long").alias("n_records"))
    j = cells.crossJoin(rows).crossJoin(cols).crossJoin(nrec)
    n = F.col("n_records")
    tot = n * (n - 1) / F.lit(2)
    a, b1, b2 = F.col("agree_pairs"), F.col("pred_pairs"), F.col("gold_pairs")
    exp_a = b1 * b2 / tot
    return j.select(
        "n_records",
        "pred_pairs",
        "gold_pairs",
        "agree_pairs",
        _r6((tot - b1 - b2 + F.lit(2.0) * a) / tot, 6).alias("rand_index"),
        # -1.0 sentinels on degenerate clusterings (all-singleton on both
        # sides gives 0/0: NULL in Spark, NaN/inf under DuckDB's IEEE
        # division) — same convention as q_er_nmi/q_er_triangles
        _r6(
            F.when(
                (b1 + b2) / F.lit(2.0) - exp_a != 0,
                (a - exp_a) / ((b1 + b2) / F.lit(2.0) - exp_a),
            ).otherwise(F.lit(-1.0)),
            6,
        ).alias("adjusted_rand"),
        _r6(
            F.when(b1 * b2 > 0, a / F.sqrt(b1 * b2)).otherwise(F.lit(-1.0)), 6
        ).alias("fowlkes_mallows"),
        _r6(
            F.when(b1 + b2 - a > 0, a / (b1 + b2 - a)).otherwise(F.lit(-1.0)),
            6,
        ).alias("jaccard_index"),
    )


def q_er_nmi(spark, sf_dir):
    """Information-theoretic external cluster quality vs gold: mutual
    information, sqrt-normalized NMI, and the homogeneity/completeness/
    V-measure triple (Rosenberg & Hirschberg 2007) — the third standard
    evaluation family next to pair-counting (``er_rand_index``) and
    record-averaged (``er_bcubed``); entropy weighting makes it
    insensitive to the quadratic blow-up of one huge cluster that
    dominates pair counts.

    Plan (100 TB): everything derives from the (cluster, gold)
    contingency cells and their marginals — three combinable aggregates
    over the labeled record table, ONE output row."""
    lbl = _clusters(spark, sf_dir).join(
        _ingested(spark, sf_dir).select("file_id", "gold_cluster"), "file_id"
    )
    ent = lambda cnt, n: F.sum(  # noqa: E731
        -(cnt / n) * F.log(cnt / n)
    )
    nrec = lbl.agg(F.count(F.lit(1)).cast("double").alias("n"))
    n = F.col("n")
    hp = (
        lbl.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .crossJoin(F.broadcast(nrec))
        .agg(ent(F.col("c"), n).alias("h_pred"))
    )
    hg = (
        lbl.groupBy("gold_cluster")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .crossJoin(F.broadcast(nrec))
        .agg(ent(F.col("c"), n).alias("h_gold"))
    )
    hj = (
        lbl.groupBy("cluster_id", "gold_cluster")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .crossJoin(F.broadcast(nrec))
        .agg(ent(F.col("c"), n).alias("h_joint"))
    )
    j = nrec.crossJoin(hp).crossJoin(hg).crossJoin(hj)
    mi = F.col("h_pred") + F.col("h_gold") - F.col("h_joint")
    hom = F.when(F.col("h_gold") > 0, mi / F.col("h_gold")).otherwise(
        F.lit(1.0)
    )
    com = F.when(F.col("h_pred") > 0, mi / F.col("h_pred")).otherwise(
        F.lit(1.0)
    )
    return j.select(
        F.col("n").cast("long").alias("n_records"),
        _r6("h_pred", 6).alias("h_pred"),
        _r6("h_gold", 6).alias("h_gold"),
        _r6(mi, 6).alias("mutual_info"),
        _r6(
            F.when(
                (F.col("h_pred") > 0) & (F.col("h_gold") > 0),
                mi / F.sqrt(F.col("h_pred") * F.col("h_gold")),
            ).otherwise(F.lit(1.0)),
            6,
        ).alias("nmi"),
        _r6(hom, 6).alias("homogeneity"),
        _r6(com, 6).alias("completeness"),
        _r6(
            F.when(hom + com > 0, F.lit(2.0) * hom * com / (hom + com))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("v_measure"),
    )


# side split for the clean-clean linkage demo: last hex nibble of the
# content-free file_id — deterministic, uniform, engine-independent
_EVEN_NIBBLES = ["0", "2", "4", "6", "8", "a", "c", "e"]


def q_er_bipartite_link(spark, sf_dir):
    """Clean-clean record linkage (two-dataset link, not dedup): split
    the corpus into sources A/B by file_id nibble parity, keep only the
    CROSS-source candidate pairs, and emit each A record's best B match
    — rank-1 under (match_p DESC, b_id ASC) — with its threshold verdict
    and a mutual-best flag (B's best A is this A).  This is the
    ``link_only`` workload of record-linkage practice: each dataset is
    internally duplicate-free by assumption, so within-source pairs are
    excluded a priori and each record links to at most one counterpart
    (the reference's per-mention argmax over a SEPARATE entity catalogue,
    ``blink/main_dense.py:476-489``, is exactly this shape — mentions
    never match mentions).

    Plan (100 TB): cross-source pairs are a FILTER over the persisted
    scored table (blocking and scoring are shared with the dedup path —
    in production the source-id predicate would push into the pair
    generation, same plan shape); best-match is one window shuffle per
    side keyed on the record id; the mutual join is id-keyed."""
    s = _scored(spark, sf_dir).select("left_id", "right_id", "match_p")
    is_a = lambda c: F.substring(F.col(c), 64, 1).isin(_EVEN_NIBBLES)  # noqa: E731
    cross = s.filter(is_a("left_id") != is_a("right_id")).select(
        F.when(is_a("left_id"), F.col("left_id"))
        .otherwise(F.col("right_id"))
        .alias("a_id"),
        F.when(is_a("left_id"), F.col("right_id"))
        .otherwise(F.col("left_id"))
        .alias("b_id"),
        "match_p",
    )
    wa = Window.partitionBy("a_id").orderBy(
        F.col("match_p").desc(), F.col("b_id").asc()
    )
    best_a = (
        cross.withColumn("rk", F.row_number().over(wa))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    wb = Window.partitionBy("b_id").orderBy(
        F.col("match_p").desc(), F.col("a_id").asc()
    )
    best_b = (
        cross.withColumn("rk", F.row_number().over(wb))
        .filter(F.col("rk") == 1)
        .select(F.col("b_id").alias("_b"), F.col("a_id").alias("_a_of_b"))
    )
    return (
        best_a.join(best_b, best_a.b_id == best_b._b, "left")
        .select(
            "a_id",
            "b_id",
            _r6("match_p", 6).alias("match_p"),
            (F.col("match_p") >= F.lit(scoring.MATCH_TAU)).alias("is_match"),
            F.coalesce(F.col("_a_of_b") == F.col("a_id"), F.lit(False)).alias(
                "mutual_best"
            ),
        )
    )


def q_clusters(spark, sf_dir):
    """Stage D connected components (KBP clustering analog)."""
    return _clusters(spark, sf_dir)


def q_incremental_clusters(spark, sf_dir):
    """Incremental two-batch linking under the hard oracle gate (I1/I2:
    the KBP incremental-KB loop, ``scripts/kbp_simulation.py:316-366``).

    The corpus is split deterministically in half by a sha bit of the
    path; batch 1 is linked alone, batch 2 is linked against the
    accumulated state (feature kernels run on the NEW rows only,
    old-only blocks are pruned, prior assignments enter the closure as
    star edges).  The merged assignment must hash-match the ONE-SHOT
    transitive closure the DuckDB oracle computes over the whole table —
    the incremental-equals-batch guarantee, proven end-to-end against an
    independent engine rather than only pinned in unit tests."""
    from blink_spark import incremental

    src = load_source(spark, sf_dir)
    first = F.substring(F.sha2(F.col("path"), 256), 1, 1).isin(
        *list("01234567")
    )
    st1 = incremental.link_batch(None, src.filter(first)).persist()
    st2 = incremental.link_batch(st1, src.filter(~first))
    return st2.clusters


# the deterministic retraction slice for q_unlink_clusters — rows whose
# sha256(path) starts with '0' or '1' (~1/8 of the corpus); the DuckDB
# oracle applies the complementary predicate to its src CTE
_UNLINK_WHERE = "WHERE substr(sha256(path), 1, 1) NOT IN ('0', '1')"


def _link_state_features(spark, sf_dir):
    """Full-corpus LinkState.features assembled from the harness's shared
    cached stages: band_keys etc. from the signature stage, the embedding
    from the feature stage — a thin key join, no kernel rerun."""
    from blink_spark import incremental

    return _cached(
        spark, sf_dir, "link_state_features",
        lambda: _with_sig(spark, sf_dir)
        .select([c for c in incremental.FEATURE_COLS if c != "embedding"])
        .join(
            _features(spark, sf_dir).select("file_id", "embedding"),
            "file_id",
        ),
    )


def q_unlink_clusters(spark, sf_dir):
    """Retraction under the hard oracle gate (the inverse of
    ``q_incremental_clusters``): link the FULL corpus, then
    ``incremental.unlink_batch`` a deterministic ~1/8 slice of it.

    ``unlink_batch`` repairs ONLY the clusters the deleted rows touched
    (re-blocking + re-scoring the surviving members of those clusters —
    zero feature kernels, untouched assignments stitched back verbatim),
    so per-batch retraction work scales with the affected clusters'
    footprint, not the corpus.  The oracle recomputes the one-shot
    transitive closure over the REDUCED corpus in DuckDB, so a hash match
    proves the delta repair is exactly equivalent to recomputing from
    scratch — including any cluster splits the deletions cause (GDPR
    erasure / KB-retraction semantics, the inverse of the KBP loop in
    ``scripts/kbp_simulation.py:316-366``).

    The full-corpus state is assembled from the harness's shared cached
    stages (``_with_sig``/``_features``/``_clusters``) instead of a
    second from-scratch ``link_batch`` — the feature kernels run once per
    sweep, and the joined LinkState is identical to what ``link_batch``
    returns (cluster ids are min(file_id) per component either way;
    ``er_clusters`` and ``er_incremental_clusters`` pin that equivalence
    against the same oracle closure)."""
    from blink_spark import incremental

    state = incremental.LinkState(
        features=_link_state_features(spark, sf_dir),
        clusters=_clusters(spark, sf_dir),
    )
    src = load_source(spark, sf_dir)
    is_del = F.substring(F.sha2(F.col("path"), 256), 1, 1).isin("0", "1")
    del_ids = ingest.ingest(src.filter(is_del)).select("file_id")
    return incremental.unlink_batch(state, del_ids).clusters


# KBP re-link A/B: recall grid and the deterministic ~1/8 holdout split
# (rows whose sha256(path) starts with 'e'/'f' are held-out "mentions";
# the rest is the base KB). The oracle mirrors both constants.
KBP_K_GRID = [1, 2, 4, 8, 16]
_KBP_HOLDOUT_HEX = ("e", "f")


def q_kbp_relink(spark, sf_dir):
    """Representation re-link A/B — the reference KBP experiment
    (``scripts/kbp_simulation.py:316-366,439-486``): build the KB state
    over the base split, compact it under BOTH representations (``all`` —
    every member encoding stays indexed, the reference default — vs
    ``medoid``, its ``--medoid`` opt-in), re-link the held-out mentions
    against each index, and report recall@k per mode.

    A mention's candidates are the index entries sharing a blocking key
    (composite (lang, path_stem) key or a MinHash-LSH band — the same
    retrieve stage as the pipeline), scored with the full pairwise
    kernel and ranked by match_p desc / entry_id asc.  A mention counts
    as recalled at k iff some entry of its gold entity ranks ≤ k; the
    denominator is every *linkable* mention (gold entity has ≥1 base
    row), including mentions with zero candidates.  Output:
    (mode, k, n_mentions, n_hit, recall, n_entries, n_pairs) — the
    medoid-vs-all tradeoff is recall per retrieval cost: on near-dup
    corpora both arms saturate recall, and the A/B signal is the index
    size (n_entries) and scored-candidate volume (n_pairs) the ``all``
    representation pays for it (the reference's finding that medoid
    encodings keep accuracy at a fraction of the index,
    ``scripts/kbp_simulation.py:439-486``).

    The whole decision chain is deterministic, so the DuckDB oracle
    replays it end-to-end (base closure via the node-restricted CTE
    chain, medoid per cluster, block-join retrieve, match_p rank).
    The medoid sample cap (``incremental.MEDOID_SAMPLE_CAP``) never
    binds at oracle scale, so the oracle needs no cap arm."""
    from blink_spark import incremental

    feats = _link_state_features(spark, sf_dir)
    gold = _ingested(spark, sf_dir).select("file_id", "gold_cluster")
    hold = F.substring(F.sha2(F.col("path"), 256), 1, 1).isin(
        *_KBP_HOLDOUT_HEX
    )
    base_feat = feats.filter(~hold)
    hold_feat = feats.filter(hold)
    base_state = incremental.link_features(None, base_feat)
    base_state.clusters.persist()

    ment_memb = blocking.block_membership(
        hold_feat.select("file_id", "lang", "path_stem", "band_keys")
    )
    base_gold_clusters = (
        gold.join(base_feat.select("file_id"), "file_id")
        .select("gold_cluster")
        .distinct()
    )
    linkable = (
        hold_feat.select("file_id")
        .join(gold, "file_id")
        .join(base_gold_clusters, "gold_cluster", "left_semi")
        .select(F.col("file_id").alias("mention_id"))
    )
    grid = spark.createDataFrame([(k,) for k in KBP_K_GRID], "k int")
    gm = gold.select(
        F.col("file_id").alias("left_id"), F.col("gold_cluster").alias("g_m")
    )
    ge = gold.select(
        F.col("file_id").alias("right_id"), F.col("gold_cluster").alias("g_e")
    )

    out = None
    for mode in ("medoid", "all"):
        idx = incremental.cluster_representatives(
            base_state.features, base_state.clusters, mode
        )
        idx_memb = blocking.block_membership(
            idx.select("file_id", "lang", "path_stem", "band_keys")
        ).withColumnRenamed("file_id", "entry_id")
        pairs = (
            ment_memb.join(idx_memb, "block_key")
            .select(
                F.col("file_id").alias("left_id"),
                F.col("entry_id").alias("right_id"),
            )
            .distinct()
            .withColumn("block_key", F.lit("kbp"))
            .withColumn("salt", F.lit(0))
        )
        # per-mode retrieval-cost scalars (single-row broadcast aggregates)
        ecount = idx.agg(F.count("*").cast("long").alias("n_entries"))
        pcount = pairs.agg(F.count("*").cast("long").alias("n_pairs"))
        scored = scoring.score_pairs(pairs, feats)
        w = Window.partitionBy("left_id").orderBy(
            F.desc("match_p"), F.asc("right_id")
        )
        ranked = scored.withColumn("rk", F.row_number().over(w))
        gold_rank = (
            ranked.join(gm, "left_id")
            .join(ge, "right_id")
            .filter(F.col("g_m") == F.col("g_e"))
            .groupBy(F.col("left_id").alias("mention_id"))
            .agg(F.min("rk").alias("gold_rank"))
        )
        res = (
            linkable.join(gold_rank, "mention_id", "left")
            .crossJoin(F.broadcast(grid))
            .groupBy("k")
            .agg(
                F.count("*").cast("long").alias("n_mentions"),
                F.sum(
                    F.when(F.col("gold_rank") <= F.col("k"), 1).otherwise(0)
                ).cast("long").alias("n_hit"),
            )
            .crossJoin(F.broadcast(ecount))
            .crossJoin(F.broadcast(pcount))
            .select(
                F.lit(mode).alias("mode"),
                F.col("k").cast("long").alias("k"),
                "n_mentions",
                "n_hit",
                _r6(F.col("n_hit") / F.col("n_mentions"), 6).alias("recall"),
                "n_entries",
                "n_pairs",
            )
        )
        out = res if out is None else out.unionByName(res)
    return out


def q_cdc_clusters(spark, sf_dir):
    """CDC retract-stream linkage under the hard oracle gate: the corpus
    is replayed as ordered micro-batches of an ``op``-tagged change
    stream — batch 1 inserts half the rows, batch 2 inserts the rest AND
    carries key-only DELETE events for the ``er_unlink_clusters`` slice
    (sha256(path) first hex in {0,1}).  ``streaming.stream_link_cdc``
    links inserts incrementally and retracts deletes via
    ``incremental.unlink_batch`` with merge-on-read tombstones, and the
    final published assignment must hash-match the one-shot DuckDB
    closure over the REDUCED corpus — streamed CDC ≡ batch rebuild,
    proven against an independent engine.

    The change stream is synthesized WITH SPARK (filter on the same
    sha-prefix predicate + ``write.parquet`` per batch — the corpus never
    materializes on the driver; only the finished part-FILE is renamed
    into the watched dir, a metadata move). This SIMULATES file-drop
    arrival inside one correctness query, exactly like the
    ``evt_stream_*`` queries; production events arrive from Kafka/file
    drops already batched."""
    import glob
    import os
    import shutil
    import tempfile
    import time

    from blink_spark import streaming

    src = load_source(spark, sf_dir)
    first_hex = F.substring(F.sha2(F.col("path"), 256), 1, 1)
    null_s = F.lit(None).cast("string")
    ins1 = src.filter(first_hex.isin(*"01234567")).withColumn(
        "op", F.lit("insert")
    )
    ins2 = src.filter(~first_hex.isin(*"01234567")).withColumn(
        "op", F.lit("insert")
    )
    dels = src.filter(first_hex.isin("0", "1")).select(
        "repo",
        "path",
        "commit",
        null_s.alias("lang"),
        null_s.alias("content"),
        null_s.alias("gold_cluster"),
        F.lit("delete").alias("op"),
    )
    b2 = ins2.unionByName(dels)

    input_dir = tempfile.mkdtemp(prefix="er_cdc_in_")
    now = time.time()
    for i, b in enumerate((ins1, b2)):
        # one part-file per batch: the file IS the micro-batch under
        # maxFilesPerTrigger=1, and its mtime fixes the arrival order
        staging = tempfile.mkdtemp(prefix=f"er_cdc_stage{i}_")
        b.coalesce(1).write.mode("overwrite").parquet(staging)
        (part,) = glob.glob(os.path.join(staging, "part-*.parquet"))
        p = os.path.join(input_dir, f"b{i}.parquet")
        shutil.move(part, p)
        os.utime(p, (now + i, now + i))
        shutil.rmtree(staging, ignore_errors=True)
    state_dir = tempfile.mkdtemp(prefix="er_cdc_state_")
    q = streaming.stream_link_cdc(
        spark,
        input_dir,
        state_dir=state_dir,
        checkpoint_dir=tempfile.mkdtemp(prefix="er_cdc_ck_"),
    )
    q.awaitTermination(600)
    return streaming.latest_clusters(spark, state_dir)


def q_cluster_sizes(spark, sf_dir):
    """Cluster-size histogram (``value_counts`` report analog, §2.5 A7)."""
    sizes = _clusters(spark, sf_dir).groupBy("cluster_id").agg(
        F.count("*").alias("n_members")
    )
    return sizes.groupBy("n_members").agg(
        F.count("*").cast("long").alias("n_clusters")
    )


def q_confusion(spark, sf_dir):
    """Pairwise confusion counts vs gold over the candidate-pair universe
    (classification_report analog, §2.5 A9)."""
    ing = _ingested(spark, sf_dir)
    pairs = _pairs(spark, sf_dir)
    sha = blocking.exact_dup_edges(ing)
    universe = (
        pairs.select("left_id", "right_id", "block_key")
        .unionByName(sha.select("left_id", "right_id", "block_key"))
        .groupBy("left_id", "right_id")
        .agg(F.min("block_key").alias("block_key"))
    )
    gold = ing.select("file_id", "gold_cluster")
    labeled = evaluate.labeled_pairs(universe, gold)
    pred = evaluate.predicted_pair_labels(labeled, _clusters(spark, sf_dir))
    return evaluate.pairwise_confusion(pred).select(
        "is_match", "pred_match", F.col("n").cast("long").alias("n")
    )


def q_block_census(spark, sf_dir):
    """Block-size census — the skew instrument that drives salting
    (SURVEY.md §4 skew row): per block-size bucket, how many blocks and
    how many candidate pairs they would induce (n·(n−1)/2)."""
    m = _membership(spark, sf_dir)
    census = m.groupBy("block_key").agg(F.count("*").alias("n"))
    return (
        census.groupBy("n")
        .agg(F.count("*").cast("long").alias("n_blocks"))
        .select(
            F.col("n").cast("long").alias("block_size"),
            "n_blocks",
            (F.col("n_blocks") * F.col("n") * (F.col("n") - 1) / 2)
            .cast("long")
            .alias("induced_pairs"),
        )
    )


STATS_K_GRID = [2, 5, 10, 25, 50, 100]
RECALL_K_GRID = [1, 2, 4, 8, 16, 32, 64, 128]


def _ranked_candidates(spark, sf_dir):
    """Symmetrized rep-level candidate list with gold labels and a
    deterministic per-node rank: (node_id, partner_id, match_p, correct,
    rk). rk orders by match_p desc then partner_id asc (identical near-dup
    contents yield identical match_p; an undefined order would diverge
    from the oracle). The backbone of the score-stat grid / recall@k curve
    / rank-of-gold diagnostics (``scripts/prepare_nil_dataset.py:27-76``)."""
    s = _scored(spark, sf_dir)
    per_node = s.select(
        F.col("left_id").alias("node_id"),
        F.col("right_id").alias("partner_id"),
        F.col("match_p"),
    ).unionByName(
        s.select(
            F.col("right_id").alias("node_id"),
            F.col("left_id").alias("partner_id"),
            F.col("match_p"),
        )
    )
    gold = _rep_gold(spark, sf_dir)
    gn = gold.select(F.col("file_id").alias("node_id"), F.col("gold_cluster").alias("g_n"))
    gp = gold.select(F.col("file_id").alias("partner_id"), F.col("gold_cluster").alias("g_p"))
    lbl = (
        per_node.join(gn, "node_id")
        .join(gp, "partner_id")
        .withColumn("correct", F.col("g_n") == F.col("g_p"))
    )
    w = Window.partitionBy("node_id").orderBy(F.desc("match_p"), F.asc("partner_id"))
    return lbl.withColumn("rk", F.row_number().over(w))


def _rep_gold(spark, sf_dir):
    reps = blocking.representatives(_with_sig(spark, sf_dir))
    return reps.select("file_id", "gold_cluster")


def q_node_stats(spark, sf_dir):
    """Per-node candidate-score stats over its top-k matches at every k in
    STATS_K_GRID — the NIL predictor's full score-feature grid {max,
    second, min, mean, median, stdev, count, correct-rank} × k
    (``scripts/prepare_nil_dataset.py:42-76,170-193``). One rank window,
    one grid cross-join, one aggregation — no per-k recomputation."""
    lbl = _ranked_candidates(spark, sf_dir)
    grid = spark.createDataFrame([(k,) for k in STATS_K_GRID], "k int")
    topk = lbl.crossJoin(F.broadcast(grid)).filter(F.col("rk") <= F.col("k"))
    return topk.groupBy("node_id", "k").agg(
        _r6(F.max("match_p"), 6).alias("p_max"),
        _r6(
            F.coalesce(F.max(F.when(F.col("rk") == 2, F.col("match_p"))), F.lit(0.0)),
            6,
        ).alias("p_second"),
        _r6(F.min("match_p"), 6).alias("p_min"),
        _r6(F.avg("match_p"), 6).alias("p_mean"),
        _r6(F.median("match_p"), 6).alias("p_median"),
        _r6(F.coalesce(F.stddev_samp("match_p"), F.lit(0.0)), 6).alias("p_stdev"),
        F.count("*").cast("long").alias("n_cands"),
        F.coalesce(F.min(F.when(F.col("correct"), F.col("rk"))), F.lit(0))
        .cast("long")
        .alias("correct_rank"),
    ).select(
        "node_id", F.col("k").cast("long").alias("k"),
        "p_max", "p_second", "p_min", "p_mean", "p_median", "p_stdev",
        "n_cands", "correct_rank",
    )


def q_recall_curve(spark, sf_dir):
    """Blocking/scoring recall@k over ranked candidates at the k-grid —
    the reference's primary retrieval diagnostic
    (``blink/main_dense.py:536-553``; rank grid in
    ``blink/biencoder/zeshel_utils.py:70-99``). A linkable rep (≥1 other
    rep shares its gold cluster) is recalled at k iff some same-gold
    partner ranks ≤ k in its candidate list; reps with NO candidates at
    all stay in the denominator (that is the point of the curve)."""
    lbl = _ranked_candidates(spark, sf_dir)
    gold = _rep_gold(spark, sf_dir)
    csize = gold.groupBy("gold_cluster").agg(F.count("*").alias("n_g"))
    linkable = (
        gold.join(csize, "gold_cluster")
        .filter(F.col("n_g") >= 2)
        .select(F.col("file_id").alias("node_id"))
    )
    gold_rank = (
        lbl.filter(F.col("correct"))
        .groupBy("node_id")
        .agg(F.min("rk").alias("gold_rank"))
    )
    lr = linkable.join(gold_rank, "node_id", "left")
    grid = spark.createDataFrame([(k,) for k in RECALL_K_GRID], "k int")
    return (
        lr.crossJoin(F.broadcast(grid))
        .groupBy("k")
        .agg(
            F.count("*").cast("long").alias("n_nodes"),
            F.sum(
                F.when(F.col("gold_rank") <= F.col("k"), 1).otherwise(0)
            ).cast("long").alias("n_hit"),
        )
        .select(
            F.col("k").cast("long").alias("k"),
            "n_nodes",
            "n_hit",
            _r6(F.col("n_hit") / F.col("n_nodes"), 6).alias("recall"),
        )
    )


def q_rank_of_gold(spark, sf_dir):
    """Per linkable rep: the rank of its best same-gold candidate (0 = not
    retrieved at all) — the error-analysis primitive "gold was retrieved
    but ranked 3rd" (``scripts/prepare_nil_dataset.py:27-39``)."""
    lbl = _ranked_candidates(spark, sf_dir)
    gold = _rep_gold(spark, sf_dir)
    csize = gold.groupBy("gold_cluster").agg(F.count("*").alias("n_g"))
    linkable = (
        gold.join(csize, "gold_cluster")
        .filter(F.col("n_g") >= 2)
        .select(F.col("file_id").alias("node_id"))
    )
    gold_rank = (
        lbl.filter(F.col("correct"))
        .groupBy("node_id")
        .agg(F.min("rk").alias("gr"))
    )
    return linkable.join(gold_rank, "node_id", "left").select(
        "node_id", F.coalesce(F.col("gr"), F.lit(0)).cast("long").alias("gold_rank")
    )


def q_cluster_mode_lang(spark, sf_dir):
    """Per-cluster modal attribute (most frequent member lang, ties → min
    lang) — the per-entity mode aggregate of the KBP loop
    (``scripts/kbp_simulation.py:239-240``), §2.5 A5."""
    cl = _clusters(spark, sf_dir)
    ing = _ingested(spark, sf_dir).select("file_id", "lang")
    counts = cl.join(ing, "file_id").groupBy("cluster_id", "lang").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("n"), F.asc("lang"))
    return (
        counts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "cluster_id",
            F.col("lang").alias("mode_lang"),
            F.col("n").cast("long").alias("n_mode"),
        )
    )


def q_feature_ablation(spark, sf_dir):
    """Feature-ablation grid (``scripts/feature_ablation_study.py`` main
    loop): per named feature family, undersample → split → fit the
    spark.ml combiner → holdout confusion + P/R/F1.  ML training is not
    SQL-expressible, so this query ships without an oracle entry (driver
    rows-only check — 5 deterministic rows); the training hygiene and
    noise behavior are pinned in tests/test_calibrated.py."""
    scored = _scored(spark, sf_dir)
    gold = _ingested(spark, sf_dir).select("file_id", "gold_cluster")
    labeled = evaluate.labeled_pairs(
        scored.select("left_id", "right_id", "block_key"), gold
    ).join(scored, ["left_id", "right_id", "block_key"])
    return scoring.ablation_study(labeled)


def q_review_queue(spark, sf_dir):
    """HITL routing (SURVEY.md §2.10 I3): pairs in the confidence band go
    to a human; outside auto-links/auto-rejects
    (``scripts/feature_ablation_study.py:999-1016``; the reference's band
    is [0.25, 0.75] — ours is wider because the fixed-weight combiner
    separates the fixture corpus more sharply)."""
    s = _scored(spark, sf_dir)
    return s.filter(
        (F.col("match_p") >= 0.05) & (F.col("match_p") <= 0.95)
    ).select(
        "left_id",
        "right_id",
        _r6("match_p", 6).alias("match_p"),
        _r6("cosine", 6).alias("cosine"),
        _r6("jaccard_sh", 6).alias("jaccard_sh"),
    )


ROC_TAU_GRID = [i / 20 for i in range(1, 20)]
HIST_N_BINS = 20


def _labeled_scored(spark, sf_dir):
    """Scored candidate pairs with the gold match label (rep-level)."""
    s = _scored(spark, sf_dir)
    gold = _rep_gold(spark, sf_dir)
    gl = gold.select(
        F.col("file_id").alias("left_id"), F.col("gold_cluster").alias("g_l")
    )
    gr = gold.select(
        F.col("file_id").alias("right_id"), F.col("gold_cluster").alias("g_r")
    )
    return (
        s.select("left_id", "right_id", "match_p")
        .join(gl, "left_id")
        .join(gr, "right_id")
        .select("match_p", (F.col("g_l") == F.col("g_r")).alias("is_match"))
    )


def q_roc_curve(spark, sf_dir):
    """Threshold-sweep ROC/PR diagnostic over scored candidate pairs vs
    gold — §2.5 A10, the score-distribution/ROC plots the reference draws
    when picking the match threshold (``scripts/feature_ablation_study.py``
    evaluation figures): per tau in a 19-point grid, the pairwise
    confusion counts and derived TPR/FPR/precision. One label join, one
    broadcast grid cross-join, one aggregation."""
    lbl = _labeled_scored(spark, sf_dir)
    grid = spark.createDataFrame([(t,) for t in ROC_TAU_GRID], "tau double")
    pred = F.col("match_p") >= F.col("tau")
    agg = lbl.crossJoin(F.broadcast(grid)).groupBy("tau").agg(
        F.sum(F.when(F.col("is_match") & pred, 1).otherwise(0))
        .cast("long")
        .alias("n_tp"),
        F.sum(F.when(~F.col("is_match") & pred, 1).otherwise(0))
        .cast("long")
        .alias("n_fp"),
        F.sum(F.when(F.col("is_match") & ~pred, 1).otherwise(0))
        .cast("long")
        .alias("n_fn"),
        F.sum(F.when(~F.col("is_match") & ~pred, 1).otherwise(0))
        .cast("long")
        .alias("n_tn"),
    )
    return agg.select(
        _r6(F.col("tau"), 6).alias("tau"),
        "n_tp",
        "n_fp",
        "n_fn",
        "n_tn",
        _r6(F.col("n_tp") / (F.col("n_tp") + F.col("n_fn")), 6).alias("tpr"),
        _r6(F.col("n_fp") / (F.col("n_fp") + F.col("n_tn")), 6).alias("fpr"),
        _r6(
            F.when(
                (F.col("n_tp") + F.col("n_fp")) > 0,
                F.col("n_tp") / (F.col("n_tp") + F.col("n_fp")),
            ).otherwise(F.lit(1.0)),
            6,
        ).alias("precision"),
    )


def q_score_hist(spark, sf_dir):
    """Match-probability distribution by gold label (the KDE-analog half
    of A10): 20 equal-width bins over [0, 1], counts per (bin, label).
    match_p = 1.0 lands in the top bin."""
    lbl = _labeled_scored(spark, sf_dir)
    bin_id = F.least(
        F.floor(F.col("match_p") * HIST_N_BINS).cast("long"),
        F.lit(HIST_N_BINS - 1).cast("long"),
    )
    return (
        lbl.withColumn("bin_id", bin_id)
        .groupBy("bin_id", "is_match")
        .agg(F.count("*").cast("long").alias("n"))
    )


def q_blocking_recall(spark, sf_dir):
    """Gold-pair coverage of blocking — the recall@k analog
    (``blink/main_dense.py:536-553``)."""
    ing = _ingested(spark, sf_dir)
    gold = ing.select("file_id", "gold_cluster")
    pos = evaluate.gold_positive_pairs(gold)
    pairs = _pairs(spark, sf_dir)
    sha = blocking.exact_dup_edges(ing)
    universe = (
        pairs.select("left_id", "right_id")
        .unionByName(sha.select("left_id", "right_id"))
        .distinct()
    )
    hit = pos.join(universe, ["left_id", "right_id"], "left_semi")
    return (
        pos.agg(F.count("*").cast("long").alias("n_gold_pairs"))
        .crossJoin(hit.agg(F.count("*").cast("long").alias("n_hit")))
        .select(
            "n_gold_pairs",
            "n_hit",
            _r6(F.col("n_hit") / F.col("n_gold_pairs"), 6).alias("recall"),
        )
    )


def q_reduction_ratio(spark, sf_dir):
    """Blocking reduction ratio — the standard ER blocking-quality metric
    next to pair completeness (= ``er_blocking_recall``): the fraction of
    the all-pairs comparison space the blocker avoided. The reference
    reports retrieval-vs-exhaustive trade-offs only implicitly (FAISS ANN
    vs flat, ``blink/indexer/faiss_indexer.py:71-141``); this makes the
    comparison-budget saving a first-class measurement.

    Scale shape: three count aggregates over already-cached stages — no
    new shuffle."""
    ing = _ingested(spark, sf_dir)
    reps = blocking.representatives(_with_sig(spark, sf_dir))
    pairs = _pairs(spark, sf_dir)
    n_rec = ing.agg(F.count("*").cast("long").alias("n_records"))
    n_rep = reps.agg(F.count("*").cast("long").alias("n_reps"))
    n_cand = pairs.agg(F.count("*").cast("long").alias("n_candidate_pairs"))
    return (
        n_rec.crossJoin(n_rep)
        .crossJoin(n_cand)
        .withColumn(
            "n_possible_pairs", F.expr("(n_reps * (n_reps - 1)) div 2")
        )
        .select(
            "n_records",
            "n_reps",
            "n_possible_pairs",
            "n_candidate_pairs",
            _r6(
                F.lit(1.0)
                - F.col("n_candidate_pairs") / F.col("n_possible_pairs"),
                6,
            ).alias("reduction_ratio"),
        )
    )


def q_bcubed(spark, sf_dir):
    """B-cubed precision/recall/F1 of the final clustering against gold —
    the canonical cluster-quality metric for entity resolution (per-record
    precision = |C(r) ∩ G(r)| / |C(r)|, averaged; the cluster-level
    counterpart of the reference's per-mention accuracy counting,
    ``scripts/kbp_simulation.py:52-58``).

    Computed from the (cluster, gold) contingency cells: precision =
    Σ n_cg²/n_c / N and recall = Σ n_cg²/n_g / N — three combinable
    aggregates plus two broadcast-sized joins on the cell table; nothing
    touches pairs, so it costs O(records), not O(pairs²)."""
    clusters = _clusters(spark, sf_dir)
    gold = _ingested(spark, sf_dir).select("file_id", "gold_cluster")
    asg = clusters.join(gold, "file_id")
    cells = asg.groupBy("cluster_id", "gold_cluster").agg(
        F.count("*").cast("double").alias("n_cg")
    )
    csz = asg.groupBy("cluster_id").agg(F.count("*").cast("double").alias("n_c"))
    gsz = asg.groupBy("gold_cluster").agg(
        F.count("*").cast("double").alias("n_g")
    )
    sums = (
        cells.join(csz, "cluster_id")
        .join(gsz, "gold_cluster")
        .agg(
            F.sum("n_cg").alias("n"),
            F.sum(F.col("n_cg") * F.col("n_cg") / F.col("n_c")).alias("p_sum"),
            F.sum(F.col("n_cg") * F.col("n_cg") / F.col("n_g")).alias("r_sum"),
        )
    )
    p = F.col("p_sum") / F.col("n")
    r = F.col("r_sum") / F.col("n")
    return sums.select(
        F.col("n").cast("long").alias("n_records"),
        _r6(p, 6).alias("bcubed_precision"),
        _r6(r, 6).alias("bcubed_recall"),
        _r6(2.0 * p * r / (p + r), 6).alias("bcubed_f1"),
    )


SNM_WINDOW = 4  # sliding-window size w: pairs at rank distance 1..w-1


def q_sorted_neighborhood(spark, sf_dir):
    """Sorted-neighborhood blocking (Hernández-Stolfo SNM) — the third
    classic blocker next to the composite-key and LSH-band blocks
    (``blocking.py``): sort the representatives by a domain sort key
    (lang : path_stem : basename, file_id as the unique tiebreak), slide a
    window of w=SNM_WINDOW, and emit every pair within the window. Catches
    near-misses that share no exact block key (e.g. one-char stem typos
    that land in adjacent sort positions) — the attribute-neighborhood
    analog of the reference's keyword candidate generator
    (``blink/candidate_retrieval/candidate_generators.py:16-116``).

    Scale shape: one range-partition sort builds the dense rank
    (``blocking.dense_order_rank`` — per-partition row_number + an
    O(partitions) offset collect, never a single-partition window), then
    the window pairs come from a (w-1)-way broadcast replication +
    equi-join on rank. No self-join on a hot key, no range join."""
    reps = blocking.representatives(_with_sig(spark, sf_dir))
    keyed = reps.select(
        "file_id",
        F.concat_ws(
            ":",
            F.col("lang"),
            F.col("path_stem"),
            F.element_at(F.split(F.col("path"), "/"), -1),
            F.col("file_id"),
        ).alias("snm_key"),
    )
    ranked = blocking.dense_order_rank(keyed, "snm_key", "snm_rank")
    dists = spark.range(1, SNM_WINDOW).select(
        F.col("id").cast("long").alias("rank_distance")
    )
    left = ranked.select(
        F.col("file_id").alias("a_id"), F.col("snm_rank").alias("a_rank")
    )
    right = ranked.select(
        F.col("file_id").alias("b_id"), F.col("snm_rank").alias("b_rank")
    )
    probe = left.crossJoin(F.broadcast(dists)).withColumn(
        "b_rank", F.col("a_rank") + F.col("rank_distance")
    )
    return probe.join(right, "b_rank").select(
        F.least("a_id", "b_id").alias("left_id"),
        F.greatest("a_id", "b_id").alias("right_id"),
        "rank_distance",
    )


def q_meta_blocking(spark, sf_dir):
    """Meta-blocking with CBS edge weights + weighted-edge pruning
    (Papadakis et al.'s blocking-graph framework): weight every candidate
    pair by the NUMBER of blocks it co-occurs in, then keep only pairs
    whose weight exceeds the global mean — redundancy across independent
    blocking functions (composite key + 8 LSH bands) is evidence, and
    pruning on it cuts the scoring bill before any feature is computed.

    Scale shape: shares the fixed-width pre-dedup pair union with
    ``blocking.candidate_pairs`` (rank dictionaries, salted oversized
    blocks); the count aggregate is exactly as combinable as the min it
    replaces, and the mean is a 1-row broadcast."""
    memb = _membership(spark, sf_dir).select("file_id", "block_key")
    weights = blocking.pair_weights(memb)
    mean = weights.agg(F.avg("cbs_weight").alias("_mean_w"))
    return (
        weights.crossJoin(F.broadcast(mean))
        .filter(F.col("cbs_weight") > F.col("_mean_w"))
        .select("left_id", "right_id", "cbs_weight")
    )


# ---------------------------------------------------------------------------
# Oracle SQL (DuckDB) — the independent recomputation
# ---------------------------------------------------------------------------

def _cte_chain(sf: float, src_where: str = "", node_where: str = "") -> str:
    """WITH-chain recomputing every stage in DuckDB over the same parquet.

    ``src_where`` optionally restricts the source rows (used by the
    retraction oracle, which must recompute the closure over the REDUCED
    corpus).  ``node_where`` restricts only the LINKED node set (reps,
    sha edges, closure init) while the per-row CTEs (ing/bands/feat) stay
    corpus-wide — the KBP re-link oracle clusters the base split but
    still needs holdout rows' signatures/features for the mention side."""
    from blink_spark.fixtures import fixture_path

    toks = minhash.sql_tokens("content")
    shingles = minhash.sql_shingles("tokens")
    hashes = minhash.sql_shingle_hashes("shingles")
    sig = minhash.sql_minhash_signature("sh_hashes")
    bands = minhash.sql_band_keys("msig")
    emb = scoring.sql_embedding("sh_hashes")
    match_p = scoring.sql_match_p(
        "cosine", "jaccard_sh", "jw_path", "lev_path", "exact_sha"
    )
    return f"""
WITH src AS (
  SELECT repo, path, commit, lang, content, gold_cluster
  FROM read_parquet('{fixture_path(sf)}')
  {src_where}
),
ing0 AS (
  SELECT repo, path, commit, lang, gold_cluster,
         sha256(repo || chr(0) || path || chr(0) || commit) AS file_id,
         sha256(content) AS content_sha,
         regexp_replace(list_extract(string_split(path, '/'), -1),
                        '\\.[^.]*$', '') AS path_stem,
         list_extract(string_split(path, '/'), -1) AS base,
         path AS fpath,
         {toks} AS tokens
  FROM src
),
ing1 AS (SELECT *, {shingles} AS shingles, len(tokens) AS n_tokens FROM ing0),
ing AS (SELECT *, {hashes} AS sh_hashes FROM ing1),
sig AS (SELECT *, {sig} AS msig FROM ing),
bands AS (
  SELECT *, list_transform({bands}, k -> 'mh:' || k) AS band_keys FROM sig
),
reps AS (
  SELECT * FROM bands
  {node_where}
  QUALIFY row_number() OVER (PARTITION BY content_sha ORDER BY file_id) = 1
),
memb AS (
  SELECT file_id, 'ck:' || lang || ':' || path_stem AS block_key FROM reps
  UNION ALL
  SELECT file_id, unnest(band_keys) AS block_key FROM reps
),
pairs AS (
  SELECT l.file_id AS left_id, r.file_id AS right_id,
         min(l.block_key) AS block_key
  FROM memb l JOIN memb r
    ON l.block_key = r.block_key AND l.file_id < r.file_id
  GROUP BY 1, 2
),
feat AS (
  SELECT file_id, fpath, base, content_sha, sh_hashes,
         {emb} AS embedding
  FROM bands
),
scored0 AS (
  SELECT p.left_id, p.right_id, p.block_key,
         lf.base AS l_base, rf.base AS r_base,
         regexp_replace(lf.fpath, '[^ -~]', '?', 'g') AS l_fpath,
         regexp_replace(rf.fpath, '[^ -~]', '?', 'g') AS r_fpath,
         lf.content_sha = rf.content_sha AS exact_sha,
         list_dot_product(lf.embedding, rf.embedding) AS cosine,
         CAST(len(list_intersect(lf.sh_hashes, rf.sh_hashes)) AS DOUBLE) AS inter,
         CAST(len(lf.sh_hashes) AS DOUBLE) AS la,
         CAST(len(rf.sh_hashes) AS DOUBLE) AS lb
  FROM pairs p
  JOIN feat lf ON p.left_id = lf.file_id
  JOIN feat rf ON p.right_id = rf.file_id
),
scored AS (
  SELECT left_id, right_id, block_key, cosine,
         CASE WHEN la + lb - inter > 0 THEN inter / (la + lb - inter)
              ELSE 0.0 END AS jaccard_sh,
         2.0 * inter / (la + lb) AS dice_sh,
         inter / least(la, lb) AS overlap_sh,
         inter / sqrt(la * lb) AS cosine_sh,
         jaro_winkler_similarity(l_base, r_base) AS jw_path,
         jaro_similarity(l_base, r_base) AS jaro_base,
         CASE WHEN greatest(strlen(l_base), strlen(r_base)) > 0
              THEN 1.0 - CAST(damerau_levenshtein(l_base, r_base) AS DOUBLE)
                   / greatest(strlen(l_base), strlen(r_base))
              ELSE 1.0 END AS damerau_base,
         CASE WHEN len(l_base) = 0 AND len(r_base) = 0 THEN 1.0
              WHEN len(l_base) = 0 OR len(r_base) = 0 THEN 0.0
              ELSE jaccard(l_base, r_base) END AS charjac_base,
         1.0 - CAST(levenshtein(l_fpath, r_fpath) AS DOUBLE)
             / greatest(len(l_fpath), len(r_fpath)) AS lev_path,
         exact_sha
  FROM scored0
),
scored_p AS (SELECT *, {match_p} AS match_p FROM scored),
sha_edges AS (
  SELECT * FROM (
    SELECT min(file_id) OVER (PARTITION BY content_sha) AS left_id,
           file_id AS right_id
    FROM ing
    {node_where}
  ) WHERE left_id <> right_id
),
match_edges AS (
  SELECT left_id, right_id FROM scored_p WHERE match_p >= {scoring.MATCH_TAU}
  UNION
  SELECT left_id, right_id FROM sha_edges
),
sym AS (
  SELECT left_id AS src, right_id AS dst FROM match_edges
  UNION
  SELECT right_id AS src, left_id AS dst FROM match_edges
),
walk(node, lbl) AS (
  SELECT file_id, file_id FROM ing
  {node_where}
  UNION
  SELECT s.dst, w.lbl FROM walk w JOIN sym s ON s.src = w.node
),
clusters AS (
  SELECT node AS file_id, min(lbl) AS cluster_id FROM walk GROUP BY node
)
"""


# shared oracle fragments for the rank-based diagnostics (appended to the
# main CTE chain; each fragment starts with a ", name AS" continuation)
_ranked_sql = """
, per_node AS (
   SELECT left_id AS node_id, right_id AS partner_id, match_p FROM scored_p
   UNION ALL
   SELECT right_id AS node_id, left_id AS partner_id, match_p FROM scored_p
),
gold AS (SELECT file_id, gold_cluster FROM reps),
lbl AS (
  SELECT pn.node_id, pn.partner_id, pn.match_p,
         gn.gold_cluster = gp.gold_cluster AS correct,
         row_number() OVER (PARTITION BY pn.node_id
                            ORDER BY pn.match_p DESC, pn.partner_id ASC) AS rk
  FROM per_node pn
  JOIN gold gn ON pn.node_id = gn.file_id
  JOIN gold gp ON pn.partner_id = gp.file_id
)"""

_linkable_sql = """
, csize AS (
  SELECT gold_cluster, count(*) AS n_g FROM gold GROUP BY gold_cluster
),
linkable AS (
  SELECT g.file_id AS node_id FROM gold g JOIN csize USING (gold_cluster)
  WHERE csize.n_g >= 2
),
gold_rank AS (
  SELECT node_id, min(rk) AS gold_rank FROM lbl WHERE correct GROUP BY node_id
)"""


def _fs_em_chain() -> str:
    """Shared DuckDB CTE chain for the Fellegi–Sunter queries: the
    agreement-pattern census (with the logistic-match count used by
    er_fs_posteriors) plus the same EM unrolled iteration-by-iteration
    (the ``er_pagerank`` unrolled-iteration precedent), same probability
    clamp; float literals via repr() so both engines parse identical
    decimals."""
    nf = len(FS_FEATURES)
    agr = ", ".join(
        f"({c} >= {t!r}) AS a{i}" for i, (c, t) in enumerate(FS_FEATURES)
    )
    gb = ", ".join(f"a{i}" for i in range(nf))
    init = ", ".join(
        f"{FS_M0!r} AS m{i}, {FS_U0!r} AS u{i}" for i in range(nf)
    )
    sql = f"""
, fs_census AS (
  SELECT {gb}, CAST(count(*) AS DOUBLE) AS n,
         sum(CASE WHEN lg THEN 1 ELSE 0 END) AS n_log
  FROM (SELECT {agr}, match_p >= {scoring.MATCH_TAU!r} AS lg FROM scored_p)
  GROUP BY {gb}
),
fs_p0 AS (SELECT {FS_LAM0!r} AS lam, {init})"""
    for k in range(1, FS_ITERS + 1):
        pm = " * ".join(
            f"(CASE WHEN a{i} THEN m{i} ELSE 1.0 - m{i} END)"
            for i in range(nf)
        )
        pu = " * ".join(
            f"(CASE WHEN a{i} THEN u{i} ELSE 1.0 - u{i} END)"
            for i in range(nf)
        )
        mcols = ", ".join(
            f"greatest(least(sum(CASE WHEN a{i} THEN r * n ELSE 0.0 END)"
            f" / sum(r * n), {FS_PMAX!r}), {FS_PMIN!r}) AS m{i},\n         "
            f"greatest(least(sum(CASE WHEN a{i} THEN (1.0 - r) * n ELSE 0.0 END)"
            f" / sum((1.0 - r) * n), {FS_PMAX!r}), {FS_PMIN!r}) AS u{i}"
            for i in range(nf)
        )
        sql += f""",
fs_r{k} AS (
  SELECT *, pm / (pm + pu) AS r FROM (
    SELECT c.*, lam * {pm} AS pm,
           (1.0 - lam) * {pu} AS pu
    FROM fs_census c CROSS JOIN fs_p{k - 1}
  )
),
fs_p{k} AS (
  SELECT sum(r * n) / sum(n) AS lam,
         {mcols}
  FROM fs_r{k}
)"""
    return sql


def _fs_em_sql() -> str:
    """DuckDB mirror of q_er_fs_em: the shared EM chain plus the
    per-feature parameter unpivot."""
    finals = "\nUNION ALL\n".join(
        f"SELECT '{name}' AS feature, round(m{i}, 6) + 0.0 AS m,"
        f" round(u{i}, 6) + 0.0 AS u,"
        f" round(log2(m{i} / u{i}), 6) + 0.0 AS w_agree,"
        f" round(log2((1.0 - m{i}) / (1.0 - u{i})), 6) + 0.0 AS w_disagree,"
        f" round(lam, 6) + 0.0 AS lam FROM fs_p{FS_ITERS}"
        for i, (name, _) in enumerate(FS_FEATURES)
    )
    return _fs_em_chain() + "\n" + finals


def _fs_posteriors_sql() -> str:
    """DuckDB mirror of q_er_fs_posteriors: the shared EM chain, then
    one pass over the census computing each pattern's posterior from the
    final parameters (same left-to-right product order as the Python
    side)."""
    nf = len(FS_FEATURES)
    pm = " * ".join(
        f"(CASE WHEN a{i} THEN m{i} ELSE 1.0 - m{i} END)" for i in range(nf)
    )
    pu = " * ".join(
        f"(CASE WHEN a{i} THEN u{i} ELSE 1.0 - u{i} END)" for i in range(nf)
    )
    names = ", ".join(
        f"a{i} AS agree_{c}" for i, (c, _) in enumerate(FS_FEATURES)
    )
    return (
        _fs_em_chain()
        + f"""
SELECT {names},
       CAST(n AS BIGINT) AS n_pairs,
       CAST(n_log AS BIGINT) AS n_logistic_match,
       round(pm / (pm + pu), 6) + 0.0 AS fs_posterior,
       pm / (pm + pu) >= 0.5 AS fs_match
FROM (
  SELECT c.*, lam * {pm} AS pm,
         (1.0 - lam) * {pu} AS pu
  FROM fs_census c CROSS JOIN fs_p{FS_ITERS}
)"""
    )


_FS_TF_SQL = """
, tf_census AS (
  SELECT path_stem, CAST(count(*) AS BIGINT) AS n_records FROM reps
  GROUP BY path_stem
),
tf_tot AS (SELECT CAST(sum(n_records) AS DOUBLE) AS n FROM tf_census),
tf_share AS (
  SELECT path_stem, n_records, n_records / n AS tf
  FROM tf_census CROSS JOIN tf_tot
),
tf_u AS (SELECT sum(tf * tf) AS u FROM tf_share)
SELECT path_stem, n_records,
       round(tf, 6) + 0.0 AS tf,
       round(log2(u / tf), 6) + 0.0 AS tf_adjustment
FROM tf_share CROSS JOIN tf_u"""


_GOLDEN_RECORD_SQL = """
, gr_base AS (
  SELECT cl.cluster_id, g.repo, g.path, g.commit, g.lang, g.n_tokens,
         g.file_id
  FROM clusters cl JOIN ing g USING (file_id)
),
gr_sizes AS (
  SELECT cluster_id, count(*) AS n_members,
         count(DISTINCT repo) AS n_repos,
         max(commit) AS latest_commit
  FROM gr_base GROUP BY cluster_id
),
gr_lang AS (
  SELECT cluster_id, lang FROM (
    SELECT cluster_id, lang,
           row_number() OVER (PARTITION BY cluster_id
                              ORDER BY cnt DESC, lang ASC) AS rk
    FROM (SELECT cluster_id, lang, count(*) AS cnt
          FROM gr_base GROUP BY cluster_id, lang)
  ) WHERE rk = 1
),
gr_path AS (
  SELECT cluster_id, path AS canonical_path,
         n_tokens AS canonical_n_tokens
  FROM (
    SELECT cluster_id, path, n_tokens,
           row_number() OVER (PARTITION BY cluster_id
                              ORDER BY n_tokens DESC, file_id ASC) AS rk
    FROM gr_base
  ) WHERE rk = 1
)
SELECT s.cluster_id, CAST(s.n_members AS BIGINT) AS n_members,
       CAST(s.n_repos AS BIGINT) AS n_repos, l.lang,
       p.canonical_path, CAST(p.canonical_n_tokens AS BIGINT)
         AS canonical_n_tokens,
       s.latest_commit
FROM gr_sizes s
JOIN gr_lang l USING (cluster_id)
JOIN gr_path p USING (cluster_id)
WHERE s.n_members >= 2"""


def _one_to_one_sql() -> str:
    """DuckDB mirror of q_er_one_to_one: the identical fixed number of
    locally-dominant matching rounds unrolled as CTEs, identical
    (match_p DESC, partner ASC) tiebreak."""
    # every round CTE is MATERIALIZED: each level references its
    # predecessor ~4 times, so plain (inlinable) CTEs would compound to
    # 4^ROUNDS copies of the whole upstream scan chain — observed as a
    # "too many open files" parquet-open storm in DuckDB
    sql = f"""
, o2o_e0 AS MATERIALIZED (
  SELECT left_id, right_id, match_p FROM scored_p
  WHERE match_p >= {scoring.MATCH_TAU!r}
)"""
    for k in range(1, O2O_ROUNDS + 1):
        p = k - 1
        sql += f""",
o2o_b{k} AS MATERIALIZED (
  SELECT node, partner FROM (
    SELECT node, partner,
           row_number() OVER (PARTITION BY node
                              ORDER BY match_p DESC, partner ASC) AS rk
    FROM (SELECT left_id AS node, right_id AS partner, match_p FROM o2o_e{p}
          UNION ALL
          SELECT right_id AS node, left_id AS partner, match_p FROM o2o_e{p})
  ) WHERE rk = 1
),
o2o_m{k} AS MATERIALIZED (
  SELECT e.left_id, e.right_id, e.match_p, {k} AS match_round
  FROM o2o_e{p} e
  JOIN o2o_b{k} x ON e.left_id = x.node AND e.right_id = x.partner
  JOIN o2o_b{k} y ON e.right_id = y.node AND e.left_id = y.partner
),
o2o_e{k} AS MATERIALIZED (
  SELECT e.* FROM o2o_e{p} e
  WHERE NOT EXISTS (SELECT 1 FROM o2o_m{k} m
                    WHERE e.left_id IN (m.left_id, m.right_id))
    AND NOT EXISTS (SELECT 1 FROM o2o_m{k} m
                    WHERE e.right_id IN (m.left_id, m.right_id))
)"""
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM o2o_m{k}" for k in range(1, O2O_ROUNDS + 1)
    )
    return (
        sql
        + f"""
SELECT left_id, right_id, CAST(match_round AS BIGINT) AS match_round,
       round(match_p, 6) + 0.0 AS match_p
FROM ({union})"""
    )


_BLOCKING_RULES_SQL = """
, fam AS (
  SELECT file_id, block_key,
         CASE WHEN block_key LIKE 'ck:%' THEN 'composite_key'
              ELSE 'minhash_band' END AS rule
  FROM memb
),
fam_census AS (SELECT rule, block_key, count(*) AS n FROM fam GROUP BY 1, 2),
vol AS (
  SELECT rule, count(*)::BIGINT AS n_blocks,
         CAST(sum(n * (n - 1) / 2) AS BIGINT) AS n_pair_slots
  FROM fam_census GROUP BY rule
),
rp AS (
  SELECT DISTINCT l.rule, l.file_id AS left_id, r.file_id AS right_id
  FROM fam l JOIN fam r ON l.block_key = r.block_key AND l.file_id < r.file_id
),
goldm AS (SELECT file_id, gold_cluster FROM reps),
rpl AS (
  SELECT rp.rule, rp.left_id, rp.right_id,
         gl.gold_cluster = gr.gold_cluster AS is_gold
  FROM rp
  JOIN goldm gl ON rp.left_id = gl.file_id
  JOIN goldm gr ON rp.right_id = gr.file_id
),
per_rule AS (
  SELECT rule, count(*)::BIGINT AS n_pairs,
         sum(CASE WHEN is_gold THEN 1 ELSE 0 END)::BIGINT AS n_gold_pairs
  FROM rpl GROUP BY rule
),
pair_rules AS (
  SELECT left_id, right_id, count(DISTINCT rule) AS n_rules,
         min(rule) AS only_rule, bool_or(is_gold) AS is_gold
  FROM rpl GROUP BY 1, 2
),
uniq AS (
  SELECT only_rule AS rule, count(*)::BIGINT AS n_unique_pairs,
         sum(CASE WHEN is_gold THEN 1 ELSE 0 END)::BIGINT
           AS n_unique_gold_pairs
  FROM pair_rules WHERE n_rules = 1 GROUP BY only_rule
),
tot AS (
  SELECT sum(CASE WHEN is_gold THEN 1 ELSE 0 END) AS total_gold
  FROM pair_rules
)
SELECT v.rule, v.n_blocks, v.n_pair_slots, p.n_pairs, p.n_gold_pairs,
       coalesce(u.n_unique_pairs, 0)::BIGINT AS n_unique_pairs,
       coalesce(u.n_unique_gold_pairs, 0)::BIGINT AS n_unique_gold_pairs,
       round(CASE WHEN t.total_gold > 0
                  THEN p.n_gold_pairs / t.total_gold
                  ELSE -1.0 END, 6) + 0.0 AS recall_vs_union
FROM vol v JOIN per_rule p USING (rule)
LEFT JOIN uniq u USING (rule) CROSS JOIN tot t"""


def _threshold_clusters_sql() -> str:
    """DuckDB mirror of q_er_threshold_clusters: one recursive min-label
    walk per threshold (the same independent-closure formulation the main
    chain uses at MATCH_TAU), then pure aggregate pairwise metrics."""
    parts, rows = [], []
    for i, tau in enumerate(THRESHOLD_TAUS):
        t = f"t{i}"
        parts.append(f""",
me_{t} AS (
  SELECT left_id, right_id FROM scored_p WHERE match_p >= {tau!r}
  UNION
  SELECT left_id, right_id FROM sha_edges
),
sym_{t} AS (
  SELECT left_id AS src, right_id AS dst FROM me_{t}
  UNION
  SELECT right_id, left_id FROM me_{t}
),
walk_{t}(node, lbl) AS (
  SELECT file_id, file_id FROM ing
  UNION
  SELECT s.dst, w.lbl FROM walk_{t} w JOIN sym_{t} s ON s.src = w.node
),
clus_{t} AS (
  SELECT node AS file_id, min(lbl) AS cluster_id FROM walk_{t} GROUP BY node
),
lbl_{t} AS (
  SELECT c.cluster_id, i.gold_cluster
  FROM clus_{t} c JOIN ing i USING (file_id)
),
sizes_{t} AS (SELECT cluster_id, count(*) AS n FROM lbl_{t} GROUP BY 1),
cg_{t} AS (
  SELECT cluster_id, gold_cluster, count(*) AS m FROM lbl_{t} GROUP BY 1, 2
),
sum_{t} AS (
  -- CAST: bare literals are DECIMAL and the sweep's UNION ALL would
  -- coerce every branch to the FIRST branch's (narrower) decimal type
  SELECT CAST({tau!r} AS DOUBLE) AS tau,
         (SELECT count(*) FROM scored_p WHERE match_p >= {tau!r})::BIGINT
           AS n_match_edges,
         (SELECT count(*) FROM sizes_{t} WHERE n >= 2)::BIGINT AS n_clusters,
         (SELECT max(n) FROM sizes_{t})::BIGINT AS max_cluster_size,
         (SELECT coalesce(sum(n), 0) FROM sizes_{t} WHERE n >= 2)::BIGINT
           AS n_matched_files,
         (SELECT CAST(sum(n * (n - 1) / 2) AS BIGINT) FROM sizes_{t})
           AS pred_pairs,
         (SELECT CAST(sum(m * (m - 1) / 2) AS BIGINT) FROM cg_{t})
           AS correct_pairs
)""")
        rows.append(f"SELECT * FROM sum_{t}")
    union = "\nUNION ALL\n".join(rows)
    return "".join(parts) + f""",
gp AS (
  SELECT CAST(sum(n * (n - 1) / 2) AS BIGINT) AS gold_pairs
  FROM (SELECT count(*) AS n FROM ing GROUP BY gold_cluster)
),
sweep AS ({union})
SELECT round(tau, 6) + 0.0 AS tau, n_match_edges, n_clusters,
       max_cluster_size, n_matched_files, pred_pairs, correct_pairs,
       gold_pairs,
       round(p, 6) + 0.0 AS "precision",
       round(r, 6) + 0.0 AS recall,
       round(CASE WHEN p > 0 AND p + r > 0
                  THEN 2.0 * p * r / (p + r) ELSE -1.0 END, 6) + 0.0 AS f1
FROM (
  SELECT s.*, gp.gold_pairs,
         CASE WHEN s.pred_pairs > 0
              THEN s.correct_pairs / CAST(s.pred_pairs AS DOUBLE)
              ELSE -1.0 END AS p,
         s.correct_pairs / CAST(gp.gold_pairs AS DOUBLE) AS r
  FROM sweep s CROSS JOIN gp
)"""


_TRIANGLES_SQL = """
, deg3 AS (SELECT src, count(*) AS deg FROM sym GROUP BY src),
wed AS (
  SELECT cl.cluster_id,
         CAST(sum(d.deg * (d.deg - 1) / 2) AS BIGINT) AS n_wedges
  FROM deg3 d JOIN clusters cl ON d.src = cl.file_id GROUP BY 1
),
tri AS (
  SELECT e1.left_id AS a
  FROM match_edges e1
  JOIN match_edges e2 ON e2.left_id = e1.right_id
  JOIN match_edges e3
    ON e3.left_id = e1.left_id AND e3.right_id = e2.right_id
),
tric AS (
  SELECT cl.cluster_id, count(*)::BIGINT AS n_triangles
  FROM tri JOIN clusters cl ON tri.a = cl.file_id GROUP BY 1
),
ec AS (
  SELECT cl.cluster_id, count(*)::BIGINT AS n_edges
  FROM match_edges e JOIN clusters cl ON e.left_id = cl.file_id GROUP BY 1
),
sz AS (SELECT cluster_id, count(*)::BIGINT AS n_members FROM clusters GROUP BY 1)
SELECT s.cluster_id, s.n_members,
       coalesce(ec.n_edges, 0)::BIGINT AS n_edges,
       coalesce(wed.n_wedges, 0)::BIGINT AS n_wedges,
       coalesce(tric.n_triangles, 0)::BIGINT AS n_triangles,
       round(CASE WHEN coalesce(wed.n_wedges, 0) > 0
                  THEN 3.0 * coalesce(tric.n_triangles, 0) / wed.n_wedges
                  ELSE -1.0 END, 6) + 0.0 AS transitivity
FROM sz s LEFT JOIN ec USING (cluster_id) LEFT JOIN wed USING (cluster_id)
LEFT JOIN tric USING (cluster_id)
WHERE s.n_members >= 2"""


def _model_disagreement_sql() -> str:
    """DuckDB mirror of q_er_model_disagreement: the shared EM chain,
    then per-pair posteriors with the same left-to-right product order,
    filtered to the decision conflicts."""
    nf = len(FS_FEATURES)
    agr = ", ".join(
        f"({c} >= {t!r}) AS a{i}" for i, (c, t) in enumerate(FS_FEATURES)
    )
    pm = " * ".join(
        f"(CASE WHEN a{i} THEN m{i} ELSE 1.0 - m{i} END)" for i in range(nf)
    )
    pu = " * ".join(
        f"(CASE WHEN a{i} THEN u{i} ELSE 1.0 - u{i} END)" for i in range(nf)
    )
    acols = ", ".join(
        f"a{i} AS agree_{c}" for i, (c, _) in enumerate(FS_FEATURES)
    )
    return _fs_em_chain() + f""",
dis0 AS (
  SELECT left_id, right_id, match_p, {agr},
         match_p >= {scoring.MATCH_TAU!r} AS lg
  FROM scored_p
),
dis1 AS (
  SELECT d.*, lam * {pm} AS pm, (1.0 - lam) * {pu} AS pu
  FROM dis0 d CROSS JOIN fs_p{FS_ITERS}
),
dis AS (SELECT *, pm / (pm + pu) AS fs_post FROM dis1)
SELECT left_id, right_id, {acols},
       round(match_p, 6) + 0.0 AS match_p,
       round(fs_post, 6) + 0.0 AS fs_posterior,
       lg AS logistic_match,
       fs_post >= 0.5 AS fs_match
FROM dis WHERE (fs_post >= 0.5) <> lg"""


def _clk_linkage_sql() -> str:
    hb = minhash.sql_base_hash("b")
    return f"""
, clk0 AS (
  SELECT file_id, gold_cluster,
         list_transform(range(1, length(pad)),
                        i -> pad[CAST(i AS INTEGER):CAST(i AS INTEGER) + 1])
           AS bi
  FROM (
    SELECT file_id, gold_cluster,
           '_' || lower(path_stem) || '_' AS pad
    FROM reps
  )
),
clk_enc AS (
  SELECT file_id, gold_cluster, list_distinct(bi) AS bid,
         list_sort(list_distinct(flatten(list_transform(bi, b ->
           list_transform(range(0, {CLK_K}), i ->
             CAST((({hb} // 1073741824) + i * ({hb} % 1073741824))
                  % {CLK_M} AS INTEGER)))))) AS clk
  FROM clk0
)
SELECT p.left_id, p.right_id,
       round(2.0 * len(list_intersect(l.clk, r.clk))
             / (len(l.clk) + len(r.clk)), 6) + 0.0 AS clk_dice,
       round(2.0 * len(list_intersect(l.bid, r.bid))
             / (len(l.bid) + len(r.bid)), 6) + 0.0 AS stem_dice,
       l.gold_cluster = r.gold_cluster AS is_gold
FROM pairs p
JOIN clk_enc l ON p.left_id = l.file_id
JOIN clk_enc r ON p.right_id = r.file_id"""


def _phonetic_block_sql() -> str:
    key = blocking.sql_phonetic_key("path_stem")
    return f"""
, pmemb AS (
  SELECT file_id, block_key FROM (
    SELECT file_id, 'px:' || {key} AS block_key FROM reps
  ) WHERE len(block_key) > 3
),
ppairs AS (
  SELECT l.file_id AS left_id, r.file_id AS right_id,
         min(l.block_key) AS block_key
  FROM pmemb l JOIN pmemb r
    ON l.block_key = r.block_key AND l.file_id < r.file_id
  GROUP BY 1, 2
)
SELECT p.left_id, p.right_id, p.block_key,
       gl.gold_cluster = gr.gold_cluster AS is_gold
FROM ppairs p
JOIN reps gl ON p.left_id = gl.file_id
JOIN reps gr ON p.right_id = gr.file_id"""


def _fs_waterfall_sql() -> str:
    """DuckDB mirror of q_er_fs_waterfall: the shared EM chain, then one
    row per (observed pattern, evidence term) with left-associative
    cumulative log-odds and the log-space posterior."""
    nf = len(FS_FEATURES)
    label = " || ".join(
        f"(CASE WHEN a{i} THEN 'T' ELSE 'F' END)" for i in range(nf)
    )
    wexpr = [
        f"(CASE WHEN a{i} THEN log2(m{i} / u{i})"
        f" ELSE log2((1.0 - m{i}) / (1.0 - u{i})) END)"
        for i in range(nf)
    ]
    sql = _fs_em_chain() + f""",
wf0 AS (
  SELECT {label} AS pattern, CAST(n AS BIGINT) AS n_pairs,
         {", ".join(f"a{i}" for i in range(nf))},
         log2(lam / (1.0 - lam)) AS w_prior,
         {", ".join(f"{e} AS w{i}" for i, e in enumerate(wexpr))}
  FROM fs_census CROSS JOIN fs_p{FS_ITERS}
),
wf AS (
  SELECT *, {" + ".join(["w_prior"] + [f"w{i}" for i in range(nf)])} AS total
  FROM wf0
)"""
    rows = [
        """
SELECT pattern, n_pairs, 0 AS term_index, 'prior' AS term,
       '' AS agree, w_prior AS log2_weight,
       w_prior AS cum_log_odds, total
FROM wf"""
    ]
    for i, (name, _) in enumerate(FS_FEATURES):
        cum = " + ".join(["w_prior"] + [f"w{j}" for j in range(i + 1)])
        rows.append(f"""
SELECT pattern, n_pairs, {i + 1} AS term_index, '{name}' AS term,
       CASE WHEN a{i} THEN 'T' ELSE 'F' END AS agree,
       w{i} AS log2_weight, {cum} AS cum_log_odds, total
FROM wf""")
    union = "\nUNION ALL\n".join(rows)
    return sql + f"""
SELECT pattern, n_pairs, CAST(term_index AS BIGINT) AS term_index, term,
       agree,
       round(log2_weight, 6) + 0.0 AS log2_weight,
       round(cum_log_odds, 6) + 0.0 AS cum_log_odds,
       round(pow(2.0, total) / (1.0 + pow(2.0, total)), 6) + 0.0
         AS fs_posterior
FROM ({union})"""


_RAND_INDEX_SQL = """
, lblr AS (
  SELECT c.cluster_id, i.gold_cluster
  FROM clusters c JOIN ing i USING (file_id)
),
cellsr AS (
  SELECT CAST(sum(m * (m - 1) / 2) AS BIGINT) AS agree_pairs
  FROM (SELECT count(*) AS m FROM lblr GROUP BY cluster_id, gold_cluster)
),
rowsr AS (
  SELECT CAST(sum(n * (n - 1) / 2) AS BIGINT) AS pred_pairs
  FROM (SELECT count(*) AS n FROM lblr GROUP BY cluster_id)
),
colsr AS (
  SELECT CAST(sum(n * (n - 1) / 2) AS BIGINT) AS gold_pairs
  FROM (SELECT count(*) AS n FROM lblr GROUP BY gold_cluster)
),
nrecr AS (SELECT count(*)::BIGINT AS n_records FROM lblr)
SELECT n_records, pred_pairs, gold_pairs, agree_pairs,
  round((tot - pred_pairs - gold_pairs + 2.0 * agree_pairs) / tot, 6) + 0.0
    AS rand_index,
  round(CASE WHEN (pred_pairs + gold_pairs) / 2.0 - exp_a <> 0
             THEN (agree_pairs - exp_a)
                  / ((pred_pairs + gold_pairs) / 2.0 - exp_a)
             ELSE -1.0 END, 6) + 0.0
    AS adjusted_rand,
  round(CASE WHEN pred_pairs * gold_pairs > 0
             THEN agree_pairs / sqrt(CAST(pred_pairs AS DOUBLE) * gold_pairs)
             ELSE -1.0 END, 6) + 0.0
    AS fowlkes_mallows,
  round(CASE WHEN pred_pairs + gold_pairs - agree_pairs > 0
             THEN CAST(agree_pairs AS DOUBLE)
                  / (pred_pairs + gold_pairs - agree_pairs)
             ELSE -1.0 END, 6) + 0.0
    AS jaccard_index
FROM (
  SELECT *, n_records * (n_records - 1) / 2 AS tot,
         pred_pairs * gold_pairs / (n_records * (n_records - 1) / 2) AS exp_a
  FROM cellsr CROSS JOIN rowsr CROSS JOIN colsr CROSS JOIN nrecr
)"""


_NMI_SQL = """
, lbl_n AS (
  SELECT c.cluster_id, i.gold_cluster
  FROM clusters c JOIN ing i USING (file_id)
),
nmi_n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM lbl_n),
nmi_hp AS (
  SELECT sum(-(c / n) * ln(c / n)) AS h_pred
  FROM (SELECT CAST(count(*) AS DOUBLE) AS c FROM lbl_n GROUP BY cluster_id)
  CROSS JOIN nmi_n
),
nmi_hg AS (
  SELECT sum(-(c / n) * ln(c / n)) AS h_gold
  FROM (SELECT CAST(count(*) AS DOUBLE) AS c FROM lbl_n GROUP BY gold_cluster)
  CROSS JOIN nmi_n
),
nmi_hj AS (
  SELECT sum(-(c / n) * ln(c / n)) AS h_joint
  FROM (SELECT CAST(count(*) AS DOUBLE) AS c FROM lbl_n
        GROUP BY cluster_id, gold_cluster)
  CROSS JOIN nmi_n
),
nmi_base AS (
  SELECT n, h_pred, h_gold, h_joint, h_pred + h_gold - h_joint AS mi
  FROM nmi_n CROSS JOIN nmi_hp CROSS JOIN nmi_hg CROSS JOIN nmi_hj
),
nmi_hc AS (
  SELECT *,
         CASE WHEN h_gold > 0 THEN mi / h_gold ELSE 1.0 END AS hom,
         CASE WHEN h_pred > 0 THEN mi / h_pred ELSE 1.0 END AS com
  FROM nmi_base
)
SELECT CAST(n AS BIGINT) AS n_records,
       round(h_pred, 6) + 0.0 AS h_pred,
       round(h_gold, 6) + 0.0 AS h_gold,
       round(mi, 6) + 0.0 AS mutual_info,
       round(CASE WHEN h_pred > 0 AND h_gold > 0
                  THEN mi / sqrt(h_pred * h_gold) ELSE 1.0 END, 6) + 0.0
         AS nmi,
       round(hom, 6) + 0.0 AS homogeneity,
       round(com, 6) + 0.0 AS completeness,
       round(CASE WHEN hom + com > 0
                  THEN 2.0 * hom * com / (hom + com) ELSE 0.0 END, 6) + 0.0
         AS v_measure
FROM nmi_hc"""


def _bipartite_link_sql() -> str:
    evens = ", ".join(f"'{x}'" for x in _EVEN_NIBBLES)
    side = lambda c: f"substr({c}, 64, 1) IN ({evens})"  # noqa: E731
    return f"""
, crossp AS (
  SELECT CASE WHEN {side('left_id')} THEN left_id ELSE right_id END AS a_id,
         CASE WHEN {side('left_id')} THEN right_id ELSE left_id END AS b_id,
         match_p
  FROM scored_p
  WHERE ({side('left_id')}) <> ({side('right_id')})
),
best_a AS (
  SELECT * FROM (
    SELECT a_id, b_id, match_p,
           row_number() OVER (PARTITION BY a_id
                              ORDER BY match_p DESC, b_id ASC) AS rk
    FROM crossp
  ) WHERE rk = 1
),
best_b AS (
  SELECT * FROM (
    SELECT b_id AS bb, a_id AS a_of_b,
           row_number() OVER (PARTITION BY b_id
                              ORDER BY match_p DESC, a_id ASC) AS rk
    FROM crossp
  ) WHERE rk = 1
)
SELECT a.a_id, a.b_id, round(a.match_p, 6) + 0.0 AS match_p,
       a.match_p >= {scoring.MATCH_TAU!r} AS is_match,
       coalesce(b.a_of_b = a.a_id, FALSE) AS mutual_best
FROM best_a a LEFT JOIN best_b b ON a.b_id = b.bb"""


def oracle_sqls(sf: float = ORACLE_SF) -> dict[str, str]:
    c = _cte_chain(sf)
    # recursive CTE must be declared on the WITH; prepend keyword
    c = c.replace("WITH src AS", "WITH RECURSIVE src AS", 1)
    cu = _cte_chain(sf, _UNLINK_WHERE).replace(
        "WITH src AS", "WITH RECURSIVE src AS", 1
    )
    # KBP re-link chain: per-row CTEs corpus-wide, linked node set (reps /
    # sha edges / closure) restricted to the base split — mirrors
    # q_kbp_relink's link_features(None, base_features)
    hold_hex = ", ".join(f"'{h}'" for h in _KBP_HOLDOUT_HEX)
    ckbp = _cte_chain(
        sf,
        node_where=f"WHERE substr(sha256(path), 1, 1) NOT IN ({hold_hex})",
    ).replace("WITH src AS", "WITH RECURSIVE src AS", 1)
    kbp_match_p = scoring.sql_match_p(
        "cosine", "jaccard_sh", "jw_path", "lev_path", "exact_sha"
    )
    kbp_ks = ", ".join(str(k) for k in KBP_K_GRID)
    return {
        "er_ingest": c
        + "SELECT file_id, content_sha, lang, path_stem, n_tokens FROM ing",
        "er_block_membership": c + "SELECT file_id, block_key FROM memb",
        "er_candidate_pairs": c
        + "SELECT left_id, right_id, block_key FROM pairs",
        "er_sha_edges": c + "SELECT left_id, right_id FROM sha_edges",
        "er_scored_pairs": c
        + """SELECT left_id, right_id, block_key,
               (round(cosine, 6) + 0.0) AS cosine,
               (round(jaccard_sh, 6) + 0.0) AS jaccard_sh,
               (round(dice_sh, 6) + 0.0) AS dice_sh,
               (round(overlap_sh, 6) + 0.0) AS overlap_sh,
               (round(cosine_sh, 6) + 0.0) AS cosine_sh,
               (round(jw_path, 6) + 0.0) AS jw_path,
               (round(jaro_base, 6) + 0.0) AS jaro_base,
               (round(damerau_base, 6) + 0.0) AS damerau_base,
               (round(charjac_base, 6) + 0.0) AS charjac_base,
               (round(lev_path, 6) + 0.0) AS lev_path,
               exact_sha,
               (round(match_p, 6) + 0.0) AS match_p
             FROM scored_p""",
        "er_string_panel": c
        + f""", bp AS (
               SELECT DISTINCT {strdist.sql_proj('lf.base')} AS base_a,
                      {strdist.sql_proj('rf.base')} AS base_b
               FROM pairs p
               JOIN feat lf ON p.left_id = lf.file_id
               JOIN feat rf ON p.right_id = rf.file_id
             )
             SELECT base_a, base_b,
               {", ".join(
                   f"(round({fn('base_a', 'base_b')}, 6) + 0.0) AS {col}"
                   for col, fn in strdist.SQL_PANEL.items()
               )}
             FROM bp""",
        "er_string_panel_word": c
        + f""", wp AS (
               SELECT DISTINCT
                 regexp_replace({strdist.sql_proj('lf.fpath')},
                                '[/._-]+', ' ', 'g') AS path_a,
                 regexp_replace({strdist.sql_proj('rf.fpath')},
                                '[/._-]+', ' ', 'g') AS path_b
               FROM pairs p
               JOIN feat lf ON p.left_id = lf.file_id
               JOIN feat rf ON p.right_id = rf.file_id
             )
             SELECT path_a, path_b,
               {", ".join(
                   f"(round({fn('path_a', 'path_b')}, 6) + 0.0) AS {col}"
                   for col, fn in strdist.SQL_WORD_PANEL.items()
               )}
             FROM wp""",
        "er_match_edges": c + "SELECT left_id, right_id FROM match_edges",
        # 3 power iterations unrolled over the same `sym` CTE the
        # closure oracle uses; an independent evaluation order of the
        # identical recurrence
        "er_pagerank": c + f"""
, deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY src),
nn AS (SELECT count(*) AS n FROM deg),
r0 AS (SELECT d.src AS node, d.deg, 1.0 / nn.n AS r FROM deg d, nn),
c1 AS (SELECT s.dst AS node, sum(r.r / r.deg) AS c
       FROM sym s JOIN r0 r ON s.src = r.node GROUP BY s.dst),
r1 AS (SELECT d.src AS node, d.deg,
              {1.0 - PR_DAMPING} / nn.n + {PR_DAMPING} * c1.c AS r
       FROM deg d JOIN c1 ON c1.node = d.src, nn),
c2 AS (SELECT s.dst AS node, sum(r.r / r.deg) AS c
       FROM sym s JOIN r1 r ON s.src = r.node GROUP BY s.dst),
r2 AS (SELECT d.src AS node, d.deg,
              {1.0 - PR_DAMPING} / nn.n + {PR_DAMPING} * c2.c AS r
       FROM deg d JOIN c2 ON c2.node = d.src, nn),
c3 AS (SELECT s.dst AS node, sum(r.r / r.deg) AS c
       FROM sym s JOIN r2 r ON s.src = r.node GROUP BY s.dst),
r3 AS (SELECT d.src AS node, d.deg,
              {1.0 - PR_DAMPING} / nn.n + {PR_DAMPING} * c3.c AS r
       FROM deg d JOIN c3 ON c3.node = d.src, nn)
SELECT node, deg::BIGINT AS degree, round(r, 6) + 0.0 AS pagerank
FROM r3""",
        "er_cluster_density": c + f"""
, sizes AS (SELECT cluster_id, count(*) AS n FROM clusters GROUP BY 1),
ie AS (SELECT cl.cluster_id, count(*) AS n_edges
       FROM match_edges m JOIN clusters cl ON m.left_id = cl.file_id
       GROUP BY 1),
sce AS (SELECT cl.cluster_id, count(*) AS n_scored, avg(m.match_p) AS mp
        FROM scored_p m JOIN clusters cl ON m.left_id = cl.file_id
        WHERE m.match_p >= {scoring.MATCH_TAU} GROUP BY 1)
SELECT s.cluster_id, s.n::BIGINT AS n_members, ie.n_edges::BIGINT AS n_edges,
       round(2.0 * ie.n_edges / (s.n * (s.n - 1)), 6) + 0.0 AS density,
       coalesce(sce.n_scored, 0)::BIGINT AS n_scored_edges,
       round(coalesce(sce.mp, -1.0), 6) + 0.0 AS mean_match_p
FROM sizes s JOIN ie USING (cluster_id) LEFT JOIN sce USING (cluster_id)
WHERE s.n >= 2""",
        "er_clusters": c + "SELECT file_id, cluster_id FROM clusters",
        # identical text to er_clusters on purpose: the incremental
        # two-batch run must converge to the one-shot closure
        "er_incremental_clusters": c
        + "SELECT file_id, cluster_id FROM clusters",
        # the same closure over the corpus MINUS the retraction slice:
        # the delta repair must equal a from-scratch run on what remains
        "er_unlink_clusters": cu
        + "SELECT file_id, cluster_id FROM clusters",
        # the CDC retract stream deletes the SAME slice, so its final
        # published state must match the identical reduced-corpus closure
        "er_cdc_clusters": cu
        + "SELECT file_id, cluster_id FROM clusters",
        # medoid-vs-all representation A/B: base-split closure (node-
        # restricted chain), per-cluster medoid (same ±1e-9 argmin pattern
        # as emb_label_medoid), block-join retrieve of holdout mentions
        # against each index, match_p rank, recall@k per mode
        "er_kbp_relink": ckbp
        + f""", gold AS (SELECT file_id, gold_cluster FROM ing),
h AS (SELECT * FROM bands WHERE substr(sha256(path), 1, 1) IN ({hold_hex})),
bm AS (SELECT file_id, cluster_id FROM clusters),
mcost AS (
  SELECT a.cluster_id, a.file_id,
         sum(sqrt(greatest(
           list_dot_product(fa.embedding, fa.embedding)
           + list_dot_product(fb.embedding, fb.embedding)
           - 2.0 * list_dot_product(fa.embedding, fb.embedding), 0.0))) AS cost
  FROM bm a JOIN bm b ON a.cluster_id = b.cluster_id
  JOIN feat fa ON a.file_id = fa.file_id
  JOIN feat fb ON b.file_id = fb.file_id
  GROUP BY 1, 2
),
mbest AS (SELECT cluster_id, min(cost) AS mc FROM mcost GROUP BY 1),
medoid AS (
  SELECT c.cluster_id, min(c.file_id) AS file_id
  FROM mcost c JOIN mbest b
    ON c.cluster_id = b.cluster_id AND abs(c.cost - b.mc) <= 1e-9
  GROUP BY 1
),
idx AS (
  SELECT 'medoid' AS mode, file_id FROM medoid
  UNION ALL
  SELECT 'all' AS mode, file_id FROM bm
),
ment_memb AS (
  SELECT file_id, 'ck:' || lang || ':' || path_stem AS block_key FROM h
  UNION ALL
  SELECT file_id, unnest(band_keys) AS block_key FROM h
),
idx_memb AS (
  SELECT i.mode, i.file_id AS entry_id,
         'ck:' || b.lang || ':' || b.path_stem AS block_key
  FROM idx i JOIN bands b USING (file_id)
  UNION ALL
  SELECT i.mode, i.file_id AS entry_id, unnest(b.band_keys) AS block_key
  FROM idx i JOIN bands b USING (file_id)
),
cand AS (
  SELECT DISTINCT e.mode, m.file_id AS mention_id, e.entry_id
  FROM ment_memb m JOIN idx_memb e USING (block_key)
),
kraw AS (
  SELECT c.mode, c.mention_id, c.entry_id,
         lf.content_sha = rf.content_sha AS exact_sha,
         list_dot_product(lf.embedding, rf.embedding) AS cosine,
         CAST(len(list_intersect(lf.sh_hashes, rf.sh_hashes)) AS DOUBLE) AS inter,
         CAST(len(lf.sh_hashes) AS DOUBLE) AS la,
         CAST(len(rf.sh_hashes) AS DOUBLE) AS lb,
         jaro_winkler_similarity(lf.base, rf.base) AS jw_path,
         1.0 - CAST(levenshtein(regexp_replace(lf.fpath, '[^ -~]', '?', 'g'),
                                regexp_replace(rf.fpath, '[^ -~]', '?', 'g')) AS DOUBLE)
             / greatest(len(regexp_replace(lf.fpath, '[^ -~]', '?', 'g')),
                        len(regexp_replace(rf.fpath, '[^ -~]', '?', 'g'))) AS lev_path
  FROM cand c
  JOIN feat lf ON c.mention_id = lf.file_id
  JOIN feat rf ON c.entry_id = rf.file_id
),
kj AS (
  SELECT *, CASE WHEN la + lb - inter > 0 THEN inter / (la + lb - inter)
                 ELSE 0.0 END AS jaccard_sh
  FROM kraw
),
kp AS (SELECT *, {kbp_match_p} AS match_p FROM kj),
ranked AS (
  SELECT mode, mention_id, entry_id, match_p,
         row_number() OVER (PARTITION BY mode, mention_id
                            ORDER BY match_p DESC, entry_id ASC) AS rk
  FROM kp
),
grank AS (
  SELECT r.mode, r.mention_id, min(r.rk) AS gold_rank
  FROM ranked r
  JOIN gold gm ON r.mention_id = gm.file_id
  JOIN gold ge ON r.entry_id = ge.file_id
   AND ge.gold_cluster = gm.gold_cluster
  GROUP BY 1, 2
),
linkable AS (
  SELECT h.file_id AS mention_id
  FROM h JOIN gold gm ON h.file_id = gm.file_id
  WHERE gm.gold_cluster IN (
    SELECT gb.gold_cluster FROM bm JOIN gold gb ON bm.file_id = gb.file_id
  )
),
cells AS (
  SELECT md.mode, g.k, l.mention_id
  FROM (SELECT 'medoid' AS mode UNION ALL SELECT 'all') md
  CROSS JOIN (SELECT unnest([{kbp_ks}]) AS k) g
  CROSS JOIN linkable l
),
ecnt AS (SELECT mode, CAST(count(*) AS BIGINT) AS n_entries FROM idx GROUP BY 1),
pcnt AS (SELECT mode, CAST(count(*) AS BIGINT) AS n_pairs FROM cand GROUP BY 1)
SELECT cl.mode, CAST(cl.k AS BIGINT) AS k,
       count(*) AS n_mentions,
       CAST(sum(CASE WHEN gr.gold_rank <= cl.k THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hit,
       (round(sum(CASE WHEN gr.gold_rank <= cl.k THEN 1 ELSE 0 END)
              / CAST(count(*) AS DOUBLE), 6) + 0.0) AS recall,
       coalesce(any_value(ec.n_entries), 0) AS n_entries,
       coalesce(any_value(pc.n_pairs), 0) AS n_pairs
FROM cells cl
LEFT JOIN grank gr ON cl.mode = gr.mode AND cl.mention_id = gr.mention_id
LEFT JOIN ecnt ec ON cl.mode = ec.mode
LEFT JOIN pcnt pc ON cl.mode = pc.mode
GROUP BY 1, 2""",
        "er_cluster_sizes": c
        + """SELECT n_members, count(*) AS n_clusters FROM (
               SELECT cluster_id, count(*) AS n_members
               FROM clusters GROUP BY cluster_id
             ) GROUP BY n_members""",
        "er_confusion": c
        + """, universe AS (
               SELECT left_id, right_id, min(block_key) AS block_key FROM (
                 SELECT left_id, right_id, block_key FROM pairs
                 UNION ALL
                 SELECT left_id, right_id, 'sha' AS block_key FROM sha_edges
               ) GROUP BY left_id, right_id
             ),
             labeled AS (
               SELECT u.left_id, u.right_id,
                      gl.gold_cluster = gr.gold_cluster AS is_match,
                      cl.cluster_id = cr.cluster_id AS pred_match
               FROM universe u
               JOIN ing gl ON u.left_id = gl.file_id
               JOIN ing gr ON u.right_id = gr.file_id
               JOIN clusters cl ON u.left_id = cl.file_id
               JOIN clusters cr ON u.right_id = cr.file_id
             )
             SELECT is_match, pred_match, count(*) AS n
             FROM labeled GROUP BY is_match, pred_match""",
        "er_review_queue": c
        + """SELECT left_id, right_id, (round(match_p, 6) + 0.0) AS match_p,
               (round(cosine, 6) + 0.0) AS cosine, (round(jaccard_sh, 6) + 0.0) AS jaccard_sh
             FROM scored_p WHERE match_p >= 0.05 AND match_p <= 0.95""",
        "er_block_census": c
        + """SELECT block_size, n_blocks,
               CAST(n_blocks * block_size * (block_size - 1) / 2 AS BIGINT)
                 AS induced_pairs
             FROM (
               SELECT n AS block_size, count(*) AS n_blocks FROM (
                 SELECT block_key, count(*) AS n FROM memb GROUP BY block_key
               ) GROUP BY n
             )""",
        "er_node_stats": c + _ranked_sql + f""",
             grid(k) AS (VALUES {", ".join(f"({k})" for k in STATS_K_GRID)}),
             topk AS (
               SELECT l.*, g.k FROM lbl l CROSS JOIN grid g WHERE l.rk <= g.k
             )
             SELECT node_id, CAST(k AS BIGINT) AS k,
               (round(max(match_p), 6) + 0.0) AS p_max,
               (round(coalesce(max(CASE WHEN rk = 2 THEN match_p END), 0.0), 6)
                 + 0.0) AS p_second,
               (round(min(match_p), 6) + 0.0) AS p_min,
               (round(avg(match_p), 6) + 0.0) AS p_mean,
               (round(median(match_p), 6) + 0.0) AS p_median,
               (round(coalesce(stddev_samp(match_p), 0.0), 6) + 0.0) AS p_stdev,
               count(*) AS n_cands,
               CAST(coalesce(min(CASE WHEN correct THEN rk END), 0) AS BIGINT)
                 AS correct_rank
             FROM topk GROUP BY node_id, k""",
        "er_recall_curve": c + _ranked_sql + _linkable_sql + f""",
             grid(k) AS (VALUES {", ".join(f"({k})" for k in RECALL_K_GRID)})
             SELECT CAST(g.k AS BIGINT) AS k,
               count(*) AS n_nodes,
               CAST(sum(CASE WHEN gr.gold_rank <= g.k THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_hit,
               (round(CAST(sum(CASE WHEN gr.gold_rank <= g.k THEN 1 ELSE 0 END)
                           AS DOUBLE) / count(*), 6) + 0.0) AS recall
             FROM linkable lk
             LEFT JOIN gold_rank gr ON gr.node_id = lk.node_id
             CROSS JOIN grid g
             GROUP BY g.k""",
        "er_rank_of_gold": c + _ranked_sql + _linkable_sql + """
             SELECT lk.node_id,
               CAST(coalesce(gr.gold_rank, 0) AS BIGINT) AS gold_rank
             FROM linkable lk
             LEFT JOIN gold_rank gr ON gr.node_id = lk.node_id""",
        "er_cluster_mode_lang": c
        + """, lang_counts AS (
               SELECT cl.cluster_id, i.lang, count(*) AS n
               FROM clusters cl JOIN ing i ON cl.file_id = i.file_id
               GROUP BY cl.cluster_id, i.lang
             )
             SELECT cluster_id, lang AS mode_lang, CAST(n AS BIGINT) AS n_mode
             FROM (
               SELECT *, row_number() OVER (
                 PARTITION BY cluster_id ORDER BY n DESC, lang ASC
               ) AS rn FROM lang_counts
             ) WHERE rn = 1""",
        "er_roc_curve": c
        + f""", gold AS (SELECT file_id, gold_cluster FROM reps),
             lblp AS (
               SELECT s.match_p, gl.gold_cluster = gr.gold_cluster AS is_match
               FROM scored_p s
               JOIN gold gl ON s.left_id = gl.file_id
               JOIN gold gr ON s.right_id = gr.file_id
             ),
             tgrid AS (
               SELECT CAST(x AS DOUBLE) AS tau
               FROM (VALUES {", ".join(f"({t!r})" for t in ROC_TAU_GRID)}) v(x)
             )
             SELECT (round(tau, 6) + 0.0) AS tau, n_tp, n_fp, n_fn, n_tn,
               (round(CAST(n_tp AS DOUBLE) / (n_tp + n_fn), 6) + 0.0) AS tpr,
               (round(CAST(n_fp AS DOUBLE) / (n_fp + n_tn), 6) + 0.0) AS fpr,
               (round(CASE WHEN n_tp + n_fp > 0
                           THEN CAST(n_tp AS DOUBLE) / (n_tp + n_fp)
                           ELSE 1.0 END, 6) + 0.0) AS "precision"
             FROM (
               SELECT tau,
                 CAST(sum(CASE WHEN is_match AND match_p >= tau
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_tp,
                 CAST(sum(CASE WHEN NOT is_match AND match_p >= tau
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_fp,
                 CAST(sum(CASE WHEN is_match AND match_p < tau
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_fn,
                 CAST(sum(CASE WHEN NOT is_match AND match_p < tau
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_tn
               FROM lblp CROSS JOIN tgrid GROUP BY tau
             )""",
        "er_score_hist": c
        + f""", gold AS (SELECT file_id, gold_cluster FROM reps),
             lblp AS (
               SELECT s.match_p, gl.gold_cluster = gr.gold_cluster AS is_match
               FROM scored_p s
               JOIN gold gl ON s.left_id = gl.file_id
               JOIN gold gr ON s.right_id = gr.file_id
             )
             SELECT least(CAST(floor(match_p * {HIST_N_BINS}) AS BIGINT),
                          {HIST_N_BINS - 1}) AS bin_id,
                    is_match, count(*) AS n
             FROM lblp GROUP BY 1, 2""",
        "er_blocking_recall": c
        + """, pos AS (
               SELECT a.file_id AS left_id, b.file_id AS right_id
               FROM ing a JOIN ing b
                 ON a.gold_cluster = b.gold_cluster
                AND a.file_id < b.file_id
             ),
             universe AS (
               SELECT left_id, right_id FROM pairs
               UNION
               SELECT left_id, right_id FROM sha_edges
             ),
             hit AS (
               SELECT p.* FROM pos p
               JOIN universe u
                 ON p.left_id = u.left_id AND p.right_id = u.right_id
             )
             SELECT (SELECT count(*) FROM pos) AS n_gold_pairs,
                    (SELECT count(*) FROM hit) AS n_hit,
                    (round(CAST((SELECT count(*) FROM hit) AS DOUBLE)
                          / (SELECT count(*) FROM pos), 6) + 0.0) AS recall""",
        "er_reduction_ratio": c
        + """SELECT n_records, n_reps, n_possible_pairs, n_candidate_pairs,
               (round(1.0 - CAST(n_candidate_pairs AS DOUBLE)
                     / n_possible_pairs, 6) + 0.0) AS reduction_ratio
             FROM (
               SELECT (SELECT count(*) FROM ing) AS n_records,
                      (SELECT count(*) FROM reps) AS n_reps,
                      (SELECT count(*) * (count(*) - 1) // 2 FROM reps)
                        AS n_possible_pairs,
                      (SELECT count(*) FROM pairs) AS n_candidate_pairs
             )""",
        "er_sorted_neighborhood": c
        + f""", snm AS (
               SELECT file_id,
                      lang || ':' || path_stem || ':' || base || ':' || file_id
                        AS snm_key
               FROM reps
             ),
             snm_ranked AS (
               SELECT file_id, row_number() OVER (ORDER BY snm_key) AS rn
               FROM snm
             )
             SELECT least(a.file_id, b.file_id) AS left_id,
                    greatest(a.file_id, b.file_id) AS right_id,
                    b.rn - a.rn AS rank_distance
             FROM snm_ranked a JOIN snm_ranked b
               ON b.rn > a.rn AND b.rn < a.rn + {SNM_WINDOW}""",
        "er_meta_blocking": c
        + """, weights AS (
               SELECT l.file_id AS left_id, r.file_id AS right_id,
                      CAST(count(*) AS BIGINT) AS cbs_weight
               FROM memb l JOIN memb r
                 ON l.block_key = r.block_key AND l.file_id < r.file_id
               GROUP BY 1, 2
             )
             SELECT left_id, right_id, cbs_weight FROM weights
             WHERE cbs_weight > (SELECT avg(cbs_weight) FROM weights)""",
        "er_bcubed": c
        + """, asg AS (
               SELECT cl.file_id, cl.cluster_id, g.gold_cluster
               FROM clusters cl JOIN ing g USING (file_id)
             ),
             cells AS (
               SELECT cluster_id, gold_cluster, count(*)::DOUBLE AS n_cg
               FROM asg GROUP BY 1, 2
             ),
             csz AS (
               SELECT cluster_id, count(*)::DOUBLE AS n_c FROM asg GROUP BY 1
             ),
             gsz AS (
               SELECT gold_cluster, count(*)::DOUBLE AS n_g FROM asg GROUP BY 1
             ),
             sums AS (
               SELECT sum(n_cg) AS n,
                      sum(n_cg * n_cg / n_c) AS p_sum,
                      sum(n_cg * n_cg / n_g) AS r_sum
               FROM cells JOIN csz USING (cluster_id)
                          JOIN gsz USING (gold_cluster)
             )
             SELECT CAST(n AS BIGINT) AS n_records,
               (round(p_sum / n, 6) + 0.0) AS bcubed_precision,
               (round(r_sum / n, 6) + 0.0) AS bcubed_recall,
               (round(2.0 * (p_sum / n) * (r_sum / n)
                     / ((p_sum / n) + (r_sum / n)), 6) + 0.0) AS bcubed_f1
             FROM sums""",
        "er_fs_em": c + _fs_em_sql(),
        "er_fs_posteriors": c + _fs_posteriors_sql(),
        "er_fs_tf": c + _FS_TF_SQL,
        "er_golden_record": c + _GOLDEN_RECORD_SQL,
        "er_one_to_one": c + _one_to_one_sql(),
        "er_blocking_rules": c + _BLOCKING_RULES_SQL,
        "er_threshold_clusters": c + _threshold_clusters_sql(),
        "er_triangles": c + _TRIANGLES_SQL,
        "er_rand_index": c + _RAND_INDEX_SQL,
        "er_bipartite_link": c + _bipartite_link_sql(),
        "er_model_disagreement": c + _model_disagreement_sql(),
        "er_phonetic_block": c + _phonetic_block_sql(),
        "er_clk_linkage": c + _clk_linkage_sql(),
        "er_nmi": c + _NMI_SQL,
        "er_fs_waterfall": c + _fs_waterfall_sql(),
    }


QUERIES = {
    "er_ingest": q_ingest,
    "er_block_membership": q_block_membership,
    "er_candidate_pairs": q_candidate_pairs,
    "er_sha_edges": q_sha_edges,
    "er_scored_pairs": q_scored_pairs,
    "er_string_panel": q_string_panel,
    "er_string_panel_full": q_string_panel_full,
    "er_string_panel_word": q_string_panel_word,
    "er_match_edges": q_match_edges,
    "er_pagerank": q_er_pagerank,
    "er_cluster_density": q_er_cluster_density,
    "er_clusters": q_clusters,
    "er_incremental_clusters": q_incremental_clusters,
    "er_unlink_clusters": q_unlink_clusters,
    "er_cdc_clusters": q_cdc_clusters,
    "er_kbp_relink": q_kbp_relink,
    "er_cluster_sizes": q_cluster_sizes,
    "er_confusion": q_confusion,
    "er_block_census": q_block_census,
    "er_node_stats": q_node_stats,
    "er_review_queue": q_review_queue,
    "er_blocking_recall": q_blocking_recall,
    "er_recall_curve": q_recall_curve,
    "er_rank_of_gold": q_rank_of_gold,
    "er_cluster_mode_lang": q_cluster_mode_lang,
    "er_feature_ablation": q_feature_ablation,
    "er_roc_curve": q_roc_curve,
    "er_score_hist": q_score_hist,
    "er_reduction_ratio": q_reduction_ratio,
    "er_bcubed": q_bcubed,
    "er_sorted_neighborhood": q_sorted_neighborhood,
    "er_meta_blocking": q_meta_blocking,
    "er_fs_em": q_er_fs_em,
    "er_fs_posteriors": q_er_fs_posteriors,
    "er_fs_tf": q_er_fs_tf,
    "er_golden_record": q_er_golden_record,
    "er_one_to_one": q_er_one_to_one,
    "er_blocking_rules": q_er_blocking_rules,
    "er_threshold_clusters": q_er_threshold_clusters,
    "er_triangles": q_er_triangles,
    "er_rand_index": q_er_rand_index,
    "er_bipartite_link": q_er_bipartite_link,
    "er_model_disagreement": q_er_model_disagreement,
    "er_phonetic_block": q_er_phonetic_block,
    "er_clk_linkage": q_er_clk_linkage,
    "er_nmi": q_er_nmi,
    "er_fs_waterfall": q_er_fs_waterfall,
}
