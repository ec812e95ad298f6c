"""End-to-end pipeline orchestration (SURVEY.md §3.1 Spark shape, §7.1).

``run_pipeline(spark, source)`` wires the stages:

    source → ingest → [exact-dup star edges]
                   → blocking (composite ∪ LSH, census+salt) on reps
                   → scoring (embedding cosine + JW/Lev + combiner)
                   → threshold τ → match edges (∪ sha edges)
                   → large-star/small-star CC → clusters

Each stage can checkpoint to a parquet table ("Iceberg-style"; see
blink_spark.checkpoint) so a killed run resumes mid-pipeline — the
reference's resume-if-done idiom (``scripts/feature_ablation_study.py:906-915``)
promoted to per-stage tables.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blink_spark import blocking, clustering, evaluate, ingest, scoring


@dataclass
class PipelineConfig:
    block_cap: int = blocking.DEFAULT_BLOCK_CAP
    match_tau: float = scoring.MATCH_TAU
    checkpoint_dir: str | None = None  # None → no persistence (in-memory run)
    run_id: str = "run0"
    # Single-JVM scale guard (sf>=0.25 in-memory runs): eagerly
    # materialize the feature index, then DROP the wide signatures cache
    # (raw shingle strings + minhash sigs) before the O(pairs) scoring
    # join — resident upstream caches otherwise evict the pair/feature
    # blocks mid-join (measured: 77.9k vs 683k pairs/s at sf0.5).  The
    # returned "signatures" table stays correct but recomputes on use.
    # Checkpointed runs don't need this (stages live in parquet, not heap).
    release_upstream: bool = False
    extra: dict = field(default_factory=dict)


def run_pipeline(
    spark: SparkSession,
    source: DataFrame,
    conf: PipelineConfig | None = None,
) -> dict[str, DataFrame]:
    """Returns every stage table keyed by name (lazy DataFrames unless
    checkpointing is enabled, in which case stages materialize + resume)."""
    conf = conf or PipelineConfig()

    if conf.checkpoint_dir:
        from blink_spark.checkpoint import StageWriter

        writer = StageWriter(spark, conf.checkpoint_dir, conf.run_id)
    else:
        writer = None

    # stages consumed by >1 downstream action are persisted (in-memory run)
    # or written to the checkpoint table (resumable run) — without this the
    # whole upstream DAG re-executes per action (the same reason the
    # reference materializes encodings once, SURVEY.md §4 row 1)
    _persisted = {"signatures", "candidate_pairs", "features", "scored_pairs", "clusters"}

    def stage(name: str, build):
        if writer is None:
            df = build()
            return df.persist() if name in _persisted else df
        return writer.materialize(name, build)

    ing = stage("ingested", lambda: ingest.ingest(source))
    with_sig = stage(
        "signatures",
        lambda: blocking.with_lsh_columns(ing).select(
            "file_id", "content_sha", "path", "path_stem", "lang",
            "n_tokens", "shingles", "shingle_hashes", "minhash_sig", "band_keys",
        ),
    )

    sha_edges = stage("sha_edges", lambda: blocking.exact_dup_edges(ing))
    reps = blocking.representatives(with_sig)
    membership = stage(
        "block_membership",
        lambda: blocking.block_membership(
            reps.select("file_id", "lang", "path_stem", "band_keys")
        ),
    )
    pairs = stage(
        "candidate_pairs",
        lambda: blocking.candidate_pairs(
            membership.select("file_id", "block_key"), conf.block_cap
        ),
    )

    features = stage(
        "features",
        lambda: scoring.with_embedding(with_sig).select(
            "file_id", "path", "content_sha", "shingle_hashes", "embedding"
        ),
    )
    if conf.release_upstream and writer is None:
        features.count()  # embedding kernel runs exactly once, to cache
        with_sig.unpersist(True)
    scored = stage("scored_pairs", lambda: scoring.score_pairs(pairs, features))

    edges = stage(
        "match_edges",
        lambda: scoring.match_edges(scored, conf.match_tau).unionByName(
            sha_edges.select("left_id", "right_id")
        ),
    )
    # CC iterates over the rep-graph only (scored edges are rep-rep by
    # construction); sha-duplicates inherit their rep's cluster id —
    # identical result to CC over `edges`, minus the mass duplicates
    rep_edges = scoring.match_edges(scored, conf.match_tau)
    membership_reps = blocking.rep_map(ing)
    clusters = stage(
        "clusters",
        lambda: clustering.connected_components_via_reps(
            rep_edges, membership_reps
        ),
    )

    return {
        "ingested": ing,
        "signatures": with_sig,
        "sha_edges": sha_edges,
        "block_membership": membership,
        "candidate_pairs": pairs,
        "features": features,
        "scored_pairs": scored,
        "match_edges": edges,
        "clusters": clusters,
    }


def fit_match_model(tables: dict[str, DataFrame], labeled_source: DataFrame | None = None):
    """Fit the calibrated spark.ml combiner (StandardScaler + LR — the NIL
    predictor training, ``scripts/feature_ablation_study.py:969-977``) on
    the scored pairs of a gold-labeled corpus run.

    Gold labels come from ``labeled_source`` when given (ingested on the
    fly, so callers can train on a differently-labeled corpus); otherwise
    from the pipeline's own ingested table. Raises if neither carries a
    ``gold_cluster`` column rather than failing opaquely downstream."""
    if labeled_source is not None:
        if "gold_cluster" not in labeled_source.columns:
            raise ValueError("labeled_source lacks a gold_cluster column")
        labeled_ing = (
            labeled_source
            if "file_id" in labeled_source.columns
            else ingest.ingest(labeled_source)
        )
        gold = labeled_ing.select("file_id", "gold_cluster")
    elif "gold_cluster" in tables["ingested"].columns:
        gold = tables["ingested"].select("file_id", "gold_cluster")
    else:
        raise ValueError(
            "no gold labels: pipeline source lacks gold_cluster and no "
            "labeled_source was given"
        )
    labeled = evaluate.labeled_pairs(
        tables["scored_pairs"].select("left_id", "right_id", "block_key"), gold
    ).join(
        tables["scored_pairs"],
        ["left_id", "right_id", "block_key"],
    )
    # training hygiene (M2/M3): seeded majority-class undersampling +
    # holdout split; the model is fit on the balanced train partition only
    # (``scripts/feature_ablation_study.py:925-945``)
    train, _holdout = scoring.train_test_split(labeled)
    return scoring.fit_combiner(train)


def run_calibrated(
    spark: SparkSession,
    source: DataFrame,
    model=None,
    conf: PipelineConfig | None = None,
) -> dict[str, DataFrame]:
    """Pipeline variant that thresholds the CALIBRATED probability
    ``match_p_ml`` instead of the fixed-weight score. ``model=None`` fits
    on this corpus's own gold labels first (train-and-link); pass a
    pre-fitted model to link an unlabeled corpus."""
    conf = conf or PipelineConfig()
    tables = run_pipeline(spark, source, conf)
    if model is None:
        # gold labels come from tables["ingested"] (same corpus, already
        # built and persisted) — passing the raw source here would re-run
        # the whole ingest chain just to extract gold_cluster
        model = fit_match_model(tables)
    rescored = scoring.apply_combiner(model, tables["scored_pairs"])
    rep_edges = rescored.filter(
        F.col("match_p_ml") >= F.lit(conf.match_tau)
    ).select("left_id", "right_id")
    from blink_spark import clustering as _clustering

    clusters = _clustering.connected_components_via_reps(
        rep_edges, blocking.rep_map(tables["ingested"])
    )
    out = dict(tables)
    out["scored_pairs_ml"] = rescored
    out["clusters"] = clusters
    out["match_model"] = model
    return out


def evaluate_run(
    tables: dict[str, DataFrame], source_with_gold: DataFrame
) -> dict[str, float]:
    """Headline metrics vs gold (fixture corpora carry ``gold_cluster``)."""
    gold = tables["ingested"].select("file_id", "gold_cluster")

    # labeled same-block pairs: candidate pairs + exact-dup edges, labeled
    # from gold, predictions induced by the final clustering
    pair_universe = (
        tables["candidate_pairs"].select("left_id", "right_id", "block_key")
        .unionByName(
            tables["sha_edges"].select("left_id", "right_id", "block_key")
        )
        .groupBy("left_id", "right_id")
        .agg(F.min("block_key").alias("block_key"))
    )
    labeled = evaluate.labeled_pairs(pair_universe, gold)
    labeled_pred = evaluate.predicted_pair_labels(labeled, tables["clusters"])
    metrics = evaluate.pairwise_f1(labeled_pred)

    # invariant: content_sha carried unchanged through checkpoints
    bad_sha = (
        tables["features"]
        .join(tables["ingested"].select("file_id", F.col("content_sha").alias("src_sha")), "file_id")
        .filter(F.col("content_sha") != F.col("src_sha"))
        .count()
    )
    metrics["sha_invariant_violations"] = bad_sha
    metrics["n_files"] = tables["ingested"].count()
    metrics["n_clusters"] = tables["clusters"].select("cluster_id").distinct().count()
    return metrics
