"""Incremental linkage — the reference fork's headline capability
(incremental knowledge-base population: newly discovered entities are
indexed so future mentions link to them, ``scripts/kbp_simulation.py:316-366``,
``README.md:8-16``) re-expressed as batch-append over checkpointed tables.

State after a run = the ``clusters`` table (file_id → cluster_id) plus the
source rows already linked. A new batch of files is linked WITHOUT
re-scoring old-vs-old pairs:

1. ingest + LSH keys for the new rows only (keys are deterministic
   columns — appending never rebuilds an index, SURVEY.md §2.10 I1);
2. candidate pairs restricted to those touching ≥1 new row (new×new and
   new×old share blocks; old×old is skipped — it is already resolved);
3. score + threshold as usual;
4. merged clusters = connected components over
   [existing assignment stars (file→cluster_id) ∪ new match edges ∪ new
   sha edges]. An existing cluster acts as a single super-node, so two
   old clusters bridged by a new file merge correctly, and a new file
   matching nothing founds a new cluster (the NIL path, I2).

Equivalent guarantee: running incrementally over batches B1..Bk yields the
same clustering as one batch over B1∪..∪Bk whenever the blocking recall
over split pairs is preserved (tested in tests/test_incremental.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from blink_spark import blocking, clustering, ingest, scoring


def link_batch(
    prior_source: DataFrame | None,
    prior_clusters: DataFrame | None,
    new_source: DataFrame,
    tau: float = scoring.MATCH_TAU,
    block_cap: int = blocking.DEFAULT_BLOCK_CAP,
) -> DataFrame:
    """Returns the merged ``(file_id, cluster_id)`` table.

    ``prior_source`` / ``prior_clusters`` are the already-linked corpus and
    its assignment (None for the first batch). Only pairs touching the new
    batch are generated and scored.
    """
    new_ing = ingest.ingest(new_source).withColumn("is_new", F.lit(True))
    if prior_source is None:
        all_ing = new_ing
    else:
        old_ing = ingest.ingest(prior_source).withColumn("is_new", F.lit(False))
        all_ing = old_ing.unionByName(new_ing)

    with_sig = blocking.with_lsh_columns(all_ing)
    reps = blocking.representatives(with_sig)
    membership = blocking.block_membership(
        reps.select("file_id", "lang", "path_stem", "band_keys")
    )
    # flag blocks containing at least one new rep; only they can produce
    # new edges — old-only blocks are pruned before the self-join
    newness = reps.select("file_id", "is_new")
    m = membership.join(newness, "file_id")
    live_blocks = (
        m.groupBy("block_key")
        .agg(F.max(F.col("is_new").cast("int")).alias("has_new"))
        .filter(F.col("has_new") == 1)
        .select("block_key")
    )
    live = m.join(live_blocks, "block_key").select("file_id", "block_key", "is_new")
    pairs = blocking.candidate_pairs(
        live.select("file_id", "block_key"), block_cap
    )
    # drop old×old pairs (already resolved in prior_clusters)
    nl = newness.select(F.col("file_id").alias("left_id"), F.col("is_new").alias("l_new"))
    nr = newness.select(F.col("file_id").alias("right_id"), F.col("is_new").alias("r_new"))
    pairs = (
        pairs.join(nl, "left_id").join(nr, "right_id")
        .filter(F.col("l_new") | F.col("r_new"))
        .select("left_id", "right_id", "block_key", "salt")
    )

    features = scoring.with_embedding(with_sig).select(
        "file_id", "path", "content_sha", "shingle_hashes", "embedding"
    )
    scored = scoring.score_pairs(pairs, features)
    new_edges = scoring.match_edges(scored, tau)

    # sha stars among the union (collapses new exact dups onto old reps)
    sha_edges = blocking.exact_dup_edges(all_ing).select("left_id", "right_id")

    # prior assignments as star edges file→cluster_id (cluster_id is itself
    # a member file_id, so the node domain stays closed)
    if prior_clusters is not None:
        prior_edges = prior_clusters.filter(
            F.col("file_id") != F.col("cluster_id")
        ).select(
            F.col("cluster_id").alias("left_id"), F.col("file_id").alias("right_id")
        )
        edges = new_edges.unionByName(sha_edges).unionByName(prior_edges)
    else:
        edges = new_edges.unionByName(sha_edges)

    nodes = all_ing.select("file_id")
    return clustering.connected_components(edges.distinct(), nodes)
