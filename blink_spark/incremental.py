"""Incremental linkage — the reference fork's headline capability
(incremental knowledge-base population: newly discovered entities are
indexed so future mentions link to them, ``scripts/kbp_simulation.py:316-366``,
``README.md:8-16``) re-expressed as batch-append over checkpointed tables.

State after a run = :class:`LinkState`:

- ``features`` — the per-row deterministic columns (sha ids, shingle
  hashes, LSH band keys, embedding) of every row linked so far. These are
  the engine's "index": computed ONCE per row, on the batch that row
  arrived in, and reused verbatim afterwards (the analog of the KBP loop
  appending new entity encodings to the FAISS index instead of re-encoding
  the KB, ``scripts/kbp_simulation.py:227-251``).
- ``clusters`` — the current assignment (file_id → cluster_id).

A new batch of files is linked WITHOUT recomputing old rows:

1. ingest + signatures + embedding for the NEW rows only
   (:func:`batch_features` — the only place the pandas UDFs run);
2. candidate pairs restricted to blocks touching ≥1 new row (new×new and
   new×old share blocks; old×old is pruned — it is already resolved).
   Block keys for old rows come from the stored ``band_keys`` column, a
   thin shuffle with zero recompute;
3. score + threshold as usual (features fetched from state);
4. merged clusters = connected components over
   [existing assignment stars (cluster_id→file_id) ∪ new match edges ∪ new
   sha edges]. An existing cluster acts as a single super-node, so two
   old clusters bridged by a new file merge correctly, and a new file
   matching nothing founds a new cluster (the NIL path, I2).

At scale the state ``features`` table is the checkpointed stage table
(parquet/Iceberg partitioned by arrival batch — blink_spark.streaming
stores exactly that), so per-batch work is O(new + touched-blocks), not
O(total corpus).

:func:`compact_state` optionally prunes state features to ONE
representative row per cluster (medoid by embedding, the
KMedoids-of-cluster-encodings idiom of ``scripts/kbp_simulation.py:227-251``
/ ``:316-366``) so index state grows with #entities, not #mentions —
future batches then link to the cluster via its representative.

Equivalent guarantee: running incrementally over batches B1..Bk yields the
same clustering as one batch over B1∪..∪Bk whenever the blocking recall
over split pairs is preserved (tested in tests/test_incremental.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from blink_spark import blocking, clustering, ingest, scoring

FEATURE_COLS = [
    "file_id", "path", "path_stem", "lang", "content_sha",
    "shingle_hashes", "band_keys", "embedding",
]


@dataclass
class LinkState:
    """Accumulated linkage state: per-row index features + assignment."""

    features: DataFrame  # FEATURE_COLS schema
    clusters: DataFrame  # (file_id, cluster_id)

    def persist(self) -> "LinkState":
        self.features.persist()
        self.clusters.persist()
        return self


def batch_features(source: DataFrame) -> DataFrame:
    """Deterministic index columns for ONE batch of raw source rows.

    This is the only function that runs the tokenize/minhash/embedding
    kernels; everything downstream consumes its output, so feeding it only
    the new batch guarantees old rows are never re-encoded.
    """
    ing = ingest.ingest(source)
    with_sig = blocking.with_lsh_columns(ing)
    return scoring.with_embedding(with_sig).select(*FEATURE_COLS)


def link_features(
    prior: LinkState | None,
    new_features: DataFrame,
    tau: float = scoring.MATCH_TAU,
    block_cap: int = blocking.DEFAULT_BLOCK_CAP,
) -> LinkState:
    """Core incremental step over PRE-COMPUTED new-batch features.

    ``prior`` features/clusters are reused as-is (no UDF touches them).
    Returns the merged state; ``state.features`` is prior ∪ new.
    """
    new_feat = new_features.select(*FEATURE_COLS).withColumn("is_new", F.lit(True))
    if prior is None:
        all_feat = new_feat
    else:
        all_feat = (
            prior.features.select(*FEATURE_COLS)
            .withColumn("is_new", F.lit(False))
            .unionByName(new_feat)
        )

    # exact-dup collapse over the union: thin columns only (id + sha),
    # no recompute — the window shuffles ~80 B/row regardless of content size
    reps = blocking.representatives(all_feat)
    membership = blocking.block_membership(
        reps.select("file_id", "lang", "path_stem", "band_keys")
    )
    # keep only blocks containing ≥1 new rep; old-only blocks are pruned
    # before the self-join — per-batch pair work scales with the batch's
    # block footprint, not the corpus
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
    # drop old×old pairs (already resolved in prior.clusters)
    nl = newness.select(F.col("file_id").alias("left_id"), F.col("is_new").alias("l_new"))
    nr = newness.select(F.col("file_id").alias("right_id"), F.col("is_new").alias("r_new"))
    pairs = (
        pairs.join(nl, "left_id").join(nr, "right_id")
        .filter(F.col("l_new") | F.col("r_new"))
        .select("left_id", "right_id", "block_key", "salt")
    )

    scored = scoring.score_pairs(
        pairs,
        all_feat.select("file_id", "path", "content_sha", "shingle_hashes", "embedding"),
    )
    new_edges = scoring.match_edges(scored, tau)

    # sha stars among the union (collapses new exact dups onto old reps)
    sha_edges = blocking.exact_dup_edges(all_feat).select("left_id", "right_id")

    # prior assignments as star edges cluster_id→file_id (cluster_id is
    # itself a member file_id, so the node domain stays closed)
    if prior is not None:
        prior_edges = prior.clusters.filter(
            F.col("file_id") != F.col("cluster_id")
        ).select(
            F.col("cluster_id").alias("left_id"), F.col("file_id").alias("right_id")
        )
        edges = new_edges.unionByName(sha_edges).unionByName(prior_edges)
        # node domain: every feature row plus every previously-assigned
        # file (state may have been compacted to representatives)
        nodes = (
            all_feat.select("file_id")
            .unionByName(prior.clusters.select("file_id"))
            .distinct()
        )
    else:
        edges = new_edges.unionByName(sha_edges)
        nodes = all_feat.select("file_id")

    merged = clustering.connected_components(edges.distinct(), nodes)
    return LinkState(features=all_feat.drop("is_new"), clusters=merged)


def link_batch(
    prior: LinkState | None,
    new_source: DataFrame,
    tau: float = scoring.MATCH_TAU,
    block_cap: int = blocking.DEFAULT_BLOCK_CAP,
) -> LinkState:
    """Link a batch of RAW source rows against the accumulated state.

    Feature kernels (tokenize → minhash → embedding) run over
    ``new_source`` only; prior rows are consumed from ``prior.features``.
    The new batch's features are persisted before linking: the scoring
    join broadcasts the feature table twice and AQE builds each broadcast
    independently, so an unpersisted batch would run its kernels twice
    (the streaming front-end gets this for free by writing features to
    parquet first).
    """
    return link_features(
        prior, batch_features(new_source).persist(), tau, block_cap
    )


def unlink_batch(
    state: LinkState,
    deleted_ids: DataFrame,
    tau: float = scoring.MATCH_TAU,
    block_cap: int = blocking.DEFAULT_BLOCK_CAP,
    rehydrate_from: DataFrame | None = None,
) -> LinkState:
    """Retraction — the inverse of :func:`link_batch`: remove a batch of
    file_ids from the accumulated state and repair ONLY the clusters they
    touched (a deleted row can be the bridge holding a cluster together,
    so its cluster may split).

    Why this is exact: every match/sha edge is intra-cluster by the CC
    fixpoint (an inter-cluster edge would have merged the clusters), so
    deleting a row can only change the components of its own cluster, and
    all evidence needed to re-derive them lives in the surviving members'
    stored features. The repair is therefore
    ``link_features(None, survivors-of-affected-clusters)`` — blocking +
    scoring + CC over that slice alone, zero feature kernels — stitched
    onto the untouched assignments verbatim. Per-batch work scales with
    the affected clusters' footprint, not the corpus (the same delta
    discipline as :func:`link_features`'s old-only block pruning).

    After :func:`compact_state` only representatives keep features, so a
    retraction touching a pruned member cannot repair from state alone.
    Pass ``rehydrate_from`` (the raw source table) to recompute features
    for exactly the missing survivors — the feature kernels run on
    O(missing) rows, never the corpus (the id restriction is a semi join
    BEFORE the tokenize/minhash/embedding stage; determinism makes the
    rehydrated rows byte-equal to the pruned originals). Without it a
    retraction that needs a pruned member's features raises rather than
    silently mis-clustering.
    """
    to_release = []
    del_ids = deleted_ids.select("file_id").distinct().persist()
    to_release.append(del_ids)
    affected = (
        state.clusters.join(del_ids, "file_id", "left_semi")
        .select("cluster_id")
        .distinct()
    )
    members = state.clusters.join(affected, "cluster_id", "left_semi")
    survivors = (
        members.join(del_ids, "file_id", "left_anti").select("file_id").persist()
    )
    to_release.append(survivors)
    # Persist AND materialize the repair input before link_features — the
    # same discipline link_batch applies to batch features: the scoring
    # join builds several independent broadcasts, and an unpersisted
    # surv_feat would re-run its whole upstream lineage (incl. the Arrow
    # feature kernels if the caller's state is lazy) once per broadcast
    # build — concurrent JNI-critical Arrow batches are exactly what
    # starves the GC locker on small-heap sessions.
    surv_feat = state.features.join(survivors, "file_id", "left_semi").persist()
    to_release.append(surv_feat)
    n_survivors, n_with_feat = survivors.count(), surv_feat.count()
    rehydrated = None
    if n_with_feat < n_survivors:
        if rehydrate_from is None:
            raise ValueError(
                "unlink_batch needs features for every surviving member of "
                "an affected cluster; state was compacted past them — pass "
                "rehydrate_from=<source table> or retract before compacting"
            )
        missing = survivors.join(
            surv_feat.select("file_id"), "file_id", "left_anti"
        )
        # ingest is JVM-side hashing (one source scan, no Python); the
        # kernels (tokenize → minhash → embedding) run only on the rows
        # that survive the semi join
        ing_missing = ingest.ingest(rehydrate_from).join(
            missing, "file_id", "left_semi"
        )
        rehydrated = (
            scoring.with_embedding(blocking.with_lsh_columns(ing_missing))
            .select(*FEATURE_COLS)
            .persist()
        )
        if rehydrated.count() + n_with_feat < n_survivors:
            raise ValueError(
                "rehydrate_from does not contain every pruned survivor of "
                "the affected clusters — retraction would mis-cluster"
            )
        surv_feat = surv_feat.unionByName(rehydrated).persist()
        to_release.append(surv_feat)
    repaired = link_features(None, surv_feat, tau, block_cap)
    # The CC fixpoint inside link_features already ran EAGERLY (per-round
    # localCheckpoints), so checkpointing the final assignment here only
    # materializes the O(affected-survivors) projection — after which the
    # repair intermediates can be released immediately. A long-running
    # retraction loop must not accumulate pinned blocks across calls
    # waiting for the ContextCleaner (the GC-locker starvation failure
    # mode documented in BASELINE.md). `rehydrated` stays persisted: it
    # feeds the RETURNED features union and is O(missing) rows.
    repaired_clusters = repaired.clusters.localCheckpoint(eager=True)
    for df in to_release:
        df.unpersist()
    kept = state.clusters.join(affected, "cluster_id", "left_anti")
    remaining_feat = state.features.join(del_ids, "file_id", "left_anti")
    if rehydrated is not None:
        # fold the rehydrated survivors back in: a deleted row may have
        # been its cluster's representative, and without these rows the
        # repaired clusters would be invisible to future link_batch calls.
        # Growth is O(affected survivors); re-run compact_state to prune
        # back to one representative per (now-repaired) cluster.
        remaining_feat = remaining_feat.unionByName(rehydrated)
    return LinkState(
        features=remaining_feat,
        clusters=kept.unionByName(repaired_clusters),
    )


# Above this member count the medoid is computed over a deterministic
# sample (documented approximation).  2,048² float64 distances ≈ 33 MB —
# bounded per Python worker regardless of cluster size; without the cap a
# 10^6-member boilerplate mega-cluster would demand a 10^12-cell matrix.
MEDOID_SAMPLE_CAP = 2048


def cluster_representatives(
    features: DataFrame,
    clusters: DataFrame,
    mode: str = "medoid",
    sample_cap: int = MEDOID_SAMPLE_CAP,
) -> DataFrame:
    """The cluster's index entry (entries, for ``all``).

    ``medoid``: member minimizing summed euclidean distance to the other
    members' embeddings (KMedoids(n_clusters=1) over cluster encodings,
    ``scripts/kbp_simulation.py:45-46``/``:227-251``), ties broken by min
    file_id. Clusters larger than ``sample_cap`` use the medoid of a
    deterministic pseudo-random sample (members ordered by blake2b of
    file_id — engine- and partitioning-invariant) so the pairwise matrix
    stays O(cap²) per worker; the exact medoid of a mega-cluster of
    near-duplicates differs negligibly from the sample medoid.
    ``first``: min file_id (O(n), no pairwise work). ``all``: every
    member is its cluster's entry (the reference default —
    ``scripts/kbp_simulation.py:227-251`` indexes all encodings unless
    ``--medoid`` opts in). Returns FEATURE_COLS + cluster_id.
    """
    joined = features.join(clusters, "file_id")
    if mode == "all":
        return joined
    if mode == "first":
        from pyspark.sql.window import Window

        w = Window.partitionBy("cluster_id").orderBy("file_id")
        return (
            joined.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    if mode != "medoid":
        raise ValueError(f"unknown representative mode {mode!r}")

    import hashlib

    import numpy as np
    import pandas as pd

    def _pick(pdf: pd.DataFrame) -> pd.DataFrame:
        # applyInPandas delivers group rows in shuffle order; sort so the
        # float cost sums are bitwise partitioning-invariant (ties at the
        # 1e-9 window otherwise depend on summation order)
        pdf = pdf.sort_values("file_id").reset_index(drop=True)
        if len(pdf) > sample_cap:
            order = np.argsort(
                [
                    hashlib.blake2b(
                        fid.encode(), digest_size=8, key=b"medoid-cap"
                    ).digest()
                    for fid in pdf["file_id"]
                ],
                kind="stable",
            )
            pdf = pdf.iloc[order[:sample_cap]]
        m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        sq = (m * m).sum(axis=1)
        d2 = sq[:, None] + sq[None, :] - 2.0 * (m @ m.T)
        np.maximum(d2, 0.0, out=d2)
        cost = np.sqrt(d2).sum(axis=1)
        ids = pdf["file_id"].to_numpy()
        cand = ids[np.isclose(cost, cost.min(), rtol=0, atol=1e-9)]
        return pd.DataFrame(
            {"cluster_id": [pdf["cluster_id"].iloc[0]], "file_id": [min(cand)]}
        )

    pick = joined.select("cluster_id", "file_id", "embedding").groupBy(
        "cluster_id"
    ).applyInPandas(_pick, "cluster_id string, file_id string")
    # joined already carries cluster_id; a second join(clusters) would
    # duplicate the column and break any downstream select("cluster_id")
    return joined.join(pick, ["cluster_id", "file_id"], "left_semi")


def compact_state(state: LinkState, mode: str = "medoid") -> LinkState:
    """Prune state features to one representative row per cluster.

    Index state then grows O(#entities) instead of O(#mentions) — the KBP
    loop's representative-encodings discipline. Clusters (the full
    assignment) are kept untouched; only the feature index shrinks.
    Tradeoff (documented): a future row can now only link to a cluster via
    its representative's blocks/features.

    ``mode="all"`` is the identity on features (every member stays an
    index entry) — the reference's default representation, kept so the
    medoid-vs-all A/B (``er_kbp_relink``) runs both arms through the same
    code path.
    """
    if mode == "all":
        return LinkState(
            features=state.features.select(*FEATURE_COLS),
            clusters=state.clusters,
        )
    reps = cluster_representatives(state.features, state.clusters, mode)
    return LinkState(features=reps.select(*FEATURE_COLS), clusters=state.clusters)


class SnapshotLinkStore:
    """Durable incremental-link state on the Iceberg-semantics snapshot
    layer (blink_spark.checkpoint.StageWriter) — the KBP loop's persistent
    KB (``scripts/kbp_simulation.py:316-366``) as table commits instead of
    pickle files.

    Per-batch commit shape, sized to the DELTA rather than the table:

    - ``link_features``  — Iceberg fast-APPEND of the new batch's feature
      rows (old feature data is never rewritten or re-scanned);
    - ``link_clusters``  — copy-on-write MERGE keyed on ``file_id`` whose
      source is ONLY the changed assignment rows (new files + files whose
      cluster merged), so just the data dirs holding a reassigned file are
      rewritten.

    ``load()`` after a restart returns the committed state; a crash
    between the two commits is healed on the next commit because the
    cluster MERGE re-ships every assignment that differs from the last
    committed snapshot (feature appends are keyed by batch content and a
    replayed batch re-derives identical rows — same idempotence contract
    as blink_spark.streaming).
    """

    FEATURES = "link_features"
    CLUSTERS = "link_clusters"

    def __init__(self, writer):
        self.writer = writer

    def load(self) -> LinkState | None:
        """The last committed state, or None before the first commit."""
        from blink_spark.checkpoint import SnapshotNotFound

        try:
            return LinkState(
                features=self.writer.read(self.FEATURES),
                clusters=self.writer.read(self.CLUSTERS),
            )
        except SnapshotNotFound:
            return None

    def commit_batch(
        self, prior: LinkState | None, new_features: DataFrame, state: LinkState
    ) -> dict:
        """Commit one linked batch; returns the clusters manifest row."""
        feats = new_features.select(*FEATURE_COLS)
        if self.writer.current_snapshot(self.FEATURES) is None:
            self.writer.publish(self.FEATURES, feats, operation="append")
        else:
            self.writer.append(self.FEATURES, feats)
        if prior is None or self.writer.current_snapshot(self.CLUSTERS) is None:
            return self.writer.publish(self.CLUSTERS, state.clusters)
        changed = state.clusters.join(
            prior.clusters, ["file_id", "cluster_id"], "left_anti"
        )
        return self.writer.merge(self.CLUSTERS, changed, ["file_id"])

    def link_and_commit(self, new_source: DataFrame, **kw) -> LinkState:
        """One resumable KBP step: load → link the raw batch → commit.
        Returns the POST-commit state re-read from the snapshots, so the
        caller's lineage is the committed table, not the in-session DAG."""
        prior = self.load()
        new_feat = batch_features(new_source).persist()
        state = link_features(prior, new_feat, **kw)
        self.commit_batch(prior, new_feat, state)
        return self.load()

    def unlink_and_commit(self, deleted_ids: DataFrame, **kw) -> LinkState:
        """One resumable retraction step: load → :func:`unlink_batch` →
        copy-on-write DELETE of the retracted rows from both tables plus a
        MERGE of the repaired survivor assignments (only data dirs holding
        a touched key are rewritten). The id list rides a SQL IN-condition
        — retraction batches are deltas by nature; a bulk purge should be
        a fresh ``publish`` instead."""
        prior = self.load()
        if prior is None:
            raise ValueError("unlink_and_commit before any committed batch")
        state = unlink_batch(prior, deleted_ids, **kw)
        ids = sorted(
            r.file_id for r in deleted_ids.select("file_id").distinct().collect()
        )
        if ids:
            cond = "file_id IN (" + ", ".join(f"'{i}'" for i in ids) + ")"
            self.writer.delete_where(self.FEATURES, cond)
            self.writer.delete_where(self.CLUSTERS, cond)
        changed = state.clusters.join(
            prior.clusters, ["file_id", "cluster_id"], "left_anti"
        )
        self.writer.merge(self.CLUSTERS, changed, ["file_id"])
        return self.load()
