"""Stage D — transitive clustering via large-star/small-star connected
components (SURVEY.md §2.10 I2, §4 conclusion item 2).

Reference mapping: the KBP simulation groups mention encodings per entity and
incrementally indexes cluster representatives
(``scripts/kbp_simulation.py:227-251,316-366``); mentions whose NIL
probability clears the threshold join an existing entity, the rest found new
ones. In graph terms that is exactly transitive closure over match edges —
here made explicit with the alternating large-star/small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14),
which converges in O(log n) rounds on DataFrame ops alone — no GraphX, no
driver-side adjacency.

Scale notes: each round is two shuffles (groupBy min-neighbor + join);
``localCheckpoint`` truncates lineage each iteration so plans stay flat; the
convergence probe is a count+hash aggregate, not a collect of edges.
Cluster id = min(file_id) in the component (deterministic; FIXTURES.md §6.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetric(e: DataFrame) -> DataFrame:
    return e.select("src", "dst").union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def large_star(e: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(Γ(u) ∪ {u})."""
    sym = _symmetric(e)
    mins = sym.groupBy("src").agg(F.min("dst").alias("mn"))
    mins = mins.withColumn("m", F.least("mn", "src")).select("src", "m")
    return (
        sym.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def small_star(e: DataFrame) -> DataFrame:
    """Connect every smaller neighbor of u — and u itself — to the min."""
    d = (
        e.select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    mins = d.groupBy("src").agg(F.min("dst").alias("m"))
    to_m = d.join(mins, "src").select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    self_m = mins.select(F.col("src"), F.col("m").alias("dst"))
    return (
        to_m.union(self_m).filter(F.col("src") != F.col("dst")).distinct()
    )


def _edge_fingerprint(e: DataFrame) -> tuple[int, str]:
    # sum of bounded per-edge hashes in decimal(38,0): order-insensitive,
    # overflow-free up to ~10^26 edges (ANSI mode rejects raw int64 sums)
    h = F.pmod(F.xxhash64("src", "dst"), F.lit(1 << 40)).cast("decimal(38,0)")
    row = e.agg(
        F.count("*").alias("n"),
        F.coalesce(F.sum(h), F.lit(0)).cast("string").alias("h"),
    ).collect()[0]
    return int(row["n"]), str(row["h"])


def connected_components(
    edges: DataFrame, nodes: DataFrame, max_iter: int = 50
) -> DataFrame:
    """edges(left_id, right_id) + nodes(file_id) → (file_id, cluster_id).

    Nodes absent from any edge become singleton clusters (their own id) —
    the NIL analog: a mention matching nothing founds a new entity
    (``README.md:8-10`` of the reference fork).
    """
    e = (
        edges.select(F.col("left_id").alias("src"), F.col("right_id").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        # truncate the upstream lineage BEFORE iterating: each star round
        # references its input several times (symmetrize + groupBy + join),
        # and without this the full blocking+scoring DAG re-executes per
        # reference on the first round
        .localCheckpoint(eager=True)
    )
    prev = None
    for _ in range(max_iter):
        e = small_star(large_star(e)).localCheckpoint(eager=True)
        fp = _edge_fingerprint(e)
        if fp == prev:
            break
        prev = fp
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")

    # converged graph is a union of stars rooted at the component min
    d = e.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    )
    roots = d.groupBy("src").agg(F.min("dst").alias("cluster_id"))
    return (
        nodes.select(F.col("file_id"))
        .join(roots, nodes["file_id"] == roots["src"], "left")
        .select(
            F.col("file_id"),
            F.coalesce(F.col("cluster_id"), F.col("file_id")).alias("cluster_id"),
        )
    )


def connected_components_via_reps(
    rep_edges: DataFrame, membership: DataFrame, max_iter: int = 50
) -> DataFrame:
    """CC over the exact-duplicate-collapsed graph, then propagate.

    ``rep_edges(left_id, right_id)`` connects representative nodes only
    (candidate pairs are generated over reps, so scored match edges are
    rep-rep by construction); ``membership(file_id, rep_id)`` maps every
    file to its representative. Because rep_id = min(file_id) within a
    sha-duplicate group, the component minimum over reps IS the global
    component minimum, so the propagated ids equal what CC over the full
    graph (match edges ∪ sha star edges) would produce — without the mass
    duplicates ever entering an iteration. At 10^12 files where boilerplate
    repeats millions of times this shrinks the iterated graph by orders of
    magnitude; it is the graph analog of the reference scoring only
    distinct candidates (``blink/main_dense.py:104-173`` builds the
    catalogue deduplicated by id).
    """
    reps = membership.select(F.col("rep_id").alias("file_id")).distinct()
    rep_clusters = connected_components(rep_edges, reps, max_iter=max_iter)
    return (
        membership.join(
            rep_clusters.select(
                F.col("file_id").alias("rep_id"), "cluster_id"
            ),
            "rep_id",
        )
        .select("file_id", "cluster_id")
    )


def sql_connected_components(edges_rel: str, nodes_rel: str) -> str:
    """DuckDB oracle: min-label reachability via recursive CTE.

    ``edges_rel`` must expose (left_id, right_id); ``nodes_rel`` (file_id).
    Exponential path enumeration — test-scale only (that is the point of an
    oracle: independent, simple, obviously correct).
    """
    return f"""
    WITH RECURSIVE sym AS (
        SELECT left_id AS src, right_id AS dst FROM {edges_rel}
        UNION
        SELECT right_id AS src, left_id AS dst FROM {edges_rel}
    ),
    walk(node, lbl) AS (
        SELECT file_id, file_id FROM {nodes_rel}
        UNION
        SELECT s.dst, w.lbl FROM walk w JOIN sym s ON s.src = w.node
    )
    SELECT node AS file_id, min(lbl) AS cluster_id FROM walk GROUP BY node
    """
