"""Similarity search over the ``embeddings`` table: brute-force cosine
top-k (the exact dense-retrieval baseline, ``blink/biencoder/biencoder.py:148-166``
GEMM+topk analog), random-hyperplane LSH bucketing (the sublinear path,
FAISS IVF analog), per-label centroids (§2.5 A4) and medoids (§2.5 A3 /
M4 KMedoids analog — the one ``applyInPandas`` group operator).

Cosines are computed in float64 from the stored float32 vectors in BOTH
engines (identical widening, identical sequential sums), rounded to 6 dp.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from blink_spark.parity import r6 as _r6

TOP_K = 5
QUERY_MOD = 20  # vec_id % QUERY_MOD == 0 rows are the query set
N_PLANES = 16
EMB_DIM = 64

# fixed seeded hyperplanes (embedded as literals in the SQL oracle too)
_rng = np.random.RandomState(7)
PLANES: list[list[float]] = [
    [round(float(x), 6) + 0.0 for x in _rng.randn(EMB_DIM)] for _ in range(N_PLANES)
]

# IVF coarse quantizer (the FAISS IVF `nlist` cells,
# ``elq/index/faiss_indexer.py:71-90``). CENTROIDS are the seeded unit
# INIT for a deterministic sampled spherical-k-means fit
# (``train_ivf_centroids``), mirroring faiss's `train()` on a corpus
# sample before `add()`; every arithmetic step of the fit is
# engine-invariant (per-dim DECIMAL sums, fixed iteration count, 6-dp
# rounding, argmax tie-broken by cell id), so the DuckDB oracle replays
# the identical training and reproduces cell assignment bit-for-bit.
N_CELLS = 16
ANN_NPROBE = 4  # default probe count for emb_ann_topk
NPROBE_GRID = [1, 2, 4, 8, 12, 16]
KMEANS_ITERS = 4  # fixed Lloyd iterations (determinism > convergence test)
TRAIN_MOD = 3  # vec_id % TRAIN_MOD == 1 rows are the training sample
_crng = np.random.RandomState(11)
_cen = _crng.randn(N_CELLS, EMB_DIM)
_cen /= np.linalg.norm(_cen, axis=1, keepdims=True)
CENTROIDS: list[list[float]] = [
    [round(float(x), 6) + 0.0 for x in row] for row in _cen
]




def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def _corpus_and_queries(spark, sf_dir):
    emb = load_embeddings(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    queries = emb.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q")
    )
    return emb, queries


def _exact_topk(emb: DataFrame, queries: DataFrame, k: int = TOP_K) -> DataFrame:
    """Exact cosine top-k pairs (query_id, rank, neighbor_id, cosine) —
    the brute-force GEMM+topk baseline."""
    pairs = emb.crossJoin(F.broadcast(queries)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    cos = _dot(F.col("q"), F.col("v")) / (_norm(F.col("q")) * _norm(F.col("v")))
    pairs = pairs.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def q_emb_knn(spark, sf_dir):
    """Brute-force cosine top-k: query subset × full table, windowed rank.
    At scale the broadcast side is the query batch (small) streaming
    against the partitioned corpus — exactly this plan."""
    emb, queries = _corpus_and_queries(spark, sf_dir)
    return _exact_topk(emb, queries).select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "neighbor_id",
        _r6("cosine", 6).alias("cosine"),
    )


def _cell_ranks(
    df: DataFrame, id_col: str = "vec_id", cents: list[list[float]] | None = None
) -> DataFrame:
    """(id, cell, sim, cell_rank): every IVF cell ranked per vector by
    centroid dot product (centroids are unit, so dot order == cosine
    order). cell_rank=1 is the vector's home cell; ranks 2..P are its
    probe order — the FAISS IVF nprobe schedule
    (``elq/index/faiss_indexer.py:71-90``)."""
    cents = CENTROIDS if cents is None else cents
    sims = F.array(*[
        _dot(F.col("v"), F.array(*[F.lit(p) for p in c])) for c in cents
    ])
    e = df.select(F.col(id_col), F.posexplode(sims).alias("cell", "sim"))
    w = Window.partitionBy(id_col).orderBy(F.desc("sim"), F.asc("cell"))
    return e.withColumn("cell_rank", F.row_number().over(w))


def train_ivf_centroids(emb: DataFrame) -> list[list[float]]:
    """Deterministic sampled spherical k-means for the IVF coarse
    quantizer — the analog of faiss IVF's ``train()``
    (``elq/index/faiss_indexer.py:71-90``), made engine-invariant so the
    DuckDB oracle replays it bit-for-bit:

    - training sample: ``vec_id % TRAIN_MOD == 1`` (a fixed predicate,
      not Spark ``sample()`` — reproducible anywhere);
    - init: the seeded unit CENTROIDS literals;
    - exactly KMEANS_ITERS Lloyd rounds; assignment = argmax centroid
      dot, ties to the lowest cell id;
    - update: per-dimension mean via EXACT DECIMAL sums of the 6-dp
      rounded components (order-independent, so partitioning cannot
      change the result), one double division, 6-dp round, then unit
      normalization (again 6-dp) — empty cells keep their previous
      centroid.

    Scale shape: each round is one narrow shuffle of the O(sample)
    assignment into an nlist-row aggregate; only the nlist × dim centroid
    table (16 × 64 here) ever reaches the driver — the spark.ml KMeans
    contract. The fit is cached per corpus by :func:`trained_centroids`.
    """
    train = emb.filter(F.col("vec_id") % TRAIN_MOD == 1).select("vec_id", "v")
    cents = CENTROIDS
    for _ in range(KMEANS_ITERS):
        assigned = (
            _cell_ranks(train, "vec_id", cents)
            .filter(F.col("cell_rank") == 1)
            .select("vec_id", "cell")
            .join(train, "vec_id")
        )
        sums = assigned.groupBy("cell").agg(
            F.count("*").alias("n"),
            *[
                F.sum(
                    F.round(F.col("v").getItem(d), 6).cast("decimal(28,6)")
                ).alias(f"s{d}")
                for d in range(EMB_DIM)
            ],
        )
        marr = F.array(*[
            F.round(F.col(f"s{d}").cast("double") / F.col("n"), 6)
            for d in range(EMB_DIM)
        ])
        norm = F.sqrt(
            F.aggregate(
                F.transform(marr, lambda x: x * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        unit = F.transform(marr, lambda x: F.round(x / norm, 6) + F.lit(0.0))
        rows = sums.select(
            "cell", F.when(norm > 0, unit).alias("c")
        ).collect()
        new = {r["cell"]: (list(r["c"]) if r["c"] is not None else None) for r in rows}
        cents = [new.get(j) or cents[j] for j in range(N_CELLS)]
    return cents


_TRAINED_CACHE: dict[str, list[list[float]]] = {}


def trained_centroids(spark, sf_dir: str) -> list[list[float]]:
    """Per-corpus cache of the k-means fit (both ANN queries and repeat
    driver calls reuse one training run per session)."""
    if sf_dir not in _TRAINED_CACHE:
        emb = load_embeddings(spark, sf_dir).select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        _TRAINED_CACHE[sf_dir] = train_ivf_centroids(emb)
    return _TRAINED_CACHE[sf_dir]


def q_emb_ann_topk(spark, sf_dir):
    """IVF ANN search — the sublinear path the LSH/IVF buckets exist for:
    coarse-quantize the corpus (one cell per vector), probe the query's
    ANN_NPROBE nearest cells, exact-cosine rerank ONLY the candidates in
    probed cells, windowed top-k. The cell join shuffles on `cell` — the
    IVF partitioning itself — so at 100 TB each executor reranks only its
    cells' residents (~nprobe/nlist of the corpus per query), never the
    full table. Cells come from the deterministic sampled k-means fit
    (``train_ivf_centroids``) — the trained-quantizer regime, as faiss
    trains before add()."""
    emb, queries = _corpus_and_queries(spark, sf_dir)
    cents = trained_centroids(spark, sf_dir)
    cells = (
        _cell_ranks(emb, cents=cents)
        .filter(F.col("cell_rank") == 1)
        .select("vec_id", "cell")
    ).join(emb, "vec_id")
    probes = (
        _cell_ranks(
            queries.select(F.col("query_id"), F.col("q").alias("v")),
            "query_id",
            cents=cents,
        )
        .filter(F.col("cell_rank") <= ANN_NPROBE)
        .select("query_id", "cell")
    ).join(queries, "query_id")
    cand = probes.join(cells, "cell").filter(F.col("vec_id") != F.col("query_id"))
    cos = _dot(F.col("q"), F.col("v")) / (_norm(F.col("q")) * _norm(F.col("v")))
    cand = cand.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
            _r6("cosine", 6).alias("cosine"),
        )
    )


def q_emb_ann_recall(spark, sf_dir):
    """Recall-vs-nprobe sweep of the IVF search against the exact baseline
    (the recall@k tuning curve of ``blink/main_dense.py:536-553``, applied
    to the ANN index). Single pass: an exact-top-k neighbor is retrieved at
    probe depth P iff its home cell ranks ≤ P for the query (once present,
    it always survives the exact rerank — anything above it in the
    candidate order is also above it in the exact order). Returns one row
    per nprobe: (nprobe, recall, scan_frac). Cells come from the
    deterministic sampled k-means fit (``train_ivf_centroids``)."""
    emb, queries = _corpus_and_queries(spark, sf_dir)
    return ann_recall(spark, emb, queries, cents=trained_centroids(spark, sf_dir))


def ann_recall(
    spark,
    emb: DataFrame,
    queries: DataFrame,
    cents: list[list[float]] | None = None,
) -> DataFrame:
    """Frame-parametrized IVF recall sweep (see q_emb_ann_recall); lets
    tests run the same measurement on a clustered corpus fixture, with
    either the seeded-literal or a trained quantizer."""
    cells = (
        _cell_ranks(emb, cents=cents)
        .filter(F.col("cell_rank") == 1)
        .select("vec_id", "cell")
    )
    qranks = _cell_ranks(
        queries.select(F.col("query_id"), F.col("q").alias("v")),
        "query_id",
        cents=cents,
    ).select("query_id", "cell", "cell_rank")

    exact = _exact_topk(emb, queries).select("query_id", "neighbor_id")
    pair_rank = exact.join(
        cells.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id"
    ).join(qranks, ["query_id", "cell"])

    grid = spark.createDataFrame([(p,) for p in NPROBE_GRID], "nprobe int")
    recall = (
        pair_rank.crossJoin(F.broadcast(grid))
        .groupBy("nprobe")
        .agg(
            F.avg(
                F.when(F.col("cell_rank") <= F.col("nprobe"), 1.0).otherwise(0.0)
            ).alias("recall")
        )
    )

    sizes = cells.groupBy("cell").agg(F.count("*").alias("n"))
    total = emb.agg(F.count("*").alias("n_total"))
    per_q = (
        qranks.join(sizes, "cell")
        .crossJoin(F.broadcast(grid))
        .filter(F.col("cell_rank") <= F.col("nprobe"))
        .groupBy("nprobe", "query_id")
        .agg(F.sum("n").alias("scanned"))
    )
    scan = (
        per_q.groupBy("nprobe")
        .agg(F.avg("scanned").alias("avg_scanned"))
        .crossJoin(total)
        .select("nprobe", (F.col("avg_scanned") / F.col("n_total")).alias("scan_frac"))
    )
    return recall.join(scan, "nprobe").select(
        F.col("nprobe").cast("long").alias("nprobe"),
        _r6("recall", 6).alias("recall"),
        _r6("scan_frac", 6).alias("scan_frac"),
    )


def _bucket_expr(vcol) -> F.Column:
    """16 hyperplane sign bits → bucket id (bit j set iff v·plane_j > 0)."""
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(PLANES):
        d = _dot(vcol, F.array(*[F.lit(p) for p in plane]))
        bucket = bucket + F.when(d > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


# banded hyperplane LSH: the 16-bit signature split into N_BANDS bands of
# BAND_BITS bits — candidate iff ANY band matches (the minhash-LSH banding
# trick applied to cosine sketches; ``blink/indexer/faiss_indexer.py:71-141``
# HNSW-analog retrieval path, re-expressed as a key-equality join Spark can
# shuffle on).
N_BANDS = 4
BAND_BITS = 4
_BAND_MASK = (1 << BAND_BITS) - 1


def _band_keys(df: DataFrame, id_col: str) -> DataFrame:
    """(id, band_id, band_val) — one row per band of the vector's bucket."""
    bucket = _bucket_expr(F.col("v"))
    bands = F.array(*[
        F.shiftright(bucket, BAND_BITS * j).bitwiseAND(F.lit(_BAND_MASK))
        for j in range(N_BANDS)
    ])
    return df.select(F.col(id_col), F.posexplode(bands).alias("band_id", "band_val"))


def q_emb_lsh_buckets(spark, sf_dir):
    """Random-hyperplane LSH: 16 sign bits → bucket id (+ per-bucket size).
    The banded join over these signatures (emb_lsh_topk) is the retrieval
    path; bucket population is the skew census for it."""
    emb = load_embeddings(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    df = emb.select("vec_id", _bucket_expr(F.col("v")).alias("bucket"))
    sizes = df.groupBy("bucket").agg(F.count("*").cast("long").alias("bucket_n"))
    return df.join(sizes, "bucket").select("vec_id", "bucket", "bucket_n")


def q_emb_lsh_topk(spark, sf_dir):
    """Hyperplane-LSH retrieval: band-key equality join → distinct
    candidate pairs → exact-cosine rerank → top-k. The join shuffles on
    (band_id, band_val) — at 100 TB each executor owns a slice of the
    band space and never sees the full corpus; reranking touches only
    banded collisions. Queries with no collision simply return fewer
    rows (the honest LSH failure mode; emb_lsh_recall quantifies it)."""
    emb, queries = _corpus_and_queries(spark, sf_dir)
    return lsh_topk(emb, queries)


def lsh_topk(emb: DataFrame, queries: DataFrame) -> DataFrame:
    cand = (
        _band_keys(queries.select("query_id", F.col("q").alias("v")), "query_id")
        .join(_band_keys(emb, "vec_id"), ["band_id", "band_val"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    cos = _dot(F.col("q"), F.col("v")) / (_norm(F.col("q")) * _norm(F.col("v")))
    scored = (
        cand.join(emb, "vec_id")
        .join(queries, "query_id")
        .select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
            _r6("cosine", 6).alias("cosine"),
        )
    )


NND_ITERS = 2  # fixed NN-Descent refinement rounds (determinism first)


def _rank_keep_topk(cand: DataFrame, emb: DataFrame, k: int = TOP_K) -> DataFrame:
    """(src, dst) candidate edges → exact-cosine top-k per src:
    (src, dst, cosine, rank). One shuffle on src for the window; the two
    vector fetches are src/dst equi-joins (AQE picks broadcast vs
    shuffle by size)."""
    le = emb.select(F.col("vec_id").alias("src"), F.col("v").alias("_sv"))
    re_ = emb.select(F.col("vec_id").alias("dst"), F.col("v").alias("_dv"))
    cos = _dot(F.col("_sv"), F.col("_dv")) / (
        _norm(F.col("_sv")) * _norm(F.col("_dv"))
    )
    scored = (
        cand.join(le, "src").join(re_, "dst")
        .select("src", "dst", cos.alias("cosine"))
    )
    w = Window.partitionBy("src").orderBy(F.desc("cosine"), F.asc("dst"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def knn_graph(emb: DataFrame, k: int = TOP_K, iters: int = NND_ITERS) -> DataFrame:
    """Approximate K-nearest-neighbor GRAPH over the whole corpus by
    NN-Descent (Dong, Moses & Li, WWW'11) — the graph-based ANN family
    (SURVEY J3's HNSW role) expressed as Spark joins:

    - init: directed edges between vectors sharing any LSH band
      (hyperplane sign bands — the same sublinear collision structure the
      retrieval path uses), exact-cosine top-k kept per node;
    - each refinement round: candidates(u) = the symmetrized neighbor set
      B = fwd ∪ rev, plus its two-hop composition B∘B ("a neighbor of my
      neighbor is likely my neighbor" — the NN-Descent principle), then
      exact-cosine top-k again.

    Scale shape: every round is two equi-joins + one window shuffle over
    O(N·k²) candidate rows — never all-pairs; exactly the local-join
    sparsity that makes NN-Descent the standard distributed KNN-graph
    constructor. The iteration count is FIXED (not convergence-tested) so
    the computation is deterministic and the DuckDB oracle can replay it
    as unrolled CTEs."""
    bands = _band_keys(emb, "vec_id")
    a, b = bands.alias("a"), bands.alias("b")
    init = (
        a.join(b, ["band_id", "band_val"])
        .filter(F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("src"), F.col("b.vec_id").alias("dst")
        )
        .distinct()
    )
    g = _rank_keep_topk(init, emb, k).select("src", "dst")
    for _ in range(iters):
        fwd = g.select("src", "dst")
        rev = g.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        bi = fwd.unionByName(rev).distinct()
        x, y = bi.alias("x"), bi.alias("y")
        two_hop = (
            x.join(y, F.col("x.dst") == F.col("y.src"))
            .filter(F.col("x.src") != F.col("y.dst"))
            .select(F.col("x.src").alias("src"), F.col("y.dst").alias("dst"))
        )
        cand = bi.unionByName(two_hop).distinct()
        g = _rank_keep_topk(cand, emb, k).select("src", "dst")
    return g


def q_emb_knn_graph(spark, sf_dir):
    """NN-Descent approximate KNN graph (see :func:`knn_graph`), emitted
    with the exact cosine and rank per kept edge."""
    emb = load_embeddings(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    g = knn_graph(emb)
    out = _rank_keep_topk(g, emb)  # recompute cosine/rank for the output
    return out.select(
        F.col("src").alias("vec_id"),
        F.col("rank").cast("long").alias("rank"),
        F.col("dst").alias("neighbor_id"),
        _r6("cosine", 6).alias("cosine"),
    )


def q_emb_knn_graph_recall(spark, sf_dir):
    """Recall of the NN-Descent graph against the exact top-k baseline,
    measured on the query sample (the corpus-scale discipline: the exact
    all-pairs baseline is the diagnostic's cost, so it runs on a sample,
    never the full corpus). One row: (k, n_nodes, recall)."""
    emb, queries = _corpus_and_queries(spark, sf_dir)
    g = knn_graph(emb).withColumn("_h", F.lit(1))
    exact = _exact_topk(emb, queries).select(
        F.col("query_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    return exact.join(g, ["src", "dst"], "left").agg(
        F.lit(TOP_K).cast("long").alias("k"),
        F.countDistinct("src").cast("long").alias("n_nodes"),
        _r6(F.avg(F.coalesce(F.col("_h"), F.lit(0)).cast("double")), 6).alias(
            "recall"
        ),
    )


def q_emb_lsh_recall(spark, sf_dir):
    """Recall + scan fraction of the banded-LSH retrieval vs the exact
    top-k baseline (one row): an exact neighbor is retrieved iff any of
    its bands collides with the query's (once a candidate, it survives
    the exact rerank for the same reason as the IVF curve)."""
    emb, queries = _corpus_and_queries(spark, sf_dir)
    return lsh_recall(spark, emb, queries)


def lsh_recall(spark, emb: DataFrame, queries: DataFrame) -> DataFrame:
    qk = _band_keys(queries.select("query_id", F.col("q").alias("v")), "query_id")
    ck = _band_keys(emb, "vec_id")

    exact = _exact_topk(emb, queries).select("query_id", "neighbor_id")
    hits = (
        exact.join(
            qk.join(
                ck.withColumnRenamed("vec_id", "neighbor_id"),
                ["band_id", "band_val"],
            ).select("query_id", "neighbor_id").distinct(),
            ["query_id", "neighbor_id"],
            "left_semi",
        )
    )
    n_exact = exact.count()
    n_hit = hits.count()

    scanned = (
        qk.join(ck, ["band_id", "band_val"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .distinct()
        .groupBy("query_id")
        .agg(F.count("*").alias("scanned"))
    )
    n_total = emb.count()
    n_queries = queries.count()
    total_scanned = scanned.agg(F.sum("scanned")).collect()[0][0] or 0
    # round via Spark SQL (HALF_UP, matching DuckDB), not python round
    return spark.createDataFrame(
        [(N_BANDS, BAND_BITS, n_hit / n_exact, total_scanned / (n_queries * n_total))],
        "n_bands long, band_bits long, recall double, scan_frac double",
    ).select(
        "n_bands",
        "band_bits",
        _r6("recall", 6).alias("recall"),
        _r6("scan_frac", 6).alias("scan_frac"),
    )


def q_emb_label_centroids(spark, sf_dir):
    """Per-label mean vector, exploded to (label, pos, mean) — groupBy+avg
    after posexplode, all map-side combinable."""
    emb = load_embeddings(spark, sf_dir)
    return (
        emb.select(
            "label",
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "pos", "x"
            ),
        )
        .groupBy("label", "pos")
        .agg(_r6(F.avg("x"), 6).alias("mean"))
        .select(
            F.col("label").cast("long").alias("label"),
            F.col("pos").cast("long").alias("pos"),
            "mean",
        )
    )


def _medoid_group(pdf: pd.DataFrame) -> pd.DataFrame:
    m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    # pairwise squared euclidean distances via the gram matrix
    sq = (m * m).sum(axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (m @ m.T)
    np.maximum(d2, 0.0, out=d2)
    cost = np.sqrt(d2).sum(axis=1)
    best = cost.min()
    ids = pdf["vec_id"].to_numpy()
    cand = ids[np.isclose(cost, best, rtol=0, atol=1e-9)]
    return pd.DataFrame(
        {"label": [int(pdf["label"].iloc[0])], "medoid_vec_id": [int(cand.min())]}
    )


def q_emb_label_medoid(spark, sf_dir):
    """Per-label medoid (row minimizing summed euclidean distance) via
    applyInPandas — the KMedoids(n_clusters=1) analog
    (``scripts/kbp_simulation.py:45-46``); ties broken by min vec_id."""
    emb = load_embeddings(spark, sf_dir).select("label", "vec_id", "embedding")
    out = emb.groupBy("label").applyInPandas(
        _medoid_group, "label long, medoid_vec_id long"
    )
    return out


# ---------------------------------------------------------------------------
# Oracle SQL over the pre-registered `embeddings` view
# ---------------------------------------------------------------------------

def oracle_sqls() -> dict[str, str]:
    sql = {}
    sql["emb_knn"] = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % {QUERY_MOD} = 0),
p AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
    list_dot_product(q.qv, e.v)
      / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v)))
      AS cosine
  FROM q JOIN e ON e.vec_id <> q.query_id
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
  ) AS rank FROM p
)
SELECT query_id, rank, neighbor_id, (round(cosine, 6) + 0.0) AS cosine
FROM r WHERE rank <= {TOP_K}"""

    plane_terms = []
    for j, plane in enumerate(PLANES):
        arr = ", ".join(repr(x) for x in plane)
        plane_terms.append(
            f"(CASE WHEN list_dot_product(v, [{arr}]) > 0 THEN {1 << j} ELSE 0 END)"
        )
    bucket = " + ".join(plane_terms)
    sql["emb_lsh_buckets"] = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
b AS (SELECT vec_id, ({bucket}) AS bucket FROM e),
s AS (SELECT bucket, count(*) AS bucket_n FROM b GROUP BY bucket)
SELECT b.vec_id, b.bucket, s.bucket_n FROM b JOIN s USING (bucket)"""

    cen_rows = ",\n  ".join(
        f"({i}, [{', '.join(repr(x) for x in c)}])" for i, c in enumerate(CENTROIDS)
    )
    # replay of train_ivf_centroids, arithmetic-step-for-step: fixed
    # sample predicate, KMEANS_ITERS unrolled Lloyd rounds, per-dim exact
    # DECIMAL sums of the 6-dp-rounded components, one double division,
    # 6-dp round, unit-normalize at 6 dp; empty/degenerate cells carry the
    # previous round's centroid forward (LEFT JOIN + COALESCE).
    sum_cols = ", ".join(
        f"sum(CAST(round(v[{d + 1}], 6) AS DECIMAL(28,6))) AS s{d}"
        for d in range(EMB_DIM)
    )
    mean_arr = ", ".join(
        f"round(CAST(s{d} AS DOUBLE) / n, 6)" for d in range(EMB_DIM)
    )
    km_parts = [
        f"cen0(cell, c) AS (VALUES {cen_rows})",
        f"train AS (SELECT vec_id, v FROM e WHERE vec_id % {TRAIN_MOD} = 1)",
    ]
    prev = "cen0"
    for i in range(1, KMEANS_ITERS + 1):
        km_parts.append(
            f"""a{i} AS (
  SELECT vec_id, v, cell FROM (
    SELECT t.vec_id, t.v, c.cell, row_number() OVER (
      PARTITION BY t.vec_id ORDER BY list_dot_product(t.v, c.c) DESC, c.cell ASC
    ) AS rk FROM train t CROSS JOIN {prev} c
  ) WHERE rk = 1
)"""
        )
        km_parts.append(
            f"s{i} AS (SELECT cell, count(*) AS n, {sum_cols} FROM a{i} GROUP BY cell)"
        )
        km_parts.append(f"m{i} AS (SELECT cell, [{mean_arr}] AS m FROM s{i})")
        km_parts.append(
            f"""u{i} AS (
  SELECT cell,
    list_transform(m, x -> round(x / sqrt(list_dot_product(m, m)), 6) + 0.0) AS c
  FROM m{i} WHERE sqrt(list_dot_product(m, m)) > 0
)"""
        )
        km_parts.append(
            f"cen{i} AS (SELECT p.cell, COALESCE(u.c, p.c) AS c "
            f"FROM {prev} p LEFT JOIN u{i} u USING (cell))"
        )
        prev = f"cen{i}"
    kmeans_chain = ",\n".join(km_parts)
    ivf_cte = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
{kmeans_chain},
cen AS (SELECT cell, c FROM {prev}),
sims AS (
  SELECT e.vec_id, cen.cell, list_dot_product(e.v, cen.c) AS sim
  FROM e CROSS JOIN cen
),
ranks AS (
  SELECT vec_id, cell, row_number() OVER (
    PARTITION BY vec_id ORDER BY sim DESC, cell ASC
  ) AS cell_rank FROM sims
),
cells AS (SELECT vec_id, cell FROM ranks WHERE cell_rank = 1),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % {QUERY_MOD} = 0),
qranks AS (
  SELECT vec_id AS query_id, cell, cell_rank FROM ranks
  WHERE vec_id % {QUERY_MOD} = 0
)"""

    sql["emb_ann_topk"] = ivf_cte + f""",
probes AS (SELECT query_id, cell FROM qranks WHERE cell_rank <= {ANN_NPROBE}),
cand AS (
  SELECT p.query_id, c.vec_id AS neighbor_id
  FROM probes p JOIN cells c USING (cell)
  WHERE c.vec_id <> p.query_id
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
    list_dot_product(q.qv, e.v)
      / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v)))
      AS cosine
  FROM cand JOIN q USING (query_id) JOIN e ON e.vec_id = cand.neighbor_id
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
  ) AS rank FROM scored
)
SELECT query_id, rank, neighbor_id, (round(cosine, 6) + 0.0) AS cosine
FROM r WHERE rank <= {TOP_K}"""

    grid_rows = ", ".join(f"({p})" for p in NPROBE_GRID)
    sql["emb_ann_recall"] = ivf_cte + f""",
p0 AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
    list_dot_product(q.qv, e.v)
      / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v)))
      AS cosine
  FROM q JOIN e ON e.vec_id <> q.query_id
),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
    ) AS rank FROM p0
  ) WHERE rank <= {TOP_K}
),
pair_rank AS (
  SELECT x.query_id, qr.cell_rank
  FROM exact x
  JOIN cells c ON c.vec_id = x.neighbor_id
  JOIN qranks qr ON qr.query_id = x.query_id AND qr.cell = c.cell
),
grid(nprobe) AS (VALUES {grid_rows}),
rec AS (
  SELECT g.nprobe,
    avg(CASE WHEN pr.cell_rank <= g.nprobe THEN 1.0 ELSE 0.0 END) AS recall
  FROM pair_rank pr CROSS JOIN grid g GROUP BY g.nprobe
),
sizes AS (SELECT cell, count(*) AS n FROM cells GROUP BY cell),
per_q AS (
  SELECT g.nprobe, qr.query_id, sum(s.n) AS scanned
  FROM qranks qr JOIN sizes s USING (cell) CROSS JOIN grid g
  WHERE qr.cell_rank <= g.nprobe
  GROUP BY g.nprobe, qr.query_id
),
scanf AS (
  SELECT nprobe, avg(scanned) / (SELECT count(*) FROM e) AS scan_frac
  FROM per_q GROUP BY nprobe
)
SELECT CAST(r.nprobe AS BIGINT) AS nprobe,
       (round(r.recall, 6) + 0.0) AS recall,
       (round(scanf.scan_frac, 6) + 0.0) AS scan_frac
FROM rec r JOIN scanf USING (nprobe)"""

    lsh_cte = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
b AS (SELECT vec_id, ({bucket}) AS bucket FROM e),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % {QUERY_MOD} = 0),
ck AS (
  SELECT vec_id, j, (bucket >> (4*j)) & 15 AS bv
  FROM b, range(0, {N_BANDS}) t(j)
),
qk AS (
  SELECT vec_id AS query_id, j, bv FROM ck WHERE vec_id % {QUERY_MOD} = 0
),
cand AS (
  SELECT DISTINCT qk.query_id, ck.vec_id AS neighbor_id
  FROM qk JOIN ck ON qk.j = ck.j AND qk.bv = ck.bv
  WHERE ck.vec_id <> qk.query_id
)"""

    sql["emb_lsh_topk"] = lsh_cte + f""",
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
    list_dot_product(q.qv, e.v)
      / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v)))
      AS cosine
  FROM cand JOIN q USING (query_id) JOIN e ON e.vec_id = cand.neighbor_id
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
  ) AS rank FROM scored
)
SELECT query_id, rank, neighbor_id, (round(cosine, 6) + 0.0) AS cosine
FROM r WHERE rank <= {TOP_K}"""

    sql["emb_lsh_recall"] = lsh_cte + f""",
p0 AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
    list_dot_product(q.qv, e.v)
      / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v)))
      AS cosine
  FROM q JOIN e ON e.vec_id <> q.query_id
),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
    ) AS rank FROM p0
  ) WHERE rank <= {TOP_K}
),
hit AS (SELECT * FROM exact SEMI JOIN cand USING (query_id, neighbor_id))
SELECT {N_BANDS}::BIGINT AS n_bands, {BAND_BITS}::BIGINT AS band_bits,
  round((SELECT count(*) FROM hit)::DOUBLE
        / (SELECT count(*) FROM exact), 6) + 0.0 AS recall,
  round((SELECT count(*) FROM cand)::DOUBLE
        / ((SELECT count(*) FROM q) * (SELECT count(*) FROM e)), 6) + 0.0
    AS scan_frac"""

    # NN-Descent KNN graph: the fixed-iteration refinement unrolled as
    # CTE layers — init from the SAME band collisions lsh_cte exposes,
    # then per round: symmetrize, compose two-hop, exact-cosine top-k.
    def _nnd_keep(src_cte: str, out: str, with_cols: bool = False) -> str:
        cos = (
            "list_dot_product(es.v, ed.v) / (sqrt(list_dot_product(es.v, es.v))"
            " * sqrt(list_dot_product(ed.v, ed.v)))"
        )
        cols = "src, dst, cosine, rk" if with_cols else "src, dst"
        return f"""{out} AS (
  SELECT {cols} FROM (
    SELECT t.src, t.dst, {cos} AS cosine,
      row_number() OVER (
        PARTITION BY t.src ORDER BY {cos} DESC, t.dst ASC
      ) AS rk
    FROM {src_cte} t
    JOIN e es ON es.vec_id = t.src
    JOIN e ed ON ed.vec_id = t.dst
  ) WHERE rk <= {TOP_K}
)"""

    nnd_parts = [
        """init_cand AS (
  SELECT DISTINCT a.vec_id AS src, c.vec_id AS dst
  FROM ck a JOIN ck c ON a.j = c.j AND a.bv = c.bv
  WHERE a.vec_id <> c.vec_id
)""",
        _nnd_keep("init_cand", "g0"),
    ]
    prev_g = "g0"
    for i in range(1, NND_ITERS + 1):
        nnd_parts.append(
            f"""bi{i} AS (
  SELECT src, dst FROM {prev_g}
  UNION
  SELECT dst, src FROM {prev_g}
)"""
        )
        nnd_parts.append(
            f"""cand{i} AS (
  SELECT src, dst FROM bi{i}
  UNION
  SELECT x.src, y.dst FROM bi{i} x JOIN bi{i} y ON x.dst = y.src
  WHERE x.src <> y.dst
)"""
        )
        nnd_parts.append(_nnd_keep(f"cand{i}", f"g{i}"))
        prev_g = f"g{i}"
    nnd_chain = ",\n".join(nnd_parts)

    sql["emb_knn_graph"] = lsh_cte + f""",
{nnd_chain},
{_nnd_keep(prev_g, "final", with_cols=True)}
SELECT src AS vec_id, CAST(rk AS BIGINT) AS rank, dst AS neighbor_id,
       (round(cosine, 6) + 0.0) AS cosine
FROM final"""

    sql["emb_knn_graph_recall"] = lsh_cte + f""",
{nnd_chain},
p0n AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
    list_dot_product(q.qv, e.v)
      / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v)))
      AS cosine
  FROM q JOIN e ON e.vec_id <> q.query_id
),
exactn AS (
  SELECT query_id, neighbor_id FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
    ) AS rank FROM p0n
  ) WHERE rank <= {TOP_K}
)
SELECT {TOP_K}::BIGINT AS k,
  count(DISTINCT x.query_id)::BIGINT AS n_nodes,
  round(avg(CASE WHEN g.src IS NOT NULL THEN 1.0 ELSE 0.0 END), 6) + 0.0
    AS recall
FROM exactn x LEFT JOIN {prev_g} g
  ON g.src = x.query_id AND g.dst = x.neighbor_id"""

    sql["emb_label_centroids"] = """
SELECT CAST(label AS BIGINT) AS label, CAST(i - 1 AS BIGINT) AS pos,
       (round(avg(CAST(embedding[i] AS DOUBLE)), 6) + 0.0) AS mean
FROM embeddings, range(1, 65) t(i)
GROUP BY label, i"""

    sql["emb_label_medoid"] = """
WITH e AS (SELECT label, vec_id, embedding::DOUBLE[] AS v FROM embeddings),
costs AS (
  SELECT a.label, a.vec_id,
    sum(sqrt(greatest(
      list_dot_product(a.v, a.v) + list_dot_product(b.v, b.v)
        - 2.0 * list_dot_product(a.v, b.v), 0.0))) AS cost
  FROM e a JOIN e b USING (label)
  GROUP BY a.label, a.vec_id
),
best AS (SELECT label, min(cost) AS mc FROM costs GROUP BY label)
SELECT CAST(c.label AS BIGINT) AS label,
       CAST(min(c.vec_id) AS BIGINT) AS medoid_vec_id
FROM costs c JOIN best b ON c.label = b.label AND abs(c.cost - b.mc) <= 1e-9
GROUP BY c.label"""

    # int8 scalar quantization: identical floor(x*127/m + 0.5) formula as
    # the Spark side; quantized dot products are exact integers in double,
    # so the comparison is bit-for-bit, not merely within-rounding.
    _qn = f"""
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
s AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS m FROM e),
qn AS (
  SELECT vec_id,
    CASE WHEN m = 0 THEN list_transform(v, x -> 0.0)
         ELSE list_transform(v, x -> floor(x * 127.0 / m + 0.5)) END AS qv
  FROM s
),
q AS (SELECT vec_id AS query_id, qv AS qq FROM qn WHERE vec_id % {QUERY_MOD} = 0),
p AS (
  SELECT q.query_id, e2.vec_id AS neighbor_id,
    CASE WHEN sqrt(list_dot_product(q.qq, q.qq))
              * sqrt(list_dot_product(e2.qv, e2.qv)) = 0 THEN 0.0
         ELSE list_dot_product(q.qq, e2.qv)
              / (sqrt(list_dot_product(q.qq, q.qq))
                 * sqrt(list_dot_product(e2.qv, e2.qv))) END AS qcosine
  FROM q JOIN qn e2 ON e2.vec_id <> q.query_id
),
r AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY qcosine DESC, neighbor_id ASC
  ) AS rank FROM p
)"""
    sql["emb_int8_topk"] = f"""
WITH {_qn}
SELECT query_id, rank, neighbor_id, (round(qcosine, 6) + 0.0) AS qcosine
FROM r WHERE rank <= {TOP_K}"""

    sql["emb_int8_recall"] = f"""
WITH {_qn},
quant AS (SELECT query_id, neighbor_id FROM r WHERE rank <= {TOP_K}),
fq AS (SELECT vec_id AS query_id, v FROM e WHERE vec_id % {QUERY_MOD} = 0),
ex_p AS (
  SELECT fq.query_id, e2.vec_id AS neighbor_id,
    list_dot_product(fq.v, e2.v)
      / (sqrt(list_dot_product(fq.v, fq.v))
         * sqrt(list_dot_product(e2.v, e2.v))) AS cosine
  FROM fq JOIN e e2 ON e2.vec_id <> fq.query_id
),
ex_r AS (
  SELECT query_id, neighbor_id, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
  ) AS rank FROM ex_p
),
exact AS (SELECT query_id, neighbor_id FROM ex_r WHERE rank <= {TOP_K}),
m AS (
  SELECT count(*) AS n_matched FROM exact SEMI JOIN quant
    ON exact.query_id = quant.query_id
    AND exact.neighbor_id = quant.neighbor_id
),
n AS (SELECT count(*) AS n_exact_pairs FROM exact)
SELECT {TOP_K} AS k,
  n.n_exact_pairs,
  m.n_matched,
  round(m.n_matched::DOUBLE / n.n_exact_pairs, 6) + 0.0 AS recall
FROM m, n"""
    sql["emb_label_separability"] = """
WITH e AS (SELECT CAST(label AS BIGINT) AS label, vec_id,
                  embedding::DOUBLE[] AS v FROM embeddings),
intra AS (
  SELECT a.label, avg(
    list_dot_product(a.v, b.v)
      / (sqrt(list_dot_product(a.v, a.v))
         * sqrt(list_dot_product(b.v, b.v)))) AS m
  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
  GROUP BY 1),
cenp AS (SELECT label, i, avg(CAST(v[i] AS DOUBLE)) AS m
         FROM e, range(1, 65) t(i) GROUP BY 1, 2),
cen AS (SELECT label, list(m ORDER BY i) AS c FROM cenp GROUP BY 1),
inter AS (
  SELECT c1.label, avg(
    list_dot_product(c1.c, c2.c)
      / (sqrt(list_dot_product(c1.c, c1.c))
         * sqrt(list_dot_product(c2.c, c2.c)))) AS m
  FROM cen c1 JOIN cen c2 ON c1.label <> c2.label GROUP BY 1),
sizes AS (SELECT label, count(*) AS n FROM e GROUP BY 1)
SELECT s.label, s.n::BIGINT AS n_vecs,
       round(i.m, 6) + 0.0 AS intra_mean_cos,
       round(t.m, 6) + 0.0 AS inter_centroid_cos,
       round(i.m - t.m, 6) + 0.0 AS margin
FROM sizes s JOIN intra i ON i.label = s.label
     JOIN inter t ON t.label = s.label"""
    d_parts, d_rows = [], []
    for d in TRUNC_DIMS:
        dot = f"list_dot_product(q.qv[1:{d}], e.v[1:{d}])"
        nq = f"sqrt(list_dot_product(q.qv[1:{d}], q.qv[1:{d}]))"
        nv = f"sqrt(list_dot_product(e.v[1:{d}], e.v[1:{d}]))"
        d_parts.append(f""",
p_{d} AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         {dot} / ({nq} * {nv}) AS cosine
  FROM q JOIN e ON e.vec_id <> q.query_id
),
r_{d} AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
  ) AS rank FROM p_{d}
),
m_{d} AS (
  SELECT {d} AS dims, {TOP_K} AS k,
         (SELECT count(*) FROM ex) AS n_exact_pairs,
         count(*) AS n_matched
  FROM r_{d} t
  JOIN ex ON t.query_id = ex.query_id AND t.neighbor_id = ex.neighbor_id
  WHERE t.rank <= {TOP_K}
)""")
        d_rows.append(f"SELECT * FROM m_{d}")
    sql["emb_dim_truncation"] = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % {QUERY_MOD} = 0),
exp_ AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
    list_dot_product(q.qv, e.v)
      / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v)))
      AS cosine
  FROM q JOIN e ON e.vec_id <> q.query_id
),
exr AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
  ) AS rank FROM exp_
),
ex AS (SELECT query_id, neighbor_id FROM exr WHERE rank <= {TOP_K})
{"".join(d_parts)}
SELECT dims::BIGINT AS dims, k::BIGINT AS k,
       n_exact_pairs::BIGINT AS n_exact_pairs, n_matched::BIGINT AS n_matched,
       round(n_matched / CAST(n_exact_pairs AS DOUBLE), 6) + 0.0 AS recall
FROM ({" UNION ALL ".join(d_rows)})"""

    return sql


def _int8_quantized(df: DataFrame, vec_col: str = "v") -> DataFrame:
    """Per-vector symmetric int8 scalar quantization (the FAISS
    ``SQ8``/``ScalarQuantizer`` serving trick, ``blink/indexer/
    faiss_indexer.py:71-141`` index-size analog): q_i = round(v_i * 127 /
    max|v|), stored 4× smaller than float32. Rounding is ``floor(x+0.5)``
    — identical half-up semantics in Spark and DuckDB, so the oracle is
    bit-exact; the quantized values are small integers, so every dot
    product downstream is EXACT in double regardless of summation order.
    Zero vectors quantize to zeros (guard on max|v| = 0)."""
    m = F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x)))
    df = df.withColumn("_m", m)
    qv = F.transform(
        F.col(vec_col),
        lambda x: F.when(F.col("_m") == 0, F.lit(0.0)).otherwise(
            F.floor(x * F.lit(127.0) / F.col("_m") + F.lit(0.5)).cast("double")
        ),
    )
    return df.withColumn("qv", qv).drop("_m", vec_col)


def _int8_topk(emb: DataFrame, queries: DataFrame, k: int = TOP_K) -> DataFrame:
    """Brute-force top-k over the QUANTIZED vectors — same plan as
    :func:`_exact_topk` (broadcast query batch × partitioned corpus), but
    every distance is computed on the 4×-compressed representation: the
    memory-bandwidth-bound scan a 100 TB serving tier actually runs."""
    qe = _int8_quantized(emb)
    qq = _int8_quantized(
        queries.select("query_id", F.col("q").alias("v"))
    ).withColumnRenamed("qv", "qq")
    pairs = qe.crossJoin(F.broadcast(qq)).filter(
        F.col("vec_id") != F.col("query_id")
    )
    denom = _norm(F.col("qq")) * _norm(F.col("qv"))
    cos = F.when(denom == 0, F.lit(0.0)).otherwise(
        _dot(F.col("qq"), F.col("qv")) / denom
    )
    pairs = pairs.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("qcosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("qcosine"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def q_emb_int8_topk(spark, sf_dir):
    """Top-k cosine retrieval over int8-quantized vectors (4× compression
    serving path). Output mirrors ``emb_knn`` with the quantized score."""
    emb, queries = _corpus_and_queries(spark, sf_dir)
    return _int8_topk(emb, queries).select(
        "query_id",
        F.col("rank").cast("long").alias("rank"),
        "neighbor_id",
        _r6("qcosine", 6).alias("qcosine"),
    )


def q_emb_int8_recall(spark, sf_dir):
    """Recall@k of the int8-quantized scan against the exact float
    baseline — the compression/recall trade-off row a serving tier needs
    before swapping float32 scans for SQ8. One output row:
    (k, n_exact_pairs, n_matched, recall)."""
    emb, queries = _corpus_and_queries(spark, sf_dir)
    exact = _exact_topk(emb, queries).select("query_id", "neighbor_id")
    quant = _int8_topk(emb, queries).select("query_id", "neighbor_id")
    matched = exact.join(quant, ["query_id", "neighbor_id"], "left_semi")
    return (
        matched.agg(F.count("*").alias("n_matched"))
        .crossJoin(exact.agg(F.count("*").alias("n_exact_pairs")))
        .select(
            F.lit(TOP_K).cast("long").alias("k"),
            F.col("n_exact_pairs").cast("long").alias("n_exact_pairs"),
            F.col("n_matched").cast("long").alias("n_matched"),
            _r6(
                (F.col("n_matched") / F.col("n_exact_pairs")).cast("double"),
                6,
            ).alias("recall"),
        )
    )


TRUNC_DIMS = [8, 16, 32, 64]


def q_emb_dim_truncation(spark, sf_dir):
    """Matryoshka-style dimension-truncation recall curve: re-run the
    exact cosine top-k using only the FIRST d dimensions of every vector
    for each d in ``TRUNC_DIMS`` and report recall@k against the full-dim
    baseline — the dims-vs-recall trade-off a serving tier reads before
    shipping truncated vectors (a d/D truncation cuts memory bandwidth
    and dot-product FLOPs by D/d with zero re-embedding; Kusupati et al.
    2022 trained embeddings for exactly this read pattern).  The final
    row (d = full dim) is a built-in self-check: recall must be 1.0.

    Plan (100 TB): each truncated pass is the same broadcast-query GEMM
    shape as ``emb_knn`` over d-dim slices (`slice` is a JVM array op —
    the scan reads the same column, the kernel just folds fewer lanes);
    the recall join is id-keyed; output is |TRUNC_DIMS| rows."""
    emb, queries = _corpus_and_queries(spark, sf_dir)
    exact = _exact_topk(emb, queries).select("query_id", "neighbor_id")
    out = None
    for d in TRUNC_DIMS:
        te = emb.select("vec_id", F.slice("v", 1, d).alias("v"))
        tq = queries.select("query_id", F.slice("q", 1, d).alias("q"))
        t = _exact_topk(te, tq).select("query_id", "neighbor_id")
        matched = exact.join(t, ["query_id", "neighbor_id"], "left_semi")
        row = (
            matched.agg(F.count("*").alias("n_matched"))
            .crossJoin(exact.agg(F.count("*").alias("n_exact_pairs")))
            .select(
                F.lit(d).cast("long").alias("dims"),
                F.lit(TOP_K).cast("long").alias("k"),
                F.col("n_exact_pairs").cast("long").alias("n_exact_pairs"),
                F.col("n_matched").cast("long").alias("n_matched"),
                _r6(
                    (F.col("n_matched") / F.col("n_exact_pairs")).cast(
                        "double"
                    ),
                    6,
                ).alias("recall"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


def q_emb_label_separability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space class separability: per label, the mean pairwise
    intra-label cosine vs the mean cosine from this label's centroid to
    every OTHER label's centroid, and the margin between them — the
    contrastive-quality report an embedding pipeline publishes before
    anyone trusts the vectors for retrieval or clustering.

    Plan (100 TB): intra-pairs are a label-keyed self-join (never
    all-pairs across labels; within-label O(n_label²) is the medoid
    query's already-accepted shape); centroids are one posexplode +
    per-(label, pos) avg (the `emb_label_centroids` aggregate) and the
    centroid×centroid table is labels² — trivially broadcast."""
    e = load_embeddings(spark, sf_dir).select(
        F.col("label").cast("long").alias("label"),
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
    )
    a = e.select("label", F.col("vec_id").alias("ai"), F.col("v").alias("av"))
    b = e.select("label", F.col("vec_id").alias("bi"), F.col("v").alias("bv"))
    intra = (
        a.join(b, "label")
        .filter(F.col("ai") < F.col("bi"))
        .select(
            "label",
            (
                _dot(F.col("av"), F.col("bv"))
                / (_norm(F.col("av")) * _norm(F.col("bv")))
            ).alias("cos"),
        )
        .groupBy("label")
        .agg(F.avg("cos").alias("_intra"))
    )
    cent = (
        e.select("label", F.posexplode("v").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("c")
        )
    )
    c1 = cent.select(F.col("label"), F.col("c").alias("c1"))
    c2 = cent.select(F.col("label").alias("l2"), F.col("c").alias("c2"))
    inter = (
        c1.join(F.broadcast(c2), F.col("label") != F.col("l2"))
        .select(
            "label",
            (
                _dot(F.col("c1"), F.col("c2"))
                / (_norm(F.col("c1")) * _norm(F.col("c2")))
            ).alias("cos"),
        )
        .groupBy("label")
        .agg(F.avg("cos").alias("_inter"))
    )
    sizes = e.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs")
    )
    return (
        sizes.join(intra, "label")
        .join(inter, "label")
        .select(
            "label",
            "n_vecs",
            _r6(F.col("_intra"), 6).alias("intra_mean_cos"),
            _r6(F.col("_inter"), 6).alias("inter_centroid_cos"),
            _r6(F.col("_intra") - F.col("_inter"), 6).alias("margin"),
        )
    )


QUERIES = {
    "emb_knn": q_emb_knn,
    "emb_lsh_buckets": q_emb_lsh_buckets,
    "emb_lsh_topk": q_emb_lsh_topk,
    "emb_lsh_recall": q_emb_lsh_recall,
    "emb_ann_topk": q_emb_ann_topk,
    "emb_ann_recall": q_emb_ann_recall,
    "emb_label_centroids": q_emb_label_centroids,
    "emb_label_medoid": q_emb_label_medoid,
    "emb_int8_topk": q_emb_int8_topk,
    "emb_int8_recall": q_emb_int8_recall,
    "emb_dim_truncation": q_emb_dim_truncation,
    "emb_label_separability": q_emb_label_separability,
    "emb_knn_graph": q_emb_knn_graph,
    "emb_knn_graph_recall": q_emb_knn_graph_recall,
}
