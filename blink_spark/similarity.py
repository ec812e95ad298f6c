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

TOP_K = 5
QUERY_MOD = 20  # vec_id % QUERY_MOD == 0 rows are the query set
N_PLANES = 16
EMB_DIM = 64

# fixed seeded hyperplanes (embedded as literals in the SQL oracle too)
_rng = np.random.RandomState(7)
PLANES: list[list[float]] = [
    [round(float(x), 6) for x in _rng.randn(EMB_DIM)] for _ in range(N_PLANES)
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


def q_emb_knn(spark, sf_dir):
    """Brute-force cosine top-k: query subset × full table, windowed rank.
    At scale the broadcast side is the query batch (small) streaming
    against the partitioned corpus — exactly this plan."""
    emb = load_embeddings(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    queries = emb.filter(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q")
    )
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
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
        )
    )


def q_emb_lsh_buckets(spark, sf_dir):
    """Random-hyperplane LSH: 16 sign bits → bucket id (+ per-bucket size).
    The bucket-join over these keys is the sublinear ANN path; bucket
    population is the skew census for it."""
    emb = load_embeddings(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(PLANES):
        d = _dot(F.col("v"), F.array(*[F.lit(p) for p in plane]))
        bucket = bucket + F.when(d > 0, F.lit(1 << j)).otherwise(F.lit(0))
    df = emb.select("vec_id", bucket.alias("bucket"))
    sizes = df.groupBy("bucket").agg(F.count("*").cast("long").alias("bucket_n"))
    return df.join(sizes, "bucket").select("vec_id", "bucket", "bucket_n")


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
        .agg(F.round(F.avg("x"), 6).alias("mean"))
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
SELECT query_id, rank, neighbor_id, round(cosine, 6) AS cosine
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

    sql["emb_label_centroids"] = """
SELECT CAST(label AS BIGINT) AS label, CAST(i - 1 AS BIGINT) AS pos,
       round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS mean
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
    return sql


QUERIES = {
    "emb_knn": q_emb_knn,
    "emb_lsh_buckets": q_emb_lsh_buckets,
    "emb_label_centroids": q_emb_label_centroids,
    "emb_label_medoid": q_emb_label_medoid,
}
