"""blink_spark — a PySpark-native record-linkage (entity-resolution) engine.

Built from scratch in the spirit of the reference's two-stage
retrieve-then-rerank design (rpo19/BLINK: bi-encoder candidate retrieval →
cross-encoder rerank → NIL match/no-match decision → incremental KB
clustering; see SURVEY.md), re-expressed as an idiomatic Spark pipeline over
an Iceberg-style table of source-code files
``(repo, path, commit, lang, content)``:

- Stage A  ingest/normalize        (blink_spark.ingest)
- Stage B  blocking / candidate generation: composite keys + MinHash-LSH
           (blink_spark.blocking, blink_spark.minhash)
- Stage C  pairwise scoring: hashed-shingle embedding cosine + JW/Lev,
           calibrated logistic combiner (blink_spark.scoring)
- Stage D  transitive clustering: large-star/small-star connected components
           (blink_spark.clustering)
- Stage E  evaluation: pairwise P/R/F1, blocking recall
           (blink_spark.evaluate)

All transforms are DataFrame-declarative or Arrow-vectorized pandas UDFs —
no per-row Python anywhere in the hot path.
"""

__version__ = "0.1.0"
