"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The engine's input table (``source_files(repo, path, commit, lang,
content)`` per BASELINE.json ``input_hint``) is synthesized
deterministically at each scale (blink_spark.fixtures, seed=42) and
committed under fixtures/ — both the Spark queries and the DuckDB
oracles read the same parquet, and the oracle recomputes the full
chain (sha ids → shingles → minhash/LSH → candidate self-join →
embedding cosine + JW/Lev + logistic match_p → recursive-CTE
connected components) independently of Spark.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full record-linkage pipeline at sf0.001 → cluster table."""
    from blink_spark import er_queries

    return er_queries.q_clusters(spark, "/root/testdata/sf0.001")


# The driver's CORRECTNESS check records only the first 50 entries of
# ``queries()`` in insertion order.  The round-5 window leads with the 22
# queries that lacked a round-recent driver row after CORRECTNESS_r04:
# the 3 never driver-checked (er_string_panel_word / emb_knn_graph /
# emb_knn_graph_recall) and the 19 whose only driver row was r02-era
# (CORRECTNESS_r02 keys minus r03/r04).  The remaining 28 slots refresh
# the core ER pipeline + evaluation chain from the r03 window, so after
# this round every query's most recent driver row is at most one round
# old.  Rotated-out rows stay green under tests/test_entry_contract.py
# and tools/oracle_sweep.py, which run the identical Spark-vs-DuckDB
# hash compare over the full 122-query surface.
_R5_PRIORITY = [
    # never driver-checked (added in r4 beyond the window)
    "er_string_panel_word", "emb_knn_graph", "emb_knn_graph_recall",
    # only driver row is r02-era: doc_* dedup/quality family
    "doc_exact_dedup", "doc_dup_clusters", "doc_near_dup_pairs",
    "doc_simhash", "doc_emb_near_dup", "doc_winnow_fingerprints",
    "doc_langid", "doc_quality", "doc_token_stats",
    # only driver row is r02-era: emb_* similarity family
    "emb_knn", "emb_ann_topk", "emb_ann_recall", "emb_lsh_buckets",
    "emb_label_centroids", "emb_label_medoid",
    # only driver row is r02-era: evt_* family
    "evt_asof_join", "evt_daily_rollup", "evt_sessionize",
    "evt_windowed_rollup",
    # refresh (last row r03): core record-linkage chain
    "er_ingest", "er_sha_edges", "er_candidate_pairs", "er_scored_pairs",
    "er_match_edges", "er_clusters", "er_incremental_clusters",
    "er_threshold_clusters", "er_golden_record", "er_one_to_one",
    # refresh (last row r03): blocking diagnostics
    "er_block_membership", "er_block_census", "er_blocking_rules",
    "er_blocking_recall", "er_reduction_ratio",
    # refresh (last row r03): evaluation / diagnostics
    "er_confusion", "er_recall_curve", "er_rank_of_gold", "er_node_stats",
    "er_review_queue", "er_roc_curve", "er_score_hist",
    "er_cluster_sizes", "er_cluster_mode_lang", "er_pagerank",
    "er_triangles", "er_string_panel",
    # new this round (medoid-vs-all KBP re-link A/B) — 50th slot
    "er_kbp_relink",
]


def _prioritized(full: dict) -> dict:
    out = {k: full[k] for k in _R5_PRIORITY if k in full}
    out.update({k: v for k, v in full.items() if k not in out})
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from blink_spark import (
        er_queries, events, multimodal, relational, similarity, textops,
    )

    return _prioritized({
        **er_queries.QUERIES,
        **relational.QUERIES,
        **textops.QUERIES,
        **similarity.QUERIES,
        **events.QUERIES,
        # all four media queries carry full DuckDB oracles: the committed
        # fixture payloads are re-decoded independently via BLOB hex slicing
        **multimodal.QUERIES,
    })


def oracle_sql() -> dict[str, str]:
    from blink_spark import (
        er_queries, events, multimodal, relational, similarity, textops,
    )

    return _prioritized({
        **er_queries.oracle_sqls(),
        **relational.oracle_sqls(),
        **textops.oracle_sqls(),
        **similarity.oracle_sqls(),
        **events.oracle_sqls(),
        **multimodal.oracle_sqls(),
    })
