"""spark-submit entry point (SURVEY.md §2.12 — the analog of the
reference's ``python blink/main_dense.py`` CLI, ``blink/main_dense.py:682-816``).

Usage (cluster):

    spark-submit --py-files .blink_spark_pkg.zip -m blink_spark.cli \\
        run --source /path/source_files.parquet --out /path/run1 \\
        [--tau 0.5] [--block-cap 1000] [--resume]

Local (sandbox):

    python -m blink_spark.cli run --source fixtures/source_files_sf0.001.parquet \\
        --out /tmp/run1

Subcommands map to pipeline stages; ``run`` executes the whole DAG with
per-stage parquet checkpoints + a lineage manifest, so a killed run
resumes from the last completed stage (the reference's resume-if-done
idiom, ``scripts/feature_ablation_study.py:906-915``). ``evaluate``
prints the pairwise P/R/F1 roll-up (``blink/main_dense.py:634-679``
analog) when the source carries a ``gold_cluster`` column.
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(args):
    from blink_spark.session import get_spark

    return get_spark(
        app_name=f"blink_spark_{args.cmd}",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )


def cmd_run(args) -> int:
    from blink_spark.pipeline import PipelineConfig, evaluate_run, run_pipeline

    spark = _spark(args)
    src = spark.read.parquet(args.source)
    conf = PipelineConfig(
        block_cap=args.block_cap,
        match_tau=args.tau,
        checkpoint_dir=args.out,
        run_id=args.run_id,
    )
    tables = run_pipeline(spark, src, conf)
    out = {"run_id": args.run_id, "out": args.out}
    out["rows"] = tables["ingested"].count()
    out["candidate_pairs"] = tables["candidate_pairs"].count()
    out["clusters"] = tables["clusters"].select("cluster_id").distinct().count()
    if "gold_cluster" in src.columns:
        out["metrics"] = evaluate_run(tables, src)
    print(json.dumps(out, default=float))
    return 0


def cmd_stage(args) -> int:
    """Materialize a single stage (and its upstream deps) to the checkpoint
    dir; reruns skip completed stages via the manifest."""
    from blink_spark.pipeline import PipelineConfig, run_pipeline

    spark = _spark(args)
    src = spark.read.parquet(args.source)
    conf = PipelineConfig(
        block_cap=args.block_cap,
        match_tau=args.tau,
        checkpoint_dir=args.out,
        run_id=args.run_id,
    )
    tables = run_pipeline(spark, src, conf)
    if args.cmd not in tables:
        sys.stderr.write(f"unknown stage {args.cmd}; one of {sorted(tables)}\n")
        return 2
    n = tables[args.cmd].count()
    print(json.dumps({"stage": args.cmd, "rows": n, "out": args.out}))
    return 0


def cmd_evaluate(args) -> int:
    from blink_spark.pipeline import PipelineConfig, evaluate_run, run_pipeline

    spark = _spark(args)
    src = spark.read.parquet(args.source)
    if "gold_cluster" not in src.columns:
        sys.stderr.write("source has no gold_cluster column\n")
        return 2
    conf = PipelineConfig(
        block_cap=args.block_cap,
        match_tau=args.tau,
        checkpoint_dir=args.out,
        run_id=args.run_id,
    )
    tables = run_pipeline(spark, src, conf)
    print(json.dumps(evaluate_run(tables, src), default=float))
    return 0


def cmd_link_batch(args) -> int:
    """Incremental KBP append (``scripts/kbp_simulation.py:316-366`` loop
    as a CLI): link --source (one new batch of files) against the
    manifest-published state under --state-dir and publish the next
    version. The first call bootstraps the state; feature kernels run over
    the new batch only."""
    from blink_spark import streaming

    if not args.state_dir:
        sys.stderr.write("link-batch requires --state-dir\n")
        return 2
    spark = _spark(args)
    batch = spark.read.parquet(args.source)
    prev = streaming._published(args.state_dir)
    batch_id = (prev["batch_id"] + 1) if prev else 0
    import os

    os.makedirs(args.state_dir, exist_ok=True)
    streaming.make_batch_processor(
        spark, args.state_dir, tau=args.tau, block_cap=args.block_cap
    )(batch, batch_id)
    pub = streaming._published(args.state_dir)
    if pub is None or pub["batch_id"] != batch_id:
        # empty batches are skipped by the processor — nothing published
        sys.stderr.write(f"nothing published: batch {args.source} is empty\n")
        return 2
    clusters = spark.read.parquet(pub["clusters_path"])
    print(
        json.dumps(
            {
                "version": pub["version"],
                "batch_rows": batch.count(),
                "total_files": clusters.count(),
                "clusters": clusters.select("cluster_id").distinct().count(),
            }
        )
    )
    return 0


STAGES = [
    "ingested", "signatures", "sha_edges", "block_membership",
    "candidate_pairs", "features", "scored_pairs", "match_edges", "clusters",
]


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="blink_spark")
    ap.add_argument("cmd", choices=["run", "evaluate", "link-batch", *STAGES])
    ap.add_argument("--source", required=True, help="source_files parquet path")
    ap.add_argument("--out", default=None, help="checkpoint dir (omit = in-memory)")
    ap.add_argument("--state-dir", default=None, help="link-batch state dir")
    ap.add_argument("--run-id", default="run0")
    ap.add_argument("--tau", type=float, default=0.5)
    ap.add_argument("--block-cap", type=int, default=1000)
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args(argv)
    if args.cmd == "run":
        return cmd_run(args)
    if args.cmd == "evaluate":
        return cmd_evaluate(args)
    if args.cmd == "link-batch":
        return cmd_link_batch(args)
    return cmd_stage(args)


if __name__ == "__main__":
    raise SystemExit(main())
