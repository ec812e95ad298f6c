"""Driver-style correctness sweep: run every __spark_entry__ query on Spark
and its oracle SQL on DuckDB over the same parquet tables, then compare
row counts, schemas (column-name sets), and a value hash computed from the
column-name-sorted, row-sorted serialized frame — mirroring the per-round
CORRECTNESS_r{N}.json gate so regressions surface before the driver runs.

Usage: python tools/oracle_sweep.py [--iterative-closure] [sf_dir] [query ...]

--iterative-closure replaces the ER oracles' recursive-CTE connected
components (min-label path enumeration — fine at the driver's sf0.01 compare
scale, intractable at sf0.1) with a semi-naive min-label propagation loop
materialized as a DuckDB table: same fixpoint, O(diameter) rounds of
join+group-by instead of exponential path walks. Validated equivalent to the
recursive oracle at sf0.01 (both produce identical hashes); use it to sweep
the clusters-family queries at larger scales.
"""
import hashlib
import json
import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

_args = [a for a in sys.argv[1:] if not a.startswith("--")]
ITERATIVE_CLOSURE = "--iterative-closure" in sys.argv[1:]
SF_DIR = _args[0] if _args else "/root/testdata/sf0.01"
ONLY = set(_args[1:])

# the recursive walk + clusters CTE pair in blink_spark.er_queries._cte_chain;
# under --iterative-closure it is swapped for a pre-materialized table
_WALK_RE = re.compile(
    r"walk\(node, lbl\) AS \(.*?GROUP BY node\n\)", re.DOTALL
)
_CLOSURE_SUB = "clusters AS (\n  SELECT file_id, cluster_id FROM _closure\n)"


def materialize_closure(
    con, me_sql: str, nodes_sql: str, max_rounds: int = 200, suffix: str = ""
):
    """Min-label propagation to fixpoint over the symmetrized match edges.

    ``suffix`` namespaces the scratch tables so several closures (e.g. the
    full-corpus one and the retraction oracle's reduced-corpus one) can
    coexist in one connection."""
    t = lambda name: name + suffix  # noqa: E731
    con.execute(f"CREATE OR REPLACE TABLE {t('_me')} AS " + me_sql)
    con.execute(f"CREATE OR REPLACE TABLE {t('_ing_ids')} AS " + nodes_sql)
    con.execute(
        f"""CREATE OR REPLACE TABLE {t('_sym')} AS
           SELECT left_id AS src, right_id AS dst FROM {t('_me')}
           UNION SELECT right_id, left_id FROM {t('_me')}"""
    )
    con.execute(
        f"CREATE OR REPLACE TABLE {t('_closure')} AS "
        f"SELECT file_id, file_id AS cluster_id FROM {t('_ing_ids')}"
    )
    for _ in range(max_rounds):
        con.execute(
            f"""CREATE OR REPLACE TABLE {t('_next')} AS
               SELECT node AS file_id, min(lbl) AS cluster_id FROM (
                 SELECT file_id AS node, cluster_id AS lbl FROM {t('_closure')}
                 UNION ALL
                 SELECT s.dst, c.cluster_id
                 FROM {t('_sym')} s JOIN {t('_closure')} c ON c.file_id = s.src
               ) GROUP BY node"""
        )
        changed = con.execute(
            f"""SELECT count(*) FROM {t('_next')} n
               JOIN {t('_closure')} c USING (file_id)
               WHERE n.cluster_id <> c.cluster_id"""
        ).fetchone()[0]
        con.execute(
            f"CREATE OR REPLACE TABLE {t('_closure')} AS SELECT * FROM {t('_next')}"
        )
        if changed == 0:
            return
    raise RuntimeError(f"closure did not converge in {max_rounds} rounds")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        if value == 0.0:
            value = 0.0  # collapse -0.0
        return repr(round(value, 9))
    if isinstance(value, (list, tuple)):
        # the driver's canonicalizer (pandas sort_values over all columns)
        # CRASHES on list cells — mirror that strictness so an array-typed
        # output column fails here first, not in CORRECTNESS_r{N}.json
        raise TypeError(
            f"array-typed output cell {value!r}: explode to scalar rows "
            "(see multimodal._explode_feature)"
        )
    if isinstance(value, bytes):
        return value.hex()
    if value is None or value is pd.NA or (isinstance(value, float) and pd.isna(value)):
        return "NULL"
    return str(value)


def frame_hash(pdf: pd.DataFrame) -> str:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = sorted(
        ",".join(canon(v) for v in rec) for rec in pdf.itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    import __spark_entry__ as entry
    from blink_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    # The ER oracles pin the fixture corpus at sf0.01 (the driver's compare
    # scale); when sweeping another scale, point them at that scale's
    # committed fixture so both engines read the same corpus.
    sf_tag = os.path.basename(SF_DIR.rstrip("/"))  # e.g. "sf0.1"
    oracles = {
        k: v.replace("source_files_sf0.01.parquet", f"source_files_{sf_tag}.parquet")
        for k, v in oracles.items()
    }
    if ITERATIVE_CLOSURE:
        materialize_closure(
            con,
            oracles["er_match_edges"],
            oracles["er_ingest"].replace(
                "SELECT file_id, content_sha, lang, path_stem, n_tokens FROM ing",
                "SELECT file_id FROM ing",
            ),
        )
        n_rewritten = 0
        # the retraction oracle's closure runs over the REDUCED corpus —
        # materialize it separately (before the generic rewrite loop, so
        # er_unlink_clusters never gets pointed at the full-corpus table)
        if "er_unlink_clusters" in oracles:
            cu = oracles["er_unlink_clusters"]
            final = "SELECT file_id, cluster_id FROM clusters"
            materialize_closure(
                con,
                cu.replace(final, "SELECT left_id, right_id FROM match_edges"),
                cu.replace(final, "SELECT file_id FROM ing"),
                suffix="_u",
            )
            oracles["er_unlink_clusters"] = _WALK_RE.sub(
                _CLOSURE_SUB.replace("_closure", "_closure_u"), cu
            )
            n_rewritten += 1
        for k, v in list(oracles.items()):
            if _WALK_RE.search(v):
                oracles[k] = _WALK_RE.sub(_CLOSURE_SUB, v)
                n_rewritten += 1
        print(
            f"iterative closure: {con.execute('SELECT count(*) FROM _closure').fetchone()[0]}"
            f" nodes, {n_rewritten} oracle chains rewritten", flush=True,
        )
    results, bad = {}, []
    for name, fn in queries.items():
        if ONLY and name not in ONLY:
            continue
        rec = {}
        try:
            sdf = fn(spark, SF_DIR).toPandas()
            rec["spark_rows"] = len(sdf)
            if name in oracles:
                odf = con.execute(oracles[name]).df()
                rec["oracle_rows"] = len(odf)
                rec["rows_match"] = len(sdf) == len(odf)
                rec["schema_match"] = sorted(sdf.columns) == sorted(odf.columns)
                rec["hash_match"] = (
                    rec["schema_match"] and frame_hash(sdf) == frame_hash(odf)
                )
                ok = rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
            else:
                rec["rows_match"] = rec["hash_match"] = None
                ok = rec["spark_rows"] >= 0
        except Exception as exc:  # noqa: BLE001 - report, keep sweeping
            rec["err"] = f"{type(exc).__name__}: {exc}"[:300]
            ok = False
        results[name] = rec
        if not ok:
            bad.append(name)
        print(("PASS " if ok else "FAIL ") + name, json.dumps(rec)[:200], flush=True)

    print(json.dumps({"failed": bad, "total": len(results)}))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
