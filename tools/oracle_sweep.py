"""Driver-style correctness sweep: run every __spark_entry__ query on Spark
and its oracle SQL on DuckDB over the same parquet tables, then compare
row counts, schemas (column-name sets), and a value hash computed from the
column-name-sorted, row-sorted serialized frame — mirroring the per-round
CORRECTNESS_r{N}.json gate so regressions surface before the driver runs.

Usage: python tools/oracle_sweep.py [sf_dir] [query ...]
"""
import hashlib
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

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
        return "[" + ",".join(canon(v) for v in value) + "]"
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
