"""Replicates the driver's verify loop locally (at sf0.001 for speed):
run every ``queries()[name]`` on Spark AND its ``oracle_sql()[name]`` on
DuckDB, then compare row count, column names, and order-insensitive values
— so a CORRECTNESS_r{N}.json mismatch never happens first in the driver.
"""

from __future__ import annotations

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from blink_spark import (
    er_queries,
    events,
    multimodal,
    relational,
    similarity,
    textops,
)

SF_DIR = "/root/testdata/sf0.001"

ALL_QUERIES = {
    **er_queries.QUERIES,
    **relational.QUERIES,
    **textops.QUERIES,
    **similarity.QUERIES,
    **events.QUERIES,
    **multimodal.QUERIES,
}


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, bool):
        return bool(v)
    return v


def _rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_norm(r[i]) for i in idx) for r in rows
    ), [cols[i] for i in idx]


@pytest.fixture(scope="module")
def oracle_sqls(duck):
    # mirror the driver harness: testdata tables pre-registered as views
    for t in [
        "documents", "embeddings", "events",
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem",
    ]:
        duck.execute(
            f"CREATE VIEW IF NOT EXISTS {t} AS "
            f"SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return {
        **er_queries.oracle_sqls(sf=0.001),
        **relational.oracle_sqls(),
        **textops.oracle_sqls(sf=0.001),
        **similarity.oracle_sqls(),
        **events.oracle_sqls(),
        **multimodal.oracle_sqls(),
    }


@pytest.mark.parametrize("name", sorted(ALL_QUERIES))
def test_query_matches_oracle(spark, duck, name, oracle_sqls):
    sdf = ALL_QUERIES[name](spark, SF_DIR)
    # Driver-canonicalizer contract: the harness sorts the collected pandas
    # frame over ALL columns, so any array/map/struct column raises
    # "unhashable type: 'list'" and the query records `err` (round 2's three
    # media rows). Every query surface must be scalar-typed.
    from pyspark.sql.types import ArrayType, MapType, StructType

    for f in sdf.schema.fields:
        assert not isinstance(f.dataType, (ArrayType, MapType, StructType)), (
            f"{name}: column {f.name} is {f.dataType.simpleString()} — "
            "complex types crash the driver's correctness canonicalizer; "
            "explode to scalar rows or hex-encode"
        )
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    if name not in oracle_sqls:
        # driver contract: non-SQL-expressible queries get a rows-only
        # check (runs, stable schema, plausible row count)
        assert len(scols) == len(set(scols))
        assert len(srows) >= 0
        return

    rel = duck.sql(oracle_sqls[name])
    dcols = [d[0] for d in rel.description]
    drows = rel.fetchall()

    sset, sorted_cols_s = _rowset(scols, srows)
    dset, sorted_cols_d = _rowset(dcols, drows)
    assert sorted_cols_s == sorted_cols_d, f"{name}: column names diverge"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} (spark) vs {len(drows)} (duckdb)"
    )
    if sset != dset:
        diff_s = [r for r in sset if r not in set(dset)][:5]
        diff_d = [r for r in dset if r not in set(sset)][:5]
        raise AssertionError(
            f"{name}: values diverge.\n spark-only: {diff_s}\n duck-only: {diff_d}"
        )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["file_id", "cluster_id"]
