"""Star-schema relational family: plan shape (pushdown, broadcast,
no-cartesian) and semantics pinned locally; value parity vs DuckDB is
covered by tests/test_entry_contract.py and the driver sweep."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blink_spark import relational

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_pricing_summary_filter_pushed_to_scan(spark):
    df = relational.q_sql_pricing_summary(spark, SF_DIR)
    plan = _plan(df)
    # the shipdate cutoff must reach the parquet scan, not run post-scan only
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1].splitlines()[0]
    # narrow projection: o_orderkey columns etc. must not be read
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in read_schema


def test_revenue_by_nation_broadcasts_dims(spark):
    df = relational.q_sql_revenue_by_nation(spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan       # nation x region dim chain
    assert "CartesianProduct" not in plan
    rows = {r["n_name"]: r["revenue"] for r in df.collect()}
    assert len(rows) == 5                    # the 5 ASIA nations
    assert all(v > 0 for v in rows.values())


def test_top_customers_rank_contract(spark):
    rows = relational.q_sql_top_customers_per_nation(spark, SF_DIR).collect()
    by_nation: dict[str, list] = {}
    for r in rows:
        by_nation.setdefault(r["n_name"], []).append(r)
    for grp in by_nation.values():
        grp.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in grp] == list(range(1, len(grp) + 1))
        assert len(grp) <= relational.TOP_N
        # revenue non-increasing with rank
        revs = [r["revenue"] for r in grp]
        assert revs == sorted(revs, reverse=True)


def test_dormant_customers_is_anti_join(spark):
    df = relational.q_sql_dormant_customers(spark, SF_DIR)
    assert "LeftAnti" in _plan(df)
    total_dormant = sum(r["n_dormant"] for r in df.collect())
    n_cust = spark.read.parquet(f"{SF_DIR}/customer.parquet").count()
    assert 0 < total_dormant < n_cust


def test_priority_discounted_is_semi_join(spark):
    df = relational.q_sql_priority_discounted(spark, SF_DIR)
    assert "LeftSemi" in _plan(df)
    rows = df.collect()
    # a semi join never multiplies the left side: per-priority counts must
    # not exceed the raw order counts in the window
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    from pyspark.sql import functions as F

    raw = {
        r["o_orderpriority"]: r["n"]
        for r in orders.filter(
            (F.col("o_orderdate") >= F.expr(f"TIMESTAMP_NTZ '{relational.PRIORITY_LO}'"))
            & (F.col("o_orderdate") < F.expr(f"TIMESTAMP_NTZ '{relational.PRIORITY_HI}'"))
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in rows:
        assert r["n_orders"] <= raw[r["o_orderpriority"]]


def test_promo_share_bounds_and_broadcast(spark):
    df = relational.q_sql_promo_share(spark, SF_DIR)
    assert "BroadcastHashJoin" in _plan(df)   # part is a broadcast dim
    rows = df.collect()
    assert len(rows) == 12
    for r in rows:
        assert 0.0 <= r["promo_share"] <= 100.0


def test_small_qty_revenue_decorrelated_and_small(spark):
    """The Q17 shape: the correlated avg must appear as ONE aggregate +
    broadcast join-back, never a per-row subquery or cartesian; the
    small-quantity set is a strict subset of the fact table."""
    df = relational.q_sql_small_qty_revenue(spark, SF_DIR)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    rows = df.collect()
    assert rows
    n_li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    assert 0 < sum(r["n_small_lineitems"] for r in rows) < n_li
    assert all(r["avg_yearly_revenue"] > 0 for r in rows)


def test_top_supplier_is_global_max_with_ties(spark):
    rev_rows = relational.q_sql_top_supplier(spark, SF_DIR).collect()
    assert len(rev_rows) >= 1
    top = {r["total_revenue"] for r in rev_rows}
    assert len(top) == 1  # every returned supplier carries the max revenue

    # independent recompute of the max in raw Spark
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").filter(
        (F.col("l_shipdate") >= F.expr(f"TIMESTAMP_NTZ '{relational.PRIORITY_LO}'"))
        & (F.col("l_shipdate") < F.expr(f"TIMESTAMP_NTZ '{relational.PRIORITY_HI}'"))
    )
    best = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,4)")
                * (1 - F.col("l_discount")).cast("decimal(6,4)")
            ).alias("r")
        )
        .agg(F.max("r").alias("m"))
        .collect()[0]["m"]
    )
    assert abs(top.pop() - float(best)) < 1e-6


def test_big_orders_having_bound(spark):
    rows = relational.q_sql_big_orders(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["total_qty"] > relational.BIG_ORDER_MIN_QTY
    # one row per qualifying order (the join-back must not duplicate)
    keys = [r["o_orderkey"] for r in rows]
    assert len(keys) == len(set(keys))


def test_late_sole_supplier_single_order_shuffle_no_selfjoin(spark):
    df = relational.q_sql_late_sole_supplier(spark, SF_DIR)
    plan = _plan(df)
    # the Q21 EXISTS/NOT-EXISTS pair must be window distinct-counts, not
    # correlated self-joins of the fact table: exactly ONE join (li x
    # orders) and at least one Window over l_orderkey
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1
    assert "Window" in plan
    assert "CartesianProduct" not in plan


def test_rich_idle_customers_anti_join_and_broadcast_dim(spark):
    df = relational.q_sql_rich_idle_customers(spark, SF_DIR)
    plan = _plan(df)
    assert "LeftAnti" in plan
    # nation dim + the 1-row scalar threshold both broadcast
    assert plan.count("BroadcastExchange") >= 2
    assert "CartesianProduct" not in plan


def test_order_count_distribution_outer_join_preserves_zero_bucket(spark):
    df = relational.q_sql_order_count_distribution(spark, SF_DIR)
    rows = {r.n_orders: r.n_customers for r in df.collect()}
    # the cutoff guarantees order-less customers exist; an inner join
    # would silently drop this bucket (the classic Q13 bug)
    assert 0 in rows and rows[0] > 0


def test_constraint_audit_zero_on_clean_and_fires_on_dirty(spark, monkeypatch):
    clean = {
        r.constraint: (r.n_checked, r.n_violations)
        for r in relational.q_sql_constraint_audit(spark, SF_DIR).collect()
    }
    assert len(clean) == 8
    # the driver's synthetic lineitem genuinely duplicates
    # (l_orderkey, l_linenumber) pairs — the audit catching a real
    # data-quality defect in the testdata; pin it against an
    # independent count, everything else is clean
    li_real = relational._t(spark, SF_DIR, "lineitem")
    dup_rows = (
        li_real.count()
        - li_real.select("l_orderkey", "l_linenumber").distinct().count()
    )
    assert dup_rows > 0
    assert clean["lineitem.(l_orderkey,l_linenumber) unique"][1] == dup_rows
    assert all(
        v == 0
        for k, (_, v) in clean.items()
        if k != "lineitem.(l_orderkey,l_linenumber) unique"
    )

    # dirty micro-tables: dup keys, orphan FKs, out-of-range values
    cust = spark.createDataFrame(
        [(1, "a", 1, 0.0, "m"), (1, "b", 1, 0.0, "m")],
        "c_custkey long, c_name string, c_nationkey long, "
        "c_acctbal double, c_mktsegment string",
    )
    orders = spark.createDataFrame(
        [(10, 1, "O", 5.0, None, "p"), (11, 99, "O", -1.0, None, "p")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, "
        "o_orderpriority string",
    )
    li = spark.createDataFrame(
        [
            (10, 1, 1, 1, 77.0, 1.0, 0.5, 0.0, "N", "O", None),
            (10, 1, 1, 1, 5.0, 1.0, 0.05, 0.0, "N", "O", None),
            (12, 1, 1, 2, 5.0, 1.0, 0.05, 0.0, "N", "O", None),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber long, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp_ntz",
    )
    tabs = {"customer": cust, "orders": orders, "lineitem": li}
    monkeypatch.setattr(relational, "_t", lambda s, d, name: tabs[name])
    dirty = {
        r.constraint: (r.n_checked, r.n_violations)
        for r in relational.q_sql_constraint_audit(spark, SF_DIR).collect()
    }
    assert dirty["customer.c_custkey unique"] == (2, 1)
    assert dirty["orders.o_custkey -> customer.c_custkey"] == (2, 1)
    assert dirty["lineitem.l_orderkey -> orders.o_orderkey"] == (3, 1)
    assert dirty["lineitem.(l_orderkey,l_linenumber) unique"] == (3, 1)
    assert dirty["lineitem.l_quantity in [1,50]"] == (3, 1)
    assert dirty["lineitem.l_discount in [0,0.1]"] == (3, 1)
    assert dirty["orders.o_totalprice positive"] == (2, 1)
