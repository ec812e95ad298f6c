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
