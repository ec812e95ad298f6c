"""Generic relational analytics over the driver's star schema
(``lineitem/orders/customer/nation/region/part/supplier``) — the plain
multi-table workload a user of the reference's dict-lookup joins
(``blink/main_dense.py:125-148``, J6/J7) runs at warehouse scale: a
pricing-summary rollup, a fact x broadcast-dim join chain, top-N per
group, anti/semi joins, and a conditional-aggregate share.

Scale notes (100 TB):
- ``nation``/``region``/``part`` are bona-fide broadcast dims (25 / 5 /
  2k x sf rows): every query joins them with an explicit
  ``F.broadcast`` so the fact scan never shuffles on a dim key.
  ``customer``/``orders`` joins shuffle on their keys — the right plan
  when both sides are fact-sized (AQE picks the build side at runtime).
- Filters are literal predicates on scan columns (shipdate/orderdate
  ranges) → parquet predicate pushdown + row-group pruning; projections
  are narrow → column pruning. Verified in tests/test_relational.py by
  asserting PushedFilters reaches the scan.
- Aggregates are plain hash aggregates (map-side partial → one
  shuffle). Top-N per group is window ``row_number`` over a single
  shuffle on the group key — never a self-join.

Oracle-parity discipline: money math runs in DECIMAL on BOTH engines
(``l_extendedprice`` → DECIMAL(12,4), discount/tax factors →
DECIMAL(6,4)), so multi-million-row sums are exact integers-in-decimal
and bit-identical regardless of aggregation order — the float-sum
associativity hazard never arises. Decimals are cast to DOUBLE only at
the very end (single IEEE division for averages/shares, then
``round(x, 6) + 0.0``). Timestamps are TIMESTAMP_NTZ; filters use NTZ
literals and group keys use ``year()``/``month()``, which are
wall-clock pure on NTZ in both engines (blink_spark/events.py:12-21).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from blink_spark.parity import r6 as _r6

# DECIMAL(12,4) holds max l_extendedprice (~110k) with 4 frac digits;
# DECIMAL(6,4) holds the 1±x factors. Products stay well under the
# 38-digit ceiling of both engines: (12,4)x(6,4)x(6,4) → scale 12.
_MONEY = "decimal(12,4)"
_FACTOR = "decimal(6,4)"

PRICING_CUTOFF = "1999-12-31 00:00:00"
REVENUE_REGION = "ASIA"
REVENUE_YEAR = 1997
TOP_N = 3
DORMANT_SINCE = "1999-01-01 00:00:00"
PRIORITY_LO = "1997-01-01 00:00:00"
PRIORITY_HI = "1997-04-01 00:00:00"
PRIORITY_MIN_DISC = 0.05
PROMO_YEAR = 1997
DISTRIBUTION_SINCE = "1998-06-01 00:00:00"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _ntz(lit: str) -> Column:
    return F.expr(f"TIMESTAMP_NTZ '{lit}'")


def _money(col) -> Column:
    return F.col(col).cast(_MONEY)


def _disc_price() -> Column:
    return _money("l_extendedprice") * (1 - F.col("l_discount")).cast(_FACTOR)


def _dbl(c: Column, alias: str) -> Column:
    return _r6(c.cast("double"), 6).alias(alias)


def q_sql_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing-summary rollup (TPC-H Q1 shape): one scan, literal
    shipdate cutoff pushed to parquet, map-side-combinable hash agg on a
    2x2-ish key. Averages = exact decimal sum -> one double division."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= _ntz(PRICING_CUTOFF)
    )
    charge = _disc_price() * (1 + F.col("l_tax")).cast(_FACTOR)
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(_MONEY)).alias("_sq"),
        F.sum(_money("l_extendedprice")).alias("_sbp"),
        F.sum(_disc_price()).alias("_sdp"),
        F.sum(charge).alias("_sc"),
        F.sum(F.col("l_discount").cast(_FACTOR)).alias("_sd"),
        F.count("*").cast("long").alias("count_order"),
    )
    n = F.col("count_order")
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        _dbl(F.col("_sq"), "sum_qty"),
        _dbl(F.col("_sbp"), "sum_base_price"),
        _dbl(F.col("_sdp"), "sum_disc_price"),
        _dbl(F.col("_sc"), "sum_charge"),
        _dbl(F.col("_sq").cast("double") / n, "avg_qty"),
        _dbl(F.col("_sbp").cast("double") / n, "avg_price"),
        _dbl(F.col("_sd").cast("double") / n, "avg_disc"),
        "count_order",
    )


def q_sql_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact x broadcast-dim join chain (TPC-H Q5 shape): nation⋈region
    pre-joined and broadcast (the J6/J7 dict-lookup writ large), customer
    and orders shuffle on their keys, revenue summed in exact decimal."""
    dim = (
        _t(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").filter(
                    F.col("r_name") == REVENUE_REGION
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    cust = _t(spark, sf_dir, "customer").join(
        F.broadcast(dim), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", "n_name")
    orders = _t(spark, sf_dir, "orders").filter(
        F.year("o_orderdate") == REVENUE_YEAR
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", _disc_price().alias("_rev")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(F.sum("_rev").alias("_r"))
        .select("n_name", _dbl(F.col("_r"), "revenue"))
    )


def q_sql_top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group via window row_number (one shuffle on the group
    key, no self-join): the TOP_N customers by lifetime order value in
    each nation, ties broken by custkey for determinism."""
    cust = _t(spark, sf_dir, "customer").join(
        F.broadcast(_t(spark, sf_dir, "nation")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", "c_name", "n_name")
    rev = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(_money("o_totalprice")).alias("_r"))
    )
    joined = cust.join(rev, F.col("c_custkey") == F.col("o_custkey"))
    w = Window.partitionBy("n_name").orderBy(F.desc("_r"), F.asc("c_custkey"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_N)
        .select(
            "n_name",
            F.col("rank").cast("long").alias("rank"),
            "c_custkey",
            "c_name",
            _dbl(F.col("_r"), "revenue"),
        )
    )


def q_sql_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: customers with NO order since DORMANT_SINCE, rolled up
    per market segment. left_anti shuffles both sides on the key once;
    no NOT-IN subquery materialization."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    recent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ntz(DORMANT_SINCE))
        .select("o_custkey")
    )
    return (
        cust.join(recent, cust["c_custkey"] == recent["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").cast("long").alias("n_dormant"))
    )


def q_sql_priority_discounted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join inside an aggregate (TPC-H Q4 shape): orders in a
    quarter having >=1 deeply-discounted lineitem, counted by priority.
    left_semi never duplicates the left side, so the count needs no
    distinct."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ntz(PRIORITY_LO))
        & (F.col("o_orderdate") < _ntz(PRIORITY_HI))
    ).select("o_orderkey", "o_orderpriority")
    disc = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_discount") >= PRIORITY_MIN_DISC)
        .select("l_orderkey")
    )
    return (
        orders.join(disc, orders["o_orderkey"] == disc["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("n_orders"))
    )


def q_sql_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-aggregate share with a broadcast dim (TPC-H Q14
    shape): monthly % of revenue from PROMO-type parts across one year.
    part is a genuine broadcast dim (2k x sf rows); the division is one
    double op on two exact decimal sums."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.year("l_shipdate") == PROMO_YEAR
    ).select("l_partkey", F.month("l_shipdate").alias("month"), _disc_price().alias("_rev"))
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    agg = joined.groupBy("month").agg(
        F.sum(
            F.when(F.col("p_type") == "PROMO", F.col("_rev")).otherwise(
                F.lit(0).cast("decimal(19,8)")
            )
        ).alias("_promo"),
        F.sum("_rev").alias("_total"),
    )
    return agg.select(
        F.col("month").cast("long").alias("month"),
        _dbl(
            F.lit(100.0) * F.col("_promo").cast("double")
            / F.col("_total").cast("double"),
            "promo_share",
        ),
    )


def q_sql_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-scalar-subquery shape, decorrelated (TPC-H Q17): revenue
    from lineitems whose quantity is below half the part's own average
    quantity, rolled up per brand. The correlated ``avg(l_quantity) where
    same part`` becomes ONE per-part aggregate (map-side combinable
    shuffle on l_partkey) that is then joined back — |part| rows, a
    broadcast dim, so the fact table never shuffles twice.

    Threshold parity: the per-part average is an exact DECIMAL sum
    divided (one IEEE op) by a BIGINT count — bit-identical on both
    engines — and l_quantity is compared against 0.5x that double, so
    the filter boolean can never straddle a rounding edge."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    per_part = li.groupBy("l_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast(_MONEY)).cast("double")
            / F.count("*")
        ).alias("_avg_qty")
    ).select(F.col("l_partkey").alias("_tp"), "_avg_qty")
    small = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(per_part), F.col("l_partkey") == F.col("_tp"))
        .filter(F.col("l_quantity") < 0.5 * F.col("_avg_qty"))
    )
    return (
        small.groupBy("p_brand")
        .agg(
            F.count("*").cast("long").alias("n_small_lineitems"),
            F.sum(_money("l_extendedprice")).alias("_rev"),
        )
        .select(
            "p_brand",
            "n_small_lineitems",
            _dbl(F.col("_rev").cast("double") / 7.0, "avg_yearly_revenue"),
        )
    )


def q_sql_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-max scalar subquery (TPC-H Q15): the supplier(s) whose
    quarterly revenue equals the maximum. The scalar max is a 1-row
    aggregate broadcast into the filter (no window over a single global
    partition — that would serialize the whole table through one task);
    revenue is exact DECIMAL so max-equality is deterministic, ties kept.
    supplier and nation are broadcast dims."""
    rev = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ntz(PRIORITY_LO))
            & (F.col("l_shipdate") < _ntz(PRIORITY_HI))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_disc_price()).alias("_rev"))
    )
    best = rev.agg(F.max("_rev").alias("_best"))
    sup = _t(spark, sf_dir, "supplier").join(
        F.broadcast(_t(spark, sf_dir, "nation")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name", "n_name")
    return (
        rev.join(F.broadcast(best), F.col("_rev") == F.col("_best"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name",
            "n_name",
            _dbl(F.col("_rev"), "total_revenue"),
        )
    )


BIG_ORDER_MIN_QTY = 250


def q_sql_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-HAVING join-back (TPC-H Q18): orders whose total lineitem
    quantity exceeds BIG_ORDER_MIN_QTY, with customer attribution. The
    HAVING runs on the per-order aggregate BEFORE the joins, so only the
    qualifying ~1% of orders ever touch the orders/customer tables."""
    big = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_MONEY)).alias("_q"))
        .filter(F.col("_q") > BIG_ORDER_MIN_QTY)
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", _money("o_totalprice").alias("_tp")
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_custkey").cast("long").alias("c_custkey"),
            "c_name",
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            _dbl(F.col("_tp"), "o_totalprice"),
            _dbl(F.col("_q"), "total_qty"),
        )
    )


def q_sql_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP (grouping sets): lineitem revenue by
    (returnflag, linestatus) with per-flag subtotals and a grand total in
    ONE pass. Spark expands grouping sets inside a single hash aggregate
    (Expand → partial agg → one shuffle) — never one scan per level.
    Subtotal rows surface their nulled keys as the 'ALL' sentinel
    (identically in the DuckDB mirror; the data itself is never null),
    keeping the hash comparison deterministic."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_extendedprice", "l_discount"
    )
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum(_disc_price()).alias("_rev"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_items",
            # the grand total (~3e9 at sf0.01) exceeds what round(double, 6)
            # can resolve (ULP ≈ 5e-7 at that magnitude: the two engines'
            # float rounds landed 1 ulp apart) — round in exact DECIMAL
            # first, then take the shared nearest-double of that one value
            (F.round(F.col("_rev"), 6).cast("double") + F.lit(0.0)).alias(
                "revenue"
            ),
        )
    )


def q_sql_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-distribution histogram (TPC-H Q13 shape): LEFT OUTER join
    preserving order-less customers, per-customer count, then a second
    aggregation over the counts. Two shuffles total (custkey, then the
    tiny count-value key); the outer join is the load-bearing part — an
    inner join silently drops the zero-order bucket, the classic Q13
    bug. At warehouse scale both sides are fact-sized, so the join
    shuffles on c_custkey/o_custkey and AQE picks the build side. Only
    orders since DISTRIBUTION_SINCE count (the Q13 comment-filter analog;
    a literal predicate pushed to the orders scan) — which guarantees a
    populated zero-orders bucket the outer join must preserve."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ntz(DISTRIBUTION_SINCE))
        .select("o_orderkey", "o_custkey")
    )
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        # count(col) skips nulls -> unmatched customers count 0
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count("*").cast("long").alias("n_customers"))
        .select(F.col("n_orders").cast("long").alias("n_orders"), "n_customers")
    )


def q_sql_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count per group (TPC-H Q16 shape): suppliers shipping each
    part type. ``countDistinct`` expands to a two-phase plan (partial
    dedup on (p_type, l_suppkey) map-side, then the final distinct +
    count after one shuffle) — never a driver-side set. ``part`` is a
    bona-fide broadcast dim, so the fact scan joins without shuffling."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type")
        .agg(
            F.countDistinct("l_suppkey").cast("long").alias("n_suppliers"),
            F.count("*").cast("long").alias("n_lineitems"),
        )
    )


LATE_SHIP_LAG_DAYS = 90  # "late" = shipped > 90 days after the order date


def q_sql_late_sole_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers-who-kept-orders-waiting (TPC-H Q21 shape, decorrelated):
    for multi-supplier orders where EXACTLY ONE supplier shipped late,
    charge that supplier. Q21's correlated EXISTS / NOT EXISTS pair is
    expressed as two window distinct-counts over the order key — one
    shuffle on l_orderkey instead of two correlated self-joins of the
    fact table (this table has no commit/receipt dates, so "late" is a
    >90-day ship lag vs the order date). lineitem⋈orders shuffles on the
    order key; orders per key are tiny (≤7 lines), so the window state
    is bounded and skew-free at any scale."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).withColumn(
        "late",
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr(f"INTERVAL {LATE_SHIP_LAG_DAYS} DAYS"),
    )
    w = Window.partitionBy("l_orderkey")
    j = j.withColumn(
        "n_supp", F.size(F.collect_set("l_suppkey").over(w))
    ).withColumn(
        "n_late_supp",
        F.size(F.collect_set(F.when(F.col("late"), F.col("l_suppkey"))).over(w)),
    )
    blamed = (
        j.filter(F.col("late") & (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return blamed.groupBy(F.col("l_suppkey").alias("s_suppkey")).agg(
        F.count("*").cast("long").alias("n_waiting_orders")
    )


IDLE_SINCE = "1998-06-01 00:00:00"  # Q22's "no orders" on a corpus where
# every customer has SOME order: idle = no order since this cutoff


def q_sql_rich_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-but-idle customers per nation (TPC-H Q22 shape): customers
    with above-average positive balance and no recent orders. The scalar
    subquery (global average) is one broadcast single-row crossJoin; the
    NOT EXISTS is a ``left_anti`` shuffle join; ``nation`` is a broadcast
    dim. Balance totals run in DECIMAL so the sum is order-independent."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    thr = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("thr")
    )
    idle = cust.join(
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ntz(IDLE_SINCE))
        .select("o_custkey"),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_anti",
    )
    rich = idle.crossJoin(F.broadcast(thr)).filter(F.col("c_acctbal") > F.col("thr"))
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        rich.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            _dbl(
                F.sum(F.col("c_acctbal").cast("decimal(12,2)")), "total_acctbal"
            ),
        )
    )


MIN_COST_REGION = "EUROPE"
MIN_COST_TYPE = "STANDARD"
MIN_COST_MIN_SIZE = 40


def q_sql_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier per part (TPC-H Q2 shape, decorrelated): for
    each STANDARD large-size part, the EUROPE supplier(s) offering the
    lowest observed discounted price. Q2's correlated scalar subquery
    (``ps_supplycost = (SELECT min(..) .. WHERE same part, same region)``)
    is decorrelated into a window ``min`` over the part key — one shuffle
    on p_partkey instead of re-running the subquery per outer row. This
    schema has no partsupp, so supply cost = min discounted lineitem
    price per (part, supplier), an exact DECIMAL min (order-independent,
    so the tie-set is engine-stable).

    Plan (100 TB): per-(part,supplier) cost is one map-side-combinable
    hash agg on the fact scan (only 3 columns read). ``part`` (filtered),
    ``supplier``⋈``nation``⋈``region`` are bona-fide broadcast dims, so
    the aggregated cost table never shuffles for the joins; the only
    post-agg shuffle is the window on p_partkey. Mirrors the reference's
    per-mention argmax-over-candidates (blink/main_dense.py:271-297) as a
    grouped correlated-min."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", _disc_price().alias("_dp")
    )
    cost = li.groupBy("l_partkey", "l_suppkey").agg(F.min("_dp").alias("_cost"))
    eu = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").join(
                    F.broadcast(
                        _t(spark, sf_dir, "region").filter(
                            F.col("r_name") == MIN_COST_REGION
                        )
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == MIN_COST_TYPE)
        & (F.col("p_size") >= MIN_COST_MIN_SIZE)
    ).select("p_partkey", "p_type")
    j = (
        cost.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    w = Window.partitionBy("p_partkey")
    j = j.withColumn("_mc", F.min("_cost").over(w))
    return j.filter(F.col("_cost") == F.col("_mc")).select(
        "p_partkey",
        "p_type",
        "s_suppkey",
        "s_name",
        "n_name",
        F.col("s_acctbal").cast("double").alias("s_acctbal"),
        _dbl(F.col("_cost"), "supply_cost"),
    )


def q_sql_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style data-quality audit of the star schema: key
    uniqueness, referential integrity, completeness, and value-range
    constraints, reported as one (constraint, n_checked, n_violations)
    row each — the contract table a warehouse publishes alongside every
    load.

    Plan (100 TB): every check is a single-pass aggregate over only the
    referenced columns (uniqueness via countDistinct, ranges via
    conditional counts), or ONE shuffle join on the key for referential
    integrity (left join + null-probe count — at fact-vs-fact size the
    right plan; AQE picks the build side).  The report itself is
    constraint-count-sized."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")

    def _agg_check(df, name, violation_cond):
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n_checked"),
            F.count(F.when(violation_cond, F.lit(1)))
            .cast("long")
            .alias("n_violations"),
        ).select(F.lit(name).alias("constraint"), "n_checked", "n_violations")

    def _unique_check(df, name, *cols):
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n_checked"),
            (F.count(F.lit(1)) - F.countDistinct(*cols))
            .cast("long")
            .alias("n_violations"),
        ).select(F.lit(name).alias("constraint"), "n_checked", "n_violations")

    def _fk_check(child, fk, parent, pk, name):
        probe = parent.select(F.col(pk).alias("__pk")).distinct()
        return _agg_check(
            child.join(probe, F.col(fk) == F.col("__pk"), "left"),
            name,
            F.col("__pk").isNull(),
        )

    checks = [
        _unique_check(cust, "customer.c_custkey unique", "c_custkey"),
        _unique_check(orders, "orders.o_orderkey unique", "o_orderkey"),
        _unique_check(
            li,
            "lineitem.(l_orderkey,l_linenumber) unique",
            "l_orderkey",
            "l_linenumber",
        ),
        _fk_check(
            orders, "o_custkey", cust, "c_custkey",
            "orders.o_custkey -> customer.c_custkey",
        ),
        _fk_check(
            li, "l_orderkey", orders, "o_orderkey",
            "lineitem.l_orderkey -> orders.o_orderkey",
        ),
        _agg_check(
            li,
            "lineitem.l_quantity in [1,50]",
            ~F.col("l_quantity").between(1, 50)
            | F.col("l_quantity").isNull(),
        ),
        _agg_check(
            li,
            "lineitem.l_discount in [0,0.1]",
            ~F.col("l_discount").between(0.0, 0.1)
            | F.col("l_discount").isNull(),
        ),
        _agg_check(
            orders,
            "orders.o_totalprice positive",
            F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


QUERIES = {
    "sql_pricing_summary": q_sql_pricing_summary,
    "sql_revenue_by_nation": q_sql_revenue_by_nation,
    "sql_top_customers_per_nation": q_sql_top_customers_per_nation,
    "sql_dormant_customers": q_sql_dormant_customers,
    "sql_priority_discounted": q_sql_priority_discounted,
    "sql_promo_share": q_sql_promo_share,
    "sql_small_qty_revenue": q_sql_small_qty_revenue,
    "sql_top_supplier": q_sql_top_supplier,
    "sql_big_orders": q_sql_big_orders,
    "sql_rollup_cube": q_sql_rollup_cube,
    "sql_order_count_distribution": q_sql_order_count_distribution,
    "sql_supplier_variety": q_sql_supplier_variety,
    "sql_late_sole_supplier": q_sql_late_sole_supplier,
    "sql_rich_idle_customers": q_sql_rich_idle_customers,
    "sql_constraint_audit": q_sql_constraint_audit,
    "sql_min_cost_supplier": q_sql_min_cost_supplier,
}


# ---------------------------------------------------------------------------
# DuckDB oracles over the pre-registered star-schema views. Same DECIMAL
# widths as the Spark side, so every sum is exact and order-independent.
# ---------------------------------------------------------------------------

_DISC_PRICE = (
    f"CAST(l_extendedprice AS {_MONEY}) * CAST(1 - l_discount AS {_FACTOR})"
)


def oracle_sqls() -> dict[str, str]:
    sql: dict[str, str] = {}
    sql["sql_pricing_summary"] = f"""
WITH a AS (
  SELECT l_returnflag, l_linestatus,
    sum(CAST(l_quantity AS {_MONEY})) AS sq,
    sum(CAST(l_extendedprice AS {_MONEY})) AS sbp,
    sum({_DISC_PRICE}) AS sdp,
    sum({_DISC_PRICE} * CAST(1 + l_tax AS {_FACTOR})) AS sc,
    sum(CAST(l_discount AS {_FACTOR})) AS sd,
    count(*) AS count_order
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '{PRICING_CUTOFF}'
  GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus,
  round(sq::DOUBLE, 6) + 0.0 AS sum_qty,
  round(sbp::DOUBLE, 6) + 0.0 AS sum_base_price,
  round(sdp::DOUBLE, 6) + 0.0 AS sum_disc_price,
  round(sc::DOUBLE, 6) + 0.0 AS sum_charge,
  round(sq::DOUBLE / count_order, 6) + 0.0 AS avg_qty,
  round(sbp::DOUBLE / count_order, 6) + 0.0 AS avg_price,
  round(sd::DOUBLE / count_order, 6) + 0.0 AS avg_disc,
  count_order
FROM a"""

    sql["sql_revenue_by_nation"] = f"""
SELECT n.n_name,
  round(sum({_DISC_PRICE})::DOUBLE, 6) + 0.0 AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = '{REVENUE_REGION}' AND year(o.o_orderdate) = {REVENUE_YEAR}
GROUP BY n.n_name"""

    sql["sql_top_customers_per_nation"] = f"""
WITH rev AS (
  SELECT o_custkey, sum(CAST(o_totalprice AS {_MONEY})) AS r
  FROM orders GROUP BY o_custkey
),
ranked AS (
  SELECT n.n_name, c.c_custkey, c.c_name, rev.r,
    row_number() OVER (
      PARTITION BY n.n_name ORDER BY rev.r DESC, c.c_custkey ASC
    ) AS rank
  FROM customer c
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN rev ON rev.o_custkey = c.c_custkey
)
SELECT n_name, rank, c_custkey, c_name,
  round(r::DOUBLE, 6) + 0.0 AS revenue
FROM ranked WHERE rank <= {TOP_N}"""

    sql["sql_dormant_customers"] = f"""
SELECT c_mktsegment, count(*) AS n_dormant
FROM customer c
ANTI JOIN (
  SELECT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '{DORMANT_SINCE}'
) o ON c.c_custkey = o.o_custkey
GROUP BY c_mktsegment"""

    sql["sql_priority_discounted"] = f"""
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
SEMI JOIN (
  SELECT l_orderkey FROM lineitem WHERE l_discount >= {PRIORITY_MIN_DISC}
) l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderdate >= TIMESTAMP '{PRIORITY_LO}'
  AND o.o_orderdate < TIMESTAMP '{PRIORITY_HI}'
GROUP BY o_orderpriority"""

    sql["sql_promo_share"] = f"""
WITH j AS (
  SELECT month(l_shipdate) AS month, p.p_type, {_DISC_PRICE} AS rev
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE year(l_shipdate) = {PROMO_YEAR}
),
a AS (
  SELECT month,
    sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE CAST(0 AS DECIMAL(20,8)) END) AS promo,
    sum(rev) AS total
  FROM j GROUP BY month
)
SELECT CAST(month AS BIGINT) AS month,
  round(100.0 * promo::DOUBLE / total::DOUBLE, 6) + 0.0 AS promo_share
FROM a"""

    sql["sql_small_qty_revenue"] = f"""
WITH pa AS (
  SELECT l_partkey,
    sum(CAST(l_quantity AS {_MONEY}))::DOUBLE / count(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey
),
small AS (
  SELECT p.p_brand, l.l_extendedprice
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN pa ON pa.l_partkey = l.l_partkey
  WHERE l.l_quantity < 0.5 * pa.avg_qty
)
SELECT p_brand,
  count(*) AS n_small_lineitems,
  round(sum(CAST(l_extendedprice AS {_MONEY}))::DOUBLE / 7.0, 6) + 0.0
    AS avg_yearly_revenue
FROM small GROUP BY p_brand"""

    sql["sql_top_supplier"] = f"""
WITH rev AS (
  SELECT l_suppkey, sum({_DISC_PRICE}) AS r
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{PRIORITY_LO}'
    AND l_shipdate < TIMESTAMP '{PRIORITY_HI}'
  GROUP BY l_suppkey
)
SELECT CAST(s.s_suppkey AS BIGINT) AS s_suppkey, s.s_name, n.n_name,
  round(rev.r::DOUBLE, 6) + 0.0 AS total_revenue
FROM rev
JOIN supplier s ON rev.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE rev.r = (SELECT max(r) FROM rev)"""

    sql["sql_big_orders"] = f"""
WITH big AS (
  SELECT l_orderkey, sum(CAST(l_quantity AS {_MONEY})) AS q
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS {_MONEY})) > {BIG_ORDER_MIN_QTY}
)
SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey, c.c_name,
  CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
  strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
  round(CAST(o.o_totalprice AS {_MONEY})::DOUBLE, 6) + 0.0 AS o_totalprice,
  round(big.q::DOUBLE, 6) + 0.0 AS total_qty
FROM big
JOIN orders o ON big.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey"""

    sql["sql_rollup_cube"] = f"""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
  coalesce(l_linestatus, 'ALL') AS linestatus,
  count(*) AS n_items,
  round(sum({_DISC_PRICE}), 6)::DOUBLE + 0.0 AS revenue
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)"""

    sql["sql_order_count_distribution"] = f"""
WITH recent AS (
  SELECT o_orderkey, o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '{DISTRIBUTION_SINCE}'
),
per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
  FROM customer c
  LEFT JOIN recent o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
SELECT n_orders, count(*) AS n_customers
FROM per_cust GROUP BY n_orders"""

    sql["sql_supplier_variety"] = """
SELECT p.p_type,
  count(DISTINCT l.l_suppkey) AS n_suppliers,
  count(*) AS n_lineitems
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_type"""

    sql["sql_late_sole_supplier"] = f"""
WITH j AS (
  SELECT l_orderkey, l_suppkey,
         (l_shipdate > o_orderdate + INTERVAL {LATE_SHIP_LAG_DAYS} DAY) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
per AS (
  SELECT *,
    count(DISTINCT l_suppkey) OVER (PARTITION BY l_orderkey) AS n_supp,
    count(DISTINCT CASE WHEN late THEN l_suppkey END)
      OVER (PARTITION BY l_orderkey) AS n_late_supp
  FROM j
),
blamed AS (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM per WHERE late AND n_supp >= 2 AND n_late_supp = 1
)
SELECT l_suppkey AS s_suppkey, count(*) AS n_waiting_orders
FROM blamed GROUP BY 1"""

    sql["sql_rich_idle_customers"] = f"""
WITH thr AS (
  SELECT avg(c_acctbal) AS thr FROM customer WHERE c_acctbal > 0
),
recent AS (
  SELECT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '{IDLE_SINCE}'
),
idle AS (
  SELECT c.c_custkey, c.c_nationkey, c.c_acctbal
  FROM customer c ANTI JOIN recent o ON c.c_custkey = o.o_custkey
)
SELECT n.n_name,
  count(*) AS n_customers,
  round(sum(i.c_acctbal::DECIMAL(12,2))::DOUBLE, 6) + 0.0 AS total_acctbal
FROM idle i, thr
JOIN nation n ON i.c_nationkey = n.n_nationkey
WHERE i.c_acctbal > thr.thr
GROUP BY n.n_name"""
    sql["sql_constraint_audit"] = """
SELECT 'customer.c_custkey unique' AS constraint,
       count(*)::BIGINT AS n_checked,
       (count(*) - count(DISTINCT c_custkey))::BIGINT AS n_violations
FROM customer
UNION ALL
SELECT 'orders.o_orderkey unique', count(*)::BIGINT,
       (count(*) - count(DISTINCT o_orderkey))::BIGINT
FROM orders
UNION ALL
SELECT 'lineitem.(l_orderkey,l_linenumber) unique', count(*)::BIGINT,
       (count(*) - count(DISTINCT (l_orderkey, l_linenumber)))::BIGINT
FROM lineitem
UNION ALL
SELECT 'orders.o_custkey -> customer.c_custkey', count(*)::BIGINT,
       count(*) FILTER (WHERE c.c_custkey IS NULL)::BIGINT
FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
  ON o.o_custkey = c.c_custkey
UNION ALL
SELECT 'lineitem.l_orderkey -> orders.o_orderkey', count(*)::BIGINT,
       count(*) FILTER (WHERE o.o_orderkey IS NULL)::BIGINT
FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
  ON l.l_orderkey = o.o_orderkey
UNION ALL
SELECT 'lineitem.l_quantity in [1,50]', count(*)::BIGINT,
       count(*) FILTER (
         WHERE l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50
       )::BIGINT
FROM lineitem
UNION ALL
SELECT 'lineitem.l_discount in [0,0.1]', count(*)::BIGINT,
       count(*) FILTER (
         WHERE l_discount IS NULL OR l_discount < 0 OR l_discount > 0.1
       )::BIGINT
FROM lineitem
UNION ALL
SELECT 'orders.o_totalprice positive', count(*)::BIGINT,
       count(*) FILTER (
         WHERE o_totalprice IS NULL OR o_totalprice <= 0
       )::BIGINT
FROM orders"""

    sql["sql_min_cost_supplier"] = f"""
WITH cost AS (
  SELECT l_partkey, l_suppkey, min({_DISC_PRICE}) AS c
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{MIN_COST_REGION}'
),
j AS (
  SELECT p.p_partkey, p.p_type, eu.s_suppkey, eu.s_name, eu.n_name,
         eu.s_acctbal, cost.c,
         min(cost.c) OVER (PARTITION BY p.p_partkey) AS mc
  FROM cost
  JOIN part p ON p.p_partkey = cost.l_partkey
  JOIN eu ON eu.s_suppkey = cost.l_suppkey
  WHERE p.p_type = '{MIN_COST_TYPE}' AND p.p_size >= {MIN_COST_MIN_SIZE}
)
SELECT p_partkey, p_type, s_suppkey, s_name, n_name,
       s_acctbal::DOUBLE AS s_acctbal,
       round(c::DOUBLE, 6) + 0.0 AS supply_cost
FROM j WHERE c = mc"""
    return sql
