"""Generic relational coverage on the driver's TPC-H-ish tables.

These exercise the engine's scan / filter / projection / join / aggregate /
window / sort / limit / set-op surface (SURVEY.md §2.1-2.6) on the star
schema.  Join strategy notes are in each docstring; plans are verified with
``.explain()`` in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_engineering_project_utn_spark.functions.scalar import bucket_duration
from data_engineering_project_utn_spark.plans.registry import register
from data_engineering_project_utn_spark.tables import load_table


def _dec(col: str, prec: int = 14, scale: int = 2) -> F.Column:
    return F.col(col).cast(f"decimal({prec},{scale})")


@register(
    "rl_pricing_summary",
    oracle="""
    SELECT
        l_returnflag,
        l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
                 * (1 - CAST(l_discount AS DECIMAL(5,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
                 * (1 - CAST(l_discount AS DECIMAL(5,2)))
                 * (1 + CAST(l_tax AS DECIMAL(5,2)))) AS DOUBLE) AS sum_charge,
        CAST(SUM(CAST(l_quantity AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("relational", "agg", "bench"),
)
def rl_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary (A5/A6/A8 aggregate surface).

    One scan + one shuffle on the 6-value group key; partial aggregation is
    map-side so the exchange carries ~6 rows per task regardless of input
    size — this is the shape that scales to 100 TB unchanged.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    disc_price = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", 5, 2))
    charge = disc_price * (F.lit(1) + _dec("l_tax", 5, 2))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias(
                "avg_price"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "rl_top_revenue_orders",
    oracle="""
    SELECT
        o.o_orderkey,
        o.o_orderdate,
        c.c_mktsegment,
        CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(5,2)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate, c.c_mktsegment
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    tags=("relational", "join", "topk", "bench"),
)
def rl_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: filtered dim join + revenue top-k (J5/O2 surface).

    customer is small relative to lineitem → explicit broadcast; the only
    shuffle is the groupBy on o_orderkey.  Top-k = TakeOrdered, no global
    sort.
    """
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", 5, 2))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("o_orderkey", "o_orderdate", "c_mktsegment")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@register(
    "rl_nation_revenue",
    oracle="""
    SELECT
        n.n_name AS nation,
        r.r_name AS region,
        CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(5,2)))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_lineitems
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    """,
    tags=("relational", "join", "bench"),
)
def rl_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped star join: fact → 3 broadcast dims, zero shuffle until
    the final small groupBy.  The dim chain (supplier→nation→region) is
    pre-joined driver-side-small and broadcast as one map."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    dims = (
        s.join(n, s["s_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey", F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
    )
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", 5, 2))
    return (
        li.join(F.broadcast(dims), li["l_suppkey"] == dims["s_suppkey"])
        .groupBy("nation", "region")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "rl_order_priority_counts",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE EXISTS (
        SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
    )
    GROUP BY o_orderpriority
    """,
    tags=("relational", "semijoin"),
)
def rl_order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped EXISTS → left-semi join (J7 surface)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    semi = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"]) & (li["l_shipdate"] > o["o_orderdate"]),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "rl_customers_without_orders",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
    tags=("relational", "antijoin"),
)
def rl_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → left-anti join (completes the join-type surface; the
    reference has no anti join but the engine supports it).  On the
    driver data every customer has orders, so this gate is 0-row by
    SEMANTICS — ``rl_customers_without_big_orders`` is its non-empty
    witness twin (same anti-join shape, rows at every SF), so the
    anti-join arithmetic is value-checked even though this one is
    empty-vs-empty (VERDICT r06 gate-hygiene)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "rl_customers_without_big_orders",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
    GROUP BY c_mktsegment
    """,
    tags=("relational", "antijoin"),
)
def rl_customers_without_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NON-EMPTY witness twin of ``rl_customers_without_orders``:
    customers with no order above 400 000 — same NOT-EXISTS → left-anti
    plan, but guaranteed rows on the driver data (20 / 202 / 1997
    customers at sf0.001/0.01/0.1), so the anti-join path's actual
    arithmetic is hash-checked cross-engine, never just empty-vs-empty.
    The order-side predicate pushes below the anti join (filter before
    shuffle — the anti join's build side shrinks to the big orders)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "rl_cheapest_order_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(o_totalprice AS DOUBLE) AS totalprice
    FROM orders o
    WHERE o_totalprice = (SELECT MIN(o2.o_totalprice) FROM orders o2
                          WHERE o2.o_custkey = o.o_custkey)
    """,
    tags=("relational", "correlated"),
)
def rl_cheapest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-MIN subquery (the reference's J2 shape on a generic
    table): cheapest order per customer.  Spark-first: a min() window over
    the customer partition + equality filter — one shuffle, no correlated
    re-scan per row.  Ties (two orders at the min price) are all kept,
    matching the correlated-subquery semantics exactly."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        o.withColumn("_min_price", F.min("o_totalprice").over(w))
        .filter(F.col("o_totalprice") == F.col("_min_price"))
        .select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("totalprice"),
        )
    )


@register(
    "rl_order_count_distribution",
    oracle="""
    WITH per_cust AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("relational", "outerjoin", "bench"),
)
def rl_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped: LEFT OUTER join preserving order-less customers
    (COUNT of a nullable column skips nulls → zero bucket), then the
    distribution of per-customer order counts.  Two shuffles, both on keys
    that shrink the data (custkey, then the tiny count domain)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy(c["c_custkey"])
        .agg(F.count(o["o_orderkey"]).alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "rl_running_customer_spend",
    oracle="""
    SELECT
        o_custkey,
        o_orderkey,
        o_orderdate,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2)))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE)
            AS running_spend,
        ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
            AS order_seq
    FROM orders
    """,
    tags=("relational", "window"),
)
def rl_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running total + sequence number (W3/W5 surface).

    One shuffle on o_custkey; in-partition sort.  Decimal accumulation keeps
    the running sum exact at any prefix length.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
        F.row_number().over(w).alias("order_seq"),
    )


@register(
    "rl_next_order_gap",
    oracle="""
    SELECT
        o_custkey,
        o_orderkey,
        o_orderdate,
        LEAD(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
            AS next_orderdate,
        (epoch_us(LEAD(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
         - epoch_us(o_orderdate)) / 1000.0 AS gap_ms
    FROM orders
    """,
    tags=("relational", "window", "asof"),
)
def rl_next_order_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAD as-of pattern (W2/J2 surface) on a generic table."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    from data_engineering_project_utn_spark.functions.scalar import unix_us

    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        nxt.alias("next_orderdate"),
        ((unix_us(nxt) - unix_us(F.col("o_orderdate"))) / 1000.0).alias("gap_ms"),
    )


@register(
    "rl_part_type_union",
    oracle="""
    SELECT p_type, 'large' AS size_class, COUNT(*) AS n
    FROM part WHERE p_size >= 30 GROUP BY p_type
    UNION ALL
    SELECT p_type, 'small' AS size_class, COUNT(*) AS n
    FROM part WHERE p_size < 10 GROUP BY p_type
    """,
    tags=("relational", "setop"),
)
def rl_part_type_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL re-attach pattern (O8 surface)."""
    p = load_table(spark, sf_dir, "part")
    large = (
        p.filter(F.col("p_size") >= 30)
        .groupBy("p_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("p_type", F.lit("large").alias("size_class"), "n")
    )
    small = (
        p.filter(F.col("p_size") < 10)
        .groupBy("p_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("p_type", F.lit("small").alias("size_class"), "n")
    )
    return large.unionByName(small)


@register(
    "rl_lineitem_buckets",
    oracle="""
    SELECT
        CASE WHEN l_quantity < 100 THEN 'Short'
             WHEN l_quantity < 1000 THEN 'Medium'
             ELSE 'Long' END AS bucket,
        COUNT(*) AS n,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price
    FROM lineitem
    GROUP BY 1
    """,
    tags=("relational", "bucketing"),
)
def rl_lineitem_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bin bucketing (F11 `pd.cut` surface) + per-bucket aggregates."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.withColumn("bucket", bucket_duration("l_quantity"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("total_price"),
        )
    )


@register(
    "rl_distinct_ship_modes",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
    tags=("relational", "distinct"),
)
def rl_distinct_ship_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT dedup (O9 surface)."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus"
    ).distinct()


@register(
    "rl_customer_set_ops",
    priority=1,
    oracle="""
    WITH f AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
    o AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
    SELECT 'both' AS segment, COUNT(*) AS n_customers
    FROM (SELECT o_custkey FROM f INTERSECT SELECT o_custkey FROM o)
    UNION ALL
    SELECT 'only_f' AS segment, COUNT(*) AS n_customers
    FROM (SELECT o_custkey FROM f EXCEPT SELECT o_custkey FROM o)
    ORDER BY segment
    """,
    tags=("relational", "setops"),
)
def rl_customer_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT surface (beyond the reference, which has neither
    — SURVEY §2.6): customers with both finished and open orders vs
    finished-only.  ``intersect`` plans as a left-semi and ``subtract`` as
    a left-anti hash join (``exceptAll`` would instead plan a
    Union+global-aggregate+replicaterows — and only matches EXCEPT-distinct
    semantics while the input happens to be distinct).  Both key sets are
    persisted so each side's scan+distinct runs once across the two
    branches; a pure-performance alternative is one
    groupBy(custkey).agg(has_f, has_o) pass, but exercising the set-op
    operators is this query's point."""
    from data_engineering_project_utn_spark.persist import track_persist

    orders = load_table(spark, sf_dir, "orders")
    f = track_persist(
        orders.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    )
    o = track_persist(
        orders.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    )
    both = f.intersect(o).agg(F.count(F.lit(1)).alias("n_customers")).select(
        F.lit("both").alias("segment"), "n_customers"
    )
    only_f = f.subtract(o).agg(F.count(F.lit(1)).alias("n_customers")).select(
        F.lit("only_f").alias("segment"), "n_customers"
    )
    return both.unionByName(only_f).orderBy("segment")


@register(
    "rl_order_rollup",
    priority=1,
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           GROUPING(o_orderpriority) AS g_priority,
           GROUPING(o_orderstatus) AS g_status,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    ORDER BY g_priority, g_status, o_orderpriority, o_orderstatus
    """,
    tags=("relational", "rollup"),
)
def rl_order_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP subtotals (beyond the reference, which has no grouping sets —
    SURVEY §2.4): per (priority, status), per priority, and grand total in
    ONE aggregation pass (Spark plans a single Expand + hash aggregate, not
    three scans).  GROUPING() markers disambiguate subtotal NULLs from data
    NULLs; the revenue sum goes through exact decimal accumulation per the
    determinism contract."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping("o_orderpriority").cast("long").alias("g_priority"),
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice", 18, 2)).cast("double").alias("revenue"),
        )
        .select(
            "o_orderpriority", "o_orderstatus", "g_priority", "g_status",
            "n_orders", "revenue",
        )
        .orderBy("g_priority", "g_status", "o_orderpriority", "o_orderstatus")
    )


@register(
    "rl_sole_late_supplier",
    priority=2,
    oracle="""
    WITH li AS (SELECT l.l_orderkey, l.l_suppkey,
                       (l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY) AS late
                FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
    pero AS (SELECT l_orderkey,
                    CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
                    CAST(COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS BIGINT)
                        AS n_late,
                    MAX(CASE WHEN late THEN l_suppkey END) AS late_supp
             FROM li GROUP BY l_orderkey)
    SELECT s.s_suppkey, s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM pero JOIN supplier s ON s.s_suppkey = pero.late_supp
    WHERE n_supp > 1 AND n_late = 1
    GROUP BY s.s_suppkey, s.s_name
    ORDER BY numwait DESC, s.s_suppkey LIMIT 20
    """,
    tags=("relational", "exists", "multi-agg"),
)
def rl_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21's shape on the driver schema: suppliers who were the
    ONLY late supplier on a multi-supplier order ("late" = shipped more
    than 90 days after the order date — the schema has no
    receipt/commit dates).  The classic EXISTS (another supplier on the
    order) + NOT EXISTS (another LATE supplier) pair collapses into ONE
    grouped aggregation per order — two countDistincts and a
    conditional MAX (exactly-one-late makes MAX the witness) — instead
    of two correlated re-scans: one orders join + one order-key shuffle
    + a model-size supplier rollup, the Spark-first translation of a
    doubly-correlated subquery."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    pero = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select("l_orderkey", "l_suppkey", late.alias("late"))
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late"),
            F.max(F.when(F.col("late"), F.col("l_suppkey"))).alias("late_supp"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    return (
        pero.join(F.broadcast(s), pero["late_supp"] == s["s_suppkey"])
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_suppkey")
        .limit(20)
    )


@register(
    "rl_small_quantity_revenue",
    priority=2,
    oracle="""
    WITH pavg AS (SELECT l_partkey,
                         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                         CAST(COUNT(*) AS BIGINT) AS cnt
                  FROM lineitem GROUP BY l_partkey)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS small_qty_revenue
    FROM lineitem l JOIN pavg p ON p.l_partkey = l.l_partkey
    WHERE 5 * CAST(l.l_quantity AS BIGINT) * p.cnt < p.sum_qty
    """,
    tags=("relational", "correlated", "agg"),
)
def rl_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17's shape: revenue locked in small-quantity orders —
    lineitems with quantity below 20 % of their part's average.  The
    correlated AVG subquery becomes one part-key aggregation joined
    back; the 0.2·avg comparison is cleared to EXACT integers
    (5·qty·cnt < Σqty — quantities are integral, so no engine can
    disagree on a boundary row), and the revenue sum runs through
    DECIMAL(18,2) so partial-aggregation order can't move the double."""
    li = load_table(spark, sf_dir, "lineitem")
    pavg = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        li.join(pavg, "l_partkey")
        .filter(
            F.lit(5) * F.col("l_quantity").cast("long") * F.col("cnt")
            < F.col("sum_qty")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("small_qty_revenue"),
        )
    )


@register(
    "rl_global_sales_opportunity",
    priority=2,
    oracle="""
    WITH pos AS (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS s,
                        CAST(COUNT(*) AS BIGINT) AS n
                 FROM customer WHERE c_acctbal > 0),
    rich AS (SELECT c.c_custkey, c.c_nationkey,
                    CAST(c.c_acctbal AS DECIMAL(18,2)) AS bal
             FROM customer c, pos
             WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * pos.n > pos.s),
    noord AS (SELECT r.c_nationkey, r.bal FROM rich r
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_custkey = r.c_custkey
                                  AND o.o_totalprice > 400000))
    SELECT CAST(c_nationkey AS BIGINT) AS cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(bal) AS DOUBLE) AS totacctbal
    FROM noord GROUP BY c_nationkey ORDER BY cntrycode
    """,
    tags=("relational", "antijoin", "correlated", "agg"),
)
def rl_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22's shape: customers with ABOVE-AVERAGE positive balance
    and no recent big spend, grouped by country code (c_nationkey
    stands in for the phone-prefix cntrycode — the driver schema has no
    phone column).  The uncorrelated AVG subquery becomes a 1-row
    broadcast with the comparison cleared to exact arithmetic
    (bal·n > Σbal over DECIMAL(18,2) — no engine can disagree on a
    boundary customer); NOT EXISTS becomes a left-anti join against
    orders pre-filtered to > 400 000 (the pushed-down predicate that
    keeps the gate non-empty on driver data, the
    ``rl_customers_without_big_orders`` witness convention — a bare
    no-orders anti join is 0-row by semantics here); the balance sum
    aggregates in DECIMAL before one final double cast.

    Scale: filter → broadcast 1-row threshold → anti join (build side =
    big orders only, shrunk BEFORE the shuffle) → nation-key agg.  The
    canonical "find the reachable prospects" report shape."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    pos = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(
            F.sum(bal).cast("decimal(38,2)").alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    rich = (
        c.crossJoin(F.broadcast(pos))
        .filter(bal * F.col("n") > F.col("s"))
        .select("c_custkey", "c_nationkey", bal.alias("bal"))
    )
    return (
        rich.join(o, rich["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy(F.col("c_nationkey").cast("long").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.sum("bal").cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@register(
    "rl_nation_trade_volume",
    priority=2,
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(YEAR(l.l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(5,2)))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE n1.n_name < n2.n_name
      AND l.l_shipdate >= DATE '1996-01-01' AND l.l_shipdate < DATE '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("relational", "join", "agg"),
)
def rl_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7's shape: shipping volume between nation pairs by year —
    the one classic that joins BOTH fact tables (lineitem ⨝ orders, the
    single real shuffle on the order key) while every dimension chain
    (supplier→nation, customer→nation) rides a broadcast.  The n1 < n2
    canonical pair orientation halves the output without losing a pair
    (same trick as the dedup pair joins); revenue is the shared
    DECIMAL(14,2)·(1−disc) formula so partial-agg order can't move the
    double.  At 100 TB both facts are bucketed on the order key (see
    tests/test_bucketed_join.py) so even that shuffle disappears."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    sn = s.join(n, s["s_nationkey"] == n["n_nationkey"]).select(
        "s_suppkey", F.col("n_name").alias("supp_nation")
    )
    cn = c.join(n, c["c_nationkey"] == n["n_nationkey"]).select(
        "c_custkey", F.col("n_name").alias("cust_nation")
    )
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", 5, 2))
    return (
        li.join(F.broadcast(sn), li["l_suppkey"] == sn["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(cn), o["o_custkey"] == cn["c_custkey"])
        .filter(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "rl_market_share",
    priority=2,
    oracle="""
    WITH rev AS (
        SELECT CAST(YEAR(l.l_shipdate) AS BIGINT) AS l_year,
               CAST(l.l_extendedprice AS DECIMAL(14,2))
                   * (1 - CAST(l.l_discount AS DECIMAL(5,2))) AS volume,
               n1.n_name AS supp_nation
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        JOIN region r ON n2.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
    )
    SELECT l_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                         ELSE CAST(0 AS DECIMAL(14,2)) END) AS DOUBLE)
               / CAST(SUM(volume) AS DOUBLE) AS mkt_share,
           CAST(COUNT(*) AS BIGINT) AS n_lineitems
    FROM rev GROUP BY l_year ORDER BY l_year
    """,
    tags=("relational", "join", "agg", "ratio"),
)
def rl_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8's shape: one supplier nation's share of a region's
    yearly revenue — the ratio-of-conditional-aggregates pattern (A19)
    over the Q7 join tree.  Both sums aggregate EXACT decimals and the
    single double division happens once per output row, so the ratio is
    bit-identical cross-engine (the ``ri_analytical_tables``
    determinism argument, on a star join).  Customer-side region filter
    prunes before the fact join; the CASE keeps one pass — no second
    scan for the numerator."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    r = load_table(spark, sf_dir, "region")
    sn = s.join(n, s["s_nationkey"] == n["n_nationkey"]).select(
        "s_suppkey", F.col("n_name").alias("supp_nation")
    )
    cr = (
        c.join(n, c["c_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey")
    )
    volume = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", 5, 2))
    num = F.when(
        F.col("supp_nation") == "NATION_3", volume
    ).otherwise(F.lit(0).cast("decimal(14,2)"))
    return (
        li.join(F.broadcast(sn), li["l_suppkey"] == sn["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(cr), o["o_custkey"] == cr["c_custkey"], "left_semi")
        .groupBy(F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(
            (F.sum(num).cast("double") / F.sum(volume).cast("double")).alias(
                "mkt_share"
            ),
            F.count(F.lit(1)).cast("long").alias("n_lineitems"),
        )
        .orderBy("l_year")
    )


@register(
    "rl_monthly_growth",
    priority=2,
    oracle="""
    WITH m AS (SELECT date_trunc('month', o_orderdate) AS month,
                      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                           AS DECIMAL(38,2)) AS revenue,
                      CAST(COUNT(*) AS BIGINT) AS n_orders
               FROM orders GROUP BY month)
    SELECT month, CAST(revenue AS DOUBLE) AS revenue, n_orders,
           CAST(lag(revenue) OVER (ORDER BY month) AS DOUBLE) AS prev_revenue,
           CAST(revenue AS DOUBLE)
               / CAST(lag(revenue) OVER (ORDER BY month) AS DOUBLE) - 1.0
               AS growth
    FROM m ORDER BY month
    """,
    tags=("relational", "window", "timeseries"),
)
def rl_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period growth — the canonical time-series report
    shape the relational family lacked: monthly order revenue (exact
    DECIMAL sums) with the previous month's value and the growth ratio
    via ``lag`` over the month order.  The ratio divides two decimals
    ONCE per output row in double (identical operands → identical
    quotient cross-engine); the first month's growth is NULL by lag
    semantics on both engines.

    Scale: one month-key aggregation of the fact table (map-side
    combined into calendar-bounded keys), then a window over the
    AGGREGATED frame — months are bounded by the calendar (~10² rows
    at any corpus size), so the global window here is model-size by
    construction, not a scale smell."""
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window as W

    m = (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
        )
    )
    w = W.orderBy("month")
    prev = F.lag("revenue").over(w)
    return m.select(
        "month",
        F.col("revenue").cast("double").alias("revenue"),
        "n_orders",
        prev.cast("double").alias("prev_revenue"),
        (F.col("revenue").cast("double") / prev.cast("double") - F.lit(1.0)).alias(
            "growth"
        ),
    ).orderBy("month")


@register(
    "rl_returned_item_ranking",
    priority=2,
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(c.c_acctbal AS DOUBLE) AS acctbal,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(5,2)))) AS DOUBLE)
               AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("relational", "join", "topk"),
)
def rl_returned_item_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped: lost-revenue ranking of customers who returned
    items in one quarter — a 4-way star join (fact lineitem against
    orders + two broadcast dims) with a filtered fact scan and a top-20.

    Plan at scale: the o_orderdate range and l_returnflag predicates push
    into the two fact scans (partition/row-group pruning at rest); orders
    shrinks to one quarter BEFORE the fact-fact equi-join on l_orderkey;
    customer and nation broadcast; the only wide shuffle is the groupBy
    on c_custkey, map-side combined.  Top-20 = TakeOrdered with a total
    order (revenue DESC, c_custkey), never a global sort."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", 5, 2))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.col("c_acctbal").cast("double").alias("acctbal"),
            "revenue",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "rl_promo_revenue",
    priority=2,
    oracle="""
    SELECT
        CAST(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(l.l_extendedprice AS DECIMAL(14,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(5,2)))
                 ELSE CAST(0 AS DECIMAL(14,2)) END) AS DOUBLE)
             / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                        * (1 - CAST(l.l_discount AS DECIMAL(5,2)))) AS DOUBLE)
             AS DOUBLE) AS promo_pct,
        CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    """,
    tags=("relational", "join", "agg"),
)
def rl_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped: promotional revenue share for one ship-month —
    the conditional-sum-over-sum ratio (A3/A19 surface) across a
    fact-to-dim join.  Both sums accumulate in exact DECIMAL and divide
    once as doubles (identical numerator/denominator doubles cross-engine
    → identical quotient); the month predicate pushes into the lineitem
    scan, part broadcasts, and the result is a single map-side-combinable
    scalar aggregate — no wide shuffle at any corpus size."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", 5, 2))
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(
        F.lit(0).cast("decimal(14,2)")
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(revenue).cast("double")
            )
            .cast("double")
            .alias("promo_pct"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


@register(
    "rl_top_supplier_revenue",
    priority=2,
    oracle="""
    WITH rev AS (
        SELECT l_suppkey,
               SUM(CAST(l_extendedprice AS DECIMAL(14,2))
                   * (1 - CAST(l_discount AS DECIMAL(5,2)))) AS total_dec
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey),
    mx AS (SELECT MAX(total_dec) AS m FROM rev)
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_dec AS DOUBLE) AS total_revenue
    FROM rev r JOIN mx ON r.total_dec = mx.m
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    ORDER BY s_suppkey
    """,
    tags=("relational", "join", "agg", "argmax"),
)
def rl_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped: the supplier(s) with maximum 3-month revenue —
    the max-of-aggregates TIE SET (Q15's view + equality against the
    scalar max), not a LIMIT 1: every supplier matching the maximum
    surfaces, ordered by key.  The max comparison happens on the exact
    DECIMAL accumulator (never on a rounded double), so the tie set is
    engine-independent by construction.

    Plan: one filtered fact aggregation on l_suppkey (map-side combined),
    the 1-row max broadcast back against the aggregate frame, supplier
    broadcast for names — the revenue view never materializes twice and
    nothing re-scans lineitem."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", 5, 2))
    from data_engineering_project_utn_spark.persist import track_persist

    rev = track_persist(
        li.groupBy("l_suppkey").agg(F.sum(revenue).alias("total_dec"))
    )
    mx = rev.agg(F.max("total_dec").alias("m"))
    return (
        rev.join(F.broadcast(mx), F.col("total_dec") == F.col("m"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_dec").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "rl_large_volume_orders",
    priority=2,
    oracle="""
    WITH big AS (
        SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(14,2))) AS qty_dec
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(14,2))) > 200)
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           CAST(o.o_totalprice AS DOUBLE) AS totalprice,
           CAST(b.qty_dec AS DOUBLE) AS sum_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY totalprice DESC, o_orderkey
    LIMIT 20
    """,
    tags=("relational", "join", "having", "topk"),
)
def rl_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped: large-volume orders — the aggregate-then-
    semi-join shape (the HAVING set drives the join, A11/J7 surface).
    The quantity accumulates in exact DECIMAL so the >200 cut admits
    the same order set in both engines (a double sum could disagree on
    a boundary order under different partial-agg orders).

    Plan: one fact aggregation on l_orderkey (the same shuffle key the
    order join needs — AQE reuses the partitioning), the HAVING output
    is a tiny fraction of orders, so the joins against orders/customer
    run with a small build side; top-20 by (totalprice DESC, o_orderkey)
    is TakeOrdered."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty_dec"))
        .filter(F.col("qty_dec") > F.lit(200).cast("decimal(14,2)"))
    )
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("totalprice"),
            F.col("qty_dec").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(20)
    )


@register(
    "rl_bracket_revenue",
    priority=2,
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(5,2)))) AS DOUBLE)
               AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    tags=("relational", "join", "predicate"),
)
def rl_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped: disjunctive bracket predicates across the
    join — three (brand, size, quantity) OR-branches where each branch
    constrains BOTH sides.  The planner splits the disjunction into
    single-side residuals: the quantity hull (1..30) pushes into the
    lineitem scan and the brand IN-list hull into the part scan, with
    the exact cross-table disjunction evaluated after the join —
    asserted in tests/test_plans.py (the scan that reads every brand
    for a 3-brand query is the regression this gate exists to catch).
    Revenue accumulates in exact DECIMAL; one scalar aggregate, no wide
    shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    br = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", 5, 2))
    return j.filter(br).agg(
        F.sum(revenue).cast("double").alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


@register(
    "rl_min_cost_supplier",
    priority=1,
    oracle="""
    WITH ps AS (
        SELECT l_partkey AS partkey, l_suppkey AS suppkey,
               MIN(CAST(l_extendedprice AS DECIMAL(14,2))) AS supplycost
        FROM lineitem
        GROUP BY l_partkey, l_suppkey),
    eligible AS (
        SELECT ps.partkey, ps.suppkey, ps.supplycost,
               s.s_acctbal, s.s_name, n.n_name
        FROM ps
        JOIN supplier s ON s.s_suppkey = ps.suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'),
    mn AS (
        SELECT partkey, MIN(supplycost) AS min_cost
        FROM eligible GROUP BY partkey)
    SELECT CAST(e.s_acctbal AS DOUBLE) AS s_acctbal,
           e.s_name, e.n_name, p.p_partkey, p.p_brand, p.p_type,
           CAST(e.supplycost AS DOUBLE) AS supplycost
    FROM eligible e
    JOIN mn ON mn.partkey = e.partkey AND e.supplycost = mn.min_cost
    JOIN part p ON p.p_partkey = e.partkey
    WHERE p.p_type = 'SMALL'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    tags=("relational", "join", "correlated-min", "topk"),
)
def rl_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped: the minimum-cost supplier per part — the
    correlated-MIN subquery (A10) lifted onto a 4-way dim correlation
    (supplier→nation→region region-gate inside the correlated scope,
    exactly Q2's structure).  The testdata has no partsupp table, so the
    (part, supplier) offer relation derives from lineitem:
    supplycost := MIN(l_extendedprice) per (l_partkey, l_suppkey) —
    same join graph, same correlation, real data.

    Plan for 100 TB: one fact aggregation on (l_partkey, l_suppkey)
    (map-side combined — output is |offers|, not |lineitem|); the
    region-gated supplier dims broadcast INTO that aggregate before the
    correlation, so the window-min over partkey runs on the eligible
    subset only (the correlated subquery's region filter is applied
    where Q2 applies it, not after).  The per-part MIN is a window
    function partitioned by partkey — distributed, no global sort, no
    self-join re-scan of the fact.  The part filter broadcasts; top-100
    has a total order (acctbal DESC then 4 key tiebreakers) so the row
    set is engine-independent."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL")

    euro_supp = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(_dec("l_extendedprice")).alias("supplycost")
    )
    eligible = offers.join(
        F.broadcast(euro_supp), offers["l_suppkey"] == euro_supp["s_suppkey"]
    )
    w = Window.partitionBy("l_partkey")
    best = eligible.withColumn("min_cost", F.min("supplycost").over(w)).filter(
        F.col("supplycost") == F.col("min_cost")
    )
    return (
        best.join(F.broadcast(p), best["l_partkey"] == p["p_partkey"])
        .select(
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            "p_type",
            F.col("supplycost").cast("double").alias("supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "rl_excess_stock_suppliers",
    priority=1,
    oracle="""
    WITH fp AS (
        SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
    tot AS (
        SELECT l.l_partkey, l.l_suppkey,
               SUM(CAST(l.l_quantity AS DECIMAL(14,2))) AS total_qty,
               SUM(CASE WHEN l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                         AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
                        THEN CAST(l.l_quantity AS DECIMAL(14,2))
                        ELSE CAST(0 AS DECIMAL(14,2)) END) AS qty_period
        FROM lineitem l
        WHERE l.l_partkey IN (SELECT p_partkey FROM fp)
        GROUP BY l.l_partkey, l.l_suppkey),
    excess AS (
        SELECT DISTINCT l_suppkey FROM tot
        WHERE total_qty > 2 * qty_period)
    SELECT s.s_suppkey, s.s_name, n.n_name,
           CAST(s.s_acctbal AS DOUBLE) AS s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM excess)
      AND n.n_regionkey = 0
    ORDER BY s_name, s_suppkey
    """,
    tags=("relational", "semi-join", "having", "correlated-agg"),
)
def rl_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped: the nested semi-join chain with a correlated
    half-sum threshold.  Q20 finds suppliers whose ps_availqty exceeds
    half of a period's shipments for name-prefix parts; without a
    partsupp table, availability per (part, supplier) derives from
    lineitem: total quantity ever shipped vs quantity shipped in 1997 —
    ``total > 2 × period`` is the identical half-sum cut
    (period < ½·total) on real columns.

    Plan for 100 TB: the name-prefix part filter broadcasts as a
    LEFT-SEMI into the lineitem scan FIRST (the fact shrinks before the
    shuffle — the chain's whole point); one aggregation on
    (l_partkey, l_suppkey) computes both sums in a single pass
    (conditional-sum A3, no second scan); the threshold cut runs on
    exact DECIMAL accumulators so the supplier set is engine-exact;
    distinct suppkeys are a tiny frame that LEFT-SEMI-broadcasts into
    supplier, and the nation gate broadcasts.  Nothing rescans the
    fact, and the only wide exchange is the one aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 0)
    fp = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("red"))
        .select("p_partkey")
    )
    in_period = (
        F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp")
    ) & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    tot = (
        li.join(F.broadcast(fp), li["l_partkey"] == fp["p_partkey"], "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(_dec("l_quantity")).alias("total_qty"),
            F.sum(
                F.when(in_period, _dec("l_quantity")).otherwise(
                    F.lit(0).cast("decimal(14,2)")
                )
            ).alias("qty_period"),
        )
    )
    excess = (
        tot.filter(F.col("total_qty") > F.lit(2) * F.col("qty_period"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(excess), s["s_suppkey"] == excess["l_suppkey"], "left_semi")
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select(
            "s_suppkey",
            "s_name",
            "n_name",
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
        )
        .orderBy("s_name", "s_suppkey")
    )


@register(
    "rl_important_stock",
    priority=1,
    oracle="""
    WITH val AS (
        SELECT l.l_partkey,
               SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))) AS value_dec
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        WHERE s.s_nationkey < 5
        GROUP BY l.l_partkey),
    tot AS (SELECT SUM(value_dec) AS total, CAST(COUNT(*) AS BIGINT) AS n
            FROM val)
    SELECT v.l_partkey AS partkey, CAST(v.value_dec AS DOUBLE) AS value
    FROM val v, tot
    WHERE v.value_dec * tot.n > tot.total * 2
    ORDER BY value DESC, partkey
    """,
    tags=("relational", "join", "having", "global-ratio"),
)
def rl_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped: important-stock identification — the
    GLOBAL-RATIO HAVING (a per-group aggregate kept only when it
    exceeds a fraction of the whole-table aggregate, Q11's scalar
    subquery in the HAVING clause).  Stock value per part derives from
    lineitem restricted to one nation's suppliers (no partsupp in the
    testdata; same join graph).

    The fraction cut scales with the data the way Q11's official
    0.0001/SF does: a part survives when its share exceeds 2× the mean
    (``value·n > total·2`` with n = part count) — scale-invariant
    selectivity, and EXACT: both sides are DECIMAL×BIGINT integer
    products, no fraction ever exists as a double on either engine, so
    boundary parts cannot disagree cross-engine.

    Plan for 100 TB: the nation's suppliers broadcast-join into the
    fact scan, one aggregation on l_partkey (map-side combined), the
    grand total is a 1-row broadcast back across the aggregate frame —
    the fact is scanned ONCE and the ratio gate costs one broadcast,
    not a second pass."""
    li = load_table(spark, sf_dir, "lineitem")
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") < 5)
        .select("s_suppkey")
    )
    from data_engineering_project_utn_spark.persist import track_persist

    val = track_persist(
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"], "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(_dec("l_extendedprice")).alias("value_dec"))
    )
    tot = val.agg(
        F.sum("value_dec").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    return (
        val.join(F.broadcast(tot))
        .filter(F.col("value_dec") * F.col("n") > F.col("total") * F.lit(2))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("value_dec").cast("double").alias("value"),
        )
        .orderBy(F.desc("value"), "partkey")
    )


@register(
    "rl_shipping_priority_mix",
    priority=1,
    oracle="""
    SELECT l.l_returnflag AS ship_class,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY ship_class
    ORDER BY ship_class
    """,
    tags=("relational", "join", "conditional-agg"),
)
def rl_shipping_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped: the shipping-mode priority mix — per shipping
    class, how many lines belong to high- vs low-priority orders
    (Q12's paired CASE-sum conditional counts over the orders⋈lineitem
    join).  The testdata carries no l_shipmode/receipt columns, so the
    class key is l_returnflag and the date window rides l_shipdate —
    identical aggregate/join structure on real columns.  This completes
    the TPC-H shape family: all 22 query shapes now have a gated
    equivalent (Q1-Q22, partsupp-dependent ones re-derived through the
    lineitem bridge).

    Plan for 100 TB: the date window prunes the fact scan (pushed
    filters + partition pruning on a date-partitioned layout); the join
    is the fact's natural orderkey; both CASE-sums fold in ONE
    map-side-combined aggregation pass to a 3-row result — no second
    scan, no wide exchange beyond the join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


@register(
    "rl_forecast_revenue_change",
    priority=1,
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
                    * CAST(l_discount AS DECIMAL(5,2))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("relational", "agg", "predicate"),
)
def rl_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped: the forecasting-revenue-change query — a pure
    scan + conjunctive range predicates + one scalar aggregate, the
    canonical predicate-pushdown benchmark.  Every conjunct (date range,
    discount band, quantity cap) reaches the parquet scan as a pushed
    filter over exactly 4 read columns; there is no join and no wide
    shuffle — at 100 TB this is a map-only job whose cost is I/O after
    row-group pruning.  Revenue (price × discount) accumulates in exact
    DECIMAL."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(_dec("l_extendedprice") * _dec("l_discount", 5, 2))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )


@register(
    "rl_product_type_profit",
    priority=1,
    oracle="""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(5,2)))
                    - CAST(p.p_retailprice AS DECIMAL(14,2))
                      * CAST(l.l_quantity AS DECIMAL(14,2))) AS DOUBLE)
               AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%ring%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    tags=("relational", "join", "agg"),
)
def rl_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped: product-type profit by nation and year — the
    5-table star flake with a name-substring part filter.  Without a
    partsupp table, unit cost is p_retailprice (profit = discounted
    revenue − retailprice·qty — same expression tree as Q9's
    ps_supplycost form, real columns).

    Plan for 100 TB: the %ring% part filter broadcasts into the fact
    scan FIRST (it cuts lineitem to the matching-part fraction before
    anything else); supplier→nation broadcast; the one genuinely large
    join is lineitem⋈orders on orderkey — a shuffle join on the fact's
    natural key, which bucketing by orderkey co-locates at rest.
    Profit accumulates in exact DECIMAL; the (nation, year) group key
    space is model-size so the final aggregation is map-side combined
    down to ~nations×years rows."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("ring"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    profit = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", 5, 2)) - _dec(
        "p_retailprice"
    ) * _dec("l_quantity")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def _q9_bucketed_join(spark: SparkSession, sf_dir: str, buckets: int = 16) -> DataFrame:
    """The Q9 join tree over AT-REST BUCKETED facts: lineitem and orders
    are persisted as catalog tables bucketed (and sorted) on their
    orderkey with the same bucket count, so the one genuinely large
    exchange in ``rl_product_type_profit`` — the lineitem⋈orders shuffle
    — is satisfied from disk: NO Exchange above either scan
    (plan-asserted in ``test_bucketed_join.test_q9_bucketed_fact_join_
    has_no_shuffle``).  Dims still broadcast, and broadcast joins
    preserve the streamed side's bucketing, so the part/supplier/nation
    enrichment rides between the scan and the merge join without
    re-clustering.  The merge hint pins the scale-representative
    SortMergeJoin at test scale, where orders would otherwise fit under
    the broadcast threshold.

    The table write here is the DEMO of the layout; at warehouse scale
    the bucketed facts are maintained once by ingestion/compaction and
    amortized over every orderkey join.  Tables are tagged by the
    sf_dir basename PLUS a filesystem fingerprint of the source parquet
    (file names, sizes, mtimes — no data scan), so a regenerated
    sf_dir is rebuilt even when its ROW COUNT is unchanged (TPC-H
    cardinalities are a pure function of SF, so a count check alone
    would silently serve stale data after a same-cardinality fixture
    refresh)."""
    import hashlib
    import os
    import re

    from data_engineering_project_utn_spark.sources.io import (
        table_exists,
        write_bucketed_table,
    )

    def _fs_fingerprint(path: str) -> str:
        parts = []
        if os.path.isdir(path):
            for fn in sorted(os.listdir(path)):
                st = os.stat(os.path.join(path, fn))
                parts.append((fn, st.st_size, st.st_mtime_ns))
        else:
            st = os.stat(path)
            parts.append((os.path.basename(path), st.st_size, st.st_mtime_ns))
        return hashlib.md5(repr(parts).encode()).hexdigest()[:8]

    tag = re.sub(r"[^0-9a-zA-Z]+", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1])
    facts = {}
    for tbl, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        src = load_table(spark, sf_dir, tbl)
        fp = _fs_fingerprint(f"{sf_dir}/{tbl}.parquet")
        name = f"q9_{tbl}_bkt_{tag}_{fp}"
        if table_exists(spark, name):
            facts[tbl] = spark.table(name)
        else:
            facts[tbl] = write_bucketed_table(spark, src, name, buckets, key)
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("ring"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    li, o = facts["lineitem"], facts["orders"]
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(o.hint("merge"), li["l_orderkey"] == o["o_orderkey"])
    )


@register(
    "rl_product_type_profit_bucketed",
    priority=1,
    oracle="""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(14,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(5,2)))
                    - CAST(p.p_retailprice AS DECIMAL(14,2))
                      * CAST(l.l_quantity AS DECIMAL(14,2))) AS DOUBLE)
               AS sum_profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%ring%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    tags=("relational", "join", "agg", "bucketed", "scale-twin"),
)
def rl_product_type_profit_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``rl_product_type_profit`` (TPC-H Q9 shape) over AT-REST BUCKETED
    facts — the co-location demo VERDICT r10 #2 asked for, sharing the
    anchor's oracle verbatim: bucketing is a physical layout choice and
    must not move a single value.

    Plan at any scale: two bucketed scans, three broadcast dims, one
    exchange-free SortMergeJoin on orderkey, then ONE hash exchange for
    the model-size (nation, year) aggregate — vs the anchor's plan where
    the orderkey join re-shuffles the entire fact (1.47×/2× at sf2→sf4,
    the repo's largest exchange; SCALE.md Q9 row)."""
    profit = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", 5, 2)) - _dec(
        "p_retailprice"
    ) * _dec("l_quantity")
    return (
        _q9_bucketed_join(spark, sf_dir)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "rl_parts_supplier_counts",
    priority=1,
    oracle="""
    WITH excl AS (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM excl)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("relational", "join", "distinct-agg", "anti-join"),
)
def rl_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped: supplier counts per (brand, type, size) with a
    NOT-IN supplier exclusion — the countDistinct-over-join +
    broadcast ANTI-join shape.  The partsupp bridge derives from
    lineitem (l_partkey, l_suppkey); the 'customer complaints' exclusion
    becomes the negative-balance suppliers (real column, same anti-join
    plan).

    Plan for 100 TB: part's brand/type/size-IN filters broadcast into
    the fact (row-group pruning on the IN-list); the excluded-supplier
    set is a broadcast LEFT-ANTI (a NOT IN on a nullable key would need
    a null-safe anti join — suppkeys are non-null here, asserted by the
    schema); COUNT(DISTINCT) goes through Spark's two-phase distinct
    aggregation — partial distinct on (group, suppkey) map-side, so the
    exchange carries unique pairs, not raw fact rows."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    excl = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(excl), li["l_suppkey"] == excl["s_suppkey"], "left_anti")
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )
