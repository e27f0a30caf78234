"""Relational query surface over the TPC-H-ish star schema (SURVEY §7.1
extensions: scans / filters / projections / equi+semi+anti+outer joins /
aggregations / windows / sort-limit / set ops / rollup / distinct aggs).

All DataFrame-API; Catalyst handles pushdown, join strategy (dims broadcast),
and AQE. Numeric outputs rounded per the catalog normalization contract.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import load, register

@register(
    "q_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 6) AS avg_qty,
           ROUND(AVG(l_extendedprice), 6) AS avg_price,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan + filter + wide groupBy agg (flagship agg path).
    Plan check: filter pushed to parquet, partial aggregation map-side."""
    li = load(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q_top_revenue_orders",
    oracle="""
    SELECT o.o_orderkey,
           STRFTIME(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q_top_revenue_orders(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join + agg + top-k order/limit, with the
    revenue aggregation PUSHED BELOW the join (eager aggregation —
    Catalyst doesn't do this rewrite itself): lineitem reduces to one row
    per orderkey first (map-side-combinable, and lineitem files cluster by
    orderkey so the combine bites), then the join moves |orders| narrow
    rows instead of |lineitem| wide ones — 4-6x less shuffle at any scale.
    Legal because o_orderkey is the orders PK: grouping by it alone
    already determines (orderdate, priority), which join back on afterward.
    Customer is the smaller side but still scales with SF (~3 M rows at
    sf100 even after the 1/5 segment filter), so no broadcast hint — AQE
    picks broadcast at small SF and degrades gracefully to a shuffle join
    at scale."""
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    li_rev = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .alias("rev")
    )
    return (
        li_rev.join(o, li_rev.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
            F.round(F.col("rev"), 2).alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


@register(
    "q_nation_revenue",
    oracle="""
    SELECT n.n_name AS nation,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY 1
    """,
)
def q_nation_revenue(spark, sf_dir):
    """TPC-H Q5 shape: star join through two broadcastable dims."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q_semi_join_customers",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 200000)
    GROUP BY 1
    """,
)
def q_semi_join_customers(spark, sf_dir):
    """Left-semi join (EXISTS)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 200000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


@register(
    "q_anti_join_customers",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY 1
    """,
)
def q_anti_join_customers(spark, sf_dir):
    """Left-anti join (NOT EXISTS) — customers who never ordered."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


@register(
    "q_outer_join_counts",
    oracle="""
    SELECT o.o_orderstatus, COUNT(l.l_orderkey) AS n_items, COUNT(*) AS n_rows
    FROM orders o LEFT JOIN lineitem l
      ON o.o_orderkey = l.l_orderkey AND l.l_quantity > 45
    GROUP BY 1
    """,
)
def q_outer_join_counts(spark, sf_dir):
    """Left-outer join with a join-side predicate; COUNT(col) vs COUNT(*)
    null semantics."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left")
        .groupBy("o_orderstatus")
        .agg(
            F.count("l_orderkey").alias("n_items"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "q_window_topk_orders",
    oracle="""
    SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS totalprice, rk
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rk
          FROM orders)
    WHERE rk <= 3
    """,
)
def q_window_topk_orders(spark, sf_dir):
    """Per-group top-k via row_number window (W2/A6 pattern at relational
    scale). Deterministic tie-break on o_orderkey."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select(
            "o_custkey", "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"), "rk",
        )
    )


@register(
    "q_running_totals",
    oracle="""
    SELECT o_custkey,
           epoch_ms(o_orderdate) AS orderdate_ms,
           o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS UNBOUNDED PRECEDING), 2) AS running_spend
    FROM orders WHERE o_custkey < 200
    """,
)
def q_running_totals(spark, sf_dir):
    """Running sum window (W3-family LOCF/cumsum machinery)."""
    o = load(spark, sf_dir, "orders").where(F.col("o_custkey") < 200)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return o.select(
        "o_custkey",
        F.unix_millis("o_orderdate").alias("orderdate_ms"),
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@register(
    "q_distinct_aggs",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY 1
    """,
)
def q_distinct_aggs(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    )


@register(
    "q_set_ops",
    oracle="""
    SELECT 'only_lineitem' AS side, COUNT(*) AS n FROM (
        SELECT DISTINCT l_partkey AS k FROM lineitem
        EXCEPT
        SELECT p_partkey AS k FROM part WHERE p_size > 25
    )
    UNION ALL
    SELECT 'both' AS side, COUNT(*) AS n FROM (
        SELECT DISTINCT l_partkey AS k FROM lineitem
        INTERSECT
        SELECT p_partkey AS k FROM part WHERE p_size > 25
    )
    """,
)
def q_set_ops(spark, sf_dir):
    """EXCEPT / INTERSECT / UNION ALL (U1/U2)."""
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("k")
    ).distinct()
    p = load(spark, sf_dir, "part").where(F.col("p_size") > 25).select(
        F.col("p_partkey").alias("k")
    )
    only = li.subtract(p).select(
        F.lit("only_lineitem").alias("side")
    ).groupBy("side").agg(F.count("*").alias("n"))
    both = li.intersect(p).select(F.lit("both").alias("side")) \
        .groupBy("side").agg(F.count("*").alias("n"))
    return only.unionByName(both)


@register(
    "q_rollup_pricing",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup_pricing(spark, sf_dir):
    """ROLLUP grouping sets (free from Spark SQL; absent in the reference)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
             F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty", "n",
        )
    )


@register(
    "q_conditional_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending,
           ROUND(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 2) AS open_value
    FROM orders GROUP BY 1
    """,
)
def q_conditional_pivot(spark, sf_dir):
    """Pivot-style conditional aggregation (P4-family predicates + A-family)."""
    o = load(spark, sf_dir, "orders")
    def n_status(s):
        return F.sum(F.when(F.col("o_orderstatus") == s, 1).otherwise(0))
    return o.groupBy("o_orderpriority").agg(
        n_status("O").alias("n_open"),
        n_status("F").alias("n_filled"),
        n_status("P").alias("n_pending"),
        F.round(
            F.sum(F.when(F.col("o_orderstatus") == "O",
                         F.col("o_totalprice")).otherwise(0.0)), 2
        ).alias("open_value"),
    )


@register(
    "q_orders_per_month",
    oracle="""
    SELECT STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS month,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS month_value
    FROM orders GROUP BY 1
    """,
)
def q_orders_per_month(spark, sf_dir):
    """Calendar extraction + group (T6/A3 analog on relational data)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd")
            .alias("month")
        )
        .agg(F.count("*").alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("month_value"))
    )


@register(
    "q_above_customer_avg",
    oracle="""
    SELECT o.o_custkey, COUNT(*) AS n_above
    FROM orders o
    JOIN (SELECT o_custkey, AVG(o_totalprice) AS avg_price
          FROM orders GROUP BY 1) a
      ON o.o_custkey = a.o_custkey
    WHERE o.o_totalprice > a.avg_price
    GROUP BY 1
    """,
)
def q_above_customer_avg(spark, sf_dir):
    """Correlated-subquery shape rewritten as join-with-aggregate."""
    o = load(spark, sf_dir, "orders")
    avg = o.groupBy("o_custkey").agg(F.avg("o_totalprice").alias("avg_price"))
    return (
        o.join(avg, "o_custkey")
        .where(F.col("o_totalprice") > F.col("avg_price"))
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_above"))
    )


@register(
    "q_string_funcs_part",
    oracle="""
    SELECT UPPER(SPLIT_PART(p_type, ' ', 1)) AS type_head,
           SUBSTR(p_brand, 1, 6) AS brand_head,
           COUNT(*) AS n_parts,
           ROUND(AVG(p_retailprice), 6) AS avg_price,
           ROUND(AVG(LENGTH(p_name)), 6) AS avg_name_len
    FROM part GROUP BY 1, 2
    """,
)
def q_string_funcs_part(spark, sf_dir):
    """String scalar functions (F1/F2-family): split/upper/substr/length."""
    p = load(spark, sf_dir, "part")
    return (
        p.groupBy(
            F.upper(F.split(F.col("p_type"), " ").getItem(0)).alias("type_head"),
            F.substring("p_brand", 1, 6).alias("brand_head"),
        )
        .agg(
            F.count("*").alias("n_parts"),
            F.round(F.avg("p_retailprice"), 6).alias("avg_price"),
            F.round(F.avg(F.length("p_name")), 6).alias("avg_name_len"),
        )
    )


@register(
    "q_order_size_distribution",
    oracle="""
    SELECT n_items, COUNT(*) AS n_orders
    FROM (SELECT l_orderkey, COUNT(*) AS n_items
          FROM lineitem GROUP BY 1)
    GROUP BY 1
    """,
)
def q_order_size_distribution(spark, sf_dir):
    """TPC-H Q13 shape: distribution of per-order item counts (aggregate of
    an aggregate — two keyed shuffles, second one tiny)."""
    li = load(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(F.count("*").alias("n_items"))
    return per_order.groupBy("n_items").agg(F.count("*").alias("n_orders"))


@register(
    "q_large_volume_customers",
    oracle="""
    SELECT c.c_name, o.o_orderkey,
           STRFTIME(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           ROUND(o.o_totalprice, 2) AS totalprice,
           ROUND(t.total_qty, 2) AS total_qty
    FROM (SELECT l_orderkey, SUM(l_quantity) AS total_qty
          FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 300) t
    JOIN orders o ON o.o_orderkey = t.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def q_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 shape: HAVING-filtered aggregate semi-joined back through
    orders to customers. The broadcast-able side is `big` — the HAVING
    filter (qty > 300) keeps a few hundred rows at any SF — NOT customer,
    which grows with SF (~15 M rows at sf100)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 300)
    )
    return (
        o.join(F.broadcast(big), big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
        )
    )


@register(
    "q_brand_supplier_counts",
    oracle="""
    SELECT p.p_brand,
           CASE WHEN p.p_size < 10 THEN 'small'
                WHEN p.p_size < 30 THEN 'medium'
                ELSE 'large' END AS size_band,
           COUNT(DISTINCT l.l_suppkey) AS n_suppliers,
           COUNT(*) AS n_lineitems
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1, 2
    """,
)
def q_brand_supplier_counts(spark, sf_dir):
    """TPC-H Q16 shape: distinct-count per banded dimension attributes.
    Part is unfiltered and scales with SF (~20 M rows at sf100) — no
    broadcast hint; AQE decides per actual size."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    band = (
        F.when(F.col("p_size") < 10, "small")
        .when(F.col("p_size") < 30, "medium")
        .otherwise("large")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", band.alias("size_band"))
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.count("*").alias("n_lineitems"),
        )
    )


@register(
    "q_customer_recency",
    oracle="""
    SELECT o_custkey,
           STRFTIME(MAX(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS last_order,
           DATE_DIFF('day', MIN(CAST(o_orderdate AS DATE)),
                     MAX(CAST(o_orderdate AS DATE))) AS active_days,
           COUNT(*) AS n_orders
    FROM orders GROUP BY 1
    """,
)
def q_customer_recency(spark, sf_dir):
    """Date arithmetic: per-customer order recency span (datediff on DATE
    granularity, identical truncation on both engines)."""
    o = load(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.groupBy("o_custkey").agg(
        F.date_format(F.max(d), "yyyy-MM-dd").alias("last_order"),
        F.datediff(F.max(d), F.min(d)).alias("active_days"),
        F.count("*").alias("n_orders"),
    )


@register(
    "q_month_over_month",
    oracle="""
    WITH m AS (
        SELECT STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS month,
               SUM(o_totalprice) AS rev
        FROM orders GROUP BY 1
    )
    SELECT month,
           ROUND(rev, 2) AS revenue,
           ROUND(rev - LAG(rev) OVER (ORDER BY month), 2) AS delta,
           ROUND((rev - LAG(rev) OVER (ORDER BY month))
                 / LAG(rev) OVER (ORDER BY month) * 100, 4) AS pct_change
    FROM m
    """,
)
def q_month_over_month(spark, sf_dir):
    """Month-over-month revenue deltas: aggregate then lag window (tiny
    post-agg window — single partition is fine at months-cardinality)."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd")
        .alias("month")
    ).agg(F.sum("o_totalprice").alias("rev"))
    w = Window.orderBy("month")
    prev = F.lag("rev").over(w)
    return m.select(
        "month",
        F.round("rev", 2).alias("revenue"),
        F.round(F.col("rev") - prev, 2).alias("delta"),
        F.round((F.col("rev") - prev) / prev * 100, 4).alias("pct_change"),
    )


@register(
    "q_supplier_balance_band",
    oracle="""
    SELECT n_name AS nation,
           CASE WHEN s_acctbal < 0 THEN 'neg'
                WHEN s_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS band,
           COUNT(*) AS n_suppliers,
           ROUND(SUM(s_acctbal), 2) AS total_bal
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY 1, 2
    """,
)
def q_supplier_balance_band(spark, sf_dir):
    """CASE banding + broadcast dim join."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    band = (
        F.when(F.col("s_acctbal") < 0, "neg")
        .when(F.col("s_acctbal") < 5000, "low")
        .otherwise("high")
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), band.alias("band"))
        .agg(F.count("*").alias("n_suppliers"),
             F.round(F.sum("s_acctbal"), 2).alias("total_bal"))
    )


@register(
    "q_priority_shipping",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
)
def q_priority_shipping(spark, sf_dir):
    """TPC-H Q12 shape: fact-fact join + CASE-split counts over a date
    window. The shipdate range predicate pushes to the parquet scan; the
    CASE aggregation is a single map-side partial agg after the join."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q_promo_revenue",
    oracle="""
    SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_pct,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01'
    """,
)
def q_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: conditional-share ratio (promo revenue %) in one
    pass — no self-join, just two conditional sums. The month predicate
    prunes lineitem at the scan; part is unfiltered and SF-scaled, so the
    join strategy is left to AQE (no broadcast hint)."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_pct"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q_small_qty_revenue",
    oracle="""
    WITH part_avg AS (
      SELECT l_partkey, AVG(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
           COUNT(*) AS n_items
    FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN part_avg a ON l.l_partkey = a.l_partkey
    WHERE p.p_brand = 'Brand#13'
      AND l.l_quantity < 0.2 * a.avg_qty
    """,
)
def q_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: correlated per-part average (small-quantity orders).
    The per-part AVG is a window over l_partkey — one shuffle keyed by
    partkey, no join-back of an aggregated copy of lineitem. The brand
    filter keeps ~1/25 of part, which still scales with SF — AQE picks the
    join strategy from the filtered runtime size (no forced hint)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#13")
    w = Window.partitionBy("l_partkey")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .withColumn("avg_qty", F.avg("l_quantity").over(w))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q_disjunctive_pred",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#20' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 10 AND 40)
       OR (p.p_brand = 'Brand#7' AND p.p_size BETWEEN 20 AND 40
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
)
def q_disjunctive_pred(spark, sf_dir):
    """TPC-H Q19 shape: disjunction of conjunctive brand/size/quantity
    clauses across both join sides. Catalyst extracts the common join key
    (hash join, not BNLJ) and pushes the per-table residuals of the OR
    down each scan. Part is unfiltered and SF-scaled — no broadcast hint."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = li.join(p, li.l_partkey == p.p_partkey)
    clause = (
        (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#20")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 40)
        )
        | (
            (F.col("p_brand") == "Brand#7")
            & F.col("p_size").between(20, 40)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return j.where(clause).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count("*").alias("n_items"),
    )


@register(
    "q_idle_rich_customers",
    oracle="""
    WITH cutoff AS (
      SELECT AVG(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_nationkey,
           COUNT(*) AS numcust,
           ROUND(SUM(c.c_acctbal), 2) AS totacctbal
    FROM customer c, cutoff
    WHERE c.c_acctbal > cutoff.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY 1
    """,
)
def q_idle_rich_customers(spark, sf_dir):
    """TPC-H Q22 shape: scalar subquery threshold (global avg of positive
    balances — a broadcastable 1-row agg via crossJoin) + anti-join against
    recent orders, grouped rollup of the survivors (every synthetic customer
    has *some* order, so the anti-join is time-windowed to stay selective)."""
    c = load(spark, sf_dir, "customer")
    o = (
        load(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    cutoff = c.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(cutoff))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "q_bilateral_volume",
    oracle="""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(YEAR(l.l_shipdate) AS INT) AS ship_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS volume
    FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
      JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
       OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    """,
)
def q_bilateral_volume(spark, sf_dir):
    """TPC-H Q7 shape: six-way join with the nation dim joined twice under
    different roles, disjunctive nation-pair predicate, per-year rollup.
    Both nation copies broadcast; the fact-fact joins shuffle on their
    keys and AQE handles the post-filter size drop."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("volume")
        )
    )


@register(
    "q_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           COUNT(*) AS n_rows,
           GROUPING(l_returnflag) AS g_flag,
           GROUPING(l_linestatus) AS g_status
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag), (l_linestatus))
    """,
)
def q_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (the shape rollup/cube can't express: an
    arbitrary subset of grouping combinations) + GROUPING() markers to
    disambiguate the NULL-as-total rows. Spark expands this to a single
    Expand + one keyed aggregation — one shuffle for all three groupings."""
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("__li_gs")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               COUNT(*) AS n_rows,
               CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS INT) AS g_status
        FROM __li_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), (l_linestatus))
    """)


@register(
    "q_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS forecast_revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1995-01-01'
      AND l_shipdate <  DATE '1996-01-01'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 24
    """,
)
def q_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: single-scan filtered aggregation — the pure
    predicate-pushdown + map-side-combine baseline (every predicate reaches
    the parquet scan; no shuffle beyond the 1-row final agg)."""
    li = load(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= "1995-01-01")
        & (F.col("l_shipdate") < "1996-01-01")
        & F.col("l_discount").between(0.02, 0.06)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
        .alias("forecast_revenue")
    )


@register(
    "q_order_priority_checks",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate <  DATE '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY 1
    """,
)
def q_order_priority_checks(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS decorrelated to a left-semi join with a
    non-equi residual (lineitem shipped >60 days after the order date —
    the reference dataset has no commitdate, so the late predicate is
    shipdate-vs-orderdate). The semi join is keyed on l_orderkey, so at
    scale it is one co-partitioned shuffle; the date filter prunes orders
    at the scan."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    o = o.where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-07-01")
    )
    late = o.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.date_add("o_orderdate", 60)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders")
    )


@register(
    "q_top_supplier_revenue",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey AS suppkey,
               SUM(l_extendedprice * (1 - l_discount)) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= DATE '1996-01-01'
          AND l_shipdate <  DATE '1996-04-01'
        GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, ROUND(r.total_rev, 2) AS total_rev
    FROM rev r JOIN supplier s ON s.s_suppkey = r.suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    """,
)
def q_top_supplier_revenue(spark, sf_dir):
    """TPC-H Q15 shape: per-supplier quarterly revenue, keep the
    supplier(s) at the maximum (scalar subquery against the same
    aggregate). The 1-row max broadcasts; the revenue agg is one keyed
    shuffle; supplier is a broadcastable dim at any SF where suppliers
    fit (they do not scale with lineitem) — left to AQE."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    rev = (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("total_rev"))
    )
    mx = rev.agg(F.max("total_rev").alias("__mx"))
    return (
        rev.join(F.broadcast(mx), F.col("total_rev") == F.col("__mx"))
        .join(s, F.col("s_suppkey") == F.col("suppkey"))
        .select("s_suppkey", "s_name",
                F.round("total_rev", 2).alias("total_rev"))
    )


@register(
    "q_blame_suppliers",
    oracle="""
    WITH l1 AS (
        SELECT l_orderkey, l_suppkey, l_shipdate FROM lineitem
    )
    SELECT n.n_name, COUNT(*) AS n_blamed
    FROM l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE EXISTS (
        SELECT 1 FROM l1 l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
    )
    AND NOT EXISTS (
        SELECT 1 FROM l1 l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate >= l1.l_shipdate
    )
    GROUP BY 1
    """,
)
def q_blame_suppliers(spark, sf_dir):
    """TPC-H Q21 shape (the decorrelation stress test): in multi-supplier
    orders, blame the supplier whose line shipped STRICTLY last — EXISTS
    (another supplier in the order) decorrelates to a left-semi join and
    NOT EXISTS (another supplier shipped at-or-after me) to a left-anti
    join, both keyed on l_orderkey with non-equi residuals; blamed counts
    roll up per nation through broadcastable dims. No window over the full
    lineitem stream; the two correlated joins are co-partitioned
    order-keyed shuffles."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2"),
    )
    l3 = li.select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("d3"),
    )
    multi = li.join(
        l2,
        (F.col("l_orderkey") == F.col("o2"))
        & (F.col("l_suppkey") != F.col("s2")),
        "left_semi",
    )
    last = multi.join(
        l3,
        (F.col("l_orderkey") == F.col("o3"))
        & (F.col("l_suppkey") != F.col("s3"))
        & (F.col("d3") >= F.col("l_shipdate")),
        "left_anti",
    )
    return (
        # supplier is SF-scaled — no broadcast hint (AQE broadcasts while
        # small); nation is bounded and may keep its hint
        last.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(F.count("*").alias("n_blamed"))
    )


@register(
    "q_min_cost_supplier",
    oracle="""
    WITH regional AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    offers AS (
      SELECT l.l_partkey, rs.s_suppkey, rs.s_name, rs.s_acctbal, rs.n_name,
             MIN(l.l_extendedprice / l.l_quantity) AS unit_cost
      FROM lineitem l JOIN regional rs ON l.l_suppkey = rs.s_suppkey
      GROUP BY 1, 2, 3, 4, 5
    ),
    ranked AS (
      SELECT o.*, ROW_NUMBER() OVER (
               PARTITION BY l_partkey ORDER BY unit_cost, s_suppkey
             ) AS rn
      FROM offers o
    )
    SELECT p.p_partkey, p.p_name, r.s_name, r.n_name,
           ROUND(r.s_acctbal, 2) AS s_acctbal,
           r.unit_cost AS unit_cost
    FROM ranked r JOIN part p ON r.l_partkey = p.p_partkey
    WHERE r.rn = 1 AND p.p_size BETWEEN 10 AND 20
    ORDER BY s_acctbal DESC, p_partkey
    LIMIT 20
    """,
)
def q_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (no partsupp table in this schema — the observed
    lineitem unit price l_extendedprice/l_quantity stands in for
    ps_supplycost): for each part, the cheapest supplier within one region.
    The reference's correlated `MIN(ps_supplycost)` subquery (SURVEY §2 J-class
    correlated lookup) is decorrelated into HASH-ONLY aggregation — no
    sort-window, no SortAggregate (min over a struct falls out of
    Tungsten's hash path; measured as the residual cost of the window
    formulation at the 10x corpus):

    1. per-(part,supp) min unit cost          (numeric-key HashAggregate —
       the fact-table reduction happens in Tungsten's hash path with
       map-side combine; this is the stage that must be cheap at 100 TB)
    2. per-part lexicographic min(struct(cost, suppkey)) over the
       ALREADY-REDUCED offers — identical winner to the ROW_NUMBER-over-
       (cost, suppkey) oracle (a supplier's per-supp min equals the
       global min iff one of its rows does); struct-min is a
       SortAggregate, which is fine HERE because it sorts |part×supp|
       reduced rows, never the fact table.

    The EUROPE supplier slice rides INSIDE the lazy plan (r12, verdict
    #5 — the curation fold-in recipe): the nation⨝region key set (BOUNDED
    dim, ≤25 rows) is a broadcast build side of a left-semi join on the
    supplier scan, so no blocking driver collect runs before the query's
    own action (the old memoized collect skipped that job on repeat
    builds, which under the bench's drop-first protocol hid a scan job
    run 1 paid). The supplier side stays dim-sized after the semi-join,
    so the initial plan still broadcasts the lineitem⨝supplier join
    natively (plan-gated); at extreme SF the supplier stats grow and the
    join degrades to a keyed shuffle join, which is the correct
    behavior."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(F.col("p_size").between(10, 20))
    eu_keys = n.join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    ).select("n_nationkey")
    rs = s.join(
        F.broadcast(eu_keys),
        s.s_nationkey == eu_keys.n_nationkey,
        "left_semi",
    )
    # the winner-attribute side needs NO region slice: `offers` admits only
    # EUROPE suppliers, so every win_suppkey the inner join below can match
    # is already EUROPE — joining the unsliced supplier⨝nation attaches
    # identical attributes without a second eu_keys broadcast subtree
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", "s_name", "s_acctbal", "n_name"
    )
    offers = (
        li.join(rs.select("s_suppkey"), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("c")
        )
    )
    best = (
        offers.groupBy("l_partkey")
        .agg(
            F.min(
                F.struct(
                    F.col("c").alias("unit_cost"),
                    F.col("l_suppkey").alias("k"),
                )
            ).alias("m")
        )
        .select(
            "l_partkey",
            F.col("m.unit_cost").alias("unit_cost"),
            F.col("m.k").alias("win_suppkey"),
        )
    )
    return (
        best.join(sn, best.win_suppkey == F.col("s_suppkey"))
        .join(p, best.l_partkey == p.p_partkey)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            F.round("s_acctbal", 2).alias("s_acctbal"),
            F.col("unit_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "p_partkey")
        .limit(20)
    )


@register(
    "q_market_share",
    oracle="""
    SELECT CAST(YEAR(o.o_orderdate) AS INT) AS order_year,
           ROUND(SUM(CASE WHEN sn.n_name = 'NATION_1'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS mkt_share,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS total_volume
    FROM lineitem l
      JOIN part p     ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
      JOIN region r   ON cn.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_market_share(spark, sf_dir):
    """TPC-H Q8 shape: national market share — the classic
    `SUM(CASE WHEN supp_nation = X)/SUM(ALL)` conditional-aggregate
    decorrelation of a per-year nested subquery, over an 8-way join with
    nation in two roles. Bounded dims (nation×2, region) broadcast; part and
    supplier are SF-scaled fact-side shuffles; one final groupBy on year."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_regionkey").alias("cn_regionkey"),
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_regionkey") == F.col("r_regionkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share"),
            F.round(F.sum(vol), 2).alias("total_volume"),
        )
        .orderBy("order_year")
    )


@register(
    "q_product_profit",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(YEAR(o.o_orderdate) AS INT) AS order_year,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                     - 0.6 * p.p_retailprice * l.l_quantity), 2) AS profit
    FROM lineitem l
      JOIN part p     ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY 1, 2
    ORDER BY nation, order_year DESC
    """,
)
def q_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: product-line profit by nation and year (no partsupp:
    cost is proxied as 60% of p_retailprice × quantity). Wildcard LIKE on
    p_name is a non-sargable filter evaluated post-scan on the part dim;
    profit expression is computed fact-side inside whole-stage codegen,
    then one (nation, year) groupBy."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("order_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("profit"))
        .orderBy("nation", F.col("order_year").desc())
    )


@register(
    "q_returned_item_losses",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           ROUND(c.c_acctbal, 2) AS c_acctbal,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS lost_revenue
    FROM customer c
      JOIN orders o   ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2, 3, 4
    ORDER BY lost_revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_returned_item_losses(spark, sf_dir):
    """TPC-H Q10 shape: returned-item revenue loss, top-20 customers in one
    quarter. Both time filter (sargable, pushed to the orders scan) and the
    returnflag filter (pushed to the lineitem scan) land in PushedFilters;
    top-k via TakeOrderedAndProject, never a global sort."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation"),
            F.round("c_acctbal", 2).alias("c_acctbal"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("lost_revenue")
        )
        .orderBy(F.col("lost_revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q_important_parts",
    oracle="""
    WITH natl AS (
      SELECT l.l_partkey,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))
                 * (1 - CAST(l.l_discount AS DECIMAL(18,6)))) AS value
      FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
      GROUP BY 1
    ),
    tot AS (SELECT SUM(value) AS total, COUNT(*) AS n_parts FROM natl)
    SELECT n.l_partkey, CAST(ROUND(n.value, 2) AS DOUBLE) AS value
    FROM natl n, tot t
    WHERE 2 * n.value * t.n_parts > 3 * t.total
    ORDER BY value DESC, l_partkey
    """,
)
def q_important_parts(spark, sf_dir):
    """TPC-H Q11 shape: per-part value within one nation, kept only above a
    global-scalar threshold (HAVING > scalar subquery over the SAME agg;
    1.5x the mean per-part value, so the predicate is SF-invariant).
    Decorrelated by materializing the per-part agg ONCE (localCheckpoint) so
    the scalar total and the filter both read it without recomputing the
    3-way join, then crossJoin-broadcasting the 1-row total.

    Money math is DECIMAL, not double: per-part sums land near cent
    boundaries often enough that double summation order flips ROUND's
    last cent between engines (observed at sf0.1); decimal aggregation is
    exact and order-independent, and the threshold compares in
    multiplicative integer form (2·value·n > 3·total) so no division
    rounding exists at all. Output cast to DOUBLE after the exact round."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    dim = n.join(r, n.n_regionkey == r.r_regionkey)
    value = F.sum(
        F.col("l_extendedprice").cast("decimal(18,6)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,6)"))
    ).alias("value")
    natl = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(dim), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(value)
        .localCheckpoint(eager=False)  # one physical pass feeds both consumers
    )
    total = natl.agg(
        F.sum("value").alias("__total"), F.count("*").alias("__n")
    )
    return (
        natl.crossJoin(F.broadcast(total))
        .where(2 * F.col("value") * F.col("__n") > 3 * F.col("__total"))
        .select(
            "l_partkey",
            F.round("value", 2).cast("double").alias("value"),
        )
        .orderBy(F.col("value").desc(), "l_partkey")
    )


@register(
    "q_promo_candidate_suppliers",
    oracle="""
    WITH part_totals AS (
      SELECT l_partkey, SUM(l_quantity) AS total_qty,
             COUNT(DISTINCT l_suppkey) AS n_supp
      FROM lineitem GROUP BY 1
    ),
    supp_part AS (
      SELECT l.l_suppkey, l.l_partkey, SUM(l.l_quantity) AS supp_qty
      FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_name LIKE 'red%'
      GROUP BY 1, 2
    )
    SELECT DISTINCT s.s_name, n.n_name AS nation
    FROM supp_part sp
      JOIN part_totals pt ON sp.l_partkey = pt.l_partkey
      JOIN supplier s ON sp.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE sp.supp_qty * pt.n_supp > 2.0 * pt.total_qty
    ORDER BY s_name
    """,
)
def q_promo_candidate_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: nested semi-join ladder — suppliers who shipped more
    than 2× the average supplier's share of a part's volume, for parts
    matching a name prefix (peer-relative threshold, so the predicate stays
    selective-but-nonempty at every SF). The reference's doubly-nested IN
    subqueries decorrelate into two keyed aggregates joined on partkey. Both
    aggs shuffle on (partkey[, suppkey]) — co-partitioned by AQE; no window,
    no correlated re-scan."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    part_totals = li.groupBy("l_partkey").agg(
        F.sum("l_quantity").alias("total_qty"),
        F.count_distinct("l_suppkey").alias("n_supp"),
    )
    supp_part = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
    )
    return (
        supp_part.join(part_totals, "l_partkey")
        .where(F.col("supp_qty") * F.col("n_supp") > 2.0 * F.col("total_qty"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", F.col("n_name").alias("nation"))
        .distinct()
        .orderBy("s_name")
    )


@register(
    "q_part_skyline",
    oracle="""
    WITH pp AS (
        SELECT p_brand, p_retailprice, MIN(p_size) AS minsz
        FROM part GROUP BY 1, 2
    ),
    r AS (
        SELECT p_brand, p_retailprice, minsz,
               MIN(minsz) OVER (PARTITION BY p_brand ORDER BY p_retailprice
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
        FROM pp
    ),
    s AS (
        SELECT p_brand, p_retailprice, minsz,
               LAG(run) OVER (
                   PARTITION BY p_brand ORDER BY p_retailprice) AS a
        FROM r
    )
    SELECT p.p_brand, p.p_partkey,
           ROUND(p.p_retailprice, 2) AS price,
           CAST(p.p_size AS BIGINT) AS p_size
    FROM part p JOIN s ON p.p_brand = s.p_brand
                      AND p.p_retailprice = s.p_retailprice
    WHERE NOT ((s.a IS NOT NULL AND s.a <= p.p_size)
               OR s.minsz < p.p_size)
    """,
)
def q_part_skyline(spark, sf_dir):
    """Per-brand SKYLINE (Pareto frontier) on minimize(retail price,
    size): a part survives iff no same-brand part is <= on both
    dimensions and < on one — the multi-criteria shortlist operator
    (Börzsönyi et al., "The Skyline Operator", ICDE 2001) that price/
    perf product pickers run. NO pairwise dominance join: the 2-D case
    collapses to prefix-minima — per (brand, price) the min size, a
    running min over price order, and its LAG as the strict-prefix min;
    dominated(p) <=> strict_prefix_min <= p.size OR same_price_min <
    p.size. Both engines evaluate the identical window algebra, so the
    frontier membership is value-gated exactly.

    Scale shape: one keyed (brand, price) aggregate, two window passes
    KEYED BY BRAND (the frontier of each brand is independent — no
    global sort), one keyed join back to parts. The classic O(n²)
    block-nested-loop skyline never appears; cost is two exchanges on
    the same brand key."""
    p = load(spark, sf_dir, "part")
    pp = p.groupBy("p_brand", "p_retailprice").agg(
        F.min("p_size").alias("minsz")
    )
    wb = Window.partitionBy("p_brand").orderBy("p_retailprice")
    s = (
        pp.withColumn(
            "run",
            F.min("minsz").over(wb.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn("a", F.lag("run").over(wb))
    )
    dominated = (
        (F.col("a").isNotNull() & (F.col("a") <= F.col("p_size")))
        | (F.col("minsz") < F.col("p_size"))
    )
    return (
        p.join(s, ["p_brand", "p_retailprice"])
        .where(~dominated)
        .select(
            "p_brand", "p_partkey",
            F.round("p_retailprice", 2).alias("price"),
            F.col("p_size").cast("bigint").alias("p_size"),
        )
    )


@register(
    "q_order_market_basket",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
          FROM items),
    pc AS (
        SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_part
        FROM items GROUP BY 1
    ),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               CAST(COUNT(*) AS BIGINT) AS support_ab
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING COUNT(*) >= 3
    )
    SELECT part_a, part_b, support_ab,
           CAST(support_ab * 1000000 // pa.n_part AS BIGINT) AS conf_ab6,
           CAST(support_ab * 1000000 // pb.n_part AS BIGINT) AS conf_ba6,
           CAST(support_ab * n.n_orders * 1000000 //
                (pa.n_part * pb.n_part) AS BIGINT) AS lift6
    FROM pairs
    JOIN pc pa ON pa.l_partkey = part_a
    JOIN pc pb ON pb.l_partkey = part_b
    CROSS JOIN n
    """,
)
def q_order_market_basket(spark, sf_dir):
    """Market-basket association rules over order contents: for every
    part pair co-purchased in >= 3 orders, the support, both rule
    confidences, and the lift — all as exact integer micro-units
    (x·1e6 DIV y), so the association mining is value-gated float-free.

    Scale shape: the pair generation is a SELF-JOIN KEYED BY ORDER — the
    fan-out per order is items-per-order², a small constant in any real
    basket (TPC-H: ≤ 7 lines), so candidate volume is O(orders), not
    O(parts²); the min-support HAVING prunes before the stats joins; the
    per-part counts broadcast-join back onto the surviving pairs. The
    n_orders total is a 1-row broadcast. Apriori-style candidate
    explosion never happens because pairs only materialize inside a
    basket."""
    items = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey").distinct()
    )
    n = items.agg(
        F.countDistinct("l_orderkey").cast("bigint").alias("n_orders")
    )
    pc = items.groupBy("l_partkey").agg(
        F.count("*").cast("bigint").alias("n_part")
    )
    a = items.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_a"))
    b = items.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").cast("bigint").alias("support_ab"))
        .where(F.col("support_ab") >= 3)
    )
    return (
        pairs
        .join(pc.select(F.col("l_partkey").alias("part_a"),
                        F.col("n_part").alias("__na")), "part_a")
        .join(pc.select(F.col("l_partkey").alias("part_b"),
                        F.col("n_part").alias("__nb")), "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a", "part_b", "support_ab",
            F.expr("CAST(support_ab * 1000000 DIV __na AS BIGINT)")
            .alias("conf_ab6"),
            F.expr("CAST(support_ab * 1000000 DIV __nb AS BIGINT)")
            .alias("conf_ba6"),
            F.expr("CAST(support_ab * n_orders * 1000000 DIV "
                   "(__na * __nb) AS BIGINT)").alias("lift6"),
        )
    )


@register(
    "q_ship_sla_percentiles",
    oracle="""
    WITH d AS (
        SELECT o.o_orderpriority AS priority,
               date_diff('day', o.o_orderdate, l.l_shipdate) AS lag_d
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    h AS (
        SELECT priority, lag_d, CAST(COUNT(*) AS BIGINT) AS n
        FROM d GROUP BY 1, 2
    ),
    c AS (
        SELECT priority, lag_d, n,
               CAST(SUM(n) OVER (PARTITION BY priority ORDER BY lag_d
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS cum,
               CAST(SUM(n) OVER (PARTITION BY priority) AS BIGINT) AS nt
        FROM h
    )
    SELECT priority, CAST(MAX(nt) AS BIGINT) AS n_lines,
           CAST(MIN(CASE WHEN cum * 100 >= nt * 50 THEN lag_d END)
                AS BIGINT) AS p50_days,
           CAST(MIN(CASE WHEN cum * 100 >= nt * 90 THEN lag_d END)
                AS BIGINT) AS p90_days,
           CAST(MIN(CASE WHEN cum * 100 >= nt * 99 THEN lag_d END)
                AS BIGINT) AS p99_days,
           CAST(MAX(lag_d) AS BIGINT) AS max_days
    FROM c GROUP BY 1
    """,
)
def q_ship_sla_percentiles(spark, sf_dir):
    """ORDER-TO-SHIP SLA percentiles per order priority — EXACT type-1
    p50/p90/p99 via the bounded-domain integer histogram (the
    winsorize/MAD method on a THIRD domain: order-to-ship lag in whole
    days is a small integer, so the histogram IS the distribution):
    per-(priority, lag) counts off the fact join, a cumulative window
    over that <=|priorities|x|days| state, and each percentile as
    MIN(lag WHERE cum*100 >= nt*q) — the integer cross-multiplication
    that equals the ceil(q*n) type-1 index without ever dividing (the
    abc_analysis boundary rule).

    Scale shape: one fact-fact keyed join (orderkey — co-partitionable;
    AQE picks the strategy), one map-side-combinable rollup to histogram
    STATE, two windows over state, |priorities| output rows. The
    sort-every-row percentile plan never appears."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    d = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff("l_shipdate", "o_orderdate").cast("bigint")
        .alias("lag_d"),
    )
    h = d.groupBy("priority", "lag_d").agg(
        F.count("*").cast("bigint").alias("n")
    )
    wc = (
        Window.partitionBy("priority").orderBy("lag_d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = h.select(
        "priority", "lag_d", "n",
        F.sum("n").over(wc).cast("bigint").alias("cum"),
        F.sum("n").over(Window.partitionBy("priority")).cast("bigint")
        .alias("nt"),
    )

    def pct(q):
        return F.min(
            F.when(F.col("cum") * 100 >= F.col("nt") * q, F.col("lag_d"))
        ).cast("bigint")

    return c.groupBy("priority").agg(
        F.max("nt").cast("bigint").alias("n_lines"),
        pct(50).alias("p50_days"),
        pct(90).alias("p90_days"),
        pct(99).alias("p99_days"),
        F.max("lag_d").cast("bigint").alias("max_days"),
    )


@register(
    "q_order_backlog",
    oracle="""
    WITH closed AS (
        SELECT l_orderkey AS k, MAX(CAST(l_shipdate AS DATE)) AS cd
        FROM lineitem GROUP BY 1
    ),
    op AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY 1
    ),
    cl AS (
        SELECT cd AS d, CAST(COUNT(*) AS BIGINT) AS n
        FROM closed GROUP BY 1
    ),
    days AS (SELECT d FROM op UNION SELECT d FROM cl),
    series AS (
        SELECT days.d,
               COALESCE(op.n, 0) AS opened,
               COALESCE(cl.n, 0) AS closed
        FROM days LEFT JOIN op USING (d) LEFT JOIN cl USING (d)
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(opened AS BIGINT) AS opened,
           CAST(closed AS BIGINT) AS closed,
           CAST(SUM(opened - closed) OVER (ORDER BY d
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS backlog
    FROM series
    """,
)
def q_order_backlog(spark, sf_dir):
    """ORDER BACKLOG time series — the fulfillment-ops burndown: an
    order opens at o_orderdate and closes when its LAST line ships
    (max l_shipdate); the running backlog is the cumulative
    opened-minus-closed over the merged event-day axis. Orders with no
    lineitem never close and stay in the backlog (the honest reading).

    Scale shape: one per-order max-shipdate aggregate (keyed,
    map-side-combinable), two |days|-bounded daily rollups, one
    cumulative window over the |days| axis — state, never data."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    closed = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.max(F.to_date("l_shipdate")).alias("cd"))
    op = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.count("*").cast("bigint").alias("opened"))
    cl = closed.groupBy(F.col("cd").alias("d")).agg(
        F.count("*").cast("bigint").alias("closed"))
    series = (
        op.join(cl, "d", "full_outer")
        .select(
            "d",
            F.coalesce("opened", F.lit(0)).cast("bigint").alias("opened"),
            F.coalesce("closed", F.lit(0)).cast("bigint").alias("closed"),
        )
    )
    w = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    return series.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "opened", "closed",
        F.sum(F.col("opened") - F.col("closed")).over(w).cast("bigint")
        .alias("backlog"),
    )


@register(
    "q_part_discount_elasticity",
    oracle="""
    WITH pt AS (
        SELECT p.p_brand AS brand,
               CAST(ROUND(l.l_discount * 10000) AS BIGINT) AS x,
               CAST(ROUND(l.l_quantity) AS BIGINT) AS y
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    s AS (
        SELECT brand,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS HUGEINT) AS sx,
               CAST(SUM(y) AS HUGEINT) AS sy,
               CAST(SUM(x * y) AS HUGEINT) AS sxy,
               CAST(SUM(x * x) AS HUGEINT) AS sxx
        FROM pt GROUP BY 1
    )
    SELECT brand, n,
           CAST((n * sxy - sx * sy) * 1000000
                // NULLIF(n * sxx - sx * sx, 0) AS BIGINT)
               AS slope_micro_qty_per_bp
    FROM s
    """,
)
def q_part_discount_elasticity(spark, sf_dir):
    """DISCOUNT ELASTICITY per brand: the OLS slope of line quantity on
    discount (basis points) over the lineitem⋈part fact-dim join — does
    discounting move volume, and for which brands? The slope is the
    classic (nΣxy − ΣxΣy)/(nΣx² − (Σx)²), every sum an exact integer
    (discount → bp, quantity → integer units), the single division a
    truncating micro-unit DIV with a NULLIF zero-variance guard —
    rule 12 end to end, decimal(38,0)/HUGEINT intermediates because
    nΣxy reaches n²·x̄ȳ at corpus scale.

    Scale shape: broadcast dim join (part is a dimension), one
    map-side-combinable 5-sum aggregate per brand, |brands| output
    rows. No window, no second scan."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    # no broadcast hint: part is SF-scaled — AQE picks broadcast while it
    # fits and falls back to shuffle join at scale (the rule-1 gate)
    pt = li.join(p, li["l_partkey"] == p["p_partkey"]).select(
        F.col("p_brand").alias("brand"),
        F.round(F.col("l_discount") * 10000).cast("bigint").alias("x"),
        F.round("l_quantity").cast("bigint").alias("y"),
    )
    dec = "decimal(38,0)"
    s = pt.groupBy("brand").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast(dec).alias("sx"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast(dec).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast(dec).alias("sxx"),
    )
    return s.select(
        "brand", "n",
        F.expr(
            "CAST((n * sxy - sx * sy) * 1000000"
            " DIV NULLIF(n * sxx - sx * sx, 0) AS BIGINT)"
        ).alias("slope_micro_qty_per_bp"),
    )


@register(
    "q_cust_lorenz_deciles",
    oracle="""
    WITH r AS (
        SELECT o_custkey AS ck,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS rev_c
        FROM orders GROUP BY 1
    ),
    d AS (
        SELECT ck, rev_c,
               CAST(NTILE(10) OVER (ORDER BY rev_c, ck) AS BIGINT)
                   AS decile
        FROM r
    ),
    tot AS (SELECT CAST(SUM(rev_c) AS HUGEINT) AS t FROM d)
    SELECT decile,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(rev_c) AS BIGINT) AS rev_cents,
           CAST(CAST(SUM(rev_c) AS HUGEINT) * 1000000 // tot.t AS BIGINT)
               AS share_micro
    FROM d CROSS JOIN tot
    GROUP BY decile, tot.t
    """,
)
def q_cust_lorenz_deciles(spark, sf_dir):
    """LORENZ CURVE by customer-revenue decile — the distributional
    companion of q_evt_user_gini on the ORDERS domain: customers are
    NTILE(10)-binned ascending by exact-cents lifetime revenue
    (deterministic (rev, custkey) compound order) and each decile
    reports its exact revenue share in integer micro-units; a flat 10%
    per decile is perfect equality, the top decile's share is the
    concentration headline.

    Scale shape: the NTILE comes from operators/ranking.global_row_rank
    (histogram rows-before + bucketed tie row_number — r10 verdict #2's
    distributed rank, exercised here on a SECOND domain), so no
    unpartitioned window ever touches the |customers| frame; the oracle
    keeps the plain NTILE window as the equivalence proof."""
    from pyspark import StorageLevel

    from ..operators.ranking import global_row_rank, ntile_from_rank

    o = load(spark, sf_dir, "orders")
    r = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint").alias("rev_c")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n = r.agg(F.count("*").cast("bigint").alias("__n"))
    d = (
        global_row_rank(r, "rev_c", "ck", out="__rk", ascending=True)
        .crossJoin(F.broadcast(n))
        .withColumn("decile", ntile_from_rank("__rk", "__n", 10))
    )
    tot = r.agg(F.sum("rev_c").cast("decimal(38,0)").alias("t"))
    return (
        d.groupBy("decile").agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.sum("rev_c").cast("bigint").alias("rev_cents"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "decile", "n_customers", "rev_cents",
            F.expr(
                "CAST(CAST(rev_cents AS DECIMAL(38,0)) * 1000000"
                " DIV t AS BIGINT)"
            ).alias("share_micro"),
        )
    )


@register(
    "q_cust_reorder_cycle",
    oracle="""
    WITH o2 AS (
        SELECT o_custkey AS ck, CAST(o_orderdate AS DATE) AS d,
               c_mktsegment AS seg
        FROM orders JOIN customer ON c_custkey = o_custkey
    ),
    gaps AS (
        SELECT seg,
               d - LAG(d) OVER (PARTITION BY ck ORDER BY d) AS gap_d
        FROM o2
    ),
    h AS (
        SELECT seg, CAST(gap_d AS BIGINT) AS gap_d,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM gaps WHERE gap_d IS NOT NULL GROUP BY 1, 2
    ),
    c AS (
        SELECT seg, gap_d, n,
               CAST(SUM(n) OVER (PARTITION BY seg ORDER BY gap_d
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS cum,
               CAST(SUM(n) OVER (PARTITION BY seg) AS BIGINT) AS nt
        FROM h
    )
    SELECT seg,
           CAST(MAX(nt) AS BIGINT) AS n_gaps,
           CAST(MIN(CASE WHEN cum * 2 >= nt THEN gap_d END) AS BIGINT)
               AS median_gap_days,
           CAST(MIN(CASE WHEN cum * 10 >= nt * 9 THEN gap_d END)
                AS BIGINT) AS p90_gap_days
    FROM c GROUP BY 1
    """,
)
def q_cust_reorder_cycle(spark, sf_dir):
    """REORDER CYCLE per market segment — the replenishment-cadence
    metric behind inventory and CRM timing: per-customer gaps between
    consecutive order dates (keyed lag), then EXACT median/p90 via the
    bounded-domain integer histogram (whole-day gaps — the
    sla_percentiles method on the orders domain). All integer, rule 12.

    Scale shape: broadcast dim join (customer), one keyed (custkey) lag
    window, a |segments|×|gap-days| histogram, cumulative windows over
    that state."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    o2 = o.join(F.broadcast(cust),
                o["o_custkey"] == cust["c_custkey"]).select(
        F.col("o_custkey").alias("ck"),
        F.to_date("o_orderdate").alias("d"),
        F.col("c_mktsegment").alias("seg"),
    )
    w = Window.partitionBy("ck").orderBy("d")
    gaps = o2.select(
        "seg", F.datediff("d", F.lag("d").over(w)).cast("bigint")
        .alias("gap_d"),
    ).where(F.col("gap_d").isNotNull())
    h = gaps.groupBy("seg", "gap_d").agg(
        F.count("*").cast("bigint").alias("n"))
    wc = Window.partitionBy("seg").orderBy("gap_d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    c = h.select(
        "seg", "gap_d", "n",
        F.sum("n").over(wc).cast("bigint").alias("cum"),
        F.sum("n").over(Window.partitionBy("seg")).cast("bigint")
        .alias("nt"),
    )
    return c.groupBy("seg").agg(
        F.max("nt").cast("bigint").alias("n_gaps"),
        F.min(F.when(F.col("cum") * 2 >= F.col("nt"), F.col("gap_d")))
        .cast("bigint").alias("median_gap_days"),
        F.min(F.when(F.col("cum") * 10 >= F.col("nt") * 9,
                     F.col("gap_d")))
        .cast("bigint").alias("p90_gap_days"),
    )


@register(
    "q_cust_cohort_matrix",
    oracle="""
    WITH o AS (
        SELECT o_custkey AS ck,
               CAST(YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1
                    AS BIGINT) AS mi,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    f AS (
        SELECT ck, MIN(mi) AS cohort FROM o GROUP BY 1
    ),
    j AS (
        SELECT o.ck, f.cohort, o.mi - f.cohort AS offs, o.cents
        FROM o JOIN f USING (ck)
    )
    SELECT printf('%04d-%02d', cohort // 12, cohort % 12 + 1)
               AS cohort_month,
           CAST(offs AS BIGINT) AS month_offset,
           CAST(COUNT(DISTINCT ck) AS BIGINT) AS n_active,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents
    FROM j GROUP BY cohort, offs
    """,
)
def q_cust_cohort_matrix(spark, sf_dir):
    """CUSTOMER COHORT RETENTION MATRIX on the orders domain — the
    classic subscription-analytics triangle: customers grouped by FIRST-
    ORDER month, then per (cohort, months-since-first) the active count,
    order count, and revenue in exact integer cents. Month arithmetic is
    pure integers (year*12+month), so cohort and offset are engine-
    independent; the events-domain analogue (q_evt_retention) works on
    days — this one exercises the month grain and the revenue roll-up.

    Scale shape: one keyed (custkey) min-window for the cohort (single
    shuffle), then a hash agg to the bounded |months|^2/2 triangle
    (~3.2k cells at 80 months, independent of |orders|)."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ck"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("bigint").alias("mi"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    w = Window.partitionBy("ck")
    j = o.select(
        "ck", "cents",
        F.min("mi").over(w).alias("cohort"),
        (F.col("mi") - F.min("mi").over(w)).alias("offs"),
    )
    return (
        j.groupBy("cohort", "offs")
        .agg(
            F.countDistinct("ck").cast("bigint").alias("n_active"),
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
        )
        .select(
            F.format_string(
                "%04d-%02d",
                F.expr("CAST(cohort DIV 12 AS INT)"),
                F.expr("CAST(cohort % 12 + 1 AS INT)"),
            ).alias("cohort_month"),
            F.col("offs").cast("bigint").alias("month_offset"),
            "n_active", "n_orders", "revenue_cents",
        )
    )


@register(
    "q_nation_basket_jaccard",
    oracle="""
    WITH basket AS (
        SELECT DISTINCT n.n_name AS nation, l.l_partkey AS pk
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
    ),
    sizes AS (
        SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_parts
        FROM basket GROUP BY 1
    ),
    inter AS (
        SELECT a.nation AS nation_a, b.nation AS nation_b,
               CAST(COUNT(*) AS BIGINT) AS n_common
        FROM basket a JOIN basket b
          ON a.pk = b.pk AND a.nation < b.nation
        GROUP BY 1, 2
    )
    SELECT i.nation_a, i.nation_b, i.n_common,
           sa.n_parts AS n_a, sb.n_parts AS n_b,
           CAST(i.n_common * 1000000
                // (sa.n_parts + sb.n_parts - i.n_common) AS BIGINT)
               AS jaccard_micro
    FROM inter i
    JOIN sizes sa ON sa.nation = i.nation_a
    JOIN sizes sb ON sb.nation = i.nation_b
    ORDER BY jaccard_micro DESC, i.nation_a, i.nation_b
    LIMIT 30
    """,
)
def q_nation_basket_jaccard(spark, sf_dir):
    """BIPARTITE-PROJECTION SET SIMILARITY: which supplier nations ship
    the most similar part baskets? Jaccard of distinct-part sets between
    every nation pair — the one-mode projection of the nation-part
    bipartite graph, the shape behind co-purchase and co-supply
    similarity analyses. Exact truncating integer micro-units
    (|A∩B|*1e6 DIV |A∪B|), top 30 pairs with deterministic tie-break.

    Scale shape: the corpus-sized stage is one distinct (nation, part)
    aggregate (map-side combinable after the broadcast supplier⋈nation
    dim join). The pair expansion joins basket with itself ON part — per
    part the fanout is bounded by |nations|^2 = 625, and the groupBy
    output is bounded at C(25,2) = 300 rows. No all-pairs over rows,
    ever."""
    li = load(spark, sf_dir, "lineitem")
    su = load(spark, sf_dir, "supplier")
    na = load(spark, sf_dir, "nation")
    basket = (
        li.join(F.broadcast(su), li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .select(F.col("n_name").alias("nation"),
                F.col("l_partkey").alias("pk"))
        .distinct()
    )
    sizes = basket.groupBy("nation").agg(
        F.count("*").cast("bigint").alias("n_parts"))
    a = basket.select(F.col("nation").alias("nation_a"), "pk")
    b = basket.select(F.col("nation").alias("nation_b"), "pk")
    inter = (
        a.join(b, "pk")
        .where(F.col("nation_a") < F.col("nation_b"))
        .groupBy("nation_a", "nation_b")
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    scored = (
        inter
        .join(sizes.select(F.col("nation").alias("nation_a"),
                           F.col("n_parts").alias("n_a")), "nation_a")
        .join(sizes.select(F.col("nation").alias("nation_b"),
                           F.col("n_parts").alias("n_b")), "nation_b")
        .select(
            "nation_a", "nation_b", "n_common", "n_a", "n_b",
            F.expr("CAST(n_common * 1000000 DIV (n_a + n_b - n_common)"
                   " AS BIGINT)").alias("jaccard_micro"),
        )
    )
    return scored.orderBy(
        F.col("jaccard_micro").desc(), "nation_a", "nation_b").limit(30)


@register(
    "q_orders_profile",
    oracle="""
    SELECT 'o_orderkey' AS col_name,
           CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_repr,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_repr
    FROM orders
    UNION ALL
    SELECT 'o_custkey',
           CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
           CAST(MIN(o_custkey) AS VARCHAR),
           CAST(MAX(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus',
           CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
           MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice_cents',
           CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
           CAST(COUNT(DISTINCT CAST(ROUND(o_totalprice * 100) AS BIGINT))
                AS BIGINT),
           CAST(MIN(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS VARCHAR),
           CAST(MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate',
           CAST(COUNT(*) - COUNT(o_orderdate) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderdate) AS BIGINT),
           strftime(MIN(o_orderdate), '%Y-%m-%d'),
           strftime(MAX(o_orderdate), '%Y-%m-%d')
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority',
           CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
           MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    """,
)
def q_orders_profile(spark, sf_dir):
    """AUTOMATED COLUMN PROFILING (the data-catalog 'DESCRIBE EXTENDED'
    every lake needs before training-data curation): per column of
    `orders` — null count, EXACT distinct count, canonical min/max
    rendering (doubles as integer cents, timestamps as yyyy-MM-dd, the
    catalog's normalization contract). One row per column.

    Scale shape: ONE pass over the table computing all measures in a
    single aggregate (the multi-COUNT(DISTINCT) compiles to Spark's
    Expand — a deliberate n_cols-way row duplication inside one shuffle,
    still map-side partial-aggregated, vs n_cols separate scans), then a
    6-row stack/unpivot of the 1-row result. The oracle spells the same
    measures as UNION ALL; DuckDB rewrites them into one scan too."""
    o = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    agg = o.agg(
        F.count("*").alias("n_rows"),
        # o_orderkey
        F.count("o_orderkey").alias("nn_key"),
        F.countDistinct("o_orderkey").cast("bigint").alias("nd_key"),
        F.min("o_orderkey").cast("string").alias("mn_key"),
        F.max("o_orderkey").cast("string").alias("mx_key"),
        # o_custkey
        F.count("o_custkey").alias("nn_cust"),
        F.countDistinct("o_custkey").cast("bigint").alias("nd_cust"),
        F.min("o_custkey").cast("string").alias("mn_cust"),
        F.max("o_custkey").cast("string").alias("mx_cust"),
        # o_orderstatus
        F.count("o_orderstatus").alias("nn_st"),
        F.countDistinct("o_orderstatus").cast("bigint").alias("nd_st"),
        F.min("o_orderstatus").alias("mn_st"),
        F.max("o_orderstatus").alias("mx_st"),
        # o_totalprice (canonical cents)
        F.count("o_totalprice").alias("nn_tp"),
        F.countDistinct(cents).cast("bigint").alias("nd_tp"),
        F.min(cents).cast("string").alias("mn_tp"),
        F.max(cents).cast("string").alias("mx_tp"),
        # o_orderdate
        F.count("o_orderdate").alias("nn_od"),
        F.countDistinct("o_orderdate").cast("bigint").alias("nd_od"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("mn_od"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("mx_od"),
        # o_orderpriority
        F.count("o_orderpriority").alias("nn_pr"),
        F.countDistinct("o_orderpriority").cast("bigint").alias("nd_pr"),
        F.min("o_orderpriority").alias("mn_pr"),
        F.max("o_orderpriority").alias("mx_pr"),
    )
    return agg.selectExpr(
        """stack(6,
            'o_orderkey', n_rows - nn_key, nd_key, mn_key, mx_key,
            'o_custkey', n_rows - nn_cust, nd_cust, mn_cust, mx_cust,
            'o_orderstatus', n_rows - nn_st, nd_st, mn_st, mx_st,
            'o_totalprice_cents', n_rows - nn_tp, nd_tp, mn_tp, mx_tp,
            'o_orderdate', n_rows - nn_od, nd_od, mn_od, mx_od,
            'o_orderpriority', n_rows - nn_pr, nd_pr, mn_pr, mx_pr
        ) AS (col_name, n_nulls, n_distinct, min_repr, max_repr)"""
    ).select(
        "col_name",
        F.col("n_nulls").cast("bigint").alias("n_nulls"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        "min_repr", "max_repr",
    )


@register(
    "q_orders_bootstrap_ci",
    oracle="""
    WITH w AS (
        SELECT r.rep,
               CASE
                 WHEN u < 3678 THEN 0 WHEN u < 7357 THEN 1
                 WHEN u < 9196 THEN 2 WHEN u < 9810 THEN 3
                 WHEN u < 9963 THEN 4 ELSE 5
               END AS wt,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM (SELECT UNNEST(range(0, 64)) AS rep) r
        CROSS JOIN (
            SELECT o_orderkey, o_totalprice FROM orders
        ) o,
        LATERAL (SELECT ('0x' || substr(md5(
            'boot|' || o.o_orderkey::VARCHAR || '#' || r.rep::VARCHAR),
            1, 8))::BIGINT % 10000 AS u) h
    ),
    per AS (
        SELECT rep, CAST(SUM(wt) AS BIGINT) AS n_eff,
               CAST(SUM(wt * cents) AS BIGINT) AS sum_cents
        FROM w GROUP BY 1
    ),
    ranked AS (
        SELECT rep, n_eff, sum_cents,
               CAST(sum_cents * 1000000 // n_eff AS BIGINT) AS mean_micro,
               ROW_NUMBER() OVER (
                   ORDER BY sum_cents * 1000000 // n_eff, rep) AS rk
        FROM per
    ),
    full_s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS full_n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS full_sum_cents
        FROM orders
    )
    SELECT CAST(64 AS BIGINT) AS n_replicas, full_n, full_sum_cents,
           CAST(full_sum_cents * 1000000 // full_n AS BIGINT)
               AS full_mean_micro,
           CAST(MAX(CASE WHEN rk = 4 THEN mean_micro END) AS BIGINT)
               AS ci_lo_micro,
           CAST(MAX(CASE WHEN rk = 61 THEN mean_micro END) AS BIGINT)
               AS ci_hi_micro
    FROM ranked CROSS JOIN full_s
    GROUP BY full_n, full_sum_cents
    """,
)
def q_orders_bootstrap_ci(spark, sf_dir):
    """POISSON BOOTSTRAP confidence interval for the mean order value
    (Chamandy et al. 2012, 'Estimating Uncertainty for Massive Data
    Streams' — the Google resampling scheme built for exactly this
    setting: per-row independent weights instead of a global n-draw,
    so ONE pass computes every replica): 64 replicas, each row's weight
    drawn from a Poisson(1) CDF table keyed by the engine-portable
    md5 bucket of (order, replica) — pipeline/sampling.hash_bucket32's
    hash, the q_doc_hash_sample discipline. Replica sums are exact
    BIGINT cents, replica means exact truncating micro-units, and the
    90% CI is the 4th/61st order statistic of the 64 replica means —
    ranked by exact integers, so no float enters selection or ranking
    anywhere.

    Scale shape: one 64x flat-map pass (row-local hash, no shuffle)
    map-side combines into 64 replica rows; the rank window runs over
    those 64 rows of aggregate state. The 64x expansion is the
    bootstrap's inherent cost — at extreme corpus sizes the standard
    remedy is replica-level subsampling (bag of little bootstraps),
    which composes with q_doc_hash_sample."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    rep = o.select(
        F.col("o_orderkey"), cents.alias("cents"),
        F.explode(F.sequence(F.lit(0), F.lit(63))).alias("rep"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(
                    F.lit("boot|"), F.col("o_orderkey").cast("string"),
                    F.lit("#"), F.col("rep").cast("string"),
                ).cast("binary")),
                1, 8),
            16, 10,
        ).cast("long") % 10000
    )
    wt = (
        F.when(u < 3678, 0).when(u < 7357, 1).when(u < 9196, 2)
        .when(u < 9810, 3).when(u < 9963, 4).otherwise(5)
    )
    per = (
        rep.select("rep", wt.alias("wt"), "cents")
        .groupBy("rep")
        .agg(F.sum("wt").cast("bigint").alias("n_eff"),
             F.sum(F.col("wt") * F.col("cents")).cast("bigint")
             .alias("sum_cents"))
    )
    ranked = per.select(
        "rep", "n_eff", "sum_cents",
        F.expr("CAST(sum_cents * 1000000 DIV n_eff AS BIGINT)")
        .alias("mean_micro"),
    ).withColumn(
        "rk",
        F.row_number().over(
            Window.orderBy("mean_micro", "rep")),
    )
    full_s = o.agg(
        F.count("*").cast("bigint").alias("full_n"),
        F.sum(cents).cast("bigint").alias("full_sum_cents"),
    )
    return (
        ranked.crossJoin(F.broadcast(full_s))
        .groupBy("full_n", "full_sum_cents")
        .agg(
            F.max(F.when(F.col("rk") == 4, F.col("mean_micro")))
            .cast("bigint").alias("ci_lo_micro"),
            F.max(F.when(F.col("rk") == 61, F.col("mean_micro")))
            .cast("bigint").alias("ci_hi_micro"),
        )
        .select(
            F.lit(64).cast("bigint").alias("n_replicas"),
            "full_n", "full_sum_cents",
            F.expr("CAST(full_sum_cents * 1000000 DIV full_n AS BIGINT)")
            .alias("full_mean_micro"),
            "ci_lo_micro", "ci_hi_micro",
        )
    )
