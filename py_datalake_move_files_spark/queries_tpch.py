"""TPC-H-grade relational breadth: correlated subqueries, EXISTS/NOT EXISTS,
IN/NOT IN (incl. three-valued NULL semantics), decorrelated scalar aggregates.

The reference has no subquery surface at all (its only membership test is the
manifest existence probe, app/app.py:119-131, covered by J1/J2); this module
generalizes that membership semantics to the full SQL subquery family, each
expressed Spark-first:

- EXISTS / IN            -> left-semi join (or spark.sql, which Catalyst
                            decorrelates to the same semi join)
- NOT EXISTS / NOT IN    -> left-anti join (non-null keys)
- NOT IN over a nullable -> kept as spark.sql NOT IN so Catalyst's
  list                      null-aware anti join preserves 3VL (one NULL in
                            the list ⇒ empty result)
- correlated scalar agg  -> decorrelated: groupBy the correlation key,
                            compute the aggregate once, broadcast/shuffle
                            join back (what Catalyst does for SQL, written
                            out in the DataFrame API)

Scale notes (100 TB): every subquery here decorrelates to ONE join on the
correlation key — no per-row re-execution. Aggregate-then-join plans shuffle
the pre-aggregated (small) side; fact tables shuffle at most once on their
join key. Window-based q21 avoids the double self-join of the textbook
EXISTS/NOT-EXISTS formulation: one shuffle on l_orderkey computes both
"other supplier exists" and "no other late supplier" per row.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window

from py_datalake_move_files_spark.queries import _DEC, _D9, _m2, _t, register


@register(
    "q6_revenue_filter",
    f"""
SELECT round(CAST(sum(CAST(l_extendedprice AS {_D9}) * CAST(l_discount AS {_D9})) AS DOUBLE), 2) AS revenue,
  CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
""",
)
def q_q6_revenue_filter(spark, sf_dir):
    """TPC-H Q6 shape: highly selective scan + ungrouped aggregate. All four
    predicates push to the parquet scan (PushedFilters); zero shuffles — the
    partial aggregates combine map-side."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    rev = F.col("l_extendedprice").cast(_D9) * F.col("l_discount").cast(_D9)
    return li.agg(
        F.round(F.sum(rev).cast("double"), 2).alias("revenue"),
        F.count(F.lit(1)).cast("long").alias("n_items"),
    )


@register(
    "q4_priority_exists",
    """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
)
def q_q4_priority_exists(spark, sf_dir):
    """TPC-H Q4 shape: correlated EXISTS. Written as SQL on temp views so
    Catalyst's RewritePredicateSubquery turns it into a left-semi join —
    pinned by tests/test_plans.py (no nested-loop, no cartesian)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("q4_orders")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("q4_lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM q4_orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
          AND EXISTS (SELECT 1 FROM q4_lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority
        """
    )


@register(
    "q13_order_distribution",
    """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
""",
)
def q_q13_order_distribution(spark, sf_dir):
    """TPC-H Q13 shape: left outer join with an extra join-condition filter
    (NOT a WHERE — null-extended rows must survive), double aggregation.
    count(col) counts non-null only, so customers with zero matching orders
    land in the c_count=0 bucket."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
    )


@register(
    "q16_brand_supplier_count",
    """
SELECT p_brand, p_type, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size IN (1, 4, 7)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type
""",
)
def q_q16_brand_supplier_count(spark, sf_dir):
    """TPC-H Q16 shape: NOT IN over a non-nullable key = left-anti join
    (broadcast — the excluded-supplier list is tiny), then count distinct."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_size").isin(1, 4, 7))
    bad = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_qty_revenue",
    f"""
SELECT round(CAST(sum(CAST(l.l_extendedprice AS {_DEC})) AS DOUBLE) / 7.0, 2) AS avg_yearly,
  CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l JOIN part ON p_partkey = l.l_partkey
WHERE p_brand = 'Brand#1'
  AND l.l_quantity < (SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
                      WHERE l2.l_partkey = l.l_partkey)
""",
)
def q_q17_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: correlated scalar-aggregate subquery, decorrelated
    Spark-first — per-part avg computed once (groupBy on the correlation
    key), joined back. l_quantity values are integral doubles, so the
    float avg is order-independent (exact integer sums) and the comparison
    is portable without decimal casts."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1").select("p_partkey")
    avg_qty = li.groupBy("l_partkey").agg(
        (F.sum("l_quantity") / F.count(F.lit(1)) * 0.5).alias("qty_threshold")
    ).withColumnRenamed("l_partkey", "t_partkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(avg_qty, li.l_partkey == avg_qty.t_partkey)
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(F.sum(_m2("l_extendedprice")).cast("double") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )


@register(
    "q18_big_orders",
    f"""
SELECT c_name, o.o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
  round(CAST(CAST(o_totalprice AS {_DEC}) AS DOUBLE), 2) AS totalprice,
  round(CAST(sum(CAST(l_quantity AS {_DEC})) AS DOUBLE), 2) AS sum_qty
FROM customer JOIN orders o ON c_custkey = o_custkey
JOIN lineitem ON o.o_orderkey = l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                       GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS {_DEC})) > 300)
GROUP BY c_name, o.o_orderkey, o_orderdate, o_totalprice
""",
)
def q_q18_big_orders(spark, sf_dir):
    """TPC-H Q18 shape: IN over an aggregated+HAVING subquery = semi join
    against the pre-aggregated key set. The big-order key set is small after
    HAVING, so it broadcasts; lineitem shuffles once on l_orderkey."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_m2("l_quantity")).alias("tot_qty"))
        .where(F.col("tot_qty") > 300)
        .select("l_orderkey")
    )
    return (
        li.join(F.broadcast(big.withColumnRenamed("l_orderkey", "big_key")),
                li.l_orderkey == F.col("big_key"), "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum(_m2("l_quantity")).cast("double"), 2).alias("sum_qty"))
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round(_m2("o_totalprice").cast("double"), 2).alias("totalprice"),
            "sum_qty",
        )
    )


@register(
    "q21_late_exclusive_suppliers",
    """
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE l1.l_shipdate > o_orderdate + INTERVAL 85 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 85 DAY)
GROUP BY s_name
""",
)
def q_q21_late_exclusive_suppliers(spark, sf_dir):
    """TPC-H Q21 shape (suppliers who were the ONLY late shipper in a
    multi-supplier order). The oracle uses the textbook correlated
    EXISTS + NOT EXISTS; the Spark plan replaces BOTH correlated subqueries
    with window aggregates over one shuffle on l_orderkey:
      n_supp      = count(distinct supplier) per order     (EXISTS twin)
      n_late_supp = count(distinct late supplier) per order (NOT EXISTS twin)
    keeping rows where late ∧ n_supp > 1 ∧ n_late_supp = 1. At 100 TB this
    is one exchange instead of two extra lineitem joins."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 85 DAYS")
    w = Window.partitionBy("l_orderkey")
    flagged = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .withColumn("is_late", late)
        .withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "n_late_supp",
            F.size(
                F.collect_set(
                    F.when(F.col("is_late"), F.col("l_suppkey"))
                ).over(w)
            ),
        )
    )
    return (
        flagged.where(F.col("is_late") & (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )


@register(
    "q22_idle_rich_customers",
    f"""
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
  round(CAST(sum(CAST(c_acctbal AS {_DEC})) AS DOUBLE), 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS {_DEC})) AS DOUBLE) / count(*)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
""",
)
def q_q22_idle_rich_customers(spark, sf_dir):
    """TPC-H Q22 shape: uncorrelated scalar subquery (above-average balance,
    decimal-exact so the threshold is bit-identical cross-engine) + NOT
    EXISTS as a left-anti join against the urgent-order customer set."""
    c = _t(spark, sf_dir, "customer")
    urgent = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    thresh = c.where(F.col("c_acctbal") > 0).agg(
        (F.sum(_m2("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        c.join(F.broadcast(thresh))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.round(F.sum(_m2("c_acctbal")).cast("double"), 2).alias("totacctbal"),
        )
    )


@register(
    "q2_min_price_supplier",
    f"""
SELECT p_partkey, l.l_suppkey,
  round(CAST(CAST(l.l_extendedprice AS {_DEC}) AS DOUBLE), 2) AS min_price
FROM lineitem l JOIN part ON p_partkey = l.l_partkey
WHERE l.l_extendedprice = (SELECT min(l2.l_extendedprice) FROM lineitem l2
                           WHERE l2.l_partkey = l.l_partkey)
""",
)
def q_q2_min_price_supplier(spark, sf_dir):
    """TPC-H Q2 shape: correlated equality against a scalar MIN, decorrelated
    to min-per-key + equi-join back (ties kept, like the SQL). The min
    comparison is on untouched doubles — no arithmetic, so exact equality is
    portable."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey")
    mins = li.groupBy("l_partkey").agg(F.min("l_extendedprice").alias("min_price_raw"))
    mins = mins.withColumnRenamed("l_partkey", "m_partkey")
    return (
        li.join(mins, (li.l_partkey == mins.m_partkey) & (li.l_extendedprice == mins.min_price_raw))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(
            "p_partkey",
            "l_suppkey",
            F.round(_m2("l_extendedprice").cast("double"), 2).alias("min_price"),
        )
    )


@register(
    "q7_bilateral_volume",
    f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
  CAST(year(l_shipdate) AS INT) AS l_year,
  CAST(round(sum(CAST(l_extendedprice AS {_D9}) * CAST(1 - l_discount AS {_D9})), 2) AS DOUBLE) AS volume
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_nationkey < n2.n_nationkey
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
""",
)
def q_q7_bilateral_volume(spark, sf_dir):
    """TPC-H Q7 shape: nation self-joined twice under different roles
    (supplier vs customer side), per-year trade volume. Both nation aliases
    broadcast; the fact pipeline shuffles only for the final aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    disc = F.col("l_extendedprice").cast(_D9) * (1 - F.col("l_discount")).cast(_D9)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(F.col("n1_key") < F.col("n2_key"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(disc), 2).cast("double").alias("volume"))
    )


@register(
    "not_in_null_semantics",
    """
SELECT CAST(count(*) AS BIGINT) AS n_rows
FROM orders
WHERE o_custkey NOT IN (SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_custkey END
                        FROM customer)
""",
)
def q_not_in_null_semantics(spark, sf_dir):
    """SQL three-valued-logic fidelity: NOT IN over a list containing NULL is
    never TRUE, so the result must be empty (the testdata has negative-balance
    customers). Kept as spark.sql so Catalyst's null-aware anti join handles
    it — a hand-rolled left-anti join here would be WRONG (it would drop the
    NULL and return rows). The count pins the engine to the standard."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("nin_orders")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("nin_customer")
    return spark.sql(
        """
        SELECT count(*) AS n_rows
        FROM nin_orders
        WHERE o_custkey NOT IN (
          SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_custkey END
          FROM nin_customer)
        """
    )


# ==========================================================================
# Batch 2: conditional aggregation, ratio queries, HAVING-vs-scalar,
# window-max equality, disjunctive join predicates, two-granularity rollups
# ==========================================================================
#
# Float discipline for every query below: any value that feeds a comparison
# (HAVING threshold, max-equality, ratio) is summed as DECIMAL — double sums
# are partition-order-dependent and would flip boundary rows between engines.


@register(
    "q8_market_share",
    f"""
SELECT o_year,
  round(CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE CAST(0.00 AS decimal(19,4)) END) AS DOUBLE)
        / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT year(o_orderdate) AS o_year,
    CAST(l_extendedprice AS {_D9}) * CAST(1 - l_discount AS {_D9}) AS volume,
    n2.n_name AS supp_nation
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA'
)
GROUP BY o_year
""",
)
def q_q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one supplier nation's share of yearly revenue into a
    customer region — conditional aggregation as a ratio of two exact
    decimal sums (division deferred to the final projection)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice").cast(_D9) * (1 - F.col("l_discount")).cast(_D9)
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_rk"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation"))
    zero = F.lit("0.00").cast("decimal(19,4)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_rk") == r.r_regionkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(zero)).cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "q9_profit_by_nation",
    f"""
SELECT n_name AS nation, o_year,
  CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name, year(o_orderdate) AS o_year,
    CAST(l_extendedprice AS {_D9}) * CAST(1 - l_discount AS {_D9})
      - CAST(p_retailprice AS {_D9}) * CAST(l_quantity AS {_D9}) * CAST(0.1 AS DECIMAL(2,1)) AS amount
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN orders ON o_orderkey = l_orderkey
  WHERE p_name LIKE '%red%'
)
GROUP BY n_name, o_year
""",
)
def q_q9_profit_by_nation(spark, sf_dir):
    """TPC-H Q9 shape: profit (revenue minus a cost proxy — the schema has
    no partsupp, so cost = 10% of retail price x quantity) by supplier
    nation and year, parts filtered by name substring. All decimal-exact,
    rounded in the decimal domain."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("%red%")).select(
        "p_partkey", "p_retailprice"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = (
        F.col("l_extendedprice").cast(_D9) * (1 - F.col("l_discount")).cast(_D9)
        - F.col("p_retailprice").cast(_D9)
        * F.col("l_quantity").cast(_D9)
        * F.lit("0.1").cast("decimal(2,1)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(amount), 2).cast("double").alias("sum_profit"))
    )


@register(
    "q10_returned_items",
    f"""
SELECT c_custkey, any_value(c_name) AS c_name,
  CAST(round(sum(CAST(l_extendedprice AS {_D9}) * CAST(1 - l_discount AS {_D9})), 2) AS DOUBLE) AS revenue,
  any_value(n_name) AS n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
)
def q_q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: revenue lost to returns per customer, deterministic
    top-20 (TakeOrderedAndProject, not a global sort)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = F.col("l_extendedprice").cast(_D9) * (1 - F.col("l_discount")).cast(_D9)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey")
        .agg(
            F.any_value(F.col("c_name")).alias("c_name"),
            F.round(F.sum(rev), 2).cast("double").alias("revenue"),
            F.any_value(F.col("n_name")).alias("n_name"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "q11_important_parts",
    f"""
SELECT l_partkey, CAST(round(val, 2) AS DOUBLE) AS part_value
FROM (
  SELECT l_partkey, sum(CAST(l_extendedprice AS {_DEC})) AS val
  FROM lineitem GROUP BY l_partkey
)
WHERE val > (SELECT sum(CAST(l_extendedprice AS {_DEC})) * CAST(0.0005 AS DECIMAL(6,4))
             FROM lineitem)
""",
)
def q_q11_important_parts(spark, sf_dir):
    """TPC-H Q11 shape: HAVING against an uncorrelated scalar-subquery
    fraction of the global total. Both sums are exact decimals and the
    threshold multiply stays in decimal — the comparison can never flip on
    float summation order."""
    li = _t(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(F.sum(_m2("l_extendedprice")).alias("val"))
    total = li.agg(
        (F.sum(_m2("l_extendedprice")) * F.lit("0.0005").cast("decimal(6,4)")).alias(
            "threshold"
        )
    )
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("val") > F.col("threshold"))
        .select("l_partkey", F.round(F.col("val"), 2).cast("double").alias("part_value"))
    )


@register(
    "q12_latency_priority_counts",
    """
SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) > 60 THEN 'late' ELSE 'ontime' END AS latency,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY 1
""",
)
def q_q12_latency_priority_counts(spark, sf_dir):
    """TPC-H Q12 shape: CASE-bucketed conditional counts (the schema has no
    shipmode, so the bucket is shipping latency)."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.when(
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60, F.lit("late")
            )
            .otherwise(F.lit("ontime"))
            .alias("latency")
        )
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue_ratio",
    f"""
SELECT round(
  100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
      THEN CAST(l_extendedprice AS {_D9}) * CAST(1 - l_discount AS {_D9})
      ELSE CAST('0.00' AS decimal(19,4)) END) AS DOUBLE)
  / CAST(sum(CAST(l_extendedprice AS {_D9}) * CAST(1 - l_discount AS {_D9})) AS DOUBLE), 6) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-02-01'
""",
)
def q_q14_promo_revenue_ratio(spark, sf_dir):
    """TPC-H Q14 shape: promo revenue percentage — conditional decimal sums,
    one double division at the end (identical op order both engines)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice").cast(_D9) * (1 - F.col("l_discount")).cast(_D9)
    zero = F.lit("0.00").cast("decimal(19,4)")
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(promo).cast("double") / F.sum(rev).cast("double"), 6
            ).alias("promo_pct")
        )
    )


@register(
    "q15_top_supplier",
    f"""
WITH r AS (
  SELECT l_suppkey, sum(CAST(l_extendedprice AS {_DEC})) AS rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(round(rev, 2) AS DOUBLE) AS total_revenue
FROM r JOIN supplier ON s_suppkey = l_suppkey
WHERE rev = (SELECT max(rev) FROM r)
""",
)
def q_q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: supplier(s) achieving the maximum quarterly revenue —
    equality against an aggregated maximum (ties kept). Exact decimal
    revenue makes the max-equality portable; a float sum here would be
    partition-order-dependent and could drop the winner."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = li.groupBy("l_suppkey").agg(F.sum(_m2("l_extendedprice")).alias("rev"))
    mx = rev.agg(F.max("rev").alias("max_rev"))
    return (
        rev.join(F.broadcast(mx))
        .where(F.col("rev") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("rev"), 2).cast("double").alias("total_revenue"),
        )
    )


@register(
    "q19_disjunctive_revenue",
    f"""
SELECT CAST(round(sum(CAST(l_extendedprice AS {_D9}) * CAST(1 - l_discount AS {_D9})), 2) AS DOUBLE) AS revenue,
  CAST(count(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
""",
)
def q_q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape: disjunction of three conjunctive predicate groups
    spanning both join sides — the classic OR-predicate planning test (the
    join stays an equi hash join; the disjunction is a post-join filter,
    with per-side IN/range residuals pushed to each scan)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    rev = F.col("l_extendedprice").cast(_D9) * (1 - F.col("l_discount")).cast(_D9)
    branch = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 5) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .where(branch)
        .agg(
            F.round(F.sum(rev), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )


@register(
    "q20_dominant_suppliers",
    """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM (
    SELECT l_partkey, l_suppkey, sum(l_quantity) AS q
    FROM lineitem GROUP BY l_partkey, l_suppkey
  ) ps
  JOIN (
    SELECT l_partkey AS t_partkey, sum(l_quantity) AS tq
    FROM lineitem GROUP BY l_partkey
  ) tot ON ps.l_partkey = tot.t_partkey
  WHERE ps.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
    AND q > 0.1 * tq
)
""",
)
def q_q20_dominant_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: suppliers who shipped >10% of some red part's total
    volume — nested IN over aggregates at two granularities, decorrelated to
    (part,supplier) sums joined against part totals, then a semi join into
    supplier. Quantity sums are integral doubles (exact in fp), so the
    fraction comparison is portable without decimal casts."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    red = _t(spark, sf_dir, "part").where(F.col("p_name").like("%red%")).select("p_partkey")
    ps = li.join(F.broadcast(red), li.l_partkey == red.p_partkey, "left_semi").groupBy(
        "l_partkey", "l_suppkey"
    ).agg(F.sum("l_quantity").alias("q"))
    tot = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("l_quantity").alias("tq")
    )
    dominant = (
        ps.join(tot, ps.l_partkey == tot.t_partkey)
        .where(F.col("q") > 0.1 * F.col("tq"))
        .select("l_suppkey")
        .distinct()
    )
    return s.join(
        F.broadcast(dominant), s.s_suppkey == dominant.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


@register(
    "date_gap_fill",
    """
WITH bounds AS (
  SELECT min(CAST(o_orderdate AS DATE)) AS d0, max(CAST(o_orderdate AS DATE)) AS d1
  FROM orders
),
days AS (
  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
),
daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n FROM orders GROUP BY 1
)
SELECT strftime(day, '%Y-%m-%d') AS day, CAST(coalesce(n, 0) AS BIGINT) AS n_orders
FROM days LEFT JOIN daily USING (day)
""",
)
def q_date_gap_fill(spark, sf_dir):
    """Time-series gap filling: one row per calendar day across the full
    order-date span, zero-filled where no orders landed — the
    sequence()+explode generator pattern (densification), the standard prep
    for window functions over regular time series. The fact side aggregates
    to day granularity BEFORE joining the generated spine, so the outer join
    touches day-level rows (thousands), never raw orders."""
    o = _t(spark, sf_dir, "orders").select(F.to_date("o_orderdate").alias("day"))
    bounds = o.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    days = bounds.select(F.explode(F.sequence("d0", "d1")).alias("day"))
    daily = o.groupBy("day").agg(F.count(F.lit(1)).alias("n"))
    return (
        days.join(daily, "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_orders"),
        )
    )


@register(
    "window_rank_suite",
    """
SELECT c_custkey, c_nationkey,
  CAST(ntile(4) OVER w AS INT) AS quartile,
  round(percent_rank() OVER w, 6) AS pct_rank,
  round(cume_dist() OVER w, 6) AS cume
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
""",
)
def q_window_rank_suite(spark, sf_dir):
    """Distribution-rank window breadth: ntile / percent_rank / cume_dist
    (completing §2.7 beyond rank/dense_rank/lag/lead/frames). The ORDER BY
    carries a unique tiebreaker so ntile is deterministic cross-engine."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "lateral_topk_orders",
    """
SELECT c.c_custkey, t.o_orderkey,
  round(CAST(CAST(t.o_totalprice AS decimal(18,2)) AS DOUBLE), 2) AS totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 3) t
""",
)
def q_lateral_topk_orders(spark, sf_dir):
    """Correlated LATERAL subquery with ORDER BY + LIMIT (top-3 orders per
    customer). Catalyst decorrelates it into a window rank + join — NOT a
    per-customer re-execution; pinned by tests/test_plans.py (no nested
    loop). The DataFrame twin is topk_per_group_parts; this entry proves
    the SQL LATERAL surface itself."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("lat_customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("lat_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey,
          round(CAST(CAST(t.o_totalprice AS decimal(18,2)) AS DOUBLE), 2) AS totalprice
        FROM lat_customer c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM lat_orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 3) t
        """
    )


@register(
    "interval_attribution_bucketed",
    """
WITH s AS (
  SELECT event_id AS view_id, user_id, ts AS v_ts, ts + INTERVAL 30 MINUTE AS v_te
  FROM events WHERE event_type = 'view'
),
p AS (
  SELECT event_id AS purchase_id, user_id, ts AS p_ts
  FROM events WHERE event_type = 'purchase'
)
SELECT p.purchase_id, s.view_id, p.user_id
FROM p JOIN s ON p.user_id = s.user_id AND p.p_ts >= s.v_ts AND p.p_ts < s.v_te
""",
)
def q_interval_attribution_bucketed(spark, sf_dir):
    """Big-big interval join: purchases attributed to any view window (30
    min) of the same user, computed with the bucketed equi-join mechanism
    (operators/asof.interval_join_bucketed) — intervals exploded to coarse
    time buckets, facts equi-joined on (user, bucket) + residual. The
    oracle states the plain inequality join; the bucketing is pure
    physical strategy and must not change the result."""
    from py_datalake_move_files_spark.operators.asof import interval_join_bucketed

    ev = _t(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.col("ts").alias("v_ts"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("v_te"),
    )
    buys = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    return interval_join_bucketed(
        buys,
        views,
        point_col="p_ts",
        start_col="v_ts",
        end_col="v_te",
        keys=["user_id"],
        bucket_seconds=1800,
    ).select("purchase_id", "view_id", "user_id")


@register(
    "recursive_cte_tree_depth",
    """
WITH RECURSIVE tree(doc_id, depth) AS (
  SELECT doc_id, 0 AS depth FROM documents WHERE doc_id = 0
  UNION ALL
  SELECT d.doc_id, t.depth + 1
  FROM documents d JOIN tree t ON d.doc_id // 2 = t.doc_id
  WHERE d.doc_id <> 0
)
SELECT depth, CAST(count(*) AS BIGINT) AS n_docs
FROM tree GROUP BY depth
""",
)
def q_recursive_cte_tree_depth(spark, sf_dir):
    """Genuine SQL recursion (Spark 4's WITH RECURSIVE): walk the implicit
    binary tree parent(id) = id div 2 over the documents ids from the root,
    reporting node counts per depth. Complements the DataFrame-level
    iterative algorithms (connected components, operators/clusters.py):
    this is the declarative recursion surface itself. Each recursion step
    is one equi join on the frontier — at scale, frontier size bounds the
    per-step shuffle."""
    _t(spark, sf_dir, "documents").createOrReplaceTempView("rec_documents")
    return spark.sql(
        """
        WITH RECURSIVE tree(doc_id, depth) AS (
          SELECT doc_id, 0 AS depth FROM rec_documents WHERE doc_id = 0
          UNION ALL
          SELECT d.doc_id, t.depth + 1
          FROM rec_documents d JOIN tree t ON d.doc_id div 2 = t.doc_id
          WHERE d.doc_id <> 0
        )
        SELECT depth, count(*) AS n_docs
        FROM tree GROUP BY depth
        """
    )


@register(
    "map_funcs_suite",
    """
SELECT event_id,
  CAST(len(json_keys(props)) AS INT) AS n_keys,
  list_aggregate(json_keys(props), 'min') AS first_key,
  CAST(json_extract(props, '$.k') AS BIGINT) AS k_value,
  CAST(json_extract(props, '$.k') AS BIGINT) * 2 AS k_doubled,
  -- NULL props propagate NULL (Spark's NULL > 0 is NULL; the old ELSE
  -- FALSE branch swallowed it — degenerate-lake rule)
  CASE WHEN props IS NULL THEN NULL
       WHEN len(json_keys(props)) > 0 THEN TRUE ELSE FALSE END AS has_keys
FROM events
""",
)
def q_map_funcs_suite(spark, sf_dir):
    """§2.8 map-function breadth over the dynamic JSON props column:
    from_json → MapType, then map_keys / element_at / transform_values /
    map sizing — the map tier of the scalar-function surface (arrays and
    structs are covered elsewhere). transform_values uses a SQL-text lambda
    with a unique variable per the lambda-safety policy."""
    ev = _t(spark, sf_dir, "events")
    # parse the JSON ONCE into a real column (r10 sf1 sweep: the inlined
    # form re-ran from_json per consuming expression — five parses/row,
    # the only super-linear reading in the full-registry sf1 sweep;
    # CollapseProject keeps the multi-referenced parse un-inlined)
    parsed = ev.select(
        "event_id",
        F.from_json(F.col("props"), "map<string,bigint>").alias("__m"),
    )
    return parsed.select(
        "event_id",
        F.size(F.map_keys(F.col("__m"))).alias("n_keys"),
        F.array_min(F.map_keys(F.col("__m"))).alias("first_key"),
        F.element_at(F.col("__m"), "k").alias("k_value"),
        F.expr(
            "element_at(transform_values(__m, (km1, vm1) -> vm1 * 2), 'k')"
        ).alias("k_doubled"),
        (F.size(F.map_keys(F.col("__m"))) > 0).alias("has_keys"),
    )
