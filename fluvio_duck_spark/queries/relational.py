"""Relational surface queries (SURVEY §2.6-2.10) — the half of the
reference's usable surface that DuckDB's engine supplied (joins, windows,
aggregations, set ops, sorts, scalar functions; reference README.md:149-184
documents the SQL-over-views workflow).  Spark SQL/Catalyst supplies it
here; each query is paired with an ANSI oracle so the parity is *measured*,
not assumed.

Determinism rules used throughout (see functions/exact.py): float
aggregates accumulate in DECIMAL and emit double; every window/top-k
ordering carries a unique tie-break key; derived integer widths are cast
to match across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from fluvio_duck_spark.functions.exact import davg, dmul, dsum
from fluvio_duck_spark.queries import QuerySpec
from fluvio_duck_spark.sources.tables import load, register_views

_TS = lambda s: F.lit(s).cast("timestamp")  # noqa: E731


# --- §2.7 aggregations -----------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide multi-aggregate groupBy; Catalyst runs it as
    partial (map-side) + final hash aggregation — one shuffle on the
    2-value grouping key."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= _TS("2000-01-01"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        F.sum(dmul(F.col("l_extendedprice"), F.lit(1) - F.col("l_discount")))
        .cast("double")
        .alias("sum_disc_price"),
        davg("l_quantity").alias("avg_qty"),
        davg("l_extendedprice").alias("avg_price"),
        davg("l_discount", scale=4).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


ORACLE_PRICING = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(9,4))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-01-01'
GROUP BY l_returnflag, l_linestatus
"""


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.rollup(
        F.year("o_orderdate").alias("yr"), F.col("o_orderpriority").alias("pri")
    ).agg(F.count("*").alias("n"), dsum("o_totalprice").alias("total"))


ORACLE_ROLLUP = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, o_orderpriority AS pri,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
GROUP BY ROLLUP (year(o_orderdate), o_orderpriority)
"""


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), dsum("l_quantity").alias("qty")
    )


ORACLE_CUBE = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT year(o_orderdate) AS yr, o_orderpriority AS pri,
               count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((year(o_orderdate)), (o_orderpriority), ())
        """
    )


ORACLE_GROUPING_SETS = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, o_orderpriority AS pri, COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((year(o_orderdate)), (o_orderpriority), ())
"""


def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count("*").alias("n_customers"),
    )


ORACLE_DISTINCT = """
SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS n_nations, COUNT(*) AS n_customers
FROM customer GROUP BY c_mktsegment
"""


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) + approx_percentile — the sketch
    VALUES are engine-specific, so instead of surfacing them raw (which
    forced a rows-only driver check until round 2) the query surfaces a
    driver-checkable contract: the exact companion values (oracle-matched
    bit-for-bit) plus one boolean per sketch asserting it landed inside
    its published error bound.  A broken sketch flips a boolean and fails
    the driver hash.  Bounds: approx_count_distinct's default rsd is 0.05
    (1σ), so 15% is a ≥3σ envelope; approx_percentile returns a true
    element of the group, so it must lie within [min, max]."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_partkey").alias("exact_parts"),
            F.approx_count_distinct("l_partkey").alias("_acd"),
            F.expr("approx_percentile(l_extendedprice, 0.5)").alias("_p50"),
            F.min("l_extendedprice").alias("_lo"),
            F.max("l_extendedprice").alias("_hi"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (F.abs(F.col("_acd") - F.col("exact_parts"))
             <= 0.15 * F.col("exact_parts")).alias("acd_within_15pct"),
            F.col("_p50").between(F.col("_lo"), F.col("_hi"))
            .alias("p50_in_range"),
        )
    )


ORACLE_APPROX = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       TRUE AS acd_within_15pct,
       TRUE AS p50_in_range
FROM lineitem GROUP BY l_returnflag
"""


# --- §2.6 joins --------------------------------------------------------------

def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape.  Join strategy at scale: lineitem⋈orders⋈customer are
    the big shuffles (AQE handles skew); nation/region are broadcast —
    no shuffle for the dimension side."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _TS("1996-01-01")) & (F.col("o_orderdate") < _TS("1997-01-01"))
    )
    li = load(spark, sf_dir, "lineitem")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(dmul(F.col("l_extendedprice"), F.lit(1) - F.col("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape — unshipped-order revenue for one market segment,
    top-10.  Both date filters prune at the parquet scan (row-group
    min/max); the segment-filtered customer keylist is the small side of
    its join (AQE converts it to broadcast at runtime); the top-10 is a
    per-partition heap merged on the driver (TakeOrderedAndProject), never
    a global sort of the aggregate."""
    cutoff = _TS("1998-01-01")
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(dmul(F.col("l_extendedprice"), F.lit(1) - F.col("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


ORACLE_SHIPPING_PRIORITY = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(9,4))) AS DOUBLE) AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


ORACLE_REVENUE_BY_NATION = """
SELECT n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(9,4))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def q_left_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


ORACLE_LEFT_JOIN = """
SELECT c_custkey, COUNT(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
"""


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_with_orders"))
    )


ORACLE_SEMI_JOIN = """
SELECT c_mktsegment, COUNT(*) AS n_with_orders
FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no 1995 orders (anti join against a filtered build
    side — non-degenerate at every sf)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _TS("1995-01-01")) & (F.col("o_orderdate") < _TS("1996-01-01"))
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_without_orders"))
    )


ORACLE_ANTI_JOIN = """
SELECT c_nationkey, COUNT(*) AS n_without_orders
FROM customer WHERE NOT EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey
    AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01')
GROUP BY c_nationkey
"""


def q_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_cust"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count("*").alias("n_supp"))
    )
    return c.join(s, c.c_nationkey == s.s_nationkey, "full").select(
        F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


ORACLE_FULL_OUTER = """
SELECT COALESCE(c.k, s.k) AS nationkey,
       COALESCE(c.n_cust, 0) AS n_cust, COALESCE(s.n_supp, 0) AS n_supp
FROM      (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
FULL JOIN (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
ON c.k = s.k
"""


# --- §2.8 windows ------------------------------------------------------------

def q_window_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


ORACLE_WINDOW_TOPK = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) t
WHERE rn <= 3
"""


def q_window_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_spend"),
    )


ORACLE_WINDOW_RUNNING = """
SELECT o_custkey, o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
FROM orders
"""


def q_window_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias("gap_days"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


ORACLE_WINDOW_GAPS = """
SELECT o_custkey, o_orderkey,
  CAST(date_diff('day',
       lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       o_orderdate) AS INTEGER) AS gap_days,
  lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_orderkey
FROM orders
"""


def q_window_rank_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w_ties = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"))
    w_total = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return c.select(
        "c_mktsegment",
        "c_custkey",
        F.rank().over(w_ties).alias("rnk"),
        F.dense_rank().over(w_ties).alias("drnk"),
        F.ntile(4).over(w_total).alias("quartile"),
    )


ORACLE_WINDOW_RANK = """
SELECT c_mktsegment, c_custkey,
  rank()       OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS rnk,
  dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS drnk,
  ntile(4)     OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS quartile
FROM customer
"""


def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — percent_rank / cume_dist over the
    same single per-group sort, plus first/last analytic values with an
    explicit full-partition frame (both engines require the frame to make
    last_value deterministic)."""
    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.asc("c_acctbal"), F.asc("c_custkey"))
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return c.select(
        "c_mktsegment",
        "c_custkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cdist"),
        F.first("c_custkey").over(w_full).alias("poorest"),
        F.last("c_custkey").over(w_full).alias("richest"),
    )


ORACLE_WINDOW_DISTRIBUTION = """
SELECT c_mktsegment, c_custkey,
  percent_rank() OVER w AS pct_rank,
  cume_dist()    OVER w AS cdist,
  first_value(c_custkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS poorest,
  last_value(c_custkey)  OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS richest
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC)
"""


# --- §2.5 sort / top-k -------------------------------------------------------

def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: TakeOrderedAndProject — per-partition heap + driver
    merge of k rows, never a full sort."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


ORACLE_TOPK = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


# --- §2.9 set operations -----------------------------------------------------

def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over customer vs supplier nations,
    tagged and unioned into one result."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    u = c.union(s).distinct().withColumn("op", F.lit("union"))
    i = c.intersect(s).withColumn("op", F.lit("intersect"))
    e = c.subtract(s).withColumn("op", F.lit("except"))
    return u.union(i).union(e)


ORACLE_SET_OPS = """
SELECT nationkey, 'union' AS op FROM
  (SELECT c_nationkey AS nationkey FROM customer UNION SELECT s_nationkey FROM supplier)
UNION ALL
SELECT nationkey, 'intersect' AS op FROM
  (SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier)
UNION ALL
SELECT nationkey, 'except' AS op FROM
  (SELECT c_nationkey AS nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier)
"""


def q_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (ALL) variants: intersectAll/exceptAll keep duplicate
    multiplicity — summarized as counts per nationkey so the result stays
    small while the multiplicities are what's compared."""
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    ia = c.intersectAll(s).groupBy("nationkey").agg(F.count("*").alias("n")).withColumn("op", F.lit("intersect_all"))
    ea = c.exceptAll(s).groupBy("nationkey").agg(F.count("*").alias("n")).withColumn("op", F.lit("except_all"))
    ua = c.unionAll(s).groupBy("nationkey").agg(F.count("*").alias("n")).withColumn("op", F.lit("union_all"))
    return ia.union(ea).union(ua)


ORACLE_SET_OPS_ALL = """
WITH c AS (SELECT c_nationkey AS nationkey FROM customer),
s AS (SELECT s_nationkey AS nationkey FROM supplier)
SELECT nationkey, COUNT(*) AS n, 'intersect_all' AS op
  FROM (SELECT nationkey FROM c INTERSECT ALL SELECT nationkey FROM s) GROUP BY 1
UNION ALL
SELECT nationkey, COUNT(*) AS n, 'except_all' AS op
  FROM (SELECT nationkey FROM c EXCEPT ALL SELECT nationkey FROM s) GROUP BY 1
UNION ALL
SELECT nationkey, COUNT(*) AS n, 'union_all' AS op
  FROM (SELECT nationkey FROM c UNION ALL SELECT nationkey FROM s) GROUP BY 1
"""


# --- pivot -------------------------------------------------------------------

def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"))
    )


ORACLE_PIVOT = """
SELECT l_returnflag,
  CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "O",
  CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "F"
FROM lineitem GROUP BY l_returnflag
"""


# --- scalar subquery ---------------------------------------------------------

def q_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery filter without a driver round-trip: the global avg is
    a 1-row aggregate broadcast back onto the scan."""
    o = load(spark, sf_dir, "orders")
    avg = o.agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double") / F.count("*")).alias(
            "thr"
        )
    )
    return (
        o.crossJoin(F.broadcast(avg))
        .filter(F.col("o_totalprice") > F.col("thr"))
        .select("o_orderkey", "o_totalprice")
    )


ORACLE_ABOVE_AVG = """
SELECT o_orderkey, o_totalprice FROM orders
WHERE o_totalprice > (
  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) FROM orders)
"""


# --- §2.10 scalar function families -------------------------------------------

def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("uname"),
        F.lower("p_brand").alias("lbrand"),
        F.length("p_name").cast("int").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type5"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake_name"),
        F.trim(F.lit("  x  ")).alias("trimmed"),
    )


ORACLE_STRING_FUNCS = """
SELECT p_partkey,
  upper(p_name) AS uname, lower(p_brand) AS lbrand,
  CAST(length(p_name) AS INTEGER) AS name_len,
  substring(p_type, 1, 5) AS type5,
  concat(p_brand, '-', p_type) AS brand_type,
  replace(p_name, ' ', '_') AS snake_name,
  trim('  x  ') AS trimmed
FROM part
"""


def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
    )


ORACLE_DATE_FUNCS = """
SELECT o_orderkey,
  CAST(year(o_orderdate) AS INTEGER) AS yr,
  CAST(month(o_orderdate) AS INTEGER) AS mo,
  CAST(day(o_orderdate) AS INTEGER) AS dom,
  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
  CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS INTEGER) AS days_since_95
FROM orders
"""


def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.abs("c_acctbal").alias("abal"),
        F.round(F.col("c_acctbal").cast("decimal(18,2)"), 1).cast("double").alias("rounded1"),
        F.ceil("c_acctbal").cast("long").alias("ceil_bal"),
        F.floor("c_acctbal").cast("long").alias("floor_bal"),
        F.sqrt(F.abs("c_acctbal")).alias("sqrt_abal"),
        (F.col("c_custkey") % 7).cast("long").alias("mod7"),
    )


ORACLE_MATH_FUNCS = """
SELECT c_custkey,
  abs(c_acctbal) AS abal,
  CAST(round(CAST(c_acctbal AS DECIMAL(18,2)), 1) AS DOUBLE) AS rounded1,
  CAST(ceil(c_acctbal) AS BIGINT) AS ceil_bal,
  CAST(floor(c_acctbal) AS BIGINT) AS floor_bal,
  sqrt(abs(c_acctbal)) AS sqrt_abal,
  CAST(c_custkey % 7 AS BIGINT) AS mod7
FROM customer
"""


def q_case_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.select(
            F.when(F.col("o_totalprice") < 50000, "small")
            .when(F.col("o_totalprice") < 200000, "medium")
            .otherwise("large")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


ORACLE_CASE = """
SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
            WHEN o_totalprice < 200000 THEN 'medium'
            ELSE 'large' END AS bucket,
       COUNT(*) AS n
FROM orders GROUP BY 1
"""


# --- §2.6 temporal joins (as-of / range) ------------------------------------

def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream enrichment: each click event picks up the most recent
    purchase (at-or-before its timestamp) by the same user.  Union+window
    merge — one shuffle on user_id, |L|+|R| intermediate rows (see
    operators/asof.py); the oracle is DuckDB's native ASOF LEFT JOIN."""
    from fluvio_duck_spark.operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_event"),
        F.col("value").alias("purchase_value"),
    )
    return asof_join(
        clicks,
        purchases,
        left_key="user_id",
        right_key="user_id",
        left_time="ts",
        right_time="ts",
        value_cols=["purchase_event", "purchase_value"],
    )


ORACLE_ASOF = """
WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
r AS (SELECT user_id, ts, event_id AS purchase_event, value AS purchase_value
      FROM events WHERE event_type = 'purchase')
SELECT l.event_id, l.user_id, l.ts, r.purchase_event, r.purchase_value
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def q_asof_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same enrichment as join_asof via the broadcast-interval plan
    (operators/asof.py::asof_broadcast_join): purchases (the small
    changelog) become validity intervals and broadcast; the click fact
    stream never shuffles.  Shares join_asof's DuckDB ASOF oracle —
    two physical strategies, one proven semantics."""
    from fluvio_duck_spark.operators.asof import asof_broadcast_join

    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_event"),
        F.col("value").alias("purchase_value"),
    )
    return asof_broadcast_join(
        clicks,
        purchases,
        left_key="user_id",
        right_key="user_id",
        left_time="ts",
        right_time="ts",
        value_cols=["purchase_event", "purchase_value"],
    )


def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 dimension build: each user's purchase changelog becomes
    versioned validity intervals (open-ended current version) — the
    materialized side of the broadcast as-of plan."""
    from fluvio_duck_spark.operators.asof import scd2_intervals

    purchases = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "event_id", "value")
    )
    return scd2_intervals(
        purchases, key="user_id", time="ts", payload=["event_id", "value"]
    )


ORACLE_SCD2 = """
SELECT user_id, ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
       event_id, value
FROM events WHERE event_type = 'purchase'
"""


def q_asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of with a bounded match window (pandas merge_asof tolerance):
    the most recent purchase counts only within 2 hours of the click —
    stale state must NOT be carried indefinitely.  Same single-shuffle
    merge; the matched right timestamp rides along and null-masks
    out-of-window values, so the tolerance costs no extra pass."""
    from fluvio_duck_spark.operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_event"),
        F.col("value").alias("purchase_value"),
    )
    return asof_join(
        clicks,
        purchases,
        left_key="user_id",
        right_key="user_id",
        left_time="ts",
        right_time="ts",
        value_cols=["purchase_event", "purchase_value"],
        tolerance_seconds=7200,
    )


ORACLE_ASOF_TOLERANCE = """
WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
r AS (SELECT user_id, ts, event_id AS purchase_event, value AS purchase_value
      FROM events WHERE event_type = 'purchase')
SELECT l.event_id, l.user_id, l.ts, m.purchase_event, m.purchase_value
FROM l LEFT JOIN LATERAL (
  SELECT purchase_event, purchase_value
  FROM r
  WHERE r.user_id = l.user_id AND r.ts <= l.ts
    AND r.ts >= l.ts - INTERVAL 2 HOUR
  ORDER BY r.ts DESC LIMIT 1) m ON TRUE
"""


def q_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each click picks up the NEXT purchase (at-or-after
    its timestamp) by the same user — conversion-attribution shape.  Same
    union+window merge as backward with the time sort reversed, so the
    plan cost is identical (one shuffle on user_id, |L|+|R| intermediate
    rows); the oracle is DuckDB's ASOF LEFT JOIN with the inequality
    flipped (l.ts <= r.ts picks the smallest r.ts >= l.ts)."""
    from fluvio_duck_spark.operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_event"),
        F.col("value").alias("purchase_value"),
    )
    return asof_join(
        clicks,
        purchases,
        left_key="user_id",
        right_key="user_id",
        left_time="ts",
        right_time="ts",
        value_cols=["purchase_event", "purchase_value"],
        direction="forward",
    )


ORACLE_ASOF_FORWARD = """
WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
r AS (SELECT user_id, ts, event_id AS purchase_event, value AS purchase_value
      FROM events WHERE event_type = 'purchase')
SELECT l.event_id, l.user_id, l.ts, r.purchase_event, r.purchase_value
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.ts
"""


def q_range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banding join: events bucketed by a small range table on
    ``lo <= value < hi`` then aggregated per band.  The band side is
    broadcast (BroadcastNestedLoopJoin) so the fact scan never shuffles
    for the join; the groupBy on 4 bands is the only exchange."""
    from fluvio_duck_spark.operators.asof import range_band_join

    ev = load(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [("p25", 0.0, 25.0), ("p50", 25.0, 50.0), ("p75", 50.0, 125.0),
         ("rest", 125.0, 1e6)],
        "band string, lo double, hi double",
    ).limit(4)  # literal 4-row dim; limit makes the bound plan-provable
    return (
        range_band_join(ev, bands, "value")
        .groupBy("band")
        .agg(
            F.count("*").alias("n"),
            davg("value").alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


ORACLE_RANGE_BAND = """
SELECT band, COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(value) AS avg_value,
  MIN(value) AS min_value,
  MAX(value) AS max_value
FROM events
JOIN (VALUES ('p25', 0.0, 25.0), ('p50', 25.0, 50.0), ('p75', 50.0, 125.0),
             ('rest', 125.0, 1000000.0)) AS b(band, lo, hi)
  ON value >= lo AND value < hi
GROUP BY band
"""


def q_salted_hotkey_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted COUNT BY key (operators/skew.py): the hot key's
    rows spread over n_salts reducers in shuffle 1; shuffle 2 carries one
    row per (key, salt).  Semantically identical to plain groupBy — the
    oracle proves it."""
    from fluvio_duck_spark.operators.skew import salted_agg_count

    ev = load(spark, sf_dir, "events")
    return salted_agg_count(ev, "event_type", n_salts=8)


ORACLE_SALTED_AGG = """
SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type
"""


def q_join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join (operators/skew.py::salted_join) exercised
    end-to-end in the correctness gate: events (every key hot — 5
    distinct types over 100 K+ rows, the worst skew shape) join a
    per-type weight dim with the dim replicated across 8 salts and the
    fact salted by a row-content hash, then roll up.  Semantically
    identical to the plain join — the oracle IS the plain join — while
    the hot key's shuffle partition splits 8 ways.  (For a dim this
    small Spark would broadcast anyway; the query pins the salted
    shuffle-join path deliberately so the pattern itself is
    hash-verified for the cases where the dim does NOT broadcast.)"""
    from fluvio_duck_spark.operators.skew import salted_join

    ev = load(spark, sf_dir, "events").select("event_type", "value")
    dim = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            (F.length("event_type") * 10).cast("int").alias("weight"),
        )
    )
    joined = salted_join(ev, dim, "event_type", n_salts=8)
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(
                (F.col("value") * F.col("weight")).cast("decimal(28,6)")
            ).cast("double"),
            4,
        ).alias("weighted_value"),
    )


ORACLE_JOIN_SALTED = """
WITH dim AS (
  SELECT DISTINCT event_type,
         CAST(length(event_type) * 10 AS INTEGER) AS weight
  FROM events)
SELECT e.event_type, COUNT(*) AS n,
       round(CAST(SUM(CAST(e.value * d.weight AS DECIMAL(28,6)))
                  AS DOUBLE), 4) AS weighted_value
FROM events e JOIN dim d USING (event_type)
GROUP BY e.event_type
"""


def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 array/collection family: collect_list → sort → size/element/
    contains/fold, all JVM-side expressions over grouped rows."""
    li = load(spark, sf_dir, "lineitem")
    grouped = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("l_linenumber")).alias("lines")
    )
    return grouped.select(
        "l_orderkey",
        F.size("lines").alias("n_lines"),
        F.element_at("lines", 1).alias("first_line"),
        F.array_contains("lines", 3).alias("has3"),
        F.aggregate("lines", F.lit(0), lambda a, x: a + x).cast("long").alias("sum_lines"),
    )


ORACLE_ARRAY_FUNCS = """
SELECT l_orderkey,
       CAST(len(l) AS INTEGER) AS n_lines,
       l[1] AS first_line,
       list_contains(l, 3) AS has3,
       CAST(list_aggregate(l, 'sum') AS BIGINT) AS sum_lines
FROM (SELECT l_orderkey, list_sort(list(l_linenumber)) AS l
      FROM lineitem GROUP BY 1)
"""


def q_regex_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 regex + null-handling family (RE2-safe patterns so both
    engines agree)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.regexp_extract("o_orderpriority", "(\\d+)", 1).alias("pri_num"),
        F.regexp_replace("o_orderpriority", "-", "_").alias("pri_u"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias("status_x"),
        F.when(F.col("o_totalprice").isNull(), -1.0)
        .otherwise(F.col("o_totalprice"))
        .alias("price_nn"),
    )


ORACLE_REGEX_NULL = """
SELECT o_orderkey,
       regexp_extract(o_orderpriority, '(\\d+)', 1) AS pri_num,
       regexp_replace(o_orderpriority, '-', '_') AS pri_u,
       coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_x,
       CASE WHEN o_totalprice IS NULL THEN -1.0 ELSE o_totalprice END AS price_nn
FROM orders
"""


def q_window_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score normalization (feature scaling for training-data
    pipelines) as aggregates-over-window — one shuffle on the group key.
    Variance from exact decimal sums: var = (n·Σx² − (Σx)²) / (n·(n−1)),
    all-integer-exact until one double division + sqrt (a naive
    stddev_samp is accumulation-order-dependent and not
    oracle-comparable).  The final z is rounded to 6 decimals on BOTH
    engines: once the exact decimal state exceeds 2^53·scale (sf >= 0.1
    group sizes), DuckDB's int128→double conversion rounds twice (hi/lo
    64-bit halves) vs Java BigDecimal's single correct rounding — a
    1-ULP cross-engine gap the round absorbs."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("event_type")
    x = F.col("value").cast("decimal(18,2)")
    sx = F.sum(x).over(w)
    sxx = F.sum(x * x).over(w)
    n = F.count("value").over(w)
    var = (
        (n * sxx - sx * sx).cast("double")
        / (n * (n - 1)).cast("double")
    )
    mean = sx.cast("double") / n
    return ev.select(
        "event_id",
        "event_type",
        F.round((F.col("value") - mean) / F.sqrt(var), 6).alias("z"),
    )


ORACLE_ZSCORE = """
WITH s AS (
  SELECT event_id, event_type, value,
         SUM(CAST(value AS DECIMAL(18,2))) OVER w AS sx,
         SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) OVER w AS sxx,
         COUNT(value) OVER w AS n
  FROM events
  WINDOW w AS (PARTITION BY event_type))
SELECT event_id, event_type,
       ROUND((value - CAST(sx AS DOUBLE) / n)
         / sqrt(CAST(n * sxx - sx * sx AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)),
         6) AS z
FROM s
"""


def q_batch_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization of the event log (operators/sessions.py):
    per-user sessions at a 1-hour gap — backfill counterpart of the
    streaming session windows, same semantics, one shuffle."""
    from fluvio_duck_spark.operators.sessions import session_stats

    ev = load(spark, sf_dir, "events")
    out = session_stats(ev, "user_id", "ts", gap="1 hour", order_tiebreak="event_id")
    return out.select(
        "user_id",
        F.col("session_id").cast("long").alias("session_id"),
        "session_start",
        "session_end",
        "n",
    )


def q_session_error_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join, both sides large: user sessions × 30-minute
    error windows of the same user (closed intervals).  Grid-bucketed
    plan (operators/intervals.py): equi-join on (user, time cell), the
    overlap predicate is the residual, and each pair counts once at the
    later-start cell — no nested loop, no post-join distinct."""
    from fluvio_duck_spark.operators.intervals import interval_overlap_join
    from fluvio_duck_spark.operators.sessions import session_stats

    ev = load(spark, sf_dir, "events")
    sessions = session_stats(
        ev, "user_id", "ts", gap="1 hour", order_tiebreak="event_id"
    ).select(
        "user_id",
        F.col("session_id").cast("long").alias("session_id"),
        "session_start",
        "session_end",
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("err_user"),
        F.col("event_id").alias("error_event"),
        F.col("ts").alias("error_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("error_end"),
    )
    return interval_overlap_join(
        sessions,
        errors,
        a_start="session_start",
        a_end="session_end",
        b_start="error_start",
        b_end="error_end",
        cell_seconds=1800,
        keys=[("user_id", "err_user")],
        closed=True,
    ).select(
        "user_id", "session_id", "session_start", "session_end",
        "error_event", "error_start",
    )


ORACLE_SESSION_ERROR_OVERLAP = """
WITH m AS (
  SELECT user_id, ts, event_id,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts - lag(ts) OVER w >= INTERVAL 1 HOUR
         THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id,
         ts
  FROM m),
sess AS (
  SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
         MIN(ts) AS session_start,
         MAX(ts) + INTERVAL 1 HOUR AS session_end
  FROM s GROUP BY user_id, session_id),
e AS (
  SELECT user_id, event_id AS error_event, ts AS error_start,
         ts + INTERVAL 30 MINUTES AS error_end
  FROM events WHERE event_type = 'error')
SELECT sess.user_id, session_id, session_start, session_end,
       error_event, error_start
FROM sess JOIN e ON sess.user_id = e.user_id
  AND sess.session_start <= e.error_end
  AND e.error_start <= sess.session_end
"""


ORACLE_SESSIONIZE = """
WITH m AS (
  SELECT user_id, ts, event_id,
    CASE WHEN lag(ts) OVER w IS NULL
           OR ts - lag(ts) OVER w >= INTERVAL 1 HOUR THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, ts,
    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM m)
SELECT user_id, CAST(sid AS BIGINT) AS session_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 1 HOUR AS session_end,
       COUNT(*) AS n
FROM s GROUP BY 1, 2
"""


def q_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group — both engines use the
    p·(n−1) linear-interpolation definition (Spark ``percentile``, DuckDB
    ``quantile_cont``), so results are bit-comparable.  For 100 TB use
    ``approx_percentile`` (see agg_approx) — exact percentiles need a
    per-group sort."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("q25"),
        F.expr("percentile(l_quantity, 0.5)").alias("q50"),
        F.expr("percentile(l_quantity, 0.75)").alias("q75"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("median_price"),
    )


# Scalar percentile columns (not an array): the driver's pandas canon cannot
# hash list-typed cells (CORRECTNESS_r02 driver-ERR; scripts/lint_oracle_types.py).
ORACLE_PERCENTILES = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS q25,
       quantile_cont(l_quantity, 0.5) AS q50,
       quantile_cont(l_quantity, 0.75) AS q75,
       quantile_cont(l_extendedprice, 0.5) AS median_price
FROM lineitem GROUP BY l_returnflag
"""


def q_topk_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filters → broadcast join → agg →
    global top-10 (TakeOrderedAndProject: per-partition heaps, 10 rows to
    the driver)."""
    cu = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < _TS("1998-01-01"))
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(o.join(F.broadcast(cu), o.o_custkey == cu.c_custkey)),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(dmul(F.col("l_extendedprice"), F.lit(1) - F.col("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


ORACLE_TOPK_SHIPPING = """
SELECT l_orderkey, o_orderdate,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(9,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


def q_correlated_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — correlated scalar subquery (per-part average)
    decorrelated into an aggregate + join; the per-part avg side is tiny
    after aggregation, so it broadcasts."""
    li = load(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("p_key")).agg(
        (davg("l_quantity") * 0.5).alias("half_avg")
    )
    return (
        li.join(F.broadcast(per_part), li.l_partkey == F.col("p_key"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.count("*").alias("n_small"),
            dsum("l_extendedprice").alias("small_revenue"),
        )
    )


ORACLE_CORRELATED = """
SELECT COUNT(*) AS n_small,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_revenue
FROM lineitem l
WHERE l_quantity < (
  SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) * 0.5
  FROM lineitem WHERE l_partkey = l.l_partkey)
"""


def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — orders whose total lineitem quantity exceeds a
    threshold, joined back to customer, top 100 by price.

    Scale shape: the HAVING-filtered aggregate runs first (one shuffle on
    l_orderkey with map-side combine) and survives as a tiny relation, so
    BOTH joins broadcast it — the orders and customer tables never
    shuffle; the top-k is a per-partition heap."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_name", "c_custkey", "o_orderkey",
                F.col("o_totalprice").alias("price"), "total_qty")
        .orderBy(F.desc("price"), F.asc("o_orderkey"))
        .limit(100)
    )


ORACLE_LARGE_ORDERS = """
SELECT c_name, c_custkey, o_orderkey, o_totalprice AS price, total_qty
FROM orders
JOIN (SELECT l_orderkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 150) big
  ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY price DESC, o_orderkey ASC
LIMIT 100
"""


def q_conditional_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape — conditional aggregation: CASE expressions inside
    SUM classify orders by priority class per return flag.  Map-side the
    CASE collapses each row to two ints, so the shuffle carries only
    partial counts — the canonical 'pivot without a pivot' at scale."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).alias("low_line_count"),
        )
    )


ORACLE_CONDITIONAL_PRIORITY = """
SELECT l_returnflag,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_returnflag
"""


def q_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape — ratio of conditional revenue to total revenue.
    part broadcasts into the lineitem scan; both sums accumulate exactly
    in DECIMAL and the single double division happens once at the end, so
    the ratio is bit-identical on any cluster size."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    disc = dmul(F.col("l_extendedprice"), F.lit(1) - F.col("l_discount"))
    promo = F.col("p_type").startswith("PROMO")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(F.when(promo, disc).otherwise(F.lit(0).cast("decimal(18,2)"))).cast("double")
            / F.sum(disc).cast("double")
        ).alias("promo_revenue_pct")
    )


ORACLE_PROMO_REVENUE = """
SELECT 100.0
  * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                  THEN CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(9,4))
                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(9,4))) AS DOUBLE)
  AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


def q_rich_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — customers with above-average account balance and
    no recent orders: scalar subquery (1-row broadcast) + broadcast anti
    join on the distinct custkeys of recent orders.  Neither side of the
    fact table shuffles; the aggregate output is grouped per market
    segment."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        davg("c_acctbal").alias("avg_bal")
    )
    has_orders = (
        o.filter(F.col("o_orderdate") >= _TS("2000-01-01"))
        .select("o_custkey")
        .distinct()
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(F.broadcast(has_orders), c.c_custkey == has_orders.o_custkey,
              "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("numcust"), dsum("c_acctbal").alias("totacctbal"))
    )


ORACLE_RICH_IDLE = """
SELECT c_mktsegment, COUNT(*) AS numcust,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                          / COUNT(c_acctbal)
                   FROM customer WHERE c_acctbal > 0)
  AND c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_mktsegment
"""


def q_filtered_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape — pure filter-scan aggregate, the predicate-pushdown
    showcase: all three predicates reach the parquet scan (row-group
    min/max pruning on l_shipdate), only 3 columns are read, and the
    single global sum needs no shuffle at all (partial sums → one final
    merge)."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= _TS("1996-01-01"))
        & (F.col("l_shipdate") < _TS("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(dmul(F.col("l_extendedprice"), F.col("l_discount")))
        .cast("double")
        .alias("revenue")
    )


ORACLE_FILTERED_REVENUE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(9,4))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""


def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape — bilateral trade volume between two nations by
    ship year.  The nation dimension is filtered to the pair *before*
    joining, so supplier and customer rows outside the pair die at their
    broadcast joins and never reach the big orders⋈lineitem shuffle; the
    OR-of-pairs predicate is a residual filter after both nation names
    are attached."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _TS("1996-01-01"))
        & (F.col("l_shipdate") < _TS("1998-01-01"))
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    pair = F.col("n_name").isin("NATION_1", "NATION_2")
    n1 = load(spark, sf_dir, "nation").filter(pair).select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    n2 = load(spark, sf_dir, "nation").filter(pair).select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(F.broadcast(s.join(F.broadcast(n1), s.s_nationkey == F.col("sn_key"))),
                li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c.join(F.broadcast(n2), c.c_nationkey == F.col("cn_key")),
              o.o_custkey == c.c_custkey)
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.sum(dmul(F.col("l_extendedprice"), F.lit(1) - F.col("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )


ORACLE_VOLUME_SHIPPING = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(9,4)) AS volume
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON n1.n_nationkey = s_nationkey
  JOIN nation n2 ON n2.n_nationkey = c_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
) t
GROUP BY supp_nation, cust_nation, l_year
"""


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape — one nation's market share of SMALL-type part
    revenue among ASIA-region customers, by order year: a two-level
    conditional-ratio aggregate over a 6-way join.  Every dimension
    (part, supplier, nation, region) broadcasts; only orders⋈lineitem
    shuffles.  Both the conditional and total sums accumulate in DECIMAL
    so the one double division per year is bit-identical."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nations = (
        load(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("an_key"))
    )
    supp_nation = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    vol = dmul(F.col("l_extendedprice"), F.lit(1) - F.col("l_discount"))
    zero = F.lit(0).cast("decimal(27,6)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s.join(F.broadcast(supp_nation),
                                 s.s_nationkey == F.col("sn_key"))),
              li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c.join(F.broadcast(asia_nations), c.c_nationkey == F.col("an_key")),
              o.o_custkey == c.c_custkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(zero))
                .cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )


ORACLE_MARKET_SHARE = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
  CAST(SUM(CASE WHEN n1.n_name = 'NATION_3'
                THEN CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(9,4))
                ELSE CAST(0 AS DECIMAL(27,6)) END) AS DOUBLE)
  / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(9,4))) AS DOUBLE)
  AS mkt_share
FROM lineitem
JOIN part     ON p_partkey = l_partkey AND p_type = 'SMALL'
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
JOIN region   ON r_regionkey = n2.n_regionkey AND r_name = 'ASIA'
GROUP BY year(o_orderdate)
"""


def q_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: the fixture set has no partsupp table, so
    profit is gross revenue rather than revenue − supplycost): revenue on
    parts matching a name substring, by supplier nation and order year.
    part/supplier/nation broadcast; the LIKE filter prunes lineitem at
    its broadcast join before the orders shuffle."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    s = load(spark, sf_dir, "supplier")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    n = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s.join(F.broadcast(n), s.s_nationkey == F.col("sn_key"))),
              li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(dmul(F.col("l_extendedprice"), F.lit(1) - F.col("l_discount")))
            .cast("double")
            .alias("sum_profit")
        )
    )


ORACLE_PROFIT_NATION_YEAR = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(9,4))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN orders   ON o_orderkey = l_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(o_orderdate)
"""


def q_returned_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape — top-20 customers by revenue lost to returned
    items in one quarter.  The quarter filter prunes orders at the scan;
    the returnflag filter prunes lineitem at the scan; nation broadcasts;
    the top-20 is a per-partition heap (TakeOrderedAndProject), not a
    global sort."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _TS("1996-01-01"))
        & (F.col("o_orderdate") < _TS("1996-04-01"))
    )
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == F.col("cn_key"))
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(
            F.sum(dmul(F.col("l_extendedprice"), F.lit(1) - F.col("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


ORACLE_RETURNED_TOP = """
SELECT c_custkey, c_name, n_name, c_acctbal,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(9,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation   ON n_nationkey = c_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape — supplier(s) with the maximum 3-month revenue:
    an aggregate reused twice (per-supplier revenue, then its global max
    as a 1-row broadcast), equality on the exact decimal-summed double so
    the max-match is deterministic on both engines."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _TS("1996-01-01"))
        & (F.col("l_shipdate") < _TS("1996-04-01"))
    )
    s = load(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(dmul(F.col("l_extendedprice"), F.lit(1) - F.col("l_discount")))
        .cast("double")
        .alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


ORACLE_TOP_SUPPLIER = """
WITH revenue AS (
  SELECT l_suppkey,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(9,4))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


def q_disjunctive_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (adapted: the fixture part table has no
    p_container, so the bands use p_size): revenue from three disjunctive
    brand/size/quantity bands.  The equi key (partkey) drives a broadcast
    hash join; the OR-of-ANDs lands as a residual join filter — never a
    cartesian product."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    band = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(band)
        .agg(
            F.sum(dmul(F.col("l_extendedprice"), F.lit(1) - F.col("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


ORACLE_DISJUNCTIVE_BANDS = """
SELECT
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(9,4))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: the fixture lineitem has no commit/
    receipt dates, so 'late' is proxied by l_returnflag = 'R'): suppliers
    who were the *sole* returner on a multi-supplier finished order —
    EXISTS (another supplier on the order) AND NOT EXISTS (another
    supplier who also returned).  Both the semi and the anti are
    equi-joins on l_orderkey with a supplier-inequality residual; supplier
    broadcasts; ordering ties broken by name for the deterministic
    top-100."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load(spark, sf_dir, "supplier")
    l1 = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    l2 = li.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2"))
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3"))
    return (
        l1.join(o, l1.l_orderkey == o.o_orderkey)
        .join(l2, (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("s2")),
              "left_semi")
        .join(l3, (F.col("l_orderkey") == F.col("k3")) & (F.col("l_suppkey") != F.col("s3")),
              "left_anti")
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


ORACLE_WAITING_SUPPLIERS = """
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN orders   ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 100
"""


# --- hypertable rollups (beyond-reference time-series operator) ------------

_ROLLUP_MEASURES = None  # built lazily to avoid import-order cycles


def _rollup_measures():
    from fluvio_duck_spark.operators.rollup import Measure

    return [
        Measure("total", "value", "sum"),
        Measure("n", "value", "count"),
        Measure("lo", "value", "min"),
        Measure("hi", "value", "max"),
        Measure("avg_value", "value", "avg"),
    ]


def q_rollup_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable rollup: hourly continuous aggregate of events by type —
    one shuffle on (bucket, event_type), sums held exactly in DECIMAL
    (mergeable state), finalized to doubles at the edge."""
    from fluvio_duck_spark.operators.rollup import finalize_rollup, hypertable_rollup

    ev = load(spark, sf_dir, "events")
    m = _rollup_measures()
    return finalize_rollup(
        hypertable_rollup(ev, "ts", 3600, ["event_type"], m), m
    )


ORACLE_ROLLUP_HOURLY = """
SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT)) AS TIMESTAMP)
         AS bucket,
       event_type,
       CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total,
       COUNT(value) AS n,
       MIN(value) AS lo,
       MAX(value) AS hi,
       CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) / COUNT(value) AS avg_value
FROM events GROUP BY 1, 2
"""


def q_rollup_cascade_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cascaded rollup: the daily aggregate is re-aggregated FROM the
    hourly rollup's mergeable state — raw data is scanned once for the
    hourly level and never again.  The oracle below aggregates raw data
    directly at daily granularity, so a hash match proves the cascade is
    exactly lossless (decimal sums merge associatively; min/max/count are
    closed under merge)."""
    from fluvio_duck_spark.operators.rollup import (
        cascade_rollup,
        finalize_rollup,
        hypertable_rollup,
    )

    ev = load(spark, sf_dir, "events")
    m = _rollup_measures()
    hourly = hypertable_rollup(ev, "ts", 3600, ["event_type"], m)
    daily = cascade_rollup(hourly, 86400, ["event_type"], m)
    return finalize_rollup(daily, m)


ORACLE_ROLLUP_CASCADE = """
SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT)) AS TIMESTAMP)
         AS bucket,
       event_type,
       CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total,
       COUNT(value) AS n,
       MIN(value) AS lo,
       MAX(value) AS hi,
       CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) / COUNT(value) AS avg_value
FROM events GROUP BY 1, 2
"""


def q_rollup_hist_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily p50/p95 derived from CASCADED hourly histogram state —
    fixed-bin count arrays merge by elementwise addition, so the daily
    quantile estimate is bit-identical whether computed from raw data or
    from the hourly rollup (the property HLL gives distinct counts, here
    for percentiles).  The estimator (lower bound of the bin holding
    rank ceil(p·n)) is deterministic, so unlike t-digest/KLL-sketch
    quantiles it is fully oracle-checkable; max error = one bin width."""
    from fluvio_duck_spark.operators.rollup import (
        Measure,
        cascade_rollup,
        finalize_rollup,
        hypertable_rollup,
    )

    m = [
        Measure("v", "value", "hist", lo=0.0, hi=500.0, nbuckets=50,
                pcts=(0.5, 0.95)),
        Measure("n", "value", "count"),
    ]
    ev = load(spark, sf_dir, "events")
    hourly = hypertable_rollup(ev, "ts", 3600, ["event_type"], m)
    return finalize_rollup(cascade_rollup(hourly, 86400, ["event_type"], m), m)


ORACLE_ROLLUP_HIST = """
WITH base AS (
  SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT)) AS TIMESTAMP)
           AS bucket,
         event_type,
         LEAST(GREATEST(CAST(FLOOR((value - 0.0) / 10.0) AS INTEGER), 0), 49) AS idx
  FROM events WHERE value IS NOT NULL),
bins AS (
  SELECT bucket, event_type, idx, COUNT(*) AS c
  FROM base GROUP BY 1, 2, 3),
cum AS (
  SELECT bucket, event_type, idx, c,
         SUM(c) OVER (PARTITION BY bucket, event_type ORDER BY idx) AS cum,
         SUM(c) OVER (PARTITION BY bucket, event_type) AS total
  FROM bins)
SELECT bucket, event_type,
  CAST(0.0 + MIN(CASE WHEN cum >= GREATEST(CAST(CEIL(0.5 * total) AS BIGINT), 1)
                      THEN idx END) * 10.0 AS DOUBLE) AS v_p50,
  CAST(0.0 + MIN(CASE WHEN cum >= GREATEST(CAST(CEIL(0.95 * total) AS BIGINT), 1)
                      THEN idx END) * 10.0 AS DOUBLE) AS v_p95,
  CAST(MAX(total) AS BIGINT) AS n
FROM cum GROUP BY 1, 2
"""


def q_rollup_hll_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily distinct-user estimates derived from *hourly HLL sketches*
    (mergeable state — distinct counts are not exactly mergeable, sketch
    unions are lossless).

    Driver-checkable since round 3: the cascade still runs (hourly
    sketches → daily union → estimate), but the surfaced contract is the
    exact companion — daily exact distinct users plus the cascade's count
    measure, both oracle-matched bit-for-bit — and a boolean asserting the
    cascaded estimate landed within 15% of exact (lgConfigK=12 ⇒ rse
    ≈1.6%, so 15% is a ≈9σ envelope; test_rollup.py still proves
    cascade == direct at 5%).  The exact twin is harness-scale apparatus:
    at 100 TB you serve the estimate alone and skip the count-distinct
    shuffle."""
    from fluvio_duck_spark.operators.rollup import (
        Measure,
        cascade_rollup,
        finalize_rollup,
        hypertable_rollup,
        time_bucket,
    )

    m = [Measure("users", "user_id", "approx_distinct"),
         Measure("n", "event_id", "count")]
    ev = load(spark, sf_dir, "events")
    hourly = hypertable_rollup(ev, "ts", 3600, ["event_type"], m)
    est = finalize_rollup(cascade_rollup(hourly, 86400, ["event_type"], m), m)
    exact = ev.groupBy(
        time_bucket("ts", 86400).alias("bucket"), "event_type"
    ).agg(F.count_distinct("user_id").alias("users_exact"))
    return est.join(exact, ["bucket", "event_type"]).select(
        "bucket",
        "event_type",
        "n",
        "users_exact",
        (F.abs(F.col("users") - F.col("users_exact"))
         <= 0.15 * F.col("users_exact")).alias("users_est_within_15pct"),
    )


ORACLE_HLL_DAILY = """
SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT)) AS TIMESTAMP)
         AS bucket,
       event_type,
       COUNT(event_id) AS n,
       COUNT(DISTINCT user_id) AS users_exact,
       TRUE AS users_est_within_15pct
FROM events GROUP BY 1, 2
"""


# --- SQL passthrough --------------------------------------------------------

# One SQL text, two engines: a user of the reference runs plain SQL over
# registered views (reference README.md:149-184); the same string must
# work submitted to spark.sql() over our temp views AND to the DuckDB
# oracle.  TPC-H Q4 shape — EXISTS decorrelation exercises the planner.
SQL_PASSTHROUGH = """
SELECT o_orderpriority, COUNT(*) AS n
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
GROUP BY o_orderpriority
"""


def q_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts over a
    left outer join (customers with no qualifying orders appear at
    c_count=0; the fixture has no o_comment so the excluded class is
    urgent-priority orders instead of the comment LIKE).  Both sides
    shuffle once on custkey; the first aggregation reuses that
    partitioning so no extra exchange, and the second aggregation is
    over ~|distinct counts| rows — negligible at any scale."""
    customer = load(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        load(spark, sf_dir, "orders")
        .filter(~F.col("o_orderpriority").like("1%"))
        .select("o_custkey", "o_orderkey")
    )
    counts = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return counts.groupBy("c_count").agg(F.count("*").alias("custdist"))


ORACLE_ORDER_COUNT_DIST = """
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '1%'
      GROUP BY c_custkey)
GROUP BY c_count
"""


def q_sql_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, names=("orders", "lineitem"))
    return spark.sql(SQL_PASSTHROUGH)


def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt) of the four lineitem measures, then
    per-metric stats — the relational reshape DuckDB spells UNPIVOT and
    Spark spells ``DataFrame.unpivot``.  Map-only reshape (each input row
    emits 4 rows in place, no shuffle) + one partial+final agg keyed on
    the 4 metric names; decimal-exact sums so the hash matches."""
    li = load(spark, sf_dir, "lineitem")
    melted = li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric",
        "value",
    )
    return melted.groupBy("metric").agg(
        F.count("*").alias("n"),
        dsum("value").alias("total"),
        davg("value", scale=4).alias("avg_value"),
    )


ORACLE_UNPIVOT_METRICS = """
WITH m AS (
  SELECT 'l_quantity' AS metric, l_quantity AS value FROM lineitem
  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
SELECT metric, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(value)
         AS avg_value
FROM m GROUP BY metric
"""


# --- TPC-H shapes needing a part↔supplier relation (no partsupp fixture;
# --- lineitem's (l_partkey, l_suppkey) pairs are the bridge) ---------------

def _part_supplier_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """partsupp stand-in: per (part, supplier) unit cost observed in
    lineitem.  MIN of a per-row double expression is order-independent, so
    the derived `supply_cost` is deterministic on both engines (unlike a
    double SUM)."""
    li = load(spark, sf_dir, "lineitem")
    unit = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))) / F.col(
        "l_quantity"
    )
    return li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(unit).alias("supply_cost")
    )


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape — min-cost supplier per part within a region: the
    correlated MIN subquery becomes a per-part window MIN over the
    already-joined eligible set — one scan, no self-join (the decorrelated
    agg+equality-join form recomputes the whole dim-join subtree on both
    sides: measured 5 exchanges / 8 broadcast joins vs 2 / 4 for this
    form).  part/supplier/nation/region all broadcast; shuffles are the
    (partkey, suppkey) cost agg and the window's partkey partitioning."""
    cost = _part_supplier_cost(spark, sf_dir)
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_type") == "PROMO") & (F.col("p_size") <= 25)
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eligible = (
        cost.join(F.broadcast(p), cost.l_partkey == p.p_partkey)
        .join(F.broadcast(s), cost.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name", "supply_cost")
    )
    min_w = F.min("supply_cost").over(W.partitionBy("p_partkey"))
    return (
        eligible.withColumn("min_cost", min_w)
        .filter(F.col("supply_cost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "supply_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


ORACLE_MIN_COST_SUPPLIER = """
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         MIN((l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)) / l_quantity) AS supply_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey),
eligible AS (
  SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name, supply_cost
  FROM cost
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE p_type = 'PROMO' AND p_size <= 25 AND r_name = 'EUROPE')
SELECT s_acctbal, s_name, n_name, p_partkey, supply_cost
FROM eligible e
WHERE supply_cost = (SELECT MIN(supply_cost) FROM eligible m
                     WHERE m.p_partkey = e.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def q_part_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape — parts whose stocked value (for one nation's
    suppliers) exceeds a fraction of the global total: per-part exact
    decimal agg, then the global threshold as a 1-row aggregate broadcast
    back over the agg output.  An unpartitioned window here would funnel
    the |parts|-row relation (~2e9 rows at 100 TB TPC-H) through ONE
    partition; the broadcast-scalar form keeps every stage parallel, and
    Spark's ReusedExchange dedupes the per-part shuffle so the corpus is
    still scanned exactly once (asserted in test_plan_shapes)."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    filtered = li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey).join(
        F.broadcast(n), s.s_nationkey == n.n_nationkey
    )
    per_part = filtered.groupBy("l_partkey").agg(
        F.sum(dmul(F.col("l_extendedprice"), F.col("l_quantity"), scale_b=2))
        .cast("double")
        .alias("part_value")
    )
    total = per_part.agg(
        F.sum(F.col("part_value").cast("decimal(28,2)"))
        .cast("double")
        .alias("__total_value")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("__total_value") * F.lit(0.001))
        .select("l_partkey", "part_value")
    )


ORACLE_PART_VALUE_SHARE = """
WITH per_part AS (
  SELECT l_partkey,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS part_value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
  GROUP BY l_partkey)
SELECT l_partkey, part_value
FROM per_part
WHERE part_value > (SELECT CAST(SUM(CAST(part_value AS DECIMAL(28,2))) AS DOUBLE) * 0.001 FROM per_part)
ORDER BY part_value DESC, l_partkey
"""


def q_supplier_cnt_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape — distinct supplier counts per part attribute
    combo, excluding 'complaint' suppliers (negative balance stands in
    for the comment-LIKE filter): the NOT IN subquery lands as a
    broadcast anti join on the tiny excluded set; the distinct count's
    expand+two-phase agg is the only corpus shuffle."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").startswith("PROMO"))
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    pairs = (
        li.select("l_partkey", "l_suppkey")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(F.broadcast(bad), F.col("l_suppkey") == bad.s_suppkey, "left_anti")
    )
    return pairs.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


ORACLE_SUPPLIER_CNT = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape — suppliers whose 1998 shipments of a part family
    exceed a fraction of their all-time volume for that part: the
    correlated half-sum threshold becomes two aggregates over ONE scan
    (conditional sum inside the all-time agg — no self-join, no second
    scan), then a distinct-suppkey semi join filtered to a region."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").startswith("small"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    in98 = F.year("l_shipdate") == 1998
    vol = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.when(in98, F.col("l_quantity")).otherwise(F.lit(0.0)).cast("decimal(18,2)"))
            .cast("double")
            .alias("qty_98"),
            dsum("l_quantity").alias("qty_all"),
        )
    )
    excess = (
        vol.filter(F.col("qty_98") > F.lit(0.3) * F.col("qty_all"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        # distinct suppkeys are bounded by |supplier| at any data scale —
        # always broadcastable (SMJ otherwise shuffles the supplier side).
        .join(F.broadcast(excess), s.s_suppkey == excess.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "n_name")
    )


ORACLE_EXCESS_SHIPPERS = """
WITH vol AS (
  SELECT l_suppkey, l_partkey,
    CAST(SUM(CAST(CASE WHEN year(l_shipdate) = 1998 THEN l_quantity ELSE 0.0 END AS DECIMAL(18,2))) AS DOUBLE) AS qty_98,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_all
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'small%'
  GROUP BY l_suppkey, l_partkey)
SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND s_suppkey IN (SELECT l_suppkey FROM vol WHERE qty_98 > 0.3 * qty_all)
ORDER BY s_suppkey
"""


def q_asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of: each click takes the purchase closest in time by
    the same user, whichever side (ties to backward) — pandas
    merge_asof(direction='nearest') semantics.  Both direction scans
    share ONE key shuffle (1 Exchange, 2 in-partition sorts — see
    operators/asof.py::asof_join_nearest); the oracle picks between two
    LATERAL top-1 probes with the same gap comparison."""
    from fluvio_duck_spark.operators.asof import asof_join_nearest

    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_event"),
        F.col("value").alias("purchase_value"),
    )
    return asof_join_nearest(
        clicks,
        purchases,
        left_key="user_id",
        right_key="user_id",
        left_time="ts",
        right_time="ts",
        value_cols=["purchase_event", "purchase_value"],
    )


ORACLE_ASOF_NEAREST = """
WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
r AS (SELECT user_id, ts, event_id AS purchase_event, value AS purchase_value
      FROM events WHERE event_type = 'purchase'),
j AS (
  SELECT l.event_id, l.user_id, l.ts,
         b.bt, b.purchase_event AS be, b.purchase_value AS bv,
         f.ft, f.purchase_event AS fe, f.purchase_value AS fv
  FROM l
  LEFT JOIN LATERAL (
    SELECT ts AS bt, purchase_event, purchase_value FROM r
    WHERE r.user_id = l.user_id AND r.ts <= l.ts
    ORDER BY r.ts DESC LIMIT 1) b ON TRUE
  LEFT JOIN LATERAL (
    SELECT ts AS ft, purchase_event, purchase_value FROM r
    WHERE r.user_id = l.user_id AND r.ts >= l.ts
    ORDER BY r.ts ASC LIMIT 1) f ON TRUE)
SELECT event_id, user_id, ts,
  CASE WHEN bt IS NOT NULL AND (ft IS NULL
            OR epoch_us(ts) - epoch_us(bt) <= epoch_us(ft) - epoch_us(ts))
       THEN be ELSE fe END AS purchase_event,
  CASE WHEN bt IS NOT NULL AND (ft IS NULL
            OR epoch_us(ts) - epoch_us(bt) <= epoch_us(ft) - epoch_us(ts))
       THEN bv ELSE fv END AS purchase_value
FROM j
"""


def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type (operators/rollup.py::ohlc_bars):
    open/close via min_by/max_by on the log offset — mergeable aggregate
    state, so the whole candlestick is ONE partial+final hash aggregate
    (no per-bucket sort, no window over raw events)."""
    from fluvio_duck_spark.operators.rollup import ohlc_bars

    ev = load(spark, sf_dir, "events")
    return ohlc_bars(
        ev, "ts", "event_id", "value", ["event_type"],
        width_seconds=3600, sum_scale=2,
    )


ORACLE_OHLC = """
SELECT CAST(to_timestamp(CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT)) AS TIMESTAMP)
         AS bucket,
       event_type,
       arg_min(value, event_id) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       arg_max(value, event_id) AS close,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS volume
FROM events GROUP BY 1, 2
"""


QUERIES: dict[str, QuerySpec] = {
    "join_asof_nearest": QuerySpec(q_asof_join_nearest, ORACLE_ASOF_NEAREST,
                                   doc="nearest-direction as-of join (ties backward); 1 shuffle, 2 sorts"),
    "rollup_ohlc_bars": QuerySpec(q_ohlc_bars, ORACLE_OHLC,
                                  doc="hourly OHLC candlesticks via mergeable min_by/max_by state"),
    "join_min_cost_supplier": QuerySpec(q_min_cost_supplier, ORACLE_MIN_COST_SUPPLIER,
                                        doc="TPC-H Q2 shape: min-cost supplier per part, decorrelated MIN + broadcast dims"),
    "agg_part_value_share": QuerySpec(q_part_value_share, ORACLE_PART_VALUE_SHARE,
                                      doc="TPC-H Q11 shape: per-part value vs global-fraction threshold (window over agg)"),
    "agg_supplier_cnt": QuerySpec(q_supplier_cnt_by_part, ORACLE_SUPPLIER_CNT,
                                  doc="TPC-H Q16 shape: distinct supplier counts per part attrs, NOT IN anti join"),
    "join_excess_shippers": QuerySpec(q_excess_shippers, ORACLE_EXCESS_SHIPPERS,
                                      doc="TPC-H Q20 shape: correlated volume threshold via one-scan conditional agg + semi join"),
    "unpivot_metrics": QuerySpec(q_unpivot_metrics, ORACLE_UNPIVOT_METRICS,
                                 doc="wide→long melt of 4 lineitem measures + per-metric stats"),
    "sql_passthrough": QuerySpec(q_sql_passthrough, SQL_PASSTHROUGH,
                                 doc="identical SQL text on Spark and DuckDB (EXISTS/Q4 shape)"),
    "agg_salted_hotkey": QuerySpec(q_salted_hotkey_agg, ORACLE_SALTED_AGG,
                                   doc="two-phase salted aggregation (skew pattern) — §2.7"),
    "join_salted_skew": QuerySpec(q_join_salted_skew, ORACLE_JOIN_SALTED,
                                  doc="salted equi-join (8-way hot-key split, dim replicated) — hash-equal to the plain join"),
    "join_asof": QuerySpec(q_asof_join, ORACLE_ASOF,
                           doc="as-of join via union+window merge — §2.6"),
    "join_asof_broadcast": QuerySpec(q_asof_broadcast, ORACLE_ASOF,
                                     doc="as-of via broadcast validity intervals: fact side never shuffles — §2.6"),
    "scd2_intervals": QuerySpec(q_scd2_intervals, ORACLE_SCD2,
                                doc="SCD-2 dimension build: changelog -> versioned validity intervals"),
    "join_session_error_overlap": QuerySpec(
        q_session_error_overlap, ORACLE_SESSION_ERROR_OVERLAP,
        doc="grid-bucketed interval-overlap join (both sides large; no NLJ, no distinct)"),
    "join_asof_forward": QuerySpec(q_asof_join_forward, ORACLE_ASOF_FORWARD,
                                   doc="forward (next-at-or-after) as-of join — §2.6"),
    "join_asof_tolerance": QuerySpec(q_asof_join_tolerance, ORACLE_ASOF_TOLERANCE,
                                     doc="as-of join with bounded match window (merge_asof tolerance) — §2.6"),
    "join_order_count_dist": QuerySpec(q_order_count_distribution, ORACLE_ORDER_COUNT_DIST,
                                       doc="TPC-H Q13 shape: customer order-count distribution via left outer + double agg"),
    "join_range_band": QuerySpec(q_range_band_join, ORACLE_RANGE_BAND,
                                 doc="range banding join via broadcast NLJ — §2.6"),
    "agg_pricing_summary": QuerySpec(q_pricing_summary, ORACLE_PRICING,
                                     doc="TPC-H Q1 shape — §2.7 A4"),
    "agg_filtered_revenue": QuerySpec(q_filtered_revenue, ORACLE_FILTERED_REVENUE,
                                      doc="TPC-H Q6 shape: shuffle-free filter-scan aggregate, full pushdown"),
    "join_volume_shipping": QuerySpec(q_volume_shipping, ORACLE_VOLUME_SHIPPING,
                                      doc="TPC-H Q7 shape: bilateral nation-pair trade volume by year"),
    "agg_market_share": QuerySpec(q_market_share, ORACLE_MARKET_SHARE,
                                  doc="TPC-H Q8 shape: conditional-ratio market share over 6-way join"),
    "join_profit_by_nation_year": QuerySpec(q_profit_by_nation_year, ORACLE_PROFIT_NATION_YEAR,
                                            doc="TPC-H Q9 shape (no partsupp fixture): profit by supplier nation/year"),
    "join_returned_top_customers": QuerySpec(q_returned_top_customers, ORACLE_RETURNED_TOP,
                                             doc="TPC-H Q10 shape: top-20 customers by returned-item revenue"),
    "join_top_supplier": QuerySpec(q_top_supplier, ORACLE_TOP_SUPPLIER,
                                   doc="TPC-H Q15 shape: max-revenue supplier via reused agg + 1-row broadcast"),
    "join_disjunctive_bands": QuerySpec(q_disjunctive_bands, ORACLE_DISJUNCTIVE_BANDS,
                                        doc="TPC-H Q19 shape: OR-of-ANDs bands as residual join filter"),
    "join_waiting_suppliers": QuerySpec(q_waiting_suppliers, ORACLE_WAITING_SUPPLIERS,
                                        doc="TPC-H Q21 shape: semi+anti self-join, sole-returner suppliers"),
    "agg_rollup": QuerySpec(q_rollup, ORACLE_ROLLUP, doc="ROLLUP — §2.7 A4"),
    "agg_cube": QuerySpec(q_cube, ORACLE_CUBE, doc="CUBE — §2.7 A4"),
    "agg_grouping_sets": QuerySpec(q_grouping_sets, ORACLE_GROUPING_SETS,
                                   doc="GROUPING SETS — §2.7 A4"),
    "agg_distinct": QuerySpec(q_distinct, ORACLE_DISTINCT,
                              doc="COUNT DISTINCT — §2.7 A4"),
    "agg_approx": QuerySpec(q_approx_distinct, ORACLE_APPROX,
                            doc="approx_count_distinct/percentile vs exact companions + error-bound booleans"),
    "join_revenue_by_nation": QuerySpec(q_revenue_by_nation, ORACLE_REVENUE_BY_NATION,
                                        doc="TPC-H Q5 shape w/ broadcast dims — §2.6"),
    "join_shipping_priority": QuerySpec(q_shipping_priority, ORACLE_SHIPPING_PRIORITY,
                                        doc="TPC-H Q3 shape: 3-way join + agg + top-10 heap — §2.6"),
    "join_left_order_counts": QuerySpec(q_left_join_order_counts, ORACLE_LEFT_JOIN,
                                        doc="LEFT OUTER — §2.6"),
    "join_semi": QuerySpec(q_semi_join, ORACLE_SEMI_JOIN, doc="LEFT SEMI / EXISTS — §2.6"),
    "join_anti": QuerySpec(q_anti_join, ORACLE_ANTI_JOIN, doc="LEFT ANTI / NOT EXISTS — §2.6"),
    "join_full_outer": QuerySpec(q_full_outer_join, ORACLE_FULL_OUTER,
                                 doc="FULL OUTER — §2.6"),
    "window_topk_per_customer": QuerySpec(q_window_topk_per_customer, ORACLE_WINDOW_TOPK,
                                          doc="row_number top-k per group — §2.8"),
    "window_running_spend": QuerySpec(q_window_running_spend, ORACLE_WINDOW_RUNNING,
                                      doc="cumulative frame — §2.8"),
    "window_order_gaps": QuerySpec(q_window_order_gaps, ORACLE_WINDOW_GAPS,
                                   doc="lag/lead — §2.8"),
    "window_rank_ntile": QuerySpec(q_window_rank_ntile, ORACLE_WINDOW_RANK,
                                   doc="rank/dense_rank/ntile — §2.8"),
    "window_distribution": QuerySpec(q_window_distribution, ORACLE_WINDOW_DISTRIBUTION,
                                     doc="percent_rank/cume_dist/first/last with explicit frames — §2.8"),
    "topk_orders": QuerySpec(q_topk_orders, ORACLE_TOPK, doc="ORDER BY + LIMIT — §2.5 L3"),
    "set_ops": QuerySpec(q_set_ops, ORACLE_SET_OPS,
                         doc="UNION/INTERSECT/EXCEPT — §2.9"),
    "set_ops_all": QuerySpec(q_set_ops_all, ORACLE_SET_OPS_ALL,
                             doc="multiset INTERSECT ALL/EXCEPT ALL/UNION ALL — §2.9"),
    "pivot_qty_by_status": QuerySpec(q_pivot, ORACLE_PIVOT, doc="pivot — §2.7"),
    "above_avg_orders": QuerySpec(q_above_avg_orders, ORACLE_ABOVE_AVG,
                                  doc="scalar subquery via broadcast agg"),
    "scalar_string_funcs": QuerySpec(q_string_funcs, ORACLE_STRING_FUNCS, doc="§2.10"),
    "scalar_date_funcs": QuerySpec(q_date_funcs, ORACLE_DATE_FUNCS, doc="§2.10"),
    "scalar_math_funcs": QuerySpec(q_math_funcs, ORACLE_MATH_FUNCS, doc="§2.10"),
    "scalar_case_buckets": QuerySpec(q_case_coalesce, ORACLE_CASE, doc="§2.10"),
    "scalar_array_funcs": QuerySpec(q_array_funcs, ORACLE_ARRAY_FUNCS,
                                    doc="array/collection family — §2.10"),
    "scalar_regex_null_funcs": QuerySpec(q_regex_null_funcs, ORACLE_REGEX_NULL,
                                         doc="regex + null-handling family — §2.10"),
    "agg_exact_percentiles": QuerySpec(q_exact_percentiles, ORACLE_PERCENTILES,
                                       doc="exact interpolated percentiles — §2.7 A4"),
    "window_zscore": QuerySpec(q_window_zscore, ORACLE_ZSCORE,
                               doc="per-group z-score normalization, deterministic variance — §2.8"),
    "batch_sessionize": QuerySpec(q_batch_sessionize, ORACLE_SESSIONIZE,
                                  doc="batch sessionization (gap merge) — backfill twin of session windows"),
    "join_topk_shipping": QuerySpec(q_topk_shipping, ORACLE_TOPK_SHIPPING,
                                    doc="TPC-H Q3 shape: broadcast joins + agg + global top-10 — §2.6/§2.5"),
    "correlated_small_quantity": QuerySpec(q_correlated_small_quantity, ORACLE_CORRELATED,
                                           doc="TPC-H Q17 shape: correlated subquery decorrelated to broadcast agg-join"),
    "join_large_orders": QuerySpec(q_large_orders, ORACLE_LARGE_ORDERS,
                                   doc="TPC-H Q18 shape: HAVING-filtered agg broadcast into two joins + top-k"),
    "agg_conditional_priority": QuerySpec(q_conditional_priority_counts, ORACLE_CONDITIONAL_PRIORITY,
                                          doc="TPC-H Q12 shape: CASE-inside-SUM conditional aggregation"),
    "agg_promo_ratio": QuerySpec(q_promo_revenue_ratio, ORACLE_PROMO_REVENUE,
                                 doc="TPC-H Q14 shape: ratio of exact decimal sums, one double division"),
    "join_rich_idle_customers": QuerySpec(q_rich_idle_customers, ORACLE_RICH_IDLE,
                                          doc="TPC-H Q22 shape: scalar subquery + broadcast anti join"),
    "rollup_hourly": QuerySpec(q_rollup_hourly, ORACLE_ROLLUP_HOURLY,
                               doc="hypertable rollup: hourly continuous aggregate, mergeable decimal state"),
    "rollup_cascade_daily": QuerySpec(q_rollup_cascade_daily, ORACLE_ROLLUP_CASCADE,
                                      doc="cascaded daily-from-hourly rollup, provably lossless vs direct raw agg"),
    "rollup_hll_daily_users": QuerySpec(q_rollup_hll_daily_users, ORACLE_HLL_DAILY,
                                        doc="daily distinct-user estimate from mergeable hourly HLL sketches"),
    "rollup_hist_percentiles": QuerySpec(q_rollup_hist_percentiles, ORACLE_ROLLUP_HIST,
                                         doc="daily p50/p95 from cascaded hourly histogram state (mergeable, deterministic estimator)"),
}


def q_window_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global decile bins of order value with per-bin stats —
    §2.8's global-ordering case done the scalable way.  A vanilla
    ``ntile(10) OVER (ORDER BY …)`` plans a single-partition sort; the
    ``operators/ranking.py`` path range-partitions the sort and derives
    ranks from per-partition offsets, so the only data-sized exchange is
    the range partitioner.  The oracle IS the vanilla window form — the
    hash compare proves the distributed rank reproduces it exactly.
    Bin rule: floor((rank-1)·10/N)+1 (uniform split, bins differ ≤1)."""
    from fluvio_duck_spark.operators.ranking import quantile_bins

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    b = quantile_bins(o, ["o_totalprice", "o_orderkey"], n_bins=10)
    return b.groupBy("bin").agg(
        F.count("*").alias("n_orders"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count("*"),
            6,
        ).alias("avg_price"),
    )


ORACLE_QUANTILE_BINS = """
WITH r AS (
  SELECT o_totalprice,
         row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rnk,
         count(*) OVER () AS n
  FROM orders)
SELECT CAST(floor((rnk - 1) * 10 / n) + 1 AS INTEGER) AS bin,
       count(*) AS n_orders,
       min(o_totalprice) AS lo,
       max(o_totalprice) AS hi,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6)
         AS avg_price
FROM r GROUP BY 1
"""


QUERIES.update({
    "window_quantile_bins": QuerySpec(
        q_window_quantile_bins, ORACLE_QUANTILE_BINS,
        doc="exact global decile binning via range-partitioned rank (no single-reducer sort)",
    ),
})


def q_agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per event type: values clipped at the exact
    per-group p05/p95 before averaging — the outlier-robust aggregate a
    metrics pipeline reports beside the raw mean.

    Two passes over the (small) per-group value sets: exact percentiles
    by group (agg + broadcast join-back, same shape as ts_anomaly_mad),
    then one map-side-combined clipped-DECIMAL mean.  Clip boundaries
    are interpolated doubles over round-6 decimals — identical across
    engines — and the clipped values re-enter DECIMAL before summing,
    so the mean is order-proof.
    """
    ev = load(spark, sf_dir, "events")
    vals = ev.select(
        "event_type", F.round("value", 6).cast("decimal(18,6)").alias("y")
    )
    pct = vals.groupBy("event_type").agg(
        F.expr("percentile(y, 0.05)").alias("lo"),
        F.expr("percentile(y, 0.95)").alias("hi"),
    )
    clipped = vals.join(F.broadcast(pct), "event_type").select(
        "event_type",
        F.least(
            F.greatest(F.col("y").cast("double"), F.col("lo")), F.col("hi")
        ).cast("decimal(18,6)").alias("yc"),
    )
    return clipped.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum("yc").cast("double") / F.count("*"), 6
        ).alias("winsorized_mean"),
    )


ORACLE_WINSORIZED = """
WITH vals AS (
  SELECT event_type, CAST(round(value, 6) AS DECIMAL(18,6)) AS y
  FROM events
), pct AS (
  SELECT event_type,
         quantile_cont(y, 0.05) AS lo, quantile_cont(y, 0.95) AS hi
  FROM vals GROUP BY 1
), clipped AS (
  SELECT v.event_type,
         CAST(least(greatest(CAST(v.y AS DOUBLE), p.lo), p.hi)
              AS DECIMAL(18,6)) AS yc
  FROM vals v JOIN pct p USING (event_type)
)
SELECT event_type, count(*) AS n,
       round(CAST(sum(yc) AS DOUBLE) / count(*), 6) AS winsorized_mean
FROM clipped GROUP BY event_type
"""


QUERIES.update({
    "agg_winsorized_mean": QuerySpec(
        q_agg_winsorized_mean, ORACLE_WINSORIZED,
        doc="outlier-robust mean: exact p05/p95 clip per group, DECIMAL-exact average",
    ),
})


def q_agg_gini_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration index of `value` per event type — the
    inequality summary behind the Pareto/whale report
    (events_pareto_share): G = 2·Σ(rank·y) / (n·Σy) − (n+1)/n over
    values ranked ascending.

    One window shuffle on the group key (rank is in-group, never a
    global sort); rank·y products and both sums accumulate in exact
    DECIMAL, so G is a single order-proof double expression.  Ranks are
    totalized by (y, event_id) — engine-identical ordering.
    """
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    yd = F.round("value", 6).cast("decimal(18,6)")
    w = W.partitionBy("event_type").orderBy("y", "event_id")
    ranked = ev.select(
        "event_type", yd.alias("y"), "event_id"
    ).withColumn("rk", F.row_number().over(w))
    s = ranked.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("rk") * F.col("y")).alias("sry"),
    )
    gini = (
        F.lit(2.0) * F.col("sry").cast("double")
        / (F.col("n").cast("double") * F.col("sy").cast("double"))
        - (F.col("n") + F.lit(1)).cast("double") / F.col("n").cast("double")
    )
    return s.select("event_type", "n", F.round(gini, 6).alias("gini"))


ORACLE_GINI = """
WITH ranked AS (
  SELECT event_type, CAST(round(value, 6) AS DECIMAL(18,6)) AS y,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY CAST(round(value, 6) AS DECIMAL(18,6)),
                                     event_id) AS rk
  FROM events
), s AS (
  SELECT event_type, count(*) AS n, sum(y) AS sy, sum(rk * y) AS sry
  FROM ranked GROUP BY 1
)
SELECT event_type, n,
       round(2.0 * CAST(sry AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(sy AS DOUBLE))
             - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS gini
FROM s
"""


QUERIES.update({
    "agg_gini_by_type": QuerySpec(
        q_agg_gini_by_type, ORACLE_GINI,
        doc="Gini concentration of value per type: in-group rank, DECIMAL-exact sums, one double expr",
    ),
})


def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact WEIGHTED median per event type (weight = 1 + user_id%5, a
    deterministic importance stand-in) — the robust-aggregation shape
    importance-weighted corpora need where plain percentile ignores
    weights.  One per-type window cumulative weight + threshold pick:
    the window sorts within each type partition (linear, spilled sort —
    never a global single-task sort), and the tie analysis is
    order-free: only the VALUE at the crossing surfaces, so ambiguous
    ordering among equal values cannot change the answer."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events").select(
        "event_type", "value", (1 + F.col("user_id") % 5).alias("wt")
    )
    cum = W.partitionBy("event_type").orderBy("value").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    tot = W.partitionBy("event_type")
    c = ev.select(
        "event_type", "value",
        F.sum("wt").over(cum).alias("cw"),
        F.sum("wt").over(tot).alias("tw"),
    )
    return (
        c.filter(2 * F.col("cw") >= F.col("tw"))
        .groupBy("event_type")
        .agg(F.min("value").alias("wmedian"))
    )


ORACLE_WEIGHTED_MEDIAN = """
WITH w AS (
  SELECT event_type, value, 1 + user_id % 5 AS wt FROM events),
c AS (
  SELECT event_type, value, wt,
         SUM(wt) OVER (PARTITION BY event_type ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         SUM(wt) OVER (PARTITION BY event_type) AS tw
  FROM w)
SELECT event_type, MIN(value) AS wmedian
FROM c WHERE 2 * cw >= tw GROUP BY event_type
"""


QUERIES.update({
    "agg_weighted_median": QuerySpec(
        q_weighted_median, ORACLE_WEIGHTED_MEDIAN,
        doc="exact weighted median per group (cumulative-weight crossing; tie-order-free) — robust weighted aggregation",
    ),
})
