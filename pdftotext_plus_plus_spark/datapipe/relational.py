"""Generic relational surface over the driver's TPC-H-style tables.

* pricing_summary — the Q1 shape: filter -> group-by-two-low-cardinality-
  keys -> partial-aggregatable sums/counts.  At 100 TB this is the
  canonical map-side-combine plan: the filter pushes to the parquet scan,
  the aggregation is a single hash-agg exchange on a 4-value key.
* shipping_priority — the Q3 shape: three-way join (customer |><| orders
  |><| lineitem) with per-table pushed filters, group + deterministic
  top-k.  The segment-filtered customer dim is left to AQE's size-based
  broadcast decision (at TPC-H scale customer is NOT always broadcastable;
  declaring the join and letting runtime stats pick the strategy is the
  100 TB-safe plan — the plan test pins that at test scale it DOES
  broadcast, i.e. no sort-merge on the dim side).
* regional_revenue — the Q5 shape: five-way join where nation/region are
  FORCED broadcasts (25/5 rows at any scale) and the fact-fact joins
  shuffle on their keys.

Float sums are rounded to 2 decimals before comparison so summation-order
differences between engines (both f64) cannot flip a digit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CUTOFF = "1997-12-31 23:59:59"
Q3_DATE = "1998-06-01 00:00:00"
Q3_SEGMENT = "BUILDING"
Q5_REGION = "ASIA"
Q5_START = "1996-01-01 00:00:00"
Q5_END = "1998-01-01 00:00:00"


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (li.filter(F.col("l_shipdate") <= F.lit(CUTOFF).cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
                 F.round(F.sum(charge), 2).alias("sum_charge"),
                 F.count("*").alias("count_order")))


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: customer |><| orders |><| lineitem, filter + group +
    deterministic top-10 (rank on rounded revenue, then order key, so the
    limit cannot be tie-ambiguous across engines)."""
    cust = (spark.read.parquet(f"{sf_dir}/customer.parquet")
            .filter(F.col("c_mktsegment") == Q3_SEGMENT)
            .select("c_custkey"))
    orders = (spark.read.parquet(f"{sf_dir}/orders.parquet")
              .filter(F.col("o_orderdate")
                      < F.lit(Q3_DATE).cast("timestamp"))
              .select("o_orderkey", "o_custkey", "o_orderdate",
                      "o_orderpriority"))
    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .filter(F.col("l_shipdate") > F.lit(Q3_DATE).cast("timestamp"))
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    out = (orders.join(cust, orders.o_custkey == cust.c_custkey)
           .join(li, li.l_orderkey == orders.o_orderkey)
           .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
           .agg(F.round(F.sum(revenue), 2).alias("revenue")))
    return (out.orderBy(F.desc("revenue"), F.asc("l_orderkey"))
            .limit(10)
            .select("l_orderkey", "revenue", "o_orderdate",
                    "o_orderpriority"))


SHIPPING_PRIORITY_SQL = f"""
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{Q3_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{Q3_DATE}'
  AND l_shipdate > TIMESTAMP '{Q3_DATE}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: lineitem |><| orders |><| customer |><| supplier with the
    customer-and-supplier-same-nation constraint, nation/region as FORCED
    broadcasts (constant-size dims at any scale)."""
    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .select("l_orderkey", "l_suppkey", "l_extendedprice",
                  "l_discount"))
    orders = (spark.read.parquet(f"{sf_dir}/orders.parquet")
              .filter((F.col("o_orderdate")
                       >= F.lit(Q5_START).cast("timestamp"))
                      & (F.col("o_orderdate")
                         < F.lit(Q5_END).cast("timestamp")))
              .select("o_orderkey", "o_custkey"))
    cust = (spark.read.parquet(f"{sf_dir}/customer.parquet")
            .select("c_custkey", "c_nationkey"))
    supp = (spark.read.parquet(f"{sf_dir}/supplier.parquet")
            .select("s_suppkey", "s_nationkey"))
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = (spark.read.parquet(f"{sf_dir}/region.parquet")
              .filter(F.col("r_name") == Q5_REGION))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (li.join(orders, li.l_orderkey == orders.o_orderkey)
         .join(cust, orders.o_custkey == cust.c_custkey)
         .join(supp, (li.l_suppkey == supp.s_suppkey)
               & (cust.c_nationkey == supp.s_nationkey))
         .join(F.broadcast(nation),
               supp.s_nationkey == nation.n_nationkey)
         .join(F.broadcast(region),
               nation.n_regionkey == region.r_regionkey))
    return (j.groupBy("n_name")
            .agg(F.round(F.sum(revenue), 2).alias("revenue"))
            .select("n_name", "revenue"))


REGIONAL_REVENUE_SQL = f"""
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = '{Q5_REGION}'
  AND o_orderdate >= TIMESTAMP '{Q5_START}'
  AND o_orderdate < TIMESTAMP '{Q5_END}'
GROUP BY n_name
"""


PRICING_SUMMARY_SQL = f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
         AS sum_charge,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{CUTOFF}'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# anti-join and HAVING shapes
# ---------------------------------------------------------------------------

INACTIVE_CUTOFF = "2000-01-01 00:00:00"
Q18_MIN_QTY = 250


def inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The anti-join shape (TPC-H Q22 flavor): customers with NO order on
    or after the cutoff, via ``left_anti`` — Catalyst turns the NOT-EXISTS
    into a broadcast/shuffled anti join with the filter pushed to the
    orders scan.  At 100 TB the anti side is the filtered orders keys,
    shuffled on custkey; no driver-side set materialization."""
    cust = (spark.read.parquet(f"{sf_dir}/customer.parquet")
            .select("c_custkey", "c_mktsegment", "c_acctbal"))
    recent = (spark.read.parquet(f"{sf_dir}/orders.parquet")
              .filter(F.col("o_orderdate")
                      >= F.lit(INACTIVE_CUTOFF).cast("timestamp"))
              .select("o_custkey"))
    return (cust.join(recent, cust.c_custkey == recent.o_custkey,
                      "left_anti")
            .select("c_custkey", "c_mktsegment",
                    F.round("c_acctbal", 2).alias("acctbal")))


INACTIVE_CUSTOMERS_SQL = f"""
SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS acctbal
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= TIMESTAMP '{INACTIVE_CUTOFF}')
"""


def big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Q18 shape: group lineitem by order, HAVING a quantity floor,
    then semi-reduce orders to the qualifying keys.  The HAVING runs as a
    post-aggregation filter on the partially-aggregated sum; the join back
    to orders is an equi-join on the (now tiny) qualifying key set, which
    AQE broadcast-promotes at runtime."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = (spark.read.parquet(f"{sf_dir}/orders.parquet")
              .select("o_orderkey", "o_custkey", "o_orderdate"))
    qual = (li.groupBy("l_orderkey")
            .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
            .filter(F.col("total_qty") > Q18_MIN_QTY))
    return (orders.join(qual, orders.o_orderkey == qual.l_orderkey)
            .select("o_orderkey", "o_custkey", "o_orderdate", "total_qty"))


BIG_ORDERS_SQL = f"""
SELECT o_orderkey, o_custkey, o_orderdate,
       round(total_qty, 2) AS total_qty
FROM orders
JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING round(sum(l_quantity), 2) > {Q18_MIN_QTY}) q
  ON o_orderkey = q.l_orderkey
"""
