"""Deep TPC-H-shape coverage over the synthetic star schema.

The reference has no query language at all (SURVEY §3: imperative
SQLite programs), so the relational breadth the charter requires is
defined by the classic TPC-H plan shapes. plans/relational.py carries
q1/q3/q4/q5/q6/q10; this module adds the remaining distinct *plan
machineries*:

- q2   correlated scalar subquery → Catalyst decorrelation into an
       aggregate + join (the min-cost-supplier shape)
- q7   nation-pair volume join with a disjunctive pair predicate
- q8   market-share ratio of conditional aggregates
- q9   profit expression over a 5-way join with a LIKE filter
- q11  aggregated value vs a threshold derived from the global
       statistics of the same aggregation — one CTE consumed as rows
       AND as a scalar (r4)
- q12  dual complementary conditional counts over a cross-table date
       predicate (r4)
- q13  LEFT OUTER join with an ON-clause filter + histogram-of-counts
       double aggregation (r4)
- q14  conditional-aggregate ratio over a date slice (promo revenue)
- q15  argmax over a derived aggregation: aggregate → global scalar
       max → equality join back (r4)
- q16  COUNT(DISTINCT) with a NOT IN null-aware anti join
- q17  correlated scalar AVG inside a range predicate (r4)
- q18  HAVING-filtered aggregate driving a semi-join back to facts
- q19  disjunction-of-conjunctions predicate (OR-block pushdown)
- q20  IN-subquery with a correlated scalar aggregate in its HAVING,
       nested above a second IN — three decorrelation levels (r4)
- q21  EXISTS + NOT EXISTS self-joins whose anti predicate correlates
       to two outer relations at once (r4)
- q22  NOT EXISTS anti join + global scalar subquery per row

The schema is TPC-H-lite (no partsupp, no shipmode/commitdate — see
FIXTURES.md §B.1), so q2/q9/q12-style queries are re-anchored on the
columns that exist; the PLAN SHAPE is what each entry exercises, and
every entry is exact-oracle-checked against DuckDB.

q2/q16/q22 run through ``spark.sql`` on registered temp views — the
subquery surfaces (correlated scalar, NOT IN, NOT EXISTS) are SQL-only
constructs, and running the *same text* on both engines makes the
oracle a true differential test of Catalyst's decorrelation.

100 TB posture: dimension joins broadcast (part/supplier/nation/
region); fact-side aggregates are partial (map-side combine) before
their one shuffle; q18's HAVING subquery aggregates lineitem to
order grain BEFORE joining orders (the join ships only qualifying
keys); q19's OR-blocks reference only scan columns, so the whole
disjunction pushes into the parquet reader as a row-group filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table, register_tables
from .base import Query


# ------------------------------------------------------------- q2

_Q2_SQL = """
SELECT p.p_partkey, p.p_name, s.s_name, n.n_name,
       round(s.s_acctbal, 2) AS acctbal,
       round(l.l_extendedprice / l.l_quantity, 4) AS unit_price
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN region r   ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'EUROPE' AND p.p_size <= 10
  AND l.l_extendedprice / l.l_quantity = (
    SELECT min(l2.l_extendedprice / l2.l_quantity)
    FROM lineitem l2
    JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
    JOIN nation n2   ON n2.n_nationkey = s2.s_nationkey
    JOIN region r2   ON r2.r_regionkey = n2.n_regionkey
    WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
  )
"""


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the supplier(s) achieving the minimum unit price
    per small European part — a correlated scalar subquery Catalyst
    decorrelates into (aggregate per part) ⋈ (outer query). The min is
    computed over the identical IEEE-double division in both engines,
    so the equality predicate is bit-stable; no partsupp table exists,
    lineitem is the part↔supplier link (FIXTURES.md §B.1)."""
    register_tables(spark, sf_dir)
    return spark.sql(_Q2_SQL)


# ------------------------------------------------------------- q7

_Q7_PAIRS = (("NATION_1", "NATION_2"), ("NATION_2", "NATION_1"))


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue flowing between a nation pair (both
    directions), by ship year. Two broadcast copies of nation resolve
    supplier and customer sides independently; the pair disjunction is
    evaluated post-join on broadcast-joined labels."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    sn = nation.select(F.col("n_nationkey").alias("sn_key"),
                       F.col("n_name").alias("supp_nation"))
    cn = nation.select(F.col("n_nationkey").alias("cn_key"),
                       F.col("n_name").alias("cust_nation"))
    pair_pred = None
    for a, b in _Q7_PAIRS:
        p = (F.col("supp_nation") == a) & (F.col("cust_nation") == b)
        pair_pred = p if pair_pred is None else (pair_pred | p)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair_pred)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
    )


Q7_ORACLE = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       year(l.l_shipdate) AS l_year,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
   OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
GROUP BY 1, 2, 3
"""


# ------------------------------------------------------------- q8

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of revenue in a regional
    market per order year — a ratio of a conditional SUM to the total,
    computed in the same aggregate (one pass, no second scan)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cn = (cust.join(F.broadcast(nation),
                    F.col("c_nationkey") == F.col("n_nationkey"))
          .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
          .filter(F.col("r_name") == "ASIA")
          .select("c_custkey"))
    sn = supp.join(F.broadcast(nation),
                   F.col("s_nationkey") == F.col("n_nationkey")).select(
        "s_suppkey", F.col("n_name").alias("supp_nation"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    target = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0.0))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cn), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(target) / F.sum(rev), 6).alias("mkt_share"),
             F.count(F.lit(1)).alias("n_items"))
    )


Q8_ORACLE = """
SELECT year(o.o_orderdate) AS o_year,
       round(sum(CASE WHEN sn.n_name = 'NATION_3'
                      THEN l.l_extendedprice * (1 - l.l_discount)
                      ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS mkt_share,
       count(*) AS n_items
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
WHERE o.o_custkey IN (
  SELECT c.c_custkey FROM customer c
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'ASIA')
GROUP BY 1
"""


# ------------------------------------------------------------- q9

def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier nation per order year.
    No partsupp/supplycost in the schema — cost is modeled as 10% of
    retail price × quantity (same formula in the oracle); part filter
    is a LIKE on p_name, evaluated before the broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    sn = supp.join(F.broadcast(nation),
                   F.col("s_nationkey") == F.col("n_nationkey")).select(
        "s_suppkey", "n_name")
    amount = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity"))
    return (
        li.join(F.broadcast(part.filter(F.col("p_name").like("%red%"))),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(amount), 2).alias("profit"),
             F.count(F.lit(1)).alias("n_items"))
    )


Q9_ORACLE = """
SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
       round(sum(l.l_extendedprice * (1 - l.l_discount)
                 - 0.1 * p.p_retailprice * l.l_quantity), 2) AS profit,
       count(*) AS n_items
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%red%'
GROUP BY 1, 2
"""


# ------------------------------------------------------------- q14

def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo share of revenue in one shipping
    quarter — conditional-aggregate ratio, date-range scan filter
    pushed to parquet, part broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    lo = F.expr("timestamp'1996-01-01 00:00:00'")
    hi = F.expr("timestamp'1996-04-01 00:00:00'")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(F.round(F.lit(100.0) * F.sum(promo) / F.sum(rev), 4)
             .alias("promo_revenue"),
             F.count(F.lit(1)).alias("n_items"))
    )


Q14_ORACLE = """
SELECT round(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue,
       count(*) AS n_items
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
"""


# ------------------------------------------------------------- q16

_Q16_SQL = """
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#13'
  AND p.p_size IN (1, 5, 9, 14, 20, 25, 30, 35, 40, 45)
  AND l.l_suppkey NOT IN (
    SELECT s.s_suppkey FROM supplier s
    WHERE s.s_acctbal < (SELECT 0.5 * avg(s2.s_acctbal) FROM supplier s2)
  )
GROUP BY 1, 2, 3
"""


def q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part class,
    excluding below-par suppliers via NOT IN — a null-aware anti join
    feeding a COUNT(DISTINCT) Expand rewrite. Same SQL text runs on
    both engines."""
    register_tables(spark, sf_dir)
    return spark.sql(_Q16_SQL)


# ------------------------------------------------------------- q18

_Q18_QTY = 140.0


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity clears a threshold,
    joined back to customers. Lineitem aggregates to order grain FIRST
    (partial-agg before its one shuffle), so the orders/customer joins
    ship only qualifying keys — the plan that survives a fact table
    1000× the dimension side. Quantities are integer-valued doubles,
    so the HAVING comparison is exact in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (li.groupBy("l_orderkey")
           .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
           .filter(F.col("sum_qty") > _Q18_QTY))
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey",
                F.to_date("o_orderdate").alias("o_orderdate"),
                F.round("o_totalprice", 2).alias("o_totalprice"), "sum_qty")
    )


Q18_ORACLE = f"""
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate::DATE AS o_orderdate,
       round(o.o_totalprice, 2) AS o_totalprice, big.sum_qty
FROM (SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING round(sum(l_quantity), 2) > {_Q18_QTY}) big
JOIN orders o   ON big.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
"""


# ------------------------------------------------------------- q19

_Q19_BLOCKS = (
    ("Brand#11", 1, 5, 1.0, 11.0),
    ("Brand#22", 1, 10, 10.0, 20.0),
    ("Brand#33", 1, 15, 20.0, 30.0),
)


def q19_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction-of-conjunctions over (brand, size,
    quantity) bands. Every OR-block references only scan columns, so
    Catalyst pushes the whole disjunction into the parquet row-group
    filter; part is broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    pred = None
    for brand, s_lo, s_hi, q_lo, q_hi in _Q19_BLOCKS:
        p = ((F.col("p_brand") == brand)
             & F.col("p_size").between(s_lo, s_hi)
             & F.col("l_quantity").between(q_lo, q_hi))
        pred = p if pred is None else (pred | p)
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(pred)
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
    )


Q19_ORACLE = """
SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1.0 AND 11.0)
   OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10.0 AND 20.0)
   OR (p.p_brand = 'Brand#33' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20.0 AND 30.0)
"""


# ------------------------------------------------------------- q22

_Q22_SQL = """
SELECT c.c_nationkey % 5 AS bucket,
       count(*) AS numcust,
       round(sum(c.c_acctbal), 2) AS totacctbal
FROM customer c
WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                     WHERE c2.c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY 1
"""


def q22_idle_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers with no RECENT orders —
    global scalar subquery (one broadcast scalar) + NOT EXISTS anti
    join, grouped by a derived bucket (no phone prefix in the schema;
    nationkey mod 5 plays the cntrycode role; at this order density
    every customer has SOME order, so the dormancy window is what
    makes the anti join selective). Same SQL text runs on both
    engines."""
    register_tables(spark, sf_dir)
    return spark.sql(_Q22_SQL)


# ------------------------------------------------------------- q11

_Q11_SQL = """
WITH partval AS (
  SELECT l_partkey, sum(l_quantity) AS val
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, CAST(val AS BIGINT) AS val
FROM partval
WHERE val > (SELECT 1.5 * avg(val) FROM partval)
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: rows whose aggregated value exceeds a global
    threshold derived from the same aggregation (1.5× the mean — the
    original's fixed fraction of the total yields nothing at this
    corpus's flat part distribution, and a data-relative threshold is
    scale-free across regenerations). The derived CTE is consumed
    twice (group rows + global scalar). Quantities are integer-valued
    doubles, so the sums and their mean are bit-identical in both
    engines and the comparison cannot straddle an engine-specific ulp
    (l_extendedprice sums would). No partsupp: shipped quantity per
    part plays the stock-value role."""
    register_tables(spark, sf_dir)
    return spark.sql(_Q11_SQL)


# ------------------------------------------------------------- q12

_Q12_SQL = """
SELECT l.l_returnflag AS ship_class,
       sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS high_line_count,
       sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS low_line_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
GROUP BY l.l_returnflag
"""


def q12_late_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: two complementary conditional counts in one
    aggregate over a cross-table date predicate (ship vs order date) —
    the dual-CASE-SUM machinery. No shipmode column; returnflag plays
    the ship-class role and priority the urgency split."""
    register_tables(spark, sf_dir)
    return spark.sql(_Q12_SQL)


# ------------------------------------------------------------- q15

_Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(l_quantity) AS total_qty,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  GROUP BY l_suppkey
)
SELECT s.s_name, r.supplier_no, r.total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_qty = (SELECT max(total_qty) FROM revenue)
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the row(s) achieving the maximum of a derived
    aggregation — aggregate → global scalar max → equality join back,
    the view-plus-argmax machinery (q2's correlated min is per-group;
    this max is global). The argmax measure is the INTEGER-valued
    quantity sum: the optimizer instantiates the CTE twice (rows +
    scalar), and a float-sum measure proved bitwise-unstable between
    the two instances under the composite's partitioning — an exact
    sum is identical in every evaluation and every engine. The revenue
    column stays a rounded output, never a compared value."""
    register_tables(spark, sf_dir)
    return spark.sql(_Q15_SQL)


# ------------------------------------------------------------- q13

_Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey AS ck, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) t
GROUP BY c_count
"""


def q13_order_count_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the order-count distribution — LEFT OUTER join
    with a join-side filter (the filter must stay in the ON clause:
    a WHERE would turn the outer join inner and drop zero-order
    customers), then a histogram-of-counts double aggregation.
    No o_comment in the schema; the priority filter plays its role."""
    register_tables(spark, sf_dir)
    return spark.sql(_Q13_SQL)


# ------------------------------------------------------------- q17

_Q17_SQL = """
SELECT round(sum(l.l_extendedprice) / 7.0, 4) AS avg_weekly,
       count(*) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#12'
  AND l.l_quantity < (
    SELECT 0.2 * avg(l2.l_quantity)
    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
  )
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from below-average-quantity line items
    — a correlated scalar AVG per part inside a range predicate, which
    Catalyst decorrelates into (per-part aggregate) ⋈ fact. The
    threshold is 0.2·avg of INTEGER-valued quantities, so both engines
    compute the identical double and the strict < cannot straddle an
    engine-specific ulp."""
    register_tables(spark, sf_dir)
    return spark.sql(_Q17_SQL)


# ------------------------------------------------------------- q20

_Q20_SQL = """
SELECT s.s_name, n.n_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE s.s_suppkey IN (
  SELECT l.l_suppkey
  FROM lineitem l
  WHERE l.l_partkey IN (
    SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
  )
  GROUP BY l.l_suppkey, l.l_partkey
  HAVING sum(l.l_quantity) > 0.02 * (
    SELECT sum(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey
  )
)
"""


def q20_excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers holding an outsized share of a named
    part family — an IN-subquery whose HAVING clause contains a
    correlated scalar aggregate (supplier's quantity vs the part's
    total), itself filtered by a nested IN. Three levels of
    decorrelation in one predicate chain. No partsupp/availqty in the
    schema, so shipped-quantity share stands in for excess
    availability; integer-valued sums keep the 0.02·total comparison
    bit-identical across engines."""
    register_tables(spark, sf_dir)
    return spark.sql(_Q20_SQL)


# ------------------------------------------------------------- q21

_Q21_SQL = """
SELECT s.s_name, count(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s.s_name
"""


def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the supplier who ALONE was late on a
    multi-supplier order — EXISTS and NOT EXISTS self-joins on the
    fact table where the anti-join predicate correlates to TWO outer
    relations at once (l1's keys and o's date). The classic worst case
    for decorrelation; no commit/receipt dates in the schema, so
    late = shipped >60 days after order date (the q4 convention). No
    LIMIT: ties would make top-k nondeterministic, the full grouped
    result is the stable object."""
    register_tables(spark, sf_dir)
    return spark.sql(_Q21_SQL)


# ------------------------------------------- tagged family composite
#
# The driver records correctness rows for at most 50 registry entries,
# so the sixteen shapes ship as ONE tagged composite (the op_jn_semi_anti
# / op_win_1_ewma_dual precedent): every constituent keeps its own
# builder, its own oracle SQL, and its own verified semantics — the
# composite aligns them onto (shape, k1, k2, k3, n, v1, v2) and unions
# the per-shape oracles identically.

_S = "string"


def _null_s():
    return F.lit(None).cast(_S)


def _null_d():
    return F.lit(None).cast("double")


def tpch_deep_shapes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All sixteen deep TPC-H shapes, tagged by ``shape`` and aligned onto
    a common frame: k1–k3 string dimensions, n the integer measure,
    v1/v2 the value measures. Each constituent subplan is exactly its
    standalone builder's plan; the union only renames columns."""
    q2 = q2_min_cost_supplier(spark, sf_dir).select(
        F.lit("q2_min_cost_supplier").alias("shape"),
        F.col("p_name").alias("k1"), F.col("s_name").alias("k2"),
        F.col("n_name").alias("k3"), F.col("p_partkey").cast("long").alias("n"),
        F.col("acctbal").alias("v1"), F.col("unit_price").alias("v2"),
    )
    q7 = q7_volume_shipping(spark, sf_dir).select(
        F.lit("q7_volume_shipping").alias("shape"),
        F.col("supp_nation").alias("k1"), F.col("cust_nation").alias("k2"),
        F.col("l_year").cast(_S).alias("k3"), F.col("n_items").alias("n"),
        F.col("revenue").alias("v1"), _null_d().alias("v2"),
    )
    q8 = q8_market_share(spark, sf_dir).select(
        F.lit("q8_market_share").alias("shape"),
        _null_s().alias("k1"), _null_s().alias("k2"),
        F.col("o_year").cast(_S).alias("k3"), F.col("n_items").alias("n"),
        F.col("mkt_share").alias("v1"), _null_d().alias("v2"),
    )
    q9 = q9_product_profit(spark, sf_dir).select(
        F.lit("q9_product_profit").alias("shape"),
        F.col("nation").alias("k1"), _null_s().alias("k2"),
        F.col("o_year").cast(_S).alias("k3"), F.col("n_items").alias("n"),
        F.col("profit").alias("v1"), _null_d().alias("v2"),
    )
    q14 = q14_promo_revenue(spark, sf_dir).select(
        F.lit("q14_promo_revenue").alias("shape"),
        _null_s().alias("k1"), _null_s().alias("k2"), _null_s().alias("k3"),
        F.col("n_items").alias("n"),
        F.col("promo_revenue").alias("v1"), _null_d().alias("v2"),
    )
    q16 = q16_supplier_diversity(spark, sf_dir).select(
        F.lit("q16_supplier_diversity").alias("shape"),
        F.col("p_brand").alias("k1"), F.col("p_type").alias("k2"),
        F.col("p_size").cast(_S).alias("k3"),
        F.col("supplier_cnt").cast("long").alias("n"),
        _null_d().alias("v1"), _null_d().alias("v2"),
    )
    q18 = q18_large_orders(spark, sf_dir).select(
        F.lit("q18_large_orders").alias("shape"),
        F.col("c_name").alias("k1"), F.col("o_orderkey").cast(_S).alias("k2"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("k3"),
        F.col("c_custkey").cast("long").alias("n"),
        F.col("o_totalprice").alias("v1"), F.col("sum_qty").alias("v2"),
    )
    q19 = q19_discount_revenue(spark, sf_dir).select(
        F.lit("q19_discount_revenue").alias("shape"),
        _null_s().alias("k1"), _null_s().alias("k2"), _null_s().alias("k3"),
        F.col("n_items").alias("n"),
        F.col("revenue").alias("v1"), _null_d().alias("v2"),
    )
    q22 = q22_idle_accounts(spark, sf_dir).select(
        F.lit("q22_idle_accounts").alias("shape"),
        F.col("bucket").cast(_S).alias("k1"), _null_s().alias("k2"),
        _null_s().alias("k3"), F.col("numcust").cast("long").alias("n"),
        F.col("totacctbal").alias("v1"), _null_d().alias("v2"),
    )
    q11 = q11_important_stock(spark, sf_dir).select(
        F.lit("q11_important_stock").alias("shape"),
        F.col("l_partkey").cast(_S).alias("k1"), _null_s().alias("k2"),
        _null_s().alias("k3"), F.col("val").alias("n"),
        _null_d().alias("v1"), _null_d().alias("v2"),
    )
    q12 = q12_late_shipping_priority(spark, sf_dir).select(
        F.lit("q12_late_shipping_priority").alias("shape"),
        F.col("ship_class").alias("k1"), _null_s().alias("k2"),
        _null_s().alias("k3"), F.col("high_line_count").cast("long").alias("n"),
        F.col("low_line_count").cast("double").alias("v1"),
        _null_d().alias("v2"),
    )
    q15 = q15_top_supplier(spark, sf_dir).select(
        F.lit("q15_top_supplier").alias("shape"),
        F.col("s_name").alias("k1"), _null_s().alias("k2"),
        _null_s().alias("k3"), F.col("supplier_no").cast("long").alias("n"),
        F.col("total_revenue").alias("v1"), _null_d().alias("v2"),
    )
    q13 = q13_order_count_hist(spark, sf_dir).select(
        F.lit("q13_order_count_hist").alias("shape"),
        F.col("c_count").cast(_S).alias("k1"), _null_s().alias("k2"),
        _null_s().alias("k3"), F.col("custdist").cast("long").alias("n"),
        _null_d().alias("v1"), _null_d().alias("v2"),
    )
    q17 = q17_small_quantity_revenue(spark, sf_dir).select(
        F.lit("q17_small_quantity_revenue").alias("shape"),
        _null_s().alias("k1"), _null_s().alias("k2"), _null_s().alias("k3"),
        F.col("n_items").cast("long").alias("n"),
        F.col("avg_weekly").alias("v1"), _null_d().alias("v2"),
    )
    q20 = q20_excess_share_suppliers(spark, sf_dir).select(
        F.lit("q20_excess_share_suppliers").alias("shape"),
        F.col("s_name").alias("k1"), F.col("n_name").alias("k2"),
        _null_s().alias("k3"), F.lit(None).cast("long").alias("n"),
        _null_d().alias("v1"), _null_d().alias("v2"),
    )
    q21 = q21_sole_late_supplier(spark, sf_dir).select(
        F.lit("q21_sole_late_supplier").alias("shape"),
        F.col("s_name").alias("k1"), _null_s().alias("k2"),
        _null_s().alias("k3"), F.col("numwait").cast("long").alias("n"),
        _null_d().alias("v1"), _null_d().alias("v2"),
    )
    out = q2
    for piece in (q7, q8, q9, q11, q12, q13, q14, q15, q16, q17, q18,
                  q19, q20, q21, q22):
        out = out.unionByName(piece)
    return out


TPCH_DEEP_ORACLE = f"""
WITH q2 AS ({_Q2_SQL}),
q7 AS ({Q7_ORACLE}),
q8 AS ({Q8_ORACLE}),
q9 AS ({Q9_ORACLE}),
q11 AS ({_Q11_SQL}),
q12 AS ({_Q12_SQL}),
q13 AS ({_Q13_SQL}),
q15 AS ({_Q15_SQL}),
q14 AS ({Q14_ORACLE}),
q16 AS ({_Q16_SQL}),
q17 AS ({_Q17_SQL}),
q18 AS ({Q18_ORACLE}),
q19 AS ({Q19_ORACLE}),
q20 AS ({_Q20_SQL}),
q21 AS ({_Q21_SQL}),
q22 AS ({_Q22_SQL})
SELECT 'q2_min_cost_supplier' AS shape, p_name AS k1, s_name AS k2,
       n_name AS k3, CAST(p_partkey AS BIGINT) AS n,
       acctbal AS v1, unit_price AS v2 FROM q2
UNION ALL
SELECT 'q7_volume_shipping', supp_nation, cust_nation,
       CAST(l_year AS VARCHAR), n_items, revenue, CAST(NULL AS DOUBLE) FROM q7
UNION ALL
SELECT 'q8_market_share', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
       CAST(o_year AS VARCHAR), n_items, mkt_share, CAST(NULL AS DOUBLE) FROM q8
UNION ALL
SELECT 'q9_product_profit', nation, CAST(NULL AS VARCHAR),
       CAST(o_year AS VARCHAR), n_items, profit, CAST(NULL AS DOUBLE) FROM q9
UNION ALL
SELECT 'q14_promo_revenue', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
       CAST(NULL AS VARCHAR), n_items, promo_revenue, CAST(NULL AS DOUBLE) FROM q14
UNION ALL
SELECT 'q16_supplier_diversity', p_brand, p_type, CAST(p_size AS VARCHAR),
       CAST(supplier_cnt AS BIGINT), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM q16
UNION ALL
SELECT 'q18_large_orders', c_name, CAST(o_orderkey AS VARCHAR),
       CAST(o_orderdate AS VARCHAR), CAST(c_custkey AS BIGINT),
       o_totalprice, sum_qty FROM q18
UNION ALL
SELECT 'q19_discount_revenue', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
       CAST(NULL AS VARCHAR), n_items, revenue, CAST(NULL AS DOUBLE) FROM q19
UNION ALL
SELECT 'q22_idle_accounts', CAST(bucket AS VARCHAR), CAST(NULL AS VARCHAR),
       CAST(NULL AS VARCHAR), CAST(numcust AS BIGINT), totacctbal,
       CAST(NULL AS DOUBLE) FROM q22
UNION ALL
SELECT 'q11_important_stock', CAST(l_partkey AS VARCHAR), CAST(NULL AS VARCHAR),
       CAST(NULL AS VARCHAR), val,
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM q11
UNION ALL
SELECT 'q12_late_shipping_priority', ship_class, CAST(NULL AS VARCHAR),
       CAST(NULL AS VARCHAR), CAST(high_line_count AS BIGINT),
       CAST(low_line_count AS DOUBLE), CAST(NULL AS DOUBLE) FROM q12
UNION ALL
SELECT 'q15_top_supplier', s_name, CAST(NULL AS VARCHAR),
       CAST(NULL AS VARCHAR), CAST(supplier_no AS BIGINT),
       total_revenue, CAST(NULL AS DOUBLE) FROM q15
UNION ALL
SELECT 'q13_order_count_hist', CAST(c_count AS VARCHAR), CAST(NULL AS VARCHAR),
       CAST(NULL AS VARCHAR), CAST(custdist AS BIGINT),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM q13
UNION ALL
SELECT 'q17_small_quantity_revenue', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
       CAST(NULL AS VARCHAR), CAST(n_items AS BIGINT),
       avg_weekly, CAST(NULL AS DOUBLE) FROM q17
UNION ALL
SELECT 'q20_excess_share_suppliers', s_name, n_name,
       CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM q20
UNION ALL
SELECT 'q21_sole_late_supplier', s_name, CAST(NULL AS VARCHAR),
       CAST(NULL AS VARCHAR), CAST(numwait AS BIGINT),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM q21
"""


QUERIES = {
    "tpch_deep_shapes": Query(tpch_deep_shapes, TPCH_DEEP_ORACLE),
}
