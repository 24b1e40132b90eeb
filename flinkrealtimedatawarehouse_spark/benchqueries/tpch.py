"""TPC-H classic analytics over the driver's star schema (beyond ref).

The reference's ADS layer is bespoke dashboard SQL; a user replacing it
with this engine also expects the textbook warehouse rollups to run well.
These queries are all 22 canonical TPC-H shapes adapted to the testdata's
column subset, expressed Spark-first.  Q2/Q11/Q16/Q20 run on a partsupp
table and Q12/Q21 on commit/receipt-date + shipmode columns that the
synthetic schema lacks; both are DERIVED deterministically inside the
query (identical integer arithmetic in Spark and the DuckDB oracle — see
the "derived tables" section below), so every shape has an exact oracle
twin at any sf.  Highlights:

- Q1  pricing summary: one scan, partial-agg pushdown, no joins.
- Q3  shipping priority: selective dim filter -> fact join -> top-N
  (TakeOrderedAndProject, no global sort).
- Q4  order priority checking: EXISTS decorrelated to a LEFT SEMI join
  (orders never duplicate however many lines match).
- Q5  local supplier volume: the two fact tables shuffle-join on their
  key; nation/region stay broadcast (the only truly fixed-size dims —
  customer/supplier scale with sf and MUST NOT be broadcast, see
  VERDICT r1 finding 4).
- Q6  revenue-change forecast: the pure-scan shape — every predicate in
  PushedFilters, one partial-agg column, zero joins.
- Q7  volume shipping: the join-ORDER stressor — lineitem meets supplier
  and orders->customer arms, nation pair filter pushed into both arms,
  cross-arm OR evaluated post-join.
- Q8  national market share: six-table join + conditional share per
  year, emitted as exact integer micros (never a hashed double ratio).
- Q9  product-type profit (ps_supplycost adapted to p_retailprice —
  the testdata has no partsupp): per-row integer profit, agg over the
  4-way join per (nation, year).
- Q10 returned-item reporting: selective fact filters -> joins -> top-20
  via TakeOrderedAndProject.
- Q14 promotion effect: conditional aggregation over the lineitem-part
  join; the ratio divides two associative integer sums once.
- Q18 large-volume customers: pre-aggregate lineitem BEFORE joining
  orders/customer so the join input is one row per order, not per line.
- Q19 discounted revenue: the bracketed OR-of-ANDs predicate — the
  equi-join stays a hash join, single-table conjuncts push to scans.

Money sums that feed an ORDER BY are computed in integer hundredths-of-
cents (``round(x * 10000)`` per row, summed as BIGINT) so the sort key is
associative and engine-independent; displayed values divide back out.

All of them fold into one tagged-union driver gate (``a12_rollup_tpch``)
together with the A12 GROUPING SETS rollup, keeping the registry at the
driver's 50-entry recording cap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flinkrealtimedatawarehouse_spark.benchqueries.warehouse import SQL_A12, q_a12
from flinkrealtimedatawarehouse_spark.tables import load_table

# Integer-cents revenue term: associative, deterministic across engines.
# (A function, not a module-level Column — Column construction needs an
# active SparkSession.)
def _rev():
    return (F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000)).cast("long")


_DUCK_REV = "round(l_extendedprice * (1 - l_discount) * 10000)::BIGINT"


# --- Q1 pricing summary report -------------------------------------------
def q_tpch1(spark: SparkSession, sf: str) -> DataFrame:
    # Every fractional aggregate is derived from ASSOCIATIVE integer sums
    # (per-row fixed-point, exact since TPC-H decimals carry <= 2 dp), so
    # the 2/4-dp rounded outputs are independent of partitioning / AQE /
    # summation order — a double-sum round() could flip a near-tie's last
    # digit under a different plan and break the gate hash at larger sf.
    li = load_table(spark, sf, "lineitem").filter(F.col("l_shipdate") <= "2001-09-01")
    qty_c = F.round(F.col("l_quantity") * 10000).cast("long")
    disc_c = F.round(F.col("l_discount") * 10000).cast("long")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    n = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("long").alias("sum_qty"),
            (F.sum(price_c) / 100.0).alias("sum_base_price"),
            (F.sum(_rev()) / 10000.0).alias("sum_disc_price"),
            F.round(F.sum(qty_c) / n / 10000.0, 4).alias("avg_qty"),
            F.round(F.sum(disc_c) / n / 10000.0, 4).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


SQL_TPCH1 = f"""
SELECT l_returnflag, l_linestatus,
       sum(l_quantity)::BIGINT AS sum_qty,
       sum(round(l_extendedprice * 100)::BIGINT) / 100.0 AS sum_base_price,
       sum({_DUCK_REV}) / 10000.0 AS sum_disc_price,
       round(sum(round(l_quantity * 10000)::BIGINT) / count(*) / 10000.0, 4) AS avg_qty,
       round(sum(round(l_discount * 10000)::BIGINT) / count(*) / 10000.0, 4) AS avg_disc,
       count(*)::BIGINT AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
GROUP BY 1, 2
"""


# --- Q3 shipping priority (top-10 unshipped orders by revenue) -----------
def q_tpch3(spark: SparkSession, sf: str) -> DataFrame:
    cut = "1998-07-01"
    c = load_table(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf, "orders").filter(F.col("o_orderdate") < cut)
    li = load_table(spark, sf, "lineitem").filter(F.col("l_shipdate") > cut)
    joined = li.join(o, li["l_orderkey"] == o["o_orderkey"]).join(
        c.select("c_custkey"), F.col("o_custkey") == F.col("c_custkey")
    )
    return (
        joined.groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(_rev()).alias("rev_c"))
        .select(
            "o_orderkey",
            (F.col("rev_c") / 10000.0).alias("revenue"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        )
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


SQL_TPCH3 = f"""
SELECT o_orderkey,
       sum({_DUCK_REV}) / 10000.0 AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-07-01'
  AND l_shipdate  > TIMESTAMP '1998-07-01'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey LIMIT 10
"""


# --- Q5 local supplier volume (customer & supplier in the same nation) ---
def q_tpch5(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = load_table(spark, sf, "customer")
    s = load_table(spark, sf, "supplier")
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, F.col("o_custkey") == c["c_custkey"])
        .join(
            s,
            (li["l_suppkey"] == s["s_suppkey"]) & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    )
    return (
        joined.groupBy("n_name")
        .agg((F.sum(_rev()) / 10000.0).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


SQL_TPCH5 = f"""
SELECT n_name, sum({_DUCK_REV}) / 10000.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name ORDER BY revenue DESC, n_name
"""


# --- Q18 large-volume customers ------------------------------------------
def q_tpch18(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    # Pre-aggregate to one row per order BEFORE touching orders/customer:
    # at scale this shrinks the join's build input by the lines-per-order
    # factor and makes the HAVING filter a partial-agg, not a post-join.
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("long").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "sum_qty",
        )
    )


SQL_TPCH18 = """
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(o_totalprice, 2) AS o_totalprice, sum_qty
FROM (
  SELECT l_orderkey, sum(l_quantity)::BIGINT AS sum_qty
  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300
)
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# --- Q6 forecasting revenue change (pure scan: filter -> one agg) --------
def q_tpch6(spark: SparkSession, sf: str) -> DataFrame:
    # The no-join benchmark shape: every predicate must reach the parquet
    # scan (PushedFilters) and the sum is a single partial-agg column.
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    amt = (F.round(F.col("l_extendedprice") * F.col("l_discount") * 10000)).cast("long")
    return li.agg(
        (F.sum(amt) / 10000.0).alias("revenue"), F.count(F.lit(1)).alias("line_ct")
    )


SQL_TPCH6 = """
SELECT sum(round(l_extendedprice * l_discount * 10000)::BIGINT) / 10000.0 AS revenue,
       count(*)::BIGINT AS line_ct
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


# --- Q4 order priority checking (EXISTS semi-join), adapted ---------------
# The testdata carries no l_commitdate/l_receiptdate, so "late line" is
# adapted to l_shipdate > o_orderdate + 90 days; the load-bearing shape —
# an EXISTS decorrelated to a LEFT SEMI join that never duplicates orders
# however many lines match — is unchanged.
def q_tpch4(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-10-01")
    )
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        # timestamp + interval (not date_add, which truncates time-of-day)
        # so the bound matches the oracle's o_orderdate + INTERVAL 90 DAY
        # even if the generator ever emits non-midnight order timestamps
        & (li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    ).orderBy("o_orderpriority")


SQL_TPCH4 = """
SELECT o_orderpriority, count(*)::BIGINT AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 90 DAY
  )
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# --- Q10 returned-item reporting (top-20 customers by returned revenue) ---
def q_tpch10(spark: SparkSession, sf: str) -> DataFrame:
    # Selective fact filters first; customer joins AFTER the lineitem
    # aggregate is NOT possible here (group key includes customer attrs),
    # so the join order is facts-first with nation broadcast; the final
    # top-20 is TakeOrderedAndProject, never a global sort.
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1997-07-01") & (F.col("o_orderdate") < "1997-10-01")
    )
    li = load_table(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
    )
    return (
        joined.groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_rev()).alias("rev_c"))
        .select(
            "c_custkey", "c_name",
            (F.col("rev_c") / 10000.0).alias("revenue"), "n_name",
        )
        .orderBy(F.col("rev_c").desc(), "c_custkey")
        .limit(20)
    )


SQL_TPCH10 = f"""
SELECT c_custkey, c_name, sum({_DUCK_REV}) / 10000.0 AS revenue, n_name
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-07-01' AND o_orderdate < TIMESTAMP '1997-10-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY sum({_DUCK_REV}) DESC, c_custkey LIMIT 20
"""


# --- Q14 promotion effect (conditional agg over a join, ratio output) ----
def q_tpch14(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    p = load_table(spark, sf, "part").select("p_partkey", "p_type")
    j = li.join(p, li["l_partkey"] == p["p_partkey"])
    promo = F.sum(F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0)))
    total = F.sum(_rev())
    # ratio of two associative integer sums -> one double division: exact
    # same value on any partitioning and on the oracle side
    return j.agg(
        F.round(promo * 100.0 / total, 4).alias("promo_revenue_pct"),
        (total / 10000.0).alias("total_revenue"),
    )


SQL_TPCH14 = f"""
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO' THEN {_DUCK_REV} ELSE 0 END)
             / sum({_DUCK_REV}), 4) AS promo_revenue_pct,
       sum({_DUCK_REV}) / 10000.0 AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
"""


# --- Q19 discounted revenue (bracketed OR-of-ANDs join predicate) --------
# The classic optimizer stressor: three disjunct brackets over
# (brand, size, quantity). The join key (partkey) stays a plain equi-join
# so Catalyst picks a hash join and evaluates the brackets as a post-join
# filter with the single-table conjuncts (quantity bounds, size >= 1)
# pushed to the scans.
def q_tpch19(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(p, li["l_partkey"] == p["p_partkey"])
    b1 = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("p_size").between(1, 5))
        & (F.col("l_quantity").between(1, 11))
    )
    b2 = (
        (F.col("p_brand") == "Brand#2")
        & (F.col("p_size").between(1, 10))
        & (F.col("l_quantity").between(10, 20))
    )
    b3 = (
        (F.col("p_brand") == "Brand#3")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(20, 30))
    )
    return j.filter(b1 | b2 | b3).agg(
        (F.sum(_rev()) / 10000.0).alias("revenue"),
        F.count(F.lit(1)).alias("line_ct"),
    )


SQL_TPCH19 = f"""
SELECT sum({_DUCK_REV}) / 10000.0 AS revenue, count(*)::BIGINT AS line_ct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


# --- Q7 volume shipping (two-nation bidirectional trade) ------------------
# The join-ORDER stressor: lineitem joins supplier AND orders->customer,
# with nation dims on both arms and a cross-arm OR predicate that only
# becomes applicable after both arms meet. Spark-first shape: the IN
# (nation pair) filters push into each broadcast nation join, so both
# arms shrink ~2/25 before the big orderkey shuffle; the OR mixed-pair
# predicate evaluates post-join.
_Q7_N1, _Q7_N2 = "NATION_1", "NATION_2"

def q_tpch7(spark: SparkSession, sf: str) -> DataFrame:
    n = load_table(spark, sf, "nation").filter(F.col("n_name").isin(_Q7_N1, _Q7_N2))
    s = load_table(spark, sf, "supplier").join(
        F.broadcast(n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sk"),
    ).select("s_suppkey", "supp_nation")
    c = load_table(spark, sf, "customer").join(
        F.broadcast(n.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("ck"),
    ).select("c_custkey", "cust_nation")
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") <= "1997-12-31")
    )
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    j = (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .filter(
            ((F.col("supp_nation") == _Q7_N1) & (F.col("cust_nation") == _Q7_N2))
            | ((F.col("supp_nation") == _Q7_N2) & (F.col("cust_nation") == _Q7_N1))
        )
    )
    return (
        j.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg((F.sum(_rev()) / 10000.0).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


SQL_TPCH7 = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate)::INT AS l_year,
       sum({_DUCK_REV}) / 10000.0 AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = '{_Q7_N1}' AND n2.n_name = '{_Q7_N2}')
    OR (n1.n_name = '{_Q7_N2}' AND n2.n_name = '{_Q7_N1}'))
  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


# --- Q8 national market share ---------------------------------------------
# Agg-over-join stressor: six-table join, then a conditional share per
# year. The share is emitted in exact integer MICROS ((nation_rev_c *
# 1e6) div total_rev_c) so the gate never hashes a double ratio.
_Q8_NATION = "NATION_5"

def q_tpch8(spark: SparkSession, sf: str) -> DataFrame:
    p = load_table(spark, sf, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") <= "1997-12-31")
    )
    c = load_table(spark, sf, "customer")
    s = load_table(spark, sf, "supplier")
    n1 = load_table(spark, sf, "nation")  # customer nation -> region scope
    n2 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = load_table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    j = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), c["c_nationkey"] == n1["n_nationkey"])
        .join(F.broadcast(r), n1["n_regionkey"] == r["r_regionkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n2), s["s_nationkey"] == F.col("n2_key"))
    )
    per_year = j.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.sum(F.when(F.col("supp_nation") == _Q8_NATION, _rev()).otherwise(F.lit(0))).alias("nat_c"),
        F.sum(_rev()).alias("tot_c"),
    )
    return per_year.select(
        "o_year",
        F.expr("CASE WHEN tot_c > 0 THEN (nat_c * 1000000L) div tot_c ELSE 0L END").alias("mkt_share_u"),
        (F.col("tot_c") / 10000.0).alias("total_volume"),
    ).orderBy("o_year")


SQL_TPCH8 = f"""
SELECT year(o_orderdate)::INT AS o_year,
       (CASE WHEN sum({_DUCK_REV}) > 0
             THEN (sum(CASE WHEN n2.n_name = '{_Q8_NATION}' THEN {_DUCK_REV} ELSE 0 END) * 1000000)
                  // sum({_DUCK_REV})
             ELSE 0 END)::BIGINT AS mkt_share_u,
       sum({_DUCK_REV}) / 10000.0 AS total_volume
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
GROUP BY 1 ORDER BY 1
"""


# --- Q9 product type profit (adapted: no partsupp in the testdata) --------
# The testdata carries no partsupp, so ps_supplycost is adapted to
# p_retailprice as the unit cost; the load-bearing shape — a part-filtered
# lineitem joined to supplier/nation/orders, profit aggregated per
# (nation, year) — is unchanged. profit is computed per-row in integer
# 1e-4 units (rev_c minus round(price*100)*round(qty*100), both exact
# integers) so the sum is associative and engine-identical.
def q_tpch9(spark: SparkSession, sf: str) -> DataFrame:
    p = load_table(spark, sf, "part").filter(F.col("p_type") == "STANDARD").select(
        "p_partkey", "p_retailprice"
    )
    li = load_table(spark, sf, "lineitem")
    s = load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    cost_c = (
        F.round(F.col("p_retailprice") * 100).cast("long")
        * F.round(F.col("l_quantity") * 100).cast("long")
    )
    j = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .withColumn("profit_c", _rev() - cost_c)
    )
    return (
        j.groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg((F.sum("profit_c") / 10000.0).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


SQL_TPCH9 = f"""
SELECT n_name AS nation, year(o_orderdate)::INT AS o_year,
       sum({_DUCK_REV}
           - round(p_retailprice * 100)::BIGINT * round(l_quantity * 100)::BIGINT
       ) / 10000.0 AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_type = 'STANDARD'
GROUP BY 1, 2 ORDER BY nation, o_year DESC
"""


# --- Q13 customer order-count distribution (outer-join histogram) --------
def q_tpch13(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join customers->orders with a join-side
    predicate, count per customer (NULL-safe: count(o_orderkey) counts
    matches, zero-order customers keep 0), then the histogram of those
    counts. Two aggregations, one outer join — the join predicate filter
    replaces the spec's o_comment NOT LIKE (no comment column in this
    schema). Ref shape: pub dashboards' distribution queries."""
    c = load_table(spark, sf, "customer").select("c_custkey")
    o = load_table(spark, sf, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    j = c.join(
        o,
        (c["c_custkey"] == o["o_custkey"]) & (o["o_orderpriority"] != "1-URGENT"),
        "left",
    )
    per_c = j.groupBy("c_custkey").agg(F.count("o_orderkey").alias("c_count"))
    return (
        per_c.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


SQL_TPCH13 = """
WITH c_orders AS (
  SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, count(*)::BIGINT AS custdist
FROM c_orders GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


# --- Q15 top supplier (revenue view + scalar max) -------------------------
def q_tpch15(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15 shape: a quarterly per-supplier revenue aggregate, then
    the supplier(s) achieving its maximum — the scalar-subquery pattern
    decorrelated as a 1-row max broadcast (exact integer cents, so the
    equality can't miss on float representation)."""
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).alias("total_revenue_c")
    )
    mx = rev.agg(F.max("total_revenue_c").alias("max_revenue_c"))
    top = rev.crossJoin(F.broadcast(mx)).filter(
        F.col("total_revenue_c") == F.col("max_revenue_c")
    )
    sup = load_table(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        sup.join(top, sup["s_suppkey"] == top["supplier_no"])
        .select(
            "s_suppkey", "s_name",
            (F.col("total_revenue_c") / 10000.0).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


SQL_TPCH15 = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, sum({_DUCK_REV}) AS total_revenue_c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue_c / 10000.0 AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue_c = (SELECT max(total_revenue_c) FROM revenue)
ORDER BY s_suppkey
"""


# --- Q17 small-quantity-order revenue (correlated avg, decorrelated) -----
def q_tpch17(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 shape: lines whose quantity is below 20%% of their
    part's average quantity. The correlated AVG subquery decorrelates to
    a per-part (sum, count) aggregate joined back; the threshold is the
    cross-multiplied integer form qty_c * 5 * cnt < sum_qty_c, so no
    float average is ever materialized. p_type replaces the spec's
    brand+container filter (no container column)."""
    li = load_table(spark, sf, "lineitem").select(
        "l_partkey",
        F.round(F.col("l_quantity") * 100).cast("long").alias("qty_c"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_c"),
    )
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("qty_c").alias("sum_qty_c"), F.count(F.lit(1)).alias("cnt")
    )
    p = load_table(spark, sf, "part").filter(F.col("p_type") == "STANDARD").select("p_partkey")
    small = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(per_part, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("qty_c") * 5 * F.col("cnt") < F.col("sum_qty_c"))
    )
    return small.agg(
        (F.sum("price_c") / F.lit(700.0)).alias("avg_yearly"),
        F.count(F.lit(1)).alias("line_ct"),
    )


SQL_TPCH17 = """
WITH pa AS (
  SELECT l_partkey AS pk,
         sum(round(l_quantity * 100)::BIGINT) AS sum_qty_c,
         count(*)::BIGINT AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT sum(round(l_extendedprice * 100)::BIGINT) / 700.0 AS avg_yearly,
       count(*)::BIGINT AS line_ct
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN pa ON pk = l_partkey
WHERE p_type = 'STANDARD'
  AND round(l_quantity * 100)::BIGINT * 5 * cnt < sum_qty_c
"""


# --- Q22 global-sales opportunity (NOT EXISTS + scalar threshold) --------
_Q22_CODES = ("00", "11", "22", "33", "44", "55", "66")

def q_tpch22(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 shape: customers in selected "country codes" with
    above-average account balance and NO orders — a scalar AVG threshold
    (cross-multiplied integers via a 1-row broadcast) plus an anti-join.
    right(c_name, 2) stands in for the spec's phone country code (no
    phone column)."""
    c = load_table(spark, sf, "customer").select(
        "c_custkey",
        F.expr("right(c_name, 2)").alias("cntrycode"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_c"),
    ).filter(F.col("cntrycode").isin(*_Q22_CODES))
    pos = c.filter(F.col("bal_c") > 0).agg(
        F.sum("bal_c").alias("sum_bal_c"), F.count(F.lit(1)).alias("n_pos")
    )
    o = load_table(spark, sf, "orders").select("o_custkey")
    rich = (
        c.crossJoin(F.broadcast(pos))
        .filter(F.col("bal_c") * F.col("n_pos") > F.col("sum_bal_c"))
        .join(o, F.col("c_custkey") == o["o_custkey"], "left_anti")
    )
    return (
        rich.groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum("bal_c") / 100.0).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


SQL_TPCH22 = f"""
WITH c AS (
  SELECT c_custkey, right(c_name, 2) AS cntrycode,
         round(c_acctbal * 100)::BIGINT AS bal_c
  FROM customer
  WHERE right(c_name, 2) IN {_Q22_CODES!r}
), pos AS (
  SELECT sum(bal_c) AS sum_bal_c, count(*)::BIGINT AS n_pos FROM c WHERE bal_c > 0
)
SELECT cntrycode, count(*)::BIGINT AS numcust, sum(bal_c) / 100.0 AS totacctbal
FROM c CROSS JOIN pos
WHERE bal_c * n_pos > sum_bal_c
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY cntrycode ORDER BY cntrycode
"""


# --- derived tables for the six partsupp/ship-date shapes ----------------
#
# The synthetic schema has no partsupp table and no commit/receipt-date
# or shipmode lineitem columns, which blocked TPC-H Q2/Q11/Q12/Q16/Q20/
# Q21.  Rather than materialize extra parquet (which the DuckDB oracle
# could not see portably across sf dirs), both engines DERIVE them with
# identical integer arithmetic over the existing tables:
#
# - ``partsupp`` := the DISTINCT (l_partkey, l_suppkey) pairs observed
#   in lineitem (referential integrity is automatic, and the derivation
#   survives the sf1 key-stride amplification, which preserves FK edges)
#   with availqty/supplycost as modular arithmetic on the pair keys.
#   Cost is carried in integer cents (``ps_supplycost_c``) so sums stay
#   associative/exact; display values divide by 100 once.
# - ``lineitem_ext`` := lineitem + l_commitdate / l_receiptdate (bounded
#   day offsets from l_shipdate keyed on (l_orderkey, l_linenumber)) and
#   l_shipmode (7-way modular pick).  All offsets are nonnegative-mod so
#   Spark ``%`` and DuckDB ``%`` agree.
#
# Scale note: the distinct-pairs derivation is one hash aggregate over
# lineitem (map-side partial, no window, no driver action) — at 100 TB
# partsupp would of course be a real table and these CTEs disappear.

_SHIP_MODES = ("MAIL", "SHIP", "AIR", "TRUCK", "RAIL", "REG AIR", "FOB")


def _partsupp(spark: SparkSession, sf: str) -> DataFrame:
    pairs = (
        load_table(spark, sf, "lineitem")
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
    )
    return pairs.select(
        "ps_partkey",
        "ps_suppkey",
        ((F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 17) % 9999 + 1)
        .cast("long")
        .alias("ps_availqty"),
        ((F.col("ps_partkey") * 7 + F.col("ps_suppkey") * 13) % 100000 + 100)
        .cast("long")
        .alias("ps_supplycost_c"),
    )


SQL_PARTSUPP_CTE = """partsupp AS (
  SELECT ps_partkey, ps_suppkey,
         ((ps_partkey * 31 + ps_suppkey * 17) % 9999 + 1)::BIGINT AS ps_availqty,
         ((ps_partkey * 7 + ps_suppkey * 13) % 100000 + 100)::BIGINT AS ps_supplycost_c
  FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
        FROM lineitem)
)"""


def _lineitem_ext(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    ship = F.to_date("l_shipdate")
    commit_off = ((F.col("l_orderkey") * 31 + F.col("l_linenumber") * 7) % 61 - 30).cast("int")
    receipt_off = ((F.col("l_orderkey") * 17 + F.col("l_linenumber") * 11) % 30 + 1).cast("int")
    modes = F.array(*[F.lit(m) for m in _SHIP_MODES])
    return (
        li.withColumn("l_commitdate", F.date_add(ship, commit_off))
        .withColumn("l_receiptdate", F.date_add(ship, receipt_off))
        .withColumn(
            "l_shipmode",
            F.element_at(modes, ((F.col("l_orderkey") + F.col("l_linenumber")) % 7 + 1).cast("int")),
        )
    )


_SQL_SHIPMODE_CASE = (
    "CASE (l_orderkey + l_linenumber) % 7 "
    + " ".join(f"WHEN {i} THEN '{m}'" for i, m in enumerate(_SHIP_MODES[:-1]))
    + f" ELSE '{_SHIP_MODES[-1]}' END"
)

SQL_LINEITEM_EXT_CTE = f"""lineitem_ext AS (
  SELECT l.*,
         CAST(l_shipdate AS DATE)
           + ((l_orderkey * 31 + l_linenumber * 7) % 61 - 30)::INT AS l_commitdate,
         CAST(l_shipdate AS DATE)
           + ((l_orderkey * 17 + l_linenumber * 11) % 30 + 1)::INT AS l_receiptdate,
         {_SQL_SHIPMODE_CASE} AS l_shipmode
  FROM lineitem l
)"""


# --- Q2 minimum-cost supplier --------------------------------------------
def q_tpch2(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 shape: for each EUROPE-region part of the probed
    size/type, the supplier(s) offering the region's minimum supply
    cost; top 100 by account balance.  The correlated MIN subquery
    decorrelates to a per-part min aggregate joined back (the classic
    Spark rewrite — no correlated-scalar rejoin per row); nation/region
    stay broadcast.  p_type equality replaces the spec's '%BRASS'
    suffix (single-word p_type in this schema)."""
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    nr = n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]).select(
        "n_nationkey", "n_name"
    )
    s = (
        load_table(spark, sf, "supplier")
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = load_table(spark, sf, "part").filter(
        (F.col("p_size").isin(15, 25, 35)) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey", "p_type")
    ps = _partsupp(spark, sf)
    # region-filtered partsupp: only European suppliers compete for min
    psr = ps.join(s, ps["ps_suppkey"] == s["s_suppkey"]).join(
        p, F.col("ps_partkey") == p["p_partkey"]
    )
    minc = psr.groupBy(F.col("ps_partkey").alias("mk")).agg(
        F.min("ps_supplycost_c").alias("min_c")
    )
    best = psr.join(
        minc,
        (F.col("ps_partkey") == F.col("mk"))
        & (F.col("ps_supplycost_c") == F.col("min_c")),
    )
    return (
        best.select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            (F.col("ps_supplycost_c") / 100.0).alias("supplycost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


SQL_TPCH2 = f"""
WITH {SQL_PARTSUPP_CTE},
nr AS (
  SELECT n_nationkey, n_name FROM nation JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), s AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nr ON s_nationkey = n_nationkey
), psr AS (
  SELECT ps_partkey, ps_supplycost_c, s_acctbal, s_name, n_name, p_partkey, p_type
  FROM partsupp
  JOIN s ON ps_suppkey = s_suppkey
  JOIN part ON ps_partkey = p_partkey
  WHERE p_size IN (15, 25, 35) AND p_type = 'STANDARD'
), minc AS (
  SELECT ps_partkey AS mk, min(ps_supplycost_c) AS min_c FROM psr GROUP BY ps_partkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_type,
       ps_supplycost_c / 100.0 AS supplycost
FROM psr JOIN minc ON ps_partkey = mk AND ps_supplycost_c = min_c
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
"""


# --- Q11 important stock identification ----------------------------------
def q_tpch11(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose stock value at one nation's
    suppliers exceeds a fraction of that nation's total stock value.
    The scalar total arrives via a 1-row broadcast cross join and the
    threshold compares cross-multiplied BIGINTs (sum * 1000 > total),
    so no float fraction ever participates in the filter."""
    n = load_table(spark, sf, "nation").filter(F.col("n_name") == "NATION_11")
    s = (
        load_table(spark, sf, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    ps = _partsupp(spark, sf)
    psn = ps.join(s, ps["ps_suppkey"] == s["s_suppkey"]).select(
        "ps_partkey",
        (F.col("ps_availqty") * F.col("ps_supplycost_c")).alias("val_c"),
    )
    tot = psn.agg(F.sum("val_c").alias("tot_c"))
    per_part = psn.groupBy("ps_partkey").agg(F.sum("val_c").alias("value_c"))
    return (
        per_part.crossJoin(F.broadcast(tot))
        .filter(F.col("value_c") * 1000 > F.col("tot_c"))
        .select("ps_partkey", (F.col("value_c") / 100.0).alias("value"))
        .orderBy(F.col("value_c").desc(), "ps_partkey")
    )


SQL_TPCH11 = f"""
WITH {SQL_PARTSUPP_CTE},
psn AS (
  SELECT ps_partkey, ps_availqty * ps_supplycost_c AS val_c
  FROM partsupp
  JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_11'
), tot AS (SELECT sum(val_c) AS tot_c FROM psn)
SELECT ps_partkey, sum(val_c) / 100.0 AS value
FROM psn CROSS JOIN tot
GROUP BY ps_partkey, tot_c
HAVING sum(val_c) * 1000 > tot_c
ORDER BY sum(val_c) DESC, ps_partkey
"""


# --- Q12 shipping-mode / order-priority ----------------------------------
def q_tpch12(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 shape: late-but-committed lines by cheap ship mode and
    order priority.  All three date predicates are scan-side (derived
    columns fold into the scan projection); the join is a plain
    orderkey equi-join with conditional aggregation on top."""
    li = _lineitem_ext(spark, sf).filter(
        F.col("l_shipmode").isin("MAIL", "SHIP")
        & (F.col("l_commitdate") < F.col("l_receiptdate"))
        & (F.to_date("l_shipdate") < F.col("l_commitdate"))
        & (F.col("l_receiptdate") >= "1997-01-01")
        & (F.col("l_receiptdate") < "1998-01-01")
    ).select("l_orderkey", "l_shipmode")
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_shipmode")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_shipmode")
    )


SQL_TPCH12 = f"""
WITH {SQL_LINEITEM_EXT_CTE}
SELECT l_shipmode,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT
         AS high_line_count,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)::BIGINT
         AS low_line_count
FROM lineitem_ext JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipmode IN ('MAIL', 'SHIP')
  AND l_commitdate < l_receiptdate
  AND CAST(l_shipdate AS DATE) < l_commitdate
  AND l_receiptdate >= DATE '1997-01-01' AND l_receiptdate < DATE '1998-01-01'
GROUP BY l_shipmode ORDER BY l_shipmode
"""


# --- Q16 parts/supplier relationship -------------------------------------
def q_tpch16(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per (brand, type, size)
    for probed sizes, excluding flagged suppliers.  The NOT IN
    subquery decorrelates to a LEFT ANTI join (null-safe because
    s_suppkey is never null); s_acctbal < 0 stands in for the spec's
    'Customer Complaints' comment filter (no comment column)."""
    bad = load_table(spark, sf, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    p = load_table(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    ps = _partsupp(spark, sf)
    return (
        ps.join(bad, ps["ps_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(p, F.col("ps_partkey") == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


SQL_TPCH16 = f"""
WITH {SQL_PARTSUPP_CTE}
SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey)::BIGINT AS supplier_cnt
FROM partsupp JOIN part ON ps_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --- Q20 potential part promotion ----------------------------------------
def q_tpch20(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers in one nation holding excess stock
    (availqty > half the year's shipped quantity) of probed parts.
    Shipped quantity aggregates BEFORE the partsupp join (one row per
    (part, supp)); the excess test cross-multiplies integer hundredths
    (availqty * 200 > qty_c) so no float half ever participates.
    p_name LIKE 'red%%' replaces the spec's forest%% color prefix."""
    qty = (
        load_table(spark, sf, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
        )
        .groupBy(
            F.col("l_partkey").alias("qk"), F.col("l_suppkey").alias("qs")
        )
        .agg(F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("qty_c"))
    )
    red = load_table(spark, sf, "part").filter(F.col("p_name").like("red%")).select(
        "p_partkey"
    )
    ps = _partsupp(spark, sf)
    eligible = (
        ps.join(red, ps["ps_partkey"] == red["p_partkey"])
        .join(qty, (F.col("ps_partkey") == F.col("qk")) & (F.col("ps_suppkey") == F.col("qs")))
        .filter(F.col("ps_availqty") * 200 > F.col("qty_c"))
        .select("ps_suppkey")
        .distinct()
    )
    n = load_table(spark, sf, "nation").filter(F.col("n_name") == "NATION_14")
    s = load_table(spark, sf, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        s.join(eligible, s["s_suppkey"] == eligible["ps_suppkey"], "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


SQL_TPCH20 = f"""
WITH {SQL_PARTSUPP_CTE},
qty AS (
  SELECT l_partkey AS qk, l_suppkey AS qs,
         sum(round(l_quantity * 100)::BIGINT) AS qty_c
  FROM lineitem
  WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
  GROUP BY l_partkey, l_suppkey
), eligible AS (
  SELECT DISTINCT ps_suppkey
  FROM partsupp
  JOIN part ON ps_partkey = p_partkey
  JOIN qty ON qk = ps_partkey AND qs = ps_suppkey
  WHERE p_name LIKE 'red%' AND ps_availqty * 200 > qty_c
)
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_14'
  AND EXISTS (SELECT 1 FROM eligible WHERE ps_suppkey = s_suppkey)
ORDER BY s_name
"""


# --- Q21 suppliers who kept orders waiting -------------------------------
def q_tpch21(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 shape: one nation's suppliers that were the SOLE late
    supplier on a multi-supplier finalized order.  The spec's triple
    lineitem self-join (EXISTS other supplier / NOT EXISTS other late
    supplier) decorrelates to two per-order aggregates — distinct
    supplier count and distinct LATE supplier count — joined back by
    orderkey, turning the hardest join-order case into three hash
    aggregates and equi-joins (no per-row rescan of lineitem).
    numwait counts late LINES, matching the spec's l1 multiplicity."""
    ext = _lineitem_ext(spark, sf).select(
        "l_orderkey", "l_suppkey", (F.col("l_receiptdate") > F.col("l_commitdate")).alias("late")
    )
    # Two countDistinct aggregates in one groupBy plan as an Expand that
    # doubles every lineitem row BEFORE the exchange (round 14, guide
    # §2.3 "shuffle fewer bytes"): profiled at sf0.1, the scan stage wrote
    # a 17.7 MB expanded shuffle. Decompose instead: first collapse to one
    # row per (orderkey, suppkey) with an any-late flag — a partial-agg-
    # friendly plain hash aggregate whose exchange carries each distinct
    # pair ONCE — then count suppliers / late suppliers per order without
    # DISTINCT. Identical results: countDistinct(suppkey) = count(*) over
    # the collapsed pairs, countDistinct(when(late, suppkey)) = count of
    # pairs whose flag is set (suppkey is never null in lineitem).
    per_supp = ext.groupBy(F.col("l_orderkey").alias("ok"), "l_suppkey").agg(
        F.max("late").alias("any_late")
    )
    per_order = per_supp.groupBy("ok").agg(
        F.count(F.lit(1)).alias("nsup"),
        F.count(F.when(F.col("any_late"), F.lit(1))).alias("nlate"),
    )
    late_lines = ext.filter(F.col("late"))
    o = load_table(spark, sf, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    n = load_table(spark, sf, "nation").filter(F.col("n_name") == "NATION_11")
    s = (
        load_table(spark, sf, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    return (
        late_lines.join(o, F.col("l_orderkey") == o["o_orderkey"])
        .join(
            per_order.filter((F.col("nsup") >= 2) & (F.col("nlate") == 1)),
            F.col("l_orderkey") == F.col("ok"),
        )
        .join(s, F.col("l_suppkey") == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


SQL_TPCH21 = f"""
WITH {SQL_LINEITEM_EXT_CTE},
ext AS (
  SELECT l_orderkey, l_suppkey, l_receiptdate > l_commitdate AS late
  FROM lineitem_ext
), per_order AS (
  SELECT l_orderkey AS ok,
         count(DISTINCT l_suppkey) AS nsup,
         count(DISTINCT CASE WHEN late THEN l_suppkey END) AS nlate
  FROM ext GROUP BY l_orderkey
)
SELECT s_name, count(*)::BIGINT AS numwait
FROM ext
JOIN orders ON l_orderkey = o_orderkey AND o_orderstatus = 'F'
JOIN per_order ON l_orderkey = ok AND nsup >= 2 AND nlate = 1
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE late AND n_name = 'NATION_11'
GROUP BY s_name
ORDER BY numwait DESC, s_name LIMIT 100
"""


# --- tagged-union driver gate: A12 rollup + all 22 TPC-H shapes ----------
def q_a12c(spark: SparkSession, sf: str) -> DataFrame:
    rollup = q_a12(spark, sf).select(
        F.lit("rollup").alias("branch"),
        F.concat_ws("|", "o_orderpriority", "o_orderstatus").alias("k"),
        F.col("amount").alias("v1"),
        F.col("row_ct").cast("double").alias("v2"),
        F.lit(0.0).alias("v3"),
    )
    t1 = q_tpch1(spark, sf).select(
        F.lit("tpch1").alias("branch"),
        F.concat_ws("|", "l_returnflag", "l_linestatus").alias("k"),
        F.col("sum_disc_price").alias("v1"),
        F.col("sum_qty").cast("double").alias("v2"),
        (F.col("avg_qty") + F.col("avg_disc") + F.col("count_order")).alias("v3"),
    )
    t3 = q_tpch3(spark, sf).select(
        F.lit("tpch3").alias("branch"),
        F.concat_ws("|", "o_orderkey", "o_orderdate").alias("k"),
        F.col("revenue").alias("v1"),
        F.lit(0.0).alias("v2"),
        F.lit(0.0).alias("v3"),
    )
    t5 = q_tpch5(spark, sf).select(
        F.lit("tpch5").alias("branch"),
        F.col("n_name").alias("k"),
        F.col("revenue").alias("v1"),
        F.lit(0.0).alias("v2"),
        F.lit(0.0).alias("v3"),
    )
    t18 = q_tpch18(spark, sf).select(
        F.lit("tpch18").alias("branch"),
        F.concat_ws("|", "c_custkey", "o_orderkey").alias("k"),
        F.col("o_totalprice").alias("v1"),
        F.col("sum_qty").cast("double").alias("v2"),
        F.lit(0.0).alias("v3"),
    )
    t6 = q_tpch6(spark, sf).select(
        F.lit("tpch6").alias("branch"),
        F.lit("all").alias("k"),
        F.col("revenue").alias("v1"),
        F.col("line_ct").cast("double").alias("v2"),
        F.lit(0.0).alias("v3"),
    )
    t4 = q_tpch4(spark, sf).select(
        F.lit("tpch4").alias("branch"),
        F.col("o_orderpriority").alias("k"),
        F.col("order_count").cast("double").alias("v1"),
        F.lit(0.0).alias("v2"),
        F.lit(0.0).alias("v3"),
    )
    t10 = q_tpch10(spark, sf).select(
        F.lit("tpch10").alias("branch"),
        F.concat_ws("|", "c_custkey", "n_name").alias("k"),
        F.col("revenue").alias("v1"),
        F.lit(0.0).alias("v2"),
        F.lit(0.0).alias("v3"),
    )
    t14 = q_tpch14(spark, sf).select(
        F.lit("tpch14").alias("branch"),
        F.lit("all").alias("k"),
        F.col("promo_revenue_pct").alias("v1"),
        F.col("total_revenue").alias("v2"),
        F.lit(0.0).alias("v3"),
    )
    t19 = q_tpch19(spark, sf).select(
        F.lit("tpch19").alias("branch"),
        F.lit("all").alias("k"),
        F.col("revenue").alias("v1"),
        F.col("line_ct").cast("double").alias("v2"),
        F.lit(0.0).alias("v3"),
    )
    t7 = q_tpch7(spark, sf).select(
        F.lit("tpch7").alias("branch"),
        F.concat_ws("|", "supp_nation", "cust_nation", "l_year").alias("k"),
        F.col("revenue").alias("v1"),
        F.lit(0.0).alias("v2"),
        F.lit(0.0).alias("v3"),
    )
    t8 = q_tpch8(spark, sf).select(
        F.lit("tpch8").alias("branch"),
        F.col("o_year").cast("string").alias("k"),
        F.col("mkt_share_u").cast("double").alias("v1"),
        F.col("total_volume").alias("v2"),
        F.lit(0.0).alias("v3"),
    )
    t9 = q_tpch9(spark, sf).select(
        F.lit("tpch9").alias("branch"),
        F.concat_ws("|", "nation", "o_year").alias("k"),
        F.col("sum_profit").alias("v1"),
        F.lit(0.0).alias("v2"),
        F.lit(0.0).alias("v3"),
    )
    t13 = q_tpch13(spark, sf).select(
        F.lit("tpch13").alias("branch"),
        F.col("c_count").cast("string").alias("k"),
        F.col("custdist").cast("double").alias("v1"),
        F.lit(0.0).alias("v2"),
        F.lit(0.0).alias("v3"),
    )
    t15 = q_tpch15(spark, sf).select(
        F.lit("tpch15").alias("branch"),
        F.concat_ws("|", "s_suppkey", "s_name").alias("k"),
        F.col("total_revenue").alias("v1"),
        F.lit(0.0).alias("v2"),
        F.lit(0.0).alias("v3"),
    )
    t17 = q_tpch17(spark, sf).select(
        F.lit("tpch17").alias("branch"),
        F.lit("all").alias("k"),
        F.col("avg_yearly").alias("v1"),
        F.col("line_ct").cast("double").alias("v2"),
        F.lit(0.0).alias("v3"),
    )
    t22 = q_tpch22(spark, sf).select(
        F.lit("tpch22").alias("branch"),
        F.col("cntrycode").alias("k"),
        F.col("numcust").cast("double").alias("v1"),
        F.col("totacctbal").alias("v2"),
        F.lit(0.0).alias("v3"),
    )
    t2 = q_tpch2(spark, sf).select(
        F.lit("tpch2").alias("branch"),
        F.concat_ws("|", "s_name", "p_partkey").alias("k"),
        F.col("s_acctbal").alias("v1"),
        F.col("supplycost").alias("v2"),
        F.lit(0.0).alias("v3"),
    )
    t11 = q_tpch11(spark, sf).select(
        F.lit("tpch11").alias("branch"),
        F.col("ps_partkey").cast("string").alias("k"),
        F.col("value").alias("v1"),
        F.lit(0.0).alias("v2"),
        F.lit(0.0).alias("v3"),
    )
    t12 = q_tpch12(spark, sf).select(
        F.lit("tpch12").alias("branch"),
        F.col("l_shipmode").alias("k"),
        F.col("high_line_count").cast("double").alias("v1"),
        F.col("low_line_count").cast("double").alias("v2"),
        F.lit(0.0).alias("v3"),
    )
    t16 = q_tpch16(spark, sf).select(
        F.lit("tpch16").alias("branch"),
        F.concat_ws("|", "p_brand", "p_type", "p_size").alias("k"),
        F.col("supplier_cnt").cast("double").alias("v1"),
        F.lit(0.0).alias("v2"),
        F.lit(0.0).alias("v3"),
    )
    t20 = q_tpch20(spark, sf).select(
        F.lit("tpch20").alias("branch"),
        F.col("s_name").alias("k"),
        F.col("s_acctbal").alias("v1"),
        F.lit(0.0).alias("v2"),
        F.lit(0.0).alias("v3"),
    )
    t21 = q_tpch21(spark, sf).select(
        F.lit("tpch21").alias("branch"),
        F.col("s_name").alias("k"),
        F.col("numwait").cast("double").alias("v1"),
        F.lit(0.0).alias("v2"),
        F.lit(0.0).alias("v3"),
    )
    return (
        rollup.unionByName(t1).unionByName(t3).unionByName(t5)
        .unionByName(t18).unionByName(t6).unionByName(t4).unionByName(t10)
        .unionByName(t14).unionByName(t19)
        .unionByName(t7).unionByName(t8).unionByName(t9)
        .unionByName(t13).unionByName(t15).unionByName(t17).unionByName(t22)
        .unionByName(t2).unionByName(t11).unionByName(t12)
        .unionByName(t16).unionByName(t20).unionByName(t21)
    )


SQL_A12C = f"""
SELECT 'rollup' AS branch, o_orderpriority || '|' || o_orderstatus AS k,
       amount AS v1, row_ct::DOUBLE AS v2, 0.0 AS v3 FROM ({SQL_A12})
UNION ALL
SELECT 'tpch1', l_returnflag || '|' || l_linestatus, sum_disc_price,
       sum_qty::DOUBLE, avg_qty + avg_disc + count_order FROM ({SQL_TPCH1})
UNION ALL
SELECT 'tpch3', o_orderkey || '|' || o_orderdate, revenue, 0.0, 0.0
FROM ({SQL_TPCH3})
UNION ALL
SELECT 'tpch5', n_name, revenue, 0.0, 0.0 FROM ({SQL_TPCH5})
UNION ALL
SELECT 'tpch18', c_custkey || '|' || o_orderkey, o_totalprice,
       sum_qty::DOUBLE, 0.0 FROM ({SQL_TPCH18})
UNION ALL
SELECT 'tpch6', 'all', revenue, line_ct::DOUBLE, 0.0 FROM ({SQL_TPCH6})
UNION ALL
SELECT 'tpch4', o_orderpriority, order_count::DOUBLE, 0.0, 0.0 FROM ({SQL_TPCH4})
UNION ALL
SELECT 'tpch10', c_custkey || '|' || n_name, revenue, 0.0, 0.0 FROM ({SQL_TPCH10})
UNION ALL
SELECT 'tpch14', 'all', promo_revenue_pct, total_revenue, 0.0 FROM ({SQL_TPCH14})
UNION ALL
SELECT 'tpch19', 'all', revenue, line_ct::DOUBLE, 0.0 FROM ({SQL_TPCH19})
UNION ALL
SELECT 'tpch7', supp_nation || '|' || cust_nation || '|' || l_year, revenue,
       0.0, 0.0 FROM ({SQL_TPCH7})
UNION ALL
SELECT 'tpch8', o_year::VARCHAR, mkt_share_u::DOUBLE, total_volume, 0.0
FROM ({SQL_TPCH8})
UNION ALL
SELECT 'tpch9', nation || '|' || o_year, sum_profit, 0.0, 0.0 FROM ({SQL_TPCH9})
UNION ALL
SELECT 'tpch13', c_count::VARCHAR, custdist::DOUBLE, 0.0, 0.0 FROM ({SQL_TPCH13})
UNION ALL
SELECT 'tpch15', s_suppkey || '|' || s_name, total_revenue, 0.0, 0.0 FROM ({SQL_TPCH15})
UNION ALL
SELECT 'tpch17', 'all', avg_yearly, line_ct::DOUBLE, 0.0 FROM ({SQL_TPCH17})
UNION ALL
SELECT 'tpch22', cntrycode, numcust::DOUBLE, totacctbal, 0.0 FROM ({SQL_TPCH22})
UNION ALL
SELECT 'tpch2', s_name || '|' || p_partkey, s_acctbal, supplycost, 0.0
FROM ({SQL_TPCH2})
UNION ALL
SELECT 'tpch11', ps_partkey::VARCHAR, value, 0.0, 0.0 FROM ({SQL_TPCH11})
UNION ALL
SELECT 'tpch12', l_shipmode, high_line_count::DOUBLE, low_line_count::DOUBLE, 0.0
FROM ({SQL_TPCH12})
UNION ALL
SELECT 'tpch16', p_brand || '|' || p_type || '|' || p_size, supplier_cnt::DOUBLE,
       0.0, 0.0 FROM ({SQL_TPCH16})
UNION ALL
SELECT 'tpch20', s_name, s_acctbal, 0.0, 0.0 FROM ({SQL_TPCH20})
UNION ALL
SELECT 'tpch21', s_name, numwait::DOUBLE, 0.0, 0.0 FROM ({SQL_TPCH21})
"""

REGISTRY = {
    "a12_rollup_tpch": (q_a12c, SQL_A12C),
}
