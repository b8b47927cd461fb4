"""TPC-H-shaped flagship queries over the driver testdata.

The reference's own workload is four single-table views (its Postgres does
the heavy lifting, reference ``sql/views.sql``); these three classics are
the standard evidence that the engine's JOIN ORDERING / partial aggregation
/ top-k machinery composes at warehouse shape: Q1 (wide scan + grouped
pricing aggregates), Q3 (3-way join + grouped revenue top-k), Q5 (6-way
snowflake join with two independent dim paths meeting on nation).

Float-parity convention: price/discount/tax are cast to DECIMAL at the
scan and ALL arithmetic stays in decimal — products and sums are exact, so
no per-row rounding step exists for engines to disagree on (double
round(x, 4) at a tie boundary measurably differs between Spark and
DuckDB). The exact sum is rounded to scale 4 BEFORE the double cast: a
scale-10 sum carries more significant digits than a double mantissa and
the engines' decimal→double conversions differ by an ULP, while the
scale-4 value times 10⁴ stays under 2⁵³ and converts exactly in both.
Averages divide an exact sum by the count.

Scale posture: every dim side is broadcast; facts never shuffle except for
the final grouped aggregate (partial map-side first); Q3's top-10 is
TakeOrderedAndProject, not a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table

QueryFn = "Callable[[SparkSession, str], DataFrame]"


def _dec_sum4(col) -> F.Column:
    return F.sum(col.cast("decimal(18,4)")).cast("double")


def _dec_sum2(col) -> F.Column:
    return F.sum(col.cast("decimal(18,2)")).cast("double")


def _one() -> F.Column:
    # built lazily: F.lit needs an active session
    return F.lit("1.0000").cast("decimal(5,4)")


def _disc_price() -> F.Column:
    """extendedprice × (1 − discount), exact decimal."""
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        _one() - F.col("l_discount").cast("decimal(8,4)")
    )


def _charge() -> F.Column:
    """extendedprice × (1 − discount) × (1 + tax), exact decimal."""
    return _disc_price() * (_one() + F.col("l_tax").cast("decimal(8,4)"))


# SQL twins of the decimal expressions above
SQL_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST('1.0000' AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(8,4)))"
)
SQL_CHARGE = (
    f"({SQL_DISC_PRICE})"
    " * (CAST('1.0000' AS DECIMAL(5,4)) + CAST(l_tax AS DECIMAL(8,4)))"
)


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 pricing summary: one lineitem scan, grouped decimal-exact sums.

    Catalyst plan: Project (rounded products) → partial HashAggregate →
    single Exchange on (rf, ls) → final aggregate. The filter reaches the
    parquet scan as a pushed predicate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum2(F.col("l_quantity")).alias("sum_qty"),
            _dec_sum2(F.col("l_extendedprice")).alias("sum_base_price"),
            F.round(F.sum(_disc_price()), 4).cast("double").alias("sum_disc_price"),
            F.round(F.sum(_charge()), 4).cast("double").alias("sum_charge"),
            (_dec_sum2(F.col("l_quantity")) / n).alias("avg_qty"),
            (_dec_sum2(F.col("l_extendedprice")) / n).alias("avg_price"),
            (_dec_sum4(F.col("l_discount")) / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


SQL_TPCH_Q1 = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(round(SUM({SQL_DISC_PRICE}), 4) AS DOUBLE) AS sum_disc_price,
       CAST(round(SUM({SQL_CHARGE}), 4) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shipping priority: segment-filtered customer (broadcast) ⋈ orders
    ⋈ lineitem, grouped revenue, top-10 via TakeOrderedAndProject."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-06-30").cast("timestamp_ntz")
    rev = _disc_price()
    return (
        li.filter(F.col("l_shipdate") > cutoff)
        .join(
            orders.filter(F.col("o_orderdate") < cutoff).select(
                "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(
                customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(rev), 4).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.col("l_orderkey"))
        .limit(10)
    )


SQL_TPCH_Q3 = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(round(SUM({SQL_DISC_PRICE}), 4) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-30'
  AND l_shipdate > TIMESTAMP '1998-06-30'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 local-supplier volume: snowflake join where the customer and
    supplier dim paths must meet on the same nation — revenue per nation
    for one region-year. All dims broadcast; lineitem is the only shuffled
    input (for the final grouped aggregate)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1997-01-01").cast("timestamp_ntz")
    rev = _disc_price()
    nations_in_region = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    return (
        li.join(
            orders.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
            .select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(
            F.broadcast(nations_in_region),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(F.round(F.sum(rev), 4).cast("double").alias("revenue"))
    )


SQL_TPCH_Q5 = f"""
SELECT n_name,
       CAST(round(SUM({SQL_DISC_PRICE}), 4) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 forecast revenue change: the pure-scan aggregate — every
    predicate (ship year, discount band, quantity cap) is pushed to the
    parquet scan, one partial-agg'd decimal sum, zero joins. The plan to
    look for: PushedFilters on all three columns, no Exchange before the
    single-row final aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1997-01-01").cast("timestamp_ntz")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * F.col(
        "l_discount"
    ).cast("decimal(8,4)")
    return (
        li.filter(
            (F.col("l_shipdate") >= lo)
            & (F.col("l_shipdate") < hi)
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(rev), 4).cast("double").alias("revenue"))
    )


SQL_TPCH_Q6 = """
SELECT CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_discount AS DECIMAL(8,4))), 4) AS DOUBLE)
         AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 returned-item reporting (adapted to the testdata's customer
    columns — no address/phone/comment in the generated schema): top-20
    customers by revenue lost to returns in one quarter. Fact⋈fact on
    orderkey shuffles once; customer and nation broadcast; top-20 is
    TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1996-04-01").cast("timestamp_ntz")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)
            ).select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(
                customer.select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_disc_price()), 4).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.col("c_custkey"))
        .limit(20)
    )


SQL_TPCH_Q10 = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(round(SUM({SQL_DISC_PRICE}), 4) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 promotion effect: one fact⋈broadcast-dim join + conditional
    decimal aggregation (the FILTER/CASE-inside-SUM pattern) — promo
    revenue share for one month. Both sums come out of the same single
    aggregation pass."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    lo = F.lit("1996-03-01").cast("timestamp_ntz")
    hi = F.lit("1996-04-01").cast("timestamp_ntz")
    promo = F.when(
        F.col("p_name").startswith("red"), _disc_price()
    ).otherwise(F.lit("0").cast("decimal(18,2)"))
    return (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(
            F.broadcast(part.select("p_partkey", "p_name")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .agg(
            F.round(
                F.lit(100.0) * F.sum(promo).cast("double")
                / F.sum(_disc_price()).cast("double"),
                4,
            ).alias("promo_revenue_pct")
        )
    )


SQL_TPCH_Q14 = f"""
SELECT round(100.0 * CAST(SUM(CASE WHEN p_name LIKE 'red%'
                                   THEN {SQL_DISC_PRICE}
                                   ELSE CAST('0' AS DECIMAL(18,2)) END)
                     AS DOUBLE)
              / CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE), 4)
         AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate < TIMESTAMP '1996-04-01'
"""


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 order-priority checking, adapted to the trimmed lineitem (no
    commit/receipt dates generated): the EXISTS predicate becomes 'has a
    returned line' (l_returnflag = 'R'). The SHAPE is the point and is
    unchanged — EXISTS decorrelates to a LEFT SEMI join (the semi join
    itself deduplicates the line side, no distinct pass), then a 5-group
    count."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1996-04-01").cast("timestamp_ntz")
    flagged = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        orders.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .join(flagged, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


SQL_TPCH_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 dual conditional counts, adapted to the trimmed lineitem (no
    shipmode/commit/receipt columns): group by l_linestatus over a
    ship-year window; high/low split by order priority. Same shape —
    fact⋈fact equi-join + both CASE-counts in ONE aggregation pass."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem")
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1997-01-01").cast("timestamp_ntz")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long")
    return (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(high).alias("high_line_count"),
            F.sum(F.lit(1) - high).alias("low_line_count"),
        )
    )


SQL_TPCH_Q12 = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
"""


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 volume shipping between two nations: the double-dimension-path
    join — the SAME nation dim is applied twice (once through supplier,
    once through customer) and the pair filter is the cross of both paths.
    lineitem⋈orders is the only shuffle; supplier/customer/nation all
    broadcast. Revenue per (supp_nation, cust_nation, ship-year)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1998-01-01").cast("timestamp_ntz")
    n1 = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(_disc_price()), 4).cast("double").alias("revenue"))
    )


SQL_TPCH_Q7 = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       CAST(round(SUM({SQL_DISC_PRICE}), 4) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
"""


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 national market share: one nation's slice of ECONOMY-part revenue
    sold into ASIA, per order-year — conditional numerator over a total
    denominator out of ONE aggregation pass. Five dims broadcast; the
    lineitem⋈orders equi-join is the only shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1998-01-01").cast("timestamp_ntz")
    asia_nations = (
        nation.join(F.broadcast(region.filter(F.col("r_name") == "ASIA")),
                    F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    supp_nation = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = _disc_price()
    target = F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(
        F.lit("0").cast("decimal(18,2)")
    )
    return (
        li.join(
            orders.filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
            .select("o_orderkey", "o_custkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(part.filter(F.col("p_type") == "ECONOMY")
                          .select("p_partkey")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(asia_nations), F.col("c_nationkey") == F.col("cn_key"),
              "left_semi")
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(target).cast("double") / F.sum(vol).cast("double"), 6
            ).alias("mkt_share")
        )
    )


SQL_TPCH_Q8 = f"""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       round(CAST(SUM(CASE WHEN n1.n_name = 'NATION_5' THEN {SQL_DISC_PRICE}
                           ELSE CAST('0' AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE), 6) AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region ON n2.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY 1
"""


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 customer order-count distribution: the two-level aggregate —
    left join keeps order-less customers (c_count 0), first group-by
    custkey, second by the count itself. Both aggs are partial-first; the
    customer⋈orders join shuffles on custkey once."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.select("c_custkey")
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


SQL_TPCH_Q13 = """
SELECT c_count, count(*) AS custdist
FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 top supplier: revenue per supplier for one quarter, keep the
    max — the scalar-subquery-on-an-aggregate shape. The max is a 1-row
    aggregate joined back by broadcast (no second scan of lineitem, no
    window over the whole agg). Ties all surface, as in the spec.

    Revenue is rounded from the exact decimal sum BEFORE the max/equality
    so both engines compare identical doubles."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    lo = F.lit("1996-01-01").cast("timestamp_ntz")
    hi = F.lit("1996-04-01").cast("timestamp_ntz")
    rev = (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .groupBy("l_suppkey")
        .agg(F.round(F.sum(_disc_price()), 4).cast("double").alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


SQL_TPCH_Q15 = f"""
WITH revenue AS (
  SELECT l_suppkey, CAST(round(SUM({SQL_DISC_PRICE}), 4) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 small-quantity-order revenue: the correlated-average shape —
    each line compares against 20% of ITS part's mean quantity. The
    correlated subquery decorrelates to a per-part aggregate joined back.
    Brand parts are broadcast FIRST so the per-part aggregate only runs
    over the brand's lines, then re-joined by broadcast (part-bounded, so
    the fact table never shuffles).

    Cross-engine exactness: `qty < 0.2 * avg(qty)` is evaluated as
    `qty * cnt * 10 < sum(qty) * 2` in decimal — no double division on
    the comparison boundary."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    brand = F.broadcast(
        part.filter(F.col("p_brand") == "Brand#11").select("p_partkey")
    )
    lines = li.join(brand, F.col("l_partkey") == F.col("p_partkey")).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    per_part = lines.groupBy(F.col("l_partkey").alias("pp_key")).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("pp_sum"),
        F.count(F.lit(1)).alias("pp_cnt"),
    )
    small = (
        F.col("l_quantity").cast("decimal(18,2)") * F.col("pp_cnt") * F.lit(10)
        < F.col("pp_sum") * F.lit(2)
    )
    return (
        lines.join(F.broadcast(per_part), F.col("l_partkey") == F.col("pp_key"))
        .filter(small)
        .agg(
            (
                F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 4)
                .cast("double") / F.lit(7.0)
            ).alias("avg_yearly")
        )
    )


SQL_TPCH_Q17 = """
WITH brand_lines AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#11'),
per_part AS (
  SELECT l_partkey AS pp_key,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS pp_sum,
         count(*) AS pp_cnt
  FROM brand_lines GROUP BY 1)
SELECT CAST(round(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 4) AS DOUBLE)
         / 7.0 AS avg_yearly
FROM brand_lines JOIN per_part ON l_partkey = pp_key
WHERE CAST(l_quantity AS DECIMAL(18,2)) * pp_cnt * 10 < pp_sum * 2
"""


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 large-volume customers: HAVING-on-a-grouped-sum feeding a
    top-k. One lineitem scan computes per-order quantity; the >300 filter
    shrinks it to a sliver that broadcasts into orders (no second
    lineitem scan, unlike the textbook double-scan plan); customer
    broadcasts; top-100 is TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(_dec_sum2(F.col("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 300.0)
    )
    return (
        orders.join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(customer.select("c_custkey", "c_name")),
              F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "total_qty")
        .orderBy(F.desc("o_totalprice"), F.col("o_orderkey"))
        .limit(100)
    )


SQL_TPCH_Q18 = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM orders
JOIN lineitem ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300.0
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 discounted revenue under disjunctive predicates (adapted: the
    testdata part has no container/shipmode, so the three arms pair brand
    + size band + quantity band). The point of the shape: an OR of
    conjunctions across BOTH join sides still pushes the per-side
    envelopes (brand set to the part scan, quantity range to lineitem)
    and evaluates the residual disjunction post-join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    parts = part.filter(
        F.col("p_brand").isin("Brand#11", "Brand#22", "Brand#33")
    ).select("p_partkey", "p_brand", "p_size")
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & (F.col("p_size").between(1, smax))
        & (F.col("l_quantity") >= qlo) & (F.col("l_quantity") <= qhi)
    )
    return (
        li.filter((F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30))
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .filter(
            arm("Brand#11", 5, 1, 11) | arm("Brand#22", 10, 10, 20)
            | arm("Brand#33", 15, 20, 30)
        )
        .agg(F.round(F.sum(_disc_price()), 4).cast("double").alias("revenue"))
    )


SQL_TPCH_Q19 = f"""
SELECT CAST(round(SUM({SQL_DISC_PRICE}), 4) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#33' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 dormant high-balance customers (adapted: the testdata has no
    phone column and every customer has SOME order, so the cohort is
    'above-average balance, no order in the trailing ~20 months', grouped
    by market segment instead of country code). Shape preserved: scalar
    aggregate subquery + NOT EXISTS anti join + grouped count/sum.

    Cross-engine exactness: `bal > avg(positive bals)` is evaluated as
    `bal * cnt > sum` in decimal — no double division on the boundary."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    bal = F.col("c_acctbal").cast("decimal(18,2)")
    pos = customer.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(bal).alias("pos_sum"), F.count(F.lit(1)).alias("pos_cnt")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp_ntz")
    ).select("o_custkey")
    return (
        customer.join(F.broadcast(pos))
        .filter(bal * F.col("pos_cnt") > F.col("pos_sum"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(bal).cast("double").alias("totacctbal"),
        )
    )


SQL_TPCH_Q22 = """
WITH pos AS (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS pos_sum, count(*) AS pos_cnt
  FROM customer WHERE c_acctbal > 0.0)
SELECT c_mktsegment, count(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer, pos
WHERE CAST(c_acctbal AS DECIMAL(18,2)) * pos_cnt > pos_sum
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_mktsegment
"""


def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 minimum-cost supplier (adapted: the testdata has no partsupp
    table, so the part↔supplier cost relation is DERIVED from lineitem —
    ``ps_supplycost`` := min extendedprice a supplier ever charged for the
    part). Shape preserved end-to-end: region-filtered supplier dim path,
    a correlated-min subquery over the cost relation (decorrelated to a
    per-part window min), equality on the minimum, multi-key ordered
    top-100.

    Scale posture: the part sliver (size 10–20 AND type=LARGE, ~1/27 of
    part) and the EUROPE supplier dim broadcast into the fact scan FIRST,
    so the per-(part,supplier) aggregate only runs over the sliver's
    lines. The window min reuses the grouped output (one Exchange for the
    groupBy, one for the partkey window — both on sliver-sized data).
    Cost equality compares exact decimals, never doubles."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    from pyspark.sql import Window

    part_f = part.filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "LARGE")
    ).select("p_partkey", "p_name")
    eu = (
        supplier.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps = (
        li.join(F.broadcast(part_f.select("p_partkey")),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(eu.select("s_suppkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(F.col("l_extendedprice").cast("decimal(18,2)")).alias(
                "ps_supplycost"
            )
        )
    )
    w = Window.partitionBy("l_partkey")
    best = ps.withColumn("min_cost", F.min("ps_supplycost").over(w)).filter(
        F.col("ps_supplycost") == F.col("min_cost")
    )
    return (
        best.join(F.broadcast(part_f), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("ps_supplycost").cast("double").alias("ps_supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


SQL_TPCH_Q2 = """
WITH eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'),
part_f AS (
  SELECT p_partkey, p_name FROM part
  WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'),
ps AS (
  SELECT l_partkey, l_suppkey,
         MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS ps_supplycost
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part_f)
    AND l_suppkey IN (SELECT s_suppkey FROM eu)
  GROUP BY 1, 2),
best AS (
  SELECT *, MIN(ps_supplycost) OVER (PARTITION BY l_partkey) AS min_cost
  FROM ps)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       CAST(ps_supplycost AS DOUBLE) AS ps_supplycost
FROM best
JOIN part_f ON l_partkey = p_partkey
JOIN eu ON l_suppkey = s_suppkey
WHERE ps_supplycost = min_cost
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 product-type profit by nation and year (adapted: no partsupp ⇒
    no ps_supplycost term, so profit := Σ extendedprice×(1−discount); the
    p_name LIKE filter, the 4-way dim fan-in on the fact scan, and the
    (nation, year) grouped rollup are the shape being exercised).

    Scale posture: part sliver and supplier⋈nation broadcast into the
    lineitem scan; the orders join is the one genuinely big⋈big edge and
    shuffles on orderkey exactly once; the grouped agg is partial-first.
    Decimal-exact profit, rounded to scale 4 before the double cast."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    part_f = part.filter(F.col("p_name").like("%widget%")).select("p_partkey")
    sn = supplier.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "n_name")
    return (
        li.join(F.broadcast(part_f), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(_disc_price()), 4).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


SQL_TPCH_Q9 = f"""
SELECT n_name AS nation,
       CAST(YEAR(o_orderdate) AS INT) AS o_year,
       CAST(round(SUM({SQL_DISC_PRICE}), 4) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 important stock (adapted: part "value" held by one region's
    suppliers is derived from lineitem revenue instead of
    ps_supplycost×ps_availqty; the original's single-nation slice is a
    region slice so the cohort survives the smallest test SF). Shape
    preserved: grouped per-part value, HAVING against a scalar-subquery
    fraction of the cohort total.

    Scale posture: ONE fact aggregation; the cohort total is re-derived
    from the per-part sums (sliver-sized second agg, broadcast back) — the
    textbook plan's second full fact scan never happens. The threshold
    `value > total/1000` compares `value*1000 > total` in exact decimal —
    no double division on the HAVING boundary."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    nat_supp = (
        supplier.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name") == "ASIA")),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    per_part = (
        li.join(F.broadcast(nat_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(F.sum(_disc_price()).alias("value_dec"))
    )
    total = per_part.agg(F.sum("value_dec").alias("total_dec"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_dec") * F.lit(1000) > F.col("total_dec"))
        .select(
            "ps_partkey",
            F.round(F.col("value_dec"), 4).cast("double").alias("value"),
        )
        .orderBy(F.desc("value"), "ps_partkey")
    )


SQL_TPCH_Q11 = f"""
WITH per_part AS (
  SELECT l_partkey AS ps_partkey, SUM({SQL_DISC_PRICE}) AS value_dec
  FROM lineitem
  WHERE l_suppkey IN (
    SELECT s_suppkey FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA')
  GROUP BY 1),
total AS (SELECT SUM(value_dec) AS total_dec FROM per_part)
SELECT ps_partkey, CAST(round(value_dec, 4) AS DOUBLE) AS value
FROM per_part, total
WHERE value_dec * 1000 > total_dec
ORDER BY value DESC, ps_partkey
"""


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 supplier count by part attributes (adapted: the part↔supplier
    relation is the DISTINCT (partkey, suppkey) pairs observed in
    lineitem; the "customer complaint" supplier exclusion keys on negative
    account balance since the testdata has no comment column). Shape
    preserved: NOT-IN supplier exclusion, attribute-sliced parts, grouped
    COUNT(DISTINCT suppkey), multi-key ordered output.

    Scale posture: the pair-distinct is the only fact shuffle; part
    attributes and the (tiny) excluded-supplier list broadcast; the
    count-distinct rides the same keys partial-first."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")

    part_f = part.filter(
        (F.col("p_brand") != "Brand#9")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 2, 3, 4, 5, 6, 7, 8))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = supplier.filter(F.col("s_acctbal") < 0.0).select("s_suppkey")
    pairs = (
        li.select("l_partkey", "l_suppkey")
        .join(F.broadcast(part_f), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
    )
    return (
        pairs.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


SQL_TPCH_Q16 = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT p_brand, p_type, p_size, l_suppkey
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE p_brand <> 'Brand#9' AND p_type <> 'PROMO'
        AND p_size IN (1,2,3,4,5,6,7,8)
        AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0))
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 potential part promotion (adapted: with no ps_availqty, a
    supplier "has excess stock" of a part when it shipped MORE THAN HALF
    of that part's 1997 volume — same nested aggregate-vs-aggregate
    comparison, same semi-join chain up to the supplier dim; the original
    nation filter becomes a region filter on the dim path).

    Scale posture: the name-sliced part sliver broadcasts into a
    year-pruned fact scan; per-(part,supplier) quantities window-roll to
    the part total (no second scan); the qualifying supplier ids collapse
    to a sliver that broadcast-semi-joins the supplier dim. The "more
    than half" test compares `2×supp_qty > total_qty` in exact decimal."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    from pyspark.sql import Window

    part_f = part.filter(F.col("p_name").like("small%")).select("p_partkey")
    qty97 = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .join(F.broadcast(part_f), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("supp_qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = qty97.withColumn("tot_qty", F.sum("supp_qty").over(w)).filter(
        F.col("supp_qty") * F.lit(2) > F.col("tot_qty")
    )
    supp_ids = dominant.select("l_suppkey").distinct()
    eu_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey")
    return (
        supplier.join(
            F.broadcast(supp_ids), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .join(
            F.broadcast(eu_nations),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


SQL_TPCH_Q20 = """
WITH qty97 AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS supp_qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
  GROUP BY 1, 2),
dominant AS (
  SELECT l_suppkey
  FROM (SELECT *, SUM(supp_qty) OVER (PARTITION BY l_partkey) AS tot_qty
        FROM qty97)
  WHERE supp_qty * 2 > tot_qty)
SELECT s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM dominant)
  AND s_nationkey IN (
    SELECT n_nationkey FROM nation
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE')
ORDER BY s_name
"""


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 suppliers who kept orders waiting (adapted: with no
    commit/receipt dates, a line is LATE when it shipped more than 30
    days after the order date). The original's EXISTS (another supplier
    on the order) + NOT EXISTS (another LATE supplier) pair is evaluated
    in ONE pass: per-(order, supplier) lateness flags window-roll to
    per-order supplier/late-supplier counts, and blame lands on the
    supplier that is late on a multi-supplier order where nobody else is.

    Scale posture: the status-F orders project to (orderkey, orderdate)
    and join the fact on orderkey — the one big⋈big shuffle; the
    double-EXISTS collapses into the window over the already-grouped
    sliver; supplier broadcasts at the end. No self-joins of lineitem
    (the textbook plan scans it three times; this scans it once)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    from pyspark.sql import Window

    of = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    late_flag = (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    ).cast("int")
    per_supp = (
        li.join(of, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late_flag).alias("is_late"))
    )
    w = Window.partitionBy("l_orderkey")
    blamed = (
        per_supp.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_late", F.sum("is_late").over(w))
        .filter(
            (F.col("is_late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1)
        )
    )
    return (
        blamed.join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


SQL_TPCH_Q21 = """
WITH per_supp AS (
  SELECT l_orderkey, l_suppkey,
         MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY
                  THEN 1 ELSE 0 END) AS is_late
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1, 2),
blamed AS (
  SELECT l_suppkey
  FROM (SELECT *,
               count(*) OVER (PARTITION BY l_orderkey) AS n_supp,
               SUM(is_late) OVER (PARTITION BY l_orderkey) AS n_late
        FROM per_supp)
  WHERE is_late = 1 AND n_supp > 1 AND n_late = 1)
SELECT s_name, count(*) AS numwait
FROM blamed JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


REGISTRY_TPCH = {
    "tpch_q1": (q_tpch_q1, SQL_TPCH_Q1),
    "tpch_q3": (q_tpch_q3, SQL_TPCH_Q3),
    "tpch_q5": (q_tpch_q5, SQL_TPCH_Q5),
    "tpch_q6": (q_tpch_q6, SQL_TPCH_Q6),
    "tpch_q10": (q_tpch_q10, SQL_TPCH_Q10),
    "tpch_q14": (q_tpch_q14, SQL_TPCH_Q14),
    "tpch_q4": (q_tpch_q4, SQL_TPCH_Q4),
    "tpch_q12": (q_tpch_q12, SQL_TPCH_Q12),
    "tpch_q7": (q_tpch_q7, SQL_TPCH_Q7),
    "tpch_q8": (q_tpch_q8, SQL_TPCH_Q8),
    "tpch_q13": (q_tpch_q13, SQL_TPCH_Q13),
    "tpch_q15": (q_tpch_q15, SQL_TPCH_Q15),
    "tpch_q17": (q_tpch_q17, SQL_TPCH_Q17),
    "tpch_q18": (q_tpch_q18, SQL_TPCH_Q18),
    "tpch_q19": (q_tpch_q19, SQL_TPCH_Q19),
    "tpch_q22": (q_tpch_q22, SQL_TPCH_Q22),
    "tpch_q2": (q_tpch_q2, SQL_TPCH_Q2),
    "tpch_q9": (q_tpch_q9, SQL_TPCH_Q9),
    "tpch_q11": (q_tpch_q11, SQL_TPCH_Q11),
    "tpch_q16": (q_tpch_q16, SQL_TPCH_Q16),
    "tpch_q20": (q_tpch_q20, SQL_TPCH_Q20),
    "tpch_q21": (q_tpch_q21, SQL_TPCH_Q21),
}
