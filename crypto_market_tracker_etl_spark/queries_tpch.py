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
       SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS high_line_count,
       SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
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
}
