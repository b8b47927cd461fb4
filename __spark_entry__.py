"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query (the reference's most load-bearing view,
v_latest_prices — reference sql/views.sql:2-8 — transplanted onto the
events/customer testdata). ``queries``/``oracle_sql`` expose the operator
inventory of SURVEY.md §2; implementations live in
``crypto_market_tracker_etl_spark.queries``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from crypto_market_tracker_etl_spark import queries as q
from crypto_market_tracker_etl_spark.catalog import load_table
from crypto_market_tracker_etl_spark.operators.latest import latest_per_key

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: latest event per user ⋈ broadcast customer dimension,
    ordered desc-nulls-last — scan + window + broadcast join + sort, one
    vertical slice through the engine (SURVEY.md §7.1)."""
    events = load_table(spark, SMOKE_SF_DIR, "events")
    customer = load_table(spark, SMOKE_SF_DIR, "customer")
    latest = latest_per_key(events, ["user_id"], ["ts", "event_id"])
    return (
        latest.join(
            F.broadcast(customer.select("c_custkey", "c_name", "c_acctbal")),
            latest.user_id == F.col("c_custkey"),
            "left",
        )
        .select("user_id", "ts", "event_type", "value", "c_name", "c_acctbal")
        .orderBy(F.desc_nulls_last("c_acctbal"), "user_id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return q.queries()


def oracle_sql() -> dict[str, str]:
    return q.oracle_sql()
