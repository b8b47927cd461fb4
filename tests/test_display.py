"""Display-format expressions (reference app.py:63-75 semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from crypto_market_tracker_etl_spark.functions.display import (
    fmt_compact,
    fmt_pct,
    fmt_price,
)


def test_display_formats(spark):
    df = spark.createDataFrame(
        [(1234.567, 12.3456, 1234567.89),
         (0.000123456, -0.5, 999.4),
         (None, None, None)],
        "price double, pct double, cap double",
    )
    rows = df.select(
        fmt_price(F.col("price")).alias("p"),
        fmt_pct(F.col("pct")).alias("c"),
        fmt_compact(F.col("cap")).alias("m"),
    ).collect()
    assert rows[0]["p"] == "$1,234.57"
    assert rows[0]["c"] == "+12.35%"
    assert rows[0]["m"] == "$1,234,568"
    assert rows[1]["p"] == "$0.000123"  # 3 significant digits below 1
    assert rows[1]["c"] == "-0.50%"
    assert rows[1]["m"] == "$999"
    assert rows[2]["p"] is None and rows[2]["c"] is None and rows[2]["m"] is None


def test_weighted_median_grouped_agg(spark):
    """GROUPED_AGG pandas UDAF vs a numpy model."""
    from crypto_market_tracker_etl_spark.functions.udx import weighted_median

    rows = [("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", 3.0, 10.0),
            ("b", 5.0, 1.0), ("b", 7.0, 1.0)]
    df = spark.createDataFrame(rows, "k string, v double, w double")
    got = {
        r["k"]: r["wm"]
        for r in df.groupBy("k").agg(weighted_median("v", "w").alias("wm")).collect()
    }
    assert got == {"a": 3.0, "b": 5.0}  # a: weight mass sits on 3.0


def test_span_splitter_udtf(spark):
    """Python UDTF: offsets index the original string exactly."""
    from crypto_market_tracker_etl_spark.functions.udx import SpanSplitter

    spark.udtf.register("span_split", SpanSplitter)
    text = "Hello there. How are you?  Fine!"
    rows = spark.sql(
        "SELECT * FROM span_split('" + text + "')"
    ).collect()
    spans = [(r["start"], r["end"], r["span"]) for r in rows]
    assert [s[2] for s in spans] == ["Hello there", "How are you", "Fine"]
    for st, en, sp in spans:
        assert text[st:en] == sp
