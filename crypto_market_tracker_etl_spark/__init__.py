"""crypto_market_tracker_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of every query and data-processing
capability of the reference repo ``Ash-bot19/Crypto-Market-Tracker-ETL``
(a CoinGecko → Postgres ETL + SQL-view dashboard), extended with the
large-scale training-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) and designed for 100 TB scale:

- declarative DataFrame/SQL plans (Catalyst does pushdown/pruning/reorder),
- single-shuffle keyed operators (window / max_by partial aggregation),
- broadcast joins for bounded dimensions,
- no driver-side collects in any hot path.

Layout:
    session     SparkSession factory with scale-appropriate defaults
    catalog     testdata + reference-model table loading (ns-timestamp safe)
    operators   latest-per-key, as-of join, OHLC, pct-change, upsert, dedup,
                similarity
    functions   scalar helpers (time, text stats, vectors)
    plans       the reference's four SQL views as DataFrame builders
    sources     config/REST ingestion (mockable, rate-limit aware)
    streaming   incremental availableNow jobs + event-time windows
    multimodal  binary-column plumbing with stubbed decoders
"""

__version__ = "0.1.0"
