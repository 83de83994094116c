"""sparkclif — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference bot
(Common-Longitudinal-ICU-data-Format/clif-project-bot), redesigned
Spark-first for 100 TB scale.

Layout:
    session.py   SparkSession builder (AQE, UTC, Arrow)
    io.py        testdata table loaders / temp-view registry
    registry.py  query registry: name -> (spark_fn, oracle_sql)
    queries/     driver-checked query surface (SURVEY.md §2.2)
    clif/        reference-semantics layer (status store, metadata
                 extraction, mCIDE catalog, dashboard)
    operators/   custom operators built ON Spark (as-of join, dedup,
                 similarity search, text analysis)
    streaming/   Structured Streaming surface (group H)
"""

__version__ = "0.1.0"
