"""data_pipelines_cu_spark — a PySpark-native analytics engine.

Brand-new engine re-expressing the query/data-processing semantics of the
``ones19-code/data-pipelines-cu`` reference (an Airflow + pandas ETL course
repo) as idiomatic Spark DataFrame/SQL, plus large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal
plumbing). See SURVEY.md for the operator inventory this implements.

Layout:
    session    — SparkSession factory tuned for scale (AQE, Arrow, pushdown)
    catalog    — fixture table loading/registration
    operators/ — relational + pipeline operators (cleaning, filters, joins,
                 aggregates, windows, dedup, similarity, text, upsert)
    sources/   — readers (csv/json/text/gz), HTTP connector w/ pushdown,
                 deterministic generators
    functions/ — scalar expression helpers
    plans/     — lightweight pipeline runner (stages, branch, retry, sensors)
    streaming/ — Structured Streaming jobs mirroring the DAG cadences
    pipelines/ — end-to-end pipelines (binance, stocksense, goldwar)
"""

__version__ = "0.1.0"
