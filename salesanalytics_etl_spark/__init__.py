"""salesanalytics_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference repo ``arnaldosalas-tech/SalesAnalytics-ETL``
(see SURVEY.md): CSV/parquet ingestion with schema conformance, a
clean/validate/dedupe/FK-integrity layer, an idempotent upsert writer, and a
relational query library (14 reporting queries + 2 views), plus
large-scale-pipeline extensions (dedup, similarity search, text analysis,
multimodal plumbing, streaming ingest).

Everything is declared via the DataFrame/SQL API so Catalyst + AQE pick the
physical strategy; Python UDFs appear only where built-ins genuinely cannot
express the semantics (and then only as Arrow-batched pandas UDFs).
"""

from salesanalytics_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
