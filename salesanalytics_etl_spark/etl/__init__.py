from salesanalytics_etl_spark.etl.pipeline import run_pipeline

__all__ = ["run_pipeline"]
