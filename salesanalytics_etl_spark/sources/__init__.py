from salesanalytics_etl_spark.sources.readers import (
    load_driver_tables,
    read_csv_exact,
    register_driver_views,
)
from salesanalytics_etl_spark.sources.writers import write_rejects

__all__ = [
    "read_csv_exact",
    "load_driver_tables",
    "register_driver_views",
    "write_rejects",
]
