"""CLI entry point — the analogue of ``python etl_sales_analytics.py``
(reference EP1): run the full ETL over a CSV directory into a parquet
target, printing reject/row counts like the reference's [WARN]/[COUNT]
logging (etl_sales_analytics.py:295-299).

    python -m salesanalytics_etl_spark.etl DATA_DIR [TARGET_DIR]
"""

from __future__ import annotations

import sys

from salesanalytics_etl_spark.etl.pipeline import run_pipeline
from salesanalytics_etl_spark.session import get_spark


def main(argv: list[str]) -> int:
    if not argv:
        print(__doc__)
        return 2
    data_dir = argv[0]
    target_dir = argv[1] if len(argv) > 1 else None
    spark = get_spark(app_name="salesanalytics_etl")
    res = run_pipeline(spark, data_dir, target_dir=target_dir)
    for name, n in res.reject_counts.items():
        if n:
            print(f"[WARN] {name}: {n} rows rejected (FK violations)")
    for name, n in res.counts.items():
        print(f"[COUNT] {name}: {n}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
