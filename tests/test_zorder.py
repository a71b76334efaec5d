"""Z-order layout (sources/zorder.py): the written files' parquet footer
stats must prune range predicates on EVERY clustered column — the
property a linear sort only provides for its leading column."""

from __future__ import annotations

from pyspark.sql import functions as F

from salesanalytics_etl_spark.sources.zorder import (
    file_minmax_stats,
    pruned_file_fraction,
    zorder_write,
)

SF_DIR_MED = "/root/testdata/sf0.01"


def _events(spark):
    return spark.read.parquet(f"{SF_DIR_MED}/events.parquet").select(
        "event_id", "user_id", "value"
    )


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    df = _events(spark)
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "linear")
    zorder_write(df, zpath, ["user_id", "value"], n_files=16)
    # control: classic linear sort on the leading column only
    (
        df.repartitionByRange(16, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    zstats = file_minmax_stats(zpath, ["user_id", "value"])
    lstats = file_minmax_stats(lpath, ["user_id", "value"])
    assert len(zstats) == 16

    # Narrow range on each dimension ~ one quantile bucket wide.
    uids = [r["user_id"] for s in (zstats,) for r in s]
    z_user = pruned_file_fraction(zstats, "user_id", 10, 18)
    z_val = pruned_file_fraction(zstats, "value", 1.0, 2.0)
    l_user = pruned_file_fraction(lstats, "user_id", 10, 18)
    l_val = pruned_file_fraction(lstats, "value", 1.0, 2.0)

    # Linear layout: leading column prunes hard, second column not at all.
    assert l_user >= 0.8
    assert l_val == 0.0
    # Z-order: BOTH dimensions prune meaningfully.
    assert z_user >= 0.4, f"z user pruning too weak: {z_user} ({uids})"
    assert z_val >= 0.4, f"z value pruning too weak: {z_val}"


def test_zorder_preserves_rows_and_schema(spark, tmp_path):
    df = _events(spark)
    zpath = str(tmp_path / "z2")
    zorder_write(df, zpath, ["user_id", "value"], n_files=8)
    back = spark.read.parquet(zpath)
    assert back.schema == df.schema
    assert back.count() == df.count()
    assert (
        back.agg(F.sum("event_id")).first()[0]
        == df.agg(F.sum("event_id")).first()[0]
    )


def test_zorder_handles_nulls(spark, tmp_path):
    df = _events(spark).withColumn(
        "value", F.when(F.col("event_id") % 7 == 0, None).otherwise(F.col("value"))
    )
    zpath = str(tmp_path / "z3")
    zorder_write(df, zpath, ["user_id", "value"], n_files=8)
    back = spark.read.parquet(zpath)
    assert back.count() == df.count()
    assert (
        back.filter(F.col("value").isNull()).count()
        == df.filter(F.col("value").isNull()).count()
    )
