"""SparkSession factory.

Reference analog: ``pyodibel.management.spark_mgr.get_spark_session``
(/root/reference/src/pyodibel/management/spark_mgr.py:3-33), which pins
shuffle partitions, AQE and skew-join handling. We keep those defaults
and add Arrow + UTC pinning (the DuckDB oracle compares UTC-naive
timestamps).

Scale note: ``shuffle_partitions`` defaults to the local core count; on
a real cluster it should be ~2-3x total cores and AQE coalesces the
excess. All knobs are overridable per call.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "odibel_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for the engine.

    AQE is enabled (runtime re-plan + skew-join splitting, the
    reference's own default), Arrow transfer is on for every
    pandas-UDF boundary, and the session timezone is pinned to UTC so
    results hash identically to the DuckDB oracle.
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # INT96 (Spark's legacy default) carries NO footer min/max
        # statistics — TIMESTAMP_MICROS restores them, which the lake
        # layer harvests into per-file column bounds for file skipping
        # (lake/table.py stats_columns). Every modern reader (Spark,
        # DuckDB, pyarrow) prefers the annotated int64 form anyway.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
