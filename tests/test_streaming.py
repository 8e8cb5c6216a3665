"""Streaming module: watermarked windowed aggs + applyInPandasWithState
running state, each checked against its batch oracle."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from odibel_spark.cdc import WalConfig, write_wal_files
from odibel_spark.streaming import running_turn_state, windowed_event_counts

CFG = WalConfig(n_events=8_000, n_convs=120, seed=77)


def _wal(spark, tmpdir_path):
    d = os.path.join(tmpdir_path, "wal")
    write_wal_files(spark, CFG, d, n_files=4)
    return d


def _schema(spark, wal):
    return spark.read.option("recursiveFileLookup", "true").option("mergeSchema", "true").parquet(wal).schema


def test_windowed_counts_stream_equals_batch(spark, tmpdir_path):
    wal = _wal(spark, tmpdir_path)
    schema = _schema(spark, wal)

    batch = spark.read.schema(schema).option("recursiveFileLookup", "true").parquet(wal)
    expected = {
        (r["window_start"], r["role"]): r["n_events"]
        for r in windowed_event_counts(batch, "ts", "10 minutes", group_cols=["role"]).collect()
    }

    stream = (
        spark.readStream.schema(schema).option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 2).parquet(wal)
    )
    q = (
        windowed_event_counts(stream, "ts", "10 minutes", "30 minutes", group_cols=["role"])
        .writeStream.format("memory").queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(tmpdir_path, "ckpt_w"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"], r["role"]): r["n_events"]
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert got == expected
    assert len(got) > 5


def test_running_state_matches_batch_oracle(spark, tmpdir_path):
    wal = _wal(spark, tmpdir_path)
    schema = _schema(spark, wal)

    stream = (
        spark.readStream.schema(schema).option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", 1).parquet(wal)  # several micro-batches → state carried across
    )
    q = (
        running_turn_state(stream, "conv_id")
        .writeStream.format("memory").queryName("conv_state")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(tmpdir_path, "ckpt_s"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # latest emission per key (keys re-emit each batch they appear in)
    emissions = spark.sql("SELECT * FROM conv_state")
    latest = (
        emissions.groupBy("conv_id")
        .agg(
            F.max("applied_lsn_hwm").alias("applied_lsn_hwm"),
            F.max("n_events_total").alias("n_events_total"),
        )
    )
    batch = spark.read.schema(schema).option("recursiveFileLookup", "true").parquet(wal)
    oracle = batch.groupBy("conv_id").agg(
        F.max("lsn").alias("exp_hwm"), F.count("*").alias("exp_total")
    )
    diff = latest.join(oracle, "conv_id", "full_outer").filter(
        F.col("applied_lsn_hwm").isNull()
        | F.col("exp_hwm").isNull()
        | (F.col("applied_lsn_hwm") != F.col("exp_hwm"))
        | (F.col("n_events_total") != F.col("exp_total"))
    )
    assert diff.count() == 0
    assert latest.count() == batch.select("conv_id").distinct().count()
