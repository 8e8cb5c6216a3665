"""Kafka-shaped WAL decoding.

The CDC pipeline consumes any micro-batch DataFrame with the WAL
schema; a Kafka topic slots in by decoding the broker envelope
``(key binary, value binary, topic, partition, offset, timestamp)``
into WAL rows. This module is that decode step — pure column
expressions (`from_json` on the value), so the pipeline's dedup /
merge / lineage plumbing is identical for file- and broker-fed runs.

No broker exists in this sandbox, so the *source* is exercised in
batch: tests synthesize Kafka-envelope rows from a generated WAL
(``encode_as_kafka``) and assert the decode round-trips exactly. On a
real cluster:

    raw = (spark.readStream.format("kafka")
           .option("kafka.bootstrap.servers", ...)
           .option("subscribe", topic).load())
    events = decode_kafka_wal(raw, wal_schema)
    # → TranscriptCdcPipeline sink via foreachBatch, unchanged

Broker offsets land in the `_kafka` struct so per-partition lineage
can record source offset ranges alongside the applied-LSN HWMs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def encode_as_kafka(events: DataFrame, key_col: str = "conv_id") -> DataFrame:
    """WAL rows → Kafka-envelope rows (test/producer helper). The key
    is the conversation id so a partitioned topic preserves per-key
    order, mirroring the bucket layout."""
    payload = F.to_json(F.struct(*[F.col(c) for c in events.columns]))
    return events.select(
        F.col(key_col).cast("string").cast("binary").alias("key"),
        payload.cast("binary").alias("value"),
        F.lit("transcript-wal").alias("topic"),
        F.pmod(F.xxhash64(F.col(key_col)), F.lit(32)).cast("int").alias("partition"),
        F.col("lsn").alias("offset"),
        F.current_timestamp().alias("timestamp"),
    )


def decode_kafka_wal(raw: DataFrame, wal_schema: T.StructType) -> DataFrame:
    """Kafka envelope → WAL rows + ``_kafka`` lineage struct. Rows whose
    value fails to parse keep NULL payload columns and flow into the
    dead-letter split downstream (never silently dropped)."""
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), wal_schema).alias("w"),
        F.struct("topic", "partition", "offset").alias("_kafka"),
    )
    return parsed.select(*[F.col(f"w.{f.name}").alias(f.name) for f in wal_schema.fields], "_kafka")
