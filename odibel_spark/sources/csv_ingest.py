"""CSV interchange: schema-pinned ingest to parquet and sized export.

Reference parity: ``CSVToParquet`` reads with header, NO schema
inference (all-string unless a schema is given) and
``unescapedQuoteHandling=BACK_TO_DELIMITER`` for messy quotes
(reference transform/CSVToParquet.scala:18-27); the eval sinks write
header CSV re-sized with ``repartition(100)`` / ``coalesce(1)``
(eval/OutputEval.scala:34-40, eval/SnapshotEval.scala:32-38).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    delimiter: str = ",",
    unescaped_quote_handling: str | None = None,
) -> DataFrame:
    """Header CSV with the reference's posture: explicit schema (or
    all-string), never inference — at 100 TB an inference pass is a
    full extra scan, and inferred types drift between files.

    ``unescaped_quote_handling="BACK_TO_DELIMITER"`` is the
    reference's setting for dirty feeds (recovers rows with stray
    quotes instead of dropping them); note univocity then treats even
    well-formed doubled quotes literally, so reserve it for feeds that
    actually are dirty."""
    # escape='"' = RFC-4180 doubled-quote escaping (Spark's default is
    # backslash, which silently mis-parses standard CSV)
    reader = (
        spark.read.option("header", "true")
        .option("delimiter", delimiter)
        .option("escape", '"')
    )
    if unescaped_quote_handling:
        reader = reader.option("unescapedQuoteHandling", unescaped_quote_handling)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def csv_to_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    schema: T.StructType | None = None,
    delimiter: str = ",",
) -> None:
    read_csv(spark, in_path, schema, delimiter).write.mode("errorifexists").parquet(out_path)


def write_csv(df: DataFrame, path: str, n_files: int | None = None) -> None:
    """Header CSV export, output sized explicitly (the reference's
    repartition(100)/coalesce(1) sink pattern).

    The writer keeps field whitespace: Spark's CSV WRITE defaults
    ``ignoreLeading/TrailingWhiteSpace=true`` (the read side defaults
    false), which silently trims padded values — a hypothesis roundtrip
    property caught ``" "`` coming back as NULL. RFC-4180 treats
    whitespace as part of the field, so the export disables the
    trimming and write→read is the identity (modulo CSV's inherent
    NULL-vs-empty-string collapse)."""
    out = df
    if n_files is not None:
        out = df.coalesce(n_files) if n_files < df.rdd.getNumPartitions() else df.repartition(n_files)
    (
        out.write.option("header", "true")
        .option("escape", '"')
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .mode("errorifexists")
        .csv(path)
    )
