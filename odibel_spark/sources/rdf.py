"""N-Triples source/sink + triple-table operators — parity with the
reference's Python engine core ``rDF2``
(/root/reference/src/pyodibel/operations/rdf/rdf2.py).

Data model (rdf2.py:25-43): a DataFrame with exactly columns
``s, p, o, isLiteral`` — schema validated on construction. Parsing
(rdf2.py:45-67) is pure column expressions: trim → drop blanks and
comments → check the line terminator with a backtracking-safe rlike →
3-way split → strip the trailing ``.`` → ``isLiteral = o startswith
'"'`` (F4). Serialization (rdf2.py:93-102) is ``concat_ws`` + a
refuse-if-exists sink guard (S8) — superseded by the lake format's
snapshot commits for engine tables, kept here for interchange parity.

All operators below are the reference's semantics re-expressed with
the joins they actually are (left_semi / left_anti instead of
join+project — SURVEY.md §2.2 F5-F8).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRIPLE_COLUMNS = ["s", "p", "o", "isLiteral"]

#: line must end with `.` after optional whitespace; anchored, no
#: nested quantifiers (the reference notes regex-backtracking
#: avoidance, rdf2.py:57)
_TERMINATOR = r"\.\s*$"


def validate_triples(df: DataFrame) -> DataFrame:
    """Schema gate: exactly (s, p, o, isLiteral) — reference
    rDF2._validate raises on missing/extra columns (rdf2.py:29-43)."""
    if list(df.columns) != TRIPLE_COLUMNS:
        raise ValueError(f"triple table must have columns {TRIPLE_COLUMNS}, got {df.columns}")
    return df


def parse_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """Parse an N-Triples text file into the (s,p,o,isLiteral) table."""
    lines = spark.read.text(path).select(F.trim(F.col("value")).alias("line"))
    lines = lines.filter(
        (F.length("line") > 0) & ~F.col("line").startswith("#") & F.col("line").rlike(_TERMINATOR)
    )
    parts = F.split(F.col("line"), r"\s+", 3)
    df = lines.select(
        parts.getItem(0).alias("s"),
        parts.getItem(1).alias("p"),
        F.regexp_replace(parts.getItem(2), r"\s*\.\s*$", "").alias("o"),
    )
    return df.withColumn("isLiteral", F.col("o").startswith('"'))


def serialize_ntriples(df: DataFrame, path: str, overwrite: bool = False) -> None:
    """Write the triple table back as N-Triples text; refuses an
    existing path unless overwrite (reference write_nt guard)."""
    validate_triples(df)
    if os.path.exists(path) and not overwrite:
        raise FileExistsError(path)
    out = df.select(F.concat_ws(" ", "s", "p", "o", F.lit(".")).alias("value"))
    out.write.mode("overwrite" if overwrite else "errorifexists").text(path)


RDF_TYPE = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"


def filter_triples_by_subject_type(df: DataFrame, type_uri: str) -> DataFrame:
    """Keep triples whose subject has rdf:type == type_uri
    (reference filter_triples_by_s_type, rdf2.py:105-137 — an inner
    join + project there; the left_semi it denotes here)."""
    typed = df.filter((F.col("p") == RDF_TYPE) & (F.col("o") == type_uri)).select("s").distinct()
    return df.join(F.broadcast(typed), "s", "left_semi")


def keep_triples_with_object_subject(df: DataFrame) -> DataFrame:
    """Referential-integrity filter: keep literals, type-edges, and
    triples whose object occurs as some subject
    (reference rdf2.py:139-156)."""
    subjects = df.select(F.col("s").alias("o")).distinct()
    exempt = F.col("isLiteral") | (F.col("p") == RDF_TYPE)
    kept_refs = df.filter(~exempt).join(subjects, "o", "left_semi")
    return df.filter(exempt).unionByName(kept_refs)


def clean_rdf_types(df: DataFrame, allowed_types: list[str]) -> DataFrame:
    """Drop type-edges pointing outside the allowed vocabulary, keep
    everything else (reference clean_rdf_types, rdf2.py:159-170 —
    split/filter/union there; a single-pass predicate here)."""
    is_type = F.col("p") == RDF_TYPE
    return df.filter(~is_type | F.col("o").isin(*allowed_types))
