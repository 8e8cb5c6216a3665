"""Schema-evolution support: payload normalization via Arrow-typed
pandas UDFs (never per-row Python — north-rule constraint; reference
parity note SURVEY.md §2.11: the reference's hot path is 100% built-in
column expressions, its only escape hatch being vectorized batches).

Two jobs:

1. ``discover_wal_schema`` — unify the schema across WAL file
   generations (files written before the evolution marker lack new
   columns).
2. ``normalize_batch`` — promote legacy payload variants to the
   canonical vocabulary. Tool/role renames arrive as data (new
   variants mid-stream); normalization is a vectorized pandas map,
   Arrow-batched, applied inside the micro-batch before MERGE.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical tool vocabulary + legacy aliases observed in older feeds
TOOL_ALIASES = {
    "calc": "calculator",
    "websearch": "search",
    "web_search": "search",
    "browse": "browser",
    "python": "code_interpreter",
    "code-interpreter": "code_interpreter",
    "rag": "retrieval",
}

ROLE_ALIASES = {
    "human": "user",
    "ai": "assistant",
    "bot": "assistant",
    "function": "tool",
}


def _alias_normalizer(aliases: dict[str, str]):
    @F.pandas_udf(T.StringType())
    def norm(s: pd.Series) -> pd.Series:
        cleaned = s.str.strip().str.lower()
        return cleaned.map(lambda v: aliases.get(v, v), na_action="ignore")

    return norm


#: Arrow-typed pandas normalizers — the escape hatch for promotions a
#: Column expression can't express (regex-bank cleanup, model-specific
#: remaps shipped as Python). Vectorized per Arrow batch, never per-row.
normalize_tool = _alias_normalizer(TOOL_ALIASES)
normalize_role = _alias_normalizer(ROLE_ALIASES)


def _alias_expr(col: str, aliases: dict[str, str]) -> F.Column:
    """Same promotion as the pandas normalizer, as a pure Column
    expression: map-literal lookup with identity fallback. Stays inside
    whole-stage codegen — no Python worker, no Arrow hop."""
    cleaned = F.lower(F.trim(F.col(col)))
    amap = F.create_map(*[F.lit(x) for kv in aliases.items() for x in kv])
    return F.coalesce(F.element_at(amap, cleaned), cleaned)


def normalize_batch(df: DataFrame, use_pandas: bool = False) -> DataFrame:
    """Vectorized payload promotion applied per micro-batch.

    Default is the codegen expression path; ``use_pandas=True`` routes
    through the Arrow-typed pandas UDFs instead (identical semantics —
    test_pipeline asserts equality) for promotions that outgrow a map
    literal.
    """
    out = df
    if "tool" in df.columns:
        out = out.withColumn(
            "tool", normalize_tool("tool") if use_pandas else _alias_expr("tool", TOOL_ALIASES)
        )
    if "role" in df.columns:
        out = out.withColumn(
            "role", normalize_role("role") if use_pandas else _alias_expr("role", ROLE_ALIASES)
        )
    return out


def discover_wal_schema(spark: SparkSession, wal_dirs: list[str]) -> T.StructType:
    """Unified schema across all WAL file generations (mergeSchema scan
    of footers only — no data read)."""
    df = spark.read.option("mergeSchema", "true").option("recursiveFileLookup", "true").parquet(*wal_dirs)
    return df.schema


def diff_new_fields(
    current: T.StructType, incoming: T.StructType, ignore: tuple[str, ...] = ()
) -> list[T.StructField]:
    """Fields present in ``incoming`` but not in ``current`` (by name)."""
    have = set(current.fieldNames())
    return [f for f in incoming.fields if f.name not in have and f.name not in ignore]
