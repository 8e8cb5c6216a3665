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
    whole-stage codegen — no Python worker, no Arrow hop.

    Whitespace handling matches pandas ``str.strip()`` exactly (ALL
    whitespace, not just spaces — ``F.trim`` strips only ``' '``), so
    both paths normalize ``'calc\\t'`` identically; test_pipeline
    asserts the equality including tab/newline padding."""
    cleaned = F.lower(F.regexp_replace(F.col(col), r"^\s+|\s+$", ""))
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
    """Unified schema across all WAL file generations.

    Local paths: driver-side pyarrow footer reads of EVERY file
    (overlapped on a thread pool — footers are a few KB each), so a
    schema that evolves *within* one directory is still unioned; no
    mergeSchema Spark job on every start/restart. Any footer carrying a
    type outside the WAL whitelist (decimal/list/struct/…) falls back
    to the distributed mergeSchema scan, which handles the full parquet
    type surface. Non-local paths always take the distributed scan."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    local_dirs = [d for d in wal_dirs if "://" not in d or d.startswith("file:")]
    if len(local_dirs) == len(wal_dirs):
        import pyarrow.parquet as pq

        paths: list[str] = []
        for root in (d.removeprefix("file:") for d in wal_dirs):
            for dirpath, _dirs, names in os.walk(root):
                _dirs.sort()  # deterministic generation order (v1 before v2)
                paths.extend(
                    os.path.join(dirpath, n) for n in sorted(names) if n.endswith(".parquet")
                )
        try:
            with ThreadPoolExecutor(max_workers=8) as ex:
                arrow_schemas = list(ex.map(pq.read_schema, paths))
            fields: dict[str, T.StructField] = {}
            for arrow in arrow_schemas:
                for f in _arrow_to_spark(arrow).fields:
                    fields.setdefault(f.name, f)
            if fields:
                return T.StructType(list(fields.values()))
        except TypeError:
            pass  # exotic column type → the distributed scan handles it
    df = (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(*wal_dirs)
    )
    return df.schema


def _arrow_to_spark(arrow_schema) -> T.StructType:
    """Minimal arrow→spark type mapping for WAL payload columns."""
    import pyarrow as pa

    out = []
    for f in arrow_schema:
        t = f.type
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            st = T.StringType()
        elif pa.types.is_int64(t):
            st = T.LongType()
        elif pa.types.is_int32(t):
            st = T.IntegerType()
        elif pa.types.is_float64(t):
            st = T.DoubleType()
        elif pa.types.is_float32(t):
            st = T.FloatType()
        elif pa.types.is_boolean(t):
            st = T.BooleanType()
        elif pa.types.is_timestamp(t):
            st = T.TimestampType()
        else:
            raise TypeError(f"unsupported WAL column type {t} for {f.name}")
        out.append(T.StructField(f.name, st, f.nullable))
    return T.StructType(out)


def diff_new_fields(
    current: T.StructType, incoming: T.StructType, ignore: tuple[str, ...] = ()
) -> list[T.StructField]:
    """Fields present in ``incoming`` but not in ``current`` (by name)."""
    have = set(current.fieldNames())
    return [f for f in incoming.fields if f.name not in have and f.name not in ignore]
