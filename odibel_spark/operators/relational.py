"""Relational operator family: semi/anti-join filters, predicate
builders, deterministic sampling, two-level aggregations.

Reference parity (SURVEY.md §2.2, §2.4-2.7):

- ``filter_by_key_type``          ↔ rDF2.filter_triples_by_s_type
  (rdf2.py:105-137) — written there as inner-join+project; here as the
  ``left_semi`` join it actually is.
- ``referential_integrity_filter``↔ rDF2.keep_triples_with_object_subject
  (rdf2.py:139-156): left join + keep matched-or-exempt rows.
- ``predicate_filter_expr``       ↔ rDF2._schema_graph_property_filter_expr
  (rdf2.py:79-91): OR-fold of exact / ``*``-prefix predicate filters.
- ``top_k_per_group``             ↔ rDF2 per-seed sampling
  (rdf2.py:370-380): row_number over partition, but ordered by a
  deterministic md5 ranking instead of ``F.rand(seed)`` so any engine
  (and the DuckDB oracle) reproduces the exact same sample.
- ``seeded_sample``               ↔ rDF2 orderBy(rand(seed)).limit(n)
  (rdf2.py:355,414), same md5 determinism substitution.
- ``degree_distribution``         ↔ EvalFunctions in/out-degree
  two-level aggregation (eval/EvalFunctions.scala:170-213).
- ``min_per_group_reagg``         ↔ InputEval pages-per-year
  (eval/InputEval.scala:72-77).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def filter_by_key_type(
    data: DataFrame, typed: DataFrame, key: str, type_col: str, wanted_type: str
) -> DataFrame:
    """Keep data rows whose key has the wanted type (semi-join filter).
    Broadcast hint on the key set: it is a filtered dimension."""
    keys = typed.filter(F.col(type_col) == wanted_type).select(key).distinct()
    return data.join(F.broadcast(keys), key, "left_semi")


def referential_integrity_filter(
    data: DataFrame,
    ref: DataFrame,
    fk: str,
    pk: str,
    exempt: F.Column | None = None,
) -> DataFrame:
    """Keep rows whose foreign key exists in ``ref`` OR that match the
    exempt predicate (reference: literals and type-edges are exempt)."""
    keys = ref.select(F.col(pk).alias(fk)).distinct()
    matched = data.join(keys, fk, "left_semi")
    if exempt is None:
        return matched
    return data.filter(exempt).unionByName(matched.filter(~exempt)).dropDuplicates()


def predicate_filter_expr(col: str, patterns: list[str]) -> F.Column:
    """OR-fold of exact / trailing-``*`` prefix matches."""
    expr = F.lit(False)
    for p in patterns:
        if p.endswith("*"):
            expr = expr | F.col(col).startswith(p[:-1])
        else:
            expr = expr | (F.col(col) == p)
    return expr


def _det_rank(seed: int, *cols: str) -> F.Column:
    """Deterministic pseudo-random ranking key reproducible in any SQL
    engine: md5 of the seed + column values."""
    return F.md5(F.concat_ws("\x1f", F.lit(str(seed)), *[F.col(c).cast("string") for c in cols]))


def top_k_per_group(
    df: DataFrame, group_cols: list[str], k: int, seed: int = 42, id_cols: list[str] | None = None
) -> DataFrame:
    """Deterministic k-per-group sample: row_number over a seeded md5
    ordering (one shuffle; at scale this is the standard top-k window
    that AQE handles per-partition before the exchange)."""
    ids = id_cols or [c for c in df.columns if c not in group_cols]
    w = Window.partitionBy(*group_cols).orderBy(_det_rank(seed, *ids))
    return df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def seeded_sample(df: DataFrame, n: int, seed: int = 42, id_cols: list[str] | None = None) -> DataFrame:
    """Deterministic global sample of n rows (orderBy md5 + limit)."""
    ids = id_cols or df.columns
    return df.orderBy(_det_rank(seed, *ids)).limit(n)


def degree_distribution(
    edges: DataFrame, node_col: str, bucket_col: str | None = None
) -> DataFrame:
    """Two-level aggregation: per-node degree, then distribution of
    degrees (optionally per bucket)."""
    g1 = [bucket_col] if bucket_col else []
    deg = edges.groupBy(*g1, node_col).agg(F.count("*").alias("degree"))
    return deg.groupBy(*g1, "degree").agg(F.count("*").alias("n_nodes"))


def min_per_group_reagg(
    df: DataFrame, entity_cols: list[str], value_col: str, bucket_fn
) -> DataFrame:
    """min-per-entity then re-aggregate counts per bucket (reference:
    first revision year per page → pages per year)."""
    firsts = df.groupBy(*entity_cols).agg(F.min(value_col).alias("first_value"))
    return firsts.groupBy(bucket_fn(F.col("first_value")).alias("bucket")).agg(
        F.count("*").alias("n")
    )
