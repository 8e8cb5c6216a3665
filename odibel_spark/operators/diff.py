"""Snapshot / set diff operators.

- ``snapshot_diff`` ↔ the reference's DataFrame-level CDC oracle
  ``calculateDiffDF`` (eval/SnapshotEval.scala:132-160): tag both
  sides, full-outer join on the composite key, classify each row as
  added (+1) / deleted (−1) / changed (0 with payload difference).
- ``set_diff``      ↔ DataDiff.diff (utils/DataDiff.scala:6-12) and
  the in-memory ``&~`` set anti-diff of the window builder
  (TemporalWindowBuilder.scala:25-26), distributed via left-anti.

Scale: one co-partitioned shuffle each; at 10^10 rows the full-outer
diff is the canonical reconciliation job and its cost is the two scans
plus one exchange — nothing per-row crosses to Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    current: DataFrame,
    previous: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Classify keys as added/deleted/changed/unchanged between two
    snapshots. Output: key cols + ``diff`` ∈ {1,-1,0} + ``changed``
    boolean (NULL-SAFE payload inequality for surviving keys: null ==
    null is unchanged, value↔null transitions are changed=True — a
    hypothesis property caught the earlier spelling leaking NULL
    instead of True for one-sided nulls, which a ``changed = true``
    consumer would silently miss)."""
    compare_cols = compare_cols or [c for c in current.columns if c not in key_cols]
    cur = current.select(*key_cols, *[F.col(c).alias(f"_c_{c}") for c in compare_cols]).withColumn(
        "_in_cur", F.lit(1)
    )
    prev = previous.select(*key_cols, *[F.col(c).alias(f"_p_{c}") for c in compare_cols]).withColumn(
        "_in_prev", F.lit(1)
    )
    j = cur.join(prev, key_cols, "full_outer")
    diff = (
        F.when(F.col("_in_prev").isNull(), F.lit(1))
        .when(F.col("_in_cur").isNull(), F.lit(-1))
        .otherwise(F.lit(0))
    )
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"_c_{c}").eqNullSafe(F.col(f"_p_{c}"))
    return j.select(
        *key_cols,
        diff.alias("diff"),
        F.when(diff == 0, changed).otherwise(F.lit(None)).alias("changed"),
    )


def set_diff(left: DataFrame, right: DataFrame, on: list[str]) -> tuple[DataFrame, DataFrame]:
    """(left − right, right − left) on the given key columns."""
    return (
        left.join(right.select(*on).distinct(), on, "left_anti"),
        right.join(left.select(*on).distinct(), on, "left_anti"),
    )
