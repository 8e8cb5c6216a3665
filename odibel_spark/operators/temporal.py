"""Temporal / CDC analytics operators — the reference's engine kernel
and eval battery re-expressed as declarative DataFrame plans.

Reference parity map (SURVEY.md §2.3, §2.5):

- ``build_temporal_windows``  ↔ TemporalWindowBuilder.addGraphVersion /
  closeWindow / buildEntries (TemporalWindowBuilder.scala:20-99). The
  reference replays a per-key iterator with an in-memory open-window
  map; in batch Spark the same contract is a ``lead() over (partition
  by key order by version)`` — one shuffle, no Python, no state.
- ``snapshot_at``             ↔ EvalFunctions.createSnapshot
  (eval/EvalFunctions.scala:66-84): boundary ``t_start <= t < t_end``
  (SnapshotEval uses ``<=`` on both ends — documented inconsistency;
  we standardize on the half-open EvalFunctions form).
- ``change_flux``             ↔ EvalFunctions.countChangesOverTime
  (eval/EvalFunctions.scala:129-151): union of (+1 at start, −1 at
  end) then grouped counts.
- ``changes_per_key``         ↔ PropertyEval change counts
  (eval/PropertyEval.scala:28-47).
- ``duration_histogram``      ↔ OutputEval window-duration histogram
  (eval/OutputEval.scala:85-97) with the open-window sentinel filter.
- ``time_bucketed_counts``    ↔ EvalFunctions.count*OverTime
  (eval/EvalFunctions.scala:106-126,296-350).
- ``value_distribution_stats``↔ EvalFunctions/PropertyEval percentile
  batteries (eval/EvalFunctions.scala:183-293).
- ``snapshot_statistics``     ↔ EvalFunctions.calculateSnapshotStatistics
  (eval/EvalFunctions.scala:353-408) — the reference runs ~8 separate
  ``.count()`` actions (SURVEY §4 anti-pattern); here it is ONE pass of
  conditional aggregates.

Scale notes: every operator is a single shuffle (window or groupBy) on
the key it declares; no collects, no UDFs, AQE handles skewed keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: open-window sentinel, reference TemporalWindowBuilder.scala:92
OPEN_END = 2**63 - 1


def build_temporal_windows(
    events: DataFrame,
    key_cols: list[str],
    version_col: str,
    ts_col: str,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Fold an ordered change feed into SCD-2 validity windows.

    Each event opens a window ``[v, next_v)`` / ``[ts, next_ts)`` on its
    key, closed by the key's next event; the latest event per key stays
    open (sentinel ``t_end = Long.MaxValue``, reference
    TemporalWindowBuilder.scala:89-99).

    Output: key cols + value cols + (v_start, v_end, t_start, t_end).
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(version_col))
    out = (
        events.withColumn("v_start", F.col(version_col).cast("long"))
        .withColumn("v_end", F.lead(version_col).over(w).cast("long"))
        .withColumn("t_start", F.col(ts_col).cast("long"))
        .withColumn("t_end", F.coalesce(F.lead(F.col(ts_col).cast("long")).over(w), F.lit(OPEN_END)))
    )
    keep = key_cols + (value_cols or []) + ["v_start", "v_end", "t_start", "t_end"]
    return out.select(*keep)


def snapshot_at(windows: DataFrame, t: int, t_start: str = "t_start", t_end: str = "t_end") -> DataFrame:
    """Temporal point query: rows valid at ``t`` (half-open interval)."""
    return windows.filter((F.col(t_start) <= F.lit(t)) & (F.lit(t) < F.col(t_end)))


def change_flux(
    windows: DataFrame, t_start: str = "t_start", t_end: str = "t_end", bucket_s: int = 3600
) -> DataFrame:
    """CDC event-rate metric: +1 at each window open, −1 at each close,
    bucketed counts. Output: (bucket long, n_open long, n_close long)."""
    opens = windows.select((F.floor(F.col(t_start) / bucket_s) * bucket_s).alias("bucket")).withColumn(
        "kind", F.lit(1)
    )
    closes = (
        windows.filter(F.col(t_end) != OPEN_END)
        .select((F.floor(F.col(t_end) / bucket_s) * bucket_s).alias("bucket"))
        .withColumn("kind", F.lit(-1))
    )
    return (
        opens.unionByName(closes)
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("kind") == 1, 1).otherwise(0)).alias("n_open"),
            F.sum(F.when(F.col("kind") == -1, 1).otherwise(0)).alias("n_close"),
        )
    )


def changes_per_key(windows: DataFrame, key_cols: list[str]) -> DataFrame:
    """Distinct version windows per key minus one = number of changes
    (reference eval/PropertyEval.scala:28-47)."""
    return windows.groupBy(*key_cols).agg(
        (F.countDistinct("v_start", "t_start") - 1).alias("n_changes")
    )


def duration_histogram(
    windows: DataFrame, t_start: str = "t_start", t_end: str = "t_end", unit_s: int = 3600
) -> DataFrame:
    """Closed-window duration histogram (open sentinel excluded,
    reference eval/OutputEval.scala:85-97)."""
    return (
        windows.filter(F.col(t_end) != OPEN_END)
        .withColumn("duration_units", F.floor((F.col(t_end) - F.col(t_start)) / unit_s))
        .groupBy("duration_units")
        .agg(F.count("*").alias("n_windows"))
    )


def time_bucketed_counts(df: DataFrame, ts_col: str, granularity: str = "day") -> DataFrame:
    """Counts per calendar bucket (reference EvalFunctions.scala:106-126
    year/month/day/hour variants via date_format)."""
    fmt = {"year": "yyyy", "month": "yyyy-MM", "day": "yyyy-MM-dd", "hour": "yyyy-MM-dd HH"}[granularity]
    return (
        df.withColumn("bucket", F.date_format(F.col(ts_col), fmt))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


def value_distribution_stats(df: DataFrame, group_cols: list[str], value_col: str) -> DataFrame:
    """Per-group distribution battery: avg/stddev/min/max + exact
    quartiles (reference uses percentile_approx,
    eval/EvalFunctions.scala:183-293; exact percentile here so the
    DuckDB oracle can reproduce values bit-for-bit — swap to
    ``percentile_approx`` at 10^10 scale where exact sort-based
    percentile would be the bottleneck)."""
    return df.groupBy(*group_cols).agg(
        F.count("*").alias("n"),
        F.round(F.avg(value_col), 6).alias("avg_v"),
        F.round(F.stddev_samp(value_col), 6).alias("stddev_v"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
        F.round(F.expr(f"percentile({value_col}, 0.25)"), 6).alias("p25"),
        F.round(F.expr(f"percentile({value_col}, 0.5)"), 6).alias("p50"),
        F.round(F.expr(f"percentile({value_col}, 0.75)"), 6).alias("p75"),
    )


def snapshot_statistics(windows: DataFrame, t_first: int, t_last: int) -> DataFrame:
    """Scalar battery over a window table in ONE aggregation pass —
    the reference computes these with ~8 driver-side ``.count()``
    actions per granularity (eval/EvalFunctions.scala:353-408); a
    single ``agg(sum(when(...)))`` sweep reads the data once."""
    first_live = (F.col("t_start") <= t_first) & (F.lit(t_first) < F.col("t_end"))
    last_live = (F.col("t_start") <= t_last) & (F.lit(t_last) < F.col("t_end"))
    return windows.agg(
        F.count("*").alias("n_windows"),
        F.sum(F.when(first_live, 1).otherwise(0)).alias("first_size"),
        F.sum(F.when(last_live, 1).otherwise(0)).alias("last_size"),
        F.sum(F.when(first_live & last_live, 1).otherwise(0)).alias("static_core"),
        F.sum(F.when(F.col("t_start") > t_first, 1).otherwise(0)).alias("n_added"),
        F.sum(F.when(F.col("t_end") != OPEN_END, 1).otherwise(0)).alias("n_closed"),
    )
