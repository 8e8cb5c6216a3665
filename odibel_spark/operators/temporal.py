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


def interval_marks(
    windows: DataFrame,
    start_col: str = "t_start",
    end_col: str = "t_end",
    step_s: int = 86400,
    clamp_end: int | None = None,
) -> DataFrame:
    """Explode each validity interval into aligned time marks — the
    reference's CronUtil yearly-mark expansion feeding snapshot loops
    (utils/CronUtil.scala:42-76 via EvalFunctions.datesByColumn,
    eval/EvalFunctions.scala:410-422), generalized to any step.

    Marks are global-grid aligned (multiples of ``step_s``), half-open:
    a window [s, e) yields every mark m = k*step_s with s <= m < e.
    Open windows (sentinel end) are clamped to ``clamp_end`` (required
    if any open window exists — unbounded explode otherwise).

    Scale: pure codegen (`sequence` + `explode`), no shuffle; output
    rows = total covered steps, so callers aggregate immediately after
    (e.g. marks → groupBy(mark).count() = live-set size over time).
    """
    end = F.col(end_col)
    if clamp_end is not None:
        end = F.least(end, F.lit(clamp_end))
    first_mark = (F.ceil(F.col(start_col) / F.lit(step_s)) * step_s).cast("long")
    # half-open end: last mark strictly below end
    last_mark = (F.ceil(end / F.lit(step_s)) * step_s - step_s).cast("long")
    return (
        windows.withColumn("_m0", first_mark)
        .withColumn("_m1", last_mark)
        .filter(F.col("_m0") <= F.col("_m1"))
        .withColumn("mark", F.explode(F.sequence("_m0", "_m1", F.lit(step_s))))
        .drop("_m0", "_m1")
    )


def as_of_join(
    queries: DataFrame,
    states: DataFrame,
    key_cols: list[str],
    query_ts: str,
    state_ts: str,
    value_cols: list[str],
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """For each query row, attach the latest state row of the same key
    with ``state_ts <= query_ts`` (NULL values if none) — the temporal
    point lookup the reference expresses as a snapshot filter
    (eval/EvalFunctions.scala:66-84) generalized to per-row timestamps.

    Plan: union both sides tagged, ONE window sort per key ordered by
    (ts, is_query) with ``last(value, ignoreNulls)`` carrying state
    forward — a single shuffle on the key, no range-join explosion.
    State rows at exactly the query timestamp count as visible
    (``<=``), hence states sort before queries on ties.
    """
    carry = carry_cols or []
    state_struct = F.struct(*[F.col(c) for c in value_cols])
    null_struct = F.lit(None).cast(
        "struct<" + ",".join(f"{c}:{states.schema[c].dataType.simpleString()}" for c in value_cols) + ">"
    )
    q = queries.select(
        *key_cols,
        F.col(query_ts).alias("_ts"),
        F.lit(1).alias("_is_q"),
        null_struct.alias("_v"),
        *[F.col(c) for c in carry],
    )
    s = states.select(
        *key_cols,
        F.col(state_ts).alias("_ts"),
        F.lit(0).alias("_is_q"),
        state_struct.alias("_v"),
        *[F.lit(None).cast(queries.schema[c].dataType).alias(c) for c in carry],
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("_ts", "_is_q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the whole state row travels as ONE struct, so all value columns
    # come from the same (latest visible) state row
    carried = s.unionByName(q).withColumn("_sv", F.last("_v", ignorenulls=True).over(w))
    return carried.filter(F.col("_is_q") == 1).select(
        *key_cols,
        F.col("_ts").alias(query_ts),
        *[F.col(c) for c in carry],
        *[F.col(f"_sv.{c}").alias(c) for c in value_cols],
    )
