"""Watermarked windowed aggregation over the change feed.

Reference analog: the eval battery's time-bucketed counts
(eval/EvalFunctions.scala:106-126) are batch GROUP BYs over
`date_format`; on a live feed the same rollup is a watermarked
event-time window so state for closed windows is dropped instead of
accumulating forever. This is the streaming twin of
``operators.temporal.time_bucketed_counts`` — the throughput metric a
CDC operator watches (reference ThroughputMonitor semantics,
utils/ThrougputMonitor.scala:5-23) computed *inside* the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "1 minute",
    watermark_delay: str = "5 minutes",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Events per (window, group) with late-data handling.

    Works on both streaming and batch DataFrames (watermark is a no-op
    in batch — the batch result IS the late-data-complete oracle the
    streaming run must converge to; tests exploit that equivalence).

    State bound: closed windows (older than watermark) are evicted, so
    state size is O(groups × open windows) regardless of feed length —
    the property that lets this run forever at 10^10 events/day.
    """
    groups = group_cols or []
    src = stream
    if stream.isStreaming:
        src = stream.withWatermark(ts_col, watermark_delay)
    return (
        src.groupBy(F.window(F.col(ts_col), window_duration).alias("win"), *groups)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *groups,
            "n_events",
        )
    )
