"""Deterministic, fully distributed WAL/binlog generator for multi-turn
conversation transcripts (FIXTURES.md §2).

Reference analog: the ordered revision feed ``PageRevision(pId, rId,
rTimestamp, ...)`` (reference
src/main/scala/ai/scads/odibel/datasets/wikitext/data/PageRevision.scala:8).
``conv_id`` plays the role of ``pId`` (entity key, Zipf-skewed hot
keys), ``lsn`` the role of the monotone revision id ``rId``.

Everything is derived from ``spark.range(n)`` with ``xxhash64`` column
expressions — no driver-side data, no RNG state — so the same config
generates the identical feed at any scale on any cluster, and
generation itself is embarrassingly parallel (this is what lets the
bench extrapolate toward the 10^10-event north-star without a
driver-side bottleneck).

Injected hazards (all seeded by the config):
- exact duplicates of ``(conv_id, turn_idx, lsn)``  → dedup test;
- bounded out-of-order delivery (both file order and event-time
  jitter)                                            → watermark test;
- deletes followed by re-inserts of the same key     → window
  close/reopen semantics (reference TemporalWindowBuilder.scala:20-50);
- corrupt events (op='corrupt', null payload) that must be
  dead-lettered, never treated as deletes (reference policy
  DBpediaTKGExtraction.scala:184-195);
- past ``evolve_after`` fraction of the LSN space, events carry new
  ``tool`` variants and a new ``meta`` field → schema-evolution test.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WORDS = [
    "the", "fast", "key", "order", "sort", "table", "scan", "merge",
    "part", "window", "small", "hash", "join", "spark", "group", "query",
    "row", "data", "slow", "filter", "customer", "line", "batch", "value",
    "agent", "tool", "call", "answer", "plan", "step", "result", "state",
]

ROLES = ["user", "assistant", "system", "tool"]
TOOLS_V1 = ["search", "calculator", "browser"]
TOOLS_V2 = TOOLS_V1 + ["code_interpreter", "retrieval"]


@dataclass(frozen=True)
class WalConfig:
    n_events: int = 100_000
    n_convs: int = 2_000
    max_turns: int = 40
    skew: float = 3.0          # conv = floor(n_convs * u^skew): >1 → hot head keys
    dup_rate: float = 0.02     # exact duplicate (conv,turn,lsn) rows
    delete_rate: float = 0.05
    corrupt_rate: float = 0.01
    ooo_window: int = 64       # max LSN displacement in physical order
    ts_jitter_s: int = 30      # event-time out-of-orderness (seconds)
    evolve_after: float = 0.6  # fraction of LSN space after which v2 schema appears
    seed: int = 42
    base_ts: str = "2025-01-01 00:00:00"
    extra: dict = field(default_factory=dict)

    @property
    def evolve_lsn(self) -> int:
        return int(self.n_events * self.evolve_after)


def _h(cfg: WalConfig, *cols) -> F.Column:
    """Deterministic 64-bit hash seeded by the config seed."""
    return F.xxhash64(F.lit(cfg.seed), *cols)


def _unit(cfg: WalConfig, tag: str, *cols) -> F.Column:
    """Deterministic uniform in [0,1) from the hash."""
    return (F.pmod(_h(cfg, F.lit(tag), *cols), F.lit(1_000_000_007)) / 1_000_000_007.0)


def gen_events(spark: SparkSession, cfg: WalConfig) -> DataFrame:
    """Build the WAL as a DataFrame of change events, in *physical feed
    order* (bounded-out-of-order by LSN). Schema:

    (lsn long, op string, conv_id string, turn_idx int, role string,
     text string, tool string, ts timestamp, meta string)
    """
    df = spark.range(cfg.n_events).withColumnRenamed("id", "lsn")

    # -- key: Zipf-ish conversation skew + per-conv turn count ---------
    conv_no = F.floor(F.lit(cfg.n_convs) * F.pow(_unit(cfg, "conv", F.col("lsn")), F.lit(cfg.skew)))
    df = df.withColumn("conv_no", conv_no)
    n_turns = (F.pmod(_h(cfg, F.lit("nturns"), F.col("conv_no")), F.lit(cfg.max_turns - 3)) + 4)
    df = df.withColumn(
        "turn_idx", F.pmod(_h(cfg, F.lit("turn"), F.col("lsn")), n_turns).cast("int")
    ).withColumn("conv_id", F.concat(F.lit("conv-"), F.col("conv_no").cast("string"))).drop("conv_no")

    # -- op mix --------------------------------------------------------
    u_op = _unit(cfg, "op", F.col("lsn"))
    df = df.withColumn(
        "op",
        F.when(u_op < cfg.corrupt_rate, F.lit("corrupt"))
        .when(u_op < cfg.corrupt_rate + cfg.delete_rate, F.lit("delete"))
        .when(u_op < cfg.corrupt_rate + cfg.delete_rate + 0.30, F.lit("insert"))
        .otherwise(F.lit("update")),
    )

    # -- payload: role / tool / text (all JVM-side expressions) --------
    roles = F.array(*[F.lit(r) for r in ROLES])
    df = df.withColumn(
        "role", F.element_at(roles, (F.pmod(_h(cfg, F.lit("role"), F.col("lsn")), F.lit(4)) + 1).cast("int"))
    )
    tools_v1 = F.array(*[F.lit(t) for t in TOOLS_V1])
    tools_v2 = F.array(*[F.lit(t) for t in TOOLS_V2])
    pool = F.when(F.col("lsn") >= cfg.evolve_lsn, tools_v2).otherwise(tools_v1)
    df = df.withColumn(
        "tool",
        F.when(
            F.col("role") == "tool",
            F.element_at(pool, (F.pmod(_h(cfg, F.lit("tool"), F.col("lsn")), F.size(pool)) + 1).cast("int")),
        ),
    )
    # deterministic pseudo-text: 8..31 words drawn by per-position hash
    n_words = (F.pmod(_h(cfg, F.lit("tlen"), F.col("lsn")), F.lit(24)) + 8).cast("int")
    words = F.array(*[F.lit(w) for w in WORDS])
    df = df.withColumn(
        "text",
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), n_words),
                lambda i: F.element_at(
                    words, (F.pmod(F.xxhash64(F.lit(cfg.seed), F.col("lsn"), i), F.lit(len(WORDS))) + 1).cast("int")
                ),
            ),
        ),
    )

    # -- event time: monotone in LSN +- bounded jitter ------------------
    jitter = F.pmod(_h(cfg, F.lit("ts"), F.col("lsn")), F.lit(2 * cfg.ts_jitter_s)) - cfg.ts_jitter_s
    df = df.withColumn(
        "ts", F.timestamp_seconds(F.unix_timestamp(F.lit(cfg.base_ts)) + F.col("lsn") + jitter)
    )

    # -- schema-evolution marker: new `meta` field after evolve_lsn ----
    df = df.withColumn(
        "meta",
        F.when(
            F.col("lsn") >= cfg.evolve_lsn,
            F.concat(F.lit('{"client":"v2","seq":'), F.col("lsn").cast("string"), F.lit("}")),
        ),
    )

    # -- corrupt events: poison payload, MUST NOT become deletes -------
    corrupt = F.col("op") == "corrupt"
    df = (
        df.withColumn("role", F.when(corrupt, F.lit(None).cast("string")).otherwise(F.col("role")))
        .withColumn("text", F.when(corrupt, F.lit(None).cast("string")).otherwise(F.col("text")))
        .withColumn("tool", F.when(corrupt, F.lit(None).cast("string")).otherwise(F.col("tool")))
    )
    # deletes carry no payload
    is_del = F.col("op") == "delete"
    for c in ("role", "text", "tool"):
        df = df.withColumn(c, F.when(is_del, F.lit(None).cast("string")).otherwise(F.col(c)))

    cols = ["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts", "meta"]
    df = df.select(*cols)

    # -- exact duplicates (same lsn!) -----------------------------------
    dups = df.filter(_unit(cfg, "dup", F.col("lsn")) < cfg.dup_rate)
    df = df.unionByName(dups)

    # -- bounded out-of-order physical feed order -----------------------
    disp = F.pmod(_h(cfg, F.lit("ooo"), F.col("lsn")), F.lit(2 * cfg.ooo_window)) - cfg.ooo_window
    df = df.withColumn("_feed_order", F.col("lsn") + disp)
    return df


def write_wal_files(
    spark: SparkSession,
    cfg: WalConfig,
    out_dir: str,
    n_files: int = 16,
    fmt: str = "parquet",
    v1_schema_before_marker: bool = True,
) -> str:
    """Materialize the WAL as an ordered sequence of files a streaming
    file source can tail (``wal_chunk=<k>`` range-partitioned by feed
    order, so replay order ≈ LSN order with bounded inversions).

    If ``v1_schema_before_marker``, files wholly before the evolution
    marker are written WITHOUT the ``meta`` column — the reader must
    handle the mid-stream schema upgrade.
    """
    df = gen_events(spark, cfg)
    chunk = F.least(
        F.lit(n_files - 1), F.floor(F.col("_feed_order") * n_files / F.lit(cfg.n_events))
    ).cast("int")
    df = df.withColumn("wal_chunk", F.greatest(F.lit(0), chunk))
    # One file per chunk — a WAL segment is a single append-ordered file.
    # Splitting a segment across part files breaks the tail's watermark
    # contract: a sliver holding the segment's max event time, processed
    # one micro-batch earlier, would mark the rest of the segment late.
    df = df.repartition(n_files, "wal_chunk").sortWithinPartitions("wal_chunk", "_feed_order")

    os.makedirs(out_dir, exist_ok=True)
    writer = lambda d: d.write.mode("overwrite")  # noqa: E731
    if v1_schema_before_marker:
        # generation membership follows the event's LSN (its producer
        # version), not the chunk: pre-marker events have meta ≡ NULL,
        # so dropping the column loses nothing
        pre = df.filter(F.col("lsn") < cfg.evolve_lsn).drop("meta")
        post = df.filter(F.col("lsn") >= cfg.evolve_lsn)
        getattr(
            writer(pre.drop("_feed_order")).partitionBy("wal_chunk"),
            fmt,
        )(os.path.join(out_dir, "v1"))
        getattr(
            writer(post.drop("_feed_order")).partitionBy("wal_chunk"),
            fmt,
        )(os.path.join(out_dir, "v2"))
    else:
        getattr(
            writer(df.drop("_feed_order")).partitionBy("wal_chunk"),
            fmt,
        )(out_dir)
    _stamp_feed_mtimes(out_dir, n_files)
    return out_dir


def _stamp_feed_mtimes(out_dir: str, n_files: int) -> None:
    """Give each WAL chunk a monotonically increasing mtime (10 s apart,
    v1 generation before v2). A real WAL tail produces files over time;
    Spark's file source orders its listing by mtime, so without this a
    bulk-written fixture replays in arbitrary file order — unbounded
    disorder no watermark can cover."""
    t0 = time.time() - (n_files + 2) * 10
    for dirpath, _dirs, names in os.walk(out_dir):
        base = os.path.basename(dirpath)
        if not base.startswith("wal_chunk="):
            continue
        chunk = int(base.split("=", 1)[1])
        gen_offset = 0.5 if f"{os.sep}v2{os.sep}" in dirpath + os.sep else 0.0
        t = t0 + (chunk + gen_offset) * 10
        for n in names:
            os.utime(os.path.join(dirpath, n), (t, t))
