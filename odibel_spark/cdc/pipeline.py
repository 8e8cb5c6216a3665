"""Structured Streaming CDC pipeline: WAL file tail → watermarked dedup
→ epoch-fenced MERGE into a LakeTable, with dead-letter routing,
per-partition lineage and throughput metrics.

North-rule mechanics and where they live:

- **tail a WAL-style change feed**  → ``readStream`` file source over
  the WAL directory (ordered chunk files; a Kafka source would slot in
  unchanged — foreachBatch sees the same micro-batch DataFrame).
- **dedupe by (conv_id, turn_idx, lsn) with watermarked state** →
  ``withWatermark("ts") .dropDuplicatesWithinWatermark`` on the stream
  (bounded keyed state) plus the exact fold inside MERGE (belt and
  braces: the in-stream dedup bounds state, the in-merge fold is the
  correctness guarantee).
- **exactly-once commits** → epoch fencing: the micro-batch id is
  stamped into the lake commit's ``watermarks`` map atomically with
  the data; a replayed batch (crash after commit, before checkpoint)
  sees ``epoch <= watermark`` and is skipped. Reference gap this
  fixes: blind ``overwrite`` sink (DBpediaTKGExtractionSpark.scala:44).
- **resumable lineage** → per-epoch, per-bucket applied-LSN high-water
  marks appended to a lineage LakeTable; throughput metrics rows per
  batch (reference ThroughputMonitor/HeartbeatMonitor semantics,
  utils/ThrougputMonitor.scala:5-23, log/HeartbeatMonitor.scala:11-71).
- **failures never become deletes** → corrupt events split to a
  dead-letter LakeTable before MERGE
  (DBpediaTKGExtraction.scala:174-195 policy).
- **schema evolution** → unified WAL schema discovered from file
  footers; new payload columns promoted with ``table.add_columns``;
  legacy enum variants normalized by Arrow-typed pandas UDFs
  (cdc/evolution.py).
- **skew** → MERGE repartitions by bucket of ``conv_id``; hot keys are
  bounded by bucket granularity and AQE skew handling; the LWW fold is
  a window over (conv_id, turn_idx) whose cardinality, not row skew,
  drives partition sizes.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from odibel_spark.cdc.evolution import diff_new_fields, discover_wal_schema, normalize_batch
from odibel_spark.cdc.replay import EVENT_ID_COLS, KEY_COLS, split_dead_letters
from odibel_spark.lake.merge import SYSTEM_FIELDS, merge_upsert
from odibel_spark.lake.table import BucketSpec, LakeTable

#: WAL bookkeeping columns that never become table payload
WAL_META_COLS = ("lsn", "op", "wal_chunk")

#: write_salt="auto" floor: the hottest touched bucket must hold at
#: least this many rows in the batch before salting engages — below
#: it a "hot" bucket is just a small batch, and splitting it only
#: multiplies delta files (MoR read amplification) with no straggler
#: relief.
_MIN_SALT_HOT = 1024

#: guards the session-conf swap window in ``_start_stream`` (set
#: state-store confs → start() → restore): two pipelines starting
#: concurrently from different threads must not interleave their
#: set/restore, or the second could capture (or restore over) the
#: first's overrides
_CONF_SWAP_LOCK = threading.Lock()

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("stream_id", T.StringType(), False),
        T.StructField("epoch", T.LongType(), False),
        T.StructField("bucket", T.IntegerType(), True),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("min_lsn", T.LongType(), True),
        T.StructField("max_lsn", T.LongType(), True),
        T.StructField("committed_at", T.TimestampType(), True),
    ]
)

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("stream_id", T.StringType(), False),
        T.StructField("epoch", T.LongType(), False),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("n_dead", T.LongType(), True),
        T.StructField("batch_seconds", T.DoubleType(), True),
        T.StructField("events_per_sec", T.DoubleType(), True),
        T.StructField("committed_at", T.TimestampType(), True),
    ]
)


@dataclass
class PipelineConfig:
    wal_dirs: list[str]
    table_root: str
    checkpoint_dir: str
    stream_id: str = "wal"
    buckets: int = 16
    #: must exceed the feed's worst-case event-time disorder (WalConfig:
    #: 2*ts_jitter_s + ooo_window = 124 s) with margin
    watermark_delay: str = "300 seconds"
    max_files_per_trigger: int | None = None
    dedup_in_stream: bool = True
    #: fault injection for crash tests: raise after the lake commit of
    #: this epoch (exactly-once must survive it)
    fail_after_commit_epoch: int | None = None
    #: LSN slack for riding tombstone GC: tombstones older than
    #: (stream max-applied LSN − slack) can no longer be contradicted
    #: by any in-flight out-of-order event, so the merge drops them
    #: for free. None = keep tombstones forever.
    tombstone_gc_lsn_slack: int | None = 100_000
    #: "cow" rewrites touched buckets per batch (read-optimized);
    #: "mor" appends folded delta files per batch — O(batch) commits
    #: with read-time fold + periodic compaction (write-optimized)
    merge_mode: str = "cow"
    #: mor only: fold delta files back into one row per key every N
    #: epochs (bounds read amplification); None = manual compaction
    compact_every_epochs: int | None = 8
    #: mor only: columns the periodic compaction additionally sorts
    #: each rewritten bucket file on (compaction doubling as OPTIMIZE —
    #: the rewrite shuffle is already paid, and the sort tightens the
    #: parquet row-group statistics pushed-down range filters prune at
    #: scan time; ("_lsn",) makes "recent changes for this conv" probes
    #: near-O(result)). () = fold order only.
    compact_cluster_by: tuple[str, ...] = ()
    #: >1 splits each bucket's commit write across this many tasks
    #: (deterministic row-hash salt) — hot-conversation skew insurance:
    #: one dominant conv_id otherwise serializes the commit behind a
    #: single straggler task. The default "auto" derives the salt per
    #: micro-batch from the per-bucket stats the sink already collects:
    #: 1 (no extra files) while the batch is balanced, and splits the
    #: hot bucket to ~2x-mean task sizes (capped at 8) when one bucket
    #: exceeds 4x the mean — so hot-key storms pay no straggler and
    #: quiet streams pay no read amplification.
    write_salt: int | str = "auto"
    #: state-store backend for the in-stream watermarked dedup:
    #: "hdfs" (Spark's default HDFSBackedStateStoreProvider — keyed
    #: state lives in executor HEAP, snapshotted to the checkpoint;
    #: right while dedup state within the watermark fits in memory) or
    #: "rocksdb" (RocksDBStateStoreProvider + changelog checkpointing —
    #: state spills to executor-local disk and checkpoint commits ship
    #: only the per-batch changelog, the posture for 10^10-event feeds
    #: where (conv_id, turn_idx, lsn) dedup state outgrows heap).
    #: Only the provider CLASS is captured in the checkpoint's offset
    #: metadata at first start — a resumed stream keeps its RocksDB
    #: backend even under a heap-default session, but changelog
    #: checkpointing is an ordinary session conf that is NOT pinned:
    #: resume with state_store="rocksdb" (not the default) or the
    #: resumed store silently reverts to full-snapshot uploads and
    #: loses the O(batch) commit cost.
    state_store: str = "hdfs"
    extra: dict = field(default_factory=dict)


class TranscriptCdcPipeline:
    """One CDC stream → one transcript LakeTable (+ side tables)."""

    def __init__(self, spark: SparkSession, cfg: PipelineConfig):
        self.spark = spark
        self.cfg = cfg
        self.table_root = cfg.table_root
        self.dead_root = cfg.table_root + "_deadletter"
        self.lineage_root = cfg.table_root + "_lineage"
        self.metrics_root = cfg.table_root + "_metrics"

    # ------------------------------------------------------ DDL/bootstrap
    def _payload_fields(self, wal_schema: T.StructType) -> list[T.StructField]:
        return [f for f in wal_schema.fields if f.name not in WAL_META_COLS]

    def ensure_tables(self) -> tuple[LakeTable, T.StructType]:
        """Create/evolve the target + side tables from the current
        unified WAL schema. Returns (table, wal_read_schema)."""
        wal_schema = discover_wal_schema(self.spark, self.cfg.wal_dirs)
        payload = self._payload_fields(wal_schema)
        if not LakeTable.exists(self.spark, self.table_root):
            from odibel_spark.lake.merge import create_cdc_table

            create_cdc_table(
                self.spark,
                self.table_root,
                payload,
                BucketSpec("conv_id", self.cfg.buckets),
                key_cols=KEY_COLS,
                merge_mode=self.cfg.merge_mode,
            )
        table = LakeTable.load(self.spark, self.table_root)
        new = diff_new_fields(table.schema(), wal_schema, ignore=(*WAL_META_COLS, *SYSTEM_FIELDS))
        if new:
            table.add_columns(new, summary={"source": "wal-schema-discovery"})
        if not LakeTable.exists(self.spark, self.dead_root):
            LakeTable.create(self.spark, self.dead_root, wal_schema)
        else:
            d = LakeTable.load(self.spark, self.dead_root)
            dn = diff_new_fields(d.schema(), wal_schema)
            if dn:
                d.add_columns(dn)
        if not LakeTable.exists(self.spark, self.lineage_root):
            LakeTable.create(self.spark, self.lineage_root, LINEAGE_SCHEMA)
        if not LakeTable.exists(self.spark, self.metrics_root):
            LakeTable.create(self.spark, self.metrics_root, METRICS_SCHEMA)
        return table, wal_schema

    # --------------------------------------------------------- the sink
    def _apply_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        t0 = time.time()
        table = LakeTable.load(self.spark, self.table_root)
        if epoch_id <= table.watermark(self.cfg.stream_id):
            # crash happened after lake commit, before checkpoint commit:
            # the batch replays — skip it (exactly-once fence), but make
            # sure its side-table rows exist (they commit after the data).
            # Drain the batch through the noop sink: Spark 4 validates
            # that foreachBatch consumed every partition (the upstream
            # dedup state stores must commit).
            batch_df.write.format("noop").mode("overwrite").save()
            self._ensure_side_rows(epoch_id)
            return

        from odibel_spark.cdc.replay import dead_letter_predicate

        spec = table.bucket_spec()
        # One materialization of the micro-batch (pins the stream-dedup
        # output — every derived job below reuses the cache instead of
        # re-executing the source scan + state-store plan), and ONE
        # stats pass yielding dead-letter counts, per-bucket lineage,
        # and the touched-bucket set for merge pruning.
        flagged = (
            normalize_batch(batch_df)
            .withColumn("_dead", dead_letter_predicate())
            .withColumn("_b", spec.expr())
            .cache()
        )
        try:
            stats = (
                flagged.groupBy("_dead", "_b")
                .agg(
                    F.count("*").alias("n"),
                    F.min("lsn").alias("min_lsn"),
                    F.max("lsn").alias("max_lsn"),
                )
                .collect()
            )
            n_ok = sum(r["n"] for r in stats if not r["_dead"])
            n_dead = sum(r["n"] for r in stats if r["_dead"])
            touched = {r["_b"] for r in stats if not r["_dead"]}
            lineage_rows = [
                {"bucket": r["_b"], "n_events": r["n"], "min_lsn": r["min_lsn"], "max_lsn": r["max_lsn"]}
                for r in stats
                if not r["_dead"]
            ]

            if n_dead:
                dl = LakeTable.load(self.spark, self.dead_root)
                dead = flagged.filter(F.col("_dead")).drop("_dead", "_b")
                out = dead.select(
                    *[
                        (F.col(f.name) if f.name in dead.columns else F.lit(None).cast(f.dataType)).alias(f.name)
                        for f in dl.schema().fields
                    ]
                )
                # dead letters are a trickle — one output file keeps the
                # commit (and its footer bookkeeping) off the batch's
                # critical path
                dl.append(out.coalesce(1), summary={"stream_id": self.cfg.stream_id, "epoch": epoch_id})

            gc_below = None
            if self.cfg.tombstone_gc_lsn_slack is not None and lineage_rows:
                hwm = max(r["max_lsn"] for r in lineage_rows)
                gc_below = max(hwm - self.cfg.tombstone_gc_lsn_slack, 0)
            write_salt = self.cfg.write_salt
            if write_salt == "auto":
                # skew-adaptive: the stats pass already knows per-bucket
                # sizes — split only when one bucket dominates (>= 4x
                # the mean over TOUCHED buckets), to ~2x-mean task
                # sizes, capped at 8. The mean excludes untouched
                # buckets so a small batch that happens to land in few
                # buckets isn't mistaken for skew, and an absolute
                # floor (_MIN_SALT_HOT) keeps tiny batches unsalted —
                # splitting a few-thousand-row task is pure delta-file
                # overhead with no straggler to fix.
                write_salt = 1
                ok_counts = [r["n"] for r in stats if not r["_dead"] and r["n"]]
                if ok_counts and n_ok:
                    mean = n_ok / len(ok_counts)
                    hot = max(ok_counts)
                    if mean > 0 and hot >= 4 * mean and hot >= _MIN_SALT_HOT:
                        write_salt = min(8, max(2, round(hot / (2 * mean))))
            merge_upsert(
                table,
                flagged.filter(~F.col("_dead")).drop("_dead", "_b"),
                KEY_COLS,
                summary={"stream_id": self.cfg.stream_id, "epoch": epoch_id, "n_events": n_ok},
                watermarks_update={self.cfg.stream_id: epoch_id},
                touched_buckets=touched,
                tombstone_gc_below_lsn=gc_below,
                write_salt=write_salt,
            )
            if (
                self.cfg.merge_mode == "mor"
                and self.cfg.compact_every_epochs
                and epoch_id > 0
                and epoch_id % self.cfg.compact_every_epochs == 0
            ):
                from odibel_spark.lake.merge import compact_buckets

                compact_buckets(
                    table,
                    tombstone_gc_below_lsn=gc_below,
                    summary={"stream_id": self.cfg.stream_id, "after_epoch": epoch_id},
                    cluster_by=self.cfg.compact_cluster_by,
                )
            if self.cfg.fail_after_commit_epoch == epoch_id:
                raise RuntimeError(f"fault-injection: crash after commit of epoch {epoch_id}")

            self._append_side_rows(epoch_id, lineage_rows, n_ok, n_dead, time.time() - t0)
        finally:
            flagged.unpersist()

    def _append_side_rows(self, epoch_id, lineage_rows, n_ok, n_dead, secs) -> None:
        # driver-side pyarrow appends: per-batch bookkeeping is a few
        # rows — a distributed write job here would be pure scheduling
        # overhead at every micro-batch
        import datetime as _dt

        now = _dt.datetime.now(_dt.timezone.utc)
        lin = LakeTable.load(self.spark, self.lineage_root)
        rows = [
            {
                "stream_id": self.cfg.stream_id,
                "epoch": epoch_id,
                "bucket": r["bucket"],
                "n_events": r["n_events"],
                "min_lsn": r["min_lsn"],
                "max_lsn": r["max_lsn"],
                "committed_at": now,
            }
            for r in lineage_rows
        ] or [
            {
                "stream_id": self.cfg.stream_id,
                "epoch": epoch_id,
                "bucket": None,
                "n_events": 0,
                "min_lsn": None,
                "max_lsn": None,
                "committed_at": now,
            }
        ]
        lin.append_rows(rows, summary={"epoch": epoch_id})
        met = LakeTable.load(self.spark, self.metrics_root)
        met.append_rows(
            [
                {
                    "stream_id": self.cfg.stream_id,
                    "epoch": epoch_id,
                    "n_events": n_ok,
                    "n_dead": n_dead,
                    "batch_seconds": secs,
                    "events_per_sec": (n_ok / secs) if secs > 0 else None,
                    "committed_at": now,
                }
            ],
            summary={"epoch": epoch_id},
        )

    def _ensure_side_rows(self, epoch_id: int) -> None:
        """Idempotent catch-up when a batch replay was fenced: if the
        crash hit between lake commit and side-table append, re-derive
        the lineage for that epoch from the commit summary."""
        lin = LakeTable.load(self.spark, self.lineage_root)
        present = (
            lin.read()
            .filter((F.col("stream_id") == self.cfg.stream_id) & (F.col("epoch") == epoch_id))
            .limit(1)
            .count()
        )
        if present:
            return
        # find the fenced commit's summary for row counts
        table = LakeTable.load(self.spark, self.table_root)
        n_ok = 0
        for man in reversed(table.history()):
            s = man.get("summary", {})
            if s.get("stream_id") == self.cfg.stream_id and s.get("epoch") == epoch_id:
                n_ok = s.get("n_events", 0)
                break
        self._append_side_rows(epoch_id, [], n_ok, 0, 0.0)

    # ---------------------------------------------------------- running
    def _stream_reader(self, wal_schema: T.StructType) -> DataFrame:
        reader = (
            self.spark.readStream.schema(wal_schema)
            .option("recursiveFileLookup", "true")
        )
        if self.cfg.max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", self.cfg.max_files_per_trigger)
        if len(self.cfg.wal_dirs) != 1:
            # file source takes one path; for multi-generation WALs pass
            # the parent dir (recursive lookup covers v1/v2 subtrees)
            raise ValueError("file-stream WAL supports a single (recursive) directory; pass the parent dir")
        stream = reader.parquet(self.cfg.wal_dirs[0])
        if self.cfg.dedup_in_stream:
            stream = stream.withWatermark("ts", self.cfg.watermark_delay).dropDuplicatesWithinWatermark(
                EVENT_ID_COLS
            )
        return stream

    def _state_store_conf(self):
        """Session confs for cfg.state_store, applied around query
        start: a streaming query captures SQLConf at start, and pins
        the provider CLASS (only — not the changelog-checkpointing
        flag, see PipelineConfig.state_store) into its checkpoint
        offset metadata. The session values are restored right after
        start; see ``_start_stream`` for the concurrency window that
        set/restore dance implies."""
        if self.cfg.state_store == "hdfs":
            return {}
        if self.cfg.state_store != "rocksdb":
            raise ValueError(f"state_store must be 'hdfs' or 'rocksdb', got {self.cfg.state_store!r}")
        return {
            "spark.sql.streaming.stateStore.providerClass":
                "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
            # commit = per-batch changelog upload, snapshot uploads
            # amortized in the background — O(batch) checkpoint cost
            # instead of O(state) per epoch
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
        }

    def _start_stream(self, trigger_available_now: bool):
        """Start the stream with the state-store confs swapped in for
        the duration of ``start()`` only. The swap window is guarded by
        a process-wide lock so two pipelines starting from different
        threads can't interleave their set/restore — but a query
        started by UNRELATED code in the same session during the
        window would still capture the override (session confs are
        session-global; there is no narrower scope for the provider
        conf). Restore note: ``conf.get(k, None)`` returns the
        REGISTERED DEFAULT for keys that have one (providerClass
        does), so restore re-sets that default explicitly rather than
        unsetting — same effective value, and the unset branch only
        fires for keys with no registered default."""
        table, wal_schema = self.ensure_tables()
        stream = self._stream_reader(wal_schema)
        writer = stream.writeStream.foreachBatch(self._apply_batch).option(
            "checkpointLocation", self.cfg.checkpoint_dir
        )
        if trigger_available_now:
            writer = writer.trigger(availableNow=True)
        overrides = self._state_store_conf()
        with _CONF_SWAP_LOCK:
            saved = {}
            for k, v in overrides.items():
                saved[k] = self.spark.conf.get(k, None)
                self.spark.conf.set(k, v)
            try:
                return writer.start()
            finally:
                for k, old in saved.items():
                    if old is None:
                        self.spark.conf.unset(k)
                    else:
                        self.spark.conf.set(k, old)

    def run_available(self) -> None:
        """Process everything currently in the WAL, then stop
        (Trigger.AvailableNow) — the batch-replay entry point used by
        tests and the bench; identical code path to continuous runs."""
        self._start_stream(trigger_available_now=True).awaitTermination()

    def start(self):
        """Continuous tail (micro-batches as WAL files appear)."""
        return self._start_stream(trigger_available_now=False)

    # ------------------------------------------------------- maintenance
    def maintenance(
        self,
        keep_versions: int = 2,
        compact: bool = True,
        vacuum_grace_seconds: float = 600.0,
    ) -> dict:
        """Off-critical-path housekeeping: MoR compaction folding delta
        files to one row per key, then vacuum of unreferenced data
        files (crash orphans + copy-on-write leftovers) beyond
        ``keep_versions`` snapshots.

        Safe to run from a separate process while the stream drains:
        compaction pins the snapshot it folded and ABORTS with
        CommitConflict if a merge lands in the meantime (never dropping
        the merge's rows — it retries from the fresh snapshot a few
        times first), and vacuum skips uncommitted commit dirs plus a
        mtime grace window so an in-flight writer's files survive."""
        table = LakeTable.load(self.spark, self.table_root)
        out: dict = {}
        if compact and table.properties().get("merge_mode") == "mor":
            from odibel_spark.lake.merge import compact_buckets

            gc_below = None
            if self.cfg.tombstone_gc_lsn_slack is not None:
                lin = self.lineage().agg(F.max("max_lsn")).collect()[0][0]
                if lin is not None:
                    gc_below = max(int(lin) - self.cfg.tombstone_gc_lsn_slack, 0)
            compact_buckets(
                table, tombstone_gc_below_lsn=gc_below,
                summary={"reason": "maintenance"},
                cluster_by=self.cfg.compact_cluster_by,
            )
            out["compacted"] = True
        removed = table.vacuum(keep_versions=keep_versions, grace_seconds=vacuum_grace_seconds)
        out["vacuumed_files"] = len(removed)
        return out

    # --------------------------------------------------------- accessors
    def table(self) -> LakeTable:
        return LakeTable.load(self.spark, self.table_root)

    def dead_letters(self) -> DataFrame:
        return LakeTable.load(self.spark, self.dead_root).read()

    def lineage(self) -> DataFrame:
        return LakeTable.load(self.spark, self.lineage_root).read()

    def metrics(self) -> DataFrame:
        return LakeTable.load(self.spark, self.metrics_root).read()
