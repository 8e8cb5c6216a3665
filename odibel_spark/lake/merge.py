"""MERGE INTO for LakeTable — bucket-pruned copy-on-write upsert with
LSN fencing and delete tombstones.

Semantic contract (the north rule's `WHEN MATCHED AND s.lsn >
t.applied_lsn` merge):

- the source batch is folded to one winner per key (highest LSN;
  exact duplicates collapse first) — ``cdc.replay.last_writer_wins``;
- a winner applies iff the target has no row for the key or the
  target's applied ``_lsn`` is lower ⇒ re-applying any prefix or any
  already-applied batch is a no-op (idempotent replay, the property
  exactly-once recovery leans on);
- a ``delete`` winner leaves a **tombstone** (``_deleted = true``,
  payload NULL, ``_lsn`` = delete LSN). Without tombstones, a stale
  out-of-order update arriving in a *later* batch would resurrect the
  deleted key — the LSN fence must outlive the row. Tombstones are
  hidden by ``LakeTable.read`` and garbage-collected by
  ``compact_tombstones`` once the stream's low-watermark LSN passes
  them;
- a corrupt/failed event must be dead-lettered *before* calling this
  (reference policy: failures never become deletes,
  DBpediaTKGExtraction.scala:174-195).

Physical plan at scale: one shuffle to fold the batch by key, one
full-outer join against ONLY the target buckets the batch touches
(reference's full-outer-diff idiom, eval/SnapshotEval.scala:132-160),
one bucket-clustered write. Untouched buckets are carried over in the
manifest — zero data movement for them. At 10^10 rows in the table and
a few-million-row batch, the rewrite cost is proportional to the
touched buckets, not the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from odibel_spark.lake.table import BucketSpec, LakeTable

LSN_FIELD = "_lsn"
DELETED_FIELD = "_deleted"
SYSTEM_FIELDS = (LSN_FIELD, DELETED_FIELD)


def cdc_table_schema(fields: list[T.StructField]) -> T.StructType:
    """User fields + the system columns a CDC-merged table needs."""
    return T.StructType(
        fields
        + [
            T.StructField(LSN_FIELD, T.LongType(), True),
            T.StructField(DELETED_FIELD, T.BooleanType(), True),
        ]
    )


def create_cdc_table(
    spark,
    root: str,
    fields: list[T.StructField],
    bucket: BucketSpec,
    key_cols: list[str] | None = None,
    merge_mode: str = "cow",
    stats_columns: list[str] | None = None,
) -> LakeTable:
    """CDC target table. ``merge_mode``:

    - ``"cow"`` (copy-on-write): MERGE rewrites the touched buckets;
      reads are plain scans. Optimal read-heavy.
    - ``"mor"`` (merge-on-read): MERGE appends folded winner rows as
      bucket-tagged delta files — O(batch) per commit regardless of
      table size; reads fold by key (``LakeTable.read``), compaction
      (``compact_buckets``) bounds the fold. Optimal write-heavy — the
      10^10-events/day ingest posture.

    ``stats_columns`` (default: bucket column + merge keys + ``_lsn``)
    names the columns whose per-file min/max bounds every commit
    records in the manifest (harvested from parquet footer statistics —
    free, the footers are read for row counts anyway). They power
    ``LakeTable.read(where_ranges=...)`` file skipping and give each
    data file an applied-LSN range for lineage at a glance; columns a
    file lacks statistics for are simply not recorded.
    """
    if merge_mode not in ("cow", "mor"):
        raise ValueError(f"unknown merge_mode {merge_mode!r}")
    props = {"merge_mode": merge_mode}
    if merge_mode == "mor":
        if not key_cols:
            raise ValueError("mor tables need key_cols (read-time fold keys)")
        props["merge_keys"] = list(key_cols)
    if stats_columns is None:
        stats_columns = list(
            dict.fromkeys([bucket.column, *(key_cols or []), LSN_FIELD])
        )
    if stats_columns:
        props["stats_columns"] = list(stats_columns)
    return LakeTable.create(spark, root, cdc_table_schema(fields), bucket, properties=props)


def merge_upsert(
    table: LakeTable,
    source: DataFrame,
    key_cols: list[str],
    lsn_col: str = "lsn",
    op_col: str = "op",
    delete_op: str = "delete",
    fold: bool = True,
    summary: dict | None = None,
    watermarks_update: dict | None = None,
    tombstone_gc_below_lsn: int | None = None,
    touched_buckets: set[int] | None = None,
    write_salt: int = 1,
) -> dict:
    """Apply a CDC batch to the table; returns the committed manifest.

    The table schema must contain ``key_cols`` + payload columns +
    ``_lsn``/``_deleted`` (see ``cdc_table_schema``). Source columns
    missing from the table schema are NULL-filled; extra source
    columns are ignored — run schema evolution (``table.add_columns``)
    first to keep them.

    ``tombstone_gc_below_lsn``: tombstones with ``_lsn`` below this
    (e.g. the stream's min unapplied LSN minus the out-of-order bound)
    are dropped during the rewrite — free compaction riding the merge.

    ``fold=False`` skips the per-batch LWW pre-fold and is valid ONLY
    on merge-on-read tables, whose ``read()`` resolves duplicate keys
    at scan time. On a copy-on-write table the unfolded full-outer
    merge would emit one row per SOURCE row and duplicate-key rows
    would persist in the table silently (a property test demonstrated
    the corruption), so that combination raises instead.

    The MoR trade, measured (interleaved, 1M events, 3.4x key
    duplication, 32 cores): raw append commits ~1.15x faster than the
    pre-folded delta — the max_by aggregation costs more than writing
    the extra rows — but every reader then folds 3.4x more delta rows
    until compaction catches up. The pre-fold stays the default
    because the CDC pipeline is read-amplification-sensitive (the
    changelog, incremental dedup, and analytics all scan the deltas);
    ``fold=False`` suits burst backfills that compact immediately
    after. Convergence under either posture, any batching/order, is
    property-proven (test_merge_converges_for_any_batching_and_order).
    """
    # deferred: odibel_spark.cdc re-exports the pipeline, which imports
    # this module (circular at package-init time)
    from odibel_spark.cdc.replay import last_writer_wins

    if not fold and table.properties().get("merge_mode") != "mor":
        raise ValueError(
            "fold=False relies on read-time LWW folding, which only merge-on-read "
            "tables perform; a copy-on-write table would silently keep duplicate-key "
            "rows. Use fold=True (the default) or a merge_mode='mor' table."
        )

    spec = table.bucket_spec()
    if spec is None:
        raise ValueError("merge_upsert requires a bucketed table")
    schema = table.schema()
    names = schema.fieldNames()
    if LSN_FIELD not in names or DELETED_FIELD not in names:
        raise ValueError(f"CDC table needs {LSN_FIELD} and {DELETED_FIELD} columns")
    payload_cols = [n for n in names if n not in (*key_cols, *SYSTEM_FIELDS)]

    if touched_buckets is not None and not touched_buckets:
        return table.commit_metadata(
            LakeTable._tagged({**(summary or {}), "empty_batch": True}, "merge"), watermarks_update
        )

    if table.properties().get("merge_mode") == "mor":
        # merge-on-read: append the folded winners as delta rows —
        # O(batch) per commit, no target read, no bucket rewrite. The
        # key's LWW resolution happens in LakeTable.read's fold; the
        # epoch fence (watermarks) commits atomically with the delta.
        #
        # ONE exchange serves both the fold and the file layout: rows
        # are hash-repartitioned on the bucket (plus a key-salt when
        # hot buckets need splitting), and because the bucket/salt are
        # functions of the group keys, Catalyst accepts that
        # partitioning for the groupBy — no second shuffle before the
        # bucket-clustered write.
        src = source.withColumn("_bucket", spec.expr())
        part_cols = ["_bucket"]
        if write_salt > 1:
            src = src.withColumn(
                "_salt", F.pmod(F.xxhash64(*[F.col(k) for k in key_cols]), F.lit(write_salt))
            )
            part_cols.append("_salt")
        n_parts = spec.buckets * write_salt
        if fold:
            src = src.repartition(n_parts, *part_cols)
            others = [c for c in src.columns if c not in (*key_cols, *part_cols)]
            winner = F.max_by(F.struct(*[F.col(c) for c in others]), F.col(lsn_col)).alias("_w")
            winners = (
                src.groupBy(*part_cols, *key_cols)
                .agg(winner)
                .select(*part_cols, *key_cols, *[F.col(f"_w.{c}").alias(c) for c in others])
            )
        else:
            winners = src.repartition(n_parts, *part_cols)
        out_cols = [F.col("_bucket"), *[F.col(c) for c in key_cols]]
        is_del = F.col(op_col) == delete_op
        for c in payload_cols:
            dt = schema[c].dataType
            sc = F.col(c).cast(dt) if c in winners.columns else F.lit(None).cast(dt)
            out_cols.append(F.when(is_del, F.lit(None).cast(dt)).otherwise(sc).alias(c))
        out_cols.append(F.col(lsn_col).cast("long").alias(LSN_FIELD))
        out_cols.append(is_del.alias(DELETED_FIELD))
        return table.append(
            winners.select(*out_cols),
            summary=summary,
            watermarks_update=watermarks_update,
            op="merge-mor",
        )

    base_version = table.current_version()
    winners = last_writer_wins(source, key_cols, lsn_col) if fold else source
    winners = winners.withColumn("_sb", spec.expr())

    # Which copy-on-write units does this batch touch? (≤ n_buckets
    # ints; callers that already computed batch statistics pass them
    # in to save the extra job)
    touched = (
        set(touched_buckets)
        if touched_buckets is not None
        else {r[0] for r in winners.select("_sb").distinct().collect()}
    )
    if not touched:
        return table.commit_metadata(
            LakeTable._tagged({**(summary or {}), "empty_batch": True}, "merge"), watermarks_update
        )

    src_cols = [F.col(c) for c in key_cols]
    src_cols.append(F.col(lsn_col).alias("_s_lsn"))
    src_cols.append((F.col(op_col) == delete_op).alias("_s_del"))
    for c in payload_cols:
        field = schema[c]
        if c in winners.columns:
            src_cols.append(F.col(c).cast(field.dataType).alias(f"_s_{c}"))
        else:
            src_cols.append(F.lit(None).cast(field.dataType).alias(f"_s_{c}"))
    src = winners.select(*src_cols)

    target = table.read(version=base_version, buckets=touched, include_tombstones=True)

    joined = target.join(src, on=key_cols, how="full_outer")
    apply = F.col("_s_lsn").isNotNull() & (
        F.col(LSN_FIELD).isNull() | (F.col("_s_lsn") > F.col(LSN_FIELD))
    )
    out_cols = [F.col(c) for c in key_cols]
    for c in payload_cols:
        out_cols.append(
            F.when(apply & F.col("_s_del"), F.lit(None).cast(schema[c].dataType))
            .when(apply, F.col(f"_s_{c}"))
            .otherwise(F.col(c))
            .alias(c)
        )
    out_cols.append(F.when(apply, F.col("_s_lsn")).otherwise(F.col(LSN_FIELD)).alias(LSN_FIELD))
    out_cols.append(
        F.when(apply, F.col("_s_del"))
        .otherwise(F.coalesce(F.col(DELETED_FIELD), F.lit(False)))
        .alias(DELETED_FIELD)
    )
    result = joined.select(*out_cols)
    if tombstone_gc_below_lsn is not None:
        result = result.filter(
            ~(F.col(DELETED_FIELD) & (F.col(LSN_FIELD) < F.lit(tombstone_gc_below_lsn)))
        )

    return table.replace_buckets(
        touched,
        result,
        summary={"touched_buckets": sorted(touched), **(summary or {})},
        watermarks_update=watermarks_update,
        write_salt=write_salt,
        base_version=base_version,
    )


def compact_buckets(
    table: LakeTable,
    buckets: set[int] | None = None,
    tombstone_gc_below_lsn: int | None = None,
    summary: dict | None = None,
    retries: int = 3,
    cluster_by: tuple[str, ...] = (),
) -> dict:
    """MoR maintenance: rewrite buckets folding delta rows to one row
    per key (bounding read-time fold cost), optionally dropping
    tombstones whose LSN fence is safely below the stream
    low-watermark. ``cluster_by`` additionally sorts each rewritten
    bucket file on those columns (compaction doubling as OPTIMIZE:
    the rewrite is happening anyway, so the sort rides the same
    shuffle and tightens the parquet row-group statistics that
    Spark's pushed-down range filters prune at scan time). Safe to run concurrently with readers (snapshot
    isolation) AND with writers: the replacement is pinned to the
    snapshot version it was folded from, so if a concurrent merge
    lands delta files in the target buckets mid-compaction the commit
    aborts (instead of silently dropping the merge's rows) and the
    fold is recomputed from the fresh snapshot — compaction is
    idempotent, so the retry is free of side effects. Raises
    :class:`~odibel_spark.lake.table.CommitConflict` after ``retries``
    lost races (a busy stream; rerun between drains)."""
    from odibel_spark.lake.table import CommitConflict

    spec = table.bucket_spec()
    if spec is None:
        raise ValueError("compact_buckets requires a bucketed table")
    target = set(buckets) if buckets is not None else set(range(spec.buckets))
    props = table.properties()
    keys = props.get("merge_keys")
    if not keys:
        raise ValueError("compact_buckets needs merge_keys table property (mor table)")
    for attempt in range(retries):
        base_version = table.current_version()
        raw = table.read(version=base_version, buckets=target, include_tombstones=True, fold=False)
        others = [c for c in raw.columns if c not in keys]
        winner = F.max_by(F.struct(*[F.col(c) for c in others]), F.col(LSN_FIELD)).alias("_w")
        folded = (
            raw.groupBy(*[F.col(k) for k in keys])
            .agg(winner)
            .select(*keys, *[F.col(f"_w.{c}").alias(c) for c in others])
        )
        if tombstone_gc_below_lsn is not None:
            folded = folded.filter(
                ~(F.coalesce(F.col(DELETED_FIELD), F.lit(False)) & (F.col(LSN_FIELD) < F.lit(tombstone_gc_below_lsn)))
            )
        try:
            return table.replace_buckets(
                target, folded, summary=summary, op="compact",
                base_version=base_version, cluster_by=cluster_by,
            )
        except CommitConflict:
            if attempt == retries - 1:
                raise
    raise CommitConflict("unreachable")


def compact_tombstones(table: LakeTable, below_lsn: int) -> dict:
    """Standalone tombstone GC: rewrite every bucket dropping tombstones
    whose fence LSN is safely below the stream low-watermark. Pinned to
    the snapshot it reads — a concurrent merge aborts the commit rather
    than losing rows (rerun between drains)."""
    spec = table.bucket_spec()
    base_version = table.current_version()
    df = table.read(version=base_version, include_tombstones=True)
    keep = df.filter(~(F.col(DELETED_FIELD) & (F.col(LSN_FIELD) < F.lit(below_lsn))))
    all_buckets = set(range(spec.buckets))
    return table.replace_buckets(
        all_buckets, keep, op="compact-tombstones", base_version=base_version
    )
