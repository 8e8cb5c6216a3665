"""LakeTable transactional format + MERGE correctness."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from odibel_spark.cdc import WalConfig, current_state, gen_events, split_dead_letters
from odibel_spark.lake import (
    BucketSpec,
    CommitConflict,
    LakeTable,
    cdc_table_schema,
    compact_tombstones,
    create_cdc_table,
    merge_upsert,
)

TRANSCRIPT_FIELDS = [
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
]
TRANSCRIPT_SCHEMA = cdc_table_schema(TRANSCRIPT_FIELDS)

KEYS = ["conv_id", "turn_idx"]


def make_table(spark, root, buckets=8):
    return create_cdc_table(spark, root, TRANSCRIPT_FIELDS, BucketSpec("conv_id", buckets))


def test_create_append_read_timetravel(spark, tmpdir_path):
    t = make_table(spark, os.path.join(tmpdir_path, "t1"))
    assert t.read().count() == 0
    df = spark.createDataFrame(
        [("c1", 0, "user", "hi", None, None, 1, False), ("c2", 0, "user", "yo", None, None, 2, False)],
        schema=TRANSCRIPT_SCHEMA,
    )
    t.append(df)
    assert t.read().count() == 2
    t.append(df.withColumn("turn_idx", F.col("turn_idx") + 1))
    assert t.read().count() == 4
    assert t.read(version=2).count() == 2  # time travel
    assert t.current_version() == 3
    t2 = LakeTable.load(spark, t.root)
    assert t2.read().count() == 4


def test_commit_conflict(spark, tmpdir_path):
    t = make_table(spark, os.path.join(tmpdir_path, "t2"))
    man = t.manifest()
    with pytest.raises(CommitConflict):
        t._commit(version=man["version"], files=[], schema=t.schema(), bucket=t.bucket_spec(),
                  summary={}, watermarks={})


def test_merge_fold_false_rejected_on_cow(spark, tmpdir_path):
    """fold=False defers duplicate-key resolution to read-time LWW
    folding, which only MoR tables perform — on a CoW table the
    duplicates would land in the table silently (property-caught
    corruption), so merge_upsert must refuse the combination."""
    t = make_table(spark, os.path.join(tmpdir_path, "tguard"))
    ev_schema = "lsn long, op string, conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    b = spark.createDataFrame([(1, "insert", "c1", 0, "user", "hello", None, None)], ev_schema)
    with pytest.raises(ValueError, match="merge-on-read"):
        merge_upsert(t, b, KEYS, fold=False)
    assert t.read().count() == 0  # refused before any commit


def test_merge_upsert_semantics(spark, tmpdir_path):
    t = make_table(spark, os.path.join(tmpdir_path, "t3"))
    ev_schema = "lsn long, op string, conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    b1 = spark.createDataFrame(
        [
            (1, "insert", "c1", 0, "user", "hello", None, None),
            (2, "insert", "c1", 1, "assistant", "hi!", None, None),
            (3, "insert", "c2", 0, "user", "yo", None, None),
        ],
        ev_schema,
    )
    merge_upsert(t, b1, KEYS)
    assert t.read().count() == 3

    # update + delete + duplicate + stale event in one batch
    b2 = spark.createDataFrame(
        [
            (5, "update", "c1", 1, "assistant", "hi there!", None, None),
            (5, "update", "c1", 1, "assistant", "hi there!", None, None),  # dup
            (4, "delete", "c2", 0, None, None, None, None),
            (0, "update", "c1", 0, "user", "STALE", None, None),  # stale lsn < applied
        ],
        ev_schema,
    )
    merge_upsert(t, b2, KEYS)
    rows = {(r.conv_id, r.turn_idx): (r.text, r._lsn) for r in t.read().collect()}
    assert rows == {("c1", 0): ("hello", 1), ("c1", 1): ("hi there!", 5)}

    # idempotent replay: re-applying the same batch changes nothing
    v_before = t.current_version()
    merge_upsert(t, b2, KEYS)
    rows2 = {(r.conv_id, r.turn_idx): (r.text, r._lsn) for r in t.read().collect()}
    assert rows2 == rows
    assert t.current_version() == v_before + 1  # commit happened, data identical

    # delete then re-insert (window close/reopen)
    b3 = spark.createDataFrame([(6, "insert", "c2", 0, "user", "back", None, None)], ev_schema)
    merge_upsert(t, b3, KEYS)
    rows3 = {(r.conv_id, r.turn_idx): r.text for r in t.read().collect()}
    assert rows3[("c2", 0)] == "back"


def test_tombstone_fences_stale_update_and_compaction(spark, tmpdir_path):
    """A stale out-of-order update arriving AFTER the delete was applied
    must not resurrect the key — the tombstone carries the LSN fence."""
    t = make_table(spark, os.path.join(tmpdir_path, "t8"))
    ev_schema = "lsn long, op string, conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    merge_upsert(t, spark.createDataFrame([(1, "insert", "c1", 0, "user", "v1", None, None)], ev_schema), KEYS)
    merge_upsert(t, spark.createDataFrame([(9, "delete", "c1", 0, None, None, None, None)], ev_schema), KEYS)
    assert t.read().count() == 0
    ts = t.read(include_tombstones=True).collect()
    assert len(ts) == 1 and ts[0]._deleted and ts[0]._lsn == 9

    # stale update (lsn 5 < 9) in a later batch: must stay dead
    merge_upsert(t, spark.createDataFrame([(5, "update", "c1", 0, "user", "ZOMBIE", None, None)], ev_schema), KEYS)
    assert t.read().count() == 0

    # genuine re-insert (lsn 12 > 9) revives
    merge_upsert(t, spark.createDataFrame([(12, "insert", "c1", 0, "user", "alive", None, None)], ev_schema), KEYS)
    assert [r.text for r in t.read().collect()] == ["alive"]

    # tombstone GC once low-watermark passes
    merge_upsert(t, spark.createDataFrame([(20, "delete", "c1", 0, None, None, None, None)], ev_schema), KEYS)
    compact_tombstones(t, below_lsn=100)
    assert t.read(include_tombstones=True).count() == 0


def test_merge_bucket_pruning(spark, tmpdir_path):
    """A batch touching one key must carry over every untouched bucket's
    files unchanged (copy-on-write unit = bucket)."""
    t = make_table(spark, os.path.join(tmpdir_path, "t4"), buckets=8)
    cfg = WalConfig(n_events=4000, n_convs=64, seed=3)
    ev = gen_events(spark, cfg).drop("_feed_order", "meta")
    ok, _ = split_dead_letters(ev)
    merge_upsert(t, ok, KEYS)
    files_before = {f["path"]: f for f in t.files()}

    one = spark.createDataFrame(
        [(10_000_000, "update", "conv-0", 0, "user", "poke", None, None)],
        "lsn long, op string, conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    man = merge_upsert(t, one, KEYS)
    touched = set(man["summary"]["touched_buckets"])
    assert len(touched) == 1
    untouched_before = {p for p, f in files_before.items() if f["bucket"] not in touched}
    after = {f["path"] for f in t.files()}
    assert untouched_before <= after, "untouched bucket files must be carried over byte-identical"


def test_full_replay_merge_equals_batch_oracle(spark, tmpdir_path):
    """Chunked MERGE replay (as the streaming sink does) converges to the
    batch LWW fold — the reference's final-table-state oracle."""
    t = make_table(spark, os.path.join(tmpdir_path, "t5"))
    cfg = WalConfig(n_events=12_000, n_convs=200, seed=5)
    ev = gen_events(spark, cfg).drop("meta").cache()
    ok, _dead = split_dead_letters(ev.drop("_feed_order"))

    n_chunks = 5
    for i in range(n_chunks):
        # first/last chunk open-ended: displacement can push feed order
        # outside [0, n_events)
        lo = i * cfg.n_events // n_chunks if i else -(10**9)
        hi = (i + 1) * cfg.n_events // n_chunks if i < n_chunks - 1 else 10**9
        # feed-order chunks ⇒ bounded out-of-order across chunk borders
        chunk = ev.filter((F.col("_feed_order") >= lo) & (F.col("_feed_order") < hi)).drop("_feed_order")
        ok_chunk, _ = split_dead_letters(chunk)
        merge_upsert(t, ok_chunk, KEYS)

    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "_lsn"]
    got = t.read().select(*cols)
    exp = current_state(ok).select(*cols)

    def checksum(df):
        return df.agg(
            F.count("*").alias("n"),
            F.sum(F.pmod(F.xxhash64(*cols), F.lit(2**31))).alias("h"),
        ).collect()[0]

    g, e = checksum(got), checksum(exp)
    assert (g.n, g.h) == (e.n, e.h) and g.n > 0
    ev.unpersist()


def test_schema_evolution_read_old_files(spark, tmpdir_path):
    t = make_table(spark, os.path.join(tmpdir_path, "t6"))
    df = spark.createDataFrame([("c1", 0, "user", "hi", None, None, 1, False)], TRANSCRIPT_SCHEMA)
    t.append(df)
    t.add_columns([T.StructField("meta", T.StringType(), True)])
    out = t.read()
    assert "meta" in out.columns
    assert out.select("meta").collect()[0][0] is None  # old file → NULL

    # new writes carry the column; old files still readable
    df2 = spark.createDataFrame(
        [("c2", 0, "user", "yo", None, None, 2, False, '{"client":"v2"}')], t.schema()
    )
    t.append(df2)
    vals = {r.conv_id: r.meta for r in t.read().collect()}
    assert vals == {"c1": None, "c2": '{"client":"v2"}'}


def test_watermark_fencing_and_vacuum(spark, tmpdir_path):
    t = make_table(spark, os.path.join(tmpdir_path, "t7"))
    assert t.watermark("s1") == -1
    b = spark.createDataFrame(
        [(1, "insert", "c1", 0, "user", "hi", None, None)],
        "lsn long, op string, conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    merge_upsert(t, b, KEYS, watermarks_update={"s1": 0})
    assert t.watermark("s1") == 0
    merge_upsert(t, b.withColumn("lsn", F.lit(2).cast("long")), KEYS, watermarks_update={"s1": 1})
    assert t.watermark("s1") == 1

    live = {f["path"] for f in t.files()}
    removed = t.vacuum(keep_versions=1)
    assert live & set(removed) == set()
    assert t.read().count() == 1


def test_salted_write_spreads_hot_bucket(spark, tmpdir_path):
    """write_salt splits a skewed bucket's commit across several files
    without changing read results or bucket pruning."""
    t = create_cdc_table(
        spark, os.path.join(tmpdir_path, "t8"), TRANSCRIPT_FIELDS,
        BucketSpec("conv_id", 4), key_cols=KEYS, merge_mode="mor",
    )
    # one hot conversation = one hot bucket
    rows = [(i + 1, "insert", "hot", i, "user", f"msg {i}", None, None) for i in range(2000)]
    b = spark.createDataFrame(
        rows,
        "lsn long, op string, conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    merge_upsert(t, b, KEYS, write_salt=4)
    by_bucket = {}
    for f in t.files():
        by_bucket.setdefault(f["bucket"], []).append(f)
    hot = [fs for fs in by_bucket.values() if sum(x["rows"] for x in fs) == 2000]
    assert hot and len(hot[0]) > 1, "hot bucket should be split across multiple files"
    assert t.read().count() == 2000
    # bucket-restricted read still complete
    bkt = next(b for b, fs in by_bucket.items() if sum(x["rows"] for x in fs) == 2000)
    assert t.read(buckets={bkt}).count() == 2000


def test_incremental_changes_scan(spark, tmpdir_path):
    """changes(since, until): exact per-commit change rows for MoR
    tables — upserts and delete tombstones stamped with the committing
    version, compaction invisible, CoW rejected."""
    t = create_cdc_table(
        spark, os.path.join(tmpdir_path, "tchg"), TRANSCRIPT_FIELDS,
        BucketSpec("conv_id", 4), key_cols=KEYS, merge_mode="mor",
    )
    schema = ("lsn long, op string, conv_id string, turn_idx int, role string, "
              "text string, tool string, ts timestamp")
    b1 = spark.createDataFrame(
        [(1, "insert", "c1", 0, "user", "hi", None, None),
         (2, "insert", "c2", 0, "user", "yo", None, None)], schema)
    merge_upsert(t, b1, KEYS)
    v1 = t.current_version()
    b2 = spark.createDataFrame(
        [(3, "update", "c1", 0, "user", "hi2", None, None),
         (4, "delete", "c2", 0, None, None, None, None)], schema)
    merge_upsert(t, b2, KEYS)
    v2 = t.current_version()

    all_ch = t.changes(0).orderBy("_lsn").collect()
    assert [(r.conv_id, r._lsn, r._deleted, r._commit_version) for r in all_ch] == [
        ("c1", 1, False, v1), ("c2", 2, False, v1),
        ("c1", 3, False, v2), ("c2", 4, True, v2),
    ]
    tail = t.changes(v1).collect()
    assert {(r.conv_id, r._lsn) for r in tail} == {("c1", 3), ("c2", 4)}

    from odibel_spark.lake.merge import compact_buckets

    compact_buckets(t)
    assert t.changes(v2).count() == 0, "compaction must be changelog-invisible"
    assert t.changes(v1).count() == 2, "range before compaction unchanged"
    assert t.changes(0, v1).count() == 2

    cow = create_cdc_table(
        spark, os.path.join(tmpdir_path, "tcow"), TRANSCRIPT_FIELDS,
        BucketSpec("conv_id", 4), key_cols=KEYS, merge_mode="cow",
    )
    with pytest.raises(ValueError):
        cow.changes(0)


def test_changelog_replicates_table(spark, tmpdir_path):
    """Lake-to-lake replication: applying a source table's changelog
    through the ordinary MERGE reproduces its merged state exactly —
    the downstream-consumer contract of changes()."""
    src = create_cdc_table(
        spark, os.path.join(tmpdir_path, "repl_src"), TRANSCRIPT_FIELDS,
        BucketSpec("conv_id", 4), key_cols=KEYS, merge_mode="mor",
    )
    schema = ("lsn long, op string, conv_id string, turn_idx int, role string, "
              "text string, tool string, ts timestamp")
    merge_upsert(src, spark.createDataFrame(
        [(1, "insert", "c1", 0, "user", "a", None, None),
         (2, "insert", "c2", 0, "user", "b", None, None),
         (3, "insert", "c3", 0, "user", "c", None, None)], schema), KEYS)
    merge_upsert(src, spark.createDataFrame(
        [(4, "update", "c1", 0, "user", "a2", None, None),
         (5, "delete", "c3", 0, None, None, None, None)], schema), KEYS)

    dst = create_cdc_table(
        spark, os.path.join(tmpdir_path, "repl_dst"), TRANSCRIPT_FIELDS,
        BucketSpec("conv_id", 4), key_cols=KEYS, merge_mode="mor",
    )
    feed = (
        src.changes(0)
        .withColumn("op", F.when(F.col("_deleted"), F.lit("delete")).otherwise(F.lit("update")))
        .withColumnRenamed("_lsn", "lsn")
        .drop("_deleted", "_commit_version")
    )
    merge_upsert(dst, feed, KEYS)
    a = src.read().select(sorted(src.read().columns))
    b = dst.read().select(sorted(dst.read().columns))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert b.count() == 2


def test_changes_raises_past_retention(spark, tmpdir_path):
    """A changelog cursor that fell behind the vacuum retention window
    must fail loudly, never return a silently incomplete change set."""
    t = create_cdc_table(
        spark, os.path.join(tmpdir_path, "ret"), TRANSCRIPT_FIELDS,
        BucketSpec("conv_id", 4), key_cols=KEYS, merge_mode="mor",
    )
    schema = ("lsn long, op string, conv_id string, turn_idx int, role string, "
              "text string, tool string, ts timestamp")
    merge_upsert(t, spark.createDataFrame(
        [(1, "insert", "c1", 0, "user", "a", None, None)], schema), KEYS)
    v1 = t.current_version()
    merge_upsert(t, spark.createDataFrame(
        [(2, "update", "c1", 0, "user", "a2", None, None)], schema), KEYS)

    from odibel_spark.lake.merge import compact_buckets

    compact_buckets(t)
    t.vacuum(keep_versions=1, grace_seconds=0.0)
    with pytest.raises(FileNotFoundError, match="retention"):
        t.changes(0).count()
    # post-compaction cursors still work: no vacuumed files in range
    assert t.changes(t.current_version()).count() == 0


# ---------------------------------------------------------------- stats


def _mk_rows(lsns, conv="c1", text="a"):
    import datetime

    return [
        (conv, i, "user", text, None, datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=l), l, False)
        for i, l in enumerate(lsns)
    ]


def test_manifest_records_column_bounds(spark, tmpdir_path):
    """Every commit harvests per-file min/max for the stats_columns
    property (Iceberg lower/upper bounds) out of the parquet footers —
    including timestamp columns (TIMESTAMP_MICROS output restores the
    stats INT96 never had)."""
    t = create_cdc_table(
        spark, os.path.join(tmpdir_path, "stats1"), TRANSCRIPT_FIELDS,
        BucketSpec("conv_id", 2), key_cols=KEYS,
        stats_columns=["conv_id", "turn_idx", "_lsn", "ts"],
    )
    t.append(spark.createDataFrame(_mk_rows([5, 7, 3]), TRANSCRIPT_SCHEMA))
    fs = [f for f in t.files() if f["rows"]]
    assert fs, "append produced no data files"
    lo = min(f["stats"]["_lsn"][0] for f in fs)
    hi = max(f["stats"]["_lsn"][1] for f in fs)
    assert (lo, hi) == (3, 7)
    for f in fs:
        assert f["stats"]["conv_id"][0] == "c1" == f["stats"]["conv_id"][1]
        assert set(f["stats"]) == {"conv_id", "turn_idx", "_lsn", "ts"}
        assert f["stats"]["ts"][0].keys() == {"ts"}  # tagged datetime encoding


def test_where_ranges_prunes_files_and_matches_plain_filter(spark, tmpdir_path):
    """File skipping is observable (fewer scan inputs) and invisible
    (result == unpruned read + filter), incl. open-ended bounds."""
    t = make_table(spark, os.path.join(tmpdir_path, "stats2"), buckets=2)
    for lsns in ([1, 2, 3], [100, 101], [200, 205]):
        t.append(spark.createDataFrame(_mk_rows(lsns), TRANSCRIPT_SCHEMA))
    full = t.read()
    pruned = t.read(where_ranges={"_lsn": (100, 150)})
    assert set(pruned.inputFiles()) < set(full.inputFiles())
    expect = full.filter((F.col("_lsn") >= 100) & (F.col("_lsn") <= 150))
    assert sorted(pruned.collect()) == sorted(expect.collect())
    open_hi = t.read(where_ranges={"_lsn": (200, None)})
    assert len(open_hi.inputFiles()) < len(full.inputFiles())
    assert sorted(open_hi.collect()) == sorted(full.filter("_lsn >= 200").collect())
    # timestamp range over the Spark-written TIMESTAMP_MICROS stats
    import datetime

    t2 = create_cdc_table(
        spark, os.path.join(tmpdir_path, "stats2b"), TRANSCRIPT_FIELDS,
        BucketSpec("conv_id", 2), key_cols=KEYS, stats_columns=["ts"],
    )
    for lsns in ([1, 2], [500, 600]):
        t2.append(spark.createDataFrame(_mk_rows(lsns), TRANSCRIPT_SCHEMA))
    cut = datetime.datetime(2024, 1, 10)
    got = t2.read(where_ranges={"ts": (cut, None)})
    assert len(got.inputFiles()) < len(t2.read().inputFiles())
    assert sorted(got.collect()) == sorted(t2.read().filter(F.col("ts") >= F.lit(cut)).collect())


def test_cluster_by_tightens_bounds_and_prunes_range_reads(spark, tmpdir_path):
    """Write-time clustering (Iceberg sort order analog): the same
    shuffled data committed with ``cluster_by`` yields near-disjoint
    per-file bounds so a range read plans a small file subset, while
    the unclustered layout's files all straddle the range and nothing
    can be skipped — with identical query results either way."""
    import random

    schema = T.StructType(
        [T.StructField("k", T.LongType(), False), T.StructField("v", T.StringType(), True)]
    )
    ks = list(range(4000))
    random.Random(42).shuffle(ks)
    df = spark.createDataFrame([(k, f"x{k}") for k in ks], schema).repartition(8)
    plain = LakeTable.create(
        spark, os.path.join(tmpdir_path, "cl_plain"), schema,
        properties={"stats_columns": ["k"]},
    )
    plain.append(df)
    clustered = LakeTable.create(
        spark, os.path.join(tmpdir_path, "cl_sorted"), schema,
        properties={"stats_columns": ["k"]},
    )
    clustered.append(df, cluster_by=("k",), cluster_files=8)
    q = {"k": (1000, 1199)}
    expect = sorted(plain.read().filter("k between 1000 and 1199").collect())
    assert sorted(plain.read(where_ranges=q).collect()) == expect
    assert sorted(clustered.read(where_ranges=q).collect()) == expect
    total = len(clustered.read().inputFiles())
    assert total > 1, "clustered append produced a single file; test shape is degenerate"
    hit = len(clustered.read(where_ranges=q).inputFiles())
    # width-200 range over ~500-row range-partitioned files: at most a
    # couple of adjacent files survive even with sampled boundaries
    assert hit <= 3 and hit < total, (hit, total)
    # every random-order file straddles the range: nothing skippable
    assert len(plain.read(where_ranges=q).inputFiles()) == len(plain.read().inputFiles())
    # bucketed tables keep the bucket layout; cluster_by only sorts
    # within files — result parity is the contract there
    b = make_table(spark, os.path.join(tmpdir_path, "cl_bucketed"), buckets=2)
    b.append(spark.createDataFrame(_mk_rows([3, 1, 2]), TRANSCRIPT_SCHEMA), cluster_by=("_lsn",))
    assert b.read().count() == 3  # three distinct (conv, turn) keys
    with pytest.raises(ValueError, match="cluster_by"):
        plain.append(df, cluster_by=("nope",))


def test_compaction_cluster_by_sorts_rewritten_files(spark, tmpdir_path):
    """compact_buckets(cluster_by=...) doubles as OPTIMIZE: every
    rewritten bucket file comes out sorted by (bucket column, cluster
    columns) — checked against the raw parquet bytes — with the folded
    state unchanged."""
    import pyarrow.parquet as pq

    from odibel_spark.lake import compact_buckets

    import random

    t = create_cdc_table(
        spark, os.path.join(tmpdir_path, "cl_compact"), TRANSCRIPT_FIELDS,
        BucketSpec("conv_id", 2), key_cols=KEYS, merge_mode="mor",
    )
    # enough shuffled rows per bucket that the partitionBy writer's
    # own inserted sort (unstable, _bucket-only — the clobber this
    # test exists to catch) would visibly scramble the cluster order
    rng = random.Random(3)
    for batch in range(3):
        rows = [
            (f"c{rng.randrange(6)}", rng.randrange(40), "user", "a", None, None,
             batch * 1000 + i, False)
            for i in range(150)
        ]
        t.append(spark.createDataFrame(rows, TRANSCRIPT_SCHEMA))
    before = sorted(t.read().collect())
    compact_buckets(t, cluster_by=("_lsn",))
    assert sorted(t.read().collect()) == before
    fs = [f for f in t.files() if f["rows"]]
    assert fs and t.manifest()["summary"]["op"] == "compact"
    for f in fs:
        tbl = pq.read_table(os.path.join(t.root, f["path"]), columns=["conv_id", "_lsn"])
        pairs = list(zip(tbl.column("conv_id").to_pylist(), tbl.column("_lsn").to_pylist()))
        assert pairs == sorted(pairs), f["path"]


def test_where_ranges_mor_fold_guard(spark, tmpdir_path):
    """Key-column ranges prune a fold read soundly; payload/system
    ranges on a fold read raise (they could drop a key's latest delta);
    fold=False lifts the restriction."""
    t = create_cdc_table(
        spark, os.path.join(tmpdir_path, "stats3"), TRANSCRIPT_FIELDS,
        BucketSpec("conv_id", 4), key_cols=KEYS, merge_mode="mor",
    )
    schema = ("lsn long, op string, conv_id string, turn_idx int, role string, "
              "text string, tool string, ts timestamp")
    merge_upsert(t, spark.createDataFrame(
        [(1, "insert", "c1", 0, "u", "a", None, None),
         (2, "insert", "c2", 0, "u", "b", None, None)], schema), KEYS)
    merge_upsert(t, spark.createDataFrame(
        [(3, "update", "c1", 0, "u", "a2", None, None)], schema), KEYS)
    got = t.read(where_ranges={"conv_id": ("c1", "c1")})
    assert [(r["conv_id"], r["text"]) for r in got.collect()] == [("c1", "a2")]
    with pytest.raises(ValueError, match="non-merge-key"):
        t.read(where_ranges={"_lsn": (2, None)})
    # raw delta scan (no fold): any column goes
    raw = t.read(fold=False, include_tombstones=True, where_ranges={"_lsn": (3, None)})
    assert raw.count() == 1
    with pytest.raises(ValueError, match="not in table schema"):
        t.read(where_ranges={"nope": (1, 2)})


def test_file_in_ranges_unknown_bounds_keep():
    """Unknown never prunes: legacy descriptors without stats, columns
    without collected bounds, and half-open ranges all keep the file;
    only a PROVEN-disjoint bound skips it."""
    from odibel_spark.lake.table import _file_in_ranges

    assert _file_in_ranges({"path": "p"}, {"x": (1, 2)})
    assert _file_in_ranges({"stats": {"y": [0, 9]}}, {"x": (1, 2)})
    assert _file_in_ranges({"stats": {"x": [0, 9]}}, {"x": (5, None)})
    assert not _file_in_ranges({"stats": {"x": [0, 4]}}, {"x": (5, None)})
    assert not _file_in_ranges({"stats": {"x": [6, 9]}}, {"x": (None, 5)})
    assert _file_in_ranges({"stats": {"x": [5, 5]}}, {"x": (5, 5)})
    with pytest.raises(ValueError, match="does not compare"):
        _file_in_ranges({"stats": {"x": [0, 4]}}, {"x": ("a", None)})


def test_version_at_timestamp_resolution(spark, tmpdir_path):
    """Snapshot-as-of-timestamp: for every commit's own recorded
    timestamp the resolved version IS that commit; between two commits
    it is the earlier one; after the last it is the head; before the
    first it raises (the seconds-vs-ms trap must not read as an empty
    table). Deterministic: probes are the manifests' own committed_at_ms
    values, no wall-clock assumptions."""
    import datetime

    t = make_table(spark, os.path.join(tmpdir_path, "vat"))
    for lsns in ([1], [2], [3]):
        t.append(spark.createDataFrame(_mk_rows(lsns), TRANSCRIPT_SCHEMA))
    hist = t.history()  # versions 1..4 (create + 3 appends)
    assert [m["version"] for m in hist] == [1, 2, 3, 4]
    stamps = [m["committed_at_ms"] for m in hist]
    assert stamps == sorted(stamps)
    for m in hist:
        assert t.version_at(m["committed_at_ms"]) == m["version"]
    # strictly between two distinct stamps -> the earlier version
    for a, b in zip(hist, hist[1:]):
        if b["committed_at_ms"] > a["committed_at_ms"] + 1:
            assert t.version_at(a["committed_at_ms"] + 1) == a["version"]
    assert t.version_at(stamps[-1] + 10_000) == 4
    with pytest.raises(ValueError, match="predates"):
        t.version_at(stamps[0] - 1)
    with pytest.raises(ValueError, match="predates"):
        t.version_at(stamps[0] // 1000)  # the seconds-vs-ms mistake
    # datetime form resolves identically and composes with read()
    dt = datetime.datetime.fromtimestamp(
        stamps[1] / 1000, tz=datetime.timezone.utc
    )
    v = t.version_at(dt)
    assert v == 2
    assert t.read(version=v).count() == 1  # first append only


def test_rollback_restores_state_schema_and_vacuum_liveness(spark, tmpdir_path):
    """rollback(v) commits a NEW head equal to snapshot v: data and
    schema restored (undoes schema evolution), history append-only
    (the bad commits stay time-travelable), stream fences kept by
    default / restored on request, and vacuum treats the target's
    files as live again while the rolled-back commits' files expire
    through normal retention."""
    t = make_table(spark, os.path.join(tmpdir_path, "rb"))
    t.append(spark.createDataFrame(_mk_rows([1, 2]), TRANSCRIPT_SCHEMA))  # v2: good
    good = sorted(map(tuple, t.read().collect()))
    t.commit_metadata({"note": "fence"}, watermarks_update={"s1": 7})  # v3
    t.append(spark.createDataFrame(_mk_rows([9], conv="bad"), TRANSCRIPT_SCHEMA))  # v4: bad batch
    t.add_columns([T.StructField("extra", T.StringType(), True)])  # v5: bad evolution
    assert t.current_version() == 5

    man = t.rollback(2)
    assert man["version"] == 6 and man["summary"]["op"] == "rollback"
    assert man["summary"]["rollback_of"] == 2
    assert sorted(map(tuple, t.read().collect())) == good
    assert "extra" not in t.schema().fieldNames()
    # history append-only: the bad commits remain time-travelable
    assert t.read(version=4).filter(F.col("conv_id") == "bad").count() == 1
    # default keeps the CURRENT stream fences (reset posture)
    assert t.watermark("s1") == 7
    # reprocess posture: fences revert to the target's (unknown → -1)
    t.rollback(2, restore_watermarks=True)
    assert t.watermark("s1") == -1

    # vacuum liveness flips with the head: the target's files are live
    # again, the bad batch's file is unreferenced by the retained heads
    removed = t.vacuum(keep_versions=2, grace_seconds=0)
    assert sorted(map(tuple, t.read().collect())) == good
    assert removed, "the rolled-back batch's file must expire"
    # the bad snapshot's data really is gone from disk
    assert any(
        not os.path.exists(os.path.join(t.root, f["path"]))
        for f in t.files(version=4)
    )

    # a rollback whose target was vacuumed away refuses to commit an
    # unreadable head
    t.overwrite(spark.createDataFrame(_mk_rows([3]), t.schema()))
    t.vacuum(keep_versions=1, grace_seconds=0)
    with pytest.raises(FileNotFoundError, match="retention"):
        t.rollback(2)
    with pytest.raises(ValueError, match="rollback target"):
        t.rollback(t.current_version())
    with pytest.raises(ValueError, match="rollback target"):
        t.rollback(0)


def test_changes_refuses_ranges_crossing_a_rollback(spark, tmpdir_path):
    """Incremental consumers must re-sync after a rollback: emitting
    the re-referenced files as change rows would miss the implied
    deletes of everything after the target. Ranges that stop before
    the rollback stay readable."""
    t = create_cdc_table(
        spark,
        os.path.join(tmpdir_path, "rbmor"),
        TRANSCRIPT_FIELDS,
        BucketSpec("conv_id", 4),
        key_cols=KEYS,
        merge_mode="mor",
    )
    t.append(spark.createDataFrame(_mk_rows([1]), TRANSCRIPT_SCHEMA))  # v2
    t.append(spark.createDataFrame(_mk_rows([2], conv="bad"), TRANSCRIPT_SCHEMA))  # v3
    t.rollback(2)  # v4
    assert t.changes(0, until_version=3).count() == 2  # pre-rollback OK
    with pytest.raises(ValueError, match="rollback"):
        t.changes(0)
    with pytest.raises(ValueError, match="re-sync"):
        t.changes(3)
    # post-rollback commits resume a clean changelog
    t.append(spark.createDataFrame(_mk_rows([5], conv="c9"), TRANSCRIPT_SCHEMA))  # v5
    assert t.changes(4).count() == 1
    # folded read after rollback: only the good row survives
    assert t.read(version=4).filter(F.col("conv_id") == "bad").count() == 0


def test_stats_never_crash_commit_on_unextractable_types(spark, tmpdir_path):
    """A stats column whose footer statistics pyarrow cannot extract
    (it RAISES ArrowNotImplementedError on decimal columns, it does
    not return None) must degrade to "no bounds recorded" — the COMMIT
    succeeds, the column is simply never pruned, and the range read
    falls back to the pure residual filter. Found by construction:
    without the guard a decimal stats column took the whole ingest
    down for a metadata nicety."""
    import decimal

    from odibel_spark.lake.table import _stats_encode

    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "dec"),
        T.StructType([
            T.StructField("k", T.StringType(), False),
            T.StructField("amount", T.DecimalType(10, 2), True),
        ]),
        BucketSpec("k", 2),
        properties={"stats_columns": ["amount", "k"]},
    )
    schema = "k string, amount decimal(10,2)"
    t.append(spark.createDataFrame(
        [("a", decimal.Decimal("1.25")), ("b", decimal.Decimal("7.50"))], schema))
    t.append(spark.createDataFrame([("c", decimal.Decimal("900.00"))], schema))
    fs = [f for f in t.files() if f["rows"]]
    assert fs, "appends must commit despite the unextractable stats column"
    # decimal bounds omitted; the extractable sibling column still records
    assert all("amount" not in (f.get("stats") or {}) for f in fs)
    assert all("k" in (f.get("stats") or {}) for f in fs)
    # no bounds -> no skipping, but the residual filter still applies
    pruned = t.read(where_ranges={"amount": (decimal.Decimal("100"), None)})
    assert len(pruned.inputFiles()) == len(t.read().inputFiles())
    assert [str(r["amount"]) for r in pruned.collect()] == ["900.00"]
    # the manifest encode layer is a whitelist, not a passthrough:
    # unknown types degrade to omitted bounds, never a json.dump crash
    import datetime

    assert _stats_encode(b"\x00") is None
    assert _stats_encode(datetime.time(12, 0)) is None
    assert _stats_encode(object()) is None
    assert _stats_encode(decimal.Decimal("1.5")) == {"dec": "1.5"}


def test_nan_stats_never_fold_to_a_finite_bound(spark, tmpdir_path):
    """Spark's parquet writer records max=NaN for a NaN-bearing row
    group, and Python's `NaN > finite` is False — so a naive min/max
    fold across row groups silently REPLACES the NaN with a later
    group's finite max. Spark's filter semantics order NaN ABOVE every
    value (`NaN >= 1000.0` is true), so that finite manifest bound
    would let a lower-bound range read prune the very file whose NaN
    rows the equivalent plain filter keeps. The guard: any NaN bound
    in any row group ⇒ NO bounds recorded for that column (kept
    forever — sound), while NaN-free sibling columns still record."""
    import glob
    import math

    import pyarrow.parquet as pq

    from odibel_spark.lake.table import _file_in_ranges, _file_meta

    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old_block, old_page = hconf.get("parquet.block.size"), hconf.get("parquet.page.size")
    hconf.set("parquet.block.size", "1024")
    hconf.set("parquet.page.size", "512")
    try:
        t = LakeTable.create(
            spark, os.path.join(tmpdir_path, "nan"),
            T.StructType([
                T.StructField("k", T.StringType(), False),
                T.StructField("score", T.DoubleType(), True),
            ]),
            BucketSpec("k", 1),
            properties={"stats_columns": ["score", "k"]},
        )
        # NaN mid-file with finite rows AFTER it: the later groups'
        # finite maxes are what a naive fold would keep. A plain
        # (unclustered) append sorts only on _bucket — constant here —
        # so rows ship in input order and placing the NaN at position
        # 500 lands it in a non-final row group; the poisoned-shape
        # assert below fails loudly if the layout ever changes.
        rows = (
            [(f"k{i:04d}", float(i)) for i in range(500)]
            + [("k0500!", float("nan"))]
            + [(f"k{i:04d}", float(i)) for i in range(500, 900)]
        )
        t.append(spark.createDataFrame(rows, "k string, score double").coalesce(1))
    finally:
        for key, old in (("parquet.block.size", old_block), ("parquet.page.size", old_page)):
            hconf.set(key, old) if old is not None else hconf.unset(key)

    fs = [f for f in t.files() if f["rows"]]
    assert len(fs) == 1
    path = os.path.join(t.root, fs[0]["path"])
    # the scenario is real only if the file actually has the poisoned
    # shape: several row groups, a NaN max in a NON-final group
    md = pq.ParquetFile(path).metadata
    assert md.num_row_groups >= 3
    score_i = next(
        i for i in range(md.num_columns) if md.schema.column(i).path == "score"
    )
    maxes = [md.row_group(rg).column(score_i).statistics.max for rg in range(md.num_row_groups)]
    nan_at = [i for i, m in enumerate(maxes) if math.isnan(m)]
    assert nan_at and nan_at[-1] < md.num_row_groups - 1, maxes
    # counterfactual: the naive fold yields a FINITE max below the
    # probe bound — i.e. without the guard this file would be pruned
    naive_hi = None
    for m in maxes:
        if naive_hi is None or m > naive_hi:
            naive_hi = m
    assert not math.isnan(naive_hi) and naive_hi < 1000.0
    assert not _file_in_ranges({"stats": {"score": [0.0, naive_hi]}}, {"score": (1000.0, None)})
    # the guard: score bounds omitted, NaN-free sibling still recorded
    _, stats = _file_meta(path, ("score", "k"))
    assert "score" not in stats and "k" in stats
    assert "score" not in (fs[0].get("stats") or {})
    # end to end: range read == plain filter, NaN row included
    pruned = t.read(where_ranges={"score": (1000.0, None)})
    plain = t.read().filter(F.col("score") >= F.lit(1000.0))
    assert len(pruned.inputFiles()) == 1  # kept, not pruned
    got, want = pruned.collect(), plain.collect()
    assert [r["k"] for r in got] == [r["k"] for r in want] == ["k0500!"]
    assert math.isnan(got[0]["score"])
