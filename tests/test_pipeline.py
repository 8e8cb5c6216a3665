"""Structured Streaming pipeline: end-to-end, exactly-once under crash/
restart, mid-stream schema evolution, dead-letters, lineage/metrics."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from odibel_spark.cdc import (
    PipelineConfig,
    TranscriptCdcPipeline,
    WalConfig,
    current_state,
    gen_events,
    split_dead_letters,
    write_wal_files,
)

CFG = WalConfig(n_events=15_000, n_convs=250, seed=13)
PAYLOAD_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "meta", "_lsn"]


def oracle_state(spark, wal_cfg):
    ev = gen_events(spark, wal_cfg).drop("_feed_order")
    ok, _ = split_dead_letters(ev)
    return current_state(ok).join(
        ev.select("lsn", "meta").dropDuplicates(["lsn"]), F.col("_lsn") == F.col("lsn"), "left"
    ).drop("lsn")


def checksum(df, cols):
    return tuple(
        df.agg(
            F.count("*").alias("n"),
            F.sum(F.pmod(F.xxhash64(*cols), F.lit(2**31))).alias("h"),
        ).collect()[0]
    )


@pytest.fixture(scope="module")
def wal_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("walstream"))
    write_wal_files(spark, CFG, d, n_files=10)
    return d


def run_pipeline(spark, wal_dir, base, **cfg_kw):
    cfg = PipelineConfig(
        wal_dirs=[wal_dir],
        table_root=os.path.join(base, "transcripts"),
        checkpoint_dir=os.path.join(base, "ckpt"),
        buckets=8,
        **cfg_kw,
    )
    p = TranscriptCdcPipeline(spark, cfg)
    p.run_available()
    return p


def test_stream_end_to_end(spark, wal_dir, tmpdir_path):
    p = run_pipeline(spark, wal_dir, tmpdir_path, max_files_per_trigger=3)

    got = p.table().read()
    assert "meta" in got.columns  # schema evolution happened
    exp = oracle_state(spark, CFG)
    cols = PAYLOAD_COLS
    assert checksum(got.select(*cols), cols) == checksum(exp.select(*cols), cols)

    # dead letters captured, never applied
    assert p.dead_letters().count() > 0
    assert got.filter(F.col("text").isNull()).count() == 0

    # lineage: per-bucket HWMs per epoch; metrics: one row per non-empty epoch
    lin = p.lineage()
    assert lin.count() > 0
    assert lin.groupBy("epoch", "bucket").count().filter("count > 1").count() == 0
    met = p.metrics().orderBy("epoch")
    assert met.count() >= 1
    assert met.agg(F.sum("n_events")).collect()[0][0] > 0


def test_exactly_once_under_crash_restart(spark, wal_dir, tmpdir_path):
    # phase 1: crash right AFTER the lake commit of epoch 1 (worst case:
    # lake state advanced, checkpoint not yet — batch will replay)
    with pytest.raises(Exception):  # Spark wraps the injected RuntimeError
        run_pipeline(
            spark, wal_dir, tmpdir_path, max_files_per_trigger=2, fail_after_commit_epoch=1
        )
    # the crash hit after the lake commit: watermark already at epoch 1
    from odibel_spark.lake import LakeTable

    t = LakeTable.load(spark, os.path.join(tmpdir_path, "transcripts"))
    assert t.watermark("wal") == 1

    # phase 2: restart without fault — replayed epoch must be fenced
    p = run_pipeline(spark, wal_dir, tmpdir_path, max_files_per_trigger=2)

    exp = oracle_state(spark, CFG)
    got = p.table().read()
    cols = PAYLOAD_COLS
    assert checksum(got.select(*cols), cols) == checksum(exp.select(*cols), cols)

    # the fenced epoch appears exactly once in lineage and merge history
    lin = p.lineage().filter(F.col("epoch") == 1)
    assert lin.groupBy("bucket").count().filter("count > 1").count() == 0
    merges_e1 = [
        m
        for m in p.table().history()
        if m["summary"].get("epoch") == 1 and m["summary"].get("op", "merge") == "merge"
    ]
    assert len(merges_e1) == 1, "epoch 1 must be applied exactly once"


def test_mid_stream_schema_evolution_restart(spark, tmpdir_path):
    """Start on v1-only WAL (no meta), then v2 files appear; a restart
    discovers and promotes the new column; old rows read as NULL."""
    cfg = WalConfig(n_events=6_000, n_convs=100, seed=21)
    wal_all = os.path.join(tmpdir_path, "wal")
    write_wal_files(spark, cfg, wal_all, n_files=6)
    staged = os.path.join(tmpdir_path, "staged")
    os.makedirs(staged)
    os.symlink(os.path.join(wal_all, "v1"), os.path.join(staged, "v1"))

    base = tmpdir_path
    p = run_pipeline(spark, staged, base)
    assert "meta" not in [f.name for f in p.table().schema().fields]

    # v2 generation lands; pipeline restarts (same checkpoint!)
    os.symlink(os.path.join(wal_all, "v2"), os.path.join(staged, "v2"))
    p = run_pipeline(spark, staged, base)
    got = p.table().read()
    assert "meta" in got.columns
    assert got.filter(F.col("meta").isNotNull()).count() > 0

    exp = oracle_state(spark, cfg)
    cols = PAYLOAD_COLS
    assert checksum(got.select(*cols), cols) == checksum(exp.select(*cols), cols)


def test_mor_pipeline_matches_cow_and_oracle(spark, wal_dir, tmpdir_path):
    """Merge-on-read mode: per-batch O(batch) delta appends + mid-run
    compaction must converge to the same table as CoW and the batch
    oracle."""
    base = os.path.join(tmpdir_path, "mor")
    os.makedirs(base)
    p = run_pipeline(
        spark, wal_dir, base, max_files_per_trigger=2,
        merge_mode="mor", compact_every_epochs=2,
    )
    got = p.table().read()
    exp = oracle_state(spark, CFG)
    cols = PAYLOAD_COLS
    assert checksum(got.select(*cols), cols) == checksum(exp.select(*cols), cols)
    # a key updated in several epochs appears exactly once after the fold
    assert got.groupBy("conv_id", "turn_idx").count().filter("count > 1").count() == 0
    ops = [m["summary"].get("op") for m in p.table().history()]
    assert "merge-mor" in ops and "compact" in ops

    # final manual compaction folds every bucket to one file set and
    # drops all tombstones; result unchanged
    from odibel_spark.lake.merge import compact_buckets

    compact_buckets(p.table(), tombstone_gc_below_lsn=2**62)
    after = p.table().read()
    assert checksum(after.select(*cols), cols) == checksum(exp.select(*cols), cols)
    raw = p.table().read(fold=False, include_tombstones=True)
    assert raw.filter(F.col("_deleted")).count() == 0


def test_mor_pipeline_clustered_compaction(spark, wal_dir, tmpdir_path):
    """compact_cluster_by: the pipeline's periodic compaction doubles
    as OPTIMIZE — after the run's final in-stream compaction, every
    compaction-written bucket file is sorted by (conv_id, _lsn) in the
    raw parquet bytes (the layout pushed-down range filters prune row
    groups on), and the table still equals the batch oracle."""
    import pyarrow.parquet as pq

    base = os.path.join(tmpdir_path, "morcl")
    os.makedirs(base)
    p = run_pipeline(
        spark, wal_dir, base, max_files_per_trigger=2,
        merge_mode="mor", compact_every_epochs=2,
        compact_cluster_by=("_lsn",),
    )
    got = p.table().read()
    exp = oracle_state(spark, CFG)
    cols = PAYLOAD_COLS
    assert checksum(got.select(*cols), cols) == checksum(exp.select(*cols), cols)
    t = p.table()
    # the last compaction commit's surviving files are the clustered set;
    # post-compaction merge epochs may have appended newer delta files
    hist = t.history()
    compact_vs = [m["version"] for m in hist if m["summary"].get("op") == "compact"]
    assert compact_vs, "pipeline never compacted"
    compacted = {f["path"] for f in t.files(version=compact_vs[-1])} & {
        f["path"] for f in t.files()
    }
    assert compacted, "no compaction-written file survived to HEAD"
    for path in compacted:
        tbl = pq.read_table(
            os.path.join(t.root, path), columns=["conv_id", "_lsn"]
        )
        pairs = list(zip(tbl.column("conv_id").to_pylist(), tbl.column("_lsn").to_pylist()))
        assert pairs == sorted(pairs), path


def test_mor_crash_restart_exactly_once(spark, wal_dir, tmpdir_path):
    base = os.path.join(tmpdir_path, "morcrash")
    os.makedirs(base)
    with pytest.raises(Exception):
        run_pipeline(
            spark, wal_dir, base, max_files_per_trigger=2,
            merge_mode="mor", fail_after_commit_epoch=1, compact_every_epochs=None,
        )
    p = run_pipeline(
        spark, wal_dir, base, max_files_per_trigger=2,
        merge_mode="mor", compact_every_epochs=None,
    )
    exp = oracle_state(spark, CFG)
    got = p.table().read()
    cols = PAYLOAD_COLS
    assert checksum(got.select(*cols), cols) == checksum(exp.select(*cols), cols)
    merges_e1 = [
        m for m in p.table().history() if m["summary"].get("epoch") == 1
        and m["summary"].get("op") == "merge-mor"
    ]
    assert len(merges_e1) == 1, "epoch 1 must be applied exactly once"


def test_normalizer_promotes_legacy_variants(spark):
    from odibel_spark.cdc import normalize_batch

    df = spark.createDataFrame(
        # tab/newline padding: the codegen path must strip ALL
        # whitespace exactly like the pandas path's str.strip()
        [("Human", " CALC "), ("ai", "web_search"), ("tool", None), (None, "python"),
         ("Bot\t", "calc\t"), ("\nfunction ", " browse\n")],
        "role string, tool string",
    )
    out = normalize_batch(df).collect()
    assert [r.role for r in out] == ["user", "assistant", "tool", None, "assistant", "tool"]
    assert [r.tool for r in out] == [
        "calculator", "search", None, "code_interpreter", "calculator", "browser",
    ]

    # the Arrow pandas-UDF path (schema-evolution escape hatch) must
    # agree exactly with the codegen expression path
    pd_out = normalize_batch(df, use_pandas=True).collect()
    assert pd_out == out


def test_maintenance_compacts_and_vacuums(spark, wal_dir, tmpdir_path):
    base = os.path.join(tmpdir_path, "maint")
    os.makedirs(base)
    p = run_pipeline(
        spark, wal_dir, base, max_files_per_trigger=2,
        merge_mode="mor", compact_every_epochs=None,
    )
    exp = oracle_state(spark, CFG)
    n_files_before = len(p.table().files())
    v_before_maint = p.table().current_version()
    out = p.maintenance(keep_versions=1, vacuum_grace_seconds=0)
    assert out["compacted"] and out["vacuumed_files"] > 0
    # compaction bounds files to one set per bucket; data unchanged
    assert len(p.table().files()) <= n_files_before
    cols = PAYLOAD_COLS
    assert checksum(p.table().read().select(*cols), cols) == checksum(exp.select(*cols), cols)
    # vacuumed files are really gone from disk; live files all present
    import os as _os
    for f in p.table().files():
        assert _os.path.exists(_os.path.join(p.table_root, f["path"]))
    # maintenance-triggered compaction must stay changelog-invisible:
    # the op tag is non-overridable, so a changes() range spanning the
    # maintenance commit emits zero spurious change rows.
    v_after = p.table().current_version()
    assert p.table().changes(v_before_maint, v_after).count() == 0, (
        "maintenance compaction leaked into the changelog"
    )


def test_rollback_reprocess_with_fresh_checkpoint_converges(spark, wal_dir, tmpdir_path):
    """The reprocess recipe LakeTable.rollback documents: roll the
    table back, then restart the pipeline with a FRESH checkpoint and
    a FRESH stream_id (fence −1). Spark's file source re-reads the
    whole feed, epoch numbering restarts at 0 under the new fence, and
    LSN fencing folds the re-applied events idempotently — the final
    state converges to the batch oracle even though half the feed was
    applied twice across two stream identities. (Resuming the OLD
    checkpoint/stream_id after a rollback is the reset posture — the
    source would never re-deliver consumed files — covered by the
    docstring; this test pins the replay arm actually converging.)"""
    base = os.path.join(tmpdir_path, "rbrepro")
    os.makedirs(base)
    p = run_pipeline(
        spark, wal_dir, base, max_files_per_trigger=3, merge_mode="mor"
    )
    t = p.table()
    v_mid = max(2, t.current_version() // 2)
    t.rollback(v_mid)
    exp = oracle_state(spark, CFG)
    cols = PAYLOAD_COLS
    assert checksum(t.read().select(*cols), cols) != checksum(exp.select(*cols), cols), (
        "rollback should leave the table behind the full-feed state"
    )

    cfg = PipelineConfig(
        wal_dirs=[wal_dir],
        table_root=os.path.join(base, "transcripts"),
        checkpoint_dir=os.path.join(base, "ckpt-reprocess"),
        stream_id="wal-reprocess",
        buckets=8,
        max_files_per_trigger=3,
        merge_mode="mor",
    )
    p2 = TranscriptCdcPipeline(spark, cfg)
    p2.run_available()
    got = p2.table().read()
    assert checksum(got.select(*cols), cols) == checksum(exp.select(*cols), cols)


def test_randomized_multi_crash_gauntlet(spark, wal_dir, tmpdir_path):
    """North-rule wording: byte-identical final table under RANDOMIZED
    crash/restart. Seeded RNG picks several crash epochs; the pipeline
    is killed after each corresponding lake commit (the worst ordering:
    data committed, checkpoint not) and restarted, ending with a clean
    drain. Both merge modes must converge to the batch oracle."""
    import random

    rng = random.Random(4242)
    exp = oracle_state(spark, CFG)
    cols = PAYLOAD_COLS
    for mode in ("cow", "mor"):
        base = os.path.join(tmpdir_path, f"gauntlet-{mode}")
        os.makedirs(base)
        crash_epochs = sorted(rng.sample(range(5), k=2))
        for epoch in crash_epochs:
            with pytest.raises(Exception):
                run_pipeline(
                    spark, wal_dir, base, max_files_per_trigger=1,
                    merge_mode=mode, compact_every_epochs=3,
                    fail_after_commit_epoch=epoch,
                )
        p = run_pipeline(
            spark, wal_dir, base, max_files_per_trigger=1,
            merge_mode=mode, compact_every_epochs=3,
        )
        got = p.table().read()
        assert checksum(got.select(*cols), cols) == checksum(exp.select(*cols), cols), mode
        # every applied epoch exactly once in the commit history
        applied = [
            m["summary"]["epoch"]
            for m in p.table().history()
            if m["summary"].get("op") in ("merge", "merge-mor") and "epoch" in m["summary"]
        ]
        assert len(applied) == len(set(applied)), f"{mode}: an epoch was applied twice"


def test_auto_salt_splits_hot_conversation_bucket(spark, tmpdir_path):
    """write_salt="auto" (the default) must split a skew-dominated
    bucket's commit across multiple files — one viral conversation
    otherwise serializes every commit behind a single straggler task —
    while leaving results identical and balanced batches unsalted."""
    import pyspark.sql.types as T

    from odibel_spark.lake.table import LakeTable

    # 90% of events in ONE conversation → its bucket is ~9x the mean
    rows = [
        (i + 1, "insert", ("conv-hot" if i % 10 else f"conv-{i}"), i % 40,
         "user", f"m{i}", None, None)
        for i in range(4000)
    ]
    schema = ("lsn long, op string, conv_id string, turn_idx int, role string, "
              "text string, tool string, ts timestamp")
    wal = os.path.join(tmpdir_path, "hotwal")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(wal)

    p = run_pipeline(spark, wal, os.path.join(tmpdir_path, "hot"), merge_mode="mor")
    t = p.table()
    by_bucket: dict = {}
    for f in t.files():
        by_bucket.setdefault(f["bucket"], []).append(f)
    hot_files = max(by_bucket.values(), key=lambda fs: sum(x["rows"] for x in fs))
    assert len(hot_files) > 1, "hot bucket commit should be salted across files"
    assert t.read().count() == spark.createDataFrame(rows, schema).dropDuplicates(
        ["conv_id", "turn_idx"]
    ).count()


def test_rocksdb_state_store_end_to_end(spark, wal_dir, tmpdir_path):
    """state_store="rocksdb" swaps the watermarked-dedup keyed state to
    RocksDBStateStoreProvider with changelog checkpointing — the
    10^10-event posture where dedup state outgrows executor heap. Same
    WAL, same oracle: the final table must be byte-identical to the
    heap-backed run, the checkpoint must contain RocksDB changelog
    artifacts (proof the provider was active), and the session conf
    must be restored after start (no leakage into later queries)."""
    before = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    p = run_pipeline(
        spark, wal_dir, tmpdir_path, max_files_per_trigger=3, state_store="rocksdb"
    )
    assert spark.conf.get("spark.sql.streaming.stateStore.providerClass", None) == before

    got = p.table().read()
    exp = oracle_state(spark, CFG)
    cols = PAYLOAD_COLS
    assert checksum(got.select(*cols), cols) == checksum(exp.select(*cols), cols)

    state_dir = os.path.join(tmpdir_path, "ckpt", "state")
    arts = [
        name
        for root, _dirs, names in os.walk(state_dir)
        for name in names
        if name.endswith((".changelog", ".zip"))
    ]
    assert arts, "no RocksDB changelog/snapshot artifacts under the checkpoint state dir"


def test_state_store_rejects_unknown_backend(spark, wal_dir, tmpdir_path):
    with pytest.raises(ValueError, match="state_store"):
        run_pipeline(spark, wal_dir, tmpdir_path, state_store="leveldb")


def test_rocksdb_crash_restart_exactly_once(spark, wal_dir, tmpdir_path):
    """The north rule's resume clause under the RocksDB backend: crash
    after the lake commit of epoch 1 (worst ordering — lake advanced,
    checkpoint not), then restart WITHOUT re-requesting RocksDB (the
    default heap config) — the provider CLASS pinned in the
    checkpoint's offset metadata must keep the resumed query on
    RocksDB. Note the documented asymmetry (PipelineConfig.state_store):
    only the provider class is pinned; changelog checkpointing is not,
    so the heap-default resume reverts to full-snapshot uploads —
    production resumes should keep state_store='rocksdb'. The restart
    must fence the replayed epoch and converge byte-identically to the
    batch oracle."""
    with pytest.raises(Exception):  # Spark wraps the injected RuntimeError
        run_pipeline(
            spark, wal_dir, tmpdir_path, max_files_per_trigger=2,
            state_store="rocksdb", fail_after_commit_epoch=1,
        )
    state_dir = os.path.join(tmpdir_path, "ckpt", "state")

    def rocksdb_artifacts():
        return {
            os.path.join(root, name)
            for root, _dirs, names in os.walk(state_dir)
            for name in names
            if name.endswith((".changelog", ".zip"))
        }

    before_restart = rocksdb_artifacts()
    assert before_restart, "crashed run left no RocksDB artifacts to resume from"
    # resume with the DEFAULT (heap) config: pinning must hold anyway
    p = run_pipeline(spark, wal_dir, tmpdir_path, max_files_per_trigger=2)
    exp = oracle_state(spark, CFG)
    got = p.table().read()
    cols = PAYLOAD_COLS
    assert checksum(got.select(*cols), cols) == checksum(exp.select(*cols), cols)
    lin = p.lineage().filter(F.col("epoch") == 1)
    assert lin.groupBy("bucket").count().filter("count > 1").count() == 0
    # the resumed epochs committed NEW RocksDB-format state artifacts
    # (snapshot .zip — changelog checkpointing was not re-requested),
    # proving the provider survived the heap-default session
    assert rocksdb_artifacts() - before_restart, (
        "restart produced no new RocksDB state artifacts — provider pinning not exercised"
    )
