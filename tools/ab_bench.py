"""Interleaved same-JVM A/B bench → machine-readable artifact.

VERDICT r2 established the host-noise ground rule (BENCH/BASELINE.md
variance appendix): on this shared sandbox only *interleaved*
comparisons inside one JVM/process are trustworthy — sequential
cross-process numbers swing several-fold with neighbor load. Round 2's
trigger-posture A/B (one-batch vs per-file cadence, 2.2×) was recorded
only as prose; this tool persists such comparisons as JSON artifacts
next to BENCH/BASELINE.md so cross-round perf claims are auditable.

Protocol: warmup rep of each arm, then ``reps`` interleaved cells
(A, B, A, B, ...), best-of per arm as the headline (minimum is the
noise-robust statistic on a contended host), all cells recorded.

Usage:
    python tools/ab_bench.py trigger_posture [--events 1000000] [--reps 3]
    python tools/ab_bench.py lsh_mass_dup    [--copies 20000] [--reps 3]
    python tools/ab_bench.py lsh_clean_corpus [--docs 20000] [--reps 3]
    python tools/ab_bench.py shingle_tokenize [--docs 20000] [--words 50] [--reps 3]
    python tools/ab_bench.py infer_filter_pushdown [--docs 20000] [--words 200] [--reps 3]
    python tools/ab_bench.py profile_cse [--docs 20000] [--words 120] [--reps 3]
    python tools/ab_bench.py kmeans_divide [--docs 200000] [--reps 3]   (--docs = vector count)
    python tools/ab_bench.py stream_dedup [--events 1000000] [--reps 3]
    python tools/ab_bench.py state_store     [--events 1000000] [--reps 3]
    python tools/ab_bench.py state_store_pressure --events 8000000 --heap 2g --timeout 2100
        (argparse defaults are 1M/1g/900 — too light for the heap arm
        to OOM; the recorded artifact's invocation is the line above)
    python tools/ab_bench.py triples_cache [--reps 3]   (negative result, kept on purpose)
    python tools/ab_bench.py cluster_layout [--events 2000000] [--reps 3]   (--events = row count)
    python tools/ab_bench.py compact_cluster [--events 4000000] [--reps 3]  (--events = row count)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "BENCH")


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def run_ab(name: str, spark, arms: dict, reps: int, meta: dict) -> dict:
    """arms: {label: callable() -> None}. Interleave reps after one
    unrecorded warmup per arm; write BENCH/ab_<name>.json."""
    from bench import cpu_reference_miters_fixedwork

    labels = list(arms)
    for lbl in labels:  # warmup: JIT/codegen/session costs paid outside cells
        arms[lbl]()
    cells: list[dict] = []
    for rep in range(reps):
        for lbl in labels:
            t0 = time.perf_counter()
            arms[lbl]()
            cells.append({"rep": rep, "arm": lbl, "sec": round(time.perf_counter() - t0, 3)})
    best = {lbl: min(c["sec"] for c in cells if c["arm"] == lbl) for lbl in labels}
    a, b = labels[0], labels[1]
    artifact = {
        "name": name,
        "protocol": "interleaved same-JVM, 1 warmup/arm, best-of-%d" % reps,
        "arms": labels,
        "best_sec": best,
        # how many times faster arm b's best is than arm a's best
        "speedup_b_vs_a": round(best[a] / best[b], 3) if best[b] else None,
        # generalization for ≥3-arm runs: each arm's speedup vs arm 0
        "speedup_vs_first": {
            lbl: (round(best[a] / best[lbl], 3) if best[lbl] else None) for lbl in labels[1:]
        },
        "cells": cells,
        "cpu_ref_miters_fixedwork": round(cpu_reference_miters_fixedwork(), 1),
        **meta,
    }
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, f"ab_{name}.json")
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({k: v for k, v in artifact.items() if k != "cells"}))
    print(f"wrote {os.path.normpath(path)}")
    return artifact


def ab_trigger_posture(spark, events: int, reps: int) -> None:
    """bench.py's one-big-micro-batch posture vs the default per-file
    cadence, on the identical WAL — the r2 prose claim as an artifact."""
    from odibel_spark.cdc import PipelineConfig, TranscriptCdcPipeline, WalConfig, write_wal_files

    base = tempfile.mkdtemp(prefix="ab-trigger-")
    cpus = spark.sparkContext.defaultParallelism
    n_files = max(8, cpus // 2)
    wal = write_wal_files(
        spark, WalConfig(n_events=events, n_convs=max(events // 50, 100), seed=42),
        os.path.join(base, "wal"), n_files=n_files,
    )
    seq = [0]

    def run(max_files: int | None) -> None:
        seq[0] += 1
        root = os.path.join(base, f"t{seq[0]}")
        p = TranscriptCdcPipeline(
            spark,
            PipelineConfig(
                wal_dirs=[wal], table_root=os.path.join(root, "tbl"),
                checkpoint_dir=os.path.join(root, "ckpt"), buckets=cpus,
                merge_mode="mor", max_files_per_trigger=max_files,
            ),
        )
        p.run_available()
        shutil.rmtree(root, ignore_errors=True)

    try:
        run_ab(
            "trigger_posture", spark,
            {"per_file_cadence": lambda: run(1), "one_batch": lambda: run(None)},
            reps,
            {"events": events, "wal_files": n_files,
             "note": "MoR pipeline, identical WAL; one_batch = no trigger limit, the whole "
                     "backlog in ONE data micro-batch (bench.py headline posture since r4 — "
                     "maxFilesPerTrigger=n_files was off by one, the schema-evolution segment "
                     "adds a physical file), per_file_cadence = maxFilesPerTrigger=1"},
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def ab_lsh_mass_dup(spark, copies: int, reps: int) -> None:
    """LSH candidate generation WITH vs WITHOUT the r3 fingerprint
    pre-collapse, on a mass-duplicate corpus (the degenerate-bucket
    workload VERDICT r2 named as the one scale-killer)."""
    import pyspark.sql.functions as F

    from odibel_spark.functions.dedup import minhash_lsh_candidates

    n_distinct = 50
    # each variant is 20 md5-derived words — variants share (almost) no
    # shingles, so the only skew is the in-group mass duplication. (A
    # shared-prefix fixture makes every variant a near-dup of every
    # other, which turns the TRUE output quadratic in the corpus — that
    # measures output size, not the collapse.)
    variant = (F.col("id") % n_distinct).cast("string")
    words = F.transform(
        F.sequence(F.lit(1), F.lit(20)),
        lambda j: F.md5(F.concat(variant, F.lit("_"), j.cast("string"))),
    )
    docs = (
        spark.range(copies)
        .select(F.col("id").alias("doc_id"), F.concat_ws(" ", words).alias("text"))
        .repartition(16)
    )
    docs.cache().count()

    def run(collapse) -> None:
        # cap disabled so every arm generates the identical full pair set
        pairs = minhash_lsh_candidates(
            docs, "doc_id", "text", max_bucket_size=None, collapse=collapse
        )
        materialize(pairs.agg(F.count("*").alias("n")))

    try:
        run_ab(
            "lsh_mass_dup", spark,
            {"uncollapsed": lambda: run(False), "collapsed": lambda: run(True),
             "auto": lambda: run("auto")},
            reps,
            {"docs": copies, "distinct_texts": n_distinct,
             "note": "LSH candidate generation on a corpus of `docs` documents with only "
                     "`distinct_texts` distinct contents (mass-duplicate skew). collapsed = "
                     "r3 fingerprint pre-collapse (reps shingle once; in-group pairs from a "
                     "distributed fingerprint self-join); uncollapsed = pre-r3 shape (every "
                     "copy in every band bucket, single-task array explosion per bucket); "
                     "auto = r5 sampled duplicate-rate probe (must pick the collapsed arm "
                     "here and keep its win, probe cost included). Output pair sets are "
                     "equal (tests/test_dedup_skew.py); cap disabled so all arms do full "
                     "work"},
        )
    finally:
        docs.unpersist()


def ab_lsh_clean_corpus(spark, docs_n: int, reps: int) -> None:
    """The collapse knob's cost at the OTHER extreme from lsh_mass_dup:
    an all-distinct corpus, where the fingerprint pre-collapse buys
    nothing and its extra shuffle + expansion joins are pure tax. Both
    arms are the public API (``collapse=`` parameter, r4); together the
    two artifacts bound the knob: collapse wins ~4× under mass
    duplication, costs this much when the corpus is already clean."""
    import pyspark.sql.functions as F

    from odibel_spark.functions.dedup import minhash_lsh_candidates

    words = F.transform(
        F.sequence(F.lit(1), F.lit(20)),
        lambda j: F.md5(F.concat(F.col("id").cast("string"), F.lit("_"), j.cast("string"))),
    )
    docs = (
        spark.range(docs_n)
        .select(F.col("id").alias("doc_id"), F.concat_ws(" ", words).alias("text"))
        .repartition(16)
    )
    docs.cache().count()

    def run(collapse):
        pairs = minhash_lsh_candidates(
            docs, "doc_id", "text", max_bucket_size=None, collapse=collapse
        )
        materialize(pairs.agg(F.count("*").alias("n")))

    try:
        run_ab(
            "lsh_clean_corpus", spark,
            {"collapsed": lambda: run(True), "uncollapsed": lambda: run(False),
             "auto": lambda: run("auto")},
            reps,
            {"docs": docs_n, "distinct_texts": docs_n,
             "note": "LSH candidate generation on an all-distinct corpus: collapsed = "
                     "default skew guard (fingerprint shuffle is pure overhead here), "
                     "uncollapsed = collapse=False (the documented knob for corpora "
                     "already exact-deduped upstream), auto = r5 sampled duplicate-rate "
                     "probe (should land within ~1.3x of uncollapsed, probe cost "
                     "included). Output pair sets are equal; speedup_b_vs_a quantifies "
                     "the clean-corpus tax the default guard costs"},
        )
    finally:
        docs.unpersist()


def ab_state_store(spark, events: int, reps: int) -> None:
    """r4 state-store knob cost at bench scale: the full MoR pipeline
    (in-stream watermarked dedup ON) with the default heap-backed
    provider vs RocksDB + changelog checkpointing, identical WAL.
    RocksDB pays JNI + disk-format overhead while state fits in heap —
    this artifact quantifies that so the docs' 'switch when state
    outgrows memory' guidance has a measured price tag."""
    from odibel_spark.cdc import PipelineConfig, TranscriptCdcPipeline, WalConfig, write_wal_files

    base = tempfile.mkdtemp(prefix="ab-statestore-")
    cpus = spark.sparkContext.defaultParallelism
    n_files = max(8, cpus // 2)
    wal = write_wal_files(
        spark, WalConfig(n_events=events, n_convs=max(events // 50, 100), seed=42),
        os.path.join(base, "wal"), n_files=n_files,
    )
    seq = [0]

    def run(backend: str) -> None:
        seq[0] += 1
        root = os.path.join(base, f"t{seq[0]}")
        p = TranscriptCdcPipeline(
            spark,
            PipelineConfig(
                wal_dirs=[wal], table_root=os.path.join(root, "tbl"),
                checkpoint_dir=os.path.join(root, "ckpt"), buckets=cpus,
                merge_mode="mor", max_files_per_trigger=None, state_store=backend,
            ),
        )
        p.run_available()
        shutil.rmtree(root, ignore_errors=True)

    try:
        run_ab(
            "state_store", spark,
            {"hdfs_heap": lambda: run("hdfs"), "rocksdb": lambda: run("rocksdb")},
            reps,
            {"events": events, "wal_files": n_files,
             "note": "full MoR pipeline incl. watermarked dedup, one-batch trigger, "
                     "identical WAL; speedup_b_vs_a < 1 is the RocksDB overhead while "
                     "state fits in heap — the backend's win case (state > memory) "
                     "cannot manifest at this scale by construction"},
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _pressure_child(backend: str, wal: str, root: str, cpus: int) -> None:
    """Child JVM for ab_state_store_pressure: run the MoR pipeline with
    the given state-store backend under the heap the parent pinned via
    SPARK_GRAFT_DRIVER_MEM, print one JSON line. Exits nonzero (or the
    JVM aborts) when the backend can't sustain the state.

    Two knobs are load-bearing, each killing one confound:
    - ``max_files_per_trigger=1``: one WAL file per micro-batch keeps
      the per-batch shuffle working set far under the pinned heap (the
      first recording used one-batch ingestion and both arms OOMed in
      the ingest shuffle before state size ever mattered).
    - ``watermark_delay="36500 days"``: the synthetic WAL's event time
      advances ~1 s/event, so the default 300 s watermark evicts each
      batch's dedup state as the next batch arrives and the store
      never grows past ~events/16 entries (the second recording: both
      arms finished comfortably). An effectively-infinite delay keeps
      every (conv_id, turn_idx, lsn) entry live, so state climbs to
      `events` entries by the final batch — the actual variable under
      test."""
    from odibel_spark import get_spark
    from odibel_spark.cdc import PipelineConfig, TranscriptCdcPipeline

    spark = get_spark(f"pressure-{backend}", cpus=cpus, shuffle_partitions=cpus * 2)
    t0 = time.perf_counter()
    p = TranscriptCdcPipeline(
        spark,
        PipelineConfig(
            wal_dirs=[wal], table_root=os.path.join(root, "tbl"),
            checkpoint_dir=os.path.join(root, "ckpt"), buckets=cpus,
            merge_mode="mor", max_files_per_trigger=1, state_store=backend,
            watermark_delay="36500 days",
        ),
    )
    p.run_available()
    sec = round(time.perf_counter() - t0, 3)
    rows = p.table().read().count()
    print(json.dumps({"backend": backend, "sec": sec, "rows": rows, "ok": True}))
    spark.stop()


def ab_state_store_pressure(events: int, heap: str, cpus: int, timeout_s: int) -> None:
    """The RocksDB backend's REASON TO EXIST (r4 VERDICT item #4):
    ab_state_store showed only the overhead case (state fits in heap,
    RocksDB 0.88×). Here every event carries a DISTINCT conv_id, so the
    in-stream dedup accumulates `events` state entries over the run,
    fed one WAL file per micro-batch (events/16 rows each — small
    enough that no single batch's working set presses the heap), and
    each arm runs in its own child JVM whose heap is pinned small
    (SPARK_GRAFT_DRIVER_MEM — local mode, so driver heap IS the
    executor heap). The heap-backed HDFS provider keeps the full state
    map on-heap and degrades/aborts as state grows; RocksDB keeps it
    native/on-disk and sustains.

    Protocol deviates from run_ab on purpose: arms NEED separate JVMs
    (heap is a JVM-launch knob), and the comparison is
    survive-vs-degrade, not an interleaved timing delta."""
    import subprocess

    from odibel_spark import get_spark
    from odibel_spark.cdc import WalConfig, write_wal_files

    base = tempfile.mkdtemp(prefix="ab-pressure-")
    try:
        spark = get_spark("ab-pressure-gen", cpus=cpus, shuffle_partitions=cpus * 2)
        wal = write_wal_files(
            spark, WalConfig(n_events=events, n_convs=events, seed=42),
            os.path.join(base, "wal"), n_files=16,
        )
        spark.stop()  # children get the host to themselves
        arms = {}
        for i, backend in enumerate(["rocksdb", "hdfs"]):
            env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=heap)
            t0 = time.perf_counter()
            try:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "state_store_pressure",
                     "--pressure-child", backend, wal, os.path.join(base, f"run{i}"),
                     "--cpus", str(cpus)],
                    env=env, capture_output=True, text=True, timeout=timeout_s,
                )
                line = next(
                    (ln for ln in reversed(r.stdout.splitlines()) if ln.startswith("{")), None
                )
                if r.returncode == 0 and line:
                    arms[backend] = json.loads(line)
                else:
                    err = (r.stderr or "") + "\n" + (r.stdout or "")
                    # surface the OOM evidence if present (Spark's
                    # uncaught-exception handler exits the JVM, so the
                    # py4j tail alone just says "connection refused")
                    oom = [
                        ln.strip() for ln in err.splitlines()
                        if any(m in ln for m in ("OutOfMemory", "Java heap space", "GC overhead"))
                    ][:4]
                    tail = err.strip().splitlines()[-6:]
                    arms[backend] = {
                        "backend": backend, "ok": False, "rc": r.returncode,
                        "sec": round(time.perf_counter() - t0, 3),
                        "oom_evidence": oom,
                        "error_tail": tail,
                    }
            except subprocess.TimeoutExpired:
                arms[backend] = {
                    "backend": backend, "ok": False, "rc": "timeout",
                    "sec": timeout_s,
                    "error_tail": [f"no completion within {timeout_s}s (GC-thrash degradation)"],
                }
        artifact = {
            "name": "state_store_pressure",
            "protocol": "one child JVM per arm, heap pinned via SPARK_GRAFT_DRIVER_MEM, "
                        "16 WAL files fed one per micro-batch (maxFilesPerTrigger=1) so "
                        "only accumulated state — not per-batch working set — presses the "
                        "heap; survive-vs-degrade comparison (separate JVMs required, so "
                        "not interleaved — the interleaved overhead case is ab_state_store)",
            "events": events, "distinct_convs": events, "heap": heap, "cpus": cpus,
            "timeout_s": timeout_s, "watermark_delay": "36500 days",
            "files_per_trigger": 1, "wal_files": 16,
            "arms": arms,
            "note": "every event is its own conv_id, so the watermarked in-stream dedup "
                    "accumulates `events` state entries across 16 micro-batches of "
                    "events/16 rows each. The crossover: the heap-backed provider must "
                    "fail or degrade past timeout while RocksDB completes and both-arm "
                    "row counts (when both finish) agree.",
        }
        os.makedirs(OUT_DIR, exist_ok=True)
        path = os.path.join(OUT_DIR, "ab_state_store_pressure.json")
        with open(path, "w") as f:
            json.dump(artifact, f, indent=1)
        print(json.dumps({k: v for k, v in artifact.items() if k != "arms"}))
        print(json.dumps(arms))
        print(f"wrote {os.path.normpath(path)}")
    finally:
        shutil.rmtree(base, ignore_errors=True)


def ab_shingle_tokenize(spark, docs_n: int, reps: int, words_n: int = 50) -> None:
    """r4 shingle-stage rewrite: tokenizing INSIDE the transform lambda
    re-evaluates the regex-normalize + split once per array ELEMENT
    (Catalyst does not hoist non-attribute lambda captures), i.e.
    O(words × doc_len) string work per document; materializing the
    words array in its own projection first (_split_words) makes each
    lambda call an O(1) attribute reference. Both arms produce the
    identical distinct (id, shingle) set; the word count per doc (~50)
    bounds the expected ratio."""
    import pyspark.sql.functions as F

    from odibel_spark.functions.dedup import _shingles_from_words, _split_words
    from odibel_spark.functions.text import normalized_text

    words = F.transform(
        F.sequence(F.lit(1), F.lit(words_n)),
        lambda j: F.substring(
            F.md5(F.concat(F.col("id").cast("string"), F.lit("_"), j.cast("string"))), 1, 6
        ),
    )
    docs = (
        spark.range(docs_n)
        .select(F.col("id").alias("doc_id"), F.concat_ws(" ", words).alias("text"))
        .repartition(16)
    )
    docs.cache().count()

    def run_inline():  # pre-r4 shape: tokenize captured by the lambda
        toks = F.split(normalized_text(F.col("text")), r"\s+")
        idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - 3 + 1, F.lit(1)))
        arr = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, 3)))
        sh = (
            docs.select(F.col("doc_id"), F.explode(arr).alias("shingle"))
            .filter(F.length("shingle") > 0)
            .distinct()
        )
        materialize(sh.agg(F.count("*").alias("n")))

    def run_materialized():  # r4 shape: words array projected first
        sh = (
            docs.select(F.col("doc_id"), _split_words(F.col("text")).alias("_w"))
            .select(F.col("doc_id"), F.explode(_shingles_from_words(F.col("_w"), 3)).alias("shingle"))
            .filter(F.length("shingle") > 0)
            .distinct()
        )
        materialize(sh.agg(F.count("*").alias("n")))

    try:
        run_ab(
            f"shingle_tokenize_w{words_n}", spark,
            {"inline_tokenize": run_inline, "materialized_words": run_materialized},
            reps,
            {"docs": docs_n, "words_per_doc": words_n,
             "note": "distinct 3-gram shingle build, identical output both arms; "
                     "speedup_b_vs_a = cost of re-tokenizing per transform element "
                     "vs one materialized words projection per row"},
        )
    finally:
        docs.unpersist()


def ab_infer_filter_pushdown(spark, docs_n: int, reps: int, words_n: int = 50) -> None:
    """r4 decontamination fix #2: exploding the aliased shingle-array
    ATTRIBUTE makes InferFiltersFromGenerate add size(arr)>0 under the
    Generate, and predicate pushdown substitutes the alias chain into
    the scan Filter — re-inlining the whole shingle build (per-element
    tokenize included) once per corpus row. _explode_no_infer wraps the
    attribute in array_compact so the rule declines to infer. Both arms
    run the full benchmark_contamination shape on the same corpus."""
    import pyspark.sql.functions as F

    from odibel_spark.functions.dedup import (
        _explode_no_infer,
        _shingles_from_words,
        _split_words,
        word_shingles,
    )

    words = F.transform(
        F.sequence(F.lit(1), F.lit(words_n)),
        lambda j: F.substring(
            F.md5(F.concat((F.col("id") % 499).cast("string"), F.lit("_"), j.cast("string"))), 1, 6
        ),
    )
    docs = (
        spark.range(docs_n)
        .select(F.col("id").alias("doc_id"), F.concat_ws(" ", words).alias("text"))
        .repartition(16)
    )
    docs.cache().count()
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    bench = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("_bid"), "text"
    )

    def contamination(explode_shape) -> None:
        valid = F.filter(
            F.array_distinct(_shingles_from_words(F.col("_w"), 3)),
            lambda sh: F.length(sh) > 0,
        )
        d_sh = (
            corpus.select(F.col("doc_id"), _split_words(F.col("text")).alias("_w"))
            .select(F.col("doc_id"), valid.alias("_sh"))
            .select(
                F.col("doc_id"),
                F.size("_sh").alias("doc_shingles"),
                explode_shape(F.col("_sh")).alias("shingle"),
            )
        )
        b_sh = F.broadcast(word_shingles(bench, "_bid", "text", 3))
        out = (
            d_sh.join(b_sh, "shingle")
            .groupBy("doc_id", "_bid")
            .agg(F.count("*").alias("n_shared"))
            .filter(F.col("n_shared") >= 3)
        )
        materialize(out.agg(F.count("*").alias("n")))

    try:
        run_ab(
            "infer_filter_pushdown", spark,
            {
                "attr_explode": lambda: contamination(F.explode),
                "no_infer_explode": lambda: contamination(_explode_no_infer),
            },
            reps,
            {"docs": docs_n, "words_per_doc": words_n,
             "note": "benchmark_contamination shape, identical output both arms; "
                     "attr_explode lets InferFiltersFromGenerate re-inline the shingle "
                     "build into the scan Filter, no_infer_explode suppresses it"},
        )
    finally:
        docs.unpersist()


def ab_profile_cse(spark, docs_n: int, reps: int, words_n: int = 120) -> None:
    """r5 text-profile rewrite: codegen subexpression elimination does
    not dedupe higher-order-function subtrees, so the naive composition
    of stopword_ratio + quality_score + language_id + token_count over
    one text column re-tokenizes the document once per metric (~50
    regexp/split plan nodes). profile_documents materializes tokens()
    in one inner projection. Both arms produce the identical rows
    (pinned by test_text_profile_materializes_tokens_once)."""
    import pyspark.sql.functions as F

    from odibel_spark.functions import text as X

    words = F.transform(
        F.sequence(F.lit(1), F.lit(words_n)),
        lambda j: F.substring(
            F.md5(F.concat(F.col("id").cast("string"), F.lit("_"), j.cast("string"))), 1, 6
        ),
    )
    docs = (
        spark.range(docs_n)
        .select(F.col("id").cast("string").alias("doc_id"), F.concat_ws(" ", words).alias("text"))
        .repartition(16)
    )
    docs.cache().count()

    def run_naive() -> None:
        materialize(
            docs.select(
                "doc_id",
                X.token_count(F.col("text")).alias("n_tokens"),
                X.bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens"),
                F.length("text").alias("n_chars_actual"),
                X.punct_ratio(F.col("text")).alias("punct_ratio"),
                X.stopword_ratio(F.col("text")).alias("stopword_ratio"),
                X.quality_score(F.col("text")).alias("quality"),
                X.language_id(F.col("text")).alias("lang_pred"),
                X.document_fingerprint(F.col("text")).alias("fp"),
            )
        )

    def run_materialized() -> None:
        materialize(X.profile_documents(docs, "doc_id", "text"))

    try:
        run_ab(
            "profile_cse", spark,
            {"naive_composition": run_naive, "materialized_tokens": run_materialized},
            reps,
            {"docs": docs_n, "words_per_doc": words_n,
             "note": "full text-analysis profile, identical output both arms; "
                     "naive re-derives the tokens() HOF subtree per metric (codegen "
                     "CSE skips lambda-bearing subtrees), materialized projects the "
                     "token array once and derives every metric from the attribute"},
        )
    finally:
        docs.unpersist()


def ab_stream_dedup(spark, events: int, reps: int) -> None:
    """Informational: the cost of the in-stream watermarked dedup
    stage inside the criterion pipeline. The LSN-fenced MERGE already
    makes replays idempotent, so on a WAL whose duplicates are sparse
    the stage is mostly insurance against duplicate-heavy feeds (it
    keeps duplicate payloads out of the merge shuffle). Both arms
    converge to the identical table (asserted in-run); the artifact
    prices the insurance — the bench headline and the scaling
    protocol KEEP the stage, as the north rule's job description
    includes it."""
    from odibel_spark.cdc import PipelineConfig, TranscriptCdcPipeline, WalConfig, write_wal_files

    base = tempfile.mkdtemp(prefix="ab-sdedup-")
    cpus = spark.sparkContext.defaultParallelism
    wal = write_wal_files(
        spark, WalConfig(n_events=events, n_convs=max(events // 50, 100), seed=42),
        os.path.join(base, "wal"), n_files=max(8, cpus // 2),
    )
    seq = [0]
    counts = {}

    def run(dedup: bool) -> None:
        seq[0] += 1
        root = os.path.join(base, f"t{seq[0]}")
        p = TranscriptCdcPipeline(
            spark,
            PipelineConfig(
                wal_dirs=[wal], table_root=os.path.join(root, "tbl"),
                checkpoint_dir=os.path.join(root, "ckpt"), buckets=cpus,
                merge_mode="mor", max_files_per_trigger=None, dedup_in_stream=dedup,
            ),
        )
        p.run_available()
        counts[dedup] = p.table().read().count()
        shutil.rmtree(root, ignore_errors=True)

    try:
        run_ab(
            "stream_dedup", spark,
            {"with_stream_dedup": lambda: run(True), "merge_fence_only": lambda: run(False)},
            reps,
            {"events": events,
             "note": "MoR pipeline, identical WAL, one-batch trigger; both arms converge "
                     "to the identical table (the LSN-fenced MERGE dedups regardless) — "
                     "the delta is the watermarked dropDuplicatesWithinWatermark stage's "
                     "state + shuffle cost on a sparse-duplicate feed. Informational: the "
                     "criterion job keeps the stage (duplicate-heavy feeds need it)."},
        )
        assert len(set(counts.values())) == 1, f"arms diverged: {counts}"
    finally:
        shutil.rmtree(base, ignore_errors=True)


def ab_kmeans_divide(spark, vecs_n: int, reps: int, k: int = 64, dim: int = 64) -> None:
    """r5 k-means assignment rewrite: the divided vector materialized
    once as its own column vs the pre-r5 inline shape whose HOF divide
    transform re-evaluated once per CENTER per row (k x O(dim)
    interpreted work). Assignments are bit-equal (pinned by
    test_kmeans_assign_broadcast_matches_literal and the equality
    check inside this bench)."""
    import pyspark.sql.functions as F

    from odibel_spark.functions.kmeans import _quantize, kmeans_assign

    emb = spark.range(vecs_n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda j: ((F.col("id") * j) % 97).cast("double") / 7.0,
        ).alias("embedding"),
    )
    emb.cache().count()
    centers = [[float((i * j) % 13) for j in range(dim)] for i in range(k)]

    def inline_divide():  # pre-r5 shape, reconstructed
        dv = F.transform(_quantize(F.col("embedding"), 1000), lambda q: q / F.lit(1000.0))
        cands = []
        for j, cen in enumerate(centers):
            lit_c = F.array(*[F.lit(float(c)) for c in cen])
            d = F.aggregate(
                F.zip_with(dv, lit_c, lambda x, c: (x - c) * (x - c)),
                F.lit(0.0), lambda s, v: s + v,
            )
            cands.append(F.struct(d.alias("d"), F.lit(j).alias("j")))
        return emb.withColumn("cluster", F.array_min(F.array(*cands))["j"])

    def run_inline() -> None:
        materialize(inline_divide())

    def run_materialized() -> None:
        materialize(kmeans_assign(emb, centers, "vec_id", "embedding", method="literal"))

    # bit-equality of the two arms, asserted once before timing
    a = inline_divide().select("vec_id", "cluster")
    b = kmeans_assign(emb, centers, "vec_id", "embedding", method="literal").select("vec_id", "cluster")
    if a.exceptAll(b).count() or b.exceptAll(a).count():
        raise AssertionError("arms disagree — refusing to record a perf artifact")

    try:
        run_ab(
            "kmeans_divide", spark,
            {"inline_divide": run_inline, "materialized_divide": run_materialized},
            reps,
            {"vectors": vecs_n, "k": k, "dim": dim,
             "note": "literal-path k-means assignment, bit-equal arms (checked in-run); "
                     "inline_divide re-evaluates the quantize+divide HOF transform once "
                     "per center per row (codegen CSE skips lambda subtrees), "
                     "materialized_divide projects it once and folds distances over the "
                     "attribute"},
        )
    finally:
        emb.unpersist()


def ab_triples_cache(spark, reps: int, sf_dir: str) -> None:
    """Negative result, recorded on purpose: Spark-cache()ing the
    derived triple table that q_sample_suite's three samplers (and
    q_schema_graph_rollup's typing joins) each reference ~3x is a
    PESSIMIZATION, not a win. The derivation is pure codegen column
    arithmetic over a page-cached parquet scan — recomputing it per
    branch is cheaper than materializing InMemoryRelation batches
    inside the one timed action (cache build serializes the first
    stage and pays the memory-copy tax). A naive sequential probe had
    shown a 4x "win" that was entirely JIT/page-cache warmup order —
    the exact confound BENCH/BASELINE.md's interleaved-only ground
    rule exists for. Kept as the auditable reason the registry queries
    stay uncached."""
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
    import __spark_entry__ as E
    from odibel_spark.functions.dedup import clear_dedup_caches, _cache_scoped
    from odibel_spark.operators.sampling import (
        sample_entities_all_types,
        sample_entities_by_type_targets,
        sample_entities_global,
    )
    from pyspark.sql import functions as F

    def suite(t) -> None:
        parts = [
            ("global", sample_entities_global(t, sample_size=40, related_per_seed=3, seed=13)),
            ("targets", sample_entities_by_type_targets(t, E._TYPE_TARGETS, related_per_seed=2, seed=7)),
            ("all_types", sample_entities_all_types(t, target_per_type=4, related_per_seed=2, seed=5)),
        ]
        out = None
        for mode, df in parts:
            tagged = df.select(F.lit(mode).alias("mode"), "s", "p", "o", "isLiteral")
            out = tagged if out is None else out.unionByName(tagged)
        materialize(out)

    def triples():
        return E._events_triples(E._t(spark, sf_dir, "events"))

    def run_cached() -> None:
        suite(_cache_scoped(triples()))
        clear_dedup_caches()  # each cell rebuilds the cache, like a cold query

    run_ab(
        "triples_cache", spark,
        {"recompute_per_branch": lambda: suite(triples()), "cached_triples": run_cached},
        reps,
        {"sf_dir": sf_dir,
         "note": "sample_suite body; cached arm clears its cache per cell so every "
                 "cell pays the in-action cache build, matching the registry query's "
                 "cold-run context"},
    )


def ab_cluster_layout(spark, rows_n: int, reps: int) -> None:
    """Write-time clustering's read-side payoff: the same shuffled
    rows committed to two unbucketed LakeTables with the SAME file
    count — random layout vs cluster_by range layout — then an
    interleaved 1%-range read (where_ranges on the manifest bounds) of
    each. The deterministic metric is files planned (random layout:
    every file straddles the range, nothing skippable; clustered:
    O(range/file-width) files); wall clock rides along. Write cost is
    recorded separately: the clustered commit pays a range-partition
    sampling job + sort once, amortized over every range read."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from odibel_spark.lake.table import LakeTable

    base = tempfile.mkdtemp(prefix="ab-cluster-")
    cpus = spark.sparkContext.defaultParallelism
    n_files = cpus * 2
    schema = T.StructType(
        [T.StructField("k", T.LongType(), False), T.StructField("v", T.StringType(), True)]
    )
    # deterministic shuffled keys; payload = 4x sha2 hex (incompressible
    # enough that file size tracks row count)
    pay = F.concat(*[F.sha2(F.concat(F.col("k").cast("string"), F.lit(s)), 256) for s in "abcd"])
    src = os.path.join(base, "src")
    (
        spark.range(rows_n)
        .select(F.xxhash64("id").alias("_ord"), F.col("id").alias("k"))
        .orderBy("_ord")
        .drop("_ord")
        .withColumn("v", pay)
        .repartition(n_files)
        .write.parquet(src)
    )
    # both write arms read the SAME materialized input (and a warmup
    # count pages it in) so neither pays the synthesis cold
    df = spark.read.parquet(src)
    df.count()
    t_write = {}
    t0 = time.perf_counter()
    plain = LakeTable.create(
        spark, os.path.join(base, "plain"), schema, properties={"stats_columns": ["k"]}
    )
    # round-robin to the same file count: both arms pay one write
    # shuffle, so the write-cost delta isolates range sampling + sort
    plain.append(df.repartition(n_files))
    t_write["random_layout"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    clustered = LakeTable.create(
        spark, os.path.join(base, "clustered"), schema, properties={"stats_columns": ["k"]}
    )
    clustered.append(df, cluster_by=("k",), cluster_files=n_files)
    t_write["clustered_layout"] = round(time.perf_counter() - t0, 3)

    lo = rows_n // 2
    hi = lo + rows_n // 100
    q = {"k": (lo, hi)}
    planned = {
        "random_layout": {
            "planned": len(plain.read(where_ranges=q).inputFiles()),
            "total": len(plain.read().inputFiles()),
        },
        "clustered_layout": {
            "planned": len(clustered.read(where_ranges=q).inputFiles()),
            "total": len(clustered.read().inputFiles()),
        },
    }
    try:
        run_ab(
            "cluster_layout", spark,
            {
                "random_layout": lambda: materialize(plain.read(where_ranges=q)),
                "clustered_layout": lambda: materialize(clustered.read(where_ranges=q)),
            },
            reps,
            {"rows": rows_n, "files_per_table": n_files,
             "range_width_pct": 1.0,
             "files_planned": planned,
             "write_wall_s": t_write,
             "note": "files_planned is the noise-free metric: identical file counts, "
                     "identical data, only the row->file assignment differs; the wall "
                     "cells measure the same range read over both layouts in one JVM"},
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def ab_compact_cluster(spark, rows_n: int, reps: int) -> None:
    """Compaction-as-OPTIMIZE's read-side payoff on a BUCKETED MoR
    table (where files must stay one-bucket, so manifest-level file
    skipping can't narrow a hot-conv + LSN-slice probe — the win has
    to come from parquet ROW-GROUP stats). Same data compacted twice:
    plain fold vs fold + cluster_by=("_lsn",). Both layouts are
    conv-sorted (the bucket-column sort is unconditional), so the
    delta isolates the _lsn clustering within each conv run. The
    deterministic metric is row groups whose footer stats overlap
    `conv_id = <hot> AND _lsn BETWEEN lo,hi` — exactly what Spark's
    pushed-down filter prunes at scan time; wall cells measure the
    same filtered scan over both layouts interleaved in one JVM."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from odibel_spark.lake import BucketSpec, cdc_table_schema, compact_buckets, create_cdc_table

    base = tempfile.mkdtemp(prefix="ab-compact-cluster-")
    try:
        n_convs, n_buckets = 32, 8
        fields = [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("text", T.StringType(), True),
        ]
        schema = cdc_table_schema(fields)
        # one row per (conv, turn); _lsn = (turn_idx * 1000003) % per_conv
        # is a permutation of each conv's turn range (1000003 is prime, so
        # coprime to any per_conv) — WITHOUT the cluster sort a conv run's
        # row groups each span ~the full LSN range (nothing prunable)
        # while the data itself is identical across arms
        per_conv = rows_n // n_convs
        pay = F.sha2(F.concat(F.col("conv_id"), F.col("turn_idx").cast("string")), 256)
        src = (
            spark.range(rows_n)
            .select(
                F.concat(F.lit("c"), (F.col("id") % n_convs).cast("string")).alias("conv_id"),
                (F.col("id") / n_convs).cast("int").alias("turn_idx"),
            )
            .withColumn("text", pay)
            .withColumn(
                "_lsn",
                ((F.col("turn_idx").cast("long") * 1_000_003) % F.lit(per_conv)).cast("long"),
            )
            .withColumn("_deleted", F.lit(False))
        )
        # small row groups so each bucket file holds MANY of them — the
        # unit the pushed-down filter prunes; declared in the artifact
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        old_block = hconf.get("parquet.block.size")
        hconf.set("parquet.block.size", str(1 << 20))
        tables = {}
        t_compact = {}
        try:
            for arm, cluster in (("fold_only", ()), ("fold_clustered", ("_lsn",))):
                t = create_cdc_table(
                    spark, os.path.join(base, arm), fields,
                    BucketSpec("conv_id", n_buckets),
                    key_cols=["conv_id", "turn_idx"], merge_mode="mor",
                    stats_columns=["conv_id", "_lsn"],
                )
                t.append(src.select(*schema.fieldNames()))
                t0 = time.perf_counter()
                compact_buckets(t, cluster_by=cluster)
                t_compact[arm] = round(time.perf_counter() - t0, 3)
                tables[arm] = t
        finally:
            hconf.set("parquet.block.size", old_block) if old_block is not None \
                else hconf.unset("parquet.block.size")

        hot = "c7"
        lo, hi = per_conv // 2, per_conv // 2 + per_conv // 50  # 2% LSN slice
        groups = {}
        for arm, t in tables.items():
            total = kept = 0
            for f in (x for x in t.files() if x["rows"]):
                md = pq.ParquetFile(os.path.join(t.root, f["path"])).metadata
                idx = {md.schema.column(i).path: i for i in range(md.num_columns)}
                for rg in range(md.num_row_groups):
                    total += 1
                    sc = md.row_group(rg).column(idx["conv_id"]).statistics
                    sl = md.row_group(rg).column(idx["_lsn"]).statistics
                    if sc.min <= hot <= sc.max and sl.min <= hi and sl.max >= lo:
                        kept += 1
            groups[arm] = {"overlapping_row_groups": kept, "total_row_groups": total}

        pred = (F.col("conv_id") == hot) & F.col("_lsn").between(lo, hi)

        def scan(t):
            return lambda: materialize(
                t.read(fold=False).filter(pred).select("conv_id", "turn_idx", "_lsn")
            )

        run_ab(
            "compact_cluster", spark,
            {arm: scan(t) for arm, t in tables.items()},
            reps,
            {"rows": rows_n, "convs": n_convs, "buckets": n_buckets,
             "parquet_block_size": 1 << 20,
             "probe": f"conv_id = {hot} AND _lsn in a 2% slice",
             "row_groups": groups,
             "compact_wall_s": t_compact,
             "note": "row_groups is the noise-free metric: identical folded data, "
                     "identical file count, only within-file row order differs; both "
                     "arms are conv-sorted so the delta isolates cluster_by=('_lsn',)"},
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("which", choices=["trigger_posture", "lsh_mass_dup", "lsh_clean_corpus", "shingle_tokenize", "infer_filter_pushdown", "profile_cse", "kmeans_divide", "stream_dedup", "state_store", "state_store_pressure", "triples_cache", "cluster_layout", "compact_cluster"])
    ap.add_argument("--events", type=int, default=1_000_000)
    ap.add_argument("--copies", type=int, default=20_000,
                    help="lsh_mass_dup: total documents (50 distinct contents)")
    ap.add_argument("--docs", type=int, default=20_000,
                    help="lsh_clean_corpus: all-distinct document count")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--words", type=int, default=None,
                    help="words per synthetic document (mode defaults: "
                         "shingle_tokenize 50, infer_filter_pushdown 200, profile_cse 120)")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--heap", default="1g",
                    help="state_store_pressure: child-JVM heap (SPARK_GRAFT_DRIVER_MEM)")
    ap.add_argument("--timeout", type=int, default=900,
                    help="state_store_pressure: per-arm wall-clock cap in seconds")
    ap.add_argument("--pressure-child", nargs=3, metavar=("BACKEND", "WAL", "ROOT"),
                    help="internal: run one state_store_pressure arm in this process")
    args = ap.parse_args()

    if args.pressure_child:
        _pressure_child(args.pressure_child[0], args.pressure_child[1],
                        args.pressure_child[2], args.cpus)
        return 0
    if args.which == "state_store_pressure":
        ab_state_store_pressure(args.events, args.heap, args.cpus, args.timeout)
        return 0

    from odibel_spark import get_spark

    spark = get_spark("ab-bench", cpus=args.cpus, shuffle_partitions=args.cpus * 2)
    if args.which == "trigger_posture":
        ab_trigger_posture(spark, args.events, args.reps)
    elif args.which == "lsh_clean_corpus":
        ab_lsh_clean_corpus(spark, args.docs, args.reps)
    elif args.which == "shingle_tokenize":
        ab_shingle_tokenize(spark, args.docs, args.reps, args.words or 50)
    elif args.which == "stream_dedup":
        ab_stream_dedup(spark, args.events, args.reps)
    elif args.which == "kmeans_divide":
        ab_kmeans_divide(spark, args.docs, args.reps)
    elif args.which == "profile_cse":
        ab_profile_cse(spark, args.docs, args.reps, args.words or 120)
    elif args.which == "infer_filter_pushdown":
        ab_infer_filter_pushdown(spark, args.docs, args.reps, args.words or 200)
    elif args.which == "state_store":
        ab_state_store(spark, args.events, args.reps)
    elif args.which == "cluster_layout":
        ab_cluster_layout(spark, args.events, args.reps)
    elif args.which == "compact_cluster":
        ab_compact_cluster(spark, args.events, args.reps)
    elif args.which == "triples_cache":
        ab_triples_cache(spark, args.reps, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    else:
        ab_lsh_mass_dup(spark, args.copies, args.reps)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
