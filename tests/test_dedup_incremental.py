"""Incremental LSH dedup: corpus index build + new-batch lookup.

Covers the semantics the batch suite can't: exact copies of indexed
documents score 1.0 with the group's member count, novel documents
produce no rows, the estimator equals the signature component
agreement computed independently, mass-duplicate new batches expand
per member, and the index survives a parquet round trip (the
persisted-table deployment shape).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from odibel_spark.functions.dedup import minhash_signatures
from odibel_spark.functions.dedup_incremental import (
    incremental_near_duplicates,
    minhash_index,
)

PARAMS = dict(n=2, k=8, bands=4)

CORPUS_ROWS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (3, "completely different content about distributed stream processing engines"),
    (4, "yet another unrelated document regarding spark catalyst optimizer rules"),
]


@pytest.fixture(scope="module")
def corpus_index(spark):
    corpus = spark.createDataFrame(CORPUS_ROWS, "doc_id long, text string")
    return minhash_index(corpus, **PARAMS).cache()


def test_exact_copy_scores_one_and_novel_absent(spark, corpus_index):
    new = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog near the river bank today"),
            (101, "a totally novel document with no counterpart whatsoever in the corpus"),
        ],
        "doc_id long, text string",
    )
    out = incremental_near_duplicates(new, corpus_index, threshold=0.5, **PARAMS).collect()
    assert {r.new_id for r in out} == {100}
    (m,) = out
    # the duplicate group (docs 1, 2) collapsed to representative 1 with 2 members
    assert m.corpus_id == 1 and m.est_jaccard == 1.0 and m.corpus_dup_count == 2


def test_estimator_equals_signature_component_agreement(spark, corpus_index):
    near = "the quick brown fox jumps over the lazy dog near the ocean shore tonight"
    new = spark.createDataFrame([(200, near)], "doc_id long, text string")
    out = incremental_near_duplicates(new, corpus_index, threshold=0.0, **PARAMS).collect()
    matches = {r.corpus_id: r.est_jaccard for r in out if r.new_id == 200}
    assert 1 in matches and 0.0 < matches[1] < 1.0

    # recompute the estimator independently from raw signatures
    both = spark.createDataFrame(
        [CORPUS_ROWS[0], (200, near)], "doc_id long, text string"
    )
    sigs = {r.doc_id: [r[f"mh{i}"] for i in range(8)] for r in
            minhash_signatures(both, "doc_id", "text", n=2, k=8).collect()}
    expected = sum(a == b for a, b in zip(sigs[1], sigs[200])) / 8.0
    assert matches[1] == expected


def test_mass_duplicate_new_batch_expands_per_member(spark, corpus_index):
    copies = 300
    new = (
        spark.range(1000, 1000 + copies)
        .select(
            F.col("id").alias("doc_id"),
            F.lit(CORPUS_ROWS[0][1]).alias("text"),
        )
    )
    out = incremental_near_duplicates(new, corpus_index, threshold=0.9, **PARAMS)
    rows = out.collect()
    # every copy gets its own verdict against the one corpus representative
    assert len(rows) == copies
    assert {r.new_id for r in rows} == set(range(1000, 1000 + copies))
    assert all(r.corpus_id == 1 and r.est_jaccard == 1.0 for r in rows)


def test_identity_is_content_not_id(spark, corpus_index):
    """A new document whose id collides with an indexed id still
    matches (re-ingested doc 1 matches itself at 1.0): suppressing
    same-id pairs would also hide a TRUE near-dup where different
    documents share an id across batches. Callers replaying overlap
    anti-join on id upstream."""
    new = spark.createDataFrame([(1, CORPUS_ROWS[0][1])], "doc_id long, text string")
    out = incremental_near_duplicates(new, corpus_index, threshold=0.5, **PARAMS).collect()
    assert [(r.new_id, r.corpus_id, r.est_jaccard) for r in out] == [(1, 1, 1.0)]


def test_index_maintained_incrementally_across_batches(spark, tmpdir_path):
    """The deployment loop: each ingest batch is matched against the
    index, then its own index rows are APPENDED — the index is never
    rebuilt. A later batch must match documents that arrived in an
    earlier appended batch. Cross-batch exact duplicates appear as
    distinct representatives (one per contributing batch), each
    matching at 1.0 — duplicate-group counts are per batch."""
    path = os.path.join(tmpdir_path, "rolling_idx")
    batch1 = spark.createDataFrame(CORPUS_ROWS[:2], "doc_id long, text string")
    minhash_index(batch1, **PARAMS).write.partitionBy("band").parquet(path)

    novel = "a document that first appears in batch two about iceberg manifests"
    batch2 = spark.createDataFrame([(50, novel)], "doc_id long, text string")
    assert incremental_near_duplicates(
        batch2, spark.read.parquet(path), threshold=0.5, **PARAMS
    ).count() == 0
    minhash_index(batch2, **PARAMS).write.mode("append").partitionBy("band").parquet(path)

    batch3 = spark.createDataFrame([(60, novel)], "doc_id long, text string")
    out = incremental_near_duplicates(
        batch3, spark.read.parquet(path), threshold=0.5, **PARAMS
    ).collect()
    assert [(r.new_id, r.corpus_id, r.est_jaccard) for r in out] == [(60, 50, 1.0)]


def test_cdc_changelog_feeds_incremental_dedup(spark, tmpdir_path):
    """The module docstring's CDC recipe, executed: each commit range
    of a MoR lake table's changes() becomes the new batch — matched
    against the index (after the documented id anti-join for updates),
    then appended. A turn whose text duplicates an earlier commit's
    turn is flagged; the updated version of an existing turn is not
    matched against its own prior version."""
    from odibel_spark.lake import BucketSpec, create_cdc_table, merge_upsert
    from tests.test_lake import KEYS, TRANSCRIPT_FIELDS

    t = create_cdc_table(
        spark, os.path.join(tmpdir_path, "dedup_feed"), TRANSCRIPT_FIELDS,
        BucketSpec("conv_id", 4), key_cols=KEYS, merge_mode="mor",
    )
    schema = ("lsn long, op string, conv_id string, turn_idx int, role string, "
              "text string, tool string, ts timestamp")
    boiler = "please accept our terms of service before continuing with anything"
    merge_upsert(t, spark.createDataFrame(
        [(1, "insert", "c1", 0, "user", boiler, None, None),
         (2, "insert", "c2", 0, "user", "an original question about join reordering", None, None)],
        schema), KEYS)
    v1 = t.current_version()

    def as_docs(ch):
        return ch.filter(~F.col("_deleted")).select(
            F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string")).alias("doc_id"),
            "text",
        )

    idx_path = os.path.join(tmpdir_path, "turn_idx")
    minhash_index(as_docs(t.changes(0, v1)), id_col="doc_id", **PARAMS).write.partitionBy(
        "band"
    ).parquet(idx_path)

    # commit 2: one update of an existing turn + one fresh turn that
    # duplicates commit 1's boilerplate
    merge_upsert(t, spark.createDataFrame(
        [(3, "update", "c2", 0, "user", "an original question about join ordering", None, None),
         (4, "insert", "c3", 0, "user", boiler, None, None)],
        schema), KEYS)
    batch = as_docs(t.changes(v1))
    index = spark.read.parquet(idx_path)
    # documented recipe: updates re-use ids — anti-join indexed ids
    fresh = batch.join(index.select("doc_id").distinct(), "doc_id", "left_anti")
    out = incremental_near_duplicates(
        fresh, index, id_col="doc_id", threshold=0.9, **PARAMS
    ).collect()
    assert [(r.new_id, r.corpus_id, r.est_jaccard) for r in out] == [("c3#0", "c1#0", 1.0)]
    minhash_index(fresh, id_col="doc_id", **PARAMS).write.mode("append").partitionBy(
        "band"
    ).parquet(idx_path)
    assert spark.read.parquet(idx_path).select("doc_id").distinct().count() == 3


def test_index_survives_parquet_round_trip(spark, corpus_index, tmpdir_path):
    path = os.path.join(tmpdir_path, "lsh_index")
    corpus_index.write.mode("overwrite").partitionBy("band").parquet(path)
    reloaded = spark.read.parquet(path)
    new = spark.createDataFrame(
        [(100, CORPUS_ROWS[0][1])], "doc_id long, text string"
    )
    live = incremental_near_duplicates(new, corpus_index, threshold=0.5, **PARAMS).collect()
    persisted = incremental_near_duplicates(new, reloaded, threshold=0.5, **PARAMS).collect()
    assert sorted(map(tuple, live)) == sorted(map(tuple, persisted))
