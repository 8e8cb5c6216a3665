"""Incremental near-duplicate detection against a persisted MinHash
LSH index — the per-ingest-batch posture of dedup at 100 TB.

Batch LSH (functions/dedup.py) answers "which documents in THIS corpus
near-duplicate each other" and costs O(corpus) per run. The question a
10^10-event ingest pipeline asks is narrower and arrives per batch:
"which of these NEW documents near-duplicate something already in the
corpus?" Re-running corpus-wide LSH per batch re-shuffles the entire
corpus; this module replaces that with a join of the new batch's band
buckets against a persisted index table — O(batch + matches) per
batch, independent of corpus size.

- :func:`minhash_index` builds the index. Exact duplicates collapse to
  a min-id representative with a member count (identical normalized
  texts have identical signatures, so the collapse is lossless for
  LSH — same guard as the batch path), one output row per
  (representative, band) carrying the full K-component signature.
  Persist partitioned by ``band`` and bucketed/sorted by ``bkey``:
  the candidate join then prunes at the storage layer and can skip
  the shuffle entirely under a bucketed layout.
- :func:`incremental_near_duplicates` computes the new batch's
  signatures (fingerprint-collapsed first), equi-joins band buckets
  against the index, estimates Jaccard as the fraction of equal
  signature components (the standard MinHash estimator — match time
  never touches corpus text), thresholds, and re-expands the new side
  so EVERY new document receives a verdict.

Skew posture: both sides of the candidate join are fingerprint-
collapsed, so a mass-duplicate cluster costs one row per side and a
hot bucket is a genuine near-duplicate neighborhood whose pairs are
irreducible output. The join is a plain hash/sort-merge equi-join —
no single-task member arrays anywhere — and AQE's skew splitting
applies to it natively.

CDC tie-in: feed ``LakeTable.changes(since)`` upserts (or any
``foreachBatch`` micro-batch) as ``new_docs``, then append
``minhash_index(new_docs)`` rows to the index table — the index is
maintained incrementally, never rebuilt. Because lookup identity is
CONTENT, not id, anti-join the batch against already-indexed ids
first when the feed contains updates or at-least-once replays —
otherwise an updated document reports as a near-duplicate of its own
indexed prior version (which may even be what a cross-version dedup
wants; it is not what a new-content filter wants).

No reference counterpart (the reference's dedup surface is batch-only,
SURVEY.md §2.12); included because the north rule's ingest scale makes
per-batch corpus re-scans non-viable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from odibel_spark.functions.dedup import (
    MINHASH_BANDS,
    MINHASH_K,
    _fingerprint_collapse,
    _minhash_band_buckets,
    minhash_signatures,
)
from odibel_spark.functions.text import document_fingerprint


def minhash_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
) -> DataFrame:
    """Corpus-side LSH index: one row per (representative, band) with
    columns ``(id_col, band, bkey, mh0..mh{k-1}, n_members)``.

    ``n_members`` is the representative's exact-duplicate group size —
    matches against the rep stand for that many corpus documents.
    The (n, k, bands) triple is part of the index's identity: lookups
    must use the same values (mixed parameters silently miss).

    Neither this nor the lookup registers session-scoped caches (each
    intermediate is consumed once), so assembling them never clears a
    live batch pipeline's shared shingle cache and vice versa."""
    members, rep_docs = _fingerprint_collapse(
        docs, id_col, text_col, document_fingerprint(F.col(text_col)), cache=False
    )
    sig = minhash_signatures(rep_docs, id_col, text_col, n, k)
    buckets = _minhash_band_buckets(sig, id_col, k, bands)
    rep_meta = members.filter(F.col(id_col) == F.col("_rep")).select(
        F.col(id_col), F.col("_n").alias("n_members")
    )
    return buckets.join(sig, id_col).join(rep_meta, id_col)


def incremental_near_duplicates(
    new_docs: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
    threshold: float = 0.8,
) -> DataFrame:
    """New-batch documents whose estimated Jaccard similarity against
    an indexed corpus document reaches ``threshold``. Output:
    ``(new_id, corpus_id, est_jaccard, corpus_dup_count)`` — one row
    per (new document, matched corpus representative).

    ``est_jaccard`` is the MinHash component-agreement estimator
    (granularity 1/k — pick k to match the precision the threshold
    needs; exact byte-duplicates always score 1.0). New documents with
    no row are novel w.r.t. the index at this threshold. The corpus is
    never re-scanned: only the index participates.

    Plan shape: new-batch collapse (one partial-agg shuffle) →
    signatures (one shuffle) → bucket equi-join against the index →
    distinct candidate pairs → signature comparison restricted to
    candidates → threshold → re-expand new-side duplicate groups.

    Identity is CONTENT, not id: a new document whose id collides with
    an indexed id still matches (and a re-ingested document matches
    itself at 1.0) — if the batch may overlap the index, anti-join on
    the id upstream; silently suppressing same-id pairs here would
    also hide the true near-dup where two DIFFERENT documents share an
    id across batches."""
    members, rep_docs = _fingerprint_collapse(
        new_docs, id_col, text_col, document_fingerprint(F.col(text_col)), cache=False
    )
    sig = minhash_signatures(rep_docs, id_col, text_col, n, k)
    buckets = _minhash_band_buckets(sig, id_col, k, bands)
    cand = (
        buckets.withColumnRenamed(id_col, "_nrep")
        .join(index.select(F.col(id_col).alias("corpus_id"), "band", "bkey"), ["band", "bkey"])
        .select("_nrep", "corpus_id")
        .distinct()
    )
    # corpus signatures restricted (semi-join pushdown) to candidate
    # reps before the per-band duplication is dropped — the dropDuplicates
    # runs on O(matched reps), not the index
    corpus_sig = (
        index.select(
            F.col(id_col).alias("corpus_id"),
            F.col("n_members").alias("corpus_dup_count"),
            *[F.col(f"mh{i}").alias(f"_c{i}") for i in range(k)],
        )
        .join(cand.select("corpus_id").distinct(), "corpus_id", "left_semi")
        .dropDuplicates(["corpus_id"])
    )
    new_sig = sig.select(
        F.col(id_col).alias("_nrep"), *[F.col(f"mh{i}").alias(f"_a{i}") for i in range(k)]
    )
    eq = sum(
        (F.col(f"_a{i}") == F.col(f"_c{i}")).cast("int") for i in range(k)
    )
    rep_matches = (
        cand.join(new_sig, "_nrep")
        .join(corpus_sig, "corpus_id")
        .withColumn("est_jaccard", eq / F.lit(float(k)))
        .filter(F.col("est_jaccard") >= threshold)
        .select("_nrep", "corpus_id", "est_jaccard", "corpus_dup_count")
    )
    expansion = members.select(F.col("_rep").alias("_nrep"), F.col(id_col).alias("new_id"))
    return rep_matches.join(expansion, "_nrep").select(
        "new_id", "corpus_id", "est_jaccard", "corpus_dup_count"
    )
