"""End-to-end training-corpus preparation: the composition a data
pipeline actually runs — exact dedup → eval-set decontamination →
token counting → greedy sequence packing — as ONE declarative plan.

Each stage is the already-verified operator (`exact_duplicates`'
fingerprint groupBy, `benchmark_contamination`'s broadcast match,
`token_count`, `pack_documents`), chained so Catalyst sees the whole
pipeline: the fingerprint pass and the contamination pass both scan
the corpus once, survivors flow straight into packing's single bucket
shuffle. Everything stays deterministic, so the composition itself is
oracle-checkable end to end (driver query ``corpus_prepare``).

Near-duplicate removal (`minhash_near_duplicates`) deliberately sits
OUTSIDE this composition: its LSH threshold wants corpus-specific
tuning and its candidate pairs are worth inspecting before dropping —
run it between dedup and decontamination and anti-join its id_b side
when ready.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from odibel_spark.functions.dedup import benchmark_contamination
from odibel_spark.functions.packing import pack_documents
from odibel_spark.functions.text import document_fingerprint, token_count


def prepare_training_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id: str = "bench_id",
    bench_text: str = "text",
    n: int = 3,
    min_shared: int = 3,
    max_tokens: int = 2048,
    buckets: int = 64,
) -> DataFrame:
    """Surviving documents with their pack assignment:
    ``(id_col, n_tokens, bucket, pack_seq, oversize)``.

    Stages: (1) exact dedup keeps each fingerprint group's min-id
    canonical document; (2) documents sharing ≥ ``min_shared`` n-grams
    with any ``benchmark`` document are dropped (skipped when
    ``benchmark`` is None); (3) survivors are token-counted and packed
    into ``max_tokens`` sequences. Deterministic end to end.

    Cache hygiene: this composes cache-scoped dedup stages, so the
    ONE-LIVE-PIPELINE rule of ``dedup._ACTIVE_CACHES`` applies here
    too — assembling the NEXT dedup/corpus pipeline unpersists this
    one's cached intermediates. Consume (or checkpoint) the returned
    plan before building another pipeline; results stay correct either
    way, only the cache acceleration is lost."""
    # canonical-per-fingerprint via groupBy+semi-join, not a window:
    # the groupBy partial-aggregates map-side (same rationale as
    # dedup._fingerprint_collapse)
    reps = docs.select(
        document_fingerprint(F.col(text_col)).alias("_fp"), F.col(id_col)
    ).groupBy("_fp").agg(F.min(id_col).alias(id_col))
    kept = docs.join(reps.select(id_col), id_col, "left_semi")
    if benchmark is not None:
        # no distinct: anti-join semantics are duplicate-insensitive on
        # the right side, so deduping the contamination list would only
        # add a shuffle
        contaminated = benchmark_contamination(
            kept, benchmark, id_col, text_col, bench_id, bench_text, n, min_shared
        ).select(id_col)
        kept = kept.join(contaminated, id_col, "left_anti")
    counted = kept.select(id_col, token_count(F.col(text_col)).alias("n_tokens"))
    return pack_documents(counted, id_col, "n_tokens", max_tokens, buckets)
