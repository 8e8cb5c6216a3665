"""End-to-end corpus-preparation composition."""

from __future__ import annotations

from odibel_spark.functions.corpus import prepare_training_corpus


def test_prepare_training_corpus_stages(spark):
    """Duplicates collapse to the canonical min-id document, documents
    containing a benchmark question drop, clean docs survive packed."""
    question = "what is the capital of france exactly"
    docs = spark.createDataFrame(
        [
            (1, "a clean training document about spark physical planning"),
            (2, "duplicate body text repeated verbatim here"),
            (3, "duplicate body text repeated verbatim here"),
            (4, "leading filler then " + question + " trailing filler text"),
            (5, "another clean document concerning lakehouse manifests"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(90, question)], "bench_id long, text string")
    out = prepare_training_corpus(
        docs, bench, n=3, min_shared=3, max_tokens=50, buckets=2
    ).collect()
    ids = {r.doc_id for r in out}
    assert ids == {1, 2, 5}  # 3 deduped away, 4 contaminated
    assert all(not r.oversize and r.n_tokens > 0 for r in out)

    # no benchmark: contamination stage skipped, doc 4 survives
    no_bench = prepare_training_corpus(docs, None, max_tokens=50, buckets=2).collect()
    assert {r.doc_id for r in no_bench} == {1, 2, 4, 5}
