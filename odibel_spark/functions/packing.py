"""Greedy sequence packing — token-budgeted document→pack assignment,
the standard LLM-pretraining step downstream of token counting: group
documents into training sequences whose total token count stays within
the model's context budget, wasting as little of each sequence as
possible.

Exact global greedy packing is inherently sequential (each decision
depends on the running total), so it cannot be distributed as-is. The
honest distributed shape, used here: hash-bucket documents into
``buckets`` INDEPENDENT streams (deterministic md5 bucketing — any
engine reproduces it), greedy-pack each stream in document-id order
inside one Arrow batch (``applyInPandas``), and pay at most one
partially-filled trailing pack per bucket — bounded waste of
O(buckets × max_tokens) tokens TOTAL, negligible against a corpus, in
exchange for embarrassing parallelism across buckets. Documents longer
than the budget get a pack of their own (callers chunk or drop them;
flagged via ``oversize``).

Everything is deterministic: same corpus, same parameters → identical
pack assignment on any cluster size, and a DuckDB recursive CTE can
replay the greedy fold row-for-row for value-level verification (see
the ``text_packing`` oracle in ``__spark_entry__.py``).

No reference counterpart — included under the training-data-pipeline
mandate (SURVEY.md §6), like the dedup/similarity family it composes
with (``token_count`` supplies the weights).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from odibel_spark.functions.dedup import _str_hash


def pack_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    max_tokens: int = 2048,
    buckets: int = 64,
) -> DataFrame:
    """Assign each document to a pack of total ``tokens_col`` ≤
    ``max_tokens``. Output: one row per document —
    ``(id_col, tokens_col, bucket, pack_seq, oversize)`` where
    ``(bucket, pack_seq)`` identifies the pack (globally unique pair)
    and ``pack_seq`` counts packs within the bucket in document-id
    order. ``oversize`` marks single documents exceeding the budget.

    Scale notes: one shuffle (the bucket groupBy feeding
    ``applyInPandas``); a bucket's documents must fit one Arrow batch —
    size ``buckets`` so corpus_rows / buckets stays in the low
    millions, and the skew-free md5 bucketing keeps streams balanced.
    """
    if max_tokens <= 0:
        raise ValueError("max_tokens must be > 0")
    if buckets <= 0:
        raise ValueError("buckets must be > 0")
    src = docs.select(
        F.col(id_col),
        # nulls pack as zero-length (can't contribute a budget); count
        # tokens upstream if a null should be an error instead — and a
        # null would otherwise arrive in the Arrow batch as NaN and
        # crash int() deep inside the executor
        F.coalesce(F.col(tokens_col).cast("long"), F.lit(0)).alias(tokens_col),
        (_str_hash(F.col(id_col).cast("string")) % buckets).alias("bucket"),
    )
    out_schema = (
        f"{id_col} {dict(docs.dtypes)[id_col]}, {tokens_col} long, "
        "bucket long, pack_seq long, oversize boolean"
    )
    cap = int(max_tokens)

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        seqs, oversize = [], []
        seq, acc = 0, 0
        for i, t in enumerate(pdf[tokens_col]):
            t = int(t)
            # classic greedy: overflow starts a new pack. Guarding on
            # row index (not acc > 0) keeps two invariants: an oversize
            # doc never shares a pack with preceding zero-token docs
            # (its own overflow fires even at acc == 0), and nothing
            # joins an oversize doc's pack afterwards (acc > cap).
            if i > 0 and acc + t > cap:
                seq += 1
                acc = 0
            seqs.append(seq)
            oversize.append(t > cap)
            acc += t
        pdf["pack_seq"] = pd.Series(seqs, dtype="int64")
        pdf["oversize"] = pd.Series(oversize, dtype="bool")
        return pdf

    return src.groupBy("bucket").applyInPandas(greedy, out_schema)
