"""Greedy sequence packing invariants."""

from __future__ import annotations

from collections import defaultdict

import pyspark.sql.functions as F
import pytest

from odibel_spark.functions.packing import pack_documents


def _packs(rows):
    packs = defaultdict(list)
    for r in sorted(rows, key=lambda r: r.doc_id):
        packs[(r.bucket, r.pack_seq)].append(r)
    return packs


def test_greedy_invariants_and_determinism(spark):
    cap = 100
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64(F.col("id")), F.lit(60)) + 1).alias("n_tokens"),
    )
    out = pack_documents(docs, "doc_id", "n_tokens", max_tokens=cap, buckets=4)
    rows = out.collect()
    assert len(rows) == 200 and not any(r.oversize for r in rows)
    packs = _packs(rows)
    for (bucket, seq), members in packs.items():
        total = sum(r.n_tokens for r in members)
        assert total <= cap, f"pack ({bucket},{seq}) overflows: {total}"
        # greedy tightness: a non-final pack could not have absorbed the
        # next pack's first document
        nxt = packs.get((bucket, seq + 1))
        if nxt:
            assert total + nxt[0].n_tokens > cap
    # packs partition each bucket's id-ordered stream contiguously
    for r in rows:
        assert r.pack_seq >= 0
    assert sorted(map(tuple, rows)) == sorted(
        map(tuple, pack_documents(docs, "doc_id", "n_tokens", max_tokens=cap, buckets=4).collect())
    )


def test_oversize_documents_pack_alone(spark):
    docs = spark.createDataFrame(
        [(1, 10), (2, 500), (3, 10), (4, 0)],
        "doc_id long, n_tokens long",
    )
    rows = pack_documents(docs, "doc_id", "n_tokens", max_tokens=100, buckets=1).collect()
    by_id = {r.doc_id: r for r in rows}
    assert by_id[2].oversize and not by_id[1].oversize
    packs = _packs(rows)
    (oversize_pack,) = [m for m in packs.values() if any(r.oversize for r in m)]
    assert [r.doc_id for r in oversize_pack] == [2]
    # zero-token doc joins a pack normally, never a negative sequence
    assert by_id[4].pack_seq >= 0

    with pytest.raises(ValueError, match="max_tokens"):
        pack_documents(docs, "doc_id", "n_tokens", max_tokens=0)


def test_oversize_isolated_even_after_zero_token_docs(spark):
    """A zero-token document leaves acc == 0, which must NOT let the
    following oversize document share its pack (row-index guard, not
    acc > 0); null token counts pack as zero-length instead of
    crashing the Arrow batch."""
    docs = spark.createDataFrame(
        [(1, 0), (2, None), (3, 500), (4, 10)],
        "doc_id long, n_tokens long",
    )
    rows = pack_documents(docs, "doc_id", "n_tokens", max_tokens=100, buckets=1).collect()
    packs = _packs(rows)
    (oversize_pack,) = [m for m in packs.values() if any(r.oversize for r in m)]
    assert [r.doc_id for r in oversize_pack] == [3]
    by_id = {r.doc_id: r for r in rows}
    assert by_id[2].n_tokens == 0 and by_id[2].pack_seq == by_id[1].pack_seq
    assert by_id[4].pack_seq > by_id[3].pack_seq  # nothing joins the oversize pack
