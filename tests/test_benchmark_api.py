"""Benchmark/evaluation API (reference api/benchmark.py +
api/evaluation.py parity, Spark-native)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from odibel_spark.api import (
    SparkBenchmark,
    cluster_pair_metrics,
    create_splits,
    profile_dataset,
)


def test_create_splits_deterministic_disjoint_total(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    splits = create_splits(docs, {"train": 0.7, "test": 0.3}, ["doc_id"], seed=42)
    n = docs.count()
    n_train, n_test = splits["train"].count(), splits["test"].count()
    assert n_train + n_test == n
    # roughly proportional (md5 is uniform; generous tolerance at small n)
    assert 0.5 * n <= n_train <= 0.9 * n
    # deterministic: same seed → identical membership
    again = create_splits(docs, {"train": 0.7, "test": 0.3}, ["doc_id"], seed=42)
    assert (
        splits["test"].select("doc_id").exceptAll(again["test"].select("doc_id")).count() == 0
    )
    # different seed → different membership (overwhelmingly likely)
    other = create_splits(docs, {"train": 0.7, "test": 0.3}, ["doc_id"], seed=43)
    assert (
        splits["test"].select("doc_id").exceptAll(other["test"].select("doc_id")).count() > 0
    )
    with pytest.raises(ValueError):
        create_splits(docs, {"train": 0.7, "test": 0.2}, ["doc_id"])


def test_spark_benchmark_container(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    b = SparkBenchmark(name="docs", description="doc corpus", domain="text")
    splits = create_splits(docs, {"train": 0.8, "test": 0.2}, ["doc_id"])
    gold = docs.select("doc_id", F.col("lang").alias("label"))
    b.add_split("train", splits["train"])
    b.add_split("test", splits["test"], gold=gold)
    assert set(b.get_splits()) == {"train", "test"}
    assert b.get_ground_truth("test") is gold
    assert b.get_ground_truth("train") is None
    assert b.get_metadata()["domain"] == "text"
    with pytest.raises(ValueError):
        b.add_split("bogus", docs)


def test_profile_dataset(spark):
    df = spark.createDataFrame(
        [(1, "a", 2.0), (2, "a", None), (3, None, 8.0)],
        "id long, s string, v double",
    )
    p = profile_dataset(df)
    assert p["row_count"] == 3
    assert p["columns"]["s"]["nulls"] == 1 and p["columns"]["s"]["distinct"] == 1
    assert p["columns"]["v"]["min"] == 2.0 and p["columns"]["v"]["max"] == 8.0
    assert p["columns"]["id"]["distinct"] == 3
    # HLL path returns the same shape
    approx = profile_dataset(df, exact_distinct=False)
    assert approx["columns"]["id"]["distinct"] >= 2


def test_cluster_pair_metrics(spark):
    """Hand-checked contingency: gold {a,b,c}{d,e}; predicted
    {a,b}{c,d}{e} → TP=1 (a-b), pred pairs=2, gold pairs=4."""
    pred = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 2), ("d", 2), ("e", 3)], "id string, cluster int"
    )
    gold = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("c", "x"), ("d", "y"), ("e", "y")], "id string, recId string"
    )
    m = cluster_pair_metrics(pred, gold)
    assert m["true_positive_pairs"] == 1
    assert m["predicted_pairs"] == 2
    assert m["gold_pairs"] == 4
    assert m["precision"] == 0.5 and m["recall"] == 0.25
    assert abs(m["f1"] - 1 / 3) < 1e-12

    # perfect prediction → all ones
    perfect = cluster_pair_metrics(
        gold.select("id", F.col("recId").alias("cluster")), gold
    )
    assert perfect["precision"] == perfect["recall"] == perfect["f1"] == 1.0
