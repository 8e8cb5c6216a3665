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


def test_fusion_data_metrics_reference_semantics(spark):
    """Mirrors EntityFusionEvaluator.evaluate_fusion_data
    (reference entity_fusion/eval.py:102-142) on the fixture it
    implies: 3 clusters of sizes 3/2/1, two with fused entities →
    totals, size stats, fused/unfused split, fusion_ratio 2/3."""
    from odibel_spark.api import fusion_data_metrics

    members = spark.createDataFrame(
        [("c1", "e1"), ("c1", "e2"), ("c1", "e3"),
         ("c2", "e4"), ("c2", "e5"),
         ("c3", "e6")],
        "cluster_id string, entity_id string",
    )
    fused = spark.createDataFrame([("c1",), ("c2",)], "cluster_id string")
    m = fusion_data_metrics(members, fused)
    assert m["total_clusters"] == 3
    assert m["total_entities"] == 6
    assert m["avg_cluster_size"] == 2.0
    assert m["min_cluster_size"] == 1
    assert m["max_cluster_size"] == 3
    assert m["fused_clusters"] == 2
    assert m["unfused_clusters"] == 1
    assert m["fusion_ratio"] == pytest.approx(2 / 3)
    # without a fused table, the ratio keys are absent (reference:
    # fusion_ratio only computed when clusters exist / data present)
    m2 = fusion_data_metrics(members)
    assert "fusion_ratio" not in m2 and m2["total_clusters"] == 3


def test_fuse_clusters_rules_and_quality(spark):
    """FusionRule vocabulary executed (reference entity_fusion/
    data.py:26-32 names max/min/concat/average but never runs them)
    + task-result quality vs a gold fused table."""
    from odibel_spark.api import fuse_clusters, fusion_quality_metrics

    entities = spark.createDataFrame(
        [("c1", "e1", "pop", "100"), ("c1", "e2", "pop", "300"),
         ("c1", "e1", "name", "Leipzig"), ("c1", "e2", "name", "leipzig"),
         ("c2", "e3", "pop", "50"), ("c2", "e3", "name", "Halle")],
        "cluster_id string, entity_id string, attribute string, value string",
    )
    fused = fuse_clusters(
        entities,
        {"pop": "average", "name": "concat"},
    )
    got = {(r.cluster_id, r.attribute): r.fused_value for r in fused.collect()}
    assert got[("c1", "pop")] == "200.0"
    assert got[("c1", "name")] == "Leipzig,leipzig"  # sorted distinct concat
    assert got[("c2", "pop")] == "50.0"
    with pytest.raises(ValueError, match="unknown fusion rule"):
        fuse_clusters(entities, {"pop": "median"})

    # max/min order numerically when values parse as numbers ("100" vs
    # "300" vs "1000": lexicographic max would be "300") and fall back
    # to lexicographic for non-numeric attributes
    numeric = spark.createDataFrame(
        [("c1", "e1", "pop", "100"), ("c1", "e2", "pop", "300"),
         ("c1", "e3", "pop", "1000"),
         ("c1", "e1", "name", "Leipzig"), ("c1", "e2", "name", "halle")],
        "cluster_id string, entity_id string, attribute string, value string",
    )
    mm = fuse_clusters(numeric, {"pop": "max", "name": "max"})
    got = {(r.cluster_id, r.attribute): r.fused_value for r in mm.collect()}
    assert got[("c1", "pop")] == "1000"
    assert got[("c1", "name")] == "halle"  # lexicographic for strings
    mn = fuse_clusters(numeric, {"pop": "min"})
    assert {r.fused_value for r in mn.filter("attribute = 'pop'").collect()} == {"100"}

    # null values are skipped (old F.min semantics), and a dirty
    # non-numeric entry in a numeric attribute loses BOTH rules
    dirty = spark.createDataFrame(
        [("c1", "e1", "pop", "100"), ("c1", "e2", "pop", None),
         ("c1", "e3", "pop", "N/A"), ("c1", "e4", "pop", "5")],
        "cluster_id string, entity_id string, attribute string, value string",
    )
    got = {r.attribute: r.fused_value for r in fuse_clusters(dirty, {"pop": "min"}).collect()}
    assert got["pop"] == "5"
    got = {r.attribute: r.fused_value for r in fuse_clusters(dirty, {"pop": "max"}).collect()}
    assert got["pop"] == "100"

    # the literal string "NaN" try_casts to NaN, which Spark orders
    # ABOVE +inf — it must be treated as dirt, not a winning number
    nan = spark.createDataFrame(
        [("c1", "e1", "pop", "9"), ("c1", "e2", "pop", "10"), ("c1", "e3", "pop", "NaN")],
        "cluster_id string, entity_id string, attribute string, value string",
    )
    got = {r.attribute: r.fused_value for r in fuse_clusters(nan, {"pop": "max"}).collect()}
    assert got["pop"] == "10"
    # ...and NaN must not poison the average either (avg propagates NaN)
    got = {r.attribute: r.fused_value for r in fuse_clusters(nan, {"pop": "average"}).collect()}
    assert got["pop"] == "9.5"

    gold = spark.createDataFrame(
        [("c1", "pop", "200.0"), ("c1", "name", "Leipzig"),
         ("c2", "pop", "50.0"), ("c2", "name", "Halle")],
        "cluster_id string, attribute string, fused_value string",
    )
    q = fusion_quality_metrics(fused, gold)
    # c1/name differs (concat vs gold single value); rest correct
    assert q["total_attributes"] == 4
    assert q["correct_attributes"] == 3
    assert q["attribute_accuracy"] == pytest.approx(0.75)
    assert q["total_clusters"] == 2
    assert q["exact_clusters"] == 1  # only c2 fully correct
    assert q["entity_accuracy"] == pytest.approx(0.5)


def test_matching_metrics_reference_semantics(spark):
    """Mirrors SchemaMatchingEvaluator.evaluate_matching_data
    (reference schema_matching/eval.py:105-145): the nullable
    is_match boolean three-way split + avg attributes per schema;
    then P/R/F1 of predicted pairs vs the labeled gold."""
    from odibel_spark.api import matching_data_metrics, matching_pair_metrics

    mappings = spark.createDataFrame(
        [("a.name", "b.label", True), ("a.pop", "b.population", True),
         ("a.name", "b.population", False), ("a.zip", "b.code", None)],
        "source_attribute string, target_attribute string, is_match boolean",
    )
    schemas = spark.createDataFrame(
        [("a", "name"), ("a", "pop"), ("a", "zip"),
         ("b", "label"), ("b", "population"), ("b", "code"), ("b", "extra")],
        "schema string, attribute string",
    )
    m = matching_data_metrics(mappings, schemas)
    assert m["total_mappings"] == 4
    assert m["matches"] == 2 and m["non_matches"] == 1 and m["unlabeled"] == 1
    assert m["match_ratio"] == pytest.approx(0.5)
    assert m["unlabeled_ratio"] == pytest.approx(0.25)
    assert m["total_schemas"] == 2
    assert m["avg_attributes_per_schema"] == pytest.approx(3.5)

    predicted = spark.createDataFrame(
        [("a.name", "b.label"),       # tp
         ("a.name", "b.population"),  # labeled false → fp
         ("a.zip", "b.code"),         # unlabeled gold → unjudged, excluded from n_pred
         ("a.pop", "b.code")],        # absent from gold → judged non-match, fp
        "source_attribute string, target_attribute string",
    )
    r = matching_pair_metrics(predicted, mappings)
    assert r["true_positives"] == 1
    assert r["predicted_matches"] == 3  # the unjudged prediction is not counted
    assert r["gold_matches"] == 2
    assert r["precision"] == pytest.approx(1 / 3)
    assert r["recall"] == pytest.approx(0.5)
    assert r["f1"] == pytest.approx(2 * (1 / 3) * 0.5 / (1 / 3 + 0.5))

    # conflicting gold labels for ONE pair collapse to a single
    # judgment (True wins) — without the collapse the pair joins twice
    # and a lone correct prediction reports precision 0.5
    conflicted = spark.createDataFrame(
        [("a.name", "b.label", True), ("a.name", "b.label", False)],
        "source_attribute string, target_attribute string, is_match boolean",
    )
    one = spark.createDataFrame(
        [("a.name", "b.label")],
        "source_attribute string, target_attribute string",
    )
    c = matching_pair_metrics(one, conflicted)
    assert c["predicted_matches"] == 1 and c["true_positives"] == 1
    assert c["precision"] == pytest.approx(1.0) and c["recall"] == pytest.approx(1.0)
