"""Benchmark/evaluation API — the Spark-native counterpart of the
reference's abstract benchmark surface (reference
src/pyodibel/api/benchmark.py:17-184, evaluation.py:17-123: Benchmark
with typed splits + ground truth, Evaluator deriving dataset
characteristics). The reference ships interfaces over driver-side
``List[Entity]``; here the payloads are DataFrames so the same
contracts hold at any scale:

- **splits** are deterministic md5-hash assignments (reproducible in
  any engine, stable under repartitioning — ``randomSplit`` is
  neither);
- **profiling** is ONE aggregation pass over the dataset (null
  counts, distincts, numeric ranges per column);
- **entity-resolution evaluation** (pairwise precision/recall/F1 of
  predicted clusters vs gold clusters, the FAMER use case) is computed
  from per-cluster cardinalities — three groupBys, never materializing
  the O(n²) pair sets.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: reference SplitType enum values (benchmark.py:18-24)
SPLIT_TYPES = ("train", "validation", "test", "dev")


def create_splits(
    df: DataFrame,
    ratios: dict[str, float],
    id_cols: list[str],
    seed: int = 42,
) -> dict[str, DataFrame]:
    """Deterministic disjoint splits covering the dataset (reference
    BenchmarkBuilder.create_splits, benchmark.py:146-162).

    Assignment: ``md5(seed, id)``'s first 8 hex chars as a uniform
    fraction in [0, 1), cut at the cumulative ratio thresholds. The
    same row lands in the same split in every engine and run — the
    property train/test hygiene actually needs, which ``randomSplit``
    (partition-dependent) does not give."""
    if not ratios:
        raise ValueError("ratios must not be empty")
    total = sum(ratios.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split ratios must sum to 1.0, got {total}")
    frac = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("\x1f", F.lit(str(seed)), *[F.col(c).cast("string") for c in id_cols])),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / float(1 << 32)
    )
    out: dict[str, DataFrame] = {}
    lo = 0.0
    items = sorted(ratios.items())
    for i, (name, r) in enumerate(items):
        hi = 1.0 if i == len(items) - 1 else lo + r
        out[name] = df.filter((frac >= lo) & (frac < hi))
        lo = hi
    return out


@dataclass
class SparkBenchmark:
    """Named dataset with typed splits + ground truth (reference
    Benchmark/BenchmarkSplit/BenchmarkConfig, benchmark.py:27-124).
    Splits and ground truth are DataFrames, not entity lists."""

    name: str
    description: str = ""
    domain: str | None = None
    version: str | None = None
    metadata: dict = field(default_factory=dict)
    splits: dict[str, DataFrame] = field(default_factory=dict)
    ground_truth: dict[str, DataFrame] = field(default_factory=dict)

    def add_split(self, split_type: str, df: DataFrame, gold: DataFrame | None = None) -> None:
        if split_type not in SPLIT_TYPES:
            raise ValueError(f"unknown split type {split_type!r}; one of {SPLIT_TYPES}")
        self.splits[split_type] = df
        if gold is not None:
            self.ground_truth[split_type] = gold

    def get_split(self, split_type: str) -> DataFrame | None:
        return self.splits.get(split_type)

    def get_splits(self) -> dict[str, DataFrame]:
        return dict(self.splits)

    def get_ground_truth(self, split_type: str | None = None):
        if split_type is None:
            return dict(self.ground_truth)
        return self.ground_truth.get(split_type)

    def get_metadata(self) -> dict:
        return {
            "name": self.name,
            "description": self.description,
            "domain": self.domain,
            "version": self.version,
            **self.metadata,
        }


def profile_dataset(df: DataFrame, exact_distinct: bool = True) -> dict:
    """Dataset characteristics in ONE aggregation pass (reference
    Evaluator.get_statistics/get_characteristics, evaluation.py:93-118):
    row count, per-column null count + distinct count, numeric
    min/max/mean. ``exact_distinct=False`` swaps in HLL
    ``approx_count_distinct`` — the 100 TB setting; exact is the
    oracle-checkable default for tests."""
    numeric = {"int", "bigint", "smallint", "tinyint", "double", "float", "decimal"}
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for name, dtype in df.dtypes:
        aggs.append(F.sum(F.col(name).isNull().cast("long")).alias(f"{name}__nulls"))
        if exact_distinct:
            aggs.append(F.countDistinct(name).alias(f"{name}__distinct"))
        else:
            aggs.append(F.approx_count_distinct(name).alias(f"{name}__distinct"))
        if dtype.split("(")[0] in numeric:
            aggs.append(F.min(name).alias(f"{name}__min"))
            aggs.append(F.max(name).alias(f"{name}__max"))
            aggs.append(F.avg(name).alias(f"{name}__mean"))
    row = df.agg(*aggs).collect()[0].asDict()
    out: dict = {"row_count": row.pop("__rows"), "columns": {}}
    for name, dtype in df.dtypes:
        col = {"dtype": dtype, "nulls": row[f"{name}__nulls"], "distinct": row[f"{name}__distinct"]}
        for stat in ("min", "max", "mean"):
            if f"{name}__{stat}" in row:
                col[stat] = row[f"{name}__{stat}"]
        out["columns"][name] = col
    return out


def cluster_pair_metrics(
    predicted: DataFrame,
    gold: DataFrame,
    id_col: str = "id",
    pred_col: str = "cluster",
    gold_col: str = "recId",
) -> dict:
    """Pairwise entity-resolution quality: precision/recall/F1 of
    predicted clusters against ground-truth clusters (the evaluation
    the reference's Benchmark ground truth exists to drive —
    FAMER gold clusters, gradoop/reader.py:347-356).

    All three pair counts come from cardinalities — for clusters of
    size n there are C(n,2) intra-cluster pairs, and the true-positive
    count is ΣC(n_cell,2) over the (pred, gold) contingency cells — so
    nothing quadratic is ever materialized: three groupBys on an
    entity-level join."""
    joined = predicted.select(F.col(id_col), F.col(pred_col).alias("_p")).join(
        gold.select(F.col(id_col), F.col(gold_col).alias("_g")), id_col, "inner"
    )

    def _pairs(counts: DataFrame) -> int:
        row = counts.agg(
            F.sum((F.col("n") * (F.col("n") - 1) / 2).cast("long")).alias("p")
        ).collect()[0]
        return int(row["p"] or 0)

    tp = _pairs(joined.groupBy("_p", "_g").agg(F.count("*").alias("n")))
    pred_pairs = _pairs(joined.groupBy("_p").agg(F.count("*").alias("n")))
    gold_pairs = _pairs(joined.groupBy("_g").agg(F.count("*").alias("n")))
    precision = tp / pred_pairs if pred_pairs else 0.0
    recall = tp / gold_pairs if gold_pairs else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "true_positive_pairs": tp,
        "predicted_pairs": pred_pairs,
        "gold_pairs": gold_pairs,
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }
