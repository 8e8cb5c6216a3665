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

    # One shuffle over the entity-level join builds the (pred, gold)
    # contingency cells; all three pair counts derive from those cells
    # (per-pred and per-gold totals are cell-count sums), so the join
    # executes once instead of three times.
    cells = joined.groupBy("_p", "_g").agg(F.count("*").alias("n")).persist()
    try:
        tp = _pairs(cells)
        pred_pairs = _pairs(cells.groupBy("_p").agg(F.sum("n").alias("n")))
        gold_pairs = _pairs(cells.groupBy("_g").agg(F.sum("n").alias("n")))
    finally:
        cells.unpersist()
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


# ------------------------- entity fusion -----------------------------
#
# Reference benchmark/entity_fusion/{data,eval}.py: EntityCluster /
# EntityFusionData hold driver-side entity lists; FusionRule names an
# attribute-level merge policy ("max", "min", "concat", "average");
# EntityFusionEvaluator.evaluate_fusion_data (eval.py:102-142) derives
# cluster-size statistics and the fused/unfused ratio. Spark-native
# shape: the long entity-property table (cluster_id, entity_id,
# attribute, value) — one row per property assertion — so clusters of
# any size aggregate in one shuffle and nothing lives on the driver.

#: reference FusionRule.rule_type vocabulary (entity_fusion/data.py:29)
FUSION_RULE_TYPES = ("max", "min", "concat", "average", "first")


def fuse_clusters(
    entities: DataFrame,
    rules: dict[str, str],
    default_rule: str = "first",
    cluster_col: str = "cluster_id",
    attr_col: str = "attribute",
    value_col: str = "value",
) -> DataFrame:
    """Apply attribute-level fusion rules to entity clusters — the
    task the reference's FusionRule vocabulary describes but never
    executes (entity_fusion/data.py:26-32 is a dataclass only).

    One groupBy (cluster, attribute) computes every rule's aggregate;
    a per-attribute CASE picks the ruled one. ``concat`` is the sorted
    distinct concatenation (deterministic, engine-reproducible —
    collect_list order is not). Output: one fused value per
    (cluster_id, attribute), value as string."""
    for attr, rule in rules.items():
        if rule not in FUSION_RULE_TYPES:
            raise ValueError(f"unknown fusion rule {rule!r} for {attr!r}; one of {FUSION_RULE_TYPES}")
    if default_rule not in FUSION_RULE_TYPES:
        raise ValueError(f"unknown default rule {default_rule!r}")
    v = F.col(value_col)
    # max/min order NUMERICALLY when the value parses as a number and
    # lexicographically otherwise: a population attribute with values
    # "9" and "10" must fuse to 10, not the lexicographic "9".
    # Direction-consistent: non-numeric values rank below every number
    # in BOTH directions (-inf for max, +inf for min), so one dirty
    # "N/A" in a numeric attribute never wins either rule, while
    # all-string attributes tie on the sentinel and fall back to the
    # lexicographic second key. Null VALUES produce a null order key,
    # which max_by/min_by skip (matching the old F.min/F.max). try_cast:
    # ANSI mode is on, and rules share a table with non-numeric attrs.
    raw_num = v.try_cast("double")
    # a literal "NaN" string try_casts to NaN, which Spark orders ABOVE
    # +Infinity — without this guard it would beat every real number
    # under the max rule; treat it as non-numeric like any other dirt
    num = F.when(raw_num.isNotNull() & ~F.isnan(raw_num), raw_num)
    s = v.cast("string")
    max_key = F.when(v.isNotNull(), F.struct(F.coalesce(num, F.lit(float("-inf"))).alias("n"), s.alias("s")))
    min_key = F.when(v.isNotNull(), F.struct(F.coalesce(num, F.lit(float("inf"))).alias("n"), s.alias("s")))
    agg = entities.groupBy(cluster_col, attr_col).agg(
        F.max_by(s, max_key).alias("_max"),
        F.min_by(s, min_key).alias("_min"),
        F.concat_ws(",", F.array_sort(F.collect_set(v.cast("string")))).alias("_concat"),
        # the NaN-guarded num, not raw try_cast: avg propagates NaN,
        # so one literal "NaN" string would poison the whole average
        F.avg(num).cast("string").alias("_average"),
        F.min(v.cast("string")).alias("_first"),
    )
    chain = None
    for attr, rule in rules.items():
        cond = F.col(attr_col) == attr
        expr = F.col(f"_{rule}")
        chain = F.when(cond, expr) if chain is None else chain.when(cond, expr)
    default_expr = F.col(f"_{default_rule}")
    picked = chain.otherwise(default_expr) if chain is not None else default_expr
    return agg.select(
        cluster_col, attr_col, picked.alias("fused_value")
    )


def fusion_data_metrics(
    cluster_entities: DataFrame,
    fused: DataFrame | None = None,
    cluster_col: str = "cluster_id",
    entity_col: str = "entity_id",
) -> dict:
    """Data-characteristic metrics for an entity-fusion benchmark —
    reference EntityFusionEvaluator.evaluate_fusion_data
    (entity_fusion/eval.py:102-142): cluster/entity totals,
    min/avg/max cluster size, fused vs unfused cluster counts and the
    fusion ratio. ``cluster_entities`` is entity-level membership
    (cluster_id, entity_id); ``fused`` optionally lists cluster_ids
    that have a fused entity. One shuffle to per-cluster sizes, one
    tiny re-agg, one optional semi-join count."""
    sizes = cluster_entities.groupBy(cluster_col).agg(
        F.countDistinct(entity_col).alias("n")
    ).persist()
    try:
        row = sizes.agg(
            F.count("*").alias("clusters"),
            F.sum("n").alias("entities"),
            F.avg("n").alias("avg_size"),
            F.min("n").alias("min_size"),
            F.max("n").alias("max_size"),
        ).collect()[0]
        total = int(row["clusters"] or 0)
        out = {
            "total_clusters": total,
            "total_entities": int(row["entities"] or 0),
            "avg_cluster_size": float(row["avg_size"]) if row["avg_size"] is not None else 0.0,
            "min_cluster_size": int(row["min_size"]) if row["min_size"] is not None else 0,
            "max_cluster_size": int(row["max_size"]) if row["max_size"] is not None else 0,
        }
        if fused is not None:
            n_fused = (
                sizes.join(fused.select(F.col(cluster_col)).distinct(), cluster_col, "left_semi")
                .count()
            )
            out["fused_clusters"] = n_fused
            out["unfused_clusters"] = total - n_fused
            out["fusion_ratio"] = n_fused / total if total else 0.0
        return out
    finally:
        sizes.unpersist()


def fusion_quality_metrics(
    fused_pred: DataFrame,
    fused_gold: DataFrame,
    cluster_col: str = "cluster_id",
    attr_col: str = "attribute",
    value_col: str = "fused_value",
) -> dict:
    """Task-result quality for entity fusion: compare predicted fused
    entities against ground-truth fused entities (the evaluation the
    reference's EntityFusionBenchmark.get_ground_truth exists to drive,
    entity_fusion/data.py:107-124). Long-form (cluster, attribute,
    value) on both sides; a full-outer join yields per-attribute
    correct/wrong/missing/extra counts plus entity-level accuracy
    (every attribute of the cluster correct)."""
    p = fused_pred.select(
        F.col(cluster_col).alias("_c"), F.col(attr_col).alias("_a"),
        F.col(value_col).cast("string").alias("_pv"),
    )
    g = fused_gold.select(
        F.col(cluster_col).alias("_c"), F.col(attr_col).alias("_a"),
        F.col(value_col).cast("string").alias("_gv"),
    )
    j = p.join(g, ["_c", "_a"], "full_outer").select(
        "_c",
        F.when(F.col("_pv").isNull(), F.lit("missing"))
        .when(F.col("_gv").isNull(), F.lit("extra"))
        .when(F.col("_pv") == F.col("_gv"), F.lit("correct"))
        .otherwise(F.lit("wrong"))
        .alias("_k"),
    )
    per_cluster = j.groupBy("_c").agg(
        F.count("*").alias("n"),
        F.sum((F.col("_k") == "correct").cast("long")).alias("ok"),
    )
    row = per_cluster.agg(
        F.sum("n").alias("attrs"),
        F.sum("ok").alias("correct"),
        F.count("*").alias("clusters"),
        F.sum((F.col("ok") == F.col("n")).cast("long")).alias("exact_clusters"),
    ).collect()[0]
    attrs = int(row["attrs"] or 0)
    correct = int(row["correct"] or 0)
    clusters = int(row["clusters"] or 0)
    exact = int(row["exact_clusters"] or 0)
    return {
        "total_attributes": attrs,
        "correct_attributes": correct,
        "attribute_accuracy": correct / attrs if attrs else 0.0,
        "total_clusters": clusters,
        "exact_clusters": exact,
        "entity_accuracy": exact / clusters if clusters else 0.0,
    }


# ------------------------- schema matching ---------------------------
#
# Reference benchmark/schema_matching/{data,eval}.py: AttributeMapping
# rows carry (source_attribute, target_attribute, is_match?) where
# is_match is a NULLABLE boolean — None means unlabeled;
# SchemaMatchingEvaluator.evaluate_matching_data (eval.py:105-145)
# splits mappings into matches/non-matches/unlabeled and averages
# schema attribute counts. Spark shape: a mappings DataFrame with a
# nullable boolean column — the three-way split is one aggregation.


def matching_data_metrics(
    mappings: DataFrame,
    schemas: DataFrame | None = None,
    match_col: str = "is_match",
    schema_col: str = "schema",
    attr_col: str = "attribute",
) -> dict:
    """Data-characteristic metrics for a schema-matching benchmark —
    reference SchemaMatchingEvaluator.evaluate_matching_data
    (schema_matching/eval.py:105-145): match / non-match / unlabeled
    counts and ratios in ONE pass over the mappings (the nullable
    boolean IS the three-way partition), plus avg attributes per
    schema from the optional schema table (one tiny two-level agg)."""
    m = F.col(match_col)
    row = mappings.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum((m == True).cast("long")).alias("matches"),  # noqa: E712
        F.sum((m == False).cast("long")).alias("non_matches"),  # noqa: E712
        F.sum(m.isNull().cast("long")).alias("unlabeled"),
    ).collect()[0]
    total = int(row["total"] or 0)
    out = {
        "total_mappings": total,
        "matches": int(row["matches"] or 0),
        "non_matches": int(row["non_matches"] or 0),
        "unlabeled": int(row["unlabeled"] or 0),
    }
    if total:
        out["match_ratio"] = out["matches"] / total
        out["non_match_ratio"] = out["non_matches"] / total
        out["unlabeled_ratio"] = out["unlabeled"] / total
    if schemas is not None:
        srow = (
            schemas.groupBy(schema_col)
            .agg(F.countDistinct(attr_col).alias("n"))
            .agg(F.count("*").alias("schemas"), F.avg("n").alias("avg_attrs"))
            .collect()[0]
        )
        out["total_schemas"] = int(srow["schemas"] or 0)
        out["avg_attributes_per_schema"] = (
            float(srow["avg_attrs"]) if srow["avg_attrs"] is not None else 0.0
        )
    return out


def matching_pair_metrics(
    predicted: DataFrame,
    gold: DataFrame,
    src_col: str = "source_attribute",
    dst_col: str = "target_attribute",
    match_col: str = "is_match",
) -> dict:
    """Task-result P/R/F1 for schema matching: predicted match pairs
    vs gold-labeled mappings (the evaluation the reference's
    get_ground_truth labels exist to drive, schema_matching/data.py:
    100-112). ``predicted`` lists proposed (source, target) matches;
    ``gold`` carries the labeled mappings. Unlabeled gold rows are
    excluded in BOTH directions (reference semantics: None is not a
    judgment): an unjudged pair neither counts toward recall nor —
    when predicted — toward ``n_pred``, so precision is computed over
    judged pairs only. Pairs absent from gold entirely are judged
    non-matches (the mapping set is complete over its space) and stay
    false positives. One full-outer join on the pair key, one
    aggregation."""
    p = predicted.select(
        F.col(src_col).alias("_s"), F.col(dst_col).alias("_t"), F.lit(True).alias("_pred")
    ).distinct()
    # one judgment per pair: conflicting gold labels (the same pair
    # annotated both True and False in a merged mapping set) collapse
    # to match=True — otherwise the pair joins twice and inflates
    # n_pred, under-reporting precision for a correct prediction
    g_all = gold.groupBy(F.col(src_col).alias("_s"), F.col(dst_col).alias("_t")).agg(
        F.max(F.col(match_col).cast("boolean")).alias("_gold")
    )
    unjudged = g_all.filter(F.col("_gold").isNull()).select("_s", "_t")
    g = g_all.filter(F.col("_gold").isNotNull())
    p = p.join(unjudged, ["_s", "_t"], "left_anti")
    j = p.join(g, ["_s", "_t"], "full_outer")
    row = j.agg(
        F.sum((F.col("_pred").isNotNull() & (F.col("_gold") == True)).cast("long")).alias("tp"),  # noqa: E712
        F.sum(F.col("_pred").isNotNull().cast("long")).alias("n_pred"),
        F.sum((F.col("_gold") == True).cast("long")).alias("n_gold"),  # noqa: E712
    ).collect()[0]
    tp = int(row["tp"] or 0)
    n_pred = int(row["n_pred"] or 0)
    n_gold = int(row["n_gold"] or 0)
    precision = tp / n_pred if n_pred else 0.0
    recall = tp / n_gold if n_gold else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "true_positives": tp,
        "predicted_matches": n_pred,
        "gold_matches": n_gold,
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }
