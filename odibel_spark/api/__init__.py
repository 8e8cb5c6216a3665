from odibel_spark.api.benchmark import (  # noqa: F401
    FUSION_RULE_TYPES,
    SPLIT_TYPES,
    SparkBenchmark,
    cluster_pair_metrics,
    create_splits,
    fuse_clusters,
    fusion_data_metrics,
    fusion_quality_metrics,
    matching_data_metrics,
    matching_pair_metrics,
    profile_dataset,
)
