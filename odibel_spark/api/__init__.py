from odibel_spark.api.benchmark import (  # noqa: F401
    SPLIT_TYPES,
    SparkBenchmark,
    cluster_pair_metrics,
    create_splits,
    profile_dataset,
)
