from odibel_spark.operators.temporal import (  # noqa: F401
    as_of_join,
    build_temporal_windows,
    change_flux,
    changes_per_key,
    duration_histogram,
    interval_marks,
    snapshot_at,
    snapshot_statistics,
    time_bucketed_counts,
    value_distribution_stats,
)
from odibel_spark.operators.diff import set_diff, snapshot_diff  # noqa: F401
from odibel_spark.operators.graph import (  # noqa: F401
    cluster_summary,
    connected_components,
    connected_components_star,
)
from odibel_spark.operators.sampling import (  # noqa: F401
    related_entities,
    resource_adjacency,
    sample_entities_all_types,
    sample_entities_by_type_targets,
    sample_entities_global,
)
from odibel_spark.operators.relational import (  # noqa: F401
    degree_distribution,
    filter_by_key_type,
    min_per_group_reagg,
    predicate_filter_expr,
    referential_integrity_filter,
    seeded_sample,
    top_k_per_group,
)
from odibel_spark.operators.similarity_graph import (  # noqa: F401
    PropertyComparator,
    build_similarity_edges,
    classify_links,
    filter_similarity_links,
    similarity_clusters,
)
