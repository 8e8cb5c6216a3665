from odibel_spark.sources.rdf import (  # noqa: F401
    RDF_TYPE,
    TRIPLE_COLUMNS,
    build_schema_graph,
    clean_rdf_types,
    entity_types,
    filter_subgraph_by_entity_classes,
    filter_triples_by_subject_type,
    keep_triples_with_object_subject,
    parse_ntriples,
    serialize_ntriples,
    validate_triples,
)
from odibel_spark.sources.csv_ingest import csv_to_parquet, read_csv, write_csv  # noqa: F401
from odibel_spark.sources.famer import (  # noqa: F401
    famer_clusters,
    gold_clusters,
    read_famer_csv_edges,
    read_famer_csv_vertices,
    read_famer_data,
    read_famer_json_edges,
    read_famer_json_vertices,
    read_famer_metadata,
    typed_vertex_table,
)
from odibel_spark.sources.kafka import decode_kafka_wal, encode_as_kafka  # noqa: F401
