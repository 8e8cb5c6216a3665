from odibel_spark.sources.rdf import (  # noqa: F401
    RDF_TYPE,
    TRIPLE_COLUMNS,
    clean_rdf_types,
    filter_triples_by_subject_type,
    keep_triples_with_object_subject,
    parse_ntriples,
    serialize_ntriples,
    validate_triples,
)
from odibel_spark.sources.csv_ingest import csv_to_parquet, read_csv, write_csv  # noqa: F401
from odibel_spark.sources.kafka import decode_kafka_wal, encode_as_kafka  # noqa: F401
