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
