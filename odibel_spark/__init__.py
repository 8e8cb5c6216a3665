"""odibel_spark — a from-scratch PySpark-native CDC / incremental-ingest
analytics engine with the query and data-processing capabilities of the
ScaDS/ODIBEL reference (see SURVEY.md).

Subpackages
-----------
- ``session``    : SparkSession factory with scale-aware defaults.
- ``lake``       : transactional parquet table format (snapshot manifests,
                   atomic commits, bucketed layout, MERGE, schema evolution,
                   time travel) — the Iceberg-semantics sink.
- ``cdc``        : WAL/binlog generator, batch replay, streaming pipeline,
                   exactly-once apply, lineage + metrics.
- ``operators``  : relational/temporal analytics operators (reference §2).
- ``functions``  : text analysis, dedup (minhash/simhash), similarity
                   search, multimodal column plumbing.
"""

__version__ = "0.1.0"

from odibel_spark.session import get_spark  # noqa: F401
