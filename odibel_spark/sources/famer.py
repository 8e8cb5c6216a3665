"""FAMER/Gradoop similarity-graph reader — Spark-native ingestion of
the reference's entity-resolution exchange format (reference
src/pyodibel/operations/gradoop/reader.py:21-137,264-341 and
famer_constant.py).

Format (both layouts carry vertices + edges + optional graph heads):

- **JSON layout**: JSONL files. Vertex lines
  ``{"id": ..., "data_io": {"srcId": <source>, <prop>: <value>, ...}}``
  (famer_constant: PROPERTIES='data_io', RESOURCE='srcId'); edge lines
  ``{"source": ..., "target": ..., "data_io": {"value": <similarity>}}``.
- **CSV layout**: ``metadata.csv`` rows ``v;<source>;name:type,...``
  describe each source's attribute order; vertex lines are
  ``id;graphs;source;val|val|...`` split on UNESCAPED ``;`` / ``|``
  with ``\\,`` and ``\\:`` unescaped in values (reader.py:283-330 —
  the reference leaves ``\\;``/``\\|`` escaped, mirrored here); edge
  rows are ``;``-CSV with src=col2, target=col3, similarity=col5.

The reference materializes a driver-side dict-of-Entity + NetworkX
graph; here vertices/edges are DataFrames and clusters come from the
distributed connected-components operator (operators/graph.py) — the
cluster id is the minimum member id (deterministic representative)
instead of the reference's enumeration order, which is not stable
across runs anyway.

Scale shape: vertex/edge parsing is pure column expressions over
``spark.read.text``/``json``; the only driver-side IO is the tiny
``metadata.csv``. Edge endpoint filtering (reference: ``src in
entities and target in entities``) is two semi-joins.
"""

from __future__ import annotations

import csv
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: famer_constant.py names
ID, PROPERTIES, RESOURCE, REC_ID = "id", "data_io", "srcId", "recId"
SRC, TARGET, SIM, DEXTER_REC_ID = "source", "target", "value", "gtId"


def _layout_files(folder: str, kind: str) -> list[str]:
    """Files (or dir contents) whose name contains `kind` — the
    reference walks the folder the same way (reader.py:46-64)."""
    out = []
    for fn in sorted(os.listdir(folder), reverse=True):
        path = os.path.join(folder, fn)
        if kind not in fn:
            continue
        if os.path.isfile(path):
            out.append(path)
        else:
            out.extend(os.path.join(path, f) for f in sorted(os.listdir(path)))
    return out


def read_famer_json_vertices(spark: SparkSession, folder: str) -> DataFrame:
    """(id, resource, props map<string,string>) from JSONL vertex files.
    Values coerce to string in the map (heterogeneous per-source props);
    use the metadata-typed CSV path or cast at use-site for numerics."""
    paths = _layout_files(folder, "vertices")
    raw = spark.read.text(paths)
    parsed = raw.select(
        F.from_json(
            F.col("value"), f"{ID} string, {PROPERTIES} map<string,string>"
        ).alias("v")
    )
    return parsed.select(
        F.col(f"v.{ID}").alias("id"),
        F.col(f"v.{PROPERTIES}")[RESOURCE].alias("resource"),
        F.map_filter(F.col(f"v.{PROPERTIES}"), lambda k, _: k != RESOURCE).alias("props"),
    )


def read_famer_json_edges(
    spark: SparkSession, folder: str, vertices: DataFrame | None = None
) -> DataFrame:
    """(src, dst, sim) from JSONL edge files; endpoints restricted to
    known vertices when given (reference drops dangling edges,
    reader.py:250-262)."""
    paths = _layout_files(folder, "edges")
    raw = spark.read.text(paths)
    parsed = raw.select(
        F.from_json(
            F.col("value"),
            f"{SRC} string, {TARGET} string, {PROPERTIES} map<string,string>",
        ).alias("e")
    )
    edges = parsed.select(
        F.col(f"e.{SRC}").alias("src"),
        F.col(f"e.{TARGET}").alias("dst"),
        F.col(f"e.{PROPERTIES}")[SIM].cast("double").alias("sim"),
    )
    if vertices is not None:
        ids = vertices.select(F.col("id"))
        edges = edges.join(ids.withColumnRenamed("id", "src"), "src", "left_semi").join(
            ids.withColumnRenamed("id", "dst"), "dst", "left_semi"
        )
    return edges


def read_famer_metadata(folder: str) -> dict[str, list[tuple[str, str]]]:
    """metadata.csv → {source: [(attr_name, type), ...] in order}
    (reference read_meta_data, reader.py:264-279). Driver-side: the
    file is a handful of rows."""
    meta: dict[str, list[tuple[str, str]]] = {}
    with open(os.path.join(folder, "metadata.csv"), newline="", encoding="utf-8") as f:
        for row in csv.reader(f, delimiter=";"):
            if row and row[0] == "v":
                meta[row[1]] = [
                    (a.split(":")[0], a.split(":")[1]) for a in row[2].split(",")
                ]
    return meta


#: split on un-backslash-escaped delimiter (reference regex,
#: reader.py:286 / 301)
_UNESC_SEMI = r"(?<!\\);"
_UNESC_PIPE = r"(?<!\\)\|"


def read_famer_csv_vertices(
    spark: SparkSession, folder: str, metadata: dict[str, list[tuple[str, str]]] | None = None
) -> DataFrame:
    """(id, resource, props map<string,string>, recId) from the CSV
    layout. Attribute names come from metadata.csv per source; values
    unescape ``\\,`` and ``\\:`` exactly like the reference
    (reader.py:301-330). ``recId`` mirrors the reference's
    ``props[recId] = props[gtId]`` promotion."""
    metadata = metadata if metadata is not None else read_famer_metadata(folder)
    spark_meta = spark.createDataFrame(
        [(src, [a[0] for a in atts]) for src, atts in sorted(metadata.items())],
        "resource string, att_names array<string>",
    )
    paths = _layout_files(folder, "vertices")
    raw = spark.read.text(paths).filter(F.length(F.trim("value")) > 0)
    parts = F.split(F.col("value"), _UNESC_SEMI)
    rows = raw.select(
        parts.getItem(0).alias("id"),
        parts.getItem(2).alias("resource"),
        F.transform(
            F.split(parts.getItem(3), _UNESC_PIPE),
            lambda v: F.regexp_replace(F.regexp_replace(v, r"\\,", ","), r"\\:", ":"),
        ).alias("att_values"),
    )
    joined = rows.join(F.broadcast(spark_meta), "resource", "left")
    props = F.map_from_arrays(
        F.col("att_names"), F.slice(F.col("att_values"), 1, F.size("att_names"))
    )
    return joined.select(
        "id",
        "resource",
        props.alias("props"),
        props[DEXTER_REC_ID].alias(REC_ID),
    )


def read_famer_csv_edges(
    spark: SparkSession, folder: str, vertices: DataFrame | None = None
) -> DataFrame:
    """(src, dst, sim) from ``;``-CSV edge files: src=col2, dst=col3,
    sim=col5 (reference read_edge_csv_file, reader.py:333-344)."""
    paths = _layout_files(folder, "edges")
    raw = spark.read.csv(paths, sep=";", header=False)
    edges = raw.select(
        F.col("_c2").alias("src"),
        F.col("_c3").alias("dst"),
        F.col("_c5").cast("double").alias("sim"),
    )
    if vertices is not None:
        ids = vertices.select("id")
        edges = edges.join(ids.withColumnRenamed("id", "src"), "src", "left_semi").join(
            ids.withColumnRenamed("id", "dst"), "dst", "left_semi"
        )
    return edges


def typed_vertex_table(
    vertices: DataFrame, metadata: dict[str, list[tuple[str, str]]], source: str
) -> DataFrame:
    """One source's vertices as a typed flat table — the DataFrame
    analogue of the reference's per-entity int/float casting
    (reader.py:305-327): ``int``→long, ``float``/``double``→double,
    everything else string."""
    casts = {"int": "long", "float": "double", "double": "double"}
    cols = [F.col("id"), F.col("resource")]
    for name, typ in metadata[source]:
        c = F.col("props")[name]
        cols.append(c.cast(casts.get(typ, "string")).alias(name))
    return vertices.filter(F.col("resource") == source).select(*cols)


def read_famer_data(spark: SparkSession, folder: str) -> tuple[DataFrame, DataFrame]:
    """(vertices, edges) with the layout auto-detected like the
    reference's read_data (reader.py:21-27): JSON if the
    reverse-sorted first file name contains 'json', else CSV."""
    names = sorted(os.listdir(folder), reverse=True)
    if names and "json" in names[0]:
        v = read_famer_json_vertices(spark, folder)
        return v, read_famer_json_edges(spark, folder, v)
    v = read_famer_csv_vertices(spark, folder)
    return v, read_famer_csv_edges(spark, folder, v)


def famer_clusters(vertices: DataFrame, edges: DataFrame) -> DataFrame:
    """Entity clusters = connected components of the similarity graph
    (reference: nx.connected_components on the driver,
    reader.py:66-77), distributed. Output: one row per entity —
    (cluster, id, resource) with cluster = min member id. Entities with
    no edges form singleton clusters (the reference drops them from
    cluster_graphs; kept here — a resolution pipeline needs the
    unmatched entities too, and dropping is a trivial filter)."""
    from odibel_spark.operators.graph import connected_components

    comp = connected_components(edges, "src", "dst")
    return (
        vertices.join(
            comp.withColumnRenamed("vertex", "id").withColumnRenamed("component", "cluster"),
            "id",
            "left",
        )
        .select(F.coalesce("cluster", F.col("id")).alias("cluster"), "id", "resource")
    )


def gold_clusters(vertices: DataFrame) -> DataFrame:
    """Ground-truth clusters: group by the gold record id (reference
    generate_gold_clusters, reader.py:347-356). Output:
    (recId, size, members sorted array)."""
    return (
        vertices.filter(F.col(REC_ID).isNotNull())
        .groupBy(REC_ID)
        .agg(F.count("*").alias("size"), F.array_sort(F.collect_list("id")).alias("members"))
    )
