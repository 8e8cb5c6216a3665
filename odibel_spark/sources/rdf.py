"""N-Triples source/sink + triple-table operators — parity with the
reference's Python engine core ``rDF2``
(/root/reference/src/pyodibel/operations/rdf/rdf2.py).

Data model (rdf2.py:25-43): a DataFrame with exactly columns
``s, p, o, isLiteral`` — schema validated on construction. Parsing
(rdf2.py:45-67) is pure column expressions: trim → drop blanks and
comments → check the line terminator with a backtracking-safe rlike →
3-way split → strip the trailing ``.`` → ``isLiteral = o startswith
'"'`` (F4). Serialization (rdf2.py:93-102) is ``concat_ws`` + a
refuse-if-exists sink guard (S8) — superseded by the lake format's
snapshot commits for engine tables, kept here for interchange parity.

All operators below are the reference's semantics re-expressed with
the joins they actually are (left_semi / left_anti instead of
join+project — SURVEY.md §2.2 F5-F8).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRIPLE_COLUMNS = ["s", "p", "o", "isLiteral"]

#: line must end with `.` after optional whitespace; anchored, no
#: nested quantifiers (the reference notes regex-backtracking
#: avoidance, rdf2.py:57)
_TERMINATOR = r"\.\s*$"


def validate_triples(df: DataFrame) -> DataFrame:
    """Schema gate: exactly (s, p, o, isLiteral) — reference
    rDF2._validate raises on missing/extra columns (rdf2.py:29-43)."""
    if list(df.columns) != TRIPLE_COLUMNS:
        raise ValueError(f"triple table must have columns {TRIPLE_COLUMNS}, got {df.columns}")
    return df


def parse_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """Parse an N-Triples text file into the (s,p,o,isLiteral) table."""
    lines = spark.read.text(path).select(F.trim(F.col("value")).alias("line"))
    lines = lines.filter(
        (F.length("line") > 0) & ~F.col("line").startswith("#") & F.col("line").rlike(_TERMINATOR)
    )
    parts = F.split(F.col("line"), r"\s+", 3)
    df = lines.select(
        parts.getItem(0).alias("s"),
        parts.getItem(1).alias("p"),
        F.regexp_replace(parts.getItem(2), r"\s*\.\s*$", "").alias("o"),
    )
    return df.withColumn("isLiteral", F.col("o").startswith('"'))


def serialize_ntriples(df: DataFrame, path: str, overwrite: bool = False) -> None:
    """Write the triple table back as N-Triples text; refuses an
    existing path unless overwrite (reference write_nt guard)."""
    validate_triples(df)
    if os.path.exists(path) and not overwrite:
        raise FileExistsError(path)
    out = df.select(F.concat_ws(" ", "s", "p", "o", F.lit(".")).alias("value"))
    out.write.mode("overwrite" if overwrite else "errorifexists").text(path)


def parse_nquads(spark: SparkSession, path: str) -> DataFrame:
    """Parse N-Quads text into (s, p, o, g, isLiteral) — the named-graph
    sibling of parse_ntriples (reference emits quads via SerUtil.scala:
    27-40; no reader existed there — round-trip closure added here).
    The graph term is the LAST token before the terminator, so literal
    objects containing spaces survive."""
    lines = spark.read.text(path).select(F.trim(F.col("value")).alias("line"))
    lines = lines.filter(
        (F.length("line") > 0) & ~F.col("line").startswith("#") & F.col("line").rlike(_TERMINATOR)
    )
    pat = r"^(\S+)\s+(\S+)\s+(.*?)\s+(\S+)\s+\.\s*$"
    df = lines.select(
        F.regexp_extract("line", pat, 1).alias("s"),
        F.regexp_extract("line", pat, 2).alias("p"),
        F.regexp_extract("line", pat, 3).alias("o"),
        F.regexp_extract("line", pat, 4).alias("g"),
    ).filter(F.length("s") > 0)
    return df.withColumn("isLiteral", F.col("o").startswith('"'))


def serialize_nquads(df: DataFrame, path: str, overwrite: bool = False) -> None:
    """Write (s, p, o, g[, ...]) as N-Quads text: ``s p o g .`` —
    same exists-guard contract as serialize_ntriples."""
    for c in ("s", "p", "o", "g"):
        if c not in df.columns:
            raise ValueError(f"quad table needs column {c!r}")
    if os.path.exists(path) and not overwrite:
        raise FileExistsError(path)
    out = df.select(F.concat_ws(" ", "s", "p", "o", "g", F.lit(".")).alias("value"))
    out.write.mode("overwrite" if overwrite else "errorifexists").text(path)


#: reference SerUtil.TKG namespace (SerUtil.scala:12)
TKG_NS = "http://dbpedia.org/temporal"
#: reference formatDate overflow fallback (SerUtil.scala:17-25)
_DATE_OVERFLOW = "9999-12-31T23:59:59"
_XSD_DT = "<http://www.w3.org/2001/XMLSchema#dateTime>"


def temporal_windows_to_quads(
    windows: DataFrame,
    s: str = "s",
    p: str = "p",
    o: str = "o",
    v_start: str = "v_start",
    v_end: str = "v_end",
    t_start: str = "t_start",
    t_end: str = "t_end",
) -> DataFrame:
    """Serialize temporal windows as named-graph quads (reference
    SerUtil.buildQuads, SerUtil.scala:27-40 + the
    CSVToRDFNamedGraphs.scala:78-85 layout): each validity interval
    becomes a graph ``<TKG/rStart-rEnd>`` holding the data quad, plus
    ``TKG/start`` / ``TKG/end`` xsd:dateTime metadata quads about the
    graph node. Timestamps past the open-window sentinel render as the
    reference's 9999-12-31T23:59:59 fallback. Pure column expressions;
    output columns (s, p, o, g) feed serialize_nquads."""
    interval = F.concat(
        F.col(v_start).cast("string"), F.lit("-"), F.col(v_end).cast("string")
    )
    graph = F.concat(F.lit(f"<{TKG_NS}/"), interval, F.lit(">"))
    max_ok = 253402300799  # 9999-12-31T23:59:59Z epoch seconds

    def fmt(col: str) -> F.Column:
        t = F.col(col)
        return F.when(
            (t > max_ok) | t.isNull(), F.lit(_DATE_OVERFLOW)
        ).otherwise(F.date_format(F.timestamp_seconds(t), "yyyy-MM-dd'T'HH:mm:ss"))

    data = windows.select(
        F.col(s).alias("s"), F.col(p).alias("p"), F.col(o).alias("o"), graph.alias("g")
    )
    meta_subject = graph.alias("s")
    start_meta = windows.select(
        meta_subject,
        F.lit(f"<{TKG_NS}/start>").alias("p"),
        F.concat(F.lit('"'), fmt(t_start), F.lit(f'"^^{_XSD_DT}')).alias("o"),
        F.lit(f"<{TKG_NS}/>").alias("g"),
    )
    end_meta = windows.select(
        meta_subject,
        F.lit(f"<{TKG_NS}/end>").alias("p"),
        F.concat(F.lit('"'), fmt(t_end), F.lit(f'"^^{_XSD_DT}')).alias("o"),
        F.lit(f"<{TKG_NS}/>").alias("g"),
    )
    return data.unionByName(start_meta).unionByName(end_meta)


RDF_TYPE = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"


def filter_triples_by_subject_type(df: DataFrame, type_uri: str) -> DataFrame:
    """Keep triples whose subject has rdf:type == type_uri
    (reference filter_triples_by_s_type, rdf2.py:105-137 — an inner
    join + project there; the left_semi it denotes here)."""
    typed = df.filter((F.col("p") == RDF_TYPE) & (F.col("o") == type_uri)).select("s").distinct()
    return df.join(F.broadcast(typed), "s", "left_semi")


def keep_triples_with_object_subject(df: DataFrame) -> DataFrame:
    """Referential-integrity filter: keep literals, type-edges, and
    triples whose object occurs as some subject
    (reference rdf2.py:139-156)."""
    subjects = df.select(F.col("s").alias("o")).distinct()
    exempt = F.col("isLiteral") | (F.col("p") == RDF_TYPE)
    kept_refs = df.filter(~exempt).join(subjects, "o", "left_semi")
    return df.filter(exempt).unionByName(kept_refs)


def clean_rdf_types(df: DataFrame, allowed_types: list[str]) -> DataFrame:
    """Drop type-edges pointing outside the allowed vocabulary, keep
    everything else (reference clean_rdf_types, rdf2.py:159-170 —
    split/filter/union there; a single-pass predicate here)."""
    is_type = F.col("p") == RDF_TYPE
    return df.filter(~is_type | F.col("o").isin(*allowed_types))


def entity_types(df: DataFrame) -> DataFrame:
    """Distinct (entity, type) pairs from the rdf:type edges — the
    typing dimension every class-scoped operator joins against
    (reference df_types, rdf2.py:198-203 et al.)."""
    return (
        df.filter(F.col("p") == RDF_TYPE)
        .select(F.col("s").alias("entity"), F.col("o").alias("type"))
        .dropDuplicates(["entity", "type"])
    )


def filter_subgraph_by_entity_classes(df: DataFrame, classes: list[str]) -> DataFrame:
    """Class-scoped entity subgraph (F8; reference
    filter_subgraph_by_entity_classes, rdf2.py:175-257).

    Keep triples whose subject has an rdf:type in ``classes`` AND whose
    object is a literal, another selected entity, or an allowed class
    (for type edges). The reference spells this as three join branches
    unioned then deduped; here it is ONE subject semi-join + ONE object
    left-join + a single keep-predicate — the same result with one
    fewer pass over the scoped triples, and the class list stays a
    plan literal (no join) since it is caller-provided and tiny."""
    normalized = [c.strip() for c in classes if c and c.strip()]
    if not normalized:
        raise ValueError("classes must not be empty")
    selected = (
        df.filter((F.col("p") == RDF_TYPE) & F.col("o").isin(*normalized))
        .select("s")
        .distinct()
    )
    scoped = df.join(selected, "s", "left_semi")
    obj_selected = selected.select(F.col("s").alias("o")).withColumn("_o_sel", F.lit(True))
    keep = (
        F.col("isLiteral")
        | ((F.col("p") == RDF_TYPE) & F.col("o").isin(*normalized))
        | F.coalesce(F.col("_o_sel"), F.lit(False))
    )
    return (
        scoped.join(obj_selected, "o", "left")
        .filter(keep)
        .select(*TRIPLE_COLUMNS)
        .dropDuplicates(TRIPLE_COLUMNS)
    )


def build_schema_graph(
    df: DataFrame, property_patterns: list[str] | None = None
) -> DataFrame:
    """Schema-level edge frequencies from triple-level data (A8/J3;
    reference build_schema_graph_df, rdf2.py:548-600): double left
    typing join with ``coalesce(type, 'Untyped')``, literal objects
    rolled up as ``'Literal'``, then a 3-column count.

    Output: (SourceType, Relation, TargetType, Count) — the reference's
    column contract. The reference tail-sorts by Count desc; that global
    sort is left to the caller (pure presentation, and a full exchange
    at scale). ``property_patterns`` uses the exact/``*``-prefix
    vocabulary of predicate_filter_expr (reference
    _schema_graph_property_filter_expr, rdf2.py:79-91)."""
    from odibel_spark.operators.relational import predicate_filter_expr

    data = df
    if property_patterns:
        data = data.filter(predicate_filter_expr("p", property_patterns))
    types = entity_types(df)
    with_source = (
        data.join(types.withColumnRenamed("entity", "s"), "s", "left")
        .select(
            F.col("p").alias("Relation"),
            "o",
            "isLiteral",
            F.coalesce(F.col("type"), F.lit("Untyped")).alias("SourceType"),
        )
    )
    non_literal = (
        with_source.filter(~F.col("isLiteral"))
        .join(types.withColumnRenamed("entity", "o"), "o", "left")
        .select(
            "SourceType",
            "Relation",
            F.coalesce(F.col("type"), F.lit("Untyped")).alias("TargetType"),
        )
    )
    literal = with_source.filter(F.col("isLiteral")).select(
        "SourceType", "Relation", F.lit("Literal").alias("TargetType")
    )
    return (
        non_literal.unionByName(literal)
        .groupBy("SourceType", "Relation", "TargetType")
        .agg(F.count("*").alias("Count"))
    )
