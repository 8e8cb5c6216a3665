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
    """Parse an N-Triples text file into the (s,p,o,isLiteral) table.

    Malformed lines are dropped, matching the reference's guards
    (rdf2.py:58-62): fewer than 3 terms (``getItem(2)`` is null under
    split-with-limit) or an empty object after stripping the terminator
    (``"<s> <p> ."``) filter out instead of yielding a degenerate row.

    The trim is a regexp over ``\\s``, NOT Spark's ``trim`` (ASCII
    space only): a hypothesis property caught ``"\\t9 9."`` surviving
    the space-trim, where the leading tab then split into an EMPTY
    subject token — and a tab-indented ``#`` comment line dodging the
    comment filter the same way.
    """
    from odibel_spark.functions.text import _ws_trim

    lines = spark.read.text(path).select(_ws_trim(F.col("value")).alias("line"))
    lines = lines.filter(
        (F.length("line") > 0) & ~F.col("line").startswith("#") & F.col("line").rlike(_TERMINATOR)
    )
    parts = F.split(F.col("line"), r"\s+", 3)
    # F.get, not getItem: under ANSI mode a short line (fewer than 3
    # terms) must yield null — which the guard below filters — not an
    # ArrayIndexOutOfBounds task failure
    df = lines.select(
        F.get(parts, 0).alias("s"),
        F.get(parts, 1).alias("p"),
        F.regexp_replace(F.get(parts, 2), r"\s*\.\s*$", "").alias("o"),
    )
    df = df.filter(F.col("o").isNotNull() & (F.length("o") > 0))
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
    objects containing spaces survive. Whitespace-trimmed with the same
    regexp as parse_ntriples — under the ASCII-only ``trim`` a leading
    tab broke the ``^(\\S+)`` anchor and silently dropped valid quads."""
    from odibel_spark.functions.text import _ws_trim

    lines = spark.read.text(path).select(_ws_trim(F.col("value")).alias("line"))
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
_XSD_LONG = "<http://www.w3.org/2001/XMLSchema#long>"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
#: 9999-12-31T23:59:59Z in epoch seconds — anything later (or null)
#: renders as the reference's overflow fallback
_MAX_EPOCH_OK = 253402300799


def _fmt_xsd_datetime(col: str) -> F.Column:
    """Epoch-seconds column → the reference's dateTime rendering
    (SerUtil.formatDate, SerUtil.scala:17-25): ISO second precision
    with the 9999-12-31T23:59:59 overflow fallback for open windows."""
    t = F.col(col)
    return F.when(
        (t > _MAX_EPOCH_OK) | t.isNull(), F.lit(_DATE_OVERFLOW)
    ).otherwise(F.date_format(F.timestamp_seconds(t), "yyyy-MM-dd'T'HH:mm:ss"))


def _dt_literal(col: str) -> F.Column:
    return F.concat(F.lit('"'), _fmt_xsd_datetime(col), F.lit(f'"^^{_XSD_DT}'))


def _long_literal(col: str) -> F.Column:
    return F.concat(F.lit('"'), F.col(col).cast("string"), F.lit(f'"^^{_XSD_LONG}'))


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
    fmt = _fmt_xsd_datetime

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


def _window_bnode(s: str, p: str, o: str, v_start: str, v_end: str) -> F.Column:
    """Deterministic blank-node label for one temporal statement.

    The reference labels statement bnodes with ``_:b${System.nanoTime()}``
    (CSVToRDFReification.scala:100) — unique but irreproducible, so two
    runs of the same input never serialize identically and no oracle can
    check the output. Design substitution: md5 over the statement
    identity (s, p, o, rStart, rEnd), which is unique exactly when the
    statement is, stable across runs/engines, and a pure column
    expression."""
    return F.concat(
        F.lit("_:b"),
        F.md5(F.concat_ws("\x1f", F.col(s), F.col(p), F.col(o),
                          F.col(v_start).cast("string"), F.col(v_end).cast("string"))),
    )


def _explode_po(base: DataFrame, subject: F.Column, pairs: list[tuple[F.Column, F.Column]]) -> DataFrame:
    """One scan → k triples per row: explode an inline array of
    (p, o) structs under a shared subject. Avoids the k-way
    union-of-scans the reference's per-row string templates imply."""
    po = F.explode(F.array(*[
        F.struct(p.alias("p"), o.alias("o")) for p, o in pairs
    ]))
    return base.select(subject.alias("s"), po.alias("_po")).select(
        "s", F.col("_po.p").alias("p"), F.col("_po.o").alias("o")
    )


def temporal_windows_to_reified(
    windows: DataFrame,
    s: str = "s",
    p: str = "p",
    o: str = "o",
    v_start: str = "v_start",
    v_end: str = "v_end",
    t_start: str = "t_start",
    t_end: str = "t_end",
) -> DataFrame:
    """RDF statement-reification output model (reference
    CSVToRDFReification.convertRowToRDF, CSVToRDFReification.scala:73-127):
    each temporal window becomes a blank rdf:Statement node carrying 8
    triples — rdf:type/subject/predicate/object plus tStart/tEnd
    (xsd:dateTime, overflow fallback) and rStart/rEnd (xsd:long revision
    bounds). The object column is taken as an already-formatted RDF term
    (use :func:`format_rdf_object` to build one from a raw value, the
    reference's objectPart logic). Temporal annotations use the TKG
    namespace (the reference splits them across example.org/relation in
    the active file vs dbpedia.org/temporal in TKGModelMgr.scala:22 —
    standardized on the latter to match the quads model). Output is a
    plain (s, p, o, isLiteral) triple table; one scan, no per-row
    Python."""
    bnode = _window_bnode(s, p, o, v_start, v_end)
    out = _explode_po(
        windows,
        bnode,
        [
            (F.lit(f"<{RDF_NS}type>"), F.lit(f"<{RDF_NS}Statement>")),
            (F.lit(f"<{RDF_NS}subject>"), F.col(s)),
            (F.lit(f"<{RDF_NS}predicate>"), F.col(p)),
            (F.lit(f"<{RDF_NS}object>"), F.col(o)),
            (F.lit(f"<{TKG_NS}/tStart>"), _dt_literal(t_start)),
            (F.lit(f"<{TKG_NS}/tEnd>"), _dt_literal(t_end)),
            (F.lit(f"<{TKG_NS}/rStart>"), _long_literal(v_start)),
            (F.lit(f"<{TKG_NS}/rEnd>"), _long_literal(v_end)),
        ],
    )
    return out.withColumn("isLiteral", F.col("o").startswith('"'))


def temporal_windows_to_rdf_star(
    windows: DataFrame,
    s: str = "s",
    p: str = "p",
    o: str = "o",
    v_start: str = "v_start",
    v_end: str = "v_end",
    t_start: str = "t_start",
    t_end: str = "t_end",
) -> DataFrame:
    """RDF-star output model (reference CSVToRDFStar,
    TKGModelMgr.scala:130-145): the quoted triple ``<< s p o >>`` is the
    subject of 4 annotation triples (tStart/tEnd dateTime, rStart/rEnd
    long). Emitted as (s, p, o, isLiteral) where ``s`` holds the quoted
    triple term — serialize with :func:`serialize_ntriples` for RDF-star
    text."""
    quoted = F.concat_ws(" ", F.lit("<<"), F.col(s), F.col(p), F.col(o), F.lit(">>"))
    out = _explode_po(
        windows,
        quoted,
        [
            (F.lit(f"<{TKG_NS}/tStart>"), _dt_literal(t_start)),
            (F.lit(f"<{TKG_NS}/tEnd>"), _dt_literal(t_end)),
            (F.lit(f"<{TKG_NS}/rStart>"), _long_literal(v_start)),
            (F.lit(f"<{TKG_NS}/rEnd>"), _long_literal(v_end)),
        ],
    )
    return out.withColumn("isLiteral", F.col("o").startswith('"'))


def temporal_windows_to_property_tkg(
    windows: DataFrame,
    s: str = "s",
    p: str = "p",
    o: str = "o",
    v_start: str = "v_start",
    v_end: str = "v_end",
    t_start: str = "t_start",
    t_end: str = "t_end",
) -> DataFrame:
    """Property-TKG output model (reference ToRDFPropertyTKG.scala:1-27,
    spec'd by its doc example: entity → revision bnode holding the
    property value plus start/end): 4 triples per window —
    ``s TKG/revision _:rev``, ``_:rev p o``, ``_:rev TKG/start dt``,
    ``_:rev TKG/end dt``. The reference class body is an unimplemented
    TODO; this implements the documented contract. Revision bnodes are
    deterministic (see :func:`_window_bnode`)."""
    bnode = _window_bnode(s, p, o, v_start, v_end)
    base = windows.withColumn("_rev", bnode)
    link = base.select(
        F.col(s).alias("s"),
        F.lit(f"<{TKG_NS}/revision>").alias("p"),
        F.col("_rev").alias("o"),
    )
    rev = _explode_po(
        base,
        F.col("_rev"),
        [
            (F.col(p), F.col(o)),
            (F.lit(f"<{TKG_NS}/start>"), _dt_literal(t_start)),
            (F.lit(f"<{TKG_NS}/end>"), _dt_literal(t_end)),
        ],
    )
    out = link.unionByName(rev)
    return out.withColumn("isLiteral", F.col("o").startswith('"'))


def format_rdf_object(value: F.Column, lang: F.Column | None = None) -> F.Column:
    """Raw value → N-Triples object term — the reference's objectPart
    branch (CSVToRDFReification.scala:81-86 + isUri:118-122): language-
    tagged literal if a tag is present, ``<uri>`` if the value matches
    the scheme regex, plain quoted literal otherwise."""
    uri_like = value.rlike(r"^[a-zA-Z][a-zA-Z0-9+.\-]*:")
    quoted = F.concat(F.lit('"'), value, F.lit('"'))
    tagged = F.concat(quoted, lang) if lang is not None else quoted
    base = F.when(uri_like, F.concat(F.lit("<"), value, F.lit(">"))).otherwise(quoted)
    if lang is None:
        return base
    return F.when(lang.isNotNull() & (F.length(lang) > 0), tagged).otherwise(base)


#: TKG output-model registry (reference TKGModelMgr.scala:7-12 — the
#: sealed TKGModel trait with a format tag per model). ``nquads`` is
#: the only quad-shaped model; the rest are plain triple tables.
TKG_MODELS = {
    "nquads": temporal_windows_to_quads,
    "reification": temporal_windows_to_reified,
    "rdfstar": temporal_windows_to_rdf_star,
    "property": temporal_windows_to_property_tkg,
}


def serialize_temporal_model(windows: DataFrame, model: str, **cols) -> DataFrame:
    """Model-selection manager (reference TKGModelMgr.serializeAs,
    TKGModelMgr.scala:7-16): dispatch a temporal-window table to one of
    the four output models by name. Unknown names raise with the valid
    set, mirroring the sealed-trait exhaustiveness."""
    try:
        fn = TKG_MODELS[model]
    except KeyError:
        raise ValueError(f"unknown TKG model {model!r}; one of {sorted(TKG_MODELS)}") from None
    return fn(windows, **cols)


def write_temporal_model(
    windows: DataFrame, model: str, path: str, overwrite: bool = False, **cols
) -> None:
    """serialize_temporal_model + the matching text sink: N-Quads for
    the named-graph model, N-Triples for the triple-shaped models."""
    out = serialize_temporal_model(windows, model, **cols)
    if model == "nquads":
        serialize_nquads(out, path, overwrite=overwrite)
    else:
        serialize_ntriples(out, path, overwrite=overwrite)


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
