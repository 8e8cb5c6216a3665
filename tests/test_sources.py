"""N-Triples source/sink + triple operators (reference rDF2 parity)."""

from __future__ import annotations

import os

import pytest

from odibel_spark.sources import (
    RDF_TYPE,
    clean_rdf_types,
    filter_triples_by_subject_type,
    keep_triples_with_object_subject,
    parse_ntriples,
    serialize_ntriples,
    validate_triples,
)

NT = """# a comment line

<http://ex/a> <http://ex/knows> <http://ex/b> .
<http://ex/a> {t} <http://ex/Person> .
<http://ex/b> <http://ex/name> "Bee"@en .
<http://ex/b> <http://ex/age> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .
<http://ex/c> <http://ex/knows> <http://ex/ghost> .
not a triple line without terminator
""".format(t=RDF_TYPE)


@pytest.fixture()
def nt_path(tmpdir_path):
    p = os.path.join(tmpdir_path, "data.nt")
    with open(p, "w") as f:
        f.write(NT)
    return p


def test_parse_roundtrip(spark, nt_path, tmpdir_path):
    df = parse_ntriples(spark, nt_path)
    rows = df.collect()
    assert len(rows) == 5  # comment, blank, unterminated dropped
    lits = {r.o for r in rows if r.isLiteral}
    assert lits == {'"Bee"@en', '"42"^^<http://www.w3.org/2001/XMLSchema#integer>'}

    out = os.path.join(tmpdir_path, "out.nt")
    serialize_ntriples(df, out)
    again = parse_ntriples(spark, out)
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, rows))
    with pytest.raises(FileExistsError):
        serialize_ntriples(df, out)


def test_validate_rejects_bad_schema(spark):
    bad = spark.createDataFrame([("a", "b")], "s string, p string")
    with pytest.raises(ValueError):
        validate_triples(bad)


def test_subject_type_filter(spark, nt_path):
    df = parse_ntriples(spark, nt_path)
    person = filter_triples_by_subject_type(df, "<http://ex/Person>")
    assert {r.s for r in person.collect()} == {"<http://ex/a>"}
    assert person.count() == 2  # knows + type edge


def test_object_subject_filter(spark, nt_path):
    df = parse_ntriples(spark, nt_path)
    kept = keep_triples_with_object_subject(df)
    objs = {(r.s, r.o) for r in kept.collect()}
    # dangling <http://ex/ghost> reference dropped; literals + type edge kept
    assert ("<http://ex/c>", "<http://ex/ghost>") not in objs
    assert ("<http://ex/a>", "<http://ex/b>") in objs
    assert len(objs) == 4


def test_clean_rdf_types(spark, nt_path):
    df = parse_ntriples(spark, nt_path)
    cleaned = clean_rdf_types(df, ["<http://ex/Robot>"])
    assert cleaned.filter(cleaned.p == RDF_TYPE).count() == 0
    assert cleaned.count() == 4


def test_csv_ingest_quote_handling_and_roundtrip(spark, tmpdir_path):
    """Reference CSVToParquet posture: header, no inference, messy
    unescaped quotes recovered BACK_TO_DELIMITER."""
    import os

    from pyspark.sql import types as T

    from odibel_spark.sources import csv_to_parquet, read_csv, write_csv

    raw = os.path.join(tmpdir_path, "in.csv")
    with open(raw, "w") as f:
        f.write('id,txt,n\n1,"plain",10\n2,"has ""quotes"" inside",20\n3,"unescaped "broken" text",30\n')
    schema = T.StructType([
        T.StructField("id", T.IntegerType()),
        T.StructField("txt", T.StringType()),
        T.StructField("n", T.IntegerType()),
    ])
    # clean mode: well-formed escapes parse exactly
    df = read_csv(spark, raw, schema)
    rows = {r.id: (r.txt, r.n) for r in df.collect()}
    assert rows[1] == ("plain", 10)
    assert rows[2] == ('has "quotes" inside', 20)

    # dirty mode (reference CSVToParquet setting): the broken-quote row
    # is recovered instead of dropped/nulled
    dirty = read_csv(spark, raw, schema, unescaped_quote_handling="BACK_TO_DELIMITER")
    drows = {r.id: (r.txt, r.n) for r in dirty.collect()}
    assert drows[3][1] == 30 and "broken" in drows[3][0]

    pq = os.path.join(tmpdir_path, "out_pq")
    csv_to_parquet(spark, raw, pq, schema)
    assert spark.read.parquet(pq).count() == 3

    out_csv = os.path.join(tmpdir_path, "out_csv")
    write_csv(spark.read.parquet(pq), out_csv, n_files=1)
    back = read_csv(spark, out_csv, schema)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}


def test_kafka_envelope_roundtrip(spark):
    """WAL → Kafka envelope → decoded WAL is exact; corrupt payloads
    surface as NULL rows (dead-letter food), never dropped."""
    from pyspark.sql import functions as F

    from odibel_spark.cdc import WalConfig, gen_events
    from odibel_spark.sources import decode_kafka_wal, encode_as_kafka

    ev = gen_events(spark, WalConfig(n_events=2000, n_convs=40, seed=9)).drop("_feed_order")
    enveloped = encode_as_kafka(ev)
    assert dict(enveloped.dtypes)["value"] == "binary"
    decoded = decode_kafka_wal(enveloped, ev.schema)
    cols = [c for c in ev.columns]
    def cks(df):
        return tuple(df.agg(F.count("*"), F.sum(F.pmod(F.xxhash64(*cols), F.lit(2**31)))).collect()[0])
    assert cks(decoded.select(*cols)) == cks(ev)
    # lineage struct present, offsets = lsn
    assert decoded.filter(F.col("_kafka.offset") != F.col("lsn")).count() == 0

    # corrupt envelope → NULL payload row (downstream dead-letter), not a drop
    junk = enveloped.withColumn("value", F.lit(b"not json"))
    got = decode_kafka_wal(junk, ev.schema)
    assert got.count() == enveloped.count()
    assert got.filter(F.col("conv_id").isNotNull()).count() == 0


# --------------------------------------------------------------- FAMER
def _write(path, text):
    with open(path, "w", encoding="utf-8") as f:
        f.write(text)


@pytest.fixture()
def famer_json_dir(tmpdir_path):
    d = os.path.join(tmpdir_path, "famer_json")
    os.makedirs(d)
    _write(
        os.path.join(d, "vertices.json"),
        "\n".join(
            [
                '{"id": "v1", "data_io": {"srcId": "dbp", "name": "Alice", "gtId": "g1"}}',
                '{"id": "v2", "data_io": {"srcId": "wd", "name": "Alyce", "gtId": "g1"}}',
                '{"id": "v3", "data_io": {"srcId": "dbp", "name": "Bob", "gtId": "g2"}}',
                '{"id": "v4", "data_io": {"srcId": "wd", "name": "Robert", "gtId": "g2"}}',
                '{"id": "v5", "data_io": {"srcId": "dbp", "name": "Zed", "gtId": "g3"}}',
            ]
        ),
    )
    _write(
        os.path.join(d, "edges.json"),
        "\n".join(
            [
                '{"source": "v1", "target": "v2", "data_io": {"value": "0.93"}}',
                '{"source": "v3", "target": "v4", "data_io": {"value": "0.81"}}',
                '{"source": "v4", "target": "ghost", "data_io": {"value": "0.99"}}',
            ]
        ),
    )
    return d


def test_famer_json_reader_and_clusters(spark, famer_json_dir):
    """Reference semantics (gradoop/reader.py:38-77): entities keyed by
    id with srcId popped into resource; dangling edges dropped; clusters
    = connected components (representative = min id here)."""
    from odibel_spark.sources import famer_clusters, gold_clusters, read_famer_data

    v, e = read_famer_data(spark, famer_json_dir)
    ents = {r.id: (r.resource, dict(r.props)) for r in v.collect()}
    assert ents["v1"] == ("dbp", {"name": "Alice", "gtId": "g1"})
    assert len(ents) == 5
    edges = {(r.src, r.dst): r.sim for r in e.collect()}
    # the ghost edge is dropped (reference: src in entities and target in entities)
    assert edges == {("v1", "v2"): 0.93, ("v3", "v4"): 0.81}

    clusters = {r.id: r.cluster for r in famer_clusters(v, e).collect()}
    assert clusters == {"v1": "v1", "v2": "v1", "v3": "v3", "v4": "v3", "v5": "v5"}


@pytest.fixture()
def famer_csv_dir(tmpdir_path):
    d = os.path.join(tmpdir_path, "famer_csv")
    os.makedirs(d)
    _write(
        os.path.join(d, "metadata.csv"),
        "v;dbp;name:string,age:int,gtId:string\nv;wd;name:string,score:float,gtId:string\n",
    )
    _write(
        os.path.join(d, "vertices.csv"),
        "\n".join(
            [
                r"v1;[];dbp;Smith\, John|41|g1",
                r"v2;[];wd;John Smith|0.5|g1",
                r"v3;[];dbp;ratio 2\:1|7|g2",
            ]
        ),
    )
    _write(
        os.path.join(d, "edges.csv"),
        "e1;[];v1;v2;sim;0.88\ne2;[];v1;ghost;sim;0.99\n",
    )
    return d


def test_famer_csv_reader(spark, famer_csv_dir):
    """Metadata-driven CSV parse (reference reader.py:264-344):
    per-source attribute naming, unescaped \\, and \\:, gtId→recId
    promotion, typed per-source projection, dangling edge dropped."""
    from odibel_spark.sources import (
        read_famer_csv_edges,
        read_famer_csv_vertices,
        read_famer_metadata,
        typed_vertex_table,
    )

    meta = read_famer_metadata(famer_csv_dir)
    assert meta["dbp"] == [("name", "string"), ("age", "int"), ("gtId", "string")]
    v = read_famer_csv_vertices(spark, famer_csv_dir, meta)
    rows = {r.id: r for r in v.collect()}
    assert dict(rows["v1"].props) == {"name": "Smith, John", "age": "41", "gtId": "g1"}
    assert dict(rows["v3"].props) == {"name": "ratio 2:1", "age": "7", "gtId": "g2"}
    assert rows["v2"].recId == "g1"

    typed = {r.id: r for r in typed_vertex_table(v, meta, "dbp").collect()}
    assert typed["v1"].age == 41 and isinstance(typed["v1"].age, int)

    e = read_famer_csv_edges(spark, famer_csv_dir, v)
    assert [(r.src, r.dst, r.sim) for r in e.collect()] == [("v1", "v2", 0.88)]


def test_famer_gold_clusters(spark, famer_json_dir):
    from odibel_spark.sources import gold_clusters, read_famer_data

    from pyspark.sql import functions as F

    v, _e = read_famer_data(spark, famer_json_dir)
    v = v.withColumn("recId", F.col("props")["gtId"])
    gold = {r.recId: (r.size, list(r.members)) for r in gold_clusters(v).collect()}
    assert gold == {"g1": (2, ["v1", "v2"]), "g2": (2, ["v3", "v4"]), "g3": (1, ["v5"])}


def test_nquads_roundtrip_and_temporal_graphs(spark, tmpdir_path):
    """Named-graph serialization (reference SerUtil.buildQuads,
    SerUtil.scala:27-40): window interval → graph term, xsd:dateTime
    start/end metadata quads, 9999 fallback for open windows; quads
    round-trip through the N-Quads text format."""
    from pyspark.sql import functions as F

    from odibel_spark.sources.rdf import (
        parse_nquads,
        serialize_nquads,
        temporal_windows_to_quads,
    )

    windows = spark.createDataFrame(
        [
            ("<e/a>", "<p/pop>", '"1000"', 5, 9, 1704067200, 1704153600),
            ("<e/a>", "<p/pop>", '"2000"', 9, 10, 1704153600, 2**63 - 1),
        ],
        "s string, p string, o string, v_start long, v_end long, t_start long, t_end long",
    )
    quads = temporal_windows_to_quads(windows)
    rows = {(r.s, r.p, r.o, r.g) for r in quads.collect()}
    assert ("<e/a>", "<p/pop>", '"1000"', "<http://dbpedia.org/temporal/5-9>") in rows
    assert (
        "<http://dbpedia.org/temporal/5-9>",
        "<http://dbpedia.org/temporal/start>",
        '"2024-01-01T00:00:00"^^<http://www.w3.org/2001/XMLSchema#dateTime>',
        "<http://dbpedia.org/temporal/>",
    ) in rows
    # open window end → reference's overflow fallback
    assert any(
        r[0] == "<http://dbpedia.org/temporal/9-10>" and "9999-12-31T23:59:59" in r[2]
        for r in rows
        if r[1] == "<http://dbpedia.org/temporal/end>"
    )

    path = os.path.join(tmpdir_path, "quads.nq")
    serialize_nquads(quads, path)
    back = parse_nquads(spark, path)
    assert {(r.s, r.p, r.o, r.g) for r in back.collect()} == rows
    # literal objects flagged; graph term parsed off the tail correctly
    lits = back.filter("isLiteral").count()
    assert lits == 6  # 2 literal data quads + 4 metadata quads
    with pytest.raises(FileExistsError):
        serialize_nquads(quads, path)


def test_temporal_output_models(spark, tmpdir_path):
    """Reification / RDF-star / property-TKG output models (reference
    CSVToRDFReification.scala:73-127, TKGModelMgr.scala:7-16,130-145,
    ToRDFPropertyTKG.scala doc contract) + the model-manager dispatch.
    Bnode labels are deterministic md5 (design substitution for the
    reference's System.nanoTime) so exact output sets are assertable."""
    import hashlib

    from pyspark.sql import functions as F

    from odibel_spark.sources.rdf import (
        TKG_MODELS,
        format_rdf_object,
        parse_ntriples,
        serialize_temporal_model,
        temporal_windows_to_property_tkg,
        temporal_windows_to_rdf_star,
        temporal_windows_to_reified,
        write_temporal_model,
    )

    windows = spark.createDataFrame(
        [
            ("<e/a>", "<p/pop>", '"1000"', 5, 9, 1704067200, 1704153600),
            ("<e/a>", "<p/pop>", '"2000"', 9, 10, 1704153600, 2**63 - 1),
        ],
        "s string, p string, o string, v_start long, v_end long, t_start long, t_end long",
    )

    b1 = "_:b" + hashlib.md5("\x1f".join(["<e/a>", "<p/pop>", '"1000"', "5", "9"]).encode()).hexdigest()
    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    TKG = "http://dbpedia.org/temporal"
    DT = "<http://www.w3.org/2001/XMLSchema#dateTime>"
    LNG = "<http://www.w3.org/2001/XMLSchema#long>"

    reified = temporal_windows_to_reified(windows)
    rows = {(r.s, r.p, r.o) for r in reified.collect()}
    assert len(rows) == 16  # 8 per window
    expected_b1 = {
        (b1, f"<{RDF}type>", f"<{RDF}Statement>"),
        (b1, f"<{RDF}subject>", "<e/a>"),
        (b1, f"<{RDF}predicate>", "<p/pop>"),
        (b1, f"<{RDF}object>", '"1000"'),
        (b1, f"<{TKG}/tStart>", f'"2024-01-01T00:00:00"^^{DT}'),
        (b1, f"<{TKG}/tEnd>", f'"2024-01-02T00:00:00"^^{DT}'),
        (b1, f"<{TKG}/rStart>", f'"5"^^{LNG}'),
        (b1, f"<{TKG}/rEnd>", f'"9"^^{LNG}'),
    }
    assert expected_b1 <= rows
    # open window renders the reference's overflow fallback
    assert any("9999-12-31T23:59:59" in o for _, p, o in rows if p == f"<{TKG}/tEnd>")

    star = temporal_windows_to_rdf_star(windows)
    srows = {(r.s, r.p, r.o) for r in star.collect()}
    assert len(srows) == 8  # 4 per window
    assert ('<< <e/a> <p/pop> "1000" >>', f"<{TKG}/rStart>", f'"5"^^{LNG}') in srows

    prop = temporal_windows_to_property_tkg(windows)
    prows = {(r.s, r.p, r.o) for r in prop.collect()}
    assert len(prows) == 8  # 4 per window
    assert ("<e/a>", f"<{TKG}/revision>", b1) in prows
    assert (b1, "<p/pop>", '"1000"') in prows
    assert (b1, f"<{TKG}/start>", f'"2024-01-01T00:00:00"^^{DT}') in prows

    # manager dispatch: every model name resolves; unknown raises
    assert set(TKG_MODELS) == {"nquads", "reification", "rdfstar", "property"}
    assert {(r.s, r.p, r.o) for r in serialize_temporal_model(windows, "reification").collect()} == rows
    with pytest.raises(ValueError, match="unknown TKG model"):
        serialize_temporal_model(windows, "turtle")

    # triple-shaped models round-trip through the N-Triples sink
    path = os.path.join(tmpdir_path, "reified.nt")
    write_temporal_model(windows, "reification", path)
    back = parse_ntriples(spark, path)
    assert {(r.s, r.p, r.o) for r in back.collect()} == rows

    # objectPart formatting (reference isUri branch)
    terms = spark.createDataFrame(
        [("http://ex/x", None), ("plain text", None), ("bonjour", "@fr")],
        "v string, lang string",
    ).select(format_rdf_object(F.col("v"), F.col("lang")).alias("o"))
    assert [r.o for r in terms.collect()] == ["<http://ex/x>", '"plain text"', '"bonjour"@fr']


def test_parse_ntriples_drops_malformed_lines(spark, tmpdir_path):
    """Reference parity on dirty inputs (rdf2.py:58-62): lines with
    fewer than 3 terms or an empty object after stripping the
    terminator are filtered, never surfaced as degenerate rows."""
    import os

    dirty = "\n".join(
        [
            "<http://ex/a> <http://ex/p> <http://ex/b> .",
            "<http://ex/s> <http://ex/p> .",   # 2 terms + terminator → empty object
            "<http://ex/s> .",                 # 1 term + terminator
            "<http://ex/s> <http://ex/p>",     # unterminated (already dropped)
            '<http://ex/b> <http://ex/name> "two words" .',
        ]
    )
    p = os.path.join(tmpdir_path, "dirty.nt")
    with open(p, "w") as f:
        f.write(dirty)
    rows = parse_ntriples(spark, p).collect()
    assert len(rows) == 2
    assert {r.o for r in rows} == {"<http://ex/b>", '"two words"'}
