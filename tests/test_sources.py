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
