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
