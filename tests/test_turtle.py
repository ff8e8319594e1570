"""Turtle source: grammar coverage, internal-form consistency with the
extraction/N-Triples paths, per-file bnode scoping, loud failures.

Reference anchor: the reference parses .ttl via Jena RIOT
(core/rdf/parsers/RDFParserRIOT.java:30-80); this parser covers the
W3C Turtle constructs its test data uses.
"""

from __future__ import annotations

import pytest

from qendpoint_spark.sources import parse_turtle, read_rdf_source, read_turtle

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"


def test_parse_turtle_grammar():
    ttl = """
    @prefix ex: <http://ex/> .
    @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
    PREFIX sp: <http://sp/>
    ex:a ex:p ex:b ;               # predicate list
         ex:q "lit"@en , 42 , 3.14 , 1e3 , true , "t"^^xsd:token .
    ex:b a sp:C .
    _:x ex:p [ ex:q ex:a ; ex:r "v" ] .
    ex:list ex:items ( ex:a 1 ) .
    <http://full/iri> ex:p \"\"\"long
with "quotes" inside\"\"\" .
    """
    got = set(parse_turtle(ttl))
    assert ("http://ex/a", "http://ex/p", "http://ex/b") in got
    assert ("http://ex/a", "http://ex/q", '"lit"@en') in got
    assert ("http://ex/a", "http://ex/q", f'"42"^^<{XSD}integer>') in got
    assert ("http://ex/a", "http://ex/q", f'"3.14"^^<{XSD}decimal>') in got
    assert ("http://ex/a", "http://ex/q", f'"1e3"^^<{XSD}double>') in got
    assert ("http://ex/a", "http://ex/q", f'"true"^^<{XSD}boolean>') in got
    assert ("http://ex/a", "http://ex/q", f'"t"^^<{XSD}token>') in got
    assert ("http://ex/b", f"{RDF}type", "http://sp/C") in got
    # bnode property list: _:x -> fresh bnode with two properties
    inner = [o for s, p, o in got if s == "_:x"][0]
    assert (inner, "http://ex/q", "http://ex/a") in got
    assert (inner, "http://ex/r", '"v"') in got
    # collection chain ends at rdf:nil
    assert any(p == f"{RDF}rest" and o == f"{RDF}nil" for _, p, o in got)
    # long string keeps raw newline and quotes (internal raw form)
    assert (
        "http://full/iri",
        "http://ex/p",
        '"long\nwith "quotes" inside"',
    ) in got


def test_parse_turtle_base_and_errors():
    got = parse_turtle('@base <http://b/> . <x> <p> <http://abs/o> .')
    assert got == [("http://b/x", "http://b/p", "http://abs/o")]
    with pytest.raises(SyntaxError, match="undeclared prefix"):
        parse_turtle("ex:a ex:p ex:b .")
    with pytest.raises(SyntaxError, match="predicate must be an IRI"):
        parse_turtle('<http://s> "lit" <http://o> .')
    with pytest.raises(SyntaxError):
        parse_turtle("<http://s> <http://p> .")  # missing object


def test_read_turtle_spark_and_pipeline(spark, tmp_path):
    """Distributed read: two files, per-file bnode namespaces, and the
    parsed frame feeds the standard pipeline unchanged."""
    (tmp_path / "a.ttl").write_text(
        "@prefix ex: <http://ex/> .\n"
        "ex:s1 ex:p [ ex:q ex:o1 ] .\n"
    )
    (tmp_path / "b.ttl").write_text(
        "@prefix ex: <http://ex/> .\n"
        "ex:s2 ex:p [ ex:q ex:o2 ] .\n"
    )
    tri = read_turtle(spark, [str(tmp_path / "a.ttl"), str(tmp_path / "b.ttl")])
    rows = {tuple(r) for r in tri.collect()}
    assert len(rows) == 4
    bnodes = {s for s, p, o in rows if s.startswith("_:")} | {
        o for s, p, o in rows if o.startswith("_:")
    }
    assert len(bnodes) == 2  # distinct per file, no collision
    # dispatch by suffix
    assert set(read_rdf_source(spark, str(tmp_path / "a.ttl")).columns) == {
        "s", "p", "o"
    }

    from qendpoint_spark.catalog import Catalog
    from qendpoint_spark.encoding import decode_triples
    from qendpoint_spark.pipeline import run_pipeline

    cat = Catalog(spark, str(tmp_path / "wh"))
    run_pipeline(
        spark, cat, source_df=tri, source_kind="triples",
        source_fingerprint="ttl-test", num_partitions=2, with_stats=False,
    )
    decoded = {
        tuple(r)
        for r in decode_triples(
            cat.read("triples_spo"), cat.read("dict_terms")
        ).collect()
    }
    assert decoded == rows


def test_parse_trig_blocks():
    from qendpoint_spark.sources import parse_trig

    trig = """
    @prefix ex: <http://ex/> .
    ex:s0 ex:p ex:o0 .
    GRAPH ex:g1 { ex:a ex:p ex:b . ex:a ex:q "v" }
    ex:g2 { ex:c ex:p ex:d . }
    { ex:e ex:p ex:f . }
    _:gb { ex:h ex:p ex:i }
    """
    got = set(parse_trig(trig))
    assert got == {
        ("http://ex/s0", "http://ex/p", "http://ex/o0", None),
        ("http://ex/a", "http://ex/p", "http://ex/b", "http://ex/g1"),
        ("http://ex/a", "http://ex/q", '"v"', "http://ex/g1"),
        ("http://ex/c", "http://ex/p", "http://ex/d", "http://ex/g2"),
        ("http://ex/e", "http://ex/p", "http://ex/f", None),
        ("http://ex/h", "http://ex/p", "http://ex/i", "_:gb"),
    }


def test_read_trig_quad_pipeline(spark, tmp_path):
    """A .trig file feeds the quad pipeline and answers GRAPH queries."""
    (tmp_path / "d.trig").write_text(
        "@prefix ex: <http://ex/> .\n"
        "GRAPH ex:g1 { ex:a ex:p ex:b . }\n"
        "GRAPH ex:g2 { ex:a ex:p ex:c . }\n"
    )
    from qendpoint_spark.catalog import Catalog
    from qendpoint_spark.pipeline import run_pipeline
    from qendpoint_spark.sources import read_rdf_source
    from qendpoint_spark.sparql import SparqlEngine

    quads = read_rdf_source(spark, str(tmp_path / "d.trig"))
    assert set(quads.columns) == {"s", "p", "o", "g"}
    cat = Catalog(spark, str(tmp_path / "wh"))
    run_pipeline(
        spark, cat, source_df=quads, source_kind="triples",
        source_fingerprint="trig-test", num_partitions=2, with_stats=False,
    )
    eng = SparqlEngine(
        cat.read("triples_spo"), cat.read("dict_terms"),
        quads=cat.read("quads_spog"),
    )
    out = eng.query(
        "SELECT ?g ?o WHERE { GRAPH ?g { <http://ex/a> <http://ex/p> ?o } }"
    )
    assert sorted(tuple(r) for r in out.collect()) == [
        ("http://ex/g1", "http://ex/b"),
        ("http://ex/g2", "http://ex/c"),
    ]


def test_parse_turtle_base_rfc3986():
    """ADVICE r4: absolute IRIs of any scheme survive @base; relative
    refs merge per RFC 3986; terminating '.' needs no space."""
    from qendpoint_spark.sources.turtle import parse_turtle

    t = parse_turtle("@base <http://ex.org/data/> . <s1> <p> <mailto:x@y> .")
    assert t == [("http://ex.org/data/s1", "http://ex.org/data/p", "mailto:x@y")]

    t = parse_turtle("@base <http://ex.org/a/b/c> . </abs> <../up> <x> .")
    assert t == [("http://ex.org/abs", "http://ex.org/a/up", "http://ex.org/a/b/x")]

    t = parse_turtle("@base <urn:uuid:1/> . <doi:10.1/x> <tel:+1> <urn:o> .")
    assert t == [("doi:10.1/x", "tel:+1", "urn:o")]


def test_parse_turtle_tight_terminator():
    """ADVICE r4: ':s :p :o.' / ':s :p 1.' / '<s> <p> _:b1.' are valid
    Turtle (the '.' is the statement terminator, not part of the token)."""
    from qendpoint_spark.sources.turtle import parse_turtle

    assert parse_turtle("@prefix : <http://e/> . :s :p :o.") == [
        ("http://e/s", "http://e/p", "http://e/o")
    ]
    t = parse_turtle("@prefix : <http://e/> . :s :p 1.")
    assert t[0][2] == '"1"^^<http://www.w3.org/2001/XMLSchema#integer>'
    t = parse_turtle("<http://e/s> <http://e/p> _:b1.")
    assert t[0][2].startswith("_:")
    # decimals/doubles unchanged, incl. empty-fraction DOUBLE
    t = parse_turtle("<http://e/s> <http://e/p> 1.5 , 1.5e3 , .5 , 1.e3 .")
    assert [x[2].rsplit("#", 1)[1] for x in t] == [
        "decimal>", "double>", "decimal>", "double>"
    ]


def test_read_trig_gz(spark, tmp_path):
    """ADVICE r4: compressed TriG routes through the shared codec sniff."""
    import gzip

    raw = (
        "@prefix ex: <http://ex/> .\n"
        "GRAPH ex:g1 { ex:a ex:p ex:b . }\n"
    ).encode()
    (tmp_path / "d.trig.gz").write_bytes(gzip.compress(raw))
    from qendpoint_spark.sources.turtle import read_trig

    rows = read_trig(spark, str(tmp_path / "d.trig.gz")).collect()
    assert [(r.s, r.p, r.o, r.g) for r in rows] == [
        ("http://ex/a", "http://ex/p", "http://ex/b", "http://ex/g1")
    ]
