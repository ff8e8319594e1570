"""RDF/XML and JSON-LD sources: grammar coverage, internal-form
consistency with the Turtle/N-Triples paths, per-file bnode scoping,
loud failures on unsupported constructs.

Reference anchor: the reference routes both formats through Jena RIOT
(core/rdf/parsers/RDFParserRIOT.java:30-80); these are the last two
RIOT format families the Spark engine gained.
"""

from __future__ import annotations

import json

import pytest

from qendpoint_spark.sources import (
    guess_format,
    parse_jsonld,
    parse_rdfxml,
    read_rdf_source,
)

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"


def test_parse_rdfxml_grammar():
    xml = """<?xml version="1.0"?>
    <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
             xmlns:ex="http://ex/" xml:base="http://base/">
      <rdf:Description rdf:about="http://ex/a" ex:attr="av">
        <ex:p rdf:resource="http://ex/b"/>
        <ex:q xml:lang="en">lit</ex:q>
        <ex:q rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">42</ex:q>
        <ex:nested><ex:Thing rdf:ID="frag"><ex:r>v</ex:r></ex:Thing></ex:nested>
        <ex:coll rdf:parseType="Collection">
          <rdf:Description rdf:about="http://ex/c1"/>
          <rdf:Description rdf:about="http://ex/c2"/>
        </ex:coll>
        <ex:res rdf:parseType="Resource"><ex:inner>iv</ex:inner></ex:res>
        <ex:xl rdf:parseType="Literal">pre<b>bold</b></ex:xl>
        <ex:st rdf:ID="stmt" rdf:resource="http://ex/o2"/>
      </rdf:Description>
      <ex:Typed rdf:nodeID="n1"><rdf:li>one</rdf:li><rdf:li>two</rdf:li></ex:Typed>
    </rdf:RDF>"""
    got = set(parse_rdfxml(xml))
    assert ("http://ex/a", "http://ex/attr", '"av"') in got
    assert ("http://ex/a", "http://ex/p", "http://ex/b") in got
    assert ("http://ex/a", "http://ex/q", '"lit"@en') in got
    assert ("http://ex/a", "http://ex/q", f'"42"^^<{XSD}integer>') in got
    # rdf:ID resolves against xml:base; nested node becomes the object
    assert ("http://base/#frag", f"{RDF}type", "http://ex/Thing") in got
    assert ("http://ex/a", "http://ex/nested", "http://base/#frag") in got
    # collection chain ends at rdf:nil
    assert any(p == f"{RDF}rest" and o == f"{RDF}nil" for _, p, o in got)
    # parseType=Resource introduces a bnode with inner properties
    res_obj = [o for s, p, o in got if p == "http://ex/res"][0]
    assert (res_obj, "http://ex/inner", '"iv"') in got
    # parseType=Literal keeps raw XML
    assert (
        "http://ex/a",
        "http://ex/xl",
        f'"pre<b>bold</b>"^^<{RDF}XMLLiteral>',
    ) in got
    # rdf:ID on a property element reifies
    assert ("http://base/#stmt", f"{RDF}subject", "http://ex/a") in got
    assert ("http://base/#stmt", f"{RDF}object", "http://ex/o2") in got
    # typed node element + rdf:li numbering
    assert ("_:bn_n1", f"{RDF}type", "http://ex/Typed") in got
    assert ("_:bn_n1", f"{RDF}_1", '"one"') in got
    assert ("_:bn_n1", f"{RDF}_2", '"two"') in got


def test_parse_rdfxml_loud_failures():
    with pytest.raises(SyntaxError, match="well-formed"):
        parse_rdfxml("<rdf:RDF>")
    with pytest.raises(SyntaxError, match="unsupported parseType"):
        parse_rdfxml(
            '<r:RDF xmlns:r="http://www.w3.org/1999/02/22-rdf-syntax-ns#"'
            ' xmlns:ex="http://ex/"><r:Description r:about="http://s">'
            '<ex:p r:parseType="Other"/></r:Description></r:RDF>'
        )
    with pytest.raises(SyntaxError, match="at most one of"):
        parse_rdfxml(
            '<r:RDF xmlns:r="http://www.w3.org/1999/02/22-rdf-syntax-ns#">'
            '<r:Description r:about="http://s" r:nodeID="x"/></r:RDF>'
        )


def test_parse_jsonld_grammar():
    doc = {
        "@context": {
            "ex": "http://ex/",
            "name": "ex:name",
            "knows": {"@id": "ex:knows", "@type": "@id"},
            "age": {"@id": "ex:age", "@type": f"{XSD}int"},
            "items": {"@id": "ex:items", "@container": "@list"},
            "@vocab": "http://voc/",
            "@base": "http://base/",
            "@language": "en",
        },
        "@id": "rel",
        "@type": ["ex:Person", "Other"],
        "name": "Alice",
        "knows": ["http://ex/b", "_:x"],
        "age": 30,
        "score": 2.5,
        "flag": True,
        "items": ["a", 1],
        "vo": {"@value": "v", "@language": "fr"},
        "plain": {"@value": "Carol", "@language": None},
        "nested": {"@id": "ex:c", "name": "Bob"},
        "@reverse": {"knows": {"@id": "ex:d"}},
    }
    got = set(parse_jsonld(json.dumps(doc)))
    s = "http://base/rel"
    assert (s, f"{RDF}type", "http://ex/Person", None) in got
    assert (s, f"{RDF}type", "http://voc/Other", None) in got
    assert (s, "http://ex/name", '"Alice"@en', None) in got
    assert (s, "http://ex/knows", "http://ex/b", None) in got
    assert (s, "http://ex/knows", "_:bn_x", None) in got
    # @type coercion applies to native numbers too
    assert (s, "http://ex/age", f'"30"^^<{XSD}int>', None) in got
    assert (s, "http://voc/score", f'"2.5E0"^^<{XSD}double>', None) in got
    assert (s, "http://voc/flag", f'"true"^^<{XSD}boolean>', None) in got
    assert (s, "http://voc/vo", '"v"@fr', None) in got
    # explicit @language null suppresses the context default
    assert (s, "http://voc/plain", '"Carol"', None) in got
    assert ("http://ex/c", "http://ex/name", '"Bob"@en', None) in got
    assert ("http://ex/d", "http://ex/knows", s, None) in got
    # @container @list builds an rdf collection
    head = [o for (su, p, o, g) in got if p == "http://ex/items"][0]
    assert (head, f"{RDF}first", '"a"@en', None) in got
    assert any(p == f"{RDF}rest" and o == f"{RDF}nil" for _, p, o, _ in got)


def test_parse_jsonld_named_graph_and_failures():
    doc = {
        "@context": {"ex": "http://ex/"},
        "@id": "ex:g1",
        "@graph": [{"@id": "ex:s", "ex:p": {"@id": "ex:o"}}],
    }
    assert parse_jsonld(json.dumps(doc)) == [
        ("http://ex/s", "http://ex/p", "http://ex/o", "http://ex/g1")
    ]
    with pytest.raises(SyntaxError, match="remote @context"):
        parse_jsonld('{"@context": "http://remote/ctx"}')
    with pytest.raises(SyntaxError, match="does not expand"):
        parse_jsonld('{"@id": "http://s", "unmapped": 1}')
    with pytest.raises(SyntaxError, match="unsupported @container"):
        parse_jsonld(
            '{"@context": {"t": {"@id": "http://p", "@container": "@index"}}}'
        )
    with pytest.raises(SyntaxError, match="invalid JSON"):
        parse_jsonld("{nope")


def test_guess_format_routes_new_formats():
    assert guess_format("data/x.rdf") == "rdfxml"
    assert guess_format("x.owl.gz") == "rdfxml"
    assert guess_format("y.jsonld") == "jsonld"
    assert guess_format("y.jsonld.bz2") == "jsonld"


def test_read_rdfxml_jsonld_spark(spark, tmp_path):
    """Distributed read path: per-file tasks, bnode namespacing by file,
    quad shape for JSON-LD named graphs; routed via read_rdf_source."""
    (tmp_path / "a.rdf").write_text(
        '<r:RDF xmlns:r="http://www.w3.org/1999/02/22-rdf-syntax-ns#"'
        ' xmlns:ex="http://ex/">'
        '<r:Description r:about="http://ex/a"><ex:p>one</ex:p>'
        "</r:Description></r:RDF>"
    )
    (tmp_path / "b.rdf").write_text(
        '<r:RDF xmlns:r="http://www.w3.org/1999/02/22-rdf-syntax-ns#"'
        ' xmlns:ex="http://ex/">'
        '<ex:T r:nodeID="x"><ex:q r:nodeID="x"/></ex:T></r:RDF>'
    )
    tri = read_rdf_source(spark, str(tmp_path / "a.rdf")).unionByName(
        read_rdf_source(spark, str(tmp_path / "b.rdf"))
    )
    rows = {tuple(r) for r in tri.collect()}
    assert ("http://ex/a", "http://ex/p", '"one"') in rows
    # per-file bnode namespacing: b.rdf's nodeID bnode is self-consistent
    bn = [r for r in rows if r[1] == "http://ex/q"]
    assert len(bn) == 1 and bn[0][0] == bn[0][2] and bn[0][0].startswith("_:f")

    doc = {
        "@context": {"ex": "http://ex/"},
        "@graph": [
            {"@id": "ex:s", "ex:p": {"@id": "ex:o"}},
            {
                "@id": "ex:g",
                "@graph": [{"@id": "ex:s2", "ex:p2": "lit"}],
            },
        ],
    }
    (tmp_path / "d.jsonld").write_text(json.dumps(doc))
    quads = read_rdf_source(spark, str(tmp_path / "d.jsonld"))
    assert set(quads.columns) == {"s", "p", "o", "g"}
    got = {tuple(r) for r in quads.collect()}
    assert ("http://ex/s", "http://ex/p", "http://ex/o", None) in got
    assert ("http://ex/s2", "http://ex/p2", '"lit"', "http://ex/g") in got


def test_rdfxml_datatype_with_children_is_loud():
    """ADVICE r6: rdf:datatype on a property element with element
    content must raise, not silently drop the datatype."""
    xml = (
        '<?xml version="1.0"?>'
        f'<rdf:RDF xmlns:rdf="{RDF}" xmlns:ex="http://e/">'
        '<rdf:Description rdf:about="http://e/s">'
        f'<ex:p rdf:datatype="{XSD}integer">'
        '<rdf:Description rdf:about="http://e/o"/></ex:p>'
        "</rdf:Description></rdf:RDF>"
    )
    with pytest.raises(SyntaxError):
        parse_rdfxml(xml)


def test_rdfxml_serialize_cr_tab_roundtrip_and_invalid_control():
    """ADVICE r6: \\r must survive the XML round-trip (EOL
    normalization would silently turn it into \\n) and XML-1.0-invalid
    control characters must raise instead of emitting garbage."""
    from qendpoint_spark.sources.rdfxml import serialize_rdfxml

    tri = [("http://e/s", "http://e/p", '"a\rb\tc"')]
    doc = serialize_rdfxml(tri)
    assert set(parse_rdfxml(doc)) == set(tri)
    with pytest.raises(ValueError):
        serialize_rdfxml([("http://e/s", "http://e/p", '"a\x01b"')])


def test_jsonld_integer_noncanonical_lexical_roundtrip():
    """ADVICE r6: '007' / '+5' / ill-typed xsd:integer literals keep
    their lexical form through serialize_jsonld (typed-form fallback),
    canonical forms stay native numbers."""
    from qendpoint_spark.sources.jsonld import serialize_jsonld

    quads = [
        ("http://e/s", "http://e/p", f'"007"^^<{XSD}integer>', None),
        ("http://e/s", "http://e/p", f'"+5"^^<{XSD}integer>', None),
        ("http://e/s", "http://e/p", f'"zz"^^<{XSD}integer>', None),
        ("http://e/s", "http://e/p", f'"42"^^<{XSD}integer>', None),
    ]
    doc = serialize_jsonld(quads)
    got = set(parse_jsonld(doc))
    assert got == set(quads)
