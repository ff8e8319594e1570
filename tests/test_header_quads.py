"""Header stats, N-Triples export, typed-literal sectioning, quad mode."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from qendpoint_spark.dictionary import build_dictionary
from qendpoint_spark.encoding import (
    build_header,
    encode_triples,
    export_ntriples,
    with_datatype,
)
from qendpoint_spark.extraction import extract_triples_from_documents


def test_header_stats(spark, documents):
    tr = extract_triples_from_documents(documents).localCheckpoint(eager=True)
    d = build_dictionary(tr, num_partitions=4).localCheckpoint(eager=True)
    enc = encode_triples(tr, d).localCheckpoint(eager=True)
    h = build_header(tr, d, enc).collect()[0]
    assert h.n_raw_triples == tr.count() == h.n_triples  # input is distinct
    assert h.n_shared + h.n_subjects_only == h.n_distinct_subjects
    assert h.max_subject_id == h.n_shared + h.n_subjects_only
    assert h.original_size > 0


def test_ntriples_export_roundtrippable(spark):
    tr = spark.createDataFrame(
        [
            Row(s="http://e/s1", p="http://e/p", o='"lit"@en'),
            Row(s="_:b0", p="http://e/p", o="http://e/s1"),
            Row(s="http://e/s2", p="http://e/p", o='"5"^^<http://w3/int>'),
        ]
    )
    lines = {r.value for r in export_ntriples(tr).collect()}
    assert lines == {
        '<http://e/s1> <http://e/p> "lit"@en .',
        "_:b0 <http://e/p> <http://e/s1> .",
        '<http://e/s2> <http://e/p> "5"^^<http://w3/int> .',
    }


def test_datatype_sections(spark):
    d = spark.createDataFrame(
        [
            Row(term="http://e/x", section="S", sec_rank=1, id=1),
            Row(term='"plain"', section="O", sec_rank=1, id=2),
            Row(term='"hallo"@de-AT', section="O", sec_rank=2, id=3),
            Row(term='"5"^^<http://w3/int>', section="O", sec_rank=3, id=4),
            Row(term="_:b1", section="O", sec_rank=4, id=5),
        ]
    )
    got = {r.term: (r.kind, r.datatype) for r in with_datatype(d).collect()}
    assert got["http://e/x"] == ("ref", None)
    assert got['"plain"'] == ("plain", "NO_DATATYPE")
    assert got['"hallo"@de-AT'] == ("lang", "@de-AT")
    assert got['"5"^^<http://w3/int>'] == ("typed", "http://w3/int")
    assert got["_:b1"] == ("ref", None)


def test_quads_dictionary_and_encode(spark):
    quads = spark.createDataFrame(
        [
            Row(s="http://e/a", p="http://e/p", o="http://e/b", g="http://g/1"),
            Row(s="http://e/b", p="http://e/p", o='"x"', g="http://g/1"),
            Row(s="http://e/a", p="http://e/q", o='"x"', g="http://g/2"),
            # same statement in two graphs stays two quads
            Row(s="http://e/a", p="http://e/p", o="http://e/b", g="http://g/2"),
        ]
    )
    d = build_dictionary(quads, num_partitions=2).localCheckpoint(eager=True)
    secs = {r.section for r in d.collect()}
    assert "G" in secs
    graphs = {r.term: r.id for r in d.filter(F.col("section") == "G").collect()}
    assert graphs == {"http://g/1": 1, "http://g/2": 2}
    # b is both subject and object -> SH; graph terms are NOT in SH
    sh = {r.term for r in d.filter(F.col("section") == "SH").collect()}
    assert sh == {"http://e/b"}
    enc = encode_triples(quads, d)
    rows = {(r.s, r.p, r.o, r.g) for r in enc.collect()}
    assert len(rows) == 4
    assert {g for _, _, _, g in rows} == {1, 2}
