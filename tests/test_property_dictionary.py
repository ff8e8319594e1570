"""Property-based dictionary invariants (SURVEY §5.3: the reference
uses LargeFakeDataSetStreamSupplier randomized corpora; here hypothesis
generates adversarial term sets — empty strings excluded, unicode and
quote-laden literals included)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from qendpoint_spark.dictionary import build_dictionary
from qendpoint_spark.encoding import decode_triples, encode_triples

term = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), min_size=1, max_size=12
)
triple = st.tuples(term, term, term)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(st.lists(triple, min_size=1, max_size=25, unique=True))
def test_dictionary_invariants(spark, triples):
    df = spark.createDataFrame([Row(s=s, p=p, o=o) for s, p, o in triples])
    d = build_dictionary(df).localCheckpoint(eager=True)
    rows = d.collect()
    by_sec: dict[str, list] = {}
    for r in rows:
        by_sec.setdefault(r.section, []).append(r)
    subs = {s for s, _, _ in triples}
    objs = {o for _, _, o in triples}
    # section membership is exactly the role algebra
    assert {r.term for r in by_sec.get("SH", [])} == subs & objs
    assert {r.term for r in by_sec.get("S", [])} == subs - objs
    assert {r.term for r in by_sec.get("O", [])} == objs - subs
    assert {r.term for r in by_sec.get("P", [])} == {p for _, p, _ in triples}
    # per-section ranks are contiguous 1..n in UTF-8 byte order
    for sec, rs in by_sec.items():
        rs = sorted(rs, key=lambda r: r.sec_rank)
        assert [r.sec_rank for r in rs] == list(range(1, len(rs) + 1))
        terms = [r.term for r in rs]
        assert terms == sorted(terms, key=lambda t: t.encode("utf-8")), sec
    # global ids: SH shares one id across spaces; S/O offset by |SH|
    n_sh = len(by_sec.get("SH", []))
    for r in by_sec.get("S", []) + by_sec.get("O", []):
        assert r.id == n_sh + r.sec_rank
    # encode -> decode is the identity on the triple set
    enc = encode_triples(df, d)
    back = decode_triples(enc, d)
    got = {(r.s, r.p, r.o) for r in back.collect()}
    assert got == set(triples)
