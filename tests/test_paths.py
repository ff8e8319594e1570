"""Property-path algebra (plans/paths.py): SPARQL 1.1 path semantics
checked against closed-form expectations on small graphs.

Reference behavior being matched: RDF4J path evaluation as served by
the reference's endpoint (sequence = join, alternative = union,
inverse = swap, +/* = BFS closure with set semantics, {1,k} = bounded
closure) — here verified set-at-a-time.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from qendpoint_spark.plans import (
    path_alt,
    path_inverse,
    path_seq,
    path_step,
    path_zero_or_more,
    transitive_closure,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _pairs(df):
    return {(r.src, r.dst) for r in df.collect()}


def test_closure_linear_chain(spark):
    # 0->1->2->3: p+ = all ordered pairs
    e = _edges(spark, [(0, 1), (1, 2), (2, 3)])
    assert _pairs(transitive_closure(e)) == {
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)
    }


def test_closure_bounded_hops(spark):
    # chain of 6; p{1,2} reaches at most 2 ahead
    e = _edges(spark, [(i, i + 1) for i in range(5)])
    got = _pairs(transitive_closure(e, max_hops=2))
    assert got == {(i, i + d) for i in range(5) for d in (1, 2) if i + d <= 5}


def test_closure_cycle_terminates(spark):
    # 3-cycle: closure saturates (including self-reachability via the
    # cycle) and the semi-naive loop terminates on the empty frontier
    e = _edges(spark, [(0, 1), (1, 2), (2, 0)])
    got = _pairs(transitive_closure(e))
    assert got == {(a, b) for a in range(3) for b in range(3)}


def test_closure_dedups_multiple_routes(spark):
    # diamond 0->{1,2}->3: (0,3) appears once despite two routes
    e = _edges(spark, [(0, 1), (0, 2), (1, 3), (2, 3)])
    got = transitive_closure(e)
    assert got.count() == got.dropDuplicates(["src", "dst"]).count()
    assert (0, 3) in _pairs(got)


def test_zero_or_more_adds_identity(spark):
    e = _edges(spark, [(0, 1), (1, 2)])
    got = _pairs(path_zero_or_more(e))
    assert got == {(0, 1), (0, 2), (1, 2), (0, 0), (1, 1), (2, 2)}


def test_seq_alt_inverse_algebra(spark):
    ab = _edges(spark, [(0, 10), (1, 10)])
    bc = _edges(spark, [(10, 20)])
    assert _pairs(path_seq(ab, bc)) == {(0, 20), (1, 20)}
    assert _pairs(path_inverse(ab)) == {(10, 0), (10, 1)}
    assert _pairs(path_alt(ab, bc)) == {(0, 10), (1, 10), (10, 20)}


def test_path_step_routes_and_projects(spark):
    # tiny encoded table: step extracts (s,o) for the bound predicate,
    # inverse step swaps without touching values
    enc = spark.createDataFrame(
        [(1, 7, 5), (2, 7, 5), (1, 3, 9)], "s long, p long, o long"
    )
    fwd = path_step(enc, enc, p=7)
    assert _pairs(fwd) == {(1, 5), (2, 5)}
    inv = path_step(enc, enc, p=7, inverse=True)
    assert _pairs(inv) == {(5, 1), (5, 2)}


def test_closure_empty_edges(spark):
    e = _edges(spark, []).filter(F.lit(False))
    assert transitive_closure(e).count() == 0


def test_bgp_optional_keeps_unmatched_with_null(spark):
    from qendpoint_spark.plans import scan_bgp_optional

    # subjects 1,2 have p=6; only 1 has p=7
    enc = spark.createDataFrame(
        [(1, 6, 100), (2, 6, 101), (1, 7, 200)], "s long, p long, o long"
    )
    got = scan_bgp_optional(
        enc, enc, required=[("doc", 6, "lang")], optional=[("doc", 7, "ent")]
    )
    rows = {(r.doc, r.lang, r.ent) for r in got.collect()}
    assert rows == {(1, 100, 200), (2, 101, None)}


def test_bgp_minus_removes_compatible_and_keeps_disjoint(spark):
    from qendpoint_spark.plans import scan_bgp_minus

    enc = spark.createDataFrame(
        [(1, 6, 100), (2, 6, 101), (1, 7, 200)], "s long, p long, o long"
    )
    got = scan_bgp_minus(
        enc, enc, required=[("doc", 6, "lang")], minus=[("doc", 7, "ent")]
    )
    assert {(r.doc, r.lang) for r in got.collect()} == {(2, 101)}
    # no shared variable: SPARQL MINUS removes nothing
    kept = scan_bgp_minus(
        enc, enc, required=[("doc", 6, "lang")], minus=[("x", 7, "y")]
    )
    assert kept.count() == 2
