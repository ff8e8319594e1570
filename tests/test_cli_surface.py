"""CLI-surface building blocks: the triples source kind (rdf2hdt path)
must dedup parsed statements — HDT stores a set; unlike extraction,
N-Triples input may repeat lines (RDF2HDT's triple sort dedups,
core/hdt/impl/HDTImpl.java territory)."""

from __future__ import annotations

from qendpoint_spark.catalog import Catalog
from qendpoint_spark.pipeline import run_pipeline


def test_triples_source_kind_dedups(spark, tmp_path):
    rows = [
        ("http://ex/a", "http://ex/p", "http://ex/b"),
        ("http://ex/a", "http://ex/p", "http://ex/b"),  # dup line
        ("http://ex/b", "http://ex/p", "http://ex/a"),
    ]
    tri = spark.createDataFrame(rows, "s string, p string, o string")
    catalog = Catalog(spark, str(tmp_path / "wh"))
    report = run_pipeline(
        spark, catalog, source_df=tri, source_kind="triples",
        source_fingerprint="dedup-test", num_partitions=2,
        with_stats=False,
    )
    assert report.n_triples == 2
    spo = catalog.read("triples_spo")
    assert spo.count() == spo.distinct().count() == 2
