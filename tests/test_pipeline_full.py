"""Full pipeline with optional linking + canonicalization stages."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from qendpoint_spark.catalog import Catalog
from qendpoint_spark.datagen import generate_pages, generate_sameas
from qendpoint_spark.linking import build_alias_dict
from qendpoint_spark.pipeline import run_pipeline


def test_pipeline_with_link_and_canon(spark, tmp_path):
    pages = generate_pages(spark, 100, seed=3).cache()
    pages.count()
    alias = build_alias_dict(
        spark.createDataFrame(
            [
                Row(alias="shuffle", entity_iri="kb:Shuffle", prior=0.9),
                Row(alias="shuffle", entity_iri="kb:ShuffleDance", prior=0.1),
                Row(alias="partition", entity_iri="kb:Partition", prior=0.5),
            ]
        )
    )
    # sameas edges collapsing two entity IRIs the extractor emits
    sameas = spark.createDataFrame(
        [
            Row(
                iri_a="http://example.org/ent/shuffle",
                iri_b="http://example.org/ent/partition",
            )
        ]
    )
    cat = Catalog(spark, str(tmp_path / "wh"))
    rep = run_pipeline(
        spark, cat, source_df=pages, source_kind="pages",
        source_fingerprint="t100:3", num_partitions=4,
        alias_dict=alias, sameas=sameas,
    )
    names = [s.name for s in rep.stages]
    assert "linked_mentions" in names and "triples_canon" in names

    linked = cat.read("linked_mentions")
    got = {r.alias: r.entity_iri for r in linked.collect()}
    assert got.get("shuffle") == "kb:Shuffle"  # top-1 by prior
    assert got.get("partition") == "kb:Partition"

    # canonicalization collapsed partition -> shuffle (binary min IRI:
    # .../ent/partition < .../ent/shuffle, so partition is canonical)
    canon = cat.read("triples_canon")
    assert canon.filter(F.col("o") == "http://example.org/ent/shuffle").count() == 0
    assert canon.filter(F.col("o") == "http://example.org/ent/partition").count() > 0

    # downstream dictionary excludes the collapsed IRI
    d = cat.read("dict_terms")
    assert d.filter(F.col("term") == "http://example.org/ent/shuffle").count() == 0

    # resume with same fingerprint: all stages resumed
    rep2 = run_pipeline(
        spark, cat, source_df=pages, source_kind="pages",
        source_fingerprint="t100:3", num_partitions=4,
        alias_dict=alias, sameas=sameas,
    )
    assert all(s.resumed for s in rep2.stages)


def test_pipeline_empty_corpus(spark, tmp_path):
    """empty1.nt analog: a 0-row documents table must flow through
    every stage (extract -> dictionary -> encode -> indexes -> header)
    committing empty tables, not erroring."""
    from pyspark.sql import types as T

    from qendpoint_spark.catalog import Catalog
    from qendpoint_spark.pipeline import run_pipeline

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ])
    empty = spark.createDataFrame([], schema)
    cat = Catalog(spark, str(tmp_path / "wh"))
    report = run_pipeline(spark, cat, source_df=empty, source_kind="documents",
                          source_fingerprint="empty", num_partitions=2)
    assert report.n_triples == 0
    assert cat.read("dict_terms").count() == 0
    assert cat.read("triples_spo").count() == 0
    hdr = cat.read("header").collect()[0]
    assert hdr.n_triples == 0 and hdr.n_distinct_subjects == 0
