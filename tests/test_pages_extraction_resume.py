"""Pages corpus: byte-identical extraction invariant (input_hint),
recrawl dedup, pipeline checkpoint/resume idempotency
(MergeRunnable restart-step analog, FIXTURES.md §8)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from qendpoint_spark.catalog import Catalog
from qendpoint_spark.datagen import generate_pages
from qendpoint_spark.extraction import extract_text_udf, extract_triples_from_pages
from qendpoint_spark.pipeline import run_pipeline


def test_extraction_byte_identical(spark):
    """extract(html) == text, byte for byte, for every url — including
    unicode stress rows and empty pages."""
    pages = generate_pages(spark, 300, seed=42).cache()
    checked = pages.withColumn("extracted", extract_text_udf(F.col("html")))
    bad = checked.filter(
        ~F.col("extracted").eqNullSafe(F.col("text"))
        | (F.encode("extracted", "utf-8") != F.encode("text", "utf-8"))
    )
    assert bad.count() == 0
    # unicode rows actually present
    assert checked.filter(F.col("text").contains("汉字测试")).count() > 0
    assert checked.filter(F.col("text") == "").count() > 0


def test_pages_generation_deterministic(spark):
    a = generate_pages(spark, 200, seed=42)
    b = generate_pages(spark, 200, seed=42)
    c = generate_pages(spark, 200, seed=43)
    rows_a = {(r.url, str(r.warc_ts), bytes(r.html), r.text, r.lang) for r in a.collect()}
    rows_b = {(r.url, str(r.warc_ts), bytes(r.html), r.text, r.lang) for r in b.collect()}
    rows_c = {(r.url, str(r.warc_ts), bytes(r.html), r.text, r.lang) for r in c.collect()}
    assert rows_a == rows_b
    assert rows_a != rows_c


def test_pages_recrawl_dedup(spark):
    pages = generate_pages(spark, 100, seed=42, recrawl_every=10).cache()
    assert pages.count() > 100  # recrawls exist
    triples = extract_triples_from_pages(pages)
    # stale recrawl text must not contribute: 'stale' token appears in
    # recrawl rows only, and only as the leading token of older crawls
    assert triples.filter(F.col("o").contains("/ent/stale")).count() == 0
    # each url contributes exactly one lang triple
    lang_triples = triples.filter(F.col("p").contains("prop/lang"))
    assert lang_triples.count() == 100


def test_pipeline_resume_idempotent(spark, tmp_path):
    pages = generate_pages(spark, 150, seed=7).cache()
    pages.count()
    wh = str(tmp_path / "wh")
    cat = Catalog(spark, wh)
    rep1 = run_pipeline(
        spark, cat, source_df=pages, source_kind="pages",
        source_fingerprint="t150:7", num_partitions=4,
    )
    assert all(not s.resumed for s in rep1.stages)
    spo1 = sorted(tuple(r) for r in cat.read("triples_spo").collect())

    # rerun: every stage must resume, tables unchanged
    rep2 = run_pipeline(
        spark, cat, source_df=pages, source_kind="pages",
        source_fingerprint="t150:7", num_partitions=4,
    )
    assert all(s.resumed for s in rep2.stages)
    spo2 = sorted(tuple(r) for r in cat.read("triples_spo").collect())
    assert spo1 == spo2

    # lineage rows: one per stage, with per-partition counts
    lineage = cat.all_lineage()
    stages = {rec["stage"] for rec in lineage}
    assert {"triples_str", "dict_terms", "triples_spo", "triples_ops"} <= stages
    for rec in lineage:
        assert rec["row_count"] == sum(p["row_count"] for p in rec["partitions"])

    # crash-resume: delete one downstream stage table + lineage; rerun
    # recomputes exactly that suffix
    os.remove(os.path.join(wh, "_lineage_triples_ops.json"))
    rep3 = run_pipeline(
        spark, cat, source_df=pages, source_kind="pages",
        source_fingerprint="t150:7", num_partitions=4,
    )
    by_name = {s.name: s for s in rep3.stages}
    assert by_name["triples_str"].resumed
    assert by_name["dict_terms"].resumed
    assert by_name["triples_spo"].resumed
    assert not by_name["triples_ops"].resumed
    spo3 = sorted(tuple(r) for r in cat.read("triples_spo").collect())
    assert spo3 == spo1

    # changed input fingerprint invalidates everything
    rep4 = run_pipeline(
        spark, cat, source_df=pages, source_kind="pages",
        source_fingerprint="t150:CHANGED", num_partitions=4,
    )
    assert all(not s.resumed for s in rep4.stages)
