"""Structured-Streaming incremental ingest: micro-batch extraction
appends == one-shot batch extraction after compaction (the CatTree
"chunk now, merge later" equivalence, SURVEY.md §2D/§3.3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from qendpoint_spark.datagen import generate_pages
from qendpoint_spark.extraction import extract_triples_from_pages
from qendpoint_spark.streaming import (
    compact_staging,
    sessionize_events,
    stream_ingest_pages,
)


def test_stream_ingest_equals_batch(spark, tmp_path):
    landing = str(tmp_path / "landing")
    staging = str(tmp_path / "staging")
    ckpt = str(tmp_path / "ckpt")

    pages = generate_pages(spark, 120, seed=11).cache()
    # two file drops (micro-batch boundaries)
    pages.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 0).write.parquet(f"{landing}/drop1.parquet")
    pages.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 1).write.parquet(f"{landing}/drop2.parquet")

    stream_ingest_pages(spark, landing, staging, ckpt)
    staged = compact_staging(spark, staging)
    batch = extract_triples_from_pages(pages)
    got = {(r.s, r.p, r.o) for r in staged.collect()}
    exp = {(r.s, r.p, r.o) for r in batch.collect()}
    assert got == exp

    # drop a third file: only the new batch is processed (checkpoint)
    extra = generate_pages(spark, 150, seed=11).filter(
        ~F.col("url").isin([r.url for r in pages.select("url").distinct().collect()])
    )
    extra.write.parquet(f"{landing}/drop3.parquet")
    stream_ingest_pages(spark, landing, staging, ckpt)
    staged2 = compact_staging(spark, staging)
    assert staged2.count() > staged.count()


def test_sessionize_stream(spark):
    out = sessionize_events(spark, "/root/testdata/sf0.001")
    assert out.count() > 0
    assert out.filter(F.col("session_end") < F.col("session_start")).count() == 0
    # per-user event totals preserved
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = {r.user_id: r.total for r in out.groupBy("user_id").agg(F.sum("n_events").alias("total")).collect()}
    exp = {r.user_id: r.total for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("total")).collect()}
    assert got == exp


def test_stream_compact_incremental_merge(spark, tmp_path):
    """Streamed generations compact into the PUBLISHED dataset through
    the delta-proportional merge: publish(drop1) + stream(drop2) +
    incremental_update_triples(staging) == publish(drop1 ∪ drop2) —
    the CatTree generation/cat structure end-to-end over streaming."""
    from qendpoint_spark.catalog import Catalog
    from qendpoint_spark.pipeline import (
        incremental_update_triples,
        run_pipeline,
    )

    landing = str(tmp_path / "landing")
    staging = str(tmp_path / "staging")
    ckpt = str(tmp_path / "ckpt")

    pages = generate_pages(spark, 90, seed=23).cache()
    half = F.pmod(F.xxhash64("url"), F.lit(2))
    drop1 = pages.filter(half == 0)
    drop2 = pages.filter(half == 1)

    cat_inc = Catalog(spark, str(tmp_path / "inc"))
    run_pipeline(spark, cat_inc, source_df=drop1, source_kind="pages",
                 source_fingerprint="drop1", num_partitions=4)

    drop2.write.parquet(f"{landing}/drop2.parquet")
    stream_ingest_pages(spark, landing, staging, ckpt)
    incremental_update_triples(
        spark, cat_inc, compact_staging(spark, staging),
        batch_fingerprint="gen2", num_partitions=4,
    )

    cat_full = Catalog(spark, str(tmp_path / "full"))
    run_pipeline(spark, cat_full, source_df=pages, source_kind="pages",
                 source_fingerprint="full", num_partitions=4)
    for name in ("dict_terms", "triples_spo", "triples_ops"):
        cols = sorted(
            c for c in cat_inc.read(name).columns if not c.startswith("_")
        )
        a = cat_inc.read(name).select(*cols)
        b = cat_full.read(name).select(*cols)
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, name
