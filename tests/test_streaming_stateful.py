"""applyInPandasWithState: first-seen dedup across batches AND across
query restarts (state restored from the checkpoint)."""

from __future__ import annotations

from pyspark.sql import functions as F

from qendpoint_spark.datagen import generate_pages
from qendpoint_spark.streaming.stateful import (
    read_first_seen,
    stream_first_seen_pages,
)


def test_first_seen_across_restarts(spark, tmp_path):
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    pages = generate_pages(spark, 60, seed=21).cache()
    pages.count()

    # drop 1: first 40 urls (plus their recrawl rows)
    p1 = pages.filter(F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long") < 40)
    p1.write.parquet(f"{landing}/d1.parquet")
    stream_first_seen_pages(spark, landing, out, ckpt)
    got1 = read_first_seen(spark, out)
    assert got1.count() == got1.select("url").distinct().count() == 40
    # recrawled urls report n_seen >= 2 and keep the EARLIEST crawl
    multi = got1.filter(F.col("n_seen") >= 2)
    assert multi.count() > 0

    # drop 2 (new query run, same checkpoint): urls 20..59 overlap 20..39
    p2 = pages.filter(F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long") >= 20)
    p2.write.parquet(f"{landing}/d2.parquet")
    stream_first_seen_pages(spark, landing, out, ckpt)
    got2 = read_first_seen(spark, out)
    # only the 20 genuinely-new urls were emitted the second time
    assert got2.count() == 60
    assert got2.select("url").distinct().count() == 60
