"""Structured-Streaming operators.

The reference has no streaming engine; its nearest analogs are
RDFFluxStop micro-batching (chunk the parse stream, build small HDTs,
merge later — core/rdf/RDFFluxStop.java:240-290, CatTreeImpl) and the
delta-native-store + periodic merge (MergeRunnable, SURVEY.md §2D).
Both map naturally onto Structured Streaming:

- stream_ingest_pages: readStream over a landing directory of page
  files; each micro-batch runs the extraction stage and APPENDS string
  triples to a staging table (foreachBatch = exactly-once-per-batch
  sink). Compaction (dedup + dictionary/encode rebuild) is the batch
  pipeline run over staging — the CatTree "merge generations later"
  structure, with Spark replacing the binomial HDT merge by one
  shuffle.
- stream_events_windowed: watermarked tumbling-window aggregation over
  the events table (the generic streaming-agg capability check).
- sessionize_events: session_window aggregation keyed by user.

Tests drive these with availableNow one-shot triggers (bounded input,
deterministic results == batch equivalents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qendpoint_spark.extraction import extract_triples_from_pages

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)
EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def stream_ingest_pages(
    spark: SparkSession,
    landing_dir: str,
    staging_dir: str,
    checkpoint_dir: str,
    fail_after_batch_write: int | None = None,
) -> None:
    """Drain the landing directory (availableNow), writing each
    micro-batch's extracted triples to its OWN staging partition
    `batch=<id>` with overwrite — the idempotent-foreachBatch sink
    pattern. Exactly-once staging under crash/replay: if the driver
    dies after the sink write but before the checkpoint commit (the
    at-least-once window of a plain append), the restarted query
    replays the batch into the same directory and OVERWRITES it, so
    staging never holds a batch twice. The streaming analog of the
    reference's 3-step resumable merge (MergeRunnable restart steps;
    tested by MergeRestartTest — here tests/test_streaming.py::
    test_stream_ingest_crash_resume_exactly_once).

    fail_after_batch_write: fault injection for that test — raise
    AFTER batch `id`'s sink write completes, BEFORE the checkpoint
    commits, which is precisely the replay window.
    """
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(landing_dir)
    )

    def per_batch(batch_df: DataFrame, batch_id: int) -> None:
        triples = extract_triples_from_pages(batch_df).withColumn(
            "batch_id", F.lit(batch_id)
        )
        triples.write.mode("overwrite").parquet(
            f"{staging_dir}/batch={batch_id}"
        )
        if fail_after_batch_write is not None and batch_id == fail_after_batch_write:
            raise RuntimeError(
                f"injected crash: batch {batch_id} written, "
                "checkpoint not committed"
            )

    q = (
        stream.writeStream.foreachBatch(per_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def compact_staging(spark: SparkSession, staging_dir: str) -> DataFrame:
    """Staging (multi-batch, may contain cross-batch duplicate label
    triples) -> clean distinct triples_str ready for encode."""
    return (
        spark.read.parquet(staging_dir)
        .select("s", "p", "o")
        .dropDuplicates(["s", "p", "o"])
    )


def stream_events_windowed(
    spark: SparkSession,
    events_path: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    query_name: str = "events_windowed",
) -> DataFrame:
    """Watermarked tumbling-window counts/sums per event_type, drained
    synchronously with an availableNow trigger into a memory sink.
    Complete output mode => result equals the batch GROUP BY."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(events_path)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)


def sessionize_events(
    spark: SparkSession,
    events_path: str,
    gap: str = "30 minutes",
    query_name: str = "event_sessions",
) -> DataFrame:
    """Session windows per user (gap-based), the streaming-native
    sessionization operator."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(events_path)
    )
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", gap).alias("sw"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
