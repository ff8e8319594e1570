"""Custom stateful streaming operator: cross-batch first-seen dedup.

A Common-Crawl ingest sees the same url across crawls and micro-
batches; emitting it once requires state that outlives a batch —
Structured Streaming's applyInPandasWithState (Arrow-batched per-group
state, checkpointed with the query). This is the pattern slot for any
custom stateful operator the reference lacks an engine for
(SURVEY.md: the reference's nearest analog is the delta-store +
delete-bitmap machinery, MergeRunnable §2D).

State is one flag per url group; the streaming checkpoint persists it,
so a restarted query continues deduping against everything already
seen (tested in tests/test_streaming_stateful.py).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from qendpoint_spark.streaming.incremental import PAGES_SCHEMA

FIRST_SEEN_SCHEMA = "url string, warc_ts timestamp, lang string, n_seen long"
_STATE_SCHEMA = "seen long"


def _first_seen_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    rows = pd.concat(list(pdfs), ignore_index=True)
    n = len(rows) + (state.get[0] if state.exists else 0)
    if state.exists:
        state.update((n,))
        return iter(())  # url already emitted in an earlier batch
    state.update((n,))
    first = rows.sort_values("warc_ts").iloc[:1]
    out = first[["url", "warc_ts", "lang"]].copy()
    out["n_seen"] = n
    return iter((out,))


def stream_first_seen_pages(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain the landing dir (availableNow), emitting each url exactly
    once across ALL batches and restarts; first-crawl row wins."""
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .parquet(landing_dir)
    )
    deduped = stream.groupBy("url").applyInPandasWithState(
        _first_seen_fn,
        FIRST_SEEN_SCHEMA,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )

    def per_batch(df: DataFrame, batch_id: int) -> None:
        # deterministic per-batch path + overwrite => replay-idempotent:
        # if the stream's commit fails after a partial write, the
        # replayed batch overwrites the same directory instead of
        # double-appending (a bare mode("append") would re-emit urls on
        # replay, breaking the exactly-once contract)
        df.write.mode("overwrite").parquet(f"{out_dir}/batch-{batch_id}")

    q = (
        deduped.writeStream.outputMode("update")
        .foreachBatch(per_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_first_seen(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read the first-seen sink (one subdirectory per micro-batch)."""
    return (
        spark.read.schema(FIRST_SEEN_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(out_dir)
    )
