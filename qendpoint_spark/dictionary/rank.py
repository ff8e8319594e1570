"""Scalable contiguous rank assignment (distributed zipWithIndex).

The reference assigns dictionary IDs with a single-threaded streaming
counter over the k-way-merged term stream
(qendpoint-core CompressFourSectionDictionary.java:88-133) — a serial
bottleneck Spark must not reproduce. Here:

1. range-partition on the sort key + sortWithinPartitions (ONE full
   shuffle; Spark samples balanced boundaries, so skewed term prefixes
   spread across partitions),
2. `monotonically_increasing_id()` — a narrow op that increments by 1
   within each partition, so after the local sort it enumerates rows in
   global order *within* each range partition,
3. per-partition (min_mid, count) — a map-side-combined aggregate of
   num_partitions rows — turned into cumulative offsets on the driver
   side of a broadcast, then `rank = offset + (mid - min_mid) + 1`.

Cost: one range shuffle + one cheap pass. No global single-partition
window (`Window.orderBy` without partitionBy serializes every row
through one task — the classic 100-TB killer) and no second full
shuffle (a `Window.partitionBy(pid)` would hash-exchange the whole
table again). Deterministic: ranks depend only on the total order of
`sort_cols`, not on sampled boundary placement. The contiguity
invariant (ids are exactly start..start+n-1) is asserted by tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def zip_with_rank(
    df: DataFrame,
    sort_cols: list[str],
    id_col: str = "id",
    start: int = 1,
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach a contiguous `start`-based rank over the total order of
    sort_cols.

    Rows must be distinct on sort_cols (dictionary terms are — the
    reference enforces the same with DuplicatedIterator,
    CompressUtil.java:151-229). Binary/unsigned-UTF8 string order is
    Spark's native StringType order, matching HDT section order
    (CompactString.java:104-106).

    The returned DataFrame stays range-partitioned and locally sorted on
    sort_cols — callers writing section tables get the HDT on-disk sort
    order for free.
    """
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    part = (
        df.repartitionByRange(num_partitions, *[F.col(c) for c in sort_cols])
        .sortWithinPartitions(*sort_cols)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__mid", F.monotonically_increasing_id())
        .persist()
    )
    stats = (
        part.groupBy("__pid")
        .agg(F.min("__mid").alias("__min_mid"), F.count(F.lit(1)).alias("__cnt"))
    )
    w = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = stats.withColumn(
        "__offset", F.coalesce(F.sum("__cnt").over(w), F.lit(0))
    ).select("__pid", "__min_mid", "__offset")
    ranked = (
        part.join(F.broadcast(offsets), "__pid")
        .withColumn(
            id_col,
            (
                F.col("__mid")
                - F.col("__min_mid")
                + F.col("__offset")
                + F.lit(start)
            ).cast("long"),
        )
        .drop("__pid", "__mid", "__min_mid", "__offset")
    )
    # materialize, then release the persisted intermediate: callers run
    # many builds in one session and un-unpersisted blocks accumulate.
    # localCheckpoint also cuts the plan, keeping AQE re-optimization
    # cost flat when builds compose (merge/diff/CC loops).
    ranked = ranked.localCheckpoint(eager=True)
    part.unpersist()
    return ranked
