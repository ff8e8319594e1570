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
   num_partitions rows collected to the driver (bounded metadata:
   <= num_partitions x |groups| rows) — turned into cumulative offsets
   joined back by broadcast, then `rank = offset + (mid - min_mid) + 1`.

Cost: one range shuffle + one cheap stats pass. No global
single-partition window (`Window.orderBy` without partitionBy
serializes every row through one task — the classic 100-TB killer) and
no second full shuffle. Deterministic: ranks depend only on the total
order of `sort_cols`, not on sampled boundary placement. The
contiguity invariant (ids are exactly start..start+n-1) is asserted by
tests.

`count_by` piggybacks per-group row counts on the SAME stats pass —
callers that need group totals (the dictionary's section sizes) get
them without a second full scan of the ranked table.

`eager=False` skips the final localCheckpoint: the returned frame is a
LAZY projection over the persisted range partitioning, for callers
that consume the result in exactly ONE downstream action (the
pipeline's dict_terms write). That saves a full materialize+rescan of
the table. The caller must invoke the attached `_zwr_release()` after
its action to free the cached blocks. Default stays eager: multiple
consumers (encode's three section-map joins) would otherwise re-plan
the join per consumer, and long-lived sessions would leak blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def zip_with_rank(
    df: DataFrame,
    sort_cols: list[str],
    id_col: str = "id",
    start: int = 1,
    num_partitions: int | None = None,
    count_by: str | None = None,
    eager: bool = True,
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

    count_by: optional column name; per-value row counts from the same
    stats job are attached to the result as `._zwr_counts` (dict
    value -> n). eager=False: see module docstring.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    part = (
        df.repartitionByRange(num_partitions, *[F.col(c) for c in sort_cols])
        .sortWithinPartitions(*sort_cols)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__mid", F.monotonically_increasing_id())
        .persist()
    )
    # ONE stats pass materializes the cached partitioning and yields both
    # the per-partition offsets and (optionally) the per-group totals.
    group_cols = ["__pid"] + ([count_by] if count_by else [])
    stat_rows = (
        part.groupBy(*group_cols)
        .agg(F.min("__mid").alias("__min_mid"), F.count(F.lit(1)).alias("__cnt"))
        .collect()
    )
    per_pid: dict[int, list[int]] = {}
    counts: dict = {}
    for r in stat_rows:
        pid = r["__pid"]
        ent = per_pid.setdefault(pid, [r["__min_mid"], 0])
        ent[0] = min(ent[0], r["__min_mid"])
        ent[1] += r["__cnt"]
        if count_by:
            counts[r[count_by]] = counts.get(r[count_by], 0) + r["__cnt"]
    offset_rows, acc = [], 0
    for pid in sorted(per_pid):
        mn, cnt = per_pid[pid]
        offset_rows.append((pid, mn, acc))
        acc += cnt
    offsets = spark.createDataFrame(
        offset_rows,
        T.StructType(
            [
                T.StructField("__pid", T.IntegerType()),
                T.StructField("__min_mid", T.LongType()),
                T.StructField("__offset", T.LongType()),
            ]
        ),
    )
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
    if eager:
        # materialize, then release the persisted intermediate: callers
        # run many builds in one session and un-unpersisted blocks
        # accumulate. localCheckpoint also cuts the plan, keeping AQE
        # re-optimization cost flat when builds compose (merge/diff/CC).
        ranked = ranked.localCheckpoint(eager=True)
        part.unpersist()
        ranked._zwr_release = lambda: None
    else:
        ranked._zwr_release = lambda: part.unpersist()
    if count_by:
        ranked._zwr_counts = counts
    return ranked
