"""Relational-shape query registry over the TPC-H-ish tables.

SURVEY.md §2F: the construction pipeline exercises distinct / grouped
aggregation / sort / window-rank / set ops / joins. These queries pin
each shape independently on the generic tables (plus the streaming
windowed aggregation), each with a DuckDB oracle — demonstrating that
the engine underneath the KG pipeline is a complete analytics surface.

Float policy: double sums are round(4) on both sides (accumulation
order may differ between engines; 1e-4 rounding with ~1e-9 accumulated
error makes boundary flips negligible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from qendpoint_spark.streaming import stream_events_windowed


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q_agg_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: filtered grouped aggregation with derived
    expressions (partial agg map-side; one shuffle on the group key)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_join_revenue_by_nation(spark, sf_dir):
    """Multi-join star shape: fact x dims with broadcast of the small
    dimensions (customer/nation join under the broadcast threshold)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


def q_window_topk_orders(spark, sf_dir):
    """Top-3 orders per customer by totalprice: rank window partitioned
    by a high-cardinality key (no single-reducer hotspot), integer/id
    tie-break for determinism."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 4).alias("totalprice"),
            "rk",
        )
    )


def q_window_running_balance(spark, sf_dir):
    """Running cumulative sum per user over time (frame window)."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 4).alias("running_value"),
    )


def q_setops_customer_segments(spark, sf_dir):
    """Set ops: customers with orders minus high-balance ones, union'd
    with suppliers' nations — intersect/except/union shapes."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    with_orders = cust.join(
        orders, cust["c_custkey"] == orders["o_custkey"], "left_semi"
    ).select(F.col("c_custkey").alias("key"), F.lit("has_order").alias("tag"))
    no_orders = cust.join(
        orders, cust["c_custkey"] == orders["o_custkey"], "left_anti"
    ).select(F.col("c_custkey").alias("key"), F.lit("no_order").alias("tag"))
    return with_orders.unionByName(no_orders)


def q_rollup_order_stats(spark, sf_dir):
    """Rollup (hierarchical aggregate) over status x priority."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


def q_exists_late_orders(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS correlated subquery as a left-semi join —
    orders with at least one deep-discount lineitem, per priority
    (the testdata lineitem is slim: no commit/receipt dates)."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    late = li.filter(F.col("l_discount") > 0.05)
    return (
        orders.join(late, orders["o_orderkey"] == late["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q_setops_intersect_except(spark, sf_dir):
    """True INTERSECT / EXCEPT set operators: customers in both (or
    only one of) the orders and high-balance populations."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    with_orders = cust.join(
        orders, cust["c_custkey"] == orders["o_custkey"], "left_semi"
    ).select(F.col("c_custkey").alias("key"))
    rich = cust.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("key")
    )
    both = with_orders.intersect(rich).select("key", F.lit("both").alias("tag"))
    only_orders = with_orders.exceptAll(rich).select(
        "key", F.lit("orders_only").alias("tag")
    )
    return both.unionByName(only_orders)


def q_ntile_quartiles(spark, sf_dir):
    """NTILE window shape: quartile of each order within its priority
    class by totalprice (deterministic: orderkey tie-break), plus the
    per-quartile aggregate."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    q = orders.withColumn("quartile", F.ntile(4).over(w))
    return q.groupBy("o_orderpriority", "quartile").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
        F.min("o_orderkey").alias("first_key"),
    )


def q_rank_distribution(spark, sf_dir):
    """Rank-distribution window shapes: percent_rank, cume_dist and
    dense_rank of each supplier's account balance within its nation —
    the remaining SQL:2003 ranking functions not covered by the
    row_number/ntile rows. Ties (same balance) keep equal ranks, so the
    result is deterministic without a tiebreak; fractions are computed
    from the integer rank/count pieces through the exact-rounding
    helper (float percent_rank() would not hash identically across
    engines)."""
    from qendpoint_spark.ops.textstats import round6_exact

    sup = _t(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal")
    n = F.count(F.lit(1)).over(Window.partitionBy("s_nationkey"))
    rk = F.rank().over(w)
    le = F.count(F.lit(1)).over(w)  # default frame: rows <= current (peers incl.)
    return sup.select(
        "s_nationkey",
        "s_suppkey",
        round6_exact(rk - 1, F.greatest(n - 1, F.lit(1))).alias("pct_rank"),
        round6_exact(le, n).alias("cume"),
        F.dense_rank().over(w).cast("long").alias("drank"),
    )


def q_lead_lag_gaps(spark, sf_dir):
    """LEAD window shape: per-user inter-event gap in seconds (the
    sessionize building block exposed as its own operator); last event
    per user has no successor and reports -1."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")
    nxt = F.lead(epoch, 1).over(w)
    return ev.select(
        "user_id",
        "event_id",
        F.coalesce(nxt - epoch, F.lit(-1)).cast("long").alias("gap_s"),
    )


def q_scalar_subquery_small_qty(spark, sf_dir):
    """TPC-H Q17 shape: correlated scalar aggregate subquery — revenue
    of lineitems below 20% of their part's average quantity. The
    subquery materializes as a per-part aggregate joined back (AQE
    broadcasts it when small). Quantities are integral, so the 0.2*avg
    comparison is exact integer arithmetic (qty*5*cnt < sum_qty)."""
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "qty", F.col("l_quantity").cast("long")
    )
    per_part = li.groupBy("l_partkey").agg(
        F.sum("qty").alias("sum_qty"), F.count(F.lit(1)).alias("cnt")
    )
    small = li.join(per_part, "l_partkey").filter(
        F.col("qty") * 5 * F.col("cnt") < F.col("sum_qty")
    )
    return small.agg(
        F.count(F.lit(1)).alias("n_small"),
        F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"),
    )


def q_sessionize_events(spark, sf_dir):
    """Batch sessionization: lag + gap-flag + cumulative session id —
    the window-chain idiom (streaming twin: session_window)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet stores TIMESTAMP_NTZ; cast via LTZ (session TZ pinned to
    # UTC) to get epoch seconds comparable with DuckDB's epoch(ts)
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = F.when(
        epoch - F.lag(epoch, 1).over(w) > 1800,
        1,
    ).otherwise(0)
    sess = (
        ev.withColumn("new_sess", gap)
        .withColumn(
            "session_no",
            F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return sess.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").alias("first_event"),
    )


def q_stream_sessionize(spark, sf_dir):
    """Streaming-native sessionization: session_window(ts, 30 min) per
    user via Structured Streaming (availableNow drain == batch result).
    Oracle: gap-flag + cumulative-sum sessions; Spark merges events
    whose interval [ts, ts+gap) overlaps the next event, so a gap of
    EXACTLY 30 min starts a new session (>= in the oracle's flag)."""
    from qendpoint_spark.streaming import sessionize_events

    out = sessionize_events(
        spark, sf_dir, gap="30 minutes",
        query_name=f"sess_{abs(hash(sf_dir)) % 10**8}",
    )
    return out.select(
        F.col("session_start").cast("timestamp").cast("long").alias("start_epoch"),
        F.col("session_end").cast("timestamp").cast("long").alias("end_epoch"),
        "user_id",
        F.col("n_events").cast("long").alias("n_events"),
    )


def q_stream_ingest_compact(spark, sf_dir):
    """CatTree-style incremental ingest through the driver gate:
    documents re-shaped as pages -> landing dir -> Structured Streaming
    foreachBatch extraction into staging -> compaction (cross-batch
    dedup). The oracle recomputes the pages extraction grammar
    directly, so any batch loss/duplication or extraction drift
    hash-fails."""
    import tempfile

    from qendpoint_spark.streaming import compact_staging, stream_ingest_pages

    docs = _t(spark, sf_dir, "documents")
    pages = docs.select(
        F.concat(F.lit("http://example.org/page/"), F.col("doc_id").cast("string")).alias("url"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.encode(F.coalesce(F.col("text"), F.lit("")), "utf-8").alias("html"),
        "text",
        "lang",
    )
    base = tempfile.mkdtemp(prefix="qs_ingest_")
    pages.write.mode("overwrite").parquet(f"{base}/landing/d1.parquet")
    stream_ingest_pages(spark, f"{base}/landing", f"{base}/staging", f"{base}/ckpt")
    return compact_staging(spark, f"{base}/staging")


def q_stream_first_seen(spark, sf_dir):
    """applyInPandasWithState in the driver gate: documents reshaped as
    pages with a planted recrawl (two warc_ts per url), drained through
    the cross-batch first-seen dedup — each url must emit exactly once
    with the EARLIEST crawl and n_seen=2. Any state loss, replay
    double-emit, or wrong-row pick hash-fails."""
    import tempfile

    from qendpoint_spark.streaming.stateful import (
        read_first_seen,
        stream_first_seen_pages,
    )

    docs = _t(spark, sf_dir, "documents")
    first = docs.select(
        F.concat(F.lit("http://example.org/page/"), F.col("doc_id").cast("string")).alias("url"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.encode(F.coalesce(F.col("text"), F.lit("")), "utf-8").alias("html"),
        "text",
        "lang",
    )
    recrawl = first.withColumn(
        "warc_ts", F.lit("2026-02-01 00:00:00").cast("timestamp")
    )
    base = tempfile.mkdtemp(prefix="qs_fs_")
    first.unionByName(recrawl).write.mode("overwrite").parquet(
        f"{base}/landing/d1.parquet"
    )
    stream_first_seen_pages(spark, f"{base}/landing", f"{base}/out", f"{base}/ckpt")
    out = read_first_seen(spark, f"{base}/out")
    return out.select(
        "url",
        F.col("warc_ts").cast("timestamp").cast("long").alias("first_epoch"),
        "lang",
        F.col("n_seen").cast("long").alias("n_seen"),
    )


def q_stream_events_window(spark, sf_dir):
    """Structured Streaming watermarked tumbling window (availableNow
    drain == batch GROUP BY; oracle is the batch equivalent)."""
    return stream_events_windowed(
        spark, sf_dir, window="1 hour", watermark="2 hours",
        query_name=f"ew_{abs(hash(sf_dir)) % 10**8}",
    )


REL_QUERIES = {
    "rel_agg_pricing_summary": q_agg_pricing_summary,
    "rel_join_revenue_by_nation": q_join_revenue_by_nation,
    "rel_window_topk_orders": q_window_topk_orders,
    "rel_window_running_balance": q_window_running_balance,
    "rel_setops_customer_segments": q_setops_customer_segments,
    "rel_exists_late_orders": q_exists_late_orders,
    "rel_scalar_subquery_small_qty": q_scalar_subquery_small_qty,
    "rel_ntile_quartiles": q_ntile_quartiles,
    "rel_lead_lag_gaps": q_lead_lag_gaps,
    "rel_rank_distribution": q_rank_distribution,
    "rel_setops_intersect_except": q_setops_intersect_except,
    "rel_rollup_order_stats": q_rollup_order_stats,
    "rel_sessionize_events": q_sessionize_events,
    "stream_events_window": q_stream_events_window,
    "stream_sessionize_events": q_stream_sessionize,
    "stream_ingest_compact": q_stream_ingest_compact,
    "stream_first_seen": q_stream_first_seen,
}

REL_ORACLES = {
    "rel_agg_pricing_summary": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus""",
    "rel_join_revenue_by_nation": """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(DISTINCT o_orderkey) AS n_orders
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name""",
    "rel_window_topk_orders": """
SELECT o_custkey, o_orderkey, round(o_totalprice, 4) AS totalprice, rk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders
) WHERE rk <= 3""",
    "rel_window_running_balance": """
SELECT user_id, event_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             4) AS running_value
FROM events""",
    "rel_setops_customer_segments": """
SELECT c_custkey AS key, 'has_order' AS tag FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
UNION ALL
SELECT c_custkey AS key, 'no_order' AS tag FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""",
    "rel_rollup_order_stats": """
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""",
    "rel_exists_late_orders": """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_discount > 0.05
)
GROUP BY o_orderpriority""",
    "rel_ntile_quartiles": """
WITH q AS (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         ntile(4) OVER (PARTITION BY o_orderpriority
                        ORDER BY o_totalprice ASC, o_orderkey ASC) AS quartile
  FROM orders
)
SELECT o_orderpriority, quartile, count(*)::BIGINT AS n,
       round(sum(o_totalprice), 2) AS total,
       min(o_orderkey) AS first_key
FROM q GROUP BY 1, 2""",
    "rel_rank_distribution": """
WITH b AS (
  SELECT s_nationkey, s_suppkey,
         rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal) AS rk,
         dense_rank() OVER (PARTITION BY s_nationkey
                            ORDER BY s_acctbal) AS drank,
         count(*) OVER (PARTITION BY s_nationkey
                        ORDER BY s_acctbal) AS le,
         count(*) OVER (PARTITION BY s_nationkey) AS n
  FROM supplier
)
SELECT s_nationkey, s_suppkey,
       (((rk - 1) * 2000000 + (greatest(n - 1, 1))) // (2 * (greatest(n - 1, 1))) / 1000000.0) AS pct_rank,
       (((le) * 2000000 + (n)) // (2 * (n)) / 1000000.0) AS cume,
       drank::BIGINT AS drank
FROM b""",
    "rel_lead_lag_gaps": """
SELECT user_id, event_id,
       coalesce(
         lead(floor(epoch(ts))::BIGINT) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id)
         - floor(epoch(ts))::BIGINT, -1)::BIGINT AS gap_s
FROM events""",
    "rel_scalar_subquery_small_qty": """
WITH q AS (
  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty, l_extendedprice
  FROM lineitem
),
pp AS (
  SELECT l_partkey, sum(qty)::BIGINT AS sum_qty, count(*) AS cnt
  FROM q GROUP BY 1
)
SELECT count(*)::BIGINT AS n_small,
       round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
FROM q JOIN pp USING (l_partkey)
WHERE qty * 5 * cnt < sum_qty""",
    "rel_setops_intersect_except": """
WITH with_orders AS (
  SELECT c_custkey AS key FROM customer
  WHERE c_custkey IN (SELECT o_custkey FROM orders)
),
rich AS (SELECT c_custkey AS key FROM customer WHERE c_acctbal > 5000)
SELECT key, 'both' AS tag FROM (SELECT key FROM with_orders INTERSECT SELECT key FROM rich)
UNION ALL
SELECT key, 'orders_only' FROM (SELECT key FROM with_orders EXCEPT ALL SELECT key FROM rich)""",
    "rel_sessionize_events": """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w > 1800 THEN 1 ELSE 0 END
           AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  -- ::BIGINT: DuckDB's windowed sum(int) yields HUGEINT (int128); the
  -- driver's value hash is type-sensitive, Spark emits BIGINT
  SELECT user_id, event_id,
         (sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           )::BIGINT AS session_no
  FROM flagged
)
SELECT user_id, session_no, count(*)::BIGINT AS n_events,
       min(event_id) AS first_event
FROM sessions GROUP BY user_id, session_no""",
    "stream_events_window": """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM events GROUP BY 1, 2""",
    "stream_sessionize_events": """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w >= 1800 THEN 1 ELSE 0 END
           AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts,
         (sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           )::BIGINT AS session_no
  FROM flagged
)
SELECT floor(epoch(min(ts)))::BIGINT AS start_epoch,
       (floor(epoch(max(ts))) + 1800)::BIGINT AS end_epoch,
       user_id, count(*)::BIGINT AS n_events
FROM sessions GROUP BY user_id, session_no""",
    "stream_first_seen": """
SELECT 'http://example.org/page/' || doc_id AS url,
       floor(epoch(TIMESTAMP '2026-01-01 00:00:00'))::BIGINT AS first_epoch,
       lang,
       2::BIGINT AS n_seen
FROM documents""",
    "stream_ingest_compact": """
WITH pages AS (
  SELECT 'http://example.org/page/' || doc_id AS u, text, lang
  FROM documents
),
toks AS (
  SELECT DISTINCT u, tok FROM (
    SELECT u, unnest(string_split(coalesce(text, ''), ' ')) AS tok FROM pages
  ) WHERE length(tok) >= 4
)
SELECT DISTINCT s, p, o FROM (
  SELECT u AS s, 'http://example.org/prop/lang' AS p,
         '"' || lang || '"@' || lang AS o
  FROM pages
  UNION ALL
  SELECT u, 'http://example.org/prop/mentions',
         'http://example.org/ent/' || tok
  FROM toks
  UNION ALL
  SELECT DISTINCT 'http://example.org/ent/' || tok,
         'http://example.org/prop/label', '"' || tok || '"'
  FROM toks
)""",
}
