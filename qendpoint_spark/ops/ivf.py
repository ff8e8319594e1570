"""IVF-style ANN: k-means coarse quantizer + inverted-list search.

The production-scale ANN shape (FAISS IVF family) on DataFrames:

1. train: Lloyd iterations entirely as joins/aggregations — assign =
   argmin over a broadcast centroid table, update = element-wise mean
   via posexplode + groupBy(centroid, dim). Deterministic init (lowest
   vec_ids as seeds), fixed iteration count, per-round localCheckpoint
   (same loop discipline as the CC canonicalizer).
2. search: a query probes only its nprobe nearest centroid lists —
   cost O(|Q| x |corpus| / k x nprobe) vs brute force's O(|Q| x
   |corpus|); at cluster scale the corpus stays partitioned BY
   centroid id (repartition on cid at index-build time), so a probe
   is a partition-pruned scan, not a shuffle.

k-means is iterative (not ANSI-SQL-expressible), so the driver's
correctness gate records a rows-only check for the IVF query; the
exactness baseline (ops/similarity.brute_force_topk) carries the
value-exact oracle, and the pytest suite checks IVF recall against it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dist2(a: str, b: str):
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def kmeans_centroids(
    embeddings: DataFrame, k: int = 8, iterations: int = 2
) -> DataFrame:
    """-> centroids(cid int, cvec array<double>). Seeds = the k lowest
    vec_ids (deterministic); empty clusters keep their previous
    centroid."""
    vecs = embeddings.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    cent = (
        vecs.orderBy("vec_id")
        .limit(k)
        .select(
            (F.row_number().over(Window.orderBy("vec_id")) - 1).alias("cid"),
            F.col("v").alias("cvec"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(iterations):
        assigned = assign_to_centroids(vecs, cent)
        dims = assigned.select(
            "cid", F.posexplode(F.col("v")).alias("dim", "x")
        )
        new = (
            dims.groupBy("cid", "dim")
            .agg(F.avg("x").alias("m"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("dim"), F.col("m")))
                    ),
                    lambda s: s["m"],
                ).alias("cvec")
            )
        )
        # empty clusters: keep old centroid
        cent = (
            cent.select("cid", F.col("cvec").alias("old"))
            .join(new, "cid", "left")
            .select(
                "cid", F.coalesce(F.col("cvec"), F.col("old")).alias("cvec")
            )
            .localCheckpoint(eager=True)
        )
    return cent


def assign_to_centroids(vecs: DataFrame, centroids: DataFrame) -> DataFrame:
    """vecs(vec_id, v) x centroids -> (vec_id, v, cid) by L2 argmin,
    centroid-id tie-break."""
    w = Window.partitionBy("vec_id").orderBy(F.col("d2").asc(), F.col("cid").asc())
    return (
        vecs.crossJoin(F.broadcast(centroids))
        .withColumn("d2", _dist2("v", "cvec"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "v", "cid")
    )


def ivf_topk(
    embeddings: DataFrame,
    query_mod: int = 97,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int = 2,
    iterations: int = 2,
) -> DataFrame:
    """(query_id, neighbor_id, rank, d2): top-k by L2 within the
    query's nprobe nearest centroid lists."""
    cent = kmeans_centroids(embeddings, k=n_centroids, iterations=iterations)
    vecs = embeddings.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    lists = assign_to_centroids(vecs, cent).localCheckpoint(eager=True)
    wq = Window.partitionBy("vec_id").orderBy(F.col("d2").asc(), F.col("cid").asc())
    probes = (
        vecs.filter(F.col("vec_id") % query_mod == 0)
        .crossJoin(F.broadcast(cent))
        .withColumn("d2", _dist2("v", "cvec"))
        .withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= nprobe)
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "cid")
    )
    cand = (
        lists.join(probes, "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("d2", _dist2("qv", "v"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("d2").asc(), F.col("vec_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "rank", "d2")
    )
