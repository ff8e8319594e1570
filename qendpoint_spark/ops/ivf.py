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

k-means training is iterative, but *serving* an IVF index is not: a
production index trains its coarse quantizer once and freezes it as an
artifact (FAISS ships trained quantizers the same way). The driver's
correctness gate therefore checks `ivf_topk_frozen`, which serves the
FROZEN_CENTROIDS artifact below — assignment + probe + top-k over
fixed-point integer vectors, exactly mirrored by an ANSI-SQL oracle
(integer distances -> bit-deterministic ranking). The trainer
(`kmeans_centroids`) remains the artifact's provenance and keeps its
pytest recall gate vs brute force.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

QUANT = 1000  # fixed-point scale shared with ops/similarity.py

# Coarse-quantizer artifact: k=8 centroids over the quantized
# (round(x*1000)) sf0.01 embeddings — Lloyd from the 8 lowest vec_ids
# as seeds, 5 iterations, components rounded to integers. Regenerate
# with scripts/train_ivf_centroids.py. Serving any SF with a fixed
# quantizer is the standard IVF contract (the quantizer is
# data-independent at query time).
FROZEN_CENTROIDS: list[list[int]] = [
    [8, 21, 41, -91, 0, -7, -15, 18, 58, -14, -24, 2, -33, -17, -8, -13, 65, 31, 22, 33, -58, 9, 0, -16, -9, 74, 86, 1, -10, 71, -32, 60, 4, -41, 14, -38, -6, 11, 23, -1, 11, 8, 14, 3, 5, 7, 38, -50, -10, -46, 1, 27, 15, -49, 18, 30, -6, 15, -84, -12, -23, 33, 49, -31],
    [-25, -15, 17, 10, 24, 35, -95, -20, -18, 13, -60, 47, 63, -85, 27, 8, -10, -11, 26, -42, 36, 19, -13, -14, 24, 70, -1, -12, 19, -13, -28, -2, -4, 20, 0, -1, -49, 15, 27, -62, 4, -57, 14, 14, 9, 21, -21, -12, -55, -83, -19, 10, -35, 24, -9, 32, 49, 2, 26, 10, -25, -18, -48, -3],
    [0, 10, -35, 43, 47, -2, -12, 6, -11, -64, -11, -22, -58, 69, -8, 16, -29, 60, 6, -18, -11, 2, 70, -38, -10, -65, 24, -20, 8, 10, -18, -102, 9, 8, 6, -8, 11, 62, 46, 47, -6, -13, 17, 34, -4, -7, -18, -4, 47, 30, 49, -66, -26, -31, 51, 0, 6, -8, 23, 63, 36, 1, 13, -10],
    [-15, 17, -24, -25, -32, 12, 33, 6, -14, -7, 4, 39, 27, 79, 31, -2, -28, -42, 20, 20, 9, -17, -21, 13, 1, 40, -28, -8, -66, -32, 1, -7, 78, -11, 14, -20, 17, -47, -51, -36, 2, -26, -64, -30, 19, 2, -18, -31, 55, -55, 17, -10, 24, -3, -32, -29, -3, -8, 28, -55, 28, 12, -3, -37],
    [30, -13, 69, -21, -34, -82, 40, -17, 11, 21, 30, -64, 27, -37, -5, -17, 48, 27, 10, 39, -12, 44, -22, -1, -18, -21, 8, 7, 29, -31, 34, -29, 11, 21, 45, -50, 11, -63, -30, 11, 12, -12, -8, 9, -26, 16, -48, 67, -33, -1, -11, 18, 27, 26, 100, -21, 2, -28, 53, -10, -50, -5, 37, 2],
    [-26, -16, 21, 7, 59, -4, -50, 70, -23, 6, 20, -5, 1, 8, -23, 4, -9, -51, -24, 36, 10, -13, 36, -14, 24, 51, -31, 0, 0, 13, 7, -23, -9, -11, -14, 39, 2, 69, -11, 27, -42, 50, 0, 16, -95, -48, 13, -27, -14, 33, 40, 33, 3, 28, -46, -79, 45, -45, 0, 0, 1, 44, -37, 14],
    [-20, -42, -12, -16, 45, 62, -24, -44, 15, 35, 66, 15, -6, 52, -6, 36, 32, 53, -61, -48, -7, -6, -2, -53, -37, -11, -1, 52, 21, -34, 20, 11, -8, -63, -22, 41, 24, -22, -12, -5, 29, -12, 13, -23, 9, 12, 22, 47, 19, 19, -34, -8, 58, -13, 19, 38, -65, 49, -11, -40, 19, 3, -4, 23],
    [79, 10, -29, 46, -38, 19, -9, 52, -23, -8, 18, -9, -58, -65, -14, 8, -24, 5, 11, 1, -13, -4, -9, 57, 4, -51, -40, 58, -1, 34, 56, 36, -20, 32, 12, 21, -52, -36, 15, 23, -20, -33, 27, -16, -6, 34, 22, 62, -45, 23, 34, -20, -9, -23, -24, 8, 11, 1, -77, -7, -1, -33, 9, -68],
]


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


# ------------------------------------------------------------------ serving


def frozen_centroid_df(spark: SparkSession, centroids: list[list[int]] | None = None) -> DataFrame:
    cents = centroids if centroids is not None else FROZEN_CENTROIDS
    return spark.createDataFrame(
        [(cid, vec) for cid, vec in enumerate(cents)],
        "cid int, cvec array<bigint>",
    )


def _qdist2(a: str, b: str):
    """Integer squared L2 over quantized vectors — exact, so ranking is
    bit-deterministic across engines."""
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def ivf_topk_frozen(
    embeddings: DataFrame,
    centroids: list[list[int]] | None = None,
    query_mod: int = 97,
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """Serve the frozen IVF index: (query_id, neighbor_id, rank, d2).

    Scale shape: the inverted lists are REPARTITIONED BY cid at build
    time — at rest this is a parquet table partitioned by cid, so a
    probe is a partition-pruned scan of nprobe/k of the corpus, never a
    shuffle. The centroid table (k rows) broadcasts; the only wide
    exchange is the candidate top-k, partitioned by query_id.
    """
    spark = embeddings.sparkSession
    cent = frozen_centroid_df(spark, centroids)
    q = embeddings.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.round(x.cast("double") * QUANT).cast("long"),
        ).alias("qv"),
    )
    wa = Window.partitionBy("vec_id").orderBy(F.col("d2").asc(), F.col("cid").asc())
    assigned = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("d2", _qdist2("qv", "cvec"))
        .withColumn("rk", F.row_number().over(wa))
        .filter(F.col("rk") == 1)
        .select("vec_id", "qv", "cid")
    )
    # inverted lists co-located by centroid id (partition-pruned probes)
    lists = assigned.repartition("cid")
    probes = (
        q.filter(F.col("vec_id") % query_mod == 0)
        .crossJoin(F.broadcast(cent))
        .withColumn("d2", _qdist2("qv", "cvec"))
        .withColumn("rk", F.row_number().over(wa))
        .filter(F.col("rk") <= nprobe)
        .select(F.col("vec_id").alias("query_id"), F.col("qv").alias("qq"), "cid")
    )
    cand = (
        lists.join(probes, "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("d2", _qdist2("qq", "qv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("d2").asc(), F.col("vec_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "rank", "d2")
    )
