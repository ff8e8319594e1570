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

# Coarse-quantizer artifact: k = 22 ~= sqrt(n=500) centroids over the
# quantized (round(x*1000)) sf0.01 embeddings — Lloyd from the k lowest
# vec_ids as seeds, 5 iterations, components rounded to integers.
# k ~= sqrt(n) is the standard IVF balance point: probing nprobe of
# sqrt(n) lists scans ~nprobe*sqrt(n) vectors instead of n. Regenerate
# at the serving corpus size with scripts/train_ivf_centroids.py
# (its default k IS sqrt(n)). Serving any SF with a fixed quantizer is
# the standard IVF contract (the quantizer is data-independent at
# query time).
FROZEN_CENTROIDS: list[list[int]] = [
    [38, 24, 43, -77, 55, -18, -47, 31, 49, -45, -21, -7, -49, 1, -38, -5, 46, 44, 55, 57, -98, 24, 53, 10, -6, 91, 114, -32, -3, 103, 6, 60, -28, -54, 6, -14, -20, 5, 32, 3, 20, 25, -28, 21, -12, 37, 28, -67, 14, -19, 20, 30, 7, -26, 65, 19, -15, -12, -72, -49, -9, 15, 45, -59],
    [-25, 11, 9, -53, 1, 33, -108, 3, -3, 3, -60, 53, 78, -40, 34, 22, -64, -24, 7, -46, 29, 71, 30, 4, 32, 71, -16, -52, -10, 66, -20, 12, -67, -40, -21, 48, -66, -17, 21, -89, 1, -56, 38, 68, 11, 24, -65, -34, -52, -127, 16, 9, -20, 15, -25, 81, 44, -59, 27, 11, -52, -20, -24, -72],
    [26, 14, -55, 100, 66, 43, 84, 19, -48, -97, -3, 58, -73, 56, 22, 59, -21, 32, -62, -100, 54, 33, 63, -64, 22, -30, 21, 15, 35, -2, 23, -9, -31, -13, -39, 26, 31, 72, 20, 73, -10, -4, 46, -8, 58, -9, -37, -5, 113, -21, 48, -71, -28, -81, 11, 58, 42, -39, 2, 49, 36, 6, 27, 36],
    [-27, 43, 37, 12, 24, -6, 66, 32, -44, 41, 15, 31, -8, 81, 20, 7, -5, -2, 1, 8, -1, -14, -44, -1, -58, 36, 5, -54, -60, -29, -19, -7, 74, 25, -24, -42, 6, 0, -4, -40, -4, -41, -88, -15, 23, 8, -22, -41, 97, -102, 2, 5, 19, 34, -24, -34, 11, 7, 18, -39, 40, 20, -37, -53],
    [60, -12, 52, -14, 8, -105, 39, 59, -27, 81, 98, -94, 13, -32, 16, 64, 56, 90, 2, -2, -65, 24, -4, 91, -36, -8, 0, -6, 78, -47, 65, 14, 32, -4, 76, -64, -48, -37, 18, -30, -20, -31, -100, 23, -44, 10, -67, 101, -16, -14, 60, -36, 4, 16, 70, -14, -15, -42, 36, -30, -93, -46, 28, -7],
    [-22, -89, 22, -12, 46, -7, -46, 96, -30, 29, 10, 27, 9, 26, -23, -15, 13, -74, -117, 72, 4, 5, 32, 58, 31, -11, -34, 12, 7, 17, 45, -56, 5, -65, -30, 40, 18, 86, -50, -4, -96, 0, -52, 29, -75, -31, 14, 10, -1, -15, 58, 33, -5, 41, -87, -67, -23, -77, -12, 14, -35, 35, -25, 39],
    [-1, -16, -16, -59, 6, 50, -99, -31, -20, 40, 115, -22, 25, 27, -62, 39, -53, 147, -34, -106, 3, -14, 20, -127, -74, -64, -33, 12, -22, -6, 56, -27, -41, -110, -16, 23, 61, 35, -26, -52, 42, -28, -13, -14, -5, 76, 70, 57, 24, 16, -1, 50, 55, -8, -15, 63, -18, 71, 8, -1, 40, -52, 58, -11],
    [124, 16, 4, 68, -23, 33, -15, 101, -40, 21, 26, 35, -45, -77, -6, 0, 0, -24, -8, 38, -23, 12, 21, 30, 2, -41, -44, 64, -30, 31, 106, 53, -55, -8, -23, 34, -45, -29, 24, 2, -23, -15, 11, -51, -9, 59, 5, 97, -36, 12, 52, 4, 11, -7, -26, 35, 11, 3, -128, -24, 13, -26, -2, -114],
    [-59, -66, -59, 28, 43, 50, -25, 25, 15, 34, -77, 51, -41, 2, -14, 82, 32, -43, 27, 1, 41, -32, 15, -59, -64, 69, 20, 21, 8, -102, -6, -35, -10, -26, 76, -66, 4, 31, 41, 30, -12, -23, -23, 21, -12, -64, 12, -46, -45, -22, 6, -23, -54, 44, 13, -40, -21, 62, 74, -41, -66, 0, -19, -17],
    [26, -13, -42, 43, 7, 32, -53, 86, -49, 32, 17, -48, -66, 21, -62, -43, -63, 41, -35, -27, -36, -49, 39, 52, -53, -38, -78, 70, -12, 6, 5, -43, -14, 45, 130, 44, -172, 34, 34, 92, -43, 25, 111, 27, -28, -3, -45, 21, -19, -37, 29, 28, -32, 17, -2, 18, 24, -26, 8, -38, -5, 16, -7, 14],
    [40, -5, -77, -6, -50, 25, -7, 32, 40, -22, 2, -76, 12, -36, 16, -20, -47, 54, 22, -19, -19, 30, -14, -3, 18, 112, -22, 20, -37, 42, -88, 55, 68, -80, -44, 13, 47, -17, -28, 51, -25, -79, -24, 2, 3, 5, 22, -17, 35, 82, 61, -44, 46, 2, -13, -34, 95, 23, 15, 6, 34, -52, -47, -3],
    [-83, 2, -88, 27, 73, 38, -68, -41, 15, -23, 59, -36, -38, 68, 6, -48, 72, 8, -28, -31, -60, -106, 70, -40, 0, 1, 73, 75, -44, 21, -4, 66, 66, -94, -29, -4, 19, -14, -40, 20, 118, 55, 67, 12, -1, -27, -40, -27, 55, 26, -81, -22, 20, 81, 8, -1, -34, 86, -65, -18, -4, 75, 42, 96],
    [-5, -54, -17, -14, 82, 77, -38, -42, 3, 7, 75, 33, 34, 47, 17, -42, 11, -78, -50, -65, -12, 73, 2, -12, 5, 81, 9, 53, -47, -29, 86, -45, 3, 3, 5, -9, -21, -14, 58, 96, 64, 10, -55, 2, 2, 46, 0, 48, -62, 13, -33, -33, 60, -12, 24, -6, -56, -42, 58, 4, 73, 46, -66, -81],
    [25, 26, 44, 29, 63, 42, -84, 25, -4, -37, 83, 0, 6, -103, -55, 58, -37, 56, 23, -78, 60, 28, -23, 23, -2, -1, 47, 41, 53, 30, 3, -17, 45, 74, -5, 19, 3, 82, -13, -24, -15, -28, -7, -88, -76, -14, 53, 23, -15, -86, 32, 1, -98, -25, -16, -8, -40, 35, -16, 53, 27, -2, -81, 54],
    [-41, 76, 32, -66, -25, 25, -13, -2, 33, 109, -65, -35, 25, -19, 31, -6, 37, 1, 26, -8, 53, -3, -58, -2, -37, 19, 7, 7, -18, -7, -41, 22, 18, 53, 43, 12, 55, -89, -6, -1, 10, 46, 102, -21, -36, -75, 49, 58, -24, -4, -53, 28, 4, -47, 84, 60, -47, 31, -117, -11, -89, -62, 22, 18],
    [-87, 9, -19, -25, -54, -38, 46, -36, -32, -30, -58, -32, -60, -78, -69, -101, -56, -28, 49, 42, 26, -37, 27, 2, 30, 22, 23, -82, 20, -49, 56, -48, 62, 5, 0, -68, -90, -44, 1, -32, 9, 25, 78, -60, 21, 41, 34, 6, 29, 79, 4, -22, 37, -68, -73, -79, 51, -1, 36, 62, -10, 34, -23, 13],
    [21, -42, -47, -30, 36, 88, 9, 0, 59, 61, 40, 17, 38, -14, 103, -44, 14, 4, 62, 48, 64, -83, -21, -38, 37, 39, -33, 62, -16, 21, -59, 24, 134, 36, 4, -12, -38, -9, -57, -45, -38, -100, 9, 57, 53, 1, 6, -12, -96, -48, -51, 8, 44, -49, -6, 1, -5, -53, 7, -83, 83, 36, 16, 20],
    [35, -64, 4, -63, -9, -11, -20, -106, -8, -118, -7, -20, -66, 31, -23, -47, 68, 73, -24, 33, -29, 87, -47, -60, -46, -59, -22, 13, 61, -2, -71, -6, -63, -4, 33, -7, 29, -23, -8, 20, 40, -8, -10, -26, 34, 8, -5, 43, -17, 17, -42, 36, 40, -46, 20, 32, 6, 12, 77, -11, -28, 89, 37, -8],
    [-38, 2, 78, 13, 25, -138, -58, 14, 57, 1, 33, 4, 63, 29, 46, -13, 41, 7, -58, 39, -16, -55, 2, -22, 34, -47, -56, 38, -70, -12, -34, -79, -27, 45, -6, -3, -27, 61, -29, -7, -39, -19, -9, 45, -5, -3, -13, -73, 4, 34, 114, 44, 30, 30, 82, 8, 51, -6, -15, -34, 79, -76, -35, -93],
    [1, -22, 79, 46, -50, -50, 26, 48, 39, -5, -56, 31, 19, 31, 26, 79, -55, -88, -33, 15, -6, -30, -33, -30, 47, -8, -49, 12, 36, 29, 57, -25, 46, 21, 6, -42, 70, -84, -71, -12, 67, 14, 37, 80, -130, 50, -18, -31, -61, 20, 26, 68, 46, 13, 52, -6, -21, -35, -12, 45, 3, -20, 61, 4],
    [30, 49, -10, -15, -88, 6, -25, -72, -36, -1, -3, 13, 42, -23, -28, 12, 38, 28, 91, 68, -39, 18, -14, 32, 46, -60, 45, 57, 12, -74, -2, -55, -25, -6, 38, 63, -28, -42, -28, -35, -53, 42, 21, -64, 21, -2, -62, 9, -24, -8, -67, -123, 31, -29, 23, -43, -10, 34, -58, -17, 10, 72, 38, 4],
    [-36, 30, 82, -17, 31, -4, -6, -60, -48, -97, -2, 44, 20, 85, 35, 88, 58, -32, 19, -1, -27, -14, 85, -39, 57, 18, -16, -77, 60, 12, 10, 13, -32, 27, -51, 100, 50, 20, 110, -11, -4, -5, 29, -35, -48, -86, 49, 64, 56, 25, -4, -15, -74, 10, -38, -72, 81, -38, -30, -28, -85, -2, 43, 41],
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
