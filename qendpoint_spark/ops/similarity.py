"""Approximate-nearest-neighbor search over the `embeddings` table.

- brute_force_topk: the exactness baseline — query set x corpus with a
  quantized integer dot product (fixed-point round(x*1000)) so ranking
  is bit-deterministic across engines; ties break on neighbor id. At
  scale the corpus side stays partitioned and the (small) query set is
  broadcast: cost O(|Q| x |corpus|) FLOPs but zero shuffle of the
  corpus.
- lsh_bucketed_topk: the scale path — multi-table random-hyperplane
  LSH (sign-of-projection signatures; Charikar's SimHash family).
  TABLES independent hash tables of BITS seeded hyperplanes each: a
  query's candidates are the union of its TABLES buckets, recall grows
  with TABLES while bucket size shrinks 2^-BITS. Projections are
  integer dot products of the quantized vectors against integer
  hyperplanes -> signatures are bit-deterministic and the whole search
  is exactly SQL-expressible. An IVF variant is the same shape with
  k-means centroid assignment as the bucketer (ops/ivf.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QUANT = 1000

LSH_BITS = 3  # bits per hash table
LSH_TABLES = 4  # independent tables (12 hyperplanes total)

# Seeded random hyperplanes (numpy RandomState(20260816), ints in
# [-99, 99], dim 64): row t*LSH_BITS+j is bit j of table t. Integer
# components keep every projection exact.
HYPERPLANES: list[list[int]] = [
    [95, -4, 82, -22, 69, -81, 88, 87, 78, -52, 57, -34, -75, 77, 8, -8, 61, 7, 57, 70, -79, -99, 89, -12, 67, -60, -46, 5, -96, -13, -85, -3, -62, 12, -89, 91, 63, -50, 17, 75, 32, 78, 63, 28, 19, 82, 7, 13, -80, -4, -9, 80, 83, -98, 92, 8, 77, -58, 93, 97, -4, -85, -76, -42],
    [34, -43, 7, -85, 43, -34, -54, 99, 13, -62, -87, 35, 54, 72, 68, 33, 73, -12, 45, 65, 4, -78, 21, 96, -18, -64, -9, -64, 23, -31, 89, -77, 50, -26, 71, 7, 4, -64, 37, 62, -85, -98, -81, 85, -96, 45, 85, -77, 76, -53, 86, 77, -71, 32, 67, 89, 38, -55, 61, 11, 2, 60, -29, -73],
    [45, -54, 0, 49, 70, 10, -43, 58, -37, -8, 5, -87, -18, 62, 8, 97, -84, -94, -7, 37, 66, -59, -26, 64, -1, 9, 99, 31, -15, -40, -91, -27, -79, 17, 60, -74, 53, -9, 72, -84, -88, -31, -88, 50, 34, 27, -81, 48, -49, -2, -74, -15, -45, 44, -1, 87, -70, 93, -2, -65, 62, -76, 30, -83],
    [-5, 45, 16, 9, -63, 98, -26, -35, -9, 9, 85, -51, 41, 81, -65, 47, 38, -2, 11, -98, -96, -65, -85, -86, 71, -77, 2, -41, 70, 80, 45, -79, 32, 60, -93, 33, 71, 71, 68, 66, -81, 80, -35, -1, -66, -30, 94, 10, 88, 20, 40, -20, 1, 59, 31, -81, 32, -88, -25, -48, 94, 67, -85, -80],
    [-30, 36, -45, -37, -9, -16, -53, 65, -60, 74, -54, 42, 25, 83, -66, 53, -30, 41, -90, 24, -23, 35, -87, -70, 59, 82, 40, -30, -59, 9, 42, 86, -57, 27, 53, 34, 40, -98, 43, -86, 85, -75, -49, -55, 21, 10, 51, 96, -52, -80, 7, 12, 15, 65, 43, -40, -68, -9, -44, 58, -11, 94, -79, 96],
    [79, -83, 21, -16, -63, -72, 18, 68, -55, -90, -84, 28, -62, -88, 27, 89, -31, 52, -54, 39, 28, -81, -23, 6, -5, -25, -22, 24, 64, -33, -82, 40, 4, 35, 64, 92, -70, -11, -45, 12, 98, 76, 73, 68, -74, 99, -69, -16, 2, 8, -90, -54, 76, -36, -65, 1, -66, 15, -18, 69, 77, 30, -40, 82],
    [-69, -62, -69, 40, 86, 85, -29, -95, 77, -56, -4, -25, -81, -82, 97, 98, 84, 95, -41, 42, 14, -59, -11, -22, 93, -87, -80, 69, -57, 78, 9, -12, -27, 74, 46, -58, 66, -48, 50, -41, 36, -3, 65, 80, 38, 74, -62, -61, 39, -6, -24, 63, 90, -91, -42, -33, 64, -84, -17, -84, 10, -44, -69, -54],
    [-54, 19, -90, -21, -78, 51, -65, 97, 26, -53, 42, 23, -28, -96, -55, 74, 36, -43, 3, 11, 45, -48, 99, 54, 81, 94, -15, -50, -33, -37, -22, 49, -23, -21, 70, -21, -10, 17, -41, -91, 56, 72, -87, 16, 78, -27, -44, -95, -96, 63, 12, 47, -45, 97, 80, -35, 51, -40, -71, -66, -88, -97, 51, -20],
    [37, 30, -94, 28, 40, 42, 9, -49, 19, 75, 59, -84, -2, -22, -13, 81, -28, -67, -20, 9, 1, -52, -20, 17, 93, -32, -28, -78, 17, 19, -87, -29, 92, 46, 18, -10, -33, 1, -19, -42, -68, -91, 77, -87, -20, -40, 35, -81, -51, 76, -61, 5, 8, 15, 18, -64, 24, 6, 43, 80, 97, -13, -10, -26],
    [6, 22, 62, 11, 75, -74, 91, -31, -59, -36, -91, 30, -91, -95, -5, -95, 23, -44, -97, 62, 89, 58, -34, -64, 45, -99, 45, 49, -25, -41, -50, -31, -76, -20, -11, 2, -75, -33, 2, 85, 98, -56, 63, 87, 14, -80, 38, -4, -54, 90, -40, -89, 61, 86, 47, -40, -36, -95, -60, 31, 68, -39, -83, 43],
    [-65, -24, 82, 8, 78, -12, 43, -23, 72, -70, -1, -48, -12, -81, -20, 51, -66, -69, 84, 29, -19, 35, -38, -30, -13, -29, 42, 17, 40, -72, 88, 46, 14, 26, -16, -11, -6, -42, -11, 95, 35, 5, -36, -27, 8, -35, 29, -70, 70, 52, -28, -46, -17, -41, -56, -43, 73, 84, -60, -37, -21, 39, -27, 44],
    [-89, 28, -40, 29, 49, 31, 15, -61, -34, 17, -61, -64, -84, -24, 57, -97, 10, 74, 90, 58, 58, -90, 14, -88, 30, 21, 32, 97, 80, -46, 19, -33, -32, -57, -67, -27, 94, -10, -11, 63, 4, -56, 71, 78, -57, 48, 23, -73, 37, 67, 27, 69, -16, 9, -21, -29, -34, 14, 54, -18, -7, 24, 84, 36],
]


def _quantized(embeddings: DataFrame) -> DataFrame:
    return embeddings.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.round(x.cast("double") * QUANT).cast("long"),
        ).alias("qv"),
    )


def _qdot(a: str, b: str):
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def brute_force_topk(
    embeddings: DataFrame, query_mod: int = 97, k: int = 5
) -> DataFrame:
    """Queries = vec_id % query_mod == 0. Returns
    (query_id, neighbor_id, rank, qdot); self excluded."""
    q = _quantized(embeddings)
    queries = q.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qq")
    )
    corpus = q.select(F.col("vec_id").alias("neighbor_id"), F.col("qv").alias("qn"))
    scored = (
        corpus.join(F.broadcast(queries))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("qdot", _qdot("qq", "qn"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qdot").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "qdot")
    )


def make_hyperplanes(
    n_planes: int, dim: int = 64, seed: int = 20260816
) -> list[list[int]]:
    """Seeded integer hyperplanes for any (tables x bits) sizing — the
    generator behind the shipped HYPERPLANES literals. At corpus scale
    bits/table must grow ~log2(n) to keep bucket sizes (n / 2^bits)
    in the operator's design envelope; regenerate with a larger
    n_planes and pass through `planes=`."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.randint(-99, 100, size=(n_planes, dim)).tolist()


def _hyperplane_dot(col: str, plane: list[int]):
    lit = F.array(*[F.lit(v).cast("long") for v in plane])
    return F.aggregate(
        F.zip_with(F.col(col), lit, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def lsh_signature(
    col: str,
    table: int,
    bits: int = LSH_BITS,
    planes: list[list[int]] | None = None,
):
    """bits-wide sign signature of quantized vector `col` in hash table
    `table` — bit j set iff dot(v, plane[table*bits+j]) >= 0."""
    hp = planes if planes is not None else HYPERPLANES
    sig = F.lit(0)
    for j in range(bits):
        plane = hp[table * bits + j]
        sig = sig + F.when(
            _hyperplane_dot(col, plane) >= 0, F.lit(1 << j)
        ).otherwise(F.lit(0))
    return sig.cast("int")


def lsh_bucketed_topk(
    embeddings: DataFrame,
    query_mod: int = 97,
    k: int = 5,
    bits: int = LSH_BITS,
    tables: int = LSH_TABLES,
    planes: list[list[int]] | None = None,
) -> DataFrame:
    """Same contract as brute_force_topk but candidates restricted to
    the union of the query's LSH_TABLES hyperplane-signature buckets.
    At rest the corpus table is stored once per hash table, partitioned
    by (table, bucket) — a query probes TABLES partitions; here the
    per-table bucket column is computed inline. Scoring dedups
    (query, neighbor) pairs that collide in several tables first, so
    each candidate's dot product is computed once."""
    q = _quantized(embeddings)
    per_table = [
        q.select(
            "vec_id", "qv", F.lit(t).alias("tbl"),
            lsh_signature("qv", t, bits=bits, planes=planes).alias("bucket"),
        )
        for t in range(tables)
    ]
    buckets = per_table[0]
    for df in per_table[1:]:
        buckets = buckets.unionByName(df)
    queries = buckets.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"), "tbl", "bucket"
    )
    cand = (
        buckets.select(F.col("vec_id").alias("neighbor_id"), "tbl", "bucket")
        .join(F.broadcast(queries), ["tbl", "bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qvecs = q.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qq")
    )
    nvecs = q.select(F.col("vec_id").alias("neighbor_id"), F.col("qv").alias("qn"))
    scored = (
        cand.join(F.broadcast(qvecs), "query_id")
        .join(nvecs, "neighbor_id")
        .withColumn("qdot", _qdot("qq", "qn"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qdot").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "qdot")
    )
