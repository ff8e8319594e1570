"""Approximate-nearest-neighbor search over the `embeddings` table.

- brute_force_topk: the exactness baseline — query set x corpus with a
  quantized integer dot product (fixed-point round(x*1000)) so ranking
  is bit-deterministic across engines; ties break on neighbor id. At
  scale the corpus side stays partitioned and the (small) query set is
  broadcast: cost O(|Q| x |corpus|) FLOPs but zero shuffle of the
  corpus.
- lsh_bucketed_topk: the scale path — sign-of-projection buckets
  (here the first two axes as hyperplanes; production would use seeded
  random hyperplanes, same plumbing) shrink each query's candidate set
  to one bucket; recall < 1 by design, cost O(|Q| x |bucket|).
  An IVF variant is the same shape with k-means centroid assignment as
  the bucketer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QUANT = 1000


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


def bucket_of(col):
    """2-bit sign bucket over the first two components."""
    return (
        F.when(F.element_at(col, 1) >= 0, F.lit(2)).otherwise(F.lit(0))
        + F.when(F.element_at(col, 2) >= 0, F.lit(1)).otherwise(F.lit(0))
    ).cast("int")


def lsh_bucketed_topk(
    embeddings: DataFrame, query_mod: int = 97, k: int = 5
) -> DataFrame:
    """Same contract as brute_force_topk but candidates restricted to
    the query's sign bucket (plus the bucket id in the output)."""
    q = _quantized(embeddings).withColumn("bucket", bucket_of(F.col("qv")))
    queries = q.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qq"), "bucket"
    )
    corpus = q.select(
        F.col("vec_id").alias("neighbor_id"), F.col("qv").alias("qn"), "bucket"
    )
    scored = (
        corpus.join(F.broadcast(queries), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("qdot", _qdot("qq", "qn"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qdot").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "bucket", "neighbor_id", "rank", "qdot")
    )
