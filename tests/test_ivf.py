"""IVF ANN: clustering sanity + recall vs the exact baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from qendpoint_spark.ops.ivf import assign_to_centroids, ivf_topk, kmeans_centroids


def test_kmeans_deterministic_and_total(spark, embeddings):
    c1 = kmeans_centroids(embeddings, k=8, iterations=2)
    c2 = kmeans_centroids(embeddings, k=8, iterations=2)
    assert c1.count() == 8 == c2.count()
    a = {r.cid: tuple(r.cvec) for r in c1.collect()}
    b = {r.cid: tuple(r.cvec) for r in c2.collect()}
    assert set(a) == set(b) == set(range(8))
    vecs = embeddings.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    assigned = assign_to_centroids(vecs, c1)
    assert assigned.count() == embeddings.count()  # total assignment


def test_ivf_recall_vs_exact(spark, embeddings):
    """nprobe=2 of 8 lists must recover a decent share of the true
    top-5 (random 64-d embeddings cluster weakly, so the bar is
    modest — the point is the plumbing, pruning, and ranking)."""
    ivf = ivf_topk(embeddings, query_mod=97, k=5, n_centroids=8, nprobe=2)
    got = {(r.query_id, r.neighbor_id) for r in ivf.collect()}
    assert got, "ivf returned no results"
    # exact top-5 by L2 (same metric as ivf)
    vecs = embeddings.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    ).cache()
    q = vecs.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    d2 = F.aggregate(
        F.zip_with(F.col("qv"), F.col("v"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("d2").asc(), F.col("vec_id").asc())
    exact = (
        vecs.crossJoin(q)
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("d2", d2)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
    )
    truth = {(r.query_id, r.vec_id) for r in exact.collect()}
    recall = len(got & truth) / len(truth)
    assert recall >= 0.2, recall
    # every ivf list is correctly ranked
    per_q = {}
    for r in ivf.collect():
        per_q.setdefault(r.query_id, []).append((r.rank, r.d2))
    for q_, rs in per_q.items():
        rs.sort()
        assert [x[0] for x in rs] == list(range(1, len(rs) + 1))
        assert [x[1] for x in rs] == sorted(x[1] for x in rs)


def test_ivf_frozen_lists_partitioned_by_cid(spark, embeddings):
    """The frozen-serving path must co-locate inverted lists by
    centroid id (at rest: a cid-partitioned table; in-plan: a
    hashpartitioning(cid) exchange feeding the probe join)."""
    from qendpoint_spark.ops.ivf import ivf_topk_frozen

    out = ivf_topk_frozen(embeddings, query_mod=11, k=3, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(cid" in plan
    rows = out.collect()
    assert rows and all(1 <= r["rank"] <= 3 for r in rows)
