"""Training-data-ops throughput bench (dedup ladder / ANN / text
analysis) at an expanded corpus — the ops twin of bench.py.

Documents are replicated with fresh doc_ids (vocabulary fixed, like a
larger crawl); embeddings replicate with fresh vec_ids and a
deterministic per-replica rotation so near-dup structure persists.

Prints ONE JSON line: {"metric": "ops_bench", "docs": N, "vecs": N,
"queries": {op: sec}, ...} and writes BENCH/ops_bench_latest.json.

Usage: [SPARK_GRAFT_CPUS] [SPARK_GRAFT_EXPAND] python scripts/ops_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from qendpoint_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    expand = int(os.environ.get("SPARK_GRAFT_EXPAND", "40"))
    scratch = os.environ.get(
        "SPARK_GRAFT_SCRATCH",
        "/dev/shm/qs_ops" if os.path.isdir("/dev/shm") else "",
    )
    extra = {"spark.local.dir": scratch} if scratch else {}
    spark = get_spark("qendpoint-ops-bench", cores=cpus, extra_conf=extra)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    if expand > 1:
        max_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
        reps = spark.range(expand).withColumnRenamed("id", "rep")
        docs = (
            docs.crossJoin(reps)
            .withColumn("doc_id", F.col("doc_id") + F.col("rep") * F.lit(max_doc))
            .drop("rep")
        )
        max_vec = emb.agg(F.max("vec_id")).collect()[0][0] + 1
        # rotate each replica's components (deterministic, norm-
        # preserving) so replicas are not bit-identical vectors — 40
        # exact copies of every vector would give every LSH bucket a
        # quadratic clique, which no real corpus has
        emb = (
            emb.crossJoin(reps)
            .withColumn(
                "embedding",
                F.expr(
                    "concat(slice(embedding, (rep % 64) + 1, 64 - (rep % 64)),"
                    " slice(embedding, 1, rep % 64))"
                ),
            )
            .withColumn("vec_id", F.col("vec_id") + F.col("rep") * F.lit(max_vec))
            .drop("rep")
        )
    docs = docs.repartition(cpus * 2).persist()
    emb = emb.repartition(cpus * 2).persist()
    n_docs, n_vecs = docs.count(), emb.count()

    from qendpoint_spark.ops.dedup import (
        embedding_dup_pairs_lsh,
        exact_dedup,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_table,
    )
    from qendpoint_spark.ops.ivf import ivf_topk_frozen
    from qendpoint_spark.ops.similarity import brute_force_topk, lsh_bucketed_topk
    from qendpoint_spark.ops.textstats import text_stats

    ops = {
        "dedup_exact": lambda: exact_dedup(docs),
        "dedup_minhash_lsh": lambda: minhash_lsh_pairs(docs, k=3),
        "dedup_ngram_jaccard": lambda: ngram_jaccard_pairs(docs, k=3, threshold=0.5, max_df=64),
        "dedup_simhash": lambda: simhash_table(docs),  # self-sized bits
        "text_stats": lambda: text_stats(docs),
        "sim_topk_bruteforce": lambda: brute_force_topk(emb, query_mod=997, k=5),
        "sim_topk_lsh": lambda: lsh_bucketed_topk(emb, query_mod=997, k=5),
        "sim_topk_ivf": lambda: ivf_topk_frozen(emb, query_mod=997, k=5, nprobe=2),
        # near-dup at FULL corpus with the self-sizing signature
        # (bits = log2(n) - 8, applied by default) vs the old fixed
        # 3-bit signature on a 1/8 subsample: the auto row is the
        # measurement that the scale dial works at corpus size.
        "dedup_embedding_lsh_auto": lambda: embedding_dup_pairs_lsh(
            emb, min_cos=0.5
        ),
        "dedup_embedding_lsh_sub8_fixed3": lambda: embedding_dup_pairs_lsh(
            emb.filter(F.col("vec_id") % 8 == 0), min_cos=0.5, bits=3, tables=4
        ),
    }
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    t_all = time.time()
    for name, fn in ops.items():
        t0 = time.time()
        rows[name] = fn().count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]}s rows={rows[name]}",
              file=sys.stderr, flush=True)
    out = {
        "metric": "ops_bench",
        "value": round(time.time() - t_all, 3),
        "unit": "sec",
        "queries": timings,
        "rows": rows,
        "docs": n_docs,
        "vecs": n_vecs,
        "cpus": cpus,
        "expand": expand,
        "docs_per_sec_dedup_ladder": round(
            n_docs
            / max(
                sum(timings.get(k, 0.0) for k in
                    ("dedup_exact", "dedup_minhash_lsh", "dedup_simhash")),
                1e-9,
            ),
            1,
        ),
    }
    os.makedirs(os.path.join(os.path.dirname(__file__), "..", "BENCH"), exist_ok=True)
    with open(
        os.path.join(os.path.dirname(__file__), "..", "BENCH", "ops_bench_latest.json"),
        "w",
    ) as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
