"""Candidate-set growth probe for the self-sizing dedup dials.

Evidence target: with the dials wired to corpus size
(`ops/dedup.py: sized_num_hashes / sized_simhash_bits`), LSH candidate
pairs grow ~LINEARLY in |docs| at a fixed duplication rate — the
property that keeps the candidate shuffle feasible at 100 TB. A probe
that merely replicated documents would measure quadratic TRUE-pair
growth (every replica pairs with every other), so the corpus here
scales the number of UNIQUE documents instead:

  - `expand` copies of the base corpus, where copy r rewrites every
    odd-position token to `tok_r{r}` — every 3-token shingle contains
    at least one rewritten token, so cross-copy shingle Jaccard is ~0
    and copies are genuinely distinct documents;
  - each expanded document gets ONE injected near-duplicate (last
    token dropped), the same construction as the dedup_lsh_quality
    gate row — so the true-pair count is ~|docs| by design.

Reported: candidate counts and candidates-per-document at two
expansions, plus the growth ratio normalized by corpus growth
(1.0 = perfectly linear). Writes BENCH/dedup_scale_probe.json.

Usage: python scripts/dedup_scale_probe.py [sf_dir] [expandA] [expandB]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from qendpoint_spark.ops.dedup import (  # noqa: E402
    minhash_lsh_pairs,
    simhash_table,
    sized_num_hashes,
)
from qendpoint_spark.session import get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_corpus(docs, expand: int):
    """expand x unique docs (odd-position tokens salted per copy) plus
    one injected near-dup per doc."""
    reps = docs.sparkSession.range(expand).withColumnRenamed("id", "rep")
    max_id = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    uniq = (
        docs.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * F.lit(max_id))
        .withColumn(
            "text",
            F.expr(
                "array_join(transform(split(coalesce(text,''), ' '), "
                "(t, i) -> CASE WHEN i % 2 = 1 "
                "THEN concat(t, '_r', rep) ELSE t END), ' ')"
            ),
        )
        .drop("rep")
    )
    mutants = uniq.select(
        (F.col("doc_id") + F.lit(expand * max_id)).alias("doc_id"),
        F.regexp_replace(F.col("text"), " [^ ]+$", "").alias("text"),
    )
    return uniq.unionByName(mutants)


def probe(spark, sf_dir: str, expand: int) -> dict:
    docs = build_corpus(
        spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        ),
        expand,
    ).cache()
    n_docs = docs.count()
    t0 = time.time()
    mh = minhash_lsh_pairs(docs, k=3).count()  # self-sized hash count
    t_mh = time.time() - t0
    t0 = time.time()
    sh = (
        simhash_table(docs)  # self-sized width
        .groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.expr("n * (n - 1) / 2")).alias("pairs"))
        .collect()[0]["pairs"]
    )
    t_sh = time.time() - t0
    docs.unpersist()
    return {
        "expand": expand,
        "n_docs": n_docs,
        "num_hashes_sized": sized_num_hashes(n_docs),
        "minhash_lsh_pairs": mh,
        "minhash_pairs_per_doc": round(mh / n_docs, 3),
        "simhash_block_pairs": int(sh or 0),
        "simhash_pairs_per_doc": round((sh or 0) / n_docs, 3),
        "sec": {"minhash": round(t_mh, 1), "simhash": round(t_sh, 1)},
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    ea = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    eb = int(sys.argv[3]) if len(sys.argv) > 3 else 160
    spark = get_spark("dedup-scale-probe", cores=8)
    a = probe(spark, sf_dir, ea)
    b = probe(spark, sf_dir, eb)
    growth = (
        b["minhash_lsh_pairs"] / max(a["minhash_lsh_pairs"], 1)
    ) / (b["n_docs"] / a["n_docs"])
    corpus_growth = b["n_docs"] / a["n_docs"]
    out = {
        "sf_dir": sf_dir,
        "small": a,
        "big": b,
        # 1.0 = perfectly linear candidate growth; >> 1 = superlinear
        "minhash_candidate_growth_vs_linear": round(growth, 3),
        # wall-time growth normalized the same way (the round-4 anomaly
        # was 8.0 here for minhash; gate target <= 2.0)
        "minhash_wall_growth_vs_linear": round(
            (b["sec"]["minhash"] / max(a["sec"]["minhash"], 0.1))
            / corpus_growth,
            3,
        ),
        "simhash_wall_growth_vs_linear": round(
            (b["sec"]["simhash"] / max(a["sec"]["simhash"], 0.1))
            / corpus_growth,
            3,
        ),
    }
    fname = sys.argv[4] if len(sys.argv) > 4 else "dedup_scale_probe.json"
    path = os.path.join(REPO, "BENCH", fname)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
