"""Benchmark harness: end-to-end KG-construction throughput.

Runs the full pipeline (extract -> dictionary -> encode/SPO -> OPS ->
stats) on the documents table at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) under local[$SPARK_GRAFT_CPUS], fresh (no
resume), writing real parquet materializations to a temp warehouse.

$SPARK_GRAFT_EXPAND (default 40) replicates the corpus with fresh
doc_ids so the bench exercises realistic data volume: the entity/term
space stays fixed while the document space grows — the same skew
profile a larger crawl has.

Prints ONE JSON line:
  {"metric": "kg_pipeline_e2e", "value": <total_sec>, "unit": "sec",
   "queries": {<stage>: sec, ...}, "sf": <sf>,
   "triples": N, "triples_per_sec": N, "cpus": N, "expand": N}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from qendpoint_spark.catalog import Catalog  # noqa: E402
from qendpoint_spark.pipeline import run_pipeline  # noqa: E402
from qendpoint_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    expand = int(os.environ.get("SPARK_GRAFT_EXPAND", "40"))
    sf = sf_dir.rstrip("/").split("/")[-1].replace("sf", "")

    # fast substrate (tmpfs) by default when available: the sandbox's
    # shared /dev/vda disk otherwise caps and noises every run; on a
    # real cluster this role is played by node-local SSD shuffle dirs
    default_scratch = "/dev/shm/qs_bench" if os.path.isdir("/dev/shm") else ""
    scratch = os.environ.get("SPARK_GRAFT_SCRATCH", default_scratch)
    if scratch:
        os.makedirs(scratch, exist_ok=True)
    extra = {"spark.local.dir": scratch} if scratch else {}
    codec = os.environ.get("SPARK_GRAFT_PARQUET_CODEC")
    if codec:
        extra["spark.sql.parquet.compression.codec"] = codec
    spark = get_spark("qendpoint-bench", cores=cpus, extra_conf=extra)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if expand > 1:
        max_id = docs.agg(F.max("doc_id")).collect()[0][0] + 1
        reps = spark.range(expand).withColumnRenamed("id", "rep")
        docs = (
            docs.crossJoin(reps)
            .withColumn("doc_id", F.col("doc_id") + F.col("rep") * F.lit(max_id))
            .drop("rep")
        )
    docs = docs.repartition(cpus * 2).persist()
    n_docs = docs.count()  # materialize input outside the timed region

    warehouse = tempfile.mkdtemp(prefix="qs_bench_", dir=scratch or None)
    try:
        t0 = time.time()
        catalog = Catalog(spark, warehouse)
        report = run_pipeline(
            spark,
            catalog,
            source_df=docs,
            source_kind="documents",
            source_fingerprint=f"bench:{sf_dir}:{expand}",
            num_partitions=cpus * 2,
            force=True,
        )
        total = time.time() - t0
        queries = {s.name: round(s.wall_ms / 1000.0, 3) for s in report.stages}
        out = {
            "metric": "kg_pipeline_e2e",
            "value": round(total, 3),
            "unit": "sec",
            "queries": queries,
            "sf": sf,
            "docs": n_docs,
            "triples": report.n_triples,
            "triples_per_sec": round(report.n_triples / total, 1),
            "cpus": cpus,
            "expand": expand,
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(warehouse, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
