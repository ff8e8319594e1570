"""Instrumented companion to bench.py (guide §1: measure first).

Times the SAME pipeline as bench.py but with phase-level breakdown:
plan-construction side effects (eager localCheckpoint in extraction,
zip_with_rank materialization + section-count collect in the
dictionary build) are timed separately from each write_stage, and the
catalog's driver-side parquet-footer loop is accounted per stage.

bench.py is FROZEN for measurement; this file exists so optimization
work can attribute the gap between sum(stage walls) and total wall.
Prints one JSON line with the breakdown.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import qendpoint_spark.catalog as cat_mod  # noqa: E402
from qendpoint_spark.catalog import Catalog  # noqa: E402
from qendpoint_spark.dictionary import build_dictionary  # noqa: E402
from qendpoint_spark.encoding import (  # noqa: E402
    build_header,
    encode_triples,
    object_index,
    ops_table,
    predicate_index,
    spo_table,
    with_datatype,
)
from qendpoint_spark.extraction import extract_triples_from_documents  # noqa: E402
from qendpoint_spark.session import get_spark  # noqa: E402

FOOTER_TIME = {"s": 0.0, "n": 0}
_orig_read_metadata = cat_mod.pq.read_metadata


def _timed_read_metadata(*a, **kw):
    t0 = time.monotonic()
    out = _orig_read_metadata(*a, **kw)
    FOOTER_TIME["s"] += time.monotonic() - t0
    FOOTER_TIME["n"] += 1
    return out


cat_mod.pq.read_metadata = _timed_read_metadata


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    expand = int(os.environ.get("SPARK_GRAFT_EXPAND", "40"))
    default_scratch = "/dev/shm/qs_bench" if os.path.isdir("/dev/shm") else ""
    scratch = os.environ.get("SPARK_GRAFT_SCRATCH", default_scratch)
    if scratch:
        os.makedirs(scratch, exist_ok=True)
    extra = {"spark.local.dir": scratch} if scratch else {}
    spark = get_spark("qendpoint-bench-extra", cores=cpus, extra_conf=extra)
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
    docs.count()

    warehouse = tempfile.mkdtemp(prefix="qs_benchx_", dir=scratch or None)
    phases: dict[str, float] = {}
    sc = spark.sparkContext

    def mark(name: str, t0: float) -> float:
        t1 = time.monotonic()
        phases[name] = round(t1 - t0, 3)
        return t1

    try:
        catalog = Catalog(spark, warehouse)
        t_total0 = time.monotonic()

        sc.setJobDescription("extract: plan construction (incl. checkpoint)")
        t = time.monotonic()
        tri_plan = extract_triples_from_documents(docs)
        t = mark("extract_plan", t)
        sc.setJobDescription("extract: write triples_str")
        catalog.write_stage("triples_str", tri_plan, "x", force=True)
        t = mark("write_triples_str", t)
        triples_str = catalog.read("triples_str")

        sc.setJobDescription("dict: build (rank materialize + counts)")
        dict_plan = build_dictionary(triples_str, num_partitions=cpus * 2,
                                     eager=False)
        t = mark("build_dict", t)
        sc.setJobDescription("dict: write dict_terms")
        catalog.write_stage(
            "dict_terms", with_datatype(dict_plan), "x", force=True,
            partition_by=["section", "datatype"],
        )
        dict_plan._zwr_release()
        t = mark("write_dict_terms", t)
        dict_terms = catalog.read("dict_terms")

        sc.setJobDescription("encode: plan")
        enc = encode_triples(triples_str, dict_terms, assume_distinct=True)
        enc = enc.persist()
        spo_plan = spo_table(enc, num_partitions=cpus * 2)
        t = mark("encode_plan", t)
        sc.setJobDescription("encode: write triples_spo")
        res_spo = catalog.write_stage("triples_spo", spo_plan, "x",
                                      sort_cols=["s", "p", "o"], force=True)
        enc.unpersist()
        t = mark("write_triples_spo", t)
        triples_spo = catalog.read("triples_spo").persist()

        sc.setJobDescription("ops: write triples_ops")
        catalog.write_stage("triples_ops",
                            ops_table(triples_spo, num_partitions=cpus * 2),
                            "x", sort_cols=["o", "p", "s"], force=True)
        t = mark("write_triples_ops", t)

        sc.setJobDescription("stats: predicate_index")
        catalog.write_stage("predicate_index", predicate_index(triples_spo),
                            "x", force=True)
        t = mark("write_predicate_index", t)
        sc.setJobDescription("stats: object_index")
        catalog.write_stage("object_index", object_index(triples_spo),
                            "x", force=True)
        t = mark("write_object_index", t)
        sc.setJobDescription("stats: header")
        catalog.write_stage(
            "header",
            build_header(triples_str, catalog.read("dict_terms"), triples_spo,
                         n_triples=res_spo.rows),
            "x", force=True)
        t = mark("write_header", t)
        triples_spo.unpersist()

        total = time.monotonic() - t_total0
        out = {
            "metric": "kg_pipeline_e2e_breakdown",
            "value": round(total, 3),
            "phases": phases,
            "phase_sum": round(sum(phases.values()), 3),
            "footer_s": round(FOOTER_TIME["s"], 3),
            "footer_n": FOOTER_TIME["n"],
            "cpus": cpus,
            "expand": expand,
        }
        print(json.dumps(out))
    finally:
        import shutil

        shutil.rmtree(warehouse, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
