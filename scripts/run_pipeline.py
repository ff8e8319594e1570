"""CLI pipeline runner (rdf2hdt analog, spark-submit friendly).

Local mode:
    python scripts/run_pipeline.py --input /path/pages_or_docs.parquet \
        --kind pages --warehouse /path/wh --cpus 8

Cluster mode (inherits the submit-time master/conf; package the lib
with --py-files):
    zip -r qendpoint_spark.zip qendpoint_spark
    spark-submit --py-files qendpoint_spark.zip \
        scripts/run_pipeline.py --master inherit --input ... --warehouse ...

Optional stages: --alias-dict <parquet> enables entity linking,
--sameas <parquet> enables canonicalization. Rerunning with the same
input resumes from the last completed stage (delete the warehouse or
pass --force for a fresh build).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from qendpoint_spark.catalog import Catalog  # noqa: E402
from qendpoint_spark.pipeline import run_pipeline  # noqa: E402
from qendpoint_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="pages/documents parquet path")
    ap.add_argument("--kind", choices=["pages", "documents"], default="pages")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--alias-dict", default=None)
    ap.add_argument("--sameas", default=None)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--master", default="local",
                    help="'local' (default) or 'inherit' for spark-submit")
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    if args.master == "inherit":
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.appName("qendpoint-pipeline").getOrCreate()
    else:
        spark = get_spark("qendpoint-pipeline", cores=args.cpus)
    src = spark.read.parquet(args.input)
    alias_df = spark.read.parquet(args.alias_dict) if args.alias_dict else None
    sameas_df = spark.read.parquet(args.sameas) if args.sameas else None
    t0 = time.time()
    report = run_pipeline(
        spark,
        Catalog(spark, args.warehouse),
        source_df=src,
        source_kind=args.kind,
        source_fingerprint=f"{args.input}:{src.count()}",
        num_partitions=args.partitions,
        alias_dict=alias_df,
        sameas=sameas_df,
        force=args.force,
    )
    print(
        json.dumps(
            {
                "wall_s": round(time.time() - t0, 2),
                "n_triples": report.n_triples,
                "stages": [
                    {"stage": s.name, "rows": s.rows, "wall_ms": s.wall_ms,
                     "resumed": s.resumed}
                    for s in report.stages
                ],
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
