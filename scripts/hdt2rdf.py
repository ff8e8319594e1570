"""hdt2rdf analog: published warehouse -> N-Triples text.

Reference: qendpoint-cli/bin/hdt2rdf.sh (decode every triple of an
.hdt to RDF text). Here: decode_triples (ID -> term joins) ->
export_ntriples (escaped .nt lines) -> distributed text write
(one part file per partition; pass --single to coalesce).

Usage:
    python scripts/hdt2rdf.py --warehouse /path/wh --output /path/out_nt
        [--cpus N] [--single] [--codec gzip]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from qendpoint_spark.catalog import Catalog  # noqa: E402
from qendpoint_spark.encoding import decode_triples  # noqa: E402
from qendpoint_spark.encoding.header import export_ntriples  # noqa: E402
from qendpoint_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--warehouse")
    src.add_argument(
        "--hdt-file", help="decode a binary .hdt container directly"
    )
    ap.add_argument("--output", required=True)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--single", action="store_true")
    ap.add_argument("--codec", default=None)
    args = ap.parse_args()

    spark = get_spark("hdt2rdf", cores=args.cpus)
    if args.hdt_file:
        from qendpoint_spark.hdt import hdt_to_dataframes

        dict_terms, enc = hdt_to_dataframes(spark, args.hdt_file)
    else:
        catalog = Catalog(spark, args.warehouse)
        dict_terms = catalog.read("dict_terms")
        enc = catalog.read("triples_spo")
    lines = export_ntriples(decode_triples(enc, dict_terms))
    if args.single:
        lines = lines.coalesce(1)
    w = lines.write.mode("overwrite")
    if args.codec:
        w = w.option("compression", args.codec)
    w.text(args.output)
    print(f"wrote {args.output}")
    spark.stop()


if __name__ == "__main__":
    main()
