"""hdtCat / hdtDiff analog: k-way warehouse merge, or diff, into a new
warehouse.

Reference: qendpoint-cli/bin/hdtCat.sh / hdtDiffCat.sh (KCatImpl /
HDTDiff over .hdt files). Here: merge_datasets joins each input's INT
triples through its (space, old_id -> new_id) remap — no triple string
ever decodes or shuffles (merge/kcat.py) — then publishes the merged
dictionary (MSD layout) + SPO/OPS tables like the main pipeline.

Inputs and --output may each be a warehouse dir OR a binary .hdt
file (mix freely): `hdtcat.py --output merged.hdt a.hdt b.hdt` is the
reference CLI's exact shape.

Usage:
    python scripts/hdtcat.py --output /path/out_wh WH1 WH2 [WH3 ...]
    python scripts/hdtcat.py --diff --output /path/out_wh WH_BASE WH_DEL
        (--diff subtracts WH_DEL's statements from WH_BASE)
    [--cpus N] [--partitions N]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from qendpoint_spark.catalog import Catalog  # noqa: E402
from qendpoint_spark.encoding import ops_table, spo_table  # noqa: E402
from qendpoint_spark.encoding.header import with_datatype  # noqa: E402
from qendpoint_spark.merge import diff_datasets, merge_datasets  # noqa: E402
from qendpoint_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("inputs", nargs="+")
    ap.add_argument("--output", required=True)
    ap.add_argument("--diff", action="store_true")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--partitions", type=int, default=None)
    args = ap.parse_args()
    if args.diff and len(args.inputs) != 2:
        ap.error("--diff takes exactly two warehouses: BASE DEL")
    if len(args.inputs) < 2:
        ap.error("need at least two input warehouses")

    spark = get_spark("hdtcat", cores=args.cpus)

    def load(path: str):
        """(triples_spo, dict_terms) from a warehouse dir OR a binary
        .hdt file — the reference's hdtCat operates on .hdt files."""
        if path.endswith(".hdt"):
            from qendpoint_spark.hdt import hdt_to_dataframes

            d, enc = hdt_to_dataframes(spark, path)
            return enc, d
        c = Catalog(spark, path)
        return c.read("triples_spo"), c.read("dict_terms")

    pairs = [load(p) for p in args.inputs]
    if args.diff:
        from qendpoint_spark.encoding import decode_triples

        base, delete = (decode_triples(enc, d) for enc, d in pairs)
        md, mt = diff_datasets(base, delete, num_partitions=args.partitions)
    else:
        inputs = [(enc, d) for enc, d in pairs]
        md, mt, _ = merge_datasets(inputs, num_partitions=args.partitions)

    if args.output.endswith(".hdt"):
        from qendpoint_spark.hdt import write_hdt

        sizes = write_hdt(md, mt, args.output)
        print(
            f"{'diff' if args.diff else 'cat'} -> {args.output}: "
            f"{sizes['num_triples']:,} triples, {sizes['total']:,} bytes"
        )
        spark.stop()
        return

    out = Catalog(spark, args.output)
    fp = ("diff:" if args.diff else "cat:") + "|".join(args.inputs)
    out.write_stage(
        "dict_terms", with_datatype(md), fp,
        partition_by=["section", "datatype"], force=True,
    )
    res = out.write_stage(
        "triples_spo", spo_table(mt, num_partitions=args.partitions), fp,
        sort_cols=["s", "p", "o"], force=True,
    )
    out.write_stage(
        "triples_ops",
        ops_table(out.read("triples_spo"), num_partitions=args.partitions),
        fp, sort_cols=["o", "p", "s"], force=True,
    )
    print(f"{'diff' if args.diff else 'cat'} -> {args.output}: "
          f"{res.rows:,} triples")
    spark.stop()


if __name__ == "__main__":
    main()
