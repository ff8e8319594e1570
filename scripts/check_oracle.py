"""Local emulation of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its
oracle_sql() twin on DuckDB over the same parquet dir, then compares
row count, schema width, and an order-insensitive value multiset
(columns sorted by name, every value stringified). Usage:

    python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from collections import Counter
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry_mod  # noqa: E402
from qendpoint_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return Counter(tuple(norm(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check", cores=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failed = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"{name:28s} rows={len(srows):8d}  (rows-only, no oracle)  {t_spark:5.1f}s")
            continue
        t0 = time.time()
        cur = con.execute(oracles[name])
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
        t_duck = time.time() - t0
        ok_cols = sorted(scols) == sorted(ocols)
        ok_count = len(srows) == len(orows)
        ok_vals = ok_cols and multiset(srows, scols) == multiset(orows, ocols)
        # Type-coherence probe: the driver's value hash is type-sensitive,
        # so a Spark bigint meeting a DuckDB DECIMAL/HUGEINT (or a naive
        # vs tz-aware timestamp) can hash-mismatch even when the loose
        # multiset above agrees.  Surface Python-type pairs that differ.
        type_warn = []
        if ok_cols and srows and orows:
            sidx = {c: i for i, c in enumerate(scols)}
            oidx = {c: i for i, c in enumerate(ocols)}
            srow, orow = srows[0], orows[0]
            for c in scols:
                st = type(srow[sidx[c]]).__name__
                ot = type(orow[oidx[c]]).__name__
                if st != ot and {st, ot} != {"NoneType", st} | {"NoneType", ot}:
                    if "NoneType" in (st, ot):
                        continue
                    type_warn.append(f"{c}:{st}/{ot}")
        status = "OK " if (ok_cols and ok_count and ok_vals) else "FAIL"
        print(
            f"{name:28s} {status} rows={len(srows):8d}/{len(orows):8d} "
            f"cols={ok_cols} vals={ok_vals}  spark={t_spark:5.1f}s duck={t_duck:4.1f}s"
            + (f"  TYPES[{' '.join(type_warn)}]" if type_warn else "")
        )
        if status == "FAIL":
            failed.append(name)
            if not ok_cols:
                print(f"   spark cols: {scols}\n   duck  cols: {ocols}")
            elif not ok_vals:
                sm, om = multiset(srows, scols), multiset(orows, ocols)
                extra = list((sm - om).items())[:3]
                missing = list((om - sm).items())[:3]
                print(f"   spark-only: {extra}\n   oracle-only: {missing}")
    print("FAILED:", failed if failed else "none")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
