"""SPARQL CLI over a published warehouse — the reference's `hdtsparql`
(qendpoint-cli/bin/hdtsparql.sh: run one SPARQL query against an .hdt
file and print bindings).

Usage:
    python scripts/sparql.py <warehouse_dir | file.hdt> <query | @query_file | ->
        [--show N]

The query may be given inline, as @path to a .rq file, or `-` for
stdin. SELECT/CONSTRUCT results print as TSV (header first); ASK
prints true/false.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from qendpoint_spark.catalog import Catalog  # noqa: E402
from qendpoint_spark.session import get_spark  # noqa: E402
from qendpoint_spark.sparql import SparqlEngine  # noqa: E402


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    warehouse, qarg = sys.argv[1], sys.argv[2]
    show = 0
    if "--show" in sys.argv:
        show = int(sys.argv[sys.argv.index("--show") + 1])
    if qarg == "-":
        text = sys.stdin.read()
    elif qarg.startswith("@"):
        text = Path(qarg[1:]).read_text()
    else:
        text = qarg

    spark = get_spark("qendpoint-sparql")
    if warehouse.endswith(".hdt"):
        # query a binary .hdt container directly (hdtsparql.sh parity:
        # the reference runs SPARQL straight off the file)
        from qendpoint_spark.hdt import hdt_to_dataframes

        dict_terms, enc = hdt_to_dataframes(spark, warehouse)
        engine = SparqlEngine(enc.cache(), dict_terms.cache())
        df = engine.query(text)
        rows = df.take(show) if show else df.collect()
        print("\t".join(df.columns))
        for r in rows:
            print("\t".join("" if v is None else str(v) for v in r))
        spark.stop()
        return
    catalog = Catalog(spark, warehouse)
    # update scripts (INSERT/DELETE after the prologue) mutate the
    # warehouse — the /api/endpoint/update analog
    import re

    body = re.sub(r"(?:PREFIX\s+\S+\s+<[^>]*>\s*|BASE\s+<[^>]*>\s*)", "",
                  text, flags=re.I).lstrip()
    if re.match(r"(?i)(INSERT|DELETE)\b", body):
        from qendpoint_spark.sparql import apply_update

        report = apply_update(spark, catalog, text)
        print(f"update applied: {report.n_triples or ''} triples published")
        spark.stop()
        return
    engine = SparqlEngine.from_catalog(catalog)
    df = engine.query(text)
    rows = df.take(show) if show else df.collect()
    print("\t".join(df.columns))
    for r in rows:
        print("\t".join("" if v is None else str(v) for v in r))
    if show:
        print(f"# showing up to {show} rows", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
