"""Formatted-plan audit of the round-5 SPARQL features.

Round 5 compiled full group bodies (property paths, OPTIONAL, nested
groups) inside GRAPH through a graph-scoped engine, plus projection
expressions and HAVING over direct aggregates. This audit compiles one
query per feature and asserts the 100-TB plan properties:

- no CartesianProduct / BroadcastNestedLoopJoin,
- no BatchEvalPython (bindings stay ID-space, JVM-side),
- P/G decode joins broadcast.

Usage: python scripts/plan_audit_r5.py [sf_dir] [> BENCH/plans_r5_features.txt]
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from qendpoint_spark.session import get_spark  # noqa: E402

P = "http://example.org/prop/"

QUERIES = {
    "graph_optional": f"""
        SELECT ?g ?d ?src WHERE {{
          GRAPH ?g {{ ?d <{P}source> ?s .
                      OPTIONAL {{ ?d <{P}lang> ?src }} }}
        }} LIMIT 5
    """,
    "graph_path_seq": f"""
        SELECT ?g ?a ?c WHERE {{
          GRAPH ?g {{ ?a <{P}mentions>/<{P}sameas> ?c }}
        }} LIMIT 5
    """,
    "graph_nested_group": f"""
        SELECT ?g ?d WHERE {{
          GRAPH ?g {{ {{ ?d <{P}source> ?s }} UNION {{ ?d <{P}lang> ?l }} }}
        }} LIMIT 5
    """,
    "graph_path_closure": f"""
        SELECT ?g ?a ?b WHERE {{
          GRAPH ?g {{ ?a <{P}sameas>+ ?b }}
        }} LIMIT 5
    """,
    "projection_expr": f"""
        SELECT ?lang ((COUNT(?d) * 2) AS ?dbl) (CONCAT("L:", ?lang) AS ?tag)
        WHERE {{ ?d <{P}lang> ?lang }} GROUP BY ?lang
    """,
    "having_direct": f"""
        SELECT ?lang WHERE {{ ?d <{P}lang> ?lang }}
        GROUP BY ?lang HAVING (COUNT(?d) > 3)
    """,
    # mixed-role path alternative: per-branch pattern compiles, union
    # reconciled by decoding conflicting endpoint spaces to terms —
    # decode joins must stay hash/broadcast joins
    "path_mixed_alt": f"""
        SELECT ?a ?b WHERE {{ ?a (<{P}lang>|^<{P}lang>) ?b }} LIMIT 5
    """,
    # mixed negated property set (§9.1 decomposition)
    "nps_mixed": f"""
        SELECT ?a ?b WHERE {{ ?a !(<{P}lang>|^<{P}source>) ?b }} LIMIT 5
    """,
    # closure over a mixed-role edge set: exact term-space closure —
    # string equi-joins, still no nested loop / python eval
    "path_mixed_closure": f"""
        SELECT ?a ?b WHERE {{ ?a (<{P}lang>|^<{P}lang>)+ ?b }} LIMIT 5
    """,
}

BAD = ("CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython")


def formatted(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-audit-r5", cores=8)
    import qendpoint_spark.sparql_queries as sq

    eng = sq._quad_engine(spark, sf_dir)
    failures: list[str] = []
    for name, text in QUERIES.items():
        df = eng.query(text)
        plan = formatted(df)
        hits = [b for b in BAD if b in plan]
        status = "OK" if not hits else f"BAD: {hits}"
        print(f"==== {name} [{status}] ====")
        print(plan)
        if hits:
            failures.append(f"{name}: {hits}")
    if failures:
        print("FAILED:", failures)
        sys.exit(1)
    print("ALL PLANS CLEAN (no cartesian / nested-loop / python-eval)")


if __name__ == "__main__":
    main()
