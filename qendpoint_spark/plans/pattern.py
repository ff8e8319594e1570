"""Triple-pattern access-path selection over the sorted materializations.

The reference picks the best index order per pattern mask
(BitmapTriples.search, core/triples/impl/BitmapTriples.java:303-378;
order masks core/enums/TripleComponentOrder.java:41-61): bound-subject
patterns walk the SPO structure, ?PO/??O use the FOQ/OPS index, ?P?
the predicate index (PredicateIndexArray.java:72-150). Here the
"indexes" are the SPO-, OPS- and PSO-sorted tables: choosing a table +
pushing the equality filters gives Parquet min/max row-group pruning
on the leading sort key — the same leading-component range location
rank/select provides in HDT (AdjacencyList.java), done by the columnar
reader instead.

This is the whole planner: ~20 lines, as SURVEY.md §4.1 predicted —
everything else (pushdown, pruning, codegen) is Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def choose_order(s: int | None, p: int | None, o: int | None) -> str:
    """Pattern mask -> table (sort order) choice: route to the table
    whose LEADING sort key is bound, so the pushed filter prunes."""
    if s is not None:
        return "spo"  # S??, SP?, SPO, S?O: leading subject prunes SPO
    if o is not None:
        return "ops"  # ?PO, ??O: leading object prunes OPS
    if p is not None:
        return "pso"  # ?P?: leading predicate prunes PSO
    return "spo"  # ???: sequential scan; predicate_index gives stats


def scan_pattern(
    spo: DataFrame,
    ops: DataFrame,
    s: int | None = None,
    p: int | None = None,
    o: int | None = None,
    pso: DataFrame | None = None,
) -> DataFrame:
    """Return matching (s,p,o) rows using the best-sorted table.
    Without a PSO materialization, ?P? degrades to a filtered SPO scan
    (correct, unpruned — the reference has the same fallback when an
    alternate-order index was not generated)."""
    order = choose_order(s, p, o)
    if order == "pso" and pso is None:
        order = "spo"
    df = {"spo": spo, "ops": ops, "pso": pso}[order]
    for col, val in (("s", s), ("p", p), ("o", o)):
        if val is not None:
            df = df.filter(F.col(col) == val)
    return df.select("s", "p", "o")
