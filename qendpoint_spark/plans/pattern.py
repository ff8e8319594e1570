"""Triple-pattern access-path selection over the sorted materializations.

The reference picks the best index order per pattern mask
(BitmapTriples.search, core/triples/impl/BitmapTriples.java:303-378;
order masks core/enums/TripleComponentOrder.java:41-61): bound-subject
patterns walk the SPO structure, ?PO/??O use the FOQ/OPS index, ?P?
the predicate index, and the rest fall back to a filtered sequential
scan. Here the "indexes" are the SPO- and OPS-sorted tables: choosing
a table + pushing the equality filters gives Parquet min/max row-group
pruning on the leading sort key — the same leading-component range
location rank/select provides in HDT (AdjacencyList.java), done by the
columnar reader instead.

This is the whole planner: ~15 lines, as SURVEY.md §4.1 predicted —
everything else (pushdown, pruning, codegen) is Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def choose_order(s: int | None, p: int | None, o: int | None) -> str:
    """Pattern mask -> table (sort order) choice."""
    if s is not None:
        return "spo"  # S??, SP?, SPO, S?O: leading subject prunes SPO
    if o is not None:
        return "ops"  # ?PO, ??O: leading object prunes OPS
    return "spo"  # ?P?, ???: sequential scan; predicate_index gives stats


def scan_pattern(
    spo: DataFrame,
    ops: DataFrame,
    s: int | None = None,
    p: int | None = None,
    o: int | None = None,
) -> DataFrame:
    """Return matching (s,p,o) rows using the best-sorted table."""
    order = choose_order(s, p, o)
    df = spo if order == "spo" else ops
    for col, val in (("s", s), ("p", p), ("o", o)):
        if val is not None:
            df = df.filter(F.col(col) == val)
    return df.select("s", "p", "o")
