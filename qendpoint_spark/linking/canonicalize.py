"""IRI canonicalization via large-star/small-star connected components.

Collapses owl:sameAs-style equivalence edges into canonical
representatives (component minimum). The alternating large-star /
small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) converges in O(log^2 n) rounds on
DataFrame joins — no vertex-program framework needed, and unlike
naive label propagation each round's shuffle is bounded by the
current edge set.

Skew note (north_rule): the one giant component every web KG has
(the "sameAs hairball") is exactly what large-star handles — high-
degree hubs shed their neighborhoods to the component min instead of
accumulating them. Each round persists + checkpoints (lineage cut) so
the loop's plan doesn't grow, mirroring the reference's
checkpoint-per-chunk discipline (CatTreeImpl, SURVEY.md §2D).

No reference counterpart (qEndpoint has no canonicalization);
cited here per graft spec, not parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _signature(edges: DataFrame) -> tuple[int, int]:
    # bit_xor: order-insensitive, overflow-free (ANSI mode) set hash;
    # sound because the edge set is deduplicated each round
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64(F.col("u"), F.col("v"))), F.lit(0)).alias(
            "h"
        ),
    ).collect()[0]
    return int(row.n), int(row.h)


def _large_star(edges: DataFrame) -> DataFrame:
    """For each u: connect every strictly-larger neighbor to
    min(N(u) ∪ {u})."""
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.least(F.min("v"), F.col("u")).alias("m"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .dropDuplicates(["u", "v"])
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges parent-ward (u = max endpoint) and connect every
    neighbor (and u itself) to the minimum."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    nbr_edges = (
        oriented.join(mins, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_edges = mins.select(F.col("u"), F.col("m").alias("v"))
    return nbr_edges.unionByName(self_edges).dropDuplicates(["u", "v"])


def connected_components(
    edges: DataFrame, max_iterations: int = 50
) -> DataFrame:
    """edges(u, v) -> (node, component) with component = min node id of
    the component (works for any orderable type; strings use binary
    order). Self-loops and duplicates are tolerated.
    """
    cur = (
        edges.select("u", "v")
        .filter(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
        .persist()
    )
    prev_sig = None
    for _ in range(max_iterations):
        nxt = _small_star(_large_star(cur))
        # localCheckpoint cuts the logical-plan chain (the loop would
        # otherwise compound the DAG each round); on a cluster with a
        # checkpoint dir this would be df.checkpoint() for fault
        # tolerance — same call shape.
        nxt = nxt.localCheckpoint(eager=True)
        sig = _signature(nxt)
        cur.unpersist()
        cur = nxt
        if sig == prev_sig:
            break
        prev_sig = sig
    # converged state: star graph u -> component min
    members = cur.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = cur.select(F.col("v").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return members.unionByName(roots).dropDuplicates(["node"])


def canonicalize_triples(
    triples_str: DataFrame, sameas: DataFrame, max_iterations: int = 50
) -> DataFrame:
    """Rewrite triple subjects/objects through the canonical map derived
    from sameas(iri_a, iri_b) equivalences; predicates untouched.

    The rewrite is two left joins against the (node -> component) map —
    the same remap-join shape as KCat's old->new ID maps
    (KCatMerger buildDictionary, KCatImpl.java:370-420).
    """
    comp = connected_components(
        sameas.select(F.col("iri_a").alias("u"), F.col("iri_b").alias("v")),
        max_iterations=max_iterations,
    )
    smap = comp.select(F.col("node").alias("s"), F.col("component").alias("s_canon"))
    omap = comp.select(F.col("node").alias("o"), F.col("component").alias("o_canon"))
    return (
        triples_str.join(smap, "s", "left")
        .join(omap, "o", "left")
        .select(
            F.coalesce("s_canon", "s").alias("s"),
            F.col("p"),
            F.coalesce("o_canon", "o").alias("o"),
        )
        .dropDuplicates(["s", "p", "o"])
    )
