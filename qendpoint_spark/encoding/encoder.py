"""String triples -> ID triples (and back) through the dictionary.

Reference: the gen-disk path materializes three position-indexed long
arrays map_subjects/predicates/objects and replays every triple
position through them (CompressTripleMapper.java:36-169,
MapCompressTripleMerger.createChunk:146-173). In Spark the maps ARE
DataFrames and the replay is three equi-joins on `term` — Catalyst
picks broadcast hash join when a map fits under the broadcast
threshold (predicates virtually always; subjects/objects at small SF)
and falls back to sort-merge join with AQE skew splitting at scale.

Skew note (north_rule): hot terms (rdf:type-like predicates, head
entities) skew the PROBE side only — the dictionary side is distinct
on term, so AQE's skew-join splitting (on) plus the explicit broadcast
of the predicate map removes the classic straggler. No manual salting
needed for an equi-join whose build side is unique-keyed; salting is
reserved for the CC loop (linking.canonicalize).

Late materialization: after this stage everything downstream stays on
`long` IDs (SimpleIRIHDT-style lazy values, SURVEY.md §4.1) — decode
joins back to strings only at export.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qendpoint_spark.dictionary.builder import (
    graph_map,
    object_map,
    predicate_map,
    subject_map,
)


def encode_triples(
    triples_str: DataFrame,
    dict_terms: DataFrame,
    assume_distinct: bool = False,
) -> DataFrame:
    """(s,p,o[,g] strings) x dict -> unique (s,p,o[,g] longs).

    Equivalent of CompressTripleMapper.extract* + SPO dedup
    (NoDuplicateTripleIDIterator.java:14): resolve the small namespaces
    FIRST by broadcast join — P always, G in quad mode (one term per
    graph) — so predicate/graph strings never enter any shuffle, then
    chain the subject and object equi-joins. Catalyst/AQE picks the
    physical join per scale: with the dictionary under the adaptive
    broadcast threshold the whole encode is ZERO-shuffle (measured at
    the sf0.1 bench: 200k terms broadcast, 0 bytes shuffled); past it,
    AQE falls back to shuffled joins with skew splitting — hot terms
    (rdf:type-style predicates are already broadcast; head entities)
    skew the probe side only, since the dictionary side is unique-keyed.

    Design note (measured, not guessed): the "narrow-fact" alternative
    — explode to (uid, space, term), one join against a unified
    (term, space)->id map, integer pivot back on uid — was benchmarked
    against this chain at 4.31 M triples / 200k terms with broadcasts
    disabled to model the huge-dictionary regime. It LOSES on both
    axes: 143 MB shuffled vs 75 MB and 5.3 s vs 2.3 s (warm, local[8]).
    The pivot's groupBy(uid) is itself a full shuffle of 2 rows/triple
    and the per-fact overhead (uid+space+pid) rivals the term bytes it
    saves, while shuffle compression already collapses the repeated
    IRI prefixes the narrow design tries to avoid shuffling. See
    BENCH/BASELINE.md §encode-ab.

    assume_distinct=True skips the final dedup shuffle: the term->id
    mapping is injective within each ID space, so distinct string
    triples encode to distinct ID triples — the extraction stage
    guarantees distinct output, making the dedup a provably redundant
    full shuffle of the encoded table.
    """
    with_graph = "g" in triples_str.columns
    pmap = predicate_map(dict_terms)
    smap = subject_map(dict_terms)
    omap = object_map(dict_terms)
    out = triples_str.join(
        F.broadcast(pmap), triples_str["p"] == pmap["term"], "inner"
    ).drop("term", "p")
    if with_graph:
        gmap = graph_map(dict_terms)
        out = out.join(
            F.broadcast(gmap), out["g"] == gmap["term"], "inner"
        ).drop("term", "g")
    out = out.join(smap, out["s"] == smap["term"], "inner").drop("term", "s")
    out = out.join(omap, out["o"] == omap["term"], "inner").drop("term", "o")
    cols = [
        F.col("sid").alias("s"),
        F.col("pid").alias("p"),
        F.col("oid").alias("o"),
    ]
    keys = ["s", "p", "o"]
    if with_graph:
        cols.append(F.col("gid").alias("g"))
        keys.append("g")
    projected = out.select(*cols)
    return projected if assume_distinct else projected.dropDuplicates(keys)


def decode_triples(triples_id: DataFrame, dict_terms: DataFrame) -> DataFrame:
    """(s,p,o[,g] longs) -> (s,p,o[,g] strings); inverse of encode
    (id->term is unique per space, so this is exact). Quad mode decodes
    the graph column through the (broadcast-sized) G section."""
    with_graph = "g" in triples_id.columns
    smap = subject_map(dict_terms).withColumnRenamed("term", "s_term")
    pmap = predicate_map(dict_terms).withColumnRenamed("term", "p_term")
    omap = object_map(dict_terms).withColumnRenamed("term", "o_term")
    out = (
        triples_id.join(smap, triples_id["s"] == smap["sid"], "inner")
        .join(F.broadcast(pmap), triples_id["p"] == pmap["pid"], "inner")
        .join(omap, triples_id["o"] == omap["oid"], "inner")
    )
    cols = [
        F.col("s_term").alias("s"),
        F.col("p_term").alias("p"),
        F.col("o_term").alias("o"),
    ]
    if with_graph:
        gmap = graph_map(dict_terms).withColumnRenamed("term", "g_term")
        out = out.join(F.broadcast(gmap), triples_id["g"] == gmap["gid"], "inner")
        cols.append(F.col("g_term").alias("g"))
    return out.select(*cols)
