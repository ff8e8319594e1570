"""k-way dataset merge (HDTCat / KCat) and diff on encoded tables.

Reference: KCatImpl.cat merges k HDTs by (1) merging the sorted
dictionary sections while recomputing the shared section across all
inputs, (2) building per-input old-ID -> new-ID long-array maps
(KCatMerger's SyncSeq arrays), (3) remapping and merge-sorting all
triples WITHOUT ever re-extracting term strings from the triples
(KCatImpl.java:370-420, KCatMerger.java:49-511,
GroupBySubjectMapIterator.java:26).

The Spark realization follows the same decomposition:

1. merged dictionary = rank of the UNION OF INPUT DICTIONARIES' TERM
   TABLES (role flags recovered from section labels, one
   map-side-combined groupBy(term)) — cost ∝ Σ|terms_i|, the triples
   are never decoded;
2. per-input remap tables (space, old_id -> new_id) = the old
   dictionary joined to the merged one on term — string joins over the
   TERM tables only;
3. merged triples = each input's INT triples joined to its remap per
   component (three 8-byte-key joins; Catalyst broadcasts the remaps
   under the adaptive threshold — predicates/graphs virtually always —
   and falls back to shuffled joins above it), unioned, deduped on the
   int key.

Nothing wider than a term string ever shuffles, and the full corpus is
touched only as longs — the property that makes a 1 %-delta merge
affordable at 100 TB (see merge/incremental_cat.py for the
delta-proportional specialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qendpoint_spark.dictionary import merge_role_sections, rank_sections


def _by_space(d: DataFrame, sec_col: str, id_col: str) -> DataFrame:
    """Explode dictionary rows into (term, space) membership: SH terms
    belong to BOTH the subject and the object ID space (and a section
    can change across the merge, e.g. old O -> new SH when another
    input uses the term as a subject)."""
    spaces = (
        F.when(F.col(sec_col) == "SH", F.array(F.lit("subj"), F.lit("obj")))
        .when(F.col(sec_col) == "S", F.array(F.lit("subj")))
        .when(F.col(sec_col) == "O", F.array(F.lit("obj")))
        .when(F.col(sec_col) == "G", F.array(F.lit("graph")))
        .otherwise(F.array(F.lit("pred")))
    )
    return d.withColumn("space", F.explode(spaces))


def build_remap(old_dict: DataFrame, merged_dict: DataFrame) -> DataFrame:
    """(term, space, old_section, old_id, section, new_id) — the analog
    of KCatMerger's per-input SyncSeq arrays, derived as a term-keyed
    join of the input dictionary with the merged one. Every old id is
    covered: the merged dictionary's term set is a superset of each
    input's by construction."""
    new_d = _by_space(
        merged_dict.select("term", "section", F.col("id").alias("new_id")),
        "section",
        "new_id",
    )
    old = _by_space(
        old_dict.select(
            "term",
            F.col("section").alias("old_section"),
            F.col("id").alias("old_id"),
        ),
        "old_section",
        "old_id",
    )
    return old.join(new_d, ["term", "space"], "inner").select(
        "term", "space", "old_section", "old_id", "section", "new_id"
    )


def remap_triples(triples_id: DataFrame, remap: DataFrame) -> DataFrame:
    """Rewrite an input's INT triples into the merged ID space via
    three (four with graphs) integer equi-joins — KCatImpl's triple
    remap pass (KCatImpl.java:397-420). The remap is projected to
    (old_id, new_id) longs per space before joining, so no term string
    enters any exchange; predicate/graph remaps are explicitly
    broadcast (tiny namespaces), subject/object remaps are left to
    Catalyst/AQE (broadcast under the threshold, SMJ + skew split
    above)."""
    with_graph = "g" in triples_id.columns

    def space_map(space: str) -> DataFrame:
        return remap.filter(F.col("space") == space).select(
            F.col("old_id").alias("__old"), F.col("new_id").alias("__new")
        )

    rp = space_map("pred")
    rs = space_map("subj")
    ro = space_map("obj")
    out = (
        triples_id.join(F.broadcast(rp), triples_id["p"] == rp["__old"])
        .drop("p", "__old")
        .withColumnRenamed("__new", "p")
    )
    if with_graph:
        rg = space_map("graph")
        out = (
            out.join(F.broadcast(rg), out["g"] == rg["__old"])
            .drop("g", "__old")
            .withColumnRenamed("__new", "g")
        )
    out = (
        out.join(rs, out["s"] == rs["__old"])
        .drop("s", "__old")
        .withColumnRenamed("__new", "s")
    )
    out = (
        out.join(ro, out["o"] == ro["__old"])
        .drop("o", "__old")
        .withColumnRenamed("__new", "o")
    )
    return out.select(*(["s", "p", "o"] + (["g"] if with_graph else [])))


def merge_datasets(
    inputs: list[tuple[DataFrame, DataFrame]],
    num_partitions: int | None = None,
) -> tuple[DataFrame, DataFrame, list[DataFrame]]:
    """inputs: [(triples_id, dict_terms), ...] (k >= 2).

    Returns (merged_dict, merged_triples_id, remaps) where remaps[i] is
    the per-input (space, old_id, new_id) map. The merged dictionary is
    built from the union of the input dictionaries' term tables (cost
    ∝ |terms|) and the merged triples from per-input integer remap
    joins (cost ∝ |triples| as longs) — the triples are never decoded
    to strings, matching KCatImpl's id-space merge
    (KCatImpl.java:370-420).

    Quad datasets merge too (all inputs must agree: either every input
    has a `g` column or none — a mixed merge would silently drop graph
    context, so it raises). Graph terms re-rank into the merged G
    namespace like any other space.
    """
    graphness = {("g" in t.columns) for t, _ in inputs}
    if len(graphness) > 1:
        raise ValueError(
            "merge_datasets: cannot mix triple and quad inputs — lift "
            "the triple datasets into a default graph first"
        )
    with_graph = graphness.pop()
    keys = ["s", "p", "o"] + (["g"] if with_graph else [])
    # localCheckpoint cuts the composed rank plan once: the merged dict
    # feeds k remap joins and the remaps feed the triple joins, so
    # recomputation (and AQE re-optimization of the deep plan) would
    # otherwise multiply.
    merged_dict = rank_sections(
        merge_role_sections([d for _, d in inputs]),
        num_partitions=num_partitions,
    ).localCheckpoint(eager=True)
    remaps = [build_remap(d, merged_dict) for _, d in inputs]
    remapped = [
        remap_triples(t, r) for (t, _), r in zip(inputs, remaps)
    ]
    merged = remapped[0]
    for m in remapped[1:]:
        merged = merged.unionByName(m)
    # inputs are individually distinct and each remap is injective per
    # space, so duplicates only arise ACROSS inputs; the dedup shuffles
    # 8-byte ids, never strings.
    merged = merged.dropDuplicates(keys)
    return merged_dict, merged, remaps


def diff_datasets(
    triples_str: DataFrame,
    delete_triples_str: DataFrame,
    num_partitions: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """HDTDiff analog (HDTManager.diffHDT, HDTManager.java:1059): subtract
    a deletion set, then rebuild dictionary + encoding over the
    survivors (the reference's per-section entry diff == re-ranking the
    surviving terms; DictionaryDiff.java).

    Returns (new_dict, new_triples_id). Quad inputs diff on the full
    (s,p,o,g) key — a deletion removes the statement from one graph
    only, matching SPARQL DELETE DATA semantics over named graphs.
    """
    from qendpoint_spark.dictionary import build_dictionary
    from qendpoint_spark.encoding import encode_triples

    keys = ["s", "p", "o"] + (["g"] if "g" in triples_str.columns else [])
    survivors = triples_str.join(
        delete_triples_str.select(*keys), keys, "left_anti"
    ).localCheckpoint(eager=True)  # stage boundary; feeds dict + encode
    new_dict = build_dictionary(survivors, num_partitions=num_partitions)
    return new_dict, encode_triples(survivors, new_dict)
