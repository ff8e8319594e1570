"""k-way dataset merge (HDTCat / KCat) and diff on encoded tables.

Reference: KCatImpl.cat merges k HDTs by (1) merging the sorted
dictionary sections while recomputing the shared section across all
inputs, (2) building per-input old-ID -> new-ID long-array maps,
(3) remapping and merge-sorting all triples
(KCatImpl.java:370-420, KCatMerger.java:49-511,
GroupBySubjectMapIterator.java:26). ~1800 LoC of tournament-merge
machinery.

Spark replaces all of it with the golden-cat identity the reference's
own tests pin (example1.nt + example2.nt == example1+2.nt,
HDTManagerTest combineHDTResult): decode each input through its own
dictionary, union the string-triple sets, and re-run the standard
dictionary+encode build. The per-input "ID remap table" materializes
for free as the join of an old dictionary with the new one on term.

Why this is the right 100-TB design and not a shortcut: KCat's k-way
tournament merge of sorted runs IS Spark's shuffle sort — re-ranking
the union costs one range shuffle of the merged term set, the same
asymptotic work KCatMerger does single-threaded. The reference
resorts to clever per-input maps because it cannot re-shuffle; Spark
can, in parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qendpoint_spark.dictionary import build_dictionary
from qendpoint_spark.encoding import decode_triples, encode_triples


def merge_datasets(
    inputs: list[tuple[DataFrame, DataFrame]],
    num_partitions: int | None = None,
) -> tuple[DataFrame, DataFrame, list[DataFrame]]:
    """inputs: [(triples_id, dict_terms), ...] (k >= 2).

    Returns (merged_dict, merged_triples_id, remaps) where remaps[i] is
    the per-input (section, old_id, new_id) map — the analog of
    KCatMerger's SyncSeq arrays, derivable because term strings are the
    join key between old and new dictionaries.

    Quad datasets merge too (all inputs must agree: either every input
    has a `g` column or none — a mixed merge would silently drop graph
    context, so it raises). Graph terms decode through the G section
    and re-rank into the merged G namespace like any other space.
    """
    graphness = {("g" in t.columns) for t, _ in inputs}
    if len(graphness) > 1:
        raise ValueError(
            "merge_datasets: cannot mix triple and quad inputs — lift "
            "the triple datasets into a default graph first"
        )
    with_graph = graphness.pop()
    keys = ["s", "p", "o"] + (["g"] if with_graph else [])
    strs = [decode_triples(t, d) for t, d in inputs]
    union = strs[0]
    for s in strs[1:]:
        union = union.unionByName(s)
    # localCheckpoint — not a mere persist — is the in-memory analog of
    # the pipeline's per-stage checkpoint table: it CUTS the logical
    # plan. Composing decode∘encode∘build lazily produces plans deep
    # enough that AQE's per-query-stage re-optimization pins the driver
    # (measured 155s -> 3s on the golden-cat test for the same data).
    # The k decode cascades also feed two consumers (dictionary build +
    # re-encode), so materializing once avoids recompute.
    union = union.dropDuplicates(keys).localCheckpoint(eager=True)
    merged_dict = build_dictionary(
        union, num_partitions=num_partitions
    ).localCheckpoint(eager=True)
    merged_triples = encode_triples(union, merged_dict)
    def by_space(d: DataFrame, sec_col: str, id_col: str) -> DataFrame:
        """Explode dictionary rows into (term, space) membership: SH
        terms belong to BOTH the subject and the object ID space (and a
        section can change across the merge, e.g. old O -> new SH when
        the other input uses the term as a subject)."""
        spaces = (
            F.when(F.col(sec_col) == "SH", F.array(F.lit("subj"), F.lit("obj")))
            .when(F.col(sec_col) == "S", F.array(F.lit("subj")))
            .when(F.col(sec_col) == "O", F.array(F.lit("obj")))
            .when(F.col(sec_col) == "G", F.array(F.lit("graph")))
            .otherwise(F.array(F.lit("pred")))
        )
        return d.withColumn("space", F.explode(spaces))

    remaps = []
    new_d = by_space(
        merged_dict.select("term", "section", F.col("id").alias("new_id")),
        "section",
        "new_id",
    )
    for _, old_dict in inputs:
        old = by_space(
            old_dict.select(
                "term",
                F.col("section").alias("old_section"),
                F.col("id").alias("old_id"),
            ),
            "old_section",
            "old_id",
        )
        remap = old.join(new_d, ["term", "space"], "inner").select(
            "term", "space", "old_section", "old_id", "section", "new_id"
        )
        remaps.append(remap)
    return merged_dict, merged_triples, remaps


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
    keys = ["s", "p", "o"] + (["g"] if "g" in triples_str.columns else [])
    survivors = triples_str.join(
        delete_triples_str.select(*keys), keys, "left_anti"
    ).localCheckpoint(eager=True)  # stage boundary; feeds dict + encode
    new_dict = build_dictionary(survivors, num_partitions=num_partitions)
    return new_dict, encode_triples(survivors, new_dict)
