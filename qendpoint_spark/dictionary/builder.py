"""Four-section HDT dictionary build on the DataFrame API.

Reference semantics (SURVEY.md §1.3, qendpoint-core):

- sections: SH (terms that occur as BOTH subject and object), S
  (subject-only), O (object-only), P (predicates, independent namespace)
  — FourSectionDictionary.java, split computed by the co-scan in
  CompressFourSectionDictionary.java:86-158.
- IDs: 1-based rank within each section, sorted by unsigned-UTF8-byte
  order; global subject id = rank(SH) or |SH| + rank(S); global object
  id = rank(SH) or |SH| + rank(O); predicate ids are their own 1..|P|
  space (BaseDictionary.getGlobalId, BaseDictionary.java:60-81).

Spark realization: distinct() per role, an inner/anti join pair for the
SH split (the reference's sorted co-scan is a sort-merge join here —
same algorithm, cluster-wide), then one `zip_with_rank` per section.
All shuffles key on `term`; Catalyst's AQE handles skewed term
prefixes, and each section rank is an independent job, so P (tiny) does
not serialize behind O (huge).

At 100 TB the term table is billions of rows: everything here is
hash/range-shuffle parallel, there is no driver-side collection except
the per-partition offset table (num_partitions rows) inside
zip_with_rank, and no global-window bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qendpoint_spark.dictionary.rank import zip_with_rank

SECTION_SHARED = "SH"
SECTION_SUBJECT = "S"
SECTION_OBJECT = "O"
SECTION_PREDICATE = "P"


def build_dictionary(triples_str: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """triples_str(s,p,o string) -> dict_terms(term, section, sec_rank, id).

    `id` is the reference's *global* id: for SH/S it is the subject-space
    id, for SH/O the object-space id (SH terms have equal subject and
    object ids by construction), for P the predicate-space id.
    Output columns:
      term      string   dictionary lexical form
      section   string   SH | S | O | P
      sec_rank  long     1-based rank within the section
      id        long     global id per §1.3 offset rule
    """
    subjects = triples_str.select(F.col("s").alias("term")).distinct()
    objects = triples_str.select(F.col("o").alias("term")).distinct()
    predicates = triples_str.select(F.col("p").alias("term")).distinct()

    # SH split: the reference co-scans the two sorted streams
    # (CompressFourSectionDictionary.java:86-158); a sort-merge
    # inner/anti join is the distributed equivalent.
    shared = subjects.join(objects, "term", "inner")
    subj_only = subjects.join(objects, "term", "left_anti")
    obj_only = objects.join(subjects, "term", "left_anti")

    sh = zip_with_rank(shared, ["term"], "sec_rank", num_partitions=num_partitions)
    s = zip_with_rank(subj_only, ["term"], "sec_rank", num_partitions=num_partitions)
    o = zip_with_rank(obj_only, ["term"], "sec_rank", num_partitions=num_partitions)
    p = zip_with_rank(predicates, ["term"], "sec_rank", num_partitions=num_partitions)

    n_shared = shared.count()

    def tag(df: DataFrame, section: str, offset: int) -> DataFrame:
        return df.select(
            "term",
            F.lit(section).alias("section"),
            F.col("sec_rank"),
            (F.col("sec_rank") + F.lit(offset)).cast("long").alias("id"),
        )

    return (
        tag(sh, SECTION_SHARED, 0)
        .unionByName(tag(s, SECTION_SUBJECT, n_shared))
        .unionByName(tag(o, SECTION_OBJECT, n_shared))
        .unionByName(tag(p, SECTION_PREDICATE, 0))
    )


def subject_map(dict_terms: DataFrame) -> DataFrame:
    """term -> subject-space id (SH ∪ S)."""
    return dict_terms.filter(
        F.col("section").isin(SECTION_SHARED, SECTION_SUBJECT)
    ).select("term", F.col("id").alias("sid"))


def object_map(dict_terms: DataFrame) -> DataFrame:
    """term -> object-space id (SH ∪ O)."""
    return dict_terms.filter(
        F.col("section").isin(SECTION_SHARED, SECTION_OBJECT)
    ).select("term", F.col("id").alias("oid"))


def predicate_map(dict_terms: DataFrame) -> DataFrame:
    """term -> predicate-space id (P)."""
    return dict_terms.filter(F.col("section") == SECTION_PREDICATE).select(
        "term", F.col("id").alias("pid")
    )
