"""Mention detection + (s,p,o) triple extraction.

The reference has no extraction stage (SURVEY.md scope note) — these
rules are the graft-defined, *deterministic* extraction grammar so that
expected triples are exactly computable (and hence P/R vs the oracle is
exactly 1.0 ≥ the 0.95 gate): every rule below is also expressible in
ANSI SQL, which is what the DuckDB oracle in __spark_entry__.py runs.

Rules (BASE = http://example.org/), given a document/page with a stable
key `doc` and columns text/lang/source/n_chars:

  <BASE/doc/{key}>  <BASE/prop/lang>      "{lang}"@{lang}
  <BASE/doc/{key}>  <BASE/prop/source>    "{source}"          (documents only)
  <BASE/doc/{key}>  <BASE/prop/nchars>    "{n}"^^xsd:integer  (documents only)
  <BASE/doc/{key}>  <BASE/prop/crawldate> "2024-MM-DD"^^xsd:date
                      MM = 1+doc_id%12, DD = 1+doc_id%28       (documents only)
  <BASE/doc/{key}>  <BASE/prop/density>   "{n//100}.{n%100:02}"^^xsd:decimal
                                                               (documents only)
  <BASE/doc/{key}>  <BASE/prop/flag>      "true|false"^^xsd:boolean
                      true iff n_chars even                     (documents only)
  <BASE/doc/{key}>  <BASE/prop/provenance> _:b{doc_id}          (documents only)
  _:b{doc_id}       <BASE/prop/fromSource> "{source}"           (documents only)
  <BASE/doc/{key}>  <BASE/prop/mentions>  <BASE/ent/{tok}>    per distinct tok
  <BASE/ent/{tok}>  <BASE/prop/label>     "{tok}"             per distinct tok

where tok ranges over distinct whitespace tokens of `text` with
len(tok) >= MIN_MENTION_LEN. Entity IRIs appear as both subject (label
rule) and object (mentions rule) — this deliberately populates the
HDT shared (SH) dictionary section; the provenance bnodes do the same
for bnode terms (subject via fromSource, object via provenance —
reference fixture territory: importer/bnode_x.nt), and the typed
literals exercise four MSD datatype subsections (integer, date,
decimal, boolean) plus lang and plain strings
(MultipleSectionDictionary.java:51-60).

Terms use the HDT dictionary lexical form: IRIs without angle
brackets, literals quoted with optional @lang / ^^<datatype> suffix
(BaseDictionary.java:120-174, LiteralsUtils.java:52,177-188).

Mention detection is an Arrow-vectorized pandas UDF per the graft spec
("no per-row Python" = no row-at-a-time Python UDF; one Python call per
Arrow batch). Triple assembly around it is pure JVM (explode/concat).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BASE = "http://example.org/"
P_LANG = BASE + "prop/lang"
P_SOURCE = BASE + "prop/source"
P_NCHARS = BASE + "prop/nchars"
P_MENTIONS = BASE + "prop/mentions"
P_LABEL = BASE + "prop/label"
P_CRAWLDATE = BASE + "prop/crawldate"
P_DENSITY = BASE + "prop/density"
P_FLAG = BASE + "prop/flag"
P_PROVENANCE = BASE + "prop/provenance"
P_FROMSOURCE = BASE + "prop/fromSource"
XSD_INTEGER = "http://www.w3.org/2001/XMLSchema#integer"
XSD_DATE = "http://www.w3.org/2001/XMLSchema#date"
XSD_DECIMAL = "http://www.w3.org/2001/XMLSchema#decimal"
XSD_BOOLEAN = "http://www.w3.org/2001/XMLSchema#boolean"
MIN_MENTION_LEN = 4


@F.pandas_udf(T.ArrayType(T.StringType()))
def mentions_udf(text: pd.Series) -> pd.Series:
    """Distinct qualifying tokens per row, in first-seen order.

    Semantics match SQL `string_split(text, ' ')` + length filter +
    DISTINCT, so the DuckDB oracle can reproduce it exactly.
    """

    def one(t: str | None) -> list[str]:
        if not t:
            return []
        seen: dict[str, None] = {}
        for tok in t.split(" "):
            if len(tok) >= MIN_MENTION_LEN:
                seen.setdefault(tok, None)
        return list(seen)

    return text.map(one)


def _mention_triples(
    keyed: DataFrame, use_udf: bool = False, key_col: str = "doc_iri",
    subject_iri=None,
) -> DataFrame:
    """keyed(<key_col>, text) -> mentions + label triples.

    Tokenization semantics are identical on both paths (split on a
    single space + per-document distinct + length filter). The default
    path is pure JVM (split/array_distinct/explode/filter stay inside
    whole-stage codegen — UDFs are the slow path, ~2.5x in the bench);
    `use_udf=True` routes through the Arrow-vectorized pandas UDF, the
    shape real NER-style mention detection takes in the pages pipeline.

    PRECONDITION (both callers document and guarantee it): key_col is
    unique per input row. That is what makes per-document token dedup
    equal to the global (key, tok) distinct — see the comment below.
    key_col may be a NARROW surrogate (the documents path passes the
    long doc_id) and `subject_iri` (a fn: key Column -> IRI Column)
    assembles the subject IRI only in the final projection.
    """
    if subject_iri is None:
        subject_iri = lambda c: c  # noqa: E731 — key already IS the IRI
    # Per-DOCUMENT dedup, zero shuffle (r06 optimization, guide §2.4):
    # every copy of a (key, tok) pair comes from the same source row —
    # explode is a narrow op — and key_col is unique by the callers'
    # documented preconditions (unique doc_id; pages deduped to one row
    # per url upstream). So distinct-within-the-token-array IS the
    # global (key, tok) distinct, and the former
    # dropDuplicates([key, tok]) exchange (a full shuffle of every
    # token pair, ~2 s of the sf0.1 bench) is provably redundant. The
    # UDF path already emits per-row-distinct tokens for the same
    # reason.
    if use_udf:
        toks = keyed.withColumn(
            "tok", F.explode(mentions_udf(F.col("text")))
        ).select(key_col, "tok")
    else:
        toks = (
            keyed.select(
                key_col,
                F.explode(
                    F.array_distinct(
                        F.split(F.coalesce(F.col("text"), F.lit("")), " ")
                    )
                ).alias("tok"),
            )
            .filter(F.length("tok") >= MIN_MENTION_LEN)
        )
    mentions = toks.select(
        subject_iri(F.col(key_col)).alias("s"),
        F.lit(P_MENTIONS).alias("p"),
        F.concat(F.lit(BASE + "ent/"), F.col("tok")).alias("o"),
    )
    # distinct over tokens alone is a map-side-combined aggregate whose
    # shuffle is bounded by the per-partition vocabulary — tiny. This
    # branch re-runs the scan+explode (both branches are narrow now);
    # that costs far less than the materialize-or-shuffle designs it
    # replaced (eager localCheckpoint: +4 s; shared dedup exchange:
    # +2 s shuffle, both measured at the sf0.1 bench).
    labels = (
        toks.select("tok")
        .distinct()
        .select(
            F.concat(F.lit(BASE + "ent/"), F.col("tok")).alias("s"),
            F.lit(P_LABEL).alias("p"),
            F.concat(F.lit('"'), F.col("tok"), F.lit('"')).alias("o"),
        )
    )
    return mentions.unionByName(labels)


def extract_triples_from_documents(documents: DataFrame) -> DataFrame:
    """documents(doc_id,text,lang,source,n_chars) -> triples_str(s,p,o).

    Distinct triples (HDT keeps a set of statements; duplicate triples
    collapse exactly as MapCompressTripleMerger dedup does,
    MapCompressTripleMerger.java:183-198).

    Precondition: doc_id is unique (the TESTDATA tables guarantee it;
    the pages path enforces the analogous url uniqueness via the
    latest-crawl dedup). With unique keys the output is duplicate-free
    by construction — meta rows are one-per-(doc, predicate), mention
    pairs are deduped, label rows come from a distinct, and the three
    branches use disjoint predicates — so no global distinct() shuffle
    is needed over the assembled triples.
    """
    keyed = documents.select(
        F.concat(F.lit(BASE + "doc/"), F.col("doc_id").cast("string")).alias(
            "doc_iri"
        ),
        "doc_id",
        "text",
        "lang",
        "source",
        "n_chars",
    )
    # typed-literal lexical forms assembled by pure string arithmetic
    # (no float formatting, so the DuckDB oracle reproduces them
    # byte-exactly): date from doc_id residues, decimal from integer
    # div/mod, boolean from parity
    crawldate = F.concat(
        F.lit('"2024-'),
        F.lpad((F.col("doc_id") % 12 + 1).cast("string"), 2, "0"),
        F.lit("-"),
        F.lpad((F.col("doc_id") % 28 + 1).cast("string"), 2, "0"),
        F.lit('"^^<' + XSD_DATE + ">"),
    )
    density = F.concat(
        F.lit('"'),
        F.expr("n_chars div 100").cast("string"),
        F.lit("."),
        F.lpad((F.col("n_chars") % 100).cast("string"), 2, "0"),
        F.lit('"^^<' + XSD_DECIMAL + ">"),
    )
    flag = F.concat(
        F.lit('"'),
        F.when(F.col("n_chars") % 2 == 0, F.lit("true")).otherwise(F.lit("false")),
        F.lit('"^^<' + XSD_BOOLEAN + ">"),
    )
    bnode = F.concat(F.lit("_:b"), F.col("doc_id").cast("string"))
    # all per-document metadata triples in ONE scan: explode an inline
    # (s, p, o) array instead of unioned re-scans; the fromSource rule
    # rides along with the provenance BNODE as its subject
    meta = keyed.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.col("doc_iri").alias("s"),
                        F.lit(p).alias("p"),
                        o.alias("o"),
                    )
                    for p, o in (
                        (P_LANG, F.concat(F.lit('"'), F.col("lang"),
                                          F.lit('"@'), F.col("lang"))),
                        (P_SOURCE, F.concat(F.lit('"'), F.col("source"),
                                            F.lit('"'))),
                        (P_NCHARS, F.concat(F.lit('"'),
                                            F.col("n_chars").cast("string"),
                                            F.lit('"^^<' + XSD_INTEGER + ">"))),
                        (P_CRAWLDATE, crawldate),
                        (P_DENSITY, density),
                        (P_FLAG, flag),
                        (P_PROVENANCE, bnode),
                    )
                ],
                F.struct(
                    bnode.alias("s"),
                    F.lit(P_FROMSOURCE).alias("p"),
                    F.concat(F.lit('"'), F.col("source"), F.lit('"')).alias("o"),
                ),
            )
        ).alias("spo"),
    ).select(
        F.col("spo.s").alias("s"), F.col("spo.p").alias("p"),
        F.col("spo.o").alias("o"),
    )
    # documents have an integer key: dedup mentions on (doc_id, tok)
    # and assemble the subject IRI post-shuffle (-18% shuffled bytes)
    return meta.unionByName(
        _mention_triples(
            documents.select("doc_id", "text"),
            key_col="doc_id",
            subject_iri=lambda k: F.concat(
                F.lit(BASE + "doc/"), k.cast("string")
            ),
        )
    )


def extract_triples_from_pages(pages: DataFrame) -> DataFrame:
    """pages(url,warc_ts,html,text,lang) -> triples_str(s,p,o).

    The page url is itself the subject IRI. When the same url was
    recrawled (multiple warc_ts), only the latest crawl contributes —
    the dedup a Common-Crawl pipeline needs anyway, expressed as a
    single max-struct aggregate (one shuffle keyed on url, map-side
    combined, deterministic under warc_ts ties via the lexicographic
    struct order; no window and no self-join over a skewed key).
    """
    latest = pages.groupBy("url").agg(
        F.max(F.struct("warc_ts", "text", "lang")).alias("m")
    )
    keyed = latest.select(
        F.col("url").alias("doc_iri"),
        F.col("m.text").alias("text"),
        F.col("m.lang").alias("lang"),
    )
    meta = keyed.select(
        F.col("doc_iri").alias("s"),
        F.lit(P_LANG).alias("p"),
        F.concat(F.lit('"'), F.col("lang"), F.lit('"@'), F.col("lang")).alias("o"),
    )
    return meta.unionByName(
        _mention_triples(keyed.select("doc_iri", "text"), use_udf=True)
    )
