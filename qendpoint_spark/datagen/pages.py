"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1).

Mirrors the reference's seeded test-data discipline
(LargeFakeDataSetStreamSupplier: same seed => same stream,
core/util/LargeFakeDataSetStreamSupplier.java:96-152) with the
input_hint page shape (url, warc_ts, html:binary, text, lang).

Generation is distributed: spark.range(n) seeds per-row xxhash64-based
pseudo-randomness (pure column expressions, no Python RNG, no driver
loop), so the corpus is identical for any partitioning and any
parallelism. html is rendered from text by a pandas UDF using the same
template the extractor inverts (extraction.html_text), giving the
byte-identical round-trip invariant something real to verify.

Includes the reference's edge cases: unicode stress rows (CJK, NBSP,
astral plane — unicodeTest.nt / unicode_disk_encode.nt analogs),
empty-text pages (empty1.nt analog), and recrawled urls (same url,
two warc_ts).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from qendpoint_spark.extraction.html_text import render_html

VOCAB = [
    "spark", "shuffle", "partition", "dictionary", "triple", "subject",
    "predicate", "object", "graph", "entity", "mention", "crawl",
    "index", "merge", "encode", "bitmap", "section", "prefix", "sort",
    "join", "salt", "skew", "lineage", "resume", "checkpoint",
]
UNICODE_TOKENS = ["汉字测试", "ünïcode", "астра", "𝄞clef𝄞", "nbsp tok"]
LANGS = ["en", "de", "fr", "es", "zh-hant"]


@F.pandas_udf(T.BinaryType())
def _render_udf(url: pd.Series, text: pd.Series) -> pd.Series:
    return pd.Series(
        [render_html(u, t) for u, t in zip(url, text)], dtype=object
    )


def generate_pages(
    spark: SparkSession,
    n_pages: int,
    seed: int = 42,
    recrawl_every: int = 10,
    empty_every: int = 17,
    unicode_every: int = 7,
) -> DataFrame:
    """n_pages rows + one recrawl row per `recrawl_every` urls."""
    base = spark.range(n_pages).withColumn(
        "h", F.xxhash64(F.col("id"), F.lit(seed))
    )
    vocab_arr = F.array(*[F.lit(w) for w in VOCAB])
    uni_arr = F.array(*[F.lit(w) for w in UNICODE_TOKENS])
    lang_arr = F.array(*[F.lit(lang) for lang in LANGS])

    # 5-40 tokens per page, chosen by per-position hashes
    n_tok = (F.pmod(F.col("h"), F.lit(36)) + F.lit(5)).cast("int")
    toks = F.transform(
        F.sequence(F.lit(1), n_tok),
        lambda i: F.element_at(
            vocab_arr,
            (F.pmod(F.xxhash64(F.col("id"), i, F.lit(seed)), F.lit(len(VOCAB))) + 1).cast("int"),
        ),
    )
    text = F.concat_ws(" ", toks)
    # unicode stress: append a deterministic unicode token
    text = F.when(
        F.pmod(F.col("id"), F.lit(unicode_every)) == 0,
        F.concat(
            text,
            F.lit(" "),
            F.element_at(
                uni_arr,
                (F.pmod(F.col("h"), F.lit(len(UNICODE_TOKENS))) + 1).cast("int"),
            ),
        ),
    ).otherwise(text)
    # empty-text pages
    text = F.when(F.pmod(F.col("id"), F.lit(empty_every)) == 0, F.lit("")).otherwise(
        text
    )

    pages = base.select(
        F.concat(F.lit("https://crawl.example.com/p/"), F.col("id").cast("string")).alias("url"),
        (F.lit("2026-01-01 00:00:00").cast("timestamp") + F.make_interval(secs=F.pmod(F.col("h"), F.lit(86400)).cast("double"))).alias("warc_ts"),
        text.alias("text"),
        F.element_at(lang_arr, (F.pmod(F.col("h"), F.lit(len(LANGS))) + 1).cast("int")).alias("lang"),
        F.col("id"),
        F.col("h"),
    )
    # recrawls: older duplicate crawl of every k-th url with shorter text
    recrawls = pages.filter(F.pmod(F.col("id"), F.lit(recrawl_every)) == 0).select(
        "url",
        (F.col("warc_ts") - F.make_interval(days=F.lit(30))).alias("warc_ts"),
        F.concat(F.lit("stale "), F.col("text")).alias("text"),
        "lang",
        "id",
        "h",
    )
    all_pages = pages.unionByName(recrawls)
    return all_pages.select(
        "url",
        "warc_ts",
        _render_udf(F.col("url"), F.col("text")).alias("html"),
        "text",
        "lang",
    )


def generate_sameas(
    spark: SparkSession,
    n_entities: int,
    seed: int = 42,
    chain_len: int = 5,
    star_size: int = 8,
    skew_component: int = 200,
) -> DataFrame:
    """Equivalence edges with known components (FIXTURES.md §4):
    chains, stars, and one large skewed component over synthetic IRIs
    ent/0..n-1. Component of node i is min of its group, closed-form:

      - chains: groups of chain_len consecutive ids, edges i->i+1
      - stars: groups of star_size, edges head->member
      - skew: ids n..n+skew_component all linked to node n
    """
    ent = "https://kb.example.com/e/"

    def iri(col):
        return F.concat(F.lit(ent), col.cast("string"))

    chains = (
        spark.range(n_entities - 1)
        .filter((F.col("id") % chain_len) != chain_len - 1)
        .select(iri(F.col("id")).alias("iri_a"), iri(F.col("id") + 1).alias("iri_b"))
    )
    stars = (
        spark.range(n_entities)
        .filter((F.col("id") % star_size) != 0)
        .select(
            iri(F.col("id") - (F.col("id") % star_size)).alias("iri_a"),
            iri(F.col("id")).alias("iri_b"),
        )
    )
    skew = spark.range(n_entities, n_entities + skew_component).select(
        iri(F.lit(n_entities)).alias("iri_a"), iri(F.col("id")).alias("iri_b")
    )
    return chains.unionByName(stars).unionByName(skew)
