"""Entity linking: score candidate mentions against an alias dictionary.

Graft-defined stage (no qEndpoint counterpart — SURVEY.md scope note);
the Spark shape follows the north_star: broadcast alias dictionary,
blocking-key repartition for the non-broadcast path, top-1
disambiguation by (prior, entity) per mention.

Determinism: ties on prior break on entity_iri ascending, so the
linked entity is a pure function of the input — required for the
DuckDB-oracle equality check and for idempotent resume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_alias_dict(entities: DataFrame) -> DataFrame:
    """entities(alias, entity_iri, prior) -> alias_dict with block_key.

    block_key = first token of the alias (FIXTURES.md §3): equal-alias
    rows land in the same partition under a repartition on block_key,
    which is what makes the sort-merge path shuffle-local. Callers with
    a curated dictionary can supply their own block_key.
    """
    return entities.withColumn(
        "block_key", F.split(F.col("alias"), " ").getItem(0)
    )


def link_mentions(
    mentions: DataFrame,
    alias_dict: DataFrame,
    broadcast_dict: bool = True,
    top_k: int = 1,
) -> DataFrame:
    """mentions(doc_iri, alias) x alias_dict(alias, entity_iri, prior[,
    block_key]) -> (doc_iri, alias, entity_iri, prior, link_rank).

    broadcast_dict=True: the common case — alias dictionaries (~10^6-
    10^7 rows) fit executor memory; the join is a broadcast hash join,
    zero shuffle of the (huge) mention table.

    broadcast_dict=False: the 100-TB path for oversized dictionaries —
    both sides repartition on block_key (first alias token), so the
    equi-join on alias becomes a co-partitioned sort-merge join; skewed
    blocks (stopword-like first tokens) are split by AQE skew-join.

    Disambiguation: rank candidates per (doc_iri, alias) by prior desc,
    entity_iri asc; keep top_k. The window partitions by mention key —
    high-cardinality, so no single-reducer hotspot.
    """
    if broadcast_dict:
        joined = mentions.join(F.broadcast(alias_dict), "alias", "inner")
    else:
        n = mentions.sparkSession.sparkContext.defaultParallelism
        m = mentions.withColumn(
            "block_key", F.split(F.col("alias"), " ").getItem(0)
        ).repartition(n, "block_key")
        d = alias_dict.repartition(n, "block_key")
        joined = m.join(d, ["block_key", "alias"], "inner").drop("block_key")
    w = Window.partitionBy("doc_iri", "alias").orderBy(
        F.col("prior").desc(), F.col("entity_iri").asc()
    )
    return (
        joined.withColumn("link_rank", F.row_number().over(w))
        .filter(F.col("link_rank") <= top_k)
        .select("doc_iri", "alias", "entity_iri", "prior", "link_rank")
    )
