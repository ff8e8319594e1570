"""End-to-end KG-construction pipeline with checkpointed, resumable stages.

Stage graph (SURVEY.md §7.1; each stage = one committed table + lineage):

  extract     pages/documents -> triples_str(s,p,o)
  dictionary  triples_str -> dict_terms(term, section, sec_rank, id)
  encode      triples_str x dict -> triples_spo (SPO-sorted, unique)
  ops         triples_spo -> triples_ops (OPS-sorted)
  stats       predicate/object index tables

Resume: each stage records its input fingerprint; rerunning with an
unchanged input skips straight to reading the committed table —
mirroring the reference's persisted restart step
(MergeRunnable.java:495-519) and CatTree chunk checkpoints.
"""

from __future__ import annotations

import hashlib
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qendpoint_spark.catalog import Catalog, StageResult
from qendpoint_spark.dictionary import build_dictionary
from qendpoint_spark.encoding import (
    build_header,
    encode_triples,
    object_index,
    ops_table,
    predicate_index,
    pso_table,
    spo_table,
    with_datatype,
)
from qendpoint_spark.extraction import (
    extract_triples_from_documents,
    extract_triples_from_pages,
)


@dataclass
class PipelineReport:
    stages: list[StageResult] = field(default_factory=list)
    n_triples: int = 0
    wall_s: float = 0.0

    def stage(self, name: str) -> StageResult:
        return next(s for s in self.stages if s.name == name)


def _fingerprint(*parts: str) -> str:
    return hashlib.sha256("||".join(parts).encode()).hexdigest()[:16]


def _resume(catalog: Catalog, name: str, fp: str) -> StageResult | None:
    """StageResult for a committed, fingerprint-matching stage whose
    table still EXISTS on disk — lineage alone is not enough (a deleted
    table directory with a surviving _lineage_*.json must trigger a
    rebuild, mirroring Catalog.write_stage's own existence check)."""
    lin = catalog.lineage(name)
    if lin is None or lin.get("input_fingerprint") != fp:
        return None
    if not os.path.exists(catalog.table_path(name)):
        return None
    return StageResult(
        name, catalog.table_path(name), lin["row_count"], lin["wall_ms"], True
    )


def run_pipeline(
    spark: SparkSession,
    catalog: Catalog,
    source_df: DataFrame | None = None,
    source_kind: str = "documents",
    source_fingerprint: str = "",
    num_partitions: int | None = None,
    with_stats: bool = True,
    with_pso: bool = False,
    force: bool = False,
    alias_dict: DataFrame | None = None,
    sameas: DataFrame | None = None,
) -> PipelineReport:
    """Run extract [-> link] [-> canonicalize] -> dictionary -> encode
    -> ops (-> stats).

    source_df: the pages or documents DataFrame. source_fingerprint
    should identify the input snapshot (path + row count, config...);
    stages resume when it is unchanged.

    alias_dict(alias, entity_iri, prior[, block_key]): when given, the
    `linked_mentions` stage scores every mention (the ent/<alias>
    objects emitted by extraction) against it — broadcast join +
    deterministic top-1 (north_star EL stage).

    sameas(iri_a, iri_b): when given, the `triples_canon` stage rewrites
    subjects/objects through large-star/small-star connected components
    and all downstream stages consume the canonical triples.
    """
    t_start = time.time()
    report = PipelineReport()
    fp0 = _fingerprint(source_kind, source_fingerprint)

    # S1 extract ----------------------------------------------------------
    # source_kind="triples": source_df already IS triples_str(s,p,o) —
    # the rdf2hdt path, where parsing (sources.read_rdf_source) replaces
    # extraction and the rest of the pipeline is unchanged.
    res = None if force else _resume(catalog, "triples_str", fp0)
    if res is None:
        if source_kind == "triples":
            # parsed RDF may repeat statements (HDT stores a set; the
            # reference dedups in its triple sort) — unlike extraction,
            # which emits distinct by construction. Quad input dedups
            # on the full (s,p,o,g) statement key.
            extractor = lambda df: df.dropDuplicates(  # noqa: E731
                ["s", "p", "o"] + (["g"] if "g" in df.columns else [])
            )
        elif source_kind == "documents":
            extractor = extract_triples_from_documents
        else:
            extractor = extract_triples_from_pages
        res = catalog.write_stage(
            "triples_str", extractor(source_df), fp0, force=force
        )
    report.stages.append(res)
    triples_str = catalog.read("triples_str")

    # S1b entity linking (optional artifact stage) --------------------------
    if alias_dict is not None:
        from qendpoint_spark.extraction.triples import BASE, P_MENTIONS
        from qendpoint_spark.linking import link_mentions

        fp_l = _fingerprint(fp0, "link", str(res.rows))
        res_l = None if force else _resume(catalog, "linked_mentions", fp_l)
        if res_l is not None:
            report.stages.append(res_l)
        else:
            prefix_len = len(BASE + "ent/")
            mentions = (
                triples_str.filter(F.col("p") == P_MENTIONS)
                .select(
                    F.col("s").alias("doc_iri"),
                    F.col("o").substr(F.lit(prefix_len + 1), F.length("o")).alias("alias"),
                )
            )
            linked = link_mentions(mentions, alias_dict, broadcast_dict=True)
            report.stages.append(
                catalog.write_stage("linked_mentions", linked, fp_l, force=force)
            )

    # S1c canonicalization (optional; downstream consumes the rewrite) ------
    if sameas is not None:
        from qendpoint_spark.linking import canonicalize_triples

        fp_c = _fingerprint(fp0, "canon", str(res.rows))
        res = None if force else _resume(catalog, "triples_canon", fp_c)
        if res is None:
            canon = canonicalize_triples(triples_str, sameas)
            res = catalog.write_stage("triples_canon", canon, fp_c, force=force)
        report.stages.append(res)
        triples_str = catalog.read("triples_canon")

    # S2 dictionary ---------------------------------------------------------
    fp1 = _fingerprint(fp0, "dict", str(res.rows))
    res = None if force else _resume(catalog, "dict_terms", fp1)
    if res is None:
        # eager=False: the parquet write below is the single consumer, so
        # the rank's localCheckpoint (a full extra materialize+rescan of
        # the term table) is skipped; the write streams straight off the
        # persisted range partitioning, released right after.
        dict_terms = build_dictionary(
            triples_str, num_partitions=num_partitions, eager=False
        )
        # MSD physical layout (MultipleSectionDictionary.java:51-60):
        # one partition directory per (section, datatype) — the object
        # sections split per literal datatype exactly as the reference's
        # typed subsections, so a datatype- or section-scoped read is
        # file-pruned (PartitionFilters, asserted in tests/test_plans.py).
        # File-count note (measured r06): the rank's (sec_key, term)
        # range partitioning already lands ~1 directory per task (the
        # dominant S section has a single NULL-datatype dir), so the
        # dynamic-partition write emits only ~76 files — an extra
        # (section, datatype, term) re-range was tried and cost more
        # than it saved.
        try:
            res = catalog.write_stage(
                "dict_terms",
                with_datatype(dict_terms),
                fp1,
                force=force,
                partition_by=["section", "datatype"],
            )
        finally:
            # release the rank's cached range partitioning even on a
            # failed write — long-lived sessions must not leak blocks
            dict_terms._zwr_release()
    report.stages.append(res)
    dict_terms = catalog.read("dict_terms")

    # S3 encode + SPO materialize -----------------------------------------
    # quad input (a `g` column): the full (s,p,o,g) encode is published
    # as quads_spog — GRAPH/FROM queries read it (sparql.algebra) — and
    # the triple tables carry the graph-projected statements, so every
    # triple-shaped stage (OPS/PSO/stats/header) is unchanged
    with_quads = "g" in triples_str.columns
    fp2 = _fingerprint(fp1, "encode", str(res.rows))
    res = None if force else _resume(catalog, "triples_spo", fp2)
    if res is None:
        if with_quads:
            encq = encode_triples(
                triples_str, dict_terms, assume_distinct=True
            )
            catalog.write_stage(
                "quads_spog",
                encq.repartition(
                    *([num_partitions] if num_partitions else []), "g"
                ).sortWithinPartitions("g", "s", "p", "o"),
                fp2,
                force=force,
            )
            enc = encq.drop("g").dropDuplicates(["s", "p", "o"])
        else:
            # the extraction stage emits distinct triples by construction
            enc = encode_triples(
                triples_str, dict_terms, assume_distinct=True
            )
        # spo_table's repartitionByRange runs a boundary-SAMPLING pass
        # that fully recomputes its narrow child — without this persist
        # the whole encode (string scan + two hash joins) executes TWICE
        # per write (guide §2.4: don't compute things you throw away).
        # The cache is ~3 longs/row, populated by the sample pass itself.
        enc = enc.persist()
        try:
            res = catalog.write_stage(
                "triples_spo",
                spo_table(enc, num_partitions=num_partitions),
                fp2,
                sort_cols=["s", "p", "o"],
                force=force,
            )
        finally:
            enc.unpersist()
    report.stages.append(res)
    report.n_triples = res.rows
    # one persist serves every downstream consumer (OPS re-sort's sample
    # + shuffle passes, optional PSO, both stats aggregates, header
    # count) — 5-6 parquet re-decodes otherwise; released before return
    triples_spo = catalog.read("triples_spo").persist()
    try:

        # S4 OPS materialize ----------------------------------------------------
        fp3 = _fingerprint(fp2, "ops", str(res.rows))
        res = None if force else _resume(catalog, "triples_ops", fp3)
        if res is None:
            res = catalog.write_stage(
                "triples_ops",
                ops_table(triples_spo, num_partitions=num_partitions),
                fp3,
                sort_cols=["o", "p", "s"],
                force=force,
            )
        report.stages.append(res)

        # S4b optional PSO materialize (?P? / ?PS access path) -------------------
        if with_pso:
            fp3b = _fingerprint(fp2, "pso", str(report.n_triples))
            res = None if force else _resume(catalog, "triples_pso", fp3b)
            if res is None:
                res = catalog.write_stage(
                    "triples_pso",
                    pso_table(triples_spo, num_partitions=num_partitions),
                    fp3b,
                    sort_cols=["p", "s", "o"],
                    force=force,
                )
            report.stages.append(res)

        # S5 stats + header ----------------------------------------------------
        if with_stats:
            fp4 = _fingerprint(fp3, "stats")
            for name, fn in (
                ("predicate_index", predicate_index),
                ("object_index", object_index),
                (
                    "header",
                    lambda t: build_header(
                        triples_str, catalog.read("dict_terms"), t,
                        n_triples=report.n_triples,
                    ),
                ),
            ):
                res = None if force else _resume(catalog, name, fp4)
                if res is None:
                    res = catalog.write_stage(name, fn(triples_spo), fp4, force=force)
                report.stages.append(res)


    finally:
        triples_spo.unpersist()
    report.wall_s = time.time() - t_start
    return report


def incremental_update(
    spark: SparkSession,
    catalog: Catalog,
    new_docs: DataFrame,
    source_kind: str = "documents",
    batch_fingerprint: str = "",
    num_partitions: int | None = None,
) -> PipelineReport:
    """KCat-style compaction of a new document batch into the PUBLISHED
    tables — the reference's CatTree incremental generation (§2D,
    CatTreeImpl.doGenerationSync: build a chunk HDT, then cat it with
    the accumulated one). The batch is extracted + dictionary-encoded
    in its OWN ID space, merged with the published dataset through the
    KCat id-remap path (merge/kcat.py: merged dictionary from the term
    tables, integer remap joins for the triples), and dict/SPO/OPS plus
    EVERY derived table the pipeline may have published (PSO, predicate
    /object stats, header) are republished — a merge that left stats
    describing the pre-merge dataset would silently mis-plan every
    subsequent ?P? scan. Identity proven in tests:
    pipeline(A) + incremental_update(B) == pipeline(A ∪ B).
    """
    extractor = (
        extract_triples_from_documents
        if source_kind == "documents"
        else extract_triples_from_pages
    )
    return incremental_update_triples(
        spark,
        catalog,
        extractor(new_docs),
        batch_fingerprint=_fingerprint(
            "incremental", source_kind, batch_fingerprint
        ),
        num_partitions=num_partitions,
    )


def incremental_update_triples(
    spark: SparkSession,
    catalog: Catalog,
    new_tri: DataFrame,
    batch_fingerprint: str = "",
    num_partitions: int | None = None,
) -> PipelineReport:
    """incremental_update for a PRE-EXTRACTED string-triple batch —
    the entry point the streaming ingest-compact path uses (staging
    generations are already triples; CatTreeImpl merges chunk HDTs the
    same way without re-parsing the source). new_tri must be distinct
    on (s,p,o) — streaming.compact_staging guarantees it; overlap with
    the PUBLISHED data is fine (the merge is a set union)."""
    from qendpoint_spark.encoding import build_header
    from qendpoint_spark.merge import merge_datasets, merge_incremental

    t_start = time.time()
    report = PipelineReport()
    new_dict = build_dictionary(new_tri, num_partitions=num_partitions)
    new_enc = encode_triples(new_tri, new_dict, assume_distinct=True)
    base = (catalog.read("triples_spo"), catalog.read("dict_terms"))
    # strategy: a SMALL batch (the CatTree compaction norm) goes through
    # the delta-proportional breakpoint merge — shuffle ∝ |batch|; a
    # large batch falls back to the general k-way int-remap merge
    # (outputs are identical; property-tested in test_incremental_cat)
    n_delta_terms = new_dict.count()
    if n_delta_terms <= 2_000_000:
        merged_dict, merged_triples = merge_incremental(
            base, (new_enc, new_dict), max_delta_terms=2_000_000
        )
    else:
        merged_dict, merged_triples, _ = merge_datasets(
            [base, (new_enc, new_dict)], num_partitions=num_partitions
        )
    # The merged plans lazily read the CURRENT published tables, which
    # the republish below overwrites — materialize both first. (A
    # versioned table format — Iceberg snapshots — would let the new
    # version be written while readers pin the old one; the os.rename
    # Catalog has no snapshots, so the cut is explicit here.)
    merged_dict = merged_dict.localCheckpoint(eager=True)
    merged_triples = merged_triples.localCheckpoint(eager=True)
    fp = batch_fingerprint or _fingerprint("incremental", "triples")
    report.stages.append(
        catalog.write_stage(
            "dict_terms",
            with_datatype(merged_dict),
            fp,
            force=True,
            partition_by=["section", "datatype"],
        )
    )
    res = catalog.write_stage(
        "triples_spo",
        spo_table(merged_triples, num_partitions=num_partitions),
        fp,
        sort_cols=["s", "p", "o"],
        force=True,
    )
    report.stages.append(res)
    report.n_triples = res.rows
    # same multi-consumer persist as run_pipeline (OPS/PSO/stats/header)
    triples_spo = catalog.read("triples_spo").persist()
    report.stages.append(
        catalog.write_stage(
            "triples_ops",
            ops_table(triples_spo, num_partitions=num_partitions),
            fp,
            sort_cols=["o", "p", "s"],
            force=True,
        )
    )
    # refresh every derived table that exists in the catalog so nothing
    # keeps describing the pre-merge dataset
    if os.path.exists(catalog.table_path("triples_pso")):
        report.stages.append(
            catalog.write_stage(
                "triples_pso",
                pso_table(triples_spo, num_partitions=num_partitions),
                fp,
                sort_cols=["p", "s", "o"],
                force=True,
            )
        )
    for name, fn in (
        ("predicate_index", predicate_index),
        ("object_index", object_index),
    ):
        if os.path.exists(catalog.table_path(name)):
            report.stages.append(
                catalog.write_stage(name, fn(triples_spo), fp, force=True)
            )
    if os.path.exists(catalog.table_path("header")):
        from qendpoint_spark.encoding import decode_triples

        merged_str = decode_triples(
            triples_spo, catalog.read("dict_terms")
        )
        report.stages.append(
            catalog.write_stage(
                "header",
                build_header(
                    merged_str, catalog.read("dict_terms"), triples_spo,
                    n_triples=report.n_triples,
                ),
                fp,
                force=True,
            )
        )
    triples_spo.unpersist()
    report.wall_s = time.time() - t_start
    return report
