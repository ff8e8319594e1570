"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: full KG-construction pipeline on sf0.001
                (extract → four-section dictionary → encode → SPO).
queries()     — one entry per implemented operator (SURVEY.md §2).
oracle_sql()  — exact DuckDB ANSI-SQL equivalents; the whole pipeline
                is SQL-expressible by design, so correctness checks are
                value-exact, not rows-only.

Ordering contract: the driver grades the FIRST 50 entries of queries()
in insertion order.  The registry has grown past 50 rows, so the merge
below rotates the window each round: rows that have never received a
driver hash-verdict come first (round 4: the 23 sparql_* rows, 8 rel_*
rows, 4 stream_* rows, plus every row newly added this round), then a
small set of regression canaries (kg_encode_spo, kg_dictionary,
kg_cat_identity), then everything that is already driver-green from a
previous round.  Across rounds every row earns at least one
type-sensitive driver hash-pass.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from qendpoint_spark.entry_queries import ORACLES, QUERIES  # noqa: E402
from qendpoint_spark.ops_queries import OPS_ORACLES, OPS_QUERIES  # noqa: E402
from qendpoint_spark.rel_queries import REL_ORACLES, REL_QUERIES  # noqa: E402
from qendpoint_spark.sparql_queries import (  # noqa: E402
    SPARQL_ORACLES,
    SPARQL_QUERIES,
)

_ALL_QUERIES = {**QUERIES, **OPS_QUERIES, **REL_QUERIES, **SPARQL_QUERIES}
_ALL_ORACLES = {**ORACLES, **OPS_ORACLES, **REL_ORACLES, **SPARQL_ORACLES}

# Last round in which each row earned a driver hash-verdict.  After round
# 4 every registry row has at least one; the window now rotates by evidence
# AGE: new rows (no verdict yet) first, then the rows whose only verdict is
# round 2, then canaries, then round-3 rows, then round-4 rows.
_GRADED_R2_ONLY = {
    "dedup_embedding_lsh", "kg_entity_link", "kg_entity_link_blocked",
    "kg_canonicalize_cc", "kg_canonical_triples", "quality_filter",
    "dedup_keepers", "dedup_minhash_accuracy",
    "rel_agg_pricing_summary", "rel_join_revenue_by_nation",
    "rel_window_topk_orders", "rel_window_running_balance",
}
_GRADED_R4 = {
    "dedup_lsh_quality", "kg_cat_identity", "kg_dictionary",
    "kg_encode_spo", "kg_extract_triples", "kg_hdt_file_roundtrip",
    "kg_pattern_scan_o", "kg_pattern_scan_p", "kg_quads_encode",
    "rel_exists_late_orders", "rel_lead_lag_gaps", "rel_ntile_quartiles",
    "rel_rank_distribution", "rel_rollup_order_stats",
    "rel_scalar_subquery_small_qty", "rel_sessionize_events",
    "rel_setops_customer_segments", "rel_setops_intersect_except",
    "sparql_agg_having", "sparql_ask", "sparql_construct",
    "sparql_describe", "sparql_distinct_indep_order",
    "sparql_distinct_order_limit", "sparql_exists",
    "sparql_filter_numeric", "sparql_filter_str", "sparql_graph_const",
    "sparql_graph_var", "sparql_group_concat", "sparql_isblank",
    "sparql_minus", "sparql_negated_pset", "sparql_not_exists",
    "sparql_optional", "sparql_order_numeric", "sparql_path_inverse",
    "sparql_path_seq", "sparql_path_zero_or_one", "sparql_sample",
    "sparql_select_join", "sparql_subquery", "sparql_union",
    "sparql_update_apply", "sparql_values_bind", "sparql_values_undef",
    "stream_events_window", "stream_first_seen", "stream_ingest_compact",
    "stream_sessionize_events",
}
# Everything graded but in neither set above was last graded in round 3.
_DRIVER_GREEN = _GRADED_R2_ONLY | _GRADED_R4 | {
    "kg_pattern_scan_sp", "kg_header", "kg_ntriples_export",
    "kg_datatype_sections", "kg_pfc_sections", "kg_psfc_sections",
    "kg_ops_index", "kg_adjacency_bits", "kg_predicate_index",
    "kg_object_index", "kg_decode_roundtrip", "kg_shared_section",
    "kg_cat_incremental", "kg_cat_incremental_dict", "kg_pattern_scan_so",
    "kg_pattern_scan_po", "kg_sorted_orders", "kg_diff", "kg_bgp_join",
    "kg_bgp_star", "kg_bgp_optional", "kg_bgp_minus", "kg_path_seq",
    "kg_path_inv_alt", "kg_path_closure", "kg_path_bounded",
    "kg_ntriples_ingest",
    "dedup_exact", "text_stats", "token_counts", "lang_id",
    "doc_fingerprint", "dedup_ngram_jaccard", "dedup_minhash_signatures",
    "dedup_minhash_lsh", "dedup_simhash", "dedup_embedding",
    "sim_topk_bruteforce", "sim_topk_lsh", "sim_topk_ivf",
    "multimodal_features", "multimodal_resize", "multimodal_frames",
}

# Regression canaries: keep a driver verdict on the pipeline core every
# round even while the window rotates.
_CANARIES = ["kg_encode_spo", "kg_dictionary", "kg_cat_identity"]


def _rotated(names: list[str]) -> list[str]:
    def tier(n: str) -> int:
        if n in _CANARIES:
            return 2
        if n not in _DRIVER_GREEN:
            return 0          # new this round: always in-window
        if n in _GRADED_R2_ONLY:
            return 1          # two rounds on local evidence only
        if n in _GRADED_R4:
            return 4          # freshest evidence: back of the line
        return 3              # last graded round 3
    return sorted(names, key=lambda n: (tier(n), names.index(n)))


_ORDER = _rotated(list(_ALL_QUERIES))
QUERIES = {n: _ALL_QUERIES[n] for n in _ORDER}
ORACLES = {n: _ALL_ORACLES[n] for n in _ORDER if n in _ALL_ORACLES}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: encode the sf0.001 documents corpus into the HDT-style
    SPO ID-triple table."""
    return QUERIES["kg_encode_spo"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
