"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: full KG-construction pipeline on sf0.001
                (extract → four-section dictionary → encode → SPO).
queries()     — one entry per implemented operator (SURVEY.md §2).
oracle_sql()  — exact DuckDB ANSI-SQL equivalents; the whole pipeline
                is SQL-expressible by design, so correctness checks are
                value-exact, not rows-only.
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

QUERIES = {**QUERIES, **OPS_QUERIES, **REL_QUERIES, **SPARQL_QUERIES}
ORACLES = {**ORACLES, **OPS_ORACLES, **REL_ORACLES, **SPARQL_ORACLES}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: encode the sf0.001 documents corpus into the HDT-style
    SPO ID-triple table."""
    return QUERIES["kg_encode_spo"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
