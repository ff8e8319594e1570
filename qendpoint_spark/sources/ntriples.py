"""N-Triples text ingest (reference RDFParserSimple.doParse,
qendpoint-core rdf/parsers/RDFParserSimple.java:48-110).

`spark.read.text` + a JVM-side line regex tokenize each statement into
its three terms; IRIs drop their angle brackets, literals and bnodes
pass through in the engine's internal lexical form ('"v"', '"v"@lang',
'"v"^^<dt>', '_:b0') — the same forms the extraction stage emits, so a
parsed file feeds build_dictionary/encode_triples unchanged.

Escape handling: N-Triples allows raw UTF-8 AND \\uXXXX/\\UXXXXXXXX
numeric escapes plus the string escapes \\t \\n \\r \\" \\\\ (reference
UnicodeEscape.java). The unescape is a vectorized pandas UDF applied
ONLY to terms that actually contain a backslash — the hot path (no
escapes, the overwhelming majority of a real crawl) never leaves the
JVM, and the escape path is Arrow-batched.

Malformed lines, comments (#...) and blank lines are skipped, matching
the reference parser's line-oriented leniency.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# one N-Triples term: IRI | bnode | literal (with optional datatype/lang)
_TERM = r'(<[^>]*>|_:[^\s]+|"(?:[^"\\]|\\.)*"(?:\^\^<[^>]*>|@[A-Za-z0-9\-]+)?)'
_LINE = rf"^\s*{_TERM}\s+{_TERM}\s+{_TERM}\s*\.\s*$"

_STRING_ESCAPES = {
    "t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


def _unescape_one(t: str) -> str:
    out: list[str] = []
    i, n = 0, len(t)
    while i < n:
        c = t[i]
        if c == "\\" and i + 1 < n:
            nxt = t[i + 1]
            if nxt == "u" and i + 6 <= n:
                out.append(chr(int(t[i + 2 : i + 6], 16)))
                i += 6
                continue
            if nxt == "U" and i + 10 <= n:
                out.append(chr(int(t[i + 2 : i + 10], 16)))
                i += 10
                continue
            if nxt in _STRING_ESCAPES:
                out.append(_STRING_ESCAPES[nxt])
                i += 2
                continue
        out.append(c)
        i += 1
    return "".join(out)


@F.pandas_udf(T.StringType())
def _nt_unescape(s: pd.Series) -> pd.Series:
    return s.map(lambda t: _unescape_one(t) if t is not None else None)


def _term_col(raw: str):
    c = F.col(raw)
    # unescape only when needed; keeps the no-escape path JVM-only
    c = F.when(c.contains("\\"), _nt_unescape(c)).otherwise(c)
    # IRIs lose their angle brackets (internal form is the bare IRI)
    return F.when(
        c.startswith("<"), c.substr(F.lit(2), F.length(c) - 2)
    ).otherwise(c)


def read_ntriples(spark: SparkSession, path: str) -> DataFrame:
    """Parse an N-Triples file (or directory/glob of files) into
    triples_str(s, p, o). Distributed: one task per text split."""
    lines = spark.read.text(path)
    parsed = lines.select(
        F.regexp_extract("value", _LINE, 1).alias("s_raw"),
        F.regexp_extract("value", _LINE, 2).alias("p_raw"),
        F.regexp_extract("value", _LINE, 3).alias("o_raw"),
    ).filter((F.col("s_raw") != "") & (F.col("p_raw") != "") & (F.col("o_raw") != ""))
    return parsed.select(
        _term_col("s_raw").alias("s"),
        _term_col("p_raw").alias("p"),
        _term_col("o_raw").alias("o"),
    )
