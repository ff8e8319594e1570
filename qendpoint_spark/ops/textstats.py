"""Text-analysis operators for a training-data pipeline over `documents`.

All operators are pure column expressions (whole-stage codegen, no
Python in the hot path) and are deliberately expressible in ANSI SQL so
the DuckDB oracle checks values exactly. Tokenization matches the KG
extraction grammar (split on single space).

Cross-engine determinism notes:
- hashes: first 8 hex chars of md5 parsed as a base-16 integer —
  identical in Spark (conv(...,16,10)) and DuckDB (('0x'||..)::BIGINT);
- ratios: single IEEE-double division + round(6), bit-identical across
  engines;
- fingerprints: integer arithmetic mod a prime, no float accumulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "and"]
LANG_MARKERS = {
    "en": ["the", "of"],
    "de": ["der", "und"],
    "es": ["el", "los"],
    "fr": ["le", "les"],
}
FP_PRIME = 2147483647  # 2^31 - 1


def _tokens(col):
    return F.split(F.coalesce(col, F.lit("")), " ")


def _hash8(col):
    """First 8 md5 hex chars as int — the portable token hash."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def round6_exact(numer, denom):
    """round(numer/denom, 6) with EXACT integer half-up rounding:
    (numer*2e6 + denom) div (2*denom) / 1e6. `round(double, 6)` is NOT
    cross-engine stable when the true ratio lands exactly on a half at
    the 7th decimal (e.g. 0.96 * 91/96 * 27/96 = 0.2559375 — Spark's
    BigDecimal HALF_UP says ...938, DuckDB's float path says ...937;
    found by running the oracle sweep at sf0.1). Both inputs must be
    integral and non-negative with numer*2e6 < 2^53 (the subtraction
    below makes the long division exact through doubles). DuckDB twin:
    ((numer)*2000000 + (denom)) // (2*(denom)) / 1000000.0"""
    x = numer.cast("long") * F.lit(2000000) + denom.cast("long")
    y = denom.cast("long") * F.lit(2)
    # exact integer division via pmod: (x - x mod y) is an exact
    # multiple of y, and IEEE division of exact multiples is exact
    q = (x - F.pmod(x, y)) / y
    return q / F.lit(1000000.0)


def token_counts(documents: DataFrame) -> DataFrame:
    """Whitespace tokens + BPE-ish regex token count per document."""
    toks = _tokens(F.col("text"))
    nonempty = F.filter(toks, lambda t: F.length(t) > 0)
    return documents.select(
        "doc_id",
        F.size(nonempty).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.coalesce(F.col("text"), F.lit("")), F.lit("[a-z0-9]+"), 0)).alias(
            "n_re_tokens"
        ),
        F.length(F.coalesce(F.col("text"), F.lit(""))).alias("n_chars_calc"),
    )


def text_stats(documents: DataFrame) -> DataFrame:
    """Quality-scoring features: token counts, average token length,
    stopword ratio, distinct-token ratio, and a fixed-formula quality
    score in [0,1]."""
    toks = F.filter(_tokens(F.col("text")), lambda t: F.length(t) > 0)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_distinct = F.size(F.array_distinct(toks))
    sum_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    base = documents.select(
        "doc_id",
        n.alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        n_distinct.alias("n_distinct"),
        sum_len.alias("sum_token_len"),
    )
    nz = F.greatest(F.col("n_tokens"), F.lit(1))
    # quality = min(n,100)/100 * (1 - stop/n) * (distinct/n), emitted
    # through the exact rational: min(n,100)*(n-stop)*distinct
    # over 100*nz*nz (all integers -> round6_exact is engine-stable)
    q_num = (
        F.least(F.col("n_tokens"), F.lit(100))
        * (nz - F.col("n_stopwords"))
        * F.col("n_distinct")
    )
    q_den = F.lit(100) * nz * nz
    return base.select(
        "doc_id",
        "n_tokens",
        round6_exact(F.col("sum_token_len"), nz).alias("avg_token_len"),
        round6_exact(F.col("n_stopwords"), nz).alias("stopword_ratio"),
        round6_exact(F.col("n_distinct"), nz).alias("distinct_ratio"),
        # fixed quality formula: long-enough, diverse, not stopword-soup
        round6_exact(q_num, q_den).alias("quality_score"),
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """Marker-token language ID (n-gram-heuristic family): count marker
    hits per language, argmax with deterministic tie-break on language
    code; no hits -> 'und'. Returns per-language counts too."""
    toks = F.filter(_tokens(F.col("text")), lambda t: F.length(t) > 0)

    def marker_count(markers):
        # bind via closure factory: Spark inspects lambda arity, so a
        # defaulted second parameter would be mis-bound to a Column
        arr = F.array(*[F.lit(m) for m in markers])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    counts = {lang: marker_count(m) for lang, m in LANG_MARKERS.items()}
    df = documents.select(
        "doc_id",
        F.col("lang").alias("declared_lang"),
        *[c.alias(f"cnt_{lang}") for lang, c in counts.items()],
    )
    best = F.greatest(*[F.col(f"cnt_{lang}") for lang in LANG_MARKERS])
    pred = F.lit("und")
    # iterate in reverse-alphabetical order so the earliest language
    # alphabetically wins ties (when applied last it overrides)
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when(
            (F.col(f"cnt_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return df.withColumn("pred_lang", pred)


def doc_fingerprint(documents: DataFrame) -> DataFrame:
    """Position-weighted rolling-hash fingerprint:
    fp = sum_i (i+1) * hash8(token_i) mod (2^31-1).

    Pure integer arithmetic -> identical across engines; position
    explode stays JVM-side (posexplode)."""
    toks = documents.select(
        "doc_id", F.posexplode(_tokens(F.col("text"))).alias("pos", "tok")
    ).filter(F.length("tok") > 0)
    return (
        toks.select(
            "doc_id",
            ((F.col("pos") + 1) * _hash8(F.col("tok"))).alias("w"),
        )
        .groupBy("doc_id")
        .agg((F.sum("w") % F.lit(FP_PRIME)).cast("long").alias("fingerprint"))
    )
