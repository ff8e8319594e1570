"""N-Triples text ingest (reference RDFParserSimple.doParse,
qendpoint-core rdf/parsers/RDFParserSimple.java:48-110).

`spark.read.text` + a JVM-side line regex tokenize each statement into
its three terms; IRIs drop their angle brackets, literals and bnodes
pass through in the engine's internal lexical form ('"v"', '"v"@lang',
'"v"^^<dt>', '_:b0') — the same forms the extraction stage emits, so a
parsed file feeds build_dictionary/encode_triples unchanged.

Escape handling: N-Triples allows raw UTF-8 AND \\uXXXX/\\UXXXXXXXX
numeric escapes plus the string escapes \\t \\n \\r \\" \\\\ (reference
UnicodeEscape.java). Lines are SPLIT into a no-backslash frame (term
extraction stays entirely in the JVM — Catalyst would otherwise hoist
a conditional UDF into an ArrowEvalPython node evaluated for every
row) and an escaped frame whose terms run through one Arrow-batched
pandas UDF; the union is the parse. Malformed numeric escapes pass
through unchanged (per-term leniency, matching the parser's
line-oriented leniency).

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
# N-Quads: same line with an OPTIONAL graph label (IRI or bnode) —
# reference RDFParserSimple handles .nq through the same line parser
_GRAPH = r"(<[^>]*>|_:[^\s]+)?"
_QLINE = rf"^\s*{_TERM}\s+{_TERM}\s+{_TERM}\s*(?:\s{_GRAPH})?\s*\.\s*$"

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
                try:  # malformed escape -> pass through (leniency)
                    out.append(chr(int(t[i + 2 : i + 6], 16)))
                    i += 6
                    continue
                except ValueError:
                    pass
            if nxt == "U" and i + 10 <= n:
                try:
                    out.append(chr(int(t[i + 2 : i + 10], 16)))
                    i += 10
                    continue
                except (ValueError, OverflowError):
                    pass
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


def _term_col(raw: str, unescape: bool):
    c = F.col(raw)
    if unescape:
        c = _nt_unescape(c)
    # IRIs lose their angle brackets (internal form is the bare IRI)
    return F.when(
        c.startswith("<"), c.substr(F.lit(2), F.length(c) - 2)
    ).otherwise(c)


def _parse_lines(lines: DataFrame) -> DataFrame:
    """Tokenized lines -> (s,p,o): the no-backslash rows project with
    pure JVM expressions; only rows containing an escape pass through
    the Arrow-batched unescape UDF (split frames, because Catalyst
    hoists a UDF out of a conditional and would run it on every row)."""
    parsed = (
        lines.select(
            F.regexp_extract("value", _LINE, 1).alias("s_raw"),
            F.regexp_extract("value", _LINE, 2).alias("p_raw"),
            F.regexp_extract("value", _LINE, 3).alias("o_raw"),
        )
        .filter(
            (F.col("s_raw") != "") & (F.col("p_raw") != "") & (F.col("o_raw") != "")
        )
    )
    has_esc = (
        F.col("s_raw").contains("\\")
        | F.col("p_raw").contains("\\")
        | F.col("o_raw").contains("\\")
    )

    def project(df: DataFrame, unescape: bool) -> DataFrame:
        return df.select(
            _term_col("s_raw", unescape).alias("s"),
            _term_col("p_raw", unescape).alias("p"),
            _term_col("o_raw", unescape).alias("o"),
        )

    return project(parsed.filter(~has_esc), False).unionByName(
        project(parsed.filter(has_esc), True)
    )


def read_ntriples(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """Parse N-Triples file(s) (path, glob, or list of paths; Spark
    decompresses .gz/.bz2/... transparently, .xz/.lzma decode through
    the Python shim) into triples_str(s, p, o). Distributed: one task
    per text split (one per FILE for the non-splittable xz path)."""
    paths = [path] if isinstance(path, str) else list(path)
    xz = [p for p in paths if p.lower().endswith(_PY_CODECS)]
    rest = [p for p in paths if not p.lower().endswith(_PY_CODECS)]
    parts = []
    if rest:
        parts.append(_parse_lines(spark.read.text(rest)))
    if xz:
        parts.append(_parse_lines(_read_xz_lines(spark, xz)))
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    return out


def _parse_quad_lines(lines: DataFrame) -> DataFrame:
    """Tokenized N-Quads lines -> (s,p,o,g). A line without a graph
    label is a default-graph statement: g = NULL (the SPARQL dataset
    model's unnamed graph; the pipeline publishes named-graph rows to
    quads_spog and treats the union as the default graph)."""
    parsed = (
        lines.select(
            F.regexp_extract("value", _QLINE, 1).alias("s_raw"),
            F.regexp_extract("value", _QLINE, 2).alias("p_raw"),
            F.regexp_extract("value", _QLINE, 3).alias("o_raw"),
            F.regexp_extract("value", _QLINE, 4).alias("g_raw"),
        )
        .filter(
            (F.col("s_raw") != "")
            & (F.col("p_raw") != "")
            & (F.col("o_raw") != "")
        )
    )
    has_esc = (
        F.col("s_raw").contains("\\")
        | F.col("p_raw").contains("\\")
        | F.col("o_raw").contains("\\")
    )

    def project(df: DataFrame, unescape: bool) -> DataFrame:
        g = _term_col("g_raw", False)
        return df.select(
            _term_col("s_raw", unescape).alias("s"),
            _term_col("p_raw", unescape).alias("p"),
            _term_col("o_raw", unescape).alias("o"),
            F.when(F.col("g_raw") != "", g).alias("g"),
        )

    return project(parsed.filter(~has_esc), False).unionByName(
        project(parsed.filter(has_esc), True)
    )


def read_nquads(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """Parse N-Quads file(s) into (s, p, o, g) — g NULL for
    default-graph lines. The quad pipeline (run_pipeline with a `g`
    column) encodes the G section and publishes quads_spog for
    GRAPH/FROM queries."""
    return _parse_quad_lines(spark.read.text(path))


def _read_xz_lines(spark: SparkSession, paths: list[str]) -> DataFrame:
    """xz/lzma N-Triples: Spark ships no xz codec (CompressionType.java
    lists xz/lzma; Hadoop needs the external XZCodec), so files load as
    binaryFile rows — parallel ACROSS files, like every non-splittable
    codec (plain .gz behaves the same in Spark) — and an Arrow-batched
    mapInPandas decompresses with the stdlib lzma module and emits
    lines. Shard big dumps into many .xz files for parallelism, which
    is how they ship anyway."""
    blobs = spark.read.format("binaryFile").load(paths).select("content")
    return _expand_xz(blobs)


def _expand_xz(blobs: DataFrame) -> DataFrame:
    """binaryFile rows (content) -> decompressed text lines."""

    def expand(batches):
        import lzma

        for pdf in batches:
            out: list[str] = []
            for content in pdf["content"]:
                text = lzma.decompress(bytes(content)).decode(
                    "utf-8", errors="replace"
                )
                out.extend(text.splitlines())
            yield pd.DataFrame({"value": out})

    return blobs.mapInPandas(expand, "value string")


# --- container sources + format guess ------------------------------------
#
# Reference: RDFNotation.guess (extension -> notation,
# core/enums/RDFNotation.java:113-201), RDFParserDir/List container
# parsers, and CompressionType transparent decompression. Spark's text
# reader natively decodes .gz/.bz2/.lz4/.zstd/.snappy per file, and a
# directory/glob path IS the dir container; the list container maps to
# "read the list file, then pass its entries as one multi-path load".

_TEXT_CODECS = (".gz", ".bz2", ".lz4", ".zst", ".zstd", ".snappy", ".deflate")
# codecs Spark has no native decoder for; decoded Python-side via the
# stdlib lzma module (CompressionType.java:34-58 lists xz/lzma)
_PY_CODECS = (".xz", ".lzma")


def guess_format(path: str) -> str:
    """Extension -> source kind ('ntriples' | 'parquet' | 'list' |
    'dir'). Codec suffixes are transparent, as in the reference."""
    p = path.rstrip("/").lower()
    for codec in _TEXT_CODECS + _PY_CODECS:
        if p.endswith(codec):
            p = p[: -len(codec)]
            break
    if p.endswith((".nt", ".ntriples")):
        return "ntriples"
    if p.endswith((".nq", ".nquads")):
        return "nquads"
    if p.endswith((".ttl", ".turtle")):
        return "turtle"
    if p.endswith(".trig"):
        return "trig"
    if p.endswith((".rdf", ".owl", ".rdfxml")):
        return "rdfxml"
    if p.endswith((".jsonld", ".json-ld")):
        return "jsonld"
    if p.endswith(".zip") or p.endswith((".tar", ".tar.gz", ".tgz", ".tar.bz2")):
        return "archive"
    if p.endswith(".parquet"):
        return "parquet"
    if p.endswith(".df"):
        return "deltafile"
    if p.endswith(".list"):
        return "list"
    if p.endswith(".rar"):
        # the reference reads rar via the junrar library
        # (RDFParserRAR.java); no rar codec ships in this sandbox and
        # pip installs are prohibited — explicit, loud exclusion
        raise NotImplementedError(
            "rar containers need an unrar codec unavailable here; "
            "repack as zip/tar (read_ntriples_archive)"
        )
    return "dir"


def read_rdf_source(spark: SparkSession, path: str) -> DataFrame:
    """Container-aware triple source: N-Triples file(s) (optionally
    compressed), a parquet triple table, a .list file of paths (the
    RDFParserList analog), or a directory/glob of any of these."""
    kind = guess_format(path)
    if kind == "ntriples":
        return read_ntriples(spark, path)
    if kind == "nquads":
        return read_nquads(spark, path)
    if kind == "turtle":
        from qendpoint_spark.sources.turtle import read_turtle

        return read_turtle(spark, path)
    if kind == "trig":
        from qendpoint_spark.sources.turtle import read_trig

        return read_trig(spark, path)
    if kind == "rdfxml":
        from qendpoint_spark.sources.rdfxml import read_rdfxml

        return read_rdfxml(spark, path)
    if kind == "jsonld":
        from qendpoint_spark.sources.jsonld import read_jsonld

        return read_jsonld(spark, path)
    if kind == "archive":
        return read_ntriples_archive(spark, path)
    if kind == "deltafile":
        from qendpoint_spark.sources.deltafile import read_delta_file

        return read_delta_file(spark, path)
    if kind == "parquet":
        return spark.read.parquet(path).select("s", "p", "o")
    if kind == "list":
        entries = [r.value.strip() for r in spark.read.text(path).collect()]
        entries = [e for e in entries if e and not e.startswith("#")]
        nt = [e for e in entries if guess_format(e) == "ntriples"]
        ar = [e for e in entries if guess_format(e) == "archive"]
        pq = [e for e in entries if guess_format(e) == "parquet"]
        parts = []
        if nt:
            parts.append(read_ntriples(spark, nt))  # multi-path load
        parts.extend(
            spark.read.parquet(e).select("s", "p", "o") for e in pq
        )
        parts.extend(read_ntriples_archive(spark, e) for e in ar)
        if not parts:
            raise ValueError(f"list file {path} contains no readable entries")
        out = parts[0]
        for df in parts[1:]:
            out = out.unionByName(df)
        return out
    # directory: recursive glob over N-Triples members
    return read_ntriples_dir(spark, path)


def read_ntriples_dir(spark: SparkSession, path: str) -> DataFrame:
    """Directory container (RDFParserDir analog): every *.nt member —
    compressed or not — parsed recursively in one distributed load;
    .nt.xz/.nt.lzma members take the Python lzma shim branch (Spark's
    text reader would consume their raw bytes as garbage)."""
    text_lines = (
        spark.read.option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.nt*")
        .text(path)
        .filter(~F.lower(F.input_file_name()).rlike(r"\.(xz|lzma)$"))
    )
    out = _parse_lines(text_lines)
    xz_blobs = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.nt.{xz,lzma}")
        .load(path)
        .select("content")
    )
    if xz_blobs.take(1):
        out = out.unionByName(_parse_lines(_expand_xz(xz_blobs)))
    return out


# --- archive containers (zip / tar) ---------------------------------------
#
# Reference: RDFParserZip.java / RDFParserTar.java stream archive
# members through the inner parser. Spark's text reader cannot open
# archive members, so archives load as `binaryFile` rows (one row per
# archive, read in parallel across archives) and a mapInPandas expander
# yields each .nt member's lines; member-level .gz/.bz2 compression is
# decoded inline. Per-archive memory is bounded by the largest member,
# mirroring the reference's streaming constraint — shard huge dumps
# into many archives, which is how crawl dumps ship anyway.

_ARCHIVE_SUFFIXES = (".zip", ".tar", ".tar.gz", ".tgz", ".tar.bz2")


def _member_lines(name: str, data: bytes):
    """Decode one archive member to text lines if it looks like
    N-Triples (any codec suffix handled); else return None."""
    import bz2 as _bz2
    import gzip as _gzip

    n = name.lower()
    if n.endswith(".gz"):
        data, n = _gzip.decompress(data), n[:-3]
    elif n.endswith((".bz2",)):
        data, n = _bz2.decompress(data), n[:-4]
    elif n.endswith(".xz") or n.endswith(".lzma"):
        import lzma as _lzma

        data, n = _lzma.decompress(data), n[: n.rindex(".")]
    if not n.endswith((".nt", ".ntriples")):
        return None
    return data.decode("utf-8", errors="replace").splitlines()


def read_ntriples_archive(spark: SparkSession, path: str) -> DataFrame:
    """Zip/tar container source: every *.nt member (optionally
    member-compressed) of every archive under `path` parses exactly as
    a flat-directory load would (RDFParserZip/RDFParserTar analog)."""
    import io
    import tarfile
    import zipfile

    def expand(batches):
        for pdf in batches:
            out: list[str] = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                blob = bytes(content)
                low = fname.lower()
                if low.endswith(".zip"):
                    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
                        for info in zf.infolist():
                            if info.is_dir():
                                continue
                            lines = _member_lines(info.filename, zf.read(info))
                            if lines:
                                out.extend(lines)
                else:  # tar family; 'r:*' sniffs the compression
                    with tarfile.open(fileobj=io.BytesIO(blob), mode="r:*") as tf:
                        for member in tf:
                            if not member.isfile():
                                continue
                            lines = _member_lines(
                                member.name, tf.extractfile(member).read()
                            )
                            if lines:
                                out.extend(lines)
            yield pd.DataFrame({"value": out})

    archives = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.{zip,tar,tar.gz,tgz,tar.bz2}")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path", "content")
    )
    lines = archives.mapInPandas(expand, "value string")
    return _parse_lines(lines)
