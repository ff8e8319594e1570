"""Write a binary `.hdt` container from the repo's stage tables.

Layout written (HDTBase.saveToHDT, core/hdt/impl/HDTBase.java:99-119):

    ControlInfo GLOBAL   <http://purl.org/HDT/hdt#HDTv1>
    ControlInfo HEADER   "ntriples" {length=N}  + N bytes of N-Triples
    ControlInfo DICTIONARY <...#dictionaryFour> {elements=N}
        PFC section: shared   (SH terms, byte-sorted, ids 1..|SH|)
        PFC section: subjects (S-only terms, ids |SH|+1..)
        PFC section: predicates (ids 1..|P|)
        PFC section: objects  (O-only terms, ids |SH|+1..)
    ControlInfo TRIPLES  <...#triplesBitmap> {order=1 (SPO)}
        bitY bitmap, bitZ bitmap, vectorY seq, vectorZ seq
        (WriteBitmapTriples.java:79-98; adjacency semantics :202-309 —
        bitY[i]=1 iff y[i] is the last predicate of its subject,
        bitZ[i]=1 iff z[i] is the last object of its (s,p) list)

The container is a single sequential stream BY FORMAT — the reference
writes it the same way (one thread, one OutputStream). The distributed
work (dictionary ranking, triple encoding, SPO sort) happened upstream
in Spark; this writer only *streams* the sorted Parquet outputs through
`toLocalIterator`, so driver memory stays one partition deep for terms
and O(#triples ids) for the adjacency vectors being packed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qendpoint_spark.hdt import binary as B

_SECTION_ORDER = ["SH", "S", "P", "O"]  # file order: shared,S,P,O


def _section_terms(dict_terms: DataFrame, section: str):
    """Terms of one section in id order, as UTF-8 bytes. Spark's string
    ordering is code-point order == UTF-8 byte order, the same order
    the reference's ByteString comparator produces, so sec_rank IS the
    byte-sorted rank."""
    rows = (
        dict_terms.filter(F.col("section") == section)
        .orderBy("sec_rank")
        .select("term")
        .toLocalIterator()
    )
    return (r["term"].encode("utf-8") for r in rows)


def _default_header(counts: dict[str, int], total_triples: int) -> str:
    """Minimal valid header: the void/hdt statistics the reference
    publishes (HDTImpl populateHeaderStructure)."""
    base = "_:statistics"
    fmt = "_:format"
    ds = "<file://dataset.hdt>"
    lines = [
        f"{ds} <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> "
        "<http://purl.org/HDT/hdt#Dataset> .",
        f"{ds} <http://rdfs.org/ns/void#triples> "
        f'"{total_triples}" .',
        f"{ds} <http://rdfs.org/ns/void#properties> "
        f'"{counts["P"]}" .',
        f"{ds} <http://rdfs.org/ns/void#distinctSubjects> "
        f'"{counts["SH"] + counts["S"]}" .',
        f"{ds} <http://rdfs.org/ns/void#distinctObjects> "
        f'"{counts["SH"] + counts["O"]}" .',
        f"{ds} <http://purl.org/HDT/hdt#statisticalInformation> {base} .",
        f"{ds} <http://purl.org/HDT/hdt#formatInformation> {fmt} .",
        f"{fmt} <http://purl.org/HDT/hdt#dictionary> "
        "<http://purl.org/HDT/hdt#dictionaryFour> .",
        f"{fmt} <http://purl.org/HDT/hdt#triples> "
        "<http://purl.org/HDT/hdt#triplesBitmap> .",
    ]
    return "\n".join(lines) + "\n"


def write_hdt(
    dict_terms: DataFrame,
    enc: DataFrame,
    path: str,
    blocksize: int = 16,
) -> dict:
    """Serialize (dict_terms, encoded triples) as a `.hdt` file.

    dict_terms: (term, section SH|S|O|P, sec_rank, id) — the repo's
    standard dictionary table. enc: (s, p, o) global-id triples.
    Returns the per-part byte sizes (for hdtinfo-style reporting).

    Quads are refused loudly: the basic HDT container has no graph
    layer, so silently collapsing named graphs would lose data (use the
    HDTQ writer, write_hdtq, for quad datasets).
    """
    if "g" in enc.columns:
        raise ValueError(
            "write_hdt: encoded triples carry a 'g' (graph) column; the "
            "basic HDT container cannot represent quads — use write_hdtq"
        )
    g_sections = [
        r["section"]
        for r in dict_terms.select("section").distinct().collect()
    ]
    if "G" in g_sections:
        raise ValueError(
            "write_hdt: dictionary contains a G (graph) section; the "
            "basic HDT container cannot represent quads — use write_hdtq"
        )
    sections = {sec: list(_section_terms(dict_terms, sec)) for sec in _SECTION_ORDER}
    counts = {sec: len(terms) for sec, terms in sections.items()}

    # ---- triples: stream SPO-sorted ids into adjacency lists
    ys: list[int] = []
    zs: list[int] = []
    bity: list[bool] = []
    bitz: list[bool] = []
    last_x = last_y = last_z = 0
    n = 0
    it = (
        enc.select("s", "p", "o")
        .dropDuplicates(["s", "p", "o"])
        .orderBy("s", "p", "o")
        .toLocalIterator()
    )
    for row in it:
        x, y, z = row["s"], row["p"], row["o"]
        if x <= 0 or y <= 0 or z <= 0:
            raise ValueError(f"invalid triple id ({x},{y},{z})")
        n += 1
        if n == 1:
            ys.append(y)
            zs.append(z)
        elif x != last_x:
            if x != last_x + 1:
                raise ValueError(
                    f"subject ids must be consecutive: {last_x} -> {x} "
                    "(a subject id with no triples breaks BitmapTriples)"
                )
            bity.append(True)
            ys.append(y)
            bitz.append(True)
            zs.append(z)
        elif y != last_y:
            bity.append(False)
            ys.append(y)
            bitz.append(True)
            zs.append(z)
        else:
            bitz.append(False)
            zs.append(z)
        last_x, last_y, last_z = x, y, z
    if n > 0:
        bity.append(True)
        bitz.append(True)

    # ---- assemble the container
    out = bytearray()
    sizes: dict[str, int] = {}
    B.write_control_info(out, B.CI_GLOBAL, B.HDT_CONTAINER)
    sizes["global_ci"] = len(out)

    header_text = _default_header(counts, n).encode("utf-8")
    mark = len(out)
    B.write_control_info(
        out, B.CI_HEADER, B.HEADER_NTRIPLES, {"length": len(header_text)}
    )
    out += header_text
    sizes["header"] = len(out) - mark

    mark = len(out)
    B.write_control_info(
        out,
        B.CI_DICTIONARY,
        B.DICT_FOUR,
        {"elements": sum(counts.values())},
    )
    for sec in _SECTION_ORDER:
        B.write_pfc_section(out, sections[sec], blocksize=blocksize)
    sizes["dictionary"] = len(out) - mark

    mark = len(out)
    B.write_control_info(
        out, B.CI_TRIPLES, B.TRIPLES_BITMAP, {"order": B.SPO_ORDINAL}
    )
    B.write_bitmap(out, bity)
    B.write_bitmap(out, bitz)
    B.write_sequence_log64(out, ys)
    B.write_sequence_log64(out, zs)
    sizes["triples"] = len(out) - mark

    with open(path, "wb") as f:
        f.write(out)
    sizes["total"] = len(out)
    sizes["num_triples"] = n
    sizes.update({f"n_{k.lower()}": v for k, v in counts.items()})
    return sizes
