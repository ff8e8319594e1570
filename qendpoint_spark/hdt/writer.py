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


def _default_header(
    counts: dict[str, int],
    total_triples: int,
    dict_format: str | None = None,
    triples_format: str | None = None,
) -> str:
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
        f"{dict_format or B.DICT_FOUR} .",
        f"{fmt} <http://purl.org/HDT/hdt#triples> "
        f"{triples_format or B.TRIPLES_BITMAP} .",
    ]
    return "\n".join(lines) + "\n"


def _spo_adjacency(it):
    """Stream SPO-sorted (x, y, z) ids into the BitmapTriples adjacency
    lists (WriteBitmapTriples.java:202-309 semantics: bitY[i]=1 iff
    y[i] ends its subject's predicate list, bitZ[j]=1 iff z[j] ends its
    (s,p) object list). Returns (bitY, bitZ, ys, zs, n)."""
    ys: list[int] = []
    zs: list[int] = []
    bity: list[bool] = []
    bitz: list[bool] = []
    last_x = last_y = 0
    n = 0
    for x, y, z in it:
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
        last_x, last_y = x, y
    if n > 0:
        bity.append(True)
        bitz.append(True)
    return bity, bitz, ys, zs, n


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

    it = (
        enc.select("s", "p", "o")
        .dropDuplicates(["s", "p", "o"])
        .orderBy("s", "p", "o")
        .toLocalIterator()
    )
    bity, bitz, ys, zs, n = _spo_adjacency((r["s"], r["p"], r["o"]) for r in it)

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


# ------------------------------------------------ MSD (dictionaryMult)

LANGSTRING_TYPE = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#langString>"
NO_DATATYPE = "NO_DATATYPE"


def _msd_key_cols():
    """(key, stored) columns over `term`, per LiteralsUtils.getType/
    removeType (core/util/LiteralsUtils.java:104-227): typed literals
    key on '<dt>' (brackets kept) and store the value with '^^<dt>'
    removed; language literals key on rdf:langString and store '@lang'
    intact; everything else (IRI, bnode, plain literal) keys
    NO_DATATYPE. Native expressions — no Python in the section scan."""
    term = F.col("term")
    is_lit = term.startswith('"')
    dt = F.regexp_extract(term, r"\^\^(<[^>]+>)$", 1)
    is_lang = term.rlike('"@[A-Za-z0-9-]+$')
    key = (
        F.when(is_lit & (dt != ""), dt)
        .when(is_lit & is_lang, F.lit(LANGSTRING_TYPE))
        .otherwise(F.lit(NO_DATATYPE))
    )
    stored = F.when(
        is_lit & (dt != ""),
        F.expr("substring(term, 1, length(term) - length(regexp_extract(term, '(\\\\^\\\\^<[^>]+>)$', 1)))"),
    ).otherwise(term)
    return key.alias("key"), stored.alias("stored")


def write_hdt_msd(
    dict_terms: DataFrame,
    enc: DataFrame,
    path: str,
    blocksize: int = 16,
) -> dict:
    """Serialize as an MSD (`dictionaryMult`) container: per-datatype
    object sections with the type-IRI section table
    (MultipleSectionDictionary.java:123-170 wire format). Object ids
    are REMAPPED from the four-section lexical order to the MSD
    (datatype, value) order, and the triples re-sorted, so the file is
    self-consistent; hdt_to_dataframes inverts both."""
    if "g" in enc.columns:
        raise ValueError(
            "write_hdt_msd: encoded triples carry a 'g' column; use "
            "write_hdtq for quad datasets"
        )
    sections = {
        sec: list(_section_terms(dict_terms, sec)) for sec in ("SH", "S", "P")
    }
    counts = {sec: len(terms) for sec, terms in sections.items()}
    n_sh = counts["SH"]

    key_col, stored_col = _msd_key_cols()
    o_rows = (
        dict_terms.filter(F.col("section") == "O")
        .select("id", key_col, stored_col)
        .orderBy("key", "stored")
        .toLocalIterator()
    )
    obj_sections: list[tuple[str, list[bytes]]] = []
    remap: dict[int, int] = {}
    new_oid = n_sh
    for r in o_rows:
        new_oid += 1
        if not obj_sections or obj_sections[-1][0] != r["key"]:
            obj_sections.append((r["key"], []))
        obj_sections[-1][1].append(r["stored"].encode("utf-8"))
        remap[r["id"]] = new_oid
    counts["O"] = new_oid - n_sh

    # ---- triples with remapped object ids, re-sorted SPO
    spark = enc.sparkSession
    if remap:
        m = spark.createDataFrame(
            list(remap.items()), "old_o long, new_o long"
        )
        enc2 = (
            enc.join(F.broadcast(m), enc["o"] == m["old_o"], "left")
            .select(
                "s", "p", F.coalesce("new_o", "o").alias("o")
            )
        )
    else:
        enc2 = enc.select("s", "p", "o")
    it = (
        enc2.dropDuplicates(["s", "p", "o"])
        .orderBy("s", "p", "o")
        .toLocalIterator()
    )
    bity, bitz, ys, zs, n = _spo_adjacency((r["s"], r["p"], r["o"]) for r in it)

    # ---- assemble
    out = bytearray()
    sizes: dict[str, int] = {}
    B.write_control_info(out, B.CI_GLOBAL, B.HDT_CONTAINER)
    sizes["global_ci"] = len(out)

    header_text = _default_header(
        counts, n, dict_format=B.DICT_MULT
    ).encode("utf-8")
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
        B.DICT_MULT,
        {"elements": sum(counts.values())},
    )
    for sec in ("SH", "S", "P"):
        B.write_pfc_section(out, sections[sec], blocksize=blocksize)
    # literals map: vbyte(numTypes), sized type buffers, then sections
    # (MultipleSectionDictionary.writeLiteralsMap)
    out += B.vbyte_encode(len(obj_sections))
    for key, _terms in obj_sections:
        kb = key.encode("utf-8")
        out += B.vbyte_encode(len(kb))
        out += kb
    for _key, terms in obj_sections:
        B.write_pfc_section(out, terms, blocksize=blocksize)
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
    sizes["num_object_sections"] = len(obj_sections)
    return sizes


# --------------------------------------------------- HDTQ (quad layer)


def write_hdtq(
    dict_terms: DataFrame,
    enc: DataFrame,
    path: str,
    blocksize: int = 16,
) -> dict:
    """Serialize quads as an HDTQ container: FourQuad dictionary
    (SH, S, P, O + G graph section, FourQuadSectionDictionary.java:
    90-102) and BitmapQuad triples — deduplicated SPO BitmapTriples
    plus the per-graph MultiRoaringBitmap membership layer
    (BitmapQuadTriples.java:206-219, WriteBitmapTriples.java:220-252:
    bit t of layer g-1 set iff SPO triple #t is asserted in graph g).

    enc must carry a non-null g id column (default-graph quads have no
    HDTQ graph id — coalesce them to a marker IRI before the
    dictionary build)."""
    if "g" not in enc.columns:
        raise ValueError("write_hdtq: enc has no 'g' column; use write_hdt")
    sections = {
        sec: list(_section_terms(dict_terms, sec))
        for sec in ("SH", "S", "P", "O", "G")
    }
    counts = {sec: len(terms) for sec, terms in sections.items()}
    if not counts["G"]:
        raise ValueError(
            "write_hdtq: dictionary has no G section terms "
            "(build the dictionary from the quad table)"
        )

    g_checked = F.when(
        F.col("g").isNull(),
        F.raise_error(
            F.lit(
                "write_hdtq: null graph id (coalesce default-graph "
                "quads to a marker IRI before encoding)"
            )
        ).cast("long"),
    ).otherwise(F.col("g"))
    it = (
        enc.select("s", "p", "o", g_checked.alias("g"))
        .dropDuplicates(["s", "p", "o", "g"])
        .orderBy("s", "p", "o", "g")
        .toLocalIterator()
    )
    # stream: dedup (s,p,o) for the adjacency, record graph membership
    triples: list[tuple[int, int, int]] = []
    layers: list[list[int]] = [[] for _ in range(counts["G"])]
    last = None
    for r in it:
        x, y, z, g = r["s"], r["p"], r["o"], r["g"]
        if g <= 0 or g > counts["G"]:
            raise ValueError(f"graph id {g} outside G section 1..{counts['G']}")
        if (x, y, z) != last:
            triples.append((x, y, z))
            last = (x, y, z)
        layers[g - 1].append(len(triples) - 1)
    bity, bitz, ys, zs, n = _spo_adjacency(iter(triples))

    out = bytearray()
    sizes: dict[str, int] = {}
    B.write_control_info(out, B.CI_GLOBAL, B.HDT_CONTAINER)
    sizes["global_ci"] = len(out)

    header_text = _default_header(
        counts,
        n,
        dict_format=B.DICT_FOUR_QUAD,
        triples_format=B.TRIPLES_BITMAP_QUAD,
    ).encode("utf-8")
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
        B.DICT_FOUR_QUAD,
        {"elements": sum(counts.values())},
    )
    for sec in ("SH", "S", "P", "O", "G"):
        B.write_pfc_section(out, sections[sec], blocksize=blocksize)
    sizes["dictionary"] = len(out) - mark

    mark = len(out)
    B.write_control_info(
        out, B.CI_TRIPLES, B.TRIPLES_BITMAP_QUAD, {"order": B.SPO_ORDINAL}
    )
    B.write_bitmap(out, bity)
    B.write_bitmap(out, bitz)
    B.write_sequence_log64(out, ys)
    B.write_sequence_log64(out, zs)
    from qendpoint_spark.hdt.roaring import write_multi_roaring

    write_multi_roaring(out, layers, numbits=n)
    sizes["triples"] = len(out) - mark

    with open(path, "wb") as f:
        f.write(out)
    sizes["total"] = len(out)
    sizes["num_triples"] = n
    sizes["num_graphs"] = counts["G"]
    return sizes
