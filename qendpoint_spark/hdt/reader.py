"""Read a binary `.hdt` container back into the repo's table shapes.

Accepts the variants this repo writes — which cover the common cases
the reference emits: HDTv1 container, ntriples header, and

  - four-section PFC dictionary (`dictionaryFour`) + SPO BitmapTriples
  - MSD dictionary (`dictionaryMult`): shared/subjects/predicates PFC
    sections plus the typed-object literals map
    (MultipleSectionDictionary.java:123-206 wire format)
  - FourQuad dictionary (`dictionaryFourQuad`, a 5th G section) + SPO
    BitmapQuad triples with the per-graph MultiRoaringBitmap layer
    (BitmapQuadTriples.java:206-219)

Anything else fails loudly with the unsupported format named (the
repo's error contract) — notably PSFC-section containers
(`dictionaryFourPsfc`) and non-SPO triple orders.

Parsing mirrors the reference loaders: ControlInformation.load,
FourSectionDictionary.load -> PFCDictionarySection.load,
BitmapTriples.load (bitY, bitZ, seqY, seqZ); adjacency decoding
reverses WriteBitmapTriples.load (core/triples/impl/
WriteBitmapTriples.java:202-309).
"""

from __future__ import annotations

from qendpoint_spark.hdt import binary as B

_LANGSTRING_TYPE = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#langString>"
_NO_DATATYPE = "NO_DATATYPE"


def _read_literals_map(buf: bytes, pos: int):
    """MultipleSectionDictionary.readLiteralsMap: vbyte(numTypes), then
    sized type buffers, then one PFC section per type in the same
    order."""
    ntypes, pos = B.vbyte_decode(buf, pos)
    keys: list[str] = []
    for _ in range(ntypes):
        ln, pos = B.vbyte_decode(buf, pos)
        keys.append(buf[pos : pos + ln].decode("utf-8"))
        pos += ln
    subsections: list[tuple[str, list[bytes]]] = []
    for key in keys:
        terms, pos = B.read_pfc_section(buf, pos)
        subsections.append((key, terms))
    return subsections, pos


def _decode_adjacency(bity, bitz, ys, zs):
    """Reverse the BitmapTriples adjacency encoding: bitY[i]=1 ends
    subject x's predicate list; bitZ[j]=1 ends the (x,y) object list."""
    triples: list[tuple[int, int, int]] = []
    x = 1
    yi = 0
    for zi, z in enumerate(zs):
        y = ys[yi]
        triples.append((x, y, z))
        if bitz[zi]:  # (x,y) list done -> next y
            if bity[yi]:  # subject done -> next x
                x += 1
            yi += 1
    if ys and yi != len(ys):
        raise ValueError("bitY/bitZ adjacency inconsistent with vectors")
    return triples


def read_hdt(path: str) -> dict:
    """Parse a .hdt file -> {
        "sections": {SH|S|P (and O for dictionaryFour, G for
                     FourQuad): [bytes terms]},
        "object_subsections": [(type key, [bytes stored])] for MSD,
        "triples": [(s,p,o) global ids],
        "graph_layers": [[0-based triple indices]] for HDTQ,
        "header": str, "order": int, "dict_format": str}."""
    with open(path, "rb") as f:
        buf = f.read()
    pos = 0

    ci_type, fmt, _, pos = B.read_control_info(buf, pos)
    if ci_type != B.CI_GLOBAL or fmt not in (
        B.HDT_CONTAINER,
        "<http://purl.org/HDT/hdt#HDTv2>",
    ):
        raise NotImplementedError(f"unsupported HDT container format {fmt!r}")

    ci_type, fmt, props, pos = B.read_control_info(buf, pos)
    if ci_type != B.CI_HEADER or fmt != B.HEADER_NTRIPLES:
        raise NotImplementedError(f"unsupported header format {fmt!r}")
    hlen = int(props.get("length", 0))
    header = buf[pos : pos + hlen].decode("utf-8")
    pos += hlen

    ci_type, dict_fmt, props, pos = B.read_control_info(buf, pos)
    if ci_type != B.CI_DICTIONARY:
        raise ValueError(f"expected dictionary ControlInfo, got {ci_type}")
    sections: dict[str, list[bytes]] = {}
    object_subsections: list[tuple[str, list[bytes]]] | None = None
    if dict_fmt == B.DICT_FOUR:
        for sec in ("SH", "S", "P", "O"):
            terms, pos = B.read_pfc_section(buf, pos)
            sections[sec] = terms
    elif dict_fmt == B.DICT_MULT:
        for sec in ("SH", "S", "P"):
            terms, pos = B.read_pfc_section(buf, pos)
            sections[sec] = terms
        object_subsections, pos = _read_literals_map(buf, pos)
    elif dict_fmt == B.DICT_FOUR_QUAD:
        for sec in ("SH", "S", "P", "O", "G"):
            terms, pos = B.read_pfc_section(buf, pos)
            sections[sec] = terms
    else:
        raise NotImplementedError(
            f"unsupported dictionary format {dict_fmt!r} (supported: "
            "dictionaryFour, dictionaryMult, dictionaryFourQuad; PSFC "
            "containers are not)"
        )

    ci_type, fmt, props, pos = B.read_control_info(buf, pos)
    if ci_type != B.CI_TRIPLES or fmt not in (
        B.TRIPLES_BITMAP,
        B.TRIPLES_BITMAP_QUAD,
    ):
        raise NotImplementedError(f"unsupported triples format {fmt!r}")
    order = int(props.get("order", B.SPO_ORDINAL))
    if order != B.SPO_ORDINAL:
        raise NotImplementedError(
            f"only SPO-ordered BitmapTriples supported (order={order})"
        )
    bity, pos = B.read_bitmap(buf, pos)
    bitz, pos = B.read_bitmap(buf, pos)
    ys, pos = B.read_sequence_log64(buf, pos)
    zs, pos = B.read_sequence_log64(buf, pos)
    graph_layers = None
    if fmt == B.TRIPLES_BITMAP_QUAD:
        from qendpoint_spark.hdt.roaring import read_multi_roaring

        graph_layers, numbits, pos = read_multi_roaring(buf, pos)
        if numbits != len(zs):
            raise ValueError(
                f"graph layer numbits {numbits} != triple count {len(zs)}"
            )
    if pos != len(buf):
        raise ValueError(f"{len(buf) - pos} trailing bytes after triples")

    triples = _decode_adjacency(bity, bitz, ys, zs)

    return {
        "sections": sections,
        "object_subsections": object_subsections,
        "triples": triples,
        "graph_layers": graph_layers,
        "header": header,
        "order": order,
        "dict_format": dict_fmt,
    }


def _msd_full_term(key: str, stored: str) -> str:
    """Invert LiteralsUtils.removeType: typed sections re-append
    '^^<dt>'; NO_DATATYPE and langString sections store the full form."""
    if key in (_NO_DATATYPE, _LANGSTRING_TYPE):
        return stored
    return f"{stored}^^{key}"


def hdt_to_dataframes(spark, path: str):
    """-> (dict_terms, enc) DataFrames in the repo's standard shapes:
    dict_terms(term, section, sec_rank, id) with §1.3 global ids and
    enc(s,p,o) — plus a `g` column and G section for HDTQ containers.
    The inverse of writer.write_hdt / write_hdt_msd / write_hdtq, so a
    file round-trips table -> .hdt -> table exactly.

    For MSD containers the object ranks follow the container's
    (datatype, value) section order — a valid dictionary in its own
    right (ids consistent with enc), decode-identical to the source."""
    parsed = read_hdt(path)
    n_sh = len(parsed["sections"]["SH"])
    drows = []
    for sec, terms in parsed["sections"].items():
        offset = n_sh if sec in ("S", "O") else 0
        for i, t in enumerate(terms):
            rank = i + 1
            drows.append((t.decode("utf-8"), sec, rank, rank + offset))
    if parsed["object_subsections"] is not None:
        rank = 0
        for key, terms in parsed["object_subsections"]:
            for t in terms:
                rank += 1
                drows.append(
                    (
                        _msd_full_term(key, t.decode("utf-8")),
                        "O",
                        rank,
                        rank + n_sh,
                    )
                )
    dict_terms = spark.createDataFrame(
        drows, "term string, section string, sec_rank long, id long"
    )
    if parsed["graph_layers"] is not None:
        quad_rows = [
            (s, p, o, g + 1)
            for g, layer in enumerate(parsed["graph_layers"])
            for idx in layer
            for s, p, o in (parsed["triples"][idx],)
        ]
        enc = spark.createDataFrame(
            quad_rows, "s long, p long, o long, g long"
        )
    else:
        enc = spark.createDataFrame(
            parsed["triples"], "s long, p long, o long"
        )
    return dict_terms, enc
