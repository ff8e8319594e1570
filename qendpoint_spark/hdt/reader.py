"""Read a binary `.hdt` container back into the repo's table shapes.

Accepts the subset this repo writes — and the common case the
reference emits for plain RDF data: HDTv1 container, ntriples header,
four-section PFC dictionary, SPO BitmapTriples. Anything else fails
loudly with the unsupported format named (the repo's error contract).

Parsing mirrors the reference loaders: ControlInformation.load,
FourSectionDictionary.load -> PFCDictionarySection.load,
BitmapTriples.load (bitY, bitZ, seqY, seqZ); adjacency decoding
reverses WriteBitmapTriples.load (core/triples/impl/
WriteBitmapTriples.java:202-309).
"""

from __future__ import annotations

from qendpoint_spark.hdt import binary as B


def read_hdt(path: str) -> dict:
    """Parse a .hdt file -> {"sections": {SH|S|P|O: [bytes terms]},
    "triples": [(s,p,o) global ids], "header": str, "order": int}."""
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

    ci_type, fmt, props, pos = B.read_control_info(buf, pos)
    if ci_type != B.CI_DICTIONARY or fmt != B.DICT_FOUR:
        raise NotImplementedError(
            f"unsupported dictionary format {fmt!r} (only "
            "dictionaryFour; MSD dictionaries are a different container)"
        )
    sections: dict[str, list[bytes]] = {}
    for sec in ("SH", "S", "P", "O"):
        terms, pos = B.read_pfc_section(buf, pos)
        sections[sec] = terms

    ci_type, fmt, props, pos = B.read_control_info(buf, pos)
    if ci_type != B.CI_TRIPLES or fmt != B.TRIPLES_BITMAP:
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
    if pos != len(buf):
        raise ValueError(f"{len(buf) - pos} trailing bytes after triples")

    # reverse the adjacency encoding: bitY[i]=1 ends subject x's
    # predicate list; bitZ[j]=1 ends the (x,y) object list
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

    return {
        "sections": sections,
        "triples": triples,
        "header": header,
        "order": order,
    }


def hdt_to_dataframes(spark, path: str):
    """-> (dict_terms, enc) DataFrames in the repo's standard shapes:
    dict_terms(term, section, sec_rank, id) with §1.3 global ids and
    enc(s,p,o). The inverse of writer.write_hdt, so a file round-trips
    table -> .hdt -> table exactly."""
    parsed = read_hdt(path)
    n_sh = len(parsed["sections"]["SH"])
    drows = []
    for sec, terms in parsed["sections"].items():
        offset = n_sh if sec in ("S", "O") else 0
        for i, t in enumerate(terms):
            rank = i + 1
            drows.append((t.decode("utf-8"), sec, rank, rank + offset))
    dict_terms = spark.createDataFrame(
        drows, "term string, section string, sec_rank long, id long"
    )
    enc = spark.createDataFrame(parsed["triples"], "s long, p long, o long")
    return dict_terms, enc
