"""Single-process reference encoder for golden cross-path equality tests.

Mirrors the reference's main correctness idea (SURVEY.md §5.2): qEndpoint
builds the same dataset through independent paths and asserts full
structural equality (HDTManagerTest.assertEqualsHDT,
HDTManagerTest.java:196-266). Here the independent path is plain Python
over sorted lists — implementing the §1.3/§1.4 rules directly:

- section sort order: unsigned UTF-8 byte order == Python sort of the
  UTF-8-encoded bytes (CompactString.java:104-106),
- SH/S/O split + global-ID offsets (BaseDictionary.java:60-81),
- SPO dedup + lexicographic ID-triple order (TripleIDComparator).

Tests assert the distributed pipeline's tables equal these exactly.
"""

from __future__ import annotations

from qendpoint_spark.extraction.triples import (
    BASE,
    MIN_MENTION_LEN,
    P_CRAWLDATE,
    P_DENSITY,
    P_FLAG,
    P_FROMSOURCE,
    P_LANG,
    P_LABEL,
    P_MENTIONS,
    P_NCHARS,
    P_PROVENANCE,
    P_SOURCE,
    XSD_BOOLEAN,
    XSD_DATE,
    XSD_DECIMAL,
    XSD_INTEGER,
)


def _bkey(term: str) -> bytes:
    return term.encode("utf-8")


def oracle_extract_documents(rows: list[dict]) -> set[tuple[str, str, str]]:
    """rows: dicts with doc_id/text/lang/source/n_chars. Returns the
    expected distinct (s,p,o) string-triple set."""
    triples: set[tuple[str, str, str]] = set()
    all_toks: set[str] = set()
    for r in rows:
        doc = f"{BASE}doc/{r['doc_id']}"
        did, n = r["doc_id"], r["n_chars"]
        bnode = f"_:b{did}"
        triples.add((doc, P_LANG, f'"{r["lang"]}"@{r["lang"]}'))
        triples.add((doc, P_SOURCE, f'"{r["source"]}"'))
        triples.add((doc, P_NCHARS, f'"{n}"^^<{XSD_INTEGER}>'))
        triples.add((
            doc, P_CRAWLDATE,
            f'"2024-{did % 12 + 1:02d}-{did % 28 + 1:02d}"^^<{XSD_DATE}>',
        ))
        triples.add((doc, P_DENSITY, f'"{n // 100}.{n % 100:02d}"^^<{XSD_DECIMAL}>'))
        triples.add((
            doc, P_FLAG,
            f'"{"true" if n % 2 == 0 else "false"}"^^<{XSD_BOOLEAN}>',
        ))
        triples.add((doc, P_PROVENANCE, bnode))
        triples.add((bnode, P_FROMSOURCE, f'"{r["source"]}"'))
        text = r.get("text") or ""
        toks = {t for t in text.split(" ") if len(t) >= MIN_MENTION_LEN}
        all_toks |= toks
        for t in toks:
            triples.add((doc, P_MENTIONS, f"{BASE}ent/{t}"))
    for t in all_toks:
        triples.add((f"{BASE}ent/{t}", P_LABEL, f'"{t}"'))
    return triples


def oracle_dictionary(
    triples: set[tuple[str, str, str]]
) -> list[tuple[str, str, int, int]]:
    """-> [(term, section, sec_rank, global_id)] per §1.3."""
    subjects = {s for s, _, _ in triples}
    objects = {o for _, _, o in triples}
    predicates = {p for _, p, _ in triples}
    shared = sorted(subjects & objects, key=_bkey)
    s_only = sorted(subjects - objects, key=_bkey)
    o_only = sorted(objects - subjects, key=_bkey)
    preds = sorted(predicates, key=_bkey)
    nsh = len(shared)
    out: list[tuple[str, str, int, int]] = []
    out += [(t, "SH", i + 1, i + 1) for i, t in enumerate(shared)]
    out += [(t, "S", i + 1, nsh + i + 1) for i, t in enumerate(s_only)]
    out += [(t, "O", i + 1, nsh + i + 1) for i, t in enumerate(o_only)]
    out += [(t, "P", i + 1, i + 1) for i, t in enumerate(preds)]
    return out


def oracle_encode(
    triples: set[tuple[str, str, str]],
    dictionary: list[tuple[str, str, int, int]] | None = None,
) -> list[tuple[int, int, int]]:
    """-> sorted unique ID triples."""
    if dictionary is None:
        dictionary = oracle_dictionary(triples)
    sid = {t: gid for t, sec, _, gid in dictionary if sec in ("SH", "S")}
    oid = {t: gid for t, sec, _, gid in dictionary if sec in ("SH", "O")}
    pid = {t: gid for t, sec, _, gid in dictionary if sec == "P"}
    enc = {(sid[s], pid[p], oid[o]) for s, p, o in triples}
    return sorted(enc)
