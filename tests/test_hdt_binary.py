"""Binary .hdt container: codec check values, file round-trip through
the real dictionary/encode pipeline, byte-exact re-serialization, and
loud failures on unsupported variants.

Reference parity anchors: ControlInformation.java:66-89 (framing),
PFCDictionarySection.java:397-413 (section codec),
WriteBitmapTriples.java:202-309 (adjacency semantics).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from qendpoint_spark.dictionary import build_dictionary
from qendpoint_spark.encoding import encode_triples
from qendpoint_spark.hdt import hdt_to_dataframes, read_hdt, write_hdt
from qendpoint_spark.hdt import binary as B


def test_crc_check_values():
    # standard check inputs for the three CRCs the format uses
    assert B.crc8(b"123456789") == 0xF4  # CRC-8 (poly 0x07)
    assert B.crc16(b"123456789") == 0xBB3D  # CRC-16/ARC
    assert (B.crc32c(b"123456789") ^ 0xFFFFFFFF) == 0xE3069283  # CRC-32C


def test_vbyte_and_pfc_roundtrip():
    for v in (0, 1, 127, 128, 16383, 16384, 2**40):
        assert B.vbyte_decode(B.vbyte_encode(v), 0) == (v, len(B.vbyte_encode(v)))
    terms = sorted(
        {f"http://example.org/x{i:03d}".encode() for i in range(100)}
        | {b'"a literal"@en', b'"42"^^<http://www.w3.org/2001/XMLSchema#integer>', b"_:b0"}
    )
    out = bytearray()
    B.write_pfc_section(out, terms, blocksize=16)
    back, end = B.read_pfc_section(bytes(out), 0)
    assert back == terms and end == len(out)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        ("http://ex/a", "http://ex/p", "http://ex/b"),
        ("http://ex/a", "http://ex/p", '"vé"@fr'),
        ("http://ex/a", "http://ex/q", '"9"^^<http://www.w3.org/2001/XMLSchema#integer>'),
        ("http://ex/b", "http://ex/p", "http://ex/c"),
        ("http://ex/b", "http://ex/q", "http://ex/a"),
        ("_:bn1", "http://ex/p", "http://ex/b"),
    ]
    tri = spark.createDataFrame(rows, "s string, p string, o string")
    d = build_dictionary(tri).cache()
    enc = encode_triples(tri, d).cache()
    return tri, d, enc


def test_hdt_file_roundtrip(spark, corpus, tmp_path):
    tri, d, enc = corpus
    path = str(tmp_path / "data.hdt")
    sizes = write_hdt(d, enc, path)
    assert sizes["num_triples"] == 6

    parsed = read_hdt(path)
    # dictionary round-trips exactly, section by section
    for sec in ("SH", "S", "P", "O"):
        want = [
            r["term"].encode()
            for r in d.filter(F.col("section") == sec)
            .orderBy("sec_rank")
            .collect()
        ]
        assert parsed["sections"][sec] == want, sec
    # id-triples round-trip exactly
    want_ids = sorted(tuple(r) for r in enc.select("s", "p", "o").collect())
    assert sorted(parsed["triples"]) == want_ids

    # and back into DataFrames: term-level triples must equal the input
    d2, enc2 = hdt_to_dataframes(spark, path)
    assert sorted(tuple(r) for r in d2.collect()) == sorted(
        tuple(r) for r in d.select("term", "section", "sec_rank", "id").collect()
    )
    terms = {(r["id"], r["section"]): r["term"] for r in d2.collect()}

    def decode(role, i):
        for sec in (("SH", "S") if role == "s" else ("SH", "O") if role == "o" else ("P",)):
            if (i, sec) in terms:
                return terms[(i, sec)]
        raise KeyError((role, i))

    got = sorted(
        (decode("s", r["s"]), decode("p", r["p"]), decode("o", r["o"]))
        for r in enc2.collect()
    )
    assert got == sorted(tuple(r) for r in tri.collect())


def test_hdt_byte_exact_reserialize(spark, corpus, tmp_path):
    """write(read(f)) == f: the serializer is canonical, so a file can
    ship through the table representation and back untouched."""
    tri, d, enc = corpus
    p1, p2 = str(tmp_path / "a.hdt"), str(tmp_path / "b.hdt")
    write_hdt(d, enc, p1)
    d2, enc2 = hdt_to_dataframes(spark, p1)
    write_hdt(d2, enc2, p2)
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_hdt_rejects_unknown_variants(tmp_path, spark, corpus):
    tri, d, enc = corpus
    path = str(tmp_path / "x.hdt")
    write_hdt(d, enc, path)
    blob = bytearray(open(path, "rb").read())
    # corrupt one text byte inside the dictionary -> CRC32C must trip
    blob[len(blob) // 2] ^= 0xFF
    bad = str(tmp_path / "bad.hdt")
    open(bad, "wb").write(bytes(blob))
    with pytest.raises((ValueError, NotImplementedError, IndexError)):
        read_hdt(bad)
    # truncated file fails loudly too
    open(bad, "wb").write(open(path, "rb").read()[:40])
    with pytest.raises((ValueError, IndexError, NotImplementedError)):
        read_hdt(bad)


def test_hdt_cat_merge_of_two_files(spark, tmp_path):
    """hdtCat parity on real .hdt files: write two containers, merge
    through the integer-remap KCat path, write the merged container,
    and check the decoded statement set is the union."""
    from qendpoint_spark.encoding import decode_triples
    from qendpoint_spark.merge import merge_datasets

    rows1 = [
        ("http://ex/a", "http://ex/p", "http://ex/b"),
        ("http://ex/b", "http://ex/p", "http://ex/c"),
    ]
    rows2 = [
        ("http://ex/b", "http://ex/p", "http://ex/c"),  # overlap
        ("http://ex/c", "http://ex/q", '"v"@en'),
    ]
    paths = []
    for i, rows in enumerate((rows1, rows2)):
        tri = spark.createDataFrame(rows, "s string, p string, o string")
        d = build_dictionary(tri)
        enc = encode_triples(tri, d)
        p = str(tmp_path / f"in{i}.hdt")
        write_hdt(d, enc, p)
        paths.append(p)

    pairs = [hdt_to_dataframes(spark, p) for p in paths]
    md, mt, _ = merge_datasets([(enc, d) for d, enc in pairs])
    out = str(tmp_path / "merged.hdt")
    write_hdt(md, mt, out)

    d3, enc3 = hdt_to_dataframes(spark, out)
    got = sorted(tuple(r) for r in decode_triples(enc3, d3).collect())
    assert got == sorted(set(rows1) | set(rows2))


def test_write_hdt_refuses_quads(spark, corpus, tmp_path):
    """ADVICE r4: basic HDT has no graph layer — quads must fail loudly
    instead of silently collapsing named graphs."""
    tri, d, enc = corpus
    enc_g = enc.withColumn("g", F.lit(1))
    with pytest.raises(ValueError, match="quads"):
        write_hdt(d, enc_g, str(tmp_path / "q.hdt"))
    d_g = d.withColumn(
        "section", F.when(F.col("section") == "P", "G").otherwise(F.col("section"))
    )
    with pytest.raises(ValueError, match="quads"):
        write_hdt(d_g, enc, str(tmp_path / "q2.hdt"))


def test_roaring_codec_roundtrip():
    """Portable RoaringBitmap + MultiRoaringBitmap codecs (the HDTQ
    graph layer, MultiRoaringBitmap.java:173-215/362-395)."""
    import random

    from qendpoint_spark.hdt import roaring as R

    rng = random.Random(7)
    for vals in (
        [],
        [0],
        [5, 6, 7, 100000, 200000],
        sorted(rng.sample(range(1 << 20), 9000)),
        list(range(70000)),  # dense: bitmap containers
    ):
        blob = R.roaring_serialize(vals)
        back, end = R.roaring_deserialize(blob)
        assert back == vals and end == len(blob)
    layers = [sorted(rng.sample(range(100000), 500)), [], [0, 99999]]
    out = bytearray()
    R.write_multi_roaring(out, layers, numbits=100000, chunk_size=4096)
    back, numbits, end = R.read_multi_roaring(bytes(out), 0)
    assert back == layers and numbits == 100000 and end == len(out)


def test_hdt_msd_roundtrip(spark, corpus, tmp_path):
    """MSD container: typed object sections + literals map + object-id
    remap, byte-exact reserialize."""
    import hashlib

    from qendpoint_spark.encoding.encoder import decode_triples
    from qendpoint_spark.hdt import read_hdt, write_hdt_msd

    tri, d, enc = corpus
    p1, p2 = str(tmp_path / "a.hdt"), str(tmp_path / "b.hdt")
    write_hdt_msd(d, enc, p1)
    parsed = read_hdt(p1)
    keys = [k for k, _ in parsed["object_subsections"]]
    assert keys == sorted(keys)  # TreeMap byte order
    assert keys[-1] == "NO_DATATYPE"  # '<...>' types sort before it
    d2, enc2 = hdt_to_dataframes(spark, p1)
    back = {tuple(r) for r in decode_triples(enc2, d2).collect()}
    assert back == {tuple(r) for r in tri.collect()}
    write_hdt_msd(d2, enc2, p2)
    assert (
        hashlib.sha256(open(p1, "rb").read()).digest()
        == hashlib.sha256(open(p2, "rb").read()).digest()
    )


def test_hdtq_roundtrip(spark, tmp_path):
    """HDTQ container: G section + BitmapQuad graph layer; a triple
    asserted in two graphs stays one SPO entry with two layer bits."""
    import hashlib

    from qendpoint_spark.dictionary import build_dictionary
    from qendpoint_spark.encoding import encode_triples
    from qendpoint_spark.encoding.encoder import decode_triples
    from qendpoint_spark.hdt import hdt_to_dataframes, read_hdt, write_hdtq

    quads = [
        ("http://ex/a", "http://ex/p", "http://ex/b", "http://ex/g1"),
        ("http://ex/a", "http://ex/p", "http://ex/b", "http://ex/g2"),
        ("http://ex/a", "http://ex/q", '"9"^^<http://www.w3.org/2001/XMLSchema#integer>', "http://ex/g1"),
        ("http://ex/c", "http://ex/p", "http://ex/a", "http://ex/g2"),
    ]
    q = spark.createDataFrame(quads, "s string, p string, o string, g string")
    dq = build_dictionary(q)
    encq = encode_triples(q, dq)
    p1, p2 = str(tmp_path / "a.hdt"), str(tmp_path / "b.hdt")
    sizes = write_hdtq(dq, encq, p1)
    assert sizes["num_triples"] == 3 and sizes["num_graphs"] == 2
    parsed = read_hdt(p1)
    assert len(parsed["sections"]["G"]) == 2
    assert sum(len(l) for l in parsed["graph_layers"]) == 4
    d2, enc2 = hdt_to_dataframes(spark, p1)
    back = {tuple(r) for r in decode_triples(enc2, d2).collect()}
    assert back == set(quads)
    write_hdtq(d2, enc2, p2)
    assert (
        hashlib.sha256(open(p1, "rb").read()).digest()
        == hashlib.sha256(open(p2, "rb").read()).digest()
    )


def test_hdt_rejects_psfc_and_unknown_dict(tmp_path, spark, corpus):
    """Loud fail on unsupported dictionary container formats (PSFC)."""
    from qendpoint_spark.hdt import binary as B
    from qendpoint_spark.hdt import read_hdt, write_hdt

    tri, d, enc = corpus
    path = str(tmp_path / "x.hdt")
    write_hdt(d, enc, path)
    buf = bytearray(open(path, "rb").read())
    bad = buf.replace(
        B.DICT_FOUR.encode(),
        b"<http://purl.org/HDT/hdt#dictionaryFourPsfc>"[: len(B.DICT_FOUR)],
    )
    p2 = str(tmp_path / "bad.hdt")
    open(p2, "wb").write(bad)
    with pytest.raises((NotImplementedError, ValueError)):
        read_hdt(p2)
