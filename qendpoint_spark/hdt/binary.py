"""Low-level HDT binary codecs: VByte, CRC8/CRC16/CRC32-C, log64
bit-packed sequences, plain bitmaps, and plain-front-coded (PFC) text
blocks — the exact wire encodings of the reference:

  - VByte.java:84-93          little-endian 7-bit groups, stop bit 0x80
                              on the LAST byte (not the continuation)
  - CRC8.java                 poly 0x07, init 0, unreflected (CCITT)
  - CRC16.java                poly 0x8005 reflected (0xA001), init 0
  - CRC32.java                CRC-32C (Castagnoli), init/xorout ~0
  - SequenceLog64.java        type 1, numbits byte, vbyte count, CRC8
                              header; LSB-first packed 64-bit LE words,
                              last word truncated to used bytes; CRC32C
  - Bitmap64Big.java:290-315  type 1, vbyte numbits, CRC8; same word
                              layout; CRC32C
  - PFCDictionarySection.java type 2, vbyte (numstrings, bytes,
                              blocksize), CRC8; block-pointer sequence;
                              text buffer with CRC32C

Pure Python on bytearrays: these codecs run on the driver only (the
`.hdt` container is a single sequential stream by design — the
reference writes it the same way); the distributed work happens before,
in the Parquet stage tables.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------- crc


def _make_crc8_table() -> list[int]:
    table = []
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
        table.append(crc)
    return table


def _make_crc16_table() -> list[int]:
    # CRC-16/ARC: poly 0x8005 reflected -> 0xA001, init 0
    table = []
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ 0xA001 if crc & 1 else crc >> 1
        table.append(crc)
    return table


def _make_crc32c_table() -> list[int]:
    # CRC-32C: poly 0x1EDC6F41 reflected -> 0x82F63B78
    table = []
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ 0x82F63B78 if crc & 1 else crc >> 1
        table.append(crc)
    return table


_CRC8_TABLE = _make_crc8_table()
_CRC16_TABLE = _make_crc16_table()
_CRC32C_TABLE = _make_crc32c_table()


def crc8(data: bytes, crc: int = 0) -> int:
    for b in data:
        crc = _CRC8_TABLE[(crc ^ b) & 0xFF]
    return crc


def crc16(data: bytes, crc: int = 0) -> int:
    for b in data:
        crc = (crc >> 8) ^ _CRC16_TABLE[(crc ^ b) & 0xFF]
    return crc


def crc32c(data: bytes, crc: int = 0xFFFFFFFF) -> int:
    """Running CRC-32C; pass the previous return value to continue.
    Finalize with `^ 0xFFFFFFFF` when writing (CRC32.java writes
    ~crc32)."""
    for b in data:
        crc = (crc >> 8) ^ _CRC32C_TABLE[(crc ^ b) & 0xFF]
    return crc


# -------------------------------------------------------------- vbyte


def vbyte_encode(value: int) -> bytes:
    if value < 0:
        raise ValueError("VByte encodes non-negative values only")
    out = bytearray()
    while value > 127:
        out.append(value & 127)
        value >>= 7
    out.append(value | 0x80)
    return bytes(out)


def vbyte_decode(buf: bytes, pos: int) -> tuple[int, int]:
    """-> (value, next_pos)."""
    value = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        if b & 0x80:
            return value | ((b & 0x7F) << shift), pos
        value |= b << shift
        shift += 7


# ---------------------------------------------------- packed sequences


def log2_bits(n: int) -> int:
    """BitUtil.log2: bits needed to represent n (0 -> 0)."""
    return n.bit_length()


def pack_log64(values: list[int], numbits: int) -> bytes:
    """LSB-first fixed-width packing into little-endian 64-bit words,
    with the last word truncated to its used BYTES (SequenceLog64.save:
    writeLowerBitsByteAligned)."""
    total_bits = numbits * len(values)
    if total_bits == 0:
        return b""
    nwords = (total_bits + 63) // 64
    words = [0] * nwords
    bitpos = 0
    mask = (1 << numbits) - 1
    for v in values:
        if v < 0 or v > mask:
            raise ValueError(f"value {v} does not fit in {numbits} bits")
        i, j = bitpos >> 6, bitpos & 63
        words[i] |= (v << j) & 0xFFFFFFFFFFFFFFFF
        if j + numbits > 64:
            words[i + 1] |= v >> (64 - j)
        bitpos += numbits
    out = bytearray()
    for w in words[:-1]:
        out += struct.pack("<Q", w)
    last_bits = (total_bits - 1) % 64 + 1
    last_bytes = (last_bits + 7) // 8
    out += struct.pack("<Q", words[-1])[:last_bytes]
    return bytes(out)


def unpack_log64(buf: bytes, numbits: int, count: int) -> list[int]:
    if numbits == 0 or count == 0:
        return [0] * count
    padded = buf + b"\x00" * (8 - len(buf) % 8 if len(buf) % 8 else 0)
    words = list(struct.unpack(f"<{len(padded) // 8}Q", padded))
    mask = (1 << numbits) - 1
    out = []
    bitpos = 0
    for _ in range(count):
        i, j = bitpos >> 6, bitpos & 63
        v = words[i] >> j
        if j + numbits > 64:
            v |= words[i + 1] << (64 - j)
        out.append(v & mask)
        bitpos += numbits
    return out


def write_sequence_log64(out: bytearray, values: list[int]) -> None:
    """SequenceLog64.save: [type=1][numbits][vbyte count][crc8] +
    packed words + [crc32c]."""
    numbits = max((log2_bits(v) for v in values), default=0)
    head = bytes([1, numbits]) + vbyte_encode(len(values))
    out += head
    out += bytes([crc8(head)])
    data = pack_log64(values, numbits)
    out += data
    out += struct.pack("<I", crc32c(data) ^ 0xFFFFFFFF)


def read_sequence_log64(buf: bytes, pos: int) -> tuple[list[int], int]:
    start = pos
    if buf[pos] != 1:
        raise ValueError(f"not a SequenceLog64 at {pos}: type {buf[pos]}")
    numbits = buf[pos + 1]
    count, pos = vbyte_decode(buf, pos + 2)
    if crc8(buf[start:pos]) != buf[pos]:
        raise ValueError("SequenceLog64 header CRC8 mismatch")
    pos += 1
    total_bits = numbits * count
    nbytes = 0
    if total_bits:
        nwords = (total_bits + 63) // 64
        last_bits = (total_bits - 1) % 64 + 1
        nbytes = (nwords - 1) * 8 + (last_bits + 7) // 8
    data = buf[pos : pos + nbytes]
    pos += nbytes
    (stored,) = struct.unpack_from("<I", buf, pos)
    if (crc32c(data) ^ 0xFFFFFFFF) != stored:
        raise ValueError("SequenceLog64 data CRC32C mismatch")
    return unpack_log64(data, numbits, count), pos + 4


# ------------------------------------------------------------- bitmaps


def write_bitmap(out: bytearray, bits: list[bool]) -> None:
    """Bitmap64Big.save: [type=1][vbyte numbits][crc8] + packed words
    (bit i -> word i//64 bit i%64, LE) + [crc32c]."""
    head = bytes([1]) + vbyte_encode(len(bits))
    out += head
    out += bytes([crc8(head)])
    total = len(bits)
    data = bytearray()
    if total:
        nwords = (total + 63) // 64
        words = [0] * nwords
        for i, b in enumerate(bits):
            if b:
                words[i >> 6] |= 1 << (i & 63)
        for w in words[:-1]:
            data += struct.pack("<Q", w)
        last_bits = (total - 1) % 64 + 1
        data += struct.pack("<Q", words[-1])[: (last_bits + 7) // 8]
    out += data
    out += struct.pack("<I", crc32c(bytes(data)) ^ 0xFFFFFFFF)


def read_bitmap(buf: bytes, pos: int) -> tuple[list[bool], int]:
    start = pos
    if buf[pos] != 1:
        raise ValueError(f"not a plain bitmap at {pos}: type {buf[pos]}")
    total, pos = vbyte_decode(buf, pos + 1)
    if crc8(buf[start:pos]) != buf[pos]:
        raise ValueError("bitmap header CRC8 mismatch")
    pos += 1
    nbytes = 0
    if total:
        nwords = (total + 63) // 64
        last_bits = (total - 1) % 64 + 1
        nbytes = (nwords - 1) * 8 + (last_bits + 7) // 8
    data = buf[pos : pos + nbytes]
    pos += nbytes
    (stored,) = struct.unpack_from("<I", buf, pos)
    if (crc32c(data) ^ 0xFFFFFFFF) != stored:
        raise ValueError("bitmap data CRC32C mismatch")
    bits = []
    for i in range(total):
        bits.append(bool(data[i >> 3] & (1 << (i & 7))))
    return bits, pos + 4


# ----------------------------------------------------------- PFC text


def _common_prefix_len(a: bytes, b: bytes) -> int:
    n = min(len(a), len(b))
    i = 0
    while i < n and a[i] == b[i]:
        i += 1
    return i


def write_pfc_section(
    out: bytearray, terms: list[bytes], blocksize: int = 16
) -> None:
    """PFCDictionarySection.save: [type=2][vbyte numstrings][vbyte
    textlen][vbyte blocksize][crc8] + block-pointer SequenceLog64 +
    text + [crc32c]. Every block starts with a full string; following
    strings store (vbyte common-prefix-length, suffix); all strings
    NUL-terminated."""
    text = bytearray()
    blocks = []
    prev = b""
    for i, term in enumerate(terms):
        if b"\x00" in term:
            raise ValueError("dictionary terms must not contain NUL")
        if i % blocksize == 0:
            blocks.append(len(text))
            text += term
        else:
            delta = _common_prefix_len(prev, term)
            text += vbyte_encode(delta)
            text += term[delta:]
        text += b"\x00"
        prev = term
    blocks.append(len(text))  # ending pointer
    head = bytes([2]) + (
        vbyte_encode(len(terms)) + vbyte_encode(len(text)) + vbyte_encode(blocksize)
    )
    out += head
    out += bytes([crc8(head)])
    write_sequence_log64(out, blocks)
    out += text
    out += struct.pack("<I", crc32c(bytes(text)) ^ 0xFFFFFFFF)


def read_pfc_section(buf: bytes, pos: int) -> tuple[list[bytes], int]:
    start = pos
    if buf[pos] != 2:
        raise ValueError(f"not a PFC section at {pos}: type {buf[pos]}")
    numstrings, pos = vbyte_decode(buf, pos + 1)
    textlen, pos = vbyte_decode(buf, pos)
    blocksize, pos = vbyte_decode(buf, pos)
    if crc8(buf[start:pos]) != buf[pos]:
        raise ValueError("PFC header CRC8 mismatch")
    pos += 1
    _blocks, pos = read_sequence_log64(buf, pos)
    text = buf[pos : pos + textlen]
    pos += textlen
    (stored,) = struct.unpack_from("<I", buf, pos)
    if (crc32c(text) ^ 0xFFFFFFFF) != stored:
        raise ValueError("PFC text CRC32C mismatch")
    pos += 4
    terms: list[bytes] = []
    tp = 0
    prev = b""
    for i in range(numstrings):
        if i % blocksize == 0:
            end = text.index(0, tp)
            term = text[tp:end]
            tp = end + 1
        else:
            delta, tp = vbyte_decode(text, tp)
            end = text.index(0, tp)
            term = prev[:delta] + text[tp:end]
            tp = end + 1
        terms.append(term)
        prev = term
    return terms, pos


# -------------------------------------------------------- control info


def write_control_info(
    out: bytearray,
    ci_type: int,
    fmt: str,
    props: dict[str, int] | None = None,
) -> None:
    """ControlInformation.save: "$HDT" + type byte + format + NUL +
    "k=v;"* + NUL, all CRC16-protected."""
    chunk = bytearray(b"$HDT")
    chunk.append(ci_type)
    chunk += fmt.encode("utf-8") + b"\x00"
    for k, v in (props or {}).items():
        chunk += f"{k}={v};".encode("utf-8")
    chunk += b"\x00"
    out += chunk
    out += struct.pack("<H", crc16(bytes(chunk)))


def read_control_info(buf: bytes, pos: int) -> tuple[int, str, dict, int]:
    """-> (type, format, properties, next_pos)."""
    start = pos
    if buf[pos : pos + 4] != b"$HDT":
        raise ValueError(f"missing $HDT cookie at offset {pos}")
    ci_type = buf[pos + 4]
    pos += 5
    end = buf.index(0, pos)
    fmt = buf[pos:end].decode("utf-8")
    pos = end + 1
    end = buf.index(0, pos)
    props_str = buf[pos:end].decode("utf-8")
    pos = end + 1
    (stored,) = struct.unpack_from("<H", buf, pos)
    if crc16(buf[start:pos]) != stored:
        raise ValueError("ControlInformation CRC16 mismatch")
    props = {}
    for item in props_str.split(";"):
        k, sep, v = item.partition("=")
        if sep:
            props[k] = int(v) if v.lstrip("-").isdigit() else v
    return ci_type, fmt, props, pos + 2


# container vocabulary (HDTVocabulary.java)
HDT_CONTAINER = "<http://purl.org/HDT/hdt#HDTv1>"
DICT_FOUR = "<http://purl.org/HDT/hdt#dictionaryFour>"
DICT_MULT = "<http://purl.org/HDT/hdt#dictionaryMult>"
DICT_FOUR_QUAD = "<http://purl.org/HDT/hdt#dictionaryFourQuad>"
TRIPLES_BITMAP = "<http://purl.org/HDT/hdt#triplesBitmap>"
TRIPLES_BITMAP_QUAD = "<http://purl.org/HDT/hdt#triplesBitmapQuad>"
HEADER_NTRIPLES = "ntriples"
CI_GLOBAL, CI_HEADER, CI_DICTIONARY, CI_TRIPLES = 1, 2, 3, 4
SPO_ORDINAL = 1  # TripleComponentOrder.SPO.ordinal()
