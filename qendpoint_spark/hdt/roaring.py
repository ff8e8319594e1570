"""RoaringBitmap (32-bit) + MultiRoaringBitmap wire codecs for the
HDTQ graph layer.

The reference stores the per-graph quad membership as a
MultiRoaringBitmap (core/compact/bitmap/MultiRoaringBitmap.java:
44-47 cookie/block markers, :173-215 stream load, :362-395 save):

    header, 32 bytes little-endian:
        cookie   long  0x6347008534687532
        chunks   int   (the writer stores the layer count here,
                        mirroring MultiRoaringBitmap.save:375)
        chunkSize int  bits per chunk (default 1 << 29)
        numbits  long  total addressable bits (num distinct triples)
        layers   long  number of graphs
    blocks until BLOCK_END (0x40):
        0x41  sizeInBytes long  layer long  <RoaringBitmap bytes>

Each layer (graph) is a list of chunk bitmaps over indices
[chunk*chunkSize, ...); bit t of layer g-1 set <=> triple #t (0-based
in SPO order) asserted in graph g (WriteBitmapTriples.java:220-252).

The inner RoaringBitmap bytes use the org.roaringbitmap portable
format (https://github.com/RoaringBitmap/RoaringFormatSpec): this
writer always emits SERIAL_COOKIE_NO_RUNCONTAINER (12346) with array
or bitmap containers; the reader additionally accepts run containers
(cookie 12347) so reference-written files load.

Pure Python over bytearrays, driver-side only — the .hdt container is
a single sequential stream by format (same argument as hdt/binary.py).
"""

from __future__ import annotations

import struct

MULTI_COOKIE = 0x6347008534687532
BLOCK_END = 0x40
BLOCK_BITMAP = 0x41
DEFAULT_CHUNK_SIZE = 1 << 29

SERIAL_COOKIE_NO_RUN = 12346
SERIAL_COOKIE = 12347
NO_OFFSET_THRESHOLD = 4


# ------------------------------------------------------- RoaringBitmap


def roaring_serialize(values: list[int]) -> bytes:
    """Sorted distinct uint32 values -> portable Roaring bytes
    (always cookie 12346: array/bitmap containers, never runs)."""
    # bucket by high 16 bits; values must be sorted for container order
    containers: list[tuple[int, list[int]]] = []
    for v in values:
        if v < 0 or v > 0xFFFFFFFF:
            raise ValueError(f"roaring value out of uint32 range: {v}")
        hi, lo = v >> 16, v & 0xFFFF
        if containers and containers[-1][0] == hi:
            containers[-1][1].append(lo)
        elif not containers or containers[-1][0] < hi:
            containers.append((hi, [lo]))
        else:
            raise ValueError("roaring_serialize requires sorted input")
    out = bytearray()
    out += struct.pack("<ii", SERIAL_COOKIE_NO_RUN, len(containers))
    for hi, los in containers:
        out += struct.pack("<HH", hi, len(los) - 1)
    # offsets: byte position of each container's data from stream start
    header_len = 8 + 4 * len(containers) + 4 * len(containers)
    offsets_pos = len(out)
    out += b"\x00" * (4 * len(containers))
    data_pos = header_len
    for i, (hi, los) in enumerate(containers):
        struct.pack_into("<i", out, offsets_pos + 4 * i, data_pos)
        if len(los) > 4096:  # bitmap container: 1024 LE words
            words = [0] * 1024
            for lo in los:
                words[lo >> 6] |= 1 << (lo & 63)
            out += struct.pack("<1024Q", *words)
            data_pos += 8192
        else:  # array container: shorts
            out += struct.pack(f"<{len(los)}H", *los)
            data_pos += 2 * len(los)
    return bytes(out)


def roaring_deserialize(buf: bytes, pos: int = 0) -> tuple[list[int], int]:
    """Portable Roaring bytes -> sorted values; returns (values, end).
    Accepts both cookie variants incl. run containers."""
    (cookie,) = struct.unpack_from("<i", buf, pos)
    has_runs = (cookie & 0xFFFF) == SERIAL_COOKIE
    if has_runs:
        size = (cookie >> 16) + 1
        pos += 4
        runbits = buf[pos : pos + (size + 7) // 8]
        pos += (size + 7) // 8
    elif cookie == SERIAL_COOKIE_NO_RUN:
        (size,) = struct.unpack_from("<i", buf, pos + 4)
        pos += 8
        runbits = b"\x00" * ((size + 7) // 8)
    else:
        raise ValueError(f"bad roaring cookie {cookie}")
    keys: list[tuple[int, int]] = []
    for _ in range(size):
        hi, card_m1 = struct.unpack_from("<HH", buf, pos)
        keys.append((hi, card_m1 + 1))
        pos += 4
    if not has_runs or size >= NO_OFFSET_THRESHOLD:
        pos += 4 * size  # skip the offset table
    values: list[int] = []
    for i, (hi, card) in enumerate(keys):
        base = hi << 16
        if runbits[i // 8] & (1 << (i % 8)):  # run container
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length_m1 = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(range(base + start, base + start + length_m1 + 1))
        elif card > 4096:  # bitmap container
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    b = w & -w
                    values.append(base + (wi << 6) + b.bit_length() - 1)
                    w ^= b
        else:  # array container
            los = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(base + lo for lo in los)
    return values, pos


# -------------------------------------------------- MultiRoaringBitmap


def write_multi_roaring(
    out: bytearray,
    layers: list[list[int]],
    numbits: int,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
) -> None:
    """layers[g-1] = sorted 0-based triple indices asserted in graph g."""
    out += struct.pack(
        "<qiiqq", MULTI_COOKIE, len(layers), chunk_size, numbits, len(layers)
    )
    for layer_i, indices in enumerate(layers):
        # split into chunk-local bitmaps (one per chunkSize window)
        n_chunks = max(1, (numbits - 1) // chunk_size + 1) if numbits else 1
        by_chunk: list[list[int]] = [[] for _ in range(n_chunks)]
        for idx in indices:
            if idx >= numbits:
                raise ValueError(f"index {idx} >= numbits {numbits}")
            by_chunk[idx // chunk_size].append(idx % chunk_size)
        for chunk in by_chunk:
            blob = roaring_serialize(chunk)
            out.append(BLOCK_BITMAP)
            out += struct.pack("<qq", len(blob), layer_i)
            out += blob
    out.append(BLOCK_END)


def read_multi_roaring(buf: bytes, pos: int) -> tuple[list[list[int]], int, int]:
    """-> (layers as sorted global indices, numbits, end position)."""
    cookie, _chunks, chunk_size, numbits, n_layers = struct.unpack_from(
        "<qiiqq", buf, pos
    )
    if cookie != MULTI_COOKIE:
        raise ValueError(f"bad MultiRoaringBitmap cookie {cookie:#x}")
    pos += 32
    layers: list[list[int]] = [[] for _ in range(n_layers)]
    seen_chunks = [0] * max(n_layers, 1)
    while True:
        block = buf[pos]
        pos += 1
        if block == BLOCK_END:
            break
        if block != BLOCK_BITMAP:
            raise ValueError(f"bad MultiRoaringBitmap block type {block:#x}")
        _size, layer = struct.unpack_from("<qq", buf, pos)
        pos += 16
        while layer >= len(layers):
            layers.append([])
            seen_chunks.append(0)
        values, pos = roaring_deserialize(buf, pos)
        base = seen_chunks[layer] * chunk_size
        layers[layer].extend(base + v for v in values)
        seen_chunks[layer] += 1
    return layers, numbits, pos
