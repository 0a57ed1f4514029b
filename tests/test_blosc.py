"""Blosc-1 chunk codec tests (``fluidsim_tpu/io/blosc.py``).

The reference writes BLOSC-flagged value buffers via c-blosc
``blosc_compress_ctx`` with byte shuffle, typesize 4, LZ4, one block
(``openvdb/io/Compression.cc:157-197``); these tests pin the pure-Python
codec's round-trips, the stream framing through the VDB writer/reader, and
the precise-refusal path for foreign codecs."""

import os
import struct

import numpy as np
import pytest

from fluidsim_tpu.io import blosc
from fluidsim_tpu.io.vdb import (
    VdbGrid, write_vdb, read_vdb, COMPRESS_BLOSC, COMPRESS_ACTIVE_MASK)


RNG = np.random.default_rng(7)

PAYLOADS = [
    b"",
    b"x",
    os.urandom(100),                                       # < MIN_BUFFERSIZE
    np.zeros(512, np.float32).tobytes(),                   # constant
    np.linspace(0, 1, 512, dtype=np.float32).tobytes(),    # smooth
    RNG.normal(size=2048).astype(np.float32).tobytes(),    # noisy
    (np.arange(4096) % 9).astype(np.float32).tobytes(),    # repetitive
    os.urandom(65536),                                     # incompressible
    np.sin(np.arange(131072) * 0.01).astype(np.float32).tobytes(),  # big
]


@pytest.mark.parametrize("i", range(len(PAYLOADS)))
def test_chunk_roundtrip(i):
    data = PAYLOADS[i]
    chunk = blosc.compress(data, typesize=4)
    assert blosc.decompress(chunk) == data


@pytest.mark.parametrize("i", range(len(PAYLOADS)))
def test_lz4_roundtrip(i):
    data = PAYLOADS[i]
    comp = blosc.lz4_compress(data)
    assert blosc.lz4_decompress(comp, len(data)) == data


def test_compression_pays_on_smooth_data():
    data = np.linspace(0, 1, 8192, dtype=np.float32).tobytes()
    chunk = blosc.compress(data, typesize=4)
    assert len(chunk) < len(data) // 2      # shuffle + LZ4 must bite


def test_shuffle_is_byte_transpose():
    data = struct.pack("<4I", 0x04030201, 0x08070605, 0x0C0B0A09, 0x100F0E0D)
    shuf = blosc._shuffle(data, 4)
    assert shuf == bytes([1, 5, 9, 13, 2, 6, 10, 14,
                          3, 7, 11, 15, 4, 8, 12, 16])
    assert blosc._unshuffle(shuf, 4) == data


def test_memcpy_chunk_format():
    data = os.urandom(64)                   # < MIN_BUFFERSIZE -> memcpy mode
    chunk = blosc.compress(data, typesize=4)
    assert chunk[2] & 0x2                   # MEMCPYED flag
    assert chunk[16:] == data
    assert blosc.decompress(chunk) == data


def test_foreign_codec_refused_by_name():
    data = np.arange(512, dtype=np.float32).tobytes()
    chunk = bytearray(blosc.compress(data, typesize=4))
    assert not chunk[2] & 0x2               # really compressed
    chunk[2] = (chunk[2] & ~(7 << 5)) | (4 << 5)   # rewrite codec id -> zstd
    with pytest.raises(blosc.BloscError, match="zstd"):
        blosc.decompress(bytes(chunk))
    chunk[2] = chunk[2] & ~(7 << 5)                # codec id 0 -> blosclz
    with pytest.raises(blosc.BloscError, match="blosclz"):
        blosc.decompress(bytes(chunk))


def test_bitshuffle_refused():
    data = np.arange(512, dtype=np.float32).tobytes()
    chunk = bytearray(blosc.compress(data, typesize=4))
    chunk[2] |= 0x4                         # bit-shuffle flag
    with pytest.raises(blosc.BloscError, match="bit-shuffle"):
        blosc.decompress(bytes(chunk))


def test_truncated_chunk_refused():
    with pytest.raises(blosc.BloscError, match="truncated"):
        blosc.decompress(b"\x02\x01\x00\x04")
    data = np.arange(512, dtype=np.float32).tobytes()
    chunk = blosc.compress(data, typesize=4)
    with pytest.raises(blosc.BloscError):
        blosc.decompress(chunk[:len(chunk) // 2])


def test_unsplit_chunk_decodes():
    """A chunk with the c-blosc >= 1.11 DONT_SPLIT flag (single stream)."""
    data = np.sin(np.arange(2048) * 0.1).astype(np.float32).tobytes()
    shuffled = blosc._shuffle(data, 4)
    comp = blosc.lz4_compress(shuffled)
    body = struct.pack("<I", 20) + struct.pack("<i", len(comp)) + comp
    flags = 0x1 | 0x10 | (1 << 5)           # shuffle + dont-split + lz4
    header = struct.pack("<BBBBIII", 2, 1, flags, 4,
                         len(data), len(data), 16 + len(body))
    assert blosc.decompress(header + body) == data


def test_multiblock_chunk_decodes():
    """Blocked chunk (blocksize < nbytes) with a leftover last block."""
    data = np.cos(np.arange(3000) * 0.01).astype(np.float32).tobytes()
    blocksize = 8192
    nblocks = -(-len(data) // blocksize)
    streams = []
    for b in range(nblocks):
        raw = data[b * blocksize:(b + 1) * blocksize]
        leftover = len(raw) != blocksize
        shuffled = blosc._shuffle(raw, 4)
        if leftover:                        # leftover block: single stream
            comp = blosc.lz4_compress(shuffled)
            streams.append(struct.pack("<i", len(comp)) + comp)
        else:
            parts = bytearray()
            ne = blocksize // 4
            for s in range(4):
                comp = blosc.lz4_compress(shuffled[s * ne:(s + 1) * ne])
                parts += struct.pack("<i", len(comp)) + comp
            streams.append(bytes(parts))
    bstart = 16 + 4 * nblocks
    bstarts, off = [], bstart
    for s in streams:
        bstarts.append(off)
        off += len(s)
    body = struct.pack(f"<{nblocks}I", *bstarts) + b"".join(streams)
    flags = 0x1 | (1 << 5)
    header = struct.pack("<BBBBIII", 2, 1, flags, 4,
                         len(data), blocksize, 16 + len(body))
    assert blosc.decompress(header + body) == data


def test_vdb_blosc_framing(tmp_path):
    """BLOSC-flagged .vdb round-trips and is actually blosc-framed."""
    vals = np.zeros((24, 24, 24), np.float32)
    vals[4:20, 4:20, 4:20] = RNG.normal(size=(16, 16, 16))
    act = vals != 0
    g = VdbGrid(name="density", values=vals, active=act, background=0.0)
    p = str(tmp_path / "b.vdb")
    write_vdb(p, [g], compression=COMPRESS_BLOSC | COMPRESS_ACTIVE_MASK)
    (r,) = read_vdb(p)
    np.testing.assert_array_equal(np.asarray(r.values), vals)
    np.testing.assert_array_equal(np.asarray(r.active), act)
    # the file must be smaller than NONE and carry the metadata name
    raw = open(p, "rb").read()
    assert b"blosc + active values" in raw


def test_vdb_foreign_blosc_codec_fails_precisely(tmp_path):
    """A BLOSC file whose chunks use an unsupported codec names it."""
    vals = RNG.normal(size=(16, 16, 16)).astype(np.float32)
    g = VdbGrid(name="g", values=vals, active=np.ones_like(vals, bool),
                background=0.0)
    p = str(tmp_path / "f.vdb")
    write_vdb(p, [g], compression=COMPRESS_BLOSC)
    raw = bytearray(open(p, "rb").read())
    # rewrite every compressed chunk's codec id to snappy (2): chunks are
    # int64-length-framed right after each leaf's value-mask; rather than
    # re-parse, flip the codec bits of every blosc header signature
    sig_old = struct.pack("<BBB", 2, 1, 0x1 | (1 << 5))
    sig_new = struct.pack("<BBB", 2, 1, 0x1 | (2 << 5))
    patched = bytes(raw).replace(sig_old, sig_new)
    assert patched != bytes(raw)
    p2 = str(tmp_path / "f2.vdb")
    open(p2, "wb").write(patched)
    with pytest.raises(blosc.BloscError, match="snappy"):
        read_vdb(p2)
