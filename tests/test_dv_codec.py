"""Deletion-vector codec (pandabase_spark/sources/dv.py) — pure
functions, no Spark session needed. The wire format is pinned against
the PUBLIC specs: Z85 (ZeroMQ RFC 32 test vector), the RoaringBitmap
interchange format, and Delta PROTOCOL.md's DV file framing."""

from __future__ import annotations

import struct
import uuid

import pytest

from pandabase_spark.sources.dv import (
    DV_MAGIC,
    build_dv_file,
    decode_dv_data,
    dv_relative_path,
    encode_dv_data,
    extract_dv_blob,
    z85_decode,
    z85_encode,
)


def test_z85_rfc_vector_and_roundtrip():
    # ZeroMQ RFC 32's reference vector
    assert z85_encode(
        bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    ) == "HelloWorld"
    for b in (b"\x00" * 4, bytes(range(16)), uuid.uuid4().bytes):
        assert z85_decode(z85_encode(b)) == b
    with pytest.raises(ValueError, match="not \\*4"):
        z85_encode(b"abc")
    with pytest.raises(ValueError, match="invalid z85"):
        z85_decode("~~~~~")


def test_roaring_roundtrip_spanning_containers_and_highs():
    rows = [0, 1, 5, 19, 65535, 65536, 70000,
            (1 << 32) + 3, (1 << 33) + 12345]
    blob = encode_dv_data(rows)
    assert decode_dv_data(blob, cardinality=len(rows)) == sorted(rows)
    # cardinality mismatch must raise, not silently mis-serve
    with pytest.raises(ValueError, match="cardinality mismatch"):
        decode_dv_data(blob, cardinality=len(rows) + 1)


def test_decode_handles_bitmap_and_run_containers():
    """The decoder must read the container kinds OTHER writers emit:
    a bitmap container (card > 4096) and a run container, both built
    by hand per RoaringFormatSpec."""
    # bitmap container: values 0..4999 within key 0
    vals = list(range(5000))
    words = [0] * 1024
    for v in vals:
        words[v // 64] |= 1 << (v % 64)
    bm = struct.pack("<II", 12346, 1)
    bm += struct.pack("<HH", 0, len(vals) - 1)
    bm += struct.pack("<I", 4 + 4 + 4 + 4)  # offset header
    bm += struct.pack("<1024Q", *words)
    data = struct.pack("<iq", DV_MAGIC, 1) + bm
    assert decode_dv_data(data) == vals

    # run container: cookie 12347, runs [10..14], [100..100]
    cookie = 12347 | ((1 - 1) << 16)
    rn = struct.pack("<I", cookie)
    rn += bytes([0b1])  # run flag for the single container
    rn += struct.pack("<HH", 0, 6 - 1)  # key 0, card 6
    rn += struct.pack("<H", 2)  # n_runs
    rn += struct.pack("<HH", 10, 4)   # 10..14
    rn += struct.pack("<HH", 100, 0)  # 100
    data = struct.pack("<iq", DV_MAGIC, 1) + rn
    assert decode_dv_data(data) == [10, 11, 12, 13, 14, 100]


def test_dv_file_framing_and_checksum():
    b1 = encode_dv_data([1, 3, 5])
    b2 = encode_dv_data([2, 4])
    f, offs = build_dv_file([b1, b2])
    assert f[0] == 1  # format version
    assert extract_dv_blob(f, offs[0], len(b1)) == b1
    assert extract_dv_blob(f, offs[1], len(b2)) == b2
    # size mismatch
    with pytest.raises(ValueError, match="size mismatch"):
        extract_dv_blob(f, offs[0], len(b1) + 1)
    # corrupted byte -> CRC failure
    bad = bytearray(f)
    bad[offs[0] + 6] ^= 0xFF
    with pytest.raises(ValueError, match="checksum"):
        extract_dv_blob(bytes(bad), offs[0], len(b1))
    # bad magic
    with pytest.raises(ValueError, match="magic"):
        decode_dv_data(b"\x00" * 16)


def test_dv_relative_path_prefix_parsing():
    u = uuid.uuid4()
    enc = z85_encode(u.bytes)
    assert dv_relative_path(enc) == f"deletion_vector_{u}.bin"
    assert dv_relative_path("ab" + enc) == f"ab/deletion_vector_{u}.bin"
