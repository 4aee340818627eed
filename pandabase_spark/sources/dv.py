"""Delta Lake deletion-vector codec — pure functions, no Spark.

Everything here derives from the PUBLIC protocol document
(https://github.com/delta-io/delta/blob/master/PROTOCOL.md, "Deletion
Vectors" + "Deletion Vector Format") and the RoaringBitmap
interchange spec (https://github.com/RoaringBitmap/RoaringFormatSpec):

- a DV descriptor rides the add action: ``{storageType,
  pathOrInlineDv, offset?, sizeInBytes, cardinality}``;
- storage type ``u``: pathOrInlineDv = ``[<random prefix>]<20-char
  Z85 uuid>`` naming ``<prefix>/deletion_vector_<uuid>.bin`` under
  the table root; ``p``: an absolute path; ``i``: the DV data itself
  Z85-inlined;
- in a DV FILE (format version 1) each DV blob is ``[size int32 BE]
  [data][checksum int32 BE]`` at the descriptor's ``offset``, where
  ``checksum = crc32(data)`` and ``sizeInBytes = len(data)``;
- the data is Delta's 64-bit RoaringBitmapArray in its "portable"
  format: ``magic int32 LE = 1681511377``, ``int64 LE bitmap
  count``, then per 32-bit key (implicit high word 0..n-1) one
  standard portable roaring bitmap (RoaringFormatSpec, little-
  endian: array / bitmap / run containers).

The module provides decode (the reader's needs: blob -> sorted row
indexes) and a minimal encoder (array containers only — enough for
fixtures and for exporting small DVs); both ends verify size, CRC,
magic and cardinality so a corrupt sidecar raises instead of
resurrecting or dropping rows.
"""

from __future__ import annotations

import struct
import zlib

DV_MAGIC = 1681511377
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE_RUN = 12347
_NO_OFFSET_THRESHOLD = 4

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_DECODE = {c: i for i, c in enumerate(_Z85_ALPHABET)}


def z85_encode(data: bytes) -> str:
    """ZeroMQ base85: 4-byte big-endian groups -> 5 chars, most
    significant digit first. Input length must be a multiple of 4
    (uuids are 16 bytes; DV inline payloads are padded by the
    writer per the protocol)."""
    if len(data) % 4:
        raise ValueError(f"z85 input length {len(data)} not *4")
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i:i + 4], "big")
        chunk = []
        for _ in range(5):
            v, rem = divmod(v, 85)
            chunk.append(_Z85_ALPHABET[rem])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError(f"z85 text length {len(text)} not *5")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i:i + 5]:
            if c not in _Z85_DECODE:
                raise ValueError(f"invalid z85 character {c!r}")
            v = v * 85 + _Z85_DECODE[c]
        out += v.to_bytes(4, "big")
    return bytes(out)


def dv_relative_path(path_or_inline: str) -> str:
    """Table-root-relative DV file path for a storageType-``u``
    descriptor: all characters before the final 20 are an optional
    random prefix directory, the last 20 are the Z85 uuid."""
    import uuid as _uuid

    prefix, tail = path_or_inline[:-20], path_or_inline[-20:]
    u = _uuid.UUID(bytes=z85_decode(tail))
    name = f"deletion_vector_{u}.bin"
    return f"{prefix}/{name}" if prefix else name


def _parse_roaring32(data: bytes, pos: int) -> "tuple[list[int], int]":
    """One standard portable 32-bit roaring bitmap at ``pos``:
    (sorted values, new pos). Array, bitmap and run containers per
    RoaringFormatSpec."""
    (cookie,) = struct.unpack_from("<I", data, pos)
    pos += 4
    run_flags = None
    if (cookie & 0xFFFF) == _SERIAL_COOKIE_RUN:
        n_cont = (cookie >> 16) + 1
        n_flag_bytes = (n_cont + 7) // 8
        run_flags = data[pos:pos + n_flag_bytes]
        pos += n_flag_bytes
        has_offsets = n_cont >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n_cont,) = struct.unpack_from("<I", data, pos)
        pos += 4
        has_offsets = True
    else:
        raise ValueError(f"bad roaring cookie {cookie}")
    keys_cards = []
    for _ in range(n_cont):
        key, card_m1 = struct.unpack_from("<HH", data, pos)
        pos += 4
        keys_cards.append((key, card_m1 + 1))
    if has_offsets:
        pos += 4 * n_cont  # offset header — sequential parse skips it
    values: "list[int]" = []
    for idx, (key, card) in enumerate(keys_cards):
        base = key << 16
        is_run = bool(
            run_flags is not None
            and run_flags[idx // 8] & (1 << (idx % 8))
        )
        if is_run:
            (n_runs,) = struct.unpack_from("<H", data, pos)
            pos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", data, pos)
                pos += 4
                values.extend(
                    base | v for v in range(start, start + length + 1)
                )
        elif card <= 4096:
            vals = struct.unpack_from(f"<{card}H", data, pos)
            pos += 2 * card
            values.extend(base | v for v in vals)
        else:
            words = struct.unpack_from("<1024Q", data, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    low = (w & -w).bit_length() - 1
                    values.append(base | (wi * 64 + low))
                    w &= w - 1
    return values, pos


def decode_dv_data(data: bytes, *, cardinality: "int | None" = None) -> (
    "list[int]"
):
    """DV data blob (magic + RoaringBitmapArray portable) -> sorted
    64-bit row indexes. Verifies the magic and, when given, the
    descriptor cardinality — a mismatch means rows would silently
    resurrect or vanish, so it raises."""
    if len(data) < 12:
        raise ValueError(f"deletion vector too short: {len(data)}B")
    (magic,) = struct.unpack_from("<i", data, 0)
    if magic != DV_MAGIC:
        raise ValueError(f"bad deletion-vector magic {magic}")
    (n_bitmaps,) = struct.unpack_from("<q", data, 4)
    pos = 12
    out: "list[int]" = []
    for high in range(n_bitmaps):
        vals, pos = _parse_roaring32(data, pos)
        out.extend((high << 32) | v for v in vals)
    if cardinality is not None and len(out) != cardinality:
        raise ValueError(
            f"deletion vector cardinality mismatch: descriptor says "
            f"{cardinality}, bitmap holds {len(out)}"
        )
    return sorted(out)


def extract_dv_blob(file_bytes: bytes, offset: int, size: int) -> bytes:
    """The DV data at ``offset`` in a version-1 DV file, with the
    length field and CRC-32 verified against the descriptor."""
    if not file_bytes or file_bytes[0] != 1:
        raise ValueError(
            "unsupported deletion-vector file version "
            f"{file_bytes[0] if file_bytes else 'empty'}"
        )
    (stored_size,) = struct.unpack_from(">i", file_bytes, offset)
    if stored_size != size:
        raise ValueError(
            f"DV size mismatch at offset {offset}: stored "
            f"{stored_size}, descriptor {size}"
        )
    data = file_bytes[offset + 4:offset + 4 + size]
    (crc,) = struct.unpack_from(">i", file_bytes, offset + 4 + size)
    if (zlib.crc32(data) & 0xFFFFFFFF) != (crc & 0xFFFFFFFF):
        raise ValueError(f"DV checksum mismatch at offset {offset}")
    return data


# --------------------------------------------------------------------------
# encoder (fixtures / small exports): array containers only
# --------------------------------------------------------------------------


def encode_dv_data(row_indexes: "list[int]") -> bytes:
    """Row indexes -> DV data blob (magic + RoaringBitmapArray
    portable, array containers — every container here is <=4096
    values; larger DVs would use bitmap containers, which the decoder
    handles but fixtures never need)."""
    by_high: "dict[int, list[int]]" = {}
    for ri in sorted(set(int(r) for r in row_indexes)):
        if ri < 0:
            raise ValueError(f"negative row index {ri}")
        by_high.setdefault(ri >> 32, []).append(ri & 0xFFFFFFFF)
    n_bitmaps = (max(by_high) + 1) if by_high else 0
    out = bytearray(struct.pack("<iq", DV_MAGIC, n_bitmaps))
    for high in range(n_bitmaps):
        lows = by_high.get(high, [])
        by_key: "dict[int, list[int]]" = {}
        for v in lows:
            by_key.setdefault(v >> 16, []).append(v & 0xFFFF)
        keys = sorted(by_key)
        for k in keys:
            if len(by_key[k]) > 4096:
                raise ValueError(
                    "encoder supports array containers only "
                    f"(container {k} has {len(by_key[k])} values)"
                )
        out += struct.pack("<II", _SERIAL_COOKIE_NO_RUN, len(keys))
        for k in keys:
            out += struct.pack("<HH", k, len(by_key[k]) - 1)
        # offset header: container start offsets from bitmap start
        cont_pos = 4 + 4 + 4 * len(keys) + 4 * len(keys)
        for k in keys:
            out += struct.pack("<I", cont_pos)
            cont_pos += 2 * len(by_key[k])
        for k in keys:
            out += struct.pack(f"<{len(by_key[k])}H", *by_key[k])
    return bytes(out)


def build_dv_file(blobs: "list[bytes]") -> "tuple[bytes, list[int]]":
    """A version-1 DV file holding ``blobs`` -> (file bytes, offset
    per blob) — each framed [size BE][data][crc32 BE] as the protocol
    prescribes."""
    out = bytearray(b"\x01")
    offsets = []
    for data in blobs:
        offsets.append(len(out))
        out += struct.pack(">i", len(data))
        out += data
        out += struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
    return bytes(out), offsets
