"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Media (image/audio/video) is carried as an opaque ``binary`` column
next to typed metadata columns — the storage layer (keyed tables,
parquet segments) treats it like any other value column, and everything
metadata-shaped (sizes, content hashes, format sniffing) runs JVM-side.

Decode/feature-extraction is Python territory and runs through
``mapInPandas`` (Arrow-batched iterator-of-DataFrames — the ONLY
sanctioned Python boundary in this engine). The actual codecs (PIL,
torchvision, ffmpeg) are NOT available in this container, so the decode
step is STUBBED: ``decoder="fake"`` (default) derives deterministic
pseudo-features from the payload bytes so the full pipeline — schema,
batching, partitioning, one-to-many frame explosion — is real and
tested end-to-end. ``decoder="real"`` lazily imports PIL (decode /
resize) when installed and raises NotImplementedError at the exact
codec seam when it is not; frame sampling and payload embedding keep
the hard stub (they need ffmpeg / a model, never present here).

Scale notes: payload columns ride the same hash-bucketed segments as
scalars (parquet stores binary efficiently); mapInPandas batch size is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` — for
multi-MB payloads set it low (e.g. 64) to keep executor memory flat.
The reference has no media support of any kind; this is pure extension
surface.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

FAKE = "fake"
REAL = "real"
PPM = "ppm"
AUTO = "auto"

_STUB_MSG = (
    "real media decode requires a codec library (PIL/torchaudio/ffmpeg) "
    "that is not installed in this environment; the Spark-side plumbing "
    "is complete — plug a decoder in here"
)


def _require_pil():
    """Lazy optional dependency: ``decoder='real'`` uses PIL when it is
    installed and degrades to the documented NotImplementedError seam
    when it is not — the plumbing (schema, batching, pruning) is
    identical either way."""
    try:
        from PIL import Image

        return Image
    except ImportError as ex:
        raise NotImplementedError(_STUB_MSG) from ex


def _parse_ppm(payload: bytes):
    """Parse a binary PPM (P6) image with NO dependencies: magic,
    whitespace/comment-separated width/height/maxval, one whitespace,
    then ``w*h*3`` raw bytes. Returns ``(w, h, maxval, pixel_bytes)``
    or ``None`` for anything malformed/truncated (callers surface
    nulls, never crash a batch) — the dependency-free codec that makes
    the decode seam REAL in this container (PIL/ffmpeg stay behind
    the documented lazy-import seam for every other format)."""
    if not payload or not payload.startswith(b"P6"):
        return None
    i, n, vals = 2, len(payload), []
    while len(vals) < 3 and i < n:
        c = payload[i:i + 1]
        if c.isspace():
            i += 1
        elif c == b"#":
            j = payload.find(b"\n", i)
            if j < 0:
                return None
            i = j + 1
        elif c.isdigit():
            j = i
            while j < n and payload[j:j + 1].isdigit():
                j += 1
            vals.append(int(payload[i:j]))
            i = j
        else:
            return None
    if len(vals) < 3 or i >= n or not payload[i:i + 1].isspace():
        return None
    i += 1  # exactly ONE whitespace byte separates maxval from data
    w, h, maxval = vals
    if w <= 0 or h <= 0 or not 0 < maxval < 256:
        return None
    need = w * h * 3
    data = payload[i:i + need]
    if len(data) < need:
        return None
    return w, h, maxval, data


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color_type -> samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 6: 4}  # type 3: 1 index byte/px
# per-image decoded-size ceiling (bytes): large enough for any real
# 8-bit image a row would carry, small enough that a forged header
# cannot direct the inflater to allocate executor-killing buffers.
# 32 MB (≈ a 3300x3300 RGB frame) rather than a memory-only bound:
# the unfilter loop is pure Python, so the cap bounds CPU per hostile
# row too — a crafted ~300 KB zlib bomb under a loose 256 MB cap
# would cost minutes of executor time in unfilter iterations while
# never exceeding memory. A matching pixel-count cap below rejects
# absurd dimensions independent of byte math.
_PNG_MAX_DECODED = 1 << 25  # 32 MB
_PNG_MAX_PIXELS = 1 << 24  # 16M pixels (w*h)
# JPEG gets a TIGHTER cap than PNG (r11 advice): decode cost per pixel
# (pure-Python huffman bit loop + per-block numpy dequant/IDCT) is far
# higher than PNG's vectorized unfilter, so the 16Mpx bound that was
# fine there is a CPU bomb here. 4M pixels ≈ 2048×2048.
_JPEG_MAX_PIXELS = 1 << 22


def _png_unfilter(raw: bytes, w: int, h: int, ch: int):
    """Undo PNG per-row filtering (spec §6: None/Sub/Up/Average/Paeth).
    ``raw`` is ``h`` rows of ``1 + w*ch`` bytes (filter byte + filtered
    samples); returns the reconstructed ``w*h*ch`` pixel bytes or None
    on a bad filter code / short input."""
    stride = w * ch
    if len(raw) < h * (stride + 1):
        return None
    out = bytearray(h * stride)
    prev_off = -stride
    pos = 0
    for _y in range(h):
        ft = raw[pos]
        pos += 1
        row = raw[pos:pos + stride]
        pos += stride
        o = prev_off + stride  # this row's offset in out
        if ft == 0:  # None
            out[o:o + stride] = row
        elif ft == 1:  # Sub
            for x in range(stride):
                a = out[o + x - ch] if x >= ch else 0
                out[o + x] = (row[x] + a) & 0xFF
        elif ft == 2:  # Up
            for x in range(stride):
                b = out[prev_off + x] if prev_off >= 0 else 0
                out[o + x] = (row[x] + b) & 0xFF
        elif ft == 3:  # Average
            for x in range(stride):
                a = out[o + x - ch] if x >= ch else 0
                b = out[prev_off + x] if prev_off >= 0 else 0
                out[o + x] = (row[x] + ((a + b) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for x in range(stride):
                a = out[o + x - ch] if x >= ch else 0
                b = out[prev_off + x] if prev_off >= 0 else 0
                c = (
                    out[prev_off + x - ch]
                    if (prev_off >= 0 and x >= ch)
                    else 0
                )
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[o + x] = (row[x] + pr) & 0xFF
        else:
            return None
        prev_off = o
    return bytes(out)


def _parse_png(payload: bytes):
    """Parse an 8-bit non-interlaced PNG (grayscale / RGB / RGBA /
    PALETTE) with NO dependencies beyond the stdlib: signature, chunk
    walk (IHDR → [PLTE] → IDAT* → IEND), zlib inflate, per-row
    unfilter (all five spec filters — :func:`_png_unfilter`), and for
    color type 3 the palette lookup expanding index bytes to RGB (so
    palette images return ``channels=3`` like RGB ones — r11, the
    subset web screenshots and sprite corpora actually use). Returns
    ``(w, h, channels, pixel_bytes)`` or ``None`` for anything
    malformed, truncated, or outside the supported subset (16-bit,
    Adam7 interlace, an out-of-range palette index) — callers surface
    nulls, never crash a batch. Together with :func:`_parse_ppm` this makes the decode
    seam real for a COMPRESSED container format: a decode bug in the
    inflate/unfilter pipeline breaks the oracle hash, not just a
    header field."""
    import struct
    import zlib

    try:
        if not payload or not payload.startswith(_PNG_SIG):
            return None
        i, n = len(_PNG_SIG), len(payload)
        ihdr = None
        plte = None
        idat = bytearray()
        while i + 8 <= n:
            (length,) = struct.unpack(">I", payload[i:i + 4])
            ctype = payload[i + 4:i + 8]
            data = payload[i + 8:i + 8 + length]
            if len(data) < length:
                return None
            if ctype == b"IHDR":
                ihdr = data
            elif ctype == b"PLTE":
                plte = data
            elif ctype == b"IDAT":
                idat += data
            elif ctype == b"IEND":
                break
            i += 12 + length  # length + type + data + crc
        if ihdr is None or len(ihdr) != 13 or not idat:
            return None
        w, h, depth, color, comp, filt, interlace = struct.unpack(
            ">IIBBBBB", ihdr
        )
        if (
            w <= 0 or h <= 0 or depth != 8 or comp != 0 or filt != 0
            or interlace != 0 or color not in _PNG_CHANNELS
        ):
            return None
        ch = _PNG_CHANNELS[color]
        expected = h * (w * ch + 1)
        # Decompression-bomb guard: the expected decoded size is fully
        # determined by the validated IHDR, so (a) reject absurd
        # claimed dimensions before allocating anything, and (b) cap
        # the inflater at exactly that size — a forged tiny IDAT
        # claiming a multi-GB image must null its row, never OOM the
        # executor (the batch-survives contract holds for hostile
        # payloads, not just truncated ones).
        if expected > _PNG_MAX_DECODED or w * h > _PNG_MAX_PIXELS:
            return None
        dec = zlib.decompressobj()
        raw = dec.decompress(bytes(idat), expected)
        if len(raw) != expected or dec.decompress(b"", 1):
            return None  # short stream, or more output than claimed
        pixels = _png_unfilter(raw, w, h, ch)
        if pixels is None:
            return None
        if color == 3:
            # palette expansion: index plane → RGB through PLTE
            # (vectorized — a legitimate multi-megapixel type-3 PNG
            # must not pay a per-pixel Python loop)
            if plte is None or len(plte) % 3 or not plte:
                return None
            import numpy as np

            idx = np.frombuffer(pixels, dtype=np.uint8)
            if int(idx.max(initial=0)) >= len(plte) // 3:
                return None  # out-of-range index: malformed
            pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
            return w, h, 3, pal[idx].tobytes()
        return w, h, ch, pixels
    except Exception:
        return None


def _png_filter_row(ft: int, row: bytes, prev: bytes, ch: int) -> bytes:
    """Apply PNG filter ``ft`` to ``row`` (encoder side — the exact
    inverse of :func:`_png_unfilter`, used to synthesize payloads that
    exercise every filter on decode)."""
    stride = len(row)
    out = bytearray(stride)
    for x in range(stride):
        a = row[x - ch] if x >= ch else 0
        b = prev[x] if prev else 0
        c = prev[x - ch] if (prev and x >= ch) else 0
        if ft == 0:
            v = row[x]
        elif ft == 1:
            v = row[x] - a
        elif ft == 2:
            v = row[x] - b
        elif ft == 3:
            v = row[x] - ((a + b) >> 1)
        elif ft == 4:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            v = row[x] - pr
        else:
            raise ValueError(f"bad filter {ft}")
        out[x] = v & 0xFF
    return bytes(out)


def encode_png(
    w: int, h: int, ch: int, pixels: bytes, *,
    row_filter=None,
    palette: "bytes | None" = None,
) -> bytes:
    """Minimal spec-correct PNG encoder (stdlib only): 8-bit
    grayscale/RGB/RGBA, one IDAT, correct CRCs. ``row_filter(y)``
    picks the filter type per row (default 0/None) — encoding with
    Sub/Up/Average/Paeth makes the DECODER's unfilter path do real
    work, which is exactly what the oracle-checked query wants.
    ``palette`` (RGB triples) switches to color type 3: ``pixels``
    are then palette INDEX bytes (ch must be 1) and a PLTE chunk is
    emitted — the synthesis half of the r11 palette decode path."""
    import struct
    import zlib

    if palette is not None:
        if ch != 1 or len(palette) % 3 or not palette:
            raise ValueError("palette PNGs take index bytes (ch=1)")
        color = 3
    else:
        color = {1: 0, 3: 2, 4: 6}[ch]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    stride = w * ch
    body = bytearray()
    prev = b""
    for y in range(h):
        row = pixels[y * stride:(y + 1) * stride]
        ft = row_filter(y) if row_filter is not None else 0
        body.append(ft)
        body += _png_filter_row(ft, row, prev, ch)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    out = _PNG_SIG + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", palette)
    return (
        out
        + chunk(b"IDAT", zlib.compress(bytes(body)))
        + chunk(b"IEND", b"")
    )


def attach_png_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL compressed image bytes: a solid-color 8-bit
    RGB PNG whose dimensions and color derive arithmetically from the
    id — width = 4 + id % 6, height = 4 + id % 5,
    RGB = (id, 5·id, 7·id) mod 256 — encoded with the row's filter
    type cycling 0..4, so decoding exercises inflate AND all five
    unfilter paths while a SQL oracle still recomputes every decoded
    stat from the id alone. Arrow-batched mapInPandas, same
    bounded-memory contract as the decoders."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                w, h = 4 + i % 6, 4 + i % 5
                px = bytes([i % 256, (5 * i) % 256, (7 * i) % 256]) * (w * h)
                payloads.append(
                    encode_png(w, h, 3, px, row_filter=lambda y: y % 5)
                )
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "payload": payloads,
                    "media_type": "image/png",
                }
            )

    return df.select(id_col).mapInPandas(
        run, f"{id_col} long, payload binary, media_type string"
    )


def decode_png_stats(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Integer-exact decode stats over real PNG bytes (signature →
    chunk walk → inflate → unfilter → pixel sum); malformed payloads
    yield null stats. Same schema and seam as
    :func:`decode_ppm_stats`, so the two codecs share their oracle
    shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, chs, sums, npx = [], [], [], [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                ids.append(int(i))
                parsed = _parse_png(p if p is not None else b"")
                if parsed is None:
                    ws.append(None); hs.append(None); chs.append(None)
                    sums.append(None); npx.append(None)
                    continue
                w, h, ch, data = parsed
                ws.append(w); hs.append(h); chs.append(ch)
                sums.append(sum(data)); npx.append(w * h)
            yield pd.DataFrame(
                {
                    "id": ids, "width": ws, "height": hs,
                    "channels": chs, "sum_bytes": sums,
                    "n_pixels": npx,
                },
                dtype="object",
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, PPM_STATS_SCHEMA
    )


def attach_ppm_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL image bytes: a solid-color binary PPM (P6)
    whose dimensions and color derive arithmetically from the id —
    width = 8 + id % 8, height = 8 + id % 4, RGB = (id, 2·id, 3·id)
    mod 256. Unlike :func:`attach_fake_payload` (arbitrary bytes) the
    payload is a genuine image an external tool can open, the decode
    path does real header/pixel parsing, and a SQL oracle can
    recompute every decoded stat from the id alone. Returns
    (id_col, payload, media_type) — Arrow-batched mapInPandas, same
    bounded-memory contract as the decoders."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                w, h = 8 + i % 8, 8 + i % 4
                rgb = bytes([i % 256, (2 * i) % 256, (3 * i) % 256])
                payloads.append(
                    b"P6\n# synthetic\n%d %d\n255\n" % (w, h)
                    + rgb * (w * h)
                )
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "payload": payloads,
                    "media_type": "image/x-portable-pixmap",
                }
            )

    return df.select(id_col).mapInPandas(
        run, f"{id_col} long, payload binary, media_type string"
    )


PPM_STATS_SCHEMA = (
    "id long, width int, height int, channels int, sum_bytes long, "
    "n_pixels long"
)


def decode_ppm_stats(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Integer-exact decode stats over real PPM bytes: width, height,
    channels, the SUM of all pixel bytes and the pixel count — chosen
    integer so a SQL oracle can compare value-exactly with no
    float-rounding hazard. Malformed/truncated payloads yield null
    stats (never a crashed batch). Same Arrow-batched mapInPandas
    seam as :func:`decode_images`."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, chs, sums, npx = [], [], [], [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                ids.append(int(i))
                parsed = _parse_ppm(p if p is not None else b"")
                if parsed is None:
                    ws.append(None); hs.append(None); chs.append(None)
                    sums.append(None); npx.append(None)
                    continue
                w, h, _maxval, data = parsed
                ws.append(w); hs.append(h); chs.append(3)
                sums.append(sum(data)); npx.append(w * h)
            yield pd.DataFrame(
                {
                    "id": ids, "width": ws, "height": hs,
                    "channels": chs, "sum_bytes": sums,
                    "n_pixels": npx,
                },
                dtype="object",
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, PPM_STATS_SCHEMA
    )


def _parse_wav(payload: bytes):
    """Parse a RIFF/WAVE container holding PCM (format 1) audio with
    NO dependencies: RIFF header, chunk walk to ``fmt `` and ``data``,
    8/16-bit integer samples. Returns
    ``(channels, sample_rate, bits, frames, samples)`` where
    ``samples`` is a flat list of integer sample values (interleaved
    channels), or ``None`` for anything malformed/truncated/non-PCM —
    callers surface nulls, never crash a batch. The audio counterpart
    of :func:`_parse_ppm`/:func:`_parse_png`: the third REAL modality
    through the same seam (torchaudio/ffmpeg formats stay behind the
    lazy-import seam)."""
    import struct

    try:
        if (
            not payload
            or len(payload) < 12
            or payload[:4] != b"RIFF"
            or payload[8:12] != b"WAVE"
        ):
            return None
        i, n = 12, len(payload)
        fmt = None
        data = None
        while i + 8 <= n:
            ctype = payload[i:i + 4]
            (length,) = struct.unpack("<I", payload[i + 4:i + 8])
            body = payload[i + 8:i + 8 + length]
            if len(body) < length:
                return None
            if ctype == b"fmt ":
                fmt = body
            elif ctype == b"data":
                data = body
            i += 8 + length + (length & 1)  # chunks are word-aligned
        if fmt is None or data is None or len(fmt) < 16:
            return None
        audio_fmt, ch, rate, _brate, block, bits = struct.unpack(
            "<HHIIHH", fmt[:16]
        )
        if audio_fmt != 1 or ch <= 0 or rate <= 0 or bits not in (8, 16):
            return None
        bytes_per = bits // 8
        if block != ch * bytes_per:
            return None
        frames = len(data) // block
        if frames * block != len(data):
            return None
        if bits == 16:
            samples = list(
                struct.unpack(f"<{frames * ch}h", data)
            )
        else:
            samples = [b - 128 for b in data]  # 8-bit WAV is unsigned
        return ch, rate, bits, frames, samples
    except Exception:
        return None


def encode_wav(
    ch: int, rate: int, bits: int, samples: "list[int]"
) -> bytes:
    """Minimal spec-correct PCM WAV encoder (stdlib only) — the
    synthesis half of the audio seam's oracle loop."""
    import struct

    bytes_per = bits // 8
    if bits == 16:
        data = struct.pack(f"<{len(samples)}h", *samples)
    else:
        data = bytes((s + 128) & 0xFF for s in samples)
    fmt = struct.pack(
        "<HHIIHH", 1, ch, rate, rate * ch * bytes_per,
        ch * bytes_per, bits,
    )
    # RIFF chunks are word-aligned: an odd-length data chunk (8-bit
    # audio, odd sample count) carries a pad byte that is NOT part of
    # the declared chunk length but IS part of the RIFF size — the
    # same rule the parser's chunk walk applies
    pad = b"\x00" if len(data) & 1 else b""
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data + pad
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


WAV_STATS_SCHEMA = (
    "id long, channels int, sample_rate int, bits int, n_frames long, "
    "sum_abs long"
)


def attach_wav_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL audio bytes: a 16-bit mono PCM WAV whose
    sample count and waveform derive arithmetically from the id —
    n_frames = 32 + id % 32, rate = 8000 + (id % 4) * 4000,
    sample[t] = ((id + t) % 200) - 100 (an integer sawtooth, so every
    decoded stat is integer-exact and a SQL oracle recomputes it from
    the id alone). Arrow-batched mapInPandas, same bounded-memory
    contract as the decoders."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                frames = 32 + i % 32
                rate = 8000 + (i % 4) * 4000
                samples = [((i + t) % 200) - 100 for t in range(frames)]
                payloads.append(encode_wav(1, rate, 16, samples))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "payload": payloads,
                    "media_type": "audio/wav",
                }
            )

    return df.select(id_col).mapInPandas(
        run, f"{id_col} long, payload binary, media_type string"
    )


def decode_wav_stats(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Integer-exact decode stats over real WAV bytes: channels,
    sample rate, bit depth, frame count, and the sum of absolute
    sample values — all integers, so the SQL oracle comparison is
    exact. Malformed payloads yield null stats. Same Arrow-batched
    mapInPandas seam as the image decoders."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, chs, rates, bits_, nfr, sab = [], [], [], [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                ids.append(int(i))
                parsed = _parse_wav(p if p is not None else b"")
                if parsed is None:
                    chs.append(None); rates.append(None)
                    bits_.append(None); nfr.append(None); sab.append(None)
                    continue
                ch, rate, bits, frames, samples = parsed
                chs.append(ch); rates.append(rate); bits_.append(bits)
                nfr.append(frames)
                sab.append(sum(abs(s) for s in samples))
            yield pd.DataFrame(
                {
                    "id": ids, "channels": chs, "sample_rate": rates,
                    "bits": bits_, "n_frames": nfr, "sum_abs": sab,
                },
                dtype="object",
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, WAV_STATS_SCHEMA
    )


MEDIA_STATS_SCHEMA = (
    "id long, format string, width int, height int, channels int, "
    "sum_bytes long, n_pixels long"
)


# ---------------------------------------------------------------------------
# Baseline JPEG (stdlib only): the fourth REAL codec through the seam —
# the first LOSSY, entropy-coded container (huffman + DCT + quantization)
# ---------------------------------------------------------------------------

# zigzag index -> raster index (JPEG spec figure A.6)
_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]
# uniform quantization tables (all 16s): valid per spec, and chosen so
# a solid block with an EVEN level-shifted value quantizes and
# reconstructs with NO rounding midpoints anywhere — the property that
# lets a SQL oracle replay the decode bit-exactly (see
# attach_jpeg_payload). Real-world tables drop in transparently: both
# sides read them from the file's own DQT segments.
_JPEG_QTAB = [16] * 64
# standard huffman table specs (JPEG Annex K shapes): (bits[16], symbols).
# Correctness does not depend on spec-exactness — the decoder builds
# its codes from the file's own DHT — but these cover every (run,size)
# symbol the encoder can emit.
_JPEG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_JPEG_AC_VALS = (
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
     0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
     0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
     0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
     0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
     0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
     0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
     0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
     0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
     0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
     0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
     0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
     0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA]
)


def _huff_codes(bits: "list[int]", vals: "list[int]"):
    """Canonical huffman code assignment (spec C.2): returns
    ``{symbol: (code, length)}``."""
    assert sum(bits) == len(vals), "malformed huffman spec"
    out = {}
    code = 0
    i = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[i]] = (code, ln)
            code += 1
            i += 1
        code <<= 1
    return out


_JPEG_COS = None  # (basis[u][x] = alpha(u)·cos((2x+1)uπ/16), lazy)
_JPEG_COS_NP = None  # the same basis as a cached numpy matrix
_JPEG_Q_NP: dict = {}  # qtab tuple -> cached 8x8 numpy array


def _jpeg_basis():
    global _JPEG_COS
    if _JPEG_COS is None:
        import math

        _JPEG_COS = [
            [
                (math.sqrt(0.125) if u == 0 else 0.5)
                * math.cos((2 * x + 1) * u * math.pi / 16)
                for x in range(8)
            ]
            for u in range(8)
        ]
    return _JPEG_COS


def _jpeg_basis_np():
    """Basis as a numpy matrix, converted ONCE — the per-block matmul
    path must not pay a list→array conversion per call (measured: the
    conversions dominated small-image decode throughput)."""
    global _JPEG_COS_NP
    if _JPEG_COS_NP is None:
        import numpy as np

        _JPEG_COS_NP = np.asarray(_jpeg_basis())
    return _JPEG_COS_NP


def _jpeg_q_np(qtab: "list[int]"):
    import numpy as np

    key = tuple(qtab)
    got = _JPEG_Q_NP.get(key)
    if got is None:
        if len(_JPEG_Q_NP) > 64:
            _JPEG_Q_NP.clear()  # hostile many-table streams: bounded
        got = _JPEG_Q_NP[key] = np.asarray(
            qtab, dtype="float64"
        ).reshape(8, 8)
    return got


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                b = self.acc & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s
        return bytes(self.out)

    def restart(self, idx: int) -> None:
        """Byte-align (1-padding, same as flush) and emit the RSTn
        marker — raw, never stuffed: markers live OUTSIDE the entropy
        byte stream."""
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)
        self.out += bytes([0xFF, 0xD0 + (idx % 8)])


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise EOFError
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise EOFError
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # unstuff
                else:
                    raise EOFError  # a marker inside the scan
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> int:
        """Consume an RSTn marker at a restart boundary: discard any
        remaining pad bits of the current byte (the encoder 1-pads to
        alignment before the marker), then require FF D0-D7 verbatim.
        Returns the marker's 0-7 sequence index; anything else is a
        corrupt stream (EOFError → the row nulls)."""
        self.n = 0
        # T.81 B.1.1.2: fill bytes (repeated 0xFF) may pad before the
        # marker — skip them so FF FF D0 reads as RST0
        while (
            self.pos + 2 < len(self.data)
            and self.data[self.pos] == 0xFF
            and self.data[self.pos + 1] == 0xFF
        ):
            self.pos += 1
        if self.pos + 2 > len(self.data) or self.data[self.pos] != 0xFF:
            raise EOFError
        m = self.data[self.pos + 1]
        if not (0xD0 <= m <= 0xD7):
            raise EOFError
        self.pos += 2
        return m - 0xD0


def _jpeg_extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _fdct_quant(block: "list[int]", qtab: "list[int]") -> "list[int]":
    """Forward 8x8 DCT (separable basis as two numpy matmuls:
    ``B @ f @ Bᵀ``) + quantization (round-half-UP — toward +inf for
    negative coefficients too — via floor(x+0.5); NOT the spec-style
    half-away-from-zero, which only differs on exact midpoints the
    oracle payloads never produce); input is the level-shifted spatial block in raster
    order, output the 64 quantized coefficients in raster order.
    Vectorized: the nested-loop form cost ~4096 Python mults per
    block and dominated the decode-seam bench (9.5s → ~1s at sf0.1).
    Matmul reorders the float additions vs a scalar loop, but the
    codec's exactness contract never depends on which side of a
    rounding midpoint a ~1e-13 error lands — the oracle-exact
    payloads are midpoint-free by construction."""
    import numpy as np

    B = _jpeg_basis_np()
    f = np.asarray(block, dtype="float64").reshape(8, 8)
    F_ = B @ f @ B.T
    q = _jpeg_q_np(qtab)
    return [
        int(v) for v in np.floor(F_ / q + 0.5).astype("int64").ravel()
    ]


def _dequant_idct(coef: "list[int]", qtab: "list[int]") -> "list[int]":
    """Dequantize + inverse 8x8 DCT (``Bᵀ @ F @ B``); returns clamped
    0..255 spatial samples (raster order, level shift undone). Same
    vectorization rationale as :func:`_fdct_quant`."""
    import numpy as np

    B = _jpeg_basis_np()
    F_ = np.asarray(coef, dtype="float64").reshape(8, 8) * _jpeg_q_np(
        qtab
    )
    f = B.T @ F_ @ B
    out = np.floor(f + 128 + 0.5)
    return [int(v) for v in np.clip(out, 0, 255).astype("int64").ravel()]


def encode_jpeg(
    w: int, h: int, ncomp: int, pixels: bytes,
    subsampling: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """Minimal spec-correct baseline JFIF encoder (stdlib only):
    grayscale (ncomp=1) or YCbCr color (ncomp=3, RGB input) at
    ``subsampling`` "444" (1×1 everywhere), "420" (Y at 2×2, chroma
    box-filter-averaged 2× on both axes and MCU-interleaved 4Y+Cb+Cr
    — r12, the decoder-side ask #4's synthesis half), or "422" (Y at
    2×1, chroma halved horizontally — the broadcast-video convention),
    optional DRI
    restart intervals (``restart_interval`` MCUs per segment: RSTn
    emission with byte alignment and DC predictor resets — r12),
    uniform quant tables, standard huffman tables, full forward DCT +
    entropy coding. The synthesis half of the JPEG seam's oracle loop — every
    byte it emits is consumed back through :func:`_parse_jpeg`'s real
    huffman/dequant/IDCT pipeline. For payloads whose pixels are
    constant over each 2×2 cell the 420 round trip is exactly as
    invertible as 444 (the box filter and the nearest-neighbor
    upsample cancel)."""
    import math
    import struct

    if ncomp not in (1, 3) or len(pixels) != w * h * ncomp:
        raise ValueError("encode_jpeg: bad shape")
    if subsampling not in ("444", "422", "420"):
        raise ValueError(f"unsupported subsampling: {subsampling!r}")
    if subsampling != "444" and ncomp == 1:
        subsampling = "444"  # grayscale has no chroma to subsample
    if restart_interval < 0 or restart_interval > 0xFFFF:
        raise ValueError(f"bad restart_interval: {restart_interval}")
    if progressive and restart_interval:
        raise ValueError(
            "progressive encoding does not emit restart markers"
        )
    # component planes, level-shifted
    import numpy as np

    if ncomp == 1:
        planes = [
            np.frombuffer(pixels, dtype=np.uint8).astype("int64") - 128
        ]
    else:
        # vectorized JFIF RGB→YCbCr (same elementwise floor(x+0.5)
        # the scalar loop computed)
        arr = (
            np.frombuffer(pixels, dtype=np.uint8)
            .reshape(-1, 3)
            .astype("float64")
        )
        r, g, b = arr[:, 0], arr[:, 1], arr[:, 2]
        ys = np.floor(
            0.299 * r + 0.587 * g + 0.114 * b + 0.5
        ).astype("int64") - 128
        cbs = np.floor(
            128 - 0.168736 * r - 0.331264 * g + 0.5 * b + 0.5
        ).astype("int64") - 128
        crs = np.floor(
            128 + 0.5 * r - 0.418688 * g - 0.081312 * b + 0.5
        ).astype("int64") - 128
        planes = [ys, cbs, crs]
    # per-component sampling geometry (mirrors the decoder's): planes
    # become 2D at each component's natural resolution; 420 box-
    # filter-averages chroma 2× per axis with floor(mean + 0.5)
    samp = {
        "420": [(2, 2), (1, 1), (1, 1)],
        "422": [(2, 1), (1, 1), (1, 1)],
    }.get(subsampling, [(1, 1)] * ncomp)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    planes2d = []
    for ci in range(ncomp):
        a = planes[ci].reshape(h, w)
        hi, vi = samp[ci]
        if hi != hmax or vi != vmax:
            fy, fx = vmax // vi, hmax // hi
            # pad to factor multiples by edge replication, then mean
            hp = (h + fy - 1) // fy * fy
            wp = (w + fx - 1) // fx * fx
            a = np.pad(a, ((0, hp - h), (0, wp - w)), mode="edge")
            s4 = (
                a.reshape(hp // fy, fy, wp // fx, fx)
                .sum(axis=(1, 3))
            )
            a = (s4 + (fy * fx) // 2) // (fy * fx)
        planes2d.append(a)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    dc_codes = _huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _huff_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    writer = _BitWriter()
    prev_dc = [0] * ncomp

    def emit_block(coefs: "list[int]") -> None:
        zz = [coefs[_JPEG_ZIGZAG[i]] for i in range(64)]
        diff = zz[0] - prev_dc[ci]
        prev_dc[ci] = zz[0]
        t = abs(diff).bit_length()
        code, ln = dc_codes[t]
        writer.put(code, ln)
        if t:
            writer.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
        run = 0
        last_nz = 0
        for k in range(63, 0, -1):
            if zz[k]:
                last_nz = k
                break
        for k in range(1, last_nz + 1):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                c, l_ = ac_codes[0xF0]  # ZRL
                writer.put(c, l_)
                run -= 16
            t = abs(zz[k]).bit_length()
            c, l_ = ac_codes[(run << 4) | t]
            writer.put(c, l_)
            writer.put(
                zz[k] if zz[k] >= 0 else zz[k] + (1 << t) - 1, t
            )
            run = 0
        if last_nz < 63:
            c, l_ = ac_codes[0x00]  # EOB
            writer.put(c, l_)

    def extract_block(ci: int, bx: int, by: int) -> "list[int]":
        a = planes2d[ci]
        hc, wc = a.shape
        block = []
        for y in range(8):
            sy = min(by * 8 + y, hc - 1)
            for x in range(8):
                sx = min(bx * 8 + x, wc - 1)
                block.append(int(a[sy, sx]))
        return _fdct_quant(block, _JPEG_QTAB)

    if progressive:
        full = [(mcux * hi, mcuy * vi) for hi, vi in samp]
        store = [
            [
                extract_block(ci, bx, by)
                for by in range(full[ci][1])
                for bx in range(full[ci][0])
            ]
            for ci in range(ncomp)
        ]
        return _encode_jpeg_progressive(
            w, h, ncomp, samp, mcux, mcuy, full, store, dc_codes,
        )

    for my in range(mcuy):
        for mx in range(mcux):
            mcu_i = my * mcux + mx
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                # byte-align + RST(n cycling 0-7) + DC predictor reset
                writer.restart((mcu_i // restart_interval - 1) % 8)
                prev_dc[:] = [0] * ncomp
            for ci in range(ncomp):
                hi, vi = samp[ci]
                for byy in range(vi):
                    for bxx in range(hi):
                        emit_block(extract_block(
                            ci, mx * hi + bxx, my * vi + byy
                        ))
    scan = writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    qt = bytes([_JPEG_QTAB[_JPEG_ZIGZAG[i]] for i in range(64)])
    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + qt)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes(
            [ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0]
        )
    out += seg(0xC0, sof)
    out += seg(
        0xC4,
        b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS),
    )
    out += seg(
        0xC4,
        b"\x10" + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS),
    )
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _encode_jpeg_progressive(
    w, h, ncomp, samp, mcux, mcuy, full, store, dc_codes
) -> bytes:
    """Emit a SOF2 progressive JFIF stream from the quantized
    coefficient store — the synthesis half of the r12 progressive
    decoder, covering BOTH progression axes so round-trips exercise
    every decode branch: spectral selection (DC scan, then the 1-63
    AC band per component) and successive approximation (first scans
    at Al=1, then Ah=1→Al=0 refinement scans — DC raw bits; AC via
    the libjpeg correction-bit protocol: newly-significant ±1 runs,
    EOBRUN accumulation, and correction bits for already-significant
    coefficients buffered in block order and flushed after the next
    emitted symbol)."""
    import struct

    # the STANDARD baseline AC table has no EOBn (n>0) symbols —
    # progressive needs them for EOB runs, so the progressive scans
    # carry their own flat canonical table (all 176 run/size symbols
    # at 8 bits: 176·2⁸ ≤ 2¹⁶, canonically valid; bulkier than an
    # optimized table, but the decoder must handle arbitrary DHTs
    # anyway — which this also exercises)
    prog_ac_bits = [0] * 7 + [176] + [0] * 8
    prog_ac_vals = [(r << 4) | s for r in range(16) for s in range(11)]
    ac_codes = _huff_codes(prog_ac_bits, prog_ac_vals)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(
            ">BBH", 0xFF, marker, len(payload) + 2
        ) + payload

    def put_val(wr, v: int, t: int) -> None:
        if t:
            wr.put(v if v >= 0 else v + (1 << t) - 1, t)

    # --- scan emitters ------------------------------------------------
    def dc_first(al: int) -> bytes:
        wr = _BitWriter()
        pred = [0] * ncomp
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(ncomp):
                    hi, vi = samp[ci]
                    for byy in range(vi):
                        for bxx in range(hi):
                            idx = (
                                (my * vi + byy) * full[ci][0]
                                + mx * hi + bxx
                            )
                            v = store[ci][idx][0] >> al  # arithmetic
                            diff = v - pred[ci]
                            pred[ci] = v
                            t = abs(diff).bit_length()
                            code, ln = dc_codes[t]
                            wr.put(code, ln)
                            put_val(wr, diff, t)
        return wr.flush()

    def dc_refine(al: int) -> bytes:
        wr = _BitWriter()
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(ncomp):
                    hi, vi = samp[ci]
                    for byy in range(vi):
                        for bxx in range(hi):
                            idx = (
                                (my * vi + byy) * full[ci][0]
                                + mx * hi + bxx
                            )
                            wr.put((store[ci][idx][0] >> al) & 1, 1)
        return wr.flush()

    def ac_first(ci: int, ss: int, se: int, al: int) -> bytes:
        wr = _BitWriter()
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                rb = eobrun.bit_length() - 1
                code, ln = ac_codes[rb << 4]
                wr.put(code, ln)
                if rb:
                    wr.put(eobrun - (1 << rb), rb)
                eobrun = 0

        cbw, cbh = _comp_grid(w, h, samp, ci)
        bwfull = full[ci][0]
        for by in range(cbh):
            for bx in range(cbw):
                block = store[ci][by * bwfull + bx]
                tv = [0] * 64
                last_nz = 0
                for k in range(ss, se + 1):
                    c = block[_JPEG_ZIGZAG[k]]
                    t = (abs(c) >> al) * (1 if c >= 0 else -1)
                    tv[k] = t
                    if t:
                        last_nz = k
                if last_nz == 0:
                    eobrun += 1
                    if eobrun == 32767:
                        flush_eob()
                    continue
                flush_eob()
                run = 0
                for k in range(ss, last_nz + 1):
                    if tv[k] == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_codes[0xF0]
                        wr.put(code, ln)
                        run -= 16
                    t = abs(tv[k]).bit_length()
                    code, ln = ac_codes[(run << 4) | t]
                    wr.put(code, ln)
                    put_val(wr, tv[k], t)
                    run = 0
                if last_nz < se:
                    eobrun += 1
        flush_eob()
        return wr.flush()

    def ac_refine(ci: int, ss: int, se: int, ah: int, al: int) -> bytes:
        wr = _BitWriter()
        eobrun = 0
        buf: "list[int]" = []  # correction bits awaiting the next EOBn

        def flush_eob():
            nonlocal eobrun, buf
            if eobrun:
                rb = eobrun.bit_length() - 1
                code, ln = ac_codes[rb << 4]
                wr.put(code, ln)
                if rb:
                    wr.put(eobrun - (1 << rb), rb)
                for b in buf:
                    wr.put(b, 1)
                buf = []
                eobrun = 0

        cbw, cbh = _comp_grid(w, h, samp, ci)
        bwfull = full[ci][0]
        for by in range(cbh):
            for bx in range(cbw):
                block = store[ci][by * bwfull + bx]
                # last NEWLY-significant position: zero history
                # (abs>>ah == 0) becoming 1 at this precision
                last_sig = 0
                for k in range(ss, se + 1):
                    a_ = abs(block[_JPEG_ZIGZAG[k]])
                    if (a_ >> ah) == 0 and (a_ >> al) != 0:
                        last_sig = k
                if last_sig == 0:
                    # pure EOB block: corrections ride the run buffer
                    eobrun += 1
                    for k in range(ss, se + 1):
                        a_ = abs(block[_JPEG_ZIGZAG[k]])
                        if a_ >> ah:
                            buf.append((a_ >> al) & 1)
                    if eobrun == 32767:
                        flush_eob()
                    continue
                flush_eob()
                run = 0
                pend: "list[int]" = []
                for k in range(ss, last_sig + 1):
                    c = block[_JPEG_ZIGZAG[k]]
                    a_ = abs(c)
                    if (a_ >> al) == 0:
                        run += 1
                        continue
                    # nonzero at this precision (newly-significant OR
                    # a correction): pending ZRLs flush FIRST — the
                    # decoder's ZRL walk crosses only the corrections
                    # positioned among its 16 zeros, so a correction
                    # reached with run > 15 must come after the ZRL,
                    # not ride in its bit buffer (jcphuff ordering;
                    # the first draft flushed only at newly-significant
                    # coefs and corner blocks decoded wrong)
                    while run > 15:
                        code, ln = ac_codes[0xF0]
                        wr.put(code, ln)
                        for b in pend:
                            wr.put(b, 1)
                        pend = []
                        run -= 16
                    if a_ >> ah:
                        pend.append((a_ >> al) & 1)
                        continue
                    code, ln = ac_codes[(run << 4) | 1]
                    wr.put(code, ln)
                    wr.put(1 if c > 0 else 0, 1)
                    for b in pend:
                        wr.put(b, 1)
                    pend = []
                    run = 0
                # tail (after the last newly-significant coef): joins
                # the EOB run; its corrections buffer in block order
                # pend is empty here by construction: the loop ends
                # at last_sig, a newly-significant position whose
                # emission flushed it (r12 review)
                if last_sig < se:
                    eobrun += 1
                    for k in range(last_sig + 1, se + 1):
                        a_ = abs(block[_JPEG_ZIGZAG[k]])
                        if a_ >> ah:
                            buf.append((a_ >> al) & 1)
        flush_eob()
        return wr.flush()

    # --- stream assembly ----------------------------------------------
    qt = bytes([_JPEG_QTAB[_JPEG_ZIGZAG[i]] for i in range(64)])
    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + qt)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0])
    out += seg(0xC2, sof)
    out += seg(0xC4, b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS))
    out += seg(
        0xC4, b"\x11" + bytes(prog_ac_bits) + bytes(prog_ac_vals)
    )

    def sos(comp_ids, ss, se, ah, al, data):
        hdr = bytes([len(comp_ids)])
        for cid in comp_ids:
            hdr += bytes([cid + 1, 0x01])  # dc table 0, ac table 1
        hdr += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, hdr) + data

    out += sos(list(range(ncomp)), 0, 0, 0, 1, dc_first(1))
    out += sos(list(range(ncomp)), 0, 0, 1, 0, dc_refine(0))
    for ci in range(ncomp):
        out += sos([ci], 1, 63, 0, 1, ac_first(ci, 1, 63, 1))
    for ci in range(ncomp):
        out += sos([ci], 1, 63, 1, 0, ac_refine(ci, 1, 63, 1, 0))
    out += b"\xff\xd9"
    return bytes(out)


def _comp_grid(w, h, samp, ci):
    """Component-resolution block grid (non-interleaved scan
    coverage) — mirrors :func:`_jpeg_geometry`'s compgrid."""
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    hi, vi = samp[ci]
    cw = (w * hi + hmax - 1) // hmax
    ch = (h * vi + vmax - 1) // vmax
    return (cw + 7) // 8, (ch + 7) // 8


def _parse_jpeg(payload: bytes):
    """REAL baseline JPEG decoder with NO dependencies: marker walk
    (DQT/SOF0/DHT/SOS), canonical huffman entropy decode with byte
    unstuffing, dequantization, dezigzag, full inverse DCT, MCU
    de-interleave for sampling factors up to 2×2 (4:4:4, 4:2:2,
    4:4:0 and the near-universal 4:2:0, with nearest-neighbor chroma
    upsampling — r12), DRI restart intervals (RSTn consume + sequence
    check + DC predictor reset — r12), PROGRESSIVE (SOF2) streams —
    multi-scan spectral selection AND successive approximation:
    DC first/refinement, AC first with EOBRUN block skips, AC
    refinement with correction bits (ITU T.81 G.2 / the libjpeg
    decode_mcu_* protocol), accumulated per-coefficient and
    reconstructed at EOI (r12) — and (for 3 components) YCbCr→RGB
    conversion. Anything else — sampling factors above 2, arithmetic
    coding, hierarchical/lossless SOFs, truncated streams — returns
    None (callers surface nulls, never crash a batch). Returns
    ``(w, h, channels, pixel_bytes)`` like :func:`_parse_png`. The
    fourth modality codec, and the first LOSSY one: a bug anywhere in
    the huffman tables, coefficient decode, dequant, or IDCT changes
    the reconstructed pixels and breaks the oracle hash."""
    import struct

    try:
        if not payload or payload[:2] != b"\xff\xd8":
            return None
        i, n = 2, len(payload)
        qtabs: "dict[int, list[int]]" = {}
        huff: "dict[tuple[int, int], dict]" = {}
        ri = 0
        w = h = 0
        comps: "list[tuple[int, int, int]]" = []  # (id, sampling, qid)
        progressive = False
        prog_state = None
        n_scans = 0
        while i + 4 <= n:
            if payload[i] != 0xFF:
                return None
            # T.81 B.1.1.2: a marker may be preceded by any number of
            # 0xFF fill bytes — skip padding so the first non-FF byte
            # is read as the marker code (an FF FF pair here is NOT a
            # marker whose code is FF; treating it as one reads a
            # garbage length and nulls valid third-party files)
            while i + 4 <= n and payload[i + 1] == 0xFF:
                i += 1
            if i + 4 > n:
                break
            marker = payload[i + 1]
            if marker == 0xD9:
                if prog_state is not None and n_scans:
                    return _jpeg_prog_finish(
                        prog_state, comps, qtabs, w, h
                    )
                return None  # EOI before any decodable scan
            (length,) = struct.unpack(">H", payload[i + 2:i + 4])
            body = payload[i + 4:i + 2 + length]
            if len(body) < length - 2:
                return None
            if marker == 0xDB:
                j = 0
                while j < len(body):
                    pq, tq = body[j] >> 4, body[j] & 15
                    if pq != 0:
                        return None  # 16-bit tables unsupported
                    zz = list(body[j + 1:j + 65])
                    if len(zz) < 64:
                        return None
                    tab = [0] * 64
                    for k in range(64):
                        tab[_JPEG_ZIGZAG[k]] = zz[k]
                    qtabs[tq] = tab
                    j += 65
            elif marker in (0xC0, 0xC2):
                progressive = marker == 0xC2
                prec, h, w, nc = struct.unpack(">BHHB", body[:6])
                if prec != 8 or w <= 0 or h <= 0:
                    return None
                if w * h > _JPEG_MAX_PIXELS:
                    return None  # tighter CPU-bomb cap than PNG's
                comps = [
                    (body[6 + 3 * c], body[7 + 3 * c], body[8 + 3 * c])
                    for c in range(nc)
                ]
                # sampling factors 1 or 2 per axis: 4:4:4, 4:2:2,
                # 4:4:0 and 4:2:0 all decode (r11 verdict ask #4 —
                # real-world JPEGs are overwhelmingly 4:2:0); larger
                # factors stay out of the supported subset
                if any(
                    (s >> 4) not in (1, 2) or (s & 15) not in (1, 2)
                    for _, s, _q in comps
                ):
                    return None
            elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None  # unsupported SOF class
            elif marker == 0xC4:
                j = 0
                while j + 17 <= len(body):
                    tc, th = body[j] >> 4, body[j] & 15
                    bits = list(body[j + 1:j + 17])
                    nsym = sum(bits)
                    vals = list(body[j + 17:j + 17 + nsym])
                    if len(vals) < nsym:
                        return None
                    huff[(tc, th)] = _huff_codes(bits, vals)
                    j += 17 + nsym
            elif marker == 0xDD:
                if len(body) < 2:
                    return None
                ri = struct.unpack(">H", body[:2])[0]  # DRI (r12)
            elif marker == 0xDA:
                ns = body[0]
                if not comps or (not progressive and ns != len(comps)):
                    return None
                # the scan's interleave follows SOS order, and each
                # SOS entry names its SOF component by ID — map
                # instead of assuming the orders coincide (a
                # spec-valid reordered SOS would otherwise decode
                # with swapped planes/quant tables, silently wrong
                # rather than None — r11 review finding)
                sof_ids = [c[0] for c in comps]
                scan_order = []
                sel = []
                for c in range(ns):
                    cid = body[1 + 2 * c]
                    tb = body[2 + 2 * c]
                    if cid not in sof_ids:
                        return None
                    scan_order.append(sof_ids.index(cid))
                    sel.append((tb >> 4, tb & 15))
                if len(set(scan_order)) != ns:
                    return None  # duplicate component in scan
                if not progressive:
                    scan = payload[i + 2 + length:]
                    return _jpeg_decode_scan(
                        w, h, comps, sel, qtabs, huff, scan,
                        scan_order=scan_order, restart_interval=ri,
                    )
                # progressive (SOF2, r12): accumulate this scan into
                # the coefficient store and keep walking markers —
                # reconstruction happens at EOI
                n_scans += 1
                if n_scans > 64:
                    return None  # scan-count bomb guard
                ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
                ahal = body[3 + 2 * ns]
                ah, al = ahal >> 4, ahal & 15
                if prog_state is None:
                    import array as _array

                    (samp, hmax, vmax, mcux, mcuy, full,
                     compgrid) = _jpeg_geometry(w, h, comps)
                    # flat int32 arrays, one per component (r12
                    # advice): 256 B/block instead of ~2.4 KB for a
                    # per-block Python list — a forged max-dims
                    # header costs ~50 MB transient, not ~500 MB
                    prog_state = {
                        "samp": samp, "mcux": mcux, "mcuy": mcuy,
                        "full": full, "compgrid": compgrid,
                        "coefs": [
                            _array.array("i", bytes(4 * 64 * bw * bh))
                            for bw, bh in full
                        ],
                        "entropy": 0,
                        "min_coded": sum(
                            bw * bh for bw, bh in compgrid
                        ),
                    }
                scan_start = i + 2 + length
                scan_end = _find_scan_end(payload, scan_start)
                prog_state["entropy"] += scan_end - scan_start
                ok = _jpeg_prog_scan(
                    prog_state, payload[scan_start:scan_end],
                    scan_order, sel, ss, se, ah, al, ri, huff,
                )
                if not ok:
                    return None
                i = scan_end
                continue
            i += 2 + length
        if prog_state is not None and n_scans:
            # tolerate a truncated tail after the last scan (EOI
            # missing): every accumulated scan decoded cleanly
            return _jpeg_prog_finish(prog_state, comps, qtabs, w, h)
        return None
    except Exception:
        return None


def _jpeg_geometry(w, h, comps):
    """Shared sampling geometry: per-component factors, MCU grid, and
    both block grids — the FULL interleaved grid (mcux·hi × mcuy·vi,
    incl. right/bottom dummy blocks) and the component-resolution grid
    (ceil(comp_w/8) × ceil(comp_h/8)) that NON-interleaved progressive
    scans cover (ITU T.81 A.2.2)."""
    samp = [((c[1] >> 4) & 15, c[1] & 15) for c in comps]
    if len(comps) == 1:
        samp = [(1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    full = [(mcux * hi, mcuy * vi) for hi, vi in samp]
    compgrid = []
    for hi, vi in samp:
        cw = (w * hi + hmax - 1) // hmax
        ch = (h * vi + vmax - 1) // vmax
        compgrid.append(((cw + 7) // 8, (ch + 7) // 8))
    return samp, hmax, vmax, mcux, mcuy, full, compgrid


def _find_scan_end(payload: bytes, start: int) -> int:
    """First marker position after ``start`` that is not byte
    stuffing (FF 00), a restart marker (FF D0-D7), or a 0xFF fill
    byte (T.81 B.1.1.2 — fills may pad restart markers INSIDE the
    entropy stream too, so ``FF FF D0`` must scan through as
    fill+RST0, not terminate the scan at the fill) — the end of a
    progressive scan's entropy segment."""
    j, n = start, len(payload)
    while j + 1 < n:
        if payload[j] == 0xFF:
            nxt = payload[j + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                j += 2
                continue
            if nxt == 0xFF:
                j += 1  # fill byte: the marker code is further right
                continue
            return j
        j += 1
    return n


def _jpeg_prog_scan(
    state, scan, scan_idx, sel, ss, se, ah, al, ri, huff
) -> bool:
    """Decode ONE progressive scan into the coefficient store —
    ITU T.81 G.2 / the libjpeg decode_mcu_* family: DC first
    (huffman diffs, point-transformed <<Al) and DC refinement (one
    raw bit per block); AC first (band run-length with EOBRUN block
    skips) and AC refinement (correction bits for every
    already-significant coefficient crossed, newly-significant ±1<<Al
    insertions, EOBRUN blocks still consuming correction bits).
    Returns False on any malformed stream (callers null the row)."""
    # zero-copy 64-coef windows over the flat per-component arrays
    coefs = [memoryview(a) for a in state["coefs"]]
    samp, mcux, mcuy = state["samp"], state["mcux"], state["mcuy"]
    full, compgrid = state["full"], state["compgrid"]

    dec = {
        key: {(ln, code): sym for sym, (code, ln) in tab.items()}
        for key, tab in huff.items()
    }

    def read_sym(r, table):
        code, ln = 0, 0
        while ln < 17:
            code = (code << 1) | r.bit()
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise EOFError

    r = _BitReader(scan)
    prev_dc = {ci: 0 for ci in scan_idx}
    eobrun = 0
    unit_i = 0

    def maybe_restart():
        nonlocal eobrun, unit_i
        if ri and unit_i and unit_i % ri == 0:
            seq = r.restart()
            if seq != (unit_i // ri - 1) % 8:
                raise EOFError
            for ci in prev_dc:
                prev_dc[ci] = 0
            eobrun = 0

    if ss == 0:
        # DC scan (se must be 0): interleaved over the MCU grid when
        # multi-component, component block raster when single
        if se != 0:
            return False
        units = []
        if len(scan_idx) > 1:
            for my in range(mcuy):
                for mx in range(mcux):
                    blocks = []
                    for ci in scan_idx:
                        hi, vi = samp[ci]
                        for byy in range(vi):
                            for bxx in range(hi):
                                blocks.append(
                                    (ci,
                                     (my * vi + byy) * full[ci][0]
                                     + mx * hi + bxx)
                                )
                    units.append(blocks)
        else:
            ci = scan_idx[0]
            cbw, cbh = compgrid[ci]
            for by in range(cbh):
                for bx in range(cbw):
                    units.append([(ci, by * full[ci][0] + bx)])
        si_of = {ci: i for i, ci in enumerate(scan_idx)}
        try:
            for blocks in units:
                maybe_restart()
                unit_i += 1
                for ci, idx in blocks:
                    block = coefs[ci][idx * 64:idx * 64 + 64]
                    if ah == 0:
                        dc_t = dec.get((0, sel[si_of[ci]][0]))
                        if dc_t is None:
                            return False
                        t = read_sym(r, dc_t)
                        prev_dc[ci] += _jpeg_extend(r.bits(t), t)
                        block[0] = prev_dc[ci] << al
                    else:
                        block[0] |= r.bit() << al
        except EOFError:
            return False
        return True

    # AC scan: single component, component-resolution block raster
    if len(scan_idx) != 1 or not (1 <= ss <= se <= 63):
        return False
    ci = scan_idx[0]
    ac_t = dec.get((1, sel[0][1]))
    if ac_t is None:
        return False
    cbw, cbh = compgrid[ci]
    bwfull = full[ci][0]
    p1 = 1 << al
    try:
        for by in range(cbh):
            for bx in range(cbw):
                maybe_restart()
                unit_i += 1
                _bi = by * bwfull + bx
                block = coefs[ci][_bi * 64:_bi * 64 + 64]
                if ah == 0:
                    # first scan for this band
                    if eobrun:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        sym = read_sym(r, ac_t)
                        rr, s = sym >> 4, sym & 15
                        if s == 0:
                            if rr == 15:
                                k += 16
                                continue
                            eobrun = (1 << rr) - 1
                            if rr:
                                eobrun += r.bits(rr)
                            break
                        k += rr
                        if k > se:
                            return False
                        block[_JPEG_ZIGZAG[k]] = (
                            _jpeg_extend(r.bits(s), s) << al
                        )
                        k += 1
                    continue
                # refinement scan
                k = ss
                if eobrun == 0:
                    while k <= se:
                        sym = read_sym(r, ac_t)
                        rr, s = sym >> 4, sym & 15
                        if s == 0:
                            if rr != 15:
                                eobrun = 1 << rr
                                if rr:
                                    eobrun += r.bits(rr)
                                break
                            val = 0
                        else:
                            if s != 1:
                                return False
                            val = p1 if r.bit() else -p1
                        while k <= se:
                            z = _JPEG_ZIGZAG[k]
                            c = block[z]
                            if c != 0:
                                if r.bit() and (abs(c) & p1) == 0:
                                    block[z] = c + (p1 if c > 0 else -p1)
                            else:
                                if rr == 0:
                                    break
                                rr -= 1
                            k += 1
                        if val and k <= se:
                            block[_JPEG_ZIGZAG[k]] = val
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        z = _JPEG_ZIGZAG[k]
                        c = block[z]
                        if c != 0:
                            if r.bit() and (abs(c) & p1) == 0:
                                block[z] = c + (p1 if c > 0 else -p1)
                        k += 1
                    eobrun -= 1
    except EOFError:
        return False
    return True


def _jpeg_prog_finish(state, comps, qtabs, w, h):
    """Dequantize + IDCT every accumulated coefficient block and
    assemble exactly like the baseline path (same planes, same
    upsample, same color conversion)."""
    samp, mcux, mcuy = state["samp"], state["mcux"], state["mcuy"]
    full = state["full"]
    # progressive analogue of the baseline blocks-vs-scan-length
    # guard (r12 advice): the mandatory DC scans code >= 1 bit per
    # component-resolution block, so any spec-legal file carries at
    # least min_coded/8 entropy bytes across its scans. A crafted
    # ~100-byte SOF2 payload at the pixel cap whose single tiny
    # EOBRUN scan "covers" every block would otherwise buy ~200k
    # IDCTs for a handful of bytes.
    if state["min_coded"] > 8 * state["entropy"] + 64:
        return None
    ncomp = len(comps)
    strides = [full[ci][0] * 8 for ci in range(ncomp)]
    plane_hs = [full[ci][1] * 8 for ci in range(ncomp)]
    planes = [
        bytearray(strides[ci] * plane_hs[ci]) for ci in range(ncomp)
    ]
    for ci in range(ncomp):
        q = qtabs.get(comps[ci][2])
        if q is None:
            return None
        bwfull, bhfull = full[ci]
        stride = strides[ci]
        for by in range(bhfull):
            for bx in range(bwfull):
                _bi = (by * bwfull + bx) * 64
                spat = _dequant_idct(
                    state["coefs"][ci][_bi:_bi + 64], q
                )
                plane = planes[ci]
                for y in range(8):
                    row_off = (by * 8 + y) * stride + bx * 8
                    plane[row_off:row_off + 8] = bytes(
                        spat[y * 8:y * 8 + 8]
                    )
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    return _jpeg_assemble(
        w, h, ncomp, samp, hmax, vmax, planes, strides, plane_hs
    )


def _jpeg_assemble(w, h, ncomp, samp, hmax, vmax, planes, strides,
                   plane_hs):
    """Planes → (w, h, channels, bytes): crop each component to its
    natural resolution, nearest-neighbor upsample subsampled axes,
    convert YCbCr→RGB for 3 components — shared by the baseline and
    progressive paths."""
    import numpy as np

    def crop(ci: int) -> "np.ndarray":
        hi, vi = samp[ci]
        wi = (w * hi + hmax - 1) // hmax
        hgt = (h * vi + vmax - 1) // vmax
        a = (
            np.frombuffer(bytes(planes[ci]), dtype=np.uint8)
            .reshape(plane_hs[ci], strides[ci])[:hgt, :wi]
        )
        if hi != hmax or vi != vmax:
            a = np.repeat(
                np.repeat(a, vmax // vi, axis=0), hmax // hi, axis=1
            )
        return a[:h, :w]

    if ncomp == 1:
        return w, h, 1, crop(0).tobytes()
    Y = crop(0).astype("float64")
    cb = crop(1).astype("float64") - 128.0
    cr = crop(2).astype("float64") - 128.0
    r_ = np.clip(np.floor(Y + 1.402 * cr + 0.5), 0, 255)
    g_ = np.clip(
        np.floor(Y - 0.344136 * cb - 0.714136 * cr + 0.5), 0, 255
    )
    b_ = np.clip(np.floor(Y + 1.772 * cb + 0.5), 0, 255)
    out = np.stack([r_, g_, b_], axis=-1).astype(np.uint8)
    return w, h, 3, out.tobytes()


def _jpeg_decode_scan(w, h, comps, sel, qtabs, huff, scan, *,
                      scan_order=None, restart_interval=0):
    # invert {sym: (code,len)} into {(len,code): sym} per table
    dec = {
        key: {(ln, code): sym for sym, (code, ln) in tab.items()}
        for key, tab in huff.items()
    }

    def read_sym(r: _BitReader, table: dict) -> int:
        code, ln = 0, 0
        while ln < 17:
            code = (code << 1) | r.bit()
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise EOFError

    ncomp = len(comps)
    if scan_order is None:
        scan_order = list(range(ncomp))
    # MCU geometry (r11 verdict ask #4 — 4:2:0/4:2:2 support): each
    # component carries sampling factors (hi, vi) ∈ {1, 2}²; an MCU
    # covers 8·hmax × 8·vmax pixels and interleaves hi×vi blocks per
    # component in raster order. All-1×1 degenerates to the old
    # per-block raster. A SINGLE-component scan is non-interleaved by
    # spec (its MCU is one block), so its factors are geometric no-ops.
    samp = [((c[1] >> 4) & 15, c[1] & 15) for c in comps]
    if ncomp == 1:
        samp = [(1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    strides = [mcux * 8 * s[0] for s in samp]
    plane_hs = [mcuy * 8 * s[1] for s in samp]
    # Scan-length bound (r11 advice): every real block consumes ≥2
    # bits (a ≥1-bit DC symbol + a ≥1-bit EOB), so a valid scan of
    # ``len(scan)`` bytes can encode at most 4×that many blocks.
    # A crafted payload pairing maximal SOF dims with a tiny scan
    # would otherwise burn per-block IDCT work far beyond what its
    # bytes can legitimately describe (the EOFError lands only after
    # the work). +64 slack covers padding/EOI slop at the tail.
    n_blocks = sum(mcux * s[0] * mcuy * s[1] for s in samp)
    if n_blocks > 4 * len(scan) + 64:
        return None
    planes = [
        bytearray(strides[ci] * plane_hs[ci]) for ci in range(ncomp)
    ]
    r = _BitReader(scan)
    prev_dc = [0] * ncomp
    for my in range(mcuy):
        for mx in range(mcux):
            # restart intervals (r12): every `restart_interval` MCUs
            # the encoder byte-aligns and emits RST(n%8); the decoder
            # must consume it, verify the 0-7 sequence cycles, and
            # reset every component's DC predictor — the whole point
            # of DRI is bounded error propagation, which only works
            # if prediction never crosses a marker
            mcu_i = my * mcux + mx
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                seq = r.restart()
                if seq != (mcu_i // restart_interval - 1) % 8:
                    return None
                prev_dc = [0] * ncomp
            # interleave follows SOS order; each entry decodes into
            # its SOF component's plane with that component's tables
            for si in range(ncomp):
                ci = scan_order[si]
                hi, vi = samp[ci]
                dc_t = dec.get((0, sel[si][0]))
                ac_t = dec.get((1, sel[si][1]))
                q = qtabs.get(comps[ci][2])
                if dc_t is None or ac_t is None or q is None:
                    return None
                for byy in range(vi):
                    for bxx in range(hi):
                        coefs = [0] * 64
                        t = read_sym(r, dc_t)
                        prev_dc[ci] += _jpeg_extend(r.bits(t), t)
                        coefs[0] = prev_dc[ci]
                        k = 1
                        while k < 64:
                            sym = read_sym(r, ac_t)
                            if sym == 0x00:
                                break
                            if sym == 0xF0:
                                k += 16
                                continue
                            k += sym >> 4
                            size = sym & 15
                            if k > 63 or size == 0:
                                return None
                            coefs[_JPEG_ZIGZAG[k]] = _jpeg_extend(
                                r.bits(size), size
                            )
                            k += 1
                        spat = _dequant_idct(coefs, q)
                        plane = planes[ci]
                        stride = strides[ci]
                        py0 = (my * vi + byy) * 8
                        px0 = (mx * hi + bxx) * 8
                        for y in range(8):
                            row_off = (py0 + y) * stride + px0
                            plane[row_off:row_off + 8] = bytes(
                                spat[y * 8:y * 8 + 8]
                            )
    return _jpeg_assemble(
        w, h, ncomp, samp, hmax, vmax, planes, strides, plane_hs
    )


def attach_jpeg_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL baseline-JPEG bytes: a solid GRAYSCALE image
    whose dimensions and gray level derive arithmetically from the id
    — width = 8 + id % 9, height = 8 + id % 5, gray = 2·(id % 128).
    The even gray level + the uniform 16s quant table make the lossy
    pipeline exactly invertible for these payloads: the level-shifted
    value is even, so DC quantization (÷16 after the ×8 DCT gain) and
    reconstruction both land on integers with NO rounding midpoints —
    float DCT noise (~1e-13) can never cross a boundary, and a SQL
    oracle replays the decoded stats from the id alone while the
    bytes still round-trip the full huffman/DCT machinery.
    Arrow-batched mapInPandas, same bounded-memory contract as the
    other attaches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                w, h = 8 + i % 9, 8 + i % 5
                g = 2 * (i % 128)
                payloads.append(
                    encode_jpeg(
                        w, h, 1, bytes([g]) * (w * h),
                        # a deterministic fifth of the corpus ships
                        # PROGRESSIVE (SOF2) framing (r12): identical
                        # quantized coefficients re-framed as
                        # spectral-selection + successive-approximation
                        # scans, so the SAME id-arithmetic oracle
                        # value-exact-gates the multi-scan decoder
                        progressive=(i % 5 == 0),
                    )
                )
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "payload": payloads,
                    "media_type": "image/jpeg",
                }
            )

    return df.select(id_col).mapInPandas(
        run, f"{id_col} long, payload binary, media_type string"
    )


def attach_jpeg420_payload(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic COLOR 4:2:0 baseline-JPEG bytes (r11 verdict ask
    #4's gate half): a solid NEUTRAL-GRAY color image — r = g = b =
    2·(id%128) — at dims 9 + id%16 × 9 + id%9 (odd dims and multi-MCU
    grids both occur across ids, exercising the chroma ceil and the
    edge-clamped partial MCUs). Neutral gray makes the color 420
    pipeline midpoint-free end to end: RGB→YCbCr lands exactly on
    (2k, 128, 128) (the JFIF weights sum to 1 / cancel), the EVEN luma
    survives DC quantization exactly (the attach_jpeg_payload
    argument), constant chroma is invariant under the box-filter
    downsample and nearest-neighbor upsample, and YCbCr→RGB
    reconstructs r = g = b = 2k — so a SQL oracle replays the decoded
    stats from the id alone while the bytes exercise the REAL 4:2:0
    machinery: 4Y+Cb+Cr MCU interleave, per-component sampling
    geometry, chroma plane reassembly. Any mis-indexed plane, wrong
    upsample, or interleave slip shifts the reconstructed bytes and
    breaks the hash. (Non-neutral chroma is covered with a tolerance
    round-trip in pytest — quantization error there is real, as in
    any JPEG.)"""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                w, h = 9 + i % 16, 9 + i % 9
                g = 2 * (i % 128)
                payloads.append(
                    encode_jpeg(
                        w, h, 3, bytes([g]) * (w * h * 3),
                        # alternate the two real-world subsampled
                        # layouts (r12): 4:2:0 (2x2 chroma cells) and
                        # 4:2:2 (horizontal halving, the broadcast
                        # convention) — both midpoint-free on neutral
                        # gray, both value-exact through this gate
                        subsampling="420" if i % 2 == 0 else "422",
                        # a deterministic third of the corpus also
                        # carries DRI restart intervals (r12): the
                        # RSTn consume/sequence-check/DC-reset path
                        # rides the same value-exact gate — restarts
                        # change the entropy framing, never the
                        # reconstructed bytes
                        restart_interval=(i % 3) if i % 3 < 2 else 0,
                        # and the ids with NO restart framing ship
                        # PROGRESSIVE (SOF2) instead, composing
                        # multi-scan decode with color subsampling
                        # in the same value-exact gate
                        progressive=i % 3 == 2,
                    )
                )
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "payload": payloads,
                    "media_type": "image/jpeg",
                }
            )

    return df.select(id_col).mapInPandas(
        run, f"{id_col} long, payload binary, media_type string"
    )


def decode_jpeg_stats(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Integer-exact decode stats for JPEG payloads through the full
    entropy-decode + IDCT pipeline (:func:`_parse_jpeg`); same schema
    and null-on-malformed contract as the other decoders."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "id", "width", "height", "channels", "sum_bytes",
                "n_pixels",
            )}
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                payload = p if p is not None else b""
                out["id"].append(int(i))
                got = _parse_jpeg(payload)
                if got is None:
                    for k in ("width", "height", "channels",
                              "sum_bytes", "n_pixels"):
                        out[k].append(None)
                    continue
                w, h, ch, data = got
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(ch)
                out["sum_bytes"].append(sum(data))
                out["n_pixels"].append(w * h)
            yield pd.DataFrame(out, dtype="object")

    return df.select(id_col, payload_col).mapInPandas(
        run, PPM_STATS_SCHEMA
    )


def decode_image_stats_auto(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Integer-exact decode stats over a MIXED media column: magic-byte
    sniffing routes each payload to its dependency-free codec (PPM,
    PNG, or baseline JPEG) in one pass — the production shape for a
    heterogeneous 100 TB media corpus, where per-format table splits
    would multiply scans. Emits the detected ``format`` plus the same
    integer stats as the per-format decoders; unrecognized/malformed
    payloads yield a null format and null stats."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "id", "format", "width", "height", "channels",
                "sum_bytes", "n_pixels",
            )}
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                payload = p if p is not None else b""
                out["id"].append(int(i))
                fmt = parsed = None
                if payload.startswith(b"P6"):
                    got = _parse_ppm(payload)
                    if got is not None:
                        w, h, _maxval, data = got
                        fmt, parsed = "ppm", (w, h, 3, data)
                elif payload.startswith(_PNG_SIG):
                    got = _parse_png(payload)
                    if got is not None:
                        fmt, parsed = "png", got
                elif payload.startswith(b"\xff\xd8"):
                    got = _parse_jpeg(payload)
                    if got is not None:
                        fmt, parsed = "jpeg", got
                if parsed is None:
                    out["format"].append(None)
                    for k in (
                        "width", "height", "channels", "sum_bytes",
                        "n_pixels",
                    ):
                        out[k].append(None)
                    continue
                w, h, ch, data = parsed
                out["format"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(ch)
                out["sum_bytes"].append(sum(data))
                out["n_pixels"].append(w * h)
            yield pd.DataFrame(out, dtype="object")

    return df.select(id_col, payload_col).mapInPandas(
        run, MEDIA_STATS_SCHEMA
    )


def attach_fake_payload(df: DataFrame, src_col: str, *, media_type: str = "image/png") -> DataFrame:
    """Testing helper: derive an opaque binary payload (+ media_type)
    from an existing column — stands in for real image/audio bytes."""
    return df.withColumn("payload", F.col(src_col).cast("binary")).withColumn(
        "media_type", F.lit(media_type)
    )


def payload_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """JVM-side payload metadata: byte length + sha256 content hash.

    No Python boundary — this is the cheap pass you run over 100 TB of
    media BEFORE deciding what to decode (dedup by content hash, drop
    zero-byte blobs, size histograms)."""
    return df.withColumn(
        "n_bytes", F.length(F.col(payload_col)).cast("long")
    ).withColumn("sha256", F.sha2(F.col(payload_col), 256))


def _fake_image_features(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic pseudo-decode: dimensions/intensity from content
    hash — stable across processes, no RNG."""
    h = hashlib.sha256(payload or b"").digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    channels = 1 if h[2] % 4 == 0 else 3
    mean_intensity = round(h[3] / 255.0, 6)
    return width, height, channels, mean_intensity


IMAGE_FEATURES_SCHEMA = (
    "id long, width int, height int, channels int, mean_intensity double"
)


def decode_images(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder: str = FAKE,
) -> DataFrame:
    """Decode image payloads to (width, height, channels, mean_intensity).

    Arrow-batched ``mapInPandas``: the udf receives an ITERATOR of
    pandas batches and yields result batches — payloads never exist as
    one driver-side list, and column pruning drops everything except
    (id, payload) before the Python boundary.

    ``decoder="real"`` decodes via PIL when installed (lazy optional
    import — raises NotImplementedError at this seam when absent);
    ``decoder="ppm"`` does a dependency-free REAL decode of binary
    PPM (P6) bytes (:func:`_parse_ppm` — mean_intensity is the true
    pixel-byte mean over maxval; malformed payloads yield nulls);
    ``decoder="auto"`` sniffs each payload's magic bytes and routes to
    the matching dependency-free codec (PPM or PNG — the mixed-corpus
    production shape: one pass over a heterogeneous media column,
    unrecognized formats null their row); the plumbing is
    byte-identical across all of them.
    """
    if decoder == REAL:
        _require_pil()  # fail fast on the driver if the codec is absent
    elif decoder not in (FAKE, PPM, AUTO):
        raise ValueError(
            f"decoder must be '{FAKE}', '{REAL}', '{PPM}' or '{AUTO}', "
            f"got {decoder!r}"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decoder == REAL:
            import io as _io

            Image = _require_pil()

            def feat(payload: bytes):
                with Image.open(_io.BytesIO(payload)) as img:
                    gray = img.convert("L")
                    import numpy as np

                    mean = round(float(np.asarray(gray).mean()) / 255.0, 6)
                    return img.width, img.height, len(img.getbands()), mean
        elif decoder == PPM:

            def feat(payload: bytes):
                parsed = _parse_ppm(payload)
                if parsed is None:
                    return None, None, None, None
                w, h, maxval, data = parsed
                return w, h, 3, round(sum(data) / (len(data) * maxval), 6)
        elif decoder == AUTO:

            def feat(payload: bytes):
                if payload.startswith(b"P6"):
                    parsed = _parse_ppm(payload)
                    if parsed is None:
                        return None, None, None, None
                    w, h, maxval, data = parsed
                    return (
                        w, h, 3, round(sum(data) / (len(data) * maxval), 6)
                    )
                if payload.startswith(_PNG_SIG):
                    parsed = _parse_png(payload)
                    if parsed is None:
                        return None, None, None, None
                    w, h, ch, data = parsed
                    return w, h, ch, round(sum(data) / (len(data) * 255), 6)
                return None, None, None, None
        else:
            feat = _fake_image_features

        for pdf in batches:
            feats = [
                feat(p if p is not None else b"") for p in pdf[payload_col]
            ]
            cols = {
                "id": pdf[id_col].astype("int64"),
                "width": [f[0] for f in feats],
                "height": [f[1] for f in feats],
                "channels": [f[2] for f in feats],
                "mean_intensity": [f[3] for f in feats],
            }
            # PPM/AUTO may emit None for malformed payloads — object
            # dtype keeps the nulls null through the Arrow conversion
            yield pd.DataFrame(
                cols, dtype="object" if decoder in (PPM, AUTO) else None
            )

    return df.select(id_col, payload_col).mapInPandas(run, IMAGE_FEATURES_SCHEMA)


FRAME_SCHEMA = "id long, frame_idx int, frame_sha int"


# ---------------------------------------------------------------------------
# AVI (RIFF) video container: real frame demux through the seam —
# uncompressed DIB frames; codec-compressed video stays behind ffmpeg
# ---------------------------------------------------------------------------

def encode_avi(
    w: int, h: int, fps: int, frames: "list[bytes]"
) -> bytes:
    """Minimal spec-correct AVI writer (stdlib only): RIFF 'AVI ' with
    hdrl (avih + one vids strl with a BITMAPINFOHEADER strf), a movi
    LIST of uncompressed '00db' DIB frames (bottom-up BGR rows padded
    to 4 bytes — the DIB convention), and an idx1 index. Each frame in
    ``frames`` is top-down RGB24 (w*h*3 bytes); the writer performs
    the RGB→BGR + row-flip + padding that DIB storage requires, which
    the parser must exactly undo — the synthesis half of the video
    seam's oracle loop."""
    import struct

    import numpy as np

    stride = (w * 3 + 3) & ~3
    dibs = []
    for f in frames:
        if len(f) != w * h * 3:
            raise ValueError("encode_avi: bad frame shape")
        # vectorized RGB→BGR + top-down→bottom-up + row padding
        arr = np.frombuffer(f, dtype=np.uint8).reshape(h, w, 3)
        bgr = arr[::-1, :, ::-1].reshape(h, w * 3)
        padded = np.zeros((h, stride), dtype=np.uint8)
        padded[:, : w * 3] = bgr
        dibs.append(padded.tobytes())

    def chunk(cc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) & 1 else b""
        return cc + struct.pack("<I", len(data)) + data + pad

    def lst(cc: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", cc + data)

    frame_bytes = stride * h
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // max(fps, 1), frame_bytes * fps, 0, 0x10,
        len(frames), 0, 1, frame_bytes, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack(
            "<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames),
            frame_bytes, 0, 0, 0,
        ) + struct.pack("<hhhh", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(chunk(b"00db", d) for d in dibs)
    movi = lst(b"movi", movi_body)
    idx = bytearray()
    off = 4
    for d in dibs:
        idx += b"00db" + struct.pack("<III", 0x10, off, len(d))
        off += 8 + len(d) + (len(d) & 1)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _parse_avi(payload: bytes):
    """Parse a RIFF/AVI container holding UNCOMPRESSED 24-bit DIB
    video (biCompression=0) with NO dependencies: RIFF walk → hdrl
    (strf BITMAPINFOHEADER for dims) → movi '00db'/'00dc' chunks,
    undoing the DIB bottom-up BGR padded-row storage back to top-down
    RGB24. Returns ``(w, h, [frame_rgb_bytes, ...])`` or None for
    anything malformed, truncated, compressed, or non-video — the
    video counterpart of :func:`_parse_wav` (codec-compressed formats
    stay behind the ffmpeg lazy-import seam). Frame count and total
    pixels are capped like the image codecs (hostile headers null the
    row, never OOM the executor)."""
    import struct

    try:
        if (
            not payload or len(payload) < 12
            or payload[:4] != b"RIFF" or payload[8:12] != b"AVI "
        ):
            return None
        w = h = bits = None
        comp = None
        frames: "list[bytes]" = []

        def walk(buf: bytes, in_movi: bool) -> bool:
            nonlocal w, h, bits, comp
            i, n = 0, len(buf)
            while i + 8 <= n:
                cc = buf[i:i + 4]
                (length,) = struct.unpack("<I", buf[i + 4:i + 8])
                body = buf[i + 8:i + 8 + length]
                if len(body) < length:
                    return False
                if cc == b"LIST":
                    kind = body[:4]
                    if not walk(body[4:], in_movi or kind == b"movi"):
                        return False
                elif cc == b"strf" and len(body) >= 40:
                    _sz, bw, bh, _pl, bb, bc = struct.unpack(
                        "<IiiHHI", body[:20]
                    )
                    w, h, bits, comp = bw, abs(bh), bb, bc
                elif in_movi and cc[2:4] in (b"db", b"dc"):
                    if len(frames) >= 4096:
                        return False  # frame-count bomb cap
                    frames.append(body)
                i += 8 + length + (length & 1)
            return True

        if not walk(payload[12:], False):
            return None
        if (
            w is None or w <= 0 or h is None or h <= 0
            or bits != 24 or comp != 0 or not frames
            or w * h > _PNG_MAX_PIXELS
            or w * h * len(frames) > _PNG_MAX_PIXELS
        ):
            return None
        import numpy as np

        stride = (w * 3 + 3) & ~3
        out = []
        for d in frames:
            if len(d) < stride * h:
                return None
            # pure byte moves (exact): strip row padding, flip the
            # bottom-up row order, swap BGR→RGB — vectorized; the
            # per-pixel Python loop was the frame-demux hot spot
            arr = np.frombuffer(
                d, dtype=np.uint8, count=stride * h
            ).reshape(h, stride)[:, : w * 3]
            rgb = arr[::-1].reshape(h, w, 3)[:, :, ::-1]
            out.append(rgb.tobytes())
        return w, h, out
    except Exception:
        return None


def attach_avi_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL video bytes: an uncompressed-DIB AVI whose
    frame count, dimensions, and per-frame solid color derive
    arithmetically from the id — n_frames = 4 + id % 6,
    w = 4 + id % 4, h = 2 + id % 3, frame fi colored
    RGB = ((id + 17·fi) % 256, (2·id + fi) % 256, (3·id + 5·fi) % 256)
    — so every demuxed frame stat is integer-exact and a SQL oracle
    recomputes it from (id, frame_idx) alone. Arrow-batched
    mapInPandas, same bounded-memory contract as the other attaches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = []
            for i in ids:
                i = int(i)
                n, w, h = 4 + i % 6, 4 + i % 4, 2 + i % 3
                frames = [
                    bytes(
                        [
                            (i + 17 * fi) % 256,
                            (2 * i + fi) % 256,
                            (3 * i + 5 * fi) % 256,
                        ]
                    )
                    * (w * h)
                    for fi in range(n)
                ]
                payloads.append(encode_avi(w, h, 10, frames))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "payload": payloads,
                    "media_type": "video/x-msvideo",
                }
            )

    return df.select(id_col).mapInPandas(
        run, f"{id_col} long, payload binary, media_type string"
    )


AVI_FRAME_SCHEMA = (
    "id long, frame_idx int, width int, height int, sum_bytes long"
)


def sample_avi_frames(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_n: int = 2,
) -> DataFrame:
    """REAL video frame sampling through the UDTF-shaped mapInPandas
    contract: each AVI payload demuxes through :func:`_parse_avi` and
    every ``every_n``-th frame yields one output row with stats over
    its ACTUAL decoded RGB bytes — the frame-extraction stage of a
    video-training pipeline (decode once at ingest, persist sampled
    frames). One-to-many, no shuffle, malformed payloads yield zero
    rows for their id rather than crashing the batch; at 100 TB the
    per-row work is bounded by the frame-count/pixel caps in the
    parser."""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "id", "frame_idx", "width", "height", "sum_bytes",
            )}
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                payload = p if p is not None else b""
                got = _parse_avi(payload)
                if got is None:
                    continue
                w, h, frames = got
                for fi in range(0, len(frames), every_n):
                    out["id"].append(int(i))
                    out["frame_idx"].append(fi)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["sum_bytes"].append(sum(frames[fi]))
            yield pd.DataFrame(out, dtype="object")

    return df.select(id_col, payload_col).mapInPandas(
        run, AVI_FRAME_SCHEMA
    )


def sample_frames(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_n: int = 10,
    decoder: str = FAKE,
) -> DataFrame:
    """One-to-many frame sampling (video → every_n-th frame).

    Demonstrates the UDTF-shaped mapInPandas contract: each input row
    yields a variable number of output rows. Fake decoder: frame count
    = payload_len // 32; per-frame token derived from (content hash,
    frame index)."""
    if decoder == REAL:
        raise NotImplementedError(_STUB_MSG)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, shas = [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                payload = p if p is not None else b""
                n_frames = max(len(payload) // 32, 1)
                digest = hashlib.sha256(payload).digest()
                for fi in range(0, n_frames, every_n):
                    ids.append(int(i))
                    idxs.append(fi)
                    shas.append(digest[fi % 32])
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame_sha": shas})

    return df.select(id_col, payload_col).mapInPandas(run, FRAME_SCHEMA)


def payload_embedding(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    dim: int = 16,
    decoder: str = FAKE,
) -> DataFrame:
    """Feature extractor: payload → deterministic array<double>, so the
    media pipeline plugs straight into the similarity-search operators.

    ``decoder="ppm"`` is the REAL production path (r9 verdict ask #6):
    the payload is decoded with :func:`_parse_ppm` and the features
    derive from the ACTUAL pixel bytes — per-channel means over the
    decoded data plus the parsed dimensions,
    ``[mean_r, mean_g, mean_b, w, h]`` (``dim`` is ignored; the vector
    is 5-dim). Exact integer-valued doubles for solid-color images, so
    a SQL oracle recomputes them analytically; w,h ≥ 1 keeps the norm
    nonzero. Undecodable payloads yield a NULL embedding (never a
    crashed batch). ``decoder="fake"`` stays the no-deps fallback
    (sha-derived unit vector); ``decoder="real"`` remains the
    documented model seam (needs a real encoder, never present
    here).

    ``decoder="auto"`` is the MIXED-CORPUS production path (r10
    verdict ask #7): magic-byte sniffing routes every payload to its
    dependency-free codec and all three real modalities land in ONE
    5-dim feature space —

    - PPM / PNG / baseline-JPEG images: ``[mean_c0, mean_c1, mean_c2,
      w, h]`` (per-channel means over the actual decoded pixel bytes;
      grayscale repeats its single channel, RGBA uses the color
      channels);
    - PCM WAV audio: ``[mean_abs, max_abs, sample_rate/1000,
      n_frames, channels]`` (amplitude stats over the actual decoded
      samples).

    Features stay exact rationals of decoded integers, so a SQL
    oracle replays them analytically for arithmetic payloads; one
    scan embeds a heterogeneous 100 TB media column with no
    per-format table splits. Unrecognized formats null their row."""
    if decoder == REAL:
        raise NotImplementedError(_STUB_MSG)
    if decoder not in (FAKE, PPM, AUTO):
        raise ValueError(
            f"decoder must be '{FAKE}', '{REAL}', '{PPM}' or '{AUTO}', "
            f"got {decoder!r}"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def _image_feats(w, h, ch, data):
            px = np.frombuffer(data, dtype=np.uint8).astype("float64")
            if ch >= 3:
                means = [float(px[c::ch].mean()) for c in range(3)]
            else:
                m0 = float(px[0::ch].mean())
                means = [m0, m0, m0]
            return means + [float(w), float(h)]

        for pdf in batches:
            vecs = []
            for p in pdf[payload_col]:
                payload = p if p is not None else b""
                if decoder == PPM:
                    parsed = _parse_ppm(payload)
                    if parsed is None:
                        vecs.append(None)
                        continue
                    w, h, _maxval, data = parsed
                    vecs.append(_image_feats(w, h, 3, data))
                    continue
                if decoder == AUTO:
                    if payload.startswith(b"P6"):
                        got = _parse_ppm(payload)
                        if got is None:
                            vecs.append(None)
                            continue
                        w, h, _maxval, data = got
                        vecs.append(_image_feats(w, h, 3, data))
                    elif payload.startswith(_PNG_SIG):
                        got = _parse_png(payload)
                        if got is None:
                            vecs.append(None)
                            continue
                        w, h, ch, data = got
                        vecs.append(_image_feats(w, h, ch, data))
                    elif payload.startswith(b"\xff\xd8"):
                        got = _parse_jpeg(payload)
                        if got is None:
                            vecs.append(None)
                            continue
                        w, h, ch, data = got
                        vecs.append(_image_feats(w, h, ch, data))
                    elif (
                        payload.startswith(b"RIFF")
                        and payload[8:12] == b"AVI "
                    ):
                        got = _parse_avi(payload)
                        if got is None:
                            vecs.append(None)
                            continue
                        vw, vh, vframes = got
                        # video embeds as its FIRST frame's image
                        # features — the keyframe-thumbnail convention
                        vecs.append(_image_feats(vw, vh, 3, vframes[0]))
                    elif payload.startswith(b"RIFF"):
                        got = _parse_wav(payload)
                        if got is None:
                            vecs.append(None)
                            continue
                        ch, rate, _bits, frames, samples = got
                        absv = [abs(s) for s in samples]
                        n = max(len(absv), 1)
                        vecs.append(
                            [
                                float(sum(absv)) / n,
                                float(max(absv, default=0)),
                                rate / 1000.0,
                                float(frames),
                                float(ch),
                            ]
                        )
                    else:
                        vecs.append(None)
                    continue
                raw = hashlib.sha256(payload).digest()
                need = (dim * 4 + 31) // 32
                buf = b"".join(
                    hashlib.sha256(raw + bytes([i])).digest() for i in range(need)
                )
                v = np.frombuffer(buf[: dim * 4], dtype="<u4").astype("float64")
                v = v / max(float(np.linalg.norm(v)), 1.0)
                vecs.append(v.tolist())
            yield pd.DataFrame(
                {"id": pdf[id_col].astype("int64"), "embedding": vecs}
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, "id long, embedding array<double>"
    )


RESIZE_SCHEMA = (
    "id long, out_width int, out_height int, out_bytes int, resized_sha string"
)

RESIZE_PPM_SCHEMA = (
    "id long, resized_payload binary, out_width int, out_height int, "
    "out_bytes long"
)


def resize_ppm(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    target: tuple[int, int] = (6, 6),
) -> DataFrame:
    """REAL dependency-free image resize: decode binary PPM (P6) bytes
    with :func:`_parse_ppm`, nearest-neighbor resample the actual
    pixel array to ``target`` (w, h), and re-encode a valid PPM
    payload — the full decode → transform → encode loop with no
    optional packages, so the resized bytes can be chained straight
    into :func:`decode_ppm_stats` (or any PPM consumer) and checked
    value-exactly. Sampling uses the standard floor mapping
    ``src = floor(dst · src_dim / dst_dim)`` (pinned against a hand
    gradient in pytest — a wrong index stride or axis swap changes the
    output bytes). Undecodable payloads yield a NULL resized_payload.
    Returns ``(id, resized_payload, out_width, out_height,
    out_bytes)``; same Arrow-batched bounded-memory contract as the
    decoders."""
    tw, th = int(target[0]), int(target[1])
    if tw <= 0 or th <= 0:
        raise ValueError(f"target must be positive, got {target!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, outs, nbytes = [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                ids.append(int(i))
                parsed = _parse_ppm(p if p is not None else b"")
                if parsed is None:
                    outs.append(None)
                    nbytes.append(None)
                    continue
                w, h, maxval, data = parsed
                px = np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)
                sx = (np.arange(tw) * w) // tw
                sy = (np.arange(th) * h) // th
                resized = px[sy][:, sx]  # (th, tw, 3) NN resample
                # carry the SOURCE maxval into the output header: a
                # hardcoded 255 would silently rescale intensity
                # semantics for maxval<255 inputs (bytes unchanged but
                # their denominator grows) — review finding r10
                payload = (
                    b"P6\n%d %d\n%d\n" % (tw, th, maxval)
                    + resized.tobytes()
                )
                outs.append(payload)
                nbytes.append(len(payload))
            yield pd.DataFrame(
                {
                    "id": ids,
                    "resized_payload": outs,
                    "out_width": tw,
                    "out_height": th,
                    "out_bytes": nbytes,
                },
                dtype="object",
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, RESIZE_PPM_SCHEMA
    )


def resize_images(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    target: tuple[int, int] = (224, 224),
    decoder: str = FAKE,
) -> DataFrame:
    """Batch image resize to ``target`` (w, h) — the standard
    model-input normalization pass.

    Same Arrow-batched ``mapInPandas`` seam as :func:`decode_images`;
    the fake decoder derives the "resized" payload deterministically
    (sha256 over payload + target) and reports the byte size a real
    RGB resize would produce (w·h·3), so downstream size accounting
    and schema handling are exercised for real. ``decoder="real"``
    resizes via PIL when installed (lazy optional import, PNG
    re-encode), keeping batch shape and memory bounds identical. For
    a REAL resize with no optional packages see :func:`resize_ppm`
    (binary PPM in/out, chains into :func:`decode_ppm_stats`).
    """
    if decoder == REAL:
        _require_pil()
    elif decoder != FAKE:
        raise ValueError(f"decoder must be '{FAKE}' or '{REAL}', got {decoder!r}")
    tw, th = int(target[0]), int(target[1])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decoder == REAL:
            import io as _io

            Image = _require_pil()

            def one(payload: bytes) -> tuple[int, str]:
                with Image.open(_io.BytesIO(payload)) as img:
                    out = _io.BytesIO()
                    img.resize((tw, th)).save(out, format="PNG")
                    raw = out.getvalue()
                    return len(raw), hashlib.sha256(raw).hexdigest()
        else:

            def one(payload: bytes) -> tuple[int, str]:
                return (
                    tw * th * 3,
                    hashlib.sha256(
                        payload + f"-resize-{tw}x{th}".encode()
                    ).hexdigest(),
                )

        for pdf in batches:
            ids, nbytes, shas = [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                nb, sha = one(p if p is not None else b"")
                ids.append(int(i))
                nbytes.append(nb)
                shas.append(sha)
            n = len(ids)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "out_width": [tw] * n,
                    "out_height": [th] * n,
                    "out_bytes": nbytes,
                    "resized_sha": shas,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, RESIZE_SCHEMA)
