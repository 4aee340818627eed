"""Multimodal plumbing: binary payloads through storage + mapInPandas."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pandabase_spark.operators.multimodal import (
    attach_fake_payload,
    decode_images,
    payload_embedding,
    payload_stats,
    sample_frames,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return attach_fake_payload(docs.limit(100), "text")


def test_payload_through_keyed_table(catalog, media):
    """binary columns round-trip through the keyed-table storage."""
    catalog.to_table(media.select("doc_id", "payload", "media_type"),
                     "media_t", keys=["doc_id"])
    back = catalog.read_table("media_t")
    assert dict(back.dtypes)["payload"] == "binary"
    row = back.where(F.col("doc_id") == media.select(F.min("doc_id")).first()[0]).first()
    assert isinstance(row["payload"], (bytes, bytearray)) and len(row["payload"]) > 0


def test_payload_stats_jvm_side(media):
    stats = payload_stats(media)
    r = stats.select("doc_id", "n_bytes", "sha256").first()
    assert r["n_bytes"] > 0 and len(r["sha256"]) == 64
    # no Python boundary in the plan
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_decode_images_fake(media):
    feats = decode_images(media, decoder="fake")
    rows = feats.collect()
    assert len(rows) == 100
    for r in rows[:5]:
        assert 64 <= r["width"] < 256 and 64 <= r["height"] < 256
        assert r["channels"] in (1, 3)
        assert 0.0 <= r["mean_intensity"] <= 1.0
    # determinism across runs
    again = {r["id"]: (r["width"], r["height"]) for r in feats.collect()}
    assert again == {r["id"]: (r["width"], r["height"]) for r in rows}


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(_pil_available(), reason="PIL installed: real path active")
def test_decode_real_is_explicit_stub(media):
    with pytest.raises(NotImplementedError, match="codec"):
        decode_images(media, decoder="real")


def test_decode_real_with_pil(spark):
    """Optional-dependency path: when PIL is installed, decoder='real'
    decodes true image bytes through the same mapInPandas seam."""
    Image = pytest.importorskip("PIL.Image")
    import io as _io

    def png(w, h, color):
        buf = _io.BytesIO()
        Image.new("RGB", (w, h), color).save(buf, format="PNG")
        return buf.getvalue()

    df = spark.createDataFrame(
        [(1, png(8, 4, (255, 255, 255))), (2, png(3, 5, (0, 0, 0)))],
        "doc_id long, payload binary",
    )
    rows = {r["id"]: r for r in decode_images(df, decoder="real").collect()}
    assert (rows[1]["width"], rows[1]["height"], rows[1]["channels"]) == (8, 4, 3)
    assert rows[1]["mean_intensity"] == 1.0
    assert (rows[2]["width"], rows[2]["height"]) == (3, 5)
    assert rows[2]["mean_intensity"] == 0.0

    from pandabase_spark.operators.multimodal import resize_images

    out = {r["id"]: r for r in resize_images(df, target=(4, 4), decoder="real").collect()}
    assert out[1]["out_width"] == 4 and out[1]["out_bytes"] > 0
    assert out[1]["resized_sha"] != out[2]["resized_sha"]


def test_ppm_parse_unit():
    """The dependency-free P6 parser on hand-crafted bytes: comments,
    multi-digit dims, and every malformation class → None."""
    from pandabase_spark.operators.multimodal import _parse_ppm

    body = bytes([10, 20, 30]) * 12  # 4x3 image
    good = b"P6\n# a comment\n4 3\n255\n" + body
    w, h, maxval, data = _parse_ppm(good)
    assert (w, h, maxval) == (4, 3, 255)
    assert data == body
    # compact whitespace, no comment
    assert _parse_ppm(b"P6 4 3 255 " + body)[:3] == (4, 3, 255)
    # malformations: wrong magic, truncated pixels, missing maxval,
    # zero dims, maxval out of byte range, empty
    assert _parse_ppm(b"P5 4 3 255 " + body) is None
    assert _parse_ppm(b"P6 4 3 255 " + body[:-1]) is None
    assert _parse_ppm(b"P6 4 3") is None
    assert _parse_ppm(b"P6 0 3 255 " + body) is None
    assert _parse_ppm(b"P6 4 3 999 " + body) is None
    assert _parse_ppm(b"") is None


def test_decode_ppm_real_bytes(spark):
    """decoder='ppm' decodes REAL image bytes (header + pixel walk) in
    this container with zero optional deps; malformed payloads yield
    null stats instead of crashing the batch."""
    from pandabase_spark.operators.multimodal import (
        attach_ppm_payload, decode_images, decode_ppm_stats,
    )

    docs = spark.range(50).select(F.col("id").alias("doc_id"))
    media = attach_ppm_payload(docs, "doc_id")
    rows = {r["id"]: r for r in decode_ppm_stats(media).collect()}
    assert len(rows) == 50
    for i in (0, 7, 13, 49):
        w, h = 8 + i % 8, 8 + i % 4
        s = (i % 256 + (2 * i) % 256 + (3 * i) % 256) * w * h
        r = rows[i]
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        assert (r["sum_bytes"], r["n_pixels"]) == (s, w * h)
    # float decode path agrees with the integer stats
    feats = {r["id"]: r for r in decode_images(
        media, decoder="ppm").collect()}
    for i in (0, 13):
        w, h = 8 + i % 8, 8 + i % 4
        expect = round(
            (i % 256 + (2 * i) % 256 + (3 * i) % 256) * w * h
            / (w * h * 3 * 255), 6,
        )
        assert feats[i]["mean_intensity"] == expect
    # malformed payload → null row, batch survives
    bad = spark.createDataFrame(
        [(999, b"P6 not an image")], "doc_id long, payload binary"
    )
    r = decode_ppm_stats(bad).collect()[0]
    assert r["id"] == 999 and r["width"] is None and r["sum_bytes"] is None


def test_sample_frames_one_to_many(media):
    frames = sample_frames(media, every_n=5)
    per_doc = frames.groupBy("id").count()
    assert per_doc.agg(F.min("count")).first()[0] >= 1
    assert frames.count() > 100  # strictly more rows than inputs


def test_payload_embedding_feeds_similarity(media):
    from pandabase_spark.operators.similarity import cosine_topk

    emb = payload_embedding(media, dim=16)
    first = emb.first()
    assert len(first["embedding"]) == 16
    topk = cosine_topk(
        emb, emb.limit(2), id_col="id", vec_col="embedding", k=3
    )
    got = topk.groupBy("query_id").count().collect()
    assert all(r["count"] == 3 for r in got)
    # self-similarity rank 1 with cosine ~1
    self_rows = topk.where(F.col("rank") == 1).collect()
    for r in self_rows:
        assert abs(r["cosine"] - 1.0) < 1e-9


def test_resize_images_fake(media):
    from pandabase_spark.operators.multimodal import resize_images

    out = resize_images(media, target=(224, 224)).collect()
    assert len(out) == media.count()
    r = out[0]
    assert (r["out_width"], r["out_height"]) == (224, 224)
    assert r["out_bytes"] == 224 * 224 * 3
    assert len(r["resized_sha"]) == 64
    # deterministic: same payload + target → same sha
    again = resize_images(media, target=(224, 224)).collect()
    assert {x["resized_sha"] for x in out} == {x["resized_sha"] for x in again}


@pytest.mark.skipif(_pil_available(), reason="PIL installed: real path active")
def test_resize_real_is_explicit_stub(media):
    from pandabase_spark.operators.multimodal import resize_images

    with pytest.raises(NotImplementedError):
        resize_images(media, decoder="real").collect()


def test_resize_ppm_gradient_pin(spark):
    """The real nearest-neighbor resample pinned against a hand-built
    NON-solid image: a 4x2 gradient resized to 2x2 must pick exactly
    the pixels the floor mapping src = floor(dst*src/dst) names —
    a wrong stride, axis swap, or off-by-one changes the bytes."""
    from pandabase_spark.operators.multimodal import _parse_ppm, resize_ppm

    # pixel (x, y) = (10x+y, 100+x, 200+y): every pixel distinct
    px = bytes(
        b for y in range(2) for x in range(4)
        for b in (10 * x + y, 100 + x, 200 + y)
    )
    payload = b"P6\n4 2\n255\n" + px
    df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
    out = resize_ppm(df, target=(2, 2)).collect()[0]
    assert (out["out_width"], out["out_height"]) == (2, 2)
    w, h, maxval, data = _parse_ppm(bytes(out["resized_payload"]))
    assert (w, h, maxval) == (2, 2, 255)
    # dst x∈{0,1} → src x = floor(x*4/2) ∈ {0,2}; dst y∈{0,1} → src y
    # = floor(y*2/2) ∈ {0,1}: expect pixels (0,0),(2,0),(0,1),(2,1)
    expect = bytes(
        b for (x, y) in ((0, 0), (2, 0), (0, 1), (2, 1))
        for b in (10 * x + y, 100 + x, 200 + y)
    )
    assert data == expect
    # malformed payload → NULL resized_payload, never a crash
    bad = spark.createDataFrame(
        [(2, b"not a ppm")], "doc_id long, payload binary"
    )
    row = resize_ppm(bad, target=(2, 2)).collect()[0]
    assert row["resized_payload"] is None and row["out_bytes"] is None


def test_resize_ppm_chains_into_decode(spark):
    """decode(resize(encode(id))) — the chained-codec loop behind the
    multimodal_resize_ppm driver query: re-decoded stats of the 6x6
    resample equal the analytic solid-color expectation."""
    from pandabase_spark.operators.multimodal import (
        attach_ppm_payload, decode_ppm_stats, resize_ppm,
    )

    docs = spark.range(40).select(F.col("id").alias("doc_id"))
    resized = resize_ppm(
        attach_ppm_payload(docs, "doc_id"), target=(6, 6)
    )
    stats = decode_ppm_stats(
        resized, id_col="id", payload_col="resized_payload"
    ).collect()
    assert len(stats) == 40
    for r in stats:
        i = r["id"]
        assert (r["width"], r["height"], r["channels"]) == (6, 6, 3)
        assert r["n_pixels"] == 36
        assert r["sum_bytes"] == (
            (i % 256) + (2 * i) % 256 + (3 * i) % 256
        ) * 36


def test_payload_embedding_ppm_real_pixels(spark):
    """decoder='ppm' features derive from the ACTUAL decoded pixels:
    [mean_r, mean_g, mean_b, w, h] exact for the arithmetic images;
    undecodable payloads yield a NULL embedding."""
    from pandabase_spark.operators.multimodal import (
        attach_ppm_payload, payload_embedding,
    )

    docs = spark.range(30).select(F.col("id").alias("doc_id"))
    emb = payload_embedding(
        attach_ppm_payload(docs, "doc_id"), decoder="ppm"
    ).collect()
    for r in emb:
        i = r["id"]
        assert r["embedding"] == [
            float(i % 256), float((2 * i) % 256), float((3 * i) % 256),
            float(8 + i % 8), float(8 + i % 4),
        ]
    bad = spark.createDataFrame(
        [(9, b"junk")], "doc_id long, payload binary"
    )
    assert payload_embedding(bad, decoder="ppm").collect()[0][
        "embedding"
    ] is None


def test_png_codec_round_trip_unit():
    """The stdlib-only PNG codec on random pixels: every supported
    channel count (gray/RGB/RGBA) x every filter type round-trips
    bit-exactly through encode -> parse (inflate + unfilter), plus a
    mixed-filter image; every malformation class → None."""
    import random

    from pandabase_spark.operators.multimodal import _parse_png, encode_png

    rng = random.Random(42)
    for ch in (1, 3, 4):
        for ftype in range(5):
            w, h = rng.randint(1, 9), rng.randint(1, 7)
            px = bytes(rng.randrange(256) for _ in range(w * h * ch))
            enc = encode_png(w, h, ch, px, row_filter=lambda y, f=ftype: f)
            assert _parse_png(enc) == (w, h, ch, px), (ch, ftype)
    w, h, ch = 13, 11, 3
    px = bytes(rng.randrange(256) for _ in range(w * h * ch))
    enc = encode_png(w, h, ch, px, row_filter=lambda y: y % 5)
    assert _parse_png(enc) == (w, h, ch, px)
    # malformations: empty, bad signature, truncated chunks, corrupt
    # IDAT (inflate fails), unsupported subset (16-bit depth)
    assert _parse_png(b"") is None
    assert _parse_png(b"\x89PNG\r\n\x1a\njunk") is None
    assert _parse_png(enc[:30]) is None
    bad = bytearray(enc)
    bad[45] ^= 0xFF  # inside IDAT
    assert _parse_png(bytes(bad)) is None
    deep = bytearray(enc)
    deep[24] = 16  # IHDR bit depth 8 -> 16 (unsupported subset)
    assert _parse_png(bytes(deep)) is None


def test_png_paeth_unfilter_hand_pin():
    """Paeth is the only filter with a predictor choice — pin the
    decoder against a HAND-COMPUTED 2x2 RGB reconstruction (spec §6.6:
    predictor = a, b, or c by minimum absolute difference, ties prefer
    a then b) rather than trusting encoder/decoder symmetry."""
    import struct
    import zlib

    from pandabase_spark.operators.multimodal import _PNG_SIG, _parse_png

    # row 0 filter=0: pixels (10,20,30) (40,50,60)
    # row 1 filter=4 (Paeth), raw deltas chosen so reconstruction uses
    # b (above) for the first pixel (a=0,c=0 -> p=b -> pr=b) and for
    # the second pixel a=left, b=above, c=above-left all nonzero
    row0 = bytes([0, 10, 20, 30, 40, 50, 60])
    # second row true pixels: (15, 25, 35) (70, 80, 90)
    # first pixel: pr = b = (10,20,30) -> stored = (5, 5, 5)
    # second pixel: a=(15,25,35) b=(40,50,60) c=(10,20,30)
    #   p = a+b-c = (45,55,65); |p-a|=30, |p-b|=5, |p-c|=35 -> pr=b
    #   stored = (70-40, 80-50, 90-60) = (30, 30, 30)
    row1 = bytes([4, 5, 5, 5, 30, 30, 30])

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    png = (
        _PNG_SIG + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(row0 + row1))
        + chunk(b"IEND", b"")
    )
    w, h, ch, px = _parse_png(png)
    assert (w, h, ch) == (2, 2, 3)
    assert px == bytes([10, 20, 30, 40, 50, 60, 15, 25, 35, 70, 80, 90])


def test_decode_png_real_bytes(spark):
    """Real COMPRESSED container decode through the seam: solid-color
    PNGs (filter type cycling per row) decode to stats the id formula
    predicts; malformed payloads yield null stats, not a crashed
    batch."""
    from pandabase_spark.operators.multimodal import (
        attach_png_payload, decode_png_stats,
    )

    docs = spark.range(60).select(F.col("id").alias("doc_id"))
    media = attach_png_payload(docs, "doc_id")
    rows = {r["id"]: r for r in decode_png_stats(media).collect()}
    assert len(rows) == 60
    for i in (0, 7, 23, 59):
        w, h = 4 + i % 6, 4 + i % 5
        s = (i % 256 + (5 * i) % 256 + (7 * i) % 256) * w * h
        r = rows[i]
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        assert (r["sum_bytes"], r["n_pixels"]) == (s, w * h)
    bad = spark.createDataFrame(
        [(999, b"\x89PNG\r\n\x1a\nnot a real png")],
        "doc_id long, payload binary",
    )
    r = decode_png_stats(bad).collect()[0]
    assert r["id"] == 999 and r["width"] is None and r["sum_bytes"] is None


def test_wav_codec_round_trip_unit():
    """The stdlib-only PCM WAV codec: 8/16-bit x mono/stereo
    round-trips sample-exactly; every malformation class → None
    (wrong magic, truncated data chunk, non-PCM format, odd block
    alignment, junk)."""
    import random
    import struct

    from pandabase_spark.operators.multimodal import _parse_wav, encode_wav

    rng = random.Random(7)
    for bits in (8, 16):
        lo, hi = (-128, 127) if bits == 8 else (-32768, 32767)
        for ch in (1, 2):
            frames = rng.randint(1, 40)
            samples = [rng.randint(lo, hi) for _ in range(frames * ch)]
            enc = encode_wav(ch, 16000, bits, samples)
            got = _parse_wav(enc)
            assert got == (ch, 16000, bits, frames, samples), (bits, ch)
    enc = encode_wav(1, 8000, 16, [1, -2, 3])
    assert _parse_wav(b"") is None
    assert _parse_wav(b"RIFX" + enc[4:]) is None
    assert _parse_wav(enc[:-2]) is None  # truncated data chunk
    nonpcm = bytearray(enc)
    nonpcm[20] = 3  # fmt code 1 -> 3 (IEEE float, unsupported)
    assert _parse_wav(bytes(nonpcm)) is None
    badblock = bytearray(enc)
    badblock[32] = 99  # block align contradicts ch * bytes/sample
    assert _parse_wav(bytes(badblock)) is None


def test_decode_wav_real_bytes(spark):
    """Real audio decode through the seam: deterministic sawtooth WAVs
    decode to stats the id formula predicts; malformed payloads yield
    null stats, not a crashed batch."""
    from pandabase_spark.operators.multimodal import (
        attach_wav_payload, decode_wav_stats,
    )

    docs = spark.range(40).select(F.col("id").alias("doc_id"))
    rows = {
        r["id"]: r
        for r in decode_wav_stats(attach_wav_payload(docs, "doc_id")).collect()
    }
    assert len(rows) == 40
    for i in (0, 9, 31, 39):
        frames = 32 + i % 32
        sab = sum(abs(((i + t) % 200) - 100) for t in range(frames))
        r = rows[i]
        assert (r["channels"], r["bits"]) == (1, 16)
        assert r["sample_rate"] == 8000 + (i % 4) * 4000
        assert (r["n_frames"], r["sum_abs"]) == (frames, sab)
    bad = spark.createDataFrame(
        [(999, b"RIFFnope")], "doc_id long, payload binary"
    )
    r = decode_wav_stats(bad).collect()[0]
    assert r["id"] == 999 and r["n_frames"] is None


def test_decode_auto_sniffs_mixed_formats(spark):
    """decoder='auto' / decode_image_stats_auto route each payload by
    magic bytes in one pass: PPM and PNG rows in the same column both
    decode (format tagged), junk yields a null row."""
    from pandabase_spark.operators.multimodal import (
        attach_png_payload, attach_ppm_payload, decode_image_stats_auto,
        decode_images,
    )

    docs = spark.range(20).select(F.col("id").alias("doc_id"))
    even = attach_ppm_payload(docs.where("doc_id % 2 = 0"), "doc_id")
    odd = attach_png_payload(docs.where("doc_id % 2 = 1"), "doc_id")
    mixed = even.unionByName(odd)
    rows = {r["id"]: r for r in decode_image_stats_auto(mixed).collect()}
    assert len(rows) == 20
    for i in range(20):
        r = rows[i]
        if i % 2 == 0:
            assert r["format"] == "ppm"
            assert (r["width"], r["height"]) == (8 + i % 8, 8 + i % 4)
        else:
            assert r["format"] == "png"
            assert (r["width"], r["height"]) == (4 + i % 6, 4 + i % 5)
    # the float feature path agrees on dimensions through auto
    feats = {r["id"]: r for r in decode_images(mixed, decoder="auto").collect()}
    assert (feats[2]["width"], feats[3]["width"]) == (8 + 2 % 8, 4 + 3 % 6)
    # junk payload: null format, null stats, batch survives
    junk = spark.createDataFrame(
        [(99, b"GIF89a not supported")], "doc_id long, payload binary"
    )
    r = decode_image_stats_auto(junk).collect()[0]
    assert r["format"] is None and r["width"] is None


def test_jpeg_codec_round_trip_unit():
    """The baseline JPEG codec (encode_jpeg → _parse_jpeg), stdlib
    only: exact on even-gray solids under the uniform-16 quant table
    (the midpoint-free configuration the oracle relies on), bounded
    lossy on gradients and 4:4:4 color, None on malformed/unsupported
    streams."""
    from pandabase_spark.operators.multimodal import (
        _parse_jpeg, encode_jpeg,
    )

    # grayscale solid with even level: decode is EXACT (DC quantizes
    # and reconstructs with no rounding midpoints)
    for i in (0, 1, 7, 42, 127, 200, 255):
        w, h = 8 + i % 9, 8 + i % 5
        g = 2 * (i % 128)
        got = _parse_jpeg(encode_jpeg(w, h, 1, bytes([g]) * (w * h)))
        assert got is not None
        W, H, ch, data = got
        assert (W, H, ch, set(data)) == (w, h, 1, {g})

    # gradient: the full huffman/AC path runs; quant-16 bounds error
    w, h = 16, 8
    src = bytes(((x * 16 + y * 3) % 256) for y in range(h) for x in range(w))
    W, H, ch, data = _parse_jpeg(encode_jpeg(w, h, 1, src))
    assert (W, H, ch) == (w, h, 1)
    assert max(abs(a - b) for a, b in zip(src, data)) <= 40

    # color 4:4:4 solid: YCbCr round trip within quantization error
    src = bytes([200, 30, 90]) * 64
    W, H, ch, data = _parse_jpeg(encode_jpeg(8, 8, 3, src))
    assert (W, H, ch) == (8, 8, 3)
    assert max(abs(a - b) for a, b in zip(src, data)) <= 12

    # hostile / unsupported: None, never an exception
    good = encode_jpeg(8, 8, 1, bytes([100]) * 64)
    assert _parse_jpeg(b"") is None
    assert _parse_jpeg(b"not a jpeg") is None
    assert _parse_jpeg(b"\xff\xd8garbage") is None
    assert _parse_jpeg(good[:40]) is None          # truncated headers
    assert _parse_jpeg(good[:-10]) is None         # truncated scan
    # progressive SOF marker → unsupported subset
    assert _parse_jpeg(good.replace(b"\xff\xc0", b"\xff\xc2", 1)) is None
    # forged dims past the pixel cap → rejected pre-alloc
    import struct

    sof_at = good.index(b"\xff\xc0")
    bomb = bytearray(good)
    bomb[sof_at + 5:sof_at + 9] = struct.pack(">HH", 60000, 60000)
    assert _parse_jpeg(bytes(bomb)) is None

    # the JPEG cap is TIGHTER than PNG's (r11 advice: per-pixel decode
    # cost is far higher here) — dims legal under the PNG cap but over
    # the JPEG one are rejected before any scan work
    from pandabase_spark.operators.multimodal import (
        _JPEG_MAX_PIXELS, _PNG_MAX_PIXELS,
    )

    assert _JPEG_MAX_PIXELS < _PNG_MAX_PIXELS
    mid = bytearray(good)
    mid[sof_at + 5:sof_at + 9] = struct.pack(">HH", 4096, 2048)  # 8Mpx
    assert 4096 * 2048 <= _PNG_MAX_PIXELS
    assert _parse_jpeg(bytes(mid)) is None

    # a scan too short to legitimately describe its block grid (every
    # real block costs ≥2 bits) is rejected before the per-block IDCT
    # loop burns CPU proportional to the FORGED dims, not the bytes
    small = bytearray(good)
    small[sof_at + 5:sof_at + 9] = struct.pack(">HH", 2048, 2048)  # 4Mpx
    assert 2048 * 2048 <= _JPEG_MAX_PIXELS
    assert _parse_jpeg(bytes(small)) is None  # 64k blocks, ~tens of bytes


def test_jpeg_420_subsampling_roundtrip():
    """r11 verdict ask #4: 4:2:0 decodes through the MCU-interleaved
    chroma-upsampling pipeline. (a) Solid color round-trips within
    quantization error at straight, odd, and multi-MCU dims; (b) the
    NEUTRAL-GRAY color path (the mixed-gate payload family) is
    byte-exact end to end — midpoint-free by the
    attach_jpeg420_payload argument; (c) pixels constant over each
    2×2 cell survive the box-filter/nearest-neighbor chroma cycle
    losslessly at the chroma level; (d) sampling factors above 2
    stay outside the supported subset."""
    import struct

    from pandabase_spark.operators.multimodal import (
        _parse_jpeg, encode_jpeg,
    )

    # (a) solid color, assorted dims incl. odd and multi-MCU — both
    # real-world subsampled layouts (4:2:0 and r12's 4:2:2)
    for ss in ("420", "422"):
        for w, h in [(16, 16), (8, 8), (20, 12), (17, 9), (7, 5)]:
            src = bytes([200, 30, 90]) * (w * h)
            out = _parse_jpeg(encode_jpeg(w, h, 3, src, subsampling=ss))
            assert out is not None
            W, H, ch, data = out
            assert (W, H, ch) == (w, h, 3)
            assert max(abs(a - b) for a, b in zip(src, data)) <= 12

    # (b) neutral gray through the COLOR subsampled pipelines:
    # byte-exact for both layouts (the mixed-gate payload families)
    for i in (0, 3, 31, 77, 128, 255):
        w, h = 9 + i % 16, 9 + i % 9
        g = 2 * (i % 128)
        for ss in ("420", "422"):
            out = _parse_jpeg(
                encode_jpeg(w, h, 3, bytes([g]) * (w * h * 3),
                            subsampling=ss)
            )
            assert out is not None and set(out[3]) == {g}

    # (c) 2x2-cell-constant chroma: the down/upsample cycle is
    # lossless at the chroma level (remaining error is luma DCT
    # quantization, bounded like the 4:4:4 case)
    w, h = 16, 16
    px = bytearray()
    for y in range(h):
        for x in range(w):
            c = 32 * (((y // 2) * (w // 2) + (x // 2)) % 7)
            px += bytes([c, 255 - c, 128])
    out = _parse_jpeg(encode_jpeg(w, h, 3, bytes(px), subsampling="420"))
    assert out is not None and out[:3] == (w, h, 3)

    # (d) factor 3 rejected cleanly AT THE SOF GUARD. SOF0 layout is
    # [FF C0 len2 prec h2 w2 nc | (id samp qid)*]: comp-1's SAMPLING
    # byte sits at sof_at + 11 (the r12 review caught the first draft
    # forging +12 — the qtab id — which nulled for the wrong reason)
    good = encode_jpeg(8, 8, 3, bytes([10, 20, 30]) * 64)
    sof_at = good.index(b"\xff\xc0")
    assert good[sof_at + 11] == 0x11  # precondition: comp-1 sampling
    forged = bytearray(good)
    forged[sof_at + 11] = 0x31  # comp 1 sampling -> 3x1
    assert _parse_jpeg(bytes(forged)) is None
    forged[sof_at + 11] = 0x13  # 1x3
    assert _parse_jpeg(bytes(forged)) is None

    # encoder guards: 4:1:1 stays unsupported (sampling factor 4)
    import pytest

    with pytest.raises(ValueError):
        encode_jpeg(8, 8, 3, bytes(192), subsampling="411")


def test_jpeg_progressive_roundtrip():
    """r12: PROGRESSIVE (SOF2) encode/decode — spectral selection
    (DC scan + per-component 1-63 AC band) and successive
    approximation (Al=1 first scans, Ah=1→Al=0 refinements: DC raw
    bits, AC correction-bit protocol with EOBRUN accumulation and
    buffered bits). The coefficients are IDENTICAL to baseline's, so
    progressive must decode byte-for-byte equal to the baseline
    encoding of the same input — across gray/color, all subsampling
    layouts, single- and multi-MCU grids, partial edge blocks.
    Hostile variants null, never crash."""
    import itertools

    from pandabase_spark.operators.multimodal import (
        _parse_jpeg, encode_jpeg,
    )

    for (w, h), nc, ss in itertools.product(
        [(8, 8), (17, 9), (33, 31), (25, 25)], [1, 3],
        ["444", "420", "422"],
    ):
        if nc == 1 and ss != "444":
            continue
        rng = (w * 131 + h * 17 + nc) % (1 << 31)
        px = bytearray()
        for _ in range(w * h * nc):
            rng = (1103515245 * rng + 12345) % (1 << 31)
            px.append(rng & 0xFF)
        base = _parse_jpeg(encode_jpeg(w, h, nc, bytes(px),
                                       subsampling=ss))
        prog = _parse_jpeg(
            encode_jpeg(w, h, nc, bytes(px), subsampling=ss,
                        progressive=True)
        )
        assert prog is not None and prog[:3] == (w, h, nc)
        assert prog[3] == base[3], (w, h, nc, ss)

    # neutral-gray solids stay byte-exact through the multi-scan path
    for i in (0, 31, 77, 200):
        w, h, g = 8 + i % 9, 8 + i % 5, 2 * (i % 128)
        out = _parse_jpeg(
            encode_jpeg(w, h, 1, bytes([g]) * (w * h), progressive=True)
        )
        assert out is not None and set(out[3]) == {g}

    # hostile: truncation at every region, scan-count bomb, missing
    # tables — None, never an exception
    good = encode_jpeg(24, 17, 3, bytes([10, 20, 30]) * (24 * 17),
                       progressive=True)
    assert _parse_jpeg(good[:60]) is None
    assert _parse_jpeg(good[:len(good) // 2]) is None
    assert _parse_jpeg(good[:-2]) is not None  # just EOI gone: tolerated
    import pytest

    with pytest.raises(ValueError):
        encode_jpeg(8, 8, 1, bytes(64), progressive=True,
                    restart_interval=2)


def test_jpeg_restart_intervals_roundtrip():
    """r12: DRI/RSTn support — the restart framing real-world JPEGs
    carry. (a) Round-trips across gray/color, 444/420, single- and
    multi-MCU grids at intervals 1/2/5; (b) even-gray solids stay
    BYTE-EXACT with restarts (the framing changes entropy coding,
    never reconstruction); (c) a wrong RSTn sequence number nulls the
    row (corrupt stream), as does a missing marker."""
    import itertools

    from pandabase_spark.operators.multimodal import (
        _parse_jpeg, encode_jpeg,
    )

    for (w, h), nc, ss, ri in itertools.product(
        [(24, 17), (7, 5)], [1, 3], ["444", "420"], [1, 2, 5]
    ):
        if nc == 1 and ss == "420":
            continue
        src = bytes(
            (37 * (i % 7) + 11 * (i % 13)) % 256
            for i in range(w * h * nc)
        )
        out = _parse_jpeg(
            encode_jpeg(w, h, nc, src, subsampling=ss,
                        restart_interval=ri)
        )
        assert out is not None and out[:3] == (w, h, nc)

    g = 84
    out = _parse_jpeg(
        encode_jpeg(20, 12, 1, bytes([g]) * 240, restart_interval=1)
    )
    assert out is not None and set(out[3]) == {g}
    out = _parse_jpeg(
        encode_jpeg(19, 11, 3, bytes([g]) * (19 * 11 * 3),
                    subsampling="420", restart_interval=2)
    )
    assert out is not None and set(out[3]) == {g}

    enc = encode_jpeg(
        24, 17, 1, bytes([g]) * (24 * 17), restart_interval=1
    )
    bad = bytearray(enc)
    at = bad.find(b"\xff\xd0")
    assert at > 0
    bad[at + 1] = 0xD5  # out-of-sequence RST
    assert _parse_jpeg(bytes(bad)) is None
    gone = enc[:at] + enc[at + 2:]  # marker stripped entirely
    assert _parse_jpeg(gone) is None


def test_decode_jpeg_real_bytes(spark):
    """attach_jpeg_payload → decode_jpeg_stats through the seam:
    stats integer-exact from doc_id (the driver-gate contract)."""
    from pandabase_spark.operators.multimodal import (
        attach_jpeg_payload, decode_jpeg_stats,
    )

    docs = spark.range(30).select(F.col("id").alias("doc_id"))
    rows = {
        r["id"]: r
        for r in decode_jpeg_stats(attach_jpeg_payload(docs)).collect()
    }
    assert len(rows) == 30
    for i in range(30):
        r = rows[i]
        w, h, g = 8 + i % 9, 8 + i % 5, 2 * (i % 128)
        assert (r["width"], r["height"], r["channels"]) == (w, h, 1)
        assert r["sum_bytes"] == g * w * h
        assert r["n_pixels"] == w * h
    # auto-dispatch recognizes the SOI magic and tags the format
    from pandabase_spark.operators.multimodal import (
        decode_image_stats_auto, payload_embedding,
    )

    auto = decode_image_stats_auto(
        attach_jpeg_payload(docs.where("doc_id < 5"))
    ).collect()
    assert all(r["format"] == "jpeg" for r in auto)
    # and the shared feature path embeds from the decoded gray plane
    emb = {
        r["id"]: r["embedding"]
        for r in payload_embedding(
            attach_jpeg_payload(docs.where("doc_id < 5")),
            id_col="doc_id", decoder="auto",
        ).collect()
    }
    for i in range(5):
        g = float(2 * (i % 128))
        assert emb[i] == [g, g, g, float(8 + i % 9), float(8 + i % 5)]


def test_png_palette_round_trip_unit():
    """Color-type-3 (palette) PNGs decode through the same
    inflate/unfilter pipeline with PLTE expansion to RGB — exact on
    arbitrary index images; malformed palettes and out-of-range
    indices null, never crash."""
    from pandabase_spark.operators.multimodal import (
        _parse_png, encode_png,
    )

    pal = bytes(
        [10, 20, 30, 200, 100, 50, 0, 255, 0, 7, 7, 7]
    )  # 4 entries
    w, h = 5, 4
    idx = bytes(((x + y) % 4) for y in range(h) for x in range(w))
    payload = encode_png(
        w, h, 1, idx, palette=pal, row_filter=lambda y: y % 5
    )
    got = _parse_png(payload)
    assert got is not None
    W, H, ch, data = got
    assert (W, H, ch) == (w, h, 3)
    exp = bytearray()
    for i in idx:
        exp += pal[i * 3:i * 3 + 3]
    assert data == bytes(exp)

    # out-of-range index (palette shorter than indices claim) → None
    short_pal = pal[:6]  # 2 entries, indices go to 3
    bad = encode_png(w, h, 1, idx, palette=short_pal)
    assert _parse_png(bad) is None
    # palette with a non-multiple-of-3 PLTE → None
    import struct
    import zlib as _z

    def chunk(ct, d):
        return (
            struct.pack(">I", len(d)) + ct + d
            + struct.pack(">I", _z.crc32(ct + d) & 0xFFFFFFFF)
        )

    broken = payload.replace(
        chunk(b"PLTE", pal), chunk(b"PLTE", pal[:-1]), 1
    )
    assert _parse_png(broken) is None
    # encoder guards: palette images take index bytes
    import pytest as _p

    with _p.raises(ValueError, match="index bytes"):
        encode_png(w, h, 3, idx * 3, palette=pal)
    # auto-dispatch stats see a 3-channel image through the same path
    from pandabase_spark.operators.multimodal import _PNG_SIG

    assert payload.startswith(_PNG_SIG)


def test_jpeg_reordered_sos_components_decode_correctly():
    """r11 review finding #4: the scan interleave follows SOS order
    and each SOS entry names its SOF component by ID — a spec-valid
    JPEG whose SOS lists components in a different order than SOF0
    must decode with the planes correctly mapped (not silently
    swapped)."""
    import struct

    from pandabase_spark.operators.multimodal import (
        _parse_jpeg, encode_jpeg,
    )

    src = bytes([200, 30, 90]) * 64  # solid color, 8x8, 4:4:4
    payload = encode_jpeg(8, 8, 3, src)
    W, H, ch, base = _parse_jpeg(payload)
    assert (W, H, ch) == (8, 8, 3)

    # hand-build the SAME image with the scan interleaved in SOS
    # order (Cb, Y, Cr) — ids (2, 1, 3) — from the encoder's own
    # primitives; a compliant decoder must map by id and reproduce
    # the identical pixels
    from pandabase_spark.operators.multimodal import (
        _BitWriter, _fdct_quant, _huff_codes, _JPEG_AC_BITS,
        _JPEG_AC_VALS, _JPEG_DC_BITS, _JPEG_DC_VALS, _JPEG_QTAB,
        _JPEG_ZIGZAG,
    )
    import numpy as np

    r, g, b = 200.0, 30.0, 90.0
    yv = int(np.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5)) - 128
    cbv = int(np.floor(128 - 0.168736 * r - 0.331264 * g + 0.5 * b
                       + 0.5)) - 128
    crv = int(np.floor(128 + 0.5 * r - 0.418688 * g - 0.081312 * b
                       + 0.5)) - 128
    blocks = {
        cid: _fdct_quant([v] * 64, _JPEG_QTAB)
        for cid, v in ((1, yv), (2, cbv), (3, crv))
    }
    dc_codes = _huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _huff_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    wtr = _BitWriter()
    for cid in (2, 1, 3):  # SOS order != SOF order
        zz = [blocks[cid][_JPEG_ZIGZAG[i]] for i in range(64)]
        diff = zz[0]  # first (only) MCU: prediction starts at 0
        t = abs(diff).bit_length()
        code, ln = dc_codes[t]
        wtr.put(code, ln)
        if t:
            wtr.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
        code, ln = ac_codes[0x00]  # solid → EOB
        wtr.put(code, ln)
    scan = wtr.flush()

    def seg(marker, data):
        return struct.pack(">BBH", 0xFF, marker, len(data) + 2) + data

    qt = bytes([_JPEG_QTAB[_JPEG_ZIGZAG[i]] for i in range(64)])
    sof = struct.pack(">BHHB", 8, 8, 8, 3)
    for cid in (1, 2, 3):  # SOF order unchanged
        sof += bytes([cid, 0x11, 0])
    sos = bytes([3])
    for cid in (2, 1, 3):
        sos += bytes([cid, 0x00])
    sos += b"\x00\x3f\x00"
    reordered = (
        b"\xff\xd8"
        + seg(0xDB, b"\x00" + qt)
        + seg(0xC0, sof)
        + seg(0xC4, b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS))
        + seg(0xC4, b"\x10" + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS))
        + seg(0xDA, sos)
        + scan
        + b"\xff\xd9"
    )
    got = _parse_jpeg(reordered)
    assert got is not None, "reordered SOS must decode"
    assert got[:3] == (8, 8, 3)
    assert got[3] == base, "planes mis-mapped under reordered SOS"

    # malformed scan headers reject cleanly
    sos_at = payload.index(b"\xff\xda")
    dup = bytearray(payload)
    dup[sos_at + 4 + 3] = dup[sos_at + 4 + 1]  # comp2 id := comp1 id
    assert _parse_jpeg(bytes(dup)) is None
    unk = bytearray(payload)
    unk[sos_at + 4 + 1] = 9  # unknown component id
    assert _parse_jpeg(bytes(unk)) is None


def test_avi_codec_round_trip_unit():
    """The AVI container codec (encode_avi → _parse_avi), stdlib only:
    exact roundtrip of uncompressed RGB24 frames through the DIB
    bottom-up/BGR/row-padding storage, None on malformed/compressed/
    bomb streams."""
    import struct

    from pandabase_spark.operators.multimodal import (
        _parse_avi, encode_avi,
    )

    # gradient frame with a non-multiple-of-4 stride (5*3=15 → pad 16):
    # any padding/flip/BGR bug changes the bytes
    w, h = 5, 3
    f0 = bytes(
        ((x * 7 + y * 31 + c * 13) % 256)
        for y in range(h) for x in range(w) for c in range(3)
    )
    f1 = bytes(reversed(f0))
    payload = encode_avi(w, h, 10, [f0, f1])
    got = _parse_avi(payload)
    assert got is not None
    W, H, frames = got
    assert (W, H) == (w, h) and frames == [f0, f1]

    # hostile / unsupported
    assert _parse_avi(b"") is None
    assert _parse_avi(b"RIFFxxxxAVI garbage") is None
    assert _parse_avi(payload[:40]) is None
    bomb = bytearray(payload)
    at = payload.index(b"strf") + 8
    bomb[at + 4:at + 12] = struct.pack("<ii", 60000, 60000)
    assert _parse_avi(bytes(bomb)) is None  # pixel-bomb header
    comp = bytearray(payload)
    comp[at + 16:at + 20] = struct.pack("<I", 1)  # biCompression=RLE
    assert _parse_avi(bytes(comp)) is None


def test_sample_avi_frames_real_bytes(spark):
    """attach_avi_payload → sample_avi_frames through the UDTF-shaped
    seam: every 2nd frame, stats exact from (doc_id, frame_idx); junk
    rows vanish rather than crash; the auto embed path thumbnails the
    first frame."""
    from pandabase_spark.operators.multimodal import (
        attach_avi_payload, payload_embedding, sample_avi_frames,
    )

    docs = spark.range(20).select(F.col("id").alias("doc_id"))
    rows = sample_avi_frames(
        attach_avi_payload(docs), every_n=2
    ).collect()
    seen = {}
    for r in rows:
        seen.setdefault(r["id"], []).append(r)
    assert set(seen) == set(range(20))
    for i in range(20):
        n, w, h = 4 + i % 6, 4 + i % 4, 2 + i % 3
        assert [r["frame_idx"] for r in sorted(
            seen[i], key=lambda r: r["frame_idx"])] == list(range(0, n, 2))
        for r in seen[i]:
            fi = r["frame_idx"]
            assert (r["width"], r["height"]) == (w, h)
            assert r["sum_bytes"] == (
                (i + 17 * fi) % 256 + (2 * i + fi) % 256
                + (3 * i + 5 * fi) % 256
            ) * w * h
    # malformed payload: zero rows for that id, batch survives
    junk = spark.createDataFrame(
        [(99, b"RIFF not a real avi")], "doc_id long, payload binary"
    )
    assert sample_avi_frames(junk).count() == 0
    # auto-embed: first-frame thumbnail features
    emb = {
        r["id"]: r["embedding"]
        for r in payload_embedding(
            attach_avi_payload(docs.where("doc_id < 4")),
            id_col="doc_id", decoder="auto",
        ).collect()
    }
    for i in range(4):
        w, h = 4 + i % 4, 2 + i % 3
        assert emb[i] == [
            float(i % 256), float((2 * i) % 256), float((3 * i) % 256),
            float(w), float(h),
        ]


def test_jpeg_byte_stuffing_round_trips():
    """r11 self-review probe: solid oracle payloads never produce a
    0xFF byte in the entropy stream, so the decoder's UNSTUFFING
    branch (0xFF00 → 0xFF) would go untested without this pin — a
    deterministic random image whose scan section contains a stuffed
    byte must still decode within the quantization bound."""
    from pandabase_spark.operators.multimodal import (
        _parse_jpeg, encode_jpeg,
    )

    rng, px = 1, bytearray()  # seed 1: verified to contain 0xFF00
    for _ in range(16 * 16):
        rng = (1103515245 * rng + 12345) % (1 << 31)
        px.append(rng & 0xFF)
    payload = encode_jpeg(16, 16, 1, bytes(px))
    scan = payload[payload.index(b"\xff\xda") + 2:]
    assert b"\xff\x00" in scan, "plant lost its stuffed byte"
    got = _parse_jpeg(payload)
    assert got is not None
    W, H, ch, data = got
    assert (W, H, ch) == (16, 16, 1)
    assert max(abs(a - b) for a, b in zip(px, data)) <= 96


def test_avi_odd_chunk_word_alignment():
    """r11 self-review probe: RIFF chunks are word-aligned, and the
    encoder's own chunks are always even-length — so the parser's
    pad-byte skip (`length & 1`) would go untested. An AVI carrying
    an odd-length JUNK chunk before movi must still demux."""
    import struct

    from pandabase_spark.operators.multimodal import (
        _parse_avi, encode_avi,
    )

    w, h = 4, 2
    f0 = bytes(range(w * h * 3))
    payload = encode_avi(w, h, 10, [f0])
    movi_at = payload.index(b"LIST", 12)
    junk = b"JUNK" + struct.pack("<I", 3) + b"odd" + b"\x00"  # pad byte
    patched = bytearray(payload)
    patched[movi_at:movi_at] = junk
    patched[4:8] = struct.pack("<I", len(patched) - 8)
    got = _parse_avi(bytes(patched))
    assert got is not None
    assert got == (w, h, [f0])


def test_png_decompression_bomb_yields_null():
    """A forged IHDR claiming a multi-GB image with a tiny highly-
    compressible IDAT must return None (the batch-survives contract
    covers hostile payloads, not just truncated ones) — the inflater
    is capped at the IHDR-implied size and absurd dimensions are
    rejected before any allocation."""
    import struct
    import zlib

    from pandabase_spark.operators.multimodal import _PNG_SIG, _parse_png

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    # claims 65536 x 65536 RGBA (~17 GB decoded), ships ~17 KB of zeros
    ihdr = struct.pack(">IIBBBBB", 65536, 65536, 8, 6, 0, 0, 0)
    bomb = (
        _PNG_SIG + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00" * (1 << 20)))
        + chunk(b"IEND", b"")
    )
    assert _parse_png(bomb) is None

    # CPU-bomb variant: dims whose decoded BYTES squeak under the old
    # 256 MB memory cap but whose w*h forces tens of millions of
    # pure-Python unfilter iterations — rejected by the pixel cap
    # (5000x5000 gray = 25M px > 16M cap, ~25 MB decoded)
    cpu_ihdr = struct.pack(">IIBBBBB", 5000, 5000, 8, 0, 0, 0, 0)
    cpu_bomb = (
        _PNG_SIG + chunk(b"IHDR", cpu_ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x01" * (1 << 20)))
        + chunk(b"IEND", b"")
    )
    assert _parse_png(cpu_bomb) is None

    # a stream producing MORE output than the header claims is also
    # malformed, not silently truncated
    from pandabase_spark.operators.multimodal import encode_png

    good = encode_png(2, 2, 3, bytes(range(12)))
    # shrink the claimed dims but keep the original IDAT
    small_ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)
    forged = (
        _PNG_SIG + chunk(b"IHDR", small_ihdr) + good[len(_PNG_SIG) + 25:]
    )
    assert _parse_png(forged) is None


def test_wav_odd_data_chunk_is_word_aligned():
    """8-bit audio with an odd sample count must emit the RIFF pad
    byte (total container even) and still round-trip."""
    from pandabase_spark.operators.multimodal import _parse_wav, encode_wav

    enc = encode_wav(1, 8000, 8, [1, -2, 3])
    assert len(enc) % 2 == 0, "odd data chunk must carry a pad byte"
    assert _parse_wav(enc) == (1, 8000, 8, 3, [1, -2, 3])


def test_jpeg_fill_bytes_before_markers_tolerated():
    """r12 advice: T.81 B.1.1.2 lets an encoder pad any marker with
    leading 0xFF fill bytes. Decoders must skip the padding instead
    of reading the 0xFF as a marker code (whose garbage 'length'
    nulls the whole file). Pins: fill bytes injected before every
    structural marker of baseline, DRI-restart and progressive
    streams decode IDENTICALLY to the unpadded bytes — including
    fills before RSTn markers inside the entropy stream."""
    from pandabase_spark.operators.multimodal import (
        _parse_jpeg, encode_jpeg,
    )

    def pad_markers(buf: bytes) -> bytes:
        # insert one fill byte before each marker segment (never
        # inside entropy data unless it precedes an RSTn)
        out = bytearray()
        i, n = 0, len(buf)
        out += buf[:2]  # SOI
        i = 2
        while i + 4 <= n:
            assert buf[i] == 0xFF
            marker = buf[i + 1]
            out += b"\xff"  # fill
            if marker == 0xD9:
                out += buf[i:]
                return bytes(out)
            ln = int.from_bytes(buf[i + 2:i + 4], "big")
            out += buf[i:i + 2 + ln]
            i += 2 + ln
            if marker == 0xDA:
                # entropy segment: copy through, padding RSTn markers
                j = i
                while j + 1 < n:
                    if buf[j] == 0xFF and buf[j + 1] != 0x00:
                        if 0xD0 <= buf[j + 1] <= 0xD7:
                            out += buf[i:j] + b"\xff" + buf[j:j + 2]
                            i = j + 2
                            j = i
                            continue
                        break
                    j += 1
                out += buf[i:j]
                i = j
        out += buf[i:]
        return bytes(out)

    px = bytes(
        (x * 7 + y * 13 + c * 29) % 256
        for y in range(17) for x in range(24) for c in range(3)
    )
    for kwargs in (
        {},
        {"restart_interval": 2},
        {"progressive": True},
        {"subsampling": "420"},
    ):
        clean = encode_jpeg(24, 17, 3, px, **kwargs)
        padded = pad_markers(clean)
        assert len(padded) > len(clean)
        want = _parse_jpeg(clean)
        got = _parse_jpeg(padded)
        assert got is not None, kwargs
        assert got == want, kwargs


def test_jpeg_progressive_forged_header_bounded():
    """r12 advice (medium): a crafted ~100-byte SOF2 payload at the
    pixel cap whose single tiny-EOBRUN scan 'covers' every block must
    be REJECTED (None) instead of buying ~200k IDCTs and a
    hundred-MB coefficient store for a handful of bytes — the
    progressive analogue of the baseline blocks-vs-scan-length
    guard. A legitimate progressive file (whose mandatory DC scans
    code >= 1 bit per block) still decodes."""
    import struct
    import time

    from pandabase_spark.operators.multimodal import (
        _parse_jpeg, encode_jpeg,
    )

    w = h = 2048  # 4M pixels: exactly at the cap
    # DQT: table 0, all ones
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    # SOF2: 1 component, 1x1 sampling
    sof = (
        b"\xff\xc2" + struct.pack(">H", 11) + b"\x08"
        + struct.pack(">HH", h, w) + b"\x01" + bytes([1, 0x11, 0])
    )
    # DHT: AC table 0 with two 2-bit symbols: 0xE0 (EOBRUN magnitude
    # 14) and 0x00 (EOB) — enough to "cover" everything in a few bits
    dht = (
        b"\xff\xc4" + struct.pack(">H", 21) + b"\x11"
        + bytes([0, 2] + [0] * 14) + bytes([0xE0, 0x00])
    )
    # one AC scan (ss=1, se=63, ah=0, al=0), entropy: EOBRUN(14)+bits
    sos = (
        b"\xff\xda" + struct.pack(">H", 8)
        + b"\x01" + bytes([1, 0x00]) + bytes([1, 63, 0x00])
    )
    scan = bytes([0b00111111, 0xFF, 0x00, 0b11111100] * 3)
    bomb = b"\xff\xd8" + dqt + sof + dht + sos + scan + b"\xff\xd9"
    assert len(bomb) < 160
    t0 = time.monotonic()
    assert _parse_jpeg(bomb) is None
    assert time.monotonic() - t0 < 2.0, "guard must reject cheaply"

    # control: a real progressive encoding of a small image decodes
    good = encode_jpeg(16, 16, 1, bytes(range(256)), progressive=True)
    assert _parse_jpeg(good) is not None


def test_find_scan_end_tolerates_fill_padded_restarts():
    """r13 review finding: fills may pad RSTn markers INSIDE a
    progressive scan's entropy stream (T.81 B.1.1.2). _find_scan_end
    must scan THROUGH 'FF FF D0' (fill + RST0) rather than ending the
    scan at the fill, and must still end at a fill-padded REAL marker
    (returning the fill position, which the marker walk skips)."""
    from pandabase_spark.operators.multimodal import _find_scan_end

    # entropy | stuffed FF | fill+RST0 | entropy | fills + EOI
    buf = (
        b"\x12\x34" + b"\xff\x00" + b"\xff\xff\xd0" + b"\x56"
        + b"\xff\xff\xff\xd9"
    )
    end = _find_scan_end(buf, 0)
    # the scan must include the fill+restart and the post-restart
    # byte (old code ended AT the fill, truncating the scan), and
    # stop at the real EOI marker (trailing fills may remain inside
    # the slice — the bit reader never consumes them)
    assert b"\xff\xff\xd0\x56" in buf[:end], (end, buf[:end])
    assert buf[end] == 0xFF and buf[end + 1] == 0xD9
    # plain case unchanged: ends exactly at a non-RST marker
    buf2 = b"\xaa\xbb\xff\xd9"
    assert _find_scan_end(buf2, 0) == 2
